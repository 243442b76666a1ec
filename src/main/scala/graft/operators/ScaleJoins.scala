package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Join-shaping utilities for cluster scale: key salting for skew and
  * bucketed layouts for shuffle-free co-located joins. Local runs are
  * the correctness harness; the payoff is at 100 TB where one hot key
  * or one avoidable fact-fact shuffle dominates a job.
  */
object ScaleJoins {

  /** Skew-safe equi-join: the left (large, possibly skewed) side gets a
    * deterministic salt in [0, numSalts); the right side is replicated
    * once per salt value, so a hot key's rows spread over `numSalts`
    * tasks instead of one straggler.
    *
    * `saltSrc` must be a left-side column that varies within a key
    * (e.g. the fact table's line number) — hashing it spreads rows
    * without RNG, keeping runs reproducible. AQE's skew-join handles
    * moderate skew on its own; explicit salting is for the pathological
    * keys AQE can't split (e.g. a single key bigger than an executor).
    *
    * Cost model: right side is replicated numSalts×, so this fits
    * small-to-medium build sides; for skewed fact-fact joins, salt only
    * the hot keys (split-union) instead.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 numSalts: Int, saltSrc: Column): DataFrame = {
    require(numSalts > 0)
    val salted = left.withColumn("_salt", pmod(hash(saltSrc), lit(numSalts)))
    val replicated = right.withColumn("_salt",
      explode(array((0 until numSalts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Oracle-checked salted-join entry: per-segment order counts computed
    * THROUGH [[saltedJoin]] (orders salted 4 ways on the line key,
    * customer replicated per salt) — the oracle runs the plain join, so
    * the gate proves salting is result-invariant, not just plausible. */
  def qSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey").as("custkey"), col("o_orderkey"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    saltedJoin(ord, cust, "custkey", numSalts = 4, saltSrc = col("o_orderkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** Hive-style partitioned landing write — the reference's
    * directory-per-session layout (SURVEY §1.1) kept as REAL partition
    * columns, so session-scoped queries prune at the file index and
    * never list, let alone read, other sessions' data. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Bucketed layout write: pre-shuffles once at write time so every
    * future equi-join/aggregation on `key` between identically-bucketed tables
    * runs shuffle-free (bucket-local sort-merge). The write is the one
    * shuffle you pay; repeated joins amortize it. */
  def writeBucketed(df: DataFrame, path: String, table: String,
                    key: String, numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  // --- key-skew audit ---

  /** Salt hint, share arm: the hottest key holds strictly more than a
    * 1/20 (5%) share of its group's rows. */
  val SkewHintFrac = 20

  /** Salt hint, dominance arm: the hottest key also exceeds 8× the
    * median per-key count. Both arms must fire: a small uniform key
    * space trips the share test alone (6 keys ⇒ every key holds 17%)
    * yet is exactly what AQE splits fine — salting is for a key that
    * DWARFS its peers, which is what max ≫ p50 detects. */
  val SkewHintDominance = 8

  /** Per-group key-distribution audit: the readout that DECIDES whether
    * a join/aggregation on `keyCol` needs [[saltedJoin]] (or AQE skew
    * splitting) before anyone burns a cluster finding out. Per value of
    * `typeCol`: row and distinct-key totals, the hottest key's count
    * and share, exact p50/p99 of the per-key count distribution, and
    * the salt hint.
    *
    * Scale shape: one (type, key) count with map-side partials — the
    * same shuffle the audited aggregation itself would do — then
    * everything else runs on the FREQUENCY-OF-FREQUENCY frame
    * (type, per-key-count → how many keys), whose size is bounded by
    * the number of DISTINCT count values, not the number of keys. The
    * percentile window sorts that tiny frame per type; the percentile
    * itself is the integer inverted-CDF (smallest count whose
    * cumulative key coverage reaches ⌈q·n_keys⌉, spelled
    * cum·100 ≥ q·n_keys) — exact, tie-stable, engine-portable. The
    * only doubles are the two terminal share divisions. */
  def keySkewAudit(df: DataFrame, typeCol: String, keyCol: String): DataFrame = {
    val keyCounts = df.groupBy(col(typeCol), col(keyCol))
      .agg(count(lit(1)).as("kc"))
    val fof = keyCounts.groupBy(col(typeCol), col("kc"))
      .agg(count(lit(1)).as("nk"))
    val cum = fof.withColumn("cum",
      sum(col("nk")).over(Window.partitionBy(col(typeCol)).orderBy(col("kc"))))
    val tot = keyCounts.groupBy(col(typeCol)).agg(
      count(lit(1)).as("n_keys"),
      sum(col("kc")).as("n_rows"),
      max(col("kc")).as("max_key_count"))
    def pctl(q: Int): Column =
      min(when(col("cum") * 100 >= col("n_keys") * q, col("kc")))
        .as(s"p${q}_key_count")
    cum.join(tot, Seq(typeCol))
      .groupBy(col(typeCol), col("n_keys"), col("n_rows"),
        col("max_key_count"))
      .agg(pctl(50), pctl(99))
      .withColumn("top_share",
        col("max_key_count").cast("double") / col("n_rows").cast("double"))
      .withColumn("salt_hint",
        col("max_key_count") * SkewHintFrac > col("n_rows") &&
          col("max_key_count") > col("p50_key_count") * SkewHintDominance)
  }

  def qSkewAudit(spark: SparkSession, dir: String): DataFrame =
    keySkewAudit(Tables.events(spark, dir), "event_type", "user_id")
      .orderBy(col("event_type"))
}
