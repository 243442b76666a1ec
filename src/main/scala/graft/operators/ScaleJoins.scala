package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
}
