package graft

/** t1 smoke: every declared query executes and returns rows on the
  * sf0.001 testdata (column-level correctness is the DuckDB oracle's
  * job; this catches schema/runtime regressions fast). */
class SmokeSpec extends SparkSpec {

  test("entry point returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Rows-only entries: results are engine-specific (sketches; learned
    * k-means centroids whose distributed float means are
    * partitioning-dependent in the last ULP; deflate output, which has
    * no DuckDB-side zlib) with no portable oracle; their accuracy is
    * pinned by dedicated specs. */
  val oracleExempt: Set[String] =
    Set("q_approx_users", "q_approx_quantiles", "q_similar_kmeans",
      "q_compress_ratio", "q_curriculum_approx", "q_lm_perplexity_approx")

  test("every query has an oracle or is explicitly exempt") {
    val noOracle =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- oracleExempt
    assert(noOracle.isEmpty,
      s"queries without oracle SQL: ${noOracle.mkString(", ")}")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sfSmoke)
      assert(df.columns.nonEmpty)
      // count() not rows>0: legitimately-empty results (e.g. near-dup
      // pairs on a tiny corpus) are fine, runtime errors are not.
      df.count()
    }
  }

  test("set ops partition: both + segment_only == distinct BUILDING customers") {
    import org.apache.spark.sql.functions.col
    val parts = operators.Relational.qSetOps(spark, sfSmoke).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.tables.Tables.customer(spark, sfSmoke)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).distinct().count()
    assert(parts("both") + parts("segment_only") === total)
  }

  test("sql-text surface matches the equivalent DataFrame spelling") {
    import org.apache.spark.sql.functions._
    import graft.functions._
    val sql = operators.Relational.qSqlSurface(spark, sfSmoke).collect().toSeq
    val df = graft.tables.Tables.orders(spark, sfSmoke)
      .join(graft.tables.Tables.customer(spark, sfSmoke),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(money(col("o_totalprice"))).as("total_value"))
      .orderBy(col("c_mktsegment")).collect().toSeq
    assert(sql === df)
  }
}
