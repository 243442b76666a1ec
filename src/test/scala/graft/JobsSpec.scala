package graft

import org.apache.spark.sql.functions._

/** Config-driven pipeline runners: defaults reproduce the contract
  * queries; each flag changes exactly its documented scope. */
class JobsSpec extends SparkSpec {
  import spark.implicits._

  test("defaults reproduce the contract query results") {
    val viaJobs = Jobs.billSearch(spark)
      .orderBy("session", "bill_number").collect().toSeq
    val contract = SparkEntry.queries("q_bill_search")(spark, sfSmoke)
      .collect().toSeq
    assert(viaJobs === contract)
  }

  test("session scoping restricts every output row to the listed sessions") {
    val cfg = JobConfig(sessions = Some(Seq("2019-2020")))
    val counts = Jobs.legislatorCounts(spark, cfg)
    // scoped run: no 2017-2018 or 2021-2022 credits can appear
    val bad = counts.filter(col("s2017_2018") > 0 || col("s2021_2022") > 0)
    assert(bad.count() === 0)
    assert(counts.agg(sum("s2019_2020")).head.getLong(0) > 0)
  }

  test("budgetOnly restricts the full-text corpus to budget-listed bills") {
    val all = Jobs.fullTextSearch(spark)
      .select("file").distinct().as[String].collect().toSet
    val budget = Jobs.fullTextSearch(spark, JobConfig(budgetOnly = true))
      .select("file").distinct().as[String].collect().toSet
    assert(budget.subsetOf(all))
    assert(budget.nonEmpty && budget.size < all.size)
  }

  test("allBills admits non-B bill types into the counts") {
    val restricted = Jobs.legislatorCounts(spark, JobConfig(allBills = false))
      .agg(sum("total")).head.getLong(0)
    val admitted = Jobs.legislatorCounts(spark, JobConfig(allBills = true))
      .agg(sum("total")).head.getLong(0)
    assert(admitted >= restricted)
  }
}
