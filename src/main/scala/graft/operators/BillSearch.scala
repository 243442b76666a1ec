package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Fixtures

/** Entry point A — metadata keyword search over all bills
  * (reference: `legiscan_search_all_bills.R`, traced in SURVEY §3.1).
  *
  * Semantics preserved exactly:
  *  - 6-field projection at the scan, incl. nested struct + array-head
  *    (P1/P2, `legiscan_search_all_bills.R:81-86`);
  *  - disjunctive CASE-SENSITIVE stem match over title OR description
  *    (J4/F2, `:88-93` — the reference's `grepl` here has no
  *    `ignore.case`, unlike the full-text pipeline's F1; the asymmetry is
  *    intentional and kept);
  *  - URL fragment strip (F4, `:98`).
  *
  * Scale: one narrow scan→project→filter chain, no shuffle until the
  * optional sort; predicates/projection push into the source. The JSON
  * tree is line-mode (splittable), so the scan parallelizes per file
  * block rather than per file.
  */
object BillSearch {

  /** Default term set mirrors the reference's example config
    * (`legiscan_search_all_bills.R:52`). */
  val defaultTerms: Seq[String] = Seq("affordab", "cost")

  def search(bills: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "at least one search term")
    val projected = bills.select(
      col("bill_number"),
      col("session.session_name").as("session"),
      col("status"),
      // try_element_at: a bill with no text versions yet (real in landed
      // LegiScan data) yields a null link; plain element_at would abort
      // the whole query under ANSI mode
      try_element_at(col("texts.state_link"), lit(1)).as("link"),
      col("title"),
      col("description"))
    val anyTerm = terms
      .map(t => projected("title").contains(t) || projected("description").contains(t))
      .reduce(_ || _)
    projected
      .filter(anyTerm)
      .withColumn("link", regexp_replace(col("link"), "#.+$", ""))
  }

  /** Driver-contract query: search over the raw JSON tree (S4 source),
    * deterministically ordered for the oracle compare. */
  def qBillSearch(spark: SparkSession, dir: String): DataFrame =
    search(Fixtures.billsJson(spark), defaultTerms)
      .orderBy(col("session"), col("bill_number"))

  /** S9/F14: single-file CSV sink with a run-id-carrying filename, the
    * reference's output convention (`legiscan_search_all_bills.R:99` —
    * minus its trailing-dot `.csv.` quirk, SURVEY §7.4). `coalesce(1)`
    * is for small result exports only; large outputs should drop it and
    * write a directory of parts.
    */
  def writeCsv(df: DataFrame, outDir: String, runId: String, name: String): String = {
    val path = s"$outDir/${runId}_$name"
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
    path
  }
}
