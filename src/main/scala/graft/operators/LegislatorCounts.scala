package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Fixtures

/** Entry point B — legislator productivity
  * (reference: `legislator_bill_counts_run.R`, traced in SURVEY §3.2).
  *
  * The reference's hardest semantics, preserved exactly:
  *  - keep-latest dedup: people sorted session-desc, first occurrence per
  *    person wins (O2, `:65-67`) — a `row_number` window, NOT
  *    `dropDuplicates` (which has no ordering guarantee);
  *  - sponsor resolution with fallback (J2, `:114-122`): every KNOWN
  *    primary sponsor (`sponsor_type_id == 1`, resolved against the
  *    deduped legislators table) of a passed bill gets credit (a
  *    multi-primary bill counts for each matched legislator, once); when
  *    NO primary id resolves — no primaries at all, or none of them
  *    known — the bill falls back to its FIRST listed sponsor; bills
  *    whose fallback is also unknown are dropped;
  *  - session pivot as static conditional aggregates (A1, `:124` — static
  *    schema: no two-pass `.pivot()` value scan at 100 TB);
  *  - Total / YearsInData / BillsPerYear with the R `0/0 → NaN` edge
  *    pinned (A2–A4, `:139-143`): zero-bill legislators get NaN, which
  *    Spark's double `0.0/0.0` produces natively;
  *  - Chamber/District recodes (F5, `:146-147`), committee drop (P7,
  *    `:150`), id-column drop (P9, `:153`).
  *
  * Scale: bills side is filter-pushed then exploded only on the (tiny)
  * sponsor arrays; one shuffle for the per-person aggregate; the
  * legislators side is bounded (~10² rows/state) so AQE broadcasts the
  * join. No driver-side loops.
  */
object LegislatorCounts {

  /** Known session labels — the static pivot column set. */
  val sessionLabels: Seq[String] = Seq("2017-2018", "2019-2020", "2021-2022")
  def sessionCol(label: String): String = "s" + label.replace('-', '_')

  /** O2: one row per person, attributes from their most recent session. */
  def latestPeople(people: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("people_id")).orderBy(col("session").desc)
    people.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
  }

  /** J2: resolved (sponsor person, session, bill) credit rows.
    *
    * The reference's match rule (`legislator_bill_counts_run.R:114-122`)
    * is `matched <- legislators$id %in% primary_ids`, falling back to
    * `%in% sponsors$people_id[1]` when `sum(matched) == 0` — i.e. credit
    * every primary sponsor that RESOLVES against the known-legislator
    * table; if none resolves (no primaries, or all of them unknown ids),
    * fall back to the first listed sponsor, and drop the bill if that is
    * unknown too. `%in%` is a per-legislator boolean, so a duplicated
    * primary id credits once — `array_intersect` reproduces both the
    * resolve filter and that dedup.
    *
    * Scale: the known-id set is the bounded legislators dimension
    * (~10² rows/state) collapsed to ONE single-row array and broadcast —
    * a BroadcastNestedLoopJoin of 1 row, no shuffle, no driver collect.
    */
  def sponsorCredits(bills: DataFrame, people: DataFrame,
                     allBills: Boolean): DataFrame = {
    val known = broadcast(
      latestPeople(people).agg(collect_set(col("people_id")).as("known_ids")))
    val sess = Fixtures.sessionLabel.as("sess")
    val primaries = filter(col("sponsors"), s => s("sponsor_type_id") === 1)
    val matchedPrim = array_intersect(
      transform(primaries, s => s("people_id")), col("known_ids"))
    val fallback = array_intersect(
      transform(slice(col("sponsors"), 1, 1), s => s("people_id")), col("known_ids"))
    val creditIds = when(size(matchedPrim) > 0, matchedPrim).otherwise(fallback)
    bills
      // P4 parameterized type filter + P5 passed filter
      .filter((lit(allBills) || col("bill_type") === "B") && col("status") === 4)
      // nested-struct fields are extracted BEFORE the join: keeps the scan
      // projection narrow (and sidesteps Catalyst's nested-column aliasing
      // mishandling extraction through a BroadcastNestedLoopJoin)
      .select(sess, col("bill_number"), col("status_date"), col("title"),
        col("description"), col("sponsors"))
      .crossJoin(known)
      .select(col("sess"), col("bill_number"), col("status_date"), col("title"),
        col("description"), explode(creditIds).as("people_id"))
  }

  /** Full pipeline: wide per-legislator productivity frame. */
  def counts(people: DataFrame, bills: DataFrame, allBills: Boolean): DataFrame = {
    val credits = sponsorCredits(bills, people, allBills)
    val pivots: Seq[Column] = sessionLabels.map(l =>
      sum(when(col("sess") === l, 1L).otherwise(0L)).as(sessionCol(l)))
    val perPerson = credits.groupBy(col("people_id")).agg(pivots.head, pivots.tail: _*)
    val sCols = sessionLabels.map(sessionCol)
    val total = sCols.map(col).reduce(_ + _)
    val years = sCols.map(c => when(col(c) > 0, 1).otherwise(0)).reduce(_ + _) * 2
    latestPeople(people)
      .join(perPerson, Seq("people_id"), "left")
      .na.fill(0L, sCols)
      .withColumn("total", total)
      .withColumn("years_in_data", years)
      // A4: 0/0 → NaN (R parity). Spark 4 runs ANSI mode by default, where
      // even double division by zero raises, so the edge is pinned with an
      // explicit NaN branch rather than relying on IEEE semantics.
      .withColumn("bills_per_year",
        when(col("years_in_data") === 0, lit(Double.NaN))
          .otherwise(col("total").cast("double") / col("years_in_data").cast("double")))
      .withColumn("chamber", when(col("role") === "Rep", "Asm").otherwise(col("role")))
      .withColumn("district", regexp_replace(col("district"), "^HD-", "AD-"))
      .filter(col("committee_id") === 0)
      .select((Seq("name", "chamber", "district") ++ sCols ++
        Seq("total", "years_in_data", "bills_per_year")).map(col): _*)
  }

  /** Dedicated O2 entry: the deduped one-row-per-person frame itself
    * (most-recent session wins — `legislator_bill_counts_run.R:65-67`). */
  def qLatestPeople(spark: SparkSession, dir: String): DataFrame =
    latestPeople(Fixtures.people(spark))
      .select(col("people_id"), col("name"), col("role"), col("district"),
        col("committee_id"), col("session"))
      .orderBy(col("people_id"))

  /** Driver-contract query (all_bills = false, the reference default). */
  def qLegislatorCounts(spark: SparkSession, dir: String): DataFrame =
    counts(Fixtures.people(spark), Fixtures.bills(spark), allBills = false)
      .orderBy(col("name"), col("district"), col("chamber"), col("total"))

  /** P8: the special-legislator side branch (`:127-134`) — the bill list
    * behind one legislator's counts, from the same credit rows. */
  def qDoddSideBranch(spark: SparkSession, dir: String): DataFrame =
    sponsorCredits(Fixtures.bills(spark), Fixtures.people(spark), allBills = false)
      .filter(col("people_id") === graft.sources.FixtureGen.specialPersonId)
      .select(col("sess").as("session"), col("bill_number"), col("status_date"),
        col("title"), col("description"))
      .orderBy(col("session"), col("bill_number"))
}
