package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Product-analytics surface over the `events` table: cohort retention,
  * ordered funnels, SCD2 history, and robust (median/MAD) outlier
  * screens. These are the "how is the corpus/traffic behaving" queries a
  * data-pipeline team runs next to the corpus-hygiene ones — the same
  * shapes the reference's yearly `legislator_bill_counts` pivot serves
  * (`legislator_bill_counts_run.R:21-38`), generalized to event streams.
  *
  * Scale stance (100 TB): every operator here is groupBy/join on a
  * real key (`user_id`, `event_type`) with map-side partial aggregation;
  * the per-user aggregates and the event scan shuffle on the SAME key so
  * Catalyst reuses one exchange for the self-join patterns. The only
  * deliberately non-scalable piece is the EXACT median in
  * [[medianOutliers]] (per-group value buffering) — the 100 TB spelling
  * is `approx_percentile` (see `TextStats.qApproxQuantiles`); the exact
  * form exists because it is oracle-checkable. Group count there is
  * |event_type| (small), so the buffering is bounded by the largest
  * single type's row count — documented, not hidden.
  */
object Analytics {

  private def tsUs(c: Column): Column = unix_micros(c)

  // ---------------------------------------------------------------------
  // Weekly cohort retention
  // ---------------------------------------------------------------------

  /** Weekly cohort retention matrix: users bucketed by the Monday-start
    * week of their FIRST event; for each (cohort week, week offset), the
    * number of distinct cohort members active that week.
    *
    * Plan: `groupBy(user_id)` for first-seen, then an inner join back to
    * the weekly activity on `user_id` — both sides hash-partition on
    * `user_id`, so the join reuses the aggregate's exchange — then one
    * final shuffle on the (cohort, offset) pair. No window over an
    * unpartitioned frame, no driver collect.
    */
  /** Null-identity guard, applied at EVERY analytics entry: a row
    * missing any identity field (user_id, event_type, ts) participates
    * in NO answer, uniformly across the family. Null VALUES are a
    * different contract, pinned separately: a well-identified event
    * with a null value still counts as an event, and value aggregates
    * skip the null the same way in both engines. Rows lacking identity can
    * neither key a window nor match a join — left in, they form
    * phantom NULL groups in groupBy-shaped operators but silently
    * vanish from join-shaped ones, a per-operator lottery (the
    * BloomDedup null-probe precedent). The family contract, pinned by
    * NullRobustnessSpec: such rows influence NO analytics answer;
    * landing-quality problems belong in a quarantine audit, not
    * smeared into funnel counts. The fixture events table is null-free,
    * so every oracle is unaffected. */
  private def keyed(events: DataFrame, keys: String*): DataFrame =
    events.na.drop(keys.toSeq)

  def retentionCohorts(events0: DataFrame): DataFrame = {
    val events = keyed(events0, "user_id", "event_type", "ts")
    val cohorts = events
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .select(col("user_id"), date_trunc("week", col("first_ts")).as("cohort_w"))
    val weekly = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
    weekly
      .join(cohorts, "user_id")
      .groupBy(
        col("cohort_w"),
        // both sides are week-truncated, so the day diff is an exact
        // multiple of 7; `div` is genuine integer division, matching
        // the oracle's `//` with no float detour
        expr("CAST(datediff(to_date(w), to_date(cohort_w)) div 7 AS BIGINT)")
          .as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(
        date_format(col("cohort_w"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }

  def qRetentionCohorts(spark: SparkSession, dir: String): DataFrame =
    retentionCohorts(Tables.events(spark, dir))
      .orderBy(col("cohort_week"), col("week_offset"))

  /** Retention RATES: the cohort matrix normalized by cohort size.
    * Every cohort member is active in their first week by construction
    * (the cohort week IS their first event's week), so the offset-0
    * count is the size — a first_value window over each cohort's
    * offset-ordered rows, and the rate a count/count rational. */
  def retentionRates(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))
    retentionCohorts(events)
      .withColumn("cohort_size", first(col("n_users")).over(w))
      .withColumn("rate",
        col("n_users").cast("double") / col("cohort_size").cast("double"))
  }

  def qRetentionRates(spark: SparkSession, dir: String): DataFrame =
    retentionRates(Tables.events(spark, dir))
      .orderBy(col("cohort_week"), col("week_offset"))

  // ---------------------------------------------------------------------
  // Ordered funnel
  // ---------------------------------------------------------------------

  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** Strictly-ordered funnel: a user converts stage i+1 only with an
    * event of that type STRICTLY AFTER their stage-i conversion time
    * (earliest-completion semantics: each stage binds to the user's
    * earliest valid timestamp). Returns one row per stage with the
    * surviving user count.
    *
    * Each stage is a `groupBy(user_id)` min joined to the next stage's
    * filtered events on `user_id` — K-1 self-joins all partitioned on
    * the same key, so the exchanges line up; K is the (tiny) stage list,
    * not data-dependent. The final union is K one-row aggregates.
    */
  /** Per-user stage completion times — the funnel's underlying table:
    * one row per (user, reached stage) with the binding timestamp.
    * `windowUs` bounds each conversion: stage i+1 must land within that
    * many µs of the stage-i binding (None = unbounded) — the
    * "converted within 24h" spelling product funnels usually want. */
  def funnelTimes(events: DataFrame,
                  stages: Seq[String] = FunnelStages,
                  windowUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val typed = keyed(events, "user_id", "event_type", "ts").select(
      col("user_id"), col("event_type"), tsUs(col("ts")).as("ts_us"))
    var cur = typed
      .filter(col("event_type") === stages.head)
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("ts_us"))
    val perStage = Seq.newBuilder[DataFrame]
    perStage += cur.select(lit(1L).as("stage_idx"),
      lit(stages.head).as("stage"), col("user_id"), col("ts_us"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val inWindow = windowUs.fold(lit(true))(w =>
        col("ts_us") <= col("prev_us") + w)
      val nxt = typed
        .filter(col("event_type") === st)
        .join(cur.select(col("user_id"), col("ts_us").as("prev_us")), "user_id")
        .where(col("ts_us") > col("prev_us") && inWindow)
        .groupBy(col("user_id"))
        .agg(min(col("ts_us")).as("ts_us"))
      perStage += nxt.select(lit((i + 1).toLong).as("stage_idx"),
        lit(st).as("stage"), col("user_id"), col("ts_us"))
      cur = nxt
    }
    perStage.result().reduce(_ unionAll _)
  }

  /** One row per configured stage ALWAYS — a drained stage reports 0,
    * matching the oracle's ungrouped per-stage aggregates (a groupBy
    * alone would silently drop it and hash-diverge on any corpus where
    * nobody completes the chain). */
  def funnel(events: DataFrame,
             stages: Seq[String] = FunnelStages,
             windowUs: Option[Long] = None): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val frame = stages.zipWithIndex
      .map { case (s, i) => ((i + 1).toLong, s) }
      .toDF("stage_idx", "stage")
    val counts = funnelTimes(events, stages, windowUs)
      .groupBy(col("stage_idx"), col("stage"))
      .agg(count(lit(1)).as("n_counted"))
    frame.join(counts, Seq("stage_idx", "stage"), "left")
      .select(col("stage_idx"), col("stage"),
        coalesce(col("n_counted"), lit(0L)).as("n_users"))
  }

  /** UNORDERED funnel: stage i counts users who performed ALL of the
    * first i stage event types in ANY order — the reach view product
    * tools ship alongside the strictly-ordered funnel (ordered answers
    * "how far does the designed path carry users", unordered "who has
    * the ingredients regardless of sequence"; the gap between them
    * localizes sequence-breakage). One pass: per-user boolean flags
    * via K conditional max-aggregates on the user key, then K
    * conditional sums in ONE ungrouped aggregate — two shuffles total,
    * no joins, K is the tiny stage list. The all-stages-row frame
    * keeps drained stages at 0 (the [[funnel]] precedent). */
  def funnelUnordered(events: DataFrame,
                      stages: Seq[String] = FunnelStages): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    require(stages.distinct.size == stages.size,
      "funnel stages must be distinct")
    val typed = keyed(events, "user_id", "event_type", "ts")
      .filter(col("event_type").isin(stages: _*))
    // flag columns are keyed by stage INDEX, not the stage string —
    // col("_f_" + stage) would parse dots in a stage name as
    // struct-field access and break on inputs funnel() accepts
    val flagCols = stages.zipWithIndex.map { case (s, i) =>
      max(when(col("event_type") === s, 1L).otherwise(0L)).as(s"_f_$i")
    }
    val flags = typed.groupBy(col("user_id"))
      .agg(flagCols.head, flagCols.tail: _*)
    val countCols = stages.indices.map { i =>
      val all = (0 to i).map(j => col(s"_f_$j") === 1L).reduce(_ && _)
      sum(when(all, 1L).otherwise(0L)).as(s"_n_$i")
    }
    val counts = flags.agg(countCols.head, countCols.tail: _*)
    val frame = stages.zipWithIndex
      .map { case (s, i) => ((i + 1).toLong, s) }
      .toDF("stage_idx", "stage")
    frame.crossJoin(broadcast(counts))
      .select(col("stage_idx"), col("stage"),
        stages.indices.foldLeft(lit(0L)) { (acc, i) =>
          when(col("stage_idx") === (i + 1).toLong,
            coalesce(col(s"_n_$i"), lit(0L))).otherwise(acc)
        }.as("n_users"))
  }

  def qFunnelUnordered(spark: SparkSession, dir: String): DataFrame =
    funnelUnordered(Tables.events(spark, dir)).orderBy(col("stage_idx"))

  /** Funnel with a 24-hour conversion window per stage. */
  val FunnelWindowUs: Long = 24L * 3600 * 1000000

  def qFunnelWindowed(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(spark, dir), FunnelStages, Some(FunnelWindowUs))
      .orderBy(col("stage_idx"))

  def qFunnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.events(spark, dir)).orderBy(col("stage_idx"))

  /** Stage-to-stage conversion latency: per adjacent stage pair, the
    * converting population with exact integer-µs gap aggregates (BIGINT
    * sums, rational mean — no order-dependent float accumulation). The
    * lead window rides [[funnelTimes]]'s per-user rows: partitions are
    * at most |stages| rows each. */
  def funnelLatency(events: DataFrame,
                    stages: Seq[String] = FunnelStages): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // one row per configured transition ALWAYS (zero converters -> 0
    // users, NULL gap stats), the oracle's ungrouped aggregate shape
    val frame = stages.zip(stages.tail).zipWithIndex
      .map { case ((a, b), i) => ((i + 1).toLong, s"$a->$b") }
      .toDF("stage_idx", "transition")
    val w = Window.partitionBy(col("user_id")).orderBy(col("stage_idx"))
    val gaps = funnelTimes(events, stages)
      .withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .withColumn("next_stage", lead(col("stage"), 1).over(w))
      .where(col("next_us").isNotNull)
      .withColumn("gap_us", col("next_us") - col("ts_us"))
      .groupBy(col("stage_idx"),
        concat(col("stage"), lit("->"), col("next_stage")).as("transition"))
      .agg(count(lit(1)).as("n_counted"),
        sum(col("gap_us")).as("sum_gap"),
        max(col("gap_us")).as("max_us"))
    frame.join(gaps, Seq("stage_idx", "transition"), "left")
      .select(col("stage_idx"), col("transition"),
        coalesce(col("n_counted"), lit(0L)).as("n_users"),
        (col("sum_gap").cast("double") / col("n_counted")).as("avg_us"),
        col("max_us"))
  }

  def qFunnelLatency(spark: SparkSession, dir: String): DataFrame =
    funnelLatency(Tables.events(spark, dir)).orderBy(col("stage_idx"))

  // ---------------------------------------------------------------------
  // Event-type transition matrix
  // ---------------------------------------------------------------------

  /** First-order Markov transition matrix over each user's event
    * sequence: counts of consecutive (from, to) event-type pairs and the
    * per-from conditional probability (a BIGINT/BIGINT rational — both
    * engines divide the same integers). One per-user lead window, one
    * keyed aggregate, one |types|²-row probability window. */
  def eventTransitions(events0: DataFrame): DataFrame = {
    val events = keyed(events0, "user_id", "event_type", "ts")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val counts = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsUs(col("ts")).as("ts_us"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val byFrom = Window.partitionBy(col("from_type"))
    counts.select(col("from_type"), col("to_type"), col("n_transitions"),
      (col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(byFrom).cast("double")).as("p"))
  }

  def qEventTransitions(spark: SparkSession, dir: String): DataFrame =
    eventTransitions(Tables.events(spark, dir))
      .orderBy(col("from_type"), col("to_type"))

  // ---------------------------------------------------------------------
  // Value histogram
  // ---------------------------------------------------------------------

  val HistBinWidth = 50.0

  /** Fixed-width value histogram per event type: bin index from a
    * map-side `floor(value / width)` (portable double arithmetic — both
    * engines floor the same quotient), with per-bin min/max over the
    * identical value set. No windows, one aggregate — the shape survives
    * any scale. */
  def valueHistogram(events0: DataFrame,
                     width: Double = HistBinWidth): DataFrame = {
    val events = keyed(events0, "user_id", "event_type", "ts")
    events
      .select(col("event_type"),
        floor(col("value") / width).cast("long").as("bin"), col("value"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .withColumn("bin_lo", col("bin") * width)
  }

  def qValueHistogram(spark: SparkSession, dir: String): DataFrame =
    valueHistogram(Tables.events(spark, dir))
      .orderBy(col("event_type"), col("bin"))

  // ---------------------------------------------------------------------
  // SCD2 history
  // ---------------------------------------------------------------------

  /** Slowly-changing-dimension (type 2) history: each (user, event type)
    * stream becomes versioned validity intervals — `valid_from_us` =
    * the event's timestamp, `valid_to_us` = the next event's (NULL while
    * current), `version` = 1-based change sequence. The standard landing
    * shape for attribute streams in a lakehouse dimension table.
    *
    * One window over `(user_id, event_type)` ordered by `(ts_us,
    * event_id)` — the id tie-break pins same-microsecond events to one
    * order in both engines. Single shuffle, no global window.
    */
  def scd2History(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    keyed(events, "user_id", "event_type", "ts")
      .select(col("user_id"), col("event_type"), col("event_id"),
        tsUs(col("ts")).as("ts_us"), col("value"))
      .select(
        col("user_id"), col("event_type"),
        row_number().over(w).cast("long").as("version"),
        col("ts_us").as("valid_from_us"),
        lead(col("ts_us"), 1).over(w).as("valid_to_us"),
        col("value"),
        when(lead(col("ts_us"), 1).over(w).isNull, 1L).otherwise(0L)
          .as("is_current"))
  }

  def qScd2History(spark: SparkSession, dir: String): DataFrame =
    scd2History(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("event_type"), col("version"))

  /** Incremental SCD2 merge: apply a DELTA batch of events (all strictly
    * later than the standing dimension's rows, the append-only landing
    * contract) to an existing [[scd2History]] table WITHOUT recomputing
    * it — at 100 TB the dimension is orders of magnitude larger than a
    * day's delta, so the merge touches the delta, the per-key version
    * head, and the (at most one per touched key) open row; the closed
    * history rows stream through untouched.
    *
    * Three keyed steps, all on the same (user_id, event_type) hash
    * partitioning: the standing per-key MAX version (an aggregate over
    * the dim — in a real lakehouse this is the bucketed dim's metadata),
    * the delta's own window chain continuing that numbering, and the
    * close-the-open-row update driven by each key's first delta
    * timestamp. `merge(history(≤T), delta(>T)) == scd2History(all)` is
    * the operator's contract — the oracle IS the full recompute.
    */
  def scd2Merge(dim: DataFrame, delta: DataFrame): DataFrame = {
    val keys = Seq("user_id", "event_type")
    // delta gets the same guard as the full recompute — the
    // merge ≡ recompute contract must hold on dirty landings too
    val d = keyed(delta, "user_id", "event_type", "ts")
      .select(col("user_id"), col("event_type"), col("event_id"),
        tsUs(col("ts")).as("ts_us"), col("value"))
    val versionHead = dim.groupBy(col("user_id"), col("event_type"))
      .agg(max(col("version")).as("v0"))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    val newRows = d
      .join(versionHead, keys, "left") // new keys start at version 1
      .select(
        col("user_id"), col("event_type"),
        (row_number().over(w).cast("long") + coalesce(col("v0"), lit(0L)))
          .as("version"),
        col("ts_us").as("valid_from_us"),
        lead(col("ts_us"), 1).over(w).as("valid_to_us"),
        col("value"),
        when(lead(col("ts_us"), 1).over(w).isNull, 1L).otherwise(0L)
          .as("is_current"))
    val firstNew = d.groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts_us")).as("first_new_us"))
    val touched = col("is_current") === 1L && col("first_new_us").isNotNull
    val closed = dim
      .join(firstNew, keys, "left")
      .select(
        col("user_id"), col("event_type"), col("version"),
        col("valid_from_us"),
        when(touched, col("first_new_us")).otherwise(col("valid_to_us"))
          .as("valid_to_us"),
        col("value"),
        when(touched, 0L).otherwise(col("is_current")).as("is_current"))
    closed.unionByName(newRows)
  }

  /** Split day for the merge query: history strictly before, delta from
    * it on — mid-corpus so both sides are non-trivial at every SF. */
  val MergeSplit = "2024-01-20 00:00:00"

  def qScd2Merge(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val cut = to_timestamp(lit(MergeSplit))
    scd2Merge(
      scd2History(events.filter(col("ts") < cut)),
      events.filter(col("ts") >= cut))
      .orderBy(col("user_id"), col("event_type"), col("version"))
  }

  // ---------------------------------------------------------------------
  // Median / MAD outlier screen
  // ---------------------------------------------------------------------

  /** Robust per-type outlier screen: exact median and MAD (median
    * absolute deviation), plus the count of values beyond
    * `3 × MAD` of the median. Both stats are rounded to 6 decimals
    * BEFORE the outlier comparison so the classification depends only on
    * digits both engines agree on (exact-percentile interpolation can
    * differ in the last ULP across engines).
    *
    * Scale note: `percentile` is Spark's exact percentile — it buffers
    * each group's values, bounded here by the largest single
    * `event_type`'s rows. That is the deliberate trade for an
    * oracle-checkable answer on a LOW-cardinality dimension; at 100 TB,
    * or on a high-cardinality key, the spelling is `approx_percentile`
    * (see [[TextStats.qApproxQuantiles]]'s t-digest twin). The stats
    * frame is |event_type| rows, so the join back is an explicit
    * broadcast — no second shuffle of the event scan.
    */
  def medianOutliers(events: DataFrame): DataFrame = {
    val typed = keyed(events, "user_id", "event_type", "ts")
      .select(col("event_type"), col("value"))
    val med = typed
      .groupBy(col("event_type"))
      .agg(round(percentile(col("value"), lit(0.5)), 6).as("med"))
    val mad = typed
      .join(broadcast(med), "event_type")
      .select(col("event_type"), col("med"),
        abs(col("value") - col("med")).as("adev"))
      .groupBy(col("event_type"))
      .agg(first(col("med")).as("med"),
        round(percentile(col("adev"), lit(0.5)), 6).as("mad"))
    typed
      .join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(abs(col("value") - col("med")) > col("mad") * 3.0, 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  def qMedianOutliers(spark: SparkSession, dir: String): DataFrame =
    medianOutliers(Tables.events(spark, dir)).orderBy(col("event_type"))

  // ---------------------------------------------------------------------
  // Last-touch attribution
  // ---------------------------------------------------------------------

  /** Last-touch purchase attribution: each purchase credits the user's
    * most recent STRICTLY-prior click (any lookback — the unbounded
    * complement of the 30-minute interval-join attribution in
    * `Events.purchaseClickJoin`); purchases with no prior click surface
    * with a NULL `click_id` — the "organic" bucket an attribution
    * report must not silently drop.
    *
    * One window over `(user_id, ts, event_id)` — `last(...ignoreNulls)`
    * over the strictly-preceding frame carries the click forward, so
    * the plan is a single shuffle on `user_id` with no self-join and no
    * state proportional to the click history (the running `last` is one
    * value per row). Ordering ties break on `event_id`, so the credited
    * click is deterministic even for equal timestamps. Emitted values
    * are ids and integer microsecond gaps — no float arithmetic.
    */
  def lastTouchAttribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed(events, "user_id", "event_type", "ts")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("click_us",
        last(when(col("event_type") === "click", tsUs(col("ts"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"),
        col("click_id"), (tsUs(col("ts")) - col("click_us")).as("gap_us"))
  }

  def qLastTouch(spark: SparkSession, dir: String): DataFrame =
    lastTouchAttribution(Tables.events(spark, dir)).orderBy(col("event_id"))

  /** First-touch twin of [[lastTouchAttribution]]: each purchase
    * credits the user's EARLIEST strictly-prior click — the acquisition
    * view, where last-touch is the conversion view; marketing reports
    * ship both and the delta between them is the report. Identical
    * plan shape (`first(..., ignoreNulls)` over the same strictly-prior
    * running frame — still one value per row, no join), so the two
    * reports share one shuffle when computed together. */
  def firstTouchAttribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed(events, "user_id", "event_type", "ts")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value"))
      .withColumn("click_id",
        first(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("click_us",
        first(when(col("event_type") === "click", tsUs(col("ts"))),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"),
        col("click_id"), (tsUs(col("ts")) - col("click_us")).as("gap_us"))
  }

  def qFirstTouch(spark: SparkSession, dir: String): DataFrame =
    firstTouchAttribution(Tables.events(spark, dir)).orderBy(col("event_id"))

  // ---------------------------------------------------------------------
  // Growth accounting
  // ---------------------------------------------------------------------

  /** Weekly growth accounting: every active (user, week) labeled
    * `new` (first-ever week), `retained` (active the immediately
    * previous week) or `resurrected` (active before, but with a gap),
    * plus the week's `n_churning` — users active now whose NEXT active
    * week is not the adjacent one (the last observed week therefore
    * counts everyone, the standard right-censoring caveat). These four
    * counts are the growth-team identity: WAU(w) = new + retained +
    * resurrected, and WAU(w+1) = WAU(w) − churning(w) + new(w+1) +
    * resurrected(w+1).
    *
    * Weeks become DENSE integers (Monday-epoch day diff `div` 7 — pure
    * integer arithmetic, same spelling as the oracle) so adjacency is
    * `wi − 1`, not date arithmetic in the window. One distinct over
    * (user, week), one per-user lag/lead window, one week aggregate —
    * two key shuffles total, both on real keys. */
  def growthAccounting(events: DataFrame): DataFrame = {
    val weekly = keyed(events, "user_id", "event_type", "ts")
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .distinct()
      .withColumn("wi",
        expr("CAST(datediff(to_date(w), DATE '1970-01-05') div 7 AS BIGINT)"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("wi"))
    weekly
      .withColumn("prev", lag(col("wi"), 1).over(byUser))
      .withColumn("next", lead(col("wi"), 1).over(byUser))
      .withColumn("state",
        when(col("prev").isNull, "new")
          .when(col("prev") === col("wi") - 1L, "retained")
          .otherwise("resurrected"))
      .groupBy(col("wi"))
      .agg(
        sum(when(col("state") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("state") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("state") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"),
        sum(when(col("next").isNull || col("next") > col("wi") + 1L, 1L)
          .otherwise(0L)).as("n_churning"))
  }

  def qGrowthAccounting(spark: SparkSession, dir: String): DataFrame =
    growthAccounting(Tables.events(spark, dir)).orderBy(col("wi"))

  // ---------------------------------------------------------------------
  // DAU/WAU stickiness
  // ---------------------------------------------------------------------

  /** Daily stickiness: DAU, trailing-7-day WAU, and their ratio per
    * observed day. WAU comes from the scatter spelling — each active
    * (user, day) contributes membership to the 7 target days it covers
    * (`explode(sequence(0,6))` + date_add), then one distinct and one
    * count — NOT a day-range self-join, which at 100 TB re-scans the
    * activity table per day with a non-equi predicate. The scatter is
    * a fixed ×7 map-side expansion on one (user, day) shuffle.
    *
    * Days with zero activity have no row (DAU = 0 ⇒ undefined ratio);
    * WAU is reported only for days that appear, keyed by the inner
    * join back to DAU. The ratio is one double division of two exact
    * integers — portable. */
  def stickiness(events: DataFrame): DataFrame = {
    val daily = keyed(events, "user_id", "event_type", "ts")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val dau = daily.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val wau = daily
      .select(col("user_id"),
        explode(sequence(lit(0), lit(6))).as("i"), col("d"))
      .select(col("user_id"), date_add(col("d"), col("i")).as("d"))
      .distinct()
      .groupBy(col("d")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "d")
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau").cast("double"))
          .as("stickiness"))
  }

  def qStickiness(spark: SparkSession, dir: String): DataFrame =
    stickiness(Tables.events(spark, dir)).orderBy(col("day"))

  // ---------------------------------------------------------------------
  // Top user journeys
  // ---------------------------------------------------------------------

  val JourneyLen = 5
  val JourneyTopK = 20

  /** Path analysis: the `topK` most common event-type journeys, where a
    * journey is each user's first `len` events joined `a>b>c`. The
    * canonical "how do users actually start" report, and the input to
    * any funnel-design review.
    *
    * The first-N filter is a per-user `row_number` ≤ len — WindowGroupLimit
    * prunes rank > len before the sort buffers them — and the journey
    * string assembles from `sort_array(collect_list(struct(rn, type)))`,
    * whose per-user array is BOUNDED by len (never a whole history;
    * that cap is what makes collect_list safe here). Both aggregates
    * key on `user_id`, so the second reuses the first's exchange; the
    * final journey count is its own keyed aggregate with a TakeOrdered
    * top-k. Ties break on the journey string. */
  def topJourneys(events: DataFrame,
                  len: Int = JourneyLen,
                  topK: Int = JourneyTopK): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val journeys = keyed(events, "user_id", "event_type", "ts")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(byUser))
      .where(col("rn") <= len)
      .groupBy(col("user_id"))
      .agg(concat_ws(">",
        transform(sort_array(collect_list(struct(col("rn"), col("event_type")))),
          s => s.getField("event_type"))).as("journey"))
    journeys.groupBy(col("journey"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("journey"))
      .limit(topK)
  }

  def qTopJourneys(spark: SparkSession, dir: String): DataFrame =
    topJourneys(Tables.events(spark, dir))
      .orderBy(col("n_users").desc, col("journey"))

  // ---------------------------------------------------------------------
  // Distribution drift report
  // ---------------------------------------------------------------------

  /** Value-distribution drift between the stream's two time halves: the
    * data-quality screen run before trusting a pipeline change — per
    * value bin, each half's share and the share RATIO (the log-free,
    * hence bit-portable, per-bin core of a PSI report; the monotone
    * log/weighting is a read-time decoration). The split point is the
    * stream's own midpoint timestamp (integer µs arithmetic, no wall
    * clock), bins reuse [[valueHistogram]]'s map-side floor(value/width).
    * Null ratio = the bin is NEW in the second half — the exact rows a
    * drift alert must not average away.
    *
    * One 1-row min/max broadcast, one binned aggregate, one 1-row
    * totals broadcast — the event scan shuffles once on `bin`. */
  def valueDrift(events: DataFrame,
                 width: Double = HistBinWidth): DataFrame = {
    val base = keyed(events, "user_id", "event_type", "ts")
      .select(col("value"), tsUs(col("ts")).as("us"))
      .where(col("value").isNotNull)
    val mid = base.agg(expr("(min(us) + max(us)) div 2").as("mid_us"))
    val binned = base.crossJoin(broadcast(mid))
      .select(floor(col("value") / width).cast("long").as("bin"),
        when(col("us") < col("mid_us"), 1L).otherwise(0L).as("in_a"))
    val counts = binned.groupBy(col("bin"))
      .agg(sum(col("in_a")).as("n_a"),
        sum(lit(1L) - col("in_a")).as("n_b"))
    val totals = counts.agg(sum(col("n_a")).as("tot_a"),
      sum(col("n_b")).as("tot_b"))
    counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_a"), col("n_b"),
        (col("n_a").cast("double") / col("tot_a").cast("double"))
          .as("share_a"),
        (col("n_b").cast("double") / col("tot_b").cast("double"))
          .as("share_b"))
      .withColumn("drift_ratio",
        when(col("n_a") > 0L, col("share_b") / col("share_a")))
  }

  def qValueDrift(spark: SparkSession, dir: String): DataFrame =
    valueDrift(Tables.events(spark, dir)).orderBy(col("bin"))

  /** Power-user concentration: what share of all events comes from the
    * users STRICTLY above the 90th percentile of per-user activity —
    * the "1% rule" readout that tells a capacity planner whether load
    * is broad or a handful of whales. The top set is defined by the
    * percentile THRESHOLD (rounded 6dp, the [[medianOutliers]] rule),
    * not by rank: a rank cut needs a global sort with arbitrary tie
    * outcomes, where the threshold cut is deterministic and one
    * broadcast compare. Exact percentile buffers the per-USER count
    * frame (|users|, the RFM trade); everything else is exact longs
    * and one final division. */
  def powerUsers(events: DataFrame): DataFrame = {
    val per = keyed(events, "user_id", "event_type", "ts")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val thr = per.agg(
      round(percentile(col("n_events"), lit(0.9)), 6).as("p90"))
    per.crossJoin(broadcast(thr))
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("n_events") > col("p90"), 1L).otherwise(0L))
          .as("n_top_users"),
        sum(col("n_events")).as("total_events"),
        sum(when(col("n_events") > col("p90"), col("n_events"))
          .otherwise(0L)).as("top_events"))
      .withColumn("top_share",
        col("top_events").cast("double") / col("total_events").cast("double"))
  }

  def qPowerUsers(spark: SparkSession, dir: String): DataFrame =
    powerUsers(Tables.events(spark, dir))

  /** Week-1 retention by ACQUISITION CHANNEL — the user's first event
    * type standing in for the acquiring channel (the first-touch idea
    * applied to retention): per channel, cohort size, how many were
    * active again the immediately following week, and the rational
    * retention rate. The report that decides which acquisition source
    * deserves budget — volume and stickiness on one row.
    *
    * The first event comes from the same ranked frame the journey
    * operators use (`row_number = 1`, deterministic via the event_id
    * tie-break); week-1 activity is a semi-join of the user's distinct
    * week set against first_week + 7 days — all `user_id`-keyed until
    * the final |channels|-row aggregate. */
  def channelRetention(events0: DataFrame): DataFrame = {
    val events = keyed(events0, "user_id", "event_type", "ts")
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val first = events
      .withColumn("rn", row_number().over(byUser))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("channel"),
        date_trunc("week", col("ts")).as("w0"))
    val weekly = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .distinct()
    first
      .join(weekly, Seq("user_id"), "left")
      .groupBy(col("channel"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(
          when(to_date(col("w")) === date_add(to_date(col("w0")), 7),
            col("user_id"))).as("n_retained_w1"))
      .withColumn("retention_w1",
        col("n_retained_w1").cast("double") / col("n_users").cast("double"))
  }

  def qChannelRetention(spark: SparkSession, dir: String): DataFrame =
    channelRetention(Tables.events(spark, dir)).orderBy(col("channel"))

  val PrefixLen = 2

  /** Conversion by journey prefix: for each first-`len`-events path,
    * how many users start that way and how many later purchase — the
    * outcome column [[topJourneys]] lacks, and the evidence for
    * reordering onboarding steps. "Later" is STRICTLY after the
    * prefix's last event in (ts, event_id) order, so a purchase inside
    * the prefix does not count itself as its own conversion.
    *
    * Same bounded shapes as the journey report: `row_number ≤ len`
    * prune, a len-bounded `collect_list` per user (with the prefix's
    * closing rank carried alongside), and one per-user any-later-
    * purchase flag from the SAME ranked frame — both aggregates key on
    * `user_id`, then one final keyed count. The rate is a rational of
    * two exact counts. */
  def journeyConversion(events: DataFrame,
                        len: Int = PrefixLen): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ranked = keyed(events, "user_id", "event_type", "ts")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(byUser))
    val prefixes = ranked
      .where(col("rn") <= len)
      .groupBy(col("user_id"))
      .agg(
        concat_ws(">",
          transform(sort_array(collect_list(struct(col("rn"), col("event_type")))),
            s => s.getField("event_type"))).as("prefix"),
        max(col("rn")).as("prefix_end"))
    val converted = ranked
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(col("rn")).as("last_purchase_rn"))
    prefixes
      .join(converted, Seq("user_id"), "left")
      .withColumn("converted",
        (col("last_purchase_rn") > col("prefix_end")).cast("long"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("converted"), lit(0L))).as("n_converted"))
      .withColumn("conversion_rate",
        col("n_converted").cast("double") / col("n_users").cast("double"))
  }

  def qJourneyConversion(spark: SparkSession, dir: String): DataFrame =
    journeyConversion(Tables.events(spark, dir)).orderBy(col("prefix"))

  // ---------------------------------------------------------------------
  // RFM segmentation
  // ---------------------------------------------------------------------

  /** RFM segmentation: purchasers split into the 8 median-threshold
    * (recency, frequency, monetary) octants, with the user count per
    * octant. Three portability choices: monetary is the decimal-exact
    * [[graft.functions.moneySum]] (a raw double sum would be
    * partition-order-dependent); recency is INTEGER day arithmetic off
    * the stream's own max timestamp (no wall clock — reruns are
    * bit-identical); the medians round to 6 decimals BEFORE the
    * threshold compare (the [[medianOutliers]] rule — exact-percentile
    * interpolation can differ in the last ULP across engines).
    *
    * One keyed aggregate builds the per-user frame; the global max and
    * the 3-median frame are 1-row broadcasts; the octant count is a
    * ≤8-group aggregate. The exact `percentile` buffers the per-user
    * frame's values — bounded by |purchasers|, the same deliberate
    * exact-vs-approx trade as [[medianOutliers]], and
    * `approx_percentile` is the swap at 100 TB. */
  def rfmSegments(events: DataFrame): DataFrame = {
    val p = keyed(events, "user_id", "event_type", "ts")
      .filter(col("event_type") === "purchase")
    val nowUs = p.agg(max(tsUs(col("ts"))).as("now_us"))
    val per = p.groupBy(col("user_id"))
      .agg(
        max(tsUs(col("ts"))).as("last_us"),
        count(lit(1)).as("frequency"),
        graft.functions.moneySum(graft.functions.money(col("value")))
          .as("monetary"))
      .crossJoin(broadcast(nowUs))
      .withColumn("recency_days",
        expr("(now_us - last_us) div 86400000000"))
    val meds = per.agg(
      round(percentile(col("recency_days"), lit(0.5)), 6).as("med_r"),
      round(percentile(col("frequency"), lit(0.5)), 6).as("med_f"),
      round(percentile(col("monetary"), lit(0.5)), 6).as("med_m"))
    per.crossJoin(broadcast(meds))
      .select(
        (col("recency_days") <= col("med_r")).cast("long").as("r_hi"),
        (col("frequency") >= col("med_f")).cast("long").as("f_hi"),
        (col("monetary") >= col("med_m")).cast("long").as("m_hi"))
      .groupBy(col("r_hi"), col("f_hi"), col("m_hi"))
      .agg(count(lit(1)).as("n_users"))
  }

  def qRfmSegments(spark: SparkSession, dir: String): DataFrame =
    rfmSegments(Tables.events(spark, dir))
      .orderBy(col("r_hi"), col("f_hi"), col("m_hi"))
}
