package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.functions._
import graft.tables.Tables

/** Event-stream surface over the `events` table.
  *
  * The same windowed-aggregation transform serves both execution modes:
  * [[windowedCounts]] applied to a batch DataFrame is the oracle-checked
  * query; applied to a `readStream` source (see [[streamingCounts]] and
  * the spec) it is a Structured Streaming job with a watermark. Keeping
  * one transform for both is the point — Structured Streaming's model is
  * "a streaming DataFrame is a table being continuously appended".
  *
  * Scale: tumbling-window groupBy shuffles on (window, event_type) with
  * map-side partial aggregation; watermark bounds state. The JSON props
  * column is decoded with `from_json` + a pinned one-field schema (F13 —
  * schema inference over a stream is impossible anyway).
  */
object Events {

  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** Tumbling 1-hour counts + exact value sums per event type. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        moneySum(money(col("value"))).as("sum_value"))
      // rendered as a string: Spark timestamps are tz-aware (arrow
      // timestamp[us, UTC]) while DuckDB's are naive — a typed compare
      // would fail on the annotation alone.
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  def qEventsWindow(spark: SparkSession, dir: String): DataFrame =
    windowedCounts(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** Sliding 1-hour / 30-minute counts — every event lands in exactly
    * two overlapping windows. Spark's `window()` and DuckDB's
    * `time_bucket` are both :00/:30-aligned for a 30-minute slide, so
    * the batch twin is oracle-checkable. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"))

  def qEventsSliding(spark: SparkSession, dir: String): DataFrame =
    slidingCounts(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** Streaming twin of the sliding counts (same transform + watermark). */
  def streamingSlidingCounts(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.eventsRaw(spark, dir).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    slidingCounts(Tables.normalizeEvents(stream).withWatermark("ts", "2 hours"))
  }

  /** Streaming exact dedup on event id: duplicate deliveries (at-least-
    * once sources redeliver) are dropped statefully, with state BOUNDED
    * by the watermark — `dropDuplicatesWithinWatermark` evicts a seen-id
    * entry once the watermark passes it, where plain `dropDuplicates`
    * on a stream grows state forever. The corpus-ingest twin of the
    * batch exact-dedup operator. */
  def streamingDedup(spark: SparkSession, watchDir: String,
                     schema: StructType): DataFrame = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(watchDir)
    Tables.normalizeEvents(stream)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
  }

  /** Stream-stream interval join: the purchases stream joined to the
    * clicks stream on user within a trailing 30-minute window — the
    * streaming twin of [[graft.operators.AsofJoin.rangeJoin]]'s
    * semantics. BOTH sides carry watermarks and the join condition
    * time-bounds both event times, so Spark can evict each side's
    * buffered state once the watermark passes it — the two requirements
    * that make stream-stream joins memory-bounded. */
  def streamingPurchaseClicks(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.eventsRaw(spark, dir).schema
    def src = Tables.normalizeEvents(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = src.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_id"), col("c_id"))
  }

  /** HLL approximate distinct users per event type, alongside the exact
    * count. The sketch is what a 100-TB cardinality readout uses —
    * mergeable, fixed memory per group, map-side partial — where exact
    * countDistinct must shuffle every distinct (type, user) pair. The
    * HLL encoding is engine-specific, so this entry has NO portable
    * oracle (rows-only gate); StreamingSpec pins the error envelope
    * against the exact count instead. */
  val ApproxRsd = 0.05
  def qApproxUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), ApproxRsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("event_type"))

  /** Rolling 5-event average value per user — the rows-frame window
    * class (the other window entries cover ranking and running-sum
    * frames). Frame order is pinned by (ts_us, event_id) so ties are
    * deterministic. The aggregate runs as an EXACT decimal sum divided
    * by the frame count: windowed double-sums are order-sensitive AND
    * engines differ in sliding-aggregate algorithms (subtract-on-slide
    * vs recompute), so a double sum would drift in the last ULP. */
  def rollingAvgValue(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-4, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        money(col("value")).as("value_d"))
      .withColumn("rolling_avg_5",
        sum(col("value_d")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("rolling_avg_5"))
  }

  def qRollingAvg(spark: SparkSession, dir: String): DataFrame =
    rollingAvgValue(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))

  /** Inter-event gaps + quartile bucketing per user — the offset/rank
    * window family the other entries don't touch (`lag`, `ntile`,
    * `first_value`). One shuffle on user_id, partition-local sort, all
    * three functions share the single window. Gap parity is exact:
    * both engines diff MICROsecond epochs as BIGINT (the ns→µs
    * truncation matches [[graft.tables.Tables.events]]'s loader);
    * the first event's gap is a genuine NULL on both sides. */
  def qEventGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("q", ntile(4).over(w).cast("long"))
      .withColumn("first_type", first(col("event_type")).over(w))
      .select(col("user_id"), col("event_id"),
        col("gap_us"), col("q"), col("first_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Hourly resample with gap filling — densify event counts onto a
    * complete hour spine so silent hours read as explicit zeros (the
    * time-series readout `q_full_outer`'s sparse join can't give).
    * The spine is `explode(sequence(min, max, 1 hour))` off a one-row
    * bounds aggregate: its row count is bounded by CALENDAR TIME, not
    * data size (a decade is <10^5 hours), so the single-task generate
    * is a bounded operator, not a scale risk; the left join back to
    * the hourly aggregate is spine-side-tiny and AQE-broadcast. */
  def resampleHourly(events: DataFrame): DataFrame = {
    val ev = events
      .select(date_trunc("hour", col("ts")).as("hour"), col("value"))
    val counts = ev.groupBy(col("hour"))
      .agg(count(lit(1)).as("n_events"),
        moneySum(money(col("value"))).as("sum_value"))
    val spine = ev.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("hour"))
    spine.join(counts, Seq("hour"), "left")
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
  }

  def qResampleHourly(spark: SparkSession, dir: String): DataFrame =
    resampleHourly(Tables.events(spark, dir)).orderBy(col("hour"))

  /** Trailing-day anomaly screen over the gap-filled hourly series: each
    * hour's count against the mean/variance of the PRIOR 24 hours
    * (exclusive frame — the tested point never contaminates its own
    * baseline). The rolling stats are INTEGER window sums (n, Σx, Σx²),
    * so mean and variance are rationals both engines derive from the
    * same BIGINTs, and z = (x−μ)/σ is identical IEEE arithmetic — no
    * order-dependent float accumulation anywhere. The window is global
    * but bounded by CALENDAR TIME like the spine itself (<10⁵ rows per
    * decade) — the same documented O(time) exception as the resample.
    * Hours with var=0 (flat baseline) report a NULL z and never flag. */
  def qHourlyAnomaly(spark: SparkSession, dir: String): DataFrame =
    hourlyAnomaly(Tables.events(spark, dir)).orderBy(col("hour"))

  def hourlyAnomaly(events: DataFrame): DataFrame = {
    val w = Window.orderBy(col("hour")).rowsBetween(-24, -1)
    val n = col("n_events")
    resampleHourly(events)
      .select(col("hour"), n)
      .withColumn("n_prior", count(lit(1)).over(w))
      .withColumn("sum_prior", sum(n).over(w))
      .withColumn("sumsq_prior", sum(n * n).over(w))
      .where(col("n_prior") === 24)
      .withColumn("mean24", col("sum_prior").cast("double") / 24d)
      .withColumn("var24",
        (lit(24L) * col("sumsq_prior") - col("sum_prior") * col("sum_prior"))
          .cast("double") / 576d)
      .withColumn("z", when(col("var24") > 0d,
        (n.cast("double") - col("mean24")) / sqrt(col("var24"))))
      // flat baseline (var 0): z is undefined, but ANY deviation from a
      // perfectly constant prior day is anomalous — without this branch
      // a spike over a flat baseline is invisible to the pure z-score
      .withColumn("is_anomaly",
        when(col("var24") > 0d,
          when(abs(col("z")) > 2d, 1L).otherwise(0L))
        .otherwise(
          when(n.cast("double") =!= col("mean24"), 1L).otherwise(0L)))
      .select(col("hour"), n, col("mean24"), col("z"), col("is_anomaly"))
  }

  /** ROLLUP hierarchy (type → type×hour → grand total) as one pass —
    * the multi-level aggregation class. Spark plans a single Expand +
    * hash aggregate (still partial/map-side), not one job per level.
    * Subtotal rows carry nulls; the final sort pins NULLS FIRST
    * explicitly because engines disagree on default null order. */
  def qEventsRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .rollup(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("hour"))

  /** CUBE — all four grouping sets of (type, day) in one Expand pass,
    * completing the multi-level family next to [[qEventsRollup]]'s
    * hierarchy. `grouping_id()` is part of the output contract: it
    * distinguishes a subtotal's structural null from a data null (the
    * disambiguation CUBE consumers need), and both engines agree on
    * its bit order (1-bit = column aggregated away). Day granularity
    * keeps the leaf set dense; the Expand×4 rows still partial-agg
    * map-side before the one shuffle. */
  def qEventsCube(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .cube(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"), grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), asc_nulls_first("event_type"), asc_nulls_first("day"))

  /** Aggregate-to-collection: per user, the distinct event types as a
    * deterministic sorted list (rendered CSV so the typed-hash oracle
    * compares a scalar — `collect_set` order is nondeterministic, so
    * the sort is load-bearing, not cosmetic). */
  def qUserEventTypes(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("n_types"),
        concat_ws(",", sort_array(collect_set(col("event_type"))))
          .as("types_csv"))
      .orderBy(col("user_id"))

  /** FULL OUTER reconciliation: hourly purchase totals vs click totals,
    * keeping hours where only one side has traffic (the join class the
    * other entries don't cover — inner/semi/anti/left are all present
    * elsewhere). Nulls from the unmatched side are pinned to 0 so both
    * engines emit identical typed values. */
  def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def hourly(t: String, as: String) = ev
      .filter(col("event_type") === t)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("hour"))
      .agg(count(lit(1)).as(as))
    hourly("purchase", "n_purchases")
      .join(hourly("click", "n_clicks"), Seq("hour"), "full_outer")
      .select(col("hour"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
      .orderBy(col("hour"))
  }

  /** F13: JSON props decode with a pinned schema + aggregate. */
  def qEventsProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), propsSchema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).cast("long").as("sum_k"),
        count(col("k")).as("n_with_k"))
      .orderBy(col("event_type"))

  // --- sessionization: gap-based user sessions, batch + stateful stream ---

  val SessionGapMinutes = 30
  private val gapMicros = SessionGapMinutes * 60L * 1000000L

  /** Batch sessionization: a new session opens after a >30-minute gap.
    * Classic lag + running-sum-of-boundaries windows — one shuffle on
    * user_id, both windows share it. Session bounds are epoch
    * microseconds (exact; no timestamp-rendering parity risk). */
  def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_micros(col("ts")) - unix_micros(prev) > gapMicros, 1).otherwise(0)
    Tables.normalizeEvents(events)
      .withColumn("session_seq", sum(isNew).over(cum).cast("long"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"))
  }

  def qUserSessions(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("session_seq"))

  /** Session-depth histogram over [[sessionize]]'s output: sessions
    * bucketed by event count (1, 2, 3, … capped into a terminal "10+"
    * bucket so the report is fixed-width), with per-bucket session
    * counts and exact integer-µs duration sums — the engagement-shape
    * readout (bounce-heavy vs deep-session traffic) a session gap
    * tweak is judged by. One keyed aggregate over the session frame. */
  def sessionDepths(events: DataFrame): DataFrame =
    sessionize(events)
      .select(
        least(col("n_events"), lit(10L)).as("depth_bucket"),
        (col("session_end_us") - col("session_start_us")).as("dur_us"))
      .groupBy(col("depth_bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("dur_us")).as("total_dur_us"))

  def qSessionDepths(spark: SparkSession, dir: String): DataFrame =
    sessionDepths(Tables.events(spark, dir)).orderBy(col("depth_bucket"))

  case class UserSession(user_id: Long, session_seq: Long,
                         session_start_us: Long, session_end_us: Long,
                         n_events: Long)
  case class SessionState(seq: Long, startUs: Long, lastUs: Long, n: Long)

  /** Stateful streaming twin: per-user open session kept in
    * `GroupState`; a batch's events close every session followed by an
    * in-batch gap and leave the last one open. Within one micro-batch
    * this emits exactly the batch twin's CLOSED sessions (the streaming
    * spec asserts that); production would add a watermark +
    * `EventTimeTimeout` to flush the open session when event time
    * passes the gap. */
  def sessionizeGroup(userId: Long, batch: Iterator[(Long, Long)],
                      state: GroupState[SessionState]): Iterator[UserSession] = {
    val ts = batch.map(_._2).toArray.sorted
    var st = state.getOption.getOrElse(SessionState(0L, -1L, Long.MinValue, 0L))
    val closed = Seq.newBuilder[UserSession]
    ts.foreach { t =>
      if (st.startUs < 0) st = SessionState(st.seq + 1, t, t, 1)
      else if (t - st.lastUs > gapMicros) {
        closed += UserSession(userId, st.seq, st.startUs, st.lastUs, st.n)
        st = SessionState(st.seq + 1, t, t, 1)
      } else {
        // a cross-batch late event (allowed inside the watermark) may
        // precede the open session's bounds — extend, never regress
        st = st.copy(startUs = math.min(st.startUs, t),
          lastUs = math.max(st.lastUs, t), n = st.n + 1)
      }
    }
    state.update(st)
    closed.result().iterator
  }

  /** flatMapGroupsWithState over the event file stream. */
  def streamingSessions(spark: SparkSession, dir: String): Dataset[UserSession] = {
    import spark.implicits._
    val schema = Tables.eventsRaw(spark, dir).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    Tables.normalizeEvents(stream)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionizeGroup)
  }

  /** Production-shaped variant: event-time timeout flushes a user's open
    * session once the WATERMARK passes its gap deadline — late data
    * within the watermark still extends the session; state is bounded.
    * (The NoTimeout variant above never emits each user's final
    * session.) */
  def sessionizeGroupTimeout(userId: Long,
                             batch: Iterator[(Long, java.sql.Timestamp)],
                             state: GroupState[SessionState]): Iterator[UserSession] = {
    if (state.hasTimedOut) {
      val st = state.get
      // keep the session counter (an idle marker, startUs < 0): a
      // returning user must continue seq numbering, not restart at 1.
      state.update(SessionState(st.seq, -1L, Long.MinValue, 0L))
      // a stale timeout on an already-idle state has nothing to emit
      if (st.startUs < 0) Iterator.empty
      else Iterator.single(UserSession(userId, st.seq, st.startUs, st.lastUs, st.n))
    } else {
      val micros = batch.map { case (u, t) =>
        (u, t.getTime * 1000L + t.getNanos / 1000 % 1000)
      }
      val out = sessionizeGroup(userId, micros, state)
      // deadline in epoch-millis: gap after the open session's last event
      state.setTimeoutTimestamp(state.get.lastUs / 1000 + SessionGapMinutes * 60L * 1000)
      out
    }
  }

  /** Watermarked stream of (user_id, ts) from a directory of event
    * parquet files (each file = one micro-batch when the caller sets
    * maxFilesPerTrigger=1). The watermarked `ts` column itself flows
    * into the stateful operator — Spark requires the event-time column
    * to survive to the [flatMap]GroupsWithState input for event-time
    * timeouts. */
  def streamingSessionsEventTime(spark: SparkSession, watchDir: String,
                                 schema: StructType): Dataset[UserSession] = {
    import spark.implicits._
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(watchDir)
    Tables.normalizeEvents(stream)
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionizeGroupTimeout)
  }

  // --- streaming funnel ---

  case class FunnelHit(user_id: Long, stage_idx: Long, stage: String,
                       ts_us: Long)
  case class FunnelState(stage: Int, boundUs: Long)

  /** Stateful streaming twin of [[graft.operators.Analytics.funnel]]:
    * per-user progress (completed stage count + the binding timestamp)
    * lives in `GroupState`; each micro-batch's events are scanned in
    * event-time order and a stage advances on the first event of the
    * next stage's type STRICTLY after the current binding. Emits one
    * [[FunnelHit]] per transition (Append mode).
    *
    * Equivalence contract: counting hits per stage equals the batch
    * funnel PROVIDED each user's events arrive event-time-ordered
    * ACROSS micro-batches (the in-batch sort handles disorder within
    * one batch). A cross-batch straggler that back-fills an EARLIER
    * stage cannot resurrect a later-stage event already scanned past in
    * a previous batch — the state machine never re-examines history
    * (nothing is buffered). Sources that can't guarantee per-key order
    * need a watermark-deep buffer in state before the scan; that
    * trade (state growth vs. disorder tolerance) is deliberately not
    * made here. */
  def funnelGroup(stages: Seq[String])(
      userId: Long, batch: Iterator[(Long, String, Long)],
      state: GroupState[FunnelState]): Iterator[FunnelHit] = {
    val evs = batch.toArray.sortBy(e => (e._3, e._2))
    var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
    val hits = Seq.newBuilder[FunnelHit]
    evs.foreach { case (_, ty, ts) =>
      if (st.stage < stages.length && ty == stages(st.stage) && ts > st.boundUs) {
        hits += FunnelHit(userId, (st.stage + 1).toLong, ty, ts)
        st = FunnelState(st.stage + 1, ts)
      }
    }
    state.update(st)
    hits.result().iterator
  }

  // --- streaming transition matrix ---

  case class Transition(user_id: Long, from_type: String, to_type: String,
                        ts_us: Long)
  case class LastEvent(ty: String, tsUs: Long, eventId: Long)

  /** Stateful streaming twin of
    * [[graft.operators.Analytics.eventTransitions]]: the per-user LAST
    * event rides in `GroupState`; each micro-batch's events are scanned
    * in (ts, event_id) order and every consecutive pair emits one
    * [[Transition]]. Counting emissions per (from, to) equals the batch
    * matrix under the same cross-batch ordering precondition as
    * [[funnelGroup]] (in-batch disorder is sorted away; a cross-batch
    * straggler would pair with the wrong predecessor — nothing is
    * buffered). */
  def transitionsGroup(userId: Long,
                       batch: Iterator[(Long, String, Long, Long)],
                       state: GroupState[LastEvent]): Iterator[Transition] = {
    val evs = batch.toArray.sortBy(e => (e._3, e._4))
    var st = state.getOption
    val out = Seq.newBuilder[Transition]
    evs.foreach { case (_, ty, ts, id) =>
      st.foreach(prev => out += Transition(userId, prev.ty, ty, ts))
      st = Some(LastEvent(ty, ts, id))
    }
    st.foreach(state.update)
    out.result().iterator
  }

  def streamingTransitions(spark: SparkSession,
                           dir: String): Dataset[Transition] = {
    import spark.implicits._
    val schema = Tables.eventsRaw(spark, dir).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    Tables.normalizeEvents(stream)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        transitionsGroup)
  }

  // --- streaming last-touch attribution ---

  case class Attribution(event_id: Long, user_id: Long,
                         value: Option[Double], click_id: Option[Long],
                         gap_us: Option[Long])
  case class LastClick(clickId: Long, tsUs: Long)

  /** Stateful streaming twin of
    * [[graft.operators.Analytics.lastTouchAttribution]]: the per-user
    * last CLICK rides in `GroupState` (one fixed-size value — the
    * streaming analogue of the batch running-`last` window); each
    * micro-batch scans in (ts_us, event_id) order, clicks update the
    * state, purchases emit one attribution row against it (None =
    * organic). Same cross-batch ordering precondition as
    * [[funnelGroup]]; StreamingSpec proves streamed rows == the batch
    * twin's rows on the fixture stream. */
  def attributionGroup(userId: Long,
                       batch: Iterator[(Long, Long, String, Long, Option[Double])],
                       state: GroupState[LastClick]): Iterator[Attribution] = {
    val evs = batch.toArray.sortBy(e => (e._4, e._2))
    var st = state.getOption
    val out = Seq.newBuilder[Attribution]
    evs.foreach { case (_, id, ty, ts, value) =>
      if (ty == "click") st = Some(LastClick(id, ts))
      else if (ty == "purchase")
        out += Attribution(id, userId, value,
          st.map(_.clickId), st.map(ts - _.tsUs))
    }
    st.foreach(state.update)
    out.result().iterator
  }

  def streamingAttribution(spark: SparkSession,
                           dir: String): Dataset[Attribution] = {
    import spark.implicits._
    val schema = Tables.eventsRaw(spark, dir).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    Tables.normalizeEvents(stream)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[(Long, Long, String, Long, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        attributionGroup)
  }

  /** flatMapGroupsWithState funnel over the event file stream. */
  def streamingFunnel(spark: SparkSession, dir: String): Dataset[FunnelHit] = {
    import spark.implicits._
    val schema = Tables.eventsRaw(spark, dir).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    Tables.normalizeEvents(stream)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        funnelGroup(graft.operators.Analytics.FunnelStages))
  }

  /** The streaming twin: same transform over a file stream with a
    * watermark (exercised by the streaming spec; not an oracle query —
    * the oracle sees the batch twin above). */
  def streamingCounts(spark: SparkSession, dir: String): DataFrame = {
    // file-stream sources watch a DIRECTORY; select the events file by
    // glob (raw schema: ts arrives as long nanos and is normalized the
    // same way as the batch path)
    val schema = Tables.eventsRaw(spark, dir).schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    windowedCounts(Tables.normalizeEvents(stream).withWatermark("ts", "2 hours"))
  }

  // --- exactly-once landing (idempotent foreachBatch sink) ---

  /** Replay-safe `foreachBatch` body: each micro-batch lands in its own
    * `batch_id=N` directory with `overwrite` — Structured Streaming
    * guarantees at-least-once batch DELIVERY after recovery, and the
    * per-batch overwrite turns replays into no-ops, which together are
    * exactly-once at the sink. Pass to
    * `writeStream.foreachBatch(Events.idempotentBatchWrite(dir) _)`.
    * The directory layout doubles as the lineage index (which batch
    * produced which rows); [[readLanded]] reads it back as one table
    * with `batch_id` as a partition column. */
  def idempotentBatchWrite(outDir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  def readLanded(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
