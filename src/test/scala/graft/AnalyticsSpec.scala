package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** (event_id, ts, user_id, event_type, value) rows as an events frame. */
  private def ev(rows: (Long, String, Long, String, Double)*): DataFrame =
    rows.map { case (id, t, u, ty, v) => (id, ts(t), u, ty, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  // --- retention cohorts ---

  test("retentionCohorts buckets users by first-seen week and counts return weeks") {
    // user 1 first seen week of Mon 2024-01-01, active again 2 weeks later;
    // user 2 first seen the next week; user 3 shares user 1's cohort, week 0 only
    val out = Analytics.retentionCohorts(ev(
      (1L, "2024-01-02 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-16 10:00:00", 1L, "view", 0.0),
      (3L, "2024-01-10 09:00:00", 2L, "view", 0.0),
      (4L, "2024-01-03 12:00:00", 3L, "view", 0.0)))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> 2L,
      ("2024-01-01", 2L) -> 1L,
      ("2024-01-08", 0L) -> 1L))
  }

  test("retentionCohorts counts a user once per active week") {
    val out = Analytics.retentionCohorts(ev(
      (1L, "2024-01-02 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-03 10:00:00", 1L, "click", 0.0),
      (3L, "2024-01-04 10:00:00", 1L, "view", 0.0)))
      .collect()
    assert(out.length === 1)
    assert(out.head.getLong(2) === 1L)
  }

  // --- funnel ---

  test("funnel enforces strict stage order") {
    // user 1 completes view→click→purchase in order; user 2 clicks BEFORE
    // their first view (never re-clicks) so stalls at stage 1; user 3
    // views and clicks but purchases before the click, so stalls at stage 2
    val out = Analytics.funnel(ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 11:00:00", 1L, "click", 0.0),
      (3L, "2024-01-01 12:00:00", 1L, "purchase", 0.0),
      (4L, "2024-01-01 09:00:00", 2L, "click", 0.0),
      (5L, "2024-01-01 10:00:00", 2L, "view", 0.0),
      (6L, "2024-01-01 10:00:00", 3L, "view", 0.0),
      (7L, "2024-01-01 12:00:00", 3L, "click", 0.0),
      (8L, "2024-01-01 11:00:00", 3L, "purchase", 0.0)))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L))
  }

  test("funnel binds each stage to the EARLIEST valid completion") {
    // user's earliest view is 10:00; the 10:30 click converts stage 2 even
    // though a later 12:00 click exists; purchase at 11:00 is after the
    // earliest click, so it converts — earliest-binding, not latest
    val out = Analytics.funnel(ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:30:00", 1L, "click", 0.0),
      (3L, "2024-01-01 12:00:00", 1L, "click", 0.0),
      (4L, "2024-01-01 11:00:00", 1L, "purchase", 0.0)))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("view" -> 1L, "click" -> 1L, "purchase" -> 1L))
  }

  test("funnel same-timestamp events do NOT advance a stage (strictly after)") {
    val out = Analytics.funnel(ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:00:00", 1L, "click", 0.0)))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    // drained stages still report (zero) rows — the oracle shape
    assert(out === Map("view" -> 1L, "click" -> 0L, "purchase" -> 0L))
  }

  // --- SCD2 history ---

  test("scd2History chains validity intervals with one current row per key") {
    val out = Analytics.scd2History(ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2024-01-02 10:00:00", 1L, "view", 2.0),
      (3L, "2024-01-03 10:00:00", 1L, "view", 3.0),
      (4L, "2024-01-01 10:00:00", 1L, "click", 9.0)))
      .orderBy("user_id", "event_type", "version").collect()
    val views = out.filter(_.getString(1) == "view")
    assert(views.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L))
    // each valid_to equals the next version's valid_from
    views.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) === b.getLong(3),
        s"interval break between v${a.getLong(2)} and v${b.getLong(2)}")
    }
    assert(views.count(_.getLong(6) == 1L) === 1)
    assert(views.last.isNullAt(4) && views.last.getLong(6) === 1L)
    val clicks = out.filter(_.getString(1) == "click")
    assert(clicks.length === 1 && clicks.head.getLong(6) === 1L)
  }

  test("scd2History breaks same-microsecond ties by event_id") {
    val out = Analytics.scd2History(ev(
      (7L, "2024-01-01 10:00:00", 1L, "view", 7.0),
      (2L, "2024-01-01 10:00:00", 1L, "view", 2.0)))
      .orderBy("version").collect()
    assert(out.map(_.getDouble(5)).toSeq === Seq(2.0, 7.0))
  }

  test("retentionRates normalizes each cohort row by its week-0 size") {
    val out = Analytics.retentionRates(ev(
      (1L, "2024-01-02 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-16 10:00:00", 1L, "view", 0.0),
      (3L, "2024-01-03 12:00:00", 2L, "view", 0.0)))
      .orderBy("week_offset").collect()
    // one cohort (week of Jan 1) of size 2; week 2 retains 1 of 2
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
      === Seq((0L, 2L, 2L, 1.0), (2L, 1L, 2L, 0.5)))
  }

  test("windowed funnel rejects a conversion outside the 24h window") {
    // user 1 clicks 25h after viewing: converts in the unbounded funnel,
    // not in the windowed one; user 2 clicks within the window
    val events = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-02 11:00:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:00:00", 2L, "view", 0.0),
      (4L, "2024-01-01 12:00:00", 2L, "click", 0.0))
    val unbounded = Analytics.funnel(events)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val windowed = Analytics
      .funnel(events, Analytics.FunnelStages, Some(Analytics.FunnelWindowUs))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(unbounded("click") === 2L)
    assert(windowed("click") === 1L)
  }

  // --- funnel latency ---

  test("funnelLatency reports exact µs gaps between the binding times") {
    // user 1: view@10:00 -> click@10:30 (1800s) -> purchase@11:30 (3600s)
    // user 2: view@09:00 -> click@09:10 (600s), never purchases
    val out = Analytics.funnelLatency(ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:30:00", 1L, "click", 0.0),
      (3L, "2024-01-01 11:30:00", 1L, "purchase", 0.0),
      (4L, "2024-01-01 09:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 09:10:00", 2L, "click", 0.0)))
      .orderBy("stage_idx").collect()
    assert(out.length === 2)
    val vc = out(0)
    assert(vc.getString(1) === "view->click" && vc.getLong(2) === 2L)
    assert(vc.getDouble(3) === (1800e6 + 600e6) / 2)
    assert(vc.getLong(4) === 1800000000L)
    val cp = out(1)
    assert(cp.getString(1) === "click->purchase" && cp.getLong(2) === 1L)
    assert(cp.getDouble(3) === 3600e6 && cp.getLong(4) === 3600000000L)
  }

  // --- event transitions ---

  test("eventTransitions counts consecutive pairs per user with rational p") {
    // user 1: a b a b  -> a->b ×2, b->a ×1; user 2: a a -> a->a ×1
    val out = Analytics.eventTransitions(ev(
      (1L, "2024-01-01 10:00:00", 1L, "a", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "b", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "a", 0.0),
      (4L, "2024-01-01 10:03:00", 1L, "b", 0.0),
      (5L, "2024-01-01 10:00:00", 2L, "a", 0.0),
      (6L, "2024-01-01 10:05:00", 2L, "a", 0.0)))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      ("a", "b") -> ((2L, 2.0 / 3.0)),
      ("a", "a") -> ((1L, 1.0 / 3.0)),
      ("b", "a") -> ((1L, 1.0))))
  }

  // --- value histogram ---

  test("valueHistogram bins by floor(value/width) with per-bin extremes") {
    val out = Analytics.valueHistogram(ev(
      (1L, "2024-01-01 10:00:00", 1L, "x", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "x", 49.99),
      (3L, "2024-01-01 10:02:00", 1L, "x", 50.0),
      (4L, "2024-01-01 10:03:00", 1L, "x", 120.5)))
      .orderBy("bin").collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    assert(out.toSeq === Seq(
      0L -> ((2L, 0.0, 49.99, 0.0)),
      1L -> ((1L, 50.0, 50.0, 50.0)),
      2L -> ((1L, 120.5, 120.5, 100.0))))
  }

  // --- SCD2 incremental merge ---

  test("scd2Merge(history, delta) equals the full recompute") {
    val all = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2024-01-05 10:00:00", 1L, "view", 2.0),
      (3L, "2024-01-25 10:00:00", 1L, "view", 3.0),   // delta: existing key
      (4L, "2024-01-26 10:00:00", 1L, "view", 4.0),   // delta: same key again
      (5L, "2024-01-02 10:00:00", 2L, "click", 9.0),  // history-only key
      (6L, "2024-01-27 10:00:00", 3L, "view", 7.0))   // delta-only (new) key
    val cut = ts("2024-01-20 00:00:00")
    val merged = Analytics.scd2Merge(
      Analytics.scd2History(all.where(col("ts") < cut)),
      all.where(col("ts") >= cut))
      .orderBy("user_id", "event_type", "version").collect().toSeq
    val recomputed = Analytics.scd2History(all)
      .orderBy("user_id", "event_type", "version").collect().toSeq
    assert(merged === recomputed)
  }

  test("scd2Merge with an empty delta is the identity") {
    val hist = Analytics.scd2History(ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2024-01-05 10:00:00", 1L, "view", 2.0)))
    val merged = Analytics.scd2Merge(hist, ev())
      .orderBy("version").collect().toSeq
    assert(merged === hist.orderBy("version").collect().toSeq)
  }

  // --- median / MAD outliers ---

  test("medianOutliers computes exact median, MAD, and the 3-MAD count") {
    // values 1..9 plus a 100.0 spike: median 5.5, adevs {0.5..4.5, 94.5},
    // MAD 2.5 -> threshold 7.5 -> only the spike exceeds it
    val rows = (1 to 9).map(i => (i.toLong, s"2024-01-01 10:00:0$i",
      1L, "view", i.toDouble)) :+
      (10L, "2024-01-01 10:01:00", 1L, "view", 100.0)
    val out = Analytics.medianOutliers(ev(rows: _*)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 10L)
    assert(r.getDouble(2) === 5.5)
    assert(r.getDouble(3) === 2.5)
    assert(r.getLong(4) === 1L)
  }

  // --- cross-operator invariants on real data (sf0.001) ---

  test("invariants: funnel monotone, transitions stochastic, histogram conserves") {
    val dir = sfSmoke
    val events = graft.tables.Tables.events(spark, dir)
    val total = events.count()

    // funnel counts never increase stage over stage
    val funnel = Analytics.qFunnel(spark, dir).collect().map(_.getLong(2))
    assert(funnel.sliding(2).forall { case Array(a, b) => b <= a })

    // transition matrix: each from_type's probabilities sum to 1, and
    // total transitions = events - one per user (no lead for the last)
    val trans = Analytics.qEventTransitions(spark, dir).collect()
    val byFrom = trans.groupBy(_.getString(0))
    byFrom.values.foreach { rows =>
      val p = rows.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-9, s"p sums to $p")
    }
    val nUsers = events.select("user_id").distinct().count()
    assert(trans.map(_.getLong(2)).sum === total - nUsers)

    // histogram conserves the event count
    val hist = Analytics.qValueHistogram(spark, dir).collect()
    assert(hist.map(_.getLong(2)).sum === total)

    // retention: week-0 cohort sizes sum to the distinct user count
    val ret = Analytics.qRetentionCohorts(spark, dir).collect()
    assert(ret.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum === nUsers)

    // scd2: exactly one current row per (user, type); version count
    // equals the event count
    val scd2 = Analytics.qScd2History(spark, dir).collect()
    assert(scd2.length.toLong === total)
    val currents = scd2.filter(_.getLong(6) == 1L)
      .map(r => (r.getLong(0), r.getString(1)))
    assert(currents.length === currents.distinct.length)
    assert(currents.length ===
      events.select("user_id", "event_type").distinct().count().toInt)
  }

  // --- plan shape ---

  test("plans: stats joins broadcast, and nothing falls to a nested loop") {
    def physical(df: DataFrame): SparkPlan = {
      df.collect() // let AQE finalize
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    }
    val dir = sfSmoke
    val frames = Seq(
      Analytics.qRetentionCohorts(spark, dir),
      Analytics.qFunnel(spark, dir),
      Analytics.qScd2History(spark, dir),
      Analytics.qMedianOutliers(spark, dir))
    frames.foreach { df =>
      // string-match the finalized plan: AQE wraps exchanges in
      // QueryStage nodes whose subtree collect() will not enter, but
      // toString renders through them (same approach as PlanSpec)
      val s = physical(df).toString()
      assert(!s.contains("CartesianProduct") &&
        !s.contains("BroadcastNestedLoopJoin"),
        s"nested-loop/cartesian in:\n$s")
    }
    // medianOutliers joins the tiny per-type stats frames back twice —
    // both must be broadcasts, never a second shuffle of the event scan
    val s = physical(Analytics.qMedianOutliers(spark, dir)).toString()
    val bhj = "BroadcastHashJoin".r.findAllIn(s).length
    assert(bhj >= 2, s"expected 2 broadcast joins, got:\n$s")
  }

  // --- last-touch attribution ---

  test("lastTouchAttribution credits the latest strictly-prior click") {
    val out = Analytics.lastTouchAttribution(ev(
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      (2L, "2024-01-01 10:05:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:06:00", 1L, "view", 0.0),
      (4L, "2024-01-01 10:07:00", 1L, "purchase", 9.5),
      (5L, "2024-01-01 10:08:00", 1L, "purchase", 1.0)))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // both purchases credit click 2 (latest prior), never the view
    assert(out(4L) === ((2L, 120L * 1000000L)))
    assert(out(5L) === ((2L, 180L * 1000000L)))
  }

  test("firstTouchAttribution credits the EARLIEST prior click (vs last)") {
    val events = ev(
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      (2L, "2024-01-01 10:05:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:07:00", 1L, "purchase", 9.5))
    val first = Analytics.firstTouchAttribution(events).collect().head
    val last = Analytics.lastTouchAttribution(events).collect().head
    assert(first.getLong(3) === 1L && first.getLong(4) === 420L * 1000000L)
    assert(last.getLong(3) === 2L, "the two models must diverge here")
  }

  test("lastTouchAttribution leaves organic purchases NULL, per user") {
    val out = Analytics.lastTouchAttribution(ev(
      (1L, "2024-01-01 10:00:00", 1L, "purchase", 5.0), // before any click
      (2L, "2024-01-01 11:00:00", 1L, "click", 0.0),
      (3L, "2024-01-01 12:00:00", 1L, "purchase", 6.0),
      (4L, "2024-01-01 09:00:00", 2L, "click", 0.0),
      (5L, "2024-01-01 13:00:00", 3L, "purchase", 7.0))) // other user's click
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out === Map(1L -> None, 3L -> Some(2L), 5L -> None))
  }

  test("growthAccounting labels new/retained/resurrected and right-censors churn") {
    // user 1: weeks A,B (adjacent); user 2: week A only; user 3: weeks A,C (gap)
    val out = Analytics.growthAccounting(ev(
      (1L, "2024-01-02 10:00:00", 1L, "view", 0.0),  // A
      (2L, "2024-01-09 10:00:00", 1L, "view", 0.0),  // B
      (3L, "2024-01-03 10:00:00", 2L, "view", 0.0),  // A
      (4L, "2024-01-04 10:00:00", 3L, "view", 0.0),  // A
      (5L, "2024-01-23 10:00:00", 3L, "view", 0.0))) // C (2-week gap)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val Seq(a, b, c) = out.keys.toSeq.sorted
    assert(b === a + 1 && c === a + 3)
    assert(out(a) === ((3L, 0L, 0L, 2L)), "A: all new; 2 and 3 churn after")
    assert(out(b) === ((0L, 1L, 0L, 1L)), "B: 1 retained, censored churn")
    assert(out(c) === ((0L, 0L, 1L, 1L)), "C: 3 resurrected, censored churn")
    // identity: WAU(w) = new + retained + resurrected
    assert(out.values.forall { case (n, r, s, _) => n + r + s > 0 })
  }

  test("stickiness counts trailing-7-day WAU via the scatter, DAU/WAU exact") {
    val out = Analytics.stickiness(ev(
      (1L, "2024-01-10 09:00:00", 1L, "view", 0.0),
      (2L, "2024-01-10 10:00:00", 2L, "view", 0.0),
      (3L, "2024-01-11 10:00:00", 1L, "view", 0.0)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // day 1: both users; WAU window [Jan 4..10] = {1, 2}
    assert(out("2024-01-10") === ((2L, 2L, 1.0)))
    // day 2: only user 1 active; WAU window [Jan 5..11] still = {1, 2}
    assert(out("2024-01-11") === ((1L, 2L, 0.5)))
    // no row for inactive days (no DAU ⇒ no ratio), even inside WAU reach
    assert(!out.contains("2024-01-12"))
  }

  test("topJourneys caps at the first N events and counts path strings") {
    val out = Analytics.topJourneys(ev(
      // users 1 and 2 share view>click>purchase
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "purchase", 0.0),
      (4L, "2024-01-01 09:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 09:01:00", 2L, "click", 0.0),
      (6L, "2024-01-01 09:02:00", 2L, "purchase", 0.0),
      // user 3: a single event is a length-1 journey
      (7L, "2024-01-01 08:00:00", 3L, "signup", 0.0),
      // user 4: 7 events — only the first 5 shape the journey
      (8L, "2024-01-01 07:00:00", 4L, "view", 0.0),
      (9L, "2024-01-01 07:01:00", 4L, "view", 0.0),
      (10L, "2024-01-01 07:02:00", 4L, "view", 0.0),
      (11L, "2024-01-01 07:03:00", 4L, "view", 0.0),
      (12L, "2024-01-01 07:04:00", 4L, "view", 0.0),
      (13L, "2024-01-01 07:05:00", 4L, "purchase", 0.0),
      (14L, "2024-01-01 07:06:00", 4L, "purchase", 0.0)))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.head === (("view>click>purchase", 2L)))
    assert(out.toMap === Map(
      "view>click>purchase" -> 2L,
      "signup" -> 1L,
      "view>view>view>view>view" -> 1L))
  }

  test("valueDrift splits at the stream midpoint; new bins get NULL ratio") {
    // ts 0,10,20,25,30 min → midpoint 15 min: half a = {0,10}, b = rest
    val out = Analytics.valueDrift(ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 10.0),   // a, bin 0
      (2L, "2024-01-01 10:10:00", 1L, "view", 60.0),   // a, bin 1
      (3L, "2024-01-01 10:20:00", 1L, "view", 10.0),   // b, bin 0
      (4L, "2024-01-01 10:25:00", 1L, "view", 120.0),  // b, bin 2 (new)
      (5L, "2024-01-01 10:30:00", 1L, "view", 10.0)))  // b, bin 0
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(out(0L) === ((1L, 2L, Some((2.0 / 3.0) / (1.0 / 2.0)))))
    assert(out(1L) === ((1L, 0L, Some(0.0))))
    assert(out(2L) === ((0L, 1L, None)), "a bin new in half b must be NULL")
  }

  test("powerUsers cuts at the rounded p90 threshold, strictly above") {
    // per-user counts 1,1,1,1,10 → p90 = quantile_cont 0.9 = 6.4;
    // only the 10-event whale is above: share 10/14
    val rows = (1L to 4L).map(u =>
      (u, s"2024-01-0$u 10:00:00", u, "view", 0.0)) ++
      (5L to 14L).map(i => (i + 10L, "2024-01-05 10:00:00", 9L, "view", 0.0))
    val r = Analytics.powerUsers(ev(rows.map(t =>
      (t._1, t._2, t._3, t._4, t._5)): _*)).collect().head
    assert(r.getLong(0) === 5L && r.getLong(1) === 1L)
    assert(r.getLong(2) === 14L && r.getLong(3) === 10L)
    assert(r.getDouble(4) === 10.0 / 14.0)
  }

  test("channelRetention ties week-1 returns to the FIRST event's type") {
    val out = Analytics.channelRetention(ev(
      // u1 acquired via signup (Mon 1/1 week), back the next week
      (1L, "2024-01-02 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-09 10:00:00", 1L, "view", 0.0),
      // u2 acquired via signup, back only 2 weeks later (NOT week-1)
      (3L, "2024-01-03 10:00:00", 2L, "signup", 0.0),
      (4L, "2024-01-16 10:00:00", 2L, "view", 0.0),
      // u3 acquired via view (same-ts tie breaks to lower event_id),
      // never returns
      (5L, "2024-01-04 10:00:00", 3L, "view", 0.0),
      (6L, "2024-01-04 10:00:00", 3L, "click", 0.0)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      "signup" -> ((2L, 1L, 0.5)),
      "view" -> ((1L, 0L, 0.0))))
  }

  test("journeyConversion counts only strictly-after-the-prefix purchases") {
    val out = Analytics.journeyConversion(ev(
      // u1: view>click then a purchase → converted
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "purchase", 5.0),
      // u2: same prefix, never purchases → not converted
      (4L, "2024-01-01 09:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 09:01:00", 2L, "click", 0.0),
      (6L, "2024-01-01 09:02:00", 2L, "view", 0.0),
      // u3: purchase INSIDE the prefix, nothing after → not converted
      (7L, "2024-01-01 08:00:00", 3L, "view", 0.0),
      (8L, "2024-01-01 08:01:00", 3L, "purchase", 2.0),
      // u4: a one-event journey forms a length-1 prefix, no purchase
      (9L, "2024-01-01 07:00:00", 4L, "signup", 0.0)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("view>click") === ((2L, 1L, 0.5)))
    assert(out("view>purchase") === ((1L, 0L, 0.0)),
      "a purchase inside the prefix is not its own conversion")
    assert(out("signup") === ((1L, 0L, 0.0)))
  }

  test("rfmSegments buckets purchasers into hand-computed median octants") {
    val out = Analytics.rfmSegments(ev(
      // u1: freq 2, last = now (r=0 d), monetary 10.00
      (1L, "2024-01-25 10:00:00", 1L, "purchase", 4.0),
      (2L, "2024-02-01 10:00:00", 1L, "purchase", 6.0),
      // u2: freq 1, 10 d ago, monetary 50.00
      (3L, "2024-01-22 10:00:00", 2L, "purchase", 50.0),
      // u3: freq 3, 1 d ago, monetary 20.00
      (4L, "2024-01-10 10:00:00", 3L, "purchase", 5.0),
      (5L, "2024-01-20 10:00:00", 3L, "purchase", 5.0),
      (6L, "2024-01-31 10:00:00", 3L, "purchase", 10.0),
      // u4: freq 1, 20 d ago, monetary 1.00
      (7L, "2024-01-12 10:00:00", 4L, "purchase", 1.0),
      // non-purchases are invisible to RFM
      (8L, "2024-02-01 11:00:00", 4L, "click", 99.0)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // recency 0,10,1,20 → med 5.5; freq 2,1,3,1 → med 1.5;
    // monetary 10,50,20,1 → med 15.0
    assert(out === Map(
      (1L, 1L, 0L) -> 1L,  // u1: recent, frequent, low spend
      (0L, 0L, 1L) -> 1L,  // u2: lapsed whale
      (1L, 1L, 1L) -> 1L,  // u3: best octant
      (0L, 0L, 0L) -> 1L)) // u4: lapsed low-value
  }

  test("lastTouchAttribution breaks same-microsecond ties by event_id") {
    // click 2 and purchase 3 share a timestamp: the strictly-prior ROWS
    // frame with the event_id tie break sees the click (2 < 3)
    val out = Analytics.lastTouchAttribution(ev(
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      (2L, "2024-01-01 10:30:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:30:00", 1L, "purchase", 2.0)))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((3L, 2L, 0L)))
  }

  test("unordered funnel counts any-order completion the ordered funnel misses") {
    // user 1 walks the designed path; user 2 has every ingredient but
    // purchased BEFORE clicking — ordered credits them one stage,
    // unordered all three; user 3 only viewed
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "purchase", 5.0),
      (4L, "2024-01-01 11:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 11:01:00", 2L, "purchase", 7.0),
      (6L, "2024-01-01 11:02:00", 2L, "click", 0.0),
      (7L, "2024-01-01 12:00:00", 3L, "view", 0.0))
    val ordered = Analytics.funnel(e)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val unordered = Analytics.funnelUnordered(e)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ordered === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    assert(unordered === Map(1L -> 3L, 2L -> 2L, 3L -> 2L))
    // reach dominates path at every stage
    (1L to 3L).foreach(i => assert(unordered(i) >= ordered(i)))
  }
}
