package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** As-of (point-in-time) join — for every left row, attach the right row
  * with the greatest timestamp ≤ the left row's timestamp within the same
  * key. Spark has no native operator for this; the idiomatic scalable
  * spelling is union-tag + window forward-fill:
  *
  *   1. tag both sides and union them into one (key, ts, …, _side) frame;
  *   2. one hash shuffle on `key`, partition-local sort on (ts, _side)
  *      with right rows ordered BEFORE left rows at equal ts (that makes
  *      the match inclusive, ts_right ≤ ts_left);
  *   3. running `last(payload, ignoreNulls)` forward-fills each left row
  *      with the most recent right payload;
  *   4. keep only left rows.
  *
  * Why not a range join: `l JOIN r ON l.key = r.key AND r.ts <= l.ts`
  * + keep-max-per-left explodes to |matches| intermediate rows (quadratic
  * per key in the worst case) before the window prunes them. The
  * union-fill plan is one shuffle + one sort over |L| + |R| rows — the
  * same asymptotics as a sort-merge join, no blow-up, AQE-skew-splittable.
  *
  * The right payload is carried as ONE struct and filled atomically, so
  * all attached columns come from the same right row even when payload
  * fields are legitimately null.
  *
  * Contract: at most one right row per (key, ts) — pre-aggregate the
  * right side otherwise (ties would be resolved by sort instability).
  */
object AsofJoin {

  /** Internal column names the two joins reserve. A caller frame that
    * already carries one of these would be silently shadowed and produce
    * wrong results — so both entry points fail fast instead. */
  private def requireNoReserved(df: DataFrame, reserved: Seq[String],
                                side: String): Unit = {
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"$side frame contains reserved internal column(s) " +
        s"${clash.mkString(", ")} — rename them before the join")
  }

  /** Generic backward as-of join. `rightPayload` names the right-side
    * columns to attach; they appear in the output as `asof_<name>`.
    * Left rows with no matching right row get nulls. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightPayload: Seq[String]): DataFrame = {
    // asof_<payload> names are outputs: a left frame already carrying one
    // (e.g. the result of a previous asofJoin chained back in) would end
    // up with two same-named columns
    requireNoReserved(left,
      Seq("_p", "_side") ++ rightPayload.map("asof_" + _), "left")
    requireNoReserved(right, Seq("_p", "_side"), "right")
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val leftCols = left.columns.filterNot(c => c == key || c == ts).toSeq

    val lt = left.select(
      Seq(col(key), col(ts)) ++ leftCols.map(col) :+
        lit(null).cast(payloadType).as("_p") :+ lit(1).as("_side"): _*)
    // null-key right rows are dropped up front: a window partitions nulls
    // TOGETHER, which would match null-key left rows to them — join
    // semantics (and the ASOF oracle) never equate nulls. Null-key left
    // rows still ride through and surface with a null payload.
    val rt = right.filter(col(key).isNotNull).select(
      Seq(col(key), col(ts)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payloadStruct.as("_p") :+ lit(0).as("_side"): _*)

    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lt.unionByName(rt)
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(Seq(col(key), col(ts)) ++ leftCols.map(col) ++
        rightPayload.map(c => col(s"_p.$c").as(s"asof_$c")): _*)
  }

  /** Range (interval) join: pairs each left row with every right row of
    * the same key whose timestamp falls in `[l.ts - windowUs, l.ts]`,
    * as a LEFT join (left rows with no match survive with null right
    * columns).
    *
    * Scale spelling: bucket time by the window length; a right row in
    * bucket b can only match left rows in buckets {b, b+1}, so the right
    * side is replicated twice, the join is a plain equi-join on
    * (key, bucket) — partitioned, AQE-splittable, never a
    * BroadcastNestedLoopJoin — and the exact inequality runs as a
    * post-join filter. Each true pair matches exactly one replica
    * (the one whose bucket equals the left row's), so no dedup is
    * needed. Cost: 2|R| + |L| rows through one shuffle.
    *
    * `rightPayload` columns appear as `range_<name>`, non-null iff the
    * row matched. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
                windowUs: Long, rightPayload: Seq[String]): DataFrame = {
    require(windowUs > 0)
    requireNoReserved(left,
      Seq("_lts_us", "_lbucket", "_rkey", "_rbucket", "_rts_us") ++
        rightPayload.map("range_" + _), "left")
    // integer `div` keeps micros exact — no double path
    val lb = left
      .withColumn("_lts_us", unix_micros(col(ts)))
      .withColumn("_lbucket", expr(s"_lts_us div ${windowUs}L"))
    val rb = right.select(
      col(key).as("_rkey") +:
        unix_micros(col(ts)).as("_rts_us") +:
        rightPayload.map(c => col(c).as(s"range_$c")): _*)
      .withColumn("_rbucket", explode(array(
        expr(s"_rts_us div ${windowUs}L"),
        expr(s"_rts_us div ${windowUs}L + 1L"))))
    // the equi part (key, bucket) drives the shuffle; the range bounds
    // ride along as a join residual, keeping LEFT semantics intact
    lb.join(rb,
        col(key) === col("_rkey") && col("_lbucket") === col("_rbucket") &&
          col("_rts_us") >= col("_lts_us") - windowUs &&
          col("_rts_us") <= col("_lts_us"),
        "left")
      .drop("_lts_us", "_lbucket", "_rkey", "_rbucket", "_rts_us")
  }

  /** Range-join query: per purchase, the number of clicks by the same
    * user in the preceding 30 minutes (inclusive both ends). Unmatched
    * purchases count 0 — `count(payload)` skips the left-join nulls. */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    rangeJoin(purchases, clicks, "user_id", "ts",
        windowUs = 30L * 60 * 1000000, rightPayload = Seq("click_id"))
      .groupBy(col("event_id"), col("user_id"), col("ts"))
      .agg(count(col("range_click_id")).as("n_clicks_30m"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("n_clicks_30m"))
      .orderBy(col("event_id"))
  }

  /** Attribution query over `events`: each purchase joined as-of to the
    * user's most recent preceding (or simultaneous) click. The click side
    * is pre-aggregated to one row per (user, ts) per the tie contract.
    * Timestamps are emitted as epoch micros (exact; no tz-annotation
    * parity risk). */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("click_value"))
      .withColumn("click_ts_us", unix_micros(col("ts")))
    asofJoin(purchases, clicks, "user_id", "ts",
        Seq("click_ts_us", "click_value"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"),
        col("asof_click_ts_us").as("click_ts_us"),
        col("asof_click_value").as("click_value"))
      .orderBy(col("event_id"))
  }
}
