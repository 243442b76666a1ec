package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** F13: JSON props decode with a pinned schema + aggregate. */
  def qEventsProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), propsSchema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).cast("long").as("sum_k"),
        count(col("k")).as("n_with_k"))
      .orderBy(col("event_type"))

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
}
