package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Events

/** Structured Streaming twin of the batch window aggregation: same
  * transform, same results — the "stream as continuously-appended
  * table" contract. */
class StreamingSpec extends SparkSpec {

  test("streaming windowed counts equal the batch query on the same data") {
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString
    val stream = Events.streamingCounts(spark, sfSmoke)
    val q = stream.writeStream
      .format("memory").queryName("ev_counts")
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("ev_counts")
      .orderBy("window_start", "event_type").collect()
    val batch = Events.qEventsWindow(spark, sfSmoke).collect()
    assert(streamed.length > 0)
    assert(streamed.toSeq === batch.toSeq)
  }

  test("watermark bounds state: late rows beyond 2h are not re-opened in append mode") {
    // structural check: the streaming plan carries an event-time watermark
    val plan = Events.streamingCounts(spark, sfSmoke)
      .queryExecution.analyzed.toString()
    assert(plan.contains("EventTimeWatermark"))
  }

  test("stateful sessionization: streamed closed sessions == batch closed sessions") {
    import spark.implicits._
    val checkpoint = Files.createTempDirectory("graft-ckpt-sess").toString
    val q = Events.streamingSessions(spark, sfSmoke).writeStream
      .format("memory").queryName("ev_sessions")
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("ev_sessions")
      .orderBy("user_id", "session_seq").collect().toSeq
    // in a single micro-batch the stream emits every session except each
    // user's final (still-open) one
    val batch = Events.qUserSessions(spark, sfSmoke)
    val lastSeq = batch.groupBy($"user_id".as("u"))
      .agg(max($"session_seq").as("last_seq"))
    val closedBatch = batch
      .join(lastSeq, $"user_id" === $"u" && $"session_seq" === $"last_seq", "left_anti")
      .orderBy("user_id", "session_seq").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === closedBatch)
  }

  test("props json decode handles missing keys as null, not error") {
    import spark.implicits._
    val df = Seq("""{"k": 4}""", """{"other": 1}""", "not json")
      .toDF("props")
      .select(from_json(col("props"), Events.propsSchema).getField("k").as("k"))
    assert(df.as[Option[Int]].collect().toSeq === Seq(Some(4), None, None))
  }
}
