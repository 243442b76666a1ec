package graft

import org.apache.spark.sql.functions._
import graft.operators.Snapshot

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("snapshotDiff classifies added / removed / changed and drops unchanged") {
    val old = snap((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
    val neu = snap((2L, "two"), (3L, "three EDITED"), (4L, "four"), (5L, "five"))
    val out = Snapshot.snapshotDiff(old, neu)
      .select("doc_id", "change").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "removed", 3L -> "changed", 5L -> "added"))
  }

  test("hashes travel with the classification; unchanged majority never surfaces") {
    val old = snap((1L to 100L).map(i => (i, s"body $i")): _*)
    val neu = snap(((1L to 100L).map(i => (i, s"body $i"))
      :+ (101L, "brand new")): _*)
    val rows = Snapshot.snapshotDiff(old, neu).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("doc_id") === 101L)
    assert(r.getAs[String]("change") === "added")
    assert(r.getAs[String]("old_hash") === null)
    assert(r.getAs[String]("new_hash") !== null)
  }

  test("diff shuffles hashes, not text: no exchange output carries the text column") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // Multi-partition range inputs so the join genuinely shuffles
    // (single-partition local relations plan a FullOuter SMJ with no
    // exchange at all, making the no-text property vacuously true —
    // and an explicit repartition would not do either: its exchange
    // sits upstream of the hash projection and would itself carry
    // text). Exchanges are inserted by the EnsureRequirements
    // preparation rule, so they exist only in executedPlan — and with
    // AQE on, AdaptiveSparkPlanExec hides them from collect(); turn
    // AQE off for this one plan so the exchange nodes are walkable.
    def rangeSnap(n: Long) = spark.range(0L, n, 1L, 4)
      .select(col("id").as("doc_id"), concat(lit("body "), col("id")).as("text"))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Snapshot.snapshotDiff(rangeSnap(50), rangeSnap(60))
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.output.map(_.name)
      }
      assert(exchanges.nonEmpty, s"\n${df.queryExecution.executedPlan}")
      assert(exchanges.forall(cols => !cols.contains("text")),
        s"text crossed an exchange: $exchanges")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
