package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.operators.ScaleJoins

/** Scale-join utilities: salting preserves join semantics; bucketing
  * actually removes the shuffle (asserted on the physical plan, not
  * just claimed in a comment). */
class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    // one pathologically hot key (90% of rows) + normal keys
    val left = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i)))
      .toDF("k", "payload")
    val right = (1 to 50).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")
    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "attr").collect().sortBy(_.toString)
    val salted = ScaleJoins.saltedJoin(left, right, "k", 8, col("payload"))
      .select("k", "payload", "attr").collect().sortBy(_.toString)
    assert(salted === plain)
    assert(salted.length === 949) // 900 hot-key rows + keys 2..50 from the tail
  }

  test("salt values spread a hot key across the full salt range") {
    val left = (1 to 1000).map(i => (1L, i)).toDF("k", "payload")
    val spread = left.select(pmod(hash(col("payload")), lit(8)).as("s"))
      .distinct().count()
    assert(spread === 8)
  }

  test("session-partitioned landing prunes partitions at the scan") {
    val base = Files.createTempDirectory("graft-part").toString + "/bills"
    val bills = spark.read.parquet("/root/repo/fixtures/legiscan/bills.parquet")
      .withColumn("sess", concat(col("session.year_start").cast("string"),
        lit("-"), col("session.year_end").cast("string")))
    ScaleJoins.writePartitioned(bills, base, "sess")
    val dirs = new java.io.File(base).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs === Array("sess=2017-2018", "sess=2019-2020", "sess=2021-2022"))
    val pruned = spark.read.parquet(base).filter(col("sess") === "2019-2020")
    val s = pruned.queryExecution.executedPlan.toString()
    assert(s.contains("PartitionFilters: [isnotnull(sess"),
      s"partition filter did not reach the scan:\n$s")
    assert(pruned.count() ===
      bills.filter(col("sess") === "2019-2020").count())
  }

  test("bucketed tables join without a shuffle exchange") {
    val base = Files.createTempDirectory("graft-bucket").toString
    val orders = spark.read.parquet(s"$sfSmoke/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    val lineitem = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    ScaleJoins.writeBucketed(orders, s"$base/orders_b", "orders_b", "o_orderkey", 4)
    ScaleJoins.writeBucketed(lineitem, s"$base/lineitem_b", "lineitem_b", "l_orderkey", 4)
    // force a non-broadcast join so the shuffle question is real
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan
      val inner = plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = inner.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty,
        s"expected bucket-local join, found shuffles:\n${inner.treeString}")
      // and it still computes the right thing
      assert(joined.count() ===
        orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  // --- key-skew audit ---

  test("skew audit: planted hot key is reported with exact percentiles") {
    // type A: per-key counts {k1..k4: 1 each, k5: 16} — 5 keys, 20 rows
    val rows = (1 to 4).map(k => ("A", k.toLong)) ++
      (1 to 16).map(_ => ("A", 5L)) ++
      (1 to 6).map(k => ("B", k.toLong)) // type B: uniform 1s
    val df = rows.toDF("event_type", "user_id")
    val out = ScaleJoins.keySkewAudit(df, "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((5L, 20L, 16L)))
    // inverted CDF: cum(kc=1)=4 ≥ ⌈0.5·5⌉ → p50=1; p99 needs cum ≥
    // 4.95 → the hot key's 16
    assert((a.getLong(4), a.getLong(5)) === ((1L, 16L)))
    assert(a.getDouble(6) === 0.8)
    assert(a.getBoolean(7), "16 of 20 rows in one key must raise the salt hint")
    val b = out("B")
    assert((b.getLong(1), b.getLong(2), b.getLong(3)) === ((6L, 6L, 1L)))
    assert((b.getLong(4), b.getLong(5)) === ((1L, 1L)))
    assert(!b.getBoolean(7), "uniform keys must not raise the hint")
  }

  test("skew audit: hint threshold is strict (exactly 1/20 share stays quiet)") {
    // hot key holds exactly 5%: 1 of 20 rows per key over 20 keys
    val rows = (1 to 20).flatMap(k => Seq(("A", k.toLong)))
    val out = ScaleJoins.keySkewAudit(rows.toDF("event_type", "user_id"),
      "event_type", "user_id").collect().head
    assert(out.getLong(3) * ScaleJoins.SkewHintFrac === out.getLong(2))
    assert(!out.getBoolean(7), "share exactly at 1/20 must NOT hint")
  }

  test("skew audit: null keys count as one key; result is partition-stable") {
    val rows = Seq(("A", Some(1L)), ("A", None), ("A", None), ("A", Some(2L)))
    val df = rows.toDF("event_type", "user_id")
    val one = ScaleJoins.keySkewAudit(df, "event_type", "user_id").collect()
    val many = ScaleJoins.keySkewAudit(df.repartition(5),
      "event_type", "user_id").collect()
    assert(one.toSeq === many.toSeq)
    assert(one.head.getLong(1) === 3L, "null is a (single) key")
    assert(one.head.getLong(3) === 2L)
  }
}
