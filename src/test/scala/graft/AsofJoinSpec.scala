package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** Semantics of the union+window as-of join on hand-computed fixtures. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // right: key 1 has rows at t=5 and t=20; key 2 has none
  private val rightDf = Seq(
    (1L, 5L, "a", Some(10)),
    (1L, 20L, "b", None)
  ).toDF("k", "t", "v", "extra")

  private val leftDf = Seq(
    (1L, 4L, "before-any"),
    (1L, 5L, "at-first"),
    (1L, 19L, "between"),
    (1L, 20L, "at-second"),
    (1L, 25L, "after"),
    (2L, 10L, "no-right-side")
  ).toDF("k", "t", "tag")

  private lazy val out = AsofJoin
    .asofJoin(leftDf, rightDf, "k", "t", Seq("v", "extra"))
    .collect().map(r => r.getString(2) -> r).toMap

  test("each left row attaches the greatest right ts <= its own ts") {
    assert(out("before-any").getString(3) === null)  // no right row yet
    assert(out("between").getString(3) === "a")
    assert(out("after").getString(3) === "b")
  }

  test("equality is inclusive: a right row at the same ts matches") {
    assert(out("at-first").getString(3) === "a")
    assert(out("at-second").getString(3) === "b")
  }

  test("keys with no right rows yield nulls, rows are preserved") {
    val r = out("no-right-side")
    assert(r.getString(3) === null && r.isNullAt(4))
  }

  test("payload attaches atomically: a null field rides its own row") {
    // t=25 matches the t=20 right row whose extra IS null; the fill must
    // not mix in t=5's extra=10
    val r = out("after")
    assert(r.getString(3) === "b" && r.isNullAt(4))
    // and t=19 matches t=5 where extra=10
    assert(out("between").getInt(4) === 10)
  }

  test("range join: inclusive bounds, cross-bucket matches, zero-match rows kept") {
    import org.apache.spark.sql.functions.timestamp_micros
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us")
    val l = withTs(Seq((1L, 1000L, "p1"), (2L, 500L, "p2"))
      .toDF("k", "t_us", "ltag"))
    val r = withTs(Seq(
      (1L, 900L, "exact-lower"),   // == t-W: inclusive (prev bucket replica)
      (1L, 1000L, "exact-upper"),  // == t: inclusive (same bucket)
      (1L, 950L, "inside"),        // prev bucket, in range
      (1L, 899L, "too-old"),       // just below lower bound
      (1L, 1001L, "future")        // after the left row
    ).toDF("k", "t_us", "rtag"))
    val out = AsofJoin.rangeJoin(l, r, "k", "ts", windowUs = 100L, Seq("rtag"))
    val matches = out.filter(col("ltag") === "p1")
      .select("range_rtag").as[String].collect().sorted
    assert(matches === Array("exact-lower", "exact-upper", "inside"))
    // each pair appears exactly once despite the 2x bucket replication
    assert(matches.distinct.length === matches.length)
    // the no-match left row survives with a null payload
    val p2 = out.filter(col("ltag") === "p2").collect()
    assert(p2.length === 1 && p2(0).getString(p2(0).fieldIndex("range_rtag")) == null)
  }

  test("property: as-of join equals the naive per-row maximum on random data") {
    import org.scalacheck.Gen
    val gen = for {
      ls <- Gen.listOfN(30, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L)))
      rs <- Gen.listOfN(20, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L)))
    } yield (ls.distinct, rs.distinct.groupBy(identity).keys.toList)
    samples(gen, 8).foreach { case (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t", "lid")
      // contract: one right row per (key, ts)
      val r = rs.map { case (k, t) => (k, t, s"v$k-$t") }.toDF("k", "t", "v")
      val got = AsofJoin.asofJoin(l, r, "k", "t", Seq("v"))
        .select("lid", "asof_v").as[(Long, Option[String])].collect().toMap
      ls.zipWithIndex.foreach { case ((k, t), i) =>
        val expected = rs.filter(p => p._1 == k && p._2 <= t)
          .sortBy(_._2).lastOption.map(p => s"v${p._1}-${p._2}")
        assert(got(i.toLong) === expected,
          s"left ($k,$t): got ${got(i.toLong)}, expected $expected")
      }
    }
  }

  test("property: range join equals the naive filtered product on random data") {
    import org.apache.spark.sql.functions.timestamp_micros
    import org.scalacheck.Gen
    val W = 7L
    val gen = for {
      ls <- Gen.listOfN(20, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L)))
      rs <- Gen.listOfN(20, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L)))
    } yield (ls.distinct, rs.distinct)
    samples(gen, 8).foreach { case (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "t_us", "lid")
        .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us")
      val r = rs.map { case (k, t) => (k, t, s"r$k-$t") }
        .toDF("k", "t_us", "v")
        .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us")
      val got = AsofJoin.rangeJoin(l, r, "k", "ts", W, Seq("v"))
        .select("lid", "range_v").as[(Long, Option[String])].collect()
        .groupBy(_._1).view.mapValues(_.flatMap(_._2).toSet).toMap
      ls.zipWithIndex.foreach { case ((k, t), i) =>
        val expected = rs.filter(p =>
          p._1 == k && p._2 <= t && p._2 >= t - W)
          .map(p => s"r${p._1}-${p._2}").toSet
        assert(got(i.toLong) === expected,
          s"left ($k,$t): got ${got(i.toLong)}, expected $expected")
      }
    }
  }

  test("reserved internal columns fail fast instead of silently shadowing") {
    val clashL = leftDf.withColumn("_side", lit(9))
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(clashL, rightDf, "k", "t", Seq("v"))
    }
    assert(e1.getMessage.contains("_side"))
    val clashR = rightDf.withColumn("_p", lit(0))
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(leftDf, clashR, "k", "t", Seq("v"))
    }
    import org.apache.spark.sql.functions.timestamp_micros
    val l = Seq((1L, 1000L)).toDF("k", "t_us")
      .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us")
      .withColumn("_rbucket", lit(1L))
    val e3 = intercept[IllegalArgumentException] {
      AsofJoin.rangeJoin(l, l.drop("_rbucket"), "k", "ts", 100L, Seq("k"))
    }
    assert(e3.getMessage.contains("_rbucket"))
  }

  test("smoke: purchase->click attribution runs and is click-consistent") {
    val res = AsofJoin.qAsofJoin(spark, sfSmoke).cache()
    assert(res.count() > 0)
    // every attached click precedes (or equals) its purchase
    assert(res.filter(col("click_ts_us") > col("ts_us")).count() === 0)
    res.unpersist()
  }
}
