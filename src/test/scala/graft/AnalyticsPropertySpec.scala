package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.operators.Analytics
import graft.streaming.Events

/** Property fuzz for the two equivalence CONTRACTS the analytics
  * surface documents: the streaming funnel equals the batch funnel
  * under per-user event-time-ordered delivery (any batch slicing), and
  * the incremental SCD2 merge equals the full recompute at ANY time
  * split. Deterministic ScalaCheck seeds via [[SparkSpec.samples]]. */
class AnalyticsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  /** Random event stream: n events across u users over the 5 funnel-ish
    * types, strictly increasing global timestamps (seconds apart). */
  private def genEvents(maxN: Int): Gen[Seq[(Long, Timestamp, Long, String, Double)]] =
    for {
      n <- Gen.choose(1, maxN)
      users <- Gen.choose(1, 5)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.choose(1, users),
        Gen.oneOf("view", "click", "purchase", "signup", "error"),
        Gen.choose(0.0, 100.0)))
    } yield rows.zipWithIndex.map { case ((u, ty, v), i) =>
      ((i + 1).toLong, new Timestamp(base + i * 1000L), u.toLong, ty, v)
    }

  private def toDf(rows: Seq[(Long, Timestamp, Long, String, Double)]): DataFrame =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("PROPERTY: funnelGroup over ordered batch slices == batch funnel") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val stages = Analytics.FunnelStages
    samples(Gen.zip(genEvents(60), Gen.choose(1, 4)), 25).foreach {
      case (rows, nSlices) =>
        // drive the group function directly: per user, the ordered
        // event list cut into nSlices consecutive batches
        val byUser = rows.groupBy(_._3)
        val streamedCounts = byUser.toSeq.flatMap { case (uid, evs) =>
          var state = TestGroupState.create[Events.FunnelState](
            org.apache.spark.api.java.Optional.empty[Events.FunnelState](),
            GroupStateTimeout.NoTimeout(), 0L,
            org.apache.spark.api.java.Optional.empty[Long](),
            hasTimedOut = false)
          val slices = evs.grouped(math.max(1, evs.length / nSlices)).toSeq
          slices.flatMap { slice =>
            val batch = slice.map(e => (e._3, e._4, e._2.getTime * 1000L))
            val hits = Events.funnelGroup(stages)(uid, batch.iterator, state).toSeq
            if (state.exists) {
              val kept = state.get
              state = TestGroupState.create[Events.FunnelState](
                org.apache.spark.api.java.Optional.of(kept),
                GroupStateTimeout.NoTimeout(), 0L,
                org.apache.spark.api.java.Optional.empty[Long](),
                hasTimedOut = false)
            }
            hits
          }
        }.groupBy(_.stage_idx).view.mapValues(_.size.toLong).toMap
        val batchCounts = Analytics.funnel(toDf(rows), stages).collect()
          .filter(_.getLong(2) > 0L)
          .map(r => r.getLong(0) -> r.getLong(2)).toMap
        assert(streamedCounts === batchCounts,
          s"slices=$nSlices rows=${rows.length}")
    }
  }

  test("PROPERTY: scd2Merge at any time split == full recompute") {
    samples(Gen.zip(genEvents(50), Gen.choose(0, 50)), 20).foreach {
      case (rows, cutIdx) =>
        val all = toDf(rows)
        val cutTs = new Timestamp(base + cutIdx * 1000L)
        val merged = Analytics.scd2Merge(
          Analytics.scd2History(all.where(col("ts") < lit(cutTs))),
          all.where(col("ts") >= lit(cutTs)))
          .orderBy("user_id", "event_type", "version").collect().toSeq
        val recomputed = Analytics.scd2History(all)
          .orderBy("user_id", "event_type", "version").collect().toSeq
        assert(merged === recomputed, s"cut=$cutIdx rows=${rows.length}")
    }
  }

  test("PROPERTY: growth accounting conserves users and the WAU identity") {
    // genEvents spaces events seconds apart — one week, a degenerate
    // fuzz. Stretch to 36-hour steps so histories span many weeks.
    val sparse = genEvents(50).map(_.map { case (id, ts, u, ty, v) =>
      (id, new Timestamp(base + (ts.getTime - base) * 129600L), u, ty, v)
    })
    samples(sparse, 20).foreach { rows =>
      val out = Analytics.growthAccounting(toDf(rows)).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val users = rows.map(_._3).distinct.length.toLong
      // every user is new exactly once, ever
      assert(out.map(_._1).sum === users)
      // WAU(w) = new + retained + resurrected; churn can't exceed WAU
      out.foreach { case (n, r, s, c) =>
        assert(c <= n + r + s, "churning users must be active this week")
      }
      // Σ_w WAU(w) == |distinct (user, Monday week)| — no activity row
      // lost or double-counted by the dense-int rebucketing
      val mondayWeeks = rows.map { e =>
        val ld = e._2.toLocalDateTime.toLocalDate
        (e._3, ld.`with`(java.time.temporal.TemporalAdjusters
          .previousOrSame(java.time.DayOfWeek.MONDAY)))
      }.distinct.length.toLong
      assert(out.map { case (n, r, s, _) => n + r + s }.sum === mondayWeeks)
    }
  }

  test("PROPERTY: attributionGroup over ordered batch slices == batch last-touch") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    samples(Gen.zip(genEvents(60), Gen.choose(1, 4)), 25).foreach {
      case (rows, nSlices) =>
        val byUser = rows.groupBy(_._3)
        val streamed = byUser.toSeq.flatMap { case (uid, evs) =>
          var state = TestGroupState.create[Events.LastClick](
            org.apache.spark.api.java.Optional.empty[Events.LastClick](),
            GroupStateTimeout.NoTimeout(), 0L,
            org.apache.spark.api.java.Optional.empty[Long](),
            hasTimedOut = false)
          val slices = evs.grouped(math.max(1, evs.length / nSlices)).toSeq
          slices.flatMap { slice =>
            val batch = slice.map(e =>
              (e._3, e._1, e._4, e._2.getTime * 1000L, Option(e._5)))
            val out = Events.attributionGroup(uid, batch.iterator, state).toSeq
            if (state.exists) {
              val kept = state.get
              state = TestGroupState.create[Events.LastClick](
                org.apache.spark.api.java.Optional.of(kept),
                GroupStateTimeout.NoTimeout(), 0L,
                org.apache.spark.api.java.Optional.empty[Long](),
                hasTimedOut = false)
            }
            out
          }
        }.map(a => a.event_id -> ((a.click_id, a.gap_us))).toMap
        val batch = Analytics.lastTouchAttribution(toDf(rows)).collect()
          .map(r => r.getLong(0) -> ((
            if (r.isNullAt(3)) None else Some(r.getLong(3)),
            if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
        assert(streamed === batch, s"slices=$nSlices rows=${rows.length}")
    }
  }

  test("PROPERTY: unordered funnel == set reference; dominates the ordered funnel") {
    val stages = Analytics.FunnelStages
    samples(genEvents(40), 8).filter(_.nonEmpty).foreach { rows =>
      val df = toDf(rows)
      val unordered = Analytics.funnelUnordered(df)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      // driver reference: per-user distinct type sets, superset count
      val byUser = rows.groupBy(_._3)
        .view.mapValues(_.map(_._4).toSet).toMap
      val expected = stages.indices.map { i =>
        val need = stages.take(i + 1).toSet
        (i + 1).toLong ->
          byUser.values.count(ts => need.subsetOf(ts)).toLong
      }.toMap
      assert(unordered === expected, s"rows=${rows.length}")
      val ordered = Analytics.funnel(df)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      stages.indices.foreach { i =>
        assert(unordered((i + 1).toLong) >= ordered((i + 1).toLong),
          "reach must dominate the ordered path at every stage")
      }
    }
  }

  test("PROPERTY: incremental leakage split inherits the standing split under any partition") {
    import graft.operators.{TextDedup, TrainPrep}
    // five mutually-disjoint-vocabulary base texts: same base = exact
    // dup (always clusters), different bases = Jaccard 0 (never pair)
    val bases = Vector(
      "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima",
      "mango nectar orange papaya quince raspberry strawberry tangerine ugli vanilla currant fig",
      "anchor bridge castle dragon engine fortress granite harbor island jungle kettle lantern",
      "quantum photon neutron electron proton hadron lepton boson fermion gluon plasma isotope",
      "sonata prelude nocturne etude rhapsody symphony concerto overture cantata fugue aria ballade")
    val gen = for {
      n <- Gen.choose(6, 20)
      picks <- Gen.listOfN(n, Gen.choose(0, bases.length - 1))
      mask <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield picks.zip(mask).zipWithIndex.map { case ((b, st), i) =>
      ((i + 1).toLong, b, st)
    }
    samples(gen, 8).foreach { rows =>
      val standingRows = rows.filter(_._3)
      val probeRows = rows.filterNot(_._3)
      if (standingRows.nonEmpty && probeRows.nonEmpty) {
        def df(rs: Seq[(Long, Int, Boolean)]) =
          rs.map(r => (r._1, bases(r._2), "web")).toDF("doc_id", "text", "source")
        TextDedup.withDedupClusters(TextDedup.minhashPairs(df(standingRows))) { labels =>
          val standingSplit = TrainPrep.leakageSplit(df(standingRows), labels)
            .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
          val inc = TrainPrep
            .leakageSplitIncrement(df(probeRows), df(standingRows), labels)
            .collect()
            .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getString(3)))).toMap
          assert(inc.keySet === probeRows.map(_._1).toSet,
            "every probe doc gets an assignment")
          val standingBases = standingRows.map(_._2).toSet
          probeRows.foreach { case (id, b, _) =>
            val (inherited, split) = inc(id)
            if (standingBases.contains(b)) {
              assert(inherited, s"probe $id dups a standing doc but did not inherit")
              val familySplits = standingRows.filter(_._2 == b)
                .map(r => standingSplit(r._1)).toSet
              assert(familySplits === Set(split),
                s"probe $id split '$split' != its standing family's $familySplits")
            } else assert(!inherited,
              s"probe $id inherited with no standing near-dup")
          }
        }
      }
    }
  }

  test("PROPERTY: the frozen-banned-set gate equals driver-side set intersection on any split") {
    import graft.operators.{CorpusFilters, TextDedup}
    // tiny vocabulary so 5-gram shingles genuinely collide across docs
    val vocab = Vector("red", "blue", "gold", "iron")
    val gen = for {
      n <- Gen.choose(4, 12)
      texts <- Gen.listOfN(n, for {
        len <- Gen.choose(3, 24)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield ws.mkString(" "))
      mask <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield texts.zip(mask).zipWithIndex.map { case ((t, ev), i) =>
      ((i + 1).toLong, t, ev)
    }
    var sawContamination = false
    samples(gen, 10).foreach { rows =>
      val evalRows = rows.filter(_._3)
      val trainRows = rows.filterNot(_._3)
      if (evalRows.nonEmpty && trainRows.nonEmpty) {
        def df(rs: Seq[(Long, String, Boolean)]) =
          rs.map(r => (r._1, r._2, "web")).toDF("doc_id", "text", "source")
        // independent reference: plain driver-side SET intersection
        // over the same hashed shingle projection
        val hs = TextDedup
          .hashedShingles(df(rows), CorpusFilters.ContamShingleN)
          .collect()
          .map(r => r.getLong(0) ->
            Option(r.getSeq[Int](2)).map(_.toSet).getOrElse(Set.empty[Int]))
          .toMap
        val banned = evalRows.map(r => hs(r._1)).foldLeft(Set.empty[Int])(_ ++ _)
        val got = CorpusFilters.contaminationAgainst(df(trainRows),
            CorpusFilters.bannedShingles(df(evalRows))).collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
        assert(got.keySet === trainRows.map(_._1).toSet,
          "every train doc gets a gate row (incl. sub-shingle docs)")
        trainRows.foreach { case (id, _, _) =>
          val want = (hs(id) & banned).size.toLong
          assert(got(id)._1 === want,
            s"doc $id overlap ${got(id)._1} != set-reference $want")
          assert(got(id)._2 === (want > 0))
          if (want > 0) sawContamination = true
        }
      }
    }
    assert(sawContamination,
      "no sample produced a genuine shingle collision — the property is vacuous")
  }
}
