package graft

import graft.operators.{BloomDedup, CorpusFilters, TextDedup, TextStats, TrainPrep}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degenerate-input robustness: null text, empty text, whitespace-only
  * text, and empty frames through every text-operator family. The
  * fixture corpus is non-null, so these paths are otherwise untested —
  * and the round-6 advice found exactly one such latent crash
  * (BloomDedup's md5(NULL) probe). The contract pinned here: no
  * operator throws on degenerate rows, row-level operators never lose
  * rows, emitted stats are never negative, and a null-text doc never
  * appears in any candidate pair (md5/simhash/shingle of NULL is NULL,
  * which no equi-join key matches). */
class NullRobustnessSpec extends SparkSpec {
  import spark.implicits._

  private val dup =
    "the quick brown fox jumps over the lazy dog again and again"

  private def corpus: DataFrame = Seq(
    (1L, dup, "web"),
    (2L, "", "web"),
    (3L, "   \t  ", "books"),
    (5L, "one", "books"),
    (6L, dup, "web"))
    .toDF("doc_id", "text", "source")
    .unionByName(Seq((4L, "books")).toDF("doc_id", "source")
      .withColumn("text", lit(null).cast("string"))
      .select($"doc_id", $"text", $"source"))

  test("exact dedup groups degenerate texts distinctly, copies conserved") {
    val out = TextDedup.exactDedup(corpus).collect()
    // 5 distinct texts: dup×2, "", whitespace, "one", NULL — empty and
    // whitespace do NOT collapse (different strings), and the null
    // text forms its own md5(NULL)=NULL group rather than vanishing
    assert(out.length === 5)
    assert(out.map(_.getLong(2)).sum === corpus.count(), "copies conserved")
    assert(out.exists(r => r.isNullAt(0) && r.getLong(1) === 4L),
      "null-text group kept with its doc id")
  }

  test("minhash pairs: the real dup survives, the null doc never pairs") {
    val pairs = TextDedup.minhashPairs(corpus)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(pairs.contains((1L, 6L)), "the genuine duplicate pair survives")
    assert(pairs.forall { case (a, b) => a != 4L && b != 4L },
      "null-text doc produced a candidate pair")
  }

  test("simhash pairs (wide): no crash, null doc never pairs") {
    val out = TextDedup.simhashPairs60(corpus)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(out.contains((1L, 6L)))
    assert(out.forall { case (a, b) => a != 4L && b != 4L })
  }

  test("repeated spans ignore null and sub-shingle docs") {
    val out = TextDedup.repeatedSpans(corpus).collect()
    assert(out.forall(r => !Set(2L, 3L, 4L)(r.getLong(0))),
      "a degenerate doc emitted a span")
  }

  test("paragraph dedup passes degenerate docs through; winnow selects nothing for them") {
    // keep-one: the two dup docs share every chunk — doc 1 keeps all,
    // doc 6 loses all; null/empty/whitespace/sub-chunk docs pass
    // through with their own (possibly zero) chunk counts intact
    val out = TextDedup.paragraphDedup(corpus).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L), "a row vanished")
    assert(out(1L)._2 === out(1L)._3 && out(1L)._2 > 0, "first copy keeps all")
    assert(out(6L) === (("", out(1L)._2, 0L)), "second copy loses every chunk")
    Seq(2L, 3L, 4L).foreach(id => assert(out(id) === (("", 0L, 0L))))
    assert(out(5L) === (("one", 1L, 1L)))
    // incremental admission: same pass-through, nothing crashes when
    // the STANDING side carries the degenerate rows too
    val incOut = TextDedup.paragraphDedupIncrement(
        corpus.filter($"doc_id" === 6L), corpus.filter($"doc_id" =!= 6L))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(incOut(6L) === (("", out(1L)._2, 0L)))
    // winnowing: null/empty/whitespace/sub-k docs select nothing; the
    // dup pair shares every fingerprint and the null doc never pairs
    val fps = TextDedup.winnowFingerprints(corpus).collect()
    assert(fps.forall(r => !Set(2L, 3L, 4L, 5L)(r.getLong(0))),
      "a degenerate doc selected a fingerprint")
    // at the default w the 8-gram dup doc winnows to ONE print — under
    // the MinSharedFp noise floor, so no pair (the floor working as
    // designed); w=4 gives disjoint windows hence ≥ 2 shared prints
    assert(TextDedup.winnowPairs(corpus)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().isEmpty)
    val pairs = TextDedup.winnowPairs(corpus, w = 4)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(pairs.toSeq === Seq((1L, 6L)))
  }

  test("bloom dedup handles null text in index AND increment") {
    val out = BloomDedup.bloomNewDocs(corpus, corpus).collect()
    // every real text exists in the index so nothing is new; the null
    // row can't equal anything under either engine's join semantics,
    // so it alone stays "new"
    assert(out.map(_.getLong(0)).toSet === Set(4L))
  }

  test("quality features keep every row and never go negative") {
    val out = TextStats.qualityFeatures(corpus).collect()
    assert(out.length === corpus.count())
    out.filter(!_.isNullAt(1)).foreach { r =>
      assert(r.getAs[Number](1).longValue >= 0L,
        s"negative n_tokens for doc ${r.getLong(0)}")
    }
  }

  test("pii / repetition row stats keep one row per input row") {
    Seq[DataFrame => DataFrame](
      CorpusFilters.piiStats, CorpusFilters.repetitionStats)
      .foreach { op =>
        val out = op(corpus)
        assert(out.count() === corpus.count(), out.columns.mkString(","))
      }
  }

  test("sequence packing keeps every doc's slot; degenerate docs pack zero tokens") {
    val packed = TrainPrep.sequencePack(corpus).collect()
    assert(packed.length === corpus.count(), "one packing row per doc")
    packed.filter(r => Set(2L, 3L, 4L)(r.getLong(0))).foreach { r =>
      assert(r.isNullAt(2) || r.getLong(2) === 0L,
        s"degenerate doc ${r.getLong(0)} packed ${r.get(2)} tokens")
    }
  }

  test("empty input frames flow through the pipeline operators") {
    val empty = corpus.limit(0)
    assert(TextDedup.exactDedup(empty).count() === 0)
    assert(TextDedup.minhashPairs(empty).count() === 0)
    assert(TrainPrep.sequencePack(empty).count() === 0)
    assert(CorpusFilters.piiStats(empty).count() === 0)
    assert(TextStats.qualityFeatures(empty).count() === 0)
  }

  test("corpus analytics on degenerate docs: no crash, null doc never indexed") {
    import graft.operators.CorpusAnalytics
    val docs = corpus.withColumn("lang", lit("en"))
      .withColumn("n_chars",
        coalesce(length(col("text")).cast("long"), lit(0L)))
    // bigrams/postings: degenerate docs contribute nothing, others work
    val bigrams = CorpusAnalytics.bigramNext(docs, heads = 100, perHead = 100)
    assert(bigrams.count() > 0)
    val posted = CorpusAnalytics.postings(docs, k = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(!posted.contains(4L) && !posted.contains(2L) && !posted.contains(3L))
    // stratified sample survives a null-lang row: it falls out of the
    // inner threshold join in BOTH engines (SQL inner join on NULL)
    val withNullLang = docs.withColumn("lang",
      when(col("doc_id") === 5L, lit(null.asInstanceOf[String]))
        .otherwise(col("lang")))
    val kept = CorpusAnalytics.stratifiedSample(withNullLang)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(5L))
  }

  test("split manifest checksum is partitioning-independent and null-safe") {
    import org.apache.spark.sql.functions.bit_xor
    import graft.functions.md5Bits60
    val docs = corpus.withColumn("lang", lit("en"))
      .withColumn("n_chars",
        coalesce(length(col("text")).cast("long"), lit(0L)))
    def checksum(df: DataFrame): Seq[(Long, Long)] =
      df.groupBy(lit(1)).agg(
        count(lit(1)).as("n"),
        bit_xor(md5Bits60(col("text"))).as("x"))
        .select("n", "x").as[(Long, Long)].collect().toSeq
    // same rows, any partitioning -> identical xor (null text skipped)
    assert(checksum(docs) === checksum(docs.repartition(7)))
    // dropping the null-text row leaves the checksum unchanged (xor
    // never saw it), while the count drops by one
    val without = docs.where(col("text").isNotNull)
    assert(checksum(docs).head._2 === checksum(without).head._2)
    assert(checksum(docs).head._1 === checksum(without).head._1 + 1)
  }

  test("event analytics on empty frames and null values") {
    import graft.operators.Analytics
    val empty = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Analytics.retentionCohorts(empty).count() === 0)
    // the funnel ALWAYS reports every configured stage (oracle shape);
    // an empty corpus reports them all at zero
    val f = Analytics.funnel(empty).collect()
    assert(f.length === Analytics.FunnelStages.length)
    assert(f.forall(_.getLong(2) === 0L))
    val fl = Analytics.funnelLatency(empty).collect()
    assert(fl.length === Analytics.FunnelStages.length - 1)
    assert(fl.forall(r => r.getLong(2) === 0L && r.isNullAt(3) && r.isNullAt(4)))
    assert(Analytics.scd2History(empty).count() === 0)
    assert(Analytics.medianOutliers(empty).count() === 0)
    // a null value row: percentile skips it, counts still include it,
    // and its outlier comparison is NULL -> not counted (same in SQL)
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", Some(1.0)),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "view", Some(3.0)),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "view", None))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Analytics.medianOutliers(ev).collect().head
    assert(r.getLong(1) === 3L)      // n_events counts the null row
    assert(r.getDouble(2) === 2.0)   // median over non-null values
    assert(r.getLong(4) === 0L)      // null comparison never flags
  }

  test("round-7 analytics on degenerate input: empty frames, absent terms") {
    import graft.operators.{Analytics, CorpusAnalytics}
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Analytics.lastTouchAttribution(emptyEv).count() === 0)
    assert(Analytics.growthAccounting(emptyEv).count() === 0)
    assert(Analytics.stickiness(emptyEv).count() === 0)
    // a click-free stream: every purchase is organic, none dropped
    val noClicks = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "purchase", 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "purchase", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val organic = Analytics.lastTouchAttribution(noClicks).collect()
    assert(organic.length === 2 && organic.forall(_.isNullAt(3)))
    // degenerate corpus: bm25 over terms present nowhere is empty, not
    // an error; lift and the merge contract survive nulls/empties
    val docs = corpus.withColumn("lang", lit("en"))
      .withColumn("n_chars",
        coalesce(length(col("text")).cast("long"), lit(0L)))
    assert(CorpusAnalytics.bm25Search(docs,
      terms = Seq("zzz_absent")).count() === 0)
    assert(CorpusAnalytics.bm25Search(docs.limit(0)).count() === 0)
    assert(CorpusAnalytics.bigramLift(docs.limit(0)).count() === 0)
    val mergedEmpty = CorpusAnalytics.mergeSourceStats(
      CorpusAnalytics.sourceStats(docs.limit(0)),
      CorpusAnalytics.sourceStats(docs.limit(0)))
    assert(mergedEmpty.count() === 0)
    // temperature mix on a single language keeps everything (thr=10000)
    val one = CorpusAnalytics.temperatureMix(
      docs.where(col("text").isNotNull)).collect()
    assert(one.length === 1 && one.head.getLong(2) === 10000L &&
      one.head.getLong(3) === one.head.getLong(1))
  }

  test("span strip and setsim joins survive degenerate docs") {
    // stripSpans: every row survives; degenerate rows emit empty clean
    // text (null text has NULL counts — no tokens were ever counted)
    val out = TextDedup.stripSpans(corpus).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(out(2L) === (("", 0L)), "empty text: empty clean, zero tokens")
    assert(out(4L)._1 === "" && out(4L)._2 === -1L, "null text: NULL count")
    // the genuine dup pair's shared run is cut from both copies
    assert(!out(1L)._1.contains("quick") && !out(6L)._1.contains("quick"))
    // setsim: sub-shingle docs fall out of the set builder; the dup
    // pair is found; the null doc never pairs (both forms)
    val pairs = TextDedup.setSimilarityJoin(corpus)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.toSet === Set((1L, 6L)))
    val inc = TextDedup.setSimilarityIncremental(
      corpus.where($"doc_id" === 1L), corpus.where($"doc_id" =!= 1L))
      .select("probe_id", "index_id").as[(Long, Long)].collect()
    assert(inc.toSet === Set((1L, 6L)))
  }

  test("lm perplexity on degenerate input: null/empty/one-token docs drop, twins score") {
    import graft.operators.CorpusAnalytics
    val docs = corpus.withColumn("lang", lit("en"))
    val out = CorpusAnalytics.lmPerplexity(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // only the two 12-token twins have bigrams; null (4), empty (2),
    // whitespace (3) and one-token (5) docs emit no row and never throw
    assert(out.keySet === Set(1L, 6L))
    assert(out(1L).getLong(3) === out(6L).getLong(3),
      "identical twins must score identically under leave-one-out")
    assert(out(1L).getLong(2) === 11L, "12 tokens -> 11 positions")
  }

  test("lm perplexity when ONE doc holds every token: floor clamps, no null score") {
    import graft.operators.CorpusAnalytics
    // n_all == m for the only scored doc, so every leave-one-out count
    // is zero and the floor branch would hit ln(0) unguarded — Spark
    // nulls, DuckDB errors (round-12 advice). The greatest(nRest, 1)
    // clamp makes the floor ln(1) = 0: the score exists and is exactly 0
    val single = Seq((1L, "aa bb aa cc", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusAnalytics.lmPerplexity(single).collect()
    assert(out.length === 1)
    val r = out.head
    assert(!r.isNullAt(3), "nats_micro must not be null on the degenerate corpus")
    assert(r.getLong(3) === 0L,
      s"a doc that IS the corpus scores zero information, got $r")
    assert(r.getString(5) === "head", "single doc lands in the head bucket")
  }

  test("round-8 corpus ops on degenerate input") {
    import graft.operators.{CorpusAnalytics, TrainPrep}
    // rare bigrams: null/empty/one-token docs emit no row, never throw
    val rb = CorpusAnalytics.rareBigramNovelty(corpus).collect()
    assert(rb.forall(_.getLong(1) >= 1), "only docs with >= 1 bigram appear")
    assert(!rb.exists(_.getLong(0) == 4L), "null-text doc emits no bigram row")
    // divergence: a single-source corpus is its own distribution — L1
    // exactly 0, and the numerator exactly 0 (not merely small)
    val single = Seq((1L, "aa bb", "en", "s1"), (2L, "bb cc", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val d = CorpusAnalytics.sourceTokenDivergence(single).collect()
    assert(d.length === 1 && d.head.getLong(3) === 0L)
    // null text: tokens(NULL) contributes nothing, the source row keeps
    // its non-null counts
    val withNull = single.unionByName(
      Seq((3L, "s1")).toDF("doc_id", "source")
        .withColumn("text", lit(null).cast("string"))
        .withColumn("lang", lit("en"))
        .select($"doc_id", $"text", $"lang", $"source"))
    val d2 = CorpusAnalytics.sourceTokenDivergence(withNull).collect()
    assert(d2.length === 1 && d2.head.getLong(1) === 4L)
    // bpe: an empty corpus learns zero merges instead of throwing; the
    // empty merge table encodes every word as its characters
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "lang", "source")
    assert(TrainPrep.bpeMerges(empty).count() === 0)
    val chars = Seq(("abc", 1)).toDF("word", "n")
      .select(TrainPrep.bpeEncode(col("word"), Seq.empty).as("syms"))
      .as[Seq[String]].collect().head
    assert(chars === Seq("a", "b", "c"))
  }

  // --- analytics family: null identity rows influence NO answer ---

  import java.sql.Timestamp
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Clean event rows + every null-identity mutation: null user_id,
    * null ts, null event_type. The family contract (Analytics.keyed):
    * output over the dirty frame == output over the clean subset, for
    * every operator — never a throw, never a phantom NULL group, never
    * a silently different count. */
  private def cleanEvents: DataFrame = Seq(
    (1L, 10L, "view", ts("2026-01-05 10:00:00"), 1.0),
    (2L, 10L, "click", ts("2026-01-05 10:05:00"), 2.0),
    (3L, 10L, "purchase", ts("2026-01-05 10:30:00"), 30.0),
    (4L, 20L, "view", ts("2026-01-06 09:00:00"), 1.0),
    (5L, 20L, "click", ts("2026-01-13 09:10:00"), 1.5),
    (6L, 30L, "view", ts("2026-01-20 12:00:00"), 1.0),
    (7L, 30L, "purchase", ts("2026-02-02 12:00:00"), 55.0))
    .toDF("event_id", "user_id", "event_type", "ts", "value")

  private def dirtyEvents: DataFrame = {
    val nullUser = Seq((100L, "view", ts("2026-01-05 10:00:01"), 9.0))
      .toDF("event_id", "event_type", "ts", "value")
      .withColumn("user_id", lit(null).cast("long"))
    val nullTs = Seq((101L, 10L, "click", 9.0))
      .toDF("event_id", "user_id", "event_type", "value")
      .withColumn("ts", lit(null).cast("timestamp"))
    val nullType = Seq((102L, 20L, ts("2026-01-06 09:00:02"), 9.0))
      .toDF("event_id", "user_id", "ts", "value")
      .withColumn("event_type", lit(null).cast("string"))
    val cols = Seq($"event_id", $"user_id", $"event_type", $"ts", $"value")
    cleanEvents.select(cols: _*)
      .unionByName(nullUser.select(cols: _*))
      .unionByName(nullTs.select(cols: _*))
      .unionByName(nullType.select(cols: _*))
  }

  private def assertSameRows(name: String,
                             f: DataFrame => DataFrame): Unit = {
    val clean = f(cleanEvents).collect().map(_.toSeq).toSeq
    val dirty = f(dirtyEvents).collect().map(_.toSeq).toSeq
    assert(dirty === clean,
      s"$name: null-identity rows changed answers (dirty=$dirty clean=$clean)")
    assert(clean.nonEmpty, s"$name: vacuous fixture")
  }

  test("funnels ignore null-identity rows entirely") {
    assertSameRows("funnel",
      e => graft.operators.Analytics.funnel(e).orderBy("stage_idx"))
    assertSameRows("funnelWindowed",
      e => graft.operators.Analytics.funnel(e,
        windowUs = Some(graft.operators.Analytics.FunnelWindowUs))
        .orderBy("stage_idx"))
    assertSameRows("funnelLatency",
      e => graft.operators.Analytics.funnelLatency(e).orderBy("stage_idx"))
    assertSameRows("funnelUnordered",
      e => graft.operators.Analytics.funnelUnordered(e).orderBy("stage_idx"))
  }

  test("attribution ignores null-identity rows entirely") {
    assertSameRows("lastTouch",
      e => graft.operators.Analytics.lastTouchAttribution(e).orderBy("event_id"))
    assertSameRows("firstTouch",
      e => graft.operators.Analytics.firstTouchAttribution(e).orderBy("event_id"))
  }

  test("retention and growth accounting ignore null-identity rows") {
    assertSameRows("retentionCohorts",
      e => graft.operators.Analytics.retentionCohorts(e)
        .orderBy("cohort_week", "week_offset"))
    assertSameRows("retentionRates",
      e => graft.operators.Analytics.retentionRates(e)
        .orderBy("cohort_week", "week_offset"))
    assertSameRows("growthAccounting",
      e => graft.operators.Analytics.growthAccounting(e).orderBy("wi"))
  }

  test("the REST of the analytics family ignores null-identity rows too") {
    // round-8 completion of the guard: the contract is family-WIDE,
    // not just funnel/attribution/retention/scd2
    val A = graft.operators.Analytics
    assertSameRows("eventTransitions",
      e => A.eventTransitions(e).orderBy("from_type", "to_type"))
    assertSameRows("stickiness", e => A.stickiness(e).orderBy("d"))
    assertSameRows("topJourneys",
      e => A.topJourneys(e).orderBy("journey"))
    assertSameRows("channelRetention",
      e => A.channelRetention(e).orderBy("channel"))
    assertSameRows("journeyConversion",
      e => A.journeyConversion(e).orderBy("prefix"))
    assertSameRows("powerUsers", e => A.powerUsers(e))
    assertSameRows("rfmSegments",
      e => A.rfmSegments(e).orderBy("r_hi", "f_hi", "m_hi"))
    assertSameRows("valueHistogram",
      e => A.valueHistogram(e).orderBy("event_type", "bin"))
    assertSameRows("medianOutliers",
      e => A.medianOutliers(e).orderBy("event_type"))
    assertSameRows("valueDrift",
      e => A.valueDrift(e).orderBy("bin"))
  }

  test("scd2: history and merge ignore null-identity rows; merge == recompute on dirty deltas") {
    assertSameRows("scd2History",
      e => graft.operators.Analytics.scd2History(e)
        .orderBy("user_id", "event_type", "version"))
    // merge ≡ recompute must hold when the DELTA carries null rows:
    // split at 2026-01-10, dirty rows ride the delta side
    val cut = ts("2026-01-10 00:00:00")
    val dim = graft.operators.Analytics.scd2History(
      cleanEvents.where($"ts" < cut))
    val delta = dirtyEvents.where($"ts".isNull || $"ts" >= cut ||
      $"user_id".isNull || $"event_type".isNull)
    val merged = graft.operators.Analytics.scd2Merge(dim, delta)
      .orderBy("user_id", "event_type", "version")
      .collect().map(_.toSeq).toSeq
    val recomputed = graft.operators.Analytics.scd2History(cleanEvents)
      .orderBy("user_id", "event_type", "version")
      .collect().map(_.toSeq).toSeq
    assert(merged === recomputed,
      "scd2Merge over a dirty delta diverged from the clean recompute")
  }

  test("round-13 lifecycle ops on degenerate input") {
    val c = corpus.withColumn("lang", lit("en"))
      .select($"doc_id", $"text", $"lang", $"source")
    // curriculum: every degenerate doc gets a rank and a stage (null
    // text scores like empty — qualityFeatures never nulls), ranks are
    // a permutation of 1..n
    val cur = TrainPrep.curriculumStages(c).collect()
    assert(cur.length === c.count())
    assert(cur.map(_.getLong(2)).sorted.toSeq === (1L to cur.length).toSeq)
    // curriculum admission with an EMPTY threshold frame: every probe
    // falls to the last stage, none lost
    val noThr = Seq.empty[(Long, Double)].toDF("stage", "floor_score")
    val adm = TrainPrep.curriculumAssign(c, noThr, k = 4).collect()
    assert(adm.length === c.count())
    assert(adm.forall(_.getLong(2) === 4L))
    // quality drift where one side is empty: every bin is a one-sided
    // NULL-flagged alert row, nothing throws, nothing divides by zero
    val empty = c.limit(0)
    val drift = graft.operators.CorpusAnalytics.qualityDrift(c, empty).collect()
    assert(drift.nonEmpty)
    assert(drift.forall(r => r.isNullAt(3) && r.isNullAt(4)))
    assert(graft.operators.CorpusAnalytics.qualityDrift(empty, empty).count() === 0L)
    // drift between two identical distributions that BOTH carry
    // null-text docs: the null quality bin coalesces to the sentinel
    // bucket on each side, so the full-outer join matches it and the
    // alarm stays silent (null join keys never match — an uncoalesced
    // NULL bin would page n_alert_bins=2 on a flat corpus)
    val alert = graft.operators.CorpusAnalytics.driftAlert(c, c).collect()
    assert(alert.length === 1)
    assert(alert.head.getLong(0) === 0L, "identical corpora must read PSI 0")
    assert(alert.head.getLong(1) === 0L, "null-text bin raised a false one-sided alert")
    assert(alert.head.getLong(2) === 0L && alert.head.getLong(3) === 0L)
    // and the sentinel bin itself carries the null-text doc count
    val hist = graft.operators.CorpusAnalytics.driftHistogram(c, "n_ref").collect()
    assert(hist.exists(r => r.getLong(0) === Long.MaxValue && r.getLong(1) === 1L),
      "null-text doc missing from the sentinel drift bin")
    // leakage split on a corpus with NO near-dup pairs: all singletons,
    // cluster_id == doc_id, full coverage
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    val split = TrainPrep.leakageSplit(c, noPairs).collect()
    assert(split.length === c.count())
    assert(split.forall(r => r.getLong(0) === r.getLong(1)))
    // hybrid RRF lexical ranking: null/empty/whitespace docs carry no
    // shingles and must never appear as candidates on either side
    val lex = graft.operators.Retrieval.lexicalTopK(
      c.unionByName(Seq((0L, dup + " probe", "en", "web"))
        .toDF("doc_id", "text", "lang", "source"))).collect()
    val degenerate = Set(2L, 3L, 4L, 5L)
    assert(lex.forall(r => !degenerate(r.getLong(1))),
      "a shingle-less doc surfaced as a lexical candidate")
  }

  test("cdc strip: rows conserved through degenerate texts; shared dup fully stripped") {
    val out = TrainPrep.cdcStripShared(corpus).orderBy("doc_id")
      .as[(Long, String, Long)].collect()
    // every input doc keeps exactly one output row
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val byId = out.map(r => r._1 -> r).toMap
    // the two identical docs share EVERY chunk -> all boilerplate ->
    // both strip to empty, every chunk counted dropped
    assert(byId(1L)._2 === "" && byId(1L)._3 >= 1L)
    assert(byId(6L)._2 === "" && byId(6L)._3 === byId(1L)._3)
    // null / empty / whitespace texts: no chunks, nothing to drop
    Seq(2L, 3L, 4L).foreach(id =>
      assert(byId(id) === ((id, "", 0L)), s"doc $id mangled"))
    // the unique doc survives untouched
    assert(byId(5L) === ((5L, "one", 0L)))
    // drop counts are never negative anywhere
    assert(out.forall(_._3 >= 0L))
  }

  test("pq: degenerate embeddings (null, zero, null-element) encode and search without error") {
    import graft.operators.Similarity
    val v = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val emb = Seq((0L, v), (4L, v), (2L, Array.fill(64)(0f)))
      .toDF("vec_id", "embedding")
      .unionByName(Seq(Tuple1(1L)).toDF("vec_id")
        .withColumn("embedding", lit(null).cast("array<float>")))
      .unionByName(Seq((3L, Array[java.lang.Float](null) ++
          Array.fill(63)(java.lang.Float.valueOf(1.0f))))
        .toDF("vec_id", "embedding"))
    val codes = Similarity.pqEncode(emb, Similarity.pqCodebook(emb))
      .as[(Long, Seq[Long])].collect()
    // every vector (degenerate or not) gets a full, bounded code word
    assert(codes.length === 5)
    assert(codes.forall(c => c._2.length === Similarity.PqM &&
      c._2.forall(j => j >= 0 && j < Similarity.PqK)))
    // the search runs end to end; degenerate rows never crash it.
    // Pinned degenerate ordering (identical in Spark and DuckDB, so
    // oracles would agree even here): the ZERO vector's cosine is
    // 0/0 = NaN, and IEEE total order ranks NaN above every real —
    // q_vector_audit exists precisely to flag zero-norm vectors
    // BEFORE they reach a ranking; the NULL embedding's cosine is
    // NULL and sorts last.
    val got = Similarity.pqTopK(emb, k = 3).filter(col("query_id") === 0L)
      .orderBy("rk").as[(Long, Long, Long, Option[Double])].collect()
    assert(got.map(g => (g._2, g._3)).toSeq === Seq((2L, 1L), (4L, 2L), (1L, 3L)))
    assert(got(0)._4.exists(_.isNaN), "zero vector must read NaN")
    assert(got(1)._4.exists(_ > 0.999999), "exact dup keeps cosine 1.0")
    assert(got(2)._4.isEmpty, "null embedding must read NULL, ranked last")
  }

  test("residual ivf-pq: degenerate embeddings place, residualize, encode and search without error") {
    import graft.operators.Similarity
    val v = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val emb = Seq((0L, v), (4L, v), (2L, Array.fill(64)(0f)))
      .toDF("vec_id", "embedding")
      .unionByName(Seq(Tuple1(1L)).toDF("vec_id")
        .withColumn("embedding", lit(null).cast("array<float>")))
      .unionByName(Seq((3L, Array[java.lang.Float](null) ++
          Array.fill(63)(java.lang.Float.valueOf(1.0f))))
        .toDF("vec_id", "embedding"))
    // every row flows through placement (a null embedding still lands
    // in SOME cell via the deterministic tie-break), the residual's
    // zip_with (null components stay null), the double-input PqEncode
    // (null component → code 0), ADC and re-rank — no crash anywhere,
    // and the exact duplicate still surfaces at rk 1
    val got = Similarity.ivfPqResidualTopK(emb, k = 3, nprobe = 2)
      .filter(col("query_id") === 0L)
      .orderBy("rk").as[(Long, Long, Long, Option[Double])].collect()
    assert(got.nonEmpty, "residual search must return rows")
    assert(got.exists(g => g._2 === 4L && g._4.exists(_ > 0.999999)),
      "the exact duplicate must surface with full-precision cosine 1.0")
  }
}
