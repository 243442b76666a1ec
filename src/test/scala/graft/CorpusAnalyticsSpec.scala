package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusAnalytics

class CorpusAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))

  // --- bigram next-token ---

  test("bigramNext counts adjacent pairs and never crosses doc boundaries") {
    val docs = docsOf(
      (1L, "a b a b c", "en", "s1"),
      (2L, "a b d", "en", "s1"),
      (3L, "z", "en", "s1")) // single token: no bigram, no crash
    val out = CorpusAnalytics.bigramNext(docs, heads = 10, perHead = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(3)) -> r.getLong(4)).toMap
    // "a b" appears 3x; "b a" 1x; "b c" 1x; "b d" 1x; never "c a" (doc
    // 1 ends at c) nor "d z" (doc boundary)
    assert(out === Map(("a", "b") -> 3L, ("b", "a") -> 1L,
      ("b", "c") -> 1L, ("b", "d") -> 1L))
  }

  test("bigramNext ranks next tokens by count then text, capped per head") {
    val docs = docsOf((1L, "x a x a x b x b x c", "en", "s1"))
    // head "x": a(2), b(2), c(1) -> rank a=1 (tie to text), b=2, c=3
    val out = CorpusAnalytics.bigramNext(docs, heads = 1, perHead = 2)
      .orderBy("pair_rank").collect()
    assert(out.map(_.getString(0)).toSet === Set("x"))
    assert(out.map(r => (r.getLong(2), r.getString(3))).toSeq ===
      Seq((1L, "a"), (2L, "b")))
  }

  // --- stratified sample ---

  test("stratifiedSample keeps the smallest stratum whole and is repartition-stable") {
    val rows = (1L to 80L).map(i => (i, s"text $i", "en", "s1")) ++
      (81L to 100L).map(i => (i, s"text $i", "de", "s1"))
    val docs = docsOf(rows: _*)
    val kept = CorpusAnalytics.stratifiedSample(docs)
      .select("doc_id").as[Long].collect().toSet
    // de is the min stratum: threshold 10000 keeps ALL de docs
    assert((81L to 100L).forall(kept.contains))
    // en is downsampled toward 20 (hash-exact count varies, bounded well
    // below the original 80)
    val enKept = kept.count(_ <= 80L)
    assert(enKept < 50, s"en kept $enKept of 80 — not downsampled")
    // determinism: a repartitioned input keeps the identical subset
    val kept2 = CorpusAnalytics.stratifiedSample(docs.repartition(7))
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 === kept)
  }

  // --- postings ---

  test("postings reports tf and 0-based first/last positions per (token, doc)") {
    val docs = docsOf(
      (1L, "w x w y w", "en", "s1"),
      (2L, "x x", "en", "s1"))
    // top-2 tokens: w(3), x(3) — tie broken to text order (w after x? no:
    // count desc then token asc -> w and x both count 3)
    val out = CorpusAnalytics.postings(docs, k = 2)
      .orderBy("token", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out === Map(
      ("w", 1L) -> ((3L, 0L, 4L)),
      ("x", 1L) -> ((1L, 1L, 1L)),
      ("x", 2L) -> ((2L, 0L, 1L))))
  }

  // --- survivorship ---

  test("survivorship keeps exactly one best-quality doc per near-dup cluster") {
    val base = "the quick brown fox jumps over the lazy dog and runs away " +
      "while the farmer watches from the old wooden gate near the quiet river bank"
    val docs = docsOf(
      (1L, base + " today", "en", "s1"),
      (2L, base + " yesterday!!!", "en", "s1"), // near-dup, more punct -> lower quality
      (3L, "completely different text about spark shuffles and partitions", "en", "s1"),
      (4L, base + " today", "en", "s2"))        // exact dup of 1
    val out = CorpusAnalytics.survivorship(docs).collect()
    // only clustered docs appear: 1, 2, 4 (3 is unpaired)
    assert(out.map(_.getLong(0)).toSet === Set(1L, 2L, 4L))
    assert(out.map(_.getLong(1)).toSet.size === 1, "one cluster expected")
    val survivors = out.filter(_.getLong(3) == 1L).map(_.getLong(0)).toSeq
    // 1 and 4 tie on quality (same text); 2's punctuation drags it down;
    // tie breaks to the lower doc_id
    assert(survivors === Seq(1L))
  }

  // --- bigram lift ---

  test("bigramLift computes n_xy·N/(n_x·n_y) and gates rare pairs") {
    val docs = docsOf(
      (1L, "a b a b", "en", "s1"),
      (2L, "a b", "en", "s1"))
    // tokens: a×3, b×3, N=6; pairs: (a,b)×3, (b,a)×1
    val all = CorpusAnalytics.bigramLift(docs, minPairs = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(5)))).toMap
    assert(all(("a", "b")) === ((3L, 3.0 * 6.0 / 9.0)))
    assert(all(("b", "a")) === ((1L, 1.0 * 6.0 / 9.0)))
    // the min-pair gate drops (b, a)
    val gated = CorpusAnalytics.bigramLift(docs, minPairs = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(gated.toSeq === Seq(("a", "b")))
  }

  // --- BM25 ---

  test("bm25Search matches the hand-computed score on a two-doc corpus") {
    val docs = docsOf(
      (1L, "a b a", "en", "s1"),
      (2L, "b b", "en", "s1"))
    // N=2, avgdl=2.5; term 'a': df=1, doc 1 tf=2, dl=3
    // idf = (2-1+0.5)/(1+0.5) = 1.0
    // score = 1.0 * (2*2.2) / (2 + 1.2*(1-0.75+0.75*(3/2.5)))
    //       = 4.4 / 3.38
    val out = CorpusAnalytics.bm25Search(docs, terms = Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet === Set(1L), "only doc 1 contains the term")
    assert(math.abs(out(1L) - 4.4 / 3.38) < 1e-12)
  }

  test("bm25Search: more on-term occurrences outrank fewer at equal length") {
    val docs = docsOf(
      (1L, "q q q x", "en", "s1"),
      (2L, "q x x x", "en", "s1"),
      (3L, "x x x x", "en", "s1"))
    val rows = CorpusAnalytics.bm25Search(docs, terms = Seq("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.map(_._1).toSet === Set(1L, 2L))
    val byDoc = rows.toMap
    assert(byDoc(1L) > byDoc(2L), "tf=3 must outrank tf=1 at equal dl")
  }

  test("bm25Search sums per-term pivots and caps at topK") {
    val docs = docsOf(
      (1L, "a b", "en", "s1"),
      (2L, "a c", "en", "s1"),
      (3L, "c c", "en", "s1"))
    val out = CorpusAnalytics.bm25Search(docs, terms = Seq("a", "b"), topK = 2)
      .collect()
    assert(out.length == 2, "topK caps the result")
    out.foreach { r =>
      // bm25 = s_a + s_b with nulls as 0, added left-to-right
      val s_a = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
      val s_b = if (r.isNullAt(2)) 0.0 else r.getDouble(2)
      assert(r.getDouble(3) == s_a + s_b)
    }
  }

  // --- corpus cube ---

  test("corpusCube margins conserve the grand total") {
    val docs = docsOf(
      (1L, "a b", "en", "s1"), (2L, "c", "en", "s2"),
      (3L, "d e f", "fr", "s1"), (4L, "g", "fr", "s1"))
    val rows = CorpusAnalytics.corpusCube(docs).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val (grandDocs, grandToks, gid) = rows((None, None))
    assert((grandDocs, grandToks, gid) === ((4L, 7L, 3L)))
    // the finest cells sum back to the grand total on both measures
    val cells = rows.filter(_._2._3 == 0L).values
    assert(cells.map(_._1).sum === grandDocs)
    assert(cells.map(_._2).sum === grandToks)
    // one margin spot check: fr rollup = both fr cells
    assert(rows((Some("fr"), None)) === ((2L, 4L, 1L)))
  }

  // --- vocabulary growth ---

  test("vocabGrowth counts distinct tokens within nested doc_id prefixes") {
    // ids 0..4 (n_ids=5): checkpoints are doc_id < 1,2,3,4,5
    val docs = docsOf(
      (0L, "a b", "en", "s1"),
      (1L, "a c", "en", "s1"),
      (2L, "a b c", "en", "s1"),   // no new tokens
      (3L, "d", "en", "s1"),
      (4L, "e f", "en", "s1"))
    val r = CorpusAnalytics.vocabGrowth(docs).collect().head
    assert((0 until 5).map(r.getLong) === Seq(2L, 3L, 3L, 4L, 6L))
  }

  // --- per-source dup rates ---

  test("dedupRates counts each doc once and rates per source") {
    val base = "the quick brown fox jumps over the lazy dog and runs away " +
      "while the farmer watches from the old wooden gate near the quiet river bank"
    val docs = docsOf(
      (1L, base + " today", "en", "s1"),
      (2L, base + " yesterday", "en", "s1"),   // near-dup of 1
      (3L, "completely different text about spark shuffles here", "en", "s1"),
      (4L, base + " today", "en", "s2"),       // exact dup of 1
      (5L, "der hund und die katze und das haus sind da", "de", "s2"))
    val out = CorpusAnalytics.dedupRates(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // duped set {1,2,4}: a doc in several pairs still counts ONCE
    assert(out("s1") === ((3L, 2L, 2.0 / 3.0)))
    assert(out("s2") === ((2L, 1L, 0.5)))
  }

  // --- mergeable source stats ---

  test("mergeSourceStats(state, delta) equals the full recompute") {
    val docs = docsOf(
      (1L, "a b c", "en", "s1"),
      (2L, "d e", "fr", "s1"),
      (3L, "f", "en", "s2"),
      (4L, "g h i j", "en", "s3"), // s3 exists only in the delta
      (5L, "k l", "de", "s2"))
    val full = CorpusAnalytics.sourceStats(docs)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val state = CorpusAnalytics.sourceStats(docs.filter($"doc_id" <= 2))
    val delta = CorpusAnalytics.sourceStats(docs.filter($"doc_id" > 2))
    val merged = CorpusAnalytics.mergeSourceStats(state, delta)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(merged === full)
    // empty delta is the identity
    val idem = CorpusAnalytics.mergeSourceStats(state,
      CorpusAnalytics.sourceStats(docs.filter($"doc_id" < 0)))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(idem === CorpusAnalytics.sourceStats(docs.filter($"doc_id" <= 2))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap)
  }

  // --- temperature mix ---

  test("temperatureMix keeps the head language whole and flattens tails") {
    val docs = docsOf(
      (1 to 16).map(i => (i.toLong, "t", "en", "s1")) ++
        (17 to 20).map(i => (i.toLong, "t", "fr", "s1")): _*)
    val out = CorpusAnalytics.temperatureMix(docs)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val (enN, enThr, enKept) = out("en")
    val (frN, frThr, frKept) = out("fr")
    assert((enN, frN) === ((16L, 4L)))
    assert(enThr == 10000L && enKept == 16L, "head language keeps everything")
    // √(4/16) = 0.5 exactly → threshold 5000; kept is a subset
    assert(frThr == 5000L)
    assert(frKept <= frN)
    // √-flattening beats proportional: thr(τ=1/2)=5000 > thr(τ=1)=2500
    assert(frThr > frN * 10000L / enN)
  }

  test("temperatureMix is repartition-stable (salted-hash membership)") {
    val docs = docsOf(
      (1 to 30).map(i =>
        (i.toLong, "t", if (i % 3 == 0) "fr" else "en", "s1")): _*)
    val a = CorpusAnalytics.temperatureMix(docs)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    val b = CorpusAnalytics.temperatureMix(docs.repartition(7))
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    assert(a === b)
  }

  test("rare bigrams: boilerplate scores 0, gibberish scores 1, short docs drop") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", "en", "web"),   // common pairs
      (2L, "alpha beta alpha beta", "en", "web"),              // same pairs
      (3L, "zork quux fnord blarg", "en", "web"),              // all unique
      (4L, "single", "en", "web"),                             // no bigram
      (5L, "", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusAnalytics.rareBigramNovelty(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // docs without a bigram emit no row
    assert(out.keySet === Set(1L, 2L, 3L))
    // alpha→beta occurs 5x, beta→alpha 3x: all of doc 1/2's pairs are
    // common (corpus count > 2) → ratio 0
    assert(out(1L)._3 === 0.0 && out(2L)._3 === 0.0)
    // doc 3's three pairs each occur once → all rare
    assert(out(3L) === ((3L, 3L, 1.0)))
  }

  test("source divergence: identical mixes score 0, a skewed source scores > 0, l1 <= 2") {
    // L1 = l1_num / (n_tokens_src * n_all) — the operator emits the
    // exact integer factors; the ratio is derived here
    def l1 (r: org.apache.spark.sql.Row): Double =
      r.getLong(3).toDouble / (r.getLong(1).toDouble * r.getLong(2))
    val same = Seq(
      (1L, "aa bb cc", "en", "s1"), (2L, "aa bb cc", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    CorpusAnalytics.sourceTokenDivergence(same).collect().foreach { r =>
      assert(r.getLong(3) === 0L,
        s"identical distributions must diverge 0, got $r")
    }
    val skew = Seq(
      (1L, "aa aa aa aa", "en", "s1"),
      (2L, "bb bb bb bb", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusAnalytics.sourceTokenDivergence(skew)
      .collect().map(r => r.getString(0) -> l1(r)).toMap
    // each source holds half the corpus and shares NO token with the
    // other: L1 = |1 - 1/2| + |0 - 1/2| = 1 exactly
    assert(out === Map("s1" -> 1.0, "s2" -> 1.0))
  }

  test("source divergence: bit-deterministic across runs and partitionings") {
    // pins the round-9 red-row fix: the aggregate uses min (never
    // first, which Catalyst marks nondeterministic) and every sum is
    // exact decimal — the output surface is now integer-only (the
    // round-12 cure for the last-ulp oracle mismatch), so REPEATED
    // runs and ANY physical partitioning must produce identical rows
    val docs = (1 to 40).map { i =>
      (i.toLong, s"tok${i % 7} tok${i % 5} shared tok${i % 11} x$i",
        "en", s"src${i % 4}")
    }.toDF("doc_id", "text", "lang", "source")
    def bits(d: org.apache.spark.sql.DataFrame) =
      CorpusAnalytics.sourceTokenDivergence(d).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
        .sortBy(_._1)
    val base = bits(docs)
    assert(bits(docs) === base, "re-run changed the bits")
    assert(bits(docs.repartition(13)) === base,
      "partitioning changed the bits")
    assert(bits(docs.repartition(1)) === base,
      "single-partition run changed the bits")
  }

  test("lm perplexity: outliers score high, fluent twins score low, LOO excludes self") {
    import org.apache.spark.sql.Row
    // s1/s2 are identical — under leave-one-out each is scored against
    // the other's counts, so every bigram is "seen in the rest" and the
    // score is low. s3 shares NO tokens with the corpus: every position
    // bottoms out at the 1/N_rest floor — maximal surprise.
    val docs = Seq(
      (1L, "the cat sat on the mat", "en", "s1"),
      (2L, "the cat sat on the mat", "en", "s2"),
      (3L, "zz qq ww rr zz qq", "en", "s3"))
      .toDF("doc_id", "text", "lang", "source")
    val out = CorpusAnalytics.lmPerplexity(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    // identical docs, identical integer scores
    assert(out(1L).getLong(3) === out(2L).getLong(3))
    assert(out(1L).getLong(2) === 5L, "6 tokens -> 5 bigram positions")
    // the unique-vocab doc is the per-language tail
    val perPos = out.view.mapValues(_.getDouble(4)).toMap
    assert(perPos(3L) > perPos(1L),
      s"unique-vocab doc must out-score fluent twins: $perPos")
    assert(out(3L).getString(5) === "tail")
    // LOO floor check: every one of doc 3's 5 positions is
    // token-unique to the doc, so nats = 5 * round(1e6*ln(N_rest)),
    // N_rest = corpus tokens minus doc 3's 6
    val nRest = 6 + 6 // two twin docs of 6 tokens each
    val floor = math.round(math.log(nRest.toDouble) * 1e6)
    assert(out(3L).getLong(3) === 5L * floor)
  }

  test("lm perplexity approx: accuracy contract — within one bucket of exact, no per-language sort") {
    val docs = graft.tables.Tables.documents(spark, sf("sf0.001"))
    def bnum(b: String): Int = b match {
      case "head" => 1; case "middle" => 2; case _ => 3
    }
    val exact = CorpusAnalytics.lmPerplexity(docs)
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    val approx = CorpusAnalytics.lmPerplexityApprox(docs)
      .select("doc_id", "ppl_bucket").as[(Long, String)].collect().toMap
    assert(approx.keySet === exact.keySet, "approx must bucket every scored doc")
    approx.foreach { case (id, b) =>
      assert(math.abs(bnum(b) - bnum(exact(id))) <= 1,
        s"doc $id: approx bucket $b vs exact ${exact(id)}")
    }
    // and most docs agree outright (boundary ties are the only slack)
    val agree = approx.count { case (id, b) => b == exact(id) }
    assert(agree >= approx.size * 9 / 10,
      s"only $agree of ${approx.size} bucket assignments agree")
    // the scale point: NO window operator (the exact form's per-language
    // ntile sort) anywhere in the approx plan — h_d's doc-keyed window
    // in the scoring chain is the one allowed exception
    val out = CorpusAnalytics.lmPerplexityApprox(docs)
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    windows.foreach { w =>
      val parts = w.partitionSpec.flatMap(_.references.map(_.name))
      assert(parts.exists(_.startsWith("doc_id")),
        s"approx plan may only window per-doc, found partition on $parts")
    }
  }

  test("lm perplexity: deterministic across partitionings, one-token docs dropped") {
    val docs = (1 to 30).map { i =>
      (i.toLong, s"a${i % 5} b${i % 3} c${i % 7} a${i % 5}", "en", "s")
    }.toDF("doc_id", "text", "lang", "source")
      .unionByName(Seq((99L, "solo", "en", "s"))
        .toDF("doc_id", "text", "lang", "source"))
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusAnalytics.lmPerplexity(d).collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getString(5))).sortBy(_._1)
    val base = run(docs)
    assert(!base.exists(_._1 == 99L), "single-token doc has no bigram row")
    assert(run(docs.repartition(7)) === base.toSeq.toArray,
      "partitioning changed scores or buckets")
  }

  test("property: lmPerplexity matches a brute-force reference on random corpora") {
    // independent reference: plain Scala maps, no Spark — same LOO
    // bigram semantics, same micro-nat quantization
    def qln(n: Long): Long = math.round(math.log(n.toDouble) * 1e6)
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      val corpus = (1 to 12).map { i =>
        val n = 1 + rnd.nextInt(9) // includes 1-token docs (dropped)
        (i.toLong,
          Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
          "en", s"s${i % 3}")
      }
      val toks = corpus.map { case (id, t, _, _) =>
        id -> t.split(" ").toSeq
      }.toMap.filter(_._2.size >= 2)
      val bg = toks.view.mapValues(ts => ts.zip(ts.tail)).toMap
      def counts[K](xs: Iterable[K]): Map[K, Long] =
        xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cAll = counts(bg.values.flatten)
      val hAll = counts(bg.values.flatten.map(_._1))
      val uAll = counts(toks.values.flatten)
      val nAll = toks.values.map(_.size.toLong).sum
      val want = toks.map { case (id, ts) =>
        val cDoc = counts(bg(id))
        val hDoc = counts(bg(id).map(_._1))
        val uDoc = counts(ts)
        val nRest = nAll - ts.size
        val nats = -bg(id).map { case b @ (w1, w2) =>
          val cRest = cAll(b) - cDoc(b)
          val hRest = hAll(w1) - hDoc(w1)
          val uRest = uAll(w2) - uDoc(w2)
          if (cRest > 0) qln(cRest) - qln(hRest)
          else if (uRest > 0) qln(2) - qln(5) + qln(uRest) - qln(nRest)
          else -qln(nRest)
        }.sum
        id -> ((ts.size.toLong - 1, nats))
      }
      val got = CorpusAnalytics.lmPerplexity(
        corpus.toDF("doc_id", "text", "lang", "source")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      assert(got === want, s"seed $seed diverged from the reference")
    }
  }

  // --- guaranteed heavy hitters (MG candidates → exact verify) ---

  /** Reference heavy hitters: the full-shuffle spelling the operator
    * exists to avoid — exact by construction. */
  private def bruteHeavy(docs: org.apache.spark.sql.DataFrame, k: Int) = {
    val t = docs.select(explode(graft.functions.tokens(col("text"))).as("token"))
    val n = t.count()
    t.groupBy("token").count()
      .filter(col("count") * k > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("heavyHitters: hand-checked corpus, strict 1/k boundary excluded") {
    // 20 tokens total; k=4 → heavy needs count*4 > 20, i.e. count >= 6.
    // "a" has 6 (heavy), "b" has exactly 5 (5*4 == 20: boundary, OUT).
    val docs = docsOf(
      (1L, "a a a b b c d e f", "en", "s1"),
      (2L, "a a a b b b g h i j k", "en", "s1"))
    val out = CorpusAnalytics.heavyHitters(docs, k = 4, capacity = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a", 6L, 20L)))
  }

  test("heavyHitters: adversarial skew survives a tiny capacity") {
    // one token holds >1/3 of the stream among many distinct fillers;
    // capacity 4 << distinct count, yet MG must retain it (k=3 ≤ cap+1)
    val filler = (1 to 60).map(i => s"f$i").mkString(" ")
    val docs = docsOf(
      (1L, ("hot " * 40).trim, "en", "s1"),
      (2L, filler, "en", "s1"))
    val out = CorpusAnalytics.heavyHitters(docs, k = 3, capacity = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("hot", 40L)))
  }

  test("heavyHitters: property — equals brute force; capacity- and partitioning-invariant") {
    import org.scalacheck.Gen
    val genDoc = Gen.nonEmptyListOf(
      Gen.frequency(5 -> Gen.const("hh"), 3 -> Gen.const("mid"),
        2 -> Gen.oneOf((1 to 12).map(i => s"t$i")))).map(_.mkString(" "))
    val genCorpus = Gen.nonEmptyListOf(genDoc)
    samples(genCorpus, 8).zipWithIndex.foreach { case (texts, ci) =>
      val docs = docsOf(texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "s1") }: _*)
      for (k <- Seq(2, 5, 16)) {
        val expect = bruteHeavy(docs, k)
        val got = CorpusAnalytics.heavyHitters(docs, k, capacity = k + 3)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got === expect, s"corpus $ci k=$k")
        // a roomier sketch changes the work, never the answer
        val roomy = CorpusAnalytics.heavyHitters(docs, k, capacity = 4 * k)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(roomy === got, s"capacity-invariance broke: corpus $ci k=$k")
        // ... and neither does the physical partitioning
        val reparts = CorpusAnalytics
          .heavyHitters(docs.repartition(7), k, capacity = k + 3)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(reparts === got, s"partitioning-invariance broke: corpus $ci k=$k")
      }
    }
  }

  test("heavyHitters: null / empty texts are transparent") {
    val docs = docsOf(
      (1L, "x x x x", "en", "s1"), (2L, "", "en", "s1"))
      .union(Seq((3L, null.asInstanceOf[String], "en", "s1", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val out = CorpusAnalytics.heavyHitters(docs, k = 2, capacity = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("x", 4L, 4L)))
  }

  test("heavyHitters rejects a capacity below the exactness bound") {
    val docs = docsOf((1L, "a b", "en", "s1"))
    intercept[IllegalArgumentException] {
      CorpusAnalytics.heavyHitters(docs, k = 10, capacity = 4)
    }
  }

  test("stripHeavyTokens: removes exactly the heavy set, preserving position order") {
    // same corpus as the hand-checked heavyHitters test: heavy = {a}
    // (6 of 20 with k=4; "b" at exactly 5*4 == 20 stays — boundary OUT
    // of the heavy set means IN the kept text)
    val docs = docsOf(
      (1L, "a a a b b c d e f", "en", "s1"),
      (2L, "a a a b b b g h i j k", "en", "s1"))
    val out = CorpusAnalytics.stripHeavyTokens(docs, k = 4, capacity = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 9L, 6L, "b b c d e f"),
      (2L, 11L, 8L, "b b b g h i j k")))
  }

  test("stripHeavyTokens: empty heavy set keeps every token verbatim") {
    // max share is 2/8 = 1/4; k=4 needs a STRICT >1/4 share → nothing
    // is heavy, and the broadcast heavy array is empty (the
    // array_contains-on-empty path must keep, not null-drop)
    val docs = docsOf(
      (1L, "p q r s", "en", "s1"),
      (2L, "p q t u", "en", "s1"))
    val out = CorpusAnalytics.stripHeavyTokens(docs, k = 4, capacity = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 4L, 4L, "p q r s"), (2L, 4L, 4L, "p q t u")))
  }

  test("stripHeavyTokens: capacity- and partitioning-invariant; empty/null text") {
    val docs = docsOf(
      (1L, ("hot " * 12).trim + " w x y z", "en", "s1"),
      (2L, "", "en", "s1"))
      .union(Seq((3L, null.asInstanceOf[String], "en", "s1", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    def run(d: org.apache.spark.sql.DataFrame, cap: Int) =
      CorpusAnalytics.stripHeavyTokens(d, k = 3, capacity = cap)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3)))
    val base = run(docs, 4)
    // "hot" has 12/16 > 1/3 → stripped; empty text stays empty; null
    // text propagates null counts but concat_ws yields "" (never null)
    assert(base.toSeq === Seq(
      (1L, 16L, 4L, "w x y z"), (2L, 0L, 0L, ""), (3L, -1L, -1L, "")))
    assert(run(docs, 16).toSeq === base.toSeq,
      "capacity-invariance broke")
    assert(run(docs.repartition(5), 4).toSeq === base.toSeq,
      "partitioning-invariance broke")
  }

  test("streaming MG candidates: heavy survivors match the batch operator") {
    import org.apache.spark.sql.streaming.Trigger
    // skewed corpus split over 3 files → 3 micro-batches (merge order
    // differs from any batch partitioning)
    val fixture = docsOf((1L to 30L).map { i =>
      val body = if (i % 3 == 0) "hot hot hot" else s"t$i u$i v$i"
      (i, body, "en", "s1")
    }: _*)
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-stream")
    fixture.repartition(3).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(fixture.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val q = CorpusAnalytics.streamingHeavyCandidates(stream, capacity = 8)
      .writeStream.format("memory").queryName("hh_cands")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish")
    val cands = spark.table("hh_cands").collect()
      .head.getSeq[String](0).toSet
    assert(cands.size <= 8, s"state exceeded capacity: $cands")
    // every TRUE heavy token survives any merge order…
    val expect = bruteHeavy(fixture, k = 4)
    assert(expect.keySet.subsetOf(cands),
      s"heavy ${expect.keySet} must survive in candidates $cands")
    // …and the streamed-state → exact-verify composite equals the
    // batch operator's answer
    val total = fixture
      .select(explode(graft.functions.tokens(col("text"))).as("token")).count()
    val verified = fixture
      .select(explode(graft.functions.tokens(col("text"))).as("token"))
      .filter(col("token").isin(cands.toSeq: _*))
      .groupBy("token").count()
      .filter(col("count") * 4 > total)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = CorpusAnalytics.heavyHitters(fixture, k = 4, capacity = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(verified === batch)
  }

  test("quality drift: identical distributions score exactly zero PSI") {
    // same docs on both sides: every bin has n_ref == n_probe and the
    // totals match, so dln_micro is the integer 0 and psi_part is 0.0
    val docs = docsOf(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s1"),
      (2L, "a b c d", "en", "s1"),
      (3L, "the the the and and of", "en", "s1"))
    val out = CorpusAnalytics.qualityDrift(docs, docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(3) === 0L, s"bin ${r.getLong(0)} dln nonzero")
      assert(r.getDouble(4) === 0.0)
    }
  }

  test("quality drift: bins present on one side only are null-flagged alert rows") {
    // reference all low quality (no stopwords), probe all high (dense
    // stopwords + length bonus) — distributions are disjoint, so every
    // bin is one-sided and must surface with NULL dln/psi, not vanish
    val ref = docsOf((1L, "zz yy xx ww", "en", "s1"))
    val probe = docsOf(
      (5L, Seq.fill(25)("the").mkString(" "), "en", "s1"))
    val out = CorpusAnalytics.qualityDrift(ref, probe).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.isNullAt(3), "one-sided bin got a log ratio")
      assert(r.isNullAt(4))
      assert(r.getLong(1) + r.getLong(2) > 0)
    }
  }

  test("quality drift: a planted shift yields positive PSI mass") {
    // shared bin keeps both sides populated; probe adds mass to a
    // second bin both sides touch, shifting shares — summed psi_part
    // over non-null rows must be strictly positive (PSI >= 0 always,
    // = 0 only for identical share vectors)
    val lo = "zz yy xx ww"                       // score 0.0
    val hi = Seq.fill(25)("the").mkString(" ")   // score 2.5
    val ref = docsOf((1L, lo, "en", "s1"), (2L, lo, "en", "s1"),
      (3L, hi, "en", "s1"))
    val probe = docsOf((10L, lo, "en", "s1"), (11L, hi, "en", "s1"),
      (12L, hi, "en", "s1"))
    val psi = CorpusAnalytics.qualityDrift(ref, probe).collect()
      .filter(!_.isNullAt(4)).map(_.getDouble(4)).sum
    assert(psi > 0.0, s"shifted distribution scored PSI $psi")
  }

  test("drift alert: identical dists alarm zero; disjoint dists page on alert mass") {
    val lo = docsOf((1L, "zz yy xx ww", "en", "s1"), (2L, "zz yy xx ww", "en", "s1"))
    val hi = docsOf((5L, Seq.fill(25)("the").mkString(" "), "en", "s1"))
    // identical distributions: zero PSI, zero alert bins
    val same = CorpusAnalytics.driftAlert(lo, lo).collect().head
    assert(same.getLong(0) === 0L && same.getLong(1) === 0L)
    assert(same.getLong(2) === 0L && same.getLong(3) === 0L)
    // disjoint distributions: PSI's log terms never fire (no shared
    // bin) but ALL the mass lands in alert bins — the page a scalar
    // PSI alone would miss
    val moved = CorpusAnalytics.driftAlert(lo, hi).collect().head
    assert(moved.getLong(0) === 0L)
    assert(moved.getLong(1) === 2L)
    assert(moved.getLong(2) === 1L, "probe docs in probe-only bins")
    assert(moved.getLong(3) === 2L, "reference docs in vanished bins")
  }

  test("cross-source duplication matrix counts pairs by unordered source pair") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val t2 = "one two three four five six seven eight nine ten " * 5
    val docs = docsOf(
      (1L, t1, "en", "s1"), (2L, t1, "en", "s1"),  // within-source pair
      (3L, t2, "en", "s1"), (4L, t2, "en", "s2"),  // cross-source pair
      (5L, "lone wolf text nothing shared here", "en", "s3"))
    val out = CorpusAnalytics.crossSourceDups(docs)
      .orderBy("source_a", "source_b")
      .as[(String, String, Long)].collect().toSeq
    assert(out === Seq(("s1", "s1", 1L), ("s1", "s2", 1L)))
  }

  test("corpus card: hand-checked datasheet rows per source") {
    import graft.operators.CorpusFilters
    val dupText = "alpha beta gamma delta epsilon zeta"
    val leaky = "red orange yellow green blue indigo violet"
    val docs = docsOf(
      (1L, dupText, "en", "s1"), (2L, dupText, "en", "s1"), // exact dups
      (3L, "ganz anderer deutscher text hier", "de", "s1"),
      (5L, leaky, "en", "s2"),
      // doc 29 ≡ 0 mod EvalMod — the benchmark half; it shares a
      // 5-gram run with train doc 5, contaminating it
      (CorpusFilters.EvalMod.toLong, leaky + " plus a tail", "en", "s2"))
      .unionByName(Seq((4L, "en", "s2")).toDF("doc_id", "lang", "source")
        .withColumn("text", lit(null).cast("string"))
        .withColumn("n_chars", lit(null).cast("long"))
        .select($"doc_id", $"text", $"lang", $"source", $"n_chars"))
    val out = CorpusAnalytics.corpusCard(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert(s1.getLong(1) === 3L)          // n_docs
    assert(s1.getLong(2) === 0L)          // n_null_text
    assert(s1.getLong(3) === 1L)          // dup_copies: one redundant copy
    assert(s1.getLong(4) === 2L && s1.getString(5) === "en")
    assert(s1.getLong(9) === 3L && s1.getLong(10) === 0L) // n_train, clean
    val s2 = out("s2")
    assert(s2.getLong(1) === 3L)
    assert(s2.getLong(2) === 1L)          // the null-text row
    // null text joins the dup overhead by the distinct-md5 convention
    assert(s2.getLong(3) === 1L)
    assert(s2.getLong(9) === 2L)          // docs 4, 5 are the train half
    assert(s2.getLong(10) === 1L)         // doc 5 leaked from eval 29
    assert(s2.getDouble(11) === 0.5)      // contamination_rate
    // ratio consistency on every row
    out.values.foreach { r =>
      val (tok, stop, ratio) = (r.getLong(6), r.getLong(7), r.getDouble(8))
      if (tok > 0) assert(ratio === stop.toDouble / tok) else assert(ratio === 0.0)
    }
  }

  test("corpus card: a modal tie between NULL and a named lang resolves to the named lang") {
    // one doc each of lang=NULL and lang="en" in the same source — a
    // count tie; both engines must break it identically (explicit
    // NULLS LAST — Spark's plain asc is NULLS FIRST, DuckDB's is
    // NULLS LAST, so the defaults silently diverge on this corpus)
    val docs = docsOf((1L, "alpha beta gamma", "en", "s1"))
      .unionByName(Seq((2L, "delta epsilon zeta", "s1"))
        .toDF("doc_id", "text", "source")
        .withColumn("lang", lit(null).cast("string"))
        .withColumn("n_chars", lit(null).cast("long"))
        .select($"doc_id", $"text", $"lang", $"source", $"n_chars"))
    val out = CorpusAnalytics.corpusCard(docs).collect()
    assert(out.length === 1 && out.head.getString(5) === "en",
      "NULL lang must lose the tie-break to the named lang")
  }
}
