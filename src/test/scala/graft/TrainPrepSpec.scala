package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainPrep

/** Training-batch preparation operators on hand-computable fixtures. */
class TrainPrepSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int, source: String = "s1") =
    (id, Seq.fill(nTokens)("w").mkString(" "), "en", source)

  test("sequence packing: concat-then-chunk offsets within one shard") {
    // one shard (ids ≡ 0 mod 4), budget 10: docs of 4, 7, 6 tokens
    // concatenate to prefixes 0, 4, 11 -> sequences 0, 0, 1
    val docs = Seq(doc(0L, 4), doc(4L, 7), doc(8L, 6))
      .toDF("doc_id", "text", "lang", "source")
    val out = TrainPrep.sequencePack(docs, budget = 10, shards = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "seq_id", "tok_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((0L, 4L, 0L, 0L), (4L, 7L, 0L, 4L), (8L, 6L, 1L, 1L)))
  }

  test("sequence packing: shards pack independently") {
    // ids 0,4 -> shard 0 (prefixes 0,4); ids 1,5 -> shard 1 (prefixes 0,6)
    val docs = Seq(doc(0L, 4), doc(4L, 4), doc(1L, 6), doc(5L, 6))
      .toDF("doc_id", "text", "lang", "source")
    val out = TrainPrep.sequencePack(docs, budget = 5, shards = 4)
      .select("doc_id", "shard", "seq_id", "tok_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      (0L, 0L, 0L, 0L), (4L, 0L, 0L, 4L),
      (1L, 1L, 0L, 0L), (5L, 1L, 1L, 1L)))
  }

  test("token chunks cover the document with the configured overlap") {
    // 11 tokens, window 4, stride 3: chunks at 0,3,6,9 — last is short
    val toks = (1 to 11).map(i => s"t$i")
    val docs = Seq((7L, toks.mkString(" "), "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TrainPrep.tokenChunks(docs, window = 4, stride = 3)
      .orderBy("chunk_id")
      .select("chunk_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, String)].collect().toSeq
    assert(out.map(_._1) === Seq(0L, 1L, 2L, 3L))
    assert(out.map(_._2) === Seq(4, 4, 4, 2))
    assert(out.head._3 === "t1 t2 t3 t4")
    assert(out.last._3 === "t10 t11")
    // coverage: the final chunk reaches the last token
    assert(out.last._3.endsWith("t11"))
  }

  test("token chunks: a short document yields exactly one full-copy chunk") {
    val docs = Seq((1L, "a b c", "en", "s1")).toDF("doc_id", "text", "lang", "source")
    val out = TrainPrep.tokenChunks(docs, window = 10, stride = 8)
      .select("chunk_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, String)].collect().toSeq
    assert(out === Seq((0L, 3, "a b c")))
  }

  test("vocab ranks by frequency with token tie-break and assigns dense ids") {
    val docs = Seq(
      (1L, "b b b a a c", "en", "s1"),
      (2L, "a d", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TrainPrep.vocabTopK(docs, k = 3)
      .select("vocab_id", "token", "n_occurrences", "n_docs")
      .as[(Long, String, Long, Long)].collect().toSeq
    // a and b tie at 3 occurrences -> 'a' first lexicographically
    assert(out === Seq((1L, "a", 3L, 2L), (2L, "b", 3L, 1L), (3L, "c", 1L, 1L)))
  }

  test("tokenize-ids encodes in token order with OOV as id 0") {
    // vocab over this corpus: a(3) -> 1, b(2) -> 2, c(1) -> 3 with k=3;
    // 'z' stays out of vocab when k=3 is filled... use k=2: a->1, b->2,
    // c and z become OOV id 0
    val docs = Seq(
      (1L, "a b a z", "en", "s1"),
      (2L, "b c a", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TrainPrep.tokenizeIds(docs, TrainPrep.vocabTopK(docs, k = 2))
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_oov", "ids_str")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 4L, 1L, "1 2 1 0"),
      (2L, 3L, 1L, "2 0 1")))
  }

  test("repeated spans merge overlapping shared k-grams into maximal ranges") {
    import graft.operators.TextDedup
    // docs 1 and 2 share the 6-token run "p q r s t u" -> with k=5 the
    // two overlapping 5-grams (pos 1,2 in doc 1; pos 0,1 in doc 2)
    // merge into one span each; doc 3 shares nothing
    val docs = Seq(
      (1L, "x p q r s t u y", "en", "s1"),
      (2L, "p q r s t u m n", "en", "s1"),
      (3L, "entirely different words with no overlap at all", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextDedup.repeatedSpans(docs, k = 5)
      .select("doc_id", "span_start", "span_end", "n_grams")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 1L, 7L, 2L), (2L, 0L, 6L, 2L)))
  }

  test("repeated spans catch a within-document repetition") {
    import graft.operators.TextDedup
    // the 5-gram "a b c d e" occurs twice inside ONE doc (positions 0
    // and 7, gap > k so two separate spans)
    val docs = Seq(
      (1L, "a b c d e xx yy a b c d e", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextDedup.repeatedSpans(docs, k = 5)
      .select("doc_id", "span_start", "span_end", "n_grams")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 0L, 5L, 1L), (1L, 7L, 12L, 1L)))
  }

  test("repeated spans survive a pathologically hot shingle (boilerplate in most docs)") {
    import graft.operators.TextDedup
    // one 5-gram shared by ALL 40 docs — the exact shape a boilerplate
    // detector meets, and the one that used to serialize the whole
    // occurrence list into a single window partition; the salted
    // two-phase count must still report every occurrence exactly once
    val docs = (1L to 40L).map(i =>
      (i, s"f${i}x f${i}y h1 h2 h3 h4 h5 f${i}z", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextDedup.repeatedSpans(docs, k = 5)
      .select("doc_id", "span_start", "span_end", "n_grams")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === (1L to 40L).map(i => (i, 2L, 7L, 1L)).toSet)
  }

  test("rare-token ratio counts corpus-frequency-bounded tokens per doc") {
    // corpus counts: x->3, y->2, z->1; cutoff 2 -> y and z are rare
    val docs = Seq(
      (1L, "x x y z", "en", "s1"),
      (2L, "x y", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TrainPrep.rareTokenRatio(docs, cutoff = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_rare", "rare_ratio")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 4L, 2L, 0.5), (2L, 2L, 1L, 0.5)))
  }

  /** JVM twin of the operator's salted md5 bucket — the test computes
    * the exact expected copy multiset rather than asserting a
    * probabilistic "should shrink" (a 9-doc fixture CAN keep all 9). */
  private def upBucket(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"up:$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15) // 60-bit prefix, as md5Bits60
    java.lang.Long.parseLong(hex, 16) % 10000L
  }

  test("domain upsample repeats small sources and downsamples large ones") {
    // 12 docs: s_big holds 9, s_small holds 3; uniform target = 6 per
    // source -> s_small copies_base = 2 (remainder 0: every doc exactly
    // twice), s_big copies_base = 0 with a 6666-permyriad remainder
    // (each doc kept iff its salted bucket clears it)
    val docs = (0L until 9L).map(i => doc(i, 2, "s_big")) ++
      (100L until 103L).map(i => doc(i, 2, "s_small"))
    val out = TrainPrep.domainUpsample(
        docs.toDF("doc_id", "text", "lang", "source"))
      .select("doc_id", "copy_id").as[(Long, Long)].collect().toSet
    val expected =
      (100L until 103L).flatMap(i => Seq((i, 1L), (i, 2L))).toSet ++
      (0L until 9L).filter(i => upBucket(i) < 6666).map(i => (i, 1L)).toSet
    assert(out === expected)
  }

  test("property: chunks cover every token and respect the count formula") {
    import org.scalacheck.Gen
    val cases = samples(Gen.zip(Gen.choose(1, 200), Gen.choose(2, 20),
      Gen.choose(1, 19)), 25)
    // stride < window (overlap > 0) per the operator's contract
    val valid = cases.map { case (n, w, s) => (n, w, math.min(s, w - 1).max(1)) }
      .filter { case (_, w, s) => s < w }
    val docs = valid.zipWithIndex.map { case ((n, _, _), i) =>
      (i.toLong, (1 to n).map(t => s"t$t").mkString(" "), "en", "s1")
    }.toDF("doc_id", "text", "lang", "source")
    valid.zipWithIndex.foreach { case ((n, w, s), i) =>
      val chunks = TrainPrep.tokenChunks(docs.filter(col("doc_id") === i.toLong),
          window = w, stride = s)
        .select("chunk_id", "n_chunk_tokens").as[(Long, Int)].collect()
        .sortBy(_._1)
      val expectedCount = if (n <= w) 1 else 1 + ((n - w) + s - 1) / s
      assert(chunks.length === expectedCount, s"(n=$n w=$w s=$s)")
      // coverage: the last chunk must reach token n
      val last = chunks.last
      assert((chunks.length - 1) * s + last._2 === n, s"(n=$n w=$w s=$s)")
      // every chunk except possibly the last is full-width
      assert(chunks.init.forall(_._2 === w), s"(n=$n w=$w s=$s)")
    }
  }

  test("property: packing conserves tokens and bounds every offset") {
    import org.scalacheck.Gen
    val lens = samples(Gen.choose(0, 40), 60)
    val docs = lens.zipWithIndex.map { case (n, i) => doc(i.toLong, n) }
      .toDF("doc_id", "text", "lang", "source")
    val budget = 17
    val out = TrainPrep.sequencePack(docs, budget = budget, shards = 3)
      .select("shard", "n_tokens", "seq_id", "tok_offset")
      .as[(Long, Long, Long, Long)].collect()
    out.foreach { case (_, _, _, off) =>
      assert(off >= 0 && off < budget)
    }
    // per shard: the last doc's seq_id equals floor(prefix/budget) where
    // prefix sums all earlier docs -> total tokens = sum over docs
    out.groupBy(_._1).foreach { case (_, rows) =>
      val total = rows.map(_._2).sum
      val maxSeq = rows.map(_._3).max
      assert(maxSeq <= total / budget, "a sequence id beyond the token total")
    }
  }

  test("epoch shuffle is a permutation, epoch-varying, reshuffle-stable") {
    val docs = (0L until 300L).map(i => doc(i, 1))
      .toDF("doc_id", "text", "lang", "source")
    val e1 = TrainPrep.epochShuffle(docs, epoch = 1)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    // a permutation: every position 0..N-1 exactly once
    assert(e1.values.toSeq.sorted === (0L until 300L))
    // a different epoch produces a different order (same positions)
    val e2 = TrainPrep.epochShuffle(docs, epoch = 2)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(e2.values.toSeq.sorted === (0L until 300L))
    assert(e1 !== e2, "epochs must shuffle differently")
    // stable under physical repartitioning
    val e1b = TrainPrep.epochShuffle(docs.repartition(13), epoch = 1)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(e1 === e1b)
  }

  test("epoch shuffle positions are invariant to the bucket width (scale knob)") {
    // the bucket is a PREFIX of the sort hash, so widening 16^1 ->
    // 16^3 buckets (the 100-TB parallelism move) must emit byte-
    // identical positions — the knob is pure parallelism, not policy
    val docs = (0L until 300L).map(i => doc(i, 1))
      .toDF("doc_id", "text", "lang", "source")
    val narrow = TrainPrep.epochShuffle(docs, epoch = 3, nibbles = 1)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val wide = TrainPrep.epochShuffle(docs, epoch = 3, nibbles = 3)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(narrow === wide)
  }

  test("packing invariants hold at any shard count (scale knob)") {
    // shards is the parallelism axis; every count must yield valid
    // budget-respecting contiguous per-shard packings over the same
    // token totals (the assignment itself is shard-relative by design)
    val docs = (0L until 60L).map(i => doc(i, (i % 7 + 1).toInt))
      .toDF("doc_id", "text", "lang", "source")
    val budget = 11
    Seq(2, 8).foreach { shards =>
      val out = TrainPrep.sequencePack(docs, budget = budget, shards = shards)
        .select("doc_id", "shard", "n_tokens", "seq_id", "tok_offset")
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(out.map(_._3).sum === (0L until 60L).map(_ % 7 + 1).sum)
      assert(out.forall { case (id, sh, _, _, off) =>
        sh === id % shards && off >= 0 && off < budget })
      // contiguity: within a shard, each doc starts where the previous ended
      out.groupBy(_._2).foreach { case (_, rows) =>
        rows.sortBy(_._1).foldLeft(0L) { case (prefix, (_, _, n, seq, off)) =>
          assert(seq === prefix / budget && off === prefix % budget)
          prefix + n
        }
      }
    }
  }

  test("eval sample keeps exactly N per source, stable under reshuffle") {
    val docs = ((0L until 20L).map(i => doc(i, 2, "s1")) ++
      (100L until 103L).map(i => doc(i, 2, "s2")))
      .toDF("doc_id", "text", "lang", "source")
    val a = TrainPrep.evalSample(docs, perSource = 4)
      .select("source", "doc_id", "rank").as[(String, Long, Long)].collect().toSet
    assert(a.count(_._1 == "s1") === 4)
    assert(a.count(_._1 == "s2") === 3) // source smaller than N keeps all
    assert(a.filter(_._1 == "s2").map(_._3) === Set(1L, 2L, 3L))
    val b = TrainPrep.evalSample(docs.repartition(7), perSource = 4)
      .select("source", "doc_id", "rank").as[(String, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("source minhash sketches: identical sources agree on every slot") {
    import graft.operators.TextDedup
    val text = "the quick brown fox jumps over the lazy dog and runs far away today"
    val other = "zebra yak xylophone walrus vulture toucan snake raccoon quail panda owl newt"
    val docs = Seq(
      (1L, text, "en", "sa"), (2L, text, "en", "sb"), // sa == sb
      (3L, other, "en", "sc"))                        // sc disjoint
      .toDF("doc_id", "text", "lang", "source")
    val sims = TextDedup.sourceMinhashSimilarity(docs)
      .select("source_a", "source_b", "n_agree", "est_jaccard")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(sims(("sa", "sb")) === (TextDedup.NumHashes.toLong, 1.0))
    assert(sims(("sa", "sc"))._1 < TextDedup.NumHashes,
      "disjoint sources must not agree on every sketch slot")
  }

  test("domain upsample is deterministic across reshuffles") {
    val docs = ((0L until 9L).map(i => doc(i, 2, "s_big")) ++
      (100L until 103L).map(i => doc(i, 2, "s_small")))
      .toDF("doc_id", "text", "lang", "source")
    val a = TrainPrep.domainUpsample(docs)
      .select("doc_id", "copy_id").as[(Long, Long)].collect().toSet
    val b = TrainPrep.domainUpsample(docs.repartition(7))
      .select("doc_id", "copy_id").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("domain interleave: each S-stride holds at most one doc per source") {
    val docs = ((0L until 6L).map(i => doc(i, 2, "sa")) ++
      (10L until 14L).map(i => doc(i, 2, "sb")) ++
      (20L until 22L).map(i => doc(i, 2, "sc")))
      .toDF("doc_id", "text", "lang", "source")
    val out = TrainPrep.domainInterleave(docs)
      .select("doc_id", "source", "pos").as[(Long, String, Long)].collect()
    assert(out.length === 12)
    assert(out.map(_._3).distinct.length === 12, "positions are unique")
    val s = 3 // sources
    // residue class = source identity: a stride never doubles a source
    out.groupBy(_._3 % s).foreach { case (_, grp) =>
      assert(grp.map(_._2).distinct.length === 1)
    }
    // per-source positions are the dense ladder rn*S + idx
    out.groupBy(_._2).values.foreach { grp =>
      val ps = grp.map(_._3).sorted
      assert(ps.zip(ps.tail).forall { case (a, b) => b - a == s })
    }
    // reshuffle-stable
    val again = TrainPrep.domainInterleave(docs.repartition(5))
      .select("doc_id", "pos").as[(Long, Long)].collect().toSet
    assert(again === out.map(r => (r._1, r._3)).toSet)
  }

  test("train shards pack exactly the v5 keep set within the token budget") {
    val docs = graft.tables.Tables.documents(spark, sfSmoke)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val shards = graft.operators.Curate.trainShards(docs, emb)
      .select("doc_id", "n_tokens", "tok_offset")
      .as[(Long, Long, Long)].collect()
    val keep = graft.operators.Curate.curateV5(docs, emb)
      .select("doc_id").as[Long].collect().toSet
    assert(shards.map(_._1).toSet === keep,
      "every curated doc gets exactly one shard slot, nothing else does")
    assert(shards.forall(s => s._3 >= 0 &&
      s._3 < graft.operators.TrainPrep.PackBudget))
    assert(shards.nonEmpty)
  }

  /** Independent 60-bit md5 reference (MessageDigest, not TextKernel —
    * the better reference anyway). */
  private def hash60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("shard manifest conserves totals; checksums equal an independent xor") {
    val docs = graft.tables.Tables.documents(spark, sfSmoke)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val manifest = graft.operators.Curate.shardManifest(docs, emb)
      .select("shard", "seq_id", "n_docs", "n_tokens", "checksum")
      .as[(Long, Long, Long, Long, Long)].collect()
    val shards = graft.operators.Curate.trainShards(docs, emb)
      .select("doc_id", "shard", "n_tokens", "seq_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(manifest.map(_._3).sum === shards.length,
      "manifest doc counts must conserve the packed population")
    assert(manifest.map(_._4).sum === shards.map(_._3).sum,
      "manifest token totals must conserve the packed tokens")
    // every checksum equals the xor of its members' hashes, recomputed
    // from scratch with MessageDigest — so the receipt provably
    // changes when any membership changes
    val expected = shards.groupBy(r => (r._2, r._4)).map { case (k, rs) =>
      k -> rs.map(r => hash60(s"shard:${r._1}")).reduce(_ ^ _)
    }
    manifest.foreach { case (shard, seq, _, _, ck) =>
      assert(ck === expected((shard, seq)),
        s"checksum mismatch for shard=$shard seq=$seq")
    }
    assert(manifest.nonEmpty)
  }

  /** Independent BPE reference: symbol ARRAYS with the canonical
    * greedy left-to-right fold — the semantics the string-replace
    * implementation must match (the equivalence that could silently
    * break is exactly replace-on-bracket-strings ≡ array fold). */
  private def refBpe(words: Map[String, Long], k: Int)
      : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
    var state: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val ms = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to k if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, syms) <- state; Seq(a, b) <- syms.sliding(2))
        counts((a, b)) += words(w)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        ms += ((a, b, c))
        state = state.map { case (w, syms) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          for (s <- syms) {
            if (out.nonEmpty && out.last == a && s == b)
              out(out.size - 1) = a + b
            else out += s
          }
          w -> out.toVector
        }
      }
    }
    (ms.toSeq, state)
  }

  test("PROPERTY: bpe learner == fold reference on random tiny-alphabet corpora") {
    import org.scalacheck.Gen
    // a 3-letter alphabet forces heavy pair overlap (aa/ab/ba chains),
    // the regime where replace-vs-fold divergence would hide; short
    // docs keep each case fast
    val wordGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val docGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val corpusGen = Gen.choose(2, 5).flatMap(n => Gen.listOfN(n, docGen))
    samples(corpusGen, 5).foreach { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "web") }
        .toDF("doc_id", "text", "lang", "source")
      val merges = TrainPrep.bpeMerges(docs, k = 5)
        .orderBy("merge_rank")
        .as[(Long, String, String, String, Long)].collect()
      val wordCounts = docs.select(
          explode(graft.operators.TextStats.bpeTokens(col("text"))).as("word"))
        .groupBy("word").count()
        .as[(String, Long)].collect().toMap
      val (refMerges, refState) = refBpe(wordCounts, k = 5)
      assert(merges.map { case (_, l, r, _, s) => (l, r, s) }.toSeq === refMerges,
        s"merge sequence diverged on corpus $texts")
      val pairs = merges.map { case (_, l, r, _, _) => (l, r) }.toSeq
      val enc = docs.select(
          explode(graft.operators.TextStats.bpeTokens(col("text"))).as("word"))
        .distinct()
        .select(col("word"), TrainPrep.bpeEncode(col("word"), pairs).as("syms"))
        .as[(String, Seq[String])].collect()
      enc.foreach { case (w, syms) =>
        assert(syms.toVector === refState(w),
          s"encoded state diverged for '$w' on corpus $texts")
      }
    }
  }

  test("bpe merges match an independent fold reference; encoder round-trips") {
    val docs = Seq(
      (1L, "the cat sat on the mat", "en", "web"),
      (2L, "the cats sat", "en", "web"),
      (3L, "that cat, that mat! aaaa aaa", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val merges = TrainPrep.bpeMerges(docs, k = 6)
      .orderBy("merge_rank")
      .as[(Long, String, String, String, Long)].collect()
    assert(merges.map(_._1).toSeq === (1L to merges.length))
    assert(merges.forall { case (_, l, r, m, s) => m == l + r && s >= 1 })
    // reference learn over the same weighted word table ("aaaa aaa"
    // exercises the overlapping-pair greedy case)
    val wordCounts = docs.select(
        explode(graft.operators.TextStats.bpeTokens(col("text"))).as("word"))
      .groupBy("word").count()
      .as[(String, Long)].collect().toMap
    val (refMerges, refState) = refBpe(wordCounts, k = 6)
    assert(merges.map { case (_, l, r, _, s) => (l, r, s) }.toSeq === refMerges,
      "learned merge sequence diverges from the fold reference")
    // encoder: round-trips every word and reproduces the reference's
    // final symbol state exactly (same replay, same greedy semantics)
    val pairs = merges.map { case (_, l, r, _, _) => (l, r) }.toSeq
    val words = docs
      .select(explode(graft.operators.TextStats.bpeTokens(col("text"))).as("word"))
      .distinct()
      .select(col("word"),
        TrainPrep.bpeEncode(col("word"), pairs).as("syms"))
      .as[(String, Seq[String])].collect()
    words.foreach { case (word, syms) =>
      assert(syms.mkString("") === word, s"round-trip failed for '$word'")
      assert(syms.toVector === refState(word),
        s"encoder state diverges from reference for '$word'")
    }
  }

  // --- mixture budget allocation (water-filling) ---

  /** One doc row per unit of availability. */
  private def corpusOf(avail: (String, Int)*) =
    avail.flatMap { case (s, n) =>
      (1 to n).map(i => (s.hashCode.toLong * 1000 + i, "w", "en", s))
    }.toDF("doc_id", "text", "lang", "source")

  test("mixture allocation: scarce source caps, residual budget flows on") {
    // avail s1=10(w1), s2=100(w1); total=110, budget=⌊110·2/5⌋=44.
    // s1 caps (10·2 ≤ 44·1); s2 gets min(100, ⌊1·34/1⌋)=34 — spent: 44
    val out = TrainPrep.mixtureAllocation(corpusOf("s1" -> 10, "s2" -> 100),
        weights = Seq.empty)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))).toMap
    assert(out("s1") === ((10L, 1L, true, 10L)))
    assert(out("s2") === ((100L, 1L, false, 34L)))
  }

  test("mixture allocation: weights steer the uncapped split") {
    // equal avail 50/50, weights 3 vs 1; total=100, budget=40, none caps
    // (50·4 ≤ 40·3? 200≤120 no; 50·1 ≤ ...·1 no) → split 30/10 by weight
    val out = TrainPrep.mixtureAllocation(corpusOf("a" -> 50, "b" -> 50),
        weights = Seq("a" -> 3))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out === Map("a" -> 30L, "b" -> 10L))
  }

  test("mixture allocation: property — never over budget, never over avail") {
    import org.scalacheck.Gen
    val genCfg = for {
      n <- Gen.choose(1, 6)
      avails <- Gen.listOfN(n, Gen.choose(1, 40))
      ws <- Gen.listOfN(n, Gen.choose(1, 5))
    } yield (avails, ws)
    samples(genCfg, 12).foreach { case (avails, ws) =>
      val srcs = avails.indices.map(i => s"s$i")
      val docs = corpusOf(srcs.zip(avails): _*)
      val weights = srcs.zip(ws)
      val rows = TrainPrep.mixtureAllocation(docs, weights).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      val total = avails.sum.toLong
      val budget = total * TrainPrep.MixBudgetNum / TrainPrep.MixBudgetDen
      val spent = rows.map(_._4).sum
      assert(spent <= budget, s"over budget: $spent > $budget in ${rows.toSeq}")
      rows.foreach { case (s, avail, _, alloc) =>
        assert(alloc >= 0L && alloc <= avail, s"$s alloc $alloc vs avail $avail")
      }
      // the level is shared: budget shortfall only from integer floors
      // (bounded by the number of uncapped sources) or exhausted supply
      val slack = budget - spent
      val allCapped = rows.forall(r => r._4 === r._2)
      assert(allCapped || slack <= rows.length.toLong,
        s"slack $slack exceeds floor losses in ${rows.toSeq}")
      // determinism under physical partitioning
      val again = TrainPrep.mixtureAllocation(docs.repartition(7), weights)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(4)))
      assert(again.sortBy(_._1).toSeq === rows.sortBy(_._1).toSeq)
    }
  }

  test("vocab coverage: planted OOV source is called out, exact shares") {
    // vocab k=2 → {w (8 occurrences), x (3)}; source "bad" speaks only
    // OOV tokens
    val docs = Seq(
      (1L, "w w w w x", "en", "good"), (2L, "w w w w x x", "en", "good"),
      (3L, "q1 q2 q3 q4", "en", "bad"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TrainPrep.vocabCoverage(docs, k = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("good") === ((11L, 0L, 0.0)))
    assert(out("bad") === ((4L, 4L, 1.0)))
  }

  test("mixture sample: capped source keeps everything, others land near alloc") {
    // s1 caps (all 10 kept — the threshold degenerates to always-true);
    // s2's realized count concentrates near its 34-doc allocation
    val docs = corpusOf("s1" -> 10, "s2" -> 100)
    val kept = TrainPrep.mixtureSample(docs, weights = Seq.empty)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("s1") === 10, "capped source must keep every document")
    val s2 = bySrc("s2")
    assert(s2 >= 24 && s2 <= 44, s"s2 kept $s2, expected ≈34")
    // deterministic under repartition
    val again = TrainPrep.mixtureSample(docs.repartition(7), weights = Seq.empty)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(again.sortBy(_._1).toSeq === kept.sortBy(_._1).toSeq)
  }

  test("mixture allocation: budget covering all supply caps every source") {
    // budget = ⌊5·2/5⌋=2 < total — use tiny corpus where budget≥total
    // impossible via the 2/5 rule, so instead: every source equally
    // tiny relative to weights still satisfies Σalloc ≤ budget; verify
    // the all-capped branch via a direct sanity: one source alone
    val out = TrainPrep.mixtureAllocation(corpusOf("only" -> 10),
        weights = Seq.empty).collect().head
    // budget = 4, single source: 10·1 ≤ 4·1 false → uncapped,
    // alloc = min(10, ⌊1·4/1⌋) = 4
    assert((out.getBoolean(3), out.getLong(4)) === ((false, 4L)))
  }

  test("dsir weights: target-like docs keep, disjoint-vocab docs drop, exact micro-nats") {
    // target doc1 "a a b" (src0); raw adds doc2 "c c c" (src1):
    // V=3, N_tgt=3, N_raw=6; doc1's ratio folds to 3·(qln9 − qln6),
    // doc2's to 3·(qln1 − qln6 − qln4 + qln9) < 0 — hand-derived
    val docs = Seq(
      (1L, "a a b", "en", "src0"),
      (2L, "c c c", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TrainPrep.dsirWeights(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    def qln(n: Long): Long = math.round(math.log(n.toDouble) * 1e6)
    assert(out(1L) === ((3L, 3L * (qln(9) - qln(6)), true)))
    assert(out(2L) === ((3L,
      3L * (qln(1) - qln(6) - qln(4) + qln(9)), false)))
    // determinism under repartition
    val re = TrainPrep.dsirWeights(docs.repartition(5)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(re === out)
    // an absent target source: the target LM degenerates to uniform
    // add-one mass (nn_tgt = 0) — never throws, and the common-token
    // doc still scores below the rare-token doc
    val none = TrainPrep.dsirWeights(docs, targetSource = "nope").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(none.size === 2 && none(2L) < 0 && none(2L) < none(1L))
  }

  test("property: dsir weights match a brute-force reference on random corpora") {
    def qln(n: Long): Long = math.round(math.log(n.toDouble) * 1e6)
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
      val corpus = (1 to 10).map { i =>
        val n = 1 + rnd.nextInt(8)
        (i.toLong,
          Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
          "en", s"src${i % 3}")
      }
      val toks = corpus.map { case (id, t, _, s) =>
        id -> ((s, t.split(" ").toSeq))
      }.toMap
      def counts[K](xs: Iterable[K]): Map[K, Long] =
        xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val raw = counts(toks.values.flatMap(_._2))
      val tgt = counts(toks.values.filter(_._1 == "src0").flatMap(_._2))
      val v = raw.size.toLong
      val nnRaw = raw.values.sum
      val nnTgt = tgt.values.sum
      val want = toks.map { case (id, (s, ts)) =>
        val logw = ts.map { w =>
          qln(tgt.getOrElse(w, 0L) + 1) - qln(nnTgt + v) -
            qln(raw(w) + 1) + qln(nnRaw + v)
        }.sum
        id -> ((s, ts.size.toLong, logw, logw > 0))
      }
      val got = TrainPrep.dsirWeights(
        corpus.toDF("doc_id", "text", "lang", "source")).collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
        .toMap
      assert(got === want, s"seed $seed diverged from the reference")
    }
  }

  // --- leakage-guarded split ---

  test("leakage split: every near-dup pair lands in one split, singletons hash alone") {
    val docs = graft.tables.Tables.documents(spark, sf("sf0.001"))
    val pairs = graft.operators.TextDedup.minhashPairs(docs)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    graft.operators.TextDedup.withDedupClusters(
      graft.operators.TextDedup.minhashPairs(docs)) { labels =>
      val split = TrainPrep.leakageSplit(docs, labels)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      // full coverage: one assignment per document
      assert(split.size === docs.count())
      // the guard: both ends of every verified near-dup pair co-assigned
      assert(pairs.nonEmpty, "fixture has no near-dup pairs — guard untested")
      pairs.foreach { case (a, b) =>
        assert(split(a)._2 === split(b)._2, s"pair ($a,$b) straddles the split")
        assert(split(a)._1 === split(b)._1)
      }
      // docs outside every cluster fall back to their own id
      val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      split.collect { case (id, (cid, _)) if !clustered(id) =>
        assert(cid === id, s"singleton $id got foreign cluster $cid")
      }
    }
  }

  test("leakage split: cluster-keyed bucket differs from the per-doc split stream") {
    // a near-dup pair under the PLAIN per-doc split can straddle; under
    // the leakage split it cannot — build one adversarial pair whose
    // doc-id buckets differ (ids found by scanning the hash stream)
    val candidates = (0L until 4000L).grouped(2).collect {
      case Seq(a, b) => (a, b)
    }.find { case (a, b) =>
      def bkt(id: Long) = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"split:$id".getBytes("UTF-8"))
        (((md(0) & 0xff) << 8) | (md(1) & 0xff)) % 100
      }
      (bkt(a) < 80) != (bkt(b) < 80)
    }
    assert(candidates.nonEmpty, "no id pair with differing plain buckets in range")
    val (a, b) = candidates.get
    val text = "u v w x y z " * 10
    val docs = Seq((a, text, "en", "s1"), (b, text, "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    graft.operators.TextDedup.withDedupClusters(
      graft.operators.TextDedup.minhashPairs(docs)) { labels =>
      val out = TrainPrep.leakageSplit(docs, labels)
        .select("split").distinct().collect()
      assert(out.length === 1, "exact twins were split across partitions")
    }
  }

  test("incremental leakage split: near-dup probes inherit the standing split") {
    import graft.operators.TextDedup
    val t = "alpha beta gamma delta epsilon zeta eta theta " * 8
    val standing = Seq(
      (1L, t, "en", "s1"), (2L, t, "en", "s1"),          // a standing cluster (root 1)
      (3L, "one two three four five six seven", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val probe = Seq(
      (10L, t, "en", "s1"),                               // twin of the cluster
      (20L, "nine ten eleven twelve thirteen fourteen fifteen", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    TextDedup.withDedupClusters(TextDedup.minhashPairs(standing)) { labels =>
      val standingSplit = TrainPrep.leakageSplit(standing, labels)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      val out = TrainPrep.leakageSplitIncrement(probe, standing, labels)
        .orderBy("doc_id")
        .select("doc_id", "cluster_id", "inherited", "split")
        .as[(Long, Long, Boolean, String)].collect().toSeq
      // probe 10 inherits cluster 1 and EXACTLY the split doc 1 carries
      assert(out.head === ((10L, 1L, true, standingSplit(1L))))
      // probe 20 matched nothing: own-id cluster, own-id leak bucket
      val (id, cid, inh, _) = out(1)
      assert((id, cid, inh) === ((20L, 20L, false)))
    }
  }

  test("incremental leakage split: inherited splits agree with the standing corpus at sf0.001") {
    import graft.operators.TextDedup
    val docs = graft.tables.Tables.documents(spark, sf("sf0.001"))
    val probe = docs.filter(col("doc_id") % TextDedup.IncrementMod === 0)
    val standing = docs.filter(col("doc_id") % TextDedup.IncrementMod =!= 0)
    TextDedup.withDedupClusters(TextDedup.minhashPairs(standing)) { labels =>
      val standingByCluster = TrainPrep.leakageSplit(standing, labels)
        .select("cluster_id", "split").distinct()
        .as[(Long, String)].collect().toMap
      val inc = TrainPrep.leakageSplitIncrement(probe, standing, labels)
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getString(3)))
      assert(inc.length === probe.count())
      val inherited = inc.filter(_._3)
      assert(inherited.nonEmpty, "fixture has no cross-increment near-dups")
      inherited.foreach { case (id, cid, _, split) =>
        assert(standingByCluster(cid) === split,
          s"probe $id diverged from standing cluster $cid")
      }
    }
  }

  // --- curriculum stages ---

  test("curriculum: two-level rank equals the naive global-window ntile") {
    val docs = graft.tables.Tables.documents(spark, sf("sf0.001"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("quality_score").desc, col("doc_id"))
    val naive = graft.operators.TextStats.qualityFeatures(docs)
      .select(col("doc_id"), col("quality_score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("stage", ntile(TrainPrep.CurriculumStages).over(w).cast("long"))
      .orderBy(col("rank"))
      .collect().toSeq
    val scalable = TrainPrep.qCurriculum(spark, sf("sf0.001")).collect().toSeq
    assert(naive.nonEmpty)
    assert(scalable === naive)
  }

  test("curriculum mix: per-stage totals conserve the corpus") {
    val docs = graft.tables.Tables.documents(spark, sf("sf0.001"))
    val mix = TrainPrep.curriculumMix(docs).collect()
    val nDocs = mix.map(_.getLong(2)).sum
    assert(nDocs === docs.count())
    // every stage 1..k appears and carries at least one doc
    val stages = mix.map(_.getLong(0)).toSet
    assert(stages === (1L to TrainPrep.CurriculumStages.toLong).toSet)
  }

  test("curriculum admission: probes take the best stage whose frozen floor they meet") {
    // thresholds: stage 1 floor 2.0, stage 2 floor 1.0, stage 3 floor 0.5
    val thr = Seq((1L, 2.0), (2L, 1.0), (3L, 0.5))
      .toDF("stage", "floor_score")
    // quality = stop_ratio*2 (+0.5 if >=20 toks) - punct_ratio; craft
    // probes via stopword density ("the" is a stopword): all-stopword
    // text scores 2.0, half-stopword 1.0, none 0.0
    val probe = Seq(
      (1L, "the the the the", "en", "s1"),  // score 2.0 -> meets stage 1
      (2L, "the w the w", "en", "s1"),      // score 1.0 -> stage 2
      (3L, "w w w w", "en", "s1")           // score 0.0 -> below all -> k
    ).toDF("doc_id", "text", "lang", "source")
    val out = TrainPrep.curriculumAssign(probe, thr, k = 4)
      .orderBy("doc_id").select("doc_id", "stage")
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 2L), (3L, 4L)))
  }

  test("curriculum admission: stage = minimal frozen floor the score meets") {
    // the operator's exact contract, checked doc by doc against
    // driver-side floors. (A full round-trip equality with
    // curriculumStages does NOT hold in general: a score TIE straddling
    // a stage boundary is split by doc_id in the ranking, but
    // score-only floors cannot see the tiebreak — such docs re-admit
    // one stage up, by design.)
    val docs = graft.tables.Tables.documents(spark, sf("sf0.001"))
    val thr = TrainPrep.curriculumThresholds(docs)
    val floors = thr.orderBy("stage")
      .select("stage", "floor_score").as[(Long, Double)].collect().toSeq
    val scores = graft.operators.TextStats.qualityFeatures(docs)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val back = TrainPrep.curriculumAssign(docs, thr)
      .select("doc_id", "stage").as[(Long, Long)].collect().toMap
    assert(back.size === scores.size)
    val k = TrainPrep.CurriculumStages.toLong
    back.foreach { case (id, stage) =>
      val want = floors.collectFirst {
        case (s, f) if scores(id) >= f => s
      }.getOrElse(k)
      assert(stage === want, s"doc $id score ${scores(id)}")
    }
    // and most docs DO round-trip (only boundary ties shift): sanity
    // that the frozen floors reproduce the curriculum in the main
    val full = TrainPrep.curriculumStages(docs)
      .select("doc_id", "stage").as[(Long, Long)].collect().toMap
    val drift = back.count { case (id, s) => s != full(id) }
    assert(drift <= full.size / 20, s"$drift of ${full.size} re-admissions drifted")
  }

  test("property: curriculum two-level rank == naive under heavy score ties") {
    // few distinct token mixes -> few distinct quality scores over many
    // docs, so bucket boundaries land ON ties — the case where an
    // inexact two-level rank would misorder or misplace a stage edge
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed * 7919)
      val rows = (0 until 40).map { i =>
        val nStop = rnd.nextInt(3)
        val nOther = rnd.nextInt(3)
        val toks = Seq.fill(nStop)("the") ++ Seq.fill(nOther)("zz")
        (i.toLong, toks.mkString(" "), "en", "s1")
      }
      val d = rows.toDF("doc_id", "text", "lang", "source")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("quality_score").desc, col("doc_id"))
      val naive = graft.operators.TextStats.qualityFeatures(d)
        .select(col("doc_id"), col("quality_score"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("stage",
          ntile(TrainPrep.CurriculumStages).over(w).cast("long"))
        .orderBy(col("rank")).collect().toSeq
      val scalable = TrainPrep.curriculumStages(d)
        .orderBy(col("rank")).collect().toSeq
      assert(scalable === naive, s"seed $seed diverged under ties")
    }
  }

  test("curriculum approx: accuracy contract — near-balanced stages, within one stage of exact") {
    val docs = graft.tables.Tables.documents(spark, sf("sf0.001"))
    val k = TrainPrep.CurriculumStages
    val approx = TrainPrep.curriculumStagesApprox(docs)
      .select("doc_id", "stage").as[(Long, Long)].collect().toMap
    val exact = TrainPrep.curriculumStages(docs)
      .select("doc_id", "stage").as[(Long, Long)].collect().toMap
    assert(approx.keySet === exact.keySet, "approx must stage every doc")
    // stage-size skew: boundary TIES move whole tie-groups to one side
    // (exact ntile splits them by doc_id; score-only boundaries
    // cannot), so tolerance = the largest tie group, not a constant
    val scores = graft.operators.TextStats.qualityFeatures(docs)
      .select("doc_id", "quality_score").as[(Long, Double)].collect()
    val maxTie = scores.groupBy(_._2).values.map(_.length).max
    val n = scores.length
    val sizes = approx.values.groupBy(identity).view.mapValues(_.size)
    (1 to k).foreach { s =>
      val sz = sizes.getOrElse(s.toLong, 0)
      assert(math.abs(sz - n / k) <= maxTie + 1,
        s"stage $s size $sz vs ideal ${n / k} (tie tolerance $maxTie)")
    }
    // per-doc agreement: never further than one stage from exact
    approx.foreach { case (id, s) =>
      assert(math.abs(s - exact(id)) <= 1L,
        s"doc $id: approx stage $s vs exact ${exact(id)}")
    }
    // and with ties excluded, the two splits agree exactly for most docs
    val agree = approx.count { case (id, s) => s == exact(id) }
    assert(agree >= n * 9 / 10, s"only $agree of $n assignments agree")
    // no global ordering anywhere in the approx plan
    val out = TrainPrep.qCurriculumApprox(spark, sf("sf0.001"))
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, "approx staging must not introduce windows")
  }

  test("curriculum: stages are balanced and no window is globally ordered") {
    val out = TrainPrep.qCurriculum(spark, sf("sf0.001"))
    val sizes = out.groupBy("stage").count()
      .select("count").as[Long].collect()
    assert(sizes.length === TrainPrep.CurriculumStages)
    assert(sizes.max - sizes.min <= 1, s"unbalanced stages: ${sizes.toSeq}")
    // the scalable claim: every window in the plan is partitioned
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"global-order window funnel in curriculum plan: $w"))
  }

  // --- content-defined chunking ---

  private def cdcDoc(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))

  test("cdc: chunks partition the token stream in order, boundaries follow markers") {
    val text = (1 to 200).map(i => s"w$i").mkString(" ")
    val d = cdcDoc((1L, text))
    val chunks = TrainPrep.cdcChunks(d).orderBy("chunk_id")
      .select("chunk_id", "n_tokens", "chunk_text")
      .as[(Long, Long, String)].collect()
    // chunk ids contiguous from 0; concatenation restores the document
    assert(chunks.map(_._1).toSeq === (0L until chunks.length.toLong))
    assert(chunks.map(_._3).mkString(" ") === text)
    assert(chunks.map(_._2).sum === 200L)
    // every chunk except possibly the last ENDS with a marker token
    def isMarker(t: String): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cdc:$t".getBytes("UTF-8"))
      val hex = md.map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % TrainPrep.CdcDivisor == 0
    }
    chunks.dropRight(1).foreach { case (_, _, ctext) =>
      assert(isMarker(ctext.split(" ").last),
        s"non-final chunk must end at a marker: '$ctext'")
    }
    // interior tokens of any chunk are never markers
    chunks.foreach { case (_, _, ctext) =>
      ctext.split(" ").dropRight(1).foreach(t =>
        assert(!isMarker(t), s"marker '$t' must have ended its chunk"))
    }
  }

  test("cdc: insertion re-chunks ONLY the chunk it lands in (offset stability)") {
    val text = (1 to 300).map(i => s"tok$i").mkString(" ")
    val base = TrainPrep.cdcChunks(cdcDoc((1L, text)))
      .select("fp").as[Long].collect().toVector
    assert(base.length > 3, "fixture must produce several chunks")
    // insert a sentence mid-document (after token 150)
    val toks = text.split(" ")
    val edited = (toks.take(150) ++ Array("inserted", "sentence", "here") ++
      toks.drop(150)).mkString(" ")
    val after = TrainPrep.cdcChunks(cdcDoc((1L, edited)))
      .select("fp").as[Long].collect().toVector
    // every original chunk except the touched one keeps its fingerprint:
    // the edit may split/extend one chunk (so >= length-1 survivors of
    // the original multiset), a fixed-window chunking would shift EVERY
    // chunk after the insertion point
    val baseCounts = base.groupBy(identity).view.mapValues(_.length).toMap
    val afterCounts = after.groupBy(identity).view.mapValues(_.length).toMap
    val survivors = baseCounts.map { case (fp, n) =>
      math.min(n, afterCounts.getOrElse(fp, 0)) }.sum
    assert(survivors >= base.length - 1,
      s"only one chunk may change: $survivors of ${base.length} survived")
    // and the fixed-window sibling does NOT have this property here
    val fixedBase = TrainPrep.tokenChunks(cdcDoc((1L, text)))
      .select("chunk_text").as[String].collect().toSet
    val fixedAfter = TrainPrep.tokenChunks(cdcDoc((1L, edited)))
      .select("chunk_text").as[String].collect().toSet
    assert((fixedBase intersect fixedAfter).size < fixedBase.size - 1,
      "fixture too small to demonstrate the contrast")
  }

  test("cdc: shared chunks surface across documents sharing a boilerplate run") {
    val boiler = (1 to 60).map(i => s"b$i").mkString(" ")
    val d = cdcDoc(
      (1L, s"alpha one two three $boiler"),
      (2L, s"completely different prefix words $boiler"),
      (3L, "no shared content at all in this one"))
    val shared = TrainPrep.cdcSharedChunks(d)
      .select("fp", "n_docs").as[(Long, Long)].collect()
    assert(shared.nonEmpty, "the shared boilerplate must surface")
    assert(shared.forall(_._2 === 2L))
    // doc 3 contributes no shared chunk
    val doc3 = TrainPrep.cdcChunks(d).filter(col("doc_id") === 3L)
      .select("fp").as[Long].collect().toSet
    assert(shared.map(_._1).toSet.intersect(doc3).isEmpty)
  }

  test("property: cdc edit locality — one random edit changes at most one chunk") {
    import org.scalacheck.Gen
    // random doc length, edit position and edit kind (insert/delete/
    // replace one token): the CDC contract is that the chunk multiset
    // changes by AT MOST the chunks the touched position participates
    // in — for a 1-token edit that is exactly one original chunk (it
    // may split in two or merge with a neighbour when the edited token
    // was/becomes a marker, so compare surviving-multiset size, which
    // must lose at most 2: the touched chunk and — for a marker
    // delete/replace — the neighbour it merges into)
    val cases = samples(Gen.zip(Gen.choose(40, 250), Gen.choose(0, 249),
      Gen.oneOf("ins", "del", "rep")), 20)
    cases.zipWithIndex.foreach { case ((n, rawPos, kind), i) =>
      val toks = (1 to n).map(t => s"w${(t * 31 + i) % 97}x$t")
      val pos = rawPos % n
      val edited = kind match {
        case "ins" => toks.take(pos) ++ Seq("EDITED") ++ toks.drop(pos)
        case "del" => toks.take(pos) ++ toks.drop(pos + 1)
        case _     => toks.updated(pos, "EDITED")
      }
      def fps(ts: Seq[String]) = TrainPrep.cdcChunks(
          Seq((1L, ts.mkString(" "))).toDF("doc_id", "text")
            .withColumn("lang", lit("en")).withColumn("source", lit("s"))
            .withColumn("n_chars", length(col("text"))))
        .select("fp").as[Long].collect().toVector
      val base = fps(toks); val after = fps(edited)
      val baseCounts = base.groupBy(identity).view.mapValues(_.length).toMap
      val afterCounts = after.groupBy(identity).view.mapValues(_.length).toMap
      val survivors = baseCounts.map { case (fp, c) =>
        math.min(c, afterCounts.getOrElse(fp, 0)) }.sum
      assert(survivors >= base.length - 2,
        s"(n=$n pos=$pos $kind): ${base.length - survivors} chunks changed")
    }
  }

  test("cdc containment: edited near-dups pair; hot boilerplate never generates pairs") {
    val body = (1 to 120).map(i => s"c$i").mkString(" ")
    val boiler = (1 to 40).map(i => s"bb$i").mkString(" ")
    // docs 1/2: same long body, one word replaced mid-way -> CDC keeps
    // every untouched chunk identical -> high containment pair.
    // docs 3..12: UNRELATED bodies + the same boilerplate run carried
    // by all twelve docs -> its fps exceed CdcMaxFpDocs=8 and are
    // gated out, so no boilerplate-only pair may surface.
    val d = (Seq(
      (1L, s"$body $boiler"),
      (2L, s"${body.replace("c60", "EDITED")} $boiler")) ++
      (3L to 12L).map(i =>
        (i, (1 to 80).map(j => s"u${i}_$j").mkString(" ") + " " + boiler)))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val pairs = TrainPrep.cdcContainmentPairs(d)
      .select("doc_a", "doc_b", "containment")
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)),
      s"exactly the edited near-dup must pair, got ${pairs.toSeq}")
    // conservative by construction: gated (hot) fps still count in the
    // denominator but never as evidence, so the boilerplate tail
    // depresses the fraction — 8 of 13 chunks here
    assert(pairs.head._3 > 0.55, "one mid-doc edit must keep containment high")
    // the boilerplate run IS visible to the shared-chunk readout the
    // guard defers to (12 docs > CdcMaxFpDocs)
    val shared = TrainPrep.cdcSharedChunks(d)
      .filter(col("n_docs") >= 12).count()
    assert(shared > 0, "the hot fps must land in cdcSharedChunks instead")
  }

  test("cdc streaming admission equals the batch chunk-and-filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-stream")
    val boiler = (1 to 60).map(i => s"b$i").mkString(" ")
    val probe = Seq(
      (10L, s"fresh words only here $boiler"),
      (11L, s"$boiler and a different tail"),
      (12L, "entirely novel content with no boilerplate"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    // frozen index: the shared chunks of a standing 2-doc corpus that
    // both carry the boilerplate run
    val standing = Seq((1L, s"alpha $boiler"), (2L, s"beta $boiler"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val banned = TrainPrep.cdcSharedChunks(standing).select("fp")
    assert(banned.count() > 0, "fixture must yield banned chunks")
    probe.repartition(3).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = TrainPrep.streamingCdcAdmission(stream, banned) { (chunks, _) =>
      val rows = chunks.select("doc_id", "chunk_id", "fp")
        .as[(Long, Long, Long)].collect()
      got.synchronized { got ++= rows }
    }
    try {
      assert(q.awaitTermination(120000), "streaming query did not finish")
      val batch = TrainPrep.cdcChunks(probe)
        .join(banned, Seq("fp"), "left_anti")
        .select("doc_id", "chunk_id", "fp")
        .as[(Long, Long, Long)].collect()
      assert(got.sortBy(r => (r._1, r._2)).toSeq ===
        batch.sortBy(r => (r._1, r._2)).toSeq)
      // the novel doc survives in full; banned fps never appear
      assert(got.exists(_._1 == 12L))
      val bannedSet = banned.as[Long].collect().toSet
      assert(!got.exists(r => bannedSet(r._3)))
    } finally q.stop()
  }

  test("cdc streaming strip equals the batch strip-against-frozen-index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-strip-stream")
    val boiler = (1 to 60).map(i => s"b$i").mkString(" ")
    val probe = Seq(
      (10L, s"fresh words only here $boiler"),
      (11L, s"$boiler and a different tail"),
      (12L, "entirely novel content with no boilerplate"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val standing = Seq((1L, s"alpha $boiler"), (2L, s"beta $boiler"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val banned = TrainPrep.cdcSharedChunks(standing).select("fp")
    probe.repartition(3).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(probe.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = TrainPrep.streamingCdcStrip(stream, banned) { (cleaned, _) =>
      val rows = cleaned.as[(Long, String, Long)].collect()
      got.synchronized { got ++= rows }
    }
    try {
      assert(q.awaitTermination(120000), "streaming query did not finish")
      val batch = TrainPrep.cdcStripAgainst(probe, banned)
        .as[(Long, String, Long)].collect()
      assert(got.sortBy(_._1).toSeq === batch.sortBy(_._1).toSeq)
      // interior boilerplate chunks are gone from both carriers (the
      // SEAM chunk — unique prefix + boiler head up to its first
      // marker — rightfully survives: its fp is doc-specific); the
      // novel doc is untouched at zero drops
      val byId = got.map(r => r._1 -> r).toMap
      assert(byId(10L)._3 >= 1L && byId(11L)._3 >= 1L)
      assert(byId(10L)._2.split(" ").length <
        s"fresh words only here $boiler".split(" ").length)
      assert(byId(12L)._3 === 0L)
      assert(byId(12L)._2 === "entirely novel content with no boilerplate")
    } finally q.stop()
  }

  test("cdc: empty and single-token documents chunk without error") {
    val d = cdcDoc((1L, ""), (2L, "solo"), (3L, "   "))
    val out = TrainPrep.cdcChunks(d)
      .select("doc_id", "chunk_id", "n_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
    // empty/whitespace docs emit no tokens -> no chunk rows
    assert(out.map(_._1).toSet === Set(2L))
    assert(out.head === ((2L, 0L, 1L, "solo")))
  }

  test("cdc index lifecycle: build + append + compact ≡ one-shot; singletons cross the threshold on append") {
    val boiler = (1 to 60).map(i => s"b$i").mkString(" ")
    val d = cdcDoc(
      (1L, s"alpha one two $boiler"), // odd half -> initial build
      (3L, "odd half unique content here entirely"),
      (2L, s"beta other words $boiler"), // even half -> append
      (4L, "even half unique content too and more"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-cdc-idx").toString
    TrainPrep.writeCdcIndex(d.filter(col("doc_id") % 2 === 1), path)
    // the boilerplate run is a SINGLETON in the standing build (only
    // doc 1 carries it): not yet boilerplate — the case a pre-filtered
    // index could never recover from
    assert(TrainPrep.cdcIndexBoilerplate(spark, path).count() === 0L)
    TrainPrep.appendCdcIndex(spark, path, d.filter(col("doc_id") % 2 === 0))
    def stats() = TrainPrep.cdcIndexStats(spark, path)
      .orderBy("fp").as[(Long, Long, Long, Long)].collect().toSeq
    val oneShot = TrainPrep.cdcFpStats(d)
      .orderBy("fp").as[(Long, Long, Long, Long)].collect().toSeq
    assert(stats() === oneShot,
      "append-merged stats must equal the one-shot aggregate")
    // threshold crossing: shared run becomes boilerplate only with the
    // increment counted in, and matches the raw-corpus readout exactly
    val banned = TrainPrep.cdcIndexBoilerplate(spark, path)
      .select("fp").as[Long].collect().toSet
    val rawShared = TrainPrep.cdcSharedChunks(d)
      .select("fp").as[Long].collect().toSet
    assert(banned === rawShared && banned.nonEmpty)
    // REPLAY idempotence: re-running the SAME append is a no-op (its
    // identity-addressed batch dir is already committed)
    TrainPrep.appendCdcIndex(spark, path, d.filter(col("doc_id") % 2 === 0))
    assert(stats() === oneShot, "a replayed append must not double-count")
    TrainPrep.compactCdcIndex(spark, path)
    assert(stats() === oneShot, "compaction must be answer-invariant")
    TrainPrep.compactCdcIndex(spark, path)
    assert(stats() === oneShot, "compact ∘ compact ≡ compact")
    // and two DIFFERENT batches with IDENTICAL texts (a re-crawl:
    // disjoint doc ids, indistinguishable fp-stats) must BOTH count —
    // the tag hashes doc ids, not content
    val recrawl1 = cdcDoc((100L, "same recrawled page body here"))
    val recrawl2 = cdcDoc((101L, "same recrawled page body here"))
    TrainPrep.appendCdcIndex(spark, path, recrawl1)
    TrainPrep.appendCdcIndex(spark, path, recrawl2)
    val expect = TrainPrep.cdcFpStats(
        d.unionByName(recrawl1).unionByName(recrawl2))
      .orderBy("fp").as[(Long, Long, Long, Long)].collect().toSeq
    assert(stats() === expect,
      "identical-text batches with disjoint ids must both count")
    // REPLAY AFTER COMPACT: the landed-tag manifest carries through
    // compaction, so a replayed append whose first attempt committed
    // BEFORE the compact is STILL a no-op — without the carry, the
    // replay would land as a fresh batch dir (its identity dir was
    // physically merged away) and silently double-count
    TrainPrep.compactCdcIndex(spark, path)
    TrainPrep.appendCdcIndex(spark, path, recrawl1)
    TrainPrep.appendCdcIndex(spark, path, d.filter(col("doc_id") % 2 === 0))
    assert(stats() === expect,
      "a replayed append after an intervening compact must be a no-op")
  }

  test("cdc index delete: negated stats mask immediately; compact applies; replays are no-ops") {
    val boiler = (1 to 60).map(i => s"b$i").mkString(" ")
    val d = cdcDoc(
      (1L, s"alpha one two $boiler"),
      (3L, "odd half unique content here entirely"),
      (2L, s"beta other words $boiler"),
      (4L, "even half unique content too and more"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-cdc-del").toString
    TrainPrep.writeCdcIndex(d.filter(col("doc_id") % 2 === 1), path)
    TrainPrep.appendCdcIndex(spark, path, d.filter(col("doc_id") % 2 === 0))
    def stats() = TrainPrep.cdcIndexStats(spark, path)
      .orderBy("fp").as[(Long, Long, Long, Long)].collect().toSeq
    assert(TrainPrep.cdcIndexBoilerplate(spark, path).count() > 0L,
      "vacuous fixture: the boilerplate run must be banned pre-delete")
    // TAKEDOWN of doc 2 (one of the two boilerplate carriers): the
    // negated batch drops the shared fp back under the 2-doc
    // threshold IMMEDIATELY — no compact needed — and stats equal the
    // surviving corpus's one-shot aggregate exactly
    val survivors = d.filter(col("doc_id") =!= 2L)
    TrainPrep.deleteCdcIndex(spark, path, d.filter(col("doc_id") === 2L))
    val expect = TrainPrep.cdcFpStats(survivors)
      .orderBy("fp").as[(Long, Long, Long, Long)].collect().toSeq
    assert(stats() === expect,
      "negated landing must subtract the doc's contribution exactly")
    assert(TrainPrep.cdcIndexBoilerplate(spark, path).count() === 0L,
      "the un-banned fp must leave the boilerplate readout")
    // replayed delete: identity-addressed no-op (the del_ prefix keeps
    // it distinct from doc 2's ORIGINAL append batch tag)
    TrainPrep.deleteCdcIndex(spark, path, d.filter(col("doc_id") === 2L))
    assert(stats() === expect, "a replayed delete must not double-subtract")
    // compact APPLIES: zero-count fps drop physically, stats unchanged
    TrainPrep.compactCdcIndex(spark, path)
    assert(stats() === expect, "compaction must be answer-invariant")
    // replay-after-compact, both directions: the carried manifest
    // blocks the delete; identity addressing blocks the append
    TrainPrep.deleteCdcIndex(spark, path, d.filter(col("doc_id") === 2L))
    TrainPrep.appendCdcIndex(spark, path, d.filter(col("doc_id") % 2 === 0))
    assert(stats() === expect,
      "replayed delete/append after compact must be no-ops")
  }

  test("cdc index delete: overlapping takedown batches are set-semantic, not additive") {
    // operators routinely submit CUMULATIVE takedown lists ({2} then
    // {2,3}); with the landed stats being negated counts, re-deleting
    // doc 2 would double-subtract its contribution and silently drop
    // fps still carried by live docs — the deleted_ids ledger makes
    // the delete set-semantic
    val boiler = (1 to 60).map(i => s"c$i").mkString(" ")
    val d = cdcDoc(
      (1L, s"alpha one two $boiler"),
      (3L, s"gamma three four $boiler"),
      (2L, s"beta other words $boiler"),
      (4L, "even half unique content too and more"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-cdc-del-overlap").toString
    TrainPrep.writeCdcIndex(d.filter(col("doc_id") % 2 === 1), path)
    TrainPrep.appendCdcIndex(spark, path, d.filter(col("doc_id") % 2 === 0))
    def stats() = TrainPrep.cdcIndexStats(spark, path)
      .orderBy("fp").as[(Long, Long, Long, Long)].collect().toSeq
    // {2}, then the cumulative {2, 3}
    TrainPrep.deleteCdcIndex(spark, path, d.filter(col("doc_id") === 2L))
    TrainPrep.deleteCdcIndex(spark, path,
      d.filter(col("doc_id") === 2L || col("doc_id") === 3L))
    val expect = TrainPrep.cdcFpStats(
        d.filter(col("doc_id") =!= 2L && col("doc_id") =!= 3L))
      .orderBy("fp").as[(Long, Long, Long, Long)].collect().toSeq
    assert(stats() === expect,
      "the cumulative list must subtract doc 2 exactly once")
    // the boilerplate fp is still carried by the live doc 1: the r19
    // additive semantics would have driven it to 3−1−2 = 0 and
    // silently dropped it from the readout
    assert(TrainPrep.cdcIndexBoilerplate(spark, path, minDocs = 1L)
        .count() > 0L,
      "a live doc's fp must survive an overlapping takedown")
    // the ledger carries across a compact (deleted-stays-deleted):
    // the same cumulative list replayed afterwards is a full no-op
    TrainPrep.compactCdcIndex(spark, path)
    TrainPrep.deleteCdcIndex(spark, path,
      d.filter(col("doc_id") === 2L || col("doc_id") === 3L))
    assert(stats() === expect,
      "a replayed cumulative takedown after compact must be a no-op")
    // a batch that mixes already-deleted, duplicate, and fresh rows
    // subtracts exactly the fresh doc once
    TrainPrep.deleteCdcIndex(spark, path,
      d.filter(col("doc_id") === 3L || col("doc_id") === 4L)
        .union(d.filter(col("doc_id") === 4L)))
    val expect2 = TrainPrep.cdcFpStats(d.filter(col("doc_id") === 1L))
      .orderBy("fp").as[(Long, Long, Long, Long)].collect().toSeq
    assert(stats() === expect2,
      "mixed stale+duplicate+fresh batch must subtract only the fresh doc, once")
  }

  test("cdc strip frac: the fraction gate is scale-invariant where the absolute gate is not") {
    def isMarker(t: String): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cdc:$t".getBytes("UTF-8"))
      val hex = md.map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % TrainPrep.CdcDivisor == 0
    }
    val mk = (1 to 1000).map(i => s"mk$i").find(isMarker).get
    val lic = ((1 to 20).map(i => s"lic$i") :+ mk).mkString(" ")
    def carrier(id: Long) = (id, s"$lic body$id " +
      (1 to 10).map(j => s"w$id-$j").mkString(" "))
    def unique(id: Long) = (id, (1 to 12).map(j => s"u$id-$j").mkString(" "))
    // LARGE corpus: 2 carriers of 300 docs = 66 bp < CdcBoilerMinBp
    // (100 bp) — coincidental sharing, NOT boilerplate under the
    // fraction gate; the absolute >= 2 gate strips it regardless
    val large = cdcDoc((carrier(0L) +: carrier(1L) +:
      (2L until 300L).map(unique)): _*)
    val fracLarge = TrainPrep.cdcStripSharedFrac(large)
      .filter(col("doc_id") === 0L)
      .select("n_dropped_chunks").as[Long].head()
    assert(fracLarge === 0L,
      "66 bp sharing must survive the 100 bp fraction gate")
    val absLarge = TrainPrep.cdcStripShared(large)
      .filter(col("doc_id") === 0L)
      .select("n_dropped_chunks").as[Long].head()
    assert(absLarge > 0L, "the absolute >= 2 gate strips it regardless")
    // SMALL corpus: the same 2 carriers of 40 docs = 500 bp >= 100 bp
    // — now corpus-level boilerplate; both gates strip
    val small = cdcDoc((carrier(0L) +: carrier(1L) +:
      (2L until 40L).map(unique)): _*)
    val fracSmall = TrainPrep.cdcStripSharedFrac(small)
      .filter(col("doc_id") === 0L)
      .select("n_dropped_chunks").as[Long].head()
    assert(fracSmall > 0L, "500 bp sharing must be stripped")
    // every input doc keeps a row in both forms
    assert(TrainPrep.cdcStripSharedFrac(large).count() === 300L)
  }

  test("cdc strip: a planted license block vanishes from every doc; unique text survives") {
    def isMarker(t: String): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cdc:$t".getBytes("UTF-8"))
      val hex = md.map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % TrainPrep.CdcDivisor == 0
    }
    // end the license with a marker token so its chunks are
    // SELF-CONTAINED (the boundary cannot blend into the unique text
    // that follows) and therefore byte-identical in every carrier
    val lic0 = (1 to 30).map(i => s"lic$i")
    val mk = (1 to 1000).map(i => s"mk$i").find(isMarker).get
    val lic = (lic0 :+ mk).mkString(" ")
    def body(p: String) = (1 to 40).map(i => s"$p$i").mkString(" ")
    val d = cdcDoc(
      (1L, s"$lic ${body("a")}"), (2L, s"$lic ${body("b")}"),
      (3L, s"$lic ${body("c")}"), (4L, body("d")))
    val out = TrainPrep.cdcStripShared(d).orderBy("doc_id")
      .select("doc_id", "clean_text", "n_dropped_chunks")
      .as[(Long, String, Long)].collect()
    // no license token survives anywhere
    out.foreach { case (id, txt, _) =>
      val kept = txt.split(" ").toSet
      (lic0 :+ mk).foreach(t =>
        assert(!kept(t), s"doc $id kept license token '$t'"))
    }
    // every carrier's unique body survives IN FULL AND IN ORDER; the
    // non-carrier is untouched at zero drops
    assert(out(0)._2 === body("a") && out(1)._2 === body("b") &&
      out(2)._2 === body("c"))
    assert(out(3) === ((4L, body("d"), 0L)))
    val drops = out.take(3).map(_._3)
    assert(drops.forall(_ >= 1L) && drops.distinct.size === 1,
      s"identical license must cost identical drops: ${drops.toSeq}")
  }
}
