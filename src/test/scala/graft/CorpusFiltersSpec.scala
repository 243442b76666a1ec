package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusFilters

/** Semantics of the corpus-hygiene filters on planted fixtures (the
  * driver testdata carries no PII, so the PII semantics live here and
  * the oracle entry proves engine parity of the expressions). */
class CorpusFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))

  // --- PII redaction ---

  test("pii: emails, phones and IPs are counted and redacted") {
    val d = docs(
      1L -> "contact alice@example.com or (555) 123-4567 from 10.0.0.1 now",
      2L -> "no pii here at all")
    val out = CorpusFilters.piiStats(d).orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Int]("n_emails") === 1)
    assert(r1.getAs[Int]("n_phones") === 1)
    assert(r1.getAs[Int]("n_ips") === 1)
    assert(!r1.getAs[Boolean]("is_clean"))
    val r2 = out(1)
    assert(r2.getAs[Int]("n_emails") + r2.getAs[Int]("n_phones") +
      r2.getAs[Int]("n_ips") === 0)
    assert(r2.getAs[Boolean]("is_clean"))
    assert(r2.getAs[Int]("n_chars_redacted") === "no pii here at all".length)
  }

  test("pii: redacted text replaces each hit with its tag") {
    val red = docs(1L -> "mail bob@host.org and ping 192.168.0.12")
      .select(CorpusFilters.redactPii(col("text"))).as[String].head()
    assert(red === "mail [EMAIL] and ping [IP]")
  }

  test("pii: a dotted phone is consumed by the phone pass, not the IP pass") {
    // 555.123.4567 contains an IPv4-shaped substring; redaction order
    // (phone before ip) must hand it to [PHONE]
    val d = docs(1L -> "call 555.123.4567 today")
    val out = CorpusFilters.piiStats(d).collect().head
    assert(out.getAs[Int]("n_phones") === 1)
    val red = d.select(CorpusFilters.redactPii(col("text"))).as[String].head()
    assert(red === "call [PHONE] today")
  }

  // --- repetition ---

  test("repetition: a degenerate doc is flagged, a diverse one kept") {
    val d = docs(
      1L -> "spam spam spam spam spam spam spam spam spam spam",
      2L -> "the quick brown fox jumps over a lazy dog tonight")
    val out = CorpusFilters.repetitionStats(d).orderBy("doc_id").collect()
    val spammy = out(0)
    assert(spammy.getAs[Long]("max_tf") === 10L)
    assert(spammy.getAs[Double]("top_token_frac") === 1.0)
    // all 9 bigram slots are "spam spam" -> 1 distinct
    assert(spammy.getAs[Double]("uniq_bigram_frac") === 1.0 / 9.0)
    assert(!spammy.getAs[Boolean]("keep_repetition"))
    val diverse = out(1)
    assert(diverse.getAs[Long]("max_tf") === 1L)
    assert(diverse.getAs[Double]("uniq_bigram_frac") === 1.0)
    assert(diverse.getAs[Boolean]("keep_repetition"))
  }

  test("repetition: single-token and empty-ish docs hit the guards") {
    val d = docs(1L -> "word")
    val r = CorpusFilters.repetitionStats(d).collect().head
    assert(r.getAs[Int]("n_tokens") === 1)
    assert(r.getAs[Double]("uniq_bigram_frac") === 1.0) // n<=1 guard
    assert(r.getAs[Double]("top_token_frac") === 1.0)
  }

  // --- contamination ---

  test("contamination: train docs sharing benchmark n-grams are flagged") {
    // doc 29 is in the eval set (29 % 29 == 0); doc 1 shares its exact
    // 5-gram run, doc 2 shares nothing
    val shared = "alpha beta gamma delta epsilon"
    val d = docs(
      29L -> s"$shared zeta",
      1L -> s"prefix words here then $shared",
      2L -> "completely different content with no overlap at all okay")
    val out = CorpusFilters.contamination(d).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L)) // eval doc excluded
    val hit = out(0)
    assert(hit.getAs[Long]("n_overlap") >= 1L)
    assert(hit.getAs[Boolean]("contaminated"))
    val clean = out(1)
    assert(clean.getAs[Long]("n_overlap") === 0L)
    assert(!clean.getAs[Boolean]("contaminated"))
  }

  test("contamination report attributes each leak to its benchmark doc") {
    // two eval docs (29, 58); train doc 1 leaks doc 29's run (2 shared
    // 5-grams: the run has 6 tokens), train doc 3 leaks doc 58's, and
    // train doc 2 is clean and must not appear at all
    val runA = "alpha beta gamma delta epsilon zeta"
    val runB = "one two three four five six"
    val d = docs(
      29L -> runA,
      58L -> runB,
      1L -> s"prefix words here then $runA",
      3L -> s"$runB and a tail of words",
      2L -> "completely different content with no overlap at all okay")
    val out = CorpusFilters.contaminationReport(d)
      .orderBy("eval_id", "train_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((29L, 1L, 2L), (58L, 3L, 2L)))
    // gate-consistency contract: the report's distinct train ids ARE
    // the gate's contaminated set
    val flagged = CorpusFilters.contamination(d)
      .filter(col("contaminated")).select("doc_id")
      .as[Long].collect().toSet
    assert(out.map(_._2).toSet === flagged)
  }

  // --- domain mix ---

  test("domain mix: sources are downsampled toward the smallest source") {
    val rows = (1L to 40L).map(i => (i, s"text number $i", "big")) ++
      (41L to 45L).map(i => (i, s"text number $i", "small"))
    val d = rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    val out = CorpusFilters.domainMix(d).orderBy("source").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("big").getAs[Long]("n_total") === 40L)
    assert(out("small").getAs[Long]("n_total") === 5L)
    // the smallest source has rate 1 (bucket < 10000 always) and keeps
    // everything; the big one is hash-cut toward n_min — sampling is
    // approximate, so assert direction, not the exact count
    assert(out("small").getAs[Long]("n_kept") === 5L)
    assert(out("big").getAs[Long]("n_kept") < 40L)
    assert(out("big").getAs[Double]("kept_frac") < 1.0)
  }

  test("domain mix: keep decisions are deterministic across invocations") {
    val d = docs((1L to 30L).map(i => (i, s"doc body $i")): _*)
    val a = CorpusFilters.domainMix(d).collect().toSeq
    val b = CorpusFilters.domainMix(d).collect().toSeq
    assert(a === b)
  }

  test("property: domain mix bounds, min-source retention, order-invariance") {
    import org.scalacheck.Gen
    val gen = Gen.listOfN(3, Gen.choose(2, 12))
    samples(gen, 4).foreach { sizes =>
      var id = 0L
      val rows = sizes.zipWithIndex.flatMap { case (n, s) =>
        (1 to n).map { _ => id += 1; (id, s"body of doc $id", s"src$s") }
      }
      val d = rows.toDF("doc_id", "text", "source")
        .withColumn("lang", lit("en"))
        .withColumn("n_chars", length(col("text")))
      val out = CorpusFilters.domainMix(d).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val minTotal = out.values.map(_._1).min
      out.foreach { case (src, (total, kept)) =>
        assert(kept <= total, s"$src kept more than it has")
        if (total == minTotal)
          assert(kept === total, s"min-size source $src must keep everything")
      }
      // keep decisions are per-doc hashes: input order cannot matter
      val reordered = CorpusFilters.domainMix(d.orderBy(col("doc_id").desc))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(reordered === out)
    }
  }

  test("property: a train doc equal to an eval doc is always contaminated") {
    import org.scalacheck.Gen
    val word = Gen.oneOf("red", "blue", "green", "stone", "river", "cloud",
      "iron", "glass", "north", "amber")
    val text = Gen.listOfN(9, word).map(_.mkString(" ")) // >= 5 tokens
    samples(Gen.zip(text, text), 5).foreach { case (evalText, otherText) =>
      val d = docs(
        CorpusFilters.EvalMod.toLong -> evalText, // eval member
        1L -> evalText,                           // verbatim copy in train
        2L -> otherText)
      val out = CorpusFilters.contamination(d).collect()
        .map(r => (r.getLong(0), r.getAs[Boolean]("contaminated"))).toMap
      assert(out(1L), s"verbatim eval copy not flagged for '$evalText'")
      assert(!out.contains(CorpusFilters.EvalMod.toLong))
    }
  }

  test("property: digit-and-at-free text is always pii-clean") {
    import org.scalacheck.Gen
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val text = Gen.listOfN(12, word).map(_.mkString(" "))
    samples(text, 10).foreach { t =>
      val r = CorpusFilters.piiStats(docs(1L -> t)).collect().head
      assert(r.getAs[Boolean]("is_clean"), s"false positive on '$t'")
      assert(r.getAs[Int]("n_chars_redacted") === t.length)
    }
  }

  test("smoke: all four corpus-filter queries run on testdata") {
    assert(CorpusFilters.qPiiRedact(spark, sfSmoke).count() > 0)
    assert(CorpusFilters.qRepetition(spark, sfSmoke).count() > 0)
    assert(CorpusFilters.qContamination(spark, sfSmoke).count() > 0)
    assert(CorpusFilters.qDomainMix(spark, sfSmoke).count() > 0)
  }

  // --- distilled classifier gate ---

  test("classifier: hand-checked scores, boundary kept, negatives dropped") {
    // weights in play: query=+2, dup=-3, the=-1, slow=-2, table=+1
    val out = CorpusFilters.classifierScore(docs(
        (1L, "query query table"),       // raw 5, n 3: 100 >= 3 keep
        (2L, "dup dup slow the"),        // raw -9, n 4: drop
        (3L, "zz zz zz zz"),             // raw 0, n 4: 0 >= 4 false, drop
        (4L, "query zz zz zz " * 10)))   // raw 20, n 40: 400 >= 40 keep
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) === ((3L, 5L, true)))
    assert(out(2L) === ((4L, -9L, false)))
    assert(out(3L) === ((4L, 0L, false)))
    assert(out(4L) === ((40L, 20L, true)))
  }

  test("classifier: exact threshold boundary keeps (>= not >)") {
    // raw 1 (one 'table'), n_tokens 20: 1*20 >= 20 — exactly at the
    // boundary, kept
    val row = CorpusFilters.classifierScore(docs(
        (1L, "table " + Seq.fill(19)("zz").mkString(" "))))
      .collect().head
    assert(row.getLong(1) === 20L && row.getLong(2) === 1L)
    assert(row.getBoolean(3), "mean weight exactly at threshold must keep")
  }

  test("classifier: empty doc scores 0 and passes (length gates own it)") {
    val row = CorpusFilters.classifierScore(docs((1L, ""))).collect().head
    assert((row.getLong(1), row.getLong(2), row.getBoolean(3)) === ((0L, 0L, true)))
  }

  test("classifier: map-side — the scoring plan has no exchange") {
    val df = CorpusFilters.classifierScore(docs((1L, "query the")))
    val planStr = df.queryExecution.executedPlan.toString()
    assert(!planStr.contains("Exchange"),
      s"classifier application must be a pure scan-side map:\n$planStr")
  }

  test("classifier: frame-weight path agrees with the literal-map path row-for-row") {
    val weightsDf = graft.operators.CorpusFilters.ClassifierWeights
      .toDF("token", "weight")
    val fixture = docs(
      (1L, "query query table"), (2L, "dup dup slow the"),
      (3L, "zz zz zz zz"), (4L, ""), (5L, "the a dup query"))
      .union(Seq((6L, null.asInstanceOf[String], "en", "src0", 0))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val lit = CorpusFilters.classifierScore(fixture)
      .orderBy("doc_id").collect().toSeq
    val frame = CorpusFilters.classifierScoreFrame(fixture, weightsDf)
      .orderBy("doc_id").collect().toSeq
    assert(frame === lit)
  }

  test("classifier gate composes: curate v6 is v5 minus the clf-dropped docs") {
    val spark2 = spark
    import spark2.implicits._
    val docsDf = graft.tables.Tables.documents(spark, sfSmoke)
    val emb = graft.tables.Tables.embeddings(spark, sfSmoke)
    val v5 = graft.operators.Curate.curateV5(docsDf, emb)
      .select("doc_id").as[Long].collect().toSet
    val v6 = graft.operators.Curate.curateV6(docsDf, emb)
      .select("doc_id").as[Long].collect().toSet
    assert(v6.subsetOf(v5), "v6 must only remove documents")
    val keep = CorpusFilters.classifierScore(docsDf)
      .filter(col("keep_clf")).select("doc_id").as[Long].collect().toSet
    assert(v6 === v5.intersect(keep),
      "v6 must equal v5 gated by the classifier keep set")
    assert(v6.size < v5.size, "fixture corpus should exercise the gate")
  }

  // --- trained Naive-Bayes classifier ---

  private def labeled(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")))

  test("nb: separates two classes with distinctive vocabularies") {
    val model = labeled(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "a dog and a fox met the cat"),
      (3L, "de", "der schnelle braune fuchs springt und der hund schlaeft"),
      (4L, "de", "ein hund und eine katze und der fuchs"))
    val probe = labeled(
      (10L, "en", "the dog jumps over the cat"),
      (11L, "de", "der hund springt und die katze"))
    val out = CorpusFilters.nbClassifyAgainst(probe, model)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("pred")).toSeq === Seq("en", "de"))
    assert(out.forall(_.getAs[Long]("margin_micro") > 0L))
  }

  test("nb: score is the exact micro-nat arithmetic, leaf-quantized") {
    // model: class a = "x x", class b = "y"; probe = "x"
    // counts: (a,x)=2, (b,y)=1; V=2; N_a=2, N_b=1; priors 1/2 each
    // score(a) = qln(1)-qln(2) + qln(3) - qln(4) = -693147+1098612-1386294
    // score(b) = qln(1)-qln(2) + 0      - qln(3) = -693147-1098612
    val model = labeled((1L, "a", "x x"), (2L, "b", "y"))
    val probe = labeled((10L, "a", "x"))
    val r = CorpusFilters.nbClassifyAgainst(probe, model).collect().head
    assert(r.getAs[String]("pred") === "a")
    assert(r.getAs[Long]("score_micro") === -980829L)
    assert(r.getAs[Long]("margin_micro") === (-980829L - (-1791759L)))
    assert(r.getAs[Long]("n_tokens") === 1L)
  }

  test("nb: an all-unseen probe falls back to the prior argmax") {
    // class a has 2 train docs, b has 1 -> larger prior wins when no
    // token matches; the denominator term also favors the class with
    // the SMALLER N_c+V, so pin the fixture so both point the same way
    val model = labeled(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "b", "y y y"))
    val probe = labeled((10L, "b", "zzz www"))
    val r = CorpusFilters.nbClassifyAgainst(probe, model).collect().head
    assert(r.getAs[String]("pred") === "a")
  }

  test("nb: deterministic tie-break on equal scores goes to the first class") {
    // perfectly symmetric classes -> equal scores; pred must be the
    // lexicographically smallest, margin exactly 0
    val model = labeled((1L, "a", "x"), (2L, "b", "y"))
    val probe = labeled((10L, "a", "q"))
    val r = CorpusFilters.nbClassifyAgainst(probe, model).collect().head
    assert(r.getAs[String]("pred") === "a")
    assert(r.getAs[Long]("margin_micro") === 0L)
  }

  test("nb: the self-contained split never trains on its probe docs") {
    val ids = (0L until 400L)
    val d = labeled(ids.map(i => (i, if (i % 2 == 0) "en" else "de",
      if (i % 2 == 0) "alpha beta gamma" else "eins zwei drei")): _*)
    val out = CorpusFilters.nbClassify(d)
    val outIds = out.select("doc_id").as[Long].collect().toSet
    val testIds = d.filter(
        graft.operators.TextStats.splitBucket(col("doc_id")) >= 90)
      .select("doc_id").as[Long].collect().toSet
    assert(outIds === testIds, "classified docs must be exactly the test split")
    assert(outIds.nonEmpty)
    // with cleanly separated vocabularies the held-out accuracy is 100%
    assert(out.filter(col("pred") === col("lang")).count() === outIds.size)
  }

  test("nb: streamed classification equals the batch classification") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nb-stream")
    val model = labeled(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "de", "der schnelle braune fuchs springt und der hund"))
    val probe = labeled(
      (10L, "en", "the dog and the fox"),
      (11L, "de", "der hund und der fuchs"),
      (12L, "en", "unseen tokens only zzz"))
    probe.coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(probe.schema).parquet(s"$dir/in")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = CorpusFilters.streamingNbAdmission(stream, model) { (preds, _) =>
      val rows = preds.select("doc_id", "pred", "score_micro")
        .as[(Long, String, Long)].collect()
      got.synchronized { got ++= rows }
    }
    try {
      assert(q.awaitTermination(120000), "streaming query did not finish in time")
      val batch = CorpusFilters.nbClassifyAgainst(probe, model)
        .select("doc_id", "pred", "score_micro")
        .as[(Long, String, Long)].collect()
      assert(got.sortBy(_._1).toSeq === batch.sortBy(_._1).toSeq)
    } finally {
      q.stop()
    }
  }
}
