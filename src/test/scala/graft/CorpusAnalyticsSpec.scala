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
}
