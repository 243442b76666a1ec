package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.tables.Tables

/** Document deduplication suite over the `documents` corpus — the
  * training-data-pipeline operators a 100-TB text corpus needs.
  *
  * Design per method:
  *  - '''exact''': hash-groupBy on the full text. One shuffle on a short
  *    hash key; never ships the text twice (group carries only ids).
  *  - '''MinHash + LSH''': shingle → K minhashes → band signatures →
  *    bucket join. Candidate pairs come ONLY from equal band-signature
  *    buckets (a groupBy-shaped join), never from an all-pairs cross
  *    join — the property that makes near-dedup feasible at 100 TB.
  *    Verification re-joins the shingle sets by doc id and computes exact
  *    Jaccard on candidates only.
  *  - '''SimHash''': per-document 16-bit fingerprint from token-hash sign
  *    sums, computed as a single array expression per row (no shuffle),
  *    then banded like MinHash for pair generation.
  *  - '''n-gram Jaccard''': exact pairwise Jaccard *within a grouping
  *    key* (here `source`) — the pattern for "compare only within
  *    plausible groups", linear in group count, quadratic only in group
  *    size.
  *
  * Hash parity note: every hash here is md5-derived ([[md5Bits16]])
  * because the DuckDB oracle must reproduce values bit-for-bit and md5 is
  * the only hash both engines share. A production deployment would swap
  * in `xxhash64` (one codegen'd call, no hex parsing) — the plumbing is
  * hash-agnostic.
  */
object TextDedup {

  /** Exact dedup: one row per distinct text, the kept (minimum) doc id,
    * and the copy count. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    exactDedup(Tables.documents(spark, dir)).orderBy(col("keep_id"))

  // --- MinHash-LSH ---

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand = 4
  val ShingleN = 3
  val JaccardThreshold = 0.8

  /** K portable minhashes of a distinct-shingle set: hash k of shingle s
    * is md5Bits16("k:" + s); the minhash is the array minimum. */
  def minhashCols(sh: Column): Seq[Column] =
    (0 until NumHashes).map { k =>
      array_min(transform(sh, s => md5Bits16(concat(lit(s"$k:"), s))))
        .as(s"mh$k")
    }

  /** (doc_id, distinct shingle set). */
  def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_distinct(shingles(col("text"), ShingleN)).as("sh"))

  /** (doc_id, band, sig) — the LSH index: one row per document per band. */
  def minhashIndex(shSets: DataFrame): DataFrame = {
    val withMh = shSets.select(col("doc_id") +: minhashCols(col("sh")): _*)
    val bandSigs = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("-", (0 until RowsPerBand).map(r => col(s"mh${b * RowsPerBand + r}")): _*)
          .as("sig"))
    }
    withMh.select(col("doc_id"), explode(array(bandSigs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.sig"))
  }

  /** Exact Jaccard of two distinct-element array columns (set semantics),
    * zero-guarded for ANSI mode. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** Candidate pairs from band-bucket equality, verified by exact Jaccard.
    * Output: (doc_a, doc_b, jaccard) above threshold. */
  def minhashPairs(docs: DataFrame): DataFrame = {
    val sh = shingleSets(docs)
    val idx = minhashIndex(sh)
    val a = idx.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
    val b = idx.select(col("doc_id").as("doc_b"), col("band"), col("sig"))
    val candidates = a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
  }

  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    minhashPairs(Tables.documents(spark, dir)).orderBy(col("doc_a"), col("doc_b"))

  // --- SimHash ---

  /** 16-bit simhash of the token multiset, as one per-row expression:
    * bit j is set when sum over tokens of ±1 (sign of token-hash bit j)
    * is positive. Integer sums — order-independent, engine-exact. */
  def simhash(text: Column): Column = {
    val toks = tokens(text)
    val bitSums = (0 until 16).map { j =>
      val p = 1 << j
      aggregate(toks, lit(0), (acc, t) =>
        acc + when(md5Bits16(t) % (2 * p) >= p, 1).otherwise(-1))
    }
    bitSums.zipWithIndex.map { case (s, j) =>
      when(s > 0, 1L << j).otherwise(0L)
    }.reduce(_ + _).cast("long")
  }

  def qSimhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), simhash(col("text")).as("simhash"))
      .orderBy(col("doc_id"))

  // --- n-gram Jaccard within a grouping key ---

  /** Exact pairwise 2-gram Jaccard, but only for pairs sharing `source` —
    * the within-group comparison pattern (group count scales out;
    * quadratic cost is bounded by group size, and a skewed group would be
    * salted or sampled). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = docs.select(col("doc_id"), col("source"),
      array_distinct(shingles(col("text"), 2)).as("sh"))
    val a = sh.select(col("source"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("source"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("source"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("source"), col("doc_a"), col("doc_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(Tables.documents(spark, dir), 0.7)
      .orderBy(col("source"), col("doc_a"), col("doc_b"))
}
