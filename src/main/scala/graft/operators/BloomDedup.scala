package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Bloom-pruned incremental exact dedup — the runtime-filter pattern
  * applied to crawl ingestion.
  *
  * Problem shape: each crawl snapshot ("increment") must be checked
  * against the standing corpus ("index") for exact duplicates. A plain
  * anti-join shuffles the ENTIRE increment on text hash even though, at
  * steady state, most documents are either obviously new or obviously
  * dup. The fix is the same one Spark's own `InjectRuntimeFilter` uses
  * for selective joins: build a Bloom filter over the index side once,
  * broadcast it, and let a cheap local membership test split the
  * increment —
  *
  *   - bloom-NEGATIVE rows are *definitely* new (a Bloom filter has no
  *     false negatives): they skip the shuffle join entirely;
  *   - bloom-POSITIVE rows (true dups + the fp rate) are the only rows
  *     that pay the exact anti-join, which removes false positives.
  *
  * The result is therefore EXACTLY the plain anti-join — the filter is
  * pruning-only, so the DuckDB oracle is ordinary SQL with no Bloom
  * arithmetic in it. At a 1% dup-or-fp rate the join input shrinks
  * 100×; the filter itself is O(bits) regardless of corpus size.
  *
  * Implementation is built-ins only (no UDF, no non-codegen
  * expression): the filter is an `array<long>` of bit words built by a
  * distributed `bit_or` aggregate (map-side partial, one tiny shuffle
  * of ≤ bits/64 rows), materialized on the driver like the k-means
  * centroids next door — a BOUNDED O(bits) collect, the documented
  * exception to the no-driver-data rule — and re-broadcast as a
  * literal. Membership probes are double-hashed positions
  * `(h1 + j·h2) mod bits` over two independent 60-bit halves of the
  * row's md5, tested with `element_at` + shift/AND.
  */
object BloomDedup {

  /** Filter width in bits (power of two) and probe count. Defaults give
    * fp ≈ (k·n/m)^k ≈ 1e-9 at n=1000 index docs; production sizing is
    * the standard m ≈ 1.44·n·log2(1/fp) — still O(constant) in the
    * plan, which is the property PlanSpec pins. */
  val BloomBits = 1 << 16
  val BloomProbes = 4

  /** Two independent 60-bit halves of an md5 hex column (15 hex chars
    * each; both < 2^60 so `j·h2 + h1` never overflows a long for
    * j ≤ 7). h2 is forced odd so the double-hash stride cycles the
    * whole table. */
  private def h1(hex: Column): Column =
    conv(substring(hex, 1, 15), 16, 10).cast("long")
  private def h2(hex: Column): Column =
    conv(substring(hex, 17, 15), 16, 10).cast("long").bitwiseOR(1L)

  private def probePos(hex: Column, j: Int, bits: Int): Column =
    pmod(h1(hex) + lit(j.toLong) * h2(hex), lit(bits.toLong))

  /** Build the filter over a hash column: explode each hash into its
    * probe positions, then `bit_or` the per-position masks into
    * bits/64 words. The aggregate is map-side-combinable (bit_or is
    * associative+commutative), so the shuffle carries at most bits/64
    * rows per map task no matter the corpus size. */
  def bloomWords(hashes: DataFrame, hashCol: String,
                 bits: Int = BloomBits,
                 probes: Int = BloomProbes): Array[Long] = {
    require(Integer.bitCount(bits) == 1, s"bits must be a power of two: $bits")
    val pos = explode(array((0 until probes)
      .map(j => probePos(col(hashCol), j, bits)): _*)).as("pos")
    // a NULL hash (null text upstream) yields NULL probe positions,
    // which would group under a null key and blow up the word-index
    // read below; null-text rows can't equal any increment text under
    // either engine's anti-join semantics, so dropping them here keeps
    // the no-false-negative contract intact
    val words = hashes.na.drop(Seq(hashCol)).select(pos)
      .groupBy(shiftright(col("pos"), 6).as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT)))")
        .as("mask"))
      .collect() // bounded: ≤ bits/64 rows (1024 longs at the default)
    val arr = new Array[Long](bits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership test as a pure built-in Column over the literal word
    * array: every probe's bit must be set. No false negatives by
    * construction — the property `bloomNewDocs` relies on. */
  def mightContain(words: Array[Long], hex: Column,
                   probes: Int = BloomProbes): Column = {
    val bits = words.length * 64
    val wlit = typedLit(words.toSeq)
    (0 until probes).map { j =>
      val pos = probePos(hex, j, bits)
      val word = element_at(wlit, (shiftright(pos, 6) + 1).cast("int"))
      val mask = call_function("shiftleft", lit(1L), pmod(pos, lit(64L)).cast("int"))
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }

  /** Increment rows whose text does not appear in the index — equal to
    * `increment LEFT ANTI JOIN index ON md5(text)`, computed as
    * bloom-negative rows (join-free) ∪ (bloom-positive rows ⟕̸ index).
    * Duplicates WITHIN the increment are out of scope by design (that
    * is [[TextDedup.exactDedup]]'s job); this operator answers "new
    * versus the standing corpus", the per-snapshot ingest question. */
  def bloomNewDocs(increment: DataFrame, index: DataFrame,
                   bits: Int = BloomBits,
                   probes: Int = BloomProbes): DataFrame = {
    val idxHash = index.select(md5(col("text")).as("text_hash"))
    val words = bloomWords(idxHash, "text_hash", bits, probes)
    val inc = increment.select(col("doc_id"), md5(col("text")).as("text_hash"))
    // null text → null hash → the membership test is NULL, which both
    // filters would drop, silently losing the row; the anti-join this
    // operator must equal KEEPS null-keyed rows (a null key matches
    // nothing), so a null probe is pinned to "not a member"
    val might = coalesce(mightContain(words, col("text_hash"), probes), lit(false))
    val sureNew = inc.filter(!might)
    val verified = inc.filter(might)
      .join(idxHash, Seq("text_hash"), "left_anti")
    sureNew.unionByName(verified)
  }

  /** Oracle entry: documents with doc_id ≡ 0 (mod 10) play the new
    * crawl, re-crawled copies of the ≡ 0 (mod 25) docs (same text,
    * fresh ids) planted among them; the rest are the standing corpus.
    * Re-crawls of indexed pages are dropped as dups; re-crawls of
    * ≡ 0 (mod 50) pages (whose originals are themselves in the
    * increment, not the index) stay — "new vs index" semantics. */
  val RecrawlIdOffset = 100000L

  def qBloomDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val recrawl = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + RecrawlIdOffset).as("doc_id"), col("text"))
    val increment = docs.filter(col("doc_id") % TextDedup.IncrementMod === 0)
      .select(col("doc_id"), col("text"))
      .unionByName(recrawl)
    val index = docs.filter(col("doc_id") % TextDedup.IncrementMod =!= 0)
    bloomNewDocs(increment, index).orderBy(col("doc_id"))
  }
}
