package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Linear-permutation coefficients for hash k — the standard
    * "one base hash + K cheap permutations" minhash family:
    * hash_k(s) = (a_k · h(s) + b_k) mod 65521 (largest prime < 2^16).
    * One md5 per shingle total, instead of K. */
  def permA(k: Int): Int = 37 * k + 11
  def permB(k: Int): Int = 101 * k + 7
  val MinhashMod = 65521

  /** K minhashes over an int base-hash set — one native pass
    * ([[graft.expressions.MinHashSignature]]); the built-in spelling
    * (K × `array_min(transform(...))`) evaluates interpreted and was the
    * dominant cost of the LSH index. */
  def minhashSig(hs: Column): Column = call_function("minhash_signature", hs)

  /** (doc_id, source, sorted distinct base-hash set of n-gram shingles).
    *
    * Hashing before distinct keeps all downstream set ops (min,
    * intersect) on ints — string shingles never leave the first
    * projection. The set is sorted once here so every pairwise
    * comparison can use the linear-merge [[SortedIntersectSize]].
    *
    * The trailing `repartition(doc_id)` is load-bearing: higher-order
    * functions run interpreted (CodegenFallback), so without a
    * materialization boundary every downstream consumer (both LSH join
    * sides, both verify joins) would re-evaluate the whole
    * tokenize→shingle→md5 tree; the exchange is computed once and reused
    * (ReuseExchange) by all consumers. */
  def hashedShingles(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"), col("source"),
      call_function("hashed_shingle_set", col("text"), lit(n)).as("hs"))
      .repartition(col("doc_id"))

  /** (doc_id, band, sig) — the LSH index: one row per document per band. */
  def minhashIndex(hsSets: DataFrame): DataFrame = {
    val withMh = hsSets.select(col("doc_id"), minhashSig(col("hs")).as("mhs"))
    val bandSigs = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("-", (0 until RowsPerBand).map(r =>
          element_at(col("mhs"), b * RowsPerBand + r + 1)): _*).as("sig"))
    }
    withMh.select(col("doc_id"), explode(array(bandSigs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.sig"))
  }

  /** Exact Jaccard of two SORTED distinct int-array columns via the
    * native merge expression, zero-guarded for ANSI mode. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = call_function("sorted_intersect_size", a, b).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0, 0.0).otherwise(inter / union)
  }

  /** Per-(band, sig) bucket cap for the LSH self-joins — the hot-bucket
    * guard. A degenerate bucket of d collided documents yields d²/2
    * candidate pairs from ONE key (the classic production LSH failure;
    * invisible on uniform synthetic data). Layer one of the guard — the
    * exact-duplicate collapse in [[collapseExact]] — removes the most
    * common cause (an identical-text or identical-shingle-set cluster
    * shares EVERY band signature); this cap bounds what remains:
    * any bucket still holding more than this many DISTINCT shingle sets
    * is excluded from candidate generation, and [[lshBucketAudit]] is
    * the accounting readout of exactly what mass a given cap cuts (the
    * [[CorpusFilters]] `domainMix` discipline: never a silent drop).
    * Sized far above any bucket the synthetic corpora produce at any
    * SF — on the fixtures the guarded plan is bit-identical to the
    * unguarded one (pinned in TextPipelineSpec). */
  val MaxBandBucket = 1000

  /** Exact-duplicate collapse in front of the banded LSH — layer one
    * of the hot-bucket guard.
    *
    * Documents are grouped by their full shingle SET (exact array
    * equality — `hashed_shingle_set` is sorted-distinct, so set
    * equality IS array equality): identical texts collapse trivially,
    * and so do documents that differ as strings but shingle
    * identically (reordered boilerplate, the all-empty short-doc
    * family). Every doc in a group shares the group's `hs`, hence
    * every band signature — a 100k-doc boilerplate cluster that used
    * to put 100k rows in EVERY band bucket now contributes exactly
    * one. The grouping is ONE window (`min(doc_id) over hs`) on top of
    * the shingle pass the pipeline already pays, so the guard costs a
    * single extra exchange; a text-keyed pre-collapse that also skips
    * shingling duplicate copies was measured SLOWER at bench scale
    * (an extra full-text shuffle plus a membership join outweigh the
    * saved shingling on distinct-heavy corpora).
    *
    * Returns (members, setReps): `members` = (doc_id, set_rep) covering
    * every input doc; `setReps` = (doc_id, hs), one row per distinct
    * shingle set, doc_id = the group's minimum (its representative).
    * Null-text docs form the null-hs group; their representative's `hs`
    * is NULL, which scores NULL downstream and is filtered by every
    * threshold — exactly the pre-collapse behavior
    * (NullRobustnessSpec). */
  private[graft] def collapseExact(docs: DataFrame): (DataFrame, DataFrame) = {
    val groups = collapseGroups(docs)
    val members = groups.select(explode(col("members")).as("doc_id"),
      col("set_rep"))
    val setReps = groups.filter(col("chunk_id") === 0)
      .select(col("set_rep").as("doc_id"), col("hs"))
    (members, setReps)
  }

  /** Per-row membership cap for the collapse — an exact-dup family
    * larger than this spans several `(set_rep, hs, chunk_id, members)`
    * rows instead of one unbounded `collect_list` array. Sized so a
    * full chunk row is ~0.5 MB of ids (comfortably inside any task),
    * while the degenerate families real crawls produce (10⁷–10⁸
    * copies of an empty page or an error template) split into
    * thousands of bounded rows rather than ONE multi-hundred-MB row
    * that OOMs whichever task aggregates, shuffles or explodes it.
    * Single-chunk sets — everything the synthetic corpora produce —
    * take the exact pre-chunking plan shapes. */
  private[graft] val ChunkMembers = 65536

  /** The collapse as one exchange: `(set_rep, hs, chunk_id, members)`
    * per distinct shingle set, membership split across chunk rows of
    * ≤ 2·[[ChunkMembers]] − 1 ids in ≤ ⌈|set|/[[ChunkMembers]]⌉ + 1
    * rows (chunk 0 holds the smallest ids, so the set representative
    * — the group minimum — is always in chunk 0). The group key leads
    * with xxhash64(hs) so hashing/comparison work rides one long; the
    * raw `hs` stays in the key for exactness (hash ties — i.e. equal
    * sets — compare arrays).
    *
    * Chunk assignment is two-level — sort-free VALUE buckets
    * (⌊doc_id/chunk⌋, bounding row SIZE) then a count-based PACKING
    * of the bucket rows (bounding row COUNT) — see [[chunkMembers]]
    * for why both bounds are load-bearing. Round-16 forensics: the
    * row_number spelling's corpus-wide per-partition member sort was
    * a steady-state +30–55% on every collapse consumer — here the
    * only ordered work runs over already-aggregated bucket rows. */
  private[graft] def collapseGroups(docs: DataFrame): DataFrame =
    collapseGroupsAt(docs, chunkSize(docs.sparkSession))

  /** Effective membership chunk size: `spark.graft.dedupChunkMembers`
    * when set (an operator-owner tuning knob, and the seam the
    * chunk-invariance specs drive — fixture-scale corpora never fill
    * a 65536-id chunk), else [[ChunkMembers]]. Answers are invariant
    * to the value (spec-pinned); only row bounds change. */
  private[graft] def chunkSize(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.dedupChunkMembers")
      .map(_.toInt).getOrElse(ChunkMembers)

  /** [[collapseGroups]] at an explicit chunk size. */
  private[graft] def collapseGroupsAt(docs: DataFrame, chunk: Int): DataFrame =
    // raw shingle projection, NOT [[hashedShingles]]: that helper's
    // repartition(doc_id) boundary exists to share the interpreted
    // shingle tree across several consumers, but here the collapse
    // aggregate is the single consumer AND a materialization boundary
    // itself — the extra exchange would be pure overhead
    chunkMembers(
      docs.select(col("doc_id"),
        call_function("hashed_shingle_set", col("text"), lit(ShingleN))
          .as("hs")),
      chunk)

  /** `(doc_id, hs)` rows → chunked set groups — the shared core of
    * [[collapseGroups]] and [[compactDedupIndex]]'s merge (which
    * re-chunks the exploded persisted memberships). Deterministic:
    * chunk contents follow doc_id order, so rebuild ≡ compact ≡
    * one-shot (spec-pinned). */
  private[graft] def chunkMembers(pairs: DataFrame, chunk: Int): DataFrame = {
    require(chunk >= 1, "chunk size must be >= 1")
    // Two levels, both riding the ONE (hsh, hs) exchange:
    //
    //   1. VALUE buckets (`doc_id div chunk` — exact long floor-div;
    //      the earlier double spelling was exact only below 2^53):
    //      a sort-free aggregate over the raw member rows, each output
    //      row bounded at ≤ chunk ids (a range of `chunk` integers).
    //   2. COUNT-based packing of those bucket rows into chunks: a
    //      prefix-sum window + one more aggregate — over BUCKET rows
    //      only, never the raw members, so the corpus-wide member sort
    //      the round-15 row_number spelling paid (+30–55% on every
    //      collapse consumer) stays deleted.
    //
    // Level 2 exists because value buckets alone bound row SIZE but
    // not row COUNT: a dup family's ids land wherever the crawl put
    // them, so a 10⁷-copy family spread over a 10¹⁰-id corpus is one
    // member per bucket — 10⁷ chunk rows — and the banded-candidate
    // join (which carries every chunk row of a set through its
    // buckets) would pay chunkPairs ∝ |A|·|B| per matching set pair,
    // the exact d² blowup the collapse exists to prevent. Packing by
    // cumulative member count makes chunk count ≤ ⌈|set|/chunk⌉ + 1
    // (spread-independent) at ≤ 2·chunk − 1 ids per row (a bucket
    // straddling a boundary ships whole).
    //
    // Chunk ids are contiguous from 0 by construction (the prefix sum
    // starts at 0 and grows by ≤ chunk per bucket row), buckets are id
    // ranges so the flattened members stay globally sorted, and chunk
    // 0 therefore still opens with the set representative (the group
    // minimum). Layouts are NOT merge-stable across build/append/
    // compact (packing depends on the full membership, as the r15
    // slicing did) — ANSWERS are, which the chunk-invariance and
    // lifecycle-fuzz specs pin.
    // the ONE ordered window (the packing prefix sum) sorts only the
    // aggregated bucket rows; the rep read is an UNORDERED min window
    // (clustering satisfied, no sort), and per-chunk reassembly is
    // sort_array over the ≤ 2·chunk-bounded flattened ids — collection
    // order never matters
    val ow = Window.partitionBy(col("hsh"), col("hs")).orderBy(col("bucket"))
    val cumBefore = coalesce(
      sum(size(col("members")).cast("long"))
        .over(ow.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    pairs.select(xxhash64(col("hs")).as("hsh"), col("hs"), col("doc_id"))
      .repartition(col("hsh"), col("hs"))
      .withColumn("bucket", expr(s"doc_id div $chunk"))
      .groupBy(col("hsh"), col("hs"), col("bucket"))
      .agg(sort_array(collect_list(col("doc_id"))).as("members"))
      .withColumn("_cum", cumBefore)
      .withColumn("chunk_id", expr(s"_cum div $chunk").cast("int"))
      .groupBy(col("hsh"), col("hs"), col("chunk_id"))
      .agg(sort_array(flatten(collect_list(col("members")))).as("members"))
      .withColumn("set_rep",
        min(element_at(col("members"), 1)).over(
          Window.partitionBy(col("hsh"), col("hs"))))
      .select(col("set_rep"), col("hs"), col("chunk_id"), col("members"))
  }

  /** The shared hot-bucket-guarded front half of every MinHash pair
    * operator: banded candidates over SET representatives
    * ([[collapseExact]], buckets capped at `cap`), scored at the REP
    * level, then expanded to document pairs through the membership
    * frame. Output: (doc_a, doc_b, score columns), doc_a < doc_b.
    *
    * `mk` builds the score columns from the two shingle-set columns —
    * evaluated once per SET pair (cross) and once per SET (intra), not
    * once per expanded document pair, which is both the perf point
    * (the d²-row expansion of a dup cluster never ships or re-scores
    * the sets) and sound: every score here is a pure function of the
    * two sets, and sets are constant within a group. `prune` filters
    * rep-level rows BEFORE expansion, so a threshold cuts a d²-sized
    * group before it exists.
    *
    * The expansion is EXACT, not approximate: a pair (x, y) shared a
    * band signature in the unguarded plan iff sig(hs(x)) = sig(hs(y))
    * for some band, and hs is constant within a set group — so (x, y)
    * collided iff x and y are in the SAME group (the unconditional
    * intra-group expansion) or their two reps collide (the cross-group
    * expansion). The intra-group self-join is output cardinality, not
    * candidate waste: a d-doc exact-dup cluster owes d²/2 rows to the
    * PAIR-LIST contract itself; consumers that only need the clusters
    * should read [[clusterLabels]], where the group is one label
    * either way. */
  private def expandScored(docs: DataFrame, cap: Int,
      mk: (Column, Column) => Seq[(String, Column)],
      prune: DataFrame => DataFrame): DataFrame = {
    val groups = collapseGroups(docs)
    val crossNames = mk(col("hs_a"), col("hs_b")).map(_._1)
    // the sets AND membership CHUNK rows ride the band join (4 copies
    // of each distinct set's chunk rows — a bounded constant
    // post-collapse, and each row ≤ ChunkMembers ids): scoring happens
    // directly on the collision rows, `prune` cuts candidates BEFORE
    // the per-pair dedup, and the expansion to document pairs is a
    // pure nested explode — no join, no exchange. Multi-chunk sets
    // (only exact-dup families past ChunkMembers copies) re-evaluate
    // the score per chunk pair — sound (the score is a pure function
    // of the two sets, constant across chunks) and cheap (degenerate
    // families are short boilerplate; their hs is tiny).
    val withMh = groups.select(col("set_rep"), col("hs"), col("chunk_id"),
      col("members"), minhashSig(col("hs")).as("mhs"))
    val bandSigs = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("-", (0 until RowsPerBand).map(r =>
          element_at(col("mhs"), b * RowsPerBand + r + 1)): _*).as("sig"))
    }
    val idx = withMh
      .select(col("set_rep"), col("hs"), col("chunk_id"), col("members"),
        explode(array(bandSigs: _*)).as("bs"))
      .select(col("set_rep"), col("hs"), col("chunk_id"), col("members"),
        col("bs.band"), col("bs.sig"))
    // bucket occupancy counts SETS, not chunk rows: every chunk row of
    // a set lands in the same buckets, so counting only chunk-0 rows
    // keeps the cap's meaning (distinct shingle sets per bucket)
    // independent of how memberships chunk
    val wnd = idx.withColumn("n_bucket",
      sum(when(col("chunk_id") === 0, 1L).otherwise(0L))
        .over(Window.partitionBy(col("band"), col("sig"))))
    val kept = wnd.filter(col("n_bucket") <= cap)
    val a = kept.select(col("band"), col("sig"), col("set_rep").as("sr_a"),
      col("hs").as("hs_a"), col("chunk_id").as("ck_a"),
      col("members").as("ms_a"))
    val b = kept.select(col("band"), col("sig"), col("set_rep").as("sr_b"),
      col("hs").as("hs_b"), col("chunk_id").as("ck_b"),
      col("members").as("ms_b"))
    // dedup keys include the chunk ids: one surviving row per (set
    // pair, chunk pair) — together the Ca×Cb chunk pairs cover the
    // full membership product exactly once
    val crossScored = prune(a.join(b, Seq("band", "sig"))
      .filter(col("sr_a") < col("sr_b"))
      .select(col("sr_a") +: col("sr_b") +: col("ck_a") +: col("ck_b") +:
        col("ms_a") +: col("ms_b") +:
        mk(col("hs_a"), col("hs_b")).map { case (n, c) => c.as(n) }: _*))
      .dropDuplicates("sr_a", "sr_b", "ck_a", "ck_b")
    val cross = crossScored
      .select(explode(col("ms_a")).as("m_a") +: col("ms_b") +:
        crossNames.map(col): _*)
      .select(col("m_a") +: explode(col("ms_b")).as("m_b") +:
        crossNames.map(col): _*)
      .select(least(col("m_a"), col("m_b")).as("doc_a") +:
        greatest(col("m_a"), col("m_b")).as("doc_b") +: crossNames.map(col): _*)
    // the intra branch reads each group's band-0 chunk rows of the
    // WINDOW frame, NOT the groups frame directly: a prune over
    // `groups` would be pushed through the collapse aggregate into the
    // scan (hs is a grouping key, the score a deterministic function
    // of it), re-running the shingle pipeline per branch; a filter on
    // hs cannot cross a Window, so from here the scan + collapse
    // subplan is structurally shared with the cross branch
    // (ReuseExchange). The `n_bucket >= 1` and `set_rep.isNotNull`
    // conjuncts are load-bearing despite being always true: without a
    // reference to the window's output column, ColumnPruning deletes
    // the Window node itself and the pushdown barrier with it, and
    // without a set_rep reference the intra collapse aggregate loses
    // its min() and stops being the SAME subplan as the cross
    // branch's — either way the branch re-scans the corpus (PlanSpec
    // pins the resulting single-scan shape). Intra pairs are never
    // cap-dropped — exact duplicates don't ride the banding. Chunk
    // pairs within a set come from a self-join on set_rep over the
    // chunk rows (ck_a ≤ ck_b; chunks are doc_id-ordered, so the
    // m_a < m_b filter below dedups within-chunk and keeps every
    // cross-chunk pair) — chunk-level rows only, never memberships.
    val i0 = wnd.filter(col("band") === 0
      && col("n_bucket") >= 1L && col("set_rep").isNotNull)
    val intra = prune(i0
      .select(col("set_rep"), col("hs"), col("chunk_id").as("ck_a"),
        col("members").as("ms_a"))
      .join(i0.select(col("set_rep"), col("chunk_id").as("ck_b"),
        col("members").as("ms_b")), Seq("set_rep"))
      .filter(col("ck_a") <= col("ck_b"))
      .select(col("ms_a") +: col("ms_b") +:
        mk(col("hs"), col("hs")).map { case (n, c) => c.as(n) }: _*))
      .select(explode(col("ms_a")).as("m_a") +: col("ms_b") +:
        crossNames.map(col): _*)
      .select(col("m_a") +: explode(col("ms_b")).as("m_b") +:
        crossNames.map(col): _*)
      .filter(col("m_a") < col("m_b"))
      .select(col("m_a").as("doc_a") +: col("m_b").as("doc_b") +:
        crossNames.map(col): _*)
    cross.unionByName(intra)
  }

  /** Rep-level candidate pairs (sr_a < sr_b, distinct) from the capped
    * band join — the frame whose cardinality the hot-bucket guard
    * bounds (TextPipelineSpec pins it linear on a planted
    * identical-doc cluster). */
  private[graft] def repCandidates(setReps: DataFrame, cap: Int): DataFrame = {
    val idx = minhashIndex(setReps)
    // the bucket count rides a window keyed exactly like the join:
    // ONE (band, sig) exchange serves the count, the filter, and both
    // self-join sides (output partitioning is preserved through
    // filter/project, so the join re-uses it) — measured faster than a
    // separate heavy-key aggregate + broadcast anti-join, which loses
    // that exchange reuse and re-shuffles both join sides
    val kept = idx
      .withColumn("n_bucket",
        count(lit(1)).over(Window.partitionBy(col("band"), col("sig"))))
      .filter(col("n_bucket") <= cap)
    val a = kept.select(col("doc_id").as("sr_a"), col("band"), col("sig"))
    val b = kept.select(col("doc_id").as("sr_b"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .filter(col("sr_a") < col("sr_b"))
      .select(col("sr_a"), col("sr_b")).distinct()
  }

  /** Bucket-occupancy audit of the (post-collapse) LSH index — the
    * accounting readout for [[MaxBandBucket]]: per band, how many
    * buckets exist, the largest one, and how many buckets (and how much
    * row mass) a cap of `cap` would cut. The operator owner's evidence
    * for sizing the cap — a cut is visible here BEFORE it silently
    * costs recall, the same never-drop-silently contract
    * [[CorpusFilters]] `domainMix` keeps for its share cuts. */
  def lshBucketAudit(docs: DataFrame, cap: Int = MaxBandBucket): DataFrame = {
    val (_, setReps) = collapseExact(docs)
    minhashIndex(setReps)
      .groupBy(col("band"), col("sig")).agg(count(lit(1)).as("n"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("n")).as("max_bucket"),
        sum(when(col("n") > cap, 1L).otherwise(0L)).as("n_capped_buckets"),
        sum(when(col("n") > cap, col("n")).otherwise(0L)).as("capped_mass"))
  }

  /** Oracle entry: the audit at a deliberately LOW cap (4) so the
    * accounting columns are non-trivial at fixture scale — the
    * production default [[MaxBandBucket]] cuts nothing on the synthetic
    * corpora, which would pin only zeros. */
  def qLshBucketAudit(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    lshBucketAudit(Tables.documents(spark, dir), cap = 4).orderBy(col("band"))
  }

  def minhashPairs(docs: DataFrame): DataFrame =
    minhashPairsAt(docs, MaxBandBucket)

  /** [[minhashPairs]] at an explicit bucket cap — the test seam for the
    * hot-bucket guard (a cap of 0 shows the cut is cross-set recall
    * only: intra-set pairs never ride the banding). */
  private[graft] def minhashPairsAt(docs: DataFrame, cap: Int): DataFrame =
    expandScored(docs, cap,
      (a, b) => Seq("jaccard" -> jaccard(a, b)),
      _.filter(col("jaccard") >= JaccardThreshold))

  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    minhashPairs(Tables.documents(spark, dir)).orderBy(col("doc_a"), col("doc_b"))
  }

  val ContainmentThreshold = 0.9

  /** Containment of the smaller shingle set in the larger:
    * `|A∩B| / min(|A|,|B|)` — the ASYMMETRIC dup signal Jaccard dilutes.
    * A short document wholly quoted inside a long one has containment
    * 1.0 while its Jaccard shrinks with the length ratio, so a
    * Jaccard-thresholded pass never sees it. */
  def containmentScore(a: Column, b: Column): Column = {
    val inter = call_function("sorted_intersect_size", a, b).cast("double")
    val mn = least(size(a), size(b)).cast("double")
    when(mn === 0, 0.0).otherwise(inter / mn)
  }

  /** Near-dup pairs scored by CONTAINMENT instead of Jaccard — same
    * banded candidate generation (one (band, sig) equi-join, never
    * all-pairs), different verify. Catches quote-style subset dups down
    * to the banding's Jaccard operating point (~0.5 at 4×4 bands);
    * below that the pair never collides in a band, and the honest fix
    * is an asymmetric blocking of the SHORT side — implemented as
    * [[containmentJoin]] (exact prefix×postings filtering, zero recall
    * loss); this banded form stays as the cheap screening pass. */
  def containmentPairs(docs: DataFrame,
                       threshold: Double = ContainmentThreshold): DataFrame =
    expandScored(docs, MaxBandBucket,
      (a, b) => Seq("containment" -> containmentScore(a, b)),
      _.filter(col("containment") >= threshold))

  def qContainmentPairs(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    containmentPairs(Tables.documents(spark, dir))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Sketch calibration readout: for every banded candidate pair, the
    * minhash ESTIMATE of Jaccard (agreeing signature slots / K — the
    * unbiased estimator the LSH is built on) next to the exact value,
    * with the absolute error. The table an operator owner reads to
    * decide whether [[NumHashes]] is enough for the corpus's similarity
    * profile — estimator variance J(1−J)/K is a theory number; this is
    * the empirical check. Candidates only (never all pairs): the
    * estimator matters exactly where the banding surfaces pairs. */
  def minhashEstimation(docs: DataFrame): DataFrame = {
    def slotMatches(a: Column, b: Column) = aggregate(
      zip_with(minhashSig(a), minhashSig(b),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, m) => acc + m)
    def cols(a: Column, b: Column): Seq[(String, Column)] = {
      val j = jaccard(a, b)
      val n = slotMatches(a, b).cast("long")
      val est = n.cast("double") / NumHashes.toDouble
      Seq("jaccard" -> j, "n_slot_matches" -> n,
        "est_jaccard" -> est, "abs_err" -> abs(est - j))
    }
    expandScored(docs, MaxBandBucket, cols, identity)
  }

  def qMinhashEstimation(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    minhashEstimation(Tables.documents(spark, dir))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Cross-corpus near-dup: verified MinHash-LSH pairs BETWEEN a probe
    * corpus (a new ingest increment) and an indexed corpus — the
    * incremental form of [[minhashPairs]], which compares a corpus to
    * itself. A training pipeline runs this per crawl snapshot: only the
    * increment's shingles are computed fresh; the index side is stable
    * and should be cached (or pre-materialized) by the caller.
    *
    * Same scale property as the self-join form: candidates come only
    * from band-bucket equality (probe bands ⋈ index bands), never from
    * an all-pairs product. Streaming twin: [[streamingNearDup]] applies
    * this per micro-batch via `foreachBatch` — each batch is plain
    * batch SQL, so the intra-batch `distinct` needs no streaming state.
    */
  def crossCorpusPairs(probe: DataFrame, index: DataFrame): DataFrame = {
    val ig = collapseGroups(index)
    // bands from chunk-0 rows only: ONE band row per distinct set
    // (chunk rows would inflate the bucket counts and duplicate
    // candidates); the sets side keeps every chunk row — the probe
    // expansion unions the chunked memberships through the i_rep join
    crossPairsFrom(collapseGroups(probe),
      minhashIndex(ig.filter(col("chunk_id") === 0)
        .select(col("set_rep").as("doc_id"), col("hs"))),
      ig.select(col("set_rep").as("doc_id"), col("hs"), col("members")),
      MaxBandBucket)
  }

  /** Guarded cross-corpus scorer shared by [[crossCorpusPairs]] (both
    * sides in memory) and [[dedupProbeIndex]] (index side persisted):
    * the [[expandScored]] hot-bucket guard applied to the probe ⋈ index
    * form. Both sides are exact-set-collapsed, each side's buckets are
    * capped independently (a degenerate STANDING family is the likely
    * production case — a boilerplate cluster in the index that every
    * crawl increment re-collides with), candidates and the Jaccard
    * verify run at the rep level, and membership expands through the
    * two explodes — per CHUNK row on both sides, so no task ever holds
    * an unbounded membership array. Inputs: `pGroups` =
    * [[collapseGroups]] of the probe (chunked); `iBands` = rep-level
    * (doc_id, band, sig), ONE row per set per band; `iSets` =
    * chunk-level (doc_id, hs, members) with doc_id = the set rep on
    * every chunk row. */
  private def crossPairsFrom(pGroups: DataFrame, iBands: DataFrame,
      iSets: DataFrame, cap: Int): DataFrame = {
    val withMh = pGroups.select(col("set_rep"), col("hs"), col("chunk_id"),
      col("members"), minhashSig(col("hs")).as("mhs"))
    val bandSigs = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("-", (0 until RowsPerBand).map(r =>
          element_at(col("mhs"), b * RowsPerBand + r + 1)): _*).as("sig"))
    }
    val pIdx = withMh
      .select(col("set_rep"), col("hs"), col("chunk_id"), col("members"),
        explode(array(bandSigs: _*)).as("bs"))
      .select(col("set_rep").as("p_rep"), col("hs").as("hs_p"),
        col("chunk_id").as("ck_p"), col("members").as("ms_p"),
        col("bs.band"), col("bs.sig"))
    // probe-side occupancy counts SETS (chunk-0 rows only — the
    // expandScored convention); the index side is rep-level already
    val pKept = pIdx.withColumn("n_bucket",
        sum(when(col("ck_p") === 0, 1L).otherwise(0L))
          .over(Window.partitionBy(col("band"), col("sig"))))
      .filter(col("n_bucket") <= cap)
      .drop("n_bucket")
    val iKept = iBands
      .select(col("doc_id").as("i_rep"), col("band"), col("sig"))
      .withColumn("n_bucket",
        count(lit(1)).over(Window.partitionBy(col("band"), col("sig"))))
      .filter(col("n_bucket") <= cap)
      .drop("n_bucket")
    pKept.join(iKept, Seq("band", "sig"))
      .select(col("p_rep"), col("hs_p"), col("ck_p"), col("ms_p"),
        col("i_rep"))
      .dropDuplicates("p_rep", "i_rep", "ck_p")
      // the iSets join FANS OUT over the index side's chunk rows — a
      // (probe chunk × index chunk) row per surviving candidate, each
      // carrying two bounded arrays
      .join(iSets.select(col("doc_id").as("i_rep"), col("hs").as("hs_i"),
        col("members").as("ms_i")), Seq("i_rep"))
      .select(col("ms_p"), col("ms_i"),
        jaccard(col("hs_p"), col("hs_i")).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(explode(col("ms_p")).as("probe_id"), col("ms_i"), col("jaccard"))
      .select(col("probe_id"), explode(col("ms_i")).as("index_id"),
        col("jaccard"))
  }

  /** Persist the standing side of [[crossCorpusPairs]] as a parquet
    * index — the text twin of
    * [[graft.operators.Similarity.writeBandIndex]].
    *
    * Layout: BOTH tables live together under one committed VERSION
    * directory — `<path>/v<NNNNNN>/{bands,sets}` plus an empty
    * `_COMMITTED` marker file — and every reader resolves the highest
    * committed version ([[currentIndexDir]]). `bands/` holds the
    * (doc_id, band, sig) LSH table, one row per distinct shingle set
    * per band; `sets/` the CHUNKED memberships
    * `(doc_id = set rep, hs, chunk_id, members)` the Jaccard verify
    * and pair expansion need — rows bounded by [[ChunkMembers]], so a
    * 10⁸-copy standing boilerplate family is thousands of bounded
    * rows, never one multi-hundred-MB array. Built ONCE per corpus
    * snapshot; every subsequent increment probes it without
    * re-shingling or re-banding a single standing document — the
    * per-crawl-snapshot lifecycle at 100 TB.
    *
    * Why versions + a marker instead of in-place table dirs: the
    * marker CREATE is the single atomic commit point covering BOTH
    * tables. The previous two-rename swap had a crash window between
    * the sets and bands renames in which merged sets were live
    * against stale split-rep bands — [[dedupProbeIndex]]'s inner join
    * from band reps to sets then silently dropped candidates. Now a
    * crash at ANY instant leaves either the old version fully
    * committed (marker not yet created — readers never see the new
    * files) or the new one fully committed; uncommitted leftovers are
    * swept by the next lifecycle call. */
  def writeDedupIndex(index: DataFrame, path: String): Unit = {
    // cache, not localCheckpoint: the lineage is linear (no iterative
    // growth), and only a cached frame is actually RELEASED by the
    // unpersist below — Dataset.unpersist is a no-op on checkpointed
    // frames (see the contractToStars NB), which would strand the
    // corpus-sized shingle blocks until GC in the shared harness JVM.
    val ig = collapseGroups(index).cache()
    installIndexVersion(index.sparkSession, path) { dir =>
      ig.select(col("set_rep").as("doc_id"), col("hs"), col("chunk_id"),
          col("members"))
        .write.mode("overwrite").parquet(s"$dir/sets")
      minhashIndex(ig.filter(col("chunk_id") === 0)
          .select(col("set_rep").as("doc_id"), col("hs")))
        .select(col("doc_id"), col("band"), col("sig"))
        .write.mode("overwrite").parquet(s"$dir/bands")
    }
    ig.unpersist()
    ()
  }

  private val IndexVersionRe = """^v(\d{6})$""".r

  private def indexFs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Every `v<NNNNNN>` directory under an index root (committed or
    * not), as (version, path) pairs. */
  private def indexVersions(spark: SparkSession, path: String)
      : Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val fs = indexFs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { st =>
      st.getPath.getName match {
        case IndexVersionRe(n) => Some((n.toLong, st.getPath))
        case _ => None
      }
    }
  }

  /** The committed (version, dir) pairs under an index root. */
  private def committedVersions(spark: SparkSession, path: String)
      : Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val fs = indexFs(spark, path)
    indexVersions(spark, path).filter { case (_, p) =>
      fs.exists(new org.apache.hadoop.fs.Path(p, "_COMMITTED"))
    }
  }

  /** One-shot migration of the PRE-VERSIONING layout (`<path>/{bands,
    * sets}` directly at the root, no v<NNNNNN>/_COMMITTED): wrap the
    * two tables into `v000000` and commit it, so standing indexes
    * persisted by the previous code keep working instead of throwing
    * "no committed version". Runs only when NO committed version
    * exists and both legacy tables do; the renames are directory
    * moves (metadata-only on any real filesystem), and the marker
    * lands last — interrupted mid-migration, the next call simply
    * resumes (rename of an already-moved dir is skipped). */
  private def migrateLegacyLayout(spark: SparkSession, path: String): Unit = {
    val fs = indexFs(spark, path)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val legacyBands = p(s"$path/bands")
    val legacySets = p(s"$path/sets")
    if (committedVersions(spark, path).isEmpty &&
        (fs.exists(legacyBands) || fs.exists(legacySets))) {
      val v0 = p(s"$path/v000000")
      fs.mkdirs(v0)
      if (fs.exists(legacySets)) fs.rename(legacySets, p(s"$v0/sets"))
      if (fs.exists(legacyBands)) fs.rename(legacyBands, p(s"$v0/bands"))
      fs.createNewFile(p(s"$v0/_COMMITTED"))
      ()
    } else if (committedVersions(spark, path).isEmpty) {
      // resume the one window the branch above can't see: a kill AFTER
      // both legacy renames but BEFORE the marker leaves no legacy dir
      // and no committed version — previously unresolvable forever, and
      // the next install's sweep would even delete the migrated data.
      // An unmarked v000000 whose BOTH tables are complete is
      // internally consistent wherever it came from (an interrupted
      // migration moved complete legacy tables; a first build that
      // died between its last table commit and its marker wrote both
      // tables in one call), so committing it IS the resume. A table
      // counts as complete when the committer's _SUCCESS marker is
      // present, or — ONLY when this job's committer is actually
      // configured not to write one (marksuccessfuljobs=false, common
      // on object stores) — when the dir holds parquet part files and
      // no leftover _temporary staging dir. The config gate matters:
      // under the DEFAULT config a complete table always has
      // _SUCCESS, so a parquet-files heuristic would AUTO-COMMIT a
      // v2-committer partial write (task-committed part files, no
      // _temporary after job abort) that the _SUCCESS check correctly
      // leaves for the sweep; with marksuccessfuljobs=false that
      // residual v2-crash ambiguity is the config owner's documented
      // trade. A partial build is left for the next install's
      // post-commit sweep.
      val v0 = p(s"$path/v000000")
      val successMarkersOff = !spark.sparkContext.hadoopConfiguration
        .getBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", true)
      def tableComplete(t: org.apache.hadoop.fs.Path): Boolean =
        fs.exists(new org.apache.hadoop.fs.Path(t, "_SUCCESS")) ||
          (successMarkersOff && fs.exists(t) &&
            !fs.exists(new org.apache.hadoop.fs.Path(t, "_temporary")) &&
            fs.listStatus(t).exists(_.getPath.getName.endsWith(".parquet")))
      if (tableComplete(p(s"$v0/sets")) && tableComplete(p(s"$v0/bands")) &&
          !fs.exists(p(s"$v0/_COMMITTED"))) {
        fs.createNewFile(p(s"$v0/_COMMITTED"))
        ()
      }
    }
  }

  /** The live (highest COMMITTED) version directory of a dedup index
    * — the single resolution point every reader goes through. A
    * legacy pre-versioning layout is wrapped into v000000 on first
    * resolution ([[migrateLegacyLayout]]). */
  private[graft] def currentIndexDir(spark: SparkSession,
                                     path: String): String = {
    migrateLegacyLayout(spark, path)
    val committed = committedVersions(spark, path)
    require(committed.nonEmpty,
      s"no committed dedup-index version under $path")
    committed.maxBy(_._1)._2.toString
  }

  /** Version-resolving table readers — the public view of the
    * persisted layout; tests and tooling should never hardcode
    * version directories. */
  def dedupIndexSets(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"${currentIndexDir(spark, path)}/sets")
  def dedupIndexBands(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"${currentIndexDir(spark, path)}/bands")

  /** Write a full index layout under the NEXT version directory, then
    * commit it with one atomic `_COMMITTED` create and sweep stale
    * versions (older committed ones and crashed uncommitted
    * leftovers). The sweep runs strictly AFTER the commit and RETAINS
    * the immediately-previous committed version: a reader that
    * resolved [[currentIndexDir]] moments before this install can
    * still be mid-scan on the previous version's parquet, so its
    * files must survive this call — the previous version is swept by
    * the NEXT lifecycle call instead (by which point any scan started
    * against two installs ago has long finished; a deployment with
    * genuinely unbounded reader lifetimes would pin versions with
    * leases). Crash contract: a kill at ANY instant — mid-write,
    * between the two table writes, before the marker — leaves the old
    * version fully committed and readable (the marker is the single
    * commit point), and the orphaned uncommitted directory is swept
    * here on the next call (spec-pinned for all three windows). */
  private[graft] def installIndexVersion(spark: SparkSession, path: String)(
      write: String => Unit): Unit = {
    migrateLegacyLayout(spark, path)
    val fs = indexFs(spark, path)
    val prevCommitted = committedVersions(spark, path)
      .map(_._1).maxOption
    val nextN = indexVersions(spark, path).map(_._1).maxOption.getOrElse(-1L) + 1
    val dir = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path), f"v$nextN%06d")
    write(dir.toString)
    require(fs.createNewFile(new org.apache.hadoop.fs.Path(dir, "_COMMITTED")),
      s"could not commit dedup-index version $dir")
    indexVersions(spark, path).foreach { case (n, p) =>
      if (p.getName != dir.getName && !prevCommitted.contains(n)) {
        fs.delete(p, true); ()
      }
    }
  }

  // ----- identity-addressed batch landing (shared machinery) ----- //

  /** Deterministic identity tag of a row batch: row count + a bit_xor
    * fold of per-id xxhash64 (order-independent, overflow-free under
    * ANSI). Append batches carry DISJOINT id sets (the lifecycle
    * contract: new rows get new ids), so two different batches get
    * different tags even when their PAYLOADS are identical (a re-crawl
    * of the same pages — which is exactly why the tag hashes ids, not
    * payload), while a replay of the same batch reproduces the same
    * tag. Accidental 64-bit collision between disjoint id sets is the
    * 2⁻⁶⁴-scale trade for a journal-free idempotent append. One
    * bounded aggregate over bare ids. */
  private[operators] def identityBatchTag(rows: DataFrame,
                                          idCol: String): String = {
    val r = rows.agg(count(lit(1)), bit_xor(xxhash64(col(idCol)))).head()
    f"n${r.getLong(0)}_h${java.lang.Long.toHexString(
      if (r.isNullAt(1)) 0L else r.getLong(1))}"
  }

  /** Land one batch of rows under an IDENTITY-ADDRESSED partition dir
    * `<tableDir>/batch=<tag>/` — the replay-idempotence mechanism (the
    * `streaming/Events.idempotentBatchWrite` convention applied to a
    * standing index table, with [[identityBatchTag]] playing the batch
    * id). A batch whose directory already carries the committer's
    * _SUCCESS — or whose tag the table's [[landedBatchTags]] manifest
    * records as landed in an EARLIER compacted-away version — is
    * SKIPPED entirely: the common replay touches no files at all, so
    * in-flight readers of the live version are never disturbed. Only a
    * replay after a mid-write crash (no _SUCCESS, no manifest row)
    * rewrites its own directory, and the partial files it clears were
    * an undercounted batch no reader should trust anyway. Also
    * migrates the transient pre-batch-dir flat layout (bare part files
    * at the table root) into `batch=legacy/` first — mixing partition
    * depths would break Spark's partition discovery for every reader.
    * After landing, the tag is recorded in the manifest so a later
    * compaction can carry it forward ([[carryBatchManifest]]). */
  private[operators] def landIdentityBatch(rows: DataFrame, tableDir: String,
                                           tag: String): Unit = {
    val spark = rows.sparkSession
    migrateFlatBatchLayout(spark, tableDir)
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDir = new org.apache.hadoop.fs.Path(s"$tableDir/batch=$tag")
    val landed = landedBatchTags(spark, tableDir)
    if (!landed.contains(tag) &&
        !fs.exists(new org.apache.hadoop.fs.Path(batchDir, "_SUCCESS"))) {
      rows.write.mode("overwrite").parquet(batchDir.toString)
    }
    recordBatchTags(spark, tableDir, landed + tag)
  }

  /** The `_batches` manifest name — one landed tag per line, living at
    * the table root next to the batch dirs. The manifest exists so a
    * COMPACTION (which physically merges batch dirs away) can carry
    * the landed-tag history into the new version: without it, a
    * replayed append whose first attempt committed BEFORE an
    * intervening compact would land as a fresh batch dir and silently
    * double-count — the _SUCCESS probe only protects replays within
    * one version's lifetime. */
  private val BatchManifest = "_batches"

  /** The set of batch tags the table's manifest records as landed
    * (empty when no manifest exists — e.g. a pre-manifest layout,
    * where the per-dir _SUCCESS probe still covers in-version
    * replays). */
  private[operators] def landedBatchTags(spark: SparkSession,
                                         tableDir: String): Set[String] = {
    val fs = indexFs(spark, tableDir)
    val mf = new org.apache.hadoop.fs.Path(tableDir, BatchManifest)
    if (!fs.exists(mf)) Set.empty
    else {
      val in = fs.open(mf)
      try {
        scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().map(_.trim).filter(_.nonEmpty).toSet
      } finally in.close()
    }
  }

  /** Rewrite the table's `_batches` manifest with `tags` (temp file +
    * delete + rename — the crash window between delete and rename
    * degrades to an absent manifest, which the per-dir _SUCCESS probe
    * still covers for every replay except the already-rare
    * replay-after-compact). */
  private[operators] def recordBatchTags(spark: SparkSession,
                                         tableDir: String,
                                         tags: Set[String]): Unit = {
    val fs = indexFs(spark, tableDir)
    val root = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(root)) { fs.mkdirs(root); () }
    val mf = new org.apache.hadoop.fs.Path(root, BatchManifest)
    val tmp = new org.apache.hadoop.fs.Path(root, s"$BatchManifest.tmp")
    val out = fs.create(tmp, true)
    try out.write(tags.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(mf)) { fs.delete(mf, false); () }
    require(fs.rename(tmp, mf), s"could not install batch manifest $mf")
  }

  /** One-shot migration of a flat batch table (part files at the
    * root — the layout a pre-batch-dir build landed) into
    * `batch=legacy/`: metadata-only renames, idempotent (nothing to
    * move on a second call), and required before any batch dir may
    * coexist — Spark's partition discovery rejects leaf files at two
    * depths ("conflicting directory structures"). */
  private[operators] def migrateFlatBatchLayout(spark: SparkSession,
                                                tableDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) {
      val flat = fs.listStatus(root).filter(st => st.isFile &&
        (st.getPath.getName.endsWith(".parquet") ||
          st.getPath.getName == "_SUCCESS"))
      if (flat.nonEmpty) {
        val legacy = new org.apache.hadoop.fs.Path(root, "batch=legacy")
        fs.mkdirs(legacy)
        flat.foreach(st => fs.rename(st.getPath,
          new org.apache.hadoop.fs.Path(legacy, st.getPath.getName)))
      }
    }
  }

  /** Probe a standing dedup index with a fresh increment: shingles and
    * bands are computed ONLY for `probe`; candidates come from
    * (band, sig) equality against the parquet band table; the verify
    * reads the standing shingle sets from `sets/`. Semantics equal
    * [[crossCorpusPairs]] — persistence is answer-invariant. */
  def dedupProbeIndex(spark: SparkSession, path: String,
                      probe: DataFrame): DataFrame = {
    val live = currentIndexDir(spark, path)
    // tombstone MASK: every landed delete is excluded from the answer
    // by an anti-join on the emitted index ids — each SURVIVING
    // pair's jaccard is exact (a function of the two shingle SETs,
    // which deleting a third doc does not change). One conservative
    // edge in the delete-to-compact window: tombstoned rows still
    // occupy per-(band, sig) hot-bucket cap slots until the next
    // compact rebuilds the bands (see the cap note at
    // [[deleteDedupIndex]]), so a pre-compact probe can drop
    // candidate pairs a never-indexed corpus would keep — the same
    // documented conservatism the cap itself carries. Empty when no
    // tombstones exist (the anti-join is a no-op); grows with
    // total-ever-deleted ids, never the corpus (deleted-stays-deleted
    // retention — see [[compactDedupIndex]]).
    crossPairsFrom(collapseGroups(probe),
      spark.read.parquet(s"$live/bands"),
      spark.read.parquet(s"$live/sets"),
      MaxBandBucket)
      .join(deletesIn(spark, live).select(col("doc_id").as("index_id")),
        Seq("index_id"), "left_anti")
      .select(col("probe_id"), col("index_id"), col("jaccard"))
  }

  /** Land a TOMBSTONE batch against a standing dedup index — the
    * delete half of the lifecycle a 100-TB CDC-fed corpus needs
    * (takedowns, re-crawl retractions): the doc ids to remove land as
    * an identity-addressed `deletes/batch=<tag>/` dir inside the LIVE
    * version ([[landIdentityBatch]] — replay-idempotent like every
    * landing in this engine), are MASKED out of probe answers
    * immediately ([[dedupProbeIndex]]) and physically APPLIED at the
    * next [[compactDedupIndex]] (memberships pruned, fully-deleted
    * sets dropped, bands rebuilt), after which the sets/bands layout
    * is row-equivalent to a fresh build over the surviving corpus;
    * the tombstone ids themselves are RETAINED across compacts
    * (deleted-stays-deleted — see [[compactDedupIndex]] for the
    * replayed-append hazard this closes). Standing sets/bands rows
    * are never rewritten here — a delete is O(batch), not O(index).
    *
    * The one conservatism in the mask-vs-apply window: tombstoned
    * rows still count toward the per-(band, sig) hot-bucket cap until
    * compaction — the same more-exclusion-never-phantom-pairs
    * direction as append's split reps, and gone after compact. */
  def deleteDedupIndex(spark: SparkSession, path: String,
                       docIds: DataFrame): Unit = {
    val live = currentIndexDir(spark, path)
    val ids = docIds.select(col("doc_id")).distinct()
    landIdentityBatch(ids, s"$live/deletes", identityBatchTag(ids, "doc_id"))
  }

  /** The landed tombstones of a version dir, as a (doc_id) frame —
    * empty (same schema) when none have been landed or all were
    * applied by a compact (a post-compact `deletes/` holds only the
    * carried manifest, no batch dirs). */
  private def deletesIn(spark: SparkSession, versionDir: String): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(s"$versionDir/deletes")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBatches = fs.exists(dir) && fs.listStatus(dir).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("batch="))
    if (hasBatches)
      spark.read.parquet(dir.toString).select(col("doc_id")).distinct()
    else spark.range(0).select(col("id").as("doc_id"))
  }

  /** The batch tags physically present as `batch=<tag>/` dirs under a
    * table root (the [[TrainPrep.compactCdcIndex]] convention: carried
    * across compacts alongside the manifest, so pre-manifest layouts
    * keep their history too). Shared with [[TrainPrep]] — one listing
    * convention, one implementation. */
  private[operators] def batchDirTags(spark: SparkSession,
                                      tableDir: String): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("batch=") =>
        st.getPath.getName.stripPrefix("batch=")
    }.toSet
  }

  /** Append an increment to a standing dedup index — the text twin of
    * [[graft.operators.Similarity.appendIvfIndex]]: shingles, the
    * exact-set collapse and bands are computed ONLY for `newDocs`;
    * their rep-level rows land as new files inside the CURRENT
    * committed version's `sets/` and `bands/`, and the standing rows
    * are never rewritten or re-read. A shingle set present in BOTH
    * the standing index and the increment temporarily holds two rep
    * rows with split memberships — probe ANSWERS are unchanged (every
    * score is a function of the set, and the doc-pair expansion
    * unions the two memberships), but the two rows count twice toward
    * the per-(band, sig) bucket cap — the conservative direction
    * (more exclusion, never phantom pairs). [[compactDedupIndex]]
    * merges them away.
    *
    * Crash contract: sets land BEFORE bands, so an interrupted append
    * leaves only inert orphan set rows (candidates come from the band
    * join; extra sets rows are never surfaced). Recovery = re-run the
    * same append, then compact — the compact merge de-duplicates
    * membership ids, so replayed rows collapse away. */
  def appendDedupIndex(spark: SparkSession, path: String,
                       newDocs: DataFrame): Unit = {
    val live = currentIndexDir(spark, path)
    val ig = collapseGroups(newDocs).cache()
    ig.select(col("set_rep").as("doc_id"), col("hs"), col("chunk_id"),
        col("members"))
      .write.mode("append").parquet(s"$live/sets")
    minhashIndex(ig.filter(col("chunk_id") === 0)
        .select(col("set_rep").as("doc_id"), col("hs")))
      .select(col("doc_id"), col("band"), col("sig"))
      .write.mode("append").parquet(s"$live/bands")
    ig.unpersist()
    ()
  }

  /** Compact a standing dedup index: merge the duplicate shingle-set
    * rep rows repeated appends accumulate (one rep per DISTINCT set —
    * the global minimum id, memberships unioned, de-duplicated and
    * re-chunked), rebuild the band table from the merged reps, and
    * coalesce the small append files. Afterwards the layout is
    * row-equivalent to a fresh [[writeDedupIndex]] over the union
    * corpus (spec-pinned), and compact∘compact ≡ compact (the merge
    * is deterministic in doc_id order). The member de-dup also makes
    * compaction the RECOVERY step for a replayed append (see
    * [[appendDedupIndex]]'s crash contract). Installation is one
    * atomic version commit ([[installIndexVersion]]) — there is no
    * instant at which merged sets are readable against stale
    * bands. */
  def compactDedupIndex(spark: SparkSession, path: String): Unit = {
    val live = currentIndexDir(spark, path)
    // APPLY tombstones: deleted ids drop out of every membership (the
    // anti-join below), and a set whose members all died vanishes from
    // the explode→re-chunk — its band rows are simply never rebuilt.
    // BOTH the tombstone ROWS and the delete-batch MANIFEST carry into
    // the new version: the manifest (the compactCdcIndex convention)
    // makes a replayed DELETE a no-op after its batch dir was
    // consolidated away, and the carried rows keep the probe mask
    // standing forever — DELETED-STAYS-DELETED even against a replayed
    // APPEND (dedup appends are mode(append) with compact-as-recovery,
    // so a retried old append CAN physically re-land a deleted doc's
    // membership; the standing mask hides it and the next compact
    // prunes it again). Retention cost: the tombstone list grows with
    // total-ever-deleted ids — bare (doc_id) rows, bounded by delete
    // volume, never corpus-proportional (ids are never reused per the
    // lifecycle contract, so no tombstone can ever be retired by a
    // later legitimate append).
    val tombstones = deletesIn(spark, live)
    val carriedDeleteTags = landedBatchTags(spark, s"$live/deletes") ++
      batchDirTags(spark, s"$live/deletes")
    // gate the mask on tombstone BATCH DIRS existing (one FS listing
    // we already paid above): a delete-free index — the common
    // lifecycle — skips the anti-join entirely instead of trusting
    // PropagateEmptyRelation to fold the 0-row side out (measured in
    // SCALING.md's round-20 creep adjudication: the ungated join's
    // cost is ~30 ms, but the gate makes the no-delete compact plan
    // IDENTICAL to the pre-lifecycle r18 shape by construction)
    val hasTombstoneBatches = batchDirTags(spark, s"$live/deletes").nonEmpty
    val exploded = spark.read.parquet(s"$live/sets")
      .select(col("hs"), explode(col("members")).as("doc_id"))
      .distinct()
    val merged = chunkMembers(
      if (hasTombstoneBatches)
        exploded.join(tombstones, Seq("doc_id"), "left_anti")
      else exploded,
      chunkSize(spark)).cache()
    installIndexVersion(spark, path) { dir =>
      merged.select(col("set_rep").as("doc_id"), col("hs"),
          col("chunk_id"), col("members"))
        .write.mode("overwrite").parquet(s"$dir/sets")
      minhashIndex(merged.filter(col("chunk_id") === 0)
          .select(col("set_rep").as("doc_id"), col("hs")))
        .select(col("doc_id"), col("band"), col("sig"))
        .write.mode("overwrite").parquet(s"$dir/bands")
      if (carriedDeleteTags.nonEmpty) {
        tombstones.write.mode("overwrite")
          .parquet(s"$dir/deletes/batch=compacted")
        recordBatchTags(spark, s"$dir/deletes",
          carriedDeleteTags + "compacted")
      }
    }
    merged.unpersist()
    ()
  }

  /** Harness entry: build the index on the odd standing half, append
    * the even half, compact, then probe with the 10% increment — the
    * full lifecycle pinned to `q_dedup_incremental`'s oracle (the
    * standing population is identical, so persistence, append and
    * compaction must all be answer-invariant). */
  def qDedupAppended(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val path = spillPath(spark, "dedup_index_appended")
    val standing = docs.filter(col("doc_id") % IncrementMod =!= 0)
    writeDedupIndex(standing.filter(col("doc_id") % 2 === 1), path)
    appendDedupIndex(spark, path, standing.filter(col("doc_id") % 2 === 0))
    compactDedupIndex(spark, path)
    dedupProbeIndex(spark, path,
        docs.filter(col("doc_id") % IncrementMod === 0))
      .orderBy(col("probe_id"), col("index_id"))
  }

  /** The tombstone slice of [[qDedupDeleted]]: standing docs with
    * doc_id ≡ [[DeleteRem]] (mod [[DeleteMod]]) get deleted after the
    * append — chosen to cut across both the build half (odd ids) and
    * the append half (even ids), so the compact prunes memberships it
    * landed through BOTH paths. */
  val DeleteMod = 7
  val DeleteRem = 3

  /** Harness entry: build the index on the odd standing half, append
    * the even half, DELETE the [[DeleteRem]] (mod [[DeleteMod]])
    * slice, compact (tombstones applied), then probe with the 10%
    * increment — the full delete lifecycle. The oracle re-derives
    * [[crossCorpusPairs]] over the SURVIVING standing corpus, so
    * landing, masking, application and the manifest carry must all be
    * answer-invariant vs never having indexed the deleted docs at
    * all. */
  def qDedupDeleted(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val path = spillPath(spark, "dedup_index_deleted")
    val standing = docs.filter(col("doc_id") % IncrementMod =!= 0)
    val isDel = col("doc_id") % DeleteMod === DeleteRem
    writeDedupIndex(standing.filter(col("doc_id") % 2 === 1), path)
    appendDedupIndex(spark, path, standing.filter(col("doc_id") % 2 === 0))
    deleteDedupIndex(spark, path, standing.filter(isDel).select(col("doc_id")))
    compactDedupIndex(spark, path)
    dedupProbeIndex(spark, path,
        docs.filter(col("doc_id") % IncrementMod === 0))
      .orderBy(col("probe_id"), col("index_id"))
  }

  /** Harness entry: land the dedup index for the standing 90%, probe
    * with the 10% increment — pinned to `q_dedup_incremental`'s
    * oracle. */
  def qDedupPersisted(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val path = spillPath(spark, "dedup_index")
    writeDedupIndex(docs.filter(col("doc_id") % IncrementMod =!= 0), path)
    dedupProbeIndex(spark, path,
        docs.filter(col("doc_id") % IncrementMod === 0))
      .orderBy(col("probe_id"), col("index_id"))
  }

  /** Incremental-dedup query entry: documents with doc_id ≡ 0 (mod 10)
    * play the new increment; the rest are the standing corpus. */
  val IncrementMod = 10

  def qDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    crossCorpusPairs(
        docs.filter(col("doc_id") % IncrementMod === 0),
        docs.filter(col("doc_id") % IncrementMod =!= 0))
      .orderBy(col("probe_id"), col("index_id"))
  }

  /** Streaming twin: flag each arriving document against the static
    * index. `foreachBatch` hands every micro-batch over as a plain
    * batch frame, so [[crossCorpusPairs]] runs unchanged — no streaming
    * state, no watermark.
    *
    * Exactly-once across RESTARTS requires a durable `checkpoint` (the
    * batch ids a sink dedups on are only stable while the checkpoint
    * survives — Spark's temp checkpoint is deleted at stop, after which
    * ids restart at 0 and files replay). One-shot runs may omit it. */
  def streamingNearDup(streamDocs: DataFrame, index: DataFrame,
                       checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = streamDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(crossCorpusPairs(batch, index), id)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }

  // --- dedup clustering (connected components) ---

  /** Connected components over the near-dup pair graph — the step that
    * turns pairwise hits into dedup groups (keep the min-id doc per
    * group; transitivity matters: A~B and B~C must land A, B, C in one
    * group even when A~C was never emitted).
    *
    * Min-label propagation: every node starts labeled with itself; each
    * round a node takes the minimum label among itself and its
    * neighbors; at fixpoint every node carries its component's minimum
    * id. Near-dup components are shallow (dup clusters are stars/short
    * chains), so few rounds suffice; the loop is a driver loop over
    * per-round ACTIONS (one aggregate to test the fixpoint), never over
    * rows — each round is one distributed join + groupBy. Pointer
    * jumping (label-of-label self-join, O(log d) rounds) was measured
    * and REJECTED here: on the shallow graphs dedup produces it saves no
    * rounds while adding a shuffle to every round. The
    * per-round cache keeps lineage bounded (round k would otherwise
    * recompute rounds 1..k-1), and the edge list is pre-partitioned on
    * the join key and cached ONCE — each round then shuffles only the
    * (tiny) label frame, not the edges.
    *
    * Deep-graph fallback: propagation needs diameter-many rounds, and a
    * long chain of pairwise-similar crawl pages CAN defeat any fixed
    * budget at corpus scale. So propagation gets only HALF the budget;
    * if still unconverged, the operator switches to the alternating
    * large-star / small-star contraction of Kiveris et al., "Connected
    * Components in MapReduce and Beyond" (SoCC'14): large-star rewires
    * every strictly-larger neighbor of each node to the minimum of its
    * closed neighborhood, small-star rewires the smaller-or-equal ones;
    * alternating the two converges to per-component stars centered at
    * the component minimum in O(log^2 n) rounds (2·log n in practice) —
    * diameter no longer appears in the bound, so a 2^20-node path
    * converges inside the same default budget that propagation would
    * need a million rounds for. Each half-step is one groupBy(min) plus
    * one equi-join on the current edge frame — the same shuffle shapes
    * as a propagation round, still nothing collected. Propagation stays
    * the primary path because on the shallow real-world graphs it
    * converges in 2-4 rounds with one join each, vs two per contraction
    * alternation.
    *
    * The RETURNED frame is MATERIALIZED (checkpointed per round — one
    * row per paired doc, bounded by the near-dup population, not the
    * corpus), so consumers never recompute the round chain. Release
    * semantics: `unpersist()` on a checkpointed frame is a no-op (see
    * the [[contractToStars]] NB), so the blocks are reclaimed by the
    * ContextCleaner once the frame becomes unreachable — callers that
    * spill-and-release ([[qDedupClusters]]) drop all references
    * promptly, which is the release path in a long-lived JVM.
    */
  /** Rounds the last [[dedupClusters]] call took to converge — a dev /
    * test probe (loop-cost tuning), not part of the operator contract.
    * Counts propagation rounds plus contraction alternations. */
  @volatile private[graft] var lastRounds: Int = 0

  /** Contraction alternations the last [[dedupClusters]] call ran — 0
    * when propagation converged on its own (the common shallow-graph
    * case); >0 records that the deep-graph fallback engaged. Same
    * dev/test-probe status as [[lastRounds]]. */
  @volatile private[graft] var lastContractionRounds: Int = 0

  def dedupClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // cache the PAIRS, not just the symmetrized edges: the union's two
    // branches would each materialize the full upstream pair pipeline
    // (LSH index + verify joins) — the expensive part — while the
    // symmetrization itself is two selects over the tiny cached frame
    val p = pairs.select(col("doc_a"), col("doc_b")).cache()
    // pre-partition the edge list on the per-round join key and cache:
    // the cached relation keeps its hash distribution, so every round's
    // join moves only the label frame
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("src")).cache()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).cache()
    // sum(empty) is a null row, not 0 — an empty pair graph (no near-dups
    // found, common on real corpora) must yield the empty cluster set,
    // not an NPE
    def labelSum(df: DataFrame): Option[Long] = {
      val r = df.agg(sum(col("label"))).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    var prevSum = labelSum(labels)
    var converged = prevSum.isEmpty
    var iter = 0
    // propagation gets HALF of maxIter; the contraction fallback then
    // gets its own maxIter-alternation budget (NOT the remainder):
    // contraction is log-bounded, so maxIter alternations covers
    // ~2^maxIter-node components, and halving it would leave a
    // 1000-node path (11 alternations) without margin. `maxIter`
    // therefore bounds each PHASE, not their sum — lastRounds can
    // reach 1.5×maxIter on a deep graph.
    val propBudget = math.max(1, maxIter / 2)
    while (!converged && iter < propBudget) {
      val msgs = edges.join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("label"))
      // localCheckpoint, not cache: the union embeds TWO copies of the
      // previous round's plan, so an uncut lineage is 2^rounds plan
      // leaves — at the 10-round budget that tree OOMs the driver just
      // being stringified for the SQL listener (measured). Same
      // cluster-mode caveat as [[contractToStars]].
      val next = labels.unionByName(msgs)
        .groupBy(col("node")).agg(min(col("label")).as("label")).localCheckpoint()
      // min-label sums decrease monotonically; equal sum == fixpoint
      val s = labelSum(next)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    lastContractionRounds = 0
    try {
      if (!converged) {
        // Deep graph: switch to large-star/small-star contraction (see
        // scaladoc). Operates on the ORIGINAL edge set — the partial
        // propagation labels are not a valid seed for edge rewiring, and
        // re-deriving from `edges` (still cached) costs one distinct.
        labels.unpersist()
        labels = contractToStars(edges, maxIter)
        converged = true
        iter += lastContractionRounds
      }
      lastRounds = iter
    } finally {
      // release even when contraction throws — the cached pair/edge
      // frames are corpus-pair-scale and the harness JVM is long-lived
      p.unpersist()
      edges.unpersist()
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * SoCC'14) over a symmetrized edge frame `(src,dst)`. Returns a
    * cached `(node,label)` frame where `label` is the component
    * minimum, converging in O(log^2 n) alternations independent of
    * graph diameter.
    *
    * Per alternation: large-star attaches every strictly-larger
    * neighbor of each center to the minimum of the center's closed
    * neighborhood (connectivity-preserving, proven in the paper);
    * small-star then attaches each center and its smaller neighbors to
    * the center's minimum neighbor. Both are one groupBy(min) + one
    * equi-join; self-loops are dropped and emissions deduped, so the
    * edge multiset shrinks toward per-component stars centered at the
    * minimum. Fixpoint test: a (count, sum-of-xxhash64(src,dst)) edge-
    * set fingerprint compared round over round — sum-over-distinct-set
    * is order-independent, and a 64-bit-hash-sum collision between two
    * DIFFERENT consecutive edge sets is vanishingly unlikely (and the
    * star fixpoint is absorbing, so a stable fingerprint is a stable
    * set in every non-adversarial universe). One cheap aggregate per
    * alternation, same driver-action discipline as the propagation
    * loop.
    *
    * Budget: `maxAlt` alternations. log-bounded convergence makes the
    * throw practically unreachable (a 2^20-node path needs ~20), but an
    * unconverged edge set still must not be read as clusters.
    *
    * LINEAGE: each alternation's output is `localCheckpoint`ed, not
    * cached. A cache bounds recomputation but NOT the logical plan —
    * every round here embeds ~8 copies of the previous round's plan
    * (the symmetrizing union + two self-derived joins), so by round 10
    * an un-truncated tree is ~8^10 nodes and the driver OOMs just
    * STRINGIFYING it (measured: heap death inside explainString). The
    * propagation loop above tolerates plain caching only because its
    * per-round growth is 2x and its real graphs converge in <5 rounds.
    * localCheckpoint materializes to executor-local storage and cuts
    * the plan; it is not fault-tolerant across executor loss — on a
    * real cluster an iteration that must survive preemption should set
    * `spark.graft.spillDir` and swap in reliable `checkpoint` (same
    * call shape), paying the distributed-FS write per round. NB
    * `Dataset.unpersist()` on a checkpointed frame is a no-op (the
    * blocks live as RDD storage, not CacheManager entries); the
    * per-round unpersist calls below release only genuinely cached
    * frames, and checkpointed blocks are reclaimed by the
    * ContextCleaner as the superseded frames become unreachable —
    * bounded by the loop budget, not deterministic per round. */
  private[graft] def contractToStars(symEdges: DataFrame, maxAlt: Int): DataFrame = {
    // canonical undirected pairs (small, large); also the small-star
    // input shape of subsequent rounds
    var cur = symEdges
      .select(greatest(col("src"), col("dst")).as("src"),
              least(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst")).distinct().localCheckpoint()
    // every node that entered the graph — roots must be labeled even
    // after contraction rewires all their incident edges
    val nodes = symEdges.select(col("src").as("node")).distinct().cache()
    // hash-sum in DECIMAL(38,0): a Long sum of 2^63-range hashes
    // overflows (an ANSI-mode error, a silent wrap otherwise)
    def edgeStat(df: DataFrame): (Long, BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }
    var prev = edgeStat(cur)
    var alt = 0
    var fixed = prev._1 == 0L
    // budget is maxAlt PRODUCTIVE alternations + 1: the fixpoint is
    // only OBSERVED one round after it is reached (a round must
    // reproduce the previous fingerprint), so a graph converging in
    // exactly maxAlt rounds must not be failed by its confirmation
    // round
    while (!fixed && alt < maxAlt + 1) {
      // large-star over the symmetrized adjacency of the current edges
      val sym = cur.select(col("src"), col("dst"))
        .unionByName(cur.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src").as("u"), least(col("src"), col("mn")).as("m"))
      val large = sym.join(mins, sym("src") === col("u"))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .where(col("src") =!= col("dst")).distinct()
      // small-star over larger->smaller directed edges
      val dir = large.select(greatest(col("src"), col("dst")).as("src"),
                             least(col("src"), col("dst")).as("dst"))
        .where(col("src") =!= col("dst"))
      val smins = dir.groupBy(col("src")).agg(min(col("dst")).as("m"))
        .select(col("src").as("u"), col("m"))
      val next = dir.join(smins, dir("src") === col("u"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionByName(smins.select(col("u").as("src"), col("m").as("dst")))
        .where(col("src") =!= col("dst")).distinct().localCheckpoint()
      val s = edgeStat(next)
      cur.unpersist()
      cur = next
      fixed = s == prev
      prev = s
      alt += 1
    }
    lastContractionRounds = alt
    if (!fixed) {
      cur.unpersist(); nodes.unpersist()
      throw new IllegalStateException(
        s"dedupClusters contraction did not converge in $maxAlt " +
          "alternations — edge set still changing")
    }
    // fixpoint = stars: every surviving edge points a node at its
    // component minimum; nodes with no surviving edge are roots (their
    // own minimum), including centers whose edges all self-looped away
    val labels = nodes
      .join(cur.select(col("src").as("node"), col("dst").as("lbl")),
            Seq("node"), "left")
      .select(col("node"), coalesce(col("lbl"), col("node")).as("label"))
      .cache()
    labels.foreach(_ => ()) // materialize before releasing the inputs
    cur.unpersist()
    nodes.unpersist()
    labels
  }

  /** Scoped clustering: runs `use` over the cached label frame and
    * unpersists it afterwards — the release path for sessions that
    * outlive the result (same pattern as
    * [[graft.sources.Fixtures.withBillsJsonQuarantined]]). Library
    * callers that want to keep the frame use [[dedupClusters]] directly
    * and own the cache handle. */
  def withDedupClusters[T](pairs: DataFrame, maxIter: Int = 20)(
      use: DataFrame => T): T = {
    val labels = dedupClusters(pairs, maxIter)
    try use(labels) finally labels.unpersist()
  }

  /** Spill root for cache-release handoffs, one per JVM; a shutdown
    * hook deletes the whole tree recursively (`deleteOnExit` never
    * removes non-empty directories), which bounds every per-call
    * subdirectory's lifetime to the JVM's. Overridable with
    * `spark.graft.spillDir` — REQUIRED on a multi-node cluster, where
    * executors write partitions to their own local disks and a
    * driver-local temp path would scan back only the driver's shard;
    * the default is correct only where executors share the driver's
    * filesystem (local mode, or a shared mount). */
  private lazy val localSpillRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_spill")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(p.toFile)))
    p
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(); ()
  }

  private val spillSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** A fresh per-call spill path `<root>/<name>_<seq>` — unique so two
    * concurrent calls in one JVM can never overwrite each other's
    * parquet mid-read (an overwrite-in-place scheme would); the
    * sequence keeps paths deterministic-per-process, and the root
    * shutdown hook reclaims every subdirectory at exit. */
  private[graft] def spillPath(spark: SparkSession, name: String): String = {
    val unique = s"${name}_${spillSeq.getAndIncrement()}"
    spark.conf.getOption("spark.graft.spillDir")
      .map(root => s"$root/$unique")
      .getOrElse(localSpillRoot.resolve(unique).toString)
  }

  /** One memo slot per (dir, tag) — see [[PathMemo]] for the locking,
    * revalidation and build-cost-ledger rules. */
  private val clusterLabelMemo = new PathMemo

  /** Near-dup cluster labels MATERIALIZED once per (JVM, input dir,
    * subset tag) as parquet — the [[graft.operators.Curate.v5Emit]]
    * schedule applied to the clustering family. Four harness entries
    * need a label frame (`q_dedup_clusters`, `q_survivorship`,
    * `q_leakage_split` over the full corpus; `q_leakage_incremental`
    * over the standing subset), and cross-query reuse is invisible to
    * Catalyst, so without this each replays the LSH index + verify +
    * contraction loop — the most iteration-heavy pipeline in the
    * library. A production scheduler lands cluster labels once per
    * corpus snapshot; this map is that schedule inside one JVM: the
    * first consumer pays the build (and is measured paying it), later
    * consumers scan the columnar table. The spill write doubles as the
    * cache-release handoff qDedupClusters previously did per-query
    * (labels ride a cache inside [[withDedupClusters]]; the parquet
    * read-back carries no cache). Keyed by (dir, tag) so scale factors
    * and subsets never mix; deterministic, so materialized ≡ recomputed
    * (pinned in TextPipelineSpec). The path is revalidated on every
    * read — a spill dir cleaned mid-JVM triggers one rebuild, not a
    * failing scan. */
  def clusterLabels(spark: SparkSession, dir: String, tag: String)(
      docs: => DataFrame): DataFrame =
    clusterLabelMemo.read(spark, s"$dir#$tag", s"cluster_labels_$tag") { () =>
      val p = spillPath(spark, s"cluster_labels_$tag")
      withDedupClusters(minhashPairs(docs)) { labels =>
        labels.write.mode("overwrite").parquet(p)
      }
      p
    }

  def qDedupClusters(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    // Harness entry: served from the per-(JVM, dir) materialized label
    // table ([[clusterLabels]]). Never collect(): "one row per paired
    // doc" is corpus-scale at web-crawl dup rates (30-50% dups), far
    // beyond driver memory at 100 TB.
    clusterLabels(spark, dir, "all")(Tables.documents(spark, dir))
      .orderBy(col("doc_id"))
  }

  // --- SimHash ---

  /** 16-bit simhash over a token-hash multiset (one md5 per token —
    * callers project the hash array once): bit j is set when the sum of
    * ±1 over tokens (sign of hash bit j) is positive. Integer sums —
    * order-independent, engine-exact.
    *
    * This is the built-in REFERENCE spelling (16 interpreted `aggregate`
    * lambdas); the hot path is the native [[graft.expressions.SimHash16]]
    * — one tokenize+digest pass per row — which ExpressionsSpec proves
    * bit-identical to this definition. */
  def simhashFromHashes(hs: Column): Column = {
    val bitSums = (0 until 16).map { j =>
      val p = 1 << j
      aggregate(hs, lit(0), (acc, h) =>
        acc + when(h % (2 * p) >= p, 1).otherwise(-1))
    }
    bitSums.zipWithIndex.map { case (s, j) =>
      when(s > 0, 1L << j).otherwise(0L)
    }.reduce(_ + _).cast("long")
  }

  def qSimhash(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        call_function("simhash16", col("text")).as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** SimHash banding: [[SimhashBands]] bands of [[SimhashBandBits]]
    * bits each over the 16-bit fingerprint. */
  val SimhashBands = 4
  val SimhashBandBits = 4

  /** Default hamming radius for [[simhashPairs]] — with 4 bands,
    * ≤ 3 flipped bits can touch at most 3 bands (pigeonhole), so every
    * true pair shares an INTACT band: candidate recall is exactly 1.0,
    * a guarantee the probabilistic MinHash banding doesn't have. */
  val SimhashMaxDist = 3

  /** Hamming near-dup pairs over the simhash fingerprint, banded like
    * MinHash: candidates share at least one band of the signature
    * (id+sim-only equi-join on (band, sig), never all-pairs), verified
    * by exact popcount(xor) ≤ maxDist on candidates only.
    *
    * Scale note: a 16-bit signature holds only 2^[[SimhashBandBits]]
    * sig values per band — fixed bucket counts, fine at oracle scale
    * but a constant-factor cut at 100 TB. The production swap is the
    * WIDE fingerprint next door — [[simhashPairs60]] (60-bit simhash,
    * 4×15-bit bands → 32768 buckets per band, measured 3× faster at
    * sf0.1 with the gap widening at scale); the banding mechanics are
    * width-agnostic, exactly as on the MinHash side. */
  def simhashPairs(docs: DataFrame, maxDist: Int = SimhashMaxDist): DataFrame = {
    // the pigeonhole guarantee (every true pair shares an intact band)
    // holds only for maxDist ≤ bands-1 — a larger radius would silently
    // miss pairs whose flipped bits touch every band; wider radii need
    // more bands or a multi-probe ring (see Similarity.annTopKProbed)
    require(maxDist < SimhashBands,
      s"maxDist=$maxDist breaks the pigeonhole recall guarantee: with " +
        s"$SimhashBands bands candidate recall is exact only for " +
        s"maxDist <= ${SimhashBands - 1}")
    val sims = docs.select(col("doc_id"),
      call_function("simhash16", col("text")).as("sim"))
    // UNCAPPED bucket (Int.MaxValue): the 16-bit variant is the
    // teaching exhibit whose N²/16 bucket growth is exactly the
    // property [[simhashPairs60]] exists to fix — a real cap would
    // fire on its tiny 16-value-per-band sig space at any non-toy SF
    // and hide the lesson. The fingerprint collapse still applies
    // (identical sims band once, expanded after).
    hammingBandedPairs(sims, SimhashBands, SimhashBandBits, maxDist,
      cap = Int.MaxValue)
  }

  /** Hot-bucket-guarded banded hamming pairs over any per-doc long
    * fingerprint — the shared back half of [[simhashPairs]] (16-bit)
    * and [[simhashPairs60]] (wide). Same two-layer guard as the
    * MinHash side, specialized to fingerprints:
    *
    *  - '''collapse''': docs are grouped by the EXACT fingerprint (one
    *    aggregate on `sim`, carrying membership as an array); only
    *    group reps band and join, so an identical-content cluster
    *    (hamming 0 across the whole group) puts ONE row per band in
    *    its bucket, not d.
    *  - '''cap''': rep-level buckets above `cap` are excluded from the
    *    join, bounding any remaining degenerate key.
    *
    * Expansion is exact by the same argument as
    * [[expandScored]]: band signatures are functions of `sim`
    * alone, so pre-collapse candidacy ⇔ same fingerprint group
    * (unconditional intra expansion, hamming 0) or reps collide
    * (cross expansion, hamming recomputed from the same two sims).
    * Null fingerprints (null text) group together but score a NULL
    * hamming, which the radius filter drops — null docs never pair,
    * before or after (NullRobustnessSpec).
    *
    * The popcount verify stays BEFORE the multi-band distinct: it is a
    * codegen'd xor+popcount on two longs (re-computing per shared band
    * is free), while a pre-verify distinct would shuffle the full
    * candidate volume — only surviving rep pairs reach the exchange. */
  private[graft] def hammingBandedPairs(sims: DataFrame, nBands: Int,
      bandBits: Int, maxDist: Int, cap: Int): DataFrame = {
    // same shape as [[expandScored]]: ONE aggregate builds rep and
    // membership per distinct fingerprint, membership arrays ride the
    // band join, expansion is a pure nested explode, and the intra
    // branch reads band-0 of the window frame so the collapse subplan
    // is structurally shared (see expandScored for the pushdown
    // reasoning)
    val groups = sims.groupBy(col("sim"))
      .agg(min(col("doc_id")).as("rep"),
        collect_list(col("doc_id")).as("members"))
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sim"), b * bandBits)
          .bitwiseAND(lit((1 << bandBits) - 1)).as("sig"))
    }
    val bands = groups
      .select(col("rep"), col("sim"), col("members"),
        explode(array(bandCols: _*)).as("bs"))
      .select(col("rep"), col("sim"), col("members"),
        col("bs.band"), col("bs.sig"))
    val wnd = bands.withColumn("n_bucket",
      count(lit(1)).over(Window.partitionBy(col("band"), col("sig"))))
    val kept = wnd.filter(col("n_bucket") <= cap)
    val a = kept.select(col("band"), col("sig"), col("rep").as("r_a"),
      col("sim").as("sim_a"), col("members").as("ms_a"))
    val b = kept.select(col("band"), col("sig"), col("rep").as("r_b"),
      col("sim").as("sim_b"), col("members").as("ms_b"))
    val repPairs = a.join(b, Seq("band", "sig"))
      .filter(col("r_a") < col("r_b"))
      .select(col("r_a"), col("r_b"), col("ms_a"), col("ms_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("r_a", "r_b")
    val cross = repPairs
      .select(explode(col("ms_a")).as("m_a"), col("ms_b"), col("hamming"))
      .select(col("m_a"), explode(col("ms_b")).as("m_b"), col("hamming"))
      .select(least(col("m_a"), col("m_b")).as("doc_a"),
        greatest(col("m_a"), col("m_b")).as("doc_b"), col("hamming"))
    // n_bucket >= 1 / rep.isNotNull are the same always-true
    // subplan-preserving conjuncts as in [[expandScored]] — see the
    // pushdown note there
    val intra = wnd.filter(col("band") === 0
        && col("n_bucket") >= 1L && col("rep").isNotNull)
      .select(col("members"),
        bit_count(col("sim").bitwiseXOR(col("sim"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .select(explode(col("members")).as("m_a"), col("members"), col("hamming"))
      .select(col("m_a"), explode(col("members")).as("m_b"), col("hamming"))
      .filter(col("m_a") < col("m_b"))
      .select(col("m_a").as("doc_a"), col("m_b").as("doc_b"), col("hamming"))
    cross.unionByName(intra)
  }

  /** Oracle entry for the 16-bit TEACHING variant, demoted from the
    * canonical pair path (that is [[qSimhashPairs]], which runs the
    * wide [[simhashPairs60]]): benched on a deterministic ¼ sample
    * (`doc_id % 4 = 0`) because the 16-bit banding's N²/16 candidate
    * volume is exactly the property the wide path exists to fix —
    * full-corpus cost belongs to the production spelling, not the
    * parity exhibit. */
  def qSimhashPairs16(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    simhashPairs(Tables.documents(spark, dir).filter(col("doc_id") % 4 === 0))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --- corpus-level source similarity (mergeable minhash sketches) ---

  /** Pairwise Jaccard ESTIMATES between whole sources from per-source
    * minhash sketches — corpus analytics ("which crawls overlap?")
    * without ever joining documents. The 100-TB property on display is
    * MERGEABILITY: each of the K sketch slots is a `min` aggregate, so
    * partial aggregation combines map-side and a source's sketch is
    * buildable incrementally (min-merge with yesterday's sketch) —
    * the whole pipeline is one explode + one groupBy(source) producing
    * #sources rows, then a trivially small self-join.
    *
    * Estimate: fraction of agreeing sketch slots, the classic min-wise
    * estimator (E[agree] = Jaccard of the shingle sets). */
  def sourceMinhashSimilarity(docs: DataFrame): DataFrame = {
    val hs = hashedShingles(docs, ShingleN)
    val slots = (0 until NumHashes).map { k =>
      min(pmod(col("h") * permA(k) + permB(k), lit(MinhashMod))).as(s"m$k")
    }
    val sketches = hs.select(col("source"), explode(col("hs")).as("h"))
      .groupBy(col("source")).agg(slots.head, slots.tail: _*)
    val a = sketches.select(col("source").as("source_a") +:
      (0 until NumHashes).map(k => col(s"m$k").as(s"a$k")): _*)
    val b = sketches.select(col("source").as("source_b") +:
      (0 until NumHashes).map(k => col(s"m$k").as(s"b$k")): _*)
    val agree = (0 until NumHashes)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    a.join(b, col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), agree.as("n_agree"))
      .withColumn("est_jaccard",
        col("n_agree").cast("double") / NumHashes.toDouble)
  }

  def qSourceSimilarity(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    sourceMinhashSimilarity(Tables.documents(spark, dir))
      .orderBy(col("source_a"), col("source_b"))
  }

  // --- repeated-substring spans (inverted k-gram index) ---

  /** Span shingle width (tokens) for [[repeatedSpans]]. */
  val SpanGram = 5

  /** Exact repeated-substring spans: maximal token ranges covered by
    * k-gram shingles that occur more than once in the corpus (within or
    * across documents) — the distributed approximation of
    * suffix-array substring dedup ("repeated ≥k-token passages are
    * boilerplate/templates; cut or down-weight them").
    *
    * Shape: positional 60-bit shingle hashes (a NATIVE pass —
    * [[graft.expressions.ShinglePosHashes]]; the shuffle key is 8
    * bytes, never a multi-token string) → a two-phase SALTED
    * occurrence count (partial count per `(hash, doc_id mod`
    * [[SpanCountSalts]]`)`, map-side combined, then a per-hash sum of
    * ≤[[SpanCountSalts]] tiny rows) → a semi-join of the positions
    * back against the repeated-hash set. A pathologically common
    * shingle (exactly what a boilerplate detector meets) therefore
    * never lands as one task's problem: the count combines before any
    * exchange, and the probe join is AQE-broadcastable/skew-
    * splittable — unlike the previous whole-partition
    * `count().over(Window.partitionBy(hash))`, which structurally
    * serialized the hot shingle's entire occurrence list into a
    * single window partition. The probe pays a second evaluation of
    * the native hash pass (deliberate, see inline note). (History:
    * shingle-STRING groupBy+join 28 s → hash window-count 15 s →
    * native-expression window ~2 s at sf0.1 → this salted form, same
    * ballpark minus the single-task window.) Then a per-document
    * gaps-and-islands merge of overlapping [pos, pos+k) ranges via a
    * doc_id-partitioned window (bounded by document length, not
    * corpus size). No all-pairs anything; the merge is integer
    * arithmetic (engine-exact, and hash collisions — see the
    * expression's scaladoc — are made identically by both engines).
    *
    * Output: (doc_id, span_start, span_end, n_grams) — token index
    * ranges [start, end) with the count of repeated shingles merged
    * into the span. */
  /** Default salt fan-out for the two-phase occurrence count in
    * [[repeatedSpans]]: a hot shingle's rows spread over this many
    * tasks. SIZING RULE: a small multiple of the executor cores one
    * hot key should fan across — enough that no single task owns a
    * boilerplate shingle's full occurrence stream, small enough that
    * the per-shingle re-sum stays a trivial ≤salts-row aggregate; 16
    * fits local[32], a 1000-executor cluster would run 64-256. The
    * knob is PURE PARALLELISM: totals are a sum of per-salt partial
    * counts, so any salts ≥ 1 yields byte-identical spans (pinned by
    * the invariance spec) — tuning it can never change answers. */
  val SpanCountSalts = 16

  def repeatedSpans(docs: DataFrame, k: Int = SpanGram,
                    salts: Int = SpanCountSalts): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val pos = docs
      .select(col("doc_id"),
        posexplode(call_function("shingle_pos_hashes", col("text"), lit(k))))
      .toDF("doc_id", "pos", "sh")
    // two-phase salted occurrence count: the (sh, salt) partial count
    // combines MAP-SIDE (each task emits one row per local key before
    // any exchange — the actual skew protection for the count), the
    // per-sh total then sums ≤ salts tiny rows
    val totals = pos
      .groupBy(col("sh"),
        pmod(col("doc_id"), lit(salts.toLong)).as("_salt"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col("sh")).agg(sum(col("_c")).as("_n"))
      .filter(col("_n") >= 2)
    // probe = semi-join back on sh: AQE broadcasts the (aggregated,
    // filtered) totals side when small and can SKEW-SPLIT the stream
    // side of a semi SMJ when not — either way a hot shingle's rows
    // are never serialized into one task, which a window partition
    // structurally cannot avoid. The probe re-runs the native hash
    // pass (visible as a second shingle_pos_hashes in the plan) —
    // deliberate: a codegen'd 8-byte-hash pass is cheaper at corpus
    // scale than persisting the exploded positions to share one scan.
    val hits = pos.join(totals.select(col("sh")), Seq("sh"), "left_semi")
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    hits
      .withColumn("_new",
        when(col("pos") - lag(col("pos"), 1).over(w) <= k, 0L).otherwise(1L))
      .withColumn("island", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + k).cast("long").as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"), col("n_grams"))
  }

  def qRepeatedSpans(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    repeatedSpans(Tables.documents(spark, dir))
      .orderBy(col("doc_id"), col("span_start"))
  }

  /** The REMOVAL step [[repeatedSpans]] detects for: each document with
    * its repeated passages' tokens cut out — exact-substring dedup as
    * a transform, not just a report (the Lee-et-al "dedup the
    * training set, not the document list" step the curation gates
    * approximate by dropping whole docs). Span lists ride a per-doc
    * `collect_list` BOUNDED by the doc's own span count; the cut is a
    * per-row filter over token positions (one pass, no join per
    * token). Docs without spans pass through verbatim — including
    * empty and null-text rows, which carry no tokens to cut. */
  def stripSpans(docs: DataFrame, k: Int = SpanGram): DataFrame = {
    val spans = repeatedSpans(docs, k)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("spans"))
    docs
      .join(spans, Seq("doc_id"), "left")
      .withColumn("toks", tokens(col("text")))
      .withColumn("idx",
        when(size(col("toks")) > 0,
          sequence(lit(0), size(col("toks")) - 1))
          .otherwise(array().cast("array<integer>")))
      .withColumn("keep",
        when(col("spans").isNull, col("idx"))
          .otherwise(filter(col("idx"), i =>
            !exists(col("spans"), s =>
              i.cast("long") >= s.getField("span_start") &&
                i.cast("long") < s.getField("span_end")))))
      .select(col("doc_id"),
        concat_ws(" ",
          transform(col("keep"), i => element_at(col("toks"), i + 1)))
          .as("clean_text"),
        size(col("toks")).cast("long").as("n_before"),
        size(col("keep")).cast("long").as("n_after"))
  }

  def qStripSpans(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    stripSpans(Tables.documents(spark, dir)).orderBy(col("doc_id"))
  }

  /** Tumbling-chunk width (tokens) for [[paragraphDedup]]. The corpus
    * has no newline structure, so "paragraphs" are fixed-width token
    * chunks — the same segmentation C4 applied to three-sentence spans
    * when source text carried no markup. */
  val ParaWidth = 12

  /** C4/CCNet-style cross-document segment dedup with a KEEP-ONE
    * policy: split each document into non-overlapping [[ParaWidth]]-
    * token chunks, hash each chunk, and keep only the globally-first
    * occurrence (minimum `(doc_id, chunk_idx)`) of every distinct
    * chunk value; later copies are cut and the survivors re-joined in
    * order. This is deliberately DIFFERENT from [[stripSpans]]:
    * stripSpans is the Lee-et-al "cut EVERY occurrence of a repeated
    * passage" transform, while C4's rule ("we removed all but one of
    * any three-sentence span occurring more than once") retains one
    * canonical copy — a corpus deduplicated this way still contains
    * each passage exactly once.
    *
    * Scale shape: one chunk explosion → a hash-groupBy `min(struct)`
    * argmin (map-side combined — a boilerplate chunk repeated across
    * a million documents collapses to one partial row per task before
    * any exchange) → an equi-join of the chunk stream back against
    * the 1-row-per-hash winner table (AQE broadcasts it when small
    * and skew-splits the stream side when a hash is hot) → one
    * doc_id-partitioned rebuild aggregate. No window over a corpus-
    * global partition, no all-pairs step anywhere. The chunk
    * derivation is evaluated once per join side (same deliberate
    * trade as [[repeatedSpans]] — a codegen'd re-scan is cheaper at
    * corpus scale than persisting the exploded chunks).
    *
    * Output: `(doc_id, clean_text, n_chunks, n_kept)`; chunk-free
    * (empty/null-text) docs pass through with an empty clean_text. */
  /** Tumbling chunk derivation for the paragraph-dedup family:
    * `(doc_id, c, chunk)` with `chunk` = tokens `[c·w, (c+1)·w)`
    * re-joined by single spaces (last chunk may be partial). */
  private[graft] def paraChunks(docs: DataFrame, w: Int = ParaWidth): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("c", explode(
        when(size(col("toks")) > 0,
          sequence(lit(0), floor((size(col("toks")) - 1) / w).cast("int")))
          .otherwise(array().cast("array<int>"))))
      .select(col("doc_id"), col("c"),
        concat_ws(" ", slice(col("toks"), col("c") * w + 1, lit(w)))
          .as("chunk"))

  /** Shared rebuild: a keep-flagged chunk frame back to one row per
    * document, chunk-free docs passing through with empty text. */
  private def paraRebuild(docs: DataFrame, flagged: DataFrame): DataFrame = {
    val rebuilt = flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list drops the nulls the when() leaves for cut chunks;
        // the list is bounded by the doc's own chunk count
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("keep"), struct(col("c"), col("chunk"))))),
          k => k.getField("chunk"))).as("clean_text"))
    docs.select(col("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  def paragraphDedup(docs: DataFrame, w: Int = ParaWidth): DataFrame = {
    require(w >= 1, "chunk width must be >= 1")
    val hashed = paraChunks(docs, w).withColumn("h", md5(col("chunk")))
    // global first occurrence per distinct chunk: struct min orders by
    // (doc_id, c) lexicographically — one row per hash after the agg
    val winners = hashed.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("c"))).as("_w"))
    val flagged = hashed.join(winners, Seq("h"))
      .withColumn("keep", struct(col("doc_id"), col("c")) === col("_w"))
    paraRebuild(docs, flagged)
  }

  def qParagraphDedup(spark: SparkSession, dir: String): DataFrame =
    paragraphDedup(Tables.documents(spark, dir)).orderBy(col("doc_id"))

  /** Incremental admission for the keep-one policy: clean an INCREMENT
    * against a STANDING corpus that already landed — an increment chunk
    * survives only when its value appears neither anywhere in the
    * standing corpus nor earlier (by `(doc_id, chunk_idx)`) in the
    * increment itself. In the snapshot-then-append layout (every
    * standing doc_id below every increment doc_id) this equals
    * [[paragraphDedup]] over the union, restricted to the increment's
    * rows — pinned by spec on a planted fixture. The standing side
    * collapses to its DISTINCT chunk-hash set before the probe join
    * (map-side combined; one 32-byte row per distinct chunk, never the
    * standing text), so re-cleaning an increment scans the standing
    * corpus once and ships only hashes. */
  def paragraphDedupIncrement(increment: DataFrame, standing: DataFrame,
                              w: Int = ParaWidth): DataFrame = {
    require(w >= 1, "chunk width must be >= 1")
    val standHashes = paraChunks(standing, w)
      .select(md5(col("chunk")).as("h")).distinct()
      .withColumn("_standing", lit(true))
    val inc = paraChunks(increment, w).withColumn("h", md5(col("chunk")))
    val winners = inc.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("c"))).as("_w"))
    val flagged = inc.join(winners, Seq("h"))
      .join(standHashes, Seq("h"), "left")
      .withColumn("keep", col("_standing").isNull &&
        struct(col("doc_id"), col("c")) === col("_w"))
    paraRebuild(increment, flagged)
  }

  def qParagraphIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    paragraphDedupIncrement(
        docs.filter(col("doc_id") % IncrementMod === 0),
        docs.filter(col("doc_id") % IncrementMod =!= 0))
      .orderBy(col("doc_id"))
  }

  /** Streaming twin of [[paragraphDedupIncrement]]: each arriving
    * micro-batch of documents is cleaned against the static standing
    * corpus via `foreachBatch` — the batch operator runs unchanged, no
    * streaming state, no watermark (the standing hash set is the state,
    * and it lives in the lake, not the stream). Same checkpoint
    * contract as [[streamingNearDup]]. */
  def streamingParagraphAdmission(streamDocs: DataFrame, standing: DataFrame,
                                  checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = streamDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(paragraphDedupIncrement(batch, standing), id)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }

  // --- winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) ---

  /** Winnowing k-gram width and window size. The paper's guarantee:
    * any token run of length ≥ t = [[WinnowW]] + [[WinnowK]] − 1 = 12
    * shared by two documents shares at least one SELECTED fingerprint
    * — local fingerprinting with a detection floor, unlike sampling
    * every w-th gram (position-shift fragile) or keeping all grams
    * (index size ∝ corpus). */
  val WinnowK = 5
  val WinnowW = 8

  /** Per-fingerprint doc-list cap for [[winnowPairs]] — the same
    * exclude-over-cap hot-bucket policy as [[MaxBandBucket]]: a
    * boilerplate fingerprint shared by a 100k-doc clique would emit
    * d²/2 pairs from one key; fingerprints selected by more than this
    * many documents are dropped from pairing (they identify
    * BOILERPLATE, not overlap — the MOSS practice of ignoring
    * ubiquitous fingerprints). */
  val WinnowPairCap = 64

  /** Minimum shared fingerprints for a [[winnowPairs]] row — one
    * coincidental selected gram is noise; two is signal. */
  val MinSharedFp = 2

  /** Selected winnowing fingerprints per document: positional k-gram
    * hashes ([[graft.expressions.ShinglePosHashes]] — the 8-byte
    * shuffle key again), then each length-w window of consecutive gram
    * positions selects its minimum by `(hash, pos)` — encoded as one
    * fixed-width sortable string (15 lowercase hex nibbles ‖ 10-digit
    * position) so the windowed `min` is a plain string aggregate both
    * engines order identically — and the distinct selected set is the
    * document's fingerprint. Short documents (< w grams) winnow their
    * single truncated window, so every document with ≥ 1 gram gets
    * ≥ 1 fingerprint. One window pass per document (bounded by doc
    * length, never corpus size) + one distinct; no joins.
    *
    * The position field is 10 digits, sized so truncation is
    * impossible rather than merely unlikely: a document would need
    * ≥ 10¹⁰ grams (≈ 40 GB of text in ONE row — beyond any real
    * document, and beyond Spark's 2 GB single-value ceiling long
    * before that) to overflow it, whereas the 6-digit field this
    * replaced silently corrupted the window-min order at a plausible
    * 10⁶ grams.
    *
    * Output: `(doc_id, fpos, fp)` — selected gram position and the
    * 15-hex-char fingerprint value. */
  def winnowFingerprints(docs: DataFrame, k: Int = WinnowK,
                         w: Int = WinnowW): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val pos = docs
      .select(col("doc_id"),
        posexplode(call_function("shingle_pos_hashes", col("text"), lit(k))))
      .toDF("doc_id", "pos", "sh")
    val ordered = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    pos
      .withColumn("_key",
        concat(lpad(lower(hex(col("sh"))), 15, "0"),
          lpad(col("pos").cast("string"), 10, "0")))
      .withColumn("_wmin",
        min(col("_key")).over(ordered.rowsBetween(0, w - 1)))
      .withColumn("_n",
        count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      // window STARTS: every s ∈ [0, n−w], or the single truncated
      // window at 0 when the document has fewer than w grams
      .filter(col("pos") <= greatest(col("_n") - w, lit(0)))
      .select(col("doc_id"),
        substring(col("_wmin"), 16, 10).cast("long").as("fpos"),
        substring(col("_wmin"), 1, 15).as("fp"))
      .distinct()
  }

  /** One memo slot per (dir) for the landed winnow print frame — see
    * [[PathMemo]] for the locking / revalidation / build-ledger rules. */
  private val winnowPrintMemo = new PathMemo

  /** The full selected-print frame `(doc_id, fpos, fp)` MATERIALIZED
    * once per (JVM, input dir) as parquet — the [[clusterLabels]]
    * schedule applied to the winnow family. Six harness entries
    * consume the selection pass, and the pair/boiler/attribution
    * shapes each reference it 2–3× (both self-join sides plus the
    * ubiquity count); cross-query AND intra-query reuse are invisible
    * to Catalyst, so without this the round-14 bench re-ran the
    * codegen'd hash + per-doc window selection ~14× per bench pass.
    * ONE memo serves every subset entry too: selection is strictly
    * per-document, so the standing / probe print frames are doc_id
    * FILTERS over the landed frame (the leakage-increment convention)
    * — materialized ≡ recomputed, pinned in TextPipelineSpec. A
    * production pipeline lands exactly this table per corpus snapshot
    * ([[writeWinnowIndex]]); this memo is that schedule inside one
    * JVM. */
  def winnowPrints(spark: SparkSession, dir: String)(
      docs: => DataFrame): DataFrame =
    winnowPrintMemo.read(spark, dir, "winnow_prints") { () =>
      val p = spillPath(spark, "winnow_prints")
      winnowFingerprints(docs).write.mode("overwrite").parquet(p)
      p
    }

  /** `(fp, doc_id)` distinct projection of a print frame — the shape
    * every pairing/ubiquity consumer below works on. */
  private def selOf(prints: DataFrame): DataFrame =
    prints.select(col("fp"), col("doc_id")).distinct()

  def qWinnowFingerprints(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    winnowPrints(spark, dir)(Tables.documents(spark, dir))
      .orderBy(col("doc_id"), col("fpos"), col("fp"))
  }

  /** Document-overlap report over the winnowed fingerprints — the MOSS
    * shape: docs sharing ≥ [[MinSharedFp]] selected fingerprints, with
    * the shared count. Pairing is an equi-join on the fingerprint
    * value ONLY — never all-pairs — and fingerprints selected by more
    * than [[WinnowPairCap]] documents are excluded before the join
    * (ubiquitous boilerplate; see the cap's scaladoc), so per-key
    * fan-out is ≤ cap²/2. The cap filter is a map-side-combined
    * groupBy count, not a per-key window — a degenerate fingerprint
    * never serializes its doc list into one task.
    *
    * The one-shot form re-evaluates the selection pass per consumer
    * (the two self-join sides and the cap count) — fine for a single
    * ad-hoc run; the harness entries and any production run that
    * touches prints more than once go through the LANDED frame
    * instead ([[winnowPrints]] in-JVM, [[writeWinnowIndex]] across
    * jobs — one parquet of (doc_id, fp) IS the winnow index). */
  def winnowPairs(docs: DataFrame, k: Int = WinnowK, w: Int = WinnowW,
                  cap: Int = WinnowPairCap): DataFrame =
    winnowPairsFrom(
      winnowFingerprints(docs, k, w).select(col("fp"), col("doc_id"))
        .distinct(),
      cap)

  /** The pairing shape over an already-landed `(fp, doc_id)` distinct
    * print frame — shared by the one-shot, memo'd and persisted-index
    * spellings (all answer-equivalent by construction). */
  private def winnowPairsFrom(sel: DataFrame, cap: Int): DataFrame = {
    val small = sel.groupBy(col("fp"))
      .agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") <= cap)
      .select(col("fp"))
    val kept = sel.join(small, Seq("fp"), "left_semi")
    kept.select(col("fp"), col("doc_id").as("doc_a"))
      .join(kept.select(col("fp"), col("doc_id").as("doc_b")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFp)
  }

  def qWinnowOverlap(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    winnowPairsFrom(
        selOf(winnowPrints(spark, dir)(Tables.documents(spark, dir))),
        WinnowPairCap)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Probe-vs-index winnowing overlap — the plagiarism/provenance
    * check for INCOMING documents: each probe doc's selected
    * fingerprints equi-join the standing corpus's, ubiquity measured
    * (and the over-cap exclusion applied) on the STANDING side only —
    * the probe batch is too small to define "ubiquitous", and a
    * standing boilerplate print must not pair however rare it looks
    * inside one crawl batch. Fingerprint selection is per-document,
    * so probing never re-fingerprints a standing doc, and per-probe
    * answers are independent of how arrivals are batched — which is
    * what makes [[streamingWinnowProbe]]'s union ≡ the one-shot batch
    * (spec-pinned, the leakage-increment convention). */
  def winnowProbePairs(probe: DataFrame, standing: DataFrame,
                       k: Int = WinnowK, w: Int = WinnowW,
                       cap: Int = WinnowPairCap): DataFrame =
    winnowProbeFrom(
      winnowFingerprints(probe, k, w).select(col("fp"), col("doc_id"))
        .distinct(),
      winnowFingerprints(standing, k, w).select(col("fp"), col("doc_id"))
        .distinct(),
      cap)

  /** Probe-vs-standing pairing over landed `(fp, doc_id)` distinct
    * print frames — the shared core of [[winnowProbePairs]],
    * [[winnowProbeIndex]] and the memo'd harness entries. Ubiquity is
    * measured (and the cap applied) on the STANDING side only, per
    * the [[winnowProbePairs]] contract. */
  private def winnowProbeFrom(pSel: DataFrame, sSel: DataFrame,
                              cap: Int): DataFrame = {
    val sSmall = sSel.groupBy(col("fp"))
      .agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") <= cap)
      .select(col("fp"))
    val sKept = sSel.join(sSmall, Seq("fp"), "left_semi")
    pSel.select(col("fp"), col("doc_id").as("probe_id"))
      .join(sKept.select(col("fp"), col("doc_id").as("index_id")), Seq("fp"))
      .groupBy(col("probe_id"), col("index_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFp)
  }

  /** Probe / standing `(fp, doc_id)` sels for the mod-10 increment
    * split, both FILTERS over the one landed print frame — selection
    * is per-document, so subset prints are subset filters (the
    * property TextPipelineSpec pins). */
  private def incrementSels(spark: SparkSession,
                            dir: String): (DataFrame, DataFrame) = {
    val prints = winnowPrints(spark, dir)(Tables.documents(spark, dir))
    (selOf(prints.filter(col("doc_id") % IncrementMod === 0)),
      selOf(prints.filter(col("doc_id") % IncrementMod =!= 0)))
  }

  def qWinnowProbe(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val (pSel, sSel) = incrementSels(spark, dir)
    winnowProbeFrom(pSel, sSel, WinnowPairCap)
      .orderBy(col("probe_id"), col("index_id"))
  }

  /** Land the standing corpus's winnow index: ONE parquet of
    * `(doc_id, fp)` under `prints/` — fingerprint selection is
    * per-document, so the landed rows ARE
    * `winnowFingerprints(standing)` and every future probe skips
    * re-fingerprinting the standing side entirely (the
    * `writeDedupIndex` lifecycle, minus the band/set split this
    * simpler index doesn't need). A rebuild clears standing tombstones
    * (the band-index contract: the new corpus is the post-takedown
    * truth). */
  def writeWinnowIndex(standing: DataFrame, path: String,
                       k: Int = WinnowK, w: Int = WinnowW): Unit = {
    val spark = standing.sparkSession
    val delDir = new org.apache.hadoop.fs.Path(s"$path/deletes")
    val fs = delDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(delDir)) { fs.delete(delDir, true); () }
    winnowFingerprints(standing, k, w)
      .select(col("fp"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$path/prints")
    ()
  }

  /** Append an increment to a standing winnow index: fingerprints are
    * computed ONLY for `newDocs` and land mode(append) into `prints/`
    * — the band-index convention (the probe reader's `distinct()`
    * makes a replayed append answer-invariant, and a replayed append
    * of DELETED docs stays masked by the standing tombstones;
    * spec-pinned). */
  def appendWinnowIndex(spark: SparkSession, path: String,
                        newDocs: DataFrame,
                        k: Int = WinnowK, w: Int = WinnowW): Unit = {
    winnowFingerprints(newDocs, k, w)
      .select(col("fp"), col("doc_id"))
      .write.mode("append").parquet(s"$path/prints")
    ()
  }

  /** Land a TOMBSTONE batch against a standing winnow index — the
    * delete half attribution/takedown pipelines need most (a removed
    * document must stop matching incoming probes IMMEDIATELY, not at
    * the next rebuild): doc ids land identity-addressed under
    * `deletes/batch=<tag>/` (replay-idempotent), [[winnowProbeIndex]]
    * masks them with an anti-join BEFORE the hot-fp cap is computed —
    * so a pre-rebuild probe equals a fresh build over the survivors
    * EXACTLY (removing a doc can legitimately bring a hot fp back
    * under the cap and surface new pairs for other docs; contrast the
    * dedup index's documented pre-compact cap conservatism, which this
    * layout avoids because prints are per-doc rows, not pre-banded
    * buckets) — and the next [[writeWinnowIndex]] rebuild applies +
    * clears them. */
  def deleteWinnowIndex(spark: SparkSession, path: String,
                        docIds: DataFrame): Unit = {
    val ids = docIds.select(col("doc_id")).distinct()
    landIdentityBatch(ids, s"$path/deletes", identityBatchTag(ids, "doc_id"))
  }

  /** Probe a landed winnow index: identical semantics to
    * [[winnowProbePairs]] over the SURVIVING standing docs
    * (persistence is answer-invariant by construction — spec-pinned);
    * only the probe side fingerprints. */
  def winnowProbeIndex(spark: SparkSession, path: String, probe: DataFrame,
                       k: Int = WinnowK, w: Int = WinnowW,
                       cap: Int = WinnowPairCap): DataFrame =
    winnowProbeFrom(
      winnowFingerprints(probe, k, w).select(col("fp"), col("doc_id"))
        .distinct(),
      // tombstone mask BEFORE distinct and before winnowProbeFrom's
      // cap count — survivor-exact (see deleteWinnowIndex)
      spark.read.parquet(s"$path/prints")
        .select(col("fp"), col("doc_id"))
        .join(deletesIn(spark, path), Seq("doc_id"), "left_anti")
        .distinct(),
      cap)

  /** Harness entry: land the standing 90%'s winnow index, probe with
    * the 10% increment — pinned to `q_winnow_probe`'s oracle (the
    * standing population is identical, so persistence must be
    * answer-invariant). */
  def qWinnowPersisted(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val path = spillPath(spark, "winnow_index")
    // the landed standing index is written FROM the memo'd print
    // frame (a doc_id filter — selection is per-document), so this
    // entry prices the write + probe, not a re-fingerprinting
    val prints = winnowPrints(spark, dir)(Tables.documents(spark, dir))
    prints.filter(col("doc_id") % IncrementMod =!= 0)
      .select(col("fp"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$path/prints")
    winnowProbeFrom(
        selOf(prints.filter(col("doc_id") % IncrementMod === 0)),
        spark.read.parquet(s"$path/prints")
          .select(col("fp"), col("doc_id")).distinct(),
        WinnowPairCap)
      .orderBy(col("probe_id"), col("index_id"))
  }

  /** The takedown slice of [[qWinnowDeleted]] — intersects 2 of the
    * persisted entry's 6 sf0.01 answer rows (index ids 393 and 92),
    * so the mask is exercised, not vacuous (probed in DuckDB before
    * wiring, the round-19 discipline). */
  val WinnowDeleteMod = 7
  val WinnowDeleteRem = 1

  /** Harness entry: build(odd standing) + append(even) + DELETE the
    * takedown slice + probe — the winnow-index delete lifecycle; the
    * oracle re-derives the probe overlap with the deleted docs
    * excluded from the standing side (survivor-exact: the mask lands
    * before the hot-fp cap). */
  def qWinnowDeleted(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val path = spillPath(spark, "winnow_index_deleted")
    val standing = docs.filter(col("doc_id") % IncrementMod =!= 0)
    writeWinnowIndex(standing.filter(col("doc_id") % 2 === 1), path)
    appendWinnowIndex(spark, path, standing.filter(col("doc_id") % 2 === 0))
    deleteWinnowIndex(spark, path,
      standing.filter(col("doc_id") % WinnowDeleteMod === WinnowDeleteRem)
        .select(col("doc_id")))
    winnowProbeIndex(spark, path,
        docs.filter(col("doc_id") % IncrementMod === 0))
      .orderBy(col("probe_id"), col("index_id"))
  }

  /** Streaming twin of [[winnowProbePairs]]: `foreachBatch` against
    * the static standing corpus — per-probe independence makes the
    * streamed union equal the one-shot batch exactly. Same checkpoint
    * contract as [[streamingNearDup]]. */
  def streamingWinnowProbe(streamDocs: DataFrame, standing: DataFrame,
                           checkpoint: Option[String] = None)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = streamDocs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(winnowProbePairs(batch, standing), id)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }

  /** Per-document boilerplate share from the winnowed prints: the
    * fraction of a doc's selected fingerprints that are UBIQUITOUS
    * (selected by more than `cap` docs corpus-wide) — the per-document
    * readout of the mass [[winnowPairs]]' cap excludes, in the
    * [[lshBucketAudit]] never-drop-silently tradition, and a template/
    * mirror-site detector in its own right (a doc that is MOSTLY
    * ubiquitous prints is boilerplate wearing a wrapper). One
    * fingerprint pass, one map-side-combined count, one equi-join
    * back, one doc-keyed aggregate. */
  def winnowBoilerplateShare(docs: DataFrame, k: Int = WinnowK,
                             w: Int = WinnowW,
                             cap: Int = WinnowPairCap): DataFrame =
    winnowBoilerFrom(
      winnowFingerprints(docs, k, w).select(col("fp"), col("doc_id"))
        .distinct(),
      cap)

  /** The boilerplate-share shape over a landed `(fp, doc_id)` distinct
    * print frame. */
  private def winnowBoilerFrom(sel: DataFrame, cap: Int): DataFrame = {
    val counts = sel.groupBy(col("fp")).agg(count(lit(1)).as("_nd"))
    sel.join(counts, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_prints"),
        sum(when(col("_nd") > cap, 1L).otherwise(0L)).as("n_ubiquitous"))
      .select(col("doc_id"), col("n_prints"), col("n_ubiquitous"),
        (col("n_ubiquitous").cast("double") / col("n_prints"))
          .as("boiler_share"))
  }

  /** Cap for the harness boilerplate-share entry: 4, not
    * [[WinnowPairCap]] — at fixture scale no print reaches 64 docs, so
    * the production cap would make the accounting trivially zero (the
    * `q_lsh_bucket_audit` precedent). */
  val BoilerShareCap = 4

  def qWinnowBoiler(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    winnowBoilerFrom(
        selOf(winnowPrints(spark, dir)(Tables.documents(spark, dir))),
        BoilerShareCap)
      .orderBy(col("doc_id"))
  }

  /** Provenance ATTRIBUTION over the winnow probe — the similarity
    * twin of [[graft.operators.CorpusFilters.contaminationReport]]'s
    * exact-shingle trail: each probe document's single best-matching
    * standing document (most shared prints; ties to the lowest
    * index id), with the probe-side coverage fraction
    * `n_shared / n_prints` — "this incoming doc is X% fingerprint-
    * covered by THAT standing doc", the row a crawl-provenance audit
    * publishes. The argmax window partitions on probe_id over that
    * probe's match list (bounded by cap-gated fingerprint fan-out),
    * never a corpus partition; probe docs with no match emit
    * nothing. */
  def winnowAttribution(probe: DataFrame, standing: DataFrame,
                        k: Int = WinnowK, w: Int = WinnowW,
                        cap: Int = WinnowPairCap): DataFrame =
    winnowAttributionFrom(
      winnowFingerprints(probe, k, w).select(col("fp"), col("doc_id"))
        .distinct(),
      winnowFingerprints(standing, k, w).select(col("fp"), col("doc_id"))
        .distinct(),
      cap)

  /** The attribution shape over landed `(fp, doc_id)` distinct print
    * frames (probe, standing). */
  private def winnowAttributionFrom(pSel: DataFrame, sSel: DataFrame,
                                    cap: Int): DataFrame = {
    val nPrints = pSel.select(col("doc_id").as("probe_id"), col("fp"))
      .groupBy(col("probe_id")).agg(count(lit(1)).as("n_prints"))
    winnowProbeFrom(pSel, sSel, cap)
      .withColumn("_rk", row_number().over(Window
        .partitionBy(col("probe_id"))
        .orderBy(col("n_shared").desc, col("index_id"))))
      .filter(col("_rk") === 1)
      .join(nPrints, Seq("probe_id"))
      .select(col("probe_id"), col("index_id"), col("n_shared"),
        col("n_prints"),
        (col("n_shared").cast("double") / col("n_prints")).as("coverage"))
  }

  def qWinnowAttribution(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    val (pSel, sSel) = incrementSels(spark, dir)
    winnowAttributionFrom(pSel, sSel, WinnowPairCap)
      .orderBy(col("probe_id"))
  }

  // --- wide (60-bit) simhash banding: the scale path ---

  /** 4 bands × 15 bits over the 60-bit fingerprint: 32768 signature
    * values per band. */
  val Simhash60Bands = 4
  val Simhash60BandBits = 15

  /** Built-in REFERENCE spelling of the 60-bit simhash over a
    * long-hash array (60 interpreted lambdas — parity/test only; the
    * hot path is the native [[graft.expressions.SimHash60]]). */
  def simhash60FromHashes(hs: Column): Column = {
    val bitSums = (0 until 60).map { j =>
      aggregate(hs, lit(0), (acc, h) =>
        acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
    }
    bitSums.zipWithIndex.map { case (s, j) =>
      when(s > 0, 1L << j).otherwise(0L)
    }.reduce(_ + _).cast("long")
  }

  /** Hamming near-dup pairs over the WIDE fingerprint — the same
    * band-equi-join + popcount-verify mechanics as [[simhashPairs]],
    * but with 32768 buckets per band instead of 16, so the candidate
    * volume scales with true near-duplicates rather than N²/16: this
    * is the production swap the 16-bit entry's scaladoc promises.
    * Pigeonhole recall is exactly 1.0 for maxDist ≤ bands−1, as
    * before. */
  def simhashPairs60(docs: DataFrame, maxDist: Int = SimhashMaxDist): DataFrame = {
    require(maxDist < Simhash60Bands,
      s"maxDist=$maxDist breaks the pigeonhole recall guarantee: with " +
        s"$Simhash60Bands bands candidate recall is exact only for " +
        s"maxDist <= ${Simhash60Bands - 1}")
    val sims = docs.select(col("doc_id"),
      call_function("simhash60", col("text")).as("sim"))
    // production path: full two-layer hot-bucket guard — fingerprint
    // collapse plus the real [[MaxBandBucket]] cap (32768 sigs per
    // band keeps honest buckets tiny; anything above the cap is a
    // degenerate near-constant-content family)
    hammingBandedPairs(sims, Simhash60Bands, Simhash60BandBits, maxDist,
      cap = MaxBandBucket)
  }

  /** THE canonical pair path (`q_simhash_pairs`): wide fingerprint,
    * bucket counts that grow with the data. The 16-bit parity/teaching
    * variant lives at [[qSimhashPairs16]]. */
  def qSimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    simhashPairs60(Tables.documents(spark, dir))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --- n-gram Jaccard within a grouping key ---

  /** Default per-group comparison cap for [[ngramJaccardPairs]] — far
    * above any bench group, so the sf-scale oracle is exhaustive; at
    * 100 TB a skewed group (one `source` holding millions of docs) hits
    * the cap instead of going quadratic. */
  val NgramMaxGroupSize = 10000

  /** Result of [[ngramJaccardPairs]]: the pair frame plus the drop
    * counter for its group cap. `droppedDocs` is a Spark accumulator —
    * executor-side drops aggregate on a real cluster, but because it is
    * updated inside a TRANSFORMATION (`flatMapGroups`), Spark's
    * exactly-once accumulator guarantee does not apply: task retries and
    * speculative execution can over-count. It is an observability signal
    * ("this group was truncated"), not an exact ledger. Read it only
    * AFTER an action on `pairs`. */
  final case class NgramJaccardResult(
      pairs: DataFrame,
      droppedDocs: org.apache.spark.util.LongAccumulator)

  /** Exact pairwise 2-gram Jaccard, but only for pairs sharing `source` —
    * the within-group (blocking) comparison pattern: group count scales
    * out, quadratic cost is bounded by group size.
    *
    * Pairing runs inside `flatMapGroups` rather than a self-join: a join
    * materializes |group|² rows each carrying BOTH hash arrays (~GBs of
    * unsafe-row copies at bench scale) before the filter can drop them;
    * per-group in-memory pairing touches each array once and emits only
    * survivors. This is the documented "genuine per-partition imperative
    * logic" exception — the group is the unit of work and is bounded by
    * `maxGroupSize`: a skewed group keeps its `maxGroupSize` smallest
    * doc ids (deterministic — a sample would make reruns disagree) and
    * the rest are counted in the returned
    * [[NgramJaccardResult.droppedDocs]] accumulator (per-call, so
    * concurrent invocations don't clobber each other) and logged LOUDLY
    * from the task. Silent truncation would read as "no near-dups in the
    * big group"; the counter makes the coverage gap observable. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
                        maxGroupSize: Int = NgramMaxGroupSize): NgramJaccardResult = {
    import docs.sparkSession.implicits._
    require(maxGroupSize > 1, s"maxGroupSize must exceed 1, got $maxGroupSize")
    val dropped = docs.sparkSession.sparkContext
      .longAccumulator("ngram_jaccard_dropped_docs")
    val hs = hashedShingles(docs, 2)
      .select(col("source"), col("doc_id"), col("hs"))
      .as[(String, Long, Array[Int])]
    val pairs = hs.groupByKey(_._1)
      .flatMapGroups { (source, rows) =>
        val all = rows.map { case (_, id, h) => (id, h) }.toArray.sortBy(_._1)
        val ds = if (all.length <= maxGroupSize) all else {
          val over = all.length - maxGroupSize
          dropped.add(over)
          System.err.println(
            s"[ngramJaccardPairs] group '$source' exceeds maxGroupSize " +
              s"($maxGroupSize): dropping $over of ${all.length} docs from " +
              "pairwise comparison")
          all.take(maxGroupSize)
        }
        for {
          i <- ds.indices.iterator
          j <- (i + 1) until ds.length
          inter = sortedIntersectCount(ds(i)._2, ds(j)._2)
          union = (ds(i)._2.length + ds(j)._2.length).toDouble - inter
          jac = if (union == 0) 0.0 else inter / union
          if jac >= threshold
        } yield (source, ds(i)._1, ds(j)._1, jac)
      }
      .toDF("source", "doc_a", "doc_b", "jaccard")
    NgramJaccardResult(pairs, dropped)
  }

  /** JVM twin of [[graft.expressions.SortedIntersectSize]] for the
    * in-group path. */
  def sortedIntersectCount(a: Array[Int], b: Array[Int]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    c
  }

  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.GraftFunctions.register(spark)
    ngramJaccardPairs(Tables.documents(spark, dir), 0.7)
      .pairs.orderBy(col("source"), col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------------
  // Exact set-similarity join (prefix filtering)
  // ---------------------------------------------------------------------

  val SetSimThreshold = 0.8

  /** EXACT set-similarity join via prefix filtering (the
    * AllPairs/PPJoin family) — the third candidate paradigm next to
    * minhash-LSH and simhash banding, and the only one with NO recall
    * loss: J(A,B) ≥ t implies |A∩B| ≥ ⌈t·|A|⌉ (because
    * |A|+|B|−I ≥ |A|), so a pair sharing no element among each side's
    * first |X| − ⌈t·|X|⌉ + 1 elements — under one global element
    * order — cannot qualify. Candidates therefore come from an
    * equi-join on PREFIX elements only, and the exact verify leaves
    * precisely the brute-force thresholded pairs. The oracle exploits
    * that: it computes ground truth by brute force, so equality IS the
    * exactness proof.
    *
    * The sets are hashed 3-shingle sets (same base sets as the minhash
    * verify — unigram sets over this corpus's small shared vocabulary
    * are non-discriminative: at t = 0.5, 74% of ALL sf0.01 pairs
    * qualify, a workload no filter can prune). The verify intersect is
    * the codegen'd [[graft.expressions.SortedIntersectSize]] — the
    * hashed sets arrive sorted by construction.
    *
    * Scale shape: the global order is (set-frequency ASC, hash) —
    * prefixes deliberately hold each doc's RAREST shingles, so the
    * candidate join's per-key fan-out is bounded by rare-shingle
    * frequencies (the algorithm's own skew defense; a frequency-blind
    * order would funnel every doc through its boilerplate). One df
    * aggregate, one per-doc rank window, one prefix equi-join, one
    * verify join — all keyed; nothing all-pairs. */
  def setSimilarityJoin(docs: DataFrame,
                        t: Double = SetSimThreshold): DataFrame = {
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    val sets = docs
      .select(col("doc_id"),
        call_function("hashed_shingle_set", col("text"), lit(ShingleN))
          .as("hs"))
      .withColumn("sz", size(col("hs")).cast("long"))
      .where(col("sz") > 0L)
    val elems = sets.select(col("doc_id"), col("sz"),
      explode(col("hs")).as("h"))
    val dfreq = elems.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    val prefixes = elems
      .join(dfreq, "h")
      .withColumn("rk", row_number().over(byRarity))
      .where(col("rk") <= col("sz") - ceil(lit(t) * col("sz")) + lit(1L))
      .select(col("doc_id"), col("h"))
    val cand = prefixes.select(col("doc_id").as("doc_a"), col("h"))
      .join(prefixes.select(col("doc_id").as("doc_b"), col("h")), "h")
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("doc_a"),
        col("hs").as("ha"), col("sz").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"),
        col("hs").as("hb"), col("sz").as("sb")), "doc_b")
      .withColumn("inter",
        call_function("sorted_intersect_size", col("ha"), col("hb"))
          .cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sa") + col("sb") - col("inter")).cast("double"))
      .where(col("jaccard") >= t)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }

  def qSetSimJoin(spark: SparkSession, dir: String): DataFrame =
    setSimilarityJoin(Tables.documents(spark, dir))
      .orderBy(col("doc_a"), col("doc_b"))

  /** EXACT containment join via asymmetric prefix filtering — the
    * honest fix [[containmentPairs]]' scaladoc promised: the banded
    * form inherits minhash-LSH's ~0.5 JACCARD operating point, so a
    * short document quoted inside a long one (containment 1.0, Jaccard
    * → 0 as the length ratio grows) never collides in a band and is
    * structurally invisible to it. Zero recall loss here instead:
    * C(A,B) = |A∩B| / min(|A|,|B|) ≥ t implies |A∩B| ≥ ⌈t·m⌉ for the
    * SMALLER set's size m, so by pigeonhole the pair must share an
    * element among the smaller set's first m − ⌈t·m⌉ + 1 elements
    * under any one global order — its containment PREFIX. The larger
    * side has no such prefix (the witness can sit anywhere in it), so
    * candidates come from prefix(X) ⋈ ALL-elements(Y): each doc emits
    * its own prefix (not knowing per pair whether it is the smaller
    * side costs only extra candidates, never recall — the smaller
    * side's prefix hits the larger's full posting list). The exact
    * verify then leaves precisely the brute-force thresholded pairs,
    * and the oracle computes ground truth by brute force, so equality
    * IS the exactness proof.
    *
    * Scale shape: the full-elements side is a plain inverted index
    * (linear in corpus tokens), and every candidate key is a PREFIX
    * element — the (set-frequency ASC, hash) order makes those each
    * doc's RAREST shingles, so per-key fan-out is bounded by
    * rare-shingle document frequencies, the same skew defense as
    * [[setSimilarityJoin]]. At t = 0.9 a prefix is ~10% of each set.
    * One frequency aggregate, one rank window, one prefix×postings
    * equi-join, one verify join — nothing all-pairs. */
  def containmentJoin(docs: DataFrame,
                      t: Double = ContainmentThreshold): DataFrame = {
    graft.expressions.GraftFunctions.register(docs.sparkSession)
    val sets = docs
      .select(col("doc_id"),
        call_function("hashed_shingle_set", col("text"), lit(ShingleN))
          .as("hs"))
      .withColumn("sz", size(col("hs")).cast("long"))
      .where(col("sz") > 0L)
    val elems = sets.select(col("doc_id"), col("sz"),
      explode(col("hs")).as("h"))
    val dfreq = elems.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    val prefixes = elems
      .join(dfreq, "h")
      .withColumn("rk", row_number().over(byRarity))
      .where(col("rk") <= col("sz") - ceil(lit(t) * col("sz")) + lit(1L))
      .select(col("doc_id"), col("h"))
    val cand = prefixes.select(col("doc_id").as("doc_p"), col("h"))
      .join(elems.select(col("doc_id").as("doc_o"), col("h")), "h")
      .where(col("doc_p") =!= col("doc_o"))
      .select(least(col("doc_p"), col("doc_o")).as("doc_a"),
        greatest(col("doc_p"), col("doc_o")).as("doc_b"))
      .distinct()
    cand
      .join(sets.select(col("doc_id").as("doc_a"),
        col("hs").as("ha"), col("sz").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"),
        col("hs").as("hb"), col("sz").as("sb")), "doc_b")
      .withColumn("inter",
        call_function("sorted_intersect_size", col("ha"), col("hb"))
          .cast("long"))
      .withColumn("containment", col("inter").cast("double") /
        least(col("sa"), col("sb")).cast("double"))
      .where(col("containment") >= t)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("containment"))
  }

  def qContainmentJoin(spark: SparkSession, dir: String): DataFrame =
    containmentJoin(Tables.documents(spark, dir))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Incremental (probe vs index) form of [[containmentJoin]] — the
    * nightly-increment shape every dedup paradigm here ships. The
    * asymmetry doubles: a probe doc can be the SMALLER side (its
    * prefix must hit the index's full postings) or the LARGER side (an
    * index doc's prefix must hit the probe's full postings), so
    * candidates are the UNION of prefix(probe)×all(index) and
    * prefix(index)×all(probe) — still zero recall loss, still keyed by
    * prefix (rare) elements. Element frequencies come from the union
    * (the one-global-order requirement, the
    * [[setSimilarityIncremental]] argument); the index-side prefix and
    * postings tables are stable modulo that order and should be
    * pre-materialized by the caller at scale. */
  def containmentIncremental(probe: DataFrame, index: DataFrame,
                             t: Double = ContainmentThreshold): DataFrame = {
    graft.expressions.GraftFunctions.register(probe.sparkSession)
    def sets(df: DataFrame) = df
      .select(col("doc_id"),
        call_function("hashed_shingle_set", col("text"), lit(ShingleN))
          .as("hs"))
      .withColumn("sz", size(col("hs")).cast("long"))
      .where(col("sz") > 0L)
    val ps = sets(probe)
    val is = sets(index)
    def elems(s: DataFrame) = s.select(col("doc_id"), col("sz"),
      explode(col("hs")).as("h"))
    val dfreq = elems(ps).select(col("h"))
      .unionAll(elems(is).select(col("h")))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    def prefixes(s: DataFrame) = {
      val byRarity = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
      elems(s)
        .join(dfreq, "h")
        .withColumn("rk", row_number().over(byRarity))
        .where(col("rk") <= col("sz") - ceil(lit(t) * col("sz")) + lit(1L))
        .select(col("doc_id"), col("h"))
    }
    val cand = prefixes(ps).select(col("doc_id").as("probe_id"), col("h"))
      .join(elems(is).select(col("doc_id").as("index_id"), col("h")), "h")
      .select(col("probe_id"), col("index_id"))
      .unionAll(
        prefixes(is).select(col("doc_id").as("index_id"), col("h"))
          .join(elems(ps).select(col("doc_id").as("probe_id"), col("h")), "h")
          .select(col("probe_id"), col("index_id")))
      .distinct()
    cand
      .join(ps.select(col("doc_id").as("probe_id"),
        col("hs").as("ha"), col("sz").as("sa")), "probe_id")
      .join(is.select(col("doc_id").as("index_id"),
        col("hs").as("hb"), col("sz").as("sb")), "index_id")
      .withColumn("inter",
        call_function("sorted_intersect_size", col("ha"), col("hb"))
          .cast("long"))
      .withColumn("containment", col("inter").cast("double") /
        least(col("sa"), col("sb")).cast("double"))
      .where(col("containment") >= t)
      .select(col("probe_id"), col("index_id"), col("inter"),
        col("containment"))
  }

  /** Probe = every 5th doc, index = the rest — the
    * [[qSetSimIncremental]] split. */
  def qContainmentIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    containmentIncremental(
      docs.filter(col("doc_id") % 5 === 0),
      docs.filter(col("doc_id") % 5 =!= 0))
      .orderBy(col("probe_id"), col("index_id"))
  }

  /** Incremental (probe vs index) form of [[setSimilarityJoin]] — the
    * same zero-recall-loss prefix filter, but candidates pair a PROBE
    * batch's prefixes against a standing INDEX's prefixes: the
    * nightly-increment shape every dedup paradigm here ships
    * ([[minhashIncremental]], [[Similarity.embedCrossPairs]]). Element
    * frequencies come from the UNION (the theorem needs one global
    * order over both sides — index-only frequencies would order probe
    * prefixes inconsistently and could lose pairs). The index-side
    * prefix table is stable modulo that order and should be
    * pre-materialized by the caller at scale. */
  def setSimilarityIncremental(probe: DataFrame, index: DataFrame,
                               t: Double = SetSimThreshold): DataFrame = {
    graft.expressions.GraftFunctions.register(probe.sparkSession)
    def sets(df: DataFrame) = df
      .select(col("doc_id"),
        call_function("hashed_shingle_set", col("text"), lit(ShingleN))
          .as("hs"))
      .withColumn("sz", size(col("hs")).cast("long"))
      .where(col("sz") > 0L)
    val ps = sets(probe)
    val is = sets(index)
    val dfreq = ps.select(explode(col("hs")).as("h"))
      .unionAll(is.select(explode(col("hs")).as("h")))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    def prefixes(s: DataFrame) = {
      val byRarity = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
      s.select(col("doc_id"), col("sz"), explode(col("hs")).as("h"))
        .join(dfreq, "h")
        .withColumn("rk", row_number().over(byRarity))
        .where(col("rk") <= col("sz") - ceil(lit(t) * col("sz")) + lit(1L))
        .select(col("doc_id"), col("h"))
    }
    val cand = prefixes(ps).select(col("doc_id").as("probe_id"), col("h"))
      .join(prefixes(is).select(col("doc_id").as("index_id"), col("h")), "h")
      .select(col("probe_id"), col("index_id"))
      .distinct()
    cand
      .join(ps.select(col("doc_id").as("probe_id"),
        col("hs").as("ha"), col("sz").as("sa")), "probe_id")
      .join(is.select(col("doc_id").as("index_id"),
        col("hs").as("hb"), col("sz").as("sb")), "index_id")
      .withColumn("inter",
        call_function("sorted_intersect_size", col("ha"), col("hb"))
          .cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sa") + col("sb") - col("inter")).cast("double"))
      .where(col("jaccard") >= t)
      .select(col("probe_id"), col("index_id"), col("inter"), col("jaccard"))
  }

  /** Probe = every 5th doc (a deterministic increment), index = the
    * rest — the same split recipe as `q_dedup_incremental`. */
  def qSetSimIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    setSimilarityIncremental(
      docs.filter(col("doc_id") % 5 === 0),
      docs.filter(col("doc_id") % 5 =!= 0))
      .orderBy(col("probe_id"), col("index_id"))
  }
}
