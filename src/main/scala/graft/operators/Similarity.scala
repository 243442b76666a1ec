package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.tables.Tables

/** Similarity search over the `embeddings` table (`Array[Float]`
  * vectors).
  *
  * Two paths, same contract:
  *  - '''brute-force top-k''' ([[topK]]): the exact baseline. The query
  *    side is tiny and broadcast; the corpus streams past it in one
  *    narrow pass (cosine is a native codegen'd expression, no UDF,
  *    no interpreted lambdas), then a per-query window takes k. Cost is
  *    O(|Q|·N) — correct at any scale where |Q| is bounded.
  *  - '''sign-LSH bucketed''' ([[annTopK]]): the approximate scale path.
  *    Every vector gets an 8-bit bucket from the signs of its first 8
  *    dimensions (a fixed random-hyperplane sketch with axis-aligned
  *    planes — deterministic, engine-portable); candidates are only the
  *    query's own bucket, turning the scan into an equi-join that
  *    partitions/prunes like any key join. Recall is traded for a ~256×
  *    candidate cut; a production variant would multi-probe neighboring
  *    buckets and use more planes.
  *
  * Float math parity: cosine is accumulated index-ascending in double
  * precision starting from 0.0, the exact op sequence the DuckDB
  * oracle's `list_reduce(list_transform(...))` performs — results are
  * bitwise equal, no rounding slop needed. The accumulation runs in the
  * native [[graft.expressions.CosineSim]] expression (codegen'd, one
  * array pass) rather than the interpreted `aggregate(zip_with(...))`
  * spelling; ExpressionsSpec proves the two bit-identical.
  */
object Similarity {

  /** Native cosine — see [[graft.expressions.CosineSim]]. Callers outside
    * a GraftExtensions session must register via [[ensureRegistered]]. */
  private def cos(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  private def ensureRegistered(spark: SparkSession): Unit =
    graft.expressions.GraftFunctions.register(spark)

  /** Deterministic query subset: every 100th vector. */
  def queryVectors(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))

  def topK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cos(col("q"), col("embedding")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("rk").cast("long").as("rk"),
        col("cosine"))
  }

  def qSimilarTopK(spark: SparkSession, dir: String): DataFrame = {
    ensureRegistered(spark)
    val emb = Tables.embeddings(spark, dir)
    topK(emb, queryVectors(emb), k = 5).orderBy(col("query_id"), col("rk"))
  }

  /** 8-bit sign bucket of a vector's first 8 dimensions. */
  def signBucket(v: Column): Column =
    (0 until 8).map { j =>
      when(element_at(v, j + 1) > 0f, 1 << j).otherwise(0)
    }.reduce(_ + _)

  def annTopK(emb: DataFrame, k: Int): DataFrame = {
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding")).as("bucket"))
    val queries = bucketed.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("bucket"))
    val scored = bucketed.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cos(col("q"), col("embedding")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("rk").cast("long").as("rk"),
        col("cosine"))
  }

  def qSimilarAnn(spark: SparkSession, dir: String): DataFrame = {
    ensureRegistered(spark)
    annTopK(Tables.embeddings(spark, dir), k = 3)
      .orderBy(col("query_id"), col("rk"))
  }

  /** IVF (inverted-file) coarse quantizer: a fixed, deterministic set of
    * centroid vectors (every `N/K`-th row — a production system would
    * k-means these; the partition/probe mechanics are identical), each
    * vector assigned to its nearest centroid by cosine, queries probing
    * only their own cell. Complements the sign-LSH path: LSH buckets by
    * random-ish hyperplanes, IVF by data-located centroids. nprobe=1
    * here; more probes = join on an array of nearest cells. */
  val IvfCentroidEvery = 137

  /** Every vector's centroids ranked by cosine (rank 1 = its cell;
    * ranks ≤ nprobe = the cells a query probes). One broadcast of the
    * bounded centroid set, one narrow pass over the corpus. */
  def ivfAssignments(emb: DataFrame): DataFrame = {
    val centroids = emb.filter(col("vec_id") % IvfCentroidEvery === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist").desc, col("centroid_id"))
    emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        cos(col("embedding"), col("c")).as("dist"))
      .withColumn("crk", row_number().over(w))
  }

  def ivfCells(emb: DataFrame): DataFrame =
    ivfAssignments(emb)
      .filter(col("crk") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id").as("cell"))

  def ivfTopK(emb: DataFrame, k: Int): DataFrame = {
    val cells = ivfCells(emb)
    val queries = cells.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cells.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cos(col("q"), col("embedding")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("rk").cast("long").as("rk"),
        col("cosine"))
  }

  def qSimilarIvf(spark: SparkSession, dir: String): DataFrame = {
    ensureRegistered(spark)
    ivfTopK(Tables.embeddings(spark, dir), k = 3)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Multi-probe IVF: each query probes its `nprobe` nearest cells, the
    * recall lever nprobe=1 lacks (a query near a cell boundary misses
    * neighbors across it). Candidates stay an equi-join on cell — the
    * query side just carries nprobe rows per query; cells partition the
    * corpus, so no candidate is scored twice. */
  def ivfTopKProbed(emb: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val asg = ivfAssignments(emb)
    val cells = asg.filter(col("crk") === 1)
      .select(col("vec_id"), col("embedding"), col("centroid_id").as("cell"))
    val queries = asg
      .filter(col("vec_id") % 100 === 0 && col("crk") <= nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        col("centroid_id").as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cells.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cos(col("q"), col("embedding")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("rk").cast("long").as("rk"),
        col("cosine"))
  }

  def qSimilarIvf2(spark: SparkSession, dir: String): DataFrame = {
    ensureRegistered(spark)
    ivfTopKProbed(Tables.embeddings(spark, dir), k = 3, nprobe = 2)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs: same sign-bucket equi-join
    * (never all-pairs), cosine above a high threshold. The bucket join
    * is the blocking step — identical/near-identical vectors share all
    * leading signs, so recall at high thresholds is near-total while the
    * candidate set shrinks ~2^planes-fold. */
  def embedNearDup(emb: DataFrame, threshold: Double): DataFrame = {
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding")).as("bucket"))
    val a = bucketed.select(col("bucket"), col("vec_id").as("vec_a"),
      col("embedding").as("ea"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"))
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cos(col("ea"), col("eb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Query entry runs at 0.4: the synthetic embeddings carry no true
    * near-dups (max pairwise cosine ≈ 0.51 at sf0.01), so a production
    * threshold (≥0.9) would verify only the empty set; 0.4 exercises the
    * full bucket-join + cosine + filter path with real output. */
  def qEmbedNearDup(spark: SparkSession, dir: String): DataFrame = {
    ensureRegistered(spark)
    embedNearDup(Tables.embeddings(spark, dir), 0.4)
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
