package graft

import org.apache.spark.sql.functions._

/** The pure-SQL user surface: a user who works in `spark.sql` (not the
  * Column API) gets the whole engine — the session extensions inject
  * every native expression, and the parquet tables register as views.
  * These tests run representative pipelines END TO END in SQL text and
  * pin them against the Column-API operators, proving the two surfaces
  * are the same engine rather than parallel implementations. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private def registerViews(): Unit = {
    graft.tables.Tables.documents(spark, sfSmoke).createOrReplaceTempView("documents")
    graft.tables.Tables.embeddings(spark, sfSmoke).createOrReplaceTempView("embeddings")
  }

  test("SQL-only minhash near-dup pipeline equals the Column-API operator") {
    registerViews()
    import graft.operators.TextDedup.{Bands, JaccardThreshold, RowsPerBand, ShingleN}
    val sql = spark.sql(
      s"""WITH hs AS (SELECT doc_id, hashed_shingle_set(text, $ShingleN) AS hs
                      FROM documents),
         sig AS (SELECT doc_id, hs, minhash_signature(hs) AS mhs FROM hs),
         bands AS (
           SELECT doc_id, hs, b.band,
             concat_ws('-', slice(mhs, b.band * $RowsPerBand + 1, $RowsPerBand)) AS sigv
           FROM sig LATERAL VIEW explode(sequence(0, ${Bands - 1})) b AS band),
         cand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.sigv = b.sigv AND a.doc_id < b.doc_id),
         scored AS (
           SELECT c.doc_a, c.doc_b,
             sorted_intersect_size(ha.hs, hb.hs) AS inter,
             size(ha.hs) + size(hb.hs) - sorted_intersect_size(ha.hs, hb.hs) AS un
           FROM cand c
           JOIN hs ha ON ha.doc_id = c.doc_a
           JOIN hs hb ON hb.doc_id = c.doc_b)
         SELECT doc_a, doc_b FROM scored
         WHERE CASE WHEN un = 0 THEN 0.0
                    ELSE CAST(inter AS DOUBLE) / un END >= $JaccardThreshold
         ORDER BY doc_a, doc_b""")
      .as[(Long, Long)].collect().toSeq
    val api = graft.operators.TextDedup
      .minhashPairs(graft.tables.Tables.documents(spark, sfSmoke))
      .select("doc_a", "doc_b").orderBy("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSeq
    assert(sql === api,
      "the SQL spelling and the Column-API operator must be the same engine")
    assert(sql.nonEmpty)
  }

  test("SQL-only cosine top-k equals the Column-API operator") {
    registerViews()
    val k = 5 // qSimilarTopK's k
    val sql = spark.sql(
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
                     WHERE vec_id % ${graft.operators.Similarity.QueryStride} = 0
                       AND vec_id < ${graft.operators.Similarity.QueryStride.toLong *
                         graft.operators.Similarity.MaxQueries}),
         s AS (SELECT q.query_id, e.vec_id,
                 cosine_sim(q.qv, e.embedding) AS cosine
               FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         r AS (SELECT query_id, vec_id, cosine,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, vec_id) AS rk FROM s)
         SELECT query_id, vec_id, CAST(rk AS BIGINT) AS rk, cosine
         FROM r WHERE rk <= $k ORDER BY query_id, rk""")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val api = graft.operators.Similarity
      .qSimilarTopK(spark, sfSmoke)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(sql === api)
    assert(sql.nonEmpty)
  }
}
