package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Seam-cost probe for the ADMISSION operators — measures the
  * standing-vs-probe split economics that SCALING.md's round-17 table
  * records, which the per-query Bench numbers cannot see (a bench
  * query prices one END-TO-END call; the admission seams exist
  * precisely so that K probe batches do NOT pay K standing builds).
  *
  * For each gate it reports three numbers (min-of-3 each, Bench's
  * noop-write materialization):
  *
  *  - `standing_build` — the one-time cost of the standing structures
  *    (two-level cells for the semantic gate, trained count/constant
  *    frames for NB, the boilerplate fp set for CDC), persisted the
  *    way the streaming twins persist them;
  *  - `per_batch` — the marginal cost of admitting ONE probe batch
  *    (1/5 of the 10% increment) against the persisted structures;
  *  - `naive_batch` — the same batch through the one-shot entry that
  *    rebuilds the standing side per call (what a caller without the
  *    seam pays per micro-batch).
  *
  * The split is economical when naive_batch ≈ standing_build +
  * per_batch and per_batch ≪ naive_batch; the ratio is the K at which
  * a streaming deployment amortizes. Run at sf0.01 and sf0.1 to get
  * the slopes of each column separately — standing_build should track
  * the corpus, per_batch the batch.
  *
  * Output: one JSON line to stdout (and SPARK_GRAFT_SEAM_OUT if set).
  */
object SeamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)
    import graft.operators.{CorpusFilters, Similarity, TrainPrep}
    import graft.tables.Tables

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timeMin3(f: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
    def round3(d: Double): Double = math.round(d * 1000) / 1000.0

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // --- semantic admission (two-level SemDeDup gate) ---
    {
      val emb = Tables.embeddings(spark, sfDir)
      val standing = emb.filter(col("vec_id") % 10 =!= 0)
      val batches = (0 until 5).map(i =>
        emb.filter(col("vec_id") % 10 === 0 && (col("vec_id") / 10) % 5 === i))
      // warmup: one full naive call touches every input column
      run(Similarity.semanticAdmission(batches.head, standing, 0.4))
      // naive FIRST — after the standing persist, Spark's CacheManager
      // would substitute the cached standing sub-plans into the naive
      // lineage (plan-equality matching) and the "rebuild per call"
      // number would silently measure the seam it is the control for
      results("semantic_naive_batch") = round3(timeMin3 {
        run(Similarity.semanticAdmission(batches.head, standing, 0.4))
      })
      var persisted: Seq[org.apache.spark.sql.DataFrame] = Nil
      var parts: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = null
      results("semantic_standing_build") = round3(timeMin3 {
        persisted.foreach(_.unpersist())
        // persist ALL THREE standing frames, exactly as the streaming
        // twin does — coarse/fmap lineage carries the centroid
        // selection's corpus scans
        val (c0, f0, cells0) = Similarity.semanticStandingParts(standing)
        val c = c0.persist(StorageLevel.MEMORY_AND_DISK)
        val f = f0.persist(StorageLevel.MEMORY_AND_DISK)
        val cells = cells0.persist(StorageLevel.MEMORY_AND_DISK)
        persisted = Seq(c, f, cells)
        parts = (c, f, cells)
        run(c); run(f); run(cells) // materialize the standing side
      })
      results("semantic_per_batch") = round3(batches.map(b => timeMin3 {
        run(Similarity.semanticAdmissionAgainst(b, parts._1, parts._2,
          parts._3, 0.4))
      }).min)
      persisted.foreach(_.unpersist()); ()
    }

    // --- NB admission (trained-classifier gate) ---
    {
      val docs = Tables.documents(spark, sfDir)
      val standing = docs.filter(col("doc_id") % 10 =!= 0)
      val batches = (0 until 5).map(i =>
        docs.filter(col("doc_id") % 10 === 0 && (col("doc_id") / 10) % 5 === i))
      run(CorpusFilters.nbClassifyAgainst(batches.head, standing))
      results("nb_naive_batch") = round3(timeMin3 {
        run(CorpusFilters.nbClassifyAgainst(batches.head, standing))
      })
      var counts: org.apache.spark.sql.DataFrame = null
      var classConst: org.apache.spark.sql.DataFrame = null
      results("nb_standing_build") = round3(timeMin3 {
        if (counts != null) { counts.unpersist(); classConst.unpersist() }
        val (c0, cc0) = CorpusFilters.nbTrain(standing)
        counts = c0.persist(StorageLevel.MEMORY_AND_DISK)
        classConst = cc0.persist(StorageLevel.MEMORY_AND_DISK)
        run(counts); run(classConst)
      })
      results("nb_per_batch") = round3(batches.map(b => timeMin3 {
        run(CorpusFilters.nbScoreAgainst(b, counts, classConst))
      }).min)
      counts.unpersist(); classConst.unpersist(); ()
    }

    // --- CDC admission (boilerplate-chunk gate) ---
    {
      val docs = Tables.documents(spark, sfDir)
      val standing = docs.filter(col("doc_id") % 10 =!= 0)
      val batches = (0 until 5).map(i =>
        docs.filter(col("doc_id") % 10 === 0 && (col("doc_id") / 10) % 5 === i))
      def gate(b: org.apache.spark.sql.DataFrame,
               banned: org.apache.spark.sql.DataFrame) =
        TrainPrep.cdcChunks(b).join(banned, Seq("fp"), "left_anti")
      run(gate(batches.head, TrainPrep.cdcSharedChunks(standing).select("fp")))
      results("cdc_naive_batch") = round3(timeMin3 {
        run(gate(batches.head, TrainPrep.cdcSharedChunks(standing).select("fp")))
      })
      var banned: org.apache.spark.sql.DataFrame = null
      results("cdc_standing_build") = round3(timeMin3 {
        if (banned != null) banned.unpersist()
        banned = TrainPrep.cdcSharedChunks(standing).select(col("fp"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        run(banned)
      })
      results("cdc_per_batch") = round3(batches.map(b => timeMin3 {
        run(gate(b, banned))
      }).min)
      banned.unpersist(); ()
    }

    // --- PQ serving seam (encode-against-frozen-codebook appends) ---
    // The index the 100-TB story leans on hardest: standing_build =
    // writePqIndex (codebook train + full corpus encode + landing),
    // per_batch = appendPqIndex of one increment against the FROZEN
    // codebook, pq_probe = serving one query set from the landed codes,
    // naive_batch = pqTopK over standing ∪ batch (what a caller without
    // the index pays per serving call: retrain + re-encode everything).
    {
      import graft.operators.TextDedup
      val emb = Tables.embeddings(spark, sfDir)
      val standing = emb.filter(col("vec_id") % 10 =!= 0)
      val batches = (0 until 5).map(i =>
        emb.filter(col("vec_id") % 10 === 0 && (col("vec_id") / 10) % 5 === i))
      val queries = Similarity.queryVectors(emb)
      val path = TextDedup.spillPath(spark, "seam_pq_index")
      run(Similarity.pqTopK(standing.unionByName(batches.head), 3))
      results("pq_naive_batch") = round3(timeMin3 {
        run(Similarity.pqTopK(standing.unionByName(batches.head), 3))
      })
      // each timing run is a FULL rebuild (writePqIndex clears the
      // codes layout first), so min-of-3 re-pays the build honestly
      results("pq_standing_build") = round3(timeMin3 {
        Similarity.writePqIndex(standing, path)
      })
      // appends are REPLAY-IDEMPOTENT (identity-addressed batch dirs),
      // so a min-of-3 replay would time the no-op skip; instead each of
      // the 5 batches is timed once on its FIRST landing, min reported
      results("pq_per_batch") = round3(batches.map { b =>
        val t0 = System.nanoTime()
        Similarity.appendPqIndex(spark, path, b)
        (System.nanoTime() - t0) / 1e9
      }.min)
      results("pq_probe") = round3(timeMin3 {
        run(Similarity.pqProbeIndex(spark, path, queries, 3))
      })
    }

    // --- residual IVF-PQ serving seam (the recommended index) ---
    // Same columns as the flat-PQ block, over the residual layout:
    // standing_build = writeIvfPqIndex (structures + full encode +
    // landing), per_batch = appendIvfPqIndex (place into frozen cells,
    // encode against the frozen residual codebook, land), probe =
    // ivfPqProbeIndex, naive = ivfPqResidualTopK over standing ∪ batch.
    {
      import graft.operators.TextDedup
      val emb = Tables.embeddings(spark, sfDir)
      val standing = emb.filter(col("vec_id") % 10 =!= 0)
      val batches = (0 until 5).map(i =>
        emb.filter(col("vec_id") % 10 === 0 && (col("vec_id") / 10) % 5 === i))
      val queries = Similarity.queryVectors(emb)
      val path = TextDedup.spillPath(spark, "seam_ivfpq_index")
      run(Similarity.ivfPqResidualTopK(standing.unionByName(batches.head), 3))
      results("ivfpq_naive_batch") = round3(timeMin3 {
        run(Similarity.ivfPqResidualTopK(standing.unionByName(batches.head), 3))
      })
      results("ivfpq_standing_build") = round3(timeMin3 {
        Similarity.writeIvfPqIndex(standing, path)
      })
      // appends replay-idempotent → one timed FIRST landing per batch
      results("ivfpq_per_batch") = round3(batches.map { b =>
        val t0 = System.nanoTime()
        Similarity.appendIvfPqIndex(spark, path, b)
        (System.nanoTime() - t0) / 1e9
      }.min)
      results("ivfpq_probe") = round3(timeMin3 {
        run(Similarity.ivfPqProbeIndex(spark, path, queries, 3))
      })
      // the nprobe COST curve — the partner of q_ivfpq_nprobe_curve's
      // certified recall column: same landed index, same queries, the
      // serving knob swept over its certified settings
      Similarity.NprobeCurve.foreach { np =>
        results(s"ivfpq_probe_np$np") = round3(timeMin3 {
          run(Similarity.ivfPqProbeIndex(spark, path, queries, 3, np))
        })
      }
      // per-batch LISTING growth: the streaming twin re-reads codes/
      // per micro-batch (ivfPqProbeIndex IS the per-batch body), and
      // while the DATA read stays pruned, the file listing + parquet
      // footer reads grow with landed batch-dir count. Land 20
      // single-vector appends (data +~4%, dirs 6 → 26) and re-time the
      // probe — the delta prices what K micro-batches of appends cost
      // every subsequent serving trigger.
      val one = emb.filter(col("vec_id") === 0L)
      (1 to 20).foreach { i =>
        Similarity.appendIvfPqIndex(spark, path,
          one.select((col("vec_id") + lit(1000000L + i)).as("vec_id"),
            col("embedding")))
      }
      results("ivfpq_probe_26dirs") = round3(timeMin3 {
        run(Similarity.ivfPqProbeIndex(spark, path, queries, 3))
      })
    }

    def jstr(s: String) = "\"" + s + "\""
    val body = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString(",")
    val line = s"""{"sf":${jstr(sfDir)},$body}"""
    println(line)
    sys.env.get("SPARK_GRAFT_SEAM_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    spark.stop()
  }
}
