package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.LakeLayout

/** Layout maintenance: compaction file counts and partition pruning
  * that provably reaches the scan. */
class LakeLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("compaction rewrites many small files into the computed count") {
    val in = tmp("graft_compact_in")
    val out = tmp("graft_compact_out")
    // land deliberately fragmented: 16 files for a tiny table
    spark.range(0, 10000).toDF("id")
      .repartition(16).write.mode("overwrite").parquet(in)
    val smallFiles = new java.io.File(in).listFiles.count(_.getName.endsWith(".parquet"))
    assert(smallFiles === 16)
    // a huge target must collapse to a single file
    val n = LakeLayout.compactParquet(spark, in, out, targetBytes = 1L << 40)
    assert(n === 1)
    val outFiles = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    assert(outFiles === 1)
    assert(spark.read.parquet(out).count() === 10000L)
  }

  test("compaction splits to multiple files when the target is small") {
    val in = tmp("graft_compact2_in")
    val out = tmp("graft_compact2_out")
    spark.range(0, 100000).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(in)
    val est = spark.read.parquet(in).queryExecution.optimizedPlan.stats.sizeInBytes
    val n = LakeLayout.compactParquet(spark, in, out, targetBytes = (est / 4).toLong.max(1))
    assert(n >= 4, s"expected >= 4 output files, got $n") // ceil(est / (est/4))
    val outFiles = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    assert(outFiles === n)
    assert(spark.read.parquet(out).count() === 100000L)
  }

  test("schema evolution: merged read unions columns, old rows get nulls") {
    val dir = tmp("graft_evolve")
    // v1 files: (event_id, user_id); v2 adds a value column
    Seq((1L, 10L)).toDF("event_id", "user_id")
      .write.mode("append").parquet(dir)
    Seq((2L, 20L, 0.5)).toDF("event_id", "user_id", "value")
      .write.mode("append").parquet(dir)
    val merged = LakeLayout.readMerged(spark, dir)
    assert(merged.columns.sorted === Array("event_id", "user_id", "value"))
    val rows = merged.select("event_id", "value")
      .as[(Long, Option[Double])].collect().toMap
    assert(rows(1L) === None)       // pre-evolution row: null in new column
    assert(rows(2L) === Some(0.5))
  }

  test("co-bucketed tables join with zero shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val a = spark.range(0, 1000, 1, 4)
      .select($"id".as("doc_id"), md5(concat(lit("a"), $"id")).as("old_hash"))
    val b = spark.range(0, 1000, 1, 4)
      .select($"id".as("doc_id"), md5(concat(lit("b"), $"id")).as("new_hash"))
    LakeLayout.writeBucketed(a, "graft_bkt_a", "doc_id", 4, Some(tmp("graft_bkt_a")))
    LakeLayout.writeBucketed(b, "graft_bkt_b", "doc_id", 4, Some(tmp("graft_bkt_b")))
    // disable broadcast so the join would otherwise be a shuffled SMJ —
    // the bucketing must be what eliminates the exchange, not a BHJ
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_bkt_a")
        .join(spark.table("graft_bkt_b"), "doc_id")
      assert(j.count() === 1000L)
      val shuffles = j.queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed join still shuffled:\n${j.queryExecution.sparkPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("date-partitioned layout prunes to the filtered day at the scan") {
    val dir = tmp("graft_lake")
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L),
      (3L, java.sql.Timestamp.valueOf("2024-01-02 09:00:00"), 1L),
      (4L, java.sql.Timestamp.valueOf("2024-01-03 09:00:00"), 3L))
      .toDF("event_id", "ts", "user_id")
    LakeLayout.writeDatePartitioned(events, dir)
    // the layout creates one directory per day
    val dayDirs = new java.io.File(dir).listFiles
      .count(_.getName.startsWith("event_date="))
    assert(dayDirs === 3)
    val day = LakeLayout.readDay(spark, dir, "2024-01-01")
    assert(day.select("event_id").as[Long].collect().toSet === Set(1L, 2L))
    // pruning must reach the scan: the partition filter appears as
    // PartitionFilters, and the scan reads 1 of 3 day directories
    val plan = day.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"),
      s"day filter did not reach the scan as a partition filter:\n$plan")
    val scanned = day.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned === Seq(1), s"expected 1 pruned partition, got $scanned")
  }

  test("writeZOrdered: 2-D layout prunes the box a linear sort full-scans") {
    val zdir = tmp("graft_zorder")
    val ldir = tmp("graft_linear")
    // a 64×64 grid: two dimensions with no correlation to exploit
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    LakeLayout.writeZOrdered(grid, zdir, col("x"), col("y"), files = 16)
    // the contender: range-sorted by y alone (the layout that wins for
    // y-filters and loses everything else)
    grid.repartitionByRange(16, col("y")).sortWithinPartitions(col("y"))
      .write.mode("overwrite").parquet(ldir)
    // files whose [min(x), max(x)] stats intersect the predicate
    // x ∈ [8, 15] — what parquet row-group/file skipping would read
    def xFilesTouched(dir: String): (Long, Long) = {
      val boxes = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("x")).as("minx"), max(col("x")).as("maxx"))
      (boxes.filter(col("minx") <= 15L && col("maxx") >= 8L).count(),
        boxes.count())
    }
    val (zTouched, zTotal) = xFilesTouched(zdir)
    val (linTouched, linTotal) = xFilesTouched(ldir)
    assert(zTotal === 16L && linTotal === 16L)
    // y-sorted files each span the full x range: zero pruning
    assert(linTouched === 16L, s"linear layout should full-scan, got $linTouched")
    // z-ordered files are ~16×16 tiles: only the x ∈ [0,15]-column
    // tiles (plus boundary spill from sampled split points) intersect
    assert(zTouched <= 8L, s"expected ≤ 8 of 16 z-files, got $zTouched")
    // both layouts hold the same rows
    assert(spark.read.parquet(zdir).count() === 4096L)
  }

  test("zRangesForBox decomposes exactly; the range read returns the box") {
    import graft.operators.LakeLayout.zRangesForBox
    // an aligned 8×8 quadrant is ONE contiguous curve range of 64 cells
    assert(zRangesForBox(8, 8, 15, 15) === Seq((mortonRef(8, 8), mortonRef(8, 8) + 63)))
    // unaligned box: ranges cover exactly the box's curve positions
    val box = for { x <- 3L to 12L; y <- 5L to 9L } yield mortonRef(x, y)
    val ranges = zRangesForBox(3, 5, 12, 9)
    val covered = ranges.flatMap { case (lo, hi) => lo to hi }.toSet
    assert(covered === box.toSet, "ranges must equal the box, no slack")
    // contiguity merge happened: no two adjacent ranges touch
    ranges.sliding(2).foreach {
      case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1)
      case _ =>
    }
    // the data path: range predicates prune files, result is the box
    val dir = tmp("graft_zrange")
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    graft.operators.LakeLayout.writeZOrdered(
      grid, dir, col("x"), col("y"), files = 16, keepCurve = true)
    val out = graft.operators.LakeLayout.readZBox(
      spark, dir, "x", "y", 3, 5, 12, 9)
    val rows = out.select("x", "y").as[(Long, Long)].collect().toSet
    assert(rows === (for { x <- 3L to 12L; y <- 5L to 9L } yield (x, y)).toSet)
    val touched = out.select(input_file_name()).distinct().count()
    assert(touched < 16, s"range predicates pruned nothing: $touched files")
  }

  /** Bit-by-bit reference interleave (same as FunctionsSpec's). */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }
}
