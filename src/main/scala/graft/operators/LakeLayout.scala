package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-layout maintenance — the table-management half of running a
  * 100-TB corpus: small-file compaction and partitioned layouts whose
  * pruning actually reaches the scan.
  *
  * Reference scope note: the reference lands its pulls as flat RDS/CSV
  * files (`legiscan_data_pull.R`); these operators are the SURVEY §7
  * north-star generalization of that landing step to a layout that
  * stays queryable at scale.
  */
object LakeLayout {

  /** Rewrite a parquet directory into ≈`targetBytes`-sized files —
    * the small-files compaction every long-running ingest needs (a
    * million 100-KB files make a scan scheduler-bound regardless of
    * cluster size). File count = ⌈estimated bytes / target⌉ via a
    * round-robin repartition: no key, no skew, pure layout. Returns
    * the partition count chosen.
    *
    * The size estimate is the optimizer's (`stats.sizeInBytes` ≈
    * decompressed); a production compactor would use the on-disk
    * `FileStatus` sum instead — same arithmetic, different constant. */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
                     targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val df = spark.read.parquet(inDir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = ((bytes + targetBytes - 1) / targetBytes).max(1).toInt
    df.repartition(n).write.mode("overwrite").parquet(outDir)
    n
  }

  /** Land events in a date-partitioned layout (`event_date=.../`):
    * the directory structure IS the index — a day-filtered read must
    * list and scan only that day's files (PartitionFilters in the
    * scan, not a post-scan predicate). At 100 TB this is the
    * difference between touching one day and touching three years. */
  def writeDatePartitioned(events: DataFrame, outDir: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write.partitionBy("event_date").mode("overwrite").parquet(outDir)

  /** A day's slice from the partitioned layout — the filter is on the
    * PARTITION column, so Catalyst prunes directories before any I/O. */
  def readDay(spark: SparkSession, dir: String, day: String): DataFrame =
    spark.read.parquet(dir).filter(col("event_date") === to_date(lit(day)))

  /** Read a directory written by evolving schemas (a long-lived lake's
    * normal state: yesterday's files lack today's columns). `mergeSchema`
    * unions all file footers into one schema; rows from pre-evolution
    * files carry nulls in the added columns. The merge reads FOOTERS,
    * not data — at 100 TB pin the canonical schema explicitly
    * (`spark.read.schema(...)`) once it stabilizes, because a
    * million-footer union is itself a scheduler cost; this entry point
    * is for the evolving-ingest window. */
  def readMerged(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Land a table bucketed (and per-file sorted) by `key`: the hash
    * partitioning is paid ONCE at write time and recorded in the
    * catalog, so every later join/aggregation on `key` between tables
    * bucketed the same way plans with ZERO shuffle — the scan itself
    * reports `HashPartitioning(key, buckets)`. At 100 TB this converts
    * the nightly snapshot-diff ([[Snapshot.snapshotDiff]]) and every
    * doc_id-keyed gate join from a full-corpus shuffle into a local
    * merge per bucket.
    *
    * Sizing: `buckets` should be ≥ cluster cores and chosen so one
    * bucket of the LARGEST co-bucketed table fits an executor's memory
    * (bytes/buckets ≲ a few hundred MB); both sides must use the SAME
    * bucket count or Spark re-shuffles the mismatched side. Bucketed
    * writes require the table catalog (`saveAsTable`), not a bare
    * path — the bucket spec lives in table metadata. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Land a table Z-ORDERED on two dimensions: rows are range-split and
    * sorted by their Morton curve position ([[graft.functions.mortonZ]]),
    * so each file covers one contiguous curve segment — a TIGHT
    * bounding box in (x, y). Per-file min/max stats then prune
    * predicates on EITHER dimension (or a 2-D box), where a plain sort
    * only ever prunes its leading column: the query the leading-column
    * layout must full-scan (a filter on the second dimension alone)
    * touches ~√F of F z-ordered files. This is the layout move for the
    * two-axis scans a corpus store serves daily — (source, date),
    * (lang, length-bucket) — without maintaining two copies.
    *
    * `x`/`y` are expressions quantized by the caller into [0, 2^16) —
    * layout only needs the ORDER, so any monotone bucketing of the raw
    * values works (day numbers, hash prefixes, size buckets).
    * `repartitionByRange` samples split points, so file boundaries are
    * approximate — irrelevant for pruning, which reads the stats that
    * ARE exact. The curve column is dropped before write; it is cheap
    * to recompute and pruning consumes the per-file (x, y) stats, not z.
    */
  def writeZOrdered(df: DataFrame, outDir: String,
                    x: org.apache.spark.sql.Column,
                    y: org.apache.spark.sql.Column,
                    files: Int, keepCurve: Boolean = false): Unit = {
    require(files > 0, s"files must be positive, got $files")
    val z = df.withColumn("zval", graft.functions.mortonZ(x, y))
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions(col("zval"))
    (if (keepCurve) z else z.drop("zval"))
      .write.mode("overwrite").parquet(outDir)
  }

  /** Driver-side Morton interleave (16-bit × 16-bit) — the same value
    * [[graft.functions.mortonZ]] computes per row, needed here to name
    * curve positions of quadrant corners. */
  private def mortonOf(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  /** Covering curve ranges for an axis-aligned box — the QUERY half of
    * the Z-order layout (the litmax/bigmin idea as explicit quadtree
    * descent): recurse the 2^16-square's quadrants in curve order,
    * emit whole cells fully inside the box as single [z, z+size²−1]
    * ranges, skip disjoint cells, split boundary cells. Emission order
    * IS curve order, so contiguous ranges merge in one linear pass.
    * Range count is O(perimeter) of the box — driver-side integers,
    * no data touched. With [[writeZOrdered]]`(keepCurve = true)` the
    * ranges become BETWEEN predicates on the stored sorted `zval`
    * column, which parquet row-group stats prune almost exactly. */
  def zRangesForBox(x0: Long, y0: Long, x1: Long, y1: Long): Seq[(Long, Long)] = {
    require(0 <= x0 && x0 <= x1 && x1 < 65536 &&
      0 <= y0 && y0 <= y1 && y1 < 65536, s"bad box ($x0,$y0)-($x1,$y1)")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def go(xb: Long, yb: Long, size: Long): Unit = {
      val xe = xb + size - 1
      val ye = yb + size - 1
      if (xe < x0 || xb > x1 || ye < y0 || yb > y1) ()
      else if (xb >= x0 && xe <= x1 && yb >= y0 && ye <= y1) {
        val z = mortonOf(xb, yb)
        out += ((z, z + size * size - 1))
      } else {
        val h = size / 2
        // children in CURVE order: (0,0), (1,0), (0,1), (1,1)
        go(xb, yb, h); go(xb + h, yb, h); go(xb, yb + h, h); go(xb + h, yb + h, h)
      }
    }
    go(0L, 0L, 65536L)
    out.foldLeft(Vector.empty[(Long, Long)]) { case (acc, (lo, hi)) =>
      acc.lastOption match {
        case Some((plo, phi)) if lo == phi + 1 => acc.init :+ ((plo, hi))
        case _ => acc :+ ((lo, hi))
      }
    }
  }

  /** Box read over a `keepCurve` Z-ordered layout: the covering curve
    * ranges push down as BETWEEN predicates on the sorted `zval`
    * column (row-group stats skip non-matching groups); the exact box
    * filter on the dimension columns removes nothing when the ranges
    * are exact, but stays as the correctness guard. */
  def readZBox(spark: SparkSession, dir: String,
               xCol: String, yCol: String,
               x0: Long, y0: Long, x1: Long, y1: Long): DataFrame = {
    val ranges = zRangesForBox(x0, y0, x1, y1)
    val rangePred = ranges.map { case (lo, hi) =>
      col("zval").between(lo, hi)
    }.reduce(_ || _)
    spark.read.parquet(dir)
      .where(rangePred)
      .where(col(xCol).between(x0, x1) && col(yCol).between(y0, y1))
  }

  /** The curve itself as an oracle surface: each event's Morton position
    * over its (user, day) quantization — the bit-parity proof that both
    * engines interleave identically, which is what makes
    * [[writeZOrdered]]'s layout reproducible anywhere. Map-side only:
    * project + integer mask/shift chain, no shuffle but the
    * canonical-order sort. */
  def qZOrderCurve(spark: SparkSession, dir: String): DataFrame = {
    val days = datediff(to_date(col("ts")),
      lit(java.sql.Date.valueOf("1970-01-01"))).cast("long")
    graft.tables.Tables.events(spark, dir)
      .select(col("event_id"),
        pmod(col("user_id"), lit(65536L)).as("xq"),
        pmod(days, lit(65536L)).as("yq"))
      .withColumn("zval", graft.functions.mortonZ(col("xq"), col("yq")))
      .orderBy(col("event_id"))
  }
}
