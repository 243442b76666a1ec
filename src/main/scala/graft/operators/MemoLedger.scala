package graft.operators

/** Build-cost ledger for the per-JVM session memos
  * ([[TextDedup.clusterLabels]], [[Curate.v5Emit]]).
  *
  * Why it exists: the memos are built once per JVM by the FIRST
  * consumer in bench pass 1, so under min-of-N timing the one-time
  * build cost appears in NO recorded per-query minimum (every later
  * pass reads the parquet) — a memo-schedule change could masquerade
  * as a query speedup in round-over-round diffs. Each memo records its
  * wall-clock build seconds here at first materialization and
  * [[graft.Bench]] emits the ledger as a `"memo_build"` map next to
  * the per-query times, making the build cost a first-class recorded
  * line without changing headline semantics (production lands these
  * tables once per corpus snapshot; the per-query numbers correctly
  * price the steady-state reads).
  *
  * A rebuild (e.g. after a cleaned spill dir) overwrites the entry —
  * the ledger carries the LATEST build cost per memo name. */
object MemoLedger {
  private val builds =
    new java.util.concurrent.ConcurrentHashMap[String, Double]()

  def record(name: String, secs: Double): Unit = { builds.put(name, secs); () }

  /** Time `body`, record its wall-clock under `name`, return its value. */
  def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val out = body
    record(name, (System.nanoTime() - t0) / 1e9)
    out
  }

  def snapshot: Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    builds.asScala.toMap
  }
}

/** A (key → materialized parquet path) session memo with the shared
  * hygiene rules of the round-13 advice:
  *
  *  - the build runs under a PER-CELL lazy-val monitor, not the
  *    ConcurrentHashMap bin lock (`computeIfAbsent` would hold the bin
  *    across a whole Spark job and stall unrelated same-bin keys);
  *  - the path is REVALIDATED on every read — a spill dir cleaned
  *    mid-JVM triggers exactly one rebuild (conditional remove, so a
  *    racing rebuild is never discarded) instead of a failing scan;
  *  - every build is timed into [[MemoLedger]] under `name`, so the
  *    bench record carries the one-time cost min-of-N timing hides. */
final class PathMemo {
  private final class Cell(build: () => String) {
    lazy val path: String = build()
  }
  private val cells =
    new java.util.concurrent.ConcurrentHashMap[String, Cell]()

  def read(spark: org.apache.spark.sql.SparkSession, key: String,
           name: String)(build: () => String): org.apache.spark.sql.DataFrame = {
    def cellFor(): Cell = {
      val c = new Cell(() => MemoLedger.timed(name)(build()))
      val prev = cells.putIfAbsent(key, c)
      if (prev == null) c else prev
    }
    val cell = cellFor()
    val path = cell.path
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) spark.read.parquet(path)
    else {
      cells.remove(key, cell)
      spark.read.parquet(cellFor().path)
    }
  }
}
