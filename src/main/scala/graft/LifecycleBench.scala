package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-decomposed timing of the dedup-index lifecycle behind
  * `q_dedup_appended` — the engine's heaviest lifecycle entry, whose
  * end-to-end record crept r15 3.37 → r16 3.66 → r17 3.79–3.97 s
  * (sf0.1, clean pairs) as features landed (count-packed memberships,
  * retained-version sweep, chunked collapse). The per-query Bench
  * number cannot say WHICH step carries the creep; this main times the
  * four steps separately, each against honest state:
  *
  *  - `build_odd`      — writeDedupIndex over the odd standing half
  *                       (installs a fresh version per call, so
  *                       min-of-3 re-pays the build);
  *  - `append_even`    — appendDedupIndex of the even half, re-seeded
  *                       by an UNTIMED rebuild before every run (an
  *                       append mutates the live version — replaying
  *                       it unseeded would measure duplicate-row
  *                       state);
  *  - `compact`        — compactDedupIndex after an untimed
  *                       build+append re-seed;
  *  - `probe_increment`— dedupProbeIndex with the 10% increment
  *                       against the compacted index (pure read —
  *                       min-of-3 on stable state).
  *
  * Output: one JSON line (stdout, and SPARK_GRAFT_LIFECYCLE_OUT if
  * set). The sum of the four phases ≈ the Bench record for
  * `q_dedup_appended` minus its orderBy/collect tail.
  */
object LifecycleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    import graft.operators.TextDedup
    import graft.tables.Tables

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timeOnce(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def timeMin3(f: => Unit): Double = (1 to 3).map(_ => timeOnce(f)).min
    def round3(d: Double): Double = math.round(d * 1000) / 1000.0

    val docs = Tables.documents(spark, sfDir)
    val standing = docs.filter(col("doc_id") % TextDedup.IncrementMod =!= 0)
    val odd = standing.filter(col("doc_id") % 2 === 1)
    val even = standing.filter(col("doc_id") % 2 === 0)
    val probe = docs.filter(col("doc_id") % TextDedup.IncrementMod === 0)
    val path = TextDedup.spillPath(spark, "lifecycle_bench_idx")

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // warmup touches every input column once
    TextDedup.writeDedupIndex(odd, path)

    results("build_odd") = round3(timeMin3 {
      TextDedup.writeDedupIndex(odd, path)
    })
    results("append_even") = round3((1 to 3).map { _ =>
      TextDedup.writeDedupIndex(odd, path) // untimed re-seed
      timeOnce { TextDedup.appendDedupIndex(spark, path, even) }
    }.min)
    results("compact") = round3((1 to 3).map { _ =>
      TextDedup.writeDedupIndex(odd, path) // untimed re-seed
      TextDedup.appendDedupIndex(spark, path, even)
      timeOnce { TextDedup.compactDedupIndex(spark, path) }
    }.min)
    results("probe_increment") = round3(timeMin3 {
      run(TextDedup.dedupProbeIndex(spark, path, probe))
    })

    // --- delete-lifecycle phases (q_dedup_deleted's additions) ---
    // q_dedup_deleted = build + append + DELETE + compact(tombstoned)
    // + probe(masked); the first two phases are shared with the table
    // above, so only the delete-specific steps are timed here, each
    // against honestly re-seeded state.
    val delSlice = standing
      .filter(col("doc_id") % TextDedup.DeleteMod === TextDedup.DeleteRem)
      .select(col("doc_id"))
    def reseed(): Unit = {
      TextDedup.writeDedupIndex(odd, path)
      TextDedup.appendDedupIndex(spark, path, even)
    }
    results("delete_slice") = round3((1 to 3).map { _ =>
      reseed()
      timeOnce { TextDedup.deleteDedupIndex(spark, path, delSlice) }
    }.min)
    results("compact_tombstoned") = round3((1 to 3).map { _ =>
      reseed()
      TextDedup.deleteDedupIndex(spark, path, delSlice)
      timeOnce { TextDedup.compactDedupIndex(spark, path) }
    }.min)
    // masked probe on stable post-compact state (tombstones carried,
    // so the anti-join mask is live even after application)
    results("probe_masked") = round3(timeMin3 {
      run(TextDedup.dedupProbeIndex(spark, path, probe))
    })

    def jstr(s: String) = "\"" + s + "\""
    val body = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString(",")
    val line = s"""{"sf":${jstr(sfDir)},$body}"""
    println(line)
    sys.env.get("SPARK_GRAFT_LIFECYCLE_OUT").foreach(p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n"))
    spark.stop()
  }
}
