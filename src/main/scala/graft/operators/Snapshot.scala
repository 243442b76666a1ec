package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Snapshot diff — change-data-capture between two corpus versions.
  *
  * A recurring crawl produces a full snapshot per run; downstream
  * consumers (index refresh, re-embedding, incremental training mixes)
  * want only the delta. The diff is one full-outer join on the document
  * key comparing content hashes:
  *
  *   - `added`:   key only in the new snapshot
  *   - `removed`: key only in the old snapshot
  *   - `changed`: key in both, text hash differs
  *
  * Unchanged rows (the overwhelming majority at steady state) are
  * filtered out and never leave the join stage.
  *
  * Scale notes: both sides are projected to `(doc_id, md5)` BEFORE the
  * join, so the shuffle carries ~40 bytes/row instead of document
  * bodies — at 100 TB that is the whole game. The join is a plain
  * sort-merge on the key; snapshots landed via
  * [[LakeLayout.writeBucketed]]-style bucketing on `doc_id` make it
  * shuffle-free entirely. */
object Snapshot {

  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("doc_id").as("o_id"), md5(col("text")).as("old_hash"))
    val n = newSnap.select(col("doc_id").as("n_id"), md5(col("text")).as("new_hash"))
    o.join(n, col("o_id") === col("n_id"), "full_outer")
      .filter(col("o_id").isNull || col("n_id").isNull
        || col("old_hash") =!= col("new_hash"))
      .select(
        coalesce(col("o_id"), col("n_id")).as("doc_id"),
        when(col("o_id").isNull, "added")
          .when(col("n_id").isNull, "removed")
          .otherwise("changed").as("change"),
        col("old_hash"), col("new_hash"))
  }

  /** Oracle entry: the documents table plays the old snapshot; the new
    * one is derived deterministically — every ≡0 (mod 7) doc removed,
    * every surviving ≡0 (mod 5) doc edited (text + " v2"), and a
    * re-keyed copy of every ≡0 (mod 11) doc added. */
  val AddedIdOffset = 200000L

  def qSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val newSnap = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + AddedIdOffset).as("doc_id"), col("text")))
    snapshotDiff(docs, newSnap).orderBy(col("doc_id"), col("change"))
  }
}
