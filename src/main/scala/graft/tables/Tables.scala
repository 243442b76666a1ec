package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Canonical table loaders for the star schema + corpus tables.
  *
  * The reference (`/root/reference/src/legiscan_search_all_bills.R:71-78`)
  * reads one JSON file per record in a session-partitioned directory tree;
  * here the landed, compacted form is Parquet — one columnar file (or
  * hive-partitioned directory) per logical table. All scans go through
  * these loaders so that scan-level concerns (schema pinning, partition
  * pruning, column pruning via downstream `select`) live in one place.
  *
  * Scale note (100 TB design): loaders return the raw scan; callers are
  * expected to `select`/`filter` immediately so Catalyst pushes projection
  * and predicates into the Parquet reader (verify via
  * `df.explain("formatted")` → `PushedFilters`/`ReadSchema`). At cluster
  * scale the big tables (`lineitem`, `orders`, `events`, `documents`)
  * would be written partitioned (e.g. by ship-month / event-date) and
  * bucketed on their join keys; the loaders are path-based so the same
  * code reads either layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.parquet` has shipped `ts` under three encodings across
    * testdata generations; this loader normalizes all of them to
    * `TimestampType` (µs, UTC — the session TZ is pinned to UTC):
    *  - TIMESTAMP(NANOS) read as long via
    *    `spark.sql.legacy.parquet.nanosAsLong`: ns→µs is integer
    *    division (`div`) — 2024-epoch nanos exceed 2^53, so any
    *    double-precision path would corrupt low bits;
    *  - `timestamp[us]` with no timezone (`isAdjustedToUTC=false`),
    *    which Spark 4 reads as TIMESTAMP_NTZ: cast to TimestampType is
    *    value-exact under the pinned UTC session timezone;
    *  - `timestamp[us]` LTZ: already TimestampType, pass through. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = eventsRaw(spark, dir)
    normalizeEvents(raw)
  }
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
