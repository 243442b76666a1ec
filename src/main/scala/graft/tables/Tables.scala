package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, expr, lit, raise_error, timestamp_micros, when}
import org.apache.spark.sql.types.{ByteType, DataType, DecimalType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

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
  /** The corpus tables get the same encoding seam as `events.ts`: a
    * testdata regeneration that ships id/count columns as INT32 or
    * DECIMAL(p,0) (pandas/pyarrow both do this depending on how the
    * frame was built) must surface to every consumer as the pinned
    * BIGINT/INT — not leak a decimal into join keys and compare
    * surfaces (the r9-r12 `q_source_divergence` lesson: DECIMAL
    * surfaces hash differently across engines even value-identical).
    * Scale-0 decimal → long and int → long are value-exact casts;
    * anything non-integral (a drifted float id) fails loudly at load,
    * and a NARROWING integral drift (int64 label vs the pinned int)
    * gets a per-row range guard so an out-of-range value fails the
    * job instead of wrapping. */
  def documents(spark: SparkSession, dir: String): DataFrame =
    normalizeIntegral(load(spark, dir, "documents"),
      Map("doc_id" -> LongType, "n_chars" -> LongType))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    normalizeIntegral(load(spark, dir, "embeddings"),
      Map("vec_id" -> LongType, "label" -> IntegerType))
  /** Inclusive value range of a pinned integral target, for the
    * narrowing guard below. */
  private def rangeOf(t: DataType): (Long, Long) = t match {
    case ByteType    => (Byte.MinValue.toLong, Byte.MaxValue.toLong)
    case ShortType   => (Short.MinValue.toLong, Short.MaxValue.toLong)
    case IntegerType => (Int.MinValue.toLong, Int.MaxValue.toLong)
    case _           => (Long.MinValue, Long.MaxValue)
  }

  /** True when every value of `src` provably fits in `t`, so a plain
    * cast is value-exact. Scale-0 decimals fit when their max digit
    * count stays within the target's (18 digits always fit a long,
    * 9 an int, …). */
  private def widens(src: DataType, t: DataType): Boolean = {
    def width(x: DataType): Int = x match {
      case ByteType => 1; case ShortType => 2; case IntegerType => 4; case _ => 8
    }
    def decDigits(x: DataType): Int = x match {
      case ByteType => 2; case ShortType => 4; case IntegerType => 9; case _ => 18
    }
    src match {
      case dec: DecimalType => dec.precision <= decDigits(t)
      case s                => width(s) <= width(t)
    }
  }

  private[graft] def normalizeIntegral(
      df: DataFrame, want: Map[String, DataType]): DataFrame =
    want.foldLeft(df) { case (d, (name, t)) =>
      d.schema(name).dataType match {
        case `t` => d
        case src if src.isInstanceOf[DecimalType]
          && src.asInstanceOf[DecimalType].scale != 0 =>
          throw new IllegalArgumentException(
            s"column '$name' drifted to non-integral $src (want $t)")
        case src @ (ByteType | ShortType | IntegerType | LongType | _: DecimalType) =>
          if (widens(src, t)) d.withColumn(name, col(name).cast(t))
          else {
            // NARROWING drift (e.g. label shipped as INT64 against the
            // pinned INT): a plain cast would silently wrap out-of-range
            // values. Guard per row — in-range values cast exactly,
            // any out-of-range value fails the job loudly at execution,
            // with no extra scan (the guard rides the same read).
            val (lo, hi) = rangeOf(t)
            d.withColumn(name,
              when(col(name).isNull
                || (col(name) >= lit(lo) && col(name) <= lit(hi)),
                col(name).cast(t))
                .otherwise(raise_error(concat(
                  lit(s"column '$name' value "), col(name).cast("string"),
                  lit(s" out of range for pinned ${t.simpleString}")))))
          }
        case other => throw new IllegalArgumentException(
          s"column '$name' drifted to non-integral $other (want $t)")
      }
    }
}
