package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.Tables

/** Schema contract for every canonical loader, plus the events `ts`
  * encoding seam.
  *
  * Round-10/11 post-mortem: a testdata regeneration silently switched
  * `events.ts` from TIMESTAMP(NANOS) (read as long under
  * `nanosAsLong`) to `timestamp[us]` NTZ, and the only signal was 30
  * downstream test failures plus 16 missing oracle queries two rounds
  * running. These tests make any future encoding/type drift fail HERE,
  * in one focused place that names the table and column.
  */
class TablesContractSpec extends SparkSpec {

  /** The loaded (post-normalization) schema contract, as
    * `simpleString` so nullability/containsNull noise doesn't bite.
    * `events.ts` is pinned to session-TZ `timestamp` because
    * [[Tables.normalizeEvents]] guarantees it across all historical
    * parquet encodings; orders/lineitem timestamps are NTZ in the
    * current testdata and every consumer is flavor-agnostic
    * (date_trunc/comparisons only — no unix_micros). */
  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq(
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"),
    "part" -> Seq(
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "events" -> Seq(
      "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"),
    "documents" -> Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  test("every canonical loader returns the pinned schema") {
    assert(expected.keySet === Tables.all.toSet,
      "contract table list drifted from Tables.all")
    val loaders: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map(
        "region" -> (Tables.region _), "nation" -> (Tables.nation _),
        "customer" -> (Tables.customer _), "supplier" -> (Tables.supplier _),
        "part" -> (Tables.part _), "orders" -> (Tables.orders _),
        "lineitem" -> (Tables.lineitem _), "events" -> (Tables.events _),
        "documents" -> (Tables.documents _),
        "embeddings" -> (Tables.embeddings _))
    for (t <- Tables.all) {
      val got = loaders(t)(spark, sfSmoke).schema.fields.toSeq
        .map(f => f.name -> f.dataType.simpleString)
      assert(got === expected(t), s"schema drift in table '$t'")
    }
  }

  test("events ts seam: ns-as-long, µs NTZ and µs LTZ all normalize to identical micros") {
    import spark.implicits._
    // one pre-epoch-adjacent, one plain, one with sub-second micros
    val micros = Seq(0L, 1700000000000000L, 1700000123456789L)
    val base = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong, "click", 1.0, "{}")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
    def shaped(ts: org.apache.spark.sql.Column) = base
      .withColumn("ts", ts)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))

    val tmp = java.nio.file.Files.createTempDirectory("graft-ts-seam").toString
    val prevOut = spark.conf.get("spark.sql.parquet.outputTimestampType", "INT96")
    try {
      // force µs physical encoding so the LTZ fixture is timestamp[us]
      // isAdjustedToUTC=true, not INT96
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      shaped(timestamp_micros(col("us")))
        .write.parquet(s"$tmp/ltz/events.parquet")
      shaped(timestamp_micros(col("us")).cast(TimestampNTZType))
        .write.parquet(s"$tmp/ntz/events.parquet")
      // the pre-regeneration encoding was TIMESTAMP(NANOS), which the
      // session's nanosAsLong flag surfaces to the loader as a plain
      // long column — a written INT64 reproduces that loader-visible
      // state exactly
      shaped(expr("us * 1000"))
        .write.parquet(s"$tmp/ns/events.parquet")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevOut)

    val out = Seq("ltz", "ntz", "ns").map { enc =>
      val df = Tables.events(spark, s"$tmp/$enc")
      assert(df.schema("ts").dataType === TimestampType,
        s"encoding '$enc' did not normalize to TimestampType")
      enc -> df.select(col("event_id"), unix_micros(col("ts")))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    }.toMap
    val want = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    for ((enc, got) <- out)
      assert(got === want, s"encoding '$enc' drifted from source micros")
  }

  test("documents/embeddings integral seam: INT32 and DECIMAL(p,0) ids normalize to the pinned types") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-int-seam").toString
    // documents with doc_id DECIMAL(18,0) and n_chars INT32 — the two
    // drifts a pandas/pyarrow regeneration actually produces
    Seq((7L, "a b c", "en", "s1", 5), (8L, "d e", "en", "s2", 3))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .select(col("doc_id").cast(DecimalType(18, 0)), col("text"),
        col("lang"), col("source"), col("n_chars").cast(IntegerType))
      .write.parquet(s"$tmp/documents.parquet")
    // embeddings with vec_id INT32 and label INT64
    Seq((1, Seq(1.0f, 2.0f), 3L))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")

    val docs = Tables.documents(spark, tmp)
    assert(docs.schema("doc_id").dataType === LongType)
    assert(docs.schema("n_chars").dataType === LongType)
    assert(docs.select("doc_id", "n_chars").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq === Seq((7L, 5L), (8L, 3L)))

    val emb = Tables.embeddings(spark, tmp)
    assert(emb.schema("vec_id").dataType === LongType)
    assert(emb.schema("label").dataType === IntegerType)
    assert(emb.select("vec_id", "label").as[(Long, Int)]
      .collect().toSeq === Seq((1L, 3)))

    // non-integral drift (a float id) must fail loudly, not truncate
    val bad = java.nio.file.Files.createTempDirectory("graft-int-seam-bad").toString
    Seq((1.5, "x", "en", "s1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$bad/documents.parquet")
    val e = intercept[IllegalArgumentException](Tables.documents(spark, bad))
    assert(e.getMessage.contains("doc_id"))
  }

  test("narrowing drift guard: in-range casts exactly, out-of-range fails the job") {
    import spark.implicits._
    // label drifted to INT64 with a value beyond Int range: the
    // pre-fix wildcard cast would wrap it to a wrong-but-plausible
    // int; the guard must fail the read instead
    val tmp = java.nio.file.Files.createTempDirectory("graft-narrow-seam").toString
    Seq((1, Seq(1.0f), 3L), (2, Seq(2.0f), Int.MaxValue.toLong + 1L))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")
    val err = intercept[Exception](
      Tables.embeddings(spark, tmp).select("label").collect())
    assert(err.getMessage != null)
    // same encoding, all values in range: exact narrow, no rows lost
    val ok = java.nio.file.Files.createTempDirectory("graft-narrow-ok").toString
    Seq((1, Seq(1.0f), 3L), (2, Seq(2.0f), -7L))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$ok/embeddings.parquet")
    val got = Tables.embeddings(spark, ok)
    assert(got.schema("label").dataType === IntegerType)
    assert(got.select("vec_id", "label").as[(Long, Int)]
      .collect().sortBy(_._1).toSeq === Seq((1L, 3), (2L, -7)))
    // decimal wide enough to exceed the long target gets the guard
    // too; in-range values stay exact
    val dec = java.nio.file.Files.createTempDirectory("graft-narrow-dec").toString
    Seq((7L, "a", "en", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .select(col("doc_id").cast(DecimalType(38, 0)), col("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.parquet(s"$dec/documents.parquet")
    val docs = Tables.documents(spark, dec)
    assert(docs.schema("doc_id").dataType === LongType)
    assert(docs.select("doc_id").as[Long].collect().toSeq === Seq(7L))
  }
}
