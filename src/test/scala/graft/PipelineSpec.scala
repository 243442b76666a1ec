package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.{BillSearch, FullText}
import graft.sources.Fixtures

/** Pipelines A and C over the committed fixture corpus. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("bill search is CASE-SENSITIVE on stems (reference F2 asymmetry)") {
    val bills = Seq(
      ("AB1", "Affordab housing act", "x"),
      ("AB2", "affordab housing act", "x"),
      ("AB3", "unrelated", "cost of things"),
      ("AB4", "unrelated", "unrelated"))
      .map { case (n, t, d) => (n, t, d, "S", 1,
        Seq("https://a#frag")) }
      .toDF("bill_number", "title", "description", "session_name", "status", "links")
      .select(col("bill_number"), col("title"), col("description"),
        struct(col("session_name")).as("session"), col("status"),
        array(struct(lit(1L).as("doc_id"), lit("d").as("date"),
          lit("Introduced").as("type"),
          element_at(col("links"), 1).as("state_link"))).as("texts"))
    val hits = BillSearch.search(bills, Seq("affordab", "cost"))
      .select("bill_number").as[String].collect().sorted
    assert(hits === Array("AB2", "AB3")) // AB1's capital A does NOT match
  }

  test("bill search strips URL fragments from the first text link") {
    val out = BillSearch.qBillSearch(spark, sfSmoke)
    assert(out.count() > 0)
    assert(out.filter(col("link").contains("#")).count() === 0)
  }

  test("CSV sink writes a header file under a run-id path") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val path = BillSearch.writeCsv(
      Seq(("a", 1)).toDF("c1", "c2"), dir, "runid123", "out")
    assert(path.contains("runid123_out"))
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length === 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head === "c1,c2" && lines(1) === "a,1")
  }

  test("htmlToText strips tags, decodes entities, collapses whitespace") {
    val got = Seq("<html><body><h1>A &amp; B</h1>  <p>c&nbsp;d</p></body></html>")
      .toDF("h").select(FullText.htmlToText(col("h"))).as[String].head()
    assert(got === "A & B c d")
  }

  test("budget line filter keeps AB/SB/ACA/SCA bill lines and extracts numbers") {
    val sbud = Seq((2019, "HEADER\n  AB 74 Budget act\nnoise\nSB 840 More\nACA 1 Amendment\nXY 9 nope"))
      .toDF("year", "text")
    val got = FullText.budgetBills(sbud)
      .select("bill_number").as[String].collect().sorted
    assert(got === Array("AB74", "ACA1", "SB840"))
  }

  test("fiscal-year parity: odd year opens the biennium, even year closes it") {
    val corpus = Seq(("2019_AB1.html", "education text"), ("2020_SB2.html", "education text"))
      .toDF("file", "text")
    val out = FullText.search(corpus, FullText.termsTable(spark, Seq("education")))
      .select("file", "fiscal_year").as[(String, String)].collect().toMap
    assert(out("2019_AB1.html") === "2019-2020")
    assert(out("2020_SB2.html") === "2019-2020")
  }

  test("fulltext search is case-insensitive (reference F1) and links are derived") {
    val corpus = Seq(("2019_AB1.html", "EDUCATION funding")).toDF("file", "text")
    val out = FullText.search(corpus, FullText.termsTable(spark, Seq("education")))
    val row = out.select("bill", "link").as[(String, String)].head()
    assert(row._1 === "AB 1")
    assert(row._2.endsWith("bill_id=201920200AB1"))
  }

  test("per-term partitioned write creates one directory per term") {
    val dir = Files.createTempDirectory("graft-ft").toString
    val corpus = FullText.corpusFromBinary(spark)
    val res = FullText.search(corpus, FullText.termsTable(spark, Seq("education", "water")))
    FullText.writePerTerm(res, dir, "rid")
    val terms = new java.io.File(s"$dir/rid_fulltext").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(terms === Array("term=education", "term=water"))
  }

  private def assertGolden(queryName: String, goldenFile: String): Unit = {
    val dir = Files.createTempDirectory("graft-golden").toString
    val path = BillSearch.writeCsv(
      SparkEntry.queries(queryName)(spark, sfSmoke), dir, "rid", queryName)
    val produced = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val got = scala.io.Source.fromFile(produced).getLines().toSeq
    val golden = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream(s"/golden/$goldenFile")).getLines().toSeq
    assert(got === golden)
  }

  test("pipeline A end-to-end CSV matches the committed golden file") {
    assertGolden("q_bill_search", "bill_search.csv")
  }
  test("pipeline B end-to-end CSV matches the committed golden file") {
    assertGolden("q_legislator_counts", "q_legislator_counts.csv")
  }
  test("pipeline C end-to-end CSV matches the committed golden file") {
    assertGolden("q_fulltext_search", "q_fulltext_search.csv")
  }

  test("binaryFile corpus equals the parquet landing copy") {
    val fromBinary = FullText.corpusFromBinary(spark)
      .orderBy("file").as[(String, String)].collect()
    val fromParquet = Fixtures.billTexts(spark)
      .select(col("file"), FullText.htmlToText(col("html")).as("text"))
      .orderBy("file").as[(String, String)].collect()
    assert(fromBinary === fromParquet)
  }
}
