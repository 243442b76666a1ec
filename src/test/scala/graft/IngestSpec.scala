package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{HttpFetch, LegiScanIngest}

/** Driver-side ingestion (S1/S2/S3/S8/S10) against an in-memory server
  * fake — the container is zero-egress, so the full path runs with an
  * injected fetcher. */
class IngestSpec extends SparkSpec {

  private val billJson =
    """{"bill":{"bill_id":1,"bill_number":"AB1","bill_type":"B","status":4,
      |"status_date":"2019-06-01","title":"t","description":"d",
      |"session":{"session_id":1,"session_name":"s","year_start":2019,"year_end":2020},
      |"texts":[],"sponsors":[]}}""".stripMargin.replace("\n", "")

  private def zipBytes(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private class FakeApi extends HttpFetch {
    var calls: List[String] = Nil
    override def get(url: String): Array[Byte] = {
      calls ::= url
      val body =
        if (url.contains("op=getDataSetList"))
          """{"status":"OK","datasetlist":[
            |{"session_id":17,"session_title":"2019-2020","access_key":"KEY17"}]}"""
            .stripMargin.replace("\n", "")
        else if (url.contains("op=getDataSet"))
          s"""{"status":"OK","dataset":{"zip":"${Base64.getEncoder.encodeToString(
            zipBytes("bill/AB1.json" -> billJson, "people/9001.json" -> """{"person":{}}"""))}"}}"""
        else if (url.contains("op=getBillText"))
          s"""{"status":"OK","text":{"doc":"${Base64.getEncoder
            .encodeToString("<html>doc</html>".getBytes)}"}}"""
        else sys.error(s"unexpected url $url")
      body.getBytes(StandardCharsets.UTF_8)
    }
  }

  test("catalog + dataset landing, idempotent unless forced (S1/S2/S3)") {
    val fake = new FakeApi
    val root = Files.createTempDirectory("graft-ingest").toString
    val ingest = new LegiScanIngest(fake, "APIKEY", root)
    val sessions = ingest.datasetList("CA")
    assert(sessions === Seq(graft.sources.SessionMeta(17, "2019-2020", "KEY17")))
    assert(ingest.pullSession(sessions.head))           // fetched
    assert(Files.exists(ingest.sessionDir(sessions.head).resolve("bill/AB1.json")))
    val callsAfterPull = fake.calls.length
    assert(!ingest.pullSession(sessions.head))          // cache hit, no fetch
    assert(fake.calls.length === callsAfterPull)
    assert(ingest.pullSession(sessions.head, force = true))
    assert(fake.calls.length === callsAfterPull + 1)
  }

  test("per-document text fetch decodes base64 and is idempotent (S8)") {
    val fake = new FakeApi
    val root = Files.createTempDirectory("graft-ingest2")
    val ingest = new LegiScanIngest(fake, "APIKEY", root.toString)
    val out = root.resolve("texts")
    assert(ingest.pullBillText(42L, out))
    assert(new String(Files.readAllBytes(out.resolve("42.html"))) === "<html>doc</html>")
    assert(!ingest.pullBillText(42L, out))
  }

  test("landed tree compacts to parquet through the pinned schema (S10)") {
    val fake = new FakeApi
    val root = Files.createTempDirectory("graft-ingest3").toString
    val ingest = new LegiScanIngest(fake, "APIKEY", root)
    ingest.pullSession(ingest.datasetList("CA").head)
    val out = Files.createTempDirectory("graft-land").toString + "/bills"
    ingest.landParquet(spark, out)
    val landed = spark.read.parquet(out)
    assert(landed.count() === 1)
    assert(landed.select("bill.bill_number").collect().head.getString(0) === "AB1")
  }

  test("corrupt bill JSON is quarantined with its raw line, not silently nulled") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-quarantine")
    val good = """{"bill": {"bill_id": 1, "bill_number": "AB1", "bill_type": "B", """ +
      """"status": 4, "status_date": "2019-06-01", "title": "t", "description": "d", """ +
      """"session": {"session_id": 1, "session_name": "s", "year_start": 2019, "year_end": 2020}, """ +
      """"texts": [], "sponsors": []}}"""
    java.nio.file.Files.writeString(dir.resolve("good.json"), good + "\n")
    java.nio.file.Files.writeString(dir.resolve("bad.json"),
      """{"bill": {"bill_id": BROKEN""" + "\n")
    graft.sources.Fixtures.withBillsJsonQuarantined(spark, s"$dir/*.json") {
      (clean, quarantined) =>
        assert(clean.count() === 1)
        assert(clean.select("bill_number").head.getString(0) === "AB1")
        val q = quarantined.collect()
        assert(q.length === 1)
        assert(q.head.getString(1).contains("BROKEN")) // raw line preserved
        assert(q.head.getString(0).endsWith("bad.json"))
    }
    // the returned handle releases exactly ITS backing cache entry (a
    // global cacheManager.isEmpty assert would be order-dependent on
    // whatever other suites leave cached in the shared session); the
    // scoped form above is the same unpersist in a finally
    val (_, _, raw2) =
      graft.sources.Fixtures.billsJsonQuarantined(spark, s"$dir/*.json")
    def entry = spark.sharedState.cacheManager
      .lookupCachedData(raw2.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
    assert(entry.isDefined)
    raw2.unpersist()
    assert(entry.isEmpty)
  }

  test("zip entries escaping the landing dir are rejected") {
    val fake = new FakeApi {
      override def get(url: String): Array[Byte] =
        if (url.contains("op=getDataSet"))
          s"""{"status":"OK","dataset":{"zip":"${Base64.getEncoder.encodeToString(
            zipBytes("../evil.json" -> "{}"))}"}}""".getBytes(StandardCharsets.UTF_8)
        else super.get(url)
    }
    val root = Files.createTempDirectory("graft-ingest4").toString
    val ingest = new LegiScanIngest(fake, "APIKEY", root)
    intercept[IllegalArgumentException] {
      ingest.pullSession(graft.sources.SessionMeta(99, "t", "k"))
    }
  }
}
