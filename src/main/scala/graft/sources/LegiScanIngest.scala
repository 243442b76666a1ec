package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.Base64
import java.util.zip.ZipInputStream

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Driver-side REST ingestion — the Spark re-architecture of the
  * reference's network layer (`legiscan_data_pull.R`):
  *
  *  - S1 catalog source: `op=getDataSetList` → session list (`:24-29`);
  *  - S2 dataset source: `op=getDataSet` per session, base64 → zip →
  *    one-JSON-per-record tree (`:49-62`);
  *  - S3 cache/memo: skip a session whose landing directory already
  *    exists unless forced (`:20-22,43-46`);
  *  - S8 per-document fetch: `op=getBillText` → base64 HTML (`legiscan_main.R:170-175`);
  *  - S10 binary/object sink: the landed tree is compacted to Parquet
  *    ([[landParquet]]) — the 100-TB answer to the one-file-per-bill
  *    small-files problem (SURVEY §7.4).
  *
  * Network access stays on the driver (SURVEY §3.4: the reference's only
  * process crossings are these calls); the cluster only ever scans the
  * landed tree. [[HttpFetch]] is injected — this container is
  * zero-egress, so tests drive the full path with an in-memory server
  * fake; a production deployment passes a real client with rate
  * limiting.
  */
trait HttpFetch {
  def get(url: String): Array[Byte]
}

case class SessionMeta(sessionId: Long, sessionTitle: String, accessKey: String)

class LegiScanIngest(fetch: HttpFetch, apiKey: String, landingRoot: String,
                     baseUrl: String = "https://api.legiscan.com/") {
  private val mapper = new ObjectMapper()

  private def api(op: String, params: (String, String)*): JsonNode = {
    val qs = (Seq("key" -> apiKey, "op" -> op) ++ params)
      .map { case (k, v) => s"$k=$v" }.mkString("&")
    mapper.readTree(fetch.get(s"$baseUrl?$qs"))
  }

  /** S1: the session catalog. */
  def datasetList(state: String): Seq[SessionMeta] = {
    val root = api("getDataSetList", "state" -> state)
    val list = root.get("datasetlist")
    (0 until list.size).map { i =>
      val n = list.get(i)
      SessionMeta(n.get("session_id").asLong,
        n.get("session_title").asText, n.get("access_key").asText)
    }
  }

  def sessionDir(meta: SessionMeta): Path =
    Paths.get(landingRoot).resolve(meta.sessionId.toString)

  /** S2 + S3: land one session's dataset as a JSON tree; returns true if
    * fetched, false on cache hit. */
  def pullSession(meta: SessionMeta, force: Boolean = false): Boolean = {
    val dir = sessionDir(meta)
    if (Files.isDirectory(dir) && !force) return false
    val resp = api("getDataSet",
      "id" -> meta.sessionId.toString, "access_key" -> meta.accessKey)
    val zipped = Base64.getDecoder.decode(resp.get("dataset").get("zip").asText)
    val zin = new ZipInputStream(new ByteArrayInputStream(zipped))
    Files.createDirectories(dir)
    var entry = zin.getNextEntry
    while (entry != null) {
      if (!entry.isDirectory) {
        val target = dir.resolve(entry.getName).normalize()
        require(target.startsWith(dir), s"zip entry escapes landing dir: ${entry.getName}")
        Files.createDirectories(target.getParent)
        Files.write(target, zin.readAllBytes())
      }
      zin.closeEntry()
      entry = zin.getNextEntry
    }
    true
  }

  /** S8: fetch one document's text payload (base64 HTML) and land it. */
  def pullBillText(docId: Long, outDir: Path, force: Boolean = false): Boolean = {
    val target = outDir.resolve(s"$docId.html")
    if (Files.exists(target) && !force) return false
    val resp = api("getBillText", "id" -> docId.toString)
    val html = Base64.getDecoder.decode(resp.get("text").get("doc").asText)
    Files.createDirectories(outDir)
    Files.write(target, html)
    true
  }

  /** S10: compact the landed JSON tree into the Parquet landing zone —
    * one distributed scan with the pinned schema, idempotent overwrite. */
  def landParquet(spark: SparkSession, outPath: String): Unit =
    spark.read.schema(LegiScanModel.billSchema)
      .json(s"$landingRoot/*/bill/*.json")
      .write.mode(SaveMode.Overwrite).parquet(outPath)
}
