package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Fixtures

/** Multimodal-column plumbing: opaque `binary` media blobs + typed
  * metadata, processed per-partition in batches.
  *
  * The image decode is REAL (round 13): [[decodeImage]] parses BMP
  * (BITMAPINFOHEADER: little-endian dimensions, signed height for
  * top-down files, bits-per-pixel → channels), binary netpbm
  * (P6/P5, whitespace-and-comment-tolerant header), and PNG
  * (signature + fixed-offset IHDR: big-endian dimensions, color type
  * → channels — the metadata contract is fully determined by IHDR,
  * so this is a complete decode of what the operator promises)
  * straight from the bytes, with no codec library — the same
  * constraint that produced the from-scratch
  * [[graft.sources.PdfText]]. Unrecognized
  * or truncated blobs emit the (0,0,0) sentinel rather than throwing.
  * Everything Spark-side keeps the batch shape: the binary column
  * flows through a typed `Dataset`, `mapPartitions` processes each
  * partition as one batch (the Scala analogue of `mapInPandas`:
  * decoder state is initialized once per partition, never per row),
  * and the output schema is a pinned case class. A compressed-codec
  * swap (JPEG/PNG) changes [[decodeImage]]'s body, no plumbing.
  *
  * Scale: per-partition batching is the only viable shape for
  * codec-heavy work at 100 TB (vectorized handoff, bounded memory per
  * task); blobs never hit the driver; partition count controls batch
  * size.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       channels: Int)

  /** REAL image decode from bytes: BMP and binary netpbm headers.
    * Never throws; anything else (including null/truncated input)
    * yields the (0,0,0) sentinel so corrupt blobs surface as rows, not
    * task failures. The oracle re-derives the same parse in DuckDB via
    * hex()+nibble arithmetic (the q_audio_energy pattern), so this
    * decoder is hash-verified end to end over the committed
    * `media.parquet` fixtures (tools/make_media_fixtures.py). */
  def decodeImage(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    def sentinel = MediaMeta(docId, n, 0, 0, 0)
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    if (n >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) {
      // BITMAPFILEHEADER (14) + BITMAPINFOHEADER: width int32le @18,
      // height SIGNED int32le @22 (negative = top-down storage order,
      // same pixel count), bpp uint16le @28
      val w = le32(18)
      val h = math.abs(le32(22))
      val bpp = le16(28)
      if (w > 0 && h > 0 && (bpp == 8 || bpp == 24 || bpp == 32))
        MediaMeta(docId, n, w, h, bpp / 8)
      else sentinel
    } else if (n >= 2 && bytes(0) == 'P'.toByte &&
      (bytes(1) == '5'.toByte || bytes(1) == '6'.toByte)) {
      // netpbm binary: magic, then width/height/maxval as ASCII ints
      // separated by whitespace; '#' comments run to end of line
      var i = 2
      def nextInt(): Int = {
        var going = true
        while (going && i < n) {
          val b = bytes(i)
          if (b == '#'.toByte) { while (i < n && bytes(i) != '\n'.toByte) i += 1 }
          else if (b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
            b == '\r'.toByte || b == '\f'.toByte || b == 11) i += 1
          else going = false
        }
        var v = -1
        while (i < n && bytes(i) >= '0'.toByte && bytes(i) <= '9'.toByte) {
          v = math.max(v, 0) * 10 + (bytes(i) - '0'.toByte); i += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val mx = nextInt()
      if (w > 0 && h > 0 && mx > 0)
        MediaMeta(docId, n, w, h, if (bytes(1) == '6'.toByte) 3 else 1)
      else sentinel
    } else if (n >= 33 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte &&
      bytes(3) == 'G'.toByte && (bytes(4) & 0xff) == 0x0d &&
      (bytes(5) & 0xff) == 0x0a && (bytes(6) & 0xff) == 0x1a &&
      (bytes(7) & 0xff) == 0x0a && bytes(12) == 'I'.toByte &&
      bytes(13) == 'H'.toByte && bytes(14) == 'D'.toByte &&
      bytes(15) == 'R'.toByte) {
      // PNG: 8-byte signature, then the IHDR chunk at a FIXED offset
      // (length+tag at 8..15): width/height big-endian uint32 @16/@20,
      // bit depth @24, color type @25. The metadata contract needs
      // nothing past IHDR — width/height/channels are fully determined
      // here (channels = f(color type)); IDAT stays opaque bytes.
      def be32(o: Int): Long =
        ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
          ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      val w = be32(16); val h = be32(20)
      val depth = bytes(24) & 0xff
      val nch = (bytes(25) & 0xff) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => 0
      }
      val depthOk = depth == 1 || depth == 2 || depth == 4 ||
        depth == 8 || depth == 16
      if (w > 0 && w <= Int.MaxValue && h > 0 && h <= Int.MaxValue &&
          depthOk && nch > 0)
        MediaMeta(docId, n, w.toInt, h.toInt, nch)
      else sentinel
    } else sentinel
  }

  /** Batch feature extraction over (id, blob) rows. The partition
    * iterator is the batch: heavier codecs hoist their init here. */
  def extractMeta(media: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition decoder init would go here (once, not per row)
      batch.map { case (id, bytes) => decodeImage(id, bytes) }
    }
  }

  /** Driver-contract query: REAL header decode over the committed
    * image fixtures (BMP 8/24/32-bit incl. top-down, PPM/PGM, junk
    * sentinels — tools/make_media_fixtures.py). */
  def qMediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Fixtures.media(spark)
      .select(col("doc_id"), unbase64(col("payload_b64")).as("blob"))
      .as[(Long, Array[Byte])]
    extractMeta(blobs).toDF().orderBy(col("doc_id"))
  }

  case class Frame(doc_id: Long, frame_idx: Long, frame_len: Long)

  val FrameChunkBytes = 1024
  val FrameEvery = 3

  /** Frame sampling: split each blob into fixed-size chunks and keep
    * every k-th — the video-frame-sampling batch shape (one input row →
    * many frame rows, emitted from the partition iterator, so a real
    * decoder would stream frames without materializing the whole medium
    * per row). The chunking is real byte-slicing; only the notion that
    * a chunk IS a frame is the stub. */
  def frameSample(media: Dataset[(Long, Array[Byte])],
                  chunk: Int = FrameChunkBytes,
                  every: Int = FrameEvery): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { case (id, bytes) =>
        val nChunks = (bytes.length + chunk - 1) / chunk
        (0 until nChunks).iterator
          .filter(_ % every == 0)
          .map { i =>
            val len = math.min(chunk, bytes.length - i * chunk)
            Frame(id, i.toLong, len.toLong)
          }
      }
    }
  }

  def qMediaFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Fixtures.docPayloads(spark)
      .select(col("doc_id"), unbase64(col("payload_b64")).as("blob"))
      .as[(Long, Array[Byte])]
    frameSample(blobs).toDF().orderBy(col("doc_id"), col("frame_idx"))
  }

  val ResizeFactor = 2

  case class ResizedMeta(doc_id: Long, n_bytes: Int, resized_bytes: Int,
                         width: Int, height: Int)

  /** Resize: keep every factor²-th byte — real slicing standing in for
    * a bilinear downsample kernel (a kernel swap changes one line, not
    * this plumbing); dimensions come from the REAL [[decodeImage]]
    * header parse and shrink by `factor`, rounding up (sentinel 0×0
    * stays 0×0). Returns the resized blob alongside its metadata, the
    * shape a downstream re-encode stage consumes. */
  def resizeDown(id: Long, bytes: Array[Byte],
                 factor: Int): (ResizedMeta, Array[Byte]) = {
    val step = factor * factor
    val out = Array.tabulate((bytes.length + step - 1) / step)(i => bytes(i * step))
    val m = decodeImage(id, bytes)
    (ResizedMeta(id, m.n_bytes, out.length,
      (m.width + factor - 1) / factor, (m.height + factor - 1) / factor), out)
  }

  def resize(media: Dataset[(Long, Array[Byte])],
             factor: Int = ResizeFactor): Dataset[(ResizedMeta, Array[Byte])] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { case (id, bytes) => resizeDown(id, bytes, factor) }
    }
  }

  def qMediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Fixtures.media(spark)
      .select(col("doc_id"), unbase64(col("payload_b64")).as("blob"))
      .as[(Long, Array[Byte])]
    resize(blobs).map(_._1).toDF().orderBy(col("doc_id"))
  }

  // --- perceptual near-dup over media blobs ---

  /** Perceptual-hash geometry: 60 bits (the repo's standard width),
    * 4 × 15-bit bands — pigeonhole guarantees any pair within hamming
    * distance [[PhashHammingMax]] = bands − 1 shares an intact band,
    * the same recall argument as the simhash60 banding. */
  val PhashBits = 60
  val PhashBands = 4
  val PhashBandBits = 15
  val PhashHammingMax = 3

  /** dHash-SHAPED 60-bit perceptual fingerprint over the raw byte
    * stream: 61 sample points spread evenly across the blob
    * (`p_i = ⌊i·(n−1)/60⌋`), bit i set when `byte[p_i] > byte[p_i+1]`
    * — the gradient-sign construction of the classic image dHash,
    * applied at the byte level per the media-stub convention
    * ([[resizeDown]]): a true pixel dHash swaps this sampler for
    * decoded grayscale rows, and the banding, pair machinery and
    * oracle stay identical. Length-normalized sampling makes the
    * print stable under uniform re-encoding of the whole blob, NOT
    * under real image edits (that robustness needs the pixel kernel).
    * Blobs under 2 bytes carry no gradient and emit nothing. */
  def perceptualHash(bytes: Array[Byte]): Option[Long] = {
    val n = if (bytes == null) 0 else bytes.length
    if (n < 2) None
    else {
      var h = 0L
      var i = 0
      while (i < PhashBits) {
        val a = bytes(((i.toLong * (n - 1)) / PhashBits).toInt) & 0xff
        val b = bytes((((i + 1).toLong * (n - 1)) / PhashBits).toInt) & 0xff
        if (a > b) h |= (1L << i)
        i += 1
      }
      Some(h)
    }
  }

  def phashes(media: Dataset[(Long, Array[Byte])]): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { case (id, b) => perceptualHash(b).map(h => (id, h)) }
      .toDF("doc_id", "phash")
  }

  def qMediaPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Fixtures.media(spark)
      .select(col("doc_id"), unbase64(col("payload_b64")).as("blob"))
      .as[(Long, Array[Byte])]
    phashes(blobs).orderBy(col("doc_id"))
  }

  /** Perceptual near-dup pairs over the banded fingerprints — image
    * dedup as the text dedup family does it, HOT-BUCKET-GUARDED the
    * same way: blobs collapse to one representative per DISTINCT
    * hash before banding (an identical-asset clique — the logo served
    * a million times — is one band row, and its intra-group pairs
    * expand as pure hamming-0 output, never candidate waste), reps
    * pair via (band, sig) equi-joins, and the exact `bit_count(xor)`
    * verify keeps pairs within [[PhashHammingMax]]. */
  def mediaNearDups(media: Dataset[(Long, Array[Byte])],
                    radius: Int = PhashHammingMax): DataFrame = {
    require(radius <= PhashBands - 1,
      s"banding only guarantees recall to hamming ${PhashBands - 1}")
    val groups = phashes(media)
      .groupBy(col("phash"))
      .agg(min(col("doc_id")).as("rep"), collect_list(col("doc_id")).as("members"))
    val bands = groups.select(col("phash"), col("rep"), col("members"),
      explode(array((0 until PhashBands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("phash"), b * PhashBandBits)
            .bitwiseAND(lit((1L << PhashBandBits) - 1)).as("sig"))): _*))
        .as("bs"))
      .select(col("phash"), col("rep"), col("members"),
        col("bs.band").as("band"), col("bs.sig").as("sig"))
    val cross = bands.select(col("band"), col("sig"), col("rep").as("ra"),
        col("phash").as("ha"), col("members").as("ma"))
      .join(bands.select(col("band"), col("sig"), col("rep").as("rb"),
        col("phash").as("hb"), col("members").as("mb")), Seq("band", "sig"))
      .filter(col("ra") < col("rb"))
      .dropDuplicates("ra", "rb")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= radius)
      .select(explode(col("ma")).as("pa"), col("mb"), col("hamming"))
      .select(col("pa"), explode(col("mb")).as("pb"), col("hamming"))
      .select(least(col("pa"), col("pb")).as("doc_a"),
        greatest(col("pa"), col("pb")).as("doc_b"), col("hamming"))
    val intra = groups.filter(size(col("members")) > 1)
      .select(col("members"))
      .select(explode(col("members")).as("doc_a"), col("members"))
      .select(col("doc_a"), explode(col("members")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", lit(0))
    cross.unionByName(intra)
  }

  def qMediaNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Fixtures.media(spark)
      .select(col("doc_id"), unbase64(col("payload_b64")).as("blob"))
      .as[(Long, Array[Byte])]
    mediaNearDups(blobs).orderBy(col("doc_a"), col("doc_b"))
  }

  // --- audio: raw PCM interpretation (a REAL decode, no codec needed) ---

  case class AudioFrame(doc_id: Long, frame_idx: Long, n_samples: Int,
                        energy: Long, silent: Boolean)

  val AudioFrameSamples = 256

  /** Silence gate: a frame is silent when its MEAN sample energy is
    * under this (≈ amplitude 1000 on the int16 scale). */
  val SilenceEnergyPerSample = 1000000L

  /** Frame energy over signed 16-bit little-endian PCM — unlike the
    * image/video stubs, THIS decode is real: raw-PCM interpretation
    * needs no codec, just byte arithmetic, so the whole path (including
    * the oracle) runs on true sample values. Per blob: consecutive byte
    * pairs become int16 samples (trailing odd byte dropped), frames of
    * [[AudioFrameSamples]] samples each report an exact integer
    * sum-of-squares energy and a silence flag — the trim/VAD front-end
    * of an audio training pipeline. Emitted from the partition
    * iterator like [[frameSample]]; integer arithmetic end to end, so
    * the frame table is hash-oracle-checkable (the DuckDB twin reads
    * the same bytes through `hex()` + nibble arithmetic). */
  def pcmFrameEnergy(media: Dataset[(Long, Array[Byte])],
                     frameSamples: Int = AudioFrameSamples): Dataset[AudioFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // null blobs carry no samples — drop, don't NPE (the oracle's
      // octet_length(NULL) row-drop agrees; NullRobustness contract)
      batch.filter(_._2 != null).flatMap { case (id, bytes) =>
        val nSamples = bytes.length / 2
        val nFrames = (nSamples + frameSamples - 1) / frameSamples
        (0 until nFrames).iterator.map { f =>
          val start = f * frameSamples
          val end = math.min(nSamples, start + frameSamples)
          var e = 0L
          var i = start
          while (i < end) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1).toInt // SIGNED high byte: s16le
            val s = (hi << 8) | lo
            e += s.toLong * s
            i += 1
          }
          val n = end - start
          AudioFrame(id, f.toLong, n, e, e < SilenceEnergyPerSample * n)
        }
      }
    }
  }

  def qAudioEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Fixtures.docPayloads(spark)
      .select(col("doc_id"), unbase64(col("payload_b64")).as("blob"))
      .as[(Long, Array[Byte])]
    pcmFrameEnergy(blobs).toDF().orderBy(col("doc_id"), col("frame_idx"))
  }
}
