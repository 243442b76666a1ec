package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Fixtures

/** Multimodal-column plumbing: opaque `binary` media blobs + typed
  * metadata, processed per-partition in batches.
  *
  * The decode step is a clearly-marked deterministic STUB — this
  * container has no image/audio codecs — but everything Spark-side is
  * real: the binary column flows through a typed `Dataset`,
  * `mapPartitions` processes each partition as one batch (the Scala
  * analogue of `mapInPandas`' batch shape: decoder state is initialized
  * once per partition, amortized over its rows, never per row), and the
  * output schema is a pinned case class. Swapping [[decodeStub]] for a
  * real codec changes no plumbing.
  *
  * Scale: per-partition batching is the only viable shape for
  * codec-heavy work at 100 TB (vectorized handoff, bounded memory per
  * task); blobs never hit the driver; partition count controls batch
  * size.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       channels: Int)

  /** STUB decoder: deterministic pseudo-metadata derived only from blob
    * length — stands in for a real image decode (`???` would be the
    * honest alternative; a deterministic fake keeps the pipeline
    * testable end-to-end). */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    // n*7 in Long: an Int multiply overflows (negative height) for
    // blobs over ~306 MB, diverging from the oracle's BIGINT arithmetic
    MediaMeta(docId, n, n % 640 + 1, (n.toLong * 7 % 480 + 1).toInt, 3)
  }

  /** Batch feature extraction over (id, blob) rows. The partition
    * iterator is the batch: real decoders hoist codec init here. */
  def extractMeta(media: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition decoder init would go here (once, not per row)
      batch.map { case (id, bytes) => decodeStub(id, bytes) }
    }
  }

  /** Driver-contract query: metadata over the fixture payload blobs
    * (base64 API payloads decoded to binary — the S2/S8 landing shape). */
  def qMediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Fixtures.docPayloads(spark)
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

  /** Resize: keep every factor²-th byte — REAL slicing standing in for a
    * bilinear downsample kernel (a codec swap changes the kernel, not
    * this plumbing); dimensions shrink by `factor`, rounding up. Returns
    * the resized blob alongside its metadata, the shape a downstream
    * re-encode stage consumes. */
  def resizeStub(id: Long, bytes: Array[Byte],
                 factor: Int): (ResizedMeta, Array[Byte]) = {
    val step = factor * factor
    val out = Array.tabulate((bytes.length + step - 1) / step)(i => bytes(i * step))
    val m = decodeStub(id, bytes)
    (ResizedMeta(id, m.n_bytes, out.length,
      (m.width + factor - 1) / factor, (m.height + factor - 1) / factor), out)
  }

  def resize(media: Dataset[(Long, Array[Byte])],
             factor: Int = ResizeFactor): Dataset[(ResizedMeta, Array[Byte])] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { case (id, bytes) => resizeStub(id, bytes, factor) }
    }
  }

  def qMediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Fixtures.docPayloads(spark)
      .select(col("doc_id"), unbase64(col("payload_b64")).as("blob"))
      .as[(Long, Array[Byte])]
    resize(blobs).map(_._1).toDF().orderBy(col("doc_id"))
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
