package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hash64

/** Multimodal (image/audio/video) columns as first-class pipeline citizens:
  * media payloads are opaque `binary` columns with typed metadata structs,
  * and decode/feature-extract/resize/frame-sample run as typed
  * `mapPartitions` stages that iterate fixed-size batches (the JVM analogue
  * of an arrow-batched decode UDF).
  *
  * ==== STUB NOTICE ====
  * This container ships no image/audio codecs, so [[MediaCodec.decodeStub]]
  * is a clearly-marked deterministic FAKE: features are derived from payload
  * bytes (chunked byte histograms), not from real pixel/sample decoding. The
  * Spark-side plumbing — schema, encoders, partitioning, batch shape, the
  * operator surface — is real and tested; swapping in a real codec changes
  * only the body of `decodeStub`.
  *
  * Scale posture (100 TB): payloads never pass through a shuffle — feature
  * extraction is scan-shaped `mapPartitions` before any wide operator;
  * only the (small) feature vectors and metadata aggregate afterwards.
  * Batches bound peak memory per task regardless of payload skew.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRateHz: Int,
      durationMs: Long)
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
      meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, feature: Array[Float], feat_norm: Double)
  case class FrameSample(media_id: Long, frame_idx: Int, offset: Int,
      frame: Array[Byte])

  val kinds = Seq("image", "audio", "video")

  /** Synthesize a media table from `documents` (payload = UTF-8 text bytes as
    * the stand-in blob; kind and metadata deterministic in doc_id). Stands in
    * for `spark.read.format("binaryFile")` over a media lake. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(typedLit(kinds), (col("doc_id") % 3 + 1).cast("int"))
          .as("kind"),
        col("text").cast("binary").as("payload"),
        struct(
          (col("doc_id") % 640 + 32).cast("int").as("width"),
          (col("doc_id") % 480 + 32).cast("int").as("height"),
          lit(16000).as("sampleRateHz"),
          (col("doc_id") % 90000 + 1000).as("durationMs")).as("meta"))
      .as[MediaRecord]
  }

  /** Decode + feature-extract, batched `mapPartitions`. Records are processed
    * in groups of `batchSize` (the vectorized-decode batch shape) without
    * materializing the whole partition. */
  def extractFeatures(ds: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary: a real codec would decode `batch` in one
        // vectorized call here
        batch.map(MediaCodec.decodeStub)
      }
    }
  }

  /** "Resize": rewrite target metadata; payload untouched (STUB — a real
    * implementation re-encodes pixels). Shape-preserving narrow op. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size chunk
    * of the payload becomes a frame row (flatMap — one narrow pass). */
  def sampleFrames(ds: Dataset[MediaRecord], frameBytes: Int = 256,
      stride: Int = 4): Dataset[FrameSample] = {
    import ds.sparkSession.implicits._
    ds.filter(_.kind == "video").flatMap { r =>
      val n = r.payload.length / frameBytes
      (0 until n by stride).zipWithIndex.map { case (chunk, idx) =>
        FrameSample(r.media_id, idx, chunk * frameBytes,
          r.payload.slice(chunk * frameBytes, (chunk + 1) * frameBytes))
      }
    }
  }
}

object MediaCodec {
  import Multimodal._

  /** ==== STUB ==== deterministic fake decode: 8 float "features" = byte
    * histograms over 8 payload stripes, L1-normalized; replaces the absent
    * image/audio codec call. Everything downstream treats the output exactly
    * as it would real embeddings. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val nFeat = 8
    val acc = new Array[Double](nFeat)
    var i = 0
    while (i < r.payload.length) {
      acc(i % nFeat) += (r.payload(i) & 0xff) / 255.0
      i += 1
    }
    val total = math.max(acc.sum, 1e-9)
    val feats = acc.map(v => (v / total).toFloat)
    // mix the id in so features differ even for equal payload lengths
    val jitter = (Hash64.mix(r.media_id) & 0xff) / 255.0f * 1e-6f
    feats(0) += jitter
    val norm = math.sqrt(feats.map(f => f.toDouble * f).sum)
    MediaFeatures(r.media_id, r.kind, r.payload.length,
      r.meta.width, r.meta.height, feats, norm)
  }
}
