package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.layout.MediaOcr

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque BINARY columns with typed metadata.
  *
  * The decode step is STUBBED (this container has no image/audio codecs)
  * with a deterministic fake driven by the payload bytes — but the
  * Spark-side plumbing is real and tested: schema, per-partition batch
  * shape (mapPartitions over iterators, the Scala analogue of
  * mapInPandas), partitioning, and the feature-vector output contract
  * (Array[Float], ready for the SimilarityQ operators).
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,    // images/video
      height: Int,
      sample_rate: Int) // audio

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      /** 16-bin byte histogram, L1-normalized — the embedding stand-in */
      features: Array[Float],
      /** decode-stub outputs (deterministic fake, NOT a real decoder) */
      mean_luma: Float,
      n_frames: Int)

  /** Deterministic synthetic media table (no external data): payload
    * bytes from splitmix64 of media_id. */
  def genTable(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val kind = (id % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val len = 256 + (MediaOcr.hash64(s"len:$id") & 0x3FF).toInt
      val bytes = new Array[Byte](len)
      var h = MediaOcr.hash64(s"payload:$id")
      var i = 0
      while (i < len) {
        bytes(i) = (h >>> ((i % 8) * 8)).toByte
        if (i % 8 == 7) h = MediaOcr.hash64(s"payload:$id:$i")
        i += 1
      }
      MediaRow(id, kind, bytes,
        width = 64 + (id % 8).toInt * 16,
        height = 64 + (id % 5).toInt * 16,
        sample_rate = if (kind == "audio") 16000 else 0)
    }
  }

  /** STUB decode: a real implementation would decode the codec here; the
    * deterministic fake derives "luma" from payload bytes so downstream
    * plumbing (schema, batching, aggregation) is exercised end-to-end. */
  private def decodeStubLuma(payload: Array[Byte]): Float = {
    var s = 0L
    var i = 0
    while (i < payload.length) { s += (payload(i) & 0xFF); i += 1 }
    (s.toDouble / Math.max(1, payload.length)).toFloat / 255f
  }

  /** Frame sampling for video: every `stride` bytes starts a "frame"
    * (stub for codec frame boundaries); returns frame count. */
  private def frameCount(kind: String, payload: Array[Byte], stride: Int = 128): Int =
    if (kind == "video") Math.max(1, payload.length / stride) else 1

  /** The batched featurizer: mapPartitions over the typed Dataset — one
    * iterator pass per partition, no per-row task overhead, the batch
    * shape a real decoder (JNI/Arrow) would want. */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val hist = new Array[Float](16)
        var i = 0
        while (i < row.payload.length) {
          hist((row.payload(i) & 0xFF) >> 4) += 1f
          i += 1
        }
        val n = Math.max(1, row.payload.length).toFloat
        var j = 0
        while (j < 16) { hist(j) = hist(j) / n; j += 1 }
        MediaFeatures(row.media_id, row.kind, row.payload.length, hist,
          decodeStubLuma(row.payload), frameCount(row.kind, row.payload))
      }
    }
  }

  /** Query entry: features + brute-force cosine near-dup pairs over the
    * 16-dim histograms (threshold 0.999 — byte histograms of random
    * payloads are near-uniform, so only near-identical payloads pair). */
  def qMediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = featurize(genTable(spark, 200)).toDF()
    feats.select(col("media_id"), col("kind"), col("n_bytes"),
        round(col("mean_luma"), 4).as("luma_r"), col("n_frames"))
      .orderBy(col("media_id"))
  }
}
