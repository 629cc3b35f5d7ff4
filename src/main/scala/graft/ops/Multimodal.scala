package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads with typed
  * metadata, and a feature-extraction pass with the real Spark plumbing
  * (typed Dataset, mapPartitions with intra-partition batching — the Scala
  * analogue of mapInPandas' batch iteration).
  *
  * NOTE: the actual media decode is a STUB — image/audio codecs are not in
  * this container. `decodeStub` derives deterministic fake features from
  * the payload bytes; swap its body for a real decoder (JavaCV etc.)
  * without touching the surrounding schema/partitioning/batching.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int)

  case class MediaFeatures(doc_id: Long, kind: String, byte_len: Int,
      n_frames: Int, checksum: Long)

  /** Resized/sampled representation: target dims after aspect-preserving
    * resize (STUB arithmetic on metadata — a real decoder resizes pixels),
    * plus up to `maxFrames` evenly-spaced frame byte-offsets (the
    * frame-sample access pattern a video pipeline feeds the decoder). */
  case class MediaSample(doc_id: Long, kind: String, out_w: Int, out_h: Int,
      frame_offsets: Array[Long])

  def sampleFrames(media: DataFrame, targetW: Int = 224,
      maxFrames: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(64).flatMap(_.map { r =>
        val w = math.max(r.width, 1)
        val scale = targetW.toDouble / w
        // scale the RAW height and clamp the RESULT (clamping height
        // before scaling would turn a degenerate 0-height medium into
        // out_h = scale instead of the 1-pixel floor)
        val n = math.min(maxFrames, r.payload.length / 1024 + 1)
        val stride = math.max(r.payload.length / math.max(n, 1), 1)
        MediaSample(r.doc_id, r.kind, targetW,
          math.max((r.height * scale).toInt, 1),
          Array.tabulate(n)(i => i.toLong * stride))
      })
    }.toDF()
  }

  /** Build a media table from documents: payload = UTF-8 bytes of the text
    * (the deterministic stand-in for real image/audio bytes), kind cycles
    * image/audio/video, width/height derived from n_chars. */
  def toMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      pmod(col("n_chars"), lit(640)).cast("int").as("width"),
      pmod(col("n_chars"), lit(480)).cast("int").as("height"))

  /** STUB decoder: in production this calls the codec; here it computes
    * deterministic pseudo-features so the pipeline is fully testable. */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    var checksum = 0L
    var i = 0
    while (i < r.payload.length) {
      checksum = (checksum * 31 + (r.payload(i) & 0xff)) & 0x7fffffffffffffffL
      i += 1
    }
    MediaFeatures(r.doc_id, r.kind, r.payload.length,
      r.payload.length / 1024 + 1, checksum)
  }

  /** Feature extraction over the media table: typed mapPartitions, batched
    * 64 records at a time inside each partition (the batch shape a
    * vectorized decoder wants). Runs embarrassingly parallel — one task per
    * input split, no shuffle. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRecord] = media.as[MediaRecord]
    ds.mapPartitions { it =>
      it.grouped(64).flatMap { batch => batch.map(decodeStub) }
    }.toDF()
  }

  /** Oracle-checkable projection of the feature pass (checksum is covered
    * by ScalaTest instead — byte-level arithmetic isn't DuckDB SQL). */
  def mediaFeatureSummary(documents: DataFrame): DataFrame =
    extractFeatures(toMediaTable(documents))
      .select(col("doc_id"), col("kind"), col("byte_len"), col("n_frames"))
}
