package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2B north star): image/audio/video travel
  * as opaque `binary` content plus a typed metadata struct; decode /
  * feature-extract / frame-sample / resize operate on that contract.
  *
  * The decode step is a clearly-marked STUB: this container has no codec
  * libraries, so "decoding" is a deterministic byte histogram. Everything
  * around it — the schema, the `mapPartitions` batch shape (the Scala
  * analogue of a Pandas-UDF `mapInPandas` decode), partition-friendly
  * layout, fixed-width feature vectors — is the real production plumbing:
  * swap the histogram body for a codec call and nothing else changes.
  */
object Multimodal {

  /** Demo media table: documents re-cast as opaque binary payloads with
    * typed metadata (kind rotates across image/audio/video by id).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), (col("doc_id") % 3 + 1).cast("int"))
        .as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        lit(64).as("width"),
        lit(64).as("height"),
        lit(16000).as("sample_rate"),
        (length(col("text")) * 10).cast("long").as("duration_ms")).as("meta"))

  /** STUB decode → fixed-width feature vector. Real implementation decodes
    * the codec into pixels/samples inside the same mapPartitions loop
    * (vectorized, one partition = one batch); here the feature is the
    * normalized byte histogram, which keeps the op deterministic and
    * testable without codecs.
    */
  def decodeFeatures(media: DataFrame, dims: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val h = new Array[Double](dims)
          var i = 0
          while (i < bytes.length) { h((bytes(i) & 0xff) % dims) += 1.0; i += 1 }
          val n = math.max(1, bytes.length).toDouble
          (id, h.map(_ / n))
        }
      }
      .toDF("media_id", "features")
  }

  /** Frame sampling for video-kind media: n evenly-spaced byte windows per
    * item, each then decodable independently — `posexplode` keeps it one
    * shuffle-free projection, and downstream decode parallelism scales with
    * frames, not items.
    */
  def frameSample(media: DataFrame, nFrames: Int = 4, frameLen: Int = 32): DataFrame =
    media
      .where(col("kind") === "video")
      .select(
        col("media_id"),
        col("meta"),
        posexplode(expr(
          s"transform(sequence(0, $nFrames - 1), " +
            s"i -> substring(content, 1 + i * int(greatest(length(content) / $nFrames, 1)), $frameLen))"))
          .as(Seq("frame_idx", "frame_bytes")))

  /** Resize in feature space: fold adjacent histogram bins (the stand-in
    * for spatial resize; same contract — array in, smaller array out).
    */
  def resizeFeatures(features: DataFrame, outDims: Int): DataFrame =
    features.select(
      col("media_id"),
      expr(
        s"transform(sequence(0, $outDims - 1), o -> aggregate(" +
          s"transform(sequence(0, int(size(features) / $outDims) - 1), " +
          s"j -> features[o * int(size(features) / $outDims) + j]), 0D, (a, v) -> a + v))")
        .as("features"))
}
