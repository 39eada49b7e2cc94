package graft.multimodal

import graft.core.Tables
import graft.functions.GraftFunctions.dot
import graft.queries.Declared
import org.apache.spark.sql.functions._

/** Declared multimodal pipeline query: opaque binary media → real decode
  * (PNG/WAV payloads ride in the demo table; other rows take the
  * byte-histogram fallback) → fixed-width features → per-kind stats.
  * Rows-only (binary decode has no SQL oracle); decode correctness and
  * determinism are asserted in AnnMultimodalSpec against generated media.
  */
object MultimodalQueries {

  val q40MultimodalFeatures: Declared = Declared.rowsOnly("q40_multimodal_features") { (spark, dir) =>
    val media    = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val features = Multimodal.decodeFeatures(media, dims = 16)
    media
      .join(features, "media_id")
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n"),
        round(avg(sqrt(dot(col("features"), col("features")))), 6).as("avg_feature_norm"),
        round(avg(col("meta.duration_ms")), 2).as("avg_duration_ms"))
      .orderBy("kind")
  }

  val all: Seq[Declared] = Seq(q40MultimodalFeatures)
}
