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

  /** Media dedup via decoded features: the multimodal leg of the dedup
    * story — decode → fixed-width feature vector → EXACT-duplicate
    * grouping by feature hash → (duplicate, survivor) mapping, survivor =
    * lowest media_id of the group.
    *
    * Scale rationale: an LSH-bucketed cosine pair join was tried first and
    * went quadratic on this data (5+ s at sf0.1) — decoded histograms of
    * same-domain media are nearly parallel vectors, so they share sign-bit
    * buckets under ANY plane count, and near-identical inputs are exactly
    * the case LSH cannot thin. Duplicate-media detection wants the exact
    * grouping shape instead: one shuffle on a 16-byte feature digest,
    * output LINEAR in the duplicate count (the survivor mapping, not the
    * quadratic pair set). The similarity-range variants stay where vectors
    * actually spread: q41/q50 on real embeddings. Rows-only (binary decode
    * has no SQL oracle). On the fixture, the planted duplicate PNG
    * (ids 3 and 6 share [[Multimodal.samplePngBytes]]) is the expected
    * mapping — (6 → 3) — while the WAV row and the distinct-text rows
    * have unique features and map to no survivor.
    */
  val q62MediaNeardup: Declared = Declared.rowsOnly("q62_media_neardup") { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val media = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val feats = Multimodal.decodeFeatures(media, dims = 16)
    val hashed = feats.withColumn("fh", md5(to_json(col("features"))))
    val w      = Window.partitionBy("fh")
    hashed
      .withColumn("survivor_id", min("media_id").over(w))
      .where(col("media_id") =!= col("survivor_id"))
      .select(col("media_id").as("dup_id"), col("survivor_id"))
      .orderBy("dup_id")
  }

  val all: Seq[Declared] = Seq(q40MultimodalFeatures, q62MediaNeardup)
}
