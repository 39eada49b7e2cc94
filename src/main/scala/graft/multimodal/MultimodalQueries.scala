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

  /** Media near-dup via decoded features: the multimodal leg of the dedup
    * story — decode → fixed-width feature vector → sign-bit LSH bucket →
    * within-bucket cosine ≥ τ. Same scale shape as the embedding near-dup
    * (shuffle key = bucket id, never all-pairs); rows-only because the
    * decode step has no SQL oracle. The fixture's exact-duplicate texts
    * yield identical features (cos 1.0), so the result is non-empty and
    * deterministic; the PNG/WAV payload rows decode to pixel/sample
    * histograms and correctly do NOT pair with text-backed rows.
    */
  val q62MediaNeardup: Declared = Declared.rowsOnly("q62_media_neardup") { (spark, dir) =>
    import graft.llm.AnnBuckets
    val media = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val feats = Multimodal.decodeFeatures(media, dims = 16)
    val bucketed = AnnBuckets
      .withBucket(feats.select(col("media_id"), col("features").as("emb")), "emb", nBits = 4, dims = 16)
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val l = bucketed.select(
      col("bucket"), col("media_id").as("a_id"), col("emb").as("a_emb"), col("nrm").as("a_nrm"))
    val r = bucketed.select(
      col("bucket"), col("media_id").as("b_id"), col("emb").as("b_emb"), col("nrm").as("b_nrm"))
    l.join(r, Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .select(
        col("a_id"),
        col("b_id"),
        round(dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")), 6).as("cos_sim"))
      .where(col("cos_sim") >= 0.9999)
      .orderBy("a_id", "b_id")
  }

  val all: Seq[Declared] = Seq(q40MultimodalFeatures, q62MediaNeardup)
}
