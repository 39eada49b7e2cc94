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

  /** Media ANN search plumbing, hash-oracled (the r14 multimodal→search
    * bridge next to [[Multimodal.mediaNearDupApprox]]): a feature vector
    * per media item rides the FULL LSH candidate path — pinned hyperplane
    * literals, two tables' sign-bit buckets, the within-bucket cosine
    * join, threshold — with every stage replayed in DuckDB. Because
    * binary decode has no SQL oracle (q40/q62 stay rows-only), the
    * ORACLE-REPLAYABLE feature projection here is the typed-metadata +
    * content-stat vector both engines can compute from `documents` (kind
    * one-hots from the q62 rotation, ln-length, char-class ratios),
    * CENTERED by pinned literals so sign-bit buckets actually spread
    * (uncentered stat vectors are near-parallel — the q62 caveat — and
    * would all share one bucket); `decodeFeatures` histograms are the
    * production feature source and their ANN trip is spec-verified with
    * the planted duplicate (AnnMultimodalSpec). Output is the SURVIVOR
    * MAPPING (dup_id → lowest-id neighbour above tau, plus the max
    * similarity), not the raw pair set — pairs above tau on stat features
    * are ~n²-dense, and the q62 resolution shape keeps the result (and
    * any downstream shuffle) linear in the corpus.
    */
  val q138MediaAnnSearch: Declared = {
    val nBits   = 4
    val dims    = 8
    val seed    = 42L
    val nTables = 2
    val tau     = 0.9
    // pinned feature projection — identical SQL fragment in both engines
    def ratio(ch: String) =
      s"(length(text) - length(replace(text, '$ch', ''))) / CAST(length(text) + 1 AS DOUBLE)"
    val center = Seq(5.56, 0.177, 0.078, 0.085, 0.066, 1.0 / 3, 1.0 / 3, 1.0 / 3)
    val raw = Seq(
      "ln(1 + length(text))",
      ratio(" "), ratio("e"), ratio("a"), ratio("t"),
      "CASE WHEN doc_id % 3 = 0 THEN 1.0 ELSE 0.0 END",
      "CASE WHEN doc_id % 3 = 1 THEN 1.0 ELSE 0.0 END",
      "CASE WHEN doc_id % 3 = 2 THEN 1.0 ELSE 0.0 END")
    val feat = raw.zip(center).map { case (f, c) => s"(($f) - $c)" }
    def sqlLit(p: Array[Double]): String = p.mkString("[", ", ", "]")
    val tableSelects = (0 until nTables).map { tb =>
      val ps = graft.llm.AnnBuckets.planes(nBits, dims, seed + tb)
      val bits = ps.zipWithIndex
        .map { case (p, b) =>
          s"(CASE WHEN list_dot_product(emb, ${sqlLit(p)}) > 0 THEN ${1 << b} ELSE 0 END)"
        }
        .mkString("\n       + ")
      s"SELECT media_id, $tb AS table_id, CAST($bits AS INTEGER) AS bucket, emb, nrm FROM n"
    }
    val oracle =
      s"""WITH f AS (SELECT CAST(doc_id AS BIGINT) AS media_id,
         |             [${feat.mkString(",\n              ")}] AS emb
         |           FROM documents),
         |n AS (SELECT media_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM f),
         |b AS (${tableSelects.mkString("\n UNION ALL\n")}),
         |p AS (SELECT DISTINCT a.media_id AS a_id, b2.media_id AS b_id,
         |        round(list_dot_product(a.emb, b2.emb) / (a.nrm * b2.nrm), 6) AS cos_sim
         |      FROM b a JOIN b b2 ON a.table_id = b2.table_id AND a.bucket = b2.bucket
         |                        AND a.media_id < b2.media_id)
         |SELECT b_id AS dup_id, CAST(min(a_id) AS BIGINT) AS survivor_id,
         |       round(max(cos_sim), 6) AS max_sim
         |FROM p WHERE cos_sim >= $tau
         |GROUP BY b_id ORDER BY dup_id""".stripMargin
    Declared.sql("q138_media_ann_search", oracle) { (spark, dir) =>
      import graft.functions.GraftFunctions.dot
      val e = Tables(spark, dir).documents
        .selectExpr(
          "CAST(doc_id AS LONG) AS vec_id",
          s"array(${feat.mkString(", ")}) AS emb")
        .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
      graft.llm.AnnBuckets
        // duplicates allowed (r16): min/max over the pair MULTISET equals
        // min/max over the deduped set — cos_sim is functionally
        // determined by (a_id, b_id) — so the cross-table duplicate-pair
        // shuffle (the query's largest exchange on this ~n²-dense
        // fixture) is pure overhead here
        .candidatePairs(e, nBits, dims, nTables, seed, minSim = Some(tau),
          allowDuplicatePairs = true)
        .where(col("a_id") < col("b_id"))
        .groupBy(col("b_id").as("dup_id"))
        .agg(
          min(col("a_id")).cast("long").as("survivor_id"),
          round(max(col("cos_sim")), 6).as("max_sim"))
        .orderBy("dup_id")
    }
  }

  val all: Seq[Declared] = Seq(q40MultimodalFeatures, q62MediaNeardup, q138MediaAnnSearch)
}
