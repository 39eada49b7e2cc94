package graft

import graft.core.Tables
import graft.llm.{AnnBuckets, SimilarityQueries}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("LSH ANN reaches useful recall vs the exact top-5 oracle") {
    val exact = SimilarityQueries.q19SimilarityTopk
      .run(spark, dir)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val approx = AnnBuckets
      .approxTopK(Tables(spark, dir).embeddings, "vec_id", "embedding", k = 5, nBits = 4, nTables = 4)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.25, s"recall too low: $recall")
    // candidate volume actually shrinks vs brute force (the scale point)
    val n = Tables(spark, dir).embeddings.count()
    assert(approx.size < n * n / 2)
  }

  test("IVF ANN reaches useful recall vs the exact top-5 oracle") {
    val exact = SimilarityQueries.q19SimilarityTopk
      .run(spark, dir)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val approx = graft.llm.IvfIndex
      .approxTopK(Tables(spark, dir).embeddings, "vec_id", "embedding",
        k = 5, nCells = 8, nProbe = 3)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.4, s"IVF recall too low: $recall")
    val n = Tables(spark, dir).embeddings.count()
    assert(approx.size < n * n / 2)
  }

  test("IVF centroids are deterministic and cover all cells") {
    val c1 = graft.llm.IvfIndex.trainCentroids(
      Tables(spark, dir).embeddings, "vec_id", "embedding", k = 8)
    val c2 = graft.llm.IvfIndex.trainCentroids(
      Tables(spark, dir).embeddings, "vec_id", "embedding", k = 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.length == 8 && c1.forall(_.length == 64))
  }

  test("ANN buckets are deterministic for a fixed seed") {
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val b1 = AnnBuckets.withBucket(e, "emb").select("vec_id", "bucket").collect().toSet
    val b2 = AnnBuckets.withBucket(e, "emb").select("vec_id", "bucket").collect().toSet
    assert(b1 == b2)
  }

  test("multimodal: decode stub yields normalized fixed-width features") {
    val media = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val feats = Multimodal.decodeFeatures(media, dims = 16)
    val rows  = feats.select("features").as[Seq[Double]].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.size == 16))
    rows.foreach(h => assert(math.abs(h.sum - 1.0) < 1e-9)) // normalized histogram
  }

  test("multimodal: frame sampling emits n frames per video item") {
    val media  = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val nVideo = media.where(col("kind") === "video").count()
    val frames = Multimodal.frameSample(media, nFrames = 4, frameLen = 32)
    assert(frames.count() == nVideo * 4)
    assert(frames.columns.toSeq == Seq("media_id", "meta", "frame_idx", "frame_bytes"))
  }

  test("multimodal: resize folds feature bins") {
    val media   = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val feats   = Multimodal.decodeFeatures(media, dims = 16)
    val resized = Multimodal.resizeFeatures(feats, outDims = 4)
    val rows    = resized.select("features").as[Seq[Double]].collect()
    assert(rows.forall(_.size == 4))
    rows.foreach(h => assert(math.abs(h.sum - 1.0) < 1e-9))
  }

  test("approx_count_distinct stays inside the HLL error envelope") {
    val li = Tables(spark, dir).lineitem
    val r = li
      .agg(
        approx_count_distinct("l_partkey").as("approx"),
        countDistinct("l_partkey").as("exact"))
      .collect()(0)
    val rel = math.abs(r.getLong(0).toDouble - r.getLong(1)) / r.getLong(1)
    assert(rel < 0.1, s"relative error $rel")
  }
}
