package graft

import graft.llm.EmbeddingStats
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // label 0: vectors (0,0), (2,0), (0,2) → centroid (2/3, 2/3)
  // label 1: vectors (1,1), (1,3)        → centroid (1, 2)
  private def vecs = Seq(
    (1L, 0, Seq(0.0f, 0.0f)),
    (2L, 0, Seq(2.0f, 0.0f)),
    (3L, 0, Seq(0.0f, 2.0f)),
    (4L, 1, Seq(1.0f, 1.0f)),
    (5L, 1, Seq(1.0f, 3.0f)))
    .toDF("vec_id", "label", "embedding")

  test("labelCentroidDistances matches hand-computed euclidean distances") {
    val got = EmbeddingStats
      .labelCentroidDistances(vecs, "vec_id", "label", "embedding")
      .orderBy("vec_id")
      .as[(Long, Int, Double)]
      .collect()
      .toSeq
    val c0   = (2.0 / 3, 2.0 / 3)
    val want = Seq(
      1L -> math.sqrt(c0._1 * c0._1 + c0._2 * c0._2),
      2L -> math.sqrt((2 - c0._1) * (2 - c0._1) + c0._2 * c0._2),
      3L -> math.sqrt(c0._1 * c0._1 + (2 - c0._2) * (2 - c0._2)),
      4L -> 1.0,
      5L -> 1.0)
    got.zip(want).foreach { case ((id, _, d), (wid, wd)) =>
      assert(id == wid)
      assert(math.abs(d - wd) < 1e-9, s"vec $id: $d vs $wd")
    }
  }

  test("labelOutliers ranks by rounded distance desc with id tie-break, k bounds each label") {
    val got = EmbeddingStats
      .labelOutliers(vecs, "vec_id", "label", "embedding", k = 2)
      .orderBy("label", "rk")
      .select("label", "rk", "vec_id")
      .as[(Int, Int, Long)]
      .collect()
      .toSeq
    // label 0: dists ≈ 0.943, 1.491, 1.491 → top2 = vec 2 (tie → lower id), vec 3
    // label 1: both exactly 1.0 → ids 4, 5
    assert(got == Seq((0, 1, 2L), (0, 2, 3L), (1, 1, 4L), (1, 2, 5L)))
  }

  test("covarianceMatrix matches hand-computed ddof=1 covariances, upper triangle only") {
    import spark.implicits._
    // columns: x = (1,2,3), y = (2,4,6), z = (5,5,5)
    // var(x)=1, cov(x,y)=2, var(y)=4, cov(*,z)=0, var(z)=0
    val df = Seq(
      (1L, Seq(1.0, 2.0, 5.0)),
      (2L, Seq(2.0, 4.0, 5.0)),
      (3L, Seq(3.0, 6.0, 5.0))).toDF("id", "emb")
    val got = EmbeddingStats
      .covarianceMatrix(df, "emb")
      .orderBy("i", "j")
      .as[(Int, Int, Double)]
      .collect()
      .toSeq
    assert(got == Seq(
      (1, 1, 1.0), (1, 2, 2.0), (1, 3, 0.0),
      (2, 2, 4.0), (2, 3, 0.0),
      (3, 3, 0.0)))
  }

  test("covarianceMatrix rejects singleton and ragged inputs") {
    import spark.implicits._
    val one = Seq((1L, Seq(1.0, 2.0))).toDF("id", "emb")
    assertThrows[IllegalArgumentException](EmbeddingStats.covarianceMatrix(one, "emb"))
    // ragged rows may meet in seqOp (same partition → SparkException wraps
    // the require) or only in combOp (driver-side merge → bare IAE)
    val ragged = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0))).toDF("id", "emb")
    assertThrows[Exception](EmbeddingStats.covarianceMatrix(ragged, "emb"))
  }

  test("robustScale: hand-computed median/IQR; constant dims divide by 1") {
    // dim 1 values: 1,2,3,4,5 → med 3, IQR 4-2=2; dim 2 constant 7 → IQR 0 → /1
    val df = Seq(
      (1L, Seq(1.0f, 7.0f)),
      (2L, Seq(2.0f, 7.0f)),
      (3L, Seq(3.0f, 7.0f)),
      (4L, Seq(4.0f, 7.0f)),
      (5L, Seq(5.0f, 7.0f))).toDF("vec_id", "embedding")
    val got = EmbeddingStats
      .robustScale(df, "vec_id", "embedding")
      .orderBy("vec_id", "dim")
      .as[(Long, Int, Double)]
      .collect()
      .toSeq
    val wantDim1 = Seq(-1.0, -0.5, 0.0, 0.5, 1.0)
    assert(got.filter(_._2 == 1).map(_._3) == wantDim1)
    assert(got.filter(_._2 == 2).forall(_._3 == 0.0), "constant dim scales to 0, not NaN")
  }

  test("pcaBasis recovers a planted dominant direction; components orthonormal") {
    // variance 100 along (1,1,0)/√2, variance 1 along (1,-1,0)/√2, 0.01 along z
    val dirA = Array(1.0, 1.0, 0.0).map(_ / math.sqrt(2))
    val dirB = Array(1.0, -1.0, 0.0).map(_ / math.sqrt(2))
    val rnd  = new scala.util.Random(7)
    val rows = (1L to 300L).map { i =>
      val (a, b, c) = (rnd.nextGaussian() * 10, rnd.nextGaussian() * 1, rnd.nextGaussian() * 0.1)
      (i, Seq.tabulate(3)(d => (a * dirA(d) + b * dirB(d) + (if (d == 2) c else 0.0)).toFloat))
    }
    val df                  = rows.toDF("vec_id", "embedding")
    val (_, comps, evs)     = EmbeddingStats.pcaBasis(df, "embedding", k = 2)
    def dot(x: Array[Double], y: Array[Double]) = x.zip(y).map { case (p, q) => p * q }.sum
    assert(math.abs(dot(comps(0), dirA)) > 0.99, s"pc1 not aligned: ${comps(0).toSeq}")
    assert(math.abs(dot(comps(1), dirB)) > 0.99, s"pc2 not aligned: ${comps(1).toSeq}")
    assert(evs(0) > evs(1) && evs(1) > 0, s"eigenvalues not descending: ${evs.toSeq}")
    assert(math.abs(dot(comps(0), comps(1))) < 1e-6, "components not orthogonal")
    assert(math.abs(dot(comps(0), comps(0)) - 1.0) < 1e-9, "pc1 not unit")
  }

  test("pcaProject is centered, deterministic, and variance-ordered") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map { i =>
      (i, Seq.tabulate(4)(d => (rnd.nextGaussian() * (4 - d)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val a  = EmbeddingStats.pcaProject(df, "vec_id", "embedding", k = 2).orderBy("vec_id")
    val b  = EmbeddingStats.pcaProject(df, "vec_id", "embedding", k = 2).orderBy("vec_id")
    assert(a.collect().toSeq == b.collect().toSeq, "same input → same projection")
    val pcs   = a.as[(Long, Double, Double)].collect()
    val mean1 = pcs.map(_._2).sum / pcs.length
    val mean2 = pcs.map(_._3).sum / pcs.length
    assert(math.abs(mean1) < 0.05 && math.abs(mean2) < 0.05, "projections not centered")
    def variance(xs: Array[Double]) = { val m = xs.sum / xs.length; xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1) }
    assert(
      variance(pcs.map(_._2)) > variance(pcs.map(_._3)),
      "pc1 must carry more variance than pc2")
  }

  test("corpus diff classifies added/removed/changed/unchanged") {
    import graft.llm.CorpusDiff
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val v2 = Seq((2L, "b"), (3L, "C2"), (4L, "d")).toDF("doc_id", "text")
    val got = CorpusDiff
      .diff(v1, v2, "doc_id", Seq("text"))
      .orderBy("doc_id")
      .as[(Long, String)]
      .collect()
      .toSeq
    assert(got == Seq(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("corpus diff digest covers every content column, not just the first") {
    import graft.llm.CorpusDiff
    val v1 = Seq((1L, "a", "x")).toDF("doc_id", "text", "meta")
    val v2 = Seq((1L, "a", "y")).toDF("doc_id", "text", "meta")
    val got =
      CorpusDiff.diff(v1, v2, "doc_id", Seq("text", "meta")).as[(Long, String)].collect()
    assert(got.toSeq == Seq(1L -> "changed"))
  }
}
