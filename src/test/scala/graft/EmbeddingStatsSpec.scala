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
}
