package graft

import graft.core.Tables
import graft.llm.BruteForce
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exact-similarity kernel's two physical strategies must agree
  * bit-for-bit, the size guard must point at the ANN paths, and zero-norm
  * (NaN-cosine) vectors must follow the engines' NaN-greatest ordering.
  */
class BruteForceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables(spark, dir).embeddings

  test("block-partitioned topK ≡ broadcast topK on the test corpus") {
    val v = BruteForce.vecs(emb, "vec_id", "embedding")
    TestSpark.assertFrameEqual(
      BruteForce.topKBlocked(spark, v, k = 5, nBlocks = 3),
      BruteForce.topKBroadcast(spark, v, k = 5))
  }

  test("block-partitioned neardupPairs ≡ broadcast neardupPairs") {
    val v = BruteForce.vecs(emb, "vec_id", "embedding")
    TestSpark.assertFrameEqual(
      BruteForce.neardupPairsBlocked(spark, v, tau = 0.4, nBlocks = 3),
      BruteForce.neardupPairsBroadcast(spark, v, tau = 0.4))
  }

  test("public API dispatches to the block path above broadcastRows, same result") {
    // broadcastRows = 1 forces every row count onto the block path
    val blocked = BruteForce.topK(spark, emb, "vec_id", "embedding", k = 5,
      broadcastRows = 1, blockRows = 7)
    val bcast = BruteForce.topK(spark, emb, "vec_id", "embedding", k = 5)
    TestSpark.assertFrameEqual(blocked, bcast)
  }

  test("strided ids (shared factor with block count) still agree with broadcast") {
    // all ids multiples of 8 with nBlocks=8: un-hashed floorMod would
    // collapse every row into block 0; hashed assignment must both
    // balance and stay correct
    val v8 = BruteForce
      .vecs(emb, "vec_id", "embedding")
      .map { case (id, e) => (id * 8, e) }
    TestSpark.assertFrameEqual(
      BruteForce.topKBlocked(spark, v8, k = 3, nBlocks = 8),
      BruteForce.topKBroadcast(spark, v8, k = 3))
    TestSpark.assertFrameEqual(
      BruteForce.neardupPairsBlocked(spark, v8, tau = 0.4, nBlocks = 8),
      BruteForce.neardupPairsBroadcast(spark, v8, tau = 0.4))
  }

  test("size guard fails fast and names the ANN scale paths") {
    val err = intercept[IllegalArgumentException] {
      BruteForce.topK(spark, emb, "vec_id", "embedding", k = 5, maxExactRows = 3)
    }
    assert(err.getMessage.contains("AnnBuckets.approxTopK"), err.getMessage)
    assert(err.getMessage.contains("IvfIndex.approxTopK"), err.getMessage)
    val err2 = intercept[IllegalArgumentException] {
      BruteForce.neardupPairs(spark, emb, "vec_id", "embedding", tau = 0.4, maxExactRows = 3)
    }
    assert(err2.getMessage.contains("IvfIndex.approxTopK"), err2.getMessage)
  }

  test("zero-norm vector: NaN cosine ranks greatest and passes tau, both paths agree") {
    val df = Seq(
      (0L, Array(1.0, 0.0)),
      (1L, Array(0.0, 0.0)), // zero norm → NaN cosine vs everything
      (2L, Array(1.0, 1.0)),
      (3L, Array(-1.0, 0.5))
    ).toDF("vec_id", "embedding")
    val v = BruteForce.vecs(df, "vec_id", "embedding")

    val top = BruteForce.topKBroadcast(spark, v, k = 3)
    // every query vector ranks the NaN neighbour (id 1) first — NaN greatest
    val firsts = top.where(col("rn") === 1 && col("a_id") =!= 1)
      .select("b_id").as[Long].collect().toSet
    assert(firsts == Set(1L), s"NaN neighbour not ranked first: $firsts")
    TestSpark.assertFrameEqual(BruteForce.topKBlocked(spark, v, k = 3, nBlocks = 2), top)

    val pairs = BruteForce.neardupPairsBroadcast(spark, v, tau = 0.99)
    // all three pairs involving the zero vector pass the 0.99 threshold via NaN
    val nanPairs = pairs.where(col("a_id") === 1 || col("b_id") === 1).count()
    assert(nanPairs == 3, s"expected 3 NaN pairs, got $nanPairs")
    TestSpark.assertFrameEqual(
      BruteForce.neardupPairsBlocked(spark, v, tau = 0.99, nBlocks = 2), pairs)
  }

  test("block path with more blocks than rows still agrees") {
    val v = BruteForce.vecs(emb.limit(9), "vec_id", "embedding")
    TestSpark.assertFrameEqual(
      BruteForce.topKBlocked(spark, v, k = 5, nBlocks = 32),
      BruteForce.topKBroadcast(spark, v, k = 5))
  }
}
