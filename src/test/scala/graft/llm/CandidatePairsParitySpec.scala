package graft.llm

import graft.TestSpark
import graft.core.Tables
import graft.functions.GraftFunctions.dot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused single-join [[AnnBuckets.candidatePairs]] (one
  * posexplode + one self-join on `tb`) to the per-table formulation it
  * replaced (nTables independent bucket self-joins unioned): the
  * candidate-pair SET and every pair's cos_sim must be identical, at
  * several table counts and seeds. Guards the fusion's key arithmetic
  * (`tb = tbl · 2^bits + bucket`) against cross-table bucket collisions —
  * the one way the rewrite could silently differ.
  */
class CandidatePairsParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def base = {
    val emb = Tables(spark, dir).embeddings
    emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
  }

  /** The pre-fusion reference: one self-join per table, unioned, deduped. */
  private def perTablePairs(bits: Int, dims: Int, nTables: Int, seed: Long) =
    (0 until nTables)
      .map { t =>
        val bucketed = AnnBuckets.withBucket(base, "emb", bits, dims, seed + t)
        val a = bucketed.select(
          col("bucket"), col("vec_id").as("a_id"), col("emb").as("a_emb"), col("nrm").as("a_nrm"))
        val b = bucketed.select(
          col("bucket"), col("vec_id").as("b_id"), col("emb").as("b_emb"), col("nrm").as("b_nrm"))
        a.join(b, Seq("bucket")).where(col("a_id") =!= col("b_id"))
          .select(
            col("a_id"),
            col("b_id"),
            round(dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")), 6).as("cos_sim"))
      }
      .reduce(_ unionByName _)
      .dropDuplicates("a_id", "b_id")

  test("fused candidatePairs matches the per-table formulation (pairs AND cos_sim)") {
    for ((bits, tables, seed) <- Seq((4, 3, 42L), (5, 1, 7L), (3, 7, 1234L))) {
      val fused = AnnBuckets
        .candidatePairs(base, bits, 64, tables, seed)
        .as[(Long, Long, Double)]
        .collect()
        .toSet
      val reference = perTablePairs(bits, 64, tables, seed)
        .as[(Long, Long, Double)]
        .collect()
        .toSet
      assert(fused.nonEmpty, s"no candidates at bits=$bits tables=$tables")
      assert(
        fused == reference,
        s"fused/per-table divergence at bits=$bits tables=$tables seed=$seed: " +
          s"fusedOnly=${(fused -- reference).take(3)} refOnly=${(reference -- fused).take(3)}")
    }
  }
}
