package graft

import graft.llm.Dedup
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls on the old stone bridge near town"

  private def corpus = Seq(
    (1L, base),
    (2L, base.replace("rain", "snow")), // near-dup of 1
    (3L, base),                         // exact dup of 1
    (4L, "completely different tokens about spark catalyst optimizer plans and shuffles everywhere"),
    (5L, "yet another unrelated document mentioning embeddings buckets and minhash families today"))
    .toDF("doc_id", "text")

  test("exact dedup keeps the lowest-id copy of duplicated content") {
    val out = Dedup.exact(corpus, "doc_id", "text")
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L, 5L)) // 3 dropped (dup of 1)
  }

  test("minhash band join finds the planted near-dup and nothing else") {
    val pairs = Dedup
      .nearDupPairs(corpus, "doc_id", "text", bands = 4, rowsPerBand = 2, tau = 0.5)
      .collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getDouble(2)))
    val keys = pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    assert(keys.contains((1L, 3L))) // exact dup: jaccard 1.0
    assert(keys.contains((1L, 2L)) || keys.contains((2L, 3L))) // near-dup caught
    assert(!keys.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).nonEmpty })
    pairs.foreach(p => assert(p._3 >= 0.5))
  }

  test("signatures are stable and one row per doc") {
    val s1 = Dedup.minhashSignatures(corpus, "doc_id", "text").collect().map(_.toString).sorted.toSeq
    val s2 = Dedup.minhashSignatures(corpus, "doc_id", "text").collect().map(_.toString).sorted.toSeq
    assert(s1 == s2)
    assert(s1.size == 5)
  }
}
