package graft

import graft.llm.CorpusPipeline
import org.scalatest.funsuite.AnyFunSuite

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // quality (q32) = min(n_chars/500,1)*0.4 + ttr*0.3 + alphaRatio*0.3;
  // all docs below are single-line, space-separated
  private val goodA = (1 to 25).map(i => s"the w$i").mkString(" ")   // 50 tokens, has "the"
  private val goodB = (1 to 30).map(i => s"of v$i").mkString(" ")    // 60 tokens, has "of"

  test("each stage bites: filter, dedup, budget truncation, pack boundaries") {
    val docs = Seq(
      (1L, goodA, goodA.length.toLong),
      (2L, goodB, goodB.length.toLong),
      (3L, goodA, goodA.length.toLong),                    // exact dup of 1 → dropped
      (4L, "the short one", 13L),                          // < 20 words → filtered
      (5L, ("9 " * 30).trim, 59L),                         // no alpha, no req word → filtered
      (6L, (1 to 40).map(i => s"that t$i").mkString(" "), 400L)) // 80 tokens, has "that"
      .toDF("doc_id", "text", "n_chars")
    val got = CorpusPipeline
      .buildTrainingSet(docs, "doc_id", "text", "n_chars",
        budget = 140L, capacity = 64L)
      .select("doc_id", "n_tokens", "cum_tokens", "pack_id")
      .orderBy("cum_tokens")
      .as[(Long, Long, Long, Long)]
      .collect()
      .toSeq
    // survivors of filter+dedup: 1 (50 tok), 2 (60 tok), 6 (80 tok).
    // quality ranks 6 first (longest n_chars band + diversity), and the
    // budget (140) fits the top two of the ranking but not the third —
    // verify structurally rather than assuming the exact quality order:
    assert(got.map(_._1).toSet.subsetOf(Set(1L, 2L, 6L)), "only filter+dedup survivors selectable")
    assert(got.map(_._3).max <= 140L, "inclusive running total within budget")
    assert(got == got.sortBy(_._3), "cum_tokens increases in selection order")
    // pack boundaries: pack_id = (cum - n) div 64 over the running total
    got.foreach { case (_, n, cum, p) => assert(p == (cum - n) / 64, s"pack id for cum=$cum") }
    // the dup (doc 3) never appears even when its twin does
    assert(!got.map(_._1).contains(3L))
    // at least two docs fit the 140-token budget (50+60 or 80+60 both fit)
    assert(got.size >= 2)
  }

  test("budget 0 selects nothing; huge budget keeps all filter+dedup survivors") {
    val docs = Seq(
      (1L, goodA, goodA.length.toLong),
      (2L, goodB, goodB.length.toLong),
      (3L, goodA, goodA.length.toLong))
      .toDF("doc_id", "text", "n_chars")
    def run(b: Long) =
      CorpusPipeline.buildTrainingSet(docs, "doc_id", "text", "n_chars", b, 64L)
    assert(run(0L).count() == 0L)
    assert(run(1000000L).select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
  }
}
