package graft

import graft.llm.Vocab
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-safe dense-id assignment: topK (TakeOrderedAndProject + local
  * ids) and denseIds (two-phase range-partition + zipWithIndex) must both
  * reproduce the ordering a global row_number window would give — without
  * ever building that window.
  */
class VocabSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts = Seq(
    ("the", 50L), ("fox", 10L), ("dog", 10L), ("a", 40L),
    ("quick", 7L), ("brown", 7L), ("lazy", 3L), ("zig", 1L))
    .toDF("tok", "n")
    .repartition(5) // ids must be global, not per input partition

  test("topK assigns dense ids in (n desc, tok asc) order") {
    val got = Vocab.topK(counts, 4, Seq(col("n").desc, col("tok").asc), "token_id")
      .orderBy("token_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .toSeq
    assert(got == Seq(("the", 50L, 1), ("a", 40L, 2), ("dog", 10L, 3), ("fox", 10L, 4)))
  }

  test("denseIds covers every row with globally unique contiguous ids in order") {
    val got = Vocab.denseIds(counts, Seq(col("n").desc, col("tok").asc), "token_id")
      .orderBy("token_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .toSeq
    assert(got.map(_._2) == (1L to 8L))
    assert(got.map(_._1) == Seq("the", "a", "dog", "fox", "brown", "quick", "lazy", "zig"))
  }
}
