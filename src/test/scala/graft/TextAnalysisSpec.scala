package graft

import graft.llm.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("langId picks the right language on real-language samples") {
    val samples = Seq(
      ("the cat is in the house and it is happy", "en"),
      ("el perro que corre por la casa y se fue", "es"),
      ("der hund ist mit den kindern und das ist gut", "de"),
      ("le chat est dans la maison et les enfants", "fr"),
      ("这 是 中 文 的 例 子 了 我 在", "zh"),
      ("qwerty asdf zxcv uiop", "und"))
    val got = samples
      .toDF("text", "want")
      .select(col("want"), TextAnalysis.langId(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0), s"sample for ${r.getString(0)}"))
  }

  test("quality score is bounded and favors diverse alpha text") {
    val df = Seq(
      ("aa aa aa aa aa aa aa aa", 23L),          // repetitive
      ("the quick brown fox jumps over dogs", 35L)) // diverse
      .toDF("text", "n_chars")
    val scores =
      df.select(TextAnalysis.qualityScore(col("text"), col("n_chars"))).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(1) > scores(0))
  }

  test("type-token ratio is 0 for empty text, not 1") {
    val got = Seq("", "a a b")
      .toDF("text")
      .select(TextAnalysis.typeTokenRatio(col("text")))
      .as[Double]
      .collect()
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 2.0 / 3.0) < 1e-12)
  }

  test("rolling fingerprint is order-sensitive and deterministic") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
    val fp = df.select(TextAnalysis.rollingFingerprint(col("text"))).as[Long].collect()
    assert(fp(0) == fp(2))
    assert(fp(0) != fp(1))
  }

  test("bpe-ish tokenizer splits alpha/digit/punct runs") {
    val n = Seq("abc123 def, xyz!")
      .toDF("text")
      .select(TextAnalysis.nBpeTokens(col("text")))
      .as[Int]
      .collect()
      .head
    // abc | 123 | def | , | xyz | !  → 6
    assert(n == 6)
  }
}
