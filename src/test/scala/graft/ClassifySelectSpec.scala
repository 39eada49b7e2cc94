package graft

import graft.llm.{Dsir, NaiveBayes}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance weighting + Naive Bayes classification — planted-signal
  * corpora where the expected decisions are known, plus a driver-side
  * replay of the exact smoothed arithmetic.
  */
class ClassifySelectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  // Two disjoint vocabularies: "science" docs (target-like) and "spam"
  // docs. The mixed doc sits in between.
  private val corpus = Seq(
    (1L, "t", "atom proton neutron electron quark"),
    (2L, "t", "quark electron atom atom proton"),
    (3L, "r", "buy cheap pills now click here"),
    (4L, "r", "click buy now cheap cheap pills"),
    (5L, "r", "atom proton buy click pills here"))

  test("DSIR weights rank target-vocabulary docs above off-target docs") {
    val df = corpus.toDF("doc_id", "label", "text")
    val w = Dsir
      .importanceWeights(df, "doc_id", "text", col("label") === "t")
      .orderBy("doc_id")
      .as[(Long, Long, Double)]
      .collect()
      .map(r => r._1 -> r._3)
      .toMap
    assert(w(1) > w(5) && w(2) > w(5), s"pure target docs must outrank the mixed doc: $w")
    assert(w(5) > w(3) && w(5) > w(4), s"the mixed doc must outrank pure off-target docs: $w")
  }

  test("DSIR weight replays the smoothed log-likelihood ratio exactly") {
    val df = corpus.toDF("doc_id", "label", "text")
    // driver-side replay with the same 256-bucket md5 hashing + add-one
    val toks = corpus.flatMap { case (id, lab, txt) =>
      txt.split(" ").map(t => (id, lab, md5hex(t).take(2)))
    }
    val tgt   = toks.filter(_._2 == "t").groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val raw   = toks.groupBy(_._3).map { case (b, xs) => b -> xs.size.toLong }
    val tTot  = tgt.values.sum.toDouble
    val rTot  = raw.values.sum.toDouble
    val want = toks
      .groupBy(_._1)
      .map { case (id, xs) =>
        val s = xs.map { case (_, _, b) =>
          val pT = (tgt.getOrElse(b, 0L).toDouble + 1.0) / (tTot + 256.0)
          val pR = (raw.getOrElse(b, 0L).toDouble + 1.0) / (rTot + 256.0)
          math.log(pT / pR)
        }.sum
        id -> BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    val got = Dsir
      .importanceWeights(df, "doc_id", "text", col("label") === "t")
      .as[(Long, Long, Double)]
      .collect()
      .map(r => r._1 -> r._3)
      .toMap
    assert(got == want, s"got $got want $want")
  }

  test("DSIR model joins broadcast the bucket tables, never shuffle the token stream") {
    val df = corpus.toDF("doc_id", "label", "text")
    val w  = Dsir.importanceWeights(df, "doc_id", "text", col("label") === "t")
    val plan = w.queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"bucket model must come in via broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"token stream must not shuffle for the model join:\n$plan")
  }

  test("NB recovers planted classes when the text carries signal") {
    // train rows 1-4 (disjoint vocab per class), test rows 10-13
    val docs = Seq(
      (1L, "sci", "atom proton neutron electron", true),
      (2L, "sci", "quark electron atom proton neutron", true),
      (3L, "spam", "buy cheap pills now click", true),
      (4L, "spam", "click buy now cheap pills here", true),
      (10L, "sci", "electron quark proton", false),
      (11L, "sci", "neutron atom electron quark", false),
      (12L, "spam", "cheap click pills buy", false),
      (13L, "spam", "now here buy click", false)
    ).toDF("doc_id", "label", "text", "is_train")
    val preds = NaiveBayes
      .predictions(docs, "doc_id", "text", "label", col("is_train"))
      .as[(Long, String, String, Double)]
      .collect()
      .map(r => r._1 -> r._3)
      .toMap
    assert(preds == Map(10L -> "sci", 11L -> "sci", 12L -> "spam", 13L -> "spam"),
      s"planted classes must be recovered: $preds")
  }

  test("NB confusion matrix counts the per-class decisions") {
    val docs = Seq(
      (1L, "a", "x x x y", true),
      (2L, "b", "z z z w", true),
      (10L, "a", "x y x", false),
      (11L, "a", "z z w", false), // planted misclassification: a-doc with b-vocab
      (12L, "b", "z w z", false)
    ).toDF("doc_id", "label", "text", "is_train")
    val got = NaiveBayes
      .confusion(docs, "doc_id", "text", "label", col("is_train"))
      .as[(String, String, Long)]
      .collect()
      .toSeq
    assert(got == Seq(("a", "a", 1L), ("a", "b", 1L), ("b", "b", 1L)), s"got $got")
  }

  test("NB predictions are deterministic under repartitioning") {
    val df   = corpus.toDF("doc_id", "label", "text")
    val docs = df.withColumn("is_train", col("doc_id") <= 3)
    def run(d: org.apache.spark.sql.DataFrame) = NaiveBayes
      .predictions(d, "doc_id", "text", "label", col("is_train"))
      .orderBy("doc_id")
      .collect()
      .toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }
}
