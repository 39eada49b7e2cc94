package graft

import graft.llm.Logit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LogitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("IRLS coefficients match the independent numpy golden on the documents fixture") {
    // tools/logit_golden.py on /root/testdata/sf0.001 (numpy IRLS, same
    // iteration contract, independent of this code path):
    //   n = 500, positives = 74
    //   beta = [-3.06909, -0.034813, 8.476236, 0.0]
    // the last feature (digit ratio) is identically zero on the fixture —
    // the ridge term is what keeps its normal equations solvable, and the
    // recovered coefficient must be exactly the ridge solution's 0
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001").documents
      .where(col("text").isNotNull && col("lang").isNotNull && length(col("text")) > 0)
    val len = length(col("text")).cast("double")
    val features = Seq(
      log1p(len),
      (len - length(regexp_replace(col("text"), " ", "")).cast("double")) / len,
      length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") / len)
    val model = Logit.fit(docs, col("lang") === "zh", features)
    assert(model.n == 500, s"trained on ${model.n} rows, expected 500")
    val golden = Array(-3.06909, -0.034813, 8.476236, 0.0)
    model.beta.zip(golden).zipWithIndex.foreach { case ((got, want), i) =>
      assert(math.abs(got - want) < 1e-3, s"beta($i): got $got, numpy golden $want")
    }
  }

  test("IRLS recovers planted parameters from deterministic pseudo-Bernoulli labels") {
    // y_i approximates Bernoulli(sigmoid(-0.5 + 1.5 x)) via the
    // deterministic (i*7 mod 100) < 100p grid draw — recovery within
    // sampling error proves the optimizer walks to the true optimum,
    // not just that two implementations agree
    val bStar = (-0.5, 1.5)
    val rows = (0 until 2000).map { i =>
      val x = -3.0 + 6.0 * i / 1999.0
      val p = 1.0 / (1.0 + math.exp(-(bStar._1 + bStar._2 * x)))
      val y = if ((i * 7) % 100 < (100.0 * p).round) 1.0 else 0.0
      (x, y)
    }
    val df    = rows.toDF("x", "y")
    val model = Logit.fit(df, col("y"), Seq(col("x")))
    assert(math.abs(model.beta(0) - bStar._1) < 0.15,
      s"intercept ${model.beta(0)} far from ${bStar._1}")
    assert(math.abs(model.beta(1) - bStar._2) < 0.15,
      s"slope ${model.beta(1)} far from ${bStar._2}")
  }

  test("scoring is bounded, threshold-consistent, and the fit is deterministic") {
    val q = SparkEntry
      .queries("q124_logit_filter")(spark, "/root/testdata/sf0.001")
      .as[(Long, Double, Boolean)]
      .collect()
    assert(q.length == 500)
    assert(q.forall { case (_, s, k) => s >= 0.0 && s <= 1.0 && k == (s >= 0.5) })
    val again = SparkEntry
      .queries("q124_logit_filter")(spark, "/root/testdata/sf0.001")
      .as[(Long, Double, Boolean)]
      .collect()
    assert(q.sameElements(again), "q124 is not deterministic")
  }
}
