package graft

import graft.core.GraftFrame
import graft.na.Mice
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distribution-level MICE contract (SURVEY.md §5) — strictly stronger than
  * the reference's empty MICE test (test_tasks.py:465–470): no nulls in
  * output, nImputations × input cardinality, imputed moments near observed
  * moments, and run-to-run determinism.
  */
class MiceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    // y ≈ 2x + noise-free; 20% of y missing on a deterministic pattern
    val rows = (0 until 200).map { i =>
      val x = (i % 50).toDouble
      val y = if (i % 5 == 0) None else Some(2.0 * x + (i % 3).toDouble)
      (i.toLong, x, y)
    }
    GraftFrame(rows.toDF("row_id", "x", "y"))
  }

  test("output has no nulls and nImputations × rows cardinality") {
    val out = Mice(fixture, "row_id", nBurnin = 2, nImputations = 3, nSpread = 1)
    assert(out.count() == 3 * 200)
    assert(out.where(col("y").isNull || col("x").isNull).count() == 0)
    assert(out.select("iter").distinct().as[Int].collect().sorted.toSeq == Seq(0, 1, 2))
  }

  test("imputed values follow the conditional model (y ≈ 2x)") {
    val out = Mice(fixture, "row_id", nBurnin = 3, nImputations = 2, nSpread = 1)
    val imputedErr = out
      .where(col("row_id") % 5 === 0) // the rows that were missing
      .select(avg(abs(col("y") - (col("x") * 2.0 + 1.0))))
      .as[Double]
      .collect()
      .head
    assert(imputedErr < 3.0, s"imputed values far from conditional mean: $imputedErr")
  }

  test("deterministic across runs") {
    val a = Mice(fixture, "row_id", nBurnin = 1, nImputations = 2, nSpread = 1)
      .orderBy("iter", "row_id").collect().toSeq
    val b = Mice(fixture, "row_id", nBurnin = 1, nImputations = 2, nSpread = 1)
      .orderBy("iter", "row_id").collect().toSeq
    assert(a == b)
  }

  test("boolean columns impute via linear probability and stay boolean") {
    val rows = (0 until 200).map { i =>
      val x = (i % 50).toDouble
      val b = if (i % 5 == 0) None else Some(x > 25.0) // missing on a pattern
      (i.toLong, x, b)
    }
    val out = Mice(
      GraftFrame(rows.toDF("row_id", "x", "b")), "row_id",
      nBurnin = 2, nImputations = 2, nSpread = 1)
    assert(out.schema("b").dataType.typeName == "boolean")
    assert(out.where(col("b").isNull).count() == 0)
    val acc = out
      .where(col("row_id") % 5 === 0)
      .select(avg((col("b") === (col("x") > 25.0)).cast("double")))
      .as[Double].collect().head
    assert(acc > 0.7, s"imputed boolean accuracy $acc")
  }

  test("all-null column passes through untouched and is excluded from models") {
    val rows = (0 until 50).map { i =>
      val x = i.toDouble
      val y = if (i % 5 == 0) None else Some(2.0 * x)
      (i.toLong, x, y, Option.empty[Double])
    }
    val out = Mice(
      GraftFrame(rows.toDF("row_id", "x", "y", "dead")), "row_id",
      nBurnin = 1, nImputations = 2, nSpread = 1)
    assert(out.count() == 100)
    assert(out.where(col("y").isNull).count() == 0)
    assert(out.where(col("dead").isNull).count() == 100) // untouched
  }

  test("frame with no missing values returns unchanged") {
    val noNa = GraftFrame(Seq((1L, 1.0, 2.0), (2L, 2.0, 3.0)).toDF("row_id", "x", "y"))
    assert(Mice(noNa, "row_id").count() == 2)
  }

  test("chained (Gauss-Seidel) mode meets the same distribution contract") {
    val out = Mice(fixture, "row_id", nBurnin = 2, nImputations = 2, nSpread = 1, chained = true)
    assert(out.count() == 2 * 200)
    assert(out.where(col("y").isNull).count() == 0)
    val err = out
      .where(col("row_id") % 5 === 0)
      .select(avg(abs(col("y") - (col("x") * 2.0 + 1.0))))
      .as[Double].collect().head
    assert(err < 3.0, s"chained imputations far from conditional mean: $err")
  }

  /** airquality_na, reference test_tasks.py:78–92, typed as clean_data
    * leaves it. Rows 3/4/9 carry the NAs; row 9 (Ozone+Wind+dummy all
    * missing) couples three cells into an expansive linear map — the
    * divergence case the PMM support clamp exists for.
    */
  private def airquality = {
    val rows = Seq(
      (0L, Option(41.0), Option(190.0), Option(7.4), Option(false)),
      (1L, Option(36.0), Option(118.0), Option(8.0), Option(false)),
      (2L, Option(12.0), Option(149.0), Option(12.6), Option(false)),
      (3L, Option.empty[Double], Option(313.0), Option(11.5), Option(true)),
      (4L, Option.empty[Double], Option.empty[Double], Option(14.3), Option(true)),
      (5L, Option(28.0), Option.empty[Double], Option(14.9), Option(true)),
      (6L, Option(23.0), Option(299.0), Option(8.6), Option(true)),
      (7L, Option(19.0), Option(99.0), Option(13.8), Option(true)),
      (8L, Option(8.0), Option(19.0), Option(20.1), Option(true)),
      (9L, Option.empty[Double], Option(194.0), Option.empty[Double], Option.empty[Boolean]))
    GraftFrame(rows.toDF("row_id", "Ozone", "Solar_R", "Wind", "fake_dummy"))
  }

  test("airquality external golden: PMM support bounds, cc-OLS centers, reference KL contract") {
    // all golden numbers derived OUTSIDE this engine by tools/mice_golden.py
    // (numpy normal equations over the fixture's complete cases) and the
    // reference's documented values (test_tasks.py:78-80, 465-470)
    val out = Mice(airquality, "row_id", nBurnin = 20, nImputations = 10, nSpread = 20)

    // 1. PMM boundedness: statsmodels imputes observed donor VALUES, so
    // nothing may leave the observed support of its column
    for ((c, lo, hi) <- Seq(("Ozone", 8.0, 41.0), ("Solar_R", 19.0, 313.0), ("Wind", 7.4, 20.1)))
      assert(out.where(col(c) < lo || col(c) > hi).count() == 0, s"$c left observed support")

    // 2. cc-OLS centers for the cells whose predictors are all observed;
    // both tolerance bands REJECT the reference's documented mean-fill
    // values (Ozone 23.857143, Solar.R 172.625), so a MICE that ignores
    // the conditional model cannot pass
    val oz3 = out.where(col("row_id") === 3).agg(avg("Ozone")).as[Double].collect().head
    assert(math.abs(oz3 - 10.047373) <= 1.5 * 7.173981,
      s"Ozone[3] mean $oz3 off the external cc-OLS center 10.047373")
    val so5 = out.where(col("row_id") === 5).agg(avg("Solar_R")).as[Double].collect().head
    assert(math.abs(so5 - 54.770921) <= 2.0 * 52.454160,
      s"Solar_R[5] mean $so5 off the external cc-OLS center 54.770921")

    // 3. the reference's intended contract (its empty test's docstring,
    // test_tasks.py:465-470): each imputed dataset has KL divergence < 1
    // w.r.t. the original dataset — Gaussian closed form per numeric col
    val obs = airquality.df
    for (iter <- 0 until 10; c <- Seq("Ozone", "Solar_R", "Wind")) {
      val o = obs.select(col(c)).where(col(c).isNotNull).as[Double].collect()
      val i = out.where(col("iter") === iter).select(col(c)).as[Double].collect()
      def ms(xs: Array[Double]) = {
        val m = xs.sum / xs.length
        (m, math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)))
      }
      val (m0, s0) = ms(o)
      val (m1, s1) = ms(i)
      val kl = math.log(s0 / s1) + (s1 * s1 + (m1 - m0) * (m1 - m0)) / (2 * s0 * s0) - 0.5
      assert(kl < 1.0, s"iter $iter col $c: KL $kl ≥ 1")
    }
  }

  /** iraq_vote-shaped fixture: numeric predictors + a boolean vote column
    * with NAs — the external anchor for the LINEAR-PROBABILITY branch.
    * Complete cases split 4/4 on the vote (so any constant/mode fill is
    * wrong for one of the probe rows); the two missing-vote rows sit
    * deep inside each class in predictor space.
    */
  private def iraqVoteShaped = {
    val rows = Seq(
      (0L, 10.0, 1.0, Option(false)),
      (1L, 12.0, 2.0, Option(false)),
      (2L, 9.0, 1.0, Option(false)),
      (3L, 11.0, 3.0, Option(false)),
      (4L, 30.0, 8.0, Option(true)),
      (5L, 32.0, 9.0, Option(true)),
      (6L, 29.0, 9.0, Option(true)),
      (7L, 31.0, 7.0, Option(true)),
      (8L, 10.5, 2.0, Option.empty[Boolean]),
      (9L, 30.5, 8.0, Option.empty[Boolean]))
    GraftFrame(rows.toDF("row_id", "x1", "x2", "vote"))
  }

  test("boolean-target external golden: LPM draw lands on the cc-prediction side") {
    // golden numbers derived OUTSIDE this engine by tools/mice_golden.py
    // (numpy normal equations over the 8 complete cases): cc-LPM pred for
    // row 8 = 0.008929, row 9 = 0.991071, sigma = 0.069233 — so
    // P(imputed true) = Phi((pred-0.5)/sigma) is < 1e-12 for row 8 and
    // > 1 - 1e-12 for row 9. ALL 10 imputations must therefore agree
    // (a draw on the wrong side would need a >7-sigma noise excursion),
    // and the two rows must disagree with each other, which rejects any
    // constant or mode fill outright.
    val out = Mice(iraqVoteShaped, "row_id", nBurnin = 20, nImputations = 10, nSpread = 20)
    assert(out.where(col("row_id") === 8 && col("vote") === true).count() == 0,
      "row 8 (deep in the false class: cc-LPM pred 0.009) imputed true")
    assert(out.where(col("row_id") === 9 && col("vote") === false).count() == 0,
      "row 9 (deep in the true class: cc-LPM pred 0.991) imputed false")
    assert(out.where(col("vote").isNull).count() == 0)
    assert(out.schema("vote").dataType.typeName == "boolean")
  }

  test("reference 20/10/20 schedule completes on a small frame (one job per Jacobi sweep)") {
    val rows = (0 until 50).map { i =>
      val x = (i % 25).toDouble
      val y = if (i % 5 == 0) None else Some(2.0 * x)
      (i.toLong, x, y)
    }
    val out = Mice(
      GraftFrame(rows.toDF("row_id", "x", "y")), "row_id",
      nBurnin = 20, nImputations = 10, nSpread = 20)
    assert(out.count() == 10 * 50)
    assert(out.where(col("y").isNull).count() == 0)
  }
}
