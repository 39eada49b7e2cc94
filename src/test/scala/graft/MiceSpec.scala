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
