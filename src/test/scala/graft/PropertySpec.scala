package graft

import graft.core.{GraftFrame, Sanitize}
import graft.na.WrangleNa
import graft.transform.GelmanStandardize
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5): sanitize idempotence, cc/fi
  * postconditions, standardization moments. ScalaCheck generators driven
  * directly (fixed seed → reproducible cases).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("sanitize is idempotent and produces lowercase no-space names") {
    samples(Gen.asciiPrintableStr, 200).foreach { s =>
      val once = Sanitize.cleanText(s)
      assert(Sanitize.cleanText(once) == once)
      assert(once == once.toLowerCase)
      assert(!once.contains(" "))
    }
  }

  test("cc output has no nulls and is a row-subset") {
    samples(Gen.listOfN(40, Gen.option(Gen.choose(-100.0, 100.0))), 5).foreach { xs =>
      val df  = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("row_id", "x")
      val out = WrangleNa.cc(GraftFrame(df)).df
      assert(out.where(col("x").isNull).count() == 0)
      assert(out.count() == xs.count(_.isDefined))
    }
  }

  test("fi output has no nulls and leaves observed cells untouched") {
    samples(Gen.listOfN(40, Gen.option(Gen.choose(-100.0, 100.0))), 5)
      .filter(_.exists(_.isDefined))
      .foreach { xs =>
        val df  = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("row_id", "x")
        val out = WrangleNa.fi(GraftFrame(df)).df
        assert(out.where(col("x").isNull).count() == 0)
        val got = out.orderBy("row_id").select("x").as[Double].collect()
        xs.zipWithIndex.foreach {
          case (Some(v), i) => assert(math.abs(got(i) - v) < 1e-12)
          case _            =>
        }
      }
  }

  test("gelman standardization yields mean ≈ 0 and sample sd ≈ 0.5") {
    samples(Gen.listOfN(50, Gen.choose(-1000.0, 1000.0)), 5)
      .filter(_.distinct.size > 1)
      .foreach { xs =>
        val out = GelmanStandardize(GraftFrame(xs.toDF("x"))).df
        val r   = out.agg(avg("x"), stddev_samp("x")).collect()(0)
        assert(math.abs(r.getDouble(0)) < 1e-9)
        assert(math.abs(r.getDouble(1) - 0.5) < 1e-9)
      }
  }
}
