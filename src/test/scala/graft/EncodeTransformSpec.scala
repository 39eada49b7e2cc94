package graft

import graft.core.{CategoryInfo, GraftFrame}
import graft.encode.EncodeData
import graft.transform.{GelmanStandardize, TransformData}
import org.scalatest.funsuite.AnyFunSuite

/** Goldens ported from `/root/reference/src/tests/test_tasks.py`: encode
  * (307–337), transform (473–576), gelman standardize (579–641).
  */
class EncodeTransformSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("encode: unordered cat → boolean dummies in category order, original dropped") {
    val gf = GraftFrame(
      Seq(("x", 1L), ("y", 2L), ("z", 3L), ("x", 4L)).toDF("cat", "keep"),
      Map("cat" -> CategoryInfo(Seq("x", "y", "z"), ordered = false)))
    val out = EncodeData(gf).df
    assert(out.columns.toSeq == Seq("keep", "cat_x", "cat_y", "cat_z"))
    val r = out.orderBy("keep").collect()
    assert(r.map(_.getBoolean(1)).toSeq == Seq(true, false, false, true))
    assert(r.map(_.getBoolean(2)).toSeq == Seq(false, true, false, false))
  }

  test("encode: null row gets all-false dummies (no NA dummy — code wins over docstring)") {
    val gf = GraftFrame(
      Seq((Some("x"), 1L), (None, 2L)).toDF("cat", "keep"),
      Map("cat" -> CategoryInfo(Seq("x"), ordered = false)))
    val r = EncodeData(gf).df.orderBy("keep").collect()
    assert(r(1).getBoolean(1) == false)
  }

  test("encode: ordered cat → byte category codes in place, NA → -1") {
    val gf = GraftFrame(
      Seq((Some("low"), 1L), (Some("high"), 2L), (Some("mid"), 3L), (None, 4L))
        .toDF("lvl", "keep"),
      Map("lvl" -> CategoryInfo(Seq("low", "mid", "high"), ordered = true)))
    val out = EncodeData(gf).df
    assert(out.columns.toSeq == Seq("lvl", "keep"))
    assert(out.schema("lvl").dataType.typeName == "byte")
    assert(out.orderBy("keep").collect().map(_.getByte(0)).toSeq == Seq(0, 2, 1, -1))
  }

  test("transform arcsinh and log; ints coerce to double; others untouched") {
    val gf  = GraftFrame(Seq((1L, 4.0, "s"), (2L, 9.0, "t")).toDF("i", "f", "s"))
    val out = TransformData(gf, Seq("i", "f"), "arcsinh").df
    assert(out.schema("i").dataType.typeName == "double")
    assert(out.schema("s").dataType.typeName == "string")
    val r = out.orderBy("f").collect()
    assert(math.abs(r(0).getDouble(0) - math.log(1 + math.sqrt(2))) < 1e-12)

    val logOut = TransformData(gf, Seq("f"), "log").df.orderBy("f").collect()
    assert(math.abs(logOut(0).getDouble(1) - math.log(4.0)) < 1e-12)
  }

  test("transform log raises on zero values (negatives pass through)") {
    val gf = GraftFrame(Seq(0.0, 1.0).toDF("z"))
    intercept[IllegalArgumentException] {
      TransformData(gf, Seq("z"), "log")
    }
    // negatives do NOT raise (reference checks == 0 only)
    val neg = GraftFrame(Seq(-1.0, 1.0).toDF("z"))
    TransformData(neg, Seq("z"), "log").df.collect()
  }

  test("gelman: numeric (x-mean)/(2*sample sd); bool mean-shift only; string untouched") {
    // reference golden flavor (test_tasks.py:579–641): bool col [T,F,F,T,T]
    // mean 0.6 → shifted −0.6/+0.4
    val gf = GraftFrame(
      Seq((1.0, true, "a"), (2.0, false, "b"), (3.0, false, "c"), (4.0, true, "d"),
        (5.0, true, "e")).toDF("x", "b", "s"))
    val out  = GelmanStandardize(gf).df.orderBy("s")
    val rows = out.collect()
    // mean 3, sd_samp sqrt(2.5); x=1 → (1-3)/(2*1.58113883) = -0.6324555…
    assert(math.abs(rows(0).getDouble(0) - (-2.0 / (2 * math.sqrt(2.5)))) < 1e-12)
    assert(math.abs(rows(0).getDouble(1) - 0.4) < 1e-12)   // true − 0.6
    assert(math.abs(rows(1).getDouble(1) - (-0.6)) < 1e-12) // false − 0.6
    assert(rows.map(_.getString(2)).toSeq == Seq("a", "b", "c", "d", "e"))
  }
}
