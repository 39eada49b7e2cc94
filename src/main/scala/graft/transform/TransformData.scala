package graft.transform

import graft.core.{Cols, GraftFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Elementwise log / inverse-hyperbolic-sine transforms — reference
  * `transform_data` (`/root/reference/src/tasks.py:476–521`):
  *  - `log` raises if any selected cell is exactly zero (the reference
  *    checks `== 0` only — negatives pass and produce NaN/null,
  *    tasks.py:505–511);
  *  - integer columns coerce to double (tasks.py:512–520);
  *  - unselected columns untouched.
  *
  * Both `log` and `asinh` are native codegen'd Catalyst expressions, so the
  * transform fuses into the surrounding projection. The zero-guard is the
  * one forced action (SURVEY.md §3) and is a short-circuiting existence
  * probe (`limit(1)`), not a full scan of results.
  */
object TransformData {

  def apply(gf: GraftFrame, cols: Seq[String], func: String = "arcsinh"): GraftFrame = {
    require(cols.nonEmpty, "transform_data: no columns given")
    val f = func match {
      case "log"     => (c: org.apache.spark.sql.Column) => log(c)
      case "arcsinh" => (c: org.apache.spark.sql.Column) => asinh(c)
      case other     => throw new IllegalArgumentException(s"unknown transform: $other")
    }
    if (func == "log") {
      val anyZero = gf.df
        .where(cols.map(c => Cols.q(c) === lit(0)).reduce(_ || _))
        .limit(1)
        .count() > 0
      if (anyZero)
        throw new IllegalArgumentException(
          "transform_data: log transform requires strictly non-zero columns")
    }
    gf.mapDf(df =>
      df.select(df.columns.toIndexedSeq.map { c =>
        if (cols.contains(c)) f(Cols.q(c).cast(DoubleType)).as(c) else Cols.q(c)
      }: _*))
  }
}
