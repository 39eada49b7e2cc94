package graft.transform

import graft.core.{Cols, GraftFrame}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gelman (2008) standardization — reference `gelman_standardize_data`
  * (`/root/reference/src/tasks.py:524–556`):
  *  - numeric columns: `(x − mean) / (2 · sample std)` (ddof=1 —
  *    `stddev_samp` matches exactly);
  *  - boolean columns: mean-shift only (`x − mean`), no rescale;
  *  - categorical/string columns untouched; nulls propagate;
  *  - int/bool outputs become double.
  *
  * All means and stddevs for every column come from ONE aggregate job; the
  * standardization itself is a single projection, so the op is two stages
  * total regardless of column count (vs. the reference's per-column eager
  * passes, SURVEY.md §4).
  */
object GelmanStandardize {

  def apply(gf: GraftFrame): GraftFrame = {
    val df = gf.df
    val numericCols = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] && !gf.cats.contains(f.name) => f.name
    }.toIndexedSeq
    val boolCols = df.schema.fields.collect {
      case f if f.dataType == BooleanType => f.name
    }.toIndexedSeq

    if (numericCols.isEmpty && boolCols.isEmpty) return gf

    val aggs: Seq[Column] =
      numericCols.flatMap(c =>
        Seq(avg(Cols.q(c)).as(s"mean_$c"), stddev_samp(Cols.q(c)).as(s"sd_$c"))) ++
        boolCols.map(c => avg(Cols.q(c).cast(DoubleType)).as(s"mean_$c"))

    val row = graft.core.Jobs.collectFast(df.agg(aggs.head, aggs.tail: _*))(0)
    def stat(n: String): Option[Double] =
      Option(row.getAs[Any](n)).map(_.asInstanceOf[Number].doubleValue())

    gf.mapDf(_.select(df.columns.toIndexedSeq.map { c =>
      if (numericCols.contains(c)) {
        (stat(s"mean_$c"), stat(s"sd_$c")) match {
          case (Some(m), Some(sd)) if sd != 0.0 =>
            ((Cols.q(c).cast(DoubleType) - lit(m)) / lit(2.0 * sd)).as(c)
          case (Some(m), _) => (Cols.q(c).cast(DoubleType) - lit(m)).as(c)
          case _            => Cols.q(c).cast(DoubleType).as(c)
        }
      } else if (boolCols.contains(c)) {
        stat(s"mean_$c") match {
          case Some(m) => (Cols.q(c).cast(DoubleType) - lit(m)).as(c)
          case None    => Cols.q(c).cast(DoubleType).as(c)
        }
      } else Cols.q(c)
    }: _*))
  }
}
