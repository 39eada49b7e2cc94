package graft.na

import graft.core.{Cols, GraftFrame}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feature × NA-indicator interaction columns for the `gm` strategy —
  * reference `/root/reference/src/tasks.py:423–441`: terms are
  * `itertools.product(feature_cols, na_cols)` (feature-major order) fed to
  * patsy `dmatrix(formula + '-1')`.
  *
  * Patsy's level-emission/naming is emulated table-driven from the normative
  * golden (`/root/reference/src/tests/test_tasks.py:411–462`, SURVEY.md
  * §7.4.3), not re-derived:
  *  - the FIRST indicator column gets full coding (`[False]` and `[True]`
  *    levels) in every term; later indicators get reduced coding
  *    (`[T.True]` only);
  *  - the FIRST categorical/boolean feature gets full coding (`[lvl]` per
  *    level); later categorical/boolean features get treatment coding
  *    (`[T.lvl]`, first level dropped);
  *  - numeric features pass through unnamed (`Q("f"):Q("i")[lvl]`);
  *  - within a term, indicator levels vary slowest, feature levels fastest;
  *  - all interaction columns are double, computed over IMPUTED values.
  */
object Interactions {

  def grandModel(filled: GraftFrame, featureCols: Seq[String], indCols: Seq[String]): GraftFrame = {
    val df     = filled.df
    val schema = df.schema

    def kind(c: String): String = schema(c).dataType match {
      case BooleanType                       => "bool"
      case StringType                        => "cat"
      case _ if filled.cats.contains(c)      => "cat"
      case _                                 => "num"
    }

    val firstInd        = indCols.headOption
    val firstCatFeature = featureCols.find(c => kind(c) != "num")

    def indicatorLevels(i: String): Seq[(String, Column)] = {
      val iv = Cols.q(i).cast(DoubleType)
      if (firstInd.contains(i)) Seq(("[False]", lit(1.0) - iv), ("[True]", iv))
      else Seq(("[T.True]", iv))
    }

    def featureLevels(f: String): Seq[(String, Column)] = kind(f) match {
      case "num" => Seq(("", Cols.q(f).cast(DoubleType)))
      case "bool" =>
        val bv = Cols.q(f).cast(DoubleType)
        if (firstCatFeature.contains(f)) Seq(("[False]", lit(1.0) - bv), ("[True]", bv))
        else Seq(("[T.True]", bv))
      case "cat" =>
        val levels = filled.cats.get(f).map(_.categories).getOrElse(Nil)
        val lv     = (l: String) => (Cols.q(f) === lit(l)).cast(DoubleType)
        if (firstCatFeature.contains(f)) levels.map(l => (s"[$l]", lv(l)))
        else levels.drop(1).map(l => (s"[T.$l]", lv(l)))
    }

    val interactions: Seq[Column] = for {
      f               <- featureCols
      i               <- indCols
      (ilvl, iexpr)   <- indicatorLevels(i)
      (flvl, fexpr)   <- featureLevels(f)
    } yield (fexpr * iexpr).as(s"""Q("$f")$flvl:Q("$i")$ilvl""")

    filled.mapDf(_.select(col("*") +: interactions: _*))
  }
}
