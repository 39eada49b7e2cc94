package graft.encode

import graft.core.{Cols, GraftFrame}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Categorical encoding — reference `encode_data`
  * (`/root/reference/src/tasks.py:275–310`):
  *
  *  - UNORDERED categoricals → one-hot boolean dummies named `{col}_{value}`,
  *    emitted in category order (pandas `get_dummies` order = category order
  *    = alphanumeric by default), original column dropped, dummies appended
  *    on the right (tasks.py:295–306). Null rows get all-false dummies — the
  *    reference docstring claims a NA dummy but the code never passes
  *    `dummy_na=True`; code wins (tasks.py:293 vs 304).
  *  - ORDERED categoricals → integer category codes in place (byte, null →
  *    −1), following the declared category order (tasks.py:307–309).
  *
  * Deliberately NOT MLlib StringIndexer/OneHotEncoder: frequency-based
  * ordering and vector output don't match the reference's alphanumeric
  * per-value columns (SURVEY.md §2 A10). The encode is a static projection —
  * category sets come from metadata, so this adds no job and stays inside
  * whole-stage codegen.
  */
object EncodeData {

  def apply(gf: GraftFrame): GraftFrame = {
    val unordered = gf.unorderedCatCols
    val ordered   = gf.orderedCatCols

    // ordered → codes, in place
    val codeCols: Map[String, Column] = ordered.map { c =>
      val cats = gf.cats(c).categories
      val ladder = cats.zipWithIndex.foldLeft(lit(-1): Column) { case (acc, (v, i)) =>
        when(Cols.q(c) === lit(v), lit(i)).otherwise(acc)
      }
      c -> when(Cols.q(c).isNull, lit(-1)).otherwise(ladder).cast(ByteType).as(c)
    }.toMap

    val kept: Seq[Column] = gf.df.columns.toIndexedSeq.collect {
      case c if !unordered.contains(c) => codeCols.getOrElse(c, Cols.q(c))
    }

    // unordered → boolean dummies appended on the right, category order
    val dummies: Seq[Column] = unordered.flatMap { c =>
      gf.cats(c).categories.map { v =>
        when(Cols.q(c) === lit(v), lit(true)).otherwise(lit(false)).as(s"${c}_$v")
      }
    }

    val out  = gf.df.select(kept ++ dummies: _*)
    val cats = gf.cats -- unordered -- ordered
    GraftFrame(out, cats)
  }
}
