package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact ↔ approximate statistic switch (SURVEY.md §7.4.5): oracle runs and
  * the t2 correctness gate use `Exact`; the 100 TB deployment point flips to
  * `Approx` (sketch-based, bounded-memory, one fewer sort) without touching
  * query code. Never mix modes inside one oracle run.
  */
sealed trait ScaleMode
object ScaleMode {
  case object Exact  extends ScaleMode
  case object Approx extends ScaleMode
}

/** Mode-dispatched statistics used by imputation and the query library. */
object Stats {

  /** Exact interpolated percentile vs t-digest style approx (accuracy
    * parameter = 10000).
    */
  def percentile(c: Column, p: Double, mode: ScaleMode = ScaleMode.Exact): Column =
    mode match {
      case ScaleMode.Exact  => call_function("percentile", c, lit(p))
      case ScaleMode.Approx => percentile_approx(c, lit(p), lit(10000))
    }

  /** Exact distinct count vs HLL++ sketch (2% default rsd). */
  def distinctCount(c: Column, mode: ScaleMode = ScaleMode.Exact): Column =
    mode match {
      case ScaleMode.Exact  => count_distinct(c)
      case ScaleMode.Approx => approx_count_distinct(c)
    }
}
