package graft.rel

import graft.core.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the LATEST right row with the same
  * key and right.time <= left.time (inclusive). Spark has no built-in; the
  * scalable formulation is the classic union + keyed-window carry-forward
  * (SURVEY.md §2B "as-of"):
  *
  *   1. tag right rows 0 and left rows 1, union on (key, time, tag);
  *   2. one window per key ordered (time, tag) carries the last non-null
  *      right payload forward (`last(_, ignoreNulls)` over rows unbounded
  *      preceding → current);
  *   3. keep the left rows.
  *
  * Cost at scale: ONE shuffle of each side on the join key (same as any
  * sort-merge join) and no range explosion — vs. the naive range-join +
  * row_number which produces |matches| intermediate rows. Equal timestamps:
  * the right row sorts first (tag 0 < 1), so `right.time == left.time`
  * matches, mirroring DuckDB's `ASOF JOIN ... ON l.t >= r.t`.
  *
  * Right-side keys with duplicate times should be deduplicated by the
  * caller to make the picked row deterministic.
  */
object AsOfJoin {

  /** @param tolerance pandas `merge_asof`-style max lookback: a match older
    *                   than `left.time − tolerance` is dropped (nulls kept,
    *                   left row survives). None = unbounded lookback.
    */
  def apply(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      tolerance: Option[String] = None): DataFrame = {
    val leftCols  = left.columns.toIndexedSeq
    val rightCols = right.columns.toIndexedSeq
    require(leftCols.intersect(rightCols).isEmpty, "as-of join: column names must be disjoint")

    val rStruct = struct(rightCols.map(right(_)): _*)
    val rType   = right.select(rStruct.as("r")).schema("r").dataType

    // a null right time can never satisfy "right.time <= left.time" — and
    // nulls-first ascending ordering would otherwise carry such a row
    // forward as a spurious match for every left row in the partition
    val taggedRight = right.where(Cols.q(rightTime).isNotNull).select(
      Cols.q(rightKey).as("__k"),
      Cols.q(rightTime).cast("timestamp").as("__t"),
      lit(0).as("__tag"),
      lit(null).cast(left.select(struct(leftCols.map(left(_)): _*).as("l")).schema("l").dataType).as("__l"),
      rStruct.as("__r"))

    val taggedLeft = left.select(
      Cols.q(leftKey).as("__k"),
      Cols.q(leftTime).cast("timestamp").as("__t"),
      lit(1).as("__tag"),
      struct(leftCols.map(left(_)): _*).as("__l"),
      lit(null).cast(rType).as("__r"))

    val w = Window
      .partitionBy("__k")
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedRight
      .unionByName(taggedLeft)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .withColumn("__match_t", last(when(col("__tag") === 0, col("__t")), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)

    val bounded = tolerance.fold(matched) { tol =>
      matched.withColumn(
        "__match",
        when(col("__match_t") >= col("__t") - expr(s"INTERVAL $tol"), col("__match"))
          .otherwise(lit(null).cast(rType)))
    }

    bounded.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
