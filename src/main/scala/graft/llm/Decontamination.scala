package graft.llm

import graft.core.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (SURVEY.md §2B north star): score each
  * training document by the fraction of its distinct word n-grams that
  * appear anywhere in an evaluation corpus — the standard n-gram-overlap
  * contamination check run before training so benchmark text is excluded
  * from the training set.
  *
  * Scale shape: the eval side collapses to its DISTINCT shingle set
  * (dimension-sized next to a 100 TB train corpus — shingle count grows
  * with eval tokens, not train tokens), the train side explodes to an
  * inverted (doc, shingle) index, and the overlap is one equi-join on the
  * shingle key followed by a per-doc aggregate. The join strategy is left
  * to the planner ON PURPOSE: an explicit `broadcast()` hint is never
  * demoted, so an eval shingle set too large for the driver would OOM
  * instead of degrading — unhinted, the planner broadcasts a small eval
  * set from its size estimates (pinned by a ScalePostureSpec plan
  * assertion) and falls back to a shuffled join on the same plan when it
  * grows.
  */
object Decontamination {

  private def shingles(df: DataFrame, idCol: String, textCol: String, n: Int) = {
    val parts = (0 until n).map(j => s"tk[i+$j]").mkString(", ")
    df.select(Cols.q(idCol).as("__id"), split(Cols.q(textCol), " ").as("tk"))
      .where(size(col("tk")) >= n)
      .select(
        col("__id"),
        explode(
          array_distinct(expr(
            s"transform(sequence(0, size(tk) - $n), i -> concat_ws(' ', $parts))")))
          .as("s"))
  }

  /** Per-train-doc contamination: (id, n_shingles, n_matched, ratio),
    * ratio = |shingles(doc) ∩ shingles(eval)| / |shingles(doc)|. Only docs
    * with at least one n-gram appear (shorter docs cannot be n-gram
    * contaminated). `minRatio` filters the report to flagged docs.
    */
  def score(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minRatio: Double = 0.0): DataFrame = {
    val trainSh = shingles(train, idCol, textCol, n)
    val evalSh  = shingles(eval, idCol, textCol, n).select("s").distinct()
    val matched = trainSh
      .join(evalSh, Seq("s"), "left_semi")
      .groupBy("__id")
      .agg(count(lit(1)).as("n_matched"))
    trainSh
      .groupBy("__id")
      .agg(count(lit(1)).as("n_shingles"))
      .join(matched, Seq("__id"), "left")
      .na.fill(0L, Seq("n_matched"))
      .select(
        col("__id").as(idCol),
        col("n_shingles"),
        col("n_matched"),
        round(col("n_matched") / col("n_shingles"), 6).as("ratio"))
      .where(col("ratio") >= minRatio)
  }
}
