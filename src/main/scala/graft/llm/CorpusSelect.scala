package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-ordered, token-budget-constrained corpus selection — the data
  * mixing step that answers "give me the best N-token training set":
  * rank documents by a score, walk down the ranking accumulating token
  * counts, and keep every document while the running total stays within
  * the budget.
  *
  * Scale shape: a global `sum() OVER (ORDER BY score)` would funnel the
  * corpus through one task, so the running total comes from
  * [[Packing.withRunningTokens]] — the shared two-phase prefix-sum scan
  * (range-partition on the order keys, p per-partition sums to the
  * driver, per-partition offset + local running sum). The budget filter
  * is then an ordinary predicate; no partition ever sees more than its
  * slice.
  */
object CorpusSelect {

  /** Select documents in decreasing `scoreCol` order (ties → ascending
    * `idCol`) while the INCLUSIVE running token total stays ≤ `budget`.
    * Returns the selected rows with `n_tokens` and `cum_tokens` added.
    *
    * Semantics: the selection TRUNCATES at the first document that
    * overflows the budget — later (lower-ranked) documents are not
    * revisited even if they would fit the remaining budget, matching
    * the windowed-cumsum formulation a relational oracle can replay
    * (skip-and-continue greedy is inherently sequential and cannot be).
    */
  def tokenBudget(
      docs: DataFrame,
      scoreCol: Column,
      idCol: String,
      textCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(!docs.columns.contains("__score"), "input frame already has a '__score' column")
    Packing
      .withRunningTokens(
        docs.withColumn("__score", scoreCol),
        Seq(col("__score").desc, Cols.q(idCol).asc),
        textCol)
      .where(col("cum_tokens") <= budget)
      .drop("__score")
  }
}
