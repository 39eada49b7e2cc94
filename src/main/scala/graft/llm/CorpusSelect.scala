package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Quality-ordered, token-budget-constrained corpus selection — the data
  * mixing step that answers "give me the best N-token training set":
  * rank documents by a score, walk down the ranking accumulating token
  * counts, and keep every document while the running total stays within
  * the budget.
  *
  * Scale shape: a global `sum() OVER (ORDER BY score)` would funnel the
  * corpus through one task, so the running total is the same two-phase
  * prefix-sum scan as [[Packing.packSequences]] / [[Vocab.denseIds]] —
  * range-partition by (score desc, id), one small job collects the
  * p per-partition token sums, then a lazy `mapPartitionsWithIndex` adds
  * each partition's prefix offset. The budget filter is then an ordinary
  * predicate; no partition ever sees more than its slice.
  */
object CorpusSelect {

  /** Select documents in decreasing `scoreCol` order (ties → ascending
    * `idCol`) while the INCLUSIVE running token total stays ≤ `budget`.
    * Returns the selected rows with `n_tokens` and `cum_tokens` added —
    * so a document is kept only if it fits the remaining budget whole;
    * documents are never split.
    */
  def tokenBudget(
      docs: DataFrame,
      scoreCol: Column,
      idCol: String,
      textCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val spark = docs.sparkSession
    val withN = docs
      .withColumn("__score", scoreCol)
      .withColumn(
        "n_tokens",
        coalesce(size(split(Cols.q(textCol), " ")).cast(LongType), lit(0L)))
      .repartitionByRange(col("__score").desc, Cols.q(idCol).asc)
      .sortWithinPartitions(col("__score").desc, Cols.q(idCol).asc)
    val nIdx = withN.schema.fieldIndex("n_tokens")

    // job 1: per-partition token sums → prefix offsets (p longs on driver)
    val partSums = withN.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(nIdx))
        Iterator((pid, s))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)

    // job 2 (lazy): local running sum + partition offset, then the filter
    val schema = withN.schema.add("cum_tokens", LongType, nullable = false)
    val rdd = withN.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = offsets(pid)
      it.map { r =>
        cum += r.getLong(nIdx)
        Row.fromSeq(r.toSeq :+ cum)
      }
    }
    spark
      .createDataFrame(rdd, schema)
      .where(col("cum_tokens") <= budget)
      .drop("__score")
  }
}
