package graft.llm

import graft.core.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus build — the composition every stage in
  * this package exists for, as ONE lazy plan:
  *
  *   quality/gopher filter → exact dedup → quality-ordered token-budget
  *   selection → sequence packing
  *
  * Nothing here re-implements a stage; each is the already-oracled
  * operator ([[TextAnalysis]] metrics, [[Dedup.exact]],
  * [[CorpusSelect.tokenBudget]], [[Packing]]'s pack arithmetic), so the
  * pipeline's own oracle (q86) is the same CTE chain in SQL. Shuffle
  * budget end to end: one digest-keyed window (dedup), one
  * range-partition for the prefix-sum scan (selection) — the filter and
  * the pack-id arithmetic are projections.
  *
  * The rule thresholds are parameters (a corpus that fails the published
  * Gopher word-count band wholesale — like the short-doc synthetic test
  * corpus — still needs a usable filter); defaults are the declared-q86
  * operating point, not the published constants (those are q79's).
  */
object CorpusPipeline {

  /** Per-document result: the selected corpus with `quality`,
    * `n_tokens`, `cum_tokens` (selection-order running total) and
    * `pack_id` (capacity-sized training sequences in selection order).
    */
  /** The pipeline's filter stage on its own: quality metrics projected
    * once, keep decision on ROUNDED values (the q79 rule: a float at a
    * rule boundary must not flip on one engine), `quality` column
    * attached. Pure projections + one filter — stream-safe, which is why
    * [[graft.stream.StreamingOps.ingestDocumentsStream]] shares it
    * verbatim.
    */
  def qualityFilter(
      docs: DataFrame,
      textCol: String,
      nCharsCol: String,
      minWords: Long = 20L,
      maxWords: Long = 100000L,
      minAlphaFrac: Double = 0.8,
      minReqWords: Long = 1L): DataFrame = {
    val text = Cols.q(textCol)
    docs
      .withColumn("__tk", split(text, " "))
      .withColumn("__n_words", size(col("__tk")).cast("long"))
      .withColumn("__alpha", round(TextAnalysis.alphaTokenFrac(col("__tk")), 6))
      .withColumn("__req", TextAnalysis.requiredWordHits(col("__tk")))
      .withColumn("quality", TextAnalysis.qualityScore(text, Cols.q(nCharsCol)))
      .where(
        col("__n_words").between(minWords, maxWords) &&
          col("__alpha") >= minAlphaFrac && col("__req") >= minReqWords)
      .drop("__tk", "__n_words", "__alpha", "__req")
  }

  def buildTrainingSet(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nCharsCol: String,
      budget: Long,
      capacity: Long,
      minWords: Long = 20L,
      maxWords: Long = 100000L,
      minAlphaFrac: Double = 0.8,
      minReqWords: Long = 1L): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val filtered =
      qualityFilter(docs, textCol, nCharsCol, minWords, maxWords, minAlphaFrac, minReqWords)
    val deduped = Dedup.exact(filtered, idCol, textCol)
    CorpusSelect
      .tokenBudget(deduped, col("quality"), idCol, textCol, budget)
      // packing the SELECTED corpus in selection order: the running
      // totals are exactly the pack offsets, so pack_id is arithmetic,
      // not another scan (`div` keeps it integral end to end)
      .withColumn("pack_id", expr(s"(cum_tokens - n_tokens) div ${capacity}L"))
  }
}
