package graft.llm

import graft.core.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE-style merge training over whitespace-pretokenized documents
  * (reference scope: the reference's text ops stop at token counting —
  * `/root/reference/src/tasks.py` has no tokenizer trainer; this is the
  * standard next step a training-data pipeline runs, expressed
  * Spark-first).
  *
  * Algorithm (classic BPE, Sennrich et al. 2016, on word tokens): repeat
  * `nMerges` times — count adjacent token pairs corpus-wide, pick the
  * most frequent (ties: left asc, right asc), replace every
  * non-overlapping left-to-right occurrence with the merged token.
  *
  * Scale shape: a driver loop like [[Mice]]/[[IvfIndex]] — each round is
  * ONE distributed pair-count aggregate (the hoisted
  * [[TextAnalysis.adjacentPairs]] projection, so pair extraction stays
  * O(tokens) per doc) plus ONE codegen'd `aggregate` HOF pass that
  * applies the merge, `localCheckpoint`ed so the plan does not nest one
  * lambda per round. Driver state is O(nMerges) merge rows; the corpus
  * never leaves the executors. Rounds are the declared cost: nMerges
  * full passes, the same trade every BPE trainer makes.
  *
  * The greedy left-to-right scan is implemented as a fold: append each
  * token, merging when the accumulator tail equals `left` and the token
  * equals `right`. The fold equals the two-pointer scan because a token
  * produced by THIS round's merge (`left + " " + right`) can never equal
  * `left` (right is non-empty), so a merged tail never immediately
  * re-merges — pinned against a driver-side reference scan in BpeSpec.
  */
object Bpe {

  /** @return the merge table: (merge_idx, left, right, pair_count,
    *         new_token), merge_idx 1-based in training order. Merged
    *         tokens join with a single space (input tokens are
    *         space-split so the joined form is unambiguous). Training
    *         stops early when the best pair's count falls below
    *         `minCount` (a merge that fires once carries no signal).
    */
  def trainMerges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nMerges: Int = 10,
      minCount: Long = 2L): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._

    var toks = docs
      .where(Cols.q(textCol).isNotNull)
      .select(Cols.q(idCol).as("__id"), split(Cols.q(textCol), " ").as("tk"))
      .localCheckpoint(true)

    val merges  = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, String)]
    var stopped = false
    var m       = 1
    while (m <= nMerges && !stopped) {
      val top = toks
        .select(explode(TextAnalysis.adjacentPairs(col("tk"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty || top.head.getLong(2) < minCount) stopped = true
      else {
        val (a, b, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        val merged    = a + " " + b
        merges += ((m, a, b, c, merged))
        val (la, lb, lm) = (lit(a), lit(b), lit(merged))
        toks = toks
          .select(
            col("__id"),
            aggregate(
              col("tk"),
              array().cast("array<string>"),
              (acc, t) =>
                when(
                  size(acc) > 0 && element_at(acc, -1) === la && t === lb,
                  concat(slice(acc, lit(1), size(acc) - 1), array(lm)))
                  .otherwise(concat(acc, array(t)))).as("tk"))
          .localCheckpoint(true)
        m += 1
      }
    }
    merges.toSeq.toDF("merge_idx", "left", "right", "pair_count", "new_token")
  }

  /** The corpus re-tokenized under the trained merges: one row per doc
    * with the post-merge token array — what a pipeline materializes to
    * feed packing ([[Packing]]) with a merged vocabulary. Applies the
    * SAME fold as training, one round per merge, checkpointed per round.
    */
  def applyMerges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    var toks = docs
      .where(Cols.q(textCol).isNotNull)
      .select(Cols.q(idCol).as(idCol), split(Cols.q(textCol), " ").as("tk"))
    for ((a, b) <- merges) {
      val (la, lb, lm) = (lit(a), lit(b), lit(a + " " + b))
      toks = toks
        .select(
          Cols.q(idCol),
          aggregate(
            col("tk"),
            array().cast("array<string>"),
            (acc, t) =>
              when(
                size(acc) > 0 && element_at(acc, -1) === la && t === lb,
                concat(slice(acc, lit(1), size(acc) - 1), array(lm)))
                .otherwise(concat(acc, array(t)))).as("tk"))
        .localCheckpoint(true)
    }
    toks
  }
}
