package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
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
  * Kernel: each document is packed ONCE into a delimited string —
  * `␁␁tok1␁␁tok2␁␁…␁␁` (U+0001 delimiters, doubled between tokens) — and
  * one merge round is ONE codegen'd `replace(s, "␁a␁␁b␁", "␁a b␁")`.
  * Because the doubled delimiter leaves one ␁ on each side of a match
  * unconsumed, back-to-back occurrences (`a b a b`) all merge in a single
  * left-to-right pass, and an overlapping run (`a a a` with merge (a,a))
  * merges greedily non-overlapping — exactly the classic two-pointer
  * scan, pinned against a driver-side reference in BpeSpec. This replaces
  * a per-token array fold (`aggregate` + `concat(acc, array(t))`), which
  * copies the accumulator per element — O(tokens²) array churn per doc
  * per round vs the replace's single O(chars) scan.
  *
  * Scale shape: a driver loop like [[Mice]]/[[IvfIndex]] — each round is
  * ONE distributed pair-count aggregate (the hoisted
  * [[TextAnalysis.adjacentPairs]] projection, so pair extraction stays
  * O(tokens) per doc) plus the O(chars) replace, `localCheckpoint`ed so
  * the plan does not nest one round per merge. Driver state is O(nMerges)
  * merge rows; the corpus never leaves the executors. Rounds are the
  * declared cost: nMerges full passes, the same trade every BPE trainer
  * makes.
  *
  * Tokens are the NON-EMPTY whitespace splits of the text (empty
  * fragments from doubled/leading spaces carry no merge signal), and must
  * not contain U+0001 (the packing delimiter). Merged tokens join with a
  * single space — unambiguous, since input tokens are space-split.
  */
object Bpe {

  private[llm] val D  = "\u0001"
  private[llm] val DD = D + D

  /** (id, s): the corpus packed into delimited strings. A document
    * containing the U+0001 delimiter would silently corrupt the packing
    * (wrong merge tables, wrong token arrays), so the contract is
    * ENFORCED in the same projection: `raise_error` fires at execution
    * time on the offending document — loud failure, zero extra jobs.
    */
  private def packed(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val txt = Cols.q(textCol)
    val checked = when(
      txt.contains(lit(D)),
      raise_error(concat(
        lit("Bpe: text contains the packing delimiter U+0001 (id="),
        Cols.q(idCol).cast("string"),
        lit(")")))).otherwise(txt)
    docs
      .where(txt.isNotNull)
      .select(
        Cols.q(idCol).as("__id"),
        concat(
          lit(DD),
          array_join(filter(split(checked, " "), t => t =!= lit("")), DD),
          lit(DD)).as("s"))
  }

  /** Token array back out of a packed string. */
  private[llm] def unpack(s: Column): Column =
    filter(split(s, DD), t => t =!= lit(""))

  /** One merge round as a string rewrite (see object doc for why this is
    * exactly the greedy non-overlapping scan).
    */
  private def mergeOnce(s: Column, a: String, b: String): Column =
    replace(s, lit(D + a + DD + b + D), lit(D + a + " " + b + D))

  /** @return the merge table: (merge_idx, left, right, pair_count,
    *         new_token), merge_idx 1-based in training order. Training
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

    var cur = packed(docs, idCol, textCol).localCheckpoint(true)

    val merges  = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, String)]
    var stopped = false
    var m       = 1
    while (m <= nMerges && !stopped) {
      // token array hoisted to its own projection (captured expressions in
      // the transform lambda re-evaluate per element — the q58 HOF lesson)
      val top = graft.core.Jobs.collectFast(
        cur
          .select(unpack(col("s")).as("tk"))
          .select(explode(TextAnalysis.adjacentPairs(col("tk"))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("a").asc, col("b").asc)
          .limit(1))
      if (top.isEmpty || top.head.getLong(2) < minCount) stopped = true
      else {
        val (a, b, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((m, a, b, c, a + " " + b))
        cur = cur
          .select(col("__id"), mergeOnce(col("s"), a, b).as("s"))
          .localCheckpoint(true)
        m += 1
      }
    }
    merges.toSeq.toDF("merge_idx", "left", "right", "pair_count", "new_token")
  }

  /** The corpus re-tokenized under the trained merges: one row per doc
    * with the post-merge token array — what a pipeline materializes to
    * feed packing ([[Packing]]) with a merged vocabulary. The whole merge
    * chain is ONE projection of nested `replace`s (narrow, codegen'd, no
    * checkpoints): each round is O(chars), so applying k merges costs k
    * linear scans of the doc string, not k array rebuilds.
    */
  def applyMerges(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val s0 = packed(docs, idCol, textCol)
    val sN = merges.foldLeft(col("s")) { case (c, (a, b)) =>
      replace(c, lit(D + a + DD + b + D), lit(D + a + " " + b + D))
    }
    s0.select(col("__id").as(idCol), unpack(sN).as("tk"))
  }
}
