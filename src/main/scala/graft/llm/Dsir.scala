package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) — score every raw document by how target-like its
  * hashed n-gram distribution is, then keep the highest-weight slice.
  * This is the standard pretraining-data selection step the reference's
  * text ops stop short of (`/root/reference/src/tasks.py` ends at token
  * counting); expressed Spark-first.
  *
  * Features are HASHED unigram buckets: `substr(md5(token), 1, prefixLen)`
  * — 16^prefixLen buckets, identical across engines and cluster sizes
  * (the q38/q51 md5 trick). Bucket distributions are estimated with
  * add-one smoothing on the target slice and on the full raw corpus; a
  * document's importance weight is the bag-of-features log-likelihood
  * ratio Σ_tokens ln(p_target(bucket) / p_raw(bucket)).
  *
  * Scale shape: ONE token explode feeding two bucket-keyed aggregates
  * (each at most 16^prefixLen rows — a few hundred at the default), both
  * broadcast back onto the token stream, then a doc-keyed sum. No
  * vocabulary-sized shuffle, no window; the model state is O(buckets)
  * regardless of corpus size, which is exactly why DSIR hashes features.
  */
object Dsir {

  /** Per-document DSIR importance weights.
    *
    * @param isTarget  predicate over `docs` columns marking the target
    *                  (domain-like) slice the weights should favor
    * @param prefixLen md5 hex prefix length; feature space = 16^prefixLen
    * @return (idCol, n_tokens, dsir_weight) — weight rounded to 6 dp,
    *         one row per non-null-text document
    */
  def importanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      prefixLen: Int = 2): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8, s"prefixLen must be in [1,8], got $prefixLen")
    val buckets = math.pow(16, prefixLen)

    val toks = docs
      .where(Cols.q(textCol).isNotNull)
      .select(
        Cols.q(idCol).as("__id"),
        isTarget.as("__tgt"),
        explode(split(Cols.q(textCol), " ")).as("tok"))
      .withColumn("b", substring(md5(col("tok")), 1, prefixLen))

    // Two bucket-keyed aggregates: target slice and full raw corpus. Both
    // are at most 16^prefixLen rows — broadcast material by construction.
    val tgt  = toks.where(col("__tgt")).groupBy("b").agg(count(lit(1)).as("nt"))
    val raw  = toks.groupBy("b").agg(count(lit(1)).as("nr"))
    val tTot = tgt.agg(sum("nt").cast("double").as("tt"))
    val rTot = raw.agg(sum("nr").cast("double").as("rt"))

    val pT = (coalesce(col("nt"), lit(0L)).cast("double") + lit(1.0)) / (col("tt") + lit(buckets))
    val pR = (coalesce(col("nr"), lit(0L)).cast("double") + lit(1.0)) / (col("rt") + lit(buckets))

    toks
      .join(broadcast(tgt), Seq("b"), "left")
      .join(broadcast(raw), Seq("b"), "left")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .groupBy(col("__id").as(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        round(sum(log(pT / pR)), 6).as("dsir_weight"))
  }
}
