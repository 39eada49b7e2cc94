package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic span corruption for denoising pretraining (T5-style:
  * Raffel et al. 2020 §3.1.4) — replace token spans with numbered
  * sentinels and emit the (corrupted input, span targets) pair a
  * denoising objective trains on.
  *
  * Span placement is BLOCKED rather than i.i.d.: the token stream is cut
  * into fixed blocks of `blockLen`; each FULL block is corrupted with
  * probability ~1/`rate` (salted-md5 draw on (doc, block)), and the
  * corrupted span of `spanLen` tokens sits at a hashed offset inside its
  * block. One span per block ⇒ non-overlap BY CONSTRUCTION — the greedy
  * non-overlapping scan of the reference implementations is sequential
  * per doc, which neither distributes nor replays relationally; blocking
  * trades a small placement-distribution difference for a pure
  * projection the oracle can replay bit-for-bit.
  *
  * Scale shape: ONE codegen projection over hoisted token arrays
  * (`transform`/`filter`/`flatten` HOFs — the array is bound to a column
  * first, per the q58/q93 capture rule). No shuffle, no state, no UDF;
  * determinism comes from the same salted-md5 u32 scheme as [[Sampling]]
  * and [[Sketches]], so every span lands identically on every engine,
  * run, and cluster size.
  */
object Denoise {

  private def u32(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + "|"), c).cast("binary")), 1, 8), 16, 10).cast("long")

  /** @return one row per document: (idCol, n_tokens, n_spans,
    *         input_text, target_text) — `input_text` is the corrupted
    *         token stream with `<extra_id_K>` sentinels, `target_text`
    *         the concatenated `<extra_id_K> span…` targets (empty string
    *         when no block was drawn). Docs with NULL text are dropped.
    */
  def spanCorrupt(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockLen: Int = 8,
      spanLen: Int = 3,
      rate: Int = 4,
      salt: String = "span"): DataFrame = {
    require(spanLen >= 1 && blockLen >= spanLen, s"need 1 <= spanLen <= blockLen")
    require(rate >= 1, s"rate must be >= 1, got $rate")
    val offRange = blockLen - spanLen + 1

    val base = docs
      .where(Cols.q(textCol).isNotNull)
      .select(
        Cols.q(idCol).as("__id"),
        filter(split(Cols.q(textCol), " "), t => t =!= lit("")).as("tk"))
      .withColumn("n", size(col("tk")))
      // full blocks only: a partial tail block never hosts a span
      .withColumn("nb", (col("n") / blockLen).cast("int"))

    def blockKey(b: Column): Column =
      concat(col("__id").cast("string"), lit("|"), b.cast("string"))
    def corrupt(b: Column): Column =
      u32(blockKey(b), s"${salt}c") % rate === 0
    def off(b: Column): Column =
      (u32(blockKey(b), s"${salt}o") % offRange).cast("int")

    val withBlocks = base
      .withColumn(
        "cb",
        when(col("nb") > 0, filter(sequence(lit(0), col("nb") - 1), b => corrupt(b)))
          .otherwise(array().cast("array<int>")))

    // input: per block, tokens with the span replaced by ONE sentinel
    // whose index is the span's rank within the doc; the tail past the
    // last full block passes through untouched
    // sequence(0, nb-1) would run DESCENDING for nb = 0 — guard to empty
    val blockIdx =
      when(col("nb") > 0, sequence(lit(0), col("nb") - 1))
        .otherwise(array().cast("array<int>"))
    val inputToks = concat(
      flatten(transform(
        blockIdx,
        b => {
          val blockToks = slice(col("tk"), b * blockLen + 1, lit(blockLen))
          val k         = array_position(col("cb"), b) - 1 // -1 → not corrupted
          when(
            k >= 0,
            concat(
              slice(blockToks, lit(1), off(b)),
              array(concat(lit("<extra_id_"), k.cast("string"), lit(">"))),
              slice(blockToks, off(b) + spanLen + 1, lit(blockLen - spanLen) - off(b))))
            .otherwise(blockToks)
        })),
      slice(col("tk"), col("nb") * blockLen + 1, col("n") - col("nb") * blockLen))

    val targetToks = flatten(transform(
      col("cb"),
      (b, i) =>
        concat(
          array(concat(lit("<extra_id_"), i.cast("string"), lit(">"))),
          slice(col("tk"), b * blockLen + off(b) + 1, lit(spanLen)))))

    withBlocks.select(
      col("__id").as(idCol),
      col("n").cast("long").as("n_tokens"),
      size(col("cb")).cast("long").as("n_spans"),
      array_join(inputToks, " ").as("input_text"),
      array_join(targetToks, " ").as("target_text"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022,
    * arXiv:2207.14255 — "FIM"): reorder a salted fraction of documents
    * into the PSM (prefix-suffix-middle) layout
    * `<PRE> prefix <SUF> suffix <MID> middle`, so an autoregressive
    * model learns infilling from plain left-to-right training — the
    * code-corpus companion to [[spanCorrupt]]'s T5 objective.
    *
    * Split points are salted-md5 draws on the doc id (the [[Sampling]]
    * u32 scheme): `p1 ∈ [1, n−2]`, `p2 ∈ [p1+1, n−1]`, so prefix,
    * middle and suffix are all NON-EMPTY on transformed docs; docs
    * shorter than 3 tokens, and the un-drawn `1 − 1/rate` remainder,
    * pass through untransformed (token stream re-joined on single
    * spaces — the same normalization every whitespace-token op here
    * applies). One codegen projection, no shuffle, no state; every
    * split lands identically on every engine and cluster size, which is
    * what lets q143 hash-replay the whole transform in DuckDB.
    *
    * @return (idCol, is_fim, fim_text)
    */
  def fimTransform(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rate: Int = 2,
      salt: String = "fim"): DataFrame = {
    require(rate >= 1, s"rate must be >= 1, got $rate")
    val base = docs
      .where(Cols.q(textCol).isNotNull)
      .select(
        Cols.q(idCol).as("__id"),
        filter(split(Cols.q(textCol), " "), t => t =!= lit("")).as("tk"))
      .withColumn("n", size(col("tk")))
    val key   = col("__id").cast("string")
    val isFim = (u32(key, s"${salt}d") % rate === 0) && (col("n") >= 3)
    // split draws guarded by n >= 3 on BOTH engines so no modulo ever
    // sees a non-positive divisor (Spark nulls a %0, DuckDB errors — the
    // guard keeps the replay engine-agnostic)
    val p1 = when(col("n") >= 3,
      (u32(key, s"${salt}a") % (col("n") - 2) + 1).cast("int"))
    val p2 = when(col("n") >= 3,
      (p1 + 1 + (u32(key, s"${salt}b") % (col("n") - 1 - p1))).cast("int"))
    base.select(
      col("__id").as(idCol),
      isFim.as("is_fim"),
      when(
        isFim,
        concat(
          lit("<PRE> "), array_join(slice(col("tk"), lit(1), p1), " "),
          lit(" <SUF> "), array_join(slice(col("tk"), p2 + 1, col("n") - p2), " "),
          lit(" <MID> "), array_join(slice(col("tk"), p1 + 1, p2 - p1), " ")))
        .otherwise(array_join(col("tk"), " "))
        .as("fim_text"))
  }
}
