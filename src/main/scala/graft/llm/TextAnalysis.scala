package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §2B north
  * star): token counting (whitespace + BPE-ish regex), type-token ratio /
  * quality scoring, stopword-profile language ID, SimHash, and rolling-hash
  * document fingerprints. Everything is built from codegen'd expressions —
  * no UDFs — so each op is a pure projection or one shuffled aggregation.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def nTokens(text: Column): Column = size(split(text, " "))

  /** Per-document token Shannon entropy: −Σ p·ln p over the within-doc
    * token distribution, plus the ln(n_distinct)-normalized form (0 for
    * single-token docs). Two aggregations joined on the doc key — the
    * per-token counts and the doc totals — with the division order
    * matching the SQL oracle exactly (q106). Distributed shape: explode →
    * two groupBys on the same key (the second reuses the first's
    * exchange), no window, no driver state.
    */
  def tokenEntropy(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    import graft.core.Cols
    val cnt = docs
      .select(Cols.q(idCol).as("doc_id"), explode(split(Cols.q(textCol), " ")).as("t"))
      .groupBy("doc_id", "t")
      .agg(count(lit(1)).as("c"))
    val n = cnt
      .groupBy("doc_id")
      .agg(sum("c").cast("double").as("n"), count(lit(1)).as("k"))
    val p = col("c").cast("double") / col("n")
    cnt
      .join(n, "doc_id")
      .groupBy(col("doc_id"), col("n"), col("k"))
      .agg(round(-sum(p * log(p)), 6).as("token_entropy"),
        when(col("k") > 1, round(-sum(p * log(p)) / log(col("k").cast("double")), 6))
          .otherwise(0.0).as("norm_entropy"))
      .select(
        col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        col("k").cast("long").as("n_distinct"),
        col("token_entropy"),
        col("norm_entropy"))
  }

  /** BPE-ish token count: alpha runs, digit runs, and single punctuation
    * marks each count as one token (the usual pre-tokenizer regex shape).
    */
  def nBpeTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))

  /** Type-token ratio (lexical diversity), 0 for empty/null text (note
    * `split("", " ")` yields `[""]`, so the guard must be on text length,
    * not token count).
    */
  def typeTokenRatio(text: Column): Column = {
    val toks = split(text, " ")
    when(length(text) > 0, size(array_distinct(toks)).cast("double") / size(toks)).otherwise(0.0)
  }

  /** Heuristic quality score in [0,1]: length band + lexical diversity +
    * alpha ratio. The exact formula is declared (deterministic), mirroring
    * the length/punct/stopword-ratio scoring used in LLM data pipelines.
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val lenScore   = least(nChars.cast("double") / 500.0, lit(1.0))
    val diversity  = typeTokenRatio(text)
    val alphaRatio = (length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double"))
    round(lenScore * 0.4 + diversity * 0.3 + alphaRatio * 0.3, 6)
  }

  /** Stopword profiles for the five corpus languages. Tiny by design — the
    * operator shape (per-language profile score → argmax) is what matters;
    * swap in real profiles for production.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "du", "est", "que"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "他", "这", "中"))

  /** Per-language stopword-hit ratio. */
  def langScore(text: Column, lang: String): Column = {
    val toks = split(lower(text), " ")
    size(array_intersect(toks, array(stopwords(lang).map(lit): _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Predicted language: argmax of profile scores, ties to the
    * alphabetically-first language; "und" (undetermined) when no profile
    * matches at all.
    */
  def langId(text: Column): Column = {
    val langs  = stopwords.keys.toSeq.sorted
    val scored = langs.map(l => (l, langScore(text, l)))
    val best = scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bestLang, bestScore), (l, s)) =>
        (when(s > bestScore, lit(l)).otherwise(bestLang), greatest(s, bestScore))
    }
    when(best._2 > 0.0, best._1).otherwise(lit("und"))
  }

  /** 16-bit SimHash from md5 nibble votes: for bit b, tokens vote ±1 by the
    * high bit of hex digit b of their md5; the bit is 1 when the vote sum is
    * positive. String-only math → portable across engines (oracle-able).
    */
  def simhashVotes(tokMd5: Column, bit: Int): Column =
    when(substring(tokMd5, bit + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
      .otherwise(-1)

  /** Duplicate-trigram fraction — the Gopher/Dolma-style repetition signal:
    * 1 − distinct/total word trigrams; 0 for texts shorter than 3 tokens
    * (the guard matters: `sequence(0, size−3)` DESCENDS for short texts,
    * where DuckDB's `range` goes empty). `tk` must be a RESOLVED token
    * array column, not an inline `split(...)` — an inline expression would
    * be captured by the transform lambda and re-evaluated per element
    * (PLANS.md, the q58 lesson). The unigram companion (max token
    * frequency) needs a groupBy and lives in the q59 query shape.
    */
  def trigramDupFracFromTokens(tk: Column): Column = {
    val tri = size(array_distinct(transform(
      sequence(lit(0), size(tk) - 3),
      i => concat_ws(" ", element_at(tk, i + 1), element_at(tk, i + 2), element_at(tk, i + 3)))))
    when(size(tk) >= 3,
      lit(1.0) - tri.cast("double") / (size(tk) - lit(2)).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Polynomial rolling-hash fingerprint over the token sequence:
    * h = (h·31 + v(tok)) mod (2³¹−1), v(tok) = first 8 md5 hex digits as an
    * integer — one `aggregate` pass, order-sensitive (a reordered document
    * fingerprints differently, unlike a bag-of-words hash). The token value
    * is md5-derived rather than murmur3 so the whole fingerprint is
    * ENGINE-PORTABLE (DuckDB reproduces it exactly with
    * `list_reduce`, q38's oracle); the accumulator stays < 2⁶¹ so the
    * arithmetic is ANSI-safe in a long.
    */
  /** Overlapping token-window chunking (the RAG / context-window prep
    * op): chunk i covers tokens [i·stride, i·stride + size). Emitted as
    * an array of (chunk_idx, chunk_tokens) structs from ONE codegen'd
    * projection — `sequence` for the starts, `slice` per start — so
    * chunking a corpus is explode-of-a-projection, no shuffle, no UDF.
    * Tail chunks are partial (every token belongs to ≥1 chunk); callers
    * explode and hash/pack downstream.
    */
  def chunkWindows(tk: Column, size: Int, stride: Int): Column =
    transform(
      sequence(lit(0), greatest(org.apache.spark.sql.functions.size(tk) - 1, lit(0)), lit(stride)),
      start =>
        struct(
          (start / stride).cast("long").as("chunk_idx"),
          slice(tk, start + 1, lit(size)).as("chunk_tokens")))

  /** Adjacent token pairs of a token array, in order — the shared
    * building block of tokenizer-merge statistics ([[graft.llm.Vocab]]
    * pair counts) and the bigram LM quality score. One codegen
    * projection: `struct(tk[i], tk[i+1])` over an index `sequence`;
    * arrays with fewer than two tokens yield an empty pair list
    * (`sequence` would count DOWN from 1 to 0 otherwise — Spark
    * sequences are bidirectional).
    *
    * CALLER CONTRACT: pass a bound array COLUMN, not an inline
    * `split(...)` — `tk` is captured inside the transform lambda and a
    * captured expression re-evaluates per element, turning pair
    * extraction O(tokens²) per doc (the q58 HOF lesson; observed 18× on
    * the sf1 holdout plan). Hoist the tokenization into its own
    * projection first.
    */
  def adjacentPairs(tk: Column): Column = {
    val empty = array().cast("array<struct<a:string,b:string>>")
    when(
      org.apache.spark.sql.functions.size(tk) >= 2,
      transform(
        sequence(lit(1), org.apache.spark.sql.functions.size(tk) - 1),
        i => struct(element_at(tk, i).as("a"), element_at(tk, i + 1).as("b"))))
      .otherwise(empty)
  }

  def rollingFingerprint(text: Column): Column =
    aggregate(
      split(text, " "),
      lit(0L),
      (acc, tok) =>
        pmod(
          acc * lit(31L) + conv(substring(md5(tok.cast("binary")), 1, 8), 16, 10).cast("long"),
          lit(2147483647L)))

  /** PII masking rules, applied in order: (pattern, replacement). The
    * patterns are a conservative regex subset — no `\b`, no lookaround,
    * no backreferences — so the SAME string is valid under Java regex
    * (Spark codegen) and RE2 (DuckDB oracle). Emails go first because
    * their local part may contain digits that the phone/IP patterns
    * would otherwise bite into.
    */
  val piiRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}" -> "<IP>",
    "[0-9]{3}-[0-9]{3}-[0-9]{4}" -> "<PHONE>")

  /** Redact all PII occurrences (one chained codegen'd `regexp_replace`
    * per rule — a pure projection, no shuffle, scales linearly).
    */
  def redactPii(text: Column): Column =
    piiRules.foldLeft(text) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }

  /** Occurrence count for one PII rule's pattern (BIGINT). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  // ------------------------------------------------------------ Gopher rules
  // The published document-quality rule battery of Gopher (Rae et al. 2021,
  // appendix A1.1), reused by MassiveText/Dolma-style pipelines. Each metric
  // is a pure codegen'd expression over a RESOLVED token/line array column
  // (same multi-reference rule as trigramDupFracFromTokens: project the
  // split once, reference it many times, so CollapseProject keeps it).

  /** The required "stop words" of the Gopher rule set — a kept document
    * must contain at least 2 of these 8.
    */
  val gopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Mean token length in characters (0 for empty text, where the token
    * array is `[""]`).
    */
  def meanTokenLen(tk: Column): Column =
    aggregate(tk, lit(0L), (acc, w) => acc + length(w)).cast("double") /
      greatest(size(tk), lit(1)).cast("double")

  /** Gopher symbol-to-word screen: '#' and '...' occurrences per token. */
  def symbolRatio(text: Column, tk: Column): Column =
    (size(regexp_extract_all(text, lit("#"), lit(0))) +
      size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0)))).cast("double") /
      greatest(size(tk), lit(1)).cast("double")

  /** Fraction of lines matching `pat` (caller anchors the regex; the
    * pattern must stay in the Java-regex ∩ RE2 subset so the oracle can
    * replay it — same constraint as [[piiRules]]).
    */
  def lineFrac(lines: Column, pat: String): Column =
    size(filter(lines, l => l.rlike(pat))).cast("double") /
      greatest(size(lines), lit(1)).cast("double")

  /** Fraction of tokens containing at least one ASCII letter. */
  def alphaTokenFrac(tk: Column): Column =
    size(filter(tk, w => w.rlike("[a-zA-Z]"))).cast("double") /
      greatest(size(tk), lit(1)).cast("double")

  /** How many distinct [[gopherRequiredWords]] appear among the tokens. */
  def requiredWordHits(tk: Column): Column =
    size(array_intersect(
      transform(tk, w => lower(w)),
      array(gopherRequiredWords.map(lit): _*))).cast("long")
}
