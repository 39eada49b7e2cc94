package graft.llm

import graft.core.Tables
import graft.queries.Declared
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data text operators over the `documents` table (SURVEY.md
  * §2B north star): token counting, per-language quality stats, exact
  * dedup by content hash, deterministic MinHash signatures, n-gram
  * fingerprinting. All built from codegen'd expressions (`split`,
  * `explode`, `md5`, `concat`) — no UDFs — so they scale as ordinary
  * shuffled aggregations.
  */
object TextQueries {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  private def nTokens(c: Column): Column = size(split(c, " "))

  /** Per-language document stats: counts, token totals, char means. */
  val q15TextLangStats: Declared = Declared.sql(
    "q15_text_lang_stats",
    """SELECT lang, count(*) AS n_docs,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |  round(avg(n_chars), 4) AS avg_chars
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    t(spark, dir).documents
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct("source").as("n_sources"),
        sum(nTokens(col("text")).cast("long")).as("n_tokens"),
        round(avg("n_chars"), 4).as("avg_chars"))
      .orderBy("lang")
  }

  /** Exact dedup accounting: unique content hashes per source. At 100 TB
    * this is the standard first dedup pass — hash the content column once,
    * shuffle only the 16-byte digest.
    */
  val q16DedupExact: Declared = Declared.sql(
    "q16_dedup_exact",
    """SELECT source, count(*) AS n_rows,
      |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
      |  CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dupes
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin) { (spark, dir) =>
    val h = md5(col("text").cast("binary"))
    t(spark, dir).documents
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(h).as("n_unique"),
        (count(lit(1)) - countDistinct(h)).as("n_dupes"))
      .orderBy("source")
  }

  /** Deterministic MinHash signatures (4 salted md5 hash families over the
    * token set). Near-dup candidates are docs sharing a signature band —
    * the bucket-join runs on the tiny signature table, never on text. The
    * salted-min-md5 family is engine-portable (string min), which makes the
    * signature itself oracle-checkable.
    */
  val q17MinhashSignatures: Declared = Declared.sql(
    "q17_minhash_signatures",
    """SELECT doc_id,
      |  min(md5('s0|' || tok)) AS sig0, min(md5('s1|' || tok)) AS sig1,
      |  min(md5('s2|' || tok)) AS sig2, min(md5('s3|' || tok)) AS sig3
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val toks = t(spark, dir).documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    toks
      .groupBy("doc_id")
      .agg(
        min(md5(concat(lit("s0|"), col("tok")).cast("binary"))).as("sig0"),
        min(md5(concat(lit("s1|"), col("tok")).cast("binary"))).as("sig1"),
        min(md5(concat(lit("s2|"), col("tok")).cast("binary"))).as("sig2"),
        min(md5(concat(lit("s3|"), col("tok")).cast("binary"))).as("sig3"))
      .orderBy("doc_id")
  }

  /** Language-distribution token frequency: top-3 tokens per language by
    * (count desc, token asc) — explode → count → windowed top-k, the
    * canonical text-frequency plan shape.
    */
  val q18TopTokensPerLang: Declared = Declared.sql(
    "q18_top_tokens_per_lang",
    """SELECT lang, tok, n, CAST(rn AS INTEGER) AS rn FROM (
      |  SELECT lang, tok, count(*) AS n,
      |         row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, tok ASC) AS rn
      |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY lang, tok) x
      |WHERE rn <= 3
      |ORDER BY lang, rn""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val toks = t(spark, dir).documents
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("tok").asc)
    toks
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .orderBy("lang", "rn")
  }

  val all: Seq[Declared] = Seq(q15TextLangStats, q16DedupExact, q17MinhashSignatures, q18TopTokensPerLang)
}
