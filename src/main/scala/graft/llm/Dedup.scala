package graft.llm

import graft.core.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication operators (SURVEY.md §2B north star).
  *
  * Scale shape: exact dedup shuffles only a 16-byte content digest;
  * near-dup runs MinHash → band buckets → candidate join → exact Jaccard
  * verification, so the quadratic work is confined to documents that share
  * a band (hash collision on r concatenated signatures ≈ Jaccard^r), never
  * the full corpus.
  */
object Dedup {

  /** Exact dedup by content hash: first row per digest survives (ties
    * broken by the id column for determinism).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("__digest").orderBy(Cols.q(idCol))
    docs
      .withColumn("__digest", md5(Cols.q(textCol).cast("binary")))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__digest", "__rn")
  }

  /** Deterministic MinHash signatures: `nSigs` salted min-md5 hash
    * families over the token set (same family as q17, generalized).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String, nSigs: Int = 8): DataFrame = {
    val toks = docs.select(Cols.q(idCol).as("__id"), explode(split(Cols.q(textCol), " ")).as("tok"))
    toks
      .groupBy("__id")
      .agg(
        min(md5(concat(lit("s0|"), col("tok")).cast("binary"))).as("sig0"),
        (1 until nSigs).map(i =>
          min(md5(concat(lit(s"s$i|"), col("tok")).cast("binary"))).as(s"sig$i")): _*)
  }

  /** Near-dup pairs: band the signatures (`bands` × `rowsPerBand`), bucket
    * candidates sharing any band, then verify with exact token-set Jaccard
    * ≥ `tau`. Returns (a_id, b_id, jaccard) with a_id < b_id.
    */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int = 4,
      rowsPerBand: Int = 2,
      tau: Double = 0.5): DataFrame = {
    val nSigs = bands * rowsPerBand
    val sigs  = minhashSignatures(docs, idCol, textCol, nSigs)

    // band value = concatenated signature slice; explode to (band_idx, val)
    val bandCols = (0 until bands).map { b =>
      struct(
        lit(b).as("band_idx"),
        concat_ws("|", (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}")): _*)
          .as("band_val"))
    }
    val banded = sigs.select(col("__id"), explode(array(bandCols: _*)).as("b"))
      .select(col("__id"), col("b.band_idx").as("band_idx"), col("b.band_val").as("band_val"))

    val candidates = banded.toDF("a_id", "band_idx", "band_val")
      .join(banded.toDF("b_id", "band_idx", "band_val"), Seq("band_idx", "band_val"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .distinct()

    // exact verification on the candidate set only
    val tokenSets = docs.select(
      Cols.q(idCol).as("__id"),
      array_distinct(split(Cols.q(textCol), " ")).as("toks"))
    candidates
      .join(tokenSets.select(col("__id").as("a_id"), col("toks").as("a_toks")), Seq("a_id"))
      .join(tokenSets.select(col("__id").as("b_id"), col("toks").as("b_toks")), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("a_toks"), col("b_toks"))).cast("double"))
      .withColumn(
        "jaccard",
        round(col("inter") / (size(col("a_toks")) + size(col("b_toks")) - col("inter")), 6))
      .where(col("jaccard") >= tau)
      .select("a_id", "b_id", "jaccard")
  }
}
