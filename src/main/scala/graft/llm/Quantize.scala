package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression for training/serving pipelines (SURVEY.md §2B
  * north star): symmetric int8 quantization (scale = 127 / max|x| per
  * vector, the faiss/HNSW-style SQ8 scheme) and L2 normalization — pure
  * per-row array projections, codegen'd, shuffle-free; at 100 TB this is
  * a map-only pass that cuts embedding bytes 4× before they enter an ANN
  * index build like [[IvfIndex]].
  */
object Quantize {

  private def absMax(emb: Column): Column =
    array_max(transform(emb, x => abs(x)))

  /** L2-normalized copy of the embedding (zero vectors pass through). */
  def l2Normalize(emb: Column): Column = {
    val nrm = sqrt(aggregate(zip_with(emb, emb, (a, b) => a * b), lit(0.0), (s, x) => s + x))
    when(nrm === 0.0, emb).otherwise(transform(emb, x => x / nrm))
  }

  /** Symmetric int8 codes: round(x · 127/max|x|) ∈ [−127, 127]; a zero
    * vector quantizes to all zeros.
    */
  def int8Codes(emb: Column): Column = {
    val scale = when(absMax(emb) === 0.0, lit(0.0)).otherwise(lit(127.0) / absMax(emb))
    transform(emb, x => round(x * scale).cast("int"))
  }

  /** Per-vector quantization summary — norm, dynamic range, exact integer
    * checksum of the codes, and mean absolute dequantization error. The
    * checksum makes the whole quantizer hash-comparable across engines
    * with zero float-ordering risk; the error term is the quality metric
    * (should sit near max_abs/254, half a quantization step).
    */
  def int8Summary(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val emb    = Cols.q(embCol)
    val maxAbs = absMax(emb)
    val scale  = when(maxAbs === 0.0, lit(0.0)).otherwise(lit(127.0) / maxAbs)
    val nrm    = sqrt(aggregate(zip_with(emb, emb, (a, b) => a * b), lit(0.0), (s, x) => s + x))
    val qSum = aggregate(emb, lit(0L), (s, x) => s + round(x * scale).cast("long"))
    val qErr = when(maxAbs === 0.0, lit(0.0)).otherwise(
      aggregate(emb, lit(0.0), (s, x) => s + abs(x - round(x * scale) / scale)) / size(emb))
    df.select(
      Cols.q(idCol),
      round(nrm, 6).as("nrm"),
      round(maxAbs, 6).as("max_abs"),
      qSum.as("q_sum"),
      round(qErr, 6).as("q_err"))
  }
}
