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

  /** L2-normalized copy of the embedding (zero vectors pass through).
    * NOTE: the norm is captured inside the `transform` lambda, so it is
    * re-evaluated per element — O(d²) per row. Fine for narrow arrays and
    * tests; bulk paths should use [[l2NormalizeDf]], which hoists the norm
    * into a projection first (the [[int8Summary]] lesson).
    */
  def l2Normalize(emb: Column): Column = {
    val nrm = sqrt(aggregate(zip_with(emb, emb, (a, b) => a * b), lit(0.0), (s, x) => s + x))
    when(nrm === 0.0, emb).otherwise(transform(emb, x => x / nrm))
  }

  /** Bulk L2 normalization: replaces `embCol` with its normalized form,
    * norm computed ONCE per row via the codegen'd dot product and
    * referenced as a resolved attribute inside the lambda.
    */
  def l2NormalizeDf(df: DataFrame, embCol: String): DataFrame = {
    import graft.functions.GraftFunctions.dot
    val emb = Cols.q(embCol)
    df.withColumn("__nrm", sqrt(dot(emb, emb)))
      .withColumn(
        embCol,
        when(col("__nrm") === 0.0, emb).otherwise(transform(emb, x => x / col("__nrm"))))
      .drop("__nrm")
  }

  /** Symmetric int8 codes: round(x · 127/max|x|) ∈ [−127, 127]; a zero
    * vector quantizes to all zeros. NOTE: `scale` (two array scans) is
    * captured by the lambda and re-evaluated per element — O(d²) per row.
    * Convenience/test form only; bulk paths use [[int8CodesDf]], which
    * hoists the scale into a projection first.
    */
  def int8Codes(emb: Column): Column = {
    val scale = when(absMax(emb) === 0.0, lit(0.0)).otherwise(lit(127.0) / absMax(emb))
    transform(emb, x => round(x * scale).cast("int"))
  }

  /** Bulk int8 quantization: replaces `embCol` with the code array, scale
    * computed ONCE per row and referenced as a resolved attribute inside
    * the lambda — O(d) per row, the shape the scaladoc's "before an ANN
    * index build" use case needs.
    */
  def int8CodesDf(df: DataFrame, embCol: String): DataFrame = {
    val emb = Cols.q(embCol)
    df.withColumn(
        "__scale",
        when(absMax(emb) === 0.0, lit(0.0)).otherwise(lit(127.0) / absMax(emb)))
      .withColumn(embCol, transform(emb, x => round(x * col("__scale")).cast("int")))
      .drop("__scale")
  }

  /** Per-vector quantization summary — norm, dynamic range, exact integer
    * checksum of the codes, and mean absolute dequantization error. The
    * checksum makes the whole quantizer hash-comparable across engines
    * with zero float-ordering risk; the error term is the quality metric
    * (should sit near max_abs/254, half a quantization step).
    *
    * PERF: `max_abs`/`scale`/`nrm` are HOISTED into a staged projection
    * before the fold lambdas reference them. Higher-order-function lambdas
    * run interpreted, and an expression inlined into a lambda body is
    * re-evaluated PER ELEMENT — an inlined `scale` (which contains an
    * `array_max`) would make each fold O(d²) per row (measured 4.6 s vs
    * <1 s at sf0.1). Referencing a resolved attribute keeps each per-row
    * stat computed once; the two projections stay separate because
    * CollapseProject does not inline multi-use aliases.
    */
  def int8Summary(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    import graft.functions.GraftFunctions.dot
    val emb = Cols.q(embCol)
    val staged = df.select(
      Cols.q(idCol),
      emb.as("__emb"),
      absMax(emb).as("__max_abs"),
      sqrt(dot(emb, emb)).as("__nrm"))
    val scale = when(col("__max_abs") === 0.0, lit(0.0))
      .otherwise(lit(127.0) / col("__max_abs"))
    val withScale = staged.withColumn("__scale", scale)
    val qSum = aggregate(
      col("__emb"), lit(0L), (s, x) => s + round(x * col("__scale")).cast("long"))
    val qErr = when(col("__max_abs") === 0.0, lit(0.0)).otherwise(
      aggregate(
        col("__emb"), lit(0.0),
        (s, x) => s + abs(x - round(x * col("__scale")) / col("__scale"))) / size(col("__emb")))
    withScale.select(
      Cols.q(idCol),
      round(col("__nrm"), 6).as("nrm"),
      round(col("__max_abs"), 6).as("max_abs"),
      qSum.as("q_sum"),
      round(qErr, 6).as("q_err"))
  }
}
