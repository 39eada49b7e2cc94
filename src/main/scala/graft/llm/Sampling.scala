package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines: selection is a pure
  * function of (salt, id) via an md5-prefix threshold, so samples are
  * reproducible across runs, engines, and cluster sizes — no RNG state, no
  * seed-per-partition coupling like `DataFrame.sample`. The md5 hex prefix
  * is uniform over [0x00, 0xff], so a two-hex-digit threshold gives
  * rate ≈ threshold/256, comparable as plain strings in any engine.
  */
object Sampling {

  /** The one salted-hash definition every sampling op derives from —
    * a single site so the salting scheme (separator, cast) can never
    * silently diverge between ops or from the documented oracle SQL.
    */
  private def saltedMd5(id: Column, salt: String): Column =
    md5(concat(lit(salt + "|"), id.cast("string")).cast("binary"))

  /** Two-hex-digit bucket of the salted id (uniform over "00".."ff"). */
  def hashBucket(id: Column, salt: String): Column =
    substring(saltedMd5(id, salt), 1, 2)

  /** Keep rows whose bucket falls under the stratum's threshold. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      thresholds: Map[String, String],
      defaultThreshold: String,
      salt: String = "sample"): DataFrame = {
    val bucket = hashBucket(Cols.q(idCol), salt)
    val limit = thresholds.foldLeft(lit(defaultThreshold)) { case (acc, (stratum, hex)) =>
      when(Cols.q(strataCol) === stratum, lit(hex)).otherwise(acc)
    }
    df.where(bucket < limit)
  }

  /** Deterministic train/test split column ("cc" ≈ 80% train). */
  def trainTestSplit(id: Column, trainThreshold: String = "cc", salt: String = "split"): Column =
    when(hashBucket(id, salt) < lit(trainThreshold), lit("train")).otherwise(lit("test"))

  /** Exact-count stratified take: the `n` rows per stratum with the
    * smallest salted-md5 rank (id tiebreak) — "give me exactly 1 000 docs
    * per source", deterministic and cluster-size-invariant, vs
    * [[stratifiedSample]]'s rate-based keep. One shuffle on the stratum
    * key; the per-group sort is top-n-bounded by the window's rank
    * filter, never a full materialized sort per group. Adds `sample_rank`
    * (1..n within the stratum).
    */
  def stratifiedTake(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      n: Int,
      salt: String = "take"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(Cols.q(strataCol))
      .orderBy(saltedMd5(Cols.q(idCol), salt), Cols.q(idCol))
    df.withColumn("sample_rank", row_number().over(w)).where(col("sample_rank") <= n)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * draw the `k` rows with the smallest exponential-jitter key
    * `-ln(u)/w`, where `u` is the salted-md5 uniform of the id — the
    * one-pass distributed formulation of "sample k docs proportional to
    * weight, no repeats" (a mixture draw where bigger/better documents
    * should win proportionally more often than [[stratifiedTake]]'s
    * unweighted ranks allow).
    *
    * `u = (u32 + 0.5) / 2^32` with `u32` the first 8 md5 hex digits —
    * strictly inside (0,1), so the log never overflows, and bit-exactly
    * reproducible in any engine that can fold hex digits (same trick as
    * the q38 fingerprint oracle). The key is rounded to 6 dp BEFORE
    * ranking (id tie-break) so near-ties rank identically across engines.
    *
    * Scale shape: one codegen projection + a TakeOrdered top-k — no
    * global window, no shuffle beyond the k-row merge. Rows with
    * weight <= 0 or null are excluded (they have zero draw probability).
    */
  def weightedTake(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = "wtake"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u32 = conv(substring(saltedMd5(Cols.q(idCol), salt), 1, 8), 16, 10).cast("long")
    val u   = (u32.cast("double") + lit(0.5)) / lit(4294967296.0)
    val key = round(-log(u) / Cols.q(weightCol).cast("double"), 6)
    val top = df
      .where(Cols.q(weightCol).isNotNull && Cols.q(weightCol) > 0)
      .withColumn("es_key", key)
      .orderBy(col("es_key").asc, Cols.q(idCol).asc)
      .limit(k)
    // the partition-less window runs over <= k rows by construction
    val w = Window.orderBy(col("es_key").asc, Cols.q(idCol).asc)
    top.withColumn("sample_rank", row_number().over(w))
  }
}
