package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for corpus-scale counting (reference
  * scope: `/root/reference/src/tasks.py` counts exactly in pandas; a
  * 100 TB token stream needs a bounded-state alternative when the
  * vocabulary itself is too large to shuffle).
  *
  * Count-min sketch (Cormode & Muthukrishnan 2005): `depth` hash rows ×
  * `width` counters; every token increments one counter per row; the
  * estimate for a token is the MIN of its `depth` counters — always an
  * overestimate (collisions only add), within `e·N/width` of the truth
  * with probability `1 − e^−depth`.
  *
  * Spark-first shape: the sketch IS a map-side-combined aggregation —
  * explode the token stream to `depth` (row, bucket) keys and
  * `groupBy(row, bucket).count`. Each task's partial aggregate is at
  * most `depth × width` rows (the per-partition sketch); the shuffle
  * merges partials by addition, exactly the CMS merge law, and the
  * final state is `depth × width` longs however large the corpus is.
  * Nothing vocabulary-sized ever moves — that is the whole point of the
  * sketch vs the exact `groupBy(token)` path.
  *
  * Determinism: bucket hashes are salted-md5 u32s ([[Sampling]]'s
  * scheme, one salt per row), so the sketch — and therefore every
  * estimate — is bit-identical across runs, cluster sizes, AND engines:
  * integer counter sums are order-independent, which is what makes the
  * sketch hash-oracle-able in SQL (q110).
  */
object Sketches {

  /** First 8 md5 hex digits of the salted token as a u32 (the q38/q92
    * fold; DuckDB replays it nibble by nibble).
    */
  private def u32(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + "|"), c.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long")

  /** CMS bucket of a token for hash row `r`. */
  private[llm] def cmsBucket(tok: Column, r: Int, width: Int): Column =
    u32(tok, s"cms$r") % width

  /** The materialized sketch: (r, b, bc) — `depth × width` rows of
    * bucket counts over the corpus's whitespace token stream.
    */
  def countMinSketch(
      docs: DataFrame,
      textCol: String,
      depth: Int = 4,
      width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth/width >= 1, got $depth/$width")
    val toks = docs
      .where(Cols.q(textCol).isNotNull)
      .select(explode(split(Cols.q(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
    toks
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cmsBucket(col("tok"), r, width).as("b"))): _*)).as("e"))
      .groupBy(col("e.r").as("r"), col("e.b").as("b"))
      .agg(count(lit(1)).as("bc"))
  }

  /** CMS estimates vs truth for the corpus's top-`k` tokens: (rn, token,
    * true_count, cms_estimate, overestimate) — the calibration table a
    * pipeline inspects before trusting sketch counts downstream.
    * `overestimate = cms_estimate − true_count ≥ 0` always (CMS never
    * undercounts). The exact top-k side is the q53 vocabulary plan
    * (vocab-sized agg + TakeOrdered); the sketch side joins `depth`
    * broadcast rows per token from the `depth × width` sketch.
    */
  def cmsCalibration(
      docs: DataFrame,
      textCol: String,
      k: Int = 20,
      depth: Int = 4,
      width: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sketch = countMinSketch(docs, textCol, depth, width)

    val top = docs
      .where(Cols.q(textCol).isNotNull)
      .select(explode(split(Cols.q(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok")
      .agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("tok").asc)
      .limit(k)

    // per (token, hash row): the counter this token hashed into; the
    // estimate is the min across rows. The sketch is depth×width rows —
    // always broadcastable by construction.
    val probes = top.select(
      col("tok"),
      col("true_count"),
      explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cmsBucket(col("tok"), r, width).as("b"))): _*)).as("e"))
    val est = probes
      .join(broadcast(sketch), probes("e.r") === sketch("r") && probes("e.b") === sketch("b"))
      .groupBy(col("tok").as("token"), col("true_count"))
      .agg(min("bc").as("cms_estimate"))
    val w = Window.orderBy(col("true_count").desc, col("token").asc)
    est
      .select(
        col("token"),
        col("true_count"),
        col("cms_estimate"),
        (col("cms_estimate") - col("true_count")).as("overestimate"))
      .withColumn("rn", row_number().over(w))
  }
}
