package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for training pipelines (SURVEY.md §2B north star):
  * assign documents, in a deterministic total order, to fixed-capacity
  * "packs" (context windows) by running token count — the preprocessing
  * step that turns a shuffled corpus into dense max-length training
  * sequences.
  *
  * Semantics: with `cum` = running token total over `orderCol` (inclusive),
  * a document's pack is `(cum − n) div capacity` — capacity boundaries fall
  * at fixed token offsets and a document crossing a boundary counts toward
  * the pack where it starts. This is the windowed-cumsum formulation (same
  * row-to-pack mapping as `sum() OVER (ORDER BY …)` in SQL), chosen over
  * closed-bin greedy packing because it is expressible as a scan — greedy
  * bin-closing is inherently sequential per bin and cannot be replayed by
  * a relational oracle.
  *
  * Scale shape: a global `sum() OVER (ORDER BY …)` window would funnel the
  * corpus through ONE task ("WindowExec: No Partition Defined"). Instead
  * the cumsum is the canonical two-phase scan, the prefix-sum sibling of
  * [[Vocab.denseIds]]: range-partition by the order key, one small job
  * collects per-partition token sums (p longs to the driver), then one
  * `mapPartitionsWithIndex` adds each partition's prefix offset to its
  * local running sum. No partition ever sees more than its slice.
  */
object Packing {

  /** The shared two-phase scan: input columns plus `n_tokens` (whitespace
    * tokens; null text counts 0) and `cum_tokens` (INCLUSIVE running total
    * over `orderKeys`). The scaffold under both [[packSequences]] and
    * [[CorpusSelect.tokenBudget]] — one definition so the null guard and
    * the offset arithmetic can never diverge between them.
    */
  private[llm] def withRunningTokens(
      docs: DataFrame,
      orderKeys: Seq[org.apache.spark.sql.Column],
      textCol: String): DataFrame = {
    Seq("n_tokens", "cum_tokens").foreach(c =>
      require(!docs.columns.contains(c), s"input frame already has a '$c' column"))
    val spark = docs.sparkSession
    val withN = docs
      // null text counts 0 tokens (size(split(null)) is null, and a null
      // would NPE the primitive getLong in the scan below)
      .withColumn(
        "n_tokens",
        coalesce(size(split(Cols.q(textCol), " ")).cast(LongType), lit(0L)))
      .repartitionByRange(orderKeys: _*)
      .sortWithinPartitions(orderKeys: _*)
    val nIdx = withN.schema.fieldIndex("n_tokens")

    // job 1: per-partition token sums → prefix offsets (p longs on the driver)
    val partSums = withN.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(nIdx))
        Iterator((pid, s))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)

    // job 2 (lazy): local running sum + partition offset
    val schema = withN.schema.add("cum_tokens", LongType, nullable = false)
    val rdd = withN.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = offsets(pid)
      it.map { r =>
        cum += r.getLong(nIdx)
        Row.fromSeq(r.toSeq :+ cum)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Per-document pack assignment: input columns plus `n_tokens` (whitespace
    * tokens), `pack_id` (0-based). Deterministic for a fixed `orderCol`.
    */
  def packSequences(
      docs: DataFrame,
      orderCol: String,
      textCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    withRunningTokens(docs, Seq(Cols.q(orderCol)), textCol)
      // `div` keeps the arithmetic integral end-to-end (a double division
      // would be exact only below 2^53 accumulated tokens)
      .withColumn("pack_id", expr(s"(cum_tokens - n_tokens) div ${capacity}L"))
      .drop("cum_tokens")
  }

  /** Per-pack rollup: documents and token totals per pack (the shape a
    * sequence-writer consumes). `util_pct` shows fill against capacity —
    * the training-efficiency metric packing exists to maximize.
    */
  def packSummary(
      docs: DataFrame,
      orderCol: String,
      textCol: String,
      capacity: Long): DataFrame =
    packSequences(docs, orderCol, textCol, capacity)
      .groupBy("pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        round(sum("n_tokens") / lit(capacity.toDouble) * 100.0, 4).as("util_pct"))
      .orderBy("pack_id")

  /** Balanced shard assignment: stripe the corpus, in `orderCol` order,
    * into exactly `nShards` contiguous shards of ~equal TOKEN mass (not
    * row count — a shard of long documents would otherwise dominate the
    * training loader). `shard = (cum − n) · S div total`, clamped to
    * S−1: fully integral (exact below 2^63 token·shard products), and
    * the same windowed-cumsum formulation as [[packSequences]], so a
    * relational oracle replays it. Deterministic for a fixed order.
    *
    * Scale shape: the shared two-phase prefix-sum scan plus ONE O(1)
    * total row broadcast back — no global window, no skewed task; each
    * partition maps its slice independently.
    */
  def shardAssign(
      docs: DataFrame,
      orderCol: String,
      textCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val wr  = withRunningTokens(docs, Seq(Cols.q(orderCol)), textCol)
    val tot = wr.agg(max("cum_tokens").as("__total"))
    wr.crossJoin(broadcast(tot))
      .withColumn(
        "shard",
        when(
          col("__total") > 0L,
          least(
            lit(nShards - 1),
            expr(s"((cum_tokens - n_tokens) * ${nShards}L) div __total")))
          .otherwise(lit(0L))
          .cast("int"))
      .drop("cum_tokens", "__total")
  }

  /** Materialize the sharded corpus as `shard=<id>/` parquet partitions —
    * the artifact a training loader consumes (one balanced file set per
    * reader). Returns the assignment frame that was written.
    */
  def writeShards(
      docs: DataFrame,
      orderCol: String,
      textCol: String,
      nShards: Int,
      outDir: String): DataFrame = {
    val assigned = shardAssign(docs, orderCol, textCol, nShards)
    assigned.write.partitionBy("shard").mode("overwrite").parquet(outDir)
    assigned
  }
}
