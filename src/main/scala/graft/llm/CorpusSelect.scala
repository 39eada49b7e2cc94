package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality-ordered, token-budget-constrained corpus selection — the data
  * mixing step that answers "give me the best N-token training set":
  * rank documents by a score, walk down the ranking accumulating token
  * counts, and keep every document while the running total stays within
  * the budget.
  *
  * Scale shape: a global `sum() OVER (ORDER BY score)` would funnel the
  * corpus through one task, so the running total comes from
  * [[Packing.withRunningTokens]] — the shared two-phase prefix-sum scan
  * (range-partition on the order keys, p per-partition sums to the
  * driver, per-partition offset + local running sum). The budget filter
  * is then an ordinary predicate; no partition ever sees more than its
  * slice.
  */
object CorpusSelect {

  /** Temperature-scaled mixture weights — the multilingual/multi-source
    * sampling standard (`p_s^α / Σ p^α` with α < 1 upsampling the tail,
    * α = 1 proportional, α → 0 uniform): for each source its observed
    * share, its temperature-flattened target share, and the per-document
    * sampling weight (`target / actual`) a weighted draw like
    * [[Sampling.weightedTake]] consumes.
    *
    * Scale shape: one map-side-combined count agg to a sources-sized
    * table, then two broadcast scalar joins (corpus total, normalizer) —
    * nothing past the first agg is corpus-sized.
    */
  def temperatureWeights(
      docs: DataFrame,
      sourceCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val s   = docs.groupBy(Cols.q(sourceCol)).agg(count(lit(1)).as("n"))
    val tot = s.agg(sum("n").cast("double").as("t"))
    val p = s
      .crossJoin(broadcast(tot))
      .select(
        Cols.q(sourceCol),
        col("n"),
        (col("n").cast("double") / col("t")).as("p"),
        pow(col("n").cast("double") / col("t"), alpha).as("pa"))
    val z = p.agg(sum("pa").as("z"))
    p.crossJoin(broadcast(z))
      .select(
        Cols.q(sourceCol),
        col("n").cast("long").as("n_docs"),
        round(col("p"), 6).as("actual_share"),
        round(col("pa") / col("z"), 6).as("temp_share"),
        round((col("pa") / col("z")) / col("p"), 6).as("weight"))
  }

  /** Select documents in decreasing `scoreCol` order (ties → ascending
    * `idCol`) while the INCLUSIVE running token total stays ≤ `budget`.
    * Returns the selected rows with `n_tokens` and `cum_tokens` added.
    *
    * Semantics: the selection TRUNCATES at the first document that
    * overflows the budget — later (lower-ranked) documents are not
    * revisited even if they would fit the remaining budget, matching
    * the windowed-cumsum formulation a relational oracle can replay
    * (skip-and-continue greedy is inherently sequential and cannot be).
    */
  def tokenBudget(
      docs: DataFrame,
      scoreCol: Column,
      idCol: String,
      textCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(!docs.columns.contains("__score"), "input frame already has a '__score' column")
    Packing
      .withRunningTokens(
        docs.withColumn("__score", scoreCol),
        Seq(col("__score").desc, Cols.q(idCol).asc),
        textCol)
      .where(col("cum_tokens") <= budget)
      .drop("__score")
  }

  /** Per-group variant — "the best `budget` tokens of EACH language /
    * source", the draw a mixture plan actually executes. Same truncation
    * semantics as [[tokenBudget]], applied independently within every
    * `groupCol` value.
    *
    * Scale shape: the grouped generalization of the two-phase prefix-sum
    * scan. Range-partition on (group, score desc, id) puts each group's
    * ranking in contiguous runs; job 1 collects PER-(partition, group)
    * token sums — driver state O(p × groups), groups being languages or
    * sources, not documents — and job 2 seeds each partition's running
    * totals with its group's prefix offsets. A `sum() OVER (PARTITION BY
    * group ORDER BY score)` window would instead sort-and-scan each
    * group through ONE task — a skew bomb when one source dominates the
    * corpus, which is the normal case.
    */
  def tokenBudgetPerGroup(
      docs: DataFrame,
      scoreCol: Column,
      idCol: String,
      groupCol: String,
      textCol: String,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    require(budget >= 0, s"budget must be >= 0, got $budget")
    Seq("__score", "__grp", "n_tokens", "cum_tokens").foreach(c =>
      require(!docs.columns.contains(c), s"input frame already has a '$c' column"))
    val spark = docs.sparkSession
    val withN = docs
      .withColumn("__score", scoreCol)
      // group bookkeeping key as string: offsets are driver-side map
      // lookups, and a stringly key sidesteps Row equality pitfalls for
      // exotic group types (null → the literal "␀" sentinel)
      .withColumn("__grp", coalesce(Cols.q(groupCol).cast("string"), lit("␀")))
      .withColumn(
        "n_tokens",
        coalesce(size(split(Cols.q(textCol), " ")).cast(LongType), lit(0L)))
      .repartitionByRange(col("__grp").asc, col("__score").desc, Cols.q(idCol).asc)
      .sortWithinPartitions(col("__grp").asc, col("__score").desc, Cols.q(idCol).asc)
    val nIdx = withN.schema.fieldIndex("n_tokens")
    val gIdx = withN.schema.fieldIndex("__grp")

    // job 1: per-(partition, group) token sums → per-group prefix offsets
    val partSums: Array[(Int, Map[String, Long])] = withN.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { r =>
          val g = r.getString(gIdx)
          m.update(g, m.getOrElse(g, 0L) + r.getLong(nIdx))
        }
        Iterator((pid, m.toMap))
      }
      .collect()
      .sortBy(_._1)
    val offsets: Array[Map[String, Long]] = partSums
      .scanLeft(Map.empty[String, Long]) { case (acc, (_, m)) =>
        m.foldLeft(acc) { case (a, (g, s)) => a.updated(g, a.getOrElse(g, 0L) + s) }
      }
      .dropRight(1)

    // job 2 (lazy): per-group running sum seeded with the group's offset
    val schema = withN.schema.add("cum_tokens", LongType, nullable = false)
    val rdd = withN.rdd.mapPartitionsWithIndex { (pid, it) =>
      val cums = scala.collection.mutable.HashMap.empty[String, Long]
      val off  = offsets(pid)
      it.map { r =>
        val g   = r.getString(gIdx)
        val cum = cums.getOrElse(g, off.getOrElse(g, 0L)) + r.getLong(nIdx)
        cums.update(g, cum)
        Row.fromSeq(r.toSeq :+ cum)
      }
    }
    spark
      .createDataFrame(rdd, schema)
      .where(col("cum_tokens") <= budget)
      .drop("__score", "__grp")
  }
}
