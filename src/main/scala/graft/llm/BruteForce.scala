package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Exact all-pairs cosine kernels for the declared brute-force oracles
  * (q19 top-k, q49 threshold pairs).
  *
  * Two physical strategies behind one result contract:
  *
  *  - '''Broadcast kernel''' (n ≤ [[DefaultBroadcastRows]]): the vector set
  *    is collected once, broadcast as one flat primitive matrix, and each
  *    task scans its slice of row indices against the shared matrix — no
  *    per-pair array copies, no shuffle until the final tiny ORDER BY. The
  *    declarative cross-join formulation pays for itself in row
  *    materialization: every joined row copies BOTH embedding arrays
  *    (~1 KB/pair at 64 dims), dwarfing the 64 multiply-adds of the dot.
  *
  *  - '''Block-partitioned kernel''' (larger n): vectors are hashed into
  *    `B = ⌈n / blockRows⌉` blocks by id; each vector is replicated to the
  *    O(B) block-pair groups it participates in; one shuffle co-locates
  *    every (block i, block j) pair in a task, which packs both sides into
  *    flat matrices and runs the same inner loop. No driver collect at any
  *    n — "exact" degrades to a slow distributed job, never a driver OOM.
  *    Replication costs n·B vector copies through the shuffle, which is
  *    the inherent price of distributed all-pairs.
  *
  * A hard guard ([[DefaultMaxExactRows]]) fails fast past the point where
  * O(n²) exact similarity stops being a sane request and names the
  * bucketed ANN paths — [[AnnBuckets.approxTopK]] (q41, LSH) and
  * [[IvfIndex.approxTopK]] (q50, IVF) — as the scale alternative.
  *
  * EAGER construction: both public entry points run a count job (for the
  * dispatch decision) and the broadcast path collects the matrix at
  * DataFrame-construction time, before any action on the result. Do not
  * compose these into a "one lazy plan" pipeline measurement; the
  * construction cost is part of the query. Broadcasts created here are
  * reclaimed by Spark's ContextCleaner once the returned DataFrame is no
  * longer referenced driver-side.
  *
  * Arithmetic parity with the declarative form and the DuckDB oracle:
  * dots and norms reduce in index order in doubles, and rounding
  * replicates Catalyst's `Round` on DoubleType —
  * `BigDecimal.valueOf(x).setScale(s, HALF_UP)` — so hash-exact results
  * are preserved. A zero-norm vector yields NaN cosine; NaN ranks as the
  * GREATEST value (first under the descending sort, passing any `≥ tau`
  * filter), matching both Spark SQL's and DuckDB's NaN ordering, so such
  * rows cannot silently diverge from the oracles.
  */
object BruteForce {

  /** Row bound for the broadcast kernel: ~134 MB matrix at 64-dim doubles. */
  val DefaultBroadcastRows: Long = 1L << 18

  /** Hard bound on exact all-pairs similarity. Past this, fail fast.
    *
    * Sized from measurement, not optimism: the blocked kernel measures
    * ~10 s at 20 k rows (4×10⁸ pair scores, sf1 — BENCH_SF1.md q118/q129)
    * and grows quadratically, so the 2¹⁶ bound (≈ 4×10⁹ pairs, on the
    * order of 100 s) is the last point where "exact" is a sane request
    * over switching to the ANN miners. The pre-r12 2²² bound admitted a
    * 200 k-vector corpus (4×10¹⁰ pairs ≈ 17 min of compute) that then
    * died mid-flight on driver result limits instead of failing here
    * with the alternative named; `maxExactRows` overrides for callers
    * who really mean it.
    */
  val DefaultMaxExactRows: Long = 1L << 16

  /** Target rows per block for the block-partitioned kernel (~8 MB/side). */
  val DefaultBlockRows: Int = 1 << 14

  private[llm] def round6(x: Double): Double =
    if (java.lang.Double.isFinite(x))
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    else x // NaN/Inf pass through, as Catalyst Round leaves them

  /** Strict "ranks before": rounded score desc with NaN greatest (the Spark
    * SQL / DuckDB ordering — `java.lang.Double.compare` places NaN above
    * +Inf), id asc tie-break. `round6` folds -0.0 to 0.0, so the signed-zero
    * gap between `Double.compare` and SQL `=` cannot surface here.
    */
  private[llm] def ranksBefore(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && id1 < id2)
  }

  /** `cs ≥ tau` with NaN passing, as both engines order NaN above tau. */
  private[llm] def nanGte(cs: Double, tau: Double): Boolean =
    cs >= tau || java.lang.Double.isNaN(cs)

  /** Flat row-major matrix + per-row L2 norms over (id, vector) pairs,
    * sorted by id for deterministic scan order.
    */
  private[llm] def pack(rows: Array[(Long, Array[Double])]): (Array[Long], Array[Double], Array[Double], Int) = {
    java.util.Arrays.sort(rows, Ordering.by((t: (Long, Array[Double])) => t._1))
    val n    = rows.length
    val dims = if (n == 0) 0 else rows(0)._2.length
    require(
      n.toLong * dims <= Int.MaxValue,
      s"flat matrix of $n rows × $dims dims exceeds a single array's Int range — " +
        "lower broadcastRows/blockRows so each packed side stays under 2^31 doubles")
    val ids  = new Array[Long](n)
    val flat = new Array[Double](n * dims)
    val nrm  = new Array[Double](n)
    var i = 0
    while (i < n) {
      ids(i) = rows(i)._1
      val e = rows(i)._2
      var j = 0
      var s = 0.0
      while (j < dims) {
        val v = e(j)
        flat(i * dims + j) = v
        s += v * v
        j += 1
      }
      nrm(i) = math.sqrt(s)
      i += 1
    }
    (ids, flat, nrm, dims)
  }

  private[llm] def dot(
      aFlat: Array[Double], a: Int,
      bFlat: Array[Double], b: Int,
      dims: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < dims) {
      s += aFlat(a * dims + j) * bFlat(b * dims + j)
      j += 1
    }
    s
  }

  /** SplitMix64 finalizer: decorrelates block assignment from the id
    * distribution, so strided id sets (all multiples of 256, say) still
    * spread evenly over blocks instead of collapsing the blocked kernel
    * into a few giant groups. Duplicate ids still co-locate (same hash).
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def blockOf(id: Long, nb: Int): Int =
    java.lang.Math.floorMod(mix64(id), nb.toLong).toInt

  /** Normalized (id, vector) pairs — the one projection both kernels read.
    * Self-match exclusion in every kernel is BY ID (`b_id != a_id`), so a
    * duplicated id never scores against itself regardless of which physical
    * strategy the size dispatch picks; ids are expected unique upstream.
    */
  private[graft] def vecs(emb: DataFrame, idCol: String, embCol: String): Dataset[(Long, Array[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb
      .select(Cols.q(idCol).cast("long").as("id"), Cols.q(embCol).cast("array<double>").as("e"))
      .as[(Long, Array[Double])]
  }

  private def guard(n: Long, maxExactRows: Long): Unit =
    require(
      n <= maxExactRows,
      f"exact all-pairs cosine over $n rows is O(n²) ≈ ${n.toDouble * n}%.3g pair scores — " +
        "use the bucketed ANN paths instead (AnnBuckets.approxTopK, the q41 LSH path, or " +
        s"IvfIndex.approxTopK, the q50 IVF path), or raise maxExactRows (currently $maxExactRows; " +
        "pre-r12 releases allowed 1L << 22 = 4194304 — pass that to restore the old bound " +
        "explicitly, accepting minutes-scale compute)")

  /** Exact cosine top-k per vector: (a_id, b_id, rn, cos_sim), ranked by
    * rounded similarity desc (NaN first) then b_id asc — identical ordering
    * to the `round(...,6)` + row_number window of the declarative form.
    * Dispatches broadcast vs block-partitioned on the (eagerly counted)
    * input size; fails fast past `maxExactRows`.
    */
  def topK(
      spark: SparkSession,
      emb: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      maxExactRows: Long = DefaultMaxExactRows,
      broadcastRows: Long = DefaultBroadcastRows,
      blockRows: Int = DefaultBlockRows): DataFrame = {
    val v = vecs(emb, idCol, embCol)
    val n = v.count()
    guard(n, maxExactRows)
    if (n <= broadcastRows) topKBroadcast(spark, v, k)
    else topKBlocked(spark, v, k, nBlocks = (((n - 1) / blockRows) + 1).toInt)
  }

  /** Unordered near-dup pairs (a_id < b_id) with rounded cosine ≥ tau
    * (NaN passes, matching both engines). Same dispatch/guard as [[topK]].
    */
  def neardupPairs(
      spark: SparkSession,
      emb: DataFrame,
      idCol: String,
      embCol: String,
      tau: Double,
      maxExactRows: Long = DefaultMaxExactRows,
      broadcastRows: Long = DefaultBroadcastRows,
      blockRows: Int = DefaultBlockRows): DataFrame = {
    val v = vecs(emb, idCol, embCol)
    val n = v.count()
    guard(n, maxExactRows)
    if (n <= broadcastRows) neardupPairsBroadcast(spark, v, tau)
    else neardupPairsBlocked(spark, v, tau, nBlocks = (((n - 1) / blockRows) + 1).toInt)
  }

  // ---------------------------------------------------------------- broadcast

  private[graft] def topKBroadcast(spark: SparkSession, v: Dataset[(Long, Array[Double])], k: Int): DataFrame = {
    import spark.implicits._
    val (ids, flat, nrm, dims) = pack(v.collect())
    val bc = spark.sparkContext.broadcast((ids, flat, nrm))
    val n  = ids.length
    spark
      .range(0, n.toLong, 1, math.max(1, math.min(n, spark.sparkContext.defaultParallelism)))
      .as[Long]
      .mapPartitions { it =>
        val (ids, flat, nrm) = bc.value
        it.flatMap { ai =>
          val a = ai.toInt
          val cand = new Array[(Double, Long)](ids.length - 1)
          var w = 0
          var b = 0
          while (b < ids.length) {
            if (ids(b) != ids(a)) {
              cand(w) = (round6(dot(flat, a, flat, b, dims) / (nrm(a) * nrm(b))), ids(b))
              w += 1
            }
            b += 1
          }
          val filled = if (w == cand.length) cand else java.util.Arrays.copyOf(cand, w)
          // rounded score desc (NaN first), id asc — matches the window order
          scala.util.Sorting.stableSort(
            filled,
            (x: (Double, Long), y: (Double, Long)) => ranksBefore(x._1, x._2, y._1, y._2))
          filled.take(k).zipWithIndex.map { case ((cs, bid), r) => (ids(a), bid, r + 1, cs) }
        }
      }
      .toDF("a_id", "b_id", "rn", "cos_sim")
  }

  private[graft] def neardupPairsBroadcast(
      spark: SparkSession,
      v: Dataset[(Long, Array[Double])],
      tau: Double): DataFrame = {
    import spark.implicits._
    val (ids, flat, nrm, dims) = pack(v.collect())
    val bc = spark.sparkContext.broadcast((ids, flat, nrm))
    val n  = ids.length
    spark
      .range(0, n.toLong, 1, math.max(1, math.min(n, spark.sparkContext.defaultParallelism)))
      .as[Long]
      .mapPartitions { it =>
        val (ids, flat, nrm) = bc.value
        it.flatMap { ai =>
          val a = ai.toInt
          // ids are sorted, so j > a ⇒ id_j ≥ id_a: the a<b halving with
          // no comparison on the pair output; equal ids (duplicates) skip,
          // keeping the a_id < b_id contract and matching the blocked path
          (a + 1 until ids.length).iterator.flatMap { b =>
            if (ids(b) == ids(a)) Iterator.empty
            else {
              val cs = round6(dot(flat, a, flat, b, dims) / (nrm(a) * nrm(b)))
              if (nanGte(cs, tau)) Iterator.single((ids(a), ids(b), cs)) else Iterator.empty
            }
          }
        }
      }
      .toDF("a_id", "b_id", "cos_sim")
  }

  // ------------------------------------------------------------------ blocked

  /** Bounded top-k accumulator ordered by [[ranksBefore]] — O(k) inserts,
    * no per-candidate allocation.
    */
  private final class TopAcc(k: Int) {
    private val ss = new Array[Double](k)
    private val bs = new Array[Long](k)
    var size = 0
    def offer(s: Double, id: Long): Unit = {
      if (size == k && !ranksBefore(s, id, ss(k - 1), bs(k - 1))) return
      var i = math.min(size, k - 1)
      while (i > 0 && ranksBefore(s, id, ss(i - 1), bs(i - 1))) {
        ss(i) = ss(i - 1); bs(i) = bs(i - 1); i -= 1
      }
      ss(i) = s; bs(i) = id
      if (size < k) size += 1
    }
    def result: IndexedSeq[(Double, Long)] = (0 until size).map(i => (ss(i), bs(i)))
  }

  /** Distributed exact top-k: replicate each vector to its O(B) block-pair
    * groups, scan per group emitting a local top-k per query vector, then
    * merge the ≤ k·B candidates per query in a second keyed pass. Both
    * shuffles are bounded: n·(2B−1) vectors in, n·B·k 24-byte rows out.
    */
  private[graft] def topKBlocked(
      spark: SparkSession,
      v: Dataset[(Long, Array[Double])],
      k: Int,
      nBlocks: Int): DataFrame = {
    import spark.implicits._
    val nb = math.max(1, nBlocks)
    val cand = v
      .flatMap { case (id, e) =>
        val blk = blockOf(id, nb)
        // A-side (query) in every (blk, j); B-side (candidate) in every
        // (i, blk) except the diagonal, which reuses the A list for both
        (0 until nb).iterator.flatMap { j =>
          val asA = Iterator.single((blk, j, 0: Byte, id, e))
          val asB = if (j == blk) Iterator.empty else Iterator.single((j, blk, 1: Byte, id, e))
          asA ++ asB
        }
      }
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Byte, Long, Array[Double])]) =>
        val (pi, pj) = key
        val aBuf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
        val bBuf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
        it.foreach { case (_, _, side, id, e) =>
          (if (side == 0) aBuf else bBuf) += ((id, e))
        }
        val (aIds, aFlat, aNrm, dims) = pack(aBuf.toArray)
        val (bIds, bFlat, bNrm, _)    = if (pi == pj) (aIds, aFlat, aNrm, dims) else pack(bBuf.toArray)
        (0 until aIds.length).iterator.flatMap { a =>
          val acc = new TopAcc(k)
          var b = 0
          while (b < bIds.length) {
            if (bIds(b) != aIds(a))
              acc.offer(round6(dot(aFlat, a, bFlat, b, dims) / (aNrm(a) * bNrm(b))), bIds(b))
            b += 1
          }
          acc.result.iterator.map { case (cs, bid) => (aIds(a), bid, cs) }
        }
      }
      .groupByKey(_._1)
      .flatMapGroups { (aId, it) =>
        val arr = it.map { case (_, bid, cs) => (cs, bid) }.toArray
        scala.util.Sorting.stableSort(
          arr,
          (x: (Double, Long), y: (Double, Long)) => ranksBefore(x._1, x._2, y._1, y._2))
        arr.take(k).zipWithIndex.iterator.map { case ((cs, bid), r) => (aId, bid, r + 1, cs) }
      }
    cand.toDF("a_id", "b_id", "rn", "cos_sim")
  }

  /** Distributed exact threshold pairs: each unordered block pair {i, j}
    * (i ≤ j) is owned by exactly one group; the diagonal scans its upper
    * triangle, off-diagonals scan the full cross and order each emitted
    * pair by id. Replication is n·(B+1)/2-ish vectors through one shuffle.
    */
  private[graft] def neardupPairsBlocked(
      spark: SparkSession,
      v: Dataset[(Long, Array[Double])],
      tau: Double,
      nBlocks: Int): DataFrame = {
    import spark.implicits._
    val nb = math.max(1, nBlocks)
    v.flatMap { case (id, e) =>
        val blk = blockOf(id, nb)
        // block b is A-side for keys (b, j≥b), B-side for keys (i<b, b)
        val asA = (blk until nb).iterator.map(j => (blk, j, 0: Byte, id, e))
        val asB = (0 until blk).iterator.map(i => (i, blk, 1: Byte, id, e))
        asA ++ asB
      }
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (key: (Int, Int), it: Iterator[(Int, Int, Byte, Long, Array[Double])]) =>
        val (pi, pj) = key
        val aBuf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
        val bBuf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
        it.foreach { case (_, _, side, id, e) =>
          (if (side == 0) aBuf else bBuf) += ((id, e))
        }
        val (aIds, aFlat, aNrm, dims) = pack(aBuf.toArray)
        if (pi == pj) {
          (0 until aIds.length).iterator.flatMap { a =>
            (a + 1 until aIds.length).iterator.flatMap { b =>
              if (aIds(b) == aIds(a)) Iterator.empty
              else {
                val cs = round6(dot(aFlat, a, aFlat, b, dims) / (aNrm(a) * aNrm(b)))
                if (nanGte(cs, tau)) Iterator.single((aIds(a), aIds(b), cs)) else Iterator.empty
              }
            }
          }
        } else {
          val (bIds, bFlat, bNrm, _) = pack(bBuf.toArray)
          (0 until aIds.length).iterator.flatMap { a =>
            (0 until bIds.length).iterator.flatMap { b =>
              val cs = round6(dot(aFlat, a, bFlat, b, dims) / (aNrm(a) * bNrm(b)))
              if (nanGte(cs, tau)) {
                val (lo, hi) = if (aIds(a) < bIds(b)) (aIds(a), bIds(b)) else (bIds(b), aIds(a))
                Iterator.single((lo, hi, cs))
              } else Iterator.empty
            }
          }
        }
      }
      .toDF("a_id", "b_id", "cos_sim")
  }
}
