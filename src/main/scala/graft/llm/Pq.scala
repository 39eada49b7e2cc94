package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the embedding-compression leg of the ANN
  * scale story next to [[AnnBuckets]] (LSH pruning) and [[IvfIndex]]
  * (coarse partitioning): split each d-dim vector into `m` subvectors,
  * quantize each against its own k-entry codebook, and store `m` small
  * codes per vector — 64 float32 dims at m=4/k=16 compress 64× (256 B →
  * 4 B), which is what lets a 100 TB embedding corpus hold its index in
  * cluster memory. Distances are answered WITHOUT decompression via ADC
  * (asymmetric distance computation): per query, an m×k lookup table of
  * exact subspace distances is computed once on the driver and each
  * candidate costs m table lookups — a pure codegen projection over the
  * code arrays, no vector math per row.
  *
  * Determinism: codebooks come from [[KMeans]] per subspace (salted-md5
  * init, rounded iterations), so with a pinned iteration count the WHOLE
  * encode → ADC path is engine-replayable — q126/q127 pin `iters = 0`
  * (codebook = the k seed subvectors) so the oracle replays seed pick,
  * per-subspace argmin encoding, and the ADC ranking relationally;
  * training iterations are the library default and are spec-checked by
  * the reconstruction-error contract (trained codebooks must not be
  * worse than the seed codebooks they started from).
  */
object Pq {

  /** One codebook per subspace: `books(s)(c)` is centroid `c` (a d/m-dim
    * vector) of subspace `s`; `labels(s)(c)` its stable [[KMeans]] label.
    */
  final case class Codebooks(
      m: Int,
      subDim: Int,
      books: Array[Array[Array[Double]]],
      labels: Array[Array[Long]])

  /** Train per-subspace codebooks: m independent [[KMeans.fit]] runs over
    * the sliced corpus — m·iters bounded aggregates total, O(m·k·d/m) =
    * O(k·d) driver state. `iters = 0` keeps the deterministic seed
    * subvectors (the oracle-replayable mode).
    */
  def train(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      m: Int = 4,
      k: Int = 16,
      iters: Int = 2,
      salt: String = "pq"): Codebooks = {
    require(m >= 1 && dims % m == 0, s"m=$m must divide dims=$dims")
    val subDim = dims / m
    val fits = (0 until m).map { s =>
      val sub = emb.select(
        Cols.q(idCol).as("vec_id"),
        slice(Cols.q(vecCol).cast("array<double>"), s * subDim + 1, subDim).as("sub"))
      if (iters == 0) KMeans.initCentroids(sub, "vec_id", "sub", k, s"$salt$s")
      else KMeans.fit(sub, "vec_id", "sub", k, iters, s"$salt$s")._2
    }
    Codebooks(
      m,
      subDim,
      fits.map(_.map(_.vec)).toArray,
      fits.map(_.map(_.label)).toArray)
  }

  /** Above this m·k, [[encode]] switches from the m·k-column expression
    * projection to a broadcast codebook kernel: 64 higher-order-function
    * distance expressions fused into one stage exceed the JVM's 64 KB
    * method limit and whole-stage codegen silently falls back to
    * interpretation — the kernel scans one flat primitive array instead.
    * Results are bit-identical (same expansion, index order, round6,
    * strict-< argmin), spec-pinned.
    */
  val KernelBudget: Int = 32

  /** Encode every vector as m codebook indices (0-based position in the
    * label-sorted codebook): per subspace, the argmin of the ROUNDED
    * euclidean distance, smaller index on ties — the [[KMeans]]
    * assignment contract. One projection (codegen below [[KernelBudget]]
    * expressions, broadcast kernel above); nothing shuffles.
    */
  def encode(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks): DataFrame =
    encodeVia(emb, idCol, vecCol, cb, cb.m * cb.books.map(_.length).max > KernelBudget)

  private[graft] def encodeVia(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks,
      useKernel: Boolean): DataFrame =
    if (useKernel) encodeKernel(emb, idCol, vecCol, cb)
    else encodeExpr(emb, idCol, vecCol, cb)

  private def encodeKernel(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks): DataFrame =
    encodeRawKernel(emb, idCol, vecCol, cb).select(
      col("vec_id") +: (0 until cb.m).map(s => col("__codes")(s).as(s"code$s")): _*)

  /** Kernel producing codes AND the reconstruction error in one pass:
    * argmin per subspace on the ROUNDED distance (expression-path
    * contract), error from the RAW squared distance of the chosen
    * centroid, summed in subspace order.
    */
  private def encodeRawKernel(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    emb
      .select(Cols.q(idCol).cast("long").as("vec_id"), Cols.q(vecCol).cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val b = bc.value
        it.map { case (id, v) =>
          val codes = new Array[Int](b.m)
          var errSq = 0.0
          var s = 0
          while (s < b.m) {
            val off = s * b.subDim
            var ss  = 0.0
            var i   = 0
            while (i < b.subDim) { ss += v(off + i) * v(off + i); i += 1 }
            var bestI  = 0
            var bestD  = Double.MaxValue
            var bestD2 = 0.0
            var c = 0
            while (c < b.books(s).length) {
              val cen = b.books(s)(c)
              var dp = 0.0
              var cc = 0.0
              var j  = 0
              while (j < b.subDim) {
                dp += v(off + j) * cen(j)
                cc += cen(j) * cen(j)
                j += 1
              }
              val d2 = math.max(ss - 2.0 * dp + cc, 0.0)
              val d  = BruteForce.round6(math.sqrt(d2))
              if (java.lang.Double.compare(d, bestD) < 0) { bestD = d; bestI = c; bestD2 = d2 }
              c += 1
            }
            codes(s) = bestI
            errSq += bestD2
            s += 1
          }
          (id, codes, BruteForce.round6(math.sqrt(errSq)))
        }
      }
      .toDF("vec_id", "__codes", "__err")
  }

  private def encodeExpr(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks,
      withErr: Boolean = false): DataFrame = {
    val vec = Cols.q(vecCol).cast("array<double>")
    val perSub = (0 until cb.m).map { s =>
      val sub = slice(vec, s * cb.subDim + 1, cb.subDim)
      val cols = cb.books(s).zipWithIndex.map { case (c, i) =>
        val c2 = c.map(x => x * x).sum
        val raw = greatest(
          graft.functions.GraftFunctions.dot(sub, sub) -
            lit(2.0) * graft.functions.GraftFunctions.dot(sub, typedlit(c.toSeq)) + lit(c2),
          lit(0.0))
        (round(sqrt(raw), 6).as(s"__pd_${s}_$i"), raw.as(s"__pr_${s}_$i"))
      }
      (cols, s)
    }
    // project every subspace distance once, then fold argmins over column
    // references (the SemDedup/KMeans fold rule); the raw squared
    // distances ride along only when the error is requested (one pass —
    // no second scan, no re-join, mirroring the kernel)
    val projected = perSub.flatMap { case (cols, _) =>
      if (withErr) cols.flatMap { case (d, r) => Seq(d, r) } else cols.map(_._1)
    }
    val withDs = emb.select(
      (Cols.q(idCol).cast("long").as("vec_id") +: projected): _*)
    val folded = perSub.map { case (_, s) =>
      val init = (lit(0), col(s"__pd_${s}_0"), col(s"__pr_${s}_0"))
      (1 until cb.books(s).length).foldLeft(init) {
        case ((bestI, bestD, bestR), i) =>
          val d = col(s"__pd_${s}_$i")
          (
            when(d < bestD, lit(i)).otherwise(bestI),
            least(d, bestD),
            when(d < bestD, col(s"__pr_${s}_$i")).otherwise(bestR))
      }
    }
    val codes = folded.zipWithIndex.map { case ((c, _, _), s) => c.as(s"code$s") }
    if (!withErr) withDs.select(col("vec_id") +: codes: _*)
    else {
      val err = round(sqrt(folded.map(_._3).reduce(_ + _)), 6).as("err")
      withDs.select(col("vec_id") +: codes :+ err: _*)
    }
  }

  /** Per-vector reconstruction error ‖v − decode(encode(v))‖ (rounded):
    * the quantization-quality metric the training contract is stated in.
    */
  def reconstructionError(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks): DataFrame = {
    if (cb.m * cb.books.map(_.length).max > KernelBudget)
      encodeRawKernel(emb, idCol, vecCol, cb).select(
        col("vec_id") +:
          (0 until cb.m).map(s => col("__codes")(s).as(s"code$s")) :+
          col("__err").as("err"): _*)
    // expression path: codes and error come out of the SAME argmin fold
    // (one scan, no re-join), mirroring the kernel's single pass
    else encodeExpr(emb, idCol, vecCol, cb, withErr = true)
  }

  /** ADC top-k: the query's exact distance to every codebook centroid is
    * an m×k driver-side table; each encoded vector's approximate distance
    * is the sum of its m looked-up entries (one codegen projection over
    * the code columns). Rounded before ranking, vec_id tie-break — the
    * q19 determinism contract.
    */
  def adcTopK(
      encoded: DataFrame,
      query: Array[Double],
      cb: Codebooks,
      k: Int = 5): DataFrame = {
    require(query.length == cb.m * cb.subDim, "query dims do not match codebooks")
    // expansion form (q·q − 2 q·c + c·c), each dot summed in index order —
    // the same arithmetic an SQL oracle's list_dot_product replays, so the
    // table entries are bit-identical across engines
    def dot(a: Array[Double], off: Int, b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < b.length) { s += a(off + i) * b(i); i += 1 }
      s
    }
    val tables: Array[Array[Double]] = Array.tabulate(cb.m) { s =>
      val qq = {
        var acc = 0.0
        var i = 0
        while (i < cb.subDim) {
          acc += query(s * cb.subDim + i) * query(s * cb.subDim + i); i += 1
        }
        acc
      }
      cb.books(s).map { c =>
        var cc = 0.0
        var i = 0
        while (i < c.length) { cc += c(i) * c(i); i += 1 }
        math.max(qq - 2.0 * dot(query, s * cb.subDim, c) + cc, 0.0)
      }
    }
    val approx = (0 until cb.m)
      .map(s => element_at(typedlit(tables(s).toSeq), col(s"code$s") + 1))
      .reduce(_ + _)
    encoded
      .select(col("vec_id"), round(sqrt(greatest(approx, lit(0.0))), 6).as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("vec_id").asc)
      .limit(k)
  }
}
