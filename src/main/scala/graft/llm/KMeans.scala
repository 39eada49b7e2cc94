package graft.llm

import graft.core.{Cols, Jobs}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over the embedding column — the domain
  * -discovery / mixture-balancing clustering a training-data pipeline runs
  * over the FULL corpus (cluster-then-reweight, the data-mixing
  * counterpart of SemDedup's cluster-then-dedup; cf. the DoReMi/DSIR
  * family, which needs a domain label per document).
  *
  * Relationship to the neighbours: [[SemDedup]] assigns to FIXED seed
  * points (no iteration — fully relational by design) and
  * [[IvfIndex.trainCentroids]] runs Lloyd in DRIVER memory on a bounded
  * sample (the FAISS coarse-quantizer recipe — right for an index, where
  * only the quantizer needs training). This operator is the third point
  * in that design space: Lloyd over the whole corpus, distributed — each
  * iteration is one assignment projection (no join, no shuffle) plus one
  * k·d-row aggregate, so driver state is O(k·d) per round and corpus
  * scale only enters through the scan. That is the 100 TB posture: at
  * 1000 executors every iteration is a map-side-combined aggregate over
  * the partitioned corpus; nothing corpus-sized ever concentrates.
  *
  * Everything is deterministic and engine-replayable, so the whole
  * optimizer loop hash-oracles (q122):
  *  - init = the k vectors with the smallest salted-md5(id)
  *    ([[SemDedup.pickSeeds]] — a pure function of (salt, id));
  *  - cluster label = the init seed's vec id (stable across engines, no
  *    positional numbering to disagree on);
  *  - assignment = argmin of the ROUNDED (6 dp) euclidean distance via
  *    the ‖v‖² − 2 v·c + ‖c‖² expansion, summed in index order on both
  *    engines; ties keep the smaller label (strict-< displacement over
  *    labels in ascending order); the radicand is clamped at 0 so
  *    identical vectors cannot produce sqrt(−ε) = NaN;
  *  - update = per-(cluster, dim) mean ROUNDED to 6 dp — the rounding is
  *    what makes iteration k+1's input bit-identical across engines even
  *    though float summation order inside the mean is not; an empty
  *    cluster keeps its previous centroid.
  */
object KMeans {

  /** One centroid: its stable label (the init seed's id) and position. */
  final case class Centroid(label: Long, vec: Array[Double])

  /** Above this k, assignment switches from a k-branch expression fold to
    * a broadcast centroid-matrix kernel — same threshold and same reason
    * as [[SemDedup.KernelSeedThreshold]] (codegen compile time grows with
    * the fold while the kernel scans one flat array; results are
    * bit-identical, spec-pinned).
    */
  val KernelThreshold: Int = 16

  /** Deterministic init: the k smallest-salted-md5 vectors, labelled by
    * their own id, sorted by label.
    */
  def initCentroids(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      salt: String = "kmeans"): Array[Centroid] =
    SemDedup
      .pickSeeds(emb, idCol, vecCol, k, salt)
      .map(s => Centroid(s.id, s.vec))
      .sortBy(_.label)

  private def sq(c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  /** THE coarse-argmin kernel contract, in one place: index of the
    * nearest centroid by ROUNDED euclidean distance (expansion form,
    * clamped radicand, 6 dp), strict-< displacement so ties keep the
    * smaller index — callers that label by id must pass centroids in
    * ascending-label order. `off`/`len` select a subrange of `v` (the PQ
    * subspace case); full-vector callers pass (0, v.length). `c2s(c)`
    * is the precomputed ‖centroid c‖². Shared by [[assignKernel]]'s
    * siblings ([[IvfPq]]'s residual/encode kernels, [[Pq]]'s fused
    * subspace fits) so a rounding or tie-rule change cannot drift
    * between them.
    */
  private[graft] def nearestIndex(
      v: Array[Double],
      off: Int,
      len: Int,
      cents: Array[Array[Double]],
      c2s: Array[Double]): Int = {
    var ss = 0.0
    var i  = 0
    while (i < len) { val x = v(off + i); ss += x * x; i += 1 }
    var best  = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cen = cents(c)
      var dp  = 0.0
      var j   = 0
      while (j < len) { dp += v(off + j) * cen(j); j += 1 }
      val d = BruteForce.round6(math.sqrt(math.max(ss - 2.0 * dp + c2s(c), 0.0)))
      if (java.lang.Double.compare(d, bestD) < 0) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Rounded euclidean distance to a literal centroid: ‖v‖² is the shared
    * `s2` column, v·c the codegen'd index-order dot, ‖c‖² a driver
    * constant computed in the same index order.
    */
  private def distCol(s2: Column, vec: Column, c: Array[Double]): Column =
    round(
      sqrt(greatest(
        s2 - lit(2.0) * graft.functions.GraftFunctions.dot(vec, typedlit(c.toSeq)) + lit(sq(c)),
        lit(0.0))),
      6)

  /** Assignment under the given centroids: (vec_id, cluster, dist, __emb).
    * `__emb` rides along for the update aggregate; the declared output
    * drops it.
    */
  def assign(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Centroid]): DataFrame =
    assignVia(emb, idCol, vecCol, cents, cents.length > KernelThreshold)

  /** Dispatch body, path pinned — the spec drives both strategies over the
    * same centroids to assert bit-equality (the [[SemDedup.assignCellsVia]]
    * pattern).
    */
  private[graft] def assignVia(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Centroid],
      useKernel: Boolean): DataFrame = {
    require(cents.nonEmpty, "no centroids")
    val sorted = cents.sortBy(_.label)
    val base = emb.select(
      Cols.q(idCol).cast("long").as("vec_id"),
      Cols.q(vecCol).cast("array<double>").as("__emb"))
    if (useKernel) assignKernel(base, sorted)
    else {
      val withS2 = base.withColumn(
        "__s2",
        graft.functions.GraftFunctions.dot(col("__emb"), col("__emb")))
      // distances as REAL projected columns before the argmin fold — the
      // SemDedup lesson: folding over the expressions directly re-embeds
      // the accumulated tree at every level
      val withDs = withS2.select(
        col("vec_id") +: col("__emb") +:
          sorted.zipWithIndex.map { case (c, i) =>
            distCol(col("__s2"), col("__emb"), c.vec).as(s"__d_$i")
          }: _*)
      val best = sorted.zipWithIndex.tail.foldLeft((lit(sorted.head.label), col("__d_0"))) {
        case ((bestL, bestD), (c, i)) =>
          val d = col(s"__d_$i")
          (when(d < bestD, lit(c.label)).otherwise(bestL), least(d, bestD))
      }
      withDs.select(
        col("vec_id"),
        best._1.as("cluster"),
        best._2.as("dist"),
        col("__emb"))
    }
  }

  /** Broadcast centroid-matrix argmin for large k — flat primitive array
    * scanned once per row, bit-identical to the expression path (same
    * expansion, same index order, `Round` HALF_UP at 6 dp, strict-<
    * displacement in ascending label order; `Double.compare` so a NaN —
    * impossible given the clamp, but defensively — ranks greatest, as
    * Spark's `<` total order does).
    */
  private def assignKernel(base: DataFrame, sorted: Array[Centroid]): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val k    = sorted.length
    val dims = sorted(0).vec.length
    val flat = new Array[Double](k * dims)
    val c2s  = new Array[Double](k)
    val lbls = new Array[Long](k)
    var i = 0
    while (i < k) {
      System.arraycopy(sorted(i).vec, 0, flat, i * dims, dims)
      c2s(i) = sq(sorted(i).vec)
      lbls(i) = sorted(i).label
      i += 1
    }
    val bc = spark.sparkContext.broadcast((lbls, flat, c2s))
    base
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val (lbls, flat, c2s) = bc.value
        val k = lbls.length
        val d = if (k == 0) 0 else flat.length / k
        it.map { case (vid, v) =>
          var s2 = 0.0
          var j = 0
          while (j < v.length) { s2 += v(j) * v(j); j += 1 }
          var bestL = lbls(0)
          var bestD = Double.MaxValue
          var c = 0
          val dd = math.min(d, v.length)
          while (c < k) {
            var dp = 0.0
            var p = 0
            val off = c * d
            while (p < dd) { dp += v(p) * flat(off + p); p += 1 }
            val dist = BruteForce.round6(math.sqrt(math.max(s2 - 2.0 * dp + c2s(c), 0.0)))
            if (java.lang.Double.compare(dist, bestD) < 0) { bestD = dist; bestL = lbls(c) }
            c += 1
          }
          (vid, bestL, bestD, v)
        }
      }
      .toDF("vec_id", "cluster", "dist", "__emb")
  }

  /** `iters` Lloyd rounds from the deterministic init; returns the final
    * assignment (vec_id, cluster, dist) and the final centroids. Each
    * round's driver state is the k·d rounded mean table (one
    * [[Jobs.collectFast]] of a bounded aggregate).
    */
  def fit(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2,
      salt: String = "kmeans"): (DataFrame, Array[Centroid]) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    var cents = initCentroids(emb, idCol, vecCol, k, salt)
    for (_ <- 1 to iters) {
      val a = assign(emb, idCol, vecCol, cents)
      val upd = a
        .select(col("cluster"), posexplode(col("__emb")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(round(avg("v"), 6).as("cv"))
      // size each updated centroid by the PREVIOUS centroid's dimensionality
      // (not the aggregated row count): ragged embedding arrays or a null
      // position mean must fail loudly, not produce a short/corrupt centroid
      val dims = cents.map(c => c.label -> c.vec.length).toMap
      val byLabel = Jobs
        .collectFast(upd)
        .groupBy(_.getLong(0))
        .map { case (lbl, rows) =>
          val dim = dims.getOrElse(
            lbl,
            throw new IllegalStateException(s"kmeans: aggregated unknown cluster label $lbl"))
          require(
            rows.length == dim,
            s"kmeans: cluster $lbl aggregated ${rows.length} positions, expected $dim " +
              "(ragged embedding input)")
          val vec = new Array[Double](dim)
          rows.foreach { r =>
            require(
              !r.isNullAt(1) && !r.isNullAt(2),
              s"kmeans: null position/mean aggregated for cluster $lbl (null embedding element)")
            val pos = r.getInt(1)
            require(
              pos >= 0 && pos < dim,
              s"kmeans: position $pos out of bounds for dimensionality $dim (ragged embedding input)")
            vec(pos) = r.getDouble(2)
          }
          lbl -> vec
        }
      cents = cents.map(c => Centroid(c.label, byLabel.getOrElse(c.label, c.vec)))
    }
    (assign(emb, idCol, vecCol, cents).select("vec_id", "cluster", "dist"), cents)
  }

  /** Per-cluster mixture weights: `weight = (1/k) / (n_c / n)` — the
    * multiplier that reweights each discovered domain to a uniform
    * mixture (sampling with these weights equalizes domain mass). One
    * k-row aggregate over the assignment.
    */
  def mixtureWeights(assignments: DataFrame, k: Int): DataFrame = {
    val total = sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy())
    assignments
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"))
      .withColumn("weight", round((total / lit(k.toDouble)) / col("n"), 6))
  }
}
