package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-quality diagnostics for training-data pipelines: per-label
  * centroids and distance-to-centroid outlier ranking (the standard
  * mislabel / junk-vector screen run before training on an embedded
  * corpus).
  *
  * Scale shape: centroids come from ONE shuffled aggregation keyed on
  * (label, dim) — posexplode keeps the shuffle rows scalar (8 bytes of
  * payload each) instead of moving whole vectors — and the distance pass
  * re-joins the centroid table, which is labels × dims rows, sublinear
  * in corpus size and broadcast by Catalyst while it fits. The top-k
  * ranking is a per-label window over scalar distances.
  */
object EmbeddingStats {

  /** Euclidean distance of every vector to its label's centroid.
    * Returns (idCol, labelCol, dist). Cast to double BEFORE aggregating
    * so both engines accumulate in f64 (the column is float32 parquet).
    */
  def labelCentroidDistances(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String): DataFrame = {
    val x = df
      .select(
        Cols.q(idCol).as("__id"),
        Cols.q(labelCol).as("__label"),
        posexplode(Cols.q(vecCol).cast("array<double>")).as(Seq("pos", "v")))
    val c = x.groupBy("__label", "pos").agg(avg("v").as("cv"))
    x.join(c, Seq("__label", "pos"))
      .groupBy(col("__id").as(idCol), col("__label").as(labelCol))
      .agg(sqrt(sum(pow(col("v") - col("cv"), 2))).as("dist"))
  }

  /** Top-`k` farthest-from-centroid vectors per label (likely mislabels
    * or junk), distance rounded to `scale` dp BEFORE ranking so the
    * rank order is reproducible across engines at near-ties (ids break
    * the remaining ties).
    */
  def labelOutliers(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String,
      k: Int,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = labelCentroidDistances(df, idCol, labelCol, vecCol)
      .withColumn("dist", round(col("dist"), scale))
    val w = Window.partitionBy(Cols.q(labelCol)).orderBy(col("dist").desc, Cols.q(idCol).asc)
    d.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** Sample covariance matrix of the embedding columns — the input to
    * PCA / whitening, the standard preprocessing before SemDedup-style
    * clustering. Returns the upper triangle as (i, j, cov) with 1-based
    * dims and `ddof=1`, cov rounded to `scale` dp.
    *
    * Scale shape: a relational formulation explodes every vector to d
    * rows and self-joins to d² — a corpus-sized shuffle of d²/2 product
    * rows per vector. Instead ONE `treeAggregate` pass accumulates
    * (n, Σx, Σxy-upper-triangle) per partition — d(d+3)/2 doubles of
    * state, ~17 KB at d=64 — and merges partials in a tree; nothing
    * corpus-sized ever moves, and the driver only ever holds O(d²).
    * The d² work per row runs over a primitive array, not Catalyst rows
    * (the same dense-kernel justification as [[BruteForce]]).
    */
  def covarianceMatrix(df: DataFrame, vecCol: String, scale: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(Cols.q(vecCol).cast("array<double>")).as[Array[Double]]

    // (n, sums[d], upper-triangle products[d(d+1)/2]); dims discovered on
    // the first row each partition sees, merged null-safely
    type Acc = (Long, Array[Double], Array[Double])
    val zero: Acc = (0L, null, null)
    def init(d: Int): Acc = (0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    def seqOp(acc0: Acc, v: Array[Double]): Acc = {
      val acc = if (acc0._2 == null) init(v.length) else acc0
      val (n, s, p) = acc
      require(v.length == s.length, s"ragged embedding: ${v.length} vs ${s.length} dims")
      var i = 0
      var w = 0
      while (i < v.length) {
        s(i) += v(i)
        var j = i
        while (j < v.length) {
          p(w) += v(i) * v(j)
          w += 1
          j += 1
        }
        i += 1
      }
      (n + 1, s, p)
    }
    def combOp(a: Acc, b: Acc): Acc =
      if (a._2 == null) b
      else if (b._2 == null) a
      else {
        // ragged rows that never shared a partition still meet here
        require(
          a._2.length == b._2.length,
          s"ragged embedding: ${a._2.length} vs ${b._2.length} dims")
        var i = 0
        while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
        var w = 0
        while (w < a._3.length) { a._3(w) += b._3(w); w += 1 }
        (a._1 + b._1, a._2, a._3)
      }

    val (n, s, p) = vecs.rdd.treeAggregate(zero)(seqOp, combOp)
    require(n >= 2, s"covariance needs at least 2 vectors, got $n")
    val d = s.length
    def round(x: Double): Double =
      if (java.lang.Double.isFinite(x))
        java.math.BigDecimal.valueOf(x).setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
      else x
    val rows = for {
      i <- 0 until d
      j <- i until d
    } yield {
      val w = i * d - i * (i - 1) / 2 + (j - i)
      (i + 1, j + 1, round((p(w) - s(i) * s(j) / n) / (n - 1)))
    }
    rows.toDF("i", "j", "cov")
  }

  /** Per-dimension robust scaling (median / IQR) — the feature
    * normalization that survives the heavy-tailed junk vectors an outlier
    * screen ([[labelOutliers]]) is about to flag (mean/stddev scaling
    * would let those same outliers set the scale). Returns one row per
    * (id, dim): `scaled = (v - median_dim) / iqr_dim`, IQR-zero dims
    * divide by 1 instead.
    *
    * Scale shape: posexplode keeps shuffle rows scalar; the stats table
    * is DIMS rows (one exact-percentile agg — [[graft.core.ScaleMode]]
    * Approx swaps in `percentile_approx` for the 100 TB path, same
    * contract as q28) and is broadcast back for the scaling projection.
    */
  def robustScale(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      mode: graft.core.ScaleMode = graft.core.ScaleMode.Exact,
      scale: Int = 4): DataFrame = {
    import graft.core.Stats
    val pe = df.select(
      Cols.q(idCol),
      posexplode(Cols.q(vecCol).cast("array<double>")).as(Seq("pos", "v")))
    val dims = pe.select(Cols.q(idCol), (col("pos") + 1).as("dim"), col("v"))
    val iqrRaw = col("p75") - col("p25")
    val stats = dims
      .groupBy("dim")
      .agg(
        Stats.percentile(col("v"), 0.25, mode).as("p25"),
        Stats.percentile(col("v"), 0.50, mode).as("med"),
        Stats.percentile(col("v"), 0.75, mode).as("p75"))
      .select(
        col("dim"),
        col("med"),
        when(iqrRaw === 0.0, lit(1.0)).otherwise(iqrRaw).as("iqr"))
    dims
      .join(broadcast(stats), Seq("dim"))
      .select(
        Cols.q(idCol),
        col("dim").cast("int").as("dim"),
        round((col("v") - col("med")) / col("iqr"), scale).as("scaled"))
  }

  /** PCA basis of the embedding column: top-`k` eigenvectors of the
    * covariance matrix by power iteration with deflation. The iteration
    * runs on the DRIVER over the d×d matrix — O(d²) state from the one
    * [[covarianceMatrix]] treeAggregate pass, exactly the bounded-driver
    * pattern of [[IvfIndex]]'s sampled training: corpus size only ever
    * changes the scan, never driver memory.
    *
    * Deterministic: fixed start vector (1/√d ones), fixed iteration
    * count, sign normalized so each component's largest-|x| coordinate
    * is positive.
    *
    * @return (means, components, eigenvalues) — components are unit
    *         vectors, eigenvalues descending
    */
  def pcaBasis(
      df: DataFrame,
      vecCol: String,
      k: Int,
      iters: Int = 100): (Array[Double], Array[Array[Double]], Array[Double]) = {
    val cov = covarianceMatrix(df, vecCol, scale = 12).collect()
    val d   = cov.iterator.map(_.getInt(1)).max
    val m   = Array.ofDim[Double](d, d)
    cov.foreach { r =>
      val (i, j, c) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getDouble(2))
      m(i)(j) = c
      m(j)(i) = c
    }
    val means = df
      .select(posexplode(Cols.q(vecCol).cast("array<double>")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(avg("v").as("mean"))
      .collect()
      .sortBy(_.getInt(0))
      .map(_.getDouble(1))
    require(k >= 1 && k <= d, s"need 1 <= k <= $d components, got $k")

    def matVec(a: Array[Array[Double]], x: Array[Double]): Array[Double] = {
      val y = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += a(i)(j) * x(j); j += 1 }
        y(i) = s
        i += 1
      }
      y
    }
    def norm(x: Array[Double]): Double = math.sqrt(x.map(v => v * v).sum)

    val comps = Array.ofDim[Double](k, d)
    val evs   = new Array[Double](k)
    for (c <- 0 until k) {
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      var it = 0
      while (it < iters) {
        val w = matVec(m, v)
        val n = norm(w)
        require(n > 0, s"power iteration collapsed at component $c (rank-deficient after deflation)")
        v = w.map(_ / n)
        it += 1
      }
      val mv     = matVec(m, v)
      val lambda = v.zip(mv).map { case (a, b) => a * b }.sum
      // deterministic sign: largest-|x| coordinate positive
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      val sign  = if (v(pivot) < 0) -1.0 else 1.0
      comps(c) = v.map(_ * sign)
      evs(c) = lambda
      // deflate: m -= lambda v v^T
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { m(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
    }
    (means, comps, evs)
  }

  /** Project every embedding onto the top-`k` principal components
    * (centered): `pc_c = (v - mean)·u_c = v·u_c - mean·u_c`. The mean
    * term is a per-component scalar, so the distributed pass is ONE
    * codegen projection of `k` [[graft.functions.GraftFunctions.dot]]
    * products over the broadcast basis — nothing corpus-sized moves.
    */
  def pcaProject(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 2,
      iters: Int = 100,
      scale: Int = 4): DataFrame = {
    import graft.functions.GraftFunctions.dot
    val (means, comps, _) = pcaBasis(df, vecCol, k, iters)
    val vec = Cols.q(vecCol).cast("array<double>")
    val pcCols = comps.zipWithIndex.map { case (u, c) =>
      val uLit       = array(u.map(lit): _*)
      val meanOffset = means.zip(u).map { case (a, b) => a * b }.sum
      round(dot(vec, uLit) - lit(meanOffset), scale).as(s"pc${c + 1}")
    }
    df.select(Cols.q(idCol) +: pcCols.toSeq: _*)
  }

  /** Hard-negative mining for contrastive embedding training: per anchor,
    * the top-`k` DIFFERENT-label neighbours with cosine ≥ `tau` — the
    * "confusable but wrong" examples a triplet/InfoNCE trainer wants
    * (cosine below `tau` is an easy negative and carries no gradient
    * signal; same-label neighbours are positives, not negatives).
    *
    * Scale shape: the pair stage is [[BruteForce.neardupPairs]] — the
    * guarded exact kernel (broadcast-matrix small, block-partitioned
    * large; q41/q50's ANN buckets are the approximate scale path for the
    * same mining). Pairs are symmetrized with one explode (each ≥ tau
    * pair is a candidate in both directions), labels join on the id key,
    * and the per-anchor window runs over that anchor's ≥ tau candidates
    * only — tau is the knob that bounds the window input. Cosines come
    * out of the kernel already rounded, so the rank order is
    * engine-independent (neighbour id breaks ties).
    */
  def hardNegatives(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String,
      tau: Double,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    val pairs = BruteForce.neardupPairs(spark, df, idCol, vecCol, tau)
    val sym = pairs
      .select(explode(array(
        struct(col("a_id").as("anchor"), col("b_id").as("neighbor"), col("cos_sim")),
        struct(col("b_id").as("anchor"), col("a_id").as("neighbor"), col("cos_sim")))).as("e"))
      .select(col("e.anchor").as("anchor"), col("e.neighbor").as("neighbor"), col("e.cos_sim"))
    val lbl = df.select(Cols.q(idCol).cast("long").as("__lid"), Cols.q(labelCol).as("__lbl"))
    val w   = Window.partitionBy("anchor").orderBy(col("cos_sim").desc, col("neighbor").asc)
    sym
      .join(lbl.select(col("__lid").as("anchor"), col("__lbl").as("anchor_label")), Seq("anchor"))
      .join(
        lbl.select(col("__lid").as("neighbor"), col("__lbl").as("neighbor_label")),
        Seq("neighbor"))
      .where(col("anchor_label") =!= col("neighbor_label"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("anchor", "anchor_label", "neighbor", "neighbor_label", "cos_sim", "rn")
  }

  /** Contrastive TRIPLET construction: per anchor, its best same-label
    * neighbour (the positive) and its best different-label neighbour (the
    * hard negative), both drawn from the ≥ `tau` candidate set — the
    * (anchor, positive, negative) table a triplet/InfoNCE finetune
    * consumes directly. Anchors missing either side are dropped (no
    * gradient signal without both). Pair stage and ranking contract are
    * [[hardNegatives]]'s (guarded exact kernel at oracle scale;
    * [[trainingTripletsApprox]] is the corpus-scale variant with the LSH
    * candidate stage); the two per-anchor windows each run over that
    * anchor's ≥ tau candidates only.
    */
  def trainingTriplets(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String,
      tau: Double): DataFrame = {
    val spark = df.sparkSession
    val pairs = BruteForce.neardupPairs(spark, df, idCol, vecCol, tau)
    val sym = pairs
      .select(explode(array(
        struct(col("a_id").as("anchor"), col("b_id").as("neighbor"), col("cos_sim")),
        struct(col("b_id").as("anchor"), col("a_id").as("neighbor"), col("cos_sim")))).as("e"))
      .select(col("e.anchor").as("anchor"), col("e.neighbor").as("neighbor"), col("e.cos_sim"))
    tripletElection(df, idCol, labelCol, sym)
  }

  /** Corpus-scale triplet construction: [[trainingTriplets]]'s semantics
    * with the pair stage swapped from the guarded exact kernel to the LSH
    * bucket join ([[AnnBuckets.candidatePairs]]) — the same exact→approx
    * upgrade [[hardNegativesApprox]] applies to [[hardNegatives]].
    * Candidate volume scales with bucket occupancy (held constant by
    * `autoBits`), never O(n²). Approximate by construction: an anchor
    * whose true positive or hard negative never shares a bucket in any
    * table elects a lower-ranked (or no) neighbour; raise `nTables` (a
    * whole index copy each) or `nProbes` (one extra join row each —
    * [[AnnBuckets.candidatePairsMultiProbe]]; on the clustered fixture
    * 4 t × 2 p matched 13 plain tables) to trade compute for recall.
    * Election rules and output schema are identical to the exact path.
    * Defaults are probed-auto since round 14 (`nTables = Auto`,
    * `nProbes = 2` — compatibility note on [[AnnBuckets.approxTopK]]);
    * pass `nTables = 4, nProbes = 0` for pre-r14 outputs.
    */
  def trainingTripletsApprox(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String,
      tau: Double,
      nBits: Int = AnnBuckets.Auto,
      dims: Int = 64,
      nTables: Int = AnnBuckets.Auto,
      seed: Long = 42L,
      nProbes: Int = 2): DataFrame = {
    import graft.functions.GraftFunctions.dot
    val e = df
      .select(
        Cols.q(idCol).cast("long").as("vec_id"),
        Cols.q(vecCol).cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val n      = if (nBits == AnnBuckets.Auto || nTables == AnnBuckets.Auto) e.count() else 0L
    val bits   = if (nBits != AnnBuckets.Auto) nBits else AnnBuckets.autoBits(n)
    val tables = AnnBuckets.resolveTables(n, nTables, nProbes)
    // tau PUSHED into the candidate stage: sub-threshold pairs never ride
    // the cross-table dedup shuffle (commutes with the dedup — cos_sim is
    // functionally determined by the pair)
    val cand = AnnBuckets.candidatesFor(e, bits, dims, tables, nProbes, seed, minSim = Some(tau))
      .select(col("a_id").as("anchor"), col("b_id").as("neighbor"), col("cos_sim"))
    tripletElection(df, idCol, labelCol, cand)
  }

  /** Shared triplet election: tag each (anchor, neighbor, cos_sim)
    * candidate with both labels, then per anchor keep the best same-label
    * neighbour (positive) and best different-label neighbour (hard
    * negative); anchors missing either side drop. Both windows run over
    * that anchor's candidates only.
    */
  private def tripletElection(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      cand: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lbl = df.select(Cols.q(idCol).cast("long").as("__lid"), Cols.q(labelCol).as("__lbl"))
    val tagged = cand
      .join(lbl.select(col("__lid").as("anchor"), col("__lbl").as("anchor_label")), Seq("anchor"))
      .join(
        lbl.select(col("__lid").as("neighbor"), col("__lbl").as("neighbor_label")),
        Seq("neighbor"))
    val w = Window.partitionBy("anchor").orderBy(col("cos_sim").desc, col("neighbor").asc)
    def top1(cond: Column, nCol: String, cCol: String): DataFrame =
      tagged
        .where(cond)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(
          col("anchor"),
          col("anchor_label"),
          col("neighbor").as(nCol),
          col("cos_sim").as(cCol))
    top1(col("anchor_label") === col("neighbor_label"), "pos_id", "pos_cos")
      .join(
        top1(col("anchor_label") =!= col("neighbor_label"), "neg_id", "neg_cos")
          .drop("anchor_label"),
        Seq("anchor"))
      .select("anchor", "anchor_label", "pos_id", "pos_cos", "neg_id", "neg_cos")
  }

  /** Corpus-scale hard-negative mining: the same per-anchor different-label
    * top-k ≥ tau semantics as [[hardNegatives]], but the pair stage is the
    * bucketed LSH candidate generation ([[AnnBuckets.candidatePairs]])
    * instead of the guarded exact kernel — candidate volume scales with
    * bucket occupancy (held constant by `autoBits`), never O(n²), so this
    * is the entry point a 100 TB miner runs. Recall is approximate by
    * construction (a hard negative whose bucket never collides with its
    * anchor in any table is missed); raise `nTables` (an index copy each)
    * or `nProbes` (one extra join row each — multi-probe, measured
    * matching 13 plain tables at 4 t × 2 p on the clustered fixture) to
    * trade compute for recall. Output schema and ranking rules are
    * identical to [[hardNegatives]] (rounded cosine desc, neighbour id
    * asc). Defaults are probed-auto since round 14 (`nTables = Auto`,
    * `nProbes = 2` — compatibility note on [[AnnBuckets.approxTopK]]);
    * pass `nTables = 4, nProbes = 0` for pre-r14 outputs.
    */
  def hardNegativesApprox(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String,
      tau: Double,
      k: Int,
      nBits: Int = AnnBuckets.Auto,
      dims: Int = 64,
      nTables: Int = AnnBuckets.Auto,
      seed: Long = 42L,
      nProbes: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions.dot
    require(k >= 1, s"k must be >= 1, got $k")
    val e = df
      .select(
        Cols.q(idCol).cast("long").as("vec_id"),
        Cols.q(vecCol).cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val n      = if (nBits == AnnBuckets.Auto || nTables == AnnBuckets.Auto) e.count() else 0L
    val bits   = if (nBits != AnnBuckets.Auto) nBits else AnnBuckets.autoBits(n)
    val tables = AnnBuckets.resolveTables(n, nTables, nProbes)
    // tau PUSHED into the candidate stage: sub-threshold pairs never ride
    // the cross-table dedup shuffle (commutes with the dedup — cos_sim is
    // functionally determined by the pair)
    val cand = AnnBuckets.candidatesFor(e, bits, dims, tables, nProbes, seed, minSim = Some(tau))
      .select(col("a_id").as("anchor"), col("b_id").as("neighbor"), col("cos_sim"))
    val lbl = df.select(Cols.q(idCol).cast("long").as("__lid"), Cols.q(labelCol).as("__lbl"))
    val w   = Window.partitionBy("anchor").orderBy(col("cos_sim").desc, col("neighbor").asc)
    cand
      .join(lbl.select(col("__lid").as("anchor"), col("__lbl").as("anchor_label")), Seq("anchor"))
      .join(
        lbl.select(col("__lid").as("neighbor"), col("__lbl").as("neighbor_label")),
        Seq("neighbor"))
      .where(col("anchor_label") =!= col("neighbor_label"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("anchor", "anchor_label", "neighbor", "neighbor_label", "cos_sim", "rn")
  }
}
