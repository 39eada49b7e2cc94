package graft.llm

import graft.core.Cols
import graft.functions.GraftFunctions.dot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbours — the coarse-
  * quantizer alternative to the random-hyperplane LSH in [[AnnBuckets]]
  * (SURVEY.md §2B north star names both).
  *
  * Train: k centroids by Lloyd iterations expressed as DataFrame jobs —
  * assignment is a codegen'd argmin over broadcast centroid literals
  * (distance via the [[graft.functions.DotProduct]] expression), the
  * update is one posexplode + (cell, dim) aggregate; only k×dims doubles
  * ever sit on the driver. Deterministic: seeded hash-ordered init, fixed
  * iteration count.
  *
  * Search: each vector probes its `nProbe` nearest cells and meets only the
  * vectors assigned there — at cluster scale the cell id is the shuffle
  * key (inverted lists co-locate), and recall/cost tune via k and nProbe.
  */
object IvfIndex {

  /** Squared-distance column to a constant centroid (‖e‖² term omitted —
    * constant per row, irrelevant to argmin over centroids).
    */
  private def distTo(embCol: Column, c: Array[Double]): Column = {
    val lit2c = typedLit(c.map(_ * 2.0).toSeq)
    val c2    = c.map(x => x * x).sum
    lit(c2) - dot(embCol, lit2c)
  }

  /** Nearest-centroid cell id via array_min over (dist, idx) structs. */
  private def cellExpr(embCol: Column, centroids: Array[Array[Double]]): Column =
    array_min(array(centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(distTo(embCol, c).as("d"), lit(i).as("cell"))
    }: _*)).getField("cell")

  /** Train centroids on a bounded deterministic sample: the first
    * `trainSample` rows in hash-of-id order are collected once (the first
    * k of them are the init, unchanged from the full-corpus variant) and
    * Lloyd runs in driver memory — the standard IVF recipe (FAISS trains
    * its coarse quantizer on a sample for the same reason): one
    * TakeOrdered job instead of `iters` full passes over the corpus, and
    * at 100 TB the sample bound keeps driver memory at
    * O(trainSample × dims) while training cost stays independent of
    * corpus size. Assignment replicates [[cellExpr]]'s argmin exactly
    * (same ‖c‖² − 2·e·c expansion, same (dist, cell) lexicographic
    * tie-break); empty cells keep their centroid.
    */
  def trainCentroids(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      k: Int = 16,
      iters: Int = 3,
      seed: Int = 42,
      trainSample: Int = 4096): Array[Array[Double]] = {
    val e   = emb.select(Cols.q(idCol).as("id"), Cols.q(embCol).cast("array<double>").as("emb"))
    val cap = math.max(k, trainSample)
    // probe cap+1 rows so "corpus is larger than the sample" is a fact, not
    // an inference from exact equality (which also fires when |corpus|==cap)
    val probed: Array[Array[Double]] = e
      .orderBy(pmod(hash(col("id"), lit(seed)), lit(1000003)), col("id"))
      .limit(cap + 1)
      .select("emb")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    // the sampled-vs-full decision changes the centroids (and thus recall)
    // for any corpus above trainSample — log it so a recall drop at larger
    // SFs is attributable to this cut rather than silent
    if (probed.length > cap)
      org.slf4j.LoggerFactory
        .getLogger(getClass)
        .info(s"IVF centroids trained on a $cap-row sample " +
          s"(trainSample=$trainSample) — corpus is larger; recall depends on sample coverage")
    val sample    = probed.take(cap)
    var centroids = sample.take(k)

    def nearest(v: Array[Double]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        // same arithmetic as distTo: Σcᵢ² − Σ vᵢ·(2cᵢ), summed in index
        // order, so sample points land in the same cells either path
        val cen = centroids(c)
        var c2 = 0.0
        var dp = 0.0
        var i = 0
        while (i < cen.length) {
          c2 += cen(i) * cen(i)
          dp += v(i) * (2.0 * cen(i))
          i += 1
        }
        val d = c2 - dp
        if (d < bestD) { bestD = d; best = c } // strict < = lowest-cell tie-break
        c += 1
      }
      best
    }

    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](centroids(0).length))
      val cnts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(v)
        cnts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { cell =>
        if (cnts(cell) > 0) sums(cell).map(_ / cnts(cell))
        else centroids(cell) // empty cell keeps its centroid
      }.toArray
    }
    centroids
  }

  /** Sentinel: size the index from the corpus (see [[autoCells]]). */
  val Auto: Int = -1

  /** Cell count for a corpus of `n` vectors: the FAISS √n rule. A FIXED
    * nCells is a scale bug — cell occupancy grows linearly with the
    * corpus, so probe-join candidate work (n · nProbe · n/nCells) grows
    * QUADRATICALLY; the sf1 full-suite bench measured 31× growth for 10×
    * data at nCells=16. √n sizing makes both occupancy and cell count grow
    * as √n, keeping candidate volume at n^1.5 · nProbe — the IVF trade.
    * Clamped to [16, 65536]: above [[KernelCellThreshold]] cells the
    * assignment switches from per-centroid expressions to the
    * broadcast-matrix kernel, so large cell counts stay cheap.
    */
  def autoCells(n: Long): Int =
    math.min(65536, math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** Above this many cells, centroid assignment runs as a broadcast-
    * matrix mapPartitions kernel instead of per-centroid Catalyst
    * expressions: an expression tree with hundreds of 64-dim dot
    * products splinters codegen (and at thousands of cells falls back to
    * interpreted eval), while the kernel is one flat-array scan per row
    * with an O(nProbe) insertion top-k — the [[BruteForce]] pattern. The
    * two paths produce IDENTICAL assignments: same ‖c‖² − 2·e·c
    * expansion with the same index-order double summation, same
    * (dist, cell) lexicographic tie-break (spec-pinned).
    */
  val KernelCellThreshold: Int = 128

  /** Approximate cosine top-k: probe the `nProbe` nearest cells per vector,
    * rank candidates exactly (rounded score + id tie-break).
    *
    * `nCells = Auto` (the default) counts the corpus once, sizes the index
    * via [[autoCells]], and scales the training sample to 16 rows per
    * centroid (min 4096); pass explicit values for reproducible
    * small-scale runs (the declared q50 query does).
    */
  def approxTopK(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      k: Int = 5,
      nCells: Int = Auto,
      nProbe: Int = 4,
      iters: Int = 3,
      seed: Int = 42): DataFrame = {
    val (cells, sampleRows) =
      if (nCells != Auto) (nCells, 4096)
      else {
        val n = emb.count()
        val c = autoCells(n)
        org.slf4j.LoggerFactory
          .getLogger(getClass)
          .info(s"approxTopK: auto-sized IVF index to nCells=$c for n=$n")
        (c, math.max(4096, 16 * c))
      }
    val centroids = trainCentroids(emb, idCol, embCol, cells, iters, seed, sampleRows)

    // ONE pass computes per-vector probe cells (nProbe nearest, nearest
    // first — so element 0 is the home cell). The indexed table is
    // materialized (localCheckpoint) because both sides of the candidate
    // self-join derive from it — this IS the inverted index; the
    // persisted form is [[writeIndex]]'s cell-partitioned table.
    val indexed = withProbeCells(vecBase(emb, idCol, embCol), centroids, nProbe)
      .withColumn("cell", col("probe_cells").getItem(0))
      .localCheckpoint(true)

    val probes = indexed
      .select(
        col("vec_id").as("a_id"),
        col("emb").as("a_emb"),
        col("nrm").as("a_nrm"),
        explode(col("probe_cells")).as("cell"))

    val lists = indexed.select(
      col("cell"),
      col("vec_id").as("b_id"),
      col("emb").as("b_emb"),
      col("nrm").as("b_nrm"))

    rankCandidates(probes, lists, k)
  }

  /** The one projection every IVF path reads. */
  private def vecBase(emb: DataFrame, idCol: String, embCol: String): DataFrame =
    emb
      .select(Cols.q(idCol).as("vec_id"), Cols.q(embCol).cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))

  /** Adds `probe_cells` (nProbe nearest cells, nearest first) via the
    * expression path or the broadcast-matrix kernel, by cell count.
    */
  private def withProbeCells(
      base: DataFrame,
      centroids: Array[Array[Double]],
      nProbe: Int): DataFrame =
    if (centroids.length <= KernelCellThreshold) {
      val distArr = array(centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
        struct(distTo(col("emb"), c).as("d"), lit(i).as("cell"))
      }: _*)
      base.withColumn(
        "probe_cells",
        transform(slice(array_sort(distArr), 1, nProbe), p => p.getField("cell")))
    } else {
      assignProbesKernel(base, centroids, nProbe)
    }

  /** Shared scoring tail (also used by [[AnnBuckets.approxTopKIndexed]]):
    * exact cosine over the candidate join, ranked by (rounded score desc,
    * id asc), top k per query.
    */
  private[llm] def rankCandidates(
      probes: DataFrame,
      lists: DataFrame,
      k: Int,
      key: String = "cell"): DataFrame = {
    val w = Window.partitionBy("a_id").orderBy(col("cos_sim").desc, col("b_id").asc)
    probes
      .join(lists, Seq(key))
      .where(col("a_id") =!= col("b_id"))
      .select(
        col("a_id"),
        col("b_id"),
        round(dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")), 6).as("cos_sim"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("a_id", "b_id", "rn", "cos_sim")
  }

  /** Persist the inverted index: vectors written as a CELL-PARTITIONED
    * parquet table (`<outDir>/cells/cell=<id>/…`) plus a centroid sidecar
    * (`<outDir>/centroids`). This is the durable form of the index
    * [[approxTopK]] materializes per run — at cluster scale the partition
    * directory IS the inverted list: a probe join touches only the
    * probed cells' files (partition pruning), so query cost scales with
    * cells-probed, not corpus size, and the index is built once and
    * shared across query sessions.
    */
  def writeIndex(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      outDir: String,
      nCells: Int = Auto,
      iters: Int = 3,
      seed: Int = 42): Unit = {
    val spark = emb.sparkSession
    // persisted layout = one partition dir per cell, so auto sizing caps
    // at 4096 dirs (the in-memory 65536 ceiling would be a file-count
    // hazard as a directory tree); past this corpus size use a bucketed
    // table or coarser dirs over a finer in-file cell column
    val (cells, sampleRows) =
      if (nCells != Auto) (nCells, 4096)
      else {
        val n = emb.count()
        val c = math.min(4096, autoCells(n))
        (c, math.max(4096, 16 * c))
      }
    val centroids = trainCentroids(emb, idCol, embCol, cells, iters, seed, sampleRows)
    assignedRows(emb, idCol, embCol, centroids)
      // one task → one file per cell directory (the r13 banded-index
      // write-clustering posture; unclustered, tasks × cells files)
      .repartition(col("cell"))
      .write
      .partitionBy("cell")
      .mode("overwrite")
      .parquet(s"$outDir/cells")
    writeCentroidSidecar(spark, centroids, outDir)
  }

  /** The assignment projection every persisted-IVF writer shares: each
    * vector with its nearest cell (nProbe = 1 head of the probe list —
    * the same argmin both query paths replay).
    */
  private def assignedRows(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    withProbeCells(vecBase(emb, idCol, embCol), centroids, nProbe = 1)
      .select(col("probe_cells").getItem(0).as("cell"), col("vec_id"), col("emb"), col("nrm"))

  private def writeCentroidSidecar(
      spark: org.apache.spark.sql.SparkSession,
      centroids: Array[Array[Double]],
      outDir: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$outDir/centroids")
  }

  /** The persisted centroids, cell-ordered — the frozen quantizer every
    * read and append re-derives its assignment from.
    */
  private def readCentroids(
      indexDir: String,
      spark: org.apache.spark.sql.SparkSession): Array[Array[Double]] =
    spark.read
      .parquet(s"$indexDir/centroids")
      .orderBy("cell")
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** [[writeIndex]] in the GENERATIONAL layout
    * (`cells/cell=<id>/src_batch=<b>/…`) — the q135 ingest contract
    * applied to the plain-IVF family, so no persisted index family
    * silently lacks the lifecycle affordances its siblings document:
    * [[appendToIndex]] adds a batch against the FROZEN centroid sidecar
    * by writing only that batch's partitions (history never re-read or
    * re-assigned), [[cellOccupancy]] is the sizing monitor. Static
    * overwrite on the bootstrap for the same reason as
    * [[IvfPq.writeIndexGen]]: a re-bootstrap must replace every
    * generation.
    *
    * MAINTENANCE ROUTING: unlike LSH hyperplanes, IVF centroids are a
    * TRAINED quantizer — appended batches whose distribution moves away
    * from the bootstrap assign increasingly off-center (the q136 drift
    * mode), and this family deliberately ships NO retrain remedy: a
    * drift-monitored, retrain-capable deployment should use [[IvfPq]]
    * (the superset — same coarse layout plus residual codes,
    * `retrainDue`/`retrainAndRebuild`, geometry stamps with fail-fast
    * stale handles). Plain IVF's generational layout is for corpora
    * whose distribution is stable across batches.
    */
  def writeIndexGen(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      outDir: String,
      nCells: Int = Auto,
      iters: Int = 3,
      seed: Int = 42,
      srcBatch: Long = 0L): Unit = {
    val (cells, sampleRows) =
      if (nCells != Auto) (nCells, 4096)
      else {
        val n = emb.count()
        val c = math.min(4096, autoCells(n))
        (c, math.max(4096, 16 * c))
      }
    writeIndexGenWith(
      trainCentroids(emb, idCol, embCol, cells, iters, seed, sampleRows),
      emb, idCol, embCol, outDir, srcBatch)
  }

  /** [[writeIndexGen]] against PRE-TRAINED centroids (the
    * [[IvfPq.writeIndexGen]] shape) — lets a relational (seed-pinned)
    * quantizer be persisted as easily as a Lloyd-trained one.
    */
  def writeIndexGenWith(
      centroids: Array[Array[Double]],
      emb: DataFrame,
      idCol: String,
      embCol: String,
      outDir: String,
      srcBatch: Long = 0L): Unit = {
    val spark = emb.sparkSession
    assignedRows(emb, idCol, embCol, centroids)
      .withColumn("src_batch", lit(srcBatch))
      .repartition(col("cell"))
      .write
      .partitionBy("cell", "src_batch")
      .option("partitionOverwriteMode", "static")
      .mode("overwrite")
      .parquet(s"$outDir/cells")
    writeCentroidSidecar(spark, centroids, outDir)
  }

  /** Incremental plain-IVF ingest: assign a NEW batch under the index's
    * FROZEN centroid sidecar and append it as generation `srcBatch` —
    * dynamic partition overwrite touches only this batch's
    * `(cell, src_batch)` directories, so replay is idempotent and
    * history is never re-read. Probe reads ([[approxTopKIndexed]]) prune
    * statically on the outer `cell` level across all generations
    * unchanged. See [[writeIndexGen]] for the maintenance routing:
    * drifting distributions belong on [[IvfPq]], which can retrain.
    */
  def appendToIndex(
      indexDir: String,
      emb: DataFrame,
      idCol: String,
      embCol: String,
      srcBatch: Long): Unit = {
    val spark = emb.sparkSession
    requireGenerationalCells(indexDir, spark)
    assignedRows(emb, idCol, embCol, readCentroids(indexDir, spark))
      .withColumn("src_batch", lit(srcBatch))
      .repartition(col("cell"))
      .write
      .partitionBy("cell", "src_batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(s"$indexDir/cells")
  }

  /** Fail fast (naming the rebuild path) when the cells table lacks the
    * `src_batch` generation level — the family-wide guard pattern.
    */
  def requireGenerationalCells(
      indexDir: String,
      spark: org.apache.spark.sql.SparkSession): Unit =
    require(
      spark.read.parquet(s"$indexDir/cells").schema.fieldNames.contains("src_batch"),
      s"IVF index at $indexDir uses the single-generation layout (no src_batch partition " +
        "level); appendToIndex needs the generational layout — rebuild it with " +
        "IvfIndex.writeIndexGen (writeIndex output stays valid for approxTopKIndexed " +
        "serving, only ingest requires the generational layout)")

  /** Occupancy report for a persisted IVF index — the sizing monitor
    * (the [[AnnBuckets.bucketOccupancy]] analog): `autoCells` was √n of
    * the BOOTSTRAP corpus, and mean cell occupancy grows linearly with
    * appended generations, degrading probe-join candidate cost. One
    * aggregation over the index's cell keys. There is deliberately no
    * composed rebuild here — re-sizing an IVF index retrains its
    * quantizer, which is [[IvfPq.retrainAndRebuild]]'s job; see the
    * routing note on [[writeIndexGen]].
    */
  def cellOccupancy(
      indexDir: String,
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.read
      .parquet(s"$indexDir/cells")
      .groupBy("cell")
      .agg(count(lit(1)).as("occ"))
      .agg(
        sum(col("occ")).as("rows"),
        count(lit(1)).as("cells"),
        round(avg(col("occ")), 2).as("mean_occ"),
        max(col("occ")).as("max_occ"))

  /** Query a [[writeIndex]] index: assign probe cells to the query
    * vectors with the persisted centroids, join against the partitioned
    * cell table, rank exactly. The join key is the PARTITION column, and
    * the union of probed cells is bounded by nCells (≤ [[autoCells]]'s
    * 65536 ceiling), so it is collected (one bounded aggregation over
    * the query side) and applied as a STATIC partition filter — the
    * index scan then reads only the probed cells' files regardless of
    * index size, without relying on DPP's selectivity heuristics. At
    * 100 TB that is nProbe/nCells of the index, spec-pinned via the
    * executed scan's partition count.
    */
  def approxTopKIndexed(
      indexDir: String,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int = 5,
      nProbe: Int = 4): DataFrame = {
    val spark     = queries.sparkSession
    val centroids = readCentroids(indexDir, spark)
    val probes = withProbeCells(vecBase(queries, idCol, embCol), centroids, nProbe)
      .select(
        col("vec_id").as("a_id"),
        col("emb").as("a_emb"),
        col("nrm").as("a_nrm"),
        explode(col("probe_cells")).as("cell"))
    // structurally bounded: distinct probed cells ⊆ [0, nCells) and the
    // persisted layout caps cells at 4096 dirs — unlike the LSH tb space
    // (tables · 2^bits), so no size guard is needed here
    // (cf. AnnBuckets.MaxProbedBuckets)
    val probedCells: Seq[Int] =
      probes.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val lists = spark.read
      .parquet(s"$indexDir/cells")
      .where(col("cell").isin(probedCells: _*))
      .select(
        col("cell"),
        col("vec_id").as("b_id"),
        col("emb").as("b_emb"),
        col("nrm").as("b_nrm"))
    rankCandidates(probes, lists, k)
  }

  /** Broadcast-matrix probe assignment: centroids as one flat primitive
    * array shared across tasks, each row scanning it with an O(nProbe)
    * insertion top-k. Arithmetic parity with [[distTo]]: distance is
    * ‖c‖² − Σ_j e_j·(2c_j) summed in index order in doubles, ties break
    * (dist, cell) lexicographic — bit-identical to the expression path.
    */
  private[graft] def assignProbesKernel(
      base: DataFrame,
      centroids: Array[Array[Double]],
      nProbe: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val nc   = centroids.length
    val dims = if (nc == 0) 0 else centroids(0).length
    val twoC = new Array[Double](nc * dims)
    val c2   = new Array[Double](nc)
    var ci = 0
    while (ci < nc) {
      val c = centroids(ci)
      var j = 0
      while (j < dims) { twoC(ci * dims + j) = c(j) * 2.0; j += 1 }
      c2(ci) = c.map(x => x * x).sum
      ci += 1
    }
    val bc = spark.sparkContext.broadcast((twoC, c2))
    base
      .select(col("vec_id").cast("long"), col("emb"), col("nrm"))
      .as[(Long, Array[Double], Double)]
      .mapPartitions { it =>
        val (twoC, c2) = bc.value
        val nc   = c2.length
        val take = math.min(nProbe, nc)
        it.map { case (id, e, nrm) =>
          val d  = math.min(e.length, if (nc == 0) 0 else twoC.length / nc)
          val ds = new Array[Double](take)
          val cs = new Array[Int](take)
          var size = 0
          var c = 0
          while (c < nc) {
            var s = 0.0
            var j = 0
            while (j < d) { s += e(j) * twoC(c * d + j); j += 1 }
            val dist = c2(c) - s
            // (dist, cell) lex insertion — cell ids scan ascending, so on
            // equal dist the earlier (smaller) cell id stays ahead
            if (size < take || dist < ds(size - 1)) {
              var i = math.min(size, take - 1)
              while (i > 0 && dist < ds(i - 1)) {
                ds(i) = ds(i - 1); cs(i) = cs(i - 1); i -= 1
              }
              ds(i) = dist; cs(i) = c
              if (size < take) size += 1
            }
            c += 1
          }
          (id, e, nrm, cs.take(size).toSeq)
        }
      }
      .toDF("vec_id", "emb", "nrm", "probe_cells")
  }
}
