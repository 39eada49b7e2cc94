package graft

import graft.core.Tables
import graft.llm.{AnnBuckets, SimilarityQueries}
import graft.multimodal.{Multimodal, MultimodalQueries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Exact top-5 oracle pairs, computed once per suite. */
  private lazy val exactTop5: Set[(Long, Long)] = SimilarityQueries.q19SimilarityTopk
    .run(spark, dir)
    .select("a_id", "b_id")
    .as[(Long, Long)]
    .collect()
    .toSet

  // gates are measured-minus-margin, not catastrophe floors: across seeds
  // {42, 7, 1234} at BOTH sf0.001 and sf0.1 the observed recalls were
  // LSH 0.428–0.488 and IVF 0.636–0.665 (nBits=4/nTables=4, nCells=8/
  // nProbe=3), so 0.35 / 0.60 catch real drift (a bucketing or probe
  // regression) while tolerating seed variance
  test("LSH ANN recall ≥ 0.35 vs the exact top-5 oracle across 3 seeds") {
    val n = Tables(spark, dir).embeddings.count()
    for (seed <- Seq(42L, 7L, 1234L)) {
      val approx = AnnBuckets
        .approxTopK(Tables(spark, dir).embeddings, "vec_id", "embedding",
          k = 5, nBits = 4, nTables = 4, seed = seed, nProbes = 0)
        .select("a_id", "b_id")
        .as[(Long, Long)]
        .collect()
        .toSet
      val recall = (exactTop5 intersect approx).size.toDouble / exactTop5.size
      assert(recall >= 0.35, s"LSH recall too low at seed $seed: $recall")
      // candidate volume actually shrinks vs brute force (the scale point)
      assert(approx.size < n * n / 2)
    }
  }

  test("IVF ANN recall ≥ 0.60 vs the exact top-5 oracle across 3 seeds") {
    val n = Tables(spark, dir).embeddings.count()
    for (seed <- Seq(42, 7, 1234)) {
      val approx = graft.llm.IvfIndex
        .approxTopK(Tables(spark, dir).embeddings, "vec_id", "embedding",
          k = 5, nCells = 8, nProbe = 3, seed = seed)
        .select("a_id", "b_id")
        .as[(Long, Long)]
        .collect()
        .toSet
      val recall = (exactTop5 intersect approx).size.toDouble / exactTop5.size
      assert(recall >= 0.60, s"IVF recall too low at seed $seed: $recall")
      assert(approx.size < n * n / 2)
    }
  }

  test("ANN auto-sizing holds per-bucket/per-cell occupancy as the corpus grows") {
    // LSH: occupancy n/2^bits stays ~targetBucketRows across scale jumps
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L)) {
      val bits = AnnBuckets.autoBits(n)
      val occ  = n.toDouble / (1L << bits)
      assert(bits >= 4 && bits <= 24)
      assert(occ <= 128.0 || bits == 24, s"n=$n bits=$bits occ=$occ")
    }
    assert(AnnBuckets.autoBits(10) == 4)          // floor
    assert(AnnBuckets.autoBits(Long.MaxValue) == 24) // ceiling
    // IVF: √n cells, clamped
    assert(graft.llm.IvfIndex.autoCells(100) == 16)
    assert(graft.llm.IvfIndex.autoCells(50000) == 224)
    assert(graft.llm.IvfIndex.autoCells(10000000) == 3163) // √n, kernel path
    assert(graft.llm.IvfIndex.autoCells(Long.MaxValue) == 65536) // ceiling
    // monotone: bigger corpora never get a smaller index
    val bitSeq  = Seq(1000L, 10000L, 100000L, 1000000L).map(AnnBuckets.autoBits(_))
    val cellSeq = Seq(1000L, 10000L, 100000L, 1000000L).map(graft.llm.IvfIndex.autoCells)
    assert(bitSeq == bitSeq.sorted && cellSeq == cellSeq.sorted)
  }

  test("auto-sized ANN recall is gated at its measured operating point") {
    // the auto paths hold COST constant as n grows, so their recall is a
    // function of scale and must be gated at the measured point, not the
    // fixed-size spec's (AnnScaleBench r10: auto recall at n=20k synthetic
    // is 0.11 LSH / 0.22 IVF). Measured here across seeds {42, 7}:
    // LSH 0.440–0.457, IVF 0.429–0.464 — gates are measured-minus-margin
    for (seed <- Seq(42L, 7L)) {
      val lsh = AnnBuckets
        .approxTopK(Tables(spark, dir).embeddings, "vec_id", "embedding",
          k = 5, nTables = 4, seed = seed, nProbes = 0)
        .select("a_id", "b_id")
        .as[(Long, Long)]
        .collect()
        .toSet
      val rLsh = (exactTop5 intersect lsh).size.toDouble / exactTop5.size
      info(f"auto LSH recall seed=$seed: $rLsh%.3f")
      assert(rLsh >= 0.35, s"auto LSH recall regressed at seed $seed: $rLsh")
      val ivf = graft.llm.IvfIndex
        .approxTopK(Tables(spark, dir).embeddings, "vec_id", "embedding",
          k = 5, nProbe = 3, seed = seed.toInt)
        .select("a_id", "b_id")
        .as[(Long, Long)]
        .collect()
        .toSet
      val rIvf = (exactTop5 intersect ivf).size.toDouble / exactTop5.size
      info(f"auto IVF recall seed=$seed: $rIvf%.3f")
      assert(rIvf >= 0.30, s"auto IVF recall regressed at seed $seed: $rIvf")
    }
  }

  test("auto-sized ANN paths run end-to-end and return ranked rows") {
    val lsh = AnnBuckets
      .approxTopK(Tables(spark, dir).embeddings, "vec_id", "embedding", k = 3)
    assert(lsh.columns.toSeq == Seq("a_id", "b_id", "rn", "cos_sim"))
    assert(lsh.where(col("rn") > 3).count() == 0 && lsh.count() > 0)
    val ivf = graft.llm.IvfIndex
      .approxTopK(Tables(spark, dir).embeddings, "vec_id", "embedding", k = 3, nProbe = 2)
    assert(ivf.columns.toSeq == Seq("a_id", "b_id", "rn", "cos_sim"))
    assert(ivf.where(col("rn") > 3).count() == 0 && ivf.count() > 0)
  }

  test("IVF kernel assignment ≡ expression assignment (same probes, same top-k)") {
    import graft.functions.GraftFunctions.dot
    import graft.llm.IvfIndex
    val emb = Tables(spark, dir).embeddings
    // pin bit-identical assignment parity between the mapPartitions
    // kernel (> KernelCellThreshold cells) and the Catalyst expression
    // path: same centroids, same nProbe, probe lists must match exactly
    val cents = IvfIndex.trainCentroids(emb, "vec_id", "embedding", k = 24, trainSample = 4096)
    val base = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val kernel = IvfIndex
      .assignProbesKernel(base, cents, nProbe = 3)
      .select(col("vec_id"), col("probe_cells"))
      .as[(Long, Seq[Int])]
      .collect()
      .toMap
    // expression-path probes recomputed the same way approxTopK does
    val distArr = array(cents.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct((lit(c.map(x => x * x).sum) - dot(col("emb"), typedLit(c.map(_ * 2.0).toSeq)))
        .as("d"), lit(i).as("cell"))
    }: _*)
    val exprMap = base
      .withColumn("pc", transform(slice(array_sort(distArr), 1, 3), p => p.getField("cell")))
      .select(col("vec_id"), col("pc"))
      .as[(Long, Seq[Int])]
      .collect()
      .toMap
    assert(kernel.keySet == exprMap.keySet)
    val diffs = kernel.keys.filter(k => kernel(k) != exprMap(k))
    assert(diffs.isEmpty, s"probe mismatch for ids ${diffs.take(5).toSeq}")
  }

  test("persisted IVF index reproduces the in-memory path and prunes cells") {
    import graft.llm.IvfIndex
    val emb = Tables(spark, dir).embeddings
    val idx = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    IvfIndex.writeIndex(emb, "vec_id", "embedding", idx, nCells = 16)
    // same corpus as queries (self-indexing) must equal the in-memory
    // plan: identical centroids (deterministic training), same probes,
    // same ranking
    val fromIndex = IvfIndex.approxTopKIndexed(idx, emb, "vec_id", "embedding", k = 5, nProbe = 3)
    val inMemory  = IvfIndex.approxTopK(emb, "vec_id", "embedding", k = 5, nCells = 16, nProbe = 3)
    TestSpark.assertFrameEqual(fromIndex, inMemory)
    // a single-vector query against the partitioned cell table must not
    // scan all 16 cells: with nProbe=2 the executed scan reads 2
    // partitions (dynamic partition pruning on the cell join)
    val one = emb.limit(1)
    val res = IvfIndex.approxTopKIndexed(idx, one, "vec_id", "embedding", k = 3, nProbe = 2)
    res.collect()
    // AQE wraps materialized stages in QueryStageExec whose subtree
    // TreeNode.collect does not descend into — unwrap recursively
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case s: QueryStageExec        => allScans(s.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other =>
        other.children.flatMap(allScans) ++ other.subqueries.flatMap(allScans)
    }
    val scans = allScans(res.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("ivf_idx")))
    assert(scans.nonEmpty, "no file scan over the index found")
    val partitionsRead = scans.map(_.selectedPartitions.partitionCount).sum
    assert(
      partitionsRead <= 2,
      s"expected <=2 pruned cell partitions, scanned $partitionsRead")
  }

  test("persisted LSH buckets reproduce the in-memory path and prune buckets") {
    val emb = Tables(spark, dir).embeddings
    val idx = java.nio.file.Files.createTempDirectory("lsh_idx").toString
    AnnBuckets.writeBuckets(emb, "vec_id", "embedding", idx, nBits = 4, nTables = 2,
      nProbes = 0)
    val fromIndex = AnnBuckets.approxTopKIndexed(idx, emb, "vec_id", "embedding", k = 5)
    val inMemory  = AnnBuckets.approxTopK(emb, "vec_id", "embedding", k = 5, nBits = 4, nTables = 2,
      nProbes = 0)
    TestSpark.assertFrameEqual(fromIndex, inMemory)
    // one probe vector touches one bucket per table → ≤2 partitions read
    val res = AnnBuckets.approxTopKIndexed(idx, emb.limit(1), "vec_id", "embedding", k = 3)
    res.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case s: QueryStageExec        => allScans(s.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other                    => other.children.flatMap(allScans) ++ other.subqueries.flatMap(allScans)
    }
    val scanned = allScans(res.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("lsh_idx")))
      .map(_.selectedPartitions.partitionCount)
      .sum
    assert(scanned <= 2, s"expected <=2 pruned bucket partitions, scanned $scanned")
  }

  test("probed persisted LSH index: in-memory parity, bounded pruned scan, recall gain") {
    import graft.functions.GraftFunctions.dot
    import org.apache.spark.sql.expressions.Window
    val emb = Tables(spark, dir).embeddings
    val idx = java.nio.file.Files.createTempDirectory("lsh_idx_mp").toString
    AnnBuckets.writeBuckets(emb, "vec_id", "embedding", idx, nBits = 4, nTables = 2, nProbes = 2)
    // the meta sidecar carries the probe budget the index was sized for
    val fromIndex = AnnBuckets.approxTopKIndexed(idx, emb, "vec_id", "embedding", k = 5)
    // in-memory equivalent: the DIRECTED multi-probe candidate stage
    // (probe-side queries × plain-bucket corpus — exactly q137's
    // hash-oracled flip rule) ranked by the shared window tail
    val e = emb
      .select(
        col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val w = Window.partitionBy("a_id").orderBy(col("cos_sim").desc, col("b_id").asc)
    val expected = AnnBuckets
      .candidatePairsMultiProbeDirected(e, bits = 4, dims = 64, nTables = 2, nProbes = 2,
        seed = 42L)
      .dropDuplicates("a_id", "b_id")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select("a_id", "b_id", "rn", "cos_sim")
    TestSpark.assertFrameEqual(fromIndex, expected)
    // probes buy recall at EQUAL index size: the probed read of this
    // 2-table index beats the plain read of the same 2 tables
    val plainIdx = java.nio.file.Files.createTempDirectory("lsh_idx_plain").toString
    AnnBuckets.writeBuckets(emb, "vec_id", "embedding", plainIdx, nBits = 4, nTables = 2,
      nProbes = 0)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("a_id", "b_id").as[(Long, Long)].collect().toSet
      (exactTop5 intersect got).size.toDouble / exactTop5.size
    }
    val rProbed = recallOf(fromIndex)
    val rPlain  = recallOf(AnnBuckets.approxTopKIndexed(plainIdx, emb, "vec_id", "embedding", k = 5))
    assert(rProbed > rPlain,
      f"probed read must buy recall over the plain read of the same tables: " +
        f"$rProbed%.3f vs $rPlain%.3f")
    // one query reads ≤ nTables · (nProbes + 1) = 6 bucket partitions —
    // static pruning survives the probe explosion
    val res = AnnBuckets.approxTopKIndexed(idx, emb.limit(1), "vec_id", "embedding", k = 3)
    res.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case s: QueryStageExec        => allScans(s.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other                    => other.children.flatMap(allScans) ++ other.subqueries.flatMap(allScans)
    }
    val scanned = allScans(res.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("lsh_idx_mp")))
      .map(_.selectedPartitions.partitionCount)
      .sum
    assert(scanned <= 6, s"expected <= tables x (probes+1) = 6 pruned partitions, scanned $scanned")
  }

  test("generational LSH buckets: frozen-plane append, replay idempotence, cross-gen serving") {
    val emb  = Tables(spark, dir).embeddings
    val old  = emb.where(col("vec_id") % 3 =!= 0)
    val b1   = emb.where(col("vec_id") % 3 === 0)
    val idx  = java.nio.file.Files.createTempDirectory("lsh_gen").toString
    AnnBuckets.writeBucketsGen(old, "vec_id", "embedding", idx, nBits = 4, nTables = 2,
      nProbes = 0, srcBatch = 0L)
    AnnBuckets.appendToBuckets(idx, b1, "vec_id", "embedding", srcBatch = 1L)

    def content() = spark.read.parquet(s"$idx/buckets")
      .select(col("tb").cast("int"), col("vec_id").cast("long"), col("src_batch").cast("long"))
      .as[(Int, Long, Long)].collect().toSeq.sorted
    val afterFirst = content()
    // generation 1 holds exactly the appended batch, bucketed under the
    // FROZEN planes (planes are seed-derived — appends are exact forever)
    assert(afterFirst.filter(_._3 == 1L).map(_._2).toSet ==
      b1.select(col("vec_id").cast("long")).as[Long].collect().toSet)
    // replay is idempotent (dynamic overwrite of the batch's partitions)
    AnnBuckets.appendToBuckets(idx, b1, "vec_id", "embedding", srcBatch = 1L)
    assert(content() == afterFirst, "batch replay must be idempotent")

    // a two-generation index serves EXACTLY like the in-memory plan over
    // the union corpus (same planes, same ranking)
    val fromIndex = AnnBuckets.approxTopKIndexed(idx, emb, "vec_id", "embedding", k = 5)
    val inMemory  = AnnBuckets.approxTopK(emb, "vec_id", "embedding", k = 5,
      nBits = 4, nTables = 2, nProbes = 0)
    TestSpark.assertFrameEqual(fromIndex, inMemory)

    // single-generation writeBuckets output is refused with the rebuild path
    val plainIdx = java.nio.file.Files.createTempDirectory("lsh_plain_guard").toString
    AnnBuckets.writeBuckets(emb, "vec_id", "embedding", plainIdx, nBits = 4, nTables = 2,
      nProbes = 0)
    val e = intercept[IllegalArgumentException] {
      AnnBuckets.appendToBuckets(plainIdx, b1, "vec_id", "embedding", srcBatch = 1L)
    }
    assert(e.getMessage.contains("writeBucketsGen"), e.getMessage)

    // occupancy monitor: rows = corpus x tables, mean = rows / buckets
    val occ = AnnBuckets.bucketOccupancy(idx, spark).collect()(0)
    assert(occ.getAs[Long]("rows") == emb.count() * 2)
    assert(occ.getAs[Long]("max_occ") >= occ.getAs[Double]("mean_occ").toLong)
  }

  test("generational IVF cells: frozen-centroid append, replay idempotence, cross-gen serving") {
    import graft.llm.IvfIndex
    val emb = Tables(spark, dir).embeddings
    val old = emb.where(col("vec_id") % 3 =!= 0)
    val b1  = emb.where(col("vec_id") % 3 === 0)
    val idx = java.nio.file.Files.createTempDirectory("ivf_gen").toString
    IvfIndex.writeIndexGen(old, "vec_id", "embedding", idx, nCells = 8, srcBatch = 0L)
    IvfIndex.appendToIndex(idx, b1, "vec_id", "embedding", srcBatch = 1L)

    def content() = spark.read.parquet(s"$idx/cells")
      .select(col("cell").cast("int"), col("vec_id").cast("long"), col("src_batch").cast("long"))
      .as[(Int, Long, Long)].collect().toSeq.sorted
    val afterFirst = content()
    assert(afterFirst.filter(_._3 == 1L).map(_._2).toSet ==
      b1.select(col("vec_id").cast("long")).as[Long].collect().toSet)

    // the appended generation's cells match a driver-side replay of the
    // FROZEN sidecar argmin (distTo arithmetic: ‖c‖² − Σ eᵢ·(2cᵢ) in
    // index order, strict-< so ties keep the smaller cell)
    val cents = spark.read.parquet(s"$idx/centroids").orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray)
    def cellOf(v: Array[Double]): Int = {
      var best = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cen = cents(c)
        var c2 = 0.0
        var i = 0
        while (i < cen.length) { c2 += cen(i) * cen(i); i += 1 }
        var dp = 0.0
        i = 0
        while (i < cen.length) { dp += v(i) * (cen(i) * 2.0); i += 1 }
        val d = c2 - dp
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val b1Vecs = b1.select(col("vec_id").cast("long"),
      col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    afterFirst.filter(_._3 == 1L).foreach { case (cell, id, _) =>
      assert(cell == cellOf(b1Vecs(id)), s"appended row $id assigned to $cell, expected ${cellOf(b1Vecs(id))}")
    }

    // replay is idempotent (dynamic overwrite of the batch's partitions)
    IvfIndex.appendToIndex(idx, b1, "vec_id", "embedding", srcBatch = 1L)
    assert(content() == afterFirst, "batch replay must be idempotent")

    // generation structure is serving-irrelevant: the same corpus split
    // across different generation shapes serves identically (same
    // deterministic bootstrap training → same frozen quantizer)
    val idxB = java.nio.file.Files.createTempDirectory("ivf_gen_b").toString
    IvfIndex.writeIndexGen(old, "vec_id", "embedding", idxB, nCells = 8, srcBatch = 0L)
    IvfIndex.appendToIndex(idxB, b1.where(col("vec_id") % 2 === 0), "vec_id", "embedding", 1L)
    IvfIndex.appendToIndex(idxB, b1.where(col("vec_id") % 2 =!= 0), "vec_id", "embedding", 2L)
    TestSpark.assertFrameEqual(
      IvfIndex.approxTopKIndexed(idx, emb, "vec_id", "embedding", k = 5),
      IvfIndex.approxTopKIndexed(idxB, emb, "vec_id", "embedding", k = 5))

    // single-generation writeIndex output is refused with the rebuild path
    val plainIdx = java.nio.file.Files.createTempDirectory("ivf_plain_guard").toString
    IvfIndex.writeIndex(emb, "vec_id", "embedding", plainIdx, nCells = 8)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.appendToIndex(plainIdx, b1, "vec_id", "embedding", srcBatch = 1L)
    }
    assert(e.getMessage.contains("writeIndexGen"), e.getMessage)

    // occupancy monitor: rows = corpus, mean = rows / occupied cells
    val occ = IvfIndex.cellOccupancy(idx, spark).collect()(0)
    assert(occ.getAs[Long]("rows") == emb.count())
    assert(occ.getAs[Long]("max_occ") >= occ.getAs[Double]("mean_occ").toLong)
  }

  test("LSH rebuild crash recovery: a lost meta write is repaired from the marker, not " +
    "rebuilt from a fraction of the corpus") {
    import graft.llm.AnnBuckets
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src)
      val d = java.nio.file.Paths.get(dst)
      java.nio.file.Files.walk(s).forEach { p =>
        val t = d.resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    def deleteDir(dir: String): Unit = {
      val p = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(x => { java.nio.file.Files.delete(x); () })
    }
    val emb = Tables(spark, dir).embeddings
    val idx = java.nio.file.Files.createTempDirectory("lsh_crash").toString
    AnnBuckets.writeBucketsGen(emb.where(col("vec_id") < 100), "vec_id", "embedding", idx)
    AnnBuckets.appendToBuckets(idx, emb.where(col("vec_id") >= 100), "vec_id", "embedding", 1L)
    val metaBackup = java.nio.file.Files.createTempDirectory("lsh_crash_meta").toString
    copyDir(s"$idx/meta", metaBackup)
    val m0 = AnnBuckets.readBucketsMeta(idx, spark)

    // complete rebuild, then simulate the crash window: the buckets swap
    // landed but the meta overwrite was lost
    val m1 = AnnBuckets.rebuildBucketsGen(idx, spark, targetBucketRows = 16)
    assert(m1.nBits > m0.nBits, "fixture must actually resize for the test to mean anything")
    deleteDir(s"$idx/meta")
    copyDir(metaBackup, s"$idx/meta")
    assert(AnnBuckets.readBucketsMeta(idx, spark).geomId == m0.geomId)

    // every read fails fast on the mixed state
    val e = intercept[IllegalArgumentException] {
      AnnBuckets.approxTopKIndexed(idx, emb.limit(1), "vec_id", "embedding", k = 3).collect()
    }
    assert(e.getMessage.contains("mid-rebuild"), e.getMessage)

    // the recovery path: rebuildBucketsGen repairs the interrupted swap
    // from the self-describing marker (NOT the stale meta's bit count,
    // which would read a fraction of the new layout as "the corpus"),
    // then performs the requested rebuild — full membership survives
    val m2 = AnnBuckets.rebuildBucketsGen(idx, spark, targetBucketRows = 16)
    assert(m2.epoch == m1.epoch + 1, s"repair must adopt the marker epoch first: ${m2.epoch}")
    val rows = spark.read.parquet(s"$idx/buckets")
    assert(rows.select(col("vec_id").cast("long")).distinct().count() == emb.count(),
      "crash recovery must preserve every vector — a stale-meta corpus read would not")
    assert(rows.count() == emb.count() * m2.nTables)
    assert(AnnBuckets.readGeomMarker(s"$idx/buckets", spark) == m2.geomId)
    // and serving works again
    assert(AnnBuckets.approxTopKIndexed(idx, emb.limit(2), "vec_id", "embedding", k = 3)
      .count() > 0)
  }

  test("LSH bootstrap mixed states fail fast: stamped meta without a marker, meta-first window") {
    import graft.llm.AnnBuckets
    val emb = Tables(spark, dir).embeddings
    val fs = new org.apache.hadoop.fs.Path("/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)

    // state 1: buckets overwrite landed but the marker write was lost —
    // the old buckets-first order left this state SILENTLY passing the
    // geometry check (marker missing → check skipped, ADVICE r15 #2)
    val idx = java.nio.file.Files.createTempDirectory("lsh_mixed1").toString
    AnnBuckets.writeBucketsGen(emb, "vec_id", "embedding", idx,
      nBits = 4, nTables = 2, nProbes = 0)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/buckets", "_geom"), false)
    val e1 = intercept[IllegalArgumentException] {
      AnnBuckets.approxTopKIndexed(idx, emb.limit(1), "vec_id", "embedding", k = 3).collect()
    }
    assert(e1.getMessage.contains("no _geom marker"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      AnnBuckets.appendToBuckets(idx, emb.limit(1), "vec_id", "embedding", srcBatch = 9L)
    }
    assert(e2.getMessage.contains("rebuilt since"), e2.getMessage)
    // the documented recovery — re-bootstrap — restores serving
    AnnBuckets.writeBucketsGen(emb, "vec_id", "embedding", idx,
      nBits = 4, nTables = 2, nProbes = 0)
    assert(AnnBuckets.approxTopKIndexed(idx, emb.limit(2), "vec_id", "embedding", k = 3)
      .count() > 0)

    // state 2: the meta-first window a re-bootstrap over a LIVE index
    // exposes — new stamped meta, old buckets + old marker. Manufacture
    // it by pairing a differently-sized index's meta with this one's
    // buckets; every read must mismatch-fail, never bucket queries with
    // the new sizing against the old layout
    val idx2 = java.nio.file.Files.createTempDirectory("lsh_mixed2").toString
    AnnBuckets.writeBucketsGen(emb, "vec_id", "embedding", idx2,
      nBits = 5, nTables = 2, nProbes = 0)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/meta"), true)
    require(fs.rename(
      new org.apache.hadoop.fs.Path(s"$idx2/meta"),
      new org.apache.hadoop.fs.Path(s"$idx/meta")))
    val e3 = intercept[IllegalArgumentException] {
      AnnBuckets.approxTopKIndexed(idx, emb.limit(1), "vec_id", "embedding", k = 3).collect()
    }
    assert(e3.getMessage.contains("mid-rebuild"), e3.getMessage)
  }

  test("LSH rebuild crash in the delete->rename gap: entry repair finishes the swap") {
    import graft.llm.AnnBuckets
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src)
      val d = java.nio.file.Paths.get(dst)
      java.nio.file.Files.walk(s).forEach { p =>
        val t = d.resolve(s.relativize(p))
        if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val emb = Tables(spark, dir).embeddings
    val idx = java.nio.file.Files.createTempDirectory("lsh_gap").toString
    AnnBuckets.writeBucketsGen(emb.where(col("vec_id") < 100), "vec_id", "embedding", idx)
    AnnBuckets.appendToBuckets(idx, emb.where(col("vec_id") >= 100), "vec_id", "embedding", 1L)
    val metaBackup = java.nio.file.Files.createTempDirectory("lsh_gap_meta").toString
    copyDir(s"$idx/meta", metaBackup)
    val m1 = AnnBuckets.rebuildBucketsGen(idx, spark, targetBucketRows = 16)

    // manufacture the gap state: the rebuild wrote its COMPLETE stamped
    // table to the temp sibling and deleted the live dir, then died
    // before the rename — meta still holds the PRE-rebuild sizing
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    require(fs.rename(
      new org.apache.hadoop.fs.Path(s"$idx/buckets"),
      new org.apache.hadoop.fs.Path(s"$idx/buckets.rebuild")))
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/meta"), true)
    copyDir(metaBackup, s"$idx/meta")

    // mixed state fails fast on every read path (no buckets table at all)
    intercept[Exception] {
      AnnBuckets.approxTopKIndexed(idx, emb.limit(1), "vec_id", "embedding", k = 3).collect()
    }
    // re-running rebuildBucketsGen — the documented recovery — first
    // finishes the interrupted swap from the temp table's marker, then
    // performs the requested rebuild; full membership survives
    val m2 = AnnBuckets.rebuildBucketsGen(idx, spark, targetBucketRows = 16)
    assert(m2.epoch == m1.epoch + 1, s"repair must adopt the marker epoch first: ${m2.epoch}")
    val rows = spark.read.parquet(s"$idx/buckets")
    assert(rows.select(col("vec_id").cast("long")).distinct().count() == emb.count(),
      "swap repair must preserve every vector")
    assert(rows.count() == emb.count() * m2.nTables)
    assert(AnnBuckets.readGeomMarker(s"$idx/buckets", spark) == m2.geomId)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/buckets.rebuild")),
      "the finished swap must leave no temp sibling behind")
    assert(AnnBuckets.approxTopKIndexed(idx, emb.limit(2), "vec_id", "embedding", k = 3)
      .count() > 0)
  }

  test("minSim pushdown commutes with the cross-table dedup, plain and probed") {
    import graft.functions.GraftFunctions.dot
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    // the pushdown filters per table BEFORE the dedup shuffle; because
    // cos_sim is functionally determined by the pair, the surviving set
    // must be IDENTICAL to filtering after
    TestSpark.assertFrameEqual(
      AnnBuckets.candidatePairs(e, 4, 64, 2, 42L).where(col("cos_sim") >= 0.4)
        .orderBy("a_id", "b_id"),
      AnnBuckets.candidatePairs(e, 4, 64, 2, 42L, minSim = Some(0.4))
        .orderBy("a_id", "b_id"))
    TestSpark.assertFrameEqual(
      AnnBuckets.candidatePairsMultiProbe(e, 4, 64, 2, 2, 42L).where(col("cos_sim") >= 0.4)
        .orderBy("a_id", "b_id"),
      AnnBuckets.candidatePairsMultiProbe(e, 4, 64, 2, 2, 42L, minSim = Some(0.4))
        .orderBy("a_id", "b_id"))
  }

  test("multi-probe path tolerates null embeddings like the plain path (ADVICE r14)") {
    // one malformed row must not kill the probesFrame kernel: the plain
    // nProbes=0 path degrades it (null cosine never ranks/passes tau),
    // so nProbes>0 must drop it, not NPE
    val dirty = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .unionByName(Seq((99999L, null: Seq[Double])).toDF("vec_id", "embedding"))
    val probed = AnnBuckets
      .approxTopK(dirty, "vec_id", "embedding", k = 3, nBits = 4, nTables = 2, nProbes = 2)
    assert(probed.count() > 0)
    // parity with the plain path's degradation: the null row may surface
    // (it buckets to 0 on the non-probed join side, as at nProbes = 0)
    // but can never carry a real score
    val touched = probed.where(col("a_id") === 99999L || col("b_id") === 99999L)
    assert(touched.where(col("cos_sim").isNotNull).count() == 0,
      "the null-embedding row must never score a real cosine")
    // the SemDedup consumer enables probing too — same tolerance
    val kf = graft.llm.SemDedup
      .keepFlagsApprox(dirty, "vec_id", "embedding", tau = 0.8,
        nBits = 4, nTables = 2, nProbes = 2)
    assert(kf.count() > 0)
  }

  test("approxTopKIndexed fails fast past the probe-set bound, naming the full-corpus path") {
    val emb = Tables(spark, dir).embeddings
    val idx = java.nio.file.Files.createTempDirectory("lsh_idx_guard").toString
    AnnBuckets.writeBuckets(emb, "vec_id", "embedding", idx, nBits = 4, nTables = 2)
    val e = intercept[IllegalArgumentException] {
      AnnBuckets.approxTopKIndexed(idx, emb, "vec_id", "embedding", k = 3, maxProbedBuckets = 2)
    }
    assert(e.getMessage.contains("approxTopK"), s"guard must name the scale path: ${e.getMessage}")
    // a bounded batch at the default bound is untouched
    assert(AnnBuckets.approxTopKIndexed(idx, emb.limit(2), "vec_id", "embedding", k = 3)
      .count() > 0)
  }

  test("IVF centroids are deterministic and cover all cells") {
    val c1 = graft.llm.IvfIndex.trainCentroids(
      Tables(spark, dir).embeddings, "vec_id", "embedding", k = 8)
    val c2 = graft.llm.IvfIndex.trainCentroids(
      Tables(spark, dir).embeddings, "vec_id", "embedding", k = 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(c1.length == 8 && c1.forall(_.length == 64))
  }

  test("ANN buckets are deterministic for a fixed seed") {
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val b1 = AnnBuckets.withBucket(e, "emb").select("vec_id", "bucket").collect().toSet
    val b2 = AnnBuckets.withBucket(e, "emb").select("vec_id", "bucket").collect().toSet
    assert(b1 == b2)
  }

  test("multimodal: decode yields normalized fixed-width features for every payload") {
    val media = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val feats = Multimodal.decodeFeatures(media, dims = 16)
    val rows  = feats.select("features").as[Seq[Double]].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.size == 16))
    rows.foreach(h => assert(math.abs(h.sum - 1.0) < 1e-9)) // normalized histogram
  }

  test("multimodal: real PNG payload decodes to a luminance histogram, not the byte fallback") {
    val png = Multimodal.samplePngBytes
    val h1  = Multimodal.decodeOne(png, 16).toSeq
    val h2  = Multimodal.decodeOne(png, 16).toSeq
    assert(h1 == h2) // deterministic
    assert(math.abs(h1.sum - 1.0) < 1e-9)
    assert(h1 != Multimodal.byteHistogram(png, 16).toSeq) // real pixels, not container bytes
    // 8×8 gradient → 64 pixels spread over several luminance bins
    assert(h1.count(_ > 0.0) > 2)
  }

  test("multimodal: real WAV payload decodes to an amplitude histogram, not the byte fallback") {
    val wav = Multimodal.sampleWavBytes
    val h1  = Multimodal.decodeOne(wav, 16).toSeq
    assert(h1 == Multimodal.decodeOne(wav, 16).toSeq)
    assert(math.abs(h1.sum - 1.0) < 1e-9)
    assert(h1 != Multimodal.byteHistogram(wav, 16).toSeq)
    // a ±0.5-amplitude sine occupies the central half of the range and is
    // roughly symmetric around it; the extreme bins stay empty
    assert(h1.head == 0.0 && h1.last == 0.0)
    assert(math.abs(h1.take(8).sum - h1.drop(8).sum) < 0.1)
  }

  test("multimodal: malformed WAV chunk sizes terminate and fall back") {
    // RIFF/WAVE header followed by a chunk with size = -8: the naive walk
    // would advance by 0 bytes forever
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("RIFF".getBytes); bos.write(Array[Byte](36, 0, 0, 0)); bos.write("WAVE".getBytes)
    bos.write("junk".getBytes); bos.write(Array[Byte](-8, -1, -1, -1)) // le32 = -8
    bos.write(new Array[Byte](32))
    val bad = bos.toByteArray
    val h   = Multimodal.decodeOne(bad, 16).toSeq // must return, not hang
    assert(h == Multimodal.byteHistogram(bad, 16).toSeq)
    // corrupt DATA chunk (valid fmt, negative declared size): must fall
    // back, not produce an all-zeros non-histogram
    val b2 = new java.io.ByteArrayOutputStream()
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    b2.write("RIFF".getBytes); b2.write(le32(100)); b2.write("WAVE".getBytes)
    b2.write("fmt ".getBytes); b2.write(le32(16)); b2.write(le16(1)); b2.write(le16(1))
    b2.write(le32(8000)); b2.write(le32(16000)); b2.write(le16(2)); b2.write(le16(16))
    b2.write("data".getBytes); b2.write(le32(-4)); b2.write(new Array[Byte](16))
    val bad2 = b2.toByteArray
    val h2   = Multimodal.decodeOne(bad2, 16).toSeq
    assert(h2 == Multimodal.byteHistogram(bad2, 16).toSeq)
    assert(math.abs(h2.sum - 1.0) < 1e-9) // still a normalized histogram
  }

  test("multimodal: demo media table routes real payloads through decodeFeatures") {
    val media = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val feats = Multimodal.decodeFeatures(media, dims = 16)
    val byId  = feats.as[(Long, Seq[Double])].collect().toMap
    assert(byId(3L) == Multimodal.decodeOne(Multimodal.samplePngBytes, 16).toSeq)
    assert(byId(1L) == Multimodal.decodeOne(Multimodal.sampleWavBytes, 16).toSeq)
    assert(byId(3L) != Multimodal.byteHistogram(Multimodal.samplePngBytes, 16).toSeq)
  }

  test("multimodal: frame sampling emits n frames per video item") {
    val media  = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val nVideo = media.where(col("kind") === "video").count()
    val frames = Multimodal.frameSample(media, nFrames = 4, frameLen = 32)
    assert(frames.count() == nVideo * 4)
    assert(frames.columns.toSeq == Seq("media_id", "meta", "frame_idx", "frame_bytes"))
  }

  test("multimodal: resize folds feature bins") {
    val media   = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val feats   = Multimodal.decodeFeatures(media, dims = 16)
    val resized = Multimodal.resizeFeatures(feats, outDims = 4)
    val rows    = resized.select("features").as[Seq[Double]].collect()
    assert(rows.forall(_.size == 4))
    rows.foreach(h => assert(math.abs(h.sum - 1.0) < 1e-9))
  }

  test("int8 quantization: codes bounded, extremes hit ±127, zero vector safe") {
    import graft.llm.Quantize
    val df = Seq(
      (1L, Seq(0.5, -1.0, 0.25, 1.0)), // max_abs 1.0 → scale 127
      (2L, Seq(0.0, 0.0, 0.0, 0.0))    // zero vector
    ).toDF("vec_id", "emb")
    val codes = df.select(col("vec_id"), Quantize.int8Codes(col("emb")).as("q"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(1L) == Seq(64, -127, 32, 127)) // round(0.5·127)=64, round(0.25·127)=32
    assert(codes(2L) == Seq(0, 0, 0, 0))
    val norm = df.where(col("vec_id") === 1)
      .select(Quantize.l2Normalize(col("emb")).as("n")).as[Seq[Double]].collect().head
    assert(math.abs(norm.map(x => x * x).sum - 1.0) < 1e-12)
    // bulk variants agree with the Column forms (incl. the zero vector)
    val bulk = Quantize.l2NormalizeDf(df, "emb").orderBy("vec_id")
      .select("emb").as[Seq[Double]].collect()
    assert(bulk(0) == norm)
    assert(bulk(1) == Seq(0.0, 0.0, 0.0, 0.0))
    val bulkCodes = Quantize.int8CodesDf(df, "emb").orderBy("vec_id")
      .select("emb").as[Seq[Int]].collect()
    assert(bulkCodes(0) == codes(1L))
    assert(bulkCodes(1) == codes(2L))
    val summary = Quantize.int8Summary(df, "vec_id", "emb").orderBy("vec_id").collect()
    assert(summary(0).getLong(3) == 64L - 127 + 32 + 127) // q_sum exact
    assert(summary(1).getLong(3) == 0L && summary(1).getDouble(4) == 0.0)
  }

  test("media dedup maps the planted duplicate image to its survivor, nothing else") {
    val out = graft.multimodal.MultimodalQueries.q62MediaNeardup.run(spark, dir)
      .as[(Long, Long)].collect().toSeq
    // the planted duplicate: ids 3 and 6 carry the same PNG → identical
    // luminance histograms → 6 maps to survivor 3
    assert(out.contains((6L, 3L)), s"planted duplicate not found: $out")
    // survivor is the group minimum, so every mapping points downward
    out.foreach { case (dup, surv) => assert(surv < dup) }
    // the WAV row (id 1) and every distinct-text row has unique features:
    // on this fixture the planted pair is the ONLY duplicate
    assert(out == Seq((6L, 3L)), s"unexpected extra duplicates: $out")
  }

  test("persisted media features: decode-once accounting, indexed parity, incremental ingest") {
    val media = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val n     = media.count()
    val fDir  = java.nio.file.Files.createTempDirectory("media_feats").toString
    val iDir  = java.nio.file.Files.createTempDirectory("media_lsh").toString

    // build: every payload decoded EXACTLY once
    Multimodal.decodeCount.set(0L)
    Multimodal.writeFeaturesGen(media, fDir)
    assert(Multimodal.decodeCount.get() == n,
      s"feature build must decode each row once: ${Multimodal.decodeCount.get()} vs $n")
    // index build + N searches over the persisted features: ZERO decodes
    Multimodal.writeMediaIndex(fDir, iDir, spark)
    val s1 = Multimodal.mediaNearDupIndexed(fDir, spark, tau = 0.9).collect()
    val s2 = Multimodal.mediaNearDupIndexed(fDir, spark, tau = 0.9).collect()
    assert(s1.nonEmpty && s1.length == s2.length)
    assert(Multimodal.decodeCount.get() == n,
      "searches over the persisted features must not touch the payloads — " +
        s"decode count moved to ${Multimodal.decodeCount.get()} (expected $n)")

    // parity: the persisted path IS mediaNearDupApprox minus the decode —
    // and the in-memory path, Auto-sized (default args resolve bits AND
    // tables from a corpus count), decodes each payload EXACTLY once per
    // one-shot search: the r15 Auto path counted the un-pinned decode
    // output (one full extra decode) and the candidate kernel's
    // per-table scans re-decoded again (VERDICT r15 "what's wrong" #1)
    Multimodal.decodeCount.set(0L)
    TestSpark.assertFrameEqual(
      Multimodal.mediaNearDupIndexed(fDir, spark, tau = 0.9).orderBy("a_id", "b_id"),
      Multimodal.mediaNearDupApprox(media, tau = 0.9).orderBy("a_id", "b_id"))
    assert(Multimodal.decodeCount.get() == n,
      "a one-shot Auto-sized in-memory search must decode each payload exactly once: " +
        s"${Multimodal.decodeCount.get()} vs $n")

    // incremental ingest: the new batch is decoded once, and the index
    // append reads the just-persisted vectors back instead of re-decoding
    val newMedia = media
      .where(col("media_id") < 50)
      .select((col("media_id") + 10000L).as("media_id"), col("kind"), col("content"), col("meta"))
    val batchN = newMedia.count()
    Multimodal.decodeCount.set(0L)
    Multimodal.ingestMedia(fDir, iDir, newMedia, srcBatch = 1L)
    assert(Multimodal.decodeCount.get() == batchN,
      s"ingest must decode only the new batch once: ${Multimodal.decodeCount.get()} vs $batchN")
    // replay is idempotent on BOTH tables
    val featRows   = spark.read.parquet(s"$fDir/features").count()
    val bucketRows = spark.read.parquet(s"$iDir/buckets").count()
    Multimodal.ingestMedia(fDir, iDir, newMedia, srcBatch = 1L)
    assert(spark.read.parquet(s"$fDir/features").count() == featRows)
    assert(spark.read.parquet(s"$iDir/buckets").count() == bucketRows)

    // indexed search finds the ingested copies: each query row is a
    // byte-identical copy of an indexed row, so its top hit is exact
    val hits = Multimodal
      .searchMediaIndexed(iDir, newMedia.limit(3), k = 3)
      .where(col("rn") === 1)
      .collect()
    assert(hits.length == 3)
    hits.foreach(h => assert(h.getAs[Double]("cos_sim") == 1.0,
      s"top hit for an exact copy must score 1.0: $h"))
  }

  test("media index lifecycle: non-default width round-trips, rebuild loop applies") {
    import graft.llm.AnnBuckets
    val media = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    val fDir  = java.nio.file.Files.createTempDirectory("media_feats32").toString
    val iDir  = java.nio.file.Files.createTempDirectory("media_lsh32").toString
    // NON-default feature width: the search must decode queries at the
    // INDEX's recorded width (a hardcoded 16 here would truncate the
    // hyperplane dots and silently miss the exact copy — the dims-from-
    // meta regression this test pins)
    Multimodal.writeFeaturesGen(media, fDir, dims = 32)
    Multimodal.writeMediaIndex(fDir, iDir, spark)
    assert(AnnBuckets.readBucketsMeta(iDir, spark).dims == 32)
    val copies = media.where(col("media_id") < 3)
      .select((col("media_id") + 5000L).as("media_id"), col("kind"), col("content"), col("meta"))
    val hits = Multimodal.searchMediaIndexed(iDir, copies, k = 2).where(col("rn") === 1).collect()
    assert(hits.nonEmpty)
    hits.foreach(h => assert(h.getAs[Double]("cos_sim") == 1.0,
      s"exact copy must hit 1.0 under the index's recorded width: $h"))
    // width mismatch between a features table and an index fails fast
    val fDir16 = java.nio.file.Files.createTempDirectory("media_feats16").toString
    Multimodal.writeFeaturesGen(media, fDir16, dims = 16)
    val e = intercept[IllegalArgumentException] {
      Multimodal.ingestMedia(fDir16, iDir, copies, srcBatch = 1L)
    }
    assert(e.getMessage.contains("width mismatch"), e.getMessage)

    // the media index is a writeBucketsGen index, so the r15 rebuild loop
    // applies to it unchanged: rebuild, then serve parity survives
    val before = Multimodal.searchMediaIndexed(iDir, copies, k = 2)
      .select("a_id", "b_id", "rn").as[(Long, Long, Int)].collect().toSet
    val m1 = AnnBuckets.rebuildBucketsGen(iDir, spark)
    assert(m1.epoch == 1L && m1.dims == 32)
    val after = Multimodal.searchMediaIndexed(iDir, copies, k = 2)
      .select("a_id", "b_id", "rn").as[(Long, Long, Int)].collect().toSet
    assert(after == before, "a rebuild must not change what a probe read returns here " +
      "(same corpus, auto sizing at the same count)")
  }

  /** Synthetic near-dup media fixture for the default-args recall gate:
    * `groups` base payloads (concentrated-luminance PNGs / fixed-
    * amplitude WAV sines), each with `variants` small perturbations, so
    * within-group feature cosine is high and cross-group low. Ground
    * truth is EXACT cosine over the decoded features — the gate measures
    * the ANN candidate stage, not the generator's intent.
    */
  private def nearDupMediaFixture(pngGroups: Int, wavGroups: Int, variants: Int) = {
    def pngBytes(seed: Int, variant: Int): Array[Byte] = {
      val rnd    = new java.util.Random(seed.toLong)
      val center = 30 + rnd.nextInt(200)
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var p = 0
      while (p < 64) {
        val v = math.max(0, math.min(255, center + rnd.nextInt(41) - 20 + variant * 3))
        img.setRGB(p % 8, p / 8, (v << 16) | (v << 8) | v)
        p += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def wavBytes(seed: Int, variant: Int): Array[Byte] = {
      val rnd  = new java.util.Random(seed.toLong)
      val amp  = 4000 + rnd.nextInt(24000)
      val freq = 150 + rnd.nextInt(700)
      val n    = 400
      val data = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = (math.sin(2 * math.Pi * freq * i / 8000.0) * amp * (1.0 - 0.02 * variant)).toInt
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      def w(b: Array[Byte]): Unit = bos.write(b, 0, b.length)
      def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
      def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
      w("RIFF".getBytes); w(le32(36 + data.length)); w("WAVE".getBytes)
      w("fmt ".getBytes); w(le32(16)); w(le16(1)); w(le16(1))
      w(le32(8000)); w(le32(16000)); w(le16(2)); w(le16(16))
      w("data".getBytes); w(le32(data.length)); w(data)
      bos.toByteArray
    }
    val rows = (for {
      g <- 0 until pngGroups
      v <- 0 until variants
    } yield ((g * variants + v).toLong, pngBytes(7000 + g, v))) ++ (for {
      g <- 0 until wavGroups
      v <- 0 until variants
    } yield ((10000 + g * variants + v).toLong, wavBytes(8000 + g, v)))
    rows
  }

  test("media recall gate: default-args mediaNearDupApprox holds the floor on planted near-dups") {
    val rows = nearDupMediaFixture(pngGroups = 25, wavGroups = 15, variants = 4)
    val media = rows.toDF("media_id", "content")
    val tau = 0.9

    // exact ground truth from the decoded features themselves
    val feats = rows.map { case (id, bytes) => id -> Multimodal.decodeOne(bytes, 16) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dp / math.sqrt(na * nb)
    }
    val exact = (for {
      (ia, fa) <- feats
      (ib, fb) <- feats
      if ia < ib && math.rint(cos(fa, fb) * 1e6) / 1e6 >= tau
    } yield (ia, ib)).toSet
    assert(exact.size > 50, s"fixture must plant real near-dup mass, got ${exact.size} pairs")
    assert(exact.size < rows.size * (rows.size - 1) / 4,
      s"fixture must not be all-pairs-similar (the q62 caveat), got ${exact.size}")

    // the shipped DEFAULTS (probed-auto sizing) must hold the floor
    val approx = Multimodal.mediaNearDupApprox(media, tau)
      .select(col("a_id").cast("long"), col("b_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exact),
      "every emitted pair carries its exact cosine, so precision is structural — a violation " +
        s"means the threshold stage broke: ${(approx diff exact).take(5)}")
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"media near-dup default-args recall: $recall%.3f over ${exact.size} exact pairs")
    assert(recall >= 0.80,
      f"default-args media near-dup recall $recall%.3f under floor 0.80 — a default/sizing " +
        "change degraded media recall (the embedding floors' gate, applied to media geometry)")
  }

  test("media ANN search: decoded features ride the LSH path, planted duplicate surfaces") {
    val media = Multimodal.mediaFromDocuments(Tables(spark, dir).documents)
    // the production bridge: decode → histogram features → LSH candidates
    // → threshold pairs. The planted duplicate PNG (ids 3 and 6 share the
    // same payload) has IDENTICAL features, so it collides in every table
    // and scores cosine 1.0 — it must surface at any tau
    val pairs = Multimodal
      .mediaNearDupApprox(media, tau = 0.999999, dims = 16, nBits = 4, nTables = 2, nProbes = 1)
      .select("a_id", "b_id")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(pairs.contains((3L, 6L)), s"planted duplicate must surface through the ANN path: $pairs")
    // the declared q138 plumbing returns hash-stable rows at this sf
    val q138 = MultimodalQueries.q138MediaAnnSearch.run(spark, dir)
    assert(q138.count() > 0, "q138 must produce survivor mappings on the fixture")
    assert(q138.columns.toSeq == Seq("dup_id", "survivor_id", "max_sim"))
  }

  test("approx_count_distinct stays inside the HLL error envelope") {
    val li = Tables(spark, dir).lineitem
    val r = li
      .agg(
        approx_count_distinct("l_partkey").as("approx"),
        countDistinct("l_partkey").as("exact"))
      .collect()(0)
    val rel = math.abs(r.getLong(0).toDouble - r.getLong(1)) / r.getLong(1)
    assert(rel < 0.1, s"relative error $rel")
  }

  test("approx_percentile stays inside the Greenwald-Khanna rank-error envelope") {
    // q133's accuracy contract: GK with accuracy a guarantees the returned
    // value's RANK is within n/a of the target rank. Check per group by
    // counting how many values sit at or below the estimate.
    val li  = Tables(spark, dir).lineitem
    val acc = 10000
    val est = li
      .groupBy("l_returnflag")
      .agg(expr(s"approx_percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D), $acc)").as("ps"),
        count(lit(1)).as("n"))
      .collect()
    est.foreach { r =>
      val flag = r.getString(0)
      val ps   = r.getSeq[Double](1)
      val n    = r.getLong(2).toDouble
      val tol  = n / acc + 1
      Seq(0.25, 0.50, 0.75).zip(ps).foreach { case (q, v) =>
        val rank = li
          .where(col("l_returnflag") === flag && col("l_extendedprice") <= v)
          .count()
          .toDouble
        assert(math.abs(rank - q * n) <= tol,
          s"group $flag q=$q: estimate $v has rank $rank, target ${q * n} (n=$n, tol=$tol)")
      }
    }
  }
}
