package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-level wall-clock breakdown of q134's banded near-dup ingest
  * pipeline (r16 measure-first): bootstrap write, batch-0 ingest, survivor
  * append, batch-1 ingest, final force — each timed separately so the
  * optimization target is the measured stage, not a guess. Repeats the
  * whole pipeline `rounds` times (fresh temp dir per round) and prints
  * per-stage times.
  */
object BandedIngestProbe {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.{Dedup, Sampling}

    def force(df: DataFrame): Unit = {
      val _ = df.queryExecution.toRdd.mapPartitions { it =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n)
      }.sum()
    }
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    for (r <- 1 to rounds) {
      val docs   = graft.core.Tables(spark, sfDir).documents.where(col("text").isNotNull)
      val bucket = Sampling.hashBucket(col("doc_id"), "binc")
      val old    = docs.where(bucket < "99").select("doc_id", "text")
      val b0     = docs.where(bucket >= "99" && bucket < "cc").select("doc_id", "text")
      val b1     = docs.where(bucket >= "cc").select("doc_id", "text")
      val mut0 = old.where(Sampling.hashBucket(col("doc_id"), "bclone0") < "33")
        .select((col("doc_id") + 2000000L).as("doc_id"), concat(col("text"), lit(" xk1")).as("text"))
      val mut1a = old.where(Sampling.hashBucket(col("doc_id"), "bclone1") < "22")
        .select((col("doc_id") + 3000000L).as("doc_id"), concat(col("text"), lit(" xk2")).as("text"))
      val mut1b = b0.where(Sampling.hashBucket(col("doc_id"), "bclone2") < "55")
        .select((col("doc_id") + 4000000L).as("doc_id"), concat(col("text"), lit(" xk3")).as("text"))
      val batch0 = b0.unionByName(mut0)
      val batch1 = b1.unionByName(mut1a).unionByName(mut1b)
      val ixDir  = graft.core.Scratch.tempDir("graft_probe_banded")

      val (_, tBoot) = t(Dedup.writeBandedNearDupIndex(
        old, "doc_id", "text", ixDir, bands = 4, rowsPerBand = 4,
        family = Dedup.Md5, nBuckets = 8))
      val (s0, tIng0) = t {
        val s = Dedup.incrementalNearDupNewBanded(
          batch0, "doc_id", "text", ixDir, simTau = 0.75, beforeBatch = Some(0L))
        force(s); s
      }
      val (_, tApp) = t(Dedup.appendBandedNearDupIndex(
        s0.select("doc_id").join(batch0, Seq("doc_id")), "doc_id", "text", ixDir, batchId = 0L))
      val (_, tIng1) = t {
        force(Dedup
          .incrementalNearDupNewBanded(
            batch1, "doc_id", "text", ixDir, simTau = 0.75, beforeBatch = Some(1L))
          .orderBy("doc_id"))
      }
      println(f"round $r: bootstrap=$tBoot%.2f ingest0=$tIng0%.2f append=$tApp%.2f " +
        f"ingest1=$tIng1%.2f total=${tBoot + tIng0 + tApp + tIng1}%.2f")

      // r17 A/B, same JVM: the r16 two-pass step (ingest above, append
      // re-deriving signatures from survivor docs) vs the shared-signature
      // ingestAppendBanded step, on a fresh bootstrap, same batch
      val ixDir2 = graft.core.Scratch.tempDir("graft_probe_banded_r17")
      val (_, tBoot2) = t(Dedup.writeBandedNearDupIndex(
        old, "doc_id", "text", ixDir2, bands = 4, rowsPerBand = 4,
        family = Dedup.Md5, nBuckets = 8))
      val (_, tStep) = t(Dedup.ingestAppendBanded(
        batch0, "doc_id", "text", ixDir2, batchId = 0L, simTau = 0.75)())
      val (_, tIng1b) = t {
        force(Dedup
          .incrementalNearDupNewBanded(
            batch1, "doc_id", "text", ixDir2, simTau = 0.75, beforeBatch = Some(1L))
          .orderBy("doc_id"))
      }
      println(f"round $r NEW: bootstrap=$tBoot2%.2f ingest0+append=$tStep%.2f " +
        f"(vs old ${tIng0 + tApp}%.2f) ingest1=$tIng1b%.2f " +
        f"total=${tBoot2 + tStep + tIng1b}%.2f")
    }
    spark.stop()
  }
}
