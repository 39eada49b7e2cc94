package graft.tools

import graft.core.Tables
import graft.llm.{Dedup, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of q134 (the dual-generation banded ingest
  * declared query): bootstrap write / batch-0 ingest / survivor append /
  * batch-1 ingest, each timed separately under the Bench session config,
  * so the per-case bench cost is attributable to a phase instead of
  * guessed at. `SPARK_GRAFT_SF_DIR` picks the corpus.
  */
object BandedQ134Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r  = f
      println(f"[q134probe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    for (r <- 0 until rounds) {
      println(s"[q134probe] round $r sf=$sfDir")
      val docs   = Tables(spark, sfDir).documents.where(col("text").isNotNull)
      val bucket = Sampling.hashBucket(col("doc_id"), "binc")
      val old    = docs.where(bucket < "99").select("doc_id", "text")
      val b0     = docs.where(bucket >= "99" && bucket < "cc").select("doc_id", "text")
      val b1     = docs.where(bucket >= "cc").select("doc_id", "text")
      val mut0 = old
        .where(Sampling.hashBucket(col("doc_id"), "bclone0") < "33")
        .select((col("doc_id") + 2000000L).as("doc_id"), concat(col("text"), lit(" xk1")).as("text"))
      val mut1a = old
        .where(Sampling.hashBucket(col("doc_id"), "bclone1") < "22")
        .select((col("doc_id") + 3000000L).as("doc_id"), concat(col("text"), lit(" xk2")).as("text"))
      val mut1b = b0
        .where(Sampling.hashBucket(col("doc_id"), "bclone2") < "55")
        .select((col("doc_id") + 4000000L).as("doc_id"), concat(col("text"), lit(" xk3")).as("text"))
      val batch0 = b0.unionByName(mut0)
      val batch1 = b1.unionByName(mut1a).unionByName(mut1b)
      val ixDir  = java.nio.file.Files.createTempDirectory("graft_q134_probe").toString
      timed("bootstrap_write") {
        Dedup.writeBandedNearDupIndex(
          old, "doc_id", "text", ixDir,
          bands = 4, rowsPerBand = 4, family = Dedup.Md5, nBuckets = 8)
      }
      val s0 = Dedup.incrementalNearDupNewBanded(
        batch0, "doc_id", "text", ixDir, simTau = 0.75, beforeBatch = Some(0L))
      timed("append_b0") {
        Dedup.appendBandedNearDupIndex(
          s0.select("doc_id").join(batch0, Seq("doc_id")), "doc_id", "text", ixDir, batchId = 0L)
      }
      val out = timed("ingest_b1") {
        Dedup
          .incrementalNearDupNewBanded(
            batch1, "doc_id", "text", ixDir, simTau = 0.75, beforeBatch = Some(1L))
          .orderBy("doc_id")
      }
      timed("drain_b1") {
        val _ = out.queryExecution.toRdd.mapPartitions { it =>
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n)
        }.sum()
      }
    }
    spark.stop()
  }
}
