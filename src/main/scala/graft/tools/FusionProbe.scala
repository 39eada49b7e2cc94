package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.dot
import graft.llm.AnnBuckets

/** A/B probe: per-table-union LSH candidate kernel (production
  * [[graft.llm.AnnBuckets.candidatePairs]]) vs the fused single-join
  * kernel ([[graft.llm.AnnBuckets.candidatePairsFused]]), at the
  * keepFlagsApprox operating point (Auto bits/tables). This probe is
  * why per-table IS production: at sf10 (n=200 k, bits=11, tables=13)
  * it measured per-table 94–125 s vs fused 164–174 s for the identical
  * 371 M-pair output.
  */
object FusionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode  = args.lift(1).getOrElse("both") // pertable | fused | both
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.core.Tables(spark, sfDir).embeddings
    val e = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))
    val n      = e.count()
    val bits   = AnnBuckets.autoBits(n)
    val tables = AnnBuckets.autoTables(n)
    val seed   = 42L
    val dims   = 64
    println(s"[fusion] n=$n bits=$bits tables=$tables")

    def perTable(): DataFrame = AnnBuckets.candidatePairs(e, bits, dims, tables, seed)

    def fused(): DataFrame = AnnBuckets.candidatePairsFused(e, bits, dims, tables, seed)

    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val c  = f.groupBy().count().collect()(0).getLong(0)
      println(f"[fusion] $name%s pairs=$c%d ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    (1 to 2).foreach { _ =>
      if (mode != "fused") time("per-table")(perTable())
      if (mode != "pertable") time("fused    ")(fused())
    }
    spark.stop()
  }
}
