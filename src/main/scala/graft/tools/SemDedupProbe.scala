package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level timing probe for the SemDedup auto path (one-off plan
  * iteration aid; not part of the bench contract).
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
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

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val approxOnly = args.length > 1 && args(1) == "approxOnly"
    // warm the scan
    emb.count()
    if (!approxOnly) (1 to 2).foreach { round =>
      println(s"[probe] --- round $round")
      val n  = t("count")(emb.count())
      val k  = graft.llm.SemDedup.autoK(n)
      println(s"[probe] n=$n k=$k kernel=${k > graft.llm.SemDedup.KernelSeedThreshold} " +
        s"parts=${emb.rdd.getNumPartitions}")
      val sd = t("pickSeeds")(graft.llm.SemDedup.pickSeeds(emb, "vec_id", "embedding", k))
      t("assign+noop") {
        graft.llm.SemDedup
          .assignCells(emb, "vec_id", "embedding", sd)
          .write.format("noop").mode("overwrite").save()
      }
      t("full keepFlags") {
        graft.llm.SemDedup
          .keepFlags(emb, "vec_id", "embedding", tau = 0.4)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // the corpus-scale LSH path (Auto bits, production defaults); args(1)
    // "approxOnly" skips the exact stages above for sf10 runs where the
    // n^1.5 exact path costs minutes
    (1 to 3).foreach { _ =>
      t("keepFlagsApprox (Auto bits)") {
        graft.llm.SemDedup
          .keepFlagsApprox(emb, "vec_id", "embedding", tau = 0.4)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
