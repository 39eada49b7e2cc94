package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the AUTO-sized ANN paths (LSH + IVF) against the same corpus the
  * declared q41/q50 queries read with their fixed small-scale parameters —
  * the evidence row for BENCH_SF1.md that index auto-sizing restores
  * near-linear growth where fixed sizes measured 14×/31× for 10× data.
  *
  * Usage: AnnScaleBench <sfDir> [rounds]
  */
object AnnScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val rounds = if (args.length > 1) args(1).toInt else 2
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

    val emb = graft.core.Tables(spark, sfDir).embeddings

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm  = once()
      val timed = (1 to rounds).map(_ => once())
      println(
        f"[annscale] $name%s warm=$warm%.3f " +
          timed.map(t => f"$t%.3f").mkString("rounds=[", ", ", "]") +
          f" min=${timed.min}%.3f")
    }

    time("lsh_auto")(graft.llm.AnnBuckets.approxTopK(emb, "vec_id", "embedding", k = 5))
    time("ivf_auto")(graft.llm.IvfIndex.approxTopK(emb, "vec_id", "embedding", k = 5, nProbe = 3))
    time("semdedup_auto")(
      graft.llm.SemDedup.keepFlags(emb, "vec_id", "embedding", tau = 0.4))
    spark.stop()
  }
}
