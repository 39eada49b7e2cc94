package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B for the ANN hard-negative miner at a scale dir: the declared
  * q120 pins nBits=4 for oracle reproducibility (the q41/q67 clause);
  * production defaults to `AnnBuckets.Auto` occupancy sizing. This
  * prints both wall times so BENCH_SF1.md can record the growth split.
  */
object MinerProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/benchdata/sf1")
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables(spark, dir).embeddings

    def run(nBits: Int, label: String): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.llm.EmbeddingStats
          .hardNegativesApprox(emb, "vec_id", "label", "embedding",
            tau = 0.3, k = 3, nBits = nBits, nTables = 2)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm  = once()
      val timed = Seq(once(), once())
      println(f"$label%s warm=$warm%.3f min=${timed.min}%.3f")
    }
    run(4, "miner nBits=4 (declared q120)")
    run(graft.llm.AnnBuckets.Auto, "miner nBits=Auto (production)")
    spark.stop()
  }
}
