package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing CLI for plan iteration: runs the named declared
  * queries under the exact Bench session config (local[32], AQE, 32 shuffle
  * partitions, noop-write force) and prints one warm-up + per-round wall
  * times, so a hot spot can be profiled without paying for the full bench
  * suite.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    for (name <- args) {
      val warm = force(name)
      val timed = (1 to rounds).map(_ => force(name))
      println(
        f"$name%s warm=$warm%.3f " +
          timed.map(t => f"$t%.3f").mkString("rounds=[", ", ", "]") +
          f" min=${timed.min}%.3f")
    }
    spark.stop()
  }
}
