package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second half of the floor decomposition: what does an ACTION itself
  * cost? Times (a) an empty one-row noop write, (b) noop write vs a
  * toRdd.foreachPartition force of the SAME plans, (c) a bare lineitem
  * scan — separating V2-write commit overhead from scan/shuffle cost so
  * the bench-floor fix targets the real component.
  */
object FloorProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit  = df.write.format("noop").mode("overwrite").save()
    def drain(df: DataFrame): Unit = {
      val _ = df.queryExecution.toRdd.mapPartitions { it =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n)
      }.sum()
    }
    def timeMin(label: String)(body: => Unit): Double = {
      body // warm
      val ts = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-42s min=${ts.min}%.3f med=${ts.sorted.apply(3)}%.3f")
      ts.min
    }

    val one = spark.range(1).toDF("x")
    timeMin("empty: noop write of 1 row")(noop(one))
    timeMin("empty: toRdd drain of 1 row")(drain(one))

    val li = graft.core.Tables(spark, sfDir).lineitem
    timeMin("scan: lineitem noop")(noop(li))
    timeMin("scan: lineitem drain")(drain(li))

    def q01 = graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
    timeMin("q01: noop")(noop(q01))
    timeMin("q01: drain")(drain(q01))

    def q44 = graft.SparkEntry.queries("q44_stats")(spark, sfDir)
    timeMin("q44: noop")(noop(q44))
    timeMin("q44: drain")(drain(q44))

    def q08 = graft.SparkEntry.queries("q08_nation_intersect")(spark, sfDir)
    timeMin("q08: noop")(noop(q08))
    timeMin("q08: drain")(drain(q08))
    spark.stop()
  }
}
