package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Decomposes the bench's per-case floor for a handful of sub-second
  * declared queries: plan construction+analysis vs execution, job count,
  * and the AQE on/off delta — so the "group onto one warm session" work
  * (VERDICT r11 item 5) targets the component that actually dominates
  * instead of guessing.
  *
  * Usage: FloorProbe <queryName>... (defaults to a representative set)
  */
object FloorProbe {
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

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq(
        "q01_pricing_summary", "q02_mktsegment_revenue", "q04_cust_without_big_orders",
        "q08_nation_intersect", "q10_scalar_funcs", "q44_stddev_var")

    for (name <- names; aqe <- Seq(true, false)) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      def once(): (Double, Double, Int) = {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t1 = System.nanoTime()
        val j0 = jobs.get()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, jobs.get() - j0)
      }
      once() // warm
      val runs = (1 to 5).map(_ => once())
      val plan = runs.map(_._1).min
      val exec = runs.map(_._2).min
      println(f"$name%-28s aqe=$aqe%-5s plan=$plan%.3f exec=$exec%.3f jobs=${runs.last._3}")
    }
    spark.stop()
  }
}
