package graft.tools

import graft.core.GraftFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway A/B: pipeline_e2e wall time with AQE on vs off for the whole
  * chain — measures how much of the e2e floor is AQE query-stage job
  * overhead on the one-row statistics aggregates.
  */
object AqeProbe {
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

    def withNa = graft.core.Tables(spark, sfDir).lineitem.select(
      col("l_extendedprice"),
      when(col("l_orderkey") % 19 === 0, lit(null).cast("double"))
        .otherwise(col("l_quantity")).as("l_quantity"),
      col("l_discount"), col("l_tax"), col("l_returnflag"))

    def pipeline(): Unit = {
      val cleaned = graft.clean.CleanData.factorWrangler(
        GraftFrame(withNa), strToCat = true, dummyToBool = false)
      val encoded  = graft.encode.EncodeData(cleaned)
      val imputed  = graft.na.WrangleNa.fi(encoded)
      val standard = graft.transform.GelmanStandardize(imputed)
      graft.model.RunModel(
        standard.df, "l_extendedprice", Seq("l_quantity", "l_discount", "l_tax"))
      ()
    }

    def time(label: String): Unit = {
      pipeline() // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); pipeline(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f")
    }

    time("aqe_on ")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("aqe_off")
    spark.stop()
  }
}
