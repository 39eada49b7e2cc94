package graft

import java.nio.file.Files

import graft.core.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-posture assertions: partition pruning reaches the scan, and no
  * declared query depends on broadcast joins to produce correct results
  * (AQE must be free to fall back to sort-merge at cluster scale).
  */
class ScalePostureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("year-partitioned writes prune partitions in the scan") {
    val out = Files.createTempDirectory("li_part").toString
    val li  = Tables(spark, dir).lineitem
    li.withColumn("ship_year", year(col("l_shipdate")))
      .write
      .partitionBy("ship_year")
      .mode("overwrite")
      .parquet(out)

    val pruned = spark.read
      .parquet(out)
      .where(col("ship_year") === 1996)
      .select(sum("l_quantity"))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), "no partition filters in plan")
    assert(
      scan.contains("ship_year") && !scan.contains("PartitionFilters: []"),
      s"partition filter not applied:\n${scan.take(800)}")
    // and the answer matches the unpartitioned filter
    val want = li
      .where(year(col("l_shipdate")) === 1996)
      .agg(sum("l_quantity"))
      .collect()(0)
      .getDouble(0)
    assert(pruned.collect()(0).getDouble(0) == want)
  }

  test("join-heavy queries survive with broadcast disabled (sort-merge fallback)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val checks = Seq("q02_mktsegment_revenue", "q06_region_sales", "q14_events_asof_order")
    try {
      val baseline = checks.map(n =>
        n -> SparkEntry.queries(n)(spark, dir).collect().map(_.toString).sorted.toSeq)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      baseline.foreach { case (n, want) =>
        val got = SparkEntry.queries(n)(spark, dir).collect().map(_.toString).sorted.toSeq
        assert(got == want, s"$n diverges without broadcast")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
