package graft

import graft.core.Tables
import graft.rel.SkewTools
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewToolsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("salted join returns exactly the plain join result") {
    val t     = Tables(spark, dir)
    val plain = t.orders.join(t.customer, col("o_custkey") === col("c_custkey"))
    val salted = SkewTools.saltedJoin(
      t.orders.withColumnRenamed("o_custkey", "k"),
      t.customer.withColumnRenamed("c_custkey", "k"),
      "k",
      salts = 4)
    assert(salted.count() == plain.count())
    val a = salted.agg(sum("o_totalprice"), sum("c_acctbal")).collect()(0)
    val b = plain.agg(sum("o_totalprice"), sum("c_acctbal")).collect()(0)
    assert(a == b)
  }

  test("salt handles MapType columns and spreads exact-duplicate hot-key rows") {
    import spark.implicits._
    // 2000 EXACT-duplicate rows of one hot key, plus a map column that
    // hash() cannot digest — the old whole-row hash threw AnalysisException
    // here, and without the partition-id term every duplicate row would
    // collide onto a single salt
    val probe = spark
      .range(2000)
      .select(
        lit("hot").as("k"),
        lit(1.0).as("v"),
        map(lit("a"), lit(1)).as("m"))
      .repartition(8)
    val salts = probe
      .withColumn("s", SkewTools.probeSalt(probe, 8))
      .select("s").distinct().count()
    assert(salts > 1, s"duplicate hot-key rows all landed on one salt")
    // end-to-end: salted join over the map-typed probe matches the plain join
    val build  = Seq(("hot", 42)).toDF("k", "w")
    val salted = SkewTools.saltedJoin(probe, build, "k", salts = 4)
    assert(salted.count() == 2000)
    assert(salted.agg(sum("w")).collect()(0).getLong(0) == 2000L * 42)
  }

  test("bucketed tables join without an Exchange") {
    val t = Tables(spark, dir)
    val bo = SkewTools.writeBucketed(
      spark, t.orders.select("o_orderkey", "o_custkey", "o_totalprice"), "b_orders", "o_custkey")
    val bc = SkewTools.writeBucketed(
      spark,
      t.customer.select(col("c_custkey").as("o_custkey"), col("c_acctbal")),
      "b_customer",
      "o_custkey")
    // force the sort-merge path (broadcast would win on test-sized data and
    // hide the bucketing effect we're asserting)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bo.join(bc, "o_custkey")
      val plan   = joined.queryExecution.executedPlan.toString
      assert(
        !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == t.orders.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
