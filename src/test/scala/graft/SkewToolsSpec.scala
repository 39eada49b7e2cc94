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
