package graft

import graft.core.Tables
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("JSONL round-trips the nation table exactly (declared schema)") {
    val nation = Tables(spark, dir).nation
    val out    = java.nio.file.Files.createTempDirectory("jsonl").toString
    Sources.writeJsonl(nation, out)
    val back = Sources.readJsonl(spark, out, Some(nation.schema))
      .select(nation.columns.map(col): _*)
    TestSpark.assertFrameEqual(back, nation)
    // inferred-schema read still yields the same row count (types may widen)
    assert(Sources.readJsonl(spark, out).count() == nation.count())
  }

  test("ORC round-trips lineitem columns and pushes filters to the scan") {
    val li  = Tables(spark, dir).lineitem.select("l_orderkey", "l_quantity", "l_shipdate")
    val out = java.nio.file.Files.createTempDirectory("orc").toString
    Sources.writeOrc(li, out)
    val back = Sources.readOrc(spark, out)
    assert(back.count() == li.count())
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum("l_quantity")).collect()(0).getDouble(0)
    assert(agg(back) == agg(li))
    // predicate pushdown + column pruning reach the ORC scan
    val filtered = back.where(col("l_quantity") > 25).select("l_orderkey")
    val plan     = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"), plan.take(800))
    assert(!plan.contains("l_shipdate"), "pruned column still read:\n" + plan.take(800))
  }
}
