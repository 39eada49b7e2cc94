package graft

import graft.core.Tables
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def withTempDir(prefix: String)(body: String => Unit): Unit = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    try body(d.toString)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(d.toFile)
    }
  }

  test("JSONL round-trips the nation table exactly (declared schema)") {
    val nation = Tables(spark, dir).nation
    withTempDir("jsonl") { out =>
      Sources.writeJsonl(nation, out)
      val back = Sources.readJsonl(spark, out, Some(nation.schema))
        .select(nation.columns.map(col): _*)
      TestSpark.assertFrameEqual(back, nation)
      // inferred-schema read still yields the same row count (types may widen)
      assert(Sources.readJsonl(spark, out).count() == nation.count())
    }
  }

  test("JSONL declared-schema read FAILFASTs on type drift instead of nulling") {
    withTempDir("jsonl_bad") { out =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, "part.json"),
        "{\"id\": 1}\n{\"id\": \"not-a-long\"}\n".getBytes)
      val schema = org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
      val err = intercept[org.apache.spark.SparkException] {
        Sources.readJsonl(spark, out, Some(schema)).collect()
      }
      assert(err.getMessage != null)
      // explicit PERMISSIVE keeps the old null-out behavior
      val permissive = Sources.readJsonl(spark, out, Some(schema), mode = "PERMISSIVE").collect()
      assert(permissive.length == 2 && permissive.count(_.isNullAt(0)) == 1)
    }
  }

  test("ORC round-trips lineitem columns and pushes filters to the scan") {
    val li = Tables(spark, dir).lineitem.select("l_orderkey", "l_quantity", "l_shipdate")
    withTempDir("orc") { out =>
      Sources.writeOrc(li, out)
      val back = Sources.readOrc(spark, out)
      assert(back.count() == li.count())
      val agg = (df: org.apache.spark.sql.DataFrame) =>
        df.agg(sum("l_quantity")).collect()(0).getDouble(0)
      assert(agg(back) == agg(li))
      // predicate pushdown + column pruning reach the ORC scan: the filter
      // must appear INSIDE the PushedFilters list, not merely in a Filter
      // node above the scan (plan.contains("l_quantity") alone is vacuous)
      val filtered = back.where(col("l_quantity") > 25).select("l_orderkey")
      val plan     = filtered.queryExecution.executedPlan.toString
      assert(
        "PushedFilters: \\[[^\\]]*l_quantity".r.findFirstIn(plan).isDefined,
        "filter not pushed into the ORC scan:\n" + plan.take(800))
      assert(!plan.contains("l_shipdate"), "pruned column still read:\n" + plan.take(800))
    }
  }
}
