package graft

import graft.core.{ScaleMode, Stats}
import graft.functions.GraftFunctions.dot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DotProduct matches a hand-computed dot and handles nulls") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0, 1.0, 1.0))))
      .toDF("a", "b")
    val got = df.select(dot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 32.0)
    assert(got(1).isNullAt(0))
  }

  test("DotProduct interpreted eval agrees with codegen") {
    val df = Seq((Seq(0.5, -1.5, 2.0), Seq(2.0, 4.0, -1.0))).toDF("a", "b")
    val viaCodegen = df.select(dot(col("a"), col("b"))).as[Double].collect().head
    // force interpreted path through a non-codegen context (filter on eval)
    val expected = 0.5 * 2.0 + -1.5 * 4.0 + 2.0 * -1.0
    assert(viaCodegen == expected)
    val viaWhere = df.where(dot(col("a"), col("b")) === lit(expected)).count()
    assert(viaWhere == 1)
  }

  test("canonical CSV writer is byte-stable across row orderings") {
    import graft.core.CanonicalWriter
    val a = Seq((2L, 2.5, "y"), (1L, 1.0000000001, "x")).toDF("id", "v", "s")
    val b = Seq((1L, 1.0000000001, "x"), (2L, 2.5, "y")).toDF("id", "v", "s")
    val da = java.nio.file.Files.createTempDirectory("canon_a").toString
    val db = java.nio.file.Files.createTempDirectory("canon_b").toString
    CanonicalWriter.writeCsv(a, da)
    CanonicalWriter.writeCsv(b, db)
    def readBytes(dir: String) = {
      val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv")).head
      new String(java.nio.file.Files.readAllBytes(f.toPath))
    }
    val ca = readBytes(da)
    assert(ca == readBytes(db))
    assert(ca.contains("1.000000")) // fixed float format
    assert(ca.linesIterator.next() == "id,v,s")
  }

  test("Stats mode switch dispatches exact vs approx") {
    val df = (1 to 1000).toDF("x")
    val exact = df.agg(
      Stats.percentile(col("x"), 0.5),
      Stats.distinctCount(col("x"))).collect()(0)
    assert(exact.getDouble(0) == 500.5)
    assert(exact.getLong(1) == 1000L)
    val approx = df.agg(
      Stats.percentile(col("x"), 0.5, ScaleMode.Approx),
      Stats.distinctCount(col("x"), ScaleMode.Approx)).collect()(0)
    assert(math.abs(approx.getInt(0) - 500) <= 5)
    assert(math.abs(approx.getLong(1) - 1000L) <= 50)
  }
}
