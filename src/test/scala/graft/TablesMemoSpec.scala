package graft

import graft.core.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Tables base-relation memo: identity reuse, LRU eviction (not
  * a wholesale clear), and the invalidate hook for in-session fixture
  * regeneration (ADVICE r11 — the pinned file-listing snapshot needs an
  * explicit escape hatch).
  */
class TablesMemoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("repeated table access returns the memoized relation") {
    val a = Tables(spark, "/root/testdata/sf0.001").documents
    val b = Tables(spark, "/root/testdata/sf0.001").documents
    assert(a eq b, "second access must reuse the analyzed relation")
  }

  test("invalidate drops entries under the prefix so a regenerated dir re-reads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables_memo").toString
    Seq((1L, "one")).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val first = Tables(spark, dir).documents
    assert(first.count() == 1L)
    assert(Tables(spark, dir).documents eq first)
    // regenerate the fixture in-session: without invalidate the memo
    // serves the pinned listing; with it, the next access re-lists
    Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.invalidate(dir)
    val second = Tables(spark, dir).documents
    assert(!(second eq first), "invalidate must drop the pinned relation")
    assert(second.count() == 2L, "post-invalidate read must see the regenerated files")
  }

  test("memo evicts LRU entries past the bound instead of clearing wholesale") {
    import spark.implicits._
    val tag = s"memo-evict-${System.nanoTime()}"
    def fake(i: Int) = s"/$tag/path$i"
    val kept    = Tables.memo(spark, fake(0))(spark.range(1).toDF())
    val dropped = Tables.memo(spark, fake(1))(spark.range(1).toDF())
    // keep path0 RECENTLY USED while flooding 600 further entries;
    // path1 is never retouched
    (2 to 600).foreach { i =>
      Tables.memo(spark, fake(0))(spark.range(1).toDF())
      Tables.memo(spark, fake(i))(spark.range(1).toDF())
    }
    assert(Tables.memoSize <= 512, s"memo grew past its bound: ${Tables.memoSize}")
    // the recently-touched entry survived the flood...
    assert(Tables.memo(spark, fake(0))(spark.range(1).toDF()) eq kept)
    // ...while the least-recently-used one was evicted (rebuilds fresh)
    assert(!(Tables.memo(spark, fake(1))(spark.range(1).toDF()) eq dropped),
      "LRU entry should have been evicted by the flood")
    Tables.invalidate(s"/$tag/") // leave no junk for other suites
  }
}
