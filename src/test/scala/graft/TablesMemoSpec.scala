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

  test("a slow first build does not block other keys (compute outside the lock)") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    import spark.implicits._
    val tag      = s"memo-conc-${System.nanoTime()}"
    val started  = new CountDownLatch(1) // slow build has entered its body
    val release  = new CountDownLatch(1) // test releases the slow build
    val slowDone = new java.util.concurrent.atomic.AtomicReference[org.apache.spark.sql.DataFrame]()
    val slow = new Thread(() => {
      slowDone.set(Tables.memo(spark, s"/$tag/slow") {
        started.countDown()
        release.await(30, TimeUnit.SECONDS)
        spark.range(1).toDF()
      })
    })
    slow.start()
    assert(started.await(10, TimeUnit.SECONDS), "slow build never started")
    // while the slow build is in flight, an UNRELATED key must resolve
    // promptly — under the old build-inside-monitor memo this deadlines
    val other = Tables.memo(spark, s"/$tag/other")(spark.range(2).toDF())
    assert(other != null)
    release.countDown()
    slow.join(30000)
    assert(!slow.isAlive, "slow build thread did not finish")
    assert(slowDone.get() != null)
    // and the slow key is memoized normally once built
    assert(Tables.memo(spark, s"/$tag/slow")(fail("must not rebuild")) eq slowDone.get())
    Tables.invalidate(s"/$tag/")
  }

  test("concurrent first reads of the same key race safely to one winner") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    import spark.implicits._
    val tag   = s"memo-race-${System.nanoTime()}"
    val gate  = new CountDownLatch(1)
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    val got   = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.DataFrame]()
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        gate.await(10, TimeUnit.SECONDS)
        got.add(Tables.memo(spark, s"/$tag/raced") {
          built.incrementAndGet()
          spark.range(3).toDF()
        })
      })
    }
    threads.foreach(_.start())
    gate.countDown()
    threads.foreach(_.join(30000))
    assert(got.size == 4)
    val winner = got.peek()
    got.forEach(df => assert(df eq winner, "all racers must observe the same memoized relation"))
    assert(built.get() >= 1 && built.get() <= 4) // duplicate builds allowed, duplicate entries not
    Tables.invalidate(s"/$tag/")
  }
}
