package graft

import graft.core.{GraftFrame, Sanitize}
import graft.na.WrangleNa
import graft.transform.GelmanStandardize
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5): sanitize idempotence, cc/fi
  * postconditions, standardization moments. ScalaCheck generators driven
  * directly (fixed seed → reproducible cases).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("sanitize is idempotent and produces lowercase no-space names") {
    samples(Gen.asciiPrintableStr, 200).foreach { s =>
      val once = Sanitize.cleanText(s)
      assert(Sanitize.cleanText(once) == once)
      assert(once == once.toLowerCase)
      assert(!once.contains(" "))
    }
  }

  test("cc output has no nulls and is a row-subset") {
    samples(Gen.listOfN(40, Gen.option(Gen.choose(-100.0, 100.0))), 5).foreach { xs =>
      val df  = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("row_id", "x")
      val out = WrangleNa.cc(GraftFrame(df)).df
      assert(out.where(col("x").isNull).count() == 0)
      assert(out.count() == xs.count(_.isDefined))
    }
  }

  test("fi output has no nulls and leaves observed cells untouched") {
    samples(Gen.listOfN(40, Gen.option(Gen.choose(-100.0, 100.0))), 5)
      .filter(_.exists(_.isDefined))
      .foreach { xs =>
        val df  = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("row_id", "x")
        val out = WrangleNa.fi(GraftFrame(df)).df
        assert(out.where(col("x").isNull).count() == 0)
        val got = out.orderBy("row_id").select("x").as[Double].collect()
        xs.zipWithIndex.foreach {
          case (Some(v), i) => assert(math.abs(got(i) - v) < 1e-12)
          case _            =>
        }
      }
  }

  test("as-of join agrees with a brute-force range-join reference on random data") {
    import org.apache.spark.sql.functions._
    val gen = for {
      key  <- Gen.choose(1L, 4L)
      secs <- Gen.choose(0L, 3600L)
    } yield (key, secs)
    (0 until 3).foreach { round =>
      val leftRows = samples(Gen.listOfN(30, gen), 1)(0).zipWithIndex
        .map { case ((k, s), i) => (k, s, i.toLong) }
      val rightRows = samples(Gen.listOfN(20, gen), 1)(0).zipWithIndex
        .map { case ((k, s), i) => (k, s, 100L + i) }

      val left = leftRows.toDF("lk", "lsecs", "lid")
        .selectExpr("lk", "timestamp_seconds(lsecs) AS lt", "lid")
      val right = rightRows.toDF("rk", "rsecs", "rid")
        .selectExpr("rk", "timestamp_seconds(rsecs) AS rt", "rid")
        // dedupe per (key, time) for a deterministic pick, as documented
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("rk", "rt").orderBy(col("rid").desc)))
        .where(col("rn") === 1).drop("rn")

      val got = graft.rel.AsOfJoin(left, "lk", "lt", right, "rk", "rt")
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

      // brute force: max-time right row with rt <= lt per left row
      val rightLocal = right.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      val want = left.collect().map { r =>
        val (lk, lt, lid) = (r.getLong(0), r.getTimestamp(1), r.getLong(2))
        val cands = rightLocal.filter(x => x._1 == lk && !x._2.after(lt))
        lid -> (if (cands.isEmpty) None else Some(cands.maxBy(x => (x._2.getTime, x._3))._3))
      }.toMap
      assert(got == want, s"round $round diverged")
    }
  }

  test("BoundedCollectSet equals collect_set whenever the cap is not hit (random data)") {
    import org.apache.spark.sql.functions.{col, collect_set}
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val distinct = 1 + rnd.nextInt(40)
      val rows     = 200 + rnd.nextInt(400)
      val df = (1 to rows)
        .map(_ => s"v${rnd.nextInt(distinct)}")
        .toDF("s")
        .repartition(1 + rnd.nextInt(8))
      val r = df.agg(
        graft.functions.BoundedCollectSet(col("s"), distinct + 1).as("bounded"),
        collect_set(col("s")).as("exact")).collect()(0)
      assert(
        r.getSeq[String](0).sorted == r.getSeq[String](1).sorted,
        s"trial $trial: bounded set diverged below the cap")
    }
  }

  test("factorWrangler dummy-detect matches direct computation on random frames") {
    import graft.core.GraftFrame
    import org.apache.spark.sql.types.BooleanType
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      // 3 numeric columns, each drawing from a random small value set —
      // some sets sum to 1 (dummy: {0,1}, {1}, {2,-1}), some don't
      val pools = IndexedSeq(
        IndexedSeq(0.0, 1.0), IndexedSeq(1.0), IndexedSeq(2.0, -1.0),
        IndexedSeq(0.0, 2.0), IndexedSeq(1.0, 3.0), IndexedSeq(0.5, 0.5))
      val chosen = IndexedSeq.fill(3)(pools(rnd.nextInt(pools.length)))
      val rows = (1 to 100).map { _ =>
        (chosen(0)(rnd.nextInt(chosen(0).size)),
         chosen(1)(rnd.nextInt(chosen(1).size)),
         chosen(2)(rnd.nextInt(chosen(2).size)))
      }
      val df  = rows.toDF("c0", "c1", "c2")
      val out = graft.clean.CleanData.factorWrangler(GraftFrame(df), dummyToBool = true).df
      (0 to 2).foreach { i =>
        // reference heuristic: sum of the OBSERVED distinct values == 1
        val expectBool = rows.map(r => IndexedSeq(r._1, r._2, r._3)(i)).distinct.sum == 1.0
        val isBool     = out.schema(s"c$i").dataType == BooleanType
        assert(isBool == expectBool,
          s"trial $trial col c$i: observed=${rows.map(r => IndexedSeq(r._1, r._2, r._3)(i)).distinct.sorted}")
      }
    }
  }

  test("factorWrangler gate boundary: exactly maxCategories kept, one more gated") {
    import graft.core.GraftFrame
    val atCap = (1 to 100).map(i => s"v${i % 10}").toDF("s") // 10 distinct
    val kept  = graft.clean.CleanData.factorWrangler(GraftFrame(atCap), maxCategories = 10)
    assert(kept.cats.get("s").exists(_.categories.size == 10))
    val overCap = (1 to 100).map(i => s"v${i % 11}").toDF("s") // 11 distinct
    val gated   = graft.clean.CleanData.factorWrangler(GraftFrame(overCap), maxCategories = 10)
    assert(!gated.cats.contains("s"))
  }

  test("stratifiedTake draws exactly min(n, |stratum|) rows, deterministically") {
    import graft.llm.Sampling
    val df = (0L until 100L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val a  = Sampling.stratifiedTake(df, "id", "src", n = 10).orderBy("src", "sample_rank")
    val b  = Sampling.stratifiedTake(df, "id", "src", n = 10).orderBy("src", "sample_rank")
    val ra = a.collect().map(_.toSeq).toSeq
    assert(ra == b.collect().map(_.toSeq).toSeq) // deterministic
    val perStratum = a.groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perStratum == Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L))
    // small stratum: takes all of it
    val tiny = Sampling.stratifiedTake(df.where(col("id") < 2), "id", "src", n = 10)
    assert(tiny.count() == 2L)
    // ranks are 1..n within each stratum
    val ranks = a.where(col("src") === "s0").select("sample_rank").as[Int].collect().sorted.toSeq
    assert(ranks == (1 to 10))
  }

  test("multi-query BM25 matches a driver-side reference scorer on random corpora") {
    import graft.llm.Bm25
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val doc  = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    samples(Gen.listOfN(12, doc), 3).zipWithIndex.foreach { case (texts, round) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val queries = texts.take(3).zipWithIndex
        .map { case (t, i) => (100L + i, t.split(" ").take(3).mkString(" ")) }
        .toDF("q_id", "q_text")
      val got = Bm25
        .topKPerQuery(docs, "doc_id", "text", queries, "q_id", "q_text", k = 12)
        .select("q_id", "doc_id", "score")
        .as[(Long, Long, Double)].collect()
        .map { case (q, d, s) => (q, d) -> s }.toMap

      // reference: textbook BM25 recomputed in driver math with the same
      // rounding contract (per-term 6 dp, exact decimal-grain sum)
      val toks  = texts.map(_.split(" ").toSeq)
      val n     = toks.size.toDouble
      val avgdl = toks.map(_.size).sum.toDouble / n
      def score(qTerms: Seq[String], d: Seq[String]): Double = {
        val sum = qTerms.distinct.map { t =>
          val tf = d.count(_ == t).toDouble
          if (tf == 0) 0L
          else {
            val df  = toks.count(_.contains(t)).toDouble
            val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            val c   = idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * d.size / avgdl))
            math.rint(c * 1e6).toLong
          }
        }.sum
        sum / 1e6
      }
      val qs = queries.as[(Long, String)].collect()
      for ((qid, qt) <- qs; (d, did) <- toks.zipWithIndex) {
        val want = score(qt.split(" ").toSeq, d)
        val have = got.getOrElse((qid, did.toLong), 0.0)
        assert(math.abs(have - want) < 1e-9,
          s"round $round q=$qid doc=$did: engine $have vs reference $want")
      }
    }
  }

  test("LSH rebuild preserves corpus membership and meets sizing on random splits") {
    import graft.llm.AnnBuckets
    val emb = graft.core.Tables(spark, "/root/testdata/sf0.001").embeddings
    for (seedMod <- Seq(2, 3, 5)) {
      val idx = java.nio.file.Files.createTempDirectory(s"lsh_fuzz_$seedMod").toString
      AnnBuckets.writeBucketsGen(
        emb.where(col("vec_id") % seedMod === 0), "vec_id", "embedding", idx)
      AnnBuckets.appendToBuckets(
        idx, emb.where(col("vec_id") % seedMod =!= 0), "vec_id", "embedding", srcBatch = 1L)
      val m = AnnBuckets.rebuildBucketsGen(idx, spark, targetBucketRows = 16)
      val rows = spark.read.parquet(s"$idx/buckets")
      // membership: every vector exactly once per table, no strays
      assert(rows.count() == emb.count() * m.nTables)
      assert(rows.select(col("vec_id").cast("long")).distinct().count() == emb.count())
      // sizing: the rebuilt index meets its own trigger's target
      assert(!AnnBuckets.rebuildDue(
        AnnBuckets.bucketOccupancy(idx, spark), targetBucketRows = 16, slack = 2.0))
      // stamp halves agree after the swap
      assert(AnnBuckets.readGeomMarker(s"$idx/buckets", spark) == m.geomId)
    }
  }

  test("gelman standardization yields mean ≈ 0 and sample sd ≈ 0.5") {
    samples(Gen.listOfN(50, Gen.choose(-1000.0, 1000.0)), 5)
      .filter(_.distinct.size > 1)
      .foreach { xs =>
        val out = GelmanStandardize(GraftFrame(xs.toDF("x"))).df
        val r   = out.agg(avg("x"), stddev_samp("x")).collect()(0)
        assert(math.abs(r.getDouble(0)) < 1e-9)
        assert(math.abs(r.getDouble(1) - 0.5) < 1e-9)
      }
  }
}
