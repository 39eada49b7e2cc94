package graft

import graft.llm.Vocab
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-safe dense-id assignment: topK (TakeOrderedAndProject + local
  * ids) and denseIds (two-phase range-partition + zipWithIndex) must both
  * reproduce the ordering a global row_number window would give — without
  * ever building that window.
  */
class VocabSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts = Seq(
    ("the", 50L), ("fox", 10L), ("dog", 10L), ("a", 40L),
    ("quick", 7L), ("brown", 7L), ("lazy", 3L), ("zig", 1L))
    .toDF("tok", "n")
    .repartition(5) // ids must be global, not per input partition

  test("topK assigns dense ids in (n desc, tok asc) order") {
    val got = Vocab.topK(counts, 4, Seq(col("n").desc, col("tok").asc), "token_id")
      .orderBy("token_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .toSeq
    assert(got == Seq(("the", 50L, 1), ("a", 40L, 2), ("dog", 10L, 3), ("fox", 10L, 4)))
  }

  test("denseIds covers every row with globally unique contiguous ids in order") {
    val got = Vocab.denseIds(counts, Seq(col("n").desc, col("tok").asc), "token_id")
      .orderBy("token_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .toSeq
    assert(got.map(_._2) == (1L to 8L))
    assert(got.map(_._1) == Seq("the", "a", "dog", "fox", "brown", "quick", "lazy", "zig"))
  }

  test("unigramLogProb matches the hand-computed corpus distribution") {
    // corpus: a a a b  → p(a)=3/4, p(b)=1/4
    val docs = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val got = Vocab
      .unigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Double, Long)]
      .collect()
      .toSeq
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(math.abs(got(0)._2 - math.log(0.75)) < 1e-12)
    assert(math.abs(got(1)._2 - math.log(0.25)) < 1e-12)
    assert(got.map(_._3) == Seq(3L, 1L))
  }

  test("coverageCurve matches hand-computed coverage on a tiny corpus") {
    // counts: a×4, b×2, c×1, d×1 → ranked a(1), b(2), c(3), d(4); total 8
    val docs = Seq((1L, "a a b c"), (2L, "a a b d")).toDF("doc_id", "text")
    val got = Vocab
      .coverageCurve(docs, "text", Seq(1, 2, 4, 8))
      .orderBy("k")
      .as[(Int, Long, Double)]
      .collect()
      .toSeq
    assert(got == Seq(
      (1, 1L, 0.5),      // top-1 = a: 4/8
      (2, 2L, 0.75),     // +b: 6/8
      (4, 4L, 1.0),      // whole vocab
      (8, 4L, 1.0)))     // grid beyond vocab: n_types stays 4
    // empty corpus: zero rows (the relational answer), not null coverages
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Vocab.coverageCurve(empty, "text", Seq(1, 2)).count() == 0L)
  }

  test("tokenBudget keeps whole documents greedily by quality rank within the budget") {
    import graft.llm.CorpusSelect
    // score by explicit column; ranking: d3 (0.9), d1 (0.8), d2 (0.7)
    // tokens: d3=2, d1=3, d2=4 → cum 2, 5, 9; budget 5 keeps d3, d1
    val docs = Seq(
      (1L, "w w w", 0.8),
      (2L, "x x x x", 0.7),
      (3L, "y y", 0.9))
      .toDF("doc_id", "text", "score")
    val got = CorpusSelect
      .tokenBudget(docs, col("score"), "doc_id", "text", budget = 5L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "cum_tokens")
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    assert(got == Seq((1L, 3L, 5L), (3L, 2L, 2L)))
    // zero budget selects nothing; huge budget selects everything
    assert(CorpusSelect.tokenBudget(docs, col("score"), "doc_id", "text", 0L).count() == 0L)
    assert(CorpusSelect.tokenBudget(docs, col("score"), "doc_id", "text", 100L).count() == 3L)
    // TRUNCATION semantics: budget 4 fits d3 (2) but not d1 (cum 5);
    // d2 (4 tokens, cum 9) is NOT revisited even though 2 remain unused
    assert(
      CorpusSelect.tokenBudget(docs, col("score"), "doc_id", "text", 4L)
        .select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("tokenBudgetPerGroup: independent budgets per group, invariant to partitioning") {
    import graft.llm.CorpusSelect
    // group A ranking: a3 (0.9, 2 tok), a1 (0.8, 3 tok), a2 (0.7, 4 tok)
    // group B ranking: b5 (0.9, 4 tok), b4 (0.2, 1 tok)
    val docs = Seq(
      (1L, "A", "w w w", 0.8),
      (2L, "A", "x x x x", 0.7),
      (3L, "A", "y y", 0.9),
      (4L, "B", "z", 0.2),
      (5L, "B", "v v v v", 0.9))
      .toDF("doc_id", "grp", "text", "score")
    def run(df: org.apache.spark.sql.DataFrame) = CorpusSelect
      .tokenBudgetPerGroup(df, col("score"), "doc_id", "grp", "text", budget = 5L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "cum_tokens")
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    // A: cum 2, 5, 9 → keeps 3 and 1. B: cum 4, 5 → keeps 5 and 4.
    val want = Seq((1L, 3L, 5L), (3L, 2L, 2L), (4L, 1L, 5L), (5L, 4L, 4L))
    assert(run(docs) == want)
    // many tiny partitions force groups to SPAN partitions — the
    // per-(partition, group) offset bookkeeping must still add up
    assert(run(docs.repartition(11)) == want)
    // single group degenerates to tokenBudget
    val one = docs.withColumn("grp", lit("only"))
    assert(
      CorpusSelect.tokenBudgetPerGroup(one, col("score"), "doc_id", "grp", "text", 9L).count() ==
        CorpusSelect.tokenBudget(docs, col("score"), "doc_id", "text", 9L).count())
  }

  test("unigramLogProb open-vocabulary mode broadcasts NEITHER side and agrees with default") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val docs = (0L until 50L).map(i => (i, s"t$i t${i % 7} t${i % 3} common")).toDF("doc_id", "text")
    val bc   = Vocab.unigramLogProb(docs, "doc_id", "text")
    val sh   = Vocab.unigramLogProb(docs, "doc_id", "text", broadcastVocab = false)
    assert(
      sh.queryExecution.sparkPlan.collect { case j: BroadcastHashJoinExec => j }.isEmpty,
      "open-vocabulary mode must not broadcast either join side")
    val a = bc.orderBy("doc_id").as[(Long, Double, Long)].collect().toSeq
    val b = sh.orderBy("doc_id").as[(Long, Double, Long)].collect().toSeq
    assert(a.map(_._1) == b.map(_._1))
    assert(a.map(_._3) == b.map(_._3))
    a.zip(b).foreach { case (x, y) => assert(math.abs(x._2 - y._2) < 1e-12) }
  }

  test("logProbBands covers every doc, orders bands by score, and honors quantile shares") {
    // one lang, 20 docs: repetitive high-prob docs vs rare-token salad
    val docs = (0L until 20L)
      .map(i => (i, if (i < 10) "common common common words" else s"rare$i salad$i junk$i odd$i", "en"))
      .toDF("doc_id", "text", "lang")
    val got = Vocab
      .logProbBands(docs, "doc_id", "text", "lang")
      .orderBy("doc_id")
      .as[(Long, String, Double, String)]
      .collect()
      .toSeq
    assert(got.size == 20, "every doc gets a band")
    val byBand = got.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
    assert(byBand.keySet.subsetOf(Set("head", "middle", "tail")))
    // band boundaries respect the score ordering: min(head) >= max(middle) >= ...
    for {
      h <- byBand.get("head"); m <- byBand.get("middle")
    } assert(h.min >= m.max, "head scores at or above middle scores")
    for {
      m <- byBand.get("middle"); t <- byBand.get("tail")
    } assert(m.min > t.max, "middle scores above tail scores")
    // quantile shares: head ≥ 30% is impossible to pin exactly with ties,
    // but tail can never exceed midQ of the group and head is non-empty
    assert(byBand.getOrElse("tail", Nil).size <= 6, "tail bounded by midQ share")
    assert(byBand.getOrElse("head", Nil).nonEmpty)
  }

  test("logProbBands Approx mode assigns the same docs a valid band") {
    val docs = (0L until 30L)
      .map(i => (i, s"tok${i % 5} tok${i % 3} tok$i end", if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "text", "lang")
    val ap = Vocab.logProbBands(docs, "doc_id", "text", "lang",
      mode = graft.core.ScaleMode.Approx)
    assert(ap.count() == 30)
    assert(ap.where(!col("band").isin("head", "middle", "tail")).count() == 0)
    // the sketch threshold is a data value (no interpolation), so exact
    // boundary membership may shift by a tie — but the band ordering
    // invariant must still hold within every language
    val rows = ap.as[(Long, String, Double, String)].collect().toSeq
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val byBand = rs.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
      for { h <- byBand.get("head"); m <- byBand.get("middle") }
        assert(h.min >= m.max)
      for { m <- byBand.get("middle"); t <- byBand.get("tail") }
        assert(m.min > t.max)
    }
  }

  test("temperatureWeights: alpha=1 is proportional; alpha<1 upweights the tail") {
    import graft.llm.CorpusSelect
    val docs = (Seq.fill(80)("big") ++ Seq.fill(15)("mid") ++ Seq.fill(5)("small"))
      .zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "source")
    val prop = CorpusSelect.temperatureWeights(docs, "source", alpha = 1.0)
      .orderBy("source").as[(String, Long, Double, Double, Double)].collect().toSeq
    prop.foreach { case (_, _, p, q, w) =>
      assert(math.abs(p - q) < 1e-6, "alpha=1 keeps shares")
      assert(math.abs(w - 1.0) < 1e-6, "alpha=1 weight is 1")
    }
    val t = CorpusSelect.temperatureWeights(docs, "source", alpha = 0.3)
      .orderBy("source").as[(String, Long, Double, Double, Double)].collect().toSeq
    val m = t.map(r => r._1 -> r).toMap
    assert(math.abs(t.map(_._4).sum - 1.0) < 1e-5, "temp shares sum to 1")
    assert(m("small")._5 > 1.0 && m("big")._5 < 1.0, "tail up, head down")
    assert(m("small")._4 > m("small")._3 && m("big")._4 < m("big")._3)
    assert(m("big")._2 == 80L && m("small")._2 == 5L)
  }
}
