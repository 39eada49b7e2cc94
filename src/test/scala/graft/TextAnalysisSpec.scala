package graft

import graft.llm.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("langId picks the right language on real-language samples") {
    val samples = Seq(
      ("the cat is in the house and it is happy", "en"),
      ("el perro que corre por la casa y se fue", "es"),
      ("der hund ist mit den kindern und das ist gut", "de"),
      ("le chat est dans la maison et les enfants", "fr"),
      ("这 是 中 文 的 例 子 了 我 在", "zh"),
      ("qwerty asdf zxcv uiop", "und"))
    val got = samples
      .toDF("text", "want")
      .select(col("want"), TextAnalysis.langId(col("text")).as("got"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(0), s"sample for ${r.getString(0)}"))
  }

  test("quality score is bounded and favors diverse alpha text") {
    val df = Seq(
      ("aa aa aa aa aa aa aa aa", 23L),          // repetitive
      ("the quick brown fox jumps over dogs", 35L)) // diverse
      .toDF("text", "n_chars")
    val scores =
      df.select(TextAnalysis.qualityScore(col("text"), col("n_chars"))).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(1) > scores(0))
  }

  test("type-token ratio is 0 for empty text, not 1") {
    val got = Seq("", "a a b")
      .toDF("text")
      .select(TextAnalysis.typeTokenRatio(col("text")))
      .as[Double]
      .collect()
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 2.0 / 3.0) < 1e-12)
  }

  test("rolling fingerprint is order-sensitive and deterministic") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
    val fp = df.select(TextAnalysis.rollingFingerprint(col("text"))).as[Long].collect()
    assert(fp(0) == fp(2))
    assert(fp(0) != fp(1))
  }

  test("trigram dup fraction: repeats detected, short texts guarded to 0") {
    import graft.llm.TextAnalysis
    val df = Seq(
      "a b c a b c a b c", // 7 trigrams, 3 distinct ("a b c","b c a","c a b")
      "one two three four", // 2 trigrams, both unique → 0.0
      "too short",          // < 3 tokens → guard → 0.0 (sequence would descend!)
      ""                    // empty → 0.0
    ).toDF("text")
    val got = df
      .select(split(col("text"), " ").as("tk"))
      .select(TextAnalysis.trigramDupFracFromTokens(col("tk")).as("f"))
      .as[Double].collect().toSeq
    assert(got(1) == 0.0 && got(2) == 0.0 && got(3) == 0.0)
    // "a b c a b c a b c": trigrams abc bca cab abc bca cab abc → 3 distinct of 7
    assert(math.abs(got(0) - (1.0 - 3.0 / 7.0)) < 1e-12)
  }

  test("sequence packing: boundaries at capacity offsets, every doc exactly once") {
    import graft.llm.Packing
    val docs = spark.range(1, 101).select(
      col("id").as("doc_id"),
      // token counts 1..100 via repeated 'w' tokens
      array_join(transform(sequence(lit(1), col("id")), _ => lit("w")), " ").as("text"))
    val packed = Packing.packSequences(docs, "doc_id", "text", capacity = 64L)
      .select("doc_id", "n_tokens", "pack_id")
      .collect()
      .sortBy(_.getLong(0))
    assert(packed.length == 100) // no doc lost or duplicated
    // replay the contract sequentially: pack = (cum - n) div capacity
    var cum = 0L
    packed.foreach { r =>
      val n = r.getLong(1)
      assert(n == r.getLong(0)) // doc_id i has i tokens
      assert(r.getLong(2) == cum / 64L, s"doc ${r.getLong(0)}: pack ${r.getLong(2)} != ${cum / 64}")
      cum += n
    }
    // summary accounts for every token
    val sum = Packing.packSummary(docs, "doc_id", "text", 64L)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).collect()(0).getLong(0)
    assert(sum == 5050L)
  }

  test("decontamination: self-overlap is 1.0, disjoint text is 0.0") {
    import graft.llm.Decontamination
    val evalDocs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon"), // verbatim benchmark copy
      (11L, "alpha beta gamma zeta eta"),      // shares the leading 3-gram only
      (12L, "one two three four five")         // disjoint
    ).toDF("doc_id", "text")
    val got = Decontamination.score(train, evalDocs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got(0) == ((10L, 3L, 3L, 1.0)))      // 3 shingles, all matched
    assert(got(1) == ((11L, 3L, 1L, 0.333333))) // only "alpha beta gamma"
    assert(got(2) == ((12L, 3L, 0L, 0.0)))
  }

  test("bpe-ish tokenizer splits alpha/digit/punct runs") {
    val n = Seq("abc123 def, xyz!")
      .toDF("text")
      .select(TextAnalysis.nBpeTokens(col("text")))
      .as[Int]
      .collect()
      .head
    // abc | 123 | def | , | xyz | !  → 6
    assert(n == 6)
  }

  test("redactPii masks emails, IPv4s and phones, in that order, all occurrences") {
    val in = "mail a.b+c@x-corp.co.uk or bob@y.org, host 10.0.255.3, call 555-123-4567 then 800-000-1111"
    val got = Seq(in).toDF("text").select(TextAnalysis.redactPii(col("text"))).as[String].head()
    assert(got == "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE> then <PHONE>")
  }

  test("piiCount counts per rule on the raw text; digits inside an email are not a phone") {
    val Seq(emailPat, ipPat, phonePat) = TextAnalysis.piiRules.map(_._1)
    val in  = "u123@a.io 1.2.3.4 999-888-7777"
    val got = Seq(in)
      .toDF("text")
      .select(
        TextAnalysis.piiCount(col("text"), emailPat).as("e"),
        TextAnalysis.piiCount(col("text"), ipPat).as("i"),
        TextAnalysis.piiCount(col("text"), phonePat).as("p"))
      .as[(Long, Long, Long)]
      .head()
    assert(got == ((1L, 1L, 1L)))
    // the email's redaction must win before the phone rule sees its digits
    val red = Seq("x 123-456-7890@mail.com y")
      .toDF("text").select(TextAnalysis.redactPii(col("text"))).as[String].head()
    assert(red == "x <EMAIL> y")
  }

  test("gopher metrics: each rule's signal computes and flips on crafted texts") {
    def metrics(text: String): (Long, Double, Double, Double, Double, Long) = {
      Seq(text)
        .toDF("text")
        .select(split(col("text"), " ").as("tk"), split(col("text"), "\n").as("ln"), col("text"))
        .select(
          size(col("tk")).cast("long").as("nw"),
          TextAnalysis.meanTokenLen(col("tk")).as("mwl"),
          TextAnalysis.symbolRatio(col("text"), col("tk")).as("sym"),
          TextAnalysis.lineFrac(col("ln"), "^[\\-*•]").as("bullet"),
          TextAnalysis.alphaTokenFrac(col("tk")).as("alpha"),
          TextAnalysis.requiredWordHits(col("tk")).as("req"))
        .as[(Long, Double, Double, Double, Double, Long)]
        .head()
    }
    val clean = metrics("the cat sat with the dog and that was all they have seen of it")
    assert(clean._1 == 15 && clean._3 == 0.0 && clean._4 == 0.0)
    assert(clean._5 == 1.0, "all-alpha words")
    assert(clean._6 == 6, "the/with/and/that/have/of present")

    val symbols = metrics("x # y ... z ## w")
    assert(symbols._3 == 4.0 / 7, "three #'s + one ellipsis over 7 tokens")

    val bullets = metrics("- item one\n- item two\nplain line\n• third")
    assert(math.abs(bullets._4 - 0.75) < 1e-12, "3 of 4 lines bullet-led")

    val numeric = metrics("123 456 abc 789")
    assert(numeric._5 == 0.25, "one alpha word of four")

    // empty text: [\"\"] token array → zero mean length, no crash
    val empty = metrics("")
    assert(empty._1 == 1 && empty._2 == 0.0 && empty._6 == 0)
  }

  test("gopher required-word hits are case-insensitive and count types, not occurrences") {
    val got = Seq("The THE the of of")
      .toDF("text")
      .select(TextAnalysis.requiredWordHits(split(col("text"), " ")))
      .as[Long]
      .head()
    assert(got == 2L, "two distinct required words regardless of case/repeats")
  }

  test("adjacentPairs: in-order pairs; 0- and 1-token arrays yield empty") {
    val got = Seq("a b c b", "solo", "")
      .toDF("text")
      .select(TextAnalysis.adjacentPairs(split(col("text"), " ")).as("p"))
      .as[Seq[(String, String)]]
      .collect()
    assert(got(0) == Seq(("a", "b"), ("b", "c"), ("c", "b")))
    assert(got(1).isEmpty, "single token has no pairs")
    assert(got(2).isEmpty, "empty text splits to [\"\"] — still no pairs")
  }

  test("bm25: exact-match doc outranks partial; absent terms contribute nothing") {
    val docs = Seq(
      (1L, "spark merge window spark"),
      (2L, "spark scan scan scan"),
      (3L, "scan filter join scan")).toDF("doc_id", "text")
    val got = graft.llm.Bm25
      .topK(docs, "doc_id", "text", Seq("spark", "window", "merge"), k = 3)
      .orderBy("rn")
      .select("doc_id", "score")
      .as[(Long, Double)]
      .collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got(0)._2 > got(1)._2, "doc with all three terms wins")
    assert(got(2)._2 == 0.0, "no query terms → zero score")
  }

  test("bm25 idf is always positive (Lucene form), even for a term in every doc") {
    val docs = Seq((1L, "the a"), (2L, "the b"), (3L, "the c")).toDF("doc_id", "text")
    val got = graft.llm.Bm25
      .topK(docs, "doc_id", "text", Seq("the"), k = 3)
      .select("score")
      .as[Double]
      .collect()
    assert(got.forall(_ > 0.0), s"df = N must still score positive, got ${got.toSeq}")
  }

  test("weightedTake: deterministic, excludes nonpositive weights, ranks by jittered key") {
    import graft.llm.Sampling
    val docs = (1L to 100L).map(i => (i, if (i <= 5) 0L else i)).toDF("id", "w")
    val a = Sampling.weightedTake(docs, "id", "w", k = 10).select("id", "sample_rank")
    val b = Sampling.weightedTake(docs, "id", "w", k = 10).select("id", "sample_rank")
    assert(a.collect().toSeq == b.collect().toSeq, "same salt → same draw")
    val ids = a.as[(Long, Int)].collect().map(_._1)
    assert(ids.length == 10 && ids.forall(_ > 5L), "zero-weight rows never drawn")
    val other = Sampling.weightedTake(docs, "id", "w", k = 10, salt = "other")
    assert(
      other.select("id").as[Long].collect().toSeq != ids.toSeq,
      "different salt → different draw")
  }

  test("weightedTake favors heavy rows: total weight of the draw beats uniform expectation") {
    import graft.llm.Sampling
    // weights 1..200: weighted draw of 20 should carry well above the
    // uniform-draw expected weight sum (20 * 100.5)
    val docs = (1L to 200L).map(i => (i, i)).toDF("id", "w")
    val drawn = Sampling.weightedTake(docs, "id", "w", k = 20).select("w").as[Long].collect()
    assert(drawn.sum > 20 * 100.5, s"weighted draw too light: ${drawn.sum}")
  }

  test("bigramLogProbHoldout: unseen transitions get smoothing mass; train never scored") {
    import graft.llm.Vocab
    val train = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // "x y": neither bigram nor prefix in train → P = 0.5/(0.5*V) = 1/V, V = 3 types
    val test = Seq((10L, "x y"), (11L, "a b")).toDF("doc_id", "text")
    val got = Vocab
      .bigramLogProbHoldout(train, test, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Double, Long)]
      .collect()
    assert(got.map(_._1).toSeq == Seq(10L, 11L), "only test docs scored")
    assert(math.abs(got(0)._2 - math.log(1.0 / 3.0)) < 1e-12, "unseen bigram → ln(1/V)")
    // a->b seen 3 times of 3 a-prefixed bigrams: ln(3.5/(3 + 0.5*3))
    assert(math.abs(got(1)._2 - math.log(3.5 / 4.5)) < 1e-12)
  }

  test("bigramLogProb: higher-probability transitions score higher; short docs absent") {
    import graft.llm.Vocab
    val docs = Seq(
      (1L, "a b a b a b"), // only ever a->b / b->a transitions
      (2L, "a c b a x y"), // rare transitions
      (3L, "solo")).toDF("doc_id", "text")
    val got = Vocab
      .bigramLogProb(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Double, Long)]
      .collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L), "1-token doc has no bigrams")
    assert(got(0)._2 > got(1)._2, "repeated transitions beat one-off ones")
    assert(got(0)._3 == 5L && got(1)._3 == 5L)
  }
}
