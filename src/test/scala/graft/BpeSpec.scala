package graft

import graft.llm.Bpe
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // driver-side reference: the classic two-pointer greedy scan + full
  // retrain loop, against which the distributed fold is pinned
  private def refMergeOnce(toks: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i   = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) { out += (a + " " + b); i += 2 }
      else { out += toks(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(
      corpus: Seq[String],
      nMerges: Int,
      minCount: Long): Seq[(Int, String, String, Long)] = {
    var docs   = corpus.map(_.split(" ").toVector)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var m      = 1
    var go     = true
    while (m <= nMerges && go) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      docs.foreach { t =>
        var i = 0
        while (i + 1 < t.length) { counts((t(i), t(i + 1))) = counts.getOrElse((t(i), t(i + 1)), 0L) + 1; i += 1 }
      }
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minCount =>
          merges += ((m, a, b, c))
          docs = docs.map(refMergeOnce(_, a, b))
          m += 1
        case _ => go = false
      }
    }
    merges.result()
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat while the cat ran"),
    (2L, "the cat sat on a hat and the cat sat down"),
    (3L, "a a a a b b a a"), // overlapping-run stress: greedy non-overlap
    (4L, "x y x y x y x y"),
    (5L, "one-token"))

  test("trainMerges matches the reference greedy trainer merge for merge") {
    val want = refTrain(corpus.map(_._2), nMerges = 6, minCount = 2L)
    val got = Bpe
      .trainMerges(corpus.toDF("doc_id", "text"), "doc_id", "text", nMerges = 6, minCount = 2L)
      .select("merge_idx", "left", "right", "pair_count")
      .as[(Int, String, String, Long)]
      .collect()
      .sortBy(_._1)
      .toSeq
    assert(got == want)
  }

  test("merge application is the greedy non-overlapping scan") {
    val got = Bpe
      .applyMerges(Seq((1L, "a a a a a")).toDF("doc_id", "text"), "doc_id", "text",
        Seq(("a", "a")))
      .select("tk")
      .as[Seq[String]]
      .collect()
      .head
    // five a's: greedy left-to-right pairs (1,2) and (3,4), the fifth stays
    assert(got == Seq("a a", "a a", "a"))
  }

  test("training is deterministic and stops below minCount") {
    val df  = corpus.toDF("doc_id", "text")
    val one = Bpe.trainMerges(df, "doc_id", "text", nMerges = 20, minCount = 3L)
      .collect().map(_.toString).toSeq
    val two = Bpe.trainMerges(df, "doc_id", "text", nMerges = 20, minCount = 3L)
      .collect().map(_.toString).toSeq
    assert(one == two)
    // every recorded merge fired at least minCount times
    assert(Bpe.trainMerges(df, "doc_id", "text", nMerges = 20, minCount = 3L)
      .select("pair_count").as[Long].collect().forall(_ >= 3L))
  }

  test("encode round-trip: applyMerges over trained merges equals the reference rewrite") {
    val df     = corpus.toDF("doc_id", "text")
    val merges = Bpe
      .trainMerges(df, "doc_id", "text", nMerges = 6, minCount = 2L)
      .orderBy("merge_idx")
      .select("left", "right")
      .as[(String, String)]
      .collect()
      .toSeq
    val got = Bpe
      .applyMerges(df, "doc_id", "text", merges)
      .select("doc_id", "tk")
      .as[(Long, Seq[String])]
      .collect()
      .map { case (id, tk) => id -> tk.toVector }
      .toMap
    val want = corpus.map { case (id, txt) =>
      id -> merges.foldLeft(txt.split(" ").toVector) { case (t, (a, b)) => refMergeOnce(t, a, b) }
    }.toMap
    assert(got == want)
    // compression: never more tokens than the input, and the planted
    // repeats actually compress
    corpus.foreach { case (id, txt) =>
      assert(got(id).length <= txt.split(" ").length)
    }
    assert(got(4L).length < corpus.find(_._1 == 4L).get._2.split(" ").length)
  }

  test("string-replace kernel equals the reference scan on a randomized pathological corpus") {
    // seeded RNG over a 3-letter alphabet: maximal repeat runs and
    // boundary collisions — the shapes where a replace-kernel bug
    // (overlap handling, consumed delimiters, merged-token re-matching)
    // would surface. One Spark round-trip covers all 60 docs.
    val rnd = new scala.util.Random(20260813L)
    val alphabet = Vector("a", "b", "ab", "ba")
    val docs = (1L to 60L).map { id =>
      val len = rnd.nextInt(13) // 0..12 tokens
      id -> Vector.fill(len)(alphabet(rnd.nextInt(alphabet.size))).mkString(" ")
    }
    val nonEmpty = docs.filter(_._2.nonEmpty)
    val df = nonEmpty.toDF("doc_id", "text")

    val merges = Bpe
      .trainMerges(df, "doc_id", "text", nMerges = 4, minCount = 2L)
      .orderBy("merge_idx")
      .select("left", "right")
      .as[(String, String)]
      .collect()
      .toSeq
    assert(merges.nonEmpty, "fixture trained no merges; property is vacuous")

    val got = Bpe
      .applyMerges(df, "doc_id", "text", merges)
      .select("doc_id", "tk")
      .as[(Long, Seq[String])]
      .collect()
      .map { case (id, tk) => id -> tk.toVector }
      .toMap
    nonEmpty.foreach { case (id, txt) =>
      val want = merges.foldLeft(txt.split(" ").toVector) { case (t, (a, b)) =>
        refMergeOnce(t, a, b)
      }
      assert(got(id) == want, s"doc $id diverged: got ${got(id)}, want $want (text: $txt)")
    }
    // and the trainer itself agrees with the driver reference end to end
    val wantMerges = refTrain(nonEmpty.map(_._2), nMerges = 4, minCount = 2L)
      .map { case (_, a, b, _) => (a, b) }
    assert(merges == wantMerges)
  }

  test("token-table trainer is bit-identical to the packed-string kernel") {
    // the randomized pathological corpus again — overlap runs, boundary
    // collisions, merged-token re-matching — now as a cross-KERNEL gate:
    // same merges, same counts, same order from both physical strategies
    val rnd      = new scala.util.Random(20260814L)
    val alphabet = Vector("a", "b", "ab", "ba", "b a")
    val docs = (1L to 80L)
      .map { id =>
        val len = rnd.nextInt(13)
        id -> Vector.fill(len)(alphabet(rnd.nextInt(alphabet.size))).mkString(" ")
      }
      .filter(_._2.nonEmpty)
    val df = docs.toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("merge_idx").collect().map(_.toString).toSeq
    val tokenTable = rows(Bpe.trainMerges(df, "doc_id", "text", nMerges = 6, minCount = 2L))
    val packed = rows(Bpe.trainMergesPacked(df, "doc_id", "text", nMerges = 6, minCount = 2L))
    assert(tokenTable.nonEmpty, "fixture trained no merges; parity is vacuous")
    assert(tokenTable == packed)
  }

  test("delimiter guard fires in both kernels") {
    val bad = Seq((1L, "ok ok"), (2L, ("bad" + "\u0001" + "token ok"))).toDF("doc_id", "text")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause).filter(_ != null))
    val e1 = intercept[Exception] {
      Bpe.trainMerges(bad, "doc_id", "text", nMerges = 2, minCount = 2L).collect()
    }
    assert(messages(e1).exists(m => m != null && m.contains("U+0001")))
    val e2 = intercept[Exception] {
      Bpe.trainMergesPacked(bad, "doc_id", "text", nMerges = 2, minCount = 2L).collect()
    }
    assert(messages(e2).exists(m => m != null && m.contains("U+0001")))
  }

  test("merged tokens feed later rounds (hierarchy forms)") {
    // "x y" dominates, then ("x y", "x y") becomes a countable pair
    val df = Seq((1L, "x y x y x y x y"), (2L, "x y x y")).toDF("doc_id", "text")
    val got = Bpe
      .trainMerges(df, "doc_id", "text", nMerges = 2, minCount = 2L)
      .select("merge_idx", "left", "right")
      .as[(Int, String, String)]
      .collect()
      .sortBy(_._1)
      .toSeq
    assert(got == Seq((1, "x", "y"), (2, "x y", "x y")))
  }
}
