package graft

import graft.core.{CategoryInfo, GraftFrame}
import graft.na.WrangleNa
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Goldens ported from `/root/reference/src/tests/test_tasks.py:340–462`:
  * the 4-column frame (Int64, float, category, boolean with one NA each)
  * through cc / fi / fii / gm. The gm expected column set is the normative
  * patsy-naming spec.
  */
class WrangleNaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    val df = Seq(
      (Some(1L), Some(1.5), Some("A"), Some(false), 0L),
      (Some(2L), None, Some("A"), Some(true), 1L),
      (None, Some(2.5), Some("B"), Some(false), 2L),
      (Some(4L), Some(2.0), None, None, 3L)
    ).toDF("int_x", "float_x", "cat_x", "bool_x", "row_id")
    GraftFrame(
      df.select("int_x", "float_x", "cat_x", "bool_x", "row_id"),
      Map("cat_x" -> CategoryInfo(Seq("A", "B"), ordered = false)))
  }

  test("cc drops rows with any NA, preserving row identity") {
    val out = WrangleNa.cc(fixture, cols = Seq("int_x", "float_x", "cat_x", "bool_x"))
    assert(out.df.select("row_id").as[Long].collect().sorted.toSeq == Seq(0L))
  }

  test("fi: float←mean, int←median, cat/bool←mode (smallest-value tie-break)") {
    val out = WrangleNa.fi(fixture).df.orderBy("row_id")
    val rows = out.select("int_x", "float_x", "cat_x", "bool_x").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 2L, 4L))     // median 2 (stays long)
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 2.0, 2.5, 2.0)) // mean 2.0
    assert(rows.map(_.getString(2)).toSeq == Seq("A", "A", "B", "A")) // mode A
    assert(rows.map(_.getBoolean(3)).toSeq == Seq(false, true, false, false)) // mode false
  }

  test("fi returns input unchanged when frame has no NA") {
    val noNa = GraftFrame(Seq((1L, 1.5), (2L, 2.5)).toDF("a", "b"))
    assert(WrangleNa.fi(noNa).df eq noNa.df)
  }

  test("fii: indicator dummies per observed NA pattern, all-zeros omitted") {
    // pattern over (int_x, float_x, cat_x, bool_x, row_id)
    val gf  = fixture
    val out = WrangleNa.fii(gf.copy(df = gf.df.select("int_x", "float_x", "cat_x", "bool_x"))).df
    assert(
      out.columns.toSeq ==
        Seq("int_x", "float_x", "cat_x", "bool_x", "na_0011", "na_0100", "na_1000"))
    val rows = out
      .select("na_1000", "na_0100", "na_0011")
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.count(_._1) == 1 && rows.count(_._2) == 1 && rows.count(_._3) == 1)
  }

  test("gm: patsy-named interaction columns match the reference golden") {
    val gf  = fixture
    val out = WrangleNa.gm(gf.copy(df = gf.df.select("int_x", "float_x", "cat_x", "bool_x"))).df
    val expectedInteractions = Seq(
      """Q("cat_x")[A]:Q("na_0011")[False]""",
      """Q("cat_x")[B]:Q("na_0011")[False]""",
      """Q("cat_x")[A]:Q("na_0011")[True]""",
      """Q("cat_x")[B]:Q("na_0011")[True]""",
      """Q("cat_x")[A]:Q("na_0100")[T.True]""",
      """Q("cat_x")[B]:Q("na_0100")[T.True]""",
      """Q("cat_x")[A]:Q("na_1000")[T.True]""",
      """Q("cat_x")[B]:Q("na_1000")[T.True]""",
      """Q("bool_x")[T.True]:Q("na_0011")[False]""",
      """Q("bool_x")[T.True]:Q("na_0011")[True]""",
      """Q("bool_x")[T.True]:Q("na_0100")[T.True]""",
      """Q("bool_x")[T.True]:Q("na_1000")[T.True]""",
      """Q("int_x"):Q("na_0011")[False]""",
      """Q("int_x"):Q("na_0011")[True]""",
      """Q("int_x"):Q("na_0100")[T.True]""",
      """Q("int_x"):Q("na_1000")[T.True]""",
      """Q("float_x"):Q("na_0011")[False]""",
      """Q("float_x"):Q("na_0011")[True]""",
      """Q("float_x"):Q("na_0100")[T.True]""",
      """Q("float_x"):Q("na_1000")[T.True]""")
    assert(out.columns.filter(_.contains(":")).sorted.toSeq == expectedInteractions.sorted)

    // golden values (test_tasks.py:431–459), keyed by imputed row content
    val byInt = out.orderBy("int_x", "float_x").collect()
    def colIdx(n: String) = out.columns.indexOf(n)
    // row with int_x=4 (bool_x was NA → na_0011 true)
    val r4 = byInt.find(_.getLong(colIdx("int_x")) == 4L).get
    assert(r4.getDouble(colIdx("""Q("int_x"):Q("na_0011")[True]""")) == 4.0)
    assert(r4.getDouble(colIdx("""Q("cat_x")[A]:Q("na_0011")[True]""")) == 1.0)
    assert(r4.getDouble(colIdx("""Q("float_x"):Q("na_0011")[False]""")) == 0.0)
    // row with float_x NA (int_x=2) → na_0100
    val r2 = byInt.find(_.getLong(colIdx("int_x")) == 2L).get
    assert(r2.getDouble(colIdx("""Q("int_x"):Q("na_0100")[T.True]""")) == 2.0)
    assert(r2.getDouble(colIdx("""Q("bool_x")[T.True]:Q("na_0100")[T.True]""")) == 1.0)
    // row with int_x NA (imputed 2, cat B) → na_1000
    val r3 = byInt.find(r =>
      r.getLong(colIdx("int_x")) == 2L && r.getString(colIdx("cat_x")) == "B").get
    assert(r3.getDouble(colIdx("""Q("cat_x")[B]:Q("na_1000")[T.True]""")) == 1.0)
    assert(r3.getDouble(colIdx("""Q("float_x"):Q("na_1000")[T.True]""")) == 2.5)
  }

  test("fii fails fast past maxPatterns instead of collecting unbounded patterns") {
    // 8 nullable columns driven by row-id bits → ~200 distinct null
    // patterns over 200 rows (every id < 256 has a unique bit pattern)
    val wide = spark.range(200).select(
      (0 until 8).map(b =>
        when(col("id").bitwiseAND(1L << b) =!= 0L, col("id").cast("double")).as(s"c$b")) :+
        col("id").as("row_id"): _*)
    val err = intercept[IllegalArgumentException] {
      WrangleNa.fii(GraftFrame(wide), maxPatterns = 4)
    }
    assert(err.getMessage.contains("distinct null patterns"))
    // the same frame under a sufficient cap still works
    val ok = WrangleNa.fii(GraftFrame(wide), maxPatterns = 1024)
    assert(ok.df.columns.count(_.startsWith("na_")) > 4)
  }

  test("fi mode tie-break is numeric for numeric categoricals (2 beats 10)") {
    val gf = GraftFrame(
      Seq(Some(2L), Some(2L), Some(10L), Some(10L), None).toDF("yr"),
      Map("yr" -> CategoryInfo(Seq("2", "10"), ordered = false)))
    val filled = WrangleNa.fi(gf).df.where(col("yr").isNotNull)
    // tie between 2 and 10 → smallest VALUE wins (pandas mode().loc[0]),
    // not smallest string ("10" < "2")
    assert(WrangleNa.fi(gf).df.where(col("yr") === 2L).count() == 3)
    assert(filled.count() == 5)
  }

  test("gm does not mistake a pre-existing na_-prefixed column for an indicator") {
    val gf = GraftFrame(
      Seq((Some(1.0), 0.0), (None, 1.0), (Some(3.0), 0.0)).toDF("x", "na_flag"))
    val out = WrangleNa.gm(gf).df
    // na_flag is a FEATURE: it appears in interaction names on the left side
    assert(out.columns.exists(_.startsWith("""Q("na_flag"):""")))
    // and only the generated pattern column (na_10) acts as indicator
    assert(out.columns.filter(c => c.matches("na_[01]+")).toSeq == Seq("na_10"))
  }

  test("fi promotes int column to double when median is fractional") {
    val gf  = GraftFrame(Seq(Some(1L), Some(2L), None, Some(5L), None, Some(6L)).toDF("i"))
    val out = WrangleNa.fi(gf).df
    assert(out.schema("i").dataType.typeName == "double")
    val vals = out.as[Double].collect().sorted
    assert(vals.contains(3.5)) // median of {1,2,5,6}
  }
}
