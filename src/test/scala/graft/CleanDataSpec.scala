package graft

import graft.clean.CleanData
import graft.core.{CategoryInfo, GraftFrame, Sanitize}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests ported from the reference suite
  * (`/root/reference/src/tests/test_tasks.py`): clean_text /
  * sanitize_col_names (150–162), column wrangler, dummy detection and
  * category declaration (183–257).
  */
class CleanDataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clean_text: strip, collapse spaces to _, lowercase") {
    assert(Sanitize.cleanText("column1") == "column1")
    assert(Sanitize.cleanText("cOLUmn2") == "column2")
    assert(Sanitize.cleanText("    cOLUmn3 ") == "column3")
    assert(Sanitize.cleanText(" column  4 ") == "column_4")
  }

  test("sanitize_col_names returns None for empty input") {
    assert(Sanitize.sanitizeColNames(Nil).isEmpty)
    assert(Sanitize.sanitizeColNames(null).isEmpty)
    assert(
      Sanitize.sanitizeColNames(Seq("column1", "cOLUmn2", "    cOLUmn3 ", " column  4 "))
        .contains(Seq("column1", "column2", "column3", "column_4")))
  }

  test("column wrangler renames all columns") {
    val df  = Seq((1, 2, 3, 4)).toDF("column1", "cOLUmn2", "    cOLUmn3 ", " column  4 ")
    val out = Sanitize.columnWrangler(df)
    assert(out.columns.toSeq == Seq("column1", "column2", "column3", "column_4"))
  }

  test("dummy detection: sum-of-distinct==1 heuristic incl. quirk") {
    // {0,1} converts; {0,1,null} converts; {1} converts; {2,-1} converts
    // (sum-based quirk); {0,2} does not
    val df = Seq(
      (0, 0, Some(1), 1, 2, 0),
      (1, 1, None, 1, -1, 2)
    ).toDF("b01", "b01b", "bnull", "just1", "quirk", "no")
    val out = CleanData.factorWrangler(GraftFrame(df), strToCat = false)
    val types = out.df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("b01") == "boolean")
    assert(types("b01b") == "boolean")
    assert(types("bnull") == "boolean")
    assert(types("just1") == "boolean")
    assert(types("quirk") == "boolean") // the reference's sum-based quirk
    assert(types("no") == "integer")
  }

  test("declared categories: out-of-set values become null, order follows list") {
    val df = Seq("a", "b", "c", "z").toDF("cat")
    val out =
      CleanData.factorWrangler(GraftFrame(df), categories = Map("cat" -> Seq("b", "a", "c")))
    val vals = out.df.collect().map(r => Option(r.getString(0)))
    assert(vals.toSeq == Seq(Some("a"), Some("b"), Some("c"), None))
    assert(out.cats("cat") == CategoryInfo(Seq("b", "a", "c"), ordered = false))
  }

  test("default category order is alphanumeric; ordered flag set") {
    val df  = Seq("delta", "alpha", "charlie").toDF("cat")
    val out = CleanData.factorWrangler(GraftFrame(df), orderedCols = Seq("cat"))
    assert(out.cats("cat") == CategoryInfo(Seq("alpha", "charlie", "delta"), ordered = true))
  }

  test("replaceNa with string sentinels is safe on numeric columns under ANSI") {
    val df = Seq((1.5, "NA", 10L), (2.5, "x", -999L)).toDF("d", "s", "i")
    val out = CleanData.replaceNa(df, Seq("NA", "NULL", "", -999))
    val rows = out.orderBy("d").collect()
    assert(rows(0).getDouble(0) == 1.5)          // numeric untouched by string sentinels
    assert(rows(0).isNullAt(1))                  // "NA" nulled in string col
    assert(rows(1).isNullAt(2))                  // numeric sentinel nulls numeric col
    assert(rows(0).getLong(2) == 10L)
  }

  test("dummy detection ignores NaN in the distinct set (np.nansum parity)") {
    val df = Seq(Some(0.0), Some(1.0), Some(Double.NaN)).toDF("d")
    val out = CleanData.factorWrangler(core.GraftFrame(df), strToCat = false)
    assert(out.df.schema("d").dataType.typeName == "boolean")
  }

  test("convert_dtypes tightens integer-valued doubles to long") {
    val df  = Seq((1.0, 1.5), (2.0, 2.5)).toDF("intish", "frac")
    val out = CleanData.convertDtypes(df)
    val types = out.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("intish") == "long")
    assert(types("frac") == "double")
  }

  test("cardinality gate: high-distinct string column is never collect_set as categorical") {
    val df = (1 to 200)
      .map(i => (s"id_$i", if (i % 2 == 0) "a" else "b"))
      .toDF("free_text", "lowcard")
    val out = CleanData.factorWrangler(GraftFrame(df), strToCat = true, maxCategories = 10)
    assert(!out.cats.contains("free_text")) // gated out: ~200 distinct > 10
    assert(out.cats.get("lowcard").map(_.categories).contains(Seq("a", "b")))
    // a declared category list bypasses the gate (no distinct-set job needed)
    val declared = CleanData.factorWrangler(
      GraftFrame(df),
      categories = Map("free_text" -> Seq("id_1", "id_2")),
      strToCat = true,
      maxCategories = 10)
    assert(declared.cats.get("free_text").map(_.categories).contains(Seq("id_1", "id_2")))
  }
}
