package graft

import java.nio.file.Files

import graft.clean.CleanData
import graft.core.GraftFrame
import graft.na.WrangleNa
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference suite's inline CSV fixtures
  * (`/root/reference/src/tests/test_tasks.py:28–113`): the pandas NA
  * sentinel list, `us_consump_1940s`, `iraq_vote`, and `airquality_na`
  * with its documented imputation golden (test_tasks.py:78–80, 93–105) and
  * complete-case survivors (test_tasks.py:340–349).
  */
class GoldenFixturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** test_tasks.py:28–47 — strings pandas recognises as NA. */
  private val strNaValues: Seq[Any] = Seq(
    "-1.#IND", "1.#QNAN", "1.#IND", "-1.#QNAN", "#N/A N/A", "#N/A", "N/A",
    "n/a", "NA", "<NA>", "#NA", "NULL", "null", "NaN", "-NaN", "nan", "-nan", "")

  private def readCsv(body: String): DataFrame = {
    val path = Files.createTempFile("fixture", ".csv")
    Files.writeString(path, body.stripMargin.trim)
    // all-string read: sentinel handling happens in the engine (parseStrings)
    spark.read.option("header", "true").csv(path.toString)
  }

  private val airqualityNa =
    """row_id,Ozone,Solar.R,Wind,fake_dummy
      |0,41,190,7.4,0
      |1,36,118,8,0
      |2,12,149,12.6,0
      |3,NA,313,11.5,1
      |4,NA,,14.3,1
      |5,28,,14.9,1
      |6,23,299,8.6,1
      |7,19,99,13.8,1
      |8,8,19,20.1,1
      |9,NA,194,NULL,n/a"""

  private def airqualityTyped: DataFrame =
    CleanData.parseStrings(CleanData.replaceNa(readCsv(airqualityNa), strNaValues))

  test("airquality cc: survivors are rows 0,1,2,6,7,8") {
    val out = WrangleNa.cc(GraftFrame(airqualityTyped)).df
    assert(out.select("row_id").as[Double].collect().sorted.toSeq ==
      Seq(0.0, 1.0, 2.0, 6.0, 7.0, 8.0))
  }

  test("airquality fi matches the documented imputation golden") {
    // means: Ozone 23.85714…, Solar.R 172.625, Wind 12.35556…; the dummy
    // col is boolean by this point (airquality_imputed fills it with the
    // MODE 1, which presumes dummy_to_bool ran first, as in clean_data)
    val typed = CleanData.factorWrangler(
      GraftFrame(airqualityTyped), strToCat = false, dummyToBool = true)
    val out  = WrangleNa.fi(typed).df.orderBy("row_id")
    val rows = out.collect()
    def d(r: Int, c: String) = rows(r).getAs[Double](c)
    assert(math.abs(d(3, "Ozone") - 23.857142857142858) < 1e-9)
    assert(math.abs(d(4, "Ozone") - 23.857142857142858) < 1e-9)
    assert(math.abs(d(4, "Solar.R") - 172.625) < 1e-9)
    assert(math.abs(d(5, "Solar.R") - 172.625) < 1e-9)
    assert(math.abs(d(9, "Wind") - 12.355555555555556) < 1e-9)
    assert(rows(9).getAs[Boolean]("fake_dummy") == true) // mode 1
    assert(out.na.drop().count() == 10)
  }

  test("airquality factor wrangler: fake_dummy {0,1,NA} becomes boolean with NA kept") {
    val out = CleanData.factorWrangler(
      GraftFrame(airqualityTyped), strToCat = false, dummyToBool = true).df
    assert(out.schema("fake_dummy").dataType.typeName == "boolean")
    val vals = out.orderBy("row_id").select("fake_dummy").collect().map(r => Option(r.get(0)))
    assert(vals.take(3).forall(_.contains(false)))
    assert(vals.slice(3, 9).forall(_.contains(true)))
    assert(vals(9).isEmpty)
  }

  test("us_consump_1940s: quoted ints parse, war becomes boolean, trailing col dropped") {
    val body =
      """row_id,year,income,expenditure,war,
        |0,"1940",241,226,0,
        |1,"1941",280,240,0,
        |2,"1942",319,235,1,
        |3,"1943",331,245,1,
        |4,"1944",345,255,1,
        |5,"1945",340,265,1,
        |6,"1946",332,295,0,
        |7,"1947",320,300,0,
        |8,"1948",339,305,0,
        |9,"1949",338,315,0,"""
    val raw = readCsv(body)
    val unnamed = raw.columns.filter(c => c.contains("Unnamed") || c.startsWith("_c"))
    val gf  = CleanData(raw.drop(unnamed.toIndexedSeq: _*), naValues = strNaValues)
    val types = gf.df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("year") == "long")
    assert(types("income") == "long")
    assert(types("war") == "boolean")
    assert(!gf.df.columns.exists(_.startsWith("_c")))
  }

  test("retrieve_data reads TSV via the sep parameter") {
    val path = Files.createTempFile("fixture", ".tsv")
    Files.writeString(path, "a\tb\n1\t2.5\n3\t4.5")
    val df = graft.flow.E2EPipeline.retrieveData(spark, path.toString, sep = "\t")
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.count() == 2)
    assert(df.schema("b").dataType.typeName == "double")
  }

  test("iraq_vote clean_data: strings to categoricals, y/rep to boolean") {
    val body =
      """row_id,y,state.abb,name,rep,state.name,gorevote
        |0,1,"AL","SESSIONS (R AL)",TRUE,"Alabama",41.59
        |1,0,"CA","BOXER (D CA)",FALSE,"California",53.45
        |2,0,"HI","INOUYE (D HI)",FALSE,"Hawaii",55.79
        |3,1,"ID","CRAIG (R ID)",TRUE,"Idaho",27.64
        |4,1,"ID","CRAPO (R ID)",TRUE,"Idaho",27.64
        |5,0,"IL","DURBIN (D IL)",FALSE,"Illinois",54.6
        |6,1,"IL","FITZGERALD (R IL)",TRUE,"Illinois",54.6
        |7,0,"VT","LEAHY (D VT)",FALSE,"Vermont",50.63
        |8,1,"VA","WARNER (R VA)",TRUE,"Virginia",44.44
        |9,1,"WA","CANTWELL (D WA)",FALSE,"Washington",50.13"""
    val gf = CleanData(readCsv(body), naValues = strNaValues)
    val types = gf.df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("y") == "boolean")        // {0,1} dummy-detected
    assert(types("rep") == "boolean")      // TRUE/FALSE parsed
    assert(types("gorevote") == "double")
    assert(gf.cats.keySet == Set("state.abb", "name", "state.name"))
    assert(gf.cats("state.abb").categories.head == "AL") // alphanumeric order
  }
}
