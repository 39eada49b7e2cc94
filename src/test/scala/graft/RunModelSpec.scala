package graft

import graft.model.RunModel
import graft.rel.AsOfJoin
import graft.viz.ConfIntChart
import org.scalatest.funsuite.AnyFunSuite

/** OLS against numpy-computed normal-equations golden (same math as the
  * reference's `sm.OLS`, `/root/reference/src/tasks.py:561–580`), as-of
  * join semantics, and the Vega-Lite chart spec shape
  * (test_tasks.py:644–670).
  */
class RunModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no-intercept OLS matches numpy normal equations (coef/se/t/CI)") {
    val df = Seq(
      (1.0, 2.0, 2.0), (2.0, 1.0, 3.0), (3.0, 4.0, 7.0), (4.0, 3.0, 8.0), (5.0, 6.0, 12.0))
      .toDF("x1", "x2", "y")
    val res = RunModel(df, "y", Seq("x1", "x2"))
    assert(res.regressors == Seq("x1", "x2"))
    // numpy: beta=[1.45864662, 0.70300752] se=[0.34146433, 0.31171286]
    //        t=[4.27173941, 2.25530486]; t_{0.975,3}=3.182446305
    assert(math.abs(res.coef(0) - 1.45864662) < 1e-7)
    assert(math.abs(res.coef(1) - 0.70300752) < 1e-7)
    assert(math.abs(res.stderr(0) - 0.34146433) < 1e-7)
    assert(math.abs(res.stderr(1) - 0.31171286) < 1e-7)
    assert(math.abs(res.tstat(0) - 4.27173941) < 1e-7)
    val tq = 3.182446305284263
    assert(math.abs(res.ciLower(0) - (res.coef(0) - tq * res.stderr(0))) < 1e-9)
    assert(math.abs(res.ciUpper(1) - (res.coef(1) + tq * res.stderr(1))) < 1e-9)
  }

  test("regressor selection is substring-based incl. x1 ⊇ x12 quirk") {
    assert(
      RunModel.selectRegressors(Seq("y", "x1", "x12", "cat_A", "other"), "y", Seq("x1", "cat")) ==
        Seq("x1", "x12", "cat_A"))
  }

  test("chart spec is a vega-lite boxplot with stacked CI values") {
    val df   = Seq((1.0, 2.1), (2.0, 4.2), (3.0, 6.1)).toDF("x1", "y")
    val spec = ConfIntChart.vegaLiteSpec(RunModel(df, "y", Seq("x1")))
    assert(spec.contains("\"mark\": {\"type\": \"boxplot\"}"))
    assert(spec.contains("\"width\": 200"))
    assert(spec.contains("\"height\": 500"))
    assert(spec.contains("\"regressor\": \"x1\", \"interval\": \"lower\""))
    assert(spec.contains("\"field\": \"estimate\", \"type\": \"quantitative\""))
  }

  test("both reference themes are selectable and carry their distinct constants") {
    val df = Seq((1.0, 2.1), (2.0, 4.2), (3.0, 6.1)).toDF("x1", "y")
    val model = RunModel(df, "y", Seq("x1"))
    val st = ConfIntChart.vegaLiteSpec(model) // streamlit default
    // streamlit (styles.py:41-52): grey grid, domain line, white ticks
    assert(st.contains("\"gridColor\": \"#f0f2f6\""))
    assert(st.contains("\"domainColor\": \"#262730\""))
    assert(st.contains("\"tickColor\": \"#fff\""))
    assert(!st.contains("\"view\""))
    val gg = ConfIntChart.vegaLiteSpec(model, theme = "ggplot2")
    // ggplot2 (styles.py:126,144-158): grey view fill, white grid, no domain
    assert(gg.contains("\"view\": {\"fill\": \"#f0f2f6\"}"))
    assert(gg.contains("\"gridColor\": \"#fff\""))
    assert(gg.contains("\"domain\": false"))
    assert(gg.contains("\"tickColor\": \"#262730\""))
    // shared constants present in both
    Seq(st, gg).foreach { s =>
      assert(s.contains("\"font\": \"IBM Plex Mono\""))
      assert(s.contains("\"category\": [\"#f63366\", \"#fffd80\", \"#0068c9\", \"#ff2b2b\", \"#09ab3b\"]"))
    }
    intercept[IllegalArgumentException](ConfIntChart.vegaLiteSpec(model, theme = "nope"))
  }

  test("as-of join picks latest right row at or before left time, inclusive") {
    val quotes = Seq(
      (1L, "2024-01-01 00:00:00", 10.0),
      (1L, "2024-01-01 00:05:00", 11.0),
      (2L, "2024-01-01 00:03:00", 20.0))
      .toDF("qk", "qt", "px")
      .selectExpr("qk", "cast(qt as timestamp) qt", "px")
    val trades = Seq(
      (1L, "2024-01-01 00:04:59", 100L), // before second quote → 10.0
      (1L, "2024-01-01 00:05:00", 101L), // equal time → inclusive → 11.0
      (2L, "2024-01-01 00:02:00", 102L), // before any quote → null
      (3L, "2024-01-01 00:10:00", 103L)) // no key match → null
      .toDF("tk", "tt", "tid")
      .selectExpr("tk", "cast(tt as timestamp) tt", "tid")
    val out = AsOfJoin(trades, "tk", "tt", quotes, "qk", "qt")
      .select("tid", "px")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out(100L).contains(10.0))
    assert(out(101L).contains(11.0))
    assert(out(102L).isEmpty)
    assert(out(103L).isEmpty)
  }

  test("as-of join tolerance drops matches older than the lookback window") {
    val quotes = Seq((1L, "2024-01-01 00:00:00", 10.0))
      .toDF("qk", "qt", "px")
      .selectExpr("qk", "cast(qt as timestamp) qt", "px")
    val trades = Seq(
      (1L, "2024-01-01 00:04:00", 100L), // 4 min after quote → within 5 min
      (1L, "2024-01-01 00:06:00", 101L)) // 6 min after → outside tolerance
      .toDF("tk", "tt", "tid")
      .selectExpr("tk", "cast(tt as timestamp) tt", "tid")
    val out = AsOfJoin(trades, "tk", "tt", quotes, "qk", "qt", tolerance = Some("5 MINUTES"))
      .select("tid", "px")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
      .toMap
    assert(out(100L).contains(10.0))
    assert(out(101L).isEmpty)
  }

  test("as-of join matches every left row at duplicate (key, time) points") {
    val quotes = Seq((1L, "2024-01-01 00:00:00", 10.0))
      .toDF("qk", "qt", "px")
      .selectExpr("qk", "cast(qt as timestamp) qt", "px")
    val trades = Seq(
      (1L, "2024-01-01 00:01:00", 100L),
      (1L, "2024-01-01 00:01:00", 101L))
      .toDF("tk", "tt", "tid")
      .selectExpr("tk", "cast(tt as timestamp) tt", "tid")
    val out = AsOfJoin(trades, "tk", "tt", quotes, "qk", "qt")
      .select("tid", "px").collect()
    assert(out.length == 2)
    assert(out.forall(_.getDouble(1) == 10.0))
  }
}
