package graft.viz

import graft.model.RegressionResult

/** Confidence-interval box-plot spec — reference `plot_confidence_intervals`
  * (`/root/reference/src/tasks.py:585–608`): stack the 95% CI bounds into a
  * tidy (regressor, interval, estimate) frame and emit a boxplot spec with
  * `x=regressor:O`, `y=estimate:Q`, width 200, height 500, under the
  * "streamlit" theme (theme dict `/root/reference/src/styles.py:9–112`).
  *
  * There is no Altair on the JVM, so we emit the Vega-Lite JSON directly;
  * the theme `config` block carries the same visual constants the reference
  * theme sets (fonts, sizes, grid/label colors).
  */
object ConfIntChart {

  /** Minimal port of the streamlit theme constants (styles.py:19–111). */
  private val themeConfig: String =
    """"config": {
      |  "background": "#FFFFFF",
      |  "axis": {
      |    "labelFontSize": 12, "titleFontSize": 14,
      |    "gridColor": "#E6EAF1", "labelColor": "#31333F",
      |    "titleColor": "#31333F", "titleFontWeight": "normal"
      |  },
      |  "legend": {"labelFontSize": 12, "titleFontSize": 14,
      |    "labelColor": "#31333F", "titleColor": "#31333F"},
      |  "title": {"fontSize": 16, "color": "#31333F", "anchor": "start"}
      |}""".stripMargin

  private def esc(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }

  /** Vega-Lite boxplot spec over the stacked CI values. */
  def vegaLiteSpec(res: RegressionResult): String = {
    val values = res.regressors.indices
      .flatMap { i =>
        Seq(
          s"""{"regressor": "${esc(res.regressors(i))}", "interval": "lower", "estimate": ${res.ciLower(i)}}""",
          s"""{"regressor": "${esc(res.regressors(i))}", "interval": "upper", "estimate": ${res.ciUpper(i)}}""")
      }
      .mkString(",\n    ")
    s"""{
       |  "$$schema": "https://vega.github.io/schema/vega-lite/v5.json",
       |  "width": 200,
       |  "height": 500,
       |  "data": {"values": [
       |    $values
       |  ]},
       |  "mark": {"type": "boxplot"},
       |  "encoding": {
       |    "x": {"field": "regressor", "type": "ordinal"},
       |    "y": {"field": "estimate", "type": "quantitative"}
       |  },
       |  $themeConfig
       |}""".stripMargin
  }
}
