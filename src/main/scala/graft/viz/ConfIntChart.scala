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

  /** The "streamlit" theme constants ported from styles.py:9–112 (font
    * IBM Plex Mono; primary #F63366; font color #262730; grey #f0f2f6;
    * base size 16 → lg 20, sm 12.8; category/diverging/heatmap ranges
    * verbatim).
    */
  private val themeConfig: String =
    """"config": {
      |  "arc": {"fill": "#F63366"},
      |  "area": {"fill": "#F63366"},
      |  "circle": {"fill": "#F63366", "stroke": "#262730", "strokeWidth": 0.5},
      |  "line": {"stroke": "#F63366"},
      |  "path": {"stroke": "#F63366"},
      |  "point": {"stroke": "#F63366"},
      |  "rect": {"fill": "#F63366"},
      |  "shape": {"stroke": "#F63366"},
      |  "symbol": {"fill": "#F63366"},
      |  "title": {"font": "IBM Plex Mono", "color": "#262730",
      |            "fontSize": 20, "anchor": "start"},
      |  "axis": {
      |    "titleFont": "IBM Plex Mono", "titleColor": "#262730", "titleFontSize": 12.8,
      |    "labelFont": "IBM Plex Mono", "labelColor": "#262730", "labelFontSize": 12.8,
      |    "gridColor": "#f0f2f6", "domainColor": "#262730", "tickColor": "#fff"
      |  },
      |  "header": {"labelFont": "IBM Plex Mono", "titleFont": "IBM Plex Mono",
      |             "labelFontSize": 16, "titleFontSize": 16},
      |  "legend": {
      |    "titleFont": "IBM Plex Mono", "titleColor": "#262730", "titleFontSize": 12.8,
      |    "labelFont": "IBM Plex Mono", "labelColor": "#262730", "labelFontSize": 12.8
      |  },
      |  "range": {
      |    "category": ["#f63366", "#fffd80", "#0068c9", "#ff2b2b", "#09ab3b"],
      |    "diverging": ["#850018", "#cd1549", "#f6618d", "#fbafc4", "#f5f5f5",
      |                  "#93c5fe", "#5091e6", "#1d5ebd", "#002f84"],
      |    "heatmap": ["#ffb5d4", "#ff97b8", "#ff7499", "#fc4c78", "#ec245f",
      |                "#d2004b", "#b10034", "#91001f", "#720008"],
      |    "ramp": ["#ffb5d4", "#ff97b8", "#ff7499", "#fc4c78", "#ec245f",
      |             "#d2004b", "#b10034", "#91001f", "#720008"],
      |    "ordinal": ["#ffb5d4", "#ff97b8", "#ff7499", "#fc4c78", "#ec245f",
      |                "#d2004b", "#b10034", "#91001f", "#720008"]
      |  }
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
