package graft.viz

import graft.model.RegressionResult

/** Confidence-interval box-plot spec — reference `plot_confidence_intervals`
  * (`/root/reference/src/tasks.py:585–608`): stack the 95% CI bounds into a
  * tidy (regressor, interval, estimate) frame and emit a boxplot spec with
  * `x=regressor:O`, `y=estimate:Q`, width 200, height 500, themed.
  *
  * There is no Altair on the JVM, so we emit the Vega-Lite JSON directly;
  * each theme `config` block carries the same visual constants the
  * reference theme function sets (fonts, sizes, grid/label colors).
  * Both reference themes are ported: "streamlit"
  * (`/root/reference/src/styles.py:9–112`, the reference default) and
  * "ggplot2" (`styles.py:115–222`). They share every constant except the
  * view/axis block: ggplot2 fills the plot area grey with white gridlines
  * and no domain line; streamlit grids grey on white with a domain line.
  */
object ConfIntChart {

  // shared constants (both themes, styles.py: font/primary/font_color/grey,
  // base 16 → lg 20, sm 12.8)
  private val marksAndRanges: String =
    """  "arc": {"fill": "#F63366"},
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
      |  }""".stripMargin

  // streamlit axis (styles.py:41–52): grey grid on white, domain line,
  // white ticks
  private val streamlitAxis: String =
    """  "axis": {
      |    "titleFont": "IBM Plex Mono", "titleColor": "#262730", "titleFontSize": 12.8,
      |    "labelFont": "IBM Plex Mono", "labelColor": "#262730", "labelFontSize": 12.8,
      |    "gridColor": "#f0f2f6", "domainColor": "#262730", "tickColor": "#fff"
      |  }""".stripMargin

  // ggplot2 view+axis (styles.py:126, 144–158): grey plot fill, white grid
  // at full opacity, no domain line, font-colored ticks
  private val ggplot2ViewAxis: String =
    """  "view": {"fill": "#f0f2f6"},
      |  "axis": {
      |    "titleFont": "IBM Plex Mono", "titleColor": "#262730", "titleFontSize": 12.8,
      |    "labelFont": "IBM Plex Mono", "labelColor": "#262730", "labelFontSize": 12.8,
      |    "grid": true, "gridColor": "#fff", "gridOpacity": 1,
      |    "domain": false, "tickColor": "#262730"
      |  }""".stripMargin

  /** The theme `config` block for `"streamlit"` (default) or `"ggplot2"`. */
  def themeConfig(theme: String = "streamlit"): String = {
    val specific = theme match {
      case "streamlit" => streamlitAxis
      case "ggplot2"   => ggplot2ViewAxis
      case other       => throw new IllegalArgumentException(
        s"unknown theme '$other' (expected streamlit or ggplot2)")
    }
    s""""config": {
       |$specific,
       |$marksAndRanges
       |}""".stripMargin
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }

  /** Vega-Lite boxplot spec over the stacked CI values. */
  def vegaLiteSpec(res: RegressionResult, theme: String = "streamlit"): String = {
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
       |  ${themeConfig(theme)}
       |}""".stripMargin
  }
}
