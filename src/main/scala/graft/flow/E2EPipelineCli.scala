package graft.flow

import graft.core.GraftSession

/** CLI for the end-to-end pipeline (SURVEY.md §7.5 minimum slice):
  *
  * {{{
  * sbt "runMain graft.flow.E2EPipelineCli --url /path/data.csv \
  *      --endog y --exog x1,x2 [--sep ,] [--cat-cols year] \
  *      [--na-strategy cc] [--transf-cols x1] [--transf-func arcsinh] \
  *      [--spec-out /tmp/ci_spec.json]"
  * }}}
  *
  * Prints the OLS coefficient table with 95% CIs and writes the Vega-Lite
  * box-plot spec JSON.
  */
object E2EPipelineCli {

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) if k.startsWith("--") => k.drop(2) -> v }.toMap
    def list(k: String): Seq[String] =
      opts.get(k).map(_.split(",").toIndexedSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)

    val cfg = PipelineConfig(
      url = opts.getOrElse("url", sys.error("--url is required")),
      sep = opts.getOrElse("sep", ","),
      nrows = opts.get("nrows").map(_.toInt),
      catCols = list("cat-cols"),
      orderedCols = list("ordered-cols"),
      naValues = list("na-values"),
      naStrategy = opts.getOrElse("na-strategy", "cc"),
      transfCols = list("transf-cols"),
      transfFunc = opts.getOrElse("transf-func", "arcsinh"),
      endog = opts.getOrElse("endog", sys.error("--endog is required")),
      exog = list("exog"))

    val spark = GraftSession.local()
    try {
      val res = E2EPipeline.run(spark, cfg)
      res.model.summaryDf(spark).show(100, truncate = false)
      val out = opts.getOrElse("spec-out", "ci_spec.json")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out), res.chartSpec)
      println(s"vega-lite spec written to $out")
    } finally spark.stop()
  }
}
