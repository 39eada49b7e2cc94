package graft

import graft.core.{GraftFrame, Tables}
import graft.model.RunModel
import graft.queries.Declared
import graft.transform.GelmanStandardize
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared, oracle-checked operator inventory (SURVEY.md
  * §2): each entry has a Spark implementation and, for SQL-expressible ops,
  * a DuckDB oracle in `oracleSql` with matching column names/order and
  * total-order sorting.
  */
object SparkEntry {

  private val declared: Seq[Declared] =
    graft.rel.RelQueries.all ++
      graft.stream.EventQueries.all ++
      graft.llm.TextQueries.all ++
      graft.llm.SimilarityQueries.all ++
      graft.multimodal.MultimodalQueries.all ++
      graft.prep.PrepQueries.all

  /** Flagship: the reference's end-to-end semantics on testdata — Gelman-
    * standardize the lineitem measures, then no-intercept OLS of price on
    * quantity/discount/tax via the one-pass Gram-matrix aggregate;
    * returns the coefficient/CI summary (rows > 0).
    */
  def entry(spark: SparkSession): DataFrame = {
    val li = Tables(spark, "/root/testdata/sf0.001").lineitem
      .select("l_extendedprice", "l_quantity", "l_discount", "l_tax")
    val standardized = GelmanStandardize(GraftFrame(li)).df
    val res = RunModel(standardized, "l_extendedprice", Seq("l_quantity", "l_discount", "l_tax"))
    res.summaryDf(spark)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    declared.collect { case Declared(name, _, Some(sql)) => name -> sql }.toMap
}
