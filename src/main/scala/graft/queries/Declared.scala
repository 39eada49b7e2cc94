package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared, oracle-checked query: a Spark implementation plus (when
  * SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB over
  * the same parquet tables (SURVEY.md §5).
  *
  * Determinism contract for hash-exact comparison (SURVEY.md §7.4.6):
  * every query ends in a TOTAL-order `ORDER BY`; every order-dependent
  * float aggregate is rounded on BOTH sides (2 dp for large sums, 4–6 dp
  * for means/ratios); count-ish outputs are BIGINT on both sides (DuckDB
  * `sum(BIGINT)` returns HUGEINT and must be cast back); column names and
  * order match exactly.
  */
final case class Declared(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Declared {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Declared =
    Declared(name, run, Some(oracle))

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Declared =
    Declared(name, run, None)
}
