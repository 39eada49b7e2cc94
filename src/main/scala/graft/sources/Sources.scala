package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink formats beyond the parquet tables ([[graft.core.Tables]])
  * and CSV ([[graft.flow.E2EPipeline.retrieveData]],
  * [[graft.core.CanonicalWriter]]): JSON-lines and ORC, the two other
  * formats a 100 TB lakehouse ingests routinely.
  *
  * Posture: both readers take an OPTIONAL declared schema. At scale a
  * declared schema is the right default — JSON inference is a full extra
  * pass over the data, and inference drift (a batch where an int column
  * happens to be all-null) silently changes downstream types. ORC scans
  * get the same predicate-pushdown/column-pruning treatment as parquet
  * (asserted in SourcesSpec), so filters written against these readers
  * reach the stripe level.
  */
object Sources {

  /** JSON-lines reader. `schema = None` infers (extra pass — test/dev
    * convenience); production passes the schema. Runs FAILFAST by default
    * on both paths: Spark's default PERMISSIVE mode silently nulls
    * malformed or type-drifted records — exactly the silent-corruption
    * class this reader exists to prevent. Pass `mode = "PERMISSIVE"`
    * explicitly to tolerate bad records instead.
    */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      mode: String = "FAILFAST"): DataFrame = {
    val r = spark.read.option("mode", mode)
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** One-line-per-record JSON sink (the interchange format for text/LLM
    * corpora). Overwrites.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC reader; schema optional as with [[readJsonl]] (ORC carries its
    * own schema, so the declared one just pins expectations).
    */
  def readOrc(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).orc(path)
  }

  /** ORC sink. Overwrites. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
}
