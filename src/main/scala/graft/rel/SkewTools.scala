package graft.rel

import graft.core.Cols
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale tooling for skewed and repeated joins (SURVEY.md §2B, build-rule
  * "Partitioning & shuffle").
  *
  * AQE's skew-join handling covers sort-merge joins automatically; explicit
  * salting remains the tool when one hot key dominates a shuffled hash join
  * or an aggregation. Bucketing pre-shuffles a table ONCE at write time so
  * every subsequent equi-join/agg on the bucket key runs shuffle-free —
  * the right trade at 100 TB for dimension↔fact joins repeated per query.
  */
object SkewTools {

  /** Types `hash()` can't digest: MapType anywhere in the type tree
    * (Spark's hash expression rejects maps — unordered entries have no
    * canonical hash) — such columns are excluded from the salt hash.
    */
  private def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType      => false
      case ArrayType(e, _) => hashable(e)
      case StructType(fs)  => fs.forall(f => hashable(f.dataType))
      case _               => true
    }
  }

  /** Deterministic probe-side salt: hash of the hashable row columns plus
    * `spark_partition_id()`. Row-dependent (a hot KEY spreads), retry-safe
    * (a re-run task recomputes the same partition, so the same salt —
    * unlike `monotonically_increasing_id`/`rand`), and the partition-id
    * term spreads exact-DUPLICATE rows of a hot key that land in different
    * partitions instead of colliding them all onto one salt.
    */
  private[graft] def probeSalt(probe: DataFrame, salts: Int): org.apache.spark.sql.Column = {
    val cols = probe.schema.fields.toIndexedSeq
      .filter(f => hashable(f.dataType))
      .map(f => Cols.q(f.name))
    pmod(hash(cols :+ spark_partition_id(): _*), lit(salts))
  }

  /** Salted inner equi-join: the build side is replicated `salts` ways, the
    * probe side gets a deterministic salt from its row hash ([[probeSalt]]),
    * and the join key becomes (key, salt) — a hot key now spreads over
    * `salts` partitions instead of one straggler task.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      salts: Int = 8): DataFrame = {
    val salted = probe.withColumn("__salt", probeSalt(probe, salts))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Write both sides bucketed+sorted on the join key; joins between the
    * returned tables are planned WITHOUT an Exchange (verified in
    * SkewToolsSpec). `buckets` should match the cluster's target partition
    * count for the table's size at scale.
    */
  def writeBucketed(
      spark: SparkSession,
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int = 8): DataFrame = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a previously-crashed write can leave an orphan managed location that
    // DROP TABLE no longer knows about — clear it
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc       = new java.io.File(warehouse, table.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(loc)
    }
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }
}
