package graft.llm

import graft.core.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the dataset-versioning primitive: given two
  * versions of a corpus keyed by id, classify every id as
  * added / removed / changed / unchanged by content digest. This is the
  * release audit a training-data pipeline ships with every refresh
  * ("what moved between v1 and v2"), and the input to incremental
  * recomputation (only `added`/`changed` docs need re-scoring).
  *
  * Scale shape: each side is reduced to (id, digest) in a projection —
  * the full-outer join then moves 16-byte digests, never documents, and
  * shuffles both sides on the SAME id key (co-partitioned, one exchange
  * each). Nothing is collected; the status column is one codegen CASE.
  */
object CorpusDiff {

  /** @param contentCols columns whose concatenated digest defines
    *                    "changed" (id excluded — identity is the key)
    * @return (id, status) with status in
    *         {added, removed, changed, unchanged}
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must be non-empty")
    def digest(df: DataFrame, hashName: String): DataFrame =
      df.select(
        Cols.q(idCol).as("id"),
        md5(concat_ws("\u0001", contentCols.map(c => Cols.q(c).cast("string")): _*).cast("binary"))
          .as(hashName))
    digest(oldDf, "old_hash")
      .join(digest(newDf, "new_hash"), Seq("id"), "full_outer")
      .select(
        col("id").as(idCol),
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged")
          .as("status"))
  }
}
