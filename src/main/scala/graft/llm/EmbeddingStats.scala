package graft.llm

import graft.core.Cols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-quality diagnostics for training-data pipelines: per-label
  * centroids and distance-to-centroid outlier ranking (the standard
  * mislabel / junk-vector screen run before training on an embedded
  * corpus).
  *
  * Scale shape: centroids come from ONE shuffled aggregation keyed on
  * (label, dim) — posexplode keeps the shuffle rows scalar (8 bytes of
  * payload each) instead of moving whole vectors — and the distance pass
  * re-joins the centroid table, which is labels × dims rows, sublinear
  * in corpus size and broadcast by Catalyst while it fits. The top-k
  * ranking is a per-label window over scalar distances.
  */
object EmbeddingStats {

  /** Euclidean distance of every vector to its label's centroid.
    * Returns (idCol, labelCol, dist). Cast to double BEFORE aggregating
    * so both engines accumulate in f64 (the column is float32 parquet).
    */
  def labelCentroidDistances(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String): DataFrame = {
    val x = df
      .select(
        Cols.q(idCol).as("__id"),
        Cols.q(labelCol).as("__label"),
        posexplode(Cols.q(vecCol).cast("array<double>")).as(Seq("pos", "v")))
    val c = x.groupBy("__label", "pos").agg(avg("v").as("cv"))
    x.join(c, Seq("__label", "pos"))
      .groupBy(col("__id").as(idCol), col("__label").as(labelCol))
      .agg(sqrt(sum(pow(col("v") - col("cv"), 2))).as("dist"))
  }

  /** Top-`k` farthest-from-centroid vectors per label (likely mislabels
    * or junk), distance rounded to `scale` dp BEFORE ranking so the
    * rank order is reproducible across engines at near-ties (ids break
    * the remaining ties).
    */
  def labelOutliers(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String,
      k: Int,
      scale: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = labelCentroidDistances(df, idCol, labelCol, vecCol)
      .withColumn("dist", round(col("dist"), scale))
    val w = Window.partitionBy(Cols.q(labelCol)).orderBy(col("dist").desc, Cols.q(idCol).asc)
    d.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }
}
