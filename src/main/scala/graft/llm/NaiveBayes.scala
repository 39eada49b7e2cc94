package graft.llm

import graft.core.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes document classification over hashed token
  * features — the classifier-based filtering/routing step of a
  * training-data pipeline (the fastText-style quality or domain
  * classifier; the reference's text ops stop at counting,
  * `/root/reference/src/tasks.py`). Expressed Spark-first: the model IS
  * two small aggregate tables, training IS two groupBys, and scoring IS
  * a broadcast join — no MLlib, no driver-side fitting.
  *
  * Features are hashed unigram buckets `substr(md5(token), 1, prefixLen)`
  * (16^prefixLen buckets — the same engine-portable trick as [[Dsir]]),
  * so model state is O(buckets × classes) regardless of vocabulary, and
  * every probability is estimated with add-one smoothing:
  * p(b|c) = (n_bc + 1) / (n_c + buckets), p(c) = (d_c + 1) / (d + K).
  *
  * Scale shape: training = two bucket/class-keyed aggregates (each at
  * most buckets × classes rows — broadcast material by construction);
  * scoring = the test token stream cross-joined with the K-row class
  * list, one broadcast rejoin, one doc×class-keyed sum, and a K-row
  * per-doc argmax window (partitioned by doc id, never global).
  */
object NaiveBayes {

  /** Train on `isTrain` rows, score the rest; returns one row per test
    * document: (idCol, labelCol, predicted, score) with `score` the
    * winning class's rounded log-posterior. Ties break on class name
    * ascending; scores are rounded to 6 dp BEFORE the argmax so the
    * decision is reproducible across engines.
    */
  def predictions(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      isTrain: Column,
      prefixLen: Int = 2): DataFrame = {
    require(prefixLen >= 1 && prefixLen <= 8, s"prefixLen must be in [1,8], got $prefixLen")
    val buckets = math.pow(16, prefixLen)

    val base = docs
      .where(Cols.q(textCol).isNotNull)
      .select(
        Cols.q(idCol).as("__id"),
        Cols.q(labelCol).as("__label"),
        Cols.q(textCol).as("__text"),
        isTrain.as("__train"))

    val toks = base
      .select(
        col("__id"),
        col("__label"),
        col("__train"),
        explode(split(col("__text"), " ")).as("tok"))
      .select(
        col("__id"),
        col("__label"),
        col("__train"),
        substring(md5(col("tok")), 1, prefixLen).as("b"))

    // The model: class priors (K rows) and bucket likelihoods
    // (≤ buckets × K rows). Both broadcast below.
    val pri  = base.where(col("__train")).groupBy(col("__label").as("c")).agg(count(lit(1)).as("nd"))
    val priT = pri.agg(sum("nd").cast("double").as("td"), count(lit(1)).cast("double").as("k"))
    val lik  = toks.where(col("__train")).groupBy(col("__label").as("c"), col("b")).agg(count(lit(1)).as("n"))
    val likT = lik.groupBy("c").agg(sum("n").cast("double").as("tl"))

    val pB = (coalesce(col("n"), lit(0L)).cast("double") + lit(1.0)) / (col("tl") + lit(buckets))

    val perClass = toks
      .where(!col("__train"))
      .crossJoin(broadcast(pri.select("c")))
      .join(broadcast(lik), Seq("c", "b"), "left")
      .join(broadcast(likT), Seq("c"))
      .groupBy(col("__id"), col("__label"), col("c"))
      .agg(sum(log(pB)).as("s"))
      .join(broadcast(pri), Seq("c"))
      .crossJoin(broadcast(priT))
      .withColumn(
        "score",
        round(log((col("nd").cast("double") + lit(1.0)) / (col("td") + col("k"))) + col("s"), 6))

    val w = Window.partitionBy(col("__id")).orderBy(col("score").desc, col("c").asc)
    perClass
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(
        col("__id").as(idCol),
        col("__label").as(labelCol),
        col("c").as("predicted"),
        col("score"))
  }

  /** Confusion matrix over the test slice: (labelCol, predicted, n). */
  def confusion(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      isTrain: Column,
      prefixLen: Int = 2): DataFrame =
    predictions(docs, idCol, textCol, labelCol, isTrain, prefixLen)
      .groupBy(labelCol, "predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy(labelCol, "predicted")
}
