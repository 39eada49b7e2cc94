package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B probe for the q141 multi-query BM25 shape (r16): the
  * r15 two-full-explode plan vs the r16 semi-filtered plan, alternated
  * A/B/A/B in ONE JVM so ambient host contention (measured 40–70 s bursts
  * on the bench box) hits both sides equally. Usage:
  * `runMain graft.tools.Bm25ShapeProbe [roundsPerSide]`.
  */
object Bm25ShapeProbe {

  /** The r15 shape, inlined verbatim (minus the maxTermDf arm — q141
    * passes None): both the df branch and the contribution branch explode
    * the FULL corpus.
    */
  private def oldShape(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = split(col("text"), " ")
    val tokenRows = docs.select(
      col("doc_id"),
      size(tk).cast("double").as("__dl"),
      explode(tk).as("__term"))
    val postings = tokenRows
      .groupBy("__term", "doc_id", "__dl")
      .agg(count(lit(1)).cast("double").as("__tf"))
    val df = postings.groupBy("__term").agg(count(lit(1)).cast("double").as("__df"))
    val stats = docs
      .select(size(split(col("text"), " ")).cast("double").as("__dl"))
      .agg(count(lit(1)).cast("double").as("__n"), avg("__dl").as("__avgdl"))
    val qTerms = queries.select(
      col("q_id"),
      explode(array_distinct(split(col("q_text"), " "))).as("__term"))
      .distinct()
    val matched = broadcast(qTerms)
      .join(postings.join(broadcast(df), Seq("__term")), Seq("__term"))
    val contrib = matched
      .crossJoin(broadcast(stats))
      .select(
        col("q_id"),
        col("doc_id"),
        round(
          log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))) *
            (col("__tf") * lit(2.2)) /
            (col("__tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("__dl") / col("__avgdl"))),
          6).cast("decimal(20,6)").as("__c"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("doc_id").asc)
    contrib
      .groupBy("q_id", "doc_id")
      .agg(sum(col("__c")).as("__s"))
      .select(col("q_id"), col("doc_id"), col("__s").cast("double").as("score"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
  }

  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 4
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = graft.core.Tables(spark, sfDir).documents
    def queries = docs.where(col("doc_id") % 25 === 0 && col("doc_id") < 5000).select(
      col("doc_id").as("q_id"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("q_text"))

    def force(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      val _ = df.queryExecution.toRdd.mapPartitions { it =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n)
      }.sum()
      (System.nanoTime() - t0) / 1e9
    }
    def runOld(): Double = force(oldShape(docs, queries, 10).orderBy("q_id", "rn"))
    def runNew(): Double = force(
      graft.llm.Bm25
        .topKPerQuery(docs, "doc_id", "text", queries, "q_id", "q_text", k = 10)
        .orderBy("q_id", "rn"))

    runOld(); runNew() // warm both
    val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
    val news = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to rounds) { olds += runOld(); news += runNew() }
    def fmt(xs: Seq[Double]) =
      xs.map(x => f"$x%.3f").mkString("[", ", ", "]") +
        f" min=${xs.min}%.3f median=${xs.sorted.apply(xs.size / 2)}%.3f"
    println(s"OLD (r15 two-explode)    ${fmt(olds.toSeq)}")
    println(s"NEW (r16 semi-filtered)  ${fmt(news.toSeq)}")
    spark.stop()
  }
}
