package graft.tools

import graft.core.Tables
import graft.llm.{Dedup, DupClusters, Vocab}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiler for the q100 composition (phase timings at a given
  * SF dir). Not part of the library surface.
  */
object Prof100 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("benchdata/sf1")
    def tick[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables(spark, dir).documents
    val edges = Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", n = 3, maxShingleDf = None)
      .where(col("jaccard") >= 0.8)
      .select("a_id", "b_id")
    val comp = tick("connectedComponents (eager loop incl. pair gen)") {
      DupClusters
        .connectedComponents(docs.select(col("doc_id").as("id")), edges)
        .select(col("id").as("doc_id"), col("cluster_id"))
    }
    val splitDf   = DupClusters.leakSafeSplit(comp).select("doc_id", "split")
    val withSplit = docs.join(splitDf, Seq("doc_id"))
    val train     = withSplit.where(col("split") === "train")
    val test      = withSplit.where(col("split") === "test")
    tick("split count")(println("split rows=" + splitDf.count()))
    tick("withSplit count")(println("withSplit rows=" + withSplit.count()))
    tick("train pair count") {
      val p = train.select(
        col("doc_id"),
        explode(graft.llm.TextAnalysis.adjacentPairs(split(col("text"), " "))).as("p"))
      println("trainPairs rows=" + p.count())
    }
    val scored = Vocab
      .bigramLogProbHoldout(train, test, "doc_id", "text")
      .select(col("doc_id"), round(col("logprob"), 6).as("logprob"), col("n_bigrams"))
      .orderBy("doc_id")
    tick("scoring action 1st")(scored.write.format("noop").mode("overwrite").save())
    tick("scoring action 2nd")(scored.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
