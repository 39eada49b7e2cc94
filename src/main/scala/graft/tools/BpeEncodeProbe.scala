package graft.tools

import graft.llm.Bpe
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Train/encode split of the BPE pipeline (VERDICT r12 item 7): q109 =
  * trainMerges + applyMerges; the trainer moved to the token-table
  * kernel in round 12 while the encode half still runs the packed-string
  * replace chain. This measures each half separately (train once, then
  * repeat the encode) so "is the encode worth porting" is a published
  * number instead of a guess. `SPARK_GRAFT_SF_DIR` picks the corpus.
  */
object BpeEncodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.core.Tables(spark, sfDir).documents
    docs.count() // warm the scan

    def drain(df: org.apache.spark.sql.DataFrame): Unit = {
      val _ = df.queryExecution.toRdd.mapPartitions { it =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n)
      }.sum()
    }

    val t0 = System.nanoTime()
    val merges = Bpe
      .trainMerges(docs, "doc_id", "text", nMerges = 8, minCount = 2L)
      .orderBy("merge_idx")
      .collect()
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq
    val trainSec = (System.nanoTime() - t0) / 1e9
    println(f"[bpesplit] sf=$sfDir train(8 merges, token-table) $trainSec%.3f s")

    for (round <- 1 to 3) {
      val t1 = System.nanoTime()
      drain(Bpe.applyMerges(docs, "doc_id", "text", merges)
        .select(col("doc_id"), size(col("tk")).as("n")))
      println(f"[bpesplit] round $round encode(packed replace chain) " +
        f"${(System.nanoTime() - t1) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
