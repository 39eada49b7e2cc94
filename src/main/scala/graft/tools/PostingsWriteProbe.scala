package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for q145: writePostings (build) vs topKPerQueryIndexed
  * (search), separated — `runMain graft.tools.PostingsWriteProbe [rounds]`.
  */
object PostingsWriteProbe {
  def main(args: Array[String]): Unit = {
    val rounds = if (args.nonEmpty) args(0).toInt else 3
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
    def t[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (r <- 1 to rounds) {
      val docs = graft.core.Tables(spark, sfDir).documents
      val queries = docs.where(col("doc_id") % 25 === 0 && col("doc_id") < 5000).select(
        col("doc_id").as("q_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("q_text"))
      val ixDir = graft.core.Scratch.tempDir("graft_probe_postings")
      val tw = t(graft.llm.Bm25.writePostings(docs, "doc_id", "text", ixDir, nBuckets = 16))
      val ts = t {
        val res = graft.llm.Bm25
          .topKPerQueryIndexed(ixDir, queries, "q_id", "q_text", k = 10)
          .orderBy("q_id", "rn")
        val _ = res.queryExecution.toRdd.mapPartitions { it =>
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n)
        }.sum()
      }
      println(f"round $r: write=$tw%.2f search=$ts%.2f total=${tw + ts}%.2f")
    }
    spark.stop()
  }
}
