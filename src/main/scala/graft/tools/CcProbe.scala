package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for the q69-family clustering: pair generation (the
  * prefix-filtered edge plan) vs the CC label loop, separated.
  * `runMain graft.tools.CcProbe [rounds]`.
  */
object CcProbe {
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
    import graft.llm.{Dedup, DupClusters}
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (r <- 1 to rounds) {
      val docs = graft.core.Tables(spark, sfDir).documents
      // pair generation forced alone (the edges feeding connectedComponents)
      val (nEdges, tPairs) = t {
        Dedup
          .ngramJaccardPairs(docs, "doc_id", "text", 3, Some(64L), minJaccard = Some(0.8))
          .where(col("jaccard") >= 0.8)
          .count()
      }
      val (_, tAll) = t {
        DupClusters
          .clusterDocuments(docs, "doc_id", "text", maxShingleDf = Some(64L))
          .queryExecution.toRdd.mapPartitions { it =>
            var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n)
          }.sum()
      }
      println(f"round $r: pairs=$tPairs%.2f ($nEdges edges) full=$tAll%.2f (cc≈${tAll - tPairs}%.2f)")
    }
    spark.stop()
  }
}
