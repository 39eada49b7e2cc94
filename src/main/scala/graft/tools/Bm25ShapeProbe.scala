package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B probe for the multi-query BM25 shape, extended for the
  * r17 adjudication of the r16 q141/q142 regression (VERDICT r16 #1): the
  * probe-free plan (`semiFilterTokens = false`, the r17 default — r15's
  * two-full-explode shape plus the query-bounded df broadcast) vs the r16
  * token-stream semi-filtered plan (`semiFilterTokens = true`), alternated
  * A/B/A/B in ONE JVM so ambient host contention (measured 40–70 s bursts
  * on the bench box) hits both sides equally — and over the FULL DECLARED
  * PATHS: q141 (topKPerQuery + total-order sort) and q142 (RetrievalEval
  * report over the same retrieval), not just the operator kernel.
  * Usage: `runMain graft.tools.Bm25ShapeProbe [roundsPerSide]`.
  */
object Bm25ShapeProbe {

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

    // BY-NAME so construction-time eager work is inside the timer —
    // q142's report pins the rank table eagerly at CONSTRUCTION, which a
    // by-value parameter would run before t0 and time as ~0
    def force(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val _ = df.queryExecution.toRdd.mapPartitions { it =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n)
      }.sum()
      (System.nanoTime() - t0) / 1e9
    }
    def q141(semi: Boolean): DataFrame =
      graft.llm.Bm25
        .topKPerQuery(docs, "doc_id", "text", queries, "q_id", "q_text", k = 10,
          semiFilterTokens = semi)
        .orderBy("q_id", "rn")
    def q142(semi: Boolean): DataFrame = {
      val results = graft.llm.Bm25.topKPerQuery(
        docs, "doc_id", "text", queries, "q_id", "q_text", k = 10, semiFilterTokens = semi)
      val gold = queries.select(col("q_id"), col("q_id").as("gold_id"))
      graft.llm.RetrievalEval.report(results, gold, Seq(1, 5, 10)).orderBy("k")
    }

    def loadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+").take(1).mkString
      catch { case _: Throwable => "-" }

    // warm both sides of both paths
    force(q141(semi = false)); force(q141(semi = true))
    force(q142(semi = false)); force(q142(semi = true))
    val a141 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val b141 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val a142 = scala.collection.mutable.ArrayBuffer.empty[Double]
    val b142 = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (r <- 1 to rounds) {
      a141 += force(q141(semi = false))
      b141 += force(q141(semi = true))
      a142 += force(q142(semi = false))
      b142 += force(q142(semi = true))
      println(f"  round $r done (loadavg ${loadavg()})")
    }
    def fmt(xs: Seq[Double]) =
      xs.map(x => f"$x%.3f").mkString("[", ", ", "]") +
        f" min=${xs.min}%.3f median=${xs.sorted.apply(xs.size / 2)}%.3f"
    println(s"q141 A (no token semi-filter, r17 default) ${fmt(a141.toSeq)}")
    println(s"q141 B (r16 token semi-filter)             ${fmt(b141.toSeq)}")
    println(s"q142 A (no token semi-filter, r17 default) ${fmt(a142.toSeq)}")
    println(s"q142 B (r16 token semi-filter)             ${fmt(b142.toSeq)}")
    spark.stop()
  }
}
