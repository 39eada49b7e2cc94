package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for the minhash signature hash family on the q125 ingest shape:
  * bootstrap a near-dup index over half the corpus in each family, then
  * time the incremental ingest of the other half (+10% planted mutated
  * clones). The 16× salted-md5-min fold was the measured compute floor
  * for the ingest family; xxhash64 is the library default on the
  * strength of this number (md5 stays the oracle-parity family).
  * Also asserts both families drop the same planted clones.
  */
object SigHashBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/benchdata/sf1")
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
    import graft.llm.Dedup

    val docs  = graft.core.Tables(spark, dir).documents.where(col("text").isNotNull)
    val old   = docs.where(col("doc_id") % 2 === 0).select("doc_id", "text")
    val fresh = docs.where(col("doc_id") % 2 === 1).select("doc_id", "text")
    val clones = old
      .where(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000000L).as("doc_id"),
        concat(col("text"), lit(" zq7")).as("text"))
    val batch = fresh.unionByName(clones)

    def run(family: Dedup.SigHash, label: String): Set[Long] = {
      val idxDir = java.nio.file.Files.createTempDirectory(s"sig_$label").toString
      val tB     = System.nanoTime()
      Dedup.writeNearDupIndex(old, "doc_id", "text", idxDir, nSigs = 16, family = family)
      val buildSec = (System.nanoTime() - tB) / 1e9
      def once(): (Double, Set[Long]) = {
        val t0 = System.nanoTime()
        val surv = Dedup
          .incrementalNearDupNew(batch, "doc_id", "text", idxDir)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        ((System.nanoTime() - t0) / 1e9, surv)
      }
      val (warm, survivors) = once()
      val timed             = Seq(once()._1, once()._1)
      println(f"[sighash] $label%s index-build=$buildSec%.2f s ingest warm=$warm%.2f " +
        f"min=${timed.min}%.2f s survivors=${survivors.size}")
      survivors
    }
    val sMd5 = run(Dedup.Md5, "md5     ")
    val sXx  = run(Dedup.XxHash64, "xxhash64")
    val agree = (sMd5 intersect sXx).size
    println(s"[sighash] survivor agreement: $agree of md5=${sMd5.size} / xx=${sXx.size}; " +
      s"clones surviving: md5=${sMd5.count(_ >= 100000000L)} xx=${sXx.count(_ >= 100000000L)}")
    spark.stop()
  }
}
