package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.Assertions._

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Schema (names + types) and sorted-row equality with double tolerance. */
  def assertFrameEqual(got: DataFrame, want: DataFrame, tol: Double = 1e-9): Unit = {
    assert(
      got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        want.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"schema mismatch:\n got: ${got.schema.treeString}\n want: ${want.schema.treeString}")
    def rowKey(r: Row): String =
      r.toSeq.map {
        case null      => "∅"
        case d: Double => f"$d%.9f"
        case f: Float  => f"${f.toDouble}%.9f"
        case x         => x.toString
      }.mkString("|")

    val g = got.collect().map(rowKey).sorted
    val w = want.collect().map(rowKey).sorted
    assert(g.length == w.length, s"row count ${g.length} != ${w.length}")
    g.zip(w).foreach { case (a, b) => assert(a == b, s"row mismatch:\n got: $a\n want: $b") }
  }
}
