package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the q81 session-transcript assembly semantics the oracle data
  * cannot reach: the event_id tie-break at EQUAL timestamps (the driver
  * testdata has no equal (user_id, ts) pairs) and the 30-min session cut.
  */
class SessionPathsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assemble(rows: Seq[(Long, String, Long, String)]) = {
    val df = rows
      .toDF("user_id", "ts_s", "event_id", "event_type")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"), col("event_id"), col("event_type"))
    graft.stream.StreamingOps
      .sessionPaths(df)
      .orderBy("user_id", "session_start")
      .as[(Long, java.sql.Timestamp, Long, String)]
      .collect()
      .toSeq
  }

  test("equal timestamps order by event_id; 30-min gap cuts a new session") {
    val got = assemble(Seq(
      (1L, "2024-01-01 10:00:00", 5L, "view"),
      (1L, "2024-01-01 10:00:00", 2L, "click"),  // same ts, lower id → first
      (1L, "2024-01-01 10:10:00", 7L, "buy"),
      (1L, "2024-01-01 10:40:01", 9L, "view"),   // > 30 min after 10:10 → new session
      (2L, "2024-01-01 09:00:00", 1L, "view")))
    assert(got.map(r => (r._1, r._3, r._4)) == Seq(
      (1L, 3L, "click>view>buy"),
      (1L, 1L, "view"),
      (2L, 1L, "view")))
  }
}
