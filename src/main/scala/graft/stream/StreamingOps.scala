package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types._

/** Structured Streaming operators over the event stream (SURVEY.md §2B
  * streaming). The batch queries in [[EventQueries]] and these streaming
  * ops share the same `groupBy(window(...))` plans — the DataFrame is the
  * common IR; only the source (`read` vs `readStream`) and sink differ.
  */
object StreamingOps {

  /** Streaming source for the events table. Schema must be declared for
    * `readStream`; `ts` arrives as INT64 TIMESTAMP(NANOS) → read as long
    * (nanosAsLong) and truncate to a microsecond timestamp, same as the
    * batch reader in `Tables.events`.
    *
    * NOTE: the returned frame is bound to the nanosAsLong CHILD session
    * (`Tables.nanosSession`) — queries started on it register (and memory
    * sinks resolve) in `df.sparkSession`, NOT the caller's session. Read
    * sink tables via `stream.sparkSession.table(name)`.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    // isolated child session (see Tables.nanosSession) — the legacy conf
    // must not leak into the caller's other parquet reads
    val s = graft.core.Tables.nanosSession(spark)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    s.readStream
      .schema(schema)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Watermarked tumbling 1 h aggregation (late data beyond 10 min
    * dropped). Identical aggregation semantics to the batch
    * `q11_events_tumbling_1h`.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))

  /** Stateful exact dedup keyed by event_id with bounded state: duplicates
    * arriving within the watermark are dropped, state for expired
    * watermarks is reclaimed — the streaming form of exact dedup at scale.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom state: running per-user event count via mapGroupsWithState —
    * the `KeyValueGroupedDataset` escape hatch for state machines the
    * built-in windows can't express.
    */
  def runningUserCounts(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"))
      .as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Long], state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + batch.size
          state.update(n)
          (userId, n)
      }
      .toDF("user_id", "n_events")
  }
}
