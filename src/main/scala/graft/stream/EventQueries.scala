package graft.stream

import graft.core.Tables
import graft.queries.Declared
import graft.rel.AsOfJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators in their batch-checkable form (SURVEY.md §2B
  * streaming): tumbling windows via `window()`, session windows via
  * `session_window()`, JSON prop extraction, as-of enrichment. The same
  * `groupBy(window(...))` plans run unchanged under `readStream` (see
  * [[StreamingOps]] for the watermarked streaming variants).
  */
object EventQueries {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  /** Tumbling 1 h window aggregation over the event stream. */
  val q11EventsTumbling1h: Declared = Declared.sql(
    "q11_events_tumbling_1h",
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY bucket, event_type
      |ORDER BY bucket, event_type""".stripMargin) { (spark, dir) =>
    t(spark, dir).events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("bucket", "event_type")
  }

  /** Session windows (30 min inactivity gap) per user. */
  val q12EventsSessions: Declared = Declared.sql(
    "q12_events_sessions",
    """WITH x AS (
      |  SELECT user_id, event_id, ts, value,
      |         CASE WHEN ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                      + INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
      |       count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
    t(spark, dir).events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")
  }

  /** Sliding 1 h window with a 15 min slide: every event lands in exactly
    * windowDuration/slide = 4 overlapping windows. The oracle replays
    * Spark's epoch-aligned window assignment by cross-joining each event
    * with offsets k ∈ [0,4) and subtracting k slides from its 15-min
    * bucket — both engines' bucket origins sit on midnight, so a 15-min
    * bucket (which divides 24 h) aligns identically.
    */
  val q66EventsSliding: Declared = Declared.sql(
    "q66_events_sliding",
    """WITH w AS (
      |  SELECT time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
      |           - k.k * (INTERVAL 15 MINUTE) AS ws,
      |         event_type, value
      |  FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) k)
      |SELECT CAST(ws AS TIMESTAMP) AS window_start, event_type,
      |       count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM w GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin) { (spark, dir) =>
    t(spark, dir).events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  /** JSON property extraction from the `props` column. Regexp-based so the
    * oracle needs no DuckDB JSON extension; `from_json` is the schema-full
    * alternative exposed in the library.
    */
  val q13EventsJsonK: Declared = Declared.sql(
    "q13_events_json_k",
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)), 4) AS avg_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (spark, dir) =>
    val k = regexp_extract(col("props"), "\"k\":\\s*(-?\\d+)", 1).cast("long")
    t(spark, dir).events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(k).as("sum_k"), round(avg(k), 4).as("avg_k"))
      .orderBy("event_type")
  }

  /** As-of enrichment: each event joined to the user's latest order at or
    * before the event time (right side deduplicated per (key, time) for
    * determinism). Oracle uses DuckDB's native ASOF JOIN.
    */
  val q14EventsAsofOrder: Declared = Declared.sql(
    "q14_events_asof_order",
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM (
      |    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
      |                                 ORDER BY o_orderkey DESC) AS rn
      |    FROM orders) WHERE rn = 1)
      |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
      |FROM events e
      |ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin) { (spark, dir) =>
    val tt = t(spark, dir)
    val w  = Window.partitionBy("o_custkey", "o_orderdate").orderBy(col("o_orderkey").desc)
    val o = tt.orders
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val e = tt.events.select("event_id", "user_id", "ts")
    AsOfJoin(e, "user_id", "ts", o, "o_custkey", "o_orderdate")
      .select("event_id", "user_id", "o_orderkey", "o_totalprice")
      .orderBy("event_id")
  }

  /** Conversion funnel view → click → purchase, each stage within 24 h of
    * the previous one: stage times are per-user conditional MINs chained
    * through equi-joins on user_id (never a per-user sequence collect —
    * the funnel is three aggregate+join passes however long the history
    * is, the scale-safe shape for path analytics). Times compare at
    * microsecond resolution on BOTH engines (`unix_micros` ↔ `epoch_us`)
    * so the nanos-origin timestamps cannot tie-break differently.
    */
  val q64Funnel: Declared = Declared.sql(
    "q64_funnel",
    """WITH e AS (SELECT user_id, event_type,
      |             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
      |v AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.us) AS t2 FROM e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click' AND e.us > v.t1
      |        AND e.us <= v.t1 + 86400000000 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.us) AS t3 FROM e JOIN c USING (user_id)
      |      WHERE e.event_type = 'purchase' AND e.us > c.t2
      |        AND e.us <= c.t2 + 86400000000 GROUP BY e.user_id)
      |SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
      |       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
      |       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_full_funnel""".stripMargin) {
    (spark, dir) =>
      val day = 86400000000L // 24 h in microseconds
      val e = t(spark, dir).events
        .select(
          col("user_id"),
          col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
      val v = e.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("us").as("t1"))
      val c = e.where(col("event_type") === "click")
        .join(v, "user_id")
        .where(col("us") > col("t1") && col("us") <= col("t1") + day)
        .groupBy("user_id").agg(min("us").as("t2"))
      val p = e.where(col("event_type") === "purchase")
        .join(c, "user_id")
        .where(col("us") > col("t2") && col("us") <= col("t2") + day)
        .groupBy("user_id").agg(min("us").as("t3"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
  }

  /** Weekly retention cohorts: cohort = the Monday-truncated week of a
    * user's first event, week_n = whole weeks since. Two aggregates + one
    * equi-join on user_id; both engines truncate weeks to Monday, and
    * week_n is days/7 over Monday-truncated dates (always divisible), so
    * the bucketing is engine-exact.
    */
  val q65Retention: Declared = Declared.sql(
    "q65_retention",
    """WITH e AS (SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),
      |f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY user_id),
      |a AS (SELECT DISTINCT e.user_id, f.cohort,
      |        CAST(date_diff('week', f.cohort, e.wk) AS INTEGER) AS week_n
      |      FROM e JOIN f USING (user_id))
      |SELECT CAST(cohort AS DATE) AS cohort, week_n, count(*) AS n_users
      |FROM a GROUP BY cohort, week_n ORDER BY cohort, week_n""".stripMargin) { (spark, dir) =>
    val e = t(spark, dir).events
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val f = e.groupBy("user_id").agg(min("wk").as("cohort"))
    e.join(f, "user_id")
      .select(
        col("user_id"),
        col("cohort"),
        (datediff(col("wk").cast("date"), col("cohort").cast("date")) / 7).cast("int").as("week_n"))
      .distinct()
      .groupBy(col("cohort").cast("date").as("cohort"), col("week_n"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "week_n")
  }

  /** Session transcript assembly — the conversation/interaction-history
    * shape a chat-training pipeline materializes: per 30-min-gap session,
    * the COMPLETE ordered event-type path as one string. One
    * `session_window` agg; the ordering is done per group by
    * `sort_array(collect_list(struct(ts, event_id, …)))` (event_id breaks
    * equal timestamps on both engines), so no window function and no
    * second shuffle — per-group state is bounded by the session length,
    * the same bound any transcript materialization carries.
    */
  val q81SessionPaths: Declared = Declared.sql(
    "q81_session_paths",
    """WITH x AS (
      |  SELECT user_id, event_id, ts, event_type,
      |         CASE WHEN ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                      + INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x)
      |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS session_start,
      |       count(*) AS n_events,
      |       string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (spark, dir) =>
    StreamingOps
      .sessionPaths(t(spark, dir).events)
      .orderBy("user_id", "session_start")
  }

  /** Skip-gram pair extraction over sessions — the word2vec/item2vec
    * training-pair shape: within each 30-min session's ordered event
    * sequence, count (center, context, distance) co-occurrences for
    * distances 1..2. The pair generation happens INSIDE the projection
    * over the assembled session array (`sequence` over starts ×
    * `sequence` over offsets, flattened, then ONE explode) — no
    * self-join, so the window expansion never crosses a shuffle; the
    * final count agg is pair-vocabulary-sized. The oracle replays it
    * relationally (row_number self-join), the formulation the in-array
    * plan exists to avoid at scale.
    */
  val q85SkipgramPairs: Declared = Declared.sql(
    "q85_skipgram_pairs",
    """WITH x AS (
      |  SELECT user_id, event_id, ts, event_type,
      |         CASE WHEN ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                      + INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM x),
      |r AS (
      |  SELECT user_id, sid, event_type,
      |         row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn
      |  FROM s)
      |SELECT a.event_type AS a_type, b.event_type AS b_type,
      |       CAST(b.rn - a.rn AS INTEGER) AS dist, count(*) AS n
      |FROM r a JOIN r b ON a.user_id = b.user_id AND a.sid = b.sid
      |                  AND b.rn - a.rn BETWEEN 1 AND 2
      |GROUP BY a_type, b_type, dist
      |ORDER BY a_type, b_type, dist""".stripMargin) { (spark, dir) =>
    val window = 2
    val seqs = t(spark, dir).events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(
        transform(
          sort_array(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
          e => e("event_type")).as("types"))
    seqs
      // single-event sessions emit no pairs — and must not reach the
      // starts `sequence`, which DESCENDS for size-2 < 0 (the q59 guard)
      .where(size(col("types")) >= 2)
      .select(explode(flatten(transform(
        sequence(lit(0), size(col("types")) - 2),
        i =>
          transform(
            sequence(lit(1), least(lit(window), size(col("types")) - 1 - i)),
            d => struct(
              element_at(col("types"), i + 1).as("a_type"),
              element_at(col("types"), i + d + 1).as("b_type"),
              d.cast("int").as("dist")))))).as("p"))
      .groupBy(col("p.a_type").as("a_type"), col("p.b_type").as("b_type"), col("p.dist").as("dist"))
      .agg(count(lit(1)).as("n"))
      .orderBy("a_type", "b_type", "dist")
  }

  /** Event-rate anomaly detection: hourly counts per event_type scored
    * against a trailing-24 h baseline via a RANGE window frame — the
    * monitoring query a pipeline runs over its own ingest telemetry.
    * The trailing variance is derived from integer frame sums
    * (`Σn, Σn², count` over `RANGE [-86400 s, -1 s]`) rather than a
    * windowed `stddev` aggregate, so both engines fold the identical
    * exact integers into the identical double expression — no
    * accumulation-order exposure; z is rounded to 6 dp. Buckets with no
    * full-rank baseline (fewer than 2 trailing buckets, or zero
    * variance) emit a NULL z on both engines.
    *
    * Scale shape: ONE bucket-count aggregate (corpus-sized scan,
    * map-side combined to buckets × types rows) and ONE window over the
    * bucket table partitioned by event_type — the window input is
    * bucket-count-sized, never event-sized, at any scale.
    */
  val q115RateAnomaly: Declared = Declared.sql(
    "q115_rate_anomaly",
    """WITH b AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
      |             CAST(count(*) AS BIGINT) AS n
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, bucket, n,
      |        sum(n) OVER tw AS s1, sum(n * n) OVER tw AS s2,
      |        CAST(count(*) OVER tw AS BIGINT) AS c
      |      FROM b
      |      WINDOW tw AS (PARTITION BY event_type ORDER BY epoch(bucket)
      |                    RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING)),
      |z AS (SELECT event_type, bucket, n,
      |        CASE WHEN c >= 2 AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / c) > 0.0
      |             THEN round((n - CAST(s1 AS DOUBLE) / c) /
      |                        sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / c) / (c - 1)),
      |                        6)
      |             ELSE NULL END AS z
      |      FROM w)
      |SELECT event_type, bucket, n, z FROM z
      |ORDER BY event_type, bucket""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    // bucket stays NTZ (oracle-aligned, q11 contract); the RANGE frame
    // orders by its epoch seconds via a lossless UTC cast
    val b = t(spark, dir).events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val tw = Window
      .partitionBy("event_type")
      .orderBy(col("bucket").cast("timestamp").cast("long"))
      .rangeBetween(-86400L, -1L)
    val s1 = sum("n").over(tw)
    val s2 = sum(col("n") * col("n")).over(tw)
    val c  = count(lit(1)).over(tw)
    b.select(col("event_type"), col("bucket"), col("n"), s1.as("s1"), s2.as("s2"), c.as("c"))
      .select(
        col("event_type"),
        col("bucket"),
        col("n"),
        when(
          col("c") >= 2 &&
            (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("c")) > 0.0,
          round(
            (col("n") - col("s1").cast("double") / col("c")) /
              sqrt((col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("c")) /
                (col("c") - 1)),
            6)).as("z"))
      .orderBy("event_type", "bucket")
  }

  /** Last-touch click attribution: for every click, the LATEST view by the
    * same user within the preceding 30 minutes (view_id breaks exact-ts
    * ties, newest id wins). The pair stage is
    * [[StreamingOps.viewClickPairs]] — the SAME plan runs as a watermarked
    * stream-stream interval join (StreamingSpec pins batch/stream pair
    * parity); the last-touch window on top is the batch half, since
    * per-key ranking after a stream-stream join isn't expressible in
    * append mode (a downstream consumer does it per trigger window).
    */
  val q121ClickAttribution: Declared = Declared.sql(
    "q121_click_attribution",
    """WITH v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
      |           FROM events WHERE event_type = 'view'),
      |c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
      |      FROM events WHERE event_type = 'click'),
      |p AS (SELECT c.click_id, c.user_id, c.click_ts, v.view_id, v.view_ts,
      |             CAST(date_diff('second', v.view_ts, c.click_ts) AS BIGINT) AS gap_s
      |      FROM c JOIN v ON c.user_id = v.user_id
      |       AND c.click_ts >= v.view_ts
      |       AND c.click_ts <= v.view_ts + INTERVAL 30 MINUTE),
      |r AS (SELECT *, row_number() OVER (PARTITION BY click_id
      |                                   ORDER BY view_ts DESC, view_id DESC) AS rn
      |      FROM p)
      |SELECT click_id, user_id, CAST(click_ts AS TIMESTAMP) AS click_ts, view_id,
      |       CAST(view_ts AS TIMESTAMP) AS view_ts, gap_s
      |FROM r WHERE rn = 1
      |ORDER BY click_id""".stripMargin) { (spark, dir) =>
    val pairs = StreamingOps.viewClickPairs(t(spark, dir).events)
    val w = Window.partitionBy("click_id").orderBy(col("view_ts").desc, col("view_id").desc)
    pairs
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("click_id", "user_id", "click_ts", "view_id", "view_ts", "gap_s")
      .orderBy("click_id")
  }

  val all: Seq[Declared] =
    Seq(q11EventsTumbling1h, q12EventsSessions, q13EventsJsonK, q14EventsAsofOrder, q64Funnel,
      q65Retention, q66EventsSliding, q81SessionPaths, q85SkipgramPairs, q115RateAnomaly,
      q121ClickAttribution)
}
