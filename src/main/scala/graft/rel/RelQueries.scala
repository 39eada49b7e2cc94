package graft.rel

import graft.core.Tables
import graft.queries.Declared
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Part B relational query library over the star schema (SURVEY.md §2B):
  * filtered group aggregation, multi-way joins (broadcast for dims), semi/
  * anti joins, window top-k, total-order top-k, set ops, rollup, date
  * buckets. Each query is declarative DataFrame API — Catalyst pushes
  * filters/projections into the parquet scans and picks join strategies;
  * dimension sides are explicitly `broadcast()` where they stay small at any
  * scale factor (region/nation) and left to AQE otherwise.
  */
object RelQueries {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  /** TPC-H Q1-style pricing summary: filter → group → multi-agg. */
  val q01PricingSummary: Declared = Declared.sql(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    t(spark, dir).lineitem
      .where(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** 3-way join + agg (customer ⋈ orders ⋈ lineitem per market segment).
    *
    * Scale posture: `lineitem` (the biggest table) is reduced to one row per
    * `l_orderkey` BEFORE any join, so the join inputs shrink ~4× up front and
    * the widest table is shuffled exactly once, on its natural key. Because
    * `o_orderkey` is unique and the join is inner, "orders with ≥1 lineitem"
    * is one row per order by construction — a plain `count(*)` replaces
    * `countDistinct`, keeping the distinct-Expand out of the physical plan
    * (asserted in ScalePostureSpec). The oracle SQL is the unoptimized form.
    */
  val q02MktsegmentRevenue: Declared = Declared.sql(
    "q02_mktsegment_revenue",
    """SELECT c_mktsegment,
      |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (spark, dir) =>
    val tt = t(spark, dir)
    val orderRev = tt.lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("order_rev"))
    tt.orders.select(col("o_orderkey"), col("o_custkey"))
      .join(orderRev, col("l_orderkey") === col("o_orderkey"))
      .join(tt.customer.select(col("c_custkey"), col("c_mktsegment")),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("order_rev")), 2).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** Window top-k per group (top-2 orders per customer by price). */
  val q03Top2OrdersPerCust: Declared = Declared.sql(
    "q03_top2_orders_per_cust",
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) x
      |WHERE rn <= 2
      |ORDER BY o_custkey, rn""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir).orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .orderBy("o_custkey", "rn")
  }

  /** Anti join: customers with no order above a threshold. */
  val q04CustWithoutBigOrders: Declared = Declared.sql(
    "q04_cust_without_big_orders",
    """SELECT c_nationkey, count(*) AS n_cust
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 420000)
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin) { (spark, dir) =>
    val tt = t(spark, dir)
    tt.customer
      .join(
        tt.orders.where(col("o_totalprice") > 420000),
        col("c_custkey") === col("o_custkey"),
        "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"))
      .orderBy("c_nationkey")
  }

  /** Semi join: customers with at least one order in status P, per nation. */
  val q05CustWithOpenOrders: Declared = Declared.sql(
    "q05_cust_with_open_orders",
    """SELECT c_nationkey, count(*) AS n_cust
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin) { (spark, dir) =>
    val tt = t(spark, dir)
    tt.customer
      .join(
        tt.orders.where(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"),
        "left_semi")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_cust"))
      .orderBy("c_nationkey")
  }

  /** 4-way star join with broadcast dimensions (region, nation). */
  val q06RegionSales: Declared = Declared.sql(
    "q06_region_sales",
    """SELECT r_name, CAST(count(*) AS BIGINT) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_sales
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin) { (spark, dir) =>
    val tt = t(spark, dir)
    tt.orders
      .join(tt.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(tt.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(tt.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total_sales"))
      .orderBy("r_name")
  }

  /** Total-order top-k → Catalyst TakeOrderedAndProject, no full sort. */
  val q07PartTopk: Declared = Declared.sql(
    "q07_part_topk",
    """SELECT p_partkey, p_name, p_retailprice
      |FROM part
      |ORDER BY p_retailprice DESC, p_partkey ASC
      |LIMIT 10""".stripMargin) { (spark, dir) =>
    t(spark, dir).part
      .select("p_partkey", "p_name", "p_retailprice")
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      .limit(10)
  }

  /** Set op: nations having both rich customers and rich suppliers. */
  val q08NationIntersect: Declared = Declared.sql(
    "q08_nation_intersect",
    """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
      |INTERSECT
      |SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
      |ORDER BY nationkey""".stripMargin) { (spark, dir) =>
    val tt = t(spark, dir)
    tt.customer
      .where(col("c_acctbal") > 9000)
      .select(col("c_nationkey").as("nationkey"))
      .intersect(tt.supplier.where(col("s_acctbal") > 9000).select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")
  }

  /** Rollup with subtotal + grand-total rows. */
  val q09RollupSales: Declared = Declared.sql(
    "q09_rollup_sales",
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin) { (spark, dir) =>
    t(spark, dir).lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty"),
        col("n"))
      .orderBy("flag", "status")
  }

  /** Date-part bucketing (year × priority). */
  val q10OrdersByYear: Declared = Declared.sql(
    "q10_orders_by_year",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY o_year, o_orderpriority
      |ORDER BY o_year, o_orderpriority""".stripMargin) { (spark, dir) =>
    t(spark, dir).orders
      .groupBy(year(col("o_orderdate")).as("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_year", "o_orderpriority")
  }

  /** Cube: all grouping combinations incl. per-status and grand total. */
  val q27CubeSales: Declared = Declared.sql(
    "q27_cube_sales",
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY flag, status""".stripMargin) { (spark, dir) =>
    t(spark, dir).lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_extendedprice"), 2).as("sum_price"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_price"),
        col("n"))
      .orderBy("flag", "status")
  }

  /** Exact percentiles (the oracle-mode A12 statistics; percentile_approx
    * is the documented 100 TB switch).
    */
  val q28Percentiles: Declared = Declared.sql(
    "q28_percentiles",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
      |  round(avg(l_extendedprice), 4) AS mean
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    // one percentile buffer for all three quantiles (three separate
    // percentile() aggregates would each buffer the full group)
    t(spark, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D))").as("ps"),
        round(avg("l_extendedprice"), 4).as("mean"))
      .select(
        col("l_returnflag"),
        round(col("ps").getItem(0), 4).as("p25"),
        round(col("ps").getItem(1), 4).as("p50"),
        round(col("ps").getItem(2), 4).as("p75"),
        col("mean"))
      .orderBy("l_returnflag")
  }

  /** Approximate percentiles — the 100 TB switch q28's doc names, now a
    * first-class declared query: `approx_percentile` (Greenwald-Khanna)
    * is one mergeable fixed-size sketch per group where the exact
    * `percentile` buffers the whole group (a full-width sort — 22 s at
    * 60 M rows vs a streaming aggregate). Rows-only like q36: sketch
    * internals differ across engines, so the accuracy contract is the
    * RANK-error envelope asserted in spec (GK guarantees rank error ≤
    * n/accuracy) rather than a cross-engine hash.
    */
  val q133PercentilesApprox: Declared = Declared.rowsOnly("q133_percentiles_approx") {
    (spark, dir) =>
      t(spark, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_extendedprice, array(0.25D, 0.50D, 0.75D), 10000)").as("ps"),
          round(avg("l_extendedprice"), 4).as("mean"),
          count(lit(1)).as("n"))
        .select(
          col("l_returnflag"),
          round(col("ps").getItem(0), 4).as("p25"),
          round(col("ps").getItem(1), 4).as("p50"),
          round(col("ps").getItem(2), 4).as("p75"),
          col("mean"),
          col("n"))
        .orderBy("l_returnflag")
  }

  /** Set difference: 1995 customers who placed no 2001 order. */
  val q29ExceptCustkeys: Declared = Declared.sql(
    "q29_except_custkeys",
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001
      |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
    val o = t(spark, dir).orders
    o.where(year(col("o_orderdate")) === 1995)
      .select("o_custkey")
      .except(o.where(year(col("o_orderdate")) === 2001).select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** Window frames: running revenue + delta to previous order per customer.
    * The running sum accumulates in the partition's total order, so it is
    * deterministic on both engines.
    */
  val q30WindowRunning: Declared = Declared.sql(
    "q30_window_running",
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey
      |        ROWS UNBOUNDED PRECEDING), 2) AS running_total,
      |  round(o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey), 2) AS delta_prev
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir).orders
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        round(
          sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          2).as("running_total"),
        round(col("o_totalprice") - lag("o_totalprice", 1).over(w), 2).as("delta_prev"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Equi + range (theta) join: pairs of orders by the same customer within
    * 30 days — Catalyst plans the equi key as the join key and applies the
    * range predicate as a post-condition, so there is no cross-product.
    */
  val q31OrdersRangeJoin: Declared = Declared.sql(
    "q31_orders_range_join",
    """SELECT a.o_custkey, count(*) AS n_pairs
      |FROM orders a JOIN orders b
      |  ON a.o_custkey = b.o_custkey
      | AND b.o_orderdate > a.o_orderdate
      | AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
      |GROUP BY a.o_custkey
      |ORDER BY a.o_custkey""".stripMargin) { (spark, dir) =>
    val o = t(spark, dir).orders.select("o_custkey", "o_orderkey", "o_orderdate")
    val a = o.toDF("o_custkey", "a_orderkey", "a_date")
    val b = o.toDF("b_custkey", "b_orderkey", "b_date")
    a.join(
        b,
        col("o_custkey") === col("b_custkey") &&
          col("b_date") > col("a_date") &&
          col("b_date") <= col("a_date") + expr("INTERVAL 30 DAYS"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("o_custkey")
  }

  /** HLL approximate distinct (the 100 TB-mode counterpart of the exact
    * countDistinct used in oracle queries). Rows-only: HLL sketches differ
    * across engines; ApproxSpec asserts the relative-error envelope against
    * the exact counts instead.
    */
  val q36ApproxDistinct: Declared = Declared.rowsOnly("q36_approx_distinct") { (spark, dir) =>
    t(spark, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** GROUPING SETS beyond rollup/cube — via the SQL surface (the DataFrame
    * API exposes only rollup/cube; spark.sql shares the same Catalyst
    * plan).
    */
  val q42GroupingSets: Declared = Declared.sql(
    "q42_grouping_sets",
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY flag, status""".stripMargin) { (spark, dir) =>
    t(spark, dir).lineitem.createOrReplaceTempView("graft_li")
    spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM graft_li
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY flag, status""".stripMargin)
  }

  /** LIKE / regexp predicates + IN / BETWEEN, pushed into the scan. */
  val q43LikeFilters: Declared = Declared.sql(
    "q43_like_filters",
    """SELECT p_brand, count(*) AS n, round(sum(p_retailprice), 2) AS total
      |FROM part
      |WHERE p_name LIKE '%red%'
      |  AND regexp_matches(p_type, '^(ECONOMY|SMALL)')
      |  AND p_size BETWEEN 1 AND 40
      |  AND p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#4','Brand#5')
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (spark, dir) =>
    t(spark, dir).part
      .where(
        col("p_name").like("%red%") &&
          col("p_type").rlike("^(ECONOMY|SMALL)") &&
          col("p_size").between(1, 40) &&
          col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), round(sum("p_retailprice"), 2).as("total"))
      .orderBy("p_brand")
  }

  /** Sample stats beyond mean: stddev/variance (ddof=1 — the A17 contract),
    * correlation and covariance.
    */
  val q44Stats: Declared = Declared.sql(
    "q44_stats",
    """SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 4) AS sd_qty,
      |  round(var_samp(l_quantity), 4) AS var_qty,
      |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    t(spark, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp("l_quantity"), 4).as("sd_qty"),
        round(var_samp("l_quantity"), 4).as("var_qty"),
        round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qty_price"),
        round(covar_samp("l_quantity", "l_extendedprice"), 2).as("cov_qty_price"))
      .orderBy("l_returnflag")
  }

  /** collect_set + sort_array (order-stable via array_join to a string —
    * the A7 dummy-detection primitive surfaced as a query).
    */
  val q45CollectSet: Declared = Declared.sql(
    "q45_collect_set",
    """SELECT l_returnflag,
      |  array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
      |  CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_statuses
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    t(spark, dir).lineitem
      .groupBy("l_returnflag")
      .agg(
        array_join(sort_array(collect_set("l_linestatus")), ",").as("statuses"),
        countDistinct("l_linestatus").as("n_statuses"))
      .orderBy("l_returnflag")
  }

  /** Date/time scalar functions: hour buckets + epoch seconds range. */
  val q46DateParts: Declared = Declared.sql(
    "q46_date_parts",
    """SELECT CAST(hour(ts) AS INTEGER) AS h, event_type, count(*) AS n,
      |  CAST(min(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS min_epoch,
      |  CAST(max(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS max_epoch
      |FROM events
      |GROUP BY h, event_type
      |ORDER BY h, event_type""".stripMargin) { (spark, dir) =>
    t(spark, dir).events
      .groupBy(hour(col("ts")).as("h"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(unix_timestamp(col("ts"))).as("min_epoch"),
        max(unix_timestamp(col("ts"))).as("max_epoch"))
      .orderBy("h", "event_type")
  }

  /** rank / dense_rank / lead + a time-RANGE frame (orders in the trailing
    * 30 days), completing the window-function surface next to q03/q30.
    */
  val q47RankWindows: Declared = Declared.sql(
    "q47_rank_windows",
    """SELECT o_custkey, o_orderkey,
      |  CAST(rnk AS INTEGER) AS rnk, CAST(drnk AS INTEGER) AS drnk,
      |  next_price, CAST(n_30d AS BIGINT) AS n_30d
      |FROM (
      |  SELECT o_custkey, o_orderkey,
      |    rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
      |    dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk,
      |    lead(o_totalprice) OVER (PARTITION BY o_custkey
      |                             ORDER BY o_totalprice DESC, o_orderkey) AS next_price,
      |    count(*) OVER (PARTITION BY o_custkey ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
      |                   RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_30d
      |  FROM orders) x
      |WHERE rnk <= 3
      |ORDER BY o_custkey, rnk, o_orderkey""".stripMargin) { (spark, dir) =>
    val byPrice = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    val byPriceTie =
      Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val trailing30d = Window
      .partitionBy("o_custkey")
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-2592000L, 0L)
    t(spark, dir).orders
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        rank().over(byPrice).as("rnk"),
        dense_rank().over(byPrice).as("drnk"),
        lead("o_totalprice", 1).over(byPriceTie).as("next_price"),
        count(lit(1)).over(trailing30d).as("n_30d"))
      .where(col("rnk") <= 3)
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  /** UNION ALL of two filtered projections + schema-full JSON parsing
    * (`from_json`, vs the regexp path in q13).
    */
  val q48UnionJson: Declared = Declared.sql(
    "q48_union_json",
    """WITH u AS (
      |  SELECT event_type, 'high_value' AS reason,
      |         CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
      |  FROM events WHERE value > 90
      |  UNION ALL
      |  SELECT event_type, 'error_type' AS reason,
      |         CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
      |  FROM events WHERE event_type = 'error')
      |SELECT reason, event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
      |FROM u GROUP BY reason, event_type
      |ORDER BY reason, event_type""".stripMargin) { (spark, dir) =>
    val ev = t(spark, dir).events
      .withColumn(
        "k",
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k"))
    val high = ev.where(col("value") > 90)
      .select(col("event_type"), lit("high_value").as("reason"), col("k"))
    val errs = ev.where(col("event_type") === "error")
      .select(col("event_type"), lit("error_type").as("reason"), col("k"))
    high
      .unionAll(errs)
      .groupBy("reason", "event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      .orderBy("reason", "event_type")
  }

  /** Pivot (long→wide): returnflag columns per linestatus via the DataFrame
    * pivot API with explicit values (static value list keeps the oracle
    * portable — conditional aggregation in ANSI SQL).
    */
  val q52Pivot: Declared = Declared.sql(
    "q52_pivot",
    """SELECT l_linestatus,
      |  round(sum(l_quantity) FILTER (WHERE l_returnflag = 'A'), 2) AS qty_A,
      |  round(sum(l_quantity) FILTER (WHERE l_returnflag = 'N'), 2) AS qty_N,
      |  round(sum(l_quantity) FILTER (WHERE l_returnflag = 'R'), 2) AS qty_R
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin) { (spark, dir) =>
    t(spark, dir).lineitem
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum("l_quantity"), 2))
      .toDF("l_linestatus", "qty_A", "qty_N", "qty_R")
      .orderBy("l_linestatus")
  }

  val all: Seq[Declared] = Seq(
    q01PricingSummary,
    q02MktsegmentRevenue,
    q03Top2OrdersPerCust,
    q04CustWithoutBigOrders,
    q05CustWithOpenOrders,
    q06RegionSales,
    q07PartTopk,
    q08NationIntersect,
    q09RollupSales,
    q10OrdersByYear,
    q27CubeSales,
    q28Percentiles,
    q29ExceptCustkeys,
    q30WindowRunning,
    q31OrdersRangeJoin,
    q36ApproxDistinct,
    q133PercentilesApprox,
    q42GroupingSets,
    q43LikeFilters,
    q44Stats,
    q45CollectSet,
    q46DateParts,
    q47RankWindows,
    q48UnionJson,
    q52Pivot)
}
