package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sources.Tables

/** §2.1 Relational core — Flink Table API / Blink planner analogs.
  *
  * Each query has a DuckDB oracle with IDENTICAL output column names and
  * rounding, so the driver's hash compare is stable. Floating aggregates are
  * rounded (2–4 dp) on both sides; every ORDER BY ... LIMIT has a unique
  * tie-break key.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)
  private def ts(lit0: String) = to_timestamp(lit(lit0))

  // --- q01: full-table aggregate (TPC-H Q1 shape; Flink Table.groupBy.agg) ---
  private val q01: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("1998-09-01"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        // products of 2-dp decimals are exact 4-dp decimals: rounding at 4 dp
        // can never land on a half-boundary, so both engines agree bit-for-bit
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity),2) AS sum_qty,
      | round(sum(l_extendedprice),2) AS sum_base_price,
      | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
      | round(avg(l_quantity),4) AS avg_qty,
      | round(avg(l_extendedprice),4) AS avg_price,
      | round(avg(l_discount),4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // --- q02: filter + project with arithmetic (pushdown-friendly scan) ---
  private val q02: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01") && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"),
        // row-level products of identical parquet doubles are bitwise equal in
        // both engines — no rounding needed (rounding would ADD boundary risk)
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
        (col("l_quantity") * (lit(1) + col("l_tax"))).as("taxed_qty"))
  private val q02Sql =
    """SELECT l_orderkey, l_linenumber,
      | l_extendedprice*(1-l_discount) AS net_price,
      | l_quantity*(1+l_tax) AS taxed_qty
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_quantity > 45""".stripMargin

  // --- q03: 3-way join + agg + deterministic top-N (TPC-H Q3 shape) ---
  private val q03: Q = (s, dir) => {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < ts("1996-06-30"))
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > ts("1996-06-30"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
  }
  private val q03Sql =
    """SELECT l_orderkey, revenue, o_orderdate FROM (
      | SELECT l_orderkey, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue, o_orderdate
      | FROM customer JOIN orders ON c_custkey=o_custkey JOIN lineitem ON o_orderkey=l_orderkey
      | WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1996-06-30'
      |   AND l_shipdate > TIMESTAMP '1996-06-30'
      | GROUP BY l_orderkey, o_orderdate)
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // --- q04: EXISTS / left-semi join (TPC-H Q4 shape) ---
  private val q04: Q = (s, dir) => {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    val l = t(s, dir, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey") && l("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
  }
  private val q04Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey=o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  // --- q05: 6-way star join, dims broadcast (TPC-H Q5 shape) ---
  private val q05: Q = (s, dir) => {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    val l = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    // dims are broadcast; only the fact tables shuffle (on the join keys)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
  }
  private val q05Sql =
    """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
      |FROM customer
      | JOIN orders ON c_custkey=o_custkey
      | JOIN lineitem ON o_orderkey=l_orderkey
      | JOIN supplier ON l_suppkey=s_suppkey AND s_nationkey=c_nationkey
      | JOIN nation ON c_nationkey=n_nationkey
      | JOIN region ON n_regionkey=r_regionkey
      |WHERE r_name='ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin

  // --- q06: selective single-row aggregate (TPC-H Q6 shape) ---
  private val q06: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_items"))
  private val q06Sql =
    """SELECT round(sum(l_extendedprice*l_discount),4) AS revenue, count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // --- q07: NOT EXISTS / left-anti join ---
  private val q07: Q = (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  private val q07Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey=c_custkey AND o_orderpriority='1-URGENT')""".stripMargin

  // --- q08: left outer join preserving unmatched, agg over result ---
  private val q08: Q = (s, dir) =>
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("spend"))
  private val q08Sql =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      | round(coalesce(sum(o_totalprice),0),2) AS spend
      |FROM customer LEFT JOIN orders ON c_custkey=o_custkey
      |GROUP BY c_custkey""".stripMargin

  // --- q09: DISTINCT aggregate ---
  private val q09: Q = (s, dir) =>
    t(s, dir, "customer").groupBy("c_mktsegment")
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_cust"),
        round(avg(col("c_acctbal")), 4).as("avg_bal"))
  private val q09Sql =
    """SELECT c_mktsegment, CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
      | count(*) AS n_cust, round(avg(c_acctbal),4) AS avg_bal
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  // --- q10: global order + limit with unique tie-break ---
  private val q10: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(50)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
  private val q10Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 50""".stripMargin

  // --- q11: Blink Top-N per group ---
  private val q11: Q = (s, dir) =>
    Relational.topNPerGroup(t(s, dir, "orders"),
      Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  private val q11Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) WHERE rn <= 3""".stripMargin

  // --- q12: Blink Deduplicate — latest event per key ---
  private val q12: Q = (s, dir) =>
    Relational.dedupFirstRow(t(s, dir, "events"),
      Seq(col("user_id")), Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id", "ts", "event_type", "value")
  private val q12Sql =
    """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM (
      | SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      | FROM events) WHERE rn = 1""".stripMargin

  // --- q13: OVER-window running total ---
  private val q13: Q = (s, dir) =>
    Relational.runningAgg(t(s, dir, "orders"),
      Seq(col("o_custkey")), Seq(col("o_orderdate"), col("o_orderkey")),
      sum(col("o_totalprice")), "rt")
      .select(col("o_custkey"), col("o_orderkey"), round(col("rt"), 2).as("running_spend"))
  private val q13Sql =
    """SELECT o_custkey, o_orderkey,
      | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend
      |FROM orders""".stripMargin

  // --- q14: ROLLUP grouping sets ---
  private val q14: Q = (s, dir) =>
    t(s, dir, "lineitem").rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
  private val q14Sql =
    """SELECT coalesce(l_returnflag,'ALL') AS returnflag, coalesce(l_linestatus,'ALL') AS linestatus,
      | round(sum(l_quantity),2) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  // --- q15: UNION / INTERSECT / EXCEPT ---
  private val q15: Q = (s, dir) => {
    val c = t(s, dir, "customer").select(col("c_nationkey").as("nk"))
    val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nk"))
    val n0 = t(s, dir, "nation").filter(col("n_regionkey") === 0)
      .select(col("n_nationkey").as("nk"))
    c.intersect(sup).union(c.except(n0)).distinct()
  }
  private val q15Sql =
    """WITH cs AS (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier),
      | ex AS (SELECT c_nationkey AS nk FROM customer EXCEPT
      |        SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
      |SELECT nk FROM cs UNION SELECT nk FROM ex""".stripMargin

  // --- q16: scalar string functions ---
  private val q16: Q = (s, dir) =>
    t(s, dir, "part").select(col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      substring(col("p_name"), 1, 8).as("name_pfx"),
      concat(col("p_type"), lit("/"), col("p_brand")).as("type_brand"),
      length(col("p_name")).as("name_len"),
      regexp_replace(col("p_name"), " ", "_").as("name_us"))
  private val q16Sql =
    """SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name,1,8) AS name_pfx,
      | p_type || '/' || p_brand AS type_brand, CAST(length(p_name) AS INT) AS name_len,
      | replace(p_name, ' ', '_') AS name_us
      |FROM part""".stripMargin

  // --- q17: temporal functions + agg ---
  private val q17: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
  private val q17Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
      | count(*) AS n_orders, round(sum(o_totalprice),2) AS total
      |FROM orders GROUP BY 1, 2""".stripMargin

  // --- q18: CASE WHEN conditional aggregation ---
  private val q18: Q = (s, dir) =>
    t(s, dir, "lineitem").groupBy("l_returnflag")
      .agg(
        round(sum(when(col("l_quantity") > 25, col("l_extendedprice")).otherwise(0)), 2).as("hi_qty_rev"),
        round(sum(when(col("l_discount") >= 0.05, col("l_extendedprice") * col("l_discount")).otherwise(0)), 4).as("promo_rev"),
        sum(when(col("l_linestatus") === "F", 1L).otherwise(0L)).as("n_finished"))
  private val q18Sql =
    """SELECT l_returnflag,
      | round(sum(CASE WHEN l_quantity > 25 THEN l_extendedprice ELSE 0 END),2) AS hi_qty_rev,
      | round(sum(CASE WHEN l_discount >= 0.05 THEN l_extendedprice*l_discount ELSE 0 END),4) AS promo_rev,
      | CAST(sum(CASE WHEN l_linestatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // --- q19: scalar subquery vs global aggregate (broadcast cross join) ---
  private val q19: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val thr = o.agg(round(avg(col("o_totalprice")) * 1.5, 4).as("thr"))
    o.crossJoin(broadcast(thr))
      .filter(col("o_totalprice") > col("thr"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
  }
  private val q19Sql =
    """SELECT o_orderpriority, count(*) AS n FROM orders
      |WHERE o_totalprice > (SELECT round(avg(o_totalprice)*1.5, 4) FROM orders)
      |GROUP BY o_orderpriority""".stripMargin

  // --- q20: window join — hourly click vs purchase counts ---
  private val q20: Q = (s, dir) => {
    val e = t(s, dir, "events")
    def hourly(typ: String, cName: String) =
      e.filter(col("event_type") === typ)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as(cName))
        .select(col("w.start").as("window_start"), col(cName))
    hourly("click", "n_clicks").join(hourly("purchase", "n_purchases"), Seq("window_start"))
  }
  private val q20Sql =
    """WITH c AS (SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS window_start, count(*) AS n_clicks
      |           FROM events WHERE event_type='click' GROUP BY 1),
      |     p AS (SELECT CAST(time_bucket(INTERVAL 1 HOUR, ts) AS TIMESTAMP) AS window_start, count(*) AS n_purchases
      |           FROM events WHERE event_type='purchase' GROUP BY 1)
      |SELECT c.window_start, c.n_clicks, p.n_purchases FROM c JOIN p USING (window_start)""".stripMargin

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01, "q02_filter_project" -> q02,
    "q03_shipping_priority" -> q03, "q04_semi_join" -> q04,
    "q05_multi_join" -> q05, "q06_selective_agg" -> q06,
    "q07_anti_join" -> q07, "q08_outer_join" -> q08,
    "q09_distinct_agg" -> q09, "q10_order_limit" -> q10,
    "q11_topn_per_group" -> q11, "q12_dedup_first_row" -> q12,
    "q13_running_total" -> q13, "q14_rollup" -> q14,
    "q15_set_ops" -> q15, "q16_string_funcs" -> q16,
    "q17_date_funcs" -> q17, "q18_case_agg" -> q18,
    "q19_scalar_subquery" -> q19, "q20_window_join" -> q20)

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql, "q02_filter_project" -> q02Sql,
    "q03_shipping_priority" -> q03Sql, "q04_semi_join" -> q04Sql,
    "q05_multi_join" -> q05Sql, "q06_selective_agg" -> q06Sql,
    "q07_anti_join" -> q07Sql, "q08_outer_join" -> q08Sql,
    "q09_distinct_agg" -> q09Sql, "q10_order_limit" -> q10Sql,
    "q11_topn_per_group" -> q11Sql, "q12_dedup_first_row" -> q12Sql,
    "q13_running_total" -> q13Sql, "q14_rollup" -> q14Sql,
    "q15_set_ops" -> q15Sql, "q16_string_funcs" -> q16Sql,
    "q17_date_funcs" -> q17Sql, "q18_case_agg" -> q18Sql,
    "q19_scalar_subquery" -> q19Sql, "q20_window_join" -> q20Sql)
}
