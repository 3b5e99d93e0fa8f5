package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.1 continued — wider Table API / DataSet surface: CUBE grouping sets,
  * lag/lead, first/last_value frames, pivot, correlated aggregates,
  * maxBy/minBy (DataSet aggregations), and an event-time as-of join (Flink
  * temporal table join, FOR SYSTEM_TIME AS OF — reference
  * flink-table/flink-table-planner-blink temporal join rules), expressed with
  * an IGNORE NULLS running last_value so it needs no custom operator.
  */
object RelationalQueries2 {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  // --- q21: CUBE grouping sets ---
  private val q21: Q = (s, dir) =>
    t(s, dir, "lineitem").cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("rev"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"), col("n"), col("rev"))
  private val q21Sql =
    """SELECT coalesce(l_returnflag,'ALL') AS returnflag, coalesce(l_linestatus,'ALL') AS linestatus,
      | count(*) AS n, round(sum(l_extendedprice),2) AS rev
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  // --- q22: LAG / LEAD over ordered per-key windows ---
  private val q22: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"))
  }
  private val q22Sql =
    """SELECT o_custkey, o_orderkey,
      | lag(o_totalprice, 1) OVER w AS prev_price,
      | lead(o_totalprice, 1) OVER w AS next_price
      |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  // --- q23: FIRST_VALUE / LAST_VALUE with full-partition frame ---
  private val q23: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
      first(col("o_totalprice")).over(w).as("first_price"),
      last(col("o_totalprice")).over(w).as("last_price")).distinct()
  }
  private val q23Sql =
    """SELECT DISTINCT o_custkey, o_orderkey,
      | first_value(o_totalprice) OVER w AS first_price,
      | last_value(o_totalprice) OVER w AS last_price
      |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  // --- q24: pivot (status → columns) ---
  private val q24: Q = (s, dir) =>
    t(s, dir, "orders").groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P")).agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
  private val q24Sql =
    """SELECT o_orderpriority,
      | CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
      | CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
      | CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // --- q25: correlated aggregate — orders above their customer's average ---
  private val q25: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val avgs = o.groupBy(col("o_custkey").as("ck"))
      .agg(round(avg("o_totalprice"), 4).as("cust_avg"))
    o.join(avgs, col("o_custkey") === col("ck"))
      .filter(col("o_totalprice") > col("cust_avg"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n_above"))
  }
  private val q25Sql =
    """SELECT o_orderpriority, count(*) AS n_above
      |FROM orders o JOIN (SELECT o_custkey AS ck, round(avg(o_totalprice),4) AS cust_avg
      |                    FROM orders GROUP BY 1) a ON o.o_custkey = a.ck
      |WHERE o.o_totalprice > a.cust_avg
      |GROUP BY o_orderpriority""".stripMargin

  // --- q26: maxBy/minBy (Flink DataSet aggregations) with unique tie-break ---
  private val q26: Q = (s, dir) =>
    t(s, dir, "customer").groupBy("c_mktsegment")
      .agg(
        // acctbal is a 2-dp decimal; *1e8 + custkey builds a unique, exactly
        // representable ordering key so max_by ties cannot flip across engines
        max_by(col("c_custkey"), col("c_acctbal") * 100000000L + col("c_custkey")).as("richest"),
        min_by(col("c_custkey"), col("c_acctbal") * 100000000L + col("c_custkey")).as("poorest"),
        round(max(col("c_acctbal")), 2).as("max_bal"))
  private val q26Sql =
    """SELECT c_mktsegment,
      | max_by(c_custkey, c_acctbal * 100000000 + c_custkey) AS richest,
      | min_by(c_custkey, c_acctbal * 100000000 + c_custkey) AS poorest,
      | round(max(c_acctbal),2) AS max_bal
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  // --- q27: as-of join — latest click at/before each purchase (temporal join) ---
  private val q27: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("last_click_ts"))
  }
  private val q27Sql =
    """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      | CAST(last_click_ts AS TIMESTAMP) AS last_click_ts FROM (
      | SELECT event_id, user_id, ts, event_type,
      |  last_value(CASE WHEN event_type='click' THEN ts END IGNORE NULLS) OVER w AS last_click_ts
      | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |) WHERE event_type='purchase'""".stripMargin

  val queries: Map[String, Q] = Map(
    "q21_cube" -> q21, "q22_lag_lead" -> q22, "q23_first_last" -> q23,
    "q24_pivot" -> q24, "q25_correlated_avg" -> q25, "q26_max_by" -> q26,
    "q27_asof_join" -> q27)

  val oracles: Map[String, String] = Map(
    "q21_cube" -> q21Sql, "q22_lag_lead" -> q22Sql, "q23_first_last" -> q23Sql,
    "q24_pivot" -> q24Sql, "q25_correlated_avg" -> q25Sql, "q26_max_by" -> q26Sql,
    "q27_asof_join" -> q27Sql)
}
