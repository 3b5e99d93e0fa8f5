package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.1 continued — bounded OVER frames and exact percentiles. */
object RelationalQueries3 {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  // --- q28: bounded ROWS frame (moving average over last 3 orders) ---
  private val q28: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, 0)
    t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey"),
      round(avg(col("o_totalprice")).over(w), 4).as("ma3"),
      count(lit(1)).over(w).as("n_window"))
  }
  private val q28Sql =
    """SELECT o_custkey, o_orderkey,
      | round(avg(o_totalprice) OVER w, 4) AS ma3,
      | count(*) OVER w AS n_window
      |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin

  // --- q29: exact interpolated percentiles per group ---
  private val q29: Q = (s, dir) =>
    t(s, dir, "orders").groupBy("o_orderpriority")
      // exact percentile: both engines interpolate at rank p*(n-1)
      .agg(round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"))
  private val q29Sql =
    """SELECT o_orderpriority,
      | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      | round(min(o_totalprice), 2) AS lo,
      | round(max(o_totalprice), 2) AS hi
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  val queries: Map[String, Q] = Map("q28_bounded_over" -> q28, "q29_percentiles" -> q29)
  val oracles: Map[String, String] = Map("q28_bounded_over" -> q28Sql, "q29_percentiles" -> q29Sql)
}
