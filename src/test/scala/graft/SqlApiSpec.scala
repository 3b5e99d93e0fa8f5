package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** The SQL front door: the same star schema is queryable through spark.sql
  * with results identical to the DataFrame-built plans (Flink Table API and
  * SQL are two surfaces over one planner; same here via Catalyst). */
class SqlApiSpec extends AnyFunSuite with SparkTest {

  test("spark.sql over registered views matches the DataFrame formulation") {
    Tables.registerAll(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val q01 = SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(viaSql.sameElements(q01))
  }

  test("joins, subqueries and windows parse and run through SQL") {
    Tables.registerAll(spark, sfDir)
    val n = spark.sql(
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""".stripMargin).count()
    assert(n > 0)
  }
}
