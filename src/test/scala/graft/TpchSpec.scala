package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TpchQueries

/** §2.11 — the TPC-H Q1–Q22 SQL-parity sweep. The VALUE comparison runs
  * in the driver gate (same text through DuckDB, strict hash compare);
  * this suite is the in-repo regression net: every query text must parse,
  * plan, and execute at sf0.001, and the structurally-guaranteed outputs
  * hold (Q1's six groups, one-row aggregates non-null, LIMIT bounds). */
class TpchSpec extends AnyFunSuite with SparkTest {

  private lazy val all = TpchQueries.queries.toSeq.sortBy(_._1)

  test("all 22 TPC-H texts parse, plan, and execute") {
    assert(all.size == 22)
    all.foreach { case (name, q) =>
      val df = q(spark, sfDir)
      val n = df.count() // forces full execution
      assert(n >= 0, name)
    }
  }

  test("structural invariants: Q1 groups, scalar aggregates, LIMIT bounds") {
    def run(name: String) = TpchQueries.queries(name)(spark, sfDir)
    val q1 = run("h01_tpch_q01").collect()
    assert(q1.length == 6) // 3 returnflags × 2 linestatuses, all present
    assert(q1.forall(r => !r.isNullAt(2) && r.getLong(9) > 0))
    // one-row scalar aggregates exist and are non-null
    Seq("h06_tpch_q06", "h14_tpch_q14", "h17_tpch_q17").foreach { n =>
      val rows = run(n).collect()
      assert(rows.length == 1, n)
    }
    // LIMIT queries respect their bound
    assert(run("h03_tpch_q03").count() <= 10)
    assert(run("h10_tpch_q10").count() <= 20)
    assert(run("h18_tpch_q18").count() <= 100)
  }

  test("the money-aggregate discipline holds: Q1 sums recompute exactly " +
       "from a driver-side scaled-integer fold") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= expr("date '2001-09-01' - INTERVAL '90' DAY"))
    val expect = li.collect().map { r =>
      val ep = r.getAs[Double]("l_extendedprice")
      val d = r.getAs[Double]("l_discount")
      (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"),
        math.round(ep * (1 - d) * 10000))
    }.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum / 1e4).toMap
    val got = TpchQueries.queries("h01_tpch_q01")(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "sum_disc_price").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    expect.foreach { case (k, v) => assert(got(k) == v, s"$k: ${got(k)} != $v") }
  }
}
