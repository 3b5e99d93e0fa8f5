package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{GraftExtensions, TopNPerKey}
import graft.sources.Tables

/** Custom LogicalPlan + Strategy + SparkPlan: map-side-pruned top-N per key. */
class TopNPerKeySpec extends AnyFunSuite with SparkTest {

  private lazy val s = { GraftExtensions.installInto(spark); spark }

  test("TopNPerKey matches the row_number formulation exactly") {
    val orders = Tables.load(s, sfDir, "orders")
    val native = TopNPerKey(orders, 3,
        Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")))
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    val viaWindow = graft.operators.Relational.topNPerGroup(orders,
        Seq(col("o_custkey")), Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity).toSeq
    assert(native == viaWindow)
    assert(native.nonEmpty)
  }

  test("the physical plan is partial → exchange → final, not a window") {
    val orders = Tables.load(s, sfDir, "orders")
    val df = TopNPerKey(orders, 2, Seq(col("o_custkey")), Seq(col("o_totalprice").desc))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopNPerKey"), s"expected map-side prune:\n$plan")
    assert(plan.contains("FinalTopNPerKey"), s"expected reduce-side phase:\n$plan")
    assert(plan.contains("hashpartitioning(o_custkey"),
      s"Exchange must cluster the PRUNED rows by key:\n$plan")
    assert(!plan.contains("Window"), s"must not fall back to window exec:\n$plan")
  }

  test("ascending order and n=1 (per-key argmin)") {
    val orders = Tables.load(s, sfDir, "orders")
    val native = TopNPerKey(orders, 1,
        Seq(col("o_custkey")), Seq(col("o_totalprice").asc, col("o_orderkey").asc))
      .select(col("o_custkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val expected = orders.groupBy("o_custkey").agg(min("o_totalprice").as("m"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(native == expected)
  }

  test("SQLMetrics report the map-side prune ratio") {
    // AQE wraps finished stages in QueryStageExec leaves that tree-collect
    // cannot descend into; disable it here so the raw plan is inspectable
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val orders = Tables.load(s, sfDir, "orders")
      val df = TopNPerKey(orders, 2, Seq(col("o_custkey")), Seq(col("o_totalprice").desc))
      df.collect()
      val partial = df.queryExecution.executedPlan.collectFirst {
        case p: graft.plans.PartialTopNPerKeyExec => p
      }
      assert(partial.nonEmpty, "PartialTopNPerKeyExec not found in executed plan")
      val in = partial.get.metrics("inputRows").value
      val kept = partial.get.metrics("keptRows").value
      assert(in > 0 && kept > 0 && kept < in,
        s"metrics must show pruning: input=$in kept=$kept")
    } finally s.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
