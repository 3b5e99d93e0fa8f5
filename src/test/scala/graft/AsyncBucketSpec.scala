package graft

import scala.concurrent.Future
import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsyncLookup
import graft.sources.Tables

/** Async-I/O operator + bucketed co-located joins (shuffle-free). */
class AsyncBucketSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("AsyncLookup.orderedWait enriches with bounded concurrency") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val ds = (1L to 100L).toDS()
    val out = AsyncLookup.orderedWait(ds, capacity = 8, timeout = 30.seconds) { id =>
      Future { (id, s"svc-$id") } // stands in for an external RPC
    }
    val rows = out.collect().sortBy(_._1)
    assert(rows.length == 100 && rows.head == ((1L, "svc-1")))
  }

  test("AsyncLookup.unorderedWait emits in completion order, not input order") {
    import scala.concurrent.ExecutionContext.Implicits.global
    val ds = (1L to 8L).toDS().repartition(1)
    val out = AsyncLookup.unorderedWait(ds, capacity = 8, timeout = 30.seconds) { id =>
      Future { Thread.sleep((9 - id) * 100); id } // later ids finish first
    }.collect().toSeq
    assert(out.toSet == (1L to 8L).toSet)
    assert(out != (1L to 8L).toSeq, s"expected completion order, got input order: $out")
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    // default warehouse dir (./spark-warehouse, gitignored) — the conf is static;
    // clear leftovers from prior JVMs (catalog forgets, the directory doesn't)
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) { d.listFiles().foreach(_.delete()); d.delete() }
    }
    Tables.load(spark, sfDir, "orders").write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.load(spark, sfDir, "lineitem").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          $"l_orderkey" === $"o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed equi-join must not shuffle either side:\n$plan")
      assert(joined.count() == Tables.load(spark, sfDir, "lineitem").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
