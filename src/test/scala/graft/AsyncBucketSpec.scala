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

  test("orderedWait: slow head blocks emission only, not later launches") {
    import scala.concurrent.ExecutionContext.Implicits.global
    AsyncProbe.launches.clear()
    val t0 = System.nanoTime()
    val ds = (1L to 12L).toDS().repartition(1)
    val out = AsyncLookup.orderedWait(ds, capacity = 4, timeout = 30.seconds) { id =>
      AsyncProbe.launches.put(id, (System.nanoTime() - t0) / 1000000L)
      Future { Thread.sleep(if (id == 1) 2000 else 20); (id, s"svc-$id") }
    }.collect().toSeq
    assert(out == (1L to 12L).map(id => (id, s"svc-$id")),
      s"emission must preserve input order: $out")
    // items 5..12 fit only in slots freed by completing successors of the
    // slow head — with batch-granular concurrency they would launch after
    // the 2000 ms head finishes; the rolling window launches them well
    // before (relative to item 1's launch, excluding task-start overhead;
    // margin sized to survive a saturated machine during the full suite)
    val start = AsyncProbe.launches.get(1L)
    (5L to 12L).foreach { id =>
      val at = AsyncProbe.launches.get(id) - start
      assert(at < 1600, s"item $id launched at +${at}ms — window stalled behind slow head")
    }
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

/** Launch-time probe for the rolling-window test (local mode ⇒ one JVM, so
  * a static map is visible across the task/driver boundary). */
object AsyncProbe {
  val launches = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
}
