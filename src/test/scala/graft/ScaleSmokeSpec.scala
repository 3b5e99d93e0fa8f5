package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.Tag
import org.apache.spark.sql.functions._

/** Marks minutes-long suites excluded from the default `sbt test` (see
  * build.sbt). Run explicitly:
  * `sbt "testOnly graft.ScaleSmokeSpec -- -n graft.SlowTest"` */
object SlowTest extends Tag("graft.SlowTest")

/** Empirical scale smoke for the top-cost paths: build a ~10x corpus from
  * sf0.1 by replicating tables with SHIFTED ids, then assert (a) wall-time
  * grows ≲ linearly (quadratic candidate fan-out would show ~100x) and
  * (b) the executed plans stay cartesian-free at the larger stats (AQE can
  * flip join strategies when sizes change — the plan-quality assertions at
  * sf0.001 alone don't cover that).
  *
  * Replica texts get a per-replica suffix token so each replica keeps the
  * BASE corpus's duplicate structure: without it every document would gain
  * 10 exact copies and the dedup candidate sets would grow quadratically BY
  * DATA CONSTRUCTION, which would measure the dataset, not the plan. */
class ScaleSmokeSpec extends AnyFunSuite with SparkTest {

  test("10x scale smoke: heavy paths grow ~linearly, plans stay cartesian-free",
      SlowTest) {
    val base = "/root/testdata/sf0.1"
    val reps = 10
    val scaled = java.nio.file.Files.createTempDirectory("graft_scale").toString
    val docs = spark.read.parquet(s"$base/documents.parquet")
    (0 until reps).map(i => docs
        .withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
        .withColumn("text", concat(col("text"), lit(s" zrep$i"))))
      .reduce(_ union _)
      .write.parquet(s"$scaled/documents.parquet")
    val orders = spark.read.parquet(s"$base/orders.parquet")
    (0 until reps).map(i => orders
        .withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 10000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i.toLong * 1000000L)))
      .reduce(_ union _)
      .write.parquet(s"$scaled/orders.parquet")

    val queries = Seq("d02_minhash_pairs", "d04_jaccard_pairs",
      "d07_dup_clusters", "d12_incremental_dedup", "d14_fuzzy_decontaminate",
      "a04_rfm_scalable", "t07_repetition_filter")
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    time(queries.head, base) // JIT/codegen warmup outside the measurements
    val rows = queries.map { q =>
      val tb = time(q, base)
      // plan audit AT the 10x stats (builder side effects run untimed here)
      val plan = SparkEntry.queries(q)(spark, scaled)
        .queryExecution.executedPlan.toString
      spark.catalog.clearCache()
      assert(!plan.contains("CartesianProduct"),
        s"$q: CartesianProduct appeared at 10x stats")
      val ts = time(q, scaled)
      (q, tb, ts)
    }
    rows.foreach { case (q, tb, ts) =>
      info(f"$q%-26s base=$tb%6.2fs 10x=$ts%7.2fs ratio=${ts / tb}%5.1fx")
      // linear-ish bound with generous noise headroom: a quadratic
      // candidate explosion at 10x data shows ~100x time, far past this
      assert(ts <= tb * 30 + 10.0,
        f"$q: super-linear blowup — base $tb%.2fs, 10x $ts%.2fs")
    }
  }

  test("knn graph at 10x embeddings with k ~ sqrt(N) follows the N^1.5 trade",
      SlowTest) {
    // the s05 scale knob, exercised: with k ∝ √N the per-cell population
    // stays ~constant and total candidate work grows as N^1.5 — 10x data
    // ⇒ ~31.6x candidates (NOT ~100x, which fixed-k would produce). The
    // bound separates the two regimes with headroom for fixed overheads.
    val base = "/root/testdata/sf0.1"
    val reps = 10
    val scaled = java.nio.file.Files.createTempDirectory("graft_scale_e").toString
    val e = spark.read.parquet(s"$base/embeddings.parquet")
    (0 until reps).map(i => e
        .withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000L)))
      .reduce(_ union _)
      .write.parquet(s"$scaled/embeddings.parquet")
    val nBase = e.count()
    def run(dir: String, n: Long): Double = {
      val k = math.max(8, math.sqrt(n.toDouble).toInt)
      val t0 = System.nanoTime()
      graft.queries.LlmQueries.knnGraph(spark, dir, k = k, nProbes = 3, topK = 3)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    run(base, nBase) // warmup
    val tb = run(base, nBase)
    val ts = run(scaled, nBase * reps)
    info(f"knn graph base=$tb%6.2fs 10x=$ts%7.2fs ratio=${ts / tb}%5.1fx")
    // N^1.5 predicts ~31.6x work; quadratic (fixed k) would be ~100x
    assert(ts <= tb * 50 + 15.0,
      f"knn graph super-N^1.5 blowup — base $tb%.2fs, 10x $ts%.2fs")
  }
}
