package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.RelationalQueries4

/** q35 — approx_count_distinct (HLL++) has no cross-engine oracle (the sketch
  * is engine-specific); correctness is bounded relative error vs the exact
  * count computed in the same query.
  */
class ApproxSpec extends AnyFunSuite with SparkTest {

  test("approx_count_distinct stays within 5% of the exact distinct count") {
    val rows = RelationalQueries4.queries("q35_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val apx = r.getAs[Long]("apx_parts").toDouble
      val exact = r.getAs[Long]("n_parts").toDouble
      assert(math.abs(apx - exact) / exact < 0.05,
        s"approx=$apx exact=$exact for ${r.get(0)}")
    }
  }

  test("approx_percentile honors its accuracy contract vs the exact percentile") {
    import org.apache.spark.sql.functions._
    // percentile_approx(col, p, accuracy) guarantees a rank error within
    // n/accuracy of the true percentile rank (Flink exposes the same sketch
    // family through its percentile UDAFs)
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    val n = li.count().toDouble
    val accuracy = 1000
    for (p <- Seq(0.5, 0.95)) {
      val apx = li.agg(percentile_approx(col("l_extendedprice"), lit(p), lit(accuracy)))
        .head.getDouble(0)
      // rank of the approx answer must be within n/accuracy of p*n
      val rank = li.filter(col("l_extendedprice") <= apx).count().toDouble
      assert(math.abs(rank - p * n) <= n / accuracy + 1,
        s"p=$p approx=$apx rank=$rank expected ~${p * n} ± ${n / accuracy}")
    }
  }
}
