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
}
