package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Approximation quality of the ANN scale paths, measured against the exact
  * brute-force baseline (recall@5). The floors are deliberate: they document
  * the accuracy/cost trade each variant makes on this corpus. */
class AnnRecallSpec extends AnyFunSuite with SparkTest {

  private def topk(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("LSH and IVF ANN recall@5 against brute force") {
    val exact = topk("s01_ann_topk")
    val lsh = topk("s02_ann_lsh")
    val ivf = topk("s03_ivf_ann")
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hits = exact.map { case (q, e) =>
        approx.get(q).map(a => (a intersect e).size.toDouble / e.size).getOrElse(0.0)
      }
      hits.sum / exact.size
    }
    val (rLsh, rIvf) = (recall(lsh), recall(ivf))
    info(f"recall@5: lsh=$rLsh%.3f ivf=$rIvf%.3f")
    assert(rLsh > 0.6, s"3-table multi-probe LSH recall collapsed: $rLsh")
    assert(rIvf > 0.89, s"IVF(kmeans cells, probe 3/8) recall collapsed: $rIvf")
    // int8 scalar quantization ranks by the quantized cosine — recall
    // against the exact float ranking should be near-perfect (the floor
    // documents the quantization error budget)
    val rQ = recall(topk("s04_ann_quantized"))
    info(f"recall@5: int8=$rQ%.3f")
    assert(rQ > 0.85, s"int8 quantized recall collapsed: $rQ")
  }
}
