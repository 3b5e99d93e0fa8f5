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

  test("s05 k-NN graph recall@3 against the exact graph") {
    // exact top-3 neighbors per node, computed in-JVM (the corpus at this
    // SF is small enough for the N^2 reference)
    val vecs = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val exact = vecs.map { case (q, v) =>
      q -> vecs.filter(_._1 != q).toSeq
        .map { case (n, w) => (n, cos(v, w)) }
        .sortBy { case (n, c) => (-c, n) }.take(3).map(_._1).toSet
    }
    val approx = SparkEntry.queries("s05_knn_graph")(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val hits = exact.map { case (q, e) =>
      approx.get(q).map(a => (a intersect e).size.toDouble / e.size).getOrElse(0.0)
    }
    val recall3 = hits.sum / exact.size
    info(f"knn-graph recall@3 = $recall3%.3f")
    // probe depth 3 of 8 cells measures ~0.63 on this corpus — the
    // synthetic embeddings are near-uniform (no cluster structure), which
    // is IVF's worst case: cell membership carries little neighbor signal,
    // so recall ≈ probed-mass fraction. The floor documents that trade;
    // probes=8 is exhaustive (recall 1.0) at 8/3× the candidate cost, and
    // real embedding corpora (which cluster) sit far above this bound
    // (demonstrated by the mixture-of-Gaussians test below).
    assert(recall3 > 0.55, s"k-NN graph recall collapsed: $recall3")
  }

  test("s05 k-NN graph recall@3 on a CLUSTERED corpus (mixture of Gaussians)") {
    // real embedding corpora cluster; IVF cells then align with the true
    // clusters and the same k/probes that measure ~0.63 on the uniform
    // worst case recover near-exact neighbors. 8 Gaussians × 40 points,
    // ids interleaved so the k-means seed (8 lowest vec_ids) starts one
    // centroid per true cluster — deterministic in the fixed RNG seed.
    val rnd = new scala.util.Random(42)
    val nClusters = 8; val perCluster = 40; val dim = 16
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until nClusters * perCluster).map { id =>
      val c = centers(id % nClusters)
      (id.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
    import spark.implicits._
    val embDf = rows.toDF("vec_id", "embedding")
    val vecs = rows.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val exact = vecs.map { case (q, v) =>
      q -> vecs.filter(_._1 != q).toSeq
        .map { case (n, w) => (n, cos(v, w)) }
        .sortBy { case (n, c) => (-c, n) }.take(3).map(_._1).toSet
    }
    val approx = graft.queries.LlmQueries
      .knnGraphOf(embDf, k = 8, nProbes = 3, topK = 3)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val hits = exact.map { case (q, e) =>
      approx.get(q).map(a => (a intersect e).size.toDouble / e.size).getOrElse(0.0)
    }
    val recall3 = hits.sum / exact.size
    info(f"clustered knn-graph recall@3 = $recall3%.3f")
    assert(recall3 >= 0.9, s"clustered-corpus recall should be near-exact: $recall3")
  }
}
