package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{GraphGen, Iterate}

/** flink-gelly generator package analogs — deterministic distributed
  * edge-list synthesis; invariants per generator shape. */
class GraphGenSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def edges(df: DataFrame): Set[(Long, Long)] =
    df.as[(Long, Long)].collect().toSet
  private def outDegrees(df: DataFrame): Map[Long, Long] =
    df.groupBy("src").count().as[(Long, Long)].collect().toMap

  test("complete: n(n-1) ordered pairs, uniform degree") {
    val g = GraphGen.complete(spark, 5)
    assert(g.count() == 20)
    assert(outDegrees(g).values.toSet == Set(4L))
  }

  test("cycle and path: chain shapes, symmetric edges, one component") {
    val cyc = GraphGen.cycle(spark, 6)
    val ce = edges(cyc)
    assert(ce.size == 12 && ce.forall(e => ce(e.swap)))
    assert(outDegrees(cyc).values.toSet == Set(2L))
    val p = edges(GraphGen.path(spark, 5))
    assert(p.size == 8 && p((0L, 1L)) && p((4L, 3L)) && !p((0L, 4L)))
    val cc = Iterate.connectedComponents(GraphGen.cycle(spark, 6), "src", "dst")
    assert(cc.select("component").distinct().count() == 1)
  }

  test("star, singleton-edge, empty") {
    val st = edges(GraphGen.star(spark, 7))
    assert(st.size == 12 && st.forall(e => e._1 == 0L || e._2 == 0L))
    val se = edges(GraphGen.singletonEdge(spark, 4))
    assert(se.size == 8 && se((6L, 7L)) && se((7L, 6L)))
    assert(GraphGen.empty(spark).count() == 0)
    assert(GraphGen.vertices(spark, 9).count() == 9)
  }

  test("circulant and echo: modular offsets, symmetric when centered") {
    val ci = edges(GraphGen.circulant(spark, 5, Seq(1L, 4L)))
    assert(ci == edges(GraphGen.cycle(spark, 5)))
    // echo(7, 4): offsets 2..5, self-complementary mod 7 => symmetric
    val ec = edges(GraphGen.echo(spark, 7, 4))
    assert(ec.size == 28 && ec.forall(e => ec(e.swap)))
    assert(ec((0L, 2L)) && ec((0L, 5L)) && !ec((0L, 1L)))
  }

  test("grid: 2x3 chain edges + wrapped ring dimension") {
    val g = edges(GraphGen.grid(spark, Seq((2L, false), (3L, false))))
    // dim0 (stride 1): 1 edge per row x3 rows x2 dirs = 6;
    // dim1 (stride 2): 2 edges per column x2 columns x2 dirs = 8
    assert(g.size == 14, g.toString)
    assert(g((0L, 1L)) && g((0L, 2L)) && g((2L, 4L)) && !g((1L, 2L)))
    // wrap on a size-4 ring adds the closing pair per line
    val w = edges(GraphGen.grid(spark, Seq((4L, true))))
    assert(w.size == 8 && w((3L, 0L)) && w((0L, 3L)))
    assert(w == edges(GraphGen.cycle(spark, 4)))
  }

  test("hypercube: 2^d vertices of degree d, bipartite (zero triangles)") {
    val h = GraphGen.hypercube(spark, 3)
    val he = edges(h)
    assert(he.size == 24 && he.forall(e => he(e.swap)))
    assert(outDegrees(h).values.toSet == Set(3L))
    val tri = Iterate.triangleCounts(h, "src", "dst")
      .agg(sum("n_triangles")).head().getLong(0)
    assert(tri == 0L)
  }

  test("rmat: exact edge count, id range, determinism, hub skew") {
    val g1 = GraphGen.rmat(spark, scale = 6, edgeCount = 500)
    assert(g1.count() == 500)
    val ids = g1.select(explode(array(col("src"), col("dst"))).as("v"))
      .agg(min("v"), max("v")).head()
    assert(ids.getLong(0) >= 0L && ids.getLong(1) < 64L)
    // partition-independent determinism: same seed => identical multiset,
    // regardless of layout
    val e1 = g1.as[(Long, Long)].collect().sorted.toSeq
    val e2 = GraphGen.rmat(spark, 6, 500).repartition(7)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(e1 == e2)
    // a different seed changes the graph
    assert(e1 != GraphGen.rmat(spark, 6, 500, seed = 43L)
      .as[(Long, Long)].collect().sorted.toSeq)
    // power-law-ish skew: the max out-degree well above the mean
    val degs = outDegrees(g1).values
    assert(degs.max >= 2 * (500.0 / degs.size), s"max ${degs.max} of ${degs.size}")
  }
}
