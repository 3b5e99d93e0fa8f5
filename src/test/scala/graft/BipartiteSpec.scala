package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bipartite

/** flink-gelly bipartite projections — simple and full, both sides. */
class BipartiteSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  // tops 1..3, bottoms 10..11; 2 is the shared top, 10/11 the connectors
  private lazy val edges = Seq(
    (1L, 10L, "a"), (2L, 10L, "b"), (2L, 11L, "c"), (3L, 11L, "d")
  ).toDF("top", "bottom", "ev")

  test("simple top projection: one ordered pair per shared bottom vertex") {
    val out = Bipartite.projectionTopSimple(edges, "top", "bottom", "ev")
      .as[(Long, Long, String, String)].collect().toSet
    assert(out == Set(
      (1L, 2L, "a", "b"), (2L, 1L, "b", "a"),
      (2L, 3L, "c", "d"), (3L, 2L, "d", "c")), out.toString)
  }

  test("simple bottom projection: bottoms linked through their shared top") {
    val out = Bipartite.projectionBottomSimple(edges, "top", "bottom", "ev")
      .as[(Long, Long, String, String)].collect().toSet
    assert(out == Set((10L, 11L, "b", "c"), (11L, 10L, "c", "b")), out.toString)
  }

  test("full projections carry the connecting vertex and all four values") {
    val tv = Seq((1L, "T1"), (2L, "T2"), (3L, "T3")).toDF("id", "value")
    val bv = Seq((10L, "B10"), (11L, "B11")).toDF("id", "value")
    val top = Bipartite.projectionTopFull(edges, "top", "bottom", "ev", tv, bv)
      .as[(Long, Long, Long, String, String, String, String, String)]
      .collect().toSet
    assert(top == Set(
      (1L, 2L, 10L, "B10", "T1", "T2", "a", "b"),
      (2L, 1L, 10L, "B10", "T2", "T1", "b", "a"),
      (2L, 3L, 11L, "B11", "T2", "T3", "c", "d"),
      (3L, 2L, 11L, "B11", "T3", "T2", "d", "c")), top.toString)
    val bottom = Bipartite.projectionBottomFull(edges, "top", "bottom", "ev", tv, bv)
      .as[(Long, Long, Long, String, String, String, String, String)]
      .collect().toSet
    assert(bottom == Set(
      (10L, 11L, 2L, "T2", "B10", "B11", "b", "c"),
      (11L, 10L, 2L, "T2", "B11", "B10", "c", "b")), bottom.toString)
  }

  test("maxDegree cap drops a hot connector BEFORE the self-join: bounded " +
       "output, non-hub pairs untouched, default behavior unchanged") {
    // one hot bottom vertex (99) connected to every top 1..50 — its
    // uncapped contribution is 50·49 ordered pairs
    val hub = (1L to 50L).map(t => (t, 99L, "h")).toDF("top", "bottom", "ev")
    val skewed = edges.union(hub)
    val uncapped = Bipartite.projectionTopSimple(skewed, "top", "bottom", "ev")
    assert(uncapped.count() == 4L + 50L * 49L)
    // cap at 10: the hub is dropped entirely, the base edges all survive
    val capped = Bipartite.projectionTopSimple(skewed, "top", "bottom", "ev",
      maxDegree = 10L)
    val out = capped.as[(Long, Long, String, String)].collect().toSet
    assert(out == Set(
      (1L, 2L, "a", "b"), (2L, 1L, "b", "a"),
      (2L, 3L, "c", "d"), (3L, 2L, "d", "c")), out.toString)
    // full projection honors the cap the same way
    val tv = (1L to 50L).map(i => (i, s"T$i")).toDF("id", "value")
    val bv = Seq((10L, "B10"), (11L, "B11"), (99L, "HUB")).toDF("id", "value")
    assert(Bipartite.projectionTopFull(skewed, "top", "bottom", "ev", tv, bv,
      maxDegree = 10L).count() == 4L)
    // a cap ABOVE every degree is a no-op (same rows as uncapped)
    assert(Bipartite.projectionTopSimple(skewed, "top", "bottom", "ev",
      maxDegree = 1000L).count() == uncapped.count())
  }

  test("a duplicate connector yields one projected edge PER connecting vertex") {
    val multi = edges.union(Seq((1L, 11L, "e")).toDS()
      .toDF("top", "bottom", "ev"))
    val out = Bipartite.projectionTopSimple(multi, "top", "bottom", "ev")
      .filter("src = 1 AND dst = 2").count()
    // 1 and 2 now share BOTH bottoms 10 and 11 -> two (1, 2) edges
    assert(out == 2L)
  }
}
