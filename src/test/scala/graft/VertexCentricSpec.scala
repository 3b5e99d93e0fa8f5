package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Iterate

/** The generic vertex-centric (Pregel) combinator: custom algorithms
  * written as message/merge/update expressions must reproduce the
  * dedicated library operators exactly, the superstep index must reach
  * the expressions, and reserved column names are named errors. */
class VertexCentricSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def randomWeightedDigraph(seed: Int, n: Int, p: Double) = {
    val rnd = new scala.util.Random(seed)
    (for {
      a <- 0 until n; b <- 0 until n
      if a != b && rnd.nextDouble() < p
    } yield (a.toLong, b.toLong, 1.0 + (b % 8) * 0.125)).toDF("src", "dst", "w")
  }

  test("SSSP written against vertexCentric == the dedicated sssp operator") {
    for (seed <- Seq(3, 11, 29)) {
      val edges = randomWeightedDigraph(seed, 20, 0.12)
      val iters = 8
      val dedicated = Iterate.sssp(edges, "src", "dst", "w", sourceId = 0L, iters)
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
      val verts = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct()
        .select(col("id"), when(col("id") === 0L, lit(0.0))
          .otherwise(lit(null).cast("double")).as("dist"))
      val generic = Iterate.vertexCentric(edges, "src", "dst", verts, "id", "dist",
          message = _ => col("state") + col("w"),
          merge = min(col("msg")),
          update = _ => least(col("state"), col("msg")),
          maxSupersteps = iters)
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
      assert(generic === dedicated, s"seed=$seed")
    }
  }

  test("min-label propagation against vertexCentric == connectedComponents") {
    val rnd = new scala.util.Random(17)
    val raw = (for {
      a <- 0 until 24; b <- 0 until 24
      if a < b && rnd.nextDouble() < 0.08
    } yield (a.toLong, b.toLong)).toDF("src", "dst")
    val dedicated = Iterate.connectedComponents(raw, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // both directions: the combinator is directed, CC needs symmetric flow
    val sym = raw.union(raw.select(col("dst"), col("src"))).distinct()
    val verts = sym.select(col("src").as("id")).union(sym.select(col("dst").as("id")))
      .distinct().select(col("id"), col("id").as("label"))
    val generic = Iterate.vertexCentric(sym, "src", "dst", verts, "id", "label",
        message = _ => col("state"),
        merge = min(col("msg")),
        update = _ => least(col("state"), col("msg")),
        maxSupersteps = 50) // fixpoint halts long before 50
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(generic === dedicated)
  }

  test("PageRank via updateAlways == the dedicated pageRank operator") {
    // updateAlways: damping applies to EVERY vertex each superstep, inbox
    // or not — the mode PageRank-class algorithms need. Out-degree rides
    // the edge frame as a column; arithmetic is pageRank's exactly
    // (9-dp inter-round rounds), so results must be bit-identical.
    for (seed <- Seq(5, 23)) {
      val edges0 = randomWeightedDigraph(seed, 18, 0.15).select("src", "dst")
      val iters = 4
      val dedicated = Iterate.pageRank(edges0, "src", "dst", iters)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      val dedup = edges0.distinct()
      val outd = dedup.groupBy("src").agg(count(lit(1)).as("odeg"))
      val edges = dedup.join(outd, "src")
      val verts = dedup.select(col("src").as("id"))
        .union(dedup.select(col("dst").as("id"))).distinct()
      val n = verts.count()
      val init = verts.select(col("id"), round(lit(1.0) / lit(n), 9).as("rank"))
      val generic = Iterate.vertexCentric(edges, "src", "dst", init, "id", "rank",
          message = _ => col("state") / col("odeg"),
          merge = sum(col("msg")),
          update = _ => round(lit(0.15) / lit(n) +
            lit(0.85) * coalesce(col("msg"), lit(0.0)), 9),
          maxSupersteps = iters, haltOnFixpoint = false, updateAlways = true)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(generic === dedicated, s"seed=$seed")
    }
  }

  test("updateAlways runs update on no-inbox vertices with a null msg") {
    // c has no inbox: default mode keeps state, updateAlways evaluates
    // update with msg null (here: coalesce resets it to 0 then adds 1)
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val verts = Seq((0L, 5L), (1L, 10L), (2L, 20L)).toDF("id", "s")
    val out = Iterate.vertexCentric(edges, "src", "dst", verts, "id", "s",
        message = _ => col("state"),
        merge = max(col("msg")),
        update = _ => coalesce(col("msg"), lit(0L)) + lit(1L),
        maxSupersteps = 1, haltOnFixpoint = false, updateAlways = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // b received a=5 -> 6; a and c had no inbox -> coalesce(null,0)+1 = 1
    assert(out === Map(0L -> 1L, 1L -> 6L, 2L -> 1L))
  }

  test("the superstep index reaches message and update expressions") {
    // one edge a->b, message(k) = state(a) + k, update replaces: after two
    // rounds b = 7 + 1 (round indices 0 then 1; the last write wins)
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val verts = Seq((0L, 7L), (1L, 0L)).toDF("id", "s")
    val out = Iterate.vertexCentric(edges, "src", "dst", verts, "id", "s",
        message = k => col("state") + lit(k.toLong),
        merge = max(col("msg")),
        update = _ => col("msg"),
        maxSupersteps = 2, haltOnFixpoint = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(0L -> 7L, 1L -> 8L))
  }

  test("no-inbox vertices keep their state; null messages are not sent") {
    // b starts null and has no incoming non-null message source beyond a;
    // c is isolated-by-direction (only outgoing) and must keep its state
    val edges = Seq((0L, 1L), (2L, 0L)).toDF("src", "dst")
    val verts = Seq((0L, Some(1.0)), (1L, None), (2L, None))
      .toDF("id", "x")
    val out = Iterate.vertexCentric(edges, "src", "dst", verts, "id", "x",
        message = _ => col("state") + lit(1.0),
        merge = min(col("msg")),
        update = _ => least(col("state"), col("msg")),
        maxSupersteps = 3)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    // a=1.0 (c's null state sends nothing), b = 2.0 via a, c stays null
    assert(out === Map(0L -> Some(1.0), 1L -> Some(2.0), 2L -> None))
  }

  test("reserved edge column names are a named error, case-insensitively") {
    val edges = Seq((0L, 1L, 9L)).toDF("src", "dst", "msg")
    val verts = Seq((0L, 0L)).toDF("id", "s")
    val e = intercept[RuntimeException](
      Iterate.vertexCentric(edges, "src", "dst", verts, "id", "s",
        message = _ => col("state"), merge = min(col("msg")),
        update = _ => col("msg"), maxSupersteps = 1))
    assert(e.getMessage.contains("reserved"), e.getMessage)
    // Spark resolves columns case-insensitively — so must the guard
    val e2 = intercept[RuntimeException](
      Iterate.vertexCentric(Seq((0L, 1L, 9L)).toDF("src", "dst", "MSG"),
        "src", "dst", verts, "id", "s",
        message = _ => col("state"), merge = min(col("msg")),
        update = _ => col("msg"), maxSupersteps = 1))
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
  }

  test("a merge that evaluates to null over a NON-empty inbox still triggers update") {
    // receipt is the contract, not merged-to-non-null: the filtered min is
    // null but b received a message, so update must run (here: reset to -1)
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val verts = Seq((0L, 5L), (1L, 10L), (2L, 20L)).toDF("id", "s")
    val out = Iterate.vertexCentric(edges, "src", "dst", verts, "id", "s",
        message = _ => col("state"),
        merge = min(when(col("msg") > lit(100L), col("msg"))), // always null here
        update = _ => lit(-1L),
        maxSupersteps = 1, haltOnFixpoint = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // b received (and reset); a and c had no inbox and keep state
    assert(out === Map(0L -> 5L, 1L -> -1L, 2L -> 20L))
  }
}
