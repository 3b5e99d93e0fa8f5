package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Iterate, Skew}
import graft.sources.Tables

/** Iterations (DataSet bulk-iteration analog) + skew-salted join. */
class ScaleOpsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("kmeans converges deterministically on embeddings") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val a1 = Iterate.kmeans(emb, "vec_id", "embedding", k = 4, iters = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    val a2 = Iterate.kmeans(emb, "vec_id", "embedding", k = 4, iters = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a1.sameElements(a2), "same input + params must give same clustering")
    assert(a1.length == emb.count())
    assert(a1.map(_._2).distinct.length > 1, "should use more than one cluster")
  }

  test("globalNtile == the native NTILE window, without the global sort") {
    import graft.operators.Relational.globalNtile
    val rnd = new scala.util.Random(42)
    // duplicates + a skewed hot value exercise equal-value bucket sharing
    val df = (1 to 997).map(i =>
      (i.toLong, if (i % 7 == 0) 5.0 else rnd.nextInt(40) / 2.0))
      .toDF("id", "v")
    for (n <- Seq(3, 5, 10); desc <- Seq(false, true)) {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(if (desc) $"v".desc else $"v".asc, $"id")
      val expected = df.select($"id", ntile(n).over(w).as("s"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      // small bucket count so buckets hold many rows AND some are empty
      val got = globalNtile(df, n, $"v", desc, $"id", "s", buckets = 8)
        .select("id", "s").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected, s"n=$n desc=$desc")
    }
    // fewer rows than buckets: ntile degenerates to the row number
    val tiny = Seq((1L, 9.0), (2L, 3.0), (3L, 7.0)).toDF("id", "v")
    val g = globalNtile(tiny, 5, $"v", valueDesc = false, $"id", "s")
      .select("id", "s").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(g == Map(2L -> 1, 3L -> 2, 1L -> 3))
    // a04 (bucketed path) must agree with a03 (native windows) row-for-row
    val a03 = graft.SparkEntry.queries("a03_rfm_ntile")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val a04 = graft.SparkEntry.queries("a04_rfm_scalable")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(a04 == a03 && a03.nonEmpty)
  }

  test("connectedComponents reaches the fixpoint labeling") {
    // two components: {1,2,3,4} chained, {10,11}; isolated edges included
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val comps = Iterate.connectedComponents(edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents on the minhash similarity graph groups dup candidates") {
    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = graft.operators.TextDedup.minhashCandidates(docs, "doc_id", "text")
    val comps = Iterate.connectedComponents(pairs, "doc_a", "doc_b")
    // every component label must be a member of the component (min id)
    val bad = comps.filter($"component" > $"id").count()
    assert(bad == 0)
    assert(comps.count() > 0)
  }

  test("distributed CC loop and local union-find fast path agree") {
    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = graft.operators.TextDedup.minhashCandidates(docs, "doc_id", "text")
      .localCheckpoint(true)
    val local = Iterate.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val dist = Iterate.connectedComponents(pairs, "doc_a", "doc_b",
        localThreshold = 0L) // force the distributed fixpoint
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(local == dist && local.nonEmpty)
  }

  test("coGroup sees both full groups per key (DataSet coGroup analog)") {
    val l = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDS()
    val r = Seq((1L, 10), (3L, 30)).toDS()
    val out = graft.operators.Relational.coGroup(l, r)(_._1, _._1) { (k, ls, rs) =>
      Iterator.single((k, ls.size, rs.size))
    }.collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2, 1), (2L, 1, 0), (3L, 0, 1)))
  }

  test("saltedEquiJoin returns exactly the plain equi-join result") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_orderpriority")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority").count()
    val salted = Skew.saltedEquiJoin(li, o, "l_orderkey", "o_orderkey",
        factor = 8, saltSource = col("l_linenumber"))
      .groupBy("o_orderpriority").count()
    val p = plain.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val s = salted.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(p.sameElements(s))
  }

  test("triangleCounts: one triangle + a tail, duplicates/reverses tolerated") {
    import spark.implicits._
    // triangle 1-2-3, path 3-4-5; a duplicate and a reversed edge and a
    // self-loop must not change anything
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (2L, 1L), (1L, 2L), (4L, 4L)).toDF("src", "dst")
    val out = Iterate.triangleCounts(edges, "src", "dst")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 0.333333),
      (4L, 2L, 0L, 0.0), (5L, 1L, 0L, 0.0)), out.toString)
  }

  test("guarded broadcasts in jaccard/adamicAdar/summarization: above the " +
       "threshold no hard hint is planned and results are identical") {
    import spark.implicits._
    val inc = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 11L))
      .toDF("id", "nb")
    def noHint(df: org.apache.spark.sql.DataFrame) =
      !df.queryExecution.analyzed.toString.contains("ResolvedHint")
    val jHint = Iterate.jaccardIndex(inc, "id", "nb")
    val jPlain = Iterate.jaccardIndex(inc, "id", "nb", broadcastDegThreshold = 0L)
    assert(!noHint(jHint) && noHint(jPlain))
    assert(jHint.collect().toSet == jPlain.collect().toSet)
    val aHint = Iterate.adamicAdar(inc, "id", "nb")
    val aPlain = Iterate.adamicAdar(inc, "id", "nb", broadcastDegThreshold = 0L)
    assert(!noHint(aHint) && noHint(aPlain))
    assert(aHint.collect().toSet == aPlain.collect().toSet)
    val verts = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "v")
    val edges = Seq((1L, 2L, "e"), (2L, 3L, "f")).toDF("s", "d", "ev")
    val sHint = Iterate.summarization(verts, "id", "v", edges, "s", "d", "ev")
    val sPlain = Iterate.summarization(verts, "id", "v", edges, "s", "d", "ev",
      broadcastGroupBytesThreshold = 0L)
    assert(!noHint(sHint) && noHint(sPlain))
    assert(sHint.collect().toSet == sPlain.collect().toSet)
  }

  test("clusteringBundle: counts + stats (+ directed census) agree with the " +
       "standalone analytics, off one persisted wedge pass") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val bundle = Iterate.clusteringBundle(edges, "src", "dst")
    // the shared triangle table IS persisted (that is the whole point)
    assert(bundle.triangles.storageLevel.useMemory)
    assert(bundle.triangles.as[(Long, Long, Long, Double)].collect().toSet ==
      Iterate.triangleCounts(edges, "src", "dst")
        .as[(Long, Long, Long, Double)].collect().toSet)
    assert(bundle.stats.collect().toSeq ==
      Iterate.clusteringStats(edges, "src", "dst").collect().toSeq)
    assert(bundle.census.isEmpty)
    bundle.unpersist()
    // DIRECTED bundle: census row == directedClusteringStats, and the
    // undirected-projection triangle table == triangleCounts on it
    val dedges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val db = Iterate.directedClusteringBundle(dedges, "src", "dst")
    assert(db.census.get.collect().toSeq ==
      Iterate.directedClusteringStats(dedges, "src", "dst").collect().toSeq)
    assert(db.triangles.as[(Long, Long, Long, Double)].collect().toSet ==
      Iterate.triangleCounts(dedges, "src", "dst")
        .as[(Long, Long, Long, Double)].collect().toSet)
    assert(db.stats.collect().toSeq ==
      Iterate.clusteringStats(dedges, "src", "dst").collect().toSeq)
    db.unpersist()
  }

  test("triangleCounts above the broadcast threshold: shuffle-join fallback, " +
       "identical results, no broadcast in the plan") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    // threshold 0 forces the big-graph path: no HARD broadcast hint in the
    // logical plan (a hard hint would throw past maxBroadcastTableBytes at
    // real scale — AQE remains free to pick broadcast at runtime when the
    // side actually fits, which is exactly the scale-safe behavior)
    val big = Iterate.triangleCounts(edges, "src", "dst",
      broadcastClosureThreshold = 0L)
    assert(!big.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(!big.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"))
    val out = big.as[(Long, Long, Long, Double)].collect().toSet
    // …and the guarded hint IS applied below the threshold (the fast path).
    // The r14 triangle core puts the guarded hints BELOW the persisted
    // orientation, so the optimized plan shows an InMemoryRelation where
    // the hint lives — assert on the ANALYZED plan, which is taken before
    // cache substitution and shows the raw hinted subtree
    val hinted = Iterate.triangleCounts(edges, "src", "dst")
    assert(hinted.queryExecution.analyzed.toString.contains("ResolvedHint"))
    assert(out == Set(
      (1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0), (3L, 3L, 1L, 0.333333),
      (4L, 2L, 0L, 0.0), (5L, 1L, 0L, 0.0)), out.toString)
  }

  test("directedClusteringStats: full 16-type triadic census matches a " +
       "bitmask brute force on a crafted digraph") {
    import spark.implicits._
    // a digraph exercising every triangle class: 120u {1,2,3}, 120c
    // {3,4,5}, 030c {5,6,7}, 030t {1,3,5}, 300 {2,7,8}, 210 {4,6,8}
    val edgeSet = Set(
      (1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 3L), (3L, 5L), (5L, 4L),
      (5L, 6L), (6L, 7L), (7L, 5L), (1L, 5L),
      (2L, 7L), (7L, 2L), (2L, 8L), (8L, 2L), (7L, 8L), (8L, 7L),
      (4L, 6L), (6L, 4L), (4L, 8L), (8L, 4L), (6L, 8L))
    val verts = edgeSet.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    // independent reference: Batagelj–Mrvar 64-entry bitmask→triad-type
    // table (the same constants the reference's TriangleListingHelper
    // cites), applied to EVERY vertex triple — no shared code with the
    // operator's wedge-join + subtraction-chain path
    val typeTable = Array(
      1, 2, 2, 3, 2, 4, 6, 8, 2, 6, 5, 7, 3, 8, 7, 11,
      2, 6, 4, 8, 5, 9, 9, 13, 6, 10, 9, 14, 7, 14, 12, 15,
      2, 5, 6, 7, 6, 9, 10, 14, 4, 9, 9, 12, 8, 13, 14, 15,
      3, 7, 8, 11, 7, 12, 14, 15, 8, 14, 13, 15, 11, 15, 15, 16)
    val brute = new Array[Long](17)
    for {
      i <- verts.indices; j <- (i + 1) until verts.length
      k <- (j + 1) until verts.length
    } {
      val (a, b, c) = (verts(i), verts(j), verts(k))
      var m = 0
      if (edgeSet((a, b))) m |= 1
      if (edgeSet((b, a))) m |= 2
      if (edgeSet((a, c))) m |= 4
      if (edgeSet((c, a))) m |= 8
      if (edgeSet((b, c))) m |= 16
      if (edgeSet((c, b))) m |= 32
      brute(typeTable(m)) += 1
    }
    val row = Iterate.directedClusteringStats(
      edgeSet.toSeq.toDF("src", "dst"), "src", "dst").head()
    val got = Seq("t003", "t012", "t102", "t021d", "t021u", "t021c",
      "t111d", "t111u", "t030t", "t030c", "t201", "t120d", "t120u",
      "t120c", "t210", "t300").map(c => row.getAs[Long](c))
    assert(got == brute.drop(1).toSeq, s"got $got expected ${brute.drop(1).toSeq}")
    // census invariant: the 16 counts partition all C(V,3) triples
    val n = verts.length.toLong
    assert(got.sum == n * (n - 1) * (n - 2) / 6)
    // edge counts: uni/bi from the crafted set
    val bi = edgeSet.count(e => edgeSet((e._2, e._1))) / 2
    assert(row.getAs[Long]("n_bi_edges") == bi)
    assert(row.getAs[Long]("n_uni_edges") == edgeSet.size - 2 * bi)
    // directed LCC, brute-forced: per vertex, directed edges between
    // neighbors over d(d-1)
    val nbrs = verts.map(v => v -> edgeSet.collect {
      case (a, b) if a == v => b; case (a, b) if b == v => a }.toSet).toMap
    val lccs = verts.map { v =>
      val nb = nbrs(v).toSeq
      val d = nb.size
      if (d < 2) 0.0
      else {
        val e = (for { x <- nb; y <- nb if x != y } yield edgeSet((x, y))).count(identity)
        math.rint(e.toDouble / (d.toDouble * (d - 1)) * 1e6) / 1e6
      }
    }
    assert(math.abs(row.getAs[Double]("avg_cc") - lccs.sum / verts.length) < 1e-9)
  }

  test("summarizationVertices emits isolated groups the edge relation drops") {
    import spark.implicits._
    // group "C" (vertices 4, 5) has no incident edges: absent from the
    // edge relation (documented), present in the vertex table
    val verts = Seq((0L, "A"), (1L, "A"), (2L, "B"), (4L, "C"), (5L, "C"))
      .toDF("id", "vv")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst").withColumn("ev", lit("x"))
    val rel = Iterate.summarization(verts, "id", "vv", edges, "src", "dst", "ev")
    val endpointGroups = rel.select($"src_value").union(rel.select($"dst_value"))
      .distinct().as[String].collect().toSet
    assert(endpointGroups == Set("A", "B"))
    val vout = Iterate.summarizationVertices(verts, "id", "vv")
      .as[(Long, String, Long)].collect().toSet
    assert(vout == Set((0L, "A", 2L), (2L, "B", 1L), (4L, "C", 2L)), vout.toString)
  }

  test("summarization reproduces the Gelly javadoc example (min-id reps)") {
    import spark.implicits._
    // Summarization.java's own example: vertices 0,1 = "A", 2,3 = "B";
    // edges (0,1),(1,0),(1,2),(2,1),(2,3),(3,2), all with one value
    val verts = Seq((0L, "A"), (1L, "A"), (2L, "B"), (3L, "B")).toDF("id", "vv")
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst").withColumn("ev", lit("x"))
    val out = Iterate.summarization(verts, "id", "vv", edges, "src", "dst", "ev")
      .as[(Long, String, Long, Long, String, Long, String, Long)].collect().toSet
    assert(out == Set(
      (0L, "A", 2L, 0L, "A", 2L, "x", 2L), // (0,1) and (1,0)
      (2L, "B", 2L, 2L, "B", 2L, "x", 2L), // (2,3) and (3,2)
      (0L, "A", 2L, 2L, "B", 2L, "x", 1L), // (1,2)
      (2L, "B", 2L, 0L, "A", 2L, "x", 1L)  // (2,1)
    ), out.toString)
  }

  test("communityDetection: score sums, lowest-label ties, hop attenuation") {
    import spark.implicits._
    // complete triangle, undirected (both directions supplied)
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    // superstep 1: every vertex adopts its lowest neighbor label, score
    // 1.0 − 0.5/1 = 0.5 → labels (1→2, 2→1, 3→1)
    val s1 = Iterate.communityDetection(edges, "src", "dst", iters = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(s1 == Set((1L, 2L, 0.5), (2L, 1L, 0.5), (3L, 1L, 0.5)), s1.toString)
    // superstep 2 (attenuation 0.5/2): vertex 1 switches to label 1
    // (0.5 − 0.25); vertices 2 and 3 see a SUM TIE between labels 1 and 2
    // → lowest label 1 = own label → re-score to its best message WITHOUT
    // decay (the reference's changed-label-only attenuation)
    val s2 = Iterate.communityDetection(edges, "src", "dst", iters = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(s2 == Set((1L, 1L, 0.25), (2L, 1L, 0.5), (3L, 1L, 0.5)), s2.toString)
  }

  test("vertexMetrics matches hand-computed V/E/degree/triplet stats") {
    import spark.implicits._
    // triangle 1-2-3 + path 3-4-5, plus a duplicate / reverse / self-loop
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (2L, 1L), (1L, 2L), (4L, 4L)).toDF("src", "dst")
    val r = Iterate.vertexMetrics(edges, "src", "dst")
      .as[(Long, Long, Double, Double, Long, Long, Long)].collect()
    // degrees 2,2,3,2,1 → triplets 1+1+3+1+0 = 6; density 5/C(5,2) = 0.5
    assert(r.toSeq == Seq((5L, 5L, 2.0, 0.5, 6L, 3L, 3L)), r.mkString(","))
  }

  test("edgeMetrics matches hand-computed triangle/rectangle triplets") {
    import spark.implicits._
    // same graph: low-order degrees per vertex are 2,1,0,1,1 →
    // triangle triplets (1,0,0,0,0) Σ=1 max=1,
    // rectangle triplets (1,1,0,1,0) Σ=3 max=1
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (2L, 1L), (1L, 2L), (4L, 4L)).toDF("src", "dst")
    val r = Iterate.edgeMetrics(edges, "src", "dst")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 3L, 1L, 1L)), r.mkString(","))
  }

  test("clusteringStats: avg/global CC and triadic census closed forms") {
    import spark.implicits._
    // triangle 1-2-3 + path 3-4-5: V=5, E=5, triplets=6, T=1;
    // lcc = (1, 1, 1/3, 0, 0) → avg = 2333333/5e6; census: 30=1,
    // 21=6−3=3, 12=5·3−2·3−3·1=6, 03=C(5,3)−6−3−1=0
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (2L, 1L), (1L, 2L), (4L, 4L)).toDF("src", "dst")
    val r = Iterate.clusteringStats(edges, "src", "dst")
      .as[(Long, Long, Long, Long, Double, Double, Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((5L, 5L, 6L, 1L, 0.5, 0.4666666, 0L, 6L, 3L, 1L)),
      r.mkString(","))
  }

  test("checksum is order-independent and matches the pinned Knuth mix") {
    import spark.implicits._
    val e1 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val e2 = Seq((2L, 3L), (1L, 2L), (1L, 2L)).toDF("src", "dst") // reordered + dup
    val r1 = Iterate.checksum(e1, "src", "dst")
      .as[(Long, Long, Long, Long, Long)].collect()
    val r2 = Iterate.checksum(e2, "src", "dst")
      .as[(Long, Long, Long, Long, Long)].collect()
    // independently computed: h(x) = x·2654435761 mod 2³²
    assert(r1.toSeq == Seq((3L, 2L, 3041712678L, 2789022526L, 5830735204L)),
      r1.mkString(","))
    assert(r1.toSeq == r2.toSeq, "checksum must be order/duplicate invariant")
  }

  test("iteration lineage cuts switch to RELIABLE checkpoints on opt-in " +
       "(checkpoint dir + flag) with identical results") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (4L, 1L))
      .toDF("src", "dst").withColumn("w", lit(1.0))
    def ssspMap() = Iterate.sssp(edges, "src", "dst", "w", 1L, 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    def vcMap() = Iterate.vertexCentric(edges, "src", "dst",
        edges.select(explode(array($"src", $"dst")).as("id")).distinct()
          .select($"id", when($"id" === 1L, 0.0).otherwise(lit(null)
            .cast("double")).as("d")),
        "id", "d",
        message = _ => col("state") + col("w"), merge = min(col("msg")),
        update = _ => least(col("state"), col("msg")), maxSupersteps = 3)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    def ccMap() = Iterate.connectedComponents(edges, "src", "dst",
        localThreshold = 0L) // force the distributed fixpoint loop
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val (s0, v0, c0) = (ssspMap(), vcMap(), ccMap())
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("graft.iterate.reliableCheckpoint", "true")
    try {
      assert(ssspMap() == s0, "reliable-checkpoint sssp must match")
      assert(vcMap() == v0, "reliable-checkpoint vertexCentric must match")
      assert(ccMap() == c0, "reliable-checkpoint connectedComponents must match")
      // prove the reliable path actually engaged: checkpoint files exist
      assert(new java.io.File(dir).listFiles != null &&
        new java.io.File(dir).listFiles.nonEmpty,
        "no checkpoint files written — reliable path did not engage")
    } finally spark.conf.set("graft.iterate.reliableCheckpoint", "false")
  }
}
