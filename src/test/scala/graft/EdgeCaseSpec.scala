package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Iterate, TextDedup}
import graft.plans.{GraftExtensions, TopNPerKey}

/** Degenerate inputs the operators must survive. */
class EdgeCaseSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("clusteringBundle on an empty / triangle-free graph: zero rows and " +
       "zero counts, no crashes") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val b = Iterate.clusteringBundle(empty, "src", "dst")
    assert(b.triangles.count() == 0)
    val stats = b.stats.collect()
    assert(stats.length == 1 && stats.head.getLong(0) == 0L) // n_vertices = 0
    b.unpersist()
    // a path graph: vertices and triplets but NO triangles
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val b2 = Iterate.directedClusteringBundle(path, "src", "dst")
    assert(b2.triangles.filter(col("n_triangles") > 0).count() == 0)
    assert(b2.census.get.head().getAs[Long]("t030t") == 0L)
    b2.unpersist()
  }

  test("KMeansModel with k = 1 assigns everything to cluster 0; " +
       "single-stage PipelineModel JSON survives empty stage params") {
    val df = Seq((1L, Seq(0.0, 1.0)), (2L, Seq(5.0, 5.0))).toDF("id", "v")
    val m = new graft.ml.KMeansModel("v", "c", Array(Array(1.0, 1.0)))
    assert(m.transform(df).select("c").as[Int].collect().toSeq == Seq(0, 0))
    val pm = new graft.ml.PipelineModel(Vector(m))
    val back = graft.ml.PipelineModel.loadJson(pm.toJson)
    assert(back.transform(df).select("c").as[Int].collect().toSeq == Seq(0, 0))
  }

  test("bipartite maxDegree cap of 1 keeps only degree-1 connectors") {
    val e = Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 11L, "c"))
      .toDF("top", "bottom", "ev")
    // bottom 10 has degree 2 -> dropped at cap 1; bottom 11 degree 1 but
    // connects only one top -> no pairs at all
    assert(graft.operators.Bipartite
      .projectionTopSimple(e, "top", "bottom", "ev", maxDegree = 1L).count() == 0)
  }

  test("minhashCandidates on an empty corpus returns no pairs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextDedup.minhashCandidates(empty, "doc_id", "text").count() == 0)
  }

  test("shingles of strings shorter than k still produce one shingle") {
    val r = Seq((1L, "ab")).toDF("doc_id", "text")
      .select(TextDedup.shingles(col("text"), 5).as("s")).as[Seq[String]].head()
    assert(r == Seq("ab"))
  }

  test("TopNPerKey with n larger than any group returns everything") {
    GraftExtensions.installInto(spark)
    val df = Seq((1L, 10), (1L, 20), (2L, 30)).toDF("k", "v")
    val out = TopNPerKey(df, 100, Seq(col("k")), Seq(col("v").desc))
    assert(out.count() == 3)
  }

  test("kmeans with k >= number of points still assigns every point") {
    val pts = Seq((0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 1.0f))).toDF("id", "v")
    val out = Iterate.kmeans(pts, "id", "v", k = 5, iters = 2)
    assert(out.count() == 2)
  }

  test("connectedComponents on an empty edge list is empty") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Iterate.connectedComponents(empty, "src", "dst").count() == 0)
  }

  test("simhash of empty-ish text is deterministic and in range") {
    val r = Seq((1L, ""), (2L, "x")).toDF("doc_id", "text")
      .select(TextDedup.simhash16(col("text")).as("h")).as[Int].collect()
    assert(r.forall(v => v >= 0 && v <= 0xffff))
  }

  test("histogramRank: single-row partitions get percent_rank 0, cume_dist 1") {
    val df = Seq(("a", 10), ("b", 5), ("b", 7)).toDF("p", "v")
    val r = graft.operators.Relational.histogramRank(df, col("p"), col("v"))
      .select("p", "v", "drk", "prk", "cd")
      .collect().map(x => (x.getString(0), x.getInt(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4))).toSet
    assert(r == Set(("a", 10, 1L, 0.0, 1.0),
      ("b", 5, 1L, 0.0, 0.5), ("b", 7, 2L, 1.0, 1.0)))
  }

  test("pageRank on a 2-cycle holds the uniform fixpoint") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Iterate.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    assert(r == Map(1L -> 0.5, 2L -> 0.5), s"symmetric 2-cycle must stay uniform: $r")
  }

  test("ssspWorkset == sssp round-for-round, with early exit on an empty frontier") {
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 0.5), (3L, 2L, 0.25), (4L, 5L, 2.0))
      .toDF("src", "dst", "w")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0), Option(x.get(1)))).toMap
    for (iters <- 1 to 4)
      assert(asMap(Iterate.ssspWorkset(edges, "src", "dst", "w", 1L, iters)) ==
        asMap(Iterate.sssp(edges, "src", "dst", "w", 1L, iters)),
        s"divergence at $iters rounds")
    // iters far beyond convergence: frontier empties, result is the fixpoint
    assert(asMap(Iterate.ssspWorkset(edges, "src", "dst", "w", 1L, 50)) ==
      asMap(Iterate.sssp(edges, "src", "dst", "w", 1L, 4)))
  }

  test("sssp: unreachable vertices stay NULL, reachable get min-plus distances") {
    // 1 -> 2 (w 1.0) -> 3 (w 0.5); 4 -> 5 disconnected from the source
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 0.5), (4L, 5L, 2.0)).toDF("src", "dst", "w")
    val r = Iterate.sssp(edges, "src", "dst", "w", sourceId = 1L, iters = 3)
      .collect().map(x => (x.getLong(0), Option(x.get(1)).map(_.asInstanceOf[Double]))).toMap
    assert(r == Map(1L -> Some(0.0), 2L -> Some(1.0), 3L -> Some(1.5),
      4L -> None, 5L -> None))
  }

  test("Pattern.detect on an empty event log returns no matches (all step shapes)") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, String, Double)]
      .toDF("user_id", "ts", "event_type", "value")
    import graft.cep.Pattern
    val base = Pattern.begin("a", col("event_type") === "a").bind("value")
    assert(base.followedBy("b", col("event_type") === "b")
      .within(1000L).detect(empty, col("user_id"), col("ts")).count() == 0)
    assert(base.followedByIterative("b", col("event_type") === "b",
        Pattern.ev("value") > Pattern.bound("a", "value"))
      .within(1000L).detect(empty, col("user_id"), col("ts")).count() == 0)
    assert(base.followedByOneOf("x", "b" -> (col("event_type") === "b"),
        "c" -> (col("event_type") === "c"))
      .within(1000L).detect(empty, col("user_id"), col("ts")).count() == 0)
  }

  test("evictors keep everything when the window holds fewer elements than the bound") {
    import graft.operators.EventWindows
    val one = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), "a", 1L, 2.0))
      .toDF("ts", "event_type", "event_id", "value")
    val t = EventWindows.timeEvictedTumbleAgg(one, col("ts"), "1 hour", "15 minutes",
      Seq(col("event_type")), Seq(count(lit(1)).as("n"))).collect()
    assert(t.length == 1 && t.head.getAs[Long]("n") == 1L)
    val c = EventWindows.countEvictedTumbleAgg(one, col("ts"), "1 hour", 5, col("event_id"),
      Seq(col("event_type")), Seq(count(lit(1)).as("n"))).collect()
    assert(c.length == 1 && c.head.getAs[Long]("n") == 1L)
  }

  test("stratified hash sampling is row-local: the sample survives repartitioning") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.SparkEntry.queries("d09_stratified_sample")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // the same query over a differently-partitioned scan must pick the
    // exact same documents (no partition-index or RNG dependence)
    val docs = graft.sources.Tables.load(spark, dir, "documents").repartition(7)
    val b = docs.withColumn("bucket", substring(md5(col("text")), 32, 1))
      .filter((col("lang") === "en" && col("bucket").isin("0123456789abc".map(_.toString): _*)) ||
        (col("lang") =!= "en" && col("bucket").isin("0123".map(_.toString): _*)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("AudioHeaderDecoder rejects non-WAV bytes with named errors") {
    import graft.multimodal.AudioHeaderDecoder
    def err(b: Array[Byte]): String =
      intercept[IllegalArgumentException](AudioHeaderDecoder.audioMeta(b)).getMessage
    assert(err(Array.fill[Byte](10)(0)).contains("RIFF"))
    val riffNoFmt = ("RIFF" + "\u0000" * 4 + "WAVE" + "\u0000" * 40).getBytes("ISO-8859-1")
    assert(err(riffNoFmt).contains("fmt"))
  }

  test("t07 repetition filter survives documents shorter than the gram size") {
    // sequence(1, stop) with stop < 1 is DESCENDING in Spark ([1, 0]), so an
    // unguarded gram-position list would evaluate element_at(toks, 0) and
    // throw on any doc with < n words. Oracle semantics: such docs have no
    // grams and fall out of the inner join entirely.
    val dir = java.nio.file.Files.createTempDirectory("graft_t07").toString
    Seq((1L, "one"), (2L, "two words"), (3L, "three word doc"),
      (4L, "a a a a a a"), (5L, ""))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("t07_repetition_filter")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // docs 1, 2, 5 have no 3-grams -> absent; 3 and 4 present
    assert(out.keySet == Set(3L, 4L))
    assert(out(4L) == 1.0) // "a a" is every 2-gram position
  }

  test("MatchRecognize rejects malformed clauses with named errors") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"))
      .toDF("user_id", "ts", "event_type")
    def err(sql: String): String =
      intercept[RuntimeException](graft.cep.MatchRecognize.detect(ev, sql)).getMessage
    assert(err("SELECT 1").contains("MATCH_RECOGNIZE"))
    assert(err("MATCH_RECOGNIZE (ORDER BY ts PATTERN (A) WITHIN INTERVAL '1' HOUR)")
      .contains("PARTITION BY"))
    assert(err("MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts PATTERN (A))")
      .contains("WITHIN"))
    // any number of tiebreak COLUMNS is supported (r10); non-column ORDER
    // BY expressions stay named errors
    assert(err("MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts, a+b " +
      "PATTERN (A) WITHIN INTERVAL '1' HOUR)")
      .contains("tiebreak columns"))
    // the tiebreak steers plain bindings, run/group value reads (r10) and
    // — since r18 — plain-alternation branch choice; QUANTIFIED
    // alternations (per-branch counts) and self-runs (segmentation by
    // (ts, value)) stay named errors, never a silently different match
    assert(err("MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts, event_id " +
      "MEASURES FIRST(A.ts) AS f PATTERN (B (A|C)+) WITHIN INTERVAL '1' HOUR " +
      "DEFINE B AS event_type = 'b', A AS event_type = 'a', C AS event_type = 'c')")
      .contains("quantified alternation"))
  }
}
