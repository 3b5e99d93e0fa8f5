package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Iterate, TextDedup}
import graft.plans.{GraftExtensions, TopNPerKey}

/** Degenerate inputs the operators must survive. */
class EdgeCaseSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

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

  test("sssp: unreachable vertices stay NULL, reachable get min-plus distances") {
    // 1 -> 2 (w 1.0) -> 3 (w 0.5); 4 -> 5 disconnected from the source
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 0.5), (4L, 5L, 2.0)).toDF("src", "dst", "w")
    val r = Iterate.sssp(edges, "src", "dst", "w", sourceId = 1L, iters = 3)
      .collect().map(x => (x.getLong(0), Option(x.get(1)).map(_.asInstanceOf[Double]))).toMap
    assert(r == Map(1L -> Some(0.0), 2L -> Some(1.0), 3L -> Some(1.5),
      4L -> None, 5L -> None))
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
  }
}
