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
}
