package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.{propBoolean, BooleanOperators => _}
import org.scalacheck.Test.{check, Parameters}
import graft.operators.{Relational, TextDedup}

/** Property-based invariants (ScalaCheck) for the operators whose
  * correctness argument is combinatorial: banded fingerprint pairing must
  * equal brute force under the pigeonhole bound, and histogram ranking must
  * equal the native window functions on arbitrary data. Few cases, small
  * data — each case runs Spark jobs. */
class PropertySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(8)
  private def assertHolds(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("bandedFingerprintPairs == brute force for Hamming <= bands-1, each pair once") {
    val gen = Gen.listOfN(12, Gen.chooseNum(Long.MinValue, Long.MaxValue))
      .map(_.distinct)
    assertHolds(Prop.forAll(gen) { sigs =>
      val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "sig")
      val got = TextDedup.bandedFingerprintPairs(df, "doc_id", "sig", 4, 16)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
      // pigeonhole: hamming <= 3 ALWAYS shares a full 16-bit band
      val mustFind = for {
        i <- sigs.indices; j <- sigs.indices if i < j
        if java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= 3
      } yield (i.toLong, j.toLong)
      // candidates are exactly the pairs sharing >= 1 band value
      val bruteCand = for {
        i <- sigs.indices; j <- sigs.indices if i < j
        if (0 until 4).exists(b => ((sigs(i) >> (16 * b)) & 0xffffL) == ((sigs(j) >> (16 * b)) & 0xffffL))
      } yield (i.toLong, j.toLong)
      (got.toSet == bruteCand.toSet) :| s"candidate set mismatch: got=$got brute=$bruteCand" &&
        (mustFind.toSet.subsetOf(got.toSet)) :| "pigeonhole recall violated" &&
        (got.size == got.distinct.size) :| "first-match dedup emitted a pair twice"
    })
  }

  test("histogramRank == native dense_rank/percent_rank/cume_dist on arbitrary data") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(-5, 5)))
    assertHolds(Prop.forAll(gen) { rows =>
      rows.nonEmpty ==> {
        val df = rows.toDF("p", "v")
        val viaHist = Relational.histogramRank(df, col("p"), col("v"))
          .select("p", "v", "drk", "prk", "cd")
          .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4))).sorted.toSeq
        val w = org.apache.spark.sql.expressions.Window.partitionBy("p").orderBy("v")
        val viaWindow = df.select(col("p"), col("v"),
            dense_rank().over(w).cast("long").as("drk"),
            round(percent_rank().over(w), 6).as("prk"),
            round(cume_dist().over(w), 6).as("cd"))
          .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4))).sorted.toSeq
        (viaHist == viaWindow) :| s"hist=$viaHist window=$viaWindow"
      }
    })
  }

  test("minhash LSH candidates are symmetric-closed: every exact duplicate pair is found") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val doc = Gen.listOfN(8, word).map(_.mkString(" "))
    val gen = Gen.listOfN(10, doc)
    assertHolds(Prop.forAll(gen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = TextDedup.minhashCandidates(df, "doc_id", "text")
        .as[(Long, Long)].collect().toSet
      // identical text => identical signature => identical buckets => candidate
      val dupPairs = for {
        i <- docs.indices; j <- docs.indices if i < j && docs(i) == docs(j)
      } yield (i.toLong, j.toLong)
      dupPairs.toSet.subsetOf(pairs) :| s"missing exact-dup pairs: ${dupPairs.toSet -- pairs}"
    })
  }
}
