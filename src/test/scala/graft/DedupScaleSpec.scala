package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextDedup

/** Scale behaviors of the dedup operators: hot-bucket capping under a
  * degenerate corpus, 64-bit SimHash correctness against an independent
  * driver-side reference, and the pigeonhole guarantee of banded
  * fingerprint pairing.
  */
class DedupScaleSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("LSH hot-bucket cap bounds candidates on a degenerate corpus") {
    // 200 identical docs: every doc lands in ONE bucket per band. Uncapped,
    // the band join is quadratic in the bucket (19,900 pairs); with the cap
    // below the bucket size the bucket is dropped and NO pairs are emitted —
    // exact-hash dedup (d01) is the pass that collapses identical docs.
    val degenerate = (0L until 200L)
      .map(i => (i, "the same boilerplate text appears in every document here"))
      .toDF("doc_id", "text")
    val uncapped = TextDedup.minhashCandidates(degenerate, "doc_id", "text",
      maxBucketSize = Int.MaxValue)
    assert(uncapped.count() == 200L * 199 / 2)
    val capped = TextDedup.minhashCandidates(degenerate, "doc_id", "text",
      maxBucketSize = 100)
    assert(capped.count() == 0, "bucket of 200 > cap 100 must be dropped")
    // a mixed corpus: the hot bucket is dropped but normal near-dup pairs
    // in small buckets still come through
    val mixed = degenerate.union(Seq(
      (1000L, "a genuinely unique document about distributed query engines"),
      (1001L, "a genuinely unique document about distributed query engine")
    ).toDF("doc_id", "text"))
    val pairs = TextDedup.minhashCandidates(mixed, "doc_id", "text",
        maxBucketSize = 100)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1000L, 1001L)), "near-dup pair in a small bucket survives")
    assert(pairs.forall { case (a, b) => a >= 1000L && b >= 1000L },
      "no pair from the dropped hot bucket")
  }

  private def refSimhash64(text: String): Long = {
    // independent reimplementation: md5 each whitespace token, bit j of the
    // fingerprint = majority vote of bit j%4 of hex nibble j/4
    val toks = text.split(" ", -1)
    val md = MessageDigest.getInstance("MD5")
    val hexes = toks.map { t =>
      md.reset()
      md.digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    (0 until 64).map { j =>
      val k = hexes.count(h => ((Character.digit(h.charAt(j / 4), 16) >> (j % 4)) & 1) == 1)
      if (2 * k > toks.length) 1L << j else 0L
    }.reduce(_ | _)
  }

  private def simhash64Df(texts: Seq[String]) =
    texts.toDF("text")
      .select(col("text"), transform(split(col("text"), " "), t => md5(t)).as("md5s"))
      .select(col("text") +: size(col("md5s")).as("n") +:
        (0 until 16).map(c => TextDedup.simhash64PackedVotes(col("md5s"), c).as(s"vc$c")): _*)
      .select(col("text"),
        TextDedup.simhash64FromVotes((0 until 16).map(c => col(s"vc$c")), col("n"))
          .as("simhash"))

  test("simhash64 packed-counter pipeline matches a direct per-bit reference") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "single",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      "repeated repeated repeated repeated words words tilt the majority")
    val got = simhash64Df(texts).as[(String, Long)].collect().toMap
    texts.foreach { t =>
      assert(got(t) == refSimhash64(t), s"mismatch for: $t")
    }
  }

  test("simhash64 of near-identical docs is within small Hamming distance") {
    val a = "large language models are trained on deduplicated web text corpora " * 4
    val b = a.replace("web", "Web") // one token differs out of ~48
    val Seq(ha, hb) = simhash64Df(Seq(a.trim, b.trim)).as[(String, Long)]
      .collect().toSeq.sortBy(_._1).map(_._2)
    assert(java.lang.Long.bitCount(ha ^ hb) <= 8,
      s"near-dups must have close fingerprints, got ${java.lang.Long.bitCount(ha ^ hb)}")
  }

  test("bandedFingerprintPairs: pigeonhole recall and first-match-only emission") {
    // Hamming 3 (<= bands-1) pair: MUST be found (some band untouched)
    val base = 0x0123456789abcdefL
    val ham3 = base ^ 0x7L // 3 bits flipped, all inside band 0
    // >= 1 flipped bit in EVERY band: never a candidate
    val farApart = base ^ (1L | (1L << 16) | (1L << 32) | (1L << 48))
    val df = Seq((1L, base), (2L, ham3), (3L, farApart))
      .toDF("doc_id", "sig")
    val pairs = TextDedup.bandedFingerprintPairs(df, "doc_id", "sig", 4, 16)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(pairs.count(_ == (1L, 2L)) == 1,
      s"hamming-3 pair found exactly once (bands 1-3 all match -> first-match dedup), got $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"pair differing in every band must not collide: $pairs")
  }
}
