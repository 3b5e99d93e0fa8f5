package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, TextDedup, TextOps}

/** Unit-level checks of the §2.3–§2.5 building blocks against hand-computed
  * expectations (md5 via java.security, cosine via plain Scala math). */
class OperatorSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("shingles produce overlapping k-grams; short strings yield one") {
    val r = Seq("abcdef").toDF("t")
      .select(TextDedup.shingles(col("t"), 5).as("s")).as[Seq[String]].head()
    assert(r == Seq("abcde", "bcdef"))
    val short = Seq("ab").toDF("t")
      .select(TextDedup.shingles(col("t"), 5).as("s")).as[Seq[String]].head()
    assert(short == Seq("ab"))
  }

  test("minhash equals the lexicographic min of seeded md5 chunks over shingles") {
    val text = "abcdef"
    // hash fn 3 = chunk 3 of md5(s + ":0") (4 hash fns per digest)
    val expected = Seq("abcde", "bcdef").map(s => md5hex(s + ":0").substring(24, 32)).min
    val r = Seq(text).toDF("t")
      .select(TextDedup.minhash(TextDedup.shingles(col("t"), 5), 3).as("h"))
      .as[String].head()
    assert(r == expected)
    // different hash functions disagree (independent chunks)
    val r0 = Seq(text).toDF("t")
      .select(TextDedup.minhash(TextDedup.shingles(col("t"), 5), 0).as("h"))
      .as[String].head()
    assert(r0 != r)
  }

  test("ngramJaccard: identical texts → 1.0, disjoint → 0.0") {
    val df = Seq(("abcdef", "abcdef", "xyzuvw")).toDF("a", "b", "c")
    val r = df.select(
      TextDedup.ngramJaccard(col("a"), col("b"), 3).as("same"),
      TextDedup.ngramJaccard(col("a"), col("c"), 3).as("diff")).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("simhash16 is deterministic and 16-bit") {
    val vals = Seq("spark table join", "spark table join", "totally different words")
      .toDF("t").select(TextDedup.simhash16(col("t")).as("h")).as[Int].collect()
    assert(vals(0) == vals(1))
    assert(vals.forall(v => v >= 0 && v <= 0xffff))
  }

  test("cosine dot/norm matches plain Scala math") {
    val a = Array(1.0f, 2.0f, 3.0f); val b = Array(4.0f, 5.0f, 6.0f)
    val df = Seq((a, b)).toDF("a", "b")
      .select(Similarity.dot(Similarity.asDouble(col("a")), Similarity.asDouble(col("b"))).as("d"),
        Similarity.norm(Similarity.asDouble(col("a"))).as("na"))
    val r = df.head()
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }

  test("projection planes are deterministic in the seed") {
    assert(Similarity.planes(4, 64) == Similarity.planes(4, 64))
    assert(Similarity.planes(4, 64, seed = 7) != Similarity.planes(4, 64, seed = 8))
    assert(Similarity.planes(4, 64).flatten.forall(w => w == 1.0 || w == -1.0))
  }

  test("langGuess picks the max-scoring profile with fixed tie-break") {
    val df = Seq("the a the fast", "table line value query table", "hash join stream data hash")
      .toDF("t").select(TextOps.langGuess(TextOps.tokens(col("t"))).as("g"))
    assert(df.as[String].collect().toSeq == Seq("en", "fr", "de"))
    // all-zero scores tie-break to the first profile (en)
    val tie = Seq("zzz").toDF("t").select(TextOps.langGuess(TextOps.tokens(col("t"))).as("g"))
    assert(tie.as[String].head() == "en")
  }
}
