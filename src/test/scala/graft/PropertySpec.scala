package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, Skew, TextDedup}
import graft.plans.{GraftExtensions, TopNPerKey}

/** Property-based invariants over randomized-but-reproducible inputs (raw
  * ScalaCheck Gen with fixed seeds; few cases — each case spins Spark jobs).
  */
class PropertySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val params = Gen.Parameters.default.withSize(40)
  private def sample[A](g: Gen[A], seed: Long): A =
    g(params, Seed(seed)).getOrElse(fail(s"generator exhausted at seed $seed"))

  private val rows: Gen[List[(Long, Int)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 5L), Gen.choose(0, 1000)))

  test("TopNPerKey ≡ row_number filter for arbitrary data, keys and n") {
    GraftExtensions.installInto(spark)
    (1 to 5).foreach { s =>
      val data = sample(rows, s)
      val n = 1 + s % 4
      val df = data.toDF("k", "v")
      val native = TopNPerKey(df, n, Seq(col("k")), Seq(col("v").desc, col("k")))
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      val window = Relational.topNPerGroup(df, Seq(col("k")),
          Seq(col("v").desc, col("k")), n).select("k", "v")
        .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      assert(native == window, s"seed=$s n=$n data=$data")
    }
  }

  test("saltedEquiJoin ≡ plain join for arbitrary data and salt factors") {
    (1 to 4).foreach { s =>
      val left = sample(rows, s).toDF("lk", "lv")
      val right = sample(rows, s + 100).toDF("rk", "rv")
      val factor = 2 + s
      val plain = left.join(right, col("lk") === col("rk")).count()
      val salted = Skew.saltedEquiJoin(left, right, "lk", "rk", factor, col("lv")).count()
      assert(plain == salted, s"seed=$s factor=$factor")
    }
  }

  test("ngramJaccard stays in [0,1] and is 1 on equal strings") {
    val text = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    (1 to 5).foreach { s =>
      val (a, b) = (sample(text, s), sample(text, s + 50))
      val r = Seq((a, b)).toDF("a", "b")
        .select(TextDedup.ngramJaccard(col("a"), col("b"), 3).as("j"),
          TextDedup.ngramJaccard(col("a"), col("a"), 3).as("self")).head()
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0, s"seed=$s a=$a b=$b")
      assert(r.getDouble(1) == 1.0)
    }
  }
}
