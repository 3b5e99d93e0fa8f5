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
}
