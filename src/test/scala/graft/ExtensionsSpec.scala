package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.plans.GraftExtensions

/** SparkSessionExtensions: SQL function registration + optimizer fusion rule
  * (installed onto the live shared session via GraftExtensions.installInto).
  */
class ExtensionsSpec extends AnyFunSuite with SparkTest {

  private lazy val s = { GraftExtensions.installInto(spark); spark }

  test("array_dot is callable from SQL") {
    val r = s.sql(
      "SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d").head()
    assert(r.getDouble(0) == 32.0)
  }

  test("graph_pagerank is a FROM-clause table function (extensions beyond scalars)") {
    import s.implicits._
    // a 3-cycle: symmetric ranks summing to ~1
    Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
      .createOrReplaceTempView("g_edges")
    val r = s.sql("SELECT * FROM graph_pagerank('g_edges', 'src', 'dst', 2)")
      .collect()
    assert(r.length == 3 && r.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    val total = r.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-6, s"ranks must sum to 1, got $total")
  }

  test("DotProductFusion rewrites the composable aggregate(zip_with) pattern") {
    // parquet-backed input — a local relation would be constant-folded whole
    val v = Similarity.asDouble(col("embedding"))
    val df = graft.sources.Tables.load(s, sfDir, "embeddings")
      .select(aggregate(zip_with(v, v, (x, y) => x * y),
        lit(0.0), (acc, vv) => acc + vv).as("sq_norm"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("array_dot"), s"fusion rule did not fire:\n$optimized")
    assert(df.head().getDouble(0) > 0.0)
  }
}
