package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jdbc

/** JDBC source/sink against an in-JVM Derby database (the embedded driver
  * ships with Spark) — write, read back, partitioned parallel read. */
class JdbcSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val url = "jdbc:derby:memory:grafttest;create=true"

  test("jdbc write -> read round-trips; partitioned read fans out") {
    val df = (1L to 100L).map(i => (i, s"name-$i", i * 1.5)).toDF("id", "name", "score")
    Jdbc.write(df, url, "people", mode = "overwrite")
    val back = Jdbc.read(spark, url, "people")
    assert(back.count() == 100)
    assert(back.filter($"id" === 7L).select("name").as[String].head() == "name-7")
    val part = Jdbc.readPartitioned(spark, url, "people", "id", 1L, 100L, 4)
    assert(part.rdd.getNumPartitions == 4, "ranged read must create one slice per partition")
    assert(part.agg(org.apache.spark.sql.functions.sum($"id")).as[Long].head() == 5050L)
  }

  test("jdbc read pushes filters to the remote engine") {
    val df = Jdbc.read(spark, url, "people").filter($"id" <= 10).select("id")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.toLowerCase.contains("id"),
      s"filter must reach the JDBC scan:\n$p")
    assert(df.count() == 10)
  }
}
