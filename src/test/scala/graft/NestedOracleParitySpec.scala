package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[graft.queries.NestedOracle]] depth-d oracle GENERATOR
  * against (a) the committed HAND-WRITTEN m52 depth-4 oracle text (both
  * executed by Spark's recursive-CTE engine on the same corpus — the
  * hand text is hash-green vs the engine through the driver's DuckDB
  * gate since r18, so generator == hand text transitively pins
  * generator == engine), and (b) the ENGINE directly at depth 5 (the
  * m57 query, whose driver oracle IS the generated text). Reference:
  * flink-cep GroupPattern.java:30 composes group-in-group patterns
  * recursively without a depth limit.
  */
class NestedOracleParitySpec extends AnyFunSuite with SparkTest {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.selectExpr(cols: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  private lazy val eventsReady: Unit = {
    // the walk is linear per anchor but its length is the per-anchor step
    // count — raise Spark's recursion guard well past the corpus depth
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "100000")
    graft.sources.Tables.load(spark, sfDir, "events")
      .createOrReplaceTempView("events")
  }

  private val m52Preds = (
    "event_type='signup'", "event_type='click'", "event_type='view'",
    Seq("event_type='error'",
      "event_type='purchase' AND value < 30",
      "event_type='purchase' AND value >= 30 AND value < 70",
      "event_type='purchase' AND value >= 70"))

  // the recursive-CTE execution is the expensive part — run gen(4) ONCE
  private lazy val gen4Rows: Seq[String] = {
    eventsReady
    rows(spark.sql(graft.queries.NestedOracle.countWalk(4, 960,
      m52Preds._1, m52Preds._2, m52Preds._3, m52Preds._4)))
  }

  test("generator(4) reproduces the hand-written m52 oracle text") {
    eventsReady
    val hand = graft.queries.WindowQueries.oracles("m52_depth4_nested_group")
    assert(gen4Rows.nonEmpty, "generator(4) produced no rows on the corpus")
    assert(gen4Rows == rows(spark.sql(hand)))
  }

  test("generator(4) matches the ENGINE's m52 output") {
    eventsReady
    val eng = graft.queries.WindowQueries
      .queries("m52_depth4_nested_group")(spark, sfDir)
    assert(gen4Rows == rows(eng))
  }

  test("generator(5) matches the ENGINE's m57 depth-5 output") {
    eventsReady
    val gen = graft.queries.WindowQueries.m57Sql
    val eng = graft.queries.WindowQueries
      .queries("m57_depth5_nested_group")(spark, sfDir)
    val e = rows(eng)
    assert(e.nonEmpty, "m57 matched nothing on the corpus — weaken the predicates")
    assert(rows(spark.sql(gen)) == e)
  }
}
