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
    // non-double arrays would be read as raw bytes by the primitive loop:
    // the analysis-time type check rejects them by name instead
    val ex = intercept[org.apache.spark.sql.AnalysisException](
      s.sql("SELECT array_dot(array(1, 2), array(3, 4))").head())
    assert(ex.getMessage.contains("array<double>"), ex.getMessage)
  }

  test("array_dot nulls the result on null elements, matching the composable form") {
    // primitive getDouble would silently read a null slot as 0.0; the
    // composable aggregate(zip_with(...)) form returns NULL — so must we
    val q = "array_dot(array(1.0d, cast(null as double)), array(2.0d, 3.0d))"
    val composable = "aggregate(zip_with(array(1.0d, cast(null as double)), " +
      "array(2.0d, 3.0d), (x, y) -> x * y), 0.0d, (acc, v) -> acc + v)"
    val r = s.sql(s"SELECT $q AS a, $composable AS b").head()
    assert(r.isNullAt(0) && r.isNullAt(1), r.toString)
    // null-free inputs are unaffected
    assert(s.sql("SELECT array_dot(array(1.0d, 2.0d), array(2.0d, 3.0d)) AS d")
      .head().getDouble(0) == 8.0)
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

  test("MATCH_RECOGNIZE runs as pure spark.sql text through the parser extension") {
    import org.apache.spark.sql.SparkSession
    // extensions bind at session construction: build a SECOND session on the
    // shared SparkContext (clearing the default so getOrCreate constructs
    // rather than returns), restore the shared session afterwards
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().withExtensions(GraftExtensions.install).getOrCreate()
    try {
      import s2.implicits._
      val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      def at(min: Long) = new java.sql.Timestamp(T0.getTime + min * 60000)
      Seq(
        (1L, at(0), "view"), (1L, at(10), "click"), (1L, at(20), "click"),
        (1L, at(30), "purchase"), (2L, at(0), "view"), (2L, at(5), "click")
      ).toDF("user_id", "ts", "event_type").createOrReplaceTempView("mr_events")
      // m01's clause shape, with an enclosing SELECT + WHERE to prove the
      // segment composes with ordinary SQL around it
      val rows = s2.sql(
        """SELECT user_id, purchase_ts FROM mr_events MATCH_RECOGNIZE (
          |  PARTITION BY user_id
          |  ORDER BY ts
          |  MEASURES A.ts AS view_ts, FIRST(B.ts) AS first_click_ts,
          |           LAST(B.ts) AS last_click_ts, C.ts AS purchase_ts
          |  PATTERN (A B{2} C)
          |  WITHIN INTERVAL '24' HOUR
          |  DEFINE A AS event_type = 'view', B AS event_type = 'click',
          |         C AS event_type = 'purchase'
          |) WHERE user_id = 1""".stripMargin)
        .as[(Long, java.sql.Timestamp)].collect().toSeq
      assert(rows == Seq((1L, at(30))))
      // a statement without the clause passes through untouched
      assert(s2.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("MATCH_RECOGNIZE front door: EXPLAIN works (eager compile) and a " +
       "non-table FROM source raises the named contract error") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder().withExtensions(GraftExtensions.install).getOrCreate()
    try {
      import s2.implicits._
      val T0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      Seq((1L, T0, "view")).toDF("user_id", "ts", "event_type")
        .createOrReplaceTempView("mr_events2")
      val clause =
        """ MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY ts
          |  MEASURES A.ts AS view_ts
          |  PATTERN (A) WITHIN INTERVAL '24' HOUR
          |  DEFINE A AS event_type = 'view')""".stripMargin
      // EXPLAIN is plan-only but still compiles the pattern (documented
      // eager-compile contract) — it must succeed and show a real plan
      val planText = s2.sql("EXPLAIN SELECT * FROM mr_events2" + clause)
        .head().getString(0)
      assert(planText.contains("Physical Plan"), planText)
      // a top-level CTE alias RESOLVES (r16 — the former named rejection):
      // the pattern binds to the CTE frame per SQL scope rules
      val cteRows = s2.sql("WITH cte_src AS (SELECT * FROM mr_events2) " +
        "SELECT * FROM cte_src" + clause).collect()
      assert(cteRows.length == 1 && cteRows.head.getAs[Long]("user_id") == 1L,
        cteRows.mkString(","))
      // a CTE alias SHADOWING a real temp view binds the CTE, not the
      // catalog object — the empty-filtered CTE yields NO matches even
      // though the shadowed view has one
      val shadowRows = s2.sql(
        "WITH mr_events2 AS (SELECT * FROM mr_events2 WHERE user_id < 0) " +
          "SELECT * FROM mr_events2" + clause).collect()
      assert(shadowRows.isEmpty, shadowRows.mkString(","))
      // no whitespace after the comma (`,mr_events2 AS (`) — chained CTEs
      // parse and the SECOND alias resolves
      val chainRows = s2.sql("WITH other_cte AS (SELECT 1 AS one)," +
        "mr_events2 AS (SELECT * FROM mr_events2 WHERE user_id < 0) " +
        "SELECT * FROM mr_events2" + clause).collect()
      assert(chainRows.isEmpty, chainRows.mkString(","))
      // a PARENTHESIZED SUBQUERY source (r16 — the former named
      // rejection), bare and aliased
      val subRows = s2.sql("SELECT * FROM (SELECT * FROM mr_events2)" +
        clause).collect()
      assert(subRows.length == 1, subRows.mkString(","))
      val subAliasRows = s2.sql(
        "SELECT * FROM (SELECT * FROM mr_events2 WHERE user_id < 0) AS t" +
          clause).collect()
      assert(subAliasRows.isEmpty, subAliasRows.mkString(","))
      // a non-CTE unresolvable name still gets the resolution error
      val e3 = intercept[IllegalArgumentException] {
        s2.sql("SELECT * FROM no_such_table_xyz" + clause)
      }
      assert(e3.getMessage.contains("not a resolvable table"), e3.getMessage)
      // plain statements with FROM ( and quoted parens pass through
      // untouched (the subquery scan only engages when the statement
      // mentions MATCH_RECOGNIZE, and the paren walk skips literals)
      assert(s2.sql("SELECT * FROM (SELECT '(' AS x) t").head().getString(0) == "(")
      // a quoted '(' inside the clause itself must not break the scan
      val qRows = s2.sql("SELECT * FROM (SELECT user_id, ts, " +
        "concat(event_type, '(') AS event_type FROM mr_events2)" +
        clause.replace("= 'view'", "= 'view('")).collect()
      assert(qRows.length == 1, qRows.mkString(","))
      // parens inside -- line comments, /* */ block comments, and
      // backquoted identifiers must not count toward nesting either
      val cRows = s2.sql("SELECT * FROM (SELECT user_id, ts, -- a ( stray\n" +
        "  /* also ) here */ event_type AS `weird(col` , event_type " +
        "FROM mr_events2)" + clause).collect()
      assert(cRows.length == 1, cRows.mkString(","))
      // a BACKSLASH-escaped quote inside a literal (Spark's default lexer
      // accepts \' and \") must not terminate the literal early — the
      // paren after it sits INSIDE the string (r17 scanner hardening)
      val bsRows = s2.sql("SELECT * FROM (SELECT user_id, ts, " +
        "event_type FROM mr_events2 WHERE event_type != 'a\\'(') " +
        clause).collect()
      assert(bsRows.length == 1, bsRows.mkString(","))
      // Spark supports NESTED bracketed comments (SPARK-28880): a ')'
      // in the outer comment's tail must not count toward nesting
      val ncRows = s2.sql("SELECT * FROM (SELECT user_id, ts, " +
        "/* outer /* inner */ still ) comment */ event_type " +
        "FROM mr_events2)" + clause).collect()
      assert(ncRows.length == 1, ncRows.mkString(","))
      // a WITH clause NOT at statement start (textually unevaluable) keeps
      // the named rejection instead of silently binding the catalog object
      Seq((1L, "x")).toDF("user_id", "s").createOrReplaceTempView("mr_sink3")
      val e4 = intercept[IllegalArgumentException] {
        s2.sql("INSERT INTO mr_sink3 WITH mr_events2 AS " +
          "(SELECT * FROM mr_events2 WHERE user_id < 0) " +
          "SELECT user_id, 'a' FROM mr_events2" + clause)
      }
      assert(e4.getMessage.contains("cannot evaluate"), e4.getMessage)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
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
