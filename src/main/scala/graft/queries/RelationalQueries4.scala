package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.1 continued — grouping sets, rank-function suite, UNNEST, set ops with
  * ALL semantics, LISTAGG. Each maps a Blink-planner feature of the reference
  * (flink-table/flink-table-planner-blink): GROUPING SETS + GROUPING_ID
  * (`FlinkLogicalExpand`), RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST
  * (`FlinkSqlOperatorTable`), CROSS JOIN UNNEST (`LogicalUnnestRule`),
  * INTERSECT ALL / MINUS ALL (`Table.intersectAll/minusAll`), LISTAGG.
  */
object RelationalQueries4 {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  // --- q30: GROUPING SETS + grouping() markers over a 2-table join ---
  // Spark's DataFrame API exposes only rollup/cube; arbitrary grouping sets
  // go through the SQL front door (same physical Expand operator either way).
  private val q30: Q = (s, dir) => {
    t(s, dir, "orders").createOrReplaceTempView("g30_orders")
    t(s, dir, "customer").createOrReplaceTempView("g30_customer")
    t(s, dir, "nation").createOrReplaceTempView("g30_nation")
    s.sql(
      """SELECT n_name, o_orderpriority,
        | CAST(grouping(n_name) AS INT) AS g_nation,
        | CAST(grouping(o_orderpriority) AS INT) AS g_prio,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM g30_orders JOIN g30_customer ON o_custkey = c_custkey
        |                JOIN g30_nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), (o_orderpriority), ())
        |""".stripMargin)
  }
  private val q30Sql =
    """SELECT n_name, o_orderpriority,
      | CAST(grouping(n_name) AS INT) AS g_nation,
      | CAST(grouping(o_orderpriority) AS INT) AS g_prio,
      | count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |            JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), (o_orderpriority), ())""".stripMargin

  // --- q31: rank-function suite with real peer groups ---
  // Bucketing the order value gives genuine ties, so DENSE_RANK differs from
  // ROW_NUMBER and PERCENT_RANK/CUME_DIST see peer groups. Rank values depend
  // only on the ORDER BY values, so ties are deterministic.
  private val q31: Q = (s, dir) => {
    val bucket = floor(col("o_totalprice") / 50000).cast("int")
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(bucket)
    t(s, dir, "orders").select(col("o_orderpriority"), col("o_orderkey"),
      bucket.as("bucket"),
      dense_rank().over(w).cast("long").as("drk"),
      round(percent_rank().over(w), 6).as("prk"),
      round(cume_dist().over(w), 6).as("cd"))
  }
  private val q31Sql =
    """SELECT o_orderpriority, o_orderkey,
      | CAST(floor(o_totalprice / 50000) AS INT) AS bucket,
      | CAST(dense_rank() OVER w AS BIGINT) AS drk,
      | round(percent_rank() OVER w, 6) AS prk,
      | round(cume_dist() OVER w, 6) AS cd
      |FROM orders WINDOW w AS (PARTITION BY o_orderpriority
      |  ORDER BY CAST(floor(o_totalprice / 50000) AS INT))""".stripMargin

  // --- q32: UNNEST / explode — token frequency top-50 ---
  private val q32: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)
  private val q32Sql =
    """SELECT token, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin

  // --- q33: INTERSECT ALL / EXCEPT ALL (multiset semantics) ---
  // Customers by order-priority class; duplicates preserved, so the result
  // is a true multiset difference/intersection (Flink minusAll/intersectAll).
  private val q33: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val high = o.filter(col("o_orderpriority") === "2-HIGH").select(col("o_custkey"))
    urgent.intersectAll(high).withColumn("tag", lit("both"))
      .unionAll(urgent.exceptAll(high).withColumn("tag", lit("urgent_only")))
  }
  private val q33Sql =
    """WITH u AS (SELECT o_custkey FROM orders WHERE o_orderpriority='1-URGENT'),
      |     h AS (SELECT o_custkey FROM orders WHERE o_orderpriority='2-HIGH')
      |SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM u INTERSECT ALL SELECT * FROM h)
      |UNION ALL
      |SELECT o_custkey, 'urgent_only' AS tag FROM (SELECT * FROM u EXCEPT ALL SELECT * FROM h)""".stripMargin

  // --- q34: LISTAGG — ordered string aggregation per group ---
  private val q34: Q = (s, dir) =>
    t(s, dir, "nation").join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n_nations"))
  private val q34Sql =
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      | count(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  // --- q35: approximate count-distinct (HLL++) ---
  // No DuckDB oracle: the sketch is engine-specific, so cross-engine values
  // differ by construction. `ApproxSpec` bounds the relative error against
  // the exact count instead; the driver records a rows-only check.
  private val q35: Q = (s, dir) =>
    t(s, dir, "lineitem").groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("apx_parts"),
        countDistinct(col("l_partkey")).as("n_parts"))

  // --- q36: DISTINCT aggregate over a running window (Blink distinct OVER) ---
  // Neither engine supports count(DISTINCT) OVER directly; both express it as
  // distinct-of-collected-list, which is exactly how Blink's distinct OVER
  // aggregate buffers per-key distinct maps.
  private val q36: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "events").select(col("event_id"), col("user_id"),
      size(array_distinct(collect_list(col("event_type")).over(w))).as("n_types_seen"))
  }
  private val q36Sql =
    """SELECT event_id, user_id,
      | CAST(len(list_distinct(list(event_type) OVER w)) AS INT) AS n_types_seen
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // --- g01: generated-sequence source (ExecutionEnvironment.generateSequence) ---
  private val g01: Q = (s, _) =>
    s.range(0, 1000000)
      .select((col("id") % 97).as("bucket"), col("id"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("id").as("sum_id"), max("id").as("max_id"))
  private val g01Sql =
    """SELECT range % 97 AS bucket, count(*) AS n,
      | CAST(sum(range) AS BIGINT) AS sum_id, max(range) AS max_id
      |FROM range(1000000) GROUP BY 1""".stripMargin

  // --- g02: DataSetUtils.zipWithIndex — deterministic GLOBAL row index
  // without a single-partition window (reference flink-java/.../utils/
  // DataSetUtils.java:89: per-partition counts + broadcast offsets +
  // local index): range-repartition on the unique order, partitioned
  // window for the local index, metadata-sized offset table broadcast
  // back — the scalable analog of `row_number() OVER (ORDER BY ...)`,
  // which the oracle replays directly.
  private val g02: Q = (s, dir) => {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"))
    graft.operators.Relational
      .zipWithIndex(li, Seq(col("l_orderkey"), col("l_linenumber")))
      .select(col("idx"), col("l_orderkey"), col("l_linenumber"))
  }
  private val g02Sql =
    """SELECT CAST(row_number() OVER (ORDER BY l_orderkey, l_linenumber)
      |            AS BIGINT) AS idx,
      | l_orderkey, l_linenumber FROM lineitem""".stripMargin

  // --- q37: DataSet.cross — explicit cartesian of two small sets ---
  // (flink-java DataSet#cross; only sane when at least one side is tiny,
  // which is exactly when Spark broadcasts the nested-loop join)
  private val q37: Q = (s, dir) => {
    val prio = t(s, dir, "orders").select(col("o_orderpriority")).distinct()
    t(s, dir, "region").select(col("r_name")).crossJoin(prio)
      .select(col("r_name"), col("o_orderpriority"),
        concat_ws("/", col("r_name"), col("o_orderpriority")).as("cell"))
  }
  private val q37Sql =
    """SELECT r_name, o_orderpriority, r_name || '/' || o_orderpriority AS cell
      |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)""".stripMargin

  // --- q38: two-pass histogram ranking — the 100 TB alternative to q31 ---
  // Identical semantics and ORACLE as q31 (same window SQL), but the plan
  // never sorts the fact table: the rank columns come from a histogram
  // aggregate + a broadcast join back (Relational.histogramRank). The
  // low-cardinality PARTITION BY that serializes q31's window touches only
  // distinct bucket values here.
  private val q38: Q = (s, dir) => {
    val bucket = floor(col("o_totalprice") / 50000).cast("int")
    val base = t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), bucket.as("bucket"))
    graft.operators.Relational.histogramRank(base, col("o_orderpriority"), col("bucket"))
      .select("o_orderpriority", "o_orderkey", "bucket", "drk", "prk", "cd")
  }
  private val q38Sql = q31Sql

  // --- q39: FULL and RIGHT outer joins (DataSet fullOuterJoin/rightOuterJoin) ---
  // High-balance customers per nation FULL OUTER low-cost suppliers per
  // nation: either side can be absent; a RIGHT outer against the nation dim
  // restores every nation row. Null-extended sides surface as zero counts.
  private val q39: Q = (s, dir) => {
    val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
    val su = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
      .groupBy(col("s_nationkey").as("nk2")).agg(count(lit(1)).as("n_supp"))
    val fo = c.join(su, col("nk") === col("nk2"), "full_outer")
      .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    fo.join(n, col("nationkey") === col("n_nationkey"), "right_outer")
      .select(col("n_name"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }
  private val q39Sql =
    """WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
      |           WHERE c_acctbal > 9000 GROUP BY 1),
      |s AS (SELECT s_nationkey AS nk2, count(*) AS n_supp FROM supplier
      |      WHERE s_acctbal < 0 GROUP BY 1),
      |fo AS (SELECT coalesce(nk, nk2) AS nationkey,
      |        coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |       FROM c FULL OUTER JOIN s ON nk = nk2)
      |SELECT n_name, CAST(coalesce(n_cust, 0) AS BIGINT) AS n_cust,
      | CAST(coalesce(n_supp, 0) AS BIGINT) AS n_supp
      |FROM fo RIGHT JOIN nation ON nationkey = n_nationkey""".stripMargin

  val queries: Map[String, Q] = Map(
    "q30_grouping_sets" -> q30, "q31_rank_funcs" -> q31, "q32_unnest" -> q32,
    "q33_set_ops_all" -> q33, "q34_listagg" -> q34, "q35_approx_distinct" -> q35,
    "q36_windowed_distinct" -> q36, "q37_cross" -> q37, "g01_generate_sequence" -> g01,
    "g02_zip_with_index" -> g02,
    "q38_histogram_rank" -> q38, "q39_full_right_outer" -> q39)
  val oracles: Map[String, String] = Map(
    "q30_grouping_sets" -> q30Sql, "q31_rank_funcs" -> q31Sql, "q32_unnest" -> q32Sql,
    "q33_set_ops_all" -> q33Sql, "q34_listagg" -> q34Sql,
    "q36_windowed_distinct" -> q36Sql, "q37_cross" -> q37Sql,
    "g01_generate_sequence" -> g01Sql, "g02_zip_with_index" -> g02Sql,
    "q38_histogram_rank" -> q38Sql,
    "q39_full_right_outer" -> q39Sql)
}
