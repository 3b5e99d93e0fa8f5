package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** §2.1 continued — scalar-function surface parity with the reference's
  * FlinkSqlOperatorTable (flink-table/flink-table-planner-blink/.../functions/
  * sql/FlinkSqlOperatorTable.java): math, extended string ops, JSON access.
  * Transcendentals are rounded at 6 dp (libm vs JVM may differ in the last
  * ulp); pure integer/decimal functions are exact.
  */
object FunctionQueries {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, name: String) = Tables.load(s, dir, name)

  // --- f01: math functions ---
  private val f01: Q = (s, dir) =>
    t(s, dir, "lineitem").filter(col("l_linenumber") === 1)
      .select(col("l_orderkey"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        ceil(col("l_quantity") / 7).cast("long").as("ceil_q"),
        floor(col("l_quantity") / 7).cast("long").as("floor_q"),
        signum(col("l_discount") - 0.05).as("sign_d"),
        (col("l_quantity") % 5).as("mod_q"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
        round(exp(col("l_discount")), 6).as("exp_d"),
        round(log(lit(1.0) + col("l_tax")), 6).as("ln_tax"),
        round(pow(col("l_quantity"), 0.5), 6).as("pow_q"))
  private val f01Sql =
    """SELECT l_orderkey,
      | abs(l_discount - 0.05) AS abs_d,
      | CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q,
      | CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q,
      | CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_d,
      | l_quantity % 5 AS mod_q,
      | round(sqrt(l_quantity), 6) AS sqrt_q,
      | round(exp(l_discount), 6) AS exp_d,
      | round(ln(1.0 + l_tax), 6) AS ln_tax,
      | round(power(l_quantity, 0.5), 6) AS pow_q
      |FROM lineitem WHERE l_linenumber = 1""".stripMargin

  // --- f02: extended string functions ---
  private val f02: Q = (s, dir) =>
    t(s, dir, "part").select(col("p_partkey"),
      lpad(col("p_brand"), 12, "*").as("brand_pad"),
      rpad(col("p_brand"), 12, "-").as("brand_rpad"),
      trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"),
      reverse(col("p_brand")).as("brand_rev"),
      substring_index(col("p_type"), " ", 1).as("type_first"),
      instr(col("p_name"), "a").cast("long").as("pos_a"),
      translate(col("p_brand"), "Br", "bR").as("brand_tr"),
      repeat(col("p_brand"), 2).as("brand_x2"))
  private val f02Sql =
    """SELECT p_partkey,
      | lpad(p_brand, 12, '*') AS brand_pad,
      | rpad(p_brand, 12, '-') AS brand_rpad,
      | trim('  ' || p_name || '  ') AS name_trim,
      | reverse(p_brand) AS brand_rev,
      | split_part(p_type, ' ', 1) AS type_first,
      | CAST(position('a' in p_name) AS BIGINT) AS pos_a,
      | translate(p_brand, 'Br', 'bR') AS brand_tr,
      | repeat(p_brand, 2) AS brand_x2
      |FROM part""".stripMargin

  // --- f03: JSON access over the events.props column ---
  private val f03: Q = (s, dir) =>
    t(s, dir, "events")
      .select(col("event_id"), get_json_object(col("props"), "$.k").as("k_str"))
      .withColumn("k", col("k_str").cast("int"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
  private val f03Sql =
    """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
      | count(*) AS n,
      | CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1""".stripMargin

  // --- f04: conditional functions — NULLIF/COALESCE/GREATEST/LEAST/IF ---
  private val f04: Q = (s, dir) =>
    t(s, dir, "orders").select(col("o_orderkey"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_c"),
      greatest(col("o_totalprice"), lit(100000.0)).as("hi"),
      least(col("o_totalprice"), lit(100000.0)).as("lo"),
      when(col("o_orderpriority") === "1-URGENT", lit("rush")).otherwise(lit("std")).as("ship_if"),
      nvl2(nullif(col("o_orderstatus"), lit("F")), lit(1), lit(0)).as("not_finished"))
  private val f04Sql =
    """SELECT o_orderkey,
      | coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_c,
      | greatest(o_totalprice, 100000.0) AS hi,
      | least(o_totalprice, 100000.0) AS lo,
      | CASE WHEN o_orderpriority = '1-URGENT' THEN 'rush' ELSE 'std' END AS ship_if,
      | CASE WHEN nullif(o_orderstatus, 'F') IS NOT NULL THEN 1 ELSE 0 END AS not_finished
      |FROM orders""".stripMargin

  // --- f05: hash functions — MD5 / SHA-256 (FlinkSqlOperatorTable MD5, SHA256) ---
  private val f05: Q = (s, dir) =>
    t(s, dir, "customer").select(col("c_custkey"),
      md5(col("c_name")).as("md5_name"),
      sha2(col("c_name"), 256).as("sha256_name"),
      substring(md5(concat_ws("|", col("c_name"), col("c_mktsegment"))), 1, 8).as("row_sig"))
  private val f05Sql =
    """SELECT c_custkey,
      | md5(c_name) AS md5_name,
      | sha256(c_name) AS sha256_name,
      | substr(md5(c_name || '|' || c_mktsegment), 1, 8) AS row_sig
      |FROM customer""".stripMargin

  // --- f06: temporal functions — quarter/dow/last_day/trunc/diff/add_months ---
  private val f06: Q = (s, dir) =>
    t(s, dir, "orders").select(col("o_orderkey"),
      quarter(col("o_orderdate")).as("qtr"),
      dayofweek(col("o_orderdate")).as("dow"), // 1=Sunday..7
      last_day(col("o_orderdate")).cast("timestamp").as("eom"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
      add_months(col("o_orderdate"), 3).cast("timestamp").as("plus3m"))
  private val f06Sql =
    """SELECT o_orderkey,
      | CAST(quarter(o_orderdate) AS INT) AS qtr,
      | CAST(date_part('dow', o_orderdate) AS INT) + 1 AS dow,
      | CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
      | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      | CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
      | CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP) AS plus3m
      |FROM orders""".stripMargin

  // --- f07: bitwise functions — AND/OR/XOR/shift (FlinkSqlOperatorTable BITAND/BITOR/BITXOR) ---
  private val f07: Q = (s, dir) =>
    t(s, dir, "part").select(col("p_partkey"),
      (col("p_size").bitwiseAND(lit(12))).as("b_and"),
      (col("p_size").bitwiseOR(lit(5))).as("b_or"),
      (col("p_size").bitwiseXOR(col("p_partkey") % 32)).as("b_xor"),
      shiftleft(col("p_size"), 2).as("b_shl"))
  private val f07Sql =
    """SELECT p_partkey,
      | p_size & 12 AS b_and,
      | p_size | 5 AS b_or,
      | xor(p_size, p_partkey % 32) AS b_xor,
      | CAST(p_size << 2 AS INT) AS b_shl
      |FROM part""".stripMargin

  // --- f08: user-defined AGGREGATE function (Flink AggregateFunction/UDAGG) ---
  // graft.functions.WeightedAvgAgg registered via functions.udaf and invoked
  // from SQL TEXT — the tableEnv.registerFunction("wavg", ...) analog.
  // Quantity-weighted average price per return flag; oracle replays the
  // Σ(x·w)/Σ(w) contract with builtins.
  private val f08: Q = (s, dir) => {
    Tables.registerAll(s, dir)
    s.udf.register("wavg", udaf(graft.functions.WeightedAvgAgg))
    s.sql("""SELECT l_returnflag,
            |       round(wavg(l_extendedprice, l_quantity), 4) AS w_avg_price,
            |       round(avg(l_extendedprice), 4) AS plain_avg_price
            |FROM lineitem GROUP BY l_returnflag""".stripMargin)
  }
  private val f08Sql =
    """SELECT l_returnflag,
      | round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS w_avg_price,
      | round(avg(l_extendedprice), 4) AS plain_avg_price
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // --- f09: collection functions (Flink CARDINALITY / ELEMENT / array
  // access — flink-table collection functions over ARRAY columns): per
  // order, the sorted line-number array and the function family over it.
  // collect_list order is non-deterministic; sort_array pins it (the
  // DuckDB twin is list(... ORDER BY ...)). All codegen'd builtins.
  private val f09: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber"))).as("items"))
      .select(col("l_orderkey"),
        size(col("items")).as("n_items"),
        element_at(col("items"), 1).as("first_item"),
        element_at(col("items"), -1).as("last_item"),
        array_contains(col("items"), 3).as("has_line3"),
        size(array_distinct(col("items"))).as("n_distinct"))
  private val f09Sql =
    """SELECT l_orderkey,
      | CAST(len(items) AS INT) AS n_items,
      | items[1] AS first_item,
      | items[-1] AS last_item,
      | list_contains(items, 3) AS has_line3,
      | CAST(len(list_distinct(items)) AS INT) AS n_distinct
      |FROM (SELECT l_orderkey, list(l_linenumber ORDER BY l_linenumber) AS items
      |      FROM lineitem GROUP BY 1)""".stripMargin

  // --- f10: TABLE aggregate function (Flink TableAggregateFunction /
  // flatAggregate, GroupedTable.java:96 Top2 example) — emit-two-rows-per-
  // group: graft.functions.Top2TableAgg returns the per-group top-2 row SET
  // as an array-of-structs which inline() explodes; one hash aggregate, the
  // explode rides the aggregate output (2 rows/group), no extra shuffle.
  // Oracle: the row_number window replay of the same top-2-with-rank set.
  private val f10: Q = (s, dir) => {
    Tables.registerAll(s, dir)
    s.udf.register("top2", udaf(graft.functions.Top2TableAgg))
    s.sql("""SELECT l_orderkey, inline(top2(l_extendedprice, l_linenumber).rows)
            |FROM lineitem GROUP BY l_orderkey""".stripMargin)
  }
  private val f10Sql =
    """SELECT l_orderkey, l_extendedprice AS price,
      | CAST(l_linenumber AS BIGINT) AS linenumber, rnk
      |FROM (SELECT l_orderkey, l_extendedprice, l_linenumber,
      |             CAST(row_number() OVER (PARTITION BY l_orderkey
      |               ORDER BY l_extendedprice DESC, l_linenumber) AS INT) AS rnk
      |      FROM lineitem)
      |WHERE rnk <= 2""".stripMargin

  // --- f11: TABLE function / UDTF (Flink TableFunction + LATERAL TABLE,
  // flink-table-common/.../functions/TableFunction.java — user code emits
  // multiple rows per input row via collect(); the last un-mapped
  // user-defined function KIND after scalar UDF / f08 UDAGG / f10 table
  // aggregate): registered user code returning an array-of-structs,
  // invoked from SQL TEXT with `LATERAL VIEW inline(...)` — a row-local
  // generator projection, no shuffle/join for the expansion itself; the
  // downstream aggregate is one hash agg on the token key. Integer-only
  // output columns (counts, position sums) keep the oracle float-free.
  private val f11: Q = (s, dir) => {
    Tables.registerAll(s, dir)
    s.udf.register("graft_split",
      org.apache.spark.sql.functions.udf(graft.functions.SplitTableFunc.eval))
    s.sql("""SELECT t.word AS word, COUNT(DISTINCT doc_id) AS n_docs,
            |       COUNT(*) AS n_occ, SUM(CAST(t.pos AS BIGINT)) AS sum_pos,
            |       CAST(MIN(t.pos) AS BIGINT) AS min_pos
            |FROM documents LATERAL VIEW inline(graft_split(text)) t AS word, pos, len
            |GROUP BY t.word
            |ORDER BY n_occ DESC, word
            |LIMIT 30""".stripMargin)
  }
  private val f11Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |p AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM t),
      |tok AS (SELECT doc_id, toks[i] AS word, i - 1 AS pos FROM p)
      |SELECT word, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ,
      |       CAST(SUM(pos) AS BIGINT) AS sum_pos, CAST(MIN(pos) AS BIGINT) AS min_pos
      |FROM tok GROUP BY word ORDER BY n_occ DESC, word LIMIT 30""".stripMargin

  // --- f12: the SQL DDL front door, driver-gated (reference
  // flink-sql-parser SqlCreateTable / SqlCreateView: the CREATE TABLE …
  // WITH → CREATE VIEW → SELECT script every Flink SQL user starts with).
  // Tables register through graft.plans.FlinkDdl (batch filesystem
  // connector, declared-subset projection), the joining view goes through
  // the CREATE VIEW rewrite, and the aggregate runs as plain spark.sql over
  // the registered names — the whole pipeline is DDL + SQL text. Money sums
  // accumulate as ×100 scaled longs (exact, order-free) per the engine
  // convention.
  private val f12: Q = (s, dir) => {
    graft.plans.FlinkDdl.execute(s,
      s"""CREATE TABLE ddl_f12_orders (
         |  o_orderkey BIGINT, o_custkey BIGINT,
         |  o_totalprice DOUBLE, o_orderpriority STRING
         |) WITH ('connector' = 'filesystem', 'path' = '$dir/orders.parquet',
         |        'format' = 'parquet')""".stripMargin)
    graft.plans.FlinkDdl.execute(s,
      s"""CREATE TABLE ddl_f12_customer (c_custkey BIGINT, c_nationkey INT)
         |WITH ('connector' = 'filesystem', 'path' = '$dir/customer.parquet',
         |      'format' = 'parquet')""".stripMargin)
    s.sql(graft.plans.FlinkDdl.rewriteCreateView(
      """CREATE VIEW ddl_f12_v AS
        |SELECT c_nationkey, o_orderpriority, o_totalprice
        |FROM ddl_f12_orders JOIN ddl_f12_customer ON o_custkey = c_custkey""".stripMargin))
    s.sql(
      """SELECT c_nationkey, o_orderpriority, count(*) AS n_orders,
        |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
        |         / CAST(100 AS DOUBLE) AS sum_price
        |FROM ddl_f12_v GROUP BY c_nationkey, o_orderpriority""".stripMargin)
  }
  private val f12Sql =
    """SELECT c_nationkey, o_orderpriority, count(*) AS n_orders,
      |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
      |         / CAST(100 AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1, 2""".stripMargin

  // --- f13: Flink SQL group windows, driver-gated (reference
  // FlinkSqlOperatorTable TUMBLE/HOP/SESSION + _START/_END auxiliaries;
  // GroupWindowSql rewrites the spelling to Spark's window functions, so
  // the VERBATIM Flink text runs — the most common Flink SQL idiom).
  // Oracle: the same 10-minute epoch bucketing in DuckDB; the value sum is
  // a scaled-integer fold (2-dp grid, order-free, bit-identical).
  private val f13: Q = (s, dir) => {
    Tables.load(s, dir, "events").createOrReplaceTempView("f13_events")
    s.sql(graft.plans.GroupWindowSql.rewrite(
      """SELECT user_id,
        |       TUMBLE_START(ts, INTERVAL '10' MINUTE) AS w_start,
        |       TUMBLE_END(ts, INTERVAL '10' MINUTE) AS w_end,
        |       count(*) AS n,
        |       CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100 AS sv
        |FROM f13_events
        |GROUP BY user_id, TUMBLE(ts, INTERVAL '10' MINUTE)""".stripMargin))
  }
  private val f13Sql =
    """SELECT user_id,
      |       make_timestamp(CAST(floor(epoch(ts) / 600) * 600 * 1000000 AS BIGINT)) AS w_start,
      |       make_timestamp(CAST((floor(epoch(ts) / 600) * 600 + 600) * 1000000 AS BIGINT)) AS w_end,
      |       count(*) AS n,
      |       CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100 AS sv
      |FROM events
      |GROUP BY 1, 2, 3""".stripMargin

  // --- f14: cascading group windows from PURE Flink SQL text — the
  // TUMBLE_ROWTIME auxiliary (reference FlinkSqlOperatorTable
  // TUMBLE_ROWTIME: re-exports window.end - 1ms as a time attribute) feeds
  // an ENCLOSING hourly TUMBLE. GroupWindowSql rewrites the auxiliary to
  // `window.end - INTERVAL '0.001' SECOND`; 10-minute windows are
  // hour-aligned, so the cascade equals direct hourly bucketing — which is
  // exactly what the oracle computes (the cascade is the ENGINE-side path
  // under test; the oracle checks the composed result).
  private val f14: Q = (s, dir) => {
    Tables.load(s, dir, "events").createOrReplaceTempView("f14_events")
    s.sql(graft.plans.GroupWindowSql.rewrite(
      """SELECT user_id,
        |       TUMBLE_START(rt, INTERVAL '1' HOUR) AS w_start,
        |       sum(n) AS n,
        |       CAST(CAST(sum(sv_scaled) AS BIGINT) AS DOUBLE) / 100 AS sv
        |FROM (SELECT user_id,
        |             TUMBLE_ROWTIME(ts, INTERVAL '10' MINUTE) AS rt,
        |             count(*) AS n,
        |             sum(CAST(round(value * 100) AS BIGINT)) AS sv_scaled
        |      FROM f14_events
        |      GROUP BY user_id, TUMBLE(ts, INTERVAL '10' MINUTE))
        |GROUP BY user_id, TUMBLE(rt, INTERVAL '1' HOUR)""".stripMargin))
  }
  private val f14Sql =
    """SELECT user_id,
      |       make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 * 1000000 AS BIGINT)) AS w_start,
      |       count(*) AS n,
      |       CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100 AS sv
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, Q] = Map(
    "f13_flink_group_windows" -> f13,
    "f14_cascading_group_windows" -> f14,
    "f01_math_funcs" -> f01, "f02_string_funcs2" -> f02, "f03_json_extract" -> f03,
    "f04_conditional_funcs" -> f04, "f05_hash_funcs" -> f05, "f06_temporal_funcs" -> f06,
    "f07_bitwise_funcs" -> f07, "f08_udagg_weighted_avg" -> f08,
    "f09_collection_funcs" -> f09, "f10_table_agg" -> f10, "f11_udtf" -> f11,
    "f12_ddl_script" -> f12)
  val oracles: Map[String, String] = Map(
    "f01_math_funcs" -> f01Sql, "f02_string_funcs2" -> f02Sql, "f03_json_extract" -> f03Sql,
    "f04_conditional_funcs" -> f04Sql, "f05_hash_funcs" -> f05Sql, "f06_temporal_funcs" -> f06Sql,
    "f07_bitwise_funcs" -> f07Sql, "f08_udagg_weighted_avg" -> f08Sql,
    "f09_collection_funcs" -> f09Sql, "f10_table_agg" -> f10Sql,
    "f11_udtf" -> f11Sql, "f12_ddl_script" -> f12Sql,
    "f13_flink_group_windows" -> f13Sql,
    "f14_cascading_group_windows" -> f14Sql)
}
