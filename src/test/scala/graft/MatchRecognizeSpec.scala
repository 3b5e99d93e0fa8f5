package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.cep.{MatchRecognize, Pattern}

/** MATCH_RECOGNIZE SQL front door — the parsed clause must plan onto the
  * same Pattern combinators and produce identical matches. */
class MatchRecognizeSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val T0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(min: Long) = new Timestamp(T0.getTime + min * 60000)

  private lazy val events = Seq(
    (1L, at(0), "signup"), (1L, at(10), "click"), (1L, at(20), "click"), (1L, at(30), "purchase"),
    (2L, at(0), "signup"), (2L, at(5), "click"),
    (4L, at(0), "signup"), (4L, at(15), "purchase")
  ).toDF("user_id", "ts", "event_type")

  test("parsed clause matches the hand-built combinator result") {
    val viaSql = MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, C.ts AS c_ts, P.ts AS p_ts
        |  PATTERN (S C P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp)].collect().toSet
    val viaApi = Pattern.begin("S", $"event_type" === "signup")
      .followedBy("C", $"event_type" === "click")
      .followedBy("P", $"event_type" === "purchase")
      .within(3600000L)
      .detect(events, $"user_id", $"ts")
      .as[(Long, Timestamp, Timestamp, Timestamp)].collect().toSet
    assert(viaSql == viaApi && viaSql == Set((1L, at(0), at(10), at(30))))
  }

  test("'?' quantifier, FIRST/LAST on {n}, and undefined-variable-is-TRUE") {
    val m = MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, C.ts AS c_ts, P.ts AS p_ts
        |  PATTERN (S C? P)
        |  WITHIN INTERVAL '60' MINUTE
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(2)))).toSet
    assert(m == Set((1L, Some(at(10))), (4L, None))) // 4 matches with C skipped
    val q = MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(C.ts) AS first_c, LAST(C.ts) AS last_c
        |  PATTERN (S C{2})
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp)].collect().toSet
    assert(q == Set((1L, at(0), at(10), at(20))))
    // ANY-event step: undefined variable defaults to TRUE
    val any = MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, X.ts AS x_ts
        |  PATTERN (S X)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup'
        |)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getTimestamp(2))).toSet
    assert(any == Set((1L, at(10)), (2L, at(5)), (4L, at(15))))
  }

  private lazy val valued = Seq(
    (1L, at(0), "signup", 0.0), (1L, at(10), "click", 2.5), (1L, at(20), "click", 4.0),
    (1L, at(30), "purchase", 9.0),
    (2L, at(0), "signup", 0.0), (2L, at(5), "click", 1.0)
  ).toDF("user_id", "ts", "event_type", "value")

  test("value measures: SUM/COUNT/FIRST/LAST over bound columns") {
    val m = MatchRecognize.detect(valued,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, SUM(C.value) AS spend, COUNT(C.ts) AS n_c,
        |           FIRST(C.value) AS first_v, LAST(C.value) AS last_v,
        |           P.value AS p_value
        |  PATTERN (S C{2} P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Double, Long, Double, Double, Double)].collect().toSet
    assert(m == Set((1L, at(0), 6.5, 2L, 2.5, 4.0, 9.0)))
  }

  test("AFTER MATCH SKIP PAST LAST ROW lowers to the greedy non-overlap selection") {
    // s@0 c@10, s@20 s@25 c@30, c@40: NO_SKIP emits 3 matches; skip keeps
    // (0,10) and (20,30) — the start at 25 lies inside the second kept match
    val ev5 = Seq(
      (5L, at(0), "signup"), (5L, at(10), "click"),
      (5L, at(20), "signup"), (5L, at(25), "signup"), (5L, at(30), "click"),
      (5L, at(40), "click")
    ).toDF("user_id", "ts", "event_type")
    def sql(skip: String) =
      s"""MATCH_RECOGNIZE (
         |  PARTITION BY user_id ORDER BY ts
         |  MEASURES S.ts AS s_ts, C.ts AS c_ts
         |  $skip
         |  PATTERN (S C)
         |  WITHIN INTERVAL '1' HOUR
         |  DEFINE S AS event_type = 'signup', C AS event_type = 'click'
         |)""".stripMargin
    val all = MatchRecognize.detect(ev5, sql("AFTER MATCH SKIP TO NEXT ROW"))
      .as[(Long, Timestamp, Timestamp)].collect().toSet
    assert(all.size == 3, "SKIP TO NEXT ROW = this compilation's default NO_SKIP")
    val kept = MatchRecognize.detect(ev5, sql("AFTER MATCH SKIP PAST LAST ROW"))
      .as[(Long, Timestamp, Timestamp)].collect().toSet
    assert(kept == Set((5L, at(0), at(10)), (5L, at(20), at(30))))
  }

  test("{n,m} range quantifier: greedy consumption, LAST/COUNT over the nullable tail") {
    // user 1: two clicks bind; user 4: zero clicks — no match for B{1,2}
    val m = MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(C.ts) AS first_c, LAST(C.ts) AS last_c,
        |           COUNT(C.ts) AS n_c
        |  PATTERN (S C{1,2})
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long)].collect().toSet
    // user 1 consumes both clicks greedily; user 2 has exactly one
    assert(m == Set((1L, at(0), at(10), at(20), 2L), (2L, at(0), at(5), at(5), 1L)))
  }

  test("(B|C) alternation group binds either branch and measures the classifier") {
    val ev = Seq(
      (8L, at(0), "signup"), (8L, at(5), "view"), (8L, at(10), "click"), (8L, at(20), "purchase"),
      (9L, at(0), "signup"), (9L, at(7), "click"), (9L, at(15), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val m = MatchRecognize.detect(ev,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, C_V.ts AS x_ts, C_V.cls AS x_cls, P.ts AS p_ts
        |  PATTERN (S (C|V) P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         V AS event_type = 'view', P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, String, Timestamp)].collect().toSet
    assert(m == Set((8L, at(0), at(5), "V", at(20)), (9L, at(0), at(7), "C", at(15))))
  }

  test("within() honors sub-second windows exactly (millisecond intervals)") {
    val evMs = Seq(
      (1L, new Timestamp(T0.getTime), "a"), (1L, new Timestamp(T0.getTime + 1400), "b"),
      (2L, new Timestamp(T0.getTime), "a"), (2L, new Timestamp(T0.getTime + 1600), "b")
    ).toDF("user_id", "ts", "event_type")
    val m = Pattern.begin("a", $"event_type" === "a")
      .followedBy("b", $"event_type" === "b")
      .within(1500L) // would be silently truncated to 1s by integer division
      .detect(evMs, $"user_id", $"ts")
      .collect().map(_.getAs[Long]("key")).toSet
    assert(m == Set(1L), "1400ms gap is inside a 1500ms window; 1600ms is not")
  }

  private lazy val relEvents = Seq(
    (1L, at(0), "signup", 10.0), (1L, at(5), "purchase", 15.0), // 15 < 2*10: no
    (1L, at(9), "purchase", 25.0),                              // 25 > 20: binds
    (2L, at(0), "signup", 50.0), (2L, at(3), "purchase", 60.0)  // 60 < 100: no
  ).toDF("user_id", "ts", "event_type", "value")

  test("relative DEFINE (P.value > 2 * S.value) lowers to followedByIterative") {
    val viaSql = MatchRecognize.detect(relEvents,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, S.value AS s_value, P.ts AS p_ts, P.value AS p_value
        |  PATTERN (S P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS S.event_type = 'signup',
        |         P AS P.event_type = 'purchase' AND P.value > 2 * S.value
        |)""".stripMargin)
      .as[(Long, Timestamp, Double, Timestamp, Double)].collect().toSet
    val viaApi = Pattern.begin("S", $"event_type" === "signup").bind("value")
      .followedByIterative("P", $"event_type" === "purchase",
        Pattern.ev("value") > Pattern.bound("S", "value") * 2)
      .bind("value")
      .within(3600000L)
      .detect(relEvents, $"user_id", $"ts")
      .select($"key", $"S_ts", $"S_value", $"P_ts", $"P_value")
      .as[(Long, Timestamp, Double, Timestamp, Double)].collect().toSet
    assert(viaSql == viaApi && viaSql == Set((1L, at(0), 10.0, at(9), 25.0)))
  }

  test("relative DEFINE referencing the ORDER BY column maps to the binding timestamp") {
    // "a purchase more than 6 minutes after the signup": ts is the order
    // column, so S.ts rewrites to the S binding's timestamp, not a bind()
    val m = MatchRecognize.detect(relEvents,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, P.ts AS p_ts
        |  PATTERN (S P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS S.event_type = 'signup',
        |         P AS P.event_type = 'purchase' AND P.ts > S.ts + INTERVAL 6 MINUTES
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp)].collect().toSet
    assert(m == Set((1L, at(0), at(9))))
  }

  test("named errors: later-var reference, quantified-var reference, zero bounds") {
    def detect(define: String, pattern: String = "(S P)") =
      MatchRecognize.detect(relEvents,
        s"""MATCH_RECOGNIZE (
           |  PARTITION BY user_id ORDER BY ts
           |  MEASURES S.ts AS s_ts
           |  PATTERN $pattern
           |  WITHIN INTERVAL '1' HOUR
           |  DEFINE $define
           |)""".stripMargin)
    val fwd = intercept[IllegalArgumentException](
      detect("S AS S.value > P.value, P AS event_type = 'purchase'"))
    assert(fwd.getMessage.contains("not bound earlier"))
    val quant = intercept[IllegalArgumentException](
      detect("P AS P.value > S.value", "(S{2} P)"))
    assert(quant.getMessage.contains("plain, unquantified"))
    val zero = intercept[IllegalArgumentException](
      detect("S AS event_type = 'signup'", "(S P{0,2})"))
    assert(zero.getMessage.contains("zero"))
  }

  test("{n,n} degenerate range lowers to times(n), not a timesRange crash") {
    val ev2 = Seq(
      (1L, at(0), "signup"), (1L, at(5), "click"), (1L, at(8), "click"), (1L, at(12), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val m = MatchRecognize.detect(ev2,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, LAST(C.ts) AS last_c, P.ts AS p_ts
        |  PATTERN (S C{2,2} P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp)].collect().toSet
    assert(m == Set((1L, at(0), at(8), at(12))))
  }

  test("'+' quantifier: greedy run with FIRST/LAST/COUNT measures") {
    val m = MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(C.ts) AS first_c, LAST(C.ts) AS last_c,
        |           COUNT(C.ts) AS n_c, P.ts AS p_ts
        |  PATTERN (S C+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Timestamp)].collect().toSet
    // user 1: both clicks precede the purchase; users 2/4 lack click or purchase
    assert(m == Set((1L, at(0), at(10), at(20), 2L, at(30))))
  }

  test("'{n,}' quantifier: n-or-more greedy run (timesOrMore) — short runs " +
       "do not match; measures aggregate over the whole run") {
    def q(n: Int) = MatchRecognize.detect(events,
      s"""MATCH_RECOGNIZE (
         |  PARTITION BY user_id ORDER BY ts
         |  MEASURES S.ts AS s_ts, FIRST(C.ts) AS first_c, LAST(C.ts) AS last_c,
         |           COUNT(C.ts) AS n_c, P.ts AS p_ts
         |  PATTERN (S C{$n,} P)
         |  WITHIN INTERVAL '1' HOUR
         |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
         |         P AS event_type = 'purchase'
         |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Timestamp)].collect().toSet
    // user 1 has a 2-click run: {2,} matches it, {3,} matches nothing
    assert(q(2) == Set((1L, at(0), at(10), at(20), 2L, at(30))))
    assert(q(3) == Set.empty)
    // {1,} behaves exactly like '+'
    assert(q(1) == Set((1L, at(0), at(10), at(20), 2L, at(30))))
  }

  test("'*' quantifier: the run may be empty (user with no clicks still matches)") {
    val m = MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, COUNT(C.ts) AS n_c, P.ts AS p_ts
        |  PATTERN (S C* P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Long, Timestamp)].collect().toSet
    // user 4 (signup then purchase, no clicks) matches with an empty run
    assert(m == Set((1L, at(0), 2L, at(30)), (4L, at(0), 0L, at(15))))
  }

  test("ALL ROWS PER MATCH explodes per bound event with running measures") {
    val m = MatchRecognize.detect(valued,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, SUM(C.value) AS spend, COUNT(C.ts) AS n_c
        |  ALL ROWS PER MATCH
        |  PATTERN (S C{2} P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, String, Timestamp, Timestamp, Option[Double], Long)].collect().toSet
    // one row per event; spend runs null -> 2.5 -> 6.5 -> 6.5, n_c 0,1,2,2
    assert(m == Set(
      (1L, "S", at(0), at(0), None, 0L),
      (1L, "C", at(10), at(0), Some(2.5), 1L),
      (1L, "C", at(20), at(0), Some(6.5), 2L),
      (1L, "P", at(30), at(0), Some(6.5), 2L)))
    // skipped optional steps emit no row
    val opt = MatchRecognize.detect(valued,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts
        |  ALL ROWS PER MATCH
        |  PATTERN (S P? C)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase',
        |         C AS event_type = 'click'
        |)""".stripMargin)
      .as[(Long, String, Timestamp, Timestamp)].collect().toSet
    // user 1's P binds (purchase@30) and no click follows it -> no match;
    // user 2 has no purchase, P is skipped and emits NO row
    assert(opt == Set((2L, "S", at(0), at(0)), (2L, "C", at(5), at(0))))
    // TWO runs expand too (r10): each run's members from its own span,
    // cross-run counts final-after / zero-before
    val two = MatchRecognize.detect(valued,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, COUNT(C.ts) AS n_c, COUNT(P.ts) AS n_p
        |  ALL ROWS PER MATCH
        |  PATTERN (S C+ P+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, String, Timestamp, Timestamp, Long, Long)].collect().toSet
    assert(two == Set(
      (1L, "S", at(0), at(0), 0L, 0L),
      (1L, "C", at(10), at(0), 1L, 0L),
      (1L, "C", at(20), at(0), 2L, 0L),
      (1L, "P", at(30), at(0), 2L, 1L)), two.toString)
  }

  test("run value measures: SUM/MIN/MAX/FIRST/LAST of a bound column over '+'") {
    val m = MatchRecognize.detect(valued,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, SUM(C.value) AS spend, MIN(C.value) AS lo,
        |           MAX(C.value) AS hi, FIRST(C.value) AS first_v,
        |           LAST(C.value) AS last_v, COUNT(C.value) AS n_c, P.ts AS p_ts
        |  PATTERN (S C+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Double, Double, Double, Double, Double, Long, Timestamp)]
      .collect().toSet
    // user 1's run = clicks at 10 (2.5) and 20 (4.0)
    assert(m == Set((1L, at(0), 6.5, 2.5, 4.0, 2.5, 4.0, 2L, at(30))))
    // a '*' with no members yields nulls / count 0 for the value measures
    val empty = MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, COUNT(C.ts) AS n_c, LAST(C.ts) AS last_c,
        |           P.ts AS p_ts
        |  PATTERN (S C* P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Long, Option[Timestamp], Timestamp)].collect().toSet
    assert(empty == Set((1L, at(0), 2L, Some(at(20)), at(30)),
      (4L, at(0), 0L, None, at(15))))
  }

  test("self-referential run (V-shape): D.value < LAST(D.value, 1)") {
    // descending click run 9 > 7 > 4, then 8 breaks the chain; the purchase
    // binds after the run's LAST member
    val vshape = Seq(
      (1L, at(0), "signup", 0.0), (1L, at(5), "click", 9.0), (1L, at(10), "click", 7.0),
      (1L, at(15), "click", 4.0), (1L, at(20), "click", 8.0), (1L, at(25), "purchase", 1.0),
      (2L, at(0), "signup", 0.0), (2L, at(5), "click", 3.0), (2L, at(10), "purchase", 1.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val m = MatchRecognize.detect(vshape,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(D.ts) AS d1, LAST(D.ts) AS dn,
        |           COUNT(D.ts) AS n_d, FIRST(D.value) AS v1,
        |           LAST(D.value) AS vn, U.ts AS u_ts
        |  PATTERN (S D+ U)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup',
        |         D AS D.value < LAST(D.value, 1) AND D.event_type = 'click',
        |         U AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Double, Double, Timestamp)]
      .collect().toSet
    // user 1: run = 9,7,4 (the 8 at :20 starts a NEW segment — excluded),
    // purchase at :25 binds after the run end at :15;
    // user 2: single-member run (first occurrence needs no predecessor)
    assert(m == Set(
      (1L, at(0), at(5), at(15), 3L, 9.0, 4.0, at(25)),
      (2L, at(0), at(5), at(5), 1L, 3.0, 3.0, at(10))))
    // self-reference without '+' is a named error
    val ex = intercept[IllegalArgumentException](MatchRecognize.detect(vshape,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts
        |  PATTERN (S D)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup',
        |         D AS D.value < LAST(D.value, 1)
        |)""".stripMargin))
    assert(ex.getMessage.contains("requires the '+' quantifier"))
  }

  test("composite PARTITION BY keys: matches stay within (region, user_id)") {
    // same user_id in two regions: a cross-region signup->purchase pair must
    // NOT match; each (region, user) partition matches independently
    val multi = Seq(
      ("eu", 1L, at(0), "signup"), ("eu", 1L, at(10), "purchase"),
      ("us", 1L, at(5), "signup"), // us/1 has no purchase: no match
      ("us", 2L, at(0), "signup"), ("us", 2L, at(8), "purchase")
    ).toDF("region", "user_id", "ts", "event_type")
    val m = MatchRecognize.detect(multi,
      """MATCH_RECOGNIZE (
        |  PARTITION BY region, user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS s_ts, P.ts AS p_ts
        |  PATTERN (S P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(String, Long, Timestamp, Timestamp)].collect().toSet
    assert(m == Set(("eu", 1L, at(0), at(10)), ("us", 2L, at(0), at(8))))
  }

  test("sequence group (B C)+ in PATTERN text lowers onto followedByGroup") {
    val evs = Seq(
      (1L, at(0), "signup"), (1L, at(5), "b"), (1L, at(10), "c"),
      (1L, at(15), "b"), (1L, at(20), "c"), (1L, at(25), "purchase"),
      (2L, at(0), "signup"), (2L, at(5), "b"), (2L, at(10), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(B.ts) AS g1, LAST(C.ts) AS gn,
        |           COUNT(B.ts) AS n_reps, U.ts AS u_ts
        |  PATTERN (S (B C)+ U)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'b',
        |         C AS event_type = 'c', U AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Timestamp)].collect().toSet
    // user 2's repetition never completes: no match
    assert(m == Set((1L, at(0), at(5), at(20), 2L, at(25))), m.toString)
    // measures that the chain does not materialize are named errors
    val ex = intercept[IllegalArgumentException](MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES FIRST(C.ts) AS bad
        |  PATTERN (S (B C)+ U)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'b',
        |         C AS event_type = 'c', U AS event_type = 'purchase'
        |)""".stripMargin).collect())
    assert(ex.getMessage.contains("FIRST sub-step only"), ex.getMessage)
    // a bare sequence group (no quantifier) is the SINGLE repetition
    // since r15 (formerly a named error; also the reluctant '+?' target)
    val bare = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(B.ts) AS fb, LAST(C.ts) AS lc,
        |           COUNT(C.ts) AS n, U.ts AS u_ts
        |  PATTERN (S (B C) U)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'b',
        |         C AS event_type = 'c', U AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Timestamp)].collect().toSet
    assert(bare == Set((1L, at(0), at(5), at(10), 1L, at(25))), bare.toString)
    // interior whitespace in the group is cosmetic: ( B C )+ == (B C)+
    val spaced = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(B.ts) AS g1, LAST(C.ts) AS gn,
        |           COUNT(B.ts) AS n_reps, U.ts AS u_ts
        |  PATTERN (S ( B C )+ U)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'b',
        |         C AS event_type = 'c', U AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Timestamp)].collect().toSet
    assert(spaced == m, spaced.toString)
  }

  test("PATTERN residue the parser cannot bind is a named error, never dropped") {
    val evs = Seq((1L, at(0), "signup")).toDF("user_id", "ts", "event_type")
    def err(pattern: String): String =
      intercept[IllegalArgumentException](MatchRecognize.detect(evs,
        s"""MATCH_RECOGNIZE (
           |  PARTITION BY user_id ORDER BY ts
           |  MEASURES S.ts AS s_ts
           |  PATTERN ($pattern)
           |  WITHIN INTERVAL '1' HOUR
           |  DEFINE S AS event_type = 'signup'
           |)""".stripMargin).collect()).getMessage
    // a mixed alternation/sequence group matches neither group shape: the
    // old parser silently degraded it to bare variables
    assert(err("S (B|C D) U").contains("unsupported PATTERN syntax"))
    // stray punctuation between elements
    assert(err("S , U").contains("unsupported PATTERN syntax"))
  }

  test("PREV() is the SQL-standard alias of LAST(..., 1): all spellings agree") {
    val vshape = Seq(
      (1L, at(0), "signup", 0.0), (1L, at(5), "click", 9.0), (1L, at(10), "click", 7.0),
      (1L, at(15), "click", 4.0), (1L, at(20), "click", 8.0), (1L, at(25), "purchase", 1.0),
      (2L, at(0), "signup", 0.0), (2L, at(5), "click", 3.0), (2L, at(10), "purchase", 1.0)
    ).toDF("user_id", "ts", "event_type", "value")
    def query(define: String) = MatchRecognize.detect(vshape,
      s"""MATCH_RECOGNIZE (
         |  PARTITION BY user_id ORDER BY ts
         |  MEASURES S.ts AS s_ts, FIRST(D.ts) AS d1, LAST(D.ts) AS dn,
         |           COUNT(D.ts) AS n_d, U.ts AS u_ts
         |  PATTERN (S D+ U)
         |  WITHIN INTERVAL '1' HOUR
         |  DEFINE S AS event_type = 'signup',
         |         D AS $define,
         |         U AS event_type = 'purchase'
         |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Timestamp)].collect().toSet
    val viaLast = query("D.value < LAST(D.value, 1) AND D.event_type = 'click'")
    // qualified PREV, and the canonical fully-bare ITCase spelling
    val viaPrevQual = query("D.value < PREV(D.value) AND D.event_type = 'click'")
    val viaPrevBare = query("value < PREV(value) AND D.event_type = 'click'")
    assert(viaLast == viaPrevQual && viaLast == viaPrevBare && viaLast == Set(
      (1L, at(0), at(5), at(15), 3L, at(25)),
      (2L, at(0), at(5), at(5), 1L, at(10))),
      s"last=$viaLast qual=$viaPrevQual bare=$viaPrevBare")
    // self offsets n > 1 are supported (see the PREV(col, 2) spec); a
    // FOREIGN physical PREV inside a '+' run's DEFINE cannot be re-checked
    // per member — named error (plain variables take the __plag lowering,
    // see the foreign-PREV spec)
    val ex = intercept[IllegalArgumentException](
      query("D.value < PREV(S.value, 2) AND D.event_type = 'click'"))
    assert(ex.getMessage.contains("run member"), ex.getMessage)
    // reversed operands are the same condition and must agree
    val viaRevBare = query("PREV(value) > value AND D.event_type = 'click'")
    val viaRevQual = query("PREV(D.value) > D.value AND D.event_type = 'click'")
    assert(viaRevBare == viaLast && viaRevQual == viaLast,
      s"revBare=$viaRevBare revQual=$viaRevQual")
    // self-comparisons outside <,<=,>,>= cannot become a run condition:
    // named error, not an aggregate-in-filter AnalysisException
    val exEq = intercept[IllegalArgumentException](
      query("value = PREV(value) AND D.event_type = 'click'"))
    assert(exEq.getMessage.contains("PREV(value)"), exEq.getMessage)
  }

  test("LAST(...,1) inside a larger conjunct is a named error, not a miscompile") {
    val vshape = Seq(
      (1L, at(0), "signup", 0.0), (1L, at(5), "click", 9.0), (1L, at(10), "purchase", 1.0)
    ).toDF("user_id", "ts", "event_type", "value")
    // an OR tail shares the comparison's top-AND conjunct: compiling only the
    // extracted comparison would silently drop the `OR ...` branch
    val exOr = intercept[IllegalArgumentException](MatchRecognize.detect(vshape,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts
        |  PATTERN (S D+ U)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup',
        |         D AS D.value < LAST(D.value, 1) OR D.value > 100,
        |         U AS event_type = 'purchase'
        |)""".stripMargin))
    assert(exOr.getMessage.contains("consist solely"), exOr.getMessage)
    // trailing arithmetic around LAST(...,1) would likewise be dropped
    val exArith = intercept[IllegalArgumentException](MatchRecognize.detect(vshape,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts
        |  PATTERN (S D+ U)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup',
        |         D AS D.value < LAST(D.value, 1) + 5 AND D.event_type = 'click',
        |         U AS event_type = 'purchase'
        |)""".stripMargin))
    assert(exArith.getMessage.contains("consist solely"), exArith.getMessage)
  }

  test("SKIP PAST LAST ROW: colliding composite-key renderings stay distinct partitions") {
    // ("a,b","c") and ("a","b,c") both render "[a,b,c]" via Row.toString — a
    // collision-prone per-key grouping would merge them and the greedy
    // selection would suppress the second partition's time-overlapping match
    val multi = Seq(
      ("a,b", "c", at(0), "signup"), ("a,b", "c", at(10), "purchase"),
      ("a", "b,c", at(5), "signup"), ("a", "b,c", at(8), "purchase")
    ).toDF("g1", "g2", "ts", "event_type")
    val m = MatchRecognize.detect(multi,
      """MATCH_RECOGNIZE (
        |  PARTITION BY g1, g2
        |  ORDER BY ts
        |  MEASURES S.ts AS s_ts, P.ts AS p_ts
        |  PATTERN (S P)
        |  WITHIN INTERVAL '1' HOUR
        |  AFTER MATCH SKIP PAST LAST ROW
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(String, String, Timestamp, Timestamp)].collect().toSet
    assert(m == Set(("a,b", "c", at(0), at(10)), ("a", "b,c", at(5), at(8))), m.toString)
  }

  test("MATCH_NUMBER() numbers a partition's matches; constant per match under ALL ROWS") {
    // two matches for user 1 (both signups chain to the purchase), ordered
    // by binding timestamps
    val multi = Seq(
      (1L, at(0), "signup"), (1L, at(5), "signup"), (1L, at(10), "purchase"),
      (2L, at(0), "signup"), (2L, at(7), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val m = MatchRecognize.detect(multi,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES MATCH_NUMBER() AS mn, S.ts AS s_ts, P.ts AS p_ts
        |  PATTERN (S P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Long, Timestamp, Timestamp)].collect().toSet
    assert(m == Set((1L, 1L, at(0), at(10)), (1L, 2L, at(5), at(10)),
      (2L, 1L, at(0), at(7))))
    // ALL ROWS: every exploded row of a match carries the match's ordinal
    // (SQL 2016 — MATCH_NUMBER() is constant within a match)
    val ar = MatchRecognize.detect(multi,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES MATCH_NUMBER() AS mn, S.ts AS s_ts
        |  ALL ROWS PER MATCH
        |  PATTERN (S P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)""".stripMargin)
      .select("user_id", "mn", "cls", "ts")
      .as[(Long, Long, String, Timestamp)].collect().toSet
    assert(ar == Set(
      (1L, 1L, "S", at(0)), (1L, 1L, "P", at(10)),
      (1L, 2L, "S", at(5)), (1L, 2L, "P", at(10)),
      (2L, 1L, "S", at(0)), (2L, 1L, "P", at(7))), ar.toString)
  }

  test("CLASSIFIER(): per-row variable under ALL ROWS, final element under ONE ROW") {
    val evs = Seq(
      (1L, at(0), "signup"), (1L, at(5), "view"), (1L, at(10), "purchase"),
      (2L, at(0), "signup"), (2L, at(5), "refund"), (2L, at(10), "purchase")
    ).toDF("user_id", "ts", "event_type")
    // ONE ROW: the final element is P for every match -> constant "P"
    val one = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, CLASSIFIER() AS who
        |  PATTERN (S P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, String)].collect().toSet
    assert(one == Set((1L, at(0), "P"), (2L, at(0), "P")), one.toString)
    // ONE ROW with an alternation-final pattern: the matched BRANCH
    val alt = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, CLASSIFIER() AS who
        |  PATTERN (S (V|R))
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', V AS event_type = 'view',
        |         R AS event_type = 'refund'
        |)""".stripMargin)
      .as[(Long, Timestamp, String)].collect().toSet
    assert(alt == Set((1L, at(0), "V"), (2L, at(0), "R")), alt.toString)
    // ALL ROWS: CLASSIFIER() is this row's own variable (== cls)
    val all = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES CLASSIFIER() AS who
        |  ALL ROWS PER MATCH
        |  PATTERN (S P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)""".stripMargin)
    assert(all.where("who <> cls").count() == 0 && all.count() == 4)
    // an optional final element makes the last row data-dependent: named error
    val ex = intercept[IllegalArgumentException](MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES CLASSIFIER() AS who
        |  PATTERN (S P?)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)""".stripMargin).collect())
    assert(ex.getMessage.contains("CLASSIFIER"), ex.getMessage)
  }

  test("value measures over a '{n,m}' range: SUM/LAST coalesce the nullable tail") {
    val m = MatchRecognize.detect(relEvents,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, LAST(P.value) AS last_v, SUM(P.value) AS sum_v,
        |           COUNT(P.value) AS n_p
        |  PATTERN (S P{1,2})
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Double, Double, Long)].collect().toSet
    // user 1 binds both purchases (15, 25); user 2 only one (60) — the
    // unbound tail expansion contributes null, coalesced away
    assert(m == Set((1L, at(0), 25.0, 40.0, 2L), (2L, at(0), 60.0, 60.0, 1L)))
  }

  test("PREV(col, 2): run members compare against the member two back") {
    // values 10, 9, 12, 11, 8 — first two free, 12 !< 10 restarts the run,
    // giving segments [10, 9] and [12, 11, 8]; the anchor binds the first
    val evs = Seq(
      (1L, at(0), "signup", 0.0), (1L, at(5), "click", 10.0),
      (1L, at(10), "click", 9.0), (1L, at(15), "click", 12.0),
      (1L, at(20), "click", 11.0), (1L, at(25), "click", 8.0),
      (1L, at(30), "purchase", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    def run(define: String) = MatchRecognize.detect(evs,
      s"""MATCH_RECOGNIZE (
         |  PARTITION BY user_id ORDER BY ts
         |  MEASURES FIRST(D.ts) AS d1, LAST(D.ts) AS dl, COUNT(D.ts) AS n,
         |           FIRST(D.value) AS v1, LAST(D.value) AS vl, U.ts AS u_ts
         |  PATTERN (S D+ U)
         |  WITHIN INTERVAL '1' HOUR
         |  DEFINE S AS event_type = 'signup',
         |         D AS $define,
         |         U AS event_type = 'purchase'
         |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Long, Double, Double, Timestamp)]
      .collect().toSet
    val want = Set((1L, at(5), at(10), 2L, 10.0, 9.0, at(30)))
    // all spellings: PREV with offset, reversed operands, explicit LAST
    val a = run("value < PREV(value, 2) AND D.event_type = 'click'")
    val b = run("PREV(value, 2) > value AND D.event_type = 'click'")
    val c = run("D.value < LAST(D.value, 2) AND D.event_type = 'click'")
    assert(a == want, a.toString)
    assert(b == a && c == a, s"b=$b c=$c")
  }

  test("ALL ROWS PER MATCH expands a '+' run's members with running measures") {
    val evs = Seq(
      (1L, at(0), "signup", 0.0), (1L, at(5), "click", 10.0),
      (1L, at(10), "click", 20.0), (1L, at(15), "purchase", 0.0),
      // user 2: no click — no match, no rows
      (2L, at(0), "signup", 0.0), (2L, at(15), "purchase", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, COUNT(D.ts) AS n_d, SUM(D.value) AS sum_d,
        |           LAST(D.value) AS last_d
        |  ALL ROWS PER MATCH
        |  PATTERN (S D+ U)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', D AS event_type = 'click',
        |         U AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, String, Timestamp, Timestamp, Long, Option[Double], Option[Double])]
      .collect().toSet
    assert(m == Set(
      (1L, "S", at(0), at(0), 0L, None, None),
      (1L, "D", at(5), at(0), 1L, Some(10.0), Some(10.0)),
      (1L, "D", at(10), at(0), 2L, Some(30.0), Some(20.0)),
      (1L, "U", at(15), at(0), 2L, Some(30.0), Some(20.0))), m.toString)
  }

  test("ALL ROWS PER MATCH expands a sequence group's repetitions per member") {
    val evs = Seq(
      (1L, at(0), "signup", 0.0), (1L, at(5), "click", 10.0),
      (1L, at(10), "view", 1.0), (1L, at(15), "click", 20.0),
      (1L, at(20), "view", 2.0), (1L, at(25), "purchase", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, COUNT(C.ts) AS n_c, LAST(V.ts) AS last_v,
        |           SUM(C.value) AS sum_c
        |  ALL ROWS PER MATCH
        |  PATTERN (S (C V)+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         V AS event_type = 'view', P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, String, Timestamp, Timestamp, Long, Option[Timestamp], Option[Double])]
      .collect().toSet
    assert(m == Set(
      (1L, "S", at(0), at(0), 0L, None, None),
      (1L, "C", at(5), at(0), 1L, None, Some(10.0)),
      (1L, "V", at(10), at(0), 1L, Some(at(10)), Some(10.0)),
      (1L, "C", at(15), at(0), 2L, Some(at(10)), Some(30.0)),
      (1L, "V", at(20), at(0), 2L, Some(at(20)), Some(30.0)),
      (1L, "P", at(25), at(0), 2L, Some(at(20)), Some(30.0))), m.toString)
  }

  test("ORDER BY tiebreak steers a run's FIRST/LAST member values") {
    // two equal-ts members: without the tiebreak FIRST(D.value) would be
    // the value-min (1.0); ORDER BY ts, seq reads seq 10's value (5.0)
    val evs = Seq(
      (1L, at(0), 1L, "signup", 0.0),
      (1L, at(10), 10L, "click", 5.0), (1L, at(10), 20L, "click", 1.0),
      (1L, at(15), 30L, "click", 7.0),
      (1L, at(20), 40L, "purchase", 0.0)
    ).toDF("user_id", "ts", "seq", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, seq
        |  MEASURES FIRST(D.value) AS f, LAST(D.value) AS l, COUNT(D.ts) AS n
        |  PATTERN (S D+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', D AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Double, Double, Long)].collect().toSet
    assert(m == Set((1L, 5.0, 7.0, 3L)), m.toString)
  }

  test("ORDER BY tiebreak steers a group member's bound value") {
    // two clicks at the bound ts: the (seq, value)-argmin (seq 10 -> 8.0)
    // must bind, not the plain value-min (2.0)
    val evs = Seq(
      (1L, at(0), 1L, "signup", 0.0),
      (1L, at(5), 10L, "click", 8.0), (1L, at(5), 20L, "click", 2.0),
      (1L, at(10), 30L, "view", 1.0),
      (1L, at(15), 40L, "purchase", 0.0)
    ).toDF("user_id", "ts", "seq", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, seq
        |  MEASURES FIRST(C.value) AS fc, COUNT(C.ts) AS n_reps
        |  PATTERN (S (C V)+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         V AS event_type = 'view', P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Double, Long)].collect().toSet
    assert(m == Set((1L, 8.0, 1L)), m.toString)
  }

  test("foreign-variable PREV(C.value, 2) navigates the physical partition") {
    // partition order: view(0) view(2) signup(4) click(6) purchase(8,10);
    // PREV(C.value, 2) at the bound click = the view at minute 2 (3.0)
    val evs = Seq(
      (1L, at(0), 1L, "view", 7.0), (1L, at(2), 2L, "view", 3.0),
      (1L, at(4), 3L, "signup", 0.0), (1L, at(6), 4L, "click", 10.0),
      (1L, at(8), 5L, "purchase", 5.0), (1L, at(10), 6L, "purchase", 4.0)
    ).toDF("user_id", "ts", "seq", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, seq
        |  MEASURES S.ts AS s_ts, C.ts AS c_ts, P.ts AS p_ts, P.value AS p_value
        |  PATTERN (S C P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase' AND P.value > PREV(C.value, 2)
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Double)].collect().toSet
    // purchase@8 (5.0 > 3.0) binds; had PREV resolved to the signup (0.0)
    // or click itself, the result would be unchanged here — so also check
    // the negative: against PREV offset 1 (= signup 0.0) both purchases
    // pass and the binding stays @8; against offset 4 (null) nothing binds
    assert(m == Set((1L, at(4), at(6), at(8), 5.0)), m.toString)
    val none = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, seq
        |  MEASURES S.ts AS s_ts, P.ts AS p_ts
        |  PATTERN (S C P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase' AND P.value > PREV(C.value, 4)
        |)""".stripMargin).count()
    assert(none == 0, "a PREV offset past the partition start is null -> no match")
  }

  test("plain-variable self PREV(value, 2) is a pushed pre-filter") {
    // clicks: @5 (2-back null), @10 (2-back signup 0.0 -> 3 > 0 binds)
    val evs = Seq(
      (1L, at(0), 1L, "signup", 0.0), (1L, at(5), 2L, "click", 10.0),
      (1L, at(10), 3L, "click", 3.0), (1L, at(15), 4L, "click", 12.0),
      (1L, at(20), 5L, "purchase", 0.0)
    ).toDF("user_id", "ts", "seq", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, seq
        |  MEASURES C.ts AS c_ts, C.value AS c_value, P.ts AS p_ts
        |  PATTERN (S C P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup',
        |         C AS event_type = 'click' AND C.value > PREV(C.value, 2),
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Double, Timestamp)].collect().toSet
    assert(m == Set((1L, at(10), 3.0, at(20))), m.toString)
  }

  test("named errors: tiebreak on alternations/self-runs, ALL ROWS group combos") {
    val evs = Seq((1L, at(0), 1L, "signup", 0.0))
      .toDF("user_id", "ts", "seq", "event_type", "value")
    // PLAIN alternation + tiebreak is SUPPORTED since r18 (the ties lead
    // the binding payload ahead of the classifier) — the former named
    // rejection must no longer fire; steering is pinned in CepPatternSpec
    MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, seq
        |  MEASURES S.ts AS s_ts
        |  PATTERN (S (B|C) P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', P AS event_type = 'purchase'
        |)""".stripMargin).collect()
    // QUANTIFIED alternations keep the rejection, now carrying the
    // impossibility argument (the classifier feeds per-branch counts)
    val e1 = intercept[Exception](MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, seq
        |  MEASURES S.ts AS s_ts
        |  PATTERN (S (B|C)+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', P AS event_type = 'purchase'
        |)""".stripMargin))
    assert(e1.getMessage.contains("quantified alternation") &&
      e1.getMessage.contains("branch counts"), e1.getMessage)
    // nested group with an inner '*': SUPPORTED since r15 (tail-only
    // repetitions) — the former named rejection must no longer fire;
    // behavior is pinned by the dedicated inner-'*' tests
    MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts
        |  PATTERN (S ((B C)* D)+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', D AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin).collect()
    // depth-2 nesting (((B C)+ D)+ E)+ is SUPPORTED since r16 — the former
    // named rejection must no longer fire; behavior is pinned by the
    // dedicated depth-2 tests. Depth-3 is the new named rejection.
    MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts
        |  PATTERN (S (((B C)+ D)+ E)+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', D AS event_type = 'click',
        |         E AS event_type = 'view', P AS event_type = 'purchase'
        |)""".stripMargin).collect()
    // depth-3 nesting ((((B C)+ D)+ E)+ F)+ is SUPPORTED since r17 — the
    // former named rejection must no longer fire; behavior is pinned by
    // the dedicated depth-3 tests. Depth-4 is the new named rejection.
    MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts
        |  PATTERN (S ((((B C)+ D)+ E)+ F)+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', D AS event_type = 'click',
        |         E AS event_type = 'view', F AS event_type = 'error',
        |         P AS event_type = 'purchase'
        |)""".stripMargin).collect()
    // depth-4 nesting (((((B C)+ D)+ E)+ F)+ G)+ is SUPPORTED since r18
    // (the depth-parametric walk); depth 5 and 6 through the SQL door
    // are SUPPORTED since r20 (the recursive group parse) — the former
    // named rejections must no longer fire; deep behavior is pinned by
    // the dedicated depth-4/5 tests.
    MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts
        |  PATTERN (S (((((B C)+ D)+ E)+ F)+ G)+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', D AS event_type = 'click',
        |         E AS event_type = 'view', F AS event_type = 'error',
        |         G AS event_type = 'error', P AS event_type = 'purchase'
        |)""".stripMargin).collect()
    MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts
        |  PATTERN (S ((((((B C)+ D)+ E)+ F)+ G)+ H)+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', D AS event_type = 'click',
        |         E AS event_type = 'view', F AS event_type = 'error',
        |         G AS event_type = 'error', H AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin).collect()
    // past the body regex's twelve balanced paren levels (nested depth
    // 12+) the rejection names the depth-parametric Scala API
    val deepBody = (1 to 12).foldLeft("(B C)")((acc, i) => s"($acc+ V$i)") + "+"
    val e3 = intercept[Exception](MatchRecognize.detect(evs,
      s"""MATCH_RECOGNIZE (
         |  PARTITION BY user_id ORDER BY ts
         |  MEASURES S.ts AS s_ts
         |  PATTERN (S $deepBody P)
         |  WITHIN INTERVAL '1' HOUR
         |  DEFINE S AS event_type = 'signup'
         |)""".stripMargin))
    assert(e3.getMessage.contains("deeper"), e3.getMessage)
    // ALL ROWS with the nested group NOT the final element: named rejection
    val e4 = intercept[Exception](MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts
        |  ALL ROWS PER MATCH
        |  PATTERN (S ((B C)+ D)+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', D AS event_type = 'error',
        |         P AS event_type = 'purchase'
        |)""".stripMargin))
    assert(e4.getMessage.contains("FINAL pattern element"), e4.getMessage)
    // value measures over a nested group member: SUPPORTED since r15
    // (bindGroup through the two-level walk) — the former named rejection
    // must no longer fire; behavior is pinned by the dedicated test below
    MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, SUM(C.value) AS sum_c
        |  PATTERN (S ((B C)+ D)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', D AS event_type = 'purchase'
        |)""".stripMargin).collect()
  }

  test("ALL ROWS PER MATCH over a nested group S ((B C)+ V)+") {
    // user 1: rep1 = (10,20)(25,30) v@40, rep2 = (45,50) v@55; the
    // dangling click@58 (no view/v) contributes no row
    val evs = Seq(
      (1L, at(0), "signup", 0.0),
      (1L, at(10), "click", 0.0), (1L, at(20), "view", 0.0),
      (1L, at(25), "click", 0.0), (1L, at(30), "view", 0.0),
      (1L, at(40), "error", 0.0),
      (1L, at(45), "click", 0.0), (1L, at(50), "view", 0.0),
      (1L, at(55), "error", 0.0), (1L, at(58), "click", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS signup_ts, COUNT(V.ts) AS n_reps,
        |           COUNT(C.ts) AS n_inner
        |  ALL ROWS PER MATCH
        |  PATTERN (S ((B C)+ V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', V AS event_type = 'error'
        |)""".stripMargin)
      .as[(Long, String, Timestamp, Timestamp, Long, Long)].collect().toSet
    assert(m == Set(
      (1L, "S", at(0), at(0), 0L, 0L),
      (1L, "B", at(10), at(0), 0L, 0L), (1L, "C", at(20), at(0), 0L, 1L),
      (1L, "B", at(25), at(0), 0L, 1L), (1L, "C", at(30), at(0), 0L, 2L),
      (1L, "V", at(40), at(0), 1L, 2L),
      (1L, "B", at(45), at(0), 1L, 2L), (1L, "C", at(50), at(0), 1L, 3L),
      (1L, "V", at(55), at(0), 2L, 3L)), m.toString)
  }

  test("nested group pattern S ((B C)+ V)+ from SQL text") {
    // user 1: rep1 = (10,20)(25,30) then v@40, rep2 = (45,50) then v@55;
    // user 2: the v@22 punctuates — rep1 = (10,20) v@22, rep2 = (25,30) v@35
    val evs = Seq(
      (1L, at(0), "signup", 0.0),
      (1L, at(10), "click", 0.0), (1L, at(20), "view", 0.0),
      (1L, at(25), "click", 0.0), (1L, at(30), "view", 0.0),
      (1L, at(40), "error", 0.0),
      (1L, at(45), "click", 0.0), (1L, at(50), "view", 0.0),
      (1L, at(55), "error", 0.0),
      (2L, at(0), "signup", 0.0),
      (2L, at(10), "click", 0.0), (2L, at(20), "view", 0.0),
      (2L, at(22), "error", 0.0),
      (2L, at(25), "click", 0.0), (2L, at(30), "view", 0.0),
      (2L, at(35), "error", 0.0),
      (3L, at(0), "signup", 0.0), (3L, at(10), "click", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS signup_ts, FIRST(B.ts) AS grp_first_ts,
        |           LAST(V.ts) AS grp_last_ts, COUNT(V.ts) AS n_reps,
        |           COUNT(B.ts) AS n_inner
        |  PATTERN (S ((B C)+ V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', V AS event_type = 'error'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Long)].collect().toSet
    assert(m == Set(
      (1L, at(0), at(10), at(55), 2L, 3L),
      (2L, at(0), at(10), at(35), 2L, 2L)), m.toString)
  }

  test("ITERATIVE condition on a nested-group TAIL member: " +
       "V.value > 2 * S.value inside S ((B C)+ V)+") {
    // user 1 (S.value = 10, threshold 20): v@40(25) binds rep 1; v@55(15)
    //   FAILS the residual and is skipped — rep 2 closes at v@57(30)
    // user 2 (S.value = 50, threshold 100): no v qualifies — NO match
    //   even though plain v events exist
    // user 3 (S.value = 10): v@3(5) fails, so it does NOT punctuate the
    //   inner chain — the chain absorbs sub2 and closes at v@6(30):
    //   ONE repetition of TWO subs (a plain V would split into two reps)
    val evs = Seq(
      (1L, at(0), "signup", 10.0),
      (1L, at(10), "click", 0.0), (1L, at(20), "view", 0.0),
      (1L, at(25), "click", 0.0), (1L, at(30), "view", 0.0),
      (1L, at(40), "error", 25.0),
      (1L, at(45), "click", 0.0), (1L, at(50), "view", 0.0),
      (1L, at(55), "error", 15.0), (1L, at(57), "error", 30.0),
      (2L, at(0), "signup", 50.0),
      (2L, at(10), "click", 0.0), (2L, at(20), "view", 0.0),
      (2L, at(40), "error", 25.0), (2L, at(55), "error", 30.0),
      (3L, at(0), "signup", 10.0),
      (3L, at(1), "click", 0.0), (3L, at(2), "view", 0.0),
      (3L, at(3), "error", 5.0),
      (3L, at(4), "click", 0.0), (3L, at(5), "view", 0.0),
      (3L, at(6), "error", 30.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val sql =
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS signup_ts, FIRST(B.ts) AS grp_first_ts,
        |           LAST(V.ts) AS grp_last_ts, COUNT(V.ts) AS n_reps,
        |           COUNT(B.ts) AS n_inner
        |  PATTERN (S ((B C)+ V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view',
        |         V AS event_type = 'error' AND V.value > 2 * S.value
        |)""".stripMargin
    val m = MatchRecognize.detect(evs, sql)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Long)]
      .collect().toSet
    assert(m == Set(
      (1L, at(0), at(10), at(57), 2L, 3L),
      (3L, at(0), at(1), at(6), 1L, 2L)), m.toString)
    // combinator parity: bindTailResidual is the lowering target
    val viaApi = Pattern.begin("S", $"event_type" === "signup").bind("value")
      .followedByNestedGroup("G",
        Seq("B" -> ($"event_type" === "click"),
            "C" -> ($"event_type" === "view")),
        Seq("V" -> ($"event_type" === "error")))
      .bindTailResidual("V", "value", ">",
        org.apache.spark.sql.functions.expr("2 * S_value"))
      .oneOrMore()
      .within(3600000L)
      .detect(evs, $"user_id", $"ts")
      .select($"key", $"S_ts", $"G_first_ts", $"G_last_ts", $"G_n",
        $"G_inner_n")
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Long)]
      .collect().toSet
    assert(viaApi == m, viaApi.toString)
    // null threshold (null S.value) never binds — SQL 3VL
    val evsNull = Seq(
      (9L, at(0), "signup", null.asInstanceOf[java.lang.Double]),
      (9L, at(1), "click", java.lang.Double.valueOf(0.0)),
      (9L, at(2), "view", java.lang.Double.valueOf(0.0)),
      (9L, at(3), "error", java.lang.Double.valueOf(99.0))
    ).toDF("user_id", "ts", "event_type", "value")
    assert(MatchRecognize.detect(evsNull, sql).collect().isEmpty)
    // decimal literals in the threshold survive the rewrite (RefRx also
    // matches "1.5" — digit-led matches are literals, not column refs):
    // threshold = 1.5*10 + 0.5 = 15.5 for user 1, so v@55(15) still fails
    // and v@40(25)/v@57(30) still bind — the same match set
    val dec = MatchRecognize.detect(evs,
        sql.replace("2 * S.value", "1.5 * S.value + 0.5"))
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Long)]
      .collect().toSet
    assert(dec == m, dec.toString)
    // INNER member iterative conditions compose since r17 (the dedicated
    // INNER-member test pins their semantics) — here just not-an-error
    MatchRecognize.detect(evs,
      sql.replace("V AS event_type = 'error' AND V.value > 2 * S.value",
        "V AS event_type = 'error', C AS C.value > S.value")).collect()
    // named rejections: non-comparison shape, candidate-dependent threshold
    val eShape = intercept[Exception](MatchRecognize.detect(evs,
      sql.replace("V.value > 2 * S.value",
        "V.value = S.value")).collect())
    assert(eShape.getMessage.contains("cannot compile"), eShape.getMessage)
    val eBare = intercept[Exception](MatchRecognize.detect(evs,
      sql.replace("V.value > 2 * S.value",
        "V.value > S.value + value")).collect())
    assert(eBare.getMessage.contains("arithmetic over qualified"),
      eBare.getMessage)
    // a typo'd qualifier in the threshold ('S2.value' alongside the real
    // S ref) is a NAMED error, not a downstream unresolved-column
    // AnalysisException
    val eTypo = intercept[Exception](MatchRecognize.detect(evs,
      sql.replace("2 * S.value", "S.value + S2.value")).collect())
    assert(eTypo.getMessage.contains("not a pattern variable"),
      eTypo.getMessage)
  }

  test("ITERATIVE condition on a nested-group INNER member: " +
       "C.value > 2 * S.value inside S ((B C)+ V)+ (r17)") {
    // user 1 (S.value = 10, threshold 20): c@2(15) FAILS — the sub from
    //   b@1 completes at the first SATISFYING c@3(25); rep 1 = {(1,3)}+V@4,
    //   rep 2 = {(5,6)}+V@7. The plain control completes the first sub at
    //   c@2 instead.
    // user 2 (S.value = 50, threshold 100): no c qualifies — NO completable
    //   sub, no match (the control matches)
    val evs = Seq(
      (1L, at(0), "s", 10.0),
      (1L, at(1), "b", 0.0), (1L, at(2), "c", 15.0), (1L, at(3), "c", 25.0),
      (1L, at(4), "v", 0.0),
      (1L, at(5), "b", 0.0), (1L, at(6), "c", 30.0),
      (1L, at(7), "v", 0.0),
      (2L, at(0), "s", 50.0),
      (2L, at(1), "b", 0.0), (2L, at(2), "c", 60.0), (2L, at(3), "c", 25.0),
      (2L, at(4), "v", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val sql =
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS signup_ts, FIRST(B.ts) AS grp_first_ts,
        |           LAST(V.ts) AS grp_last_ts, COUNT(V.ts) AS n_reps,
        |           COUNT(B.ts) AS n_inner
        |  PATTERN (S ((B C)+ V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v'
        |)""".stripMargin
    val withRes = sql.replace("C AS event_type = 'c'",
      "C AS event_type = 'c' AND C.value > 2 * S.value")
    val m = MatchRecognize.detect(evs, withRes)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Long)].collect().toSet
    assert(m == Set((1L, at(0), at(1), at(7), 2L, 2L)), m.toString)
    // plain control: the first sub completes at c@2; user 2 matches
    val plain = MatchRecognize.detect(evs, sql)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Long)].collect().toSet
    assert(plain == Set(
      (1L, at(0), at(1), at(7), 2L, 2L),
      (2L, at(0), at(1), at(4), 1L, 1L)), plain.toString)
    // a higher threshold (28) disqualifies c@3 too: the sub from b@1 now
    // completes at the first satisfying c@6 — ONE long sub (1,6), closed
    // by v@7 (v@4 falls mid-sub and cannot punctuate an incomplete sub)
    val higher = MatchRecognize.detect(evs.where($"user_id" === 1L),
        withRes.replace("2 * S.value", "2.8 * S.value"))
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Long)].collect().toSet
    assert(higher == Set((1L, at(0), at(1), at(7), 1L, 1L)), higher.toString)
    // combinator parity: bindInnerResidual is the lowering target
    import org.apache.spark.sql.functions.expr
    val viaApi = Pattern.begin("S", $"event_type" === "s").bind("value")
      .followedByNestedGroup("G",
        Seq("B" -> ($"event_type" === "b"), "C" -> ($"event_type" === "c")),
        Seq("V" -> ($"event_type" === "v")))
      .bindInnerResidual("C", "value", ">", expr("2 * S_value"))
      .oneOrMore()
      .within(3600000L)
      .detect(evs, $"user_id", $"ts")
      .select($"key", $"S_ts", $"G_first_ts", $"G_last_ts", $"G_n",
        $"G_inner_n")
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Long)].collect().toSet
    assert(viaApi == m, viaApi.toString)
    // null threshold (null S.value): no sub is compiled for that anchor —
    // never binds, SQL 3VL
    val evsNull = Seq(
      (9L, at(0), "s", null.asInstanceOf[java.lang.Double]),
      (9L, at(1), "b", java.lang.Double.valueOf(0.0)),
      (9L, at(2), "c", java.lang.Double.valueOf(99.0)),
      (9L, at(3), "v", java.lang.Double.valueOf(0.0))
    ).toDF("user_id", "ts", "event_type", "value")
    assert(MatchRecognize.detect(evsNull, withRes).collect().isEmpty)
    // composition guards: bindGroup on the same member, depth-2 inner
    val e1 = intercept[IllegalArgumentException](
      Pattern.begin("S", $"event_type" === "s").bind("value")
        .followedByNestedGroup("G",
          Seq("B" -> ($"event_type" === "b"), "C" -> ($"event_type" === "c")),
          Seq("V" -> ($"event_type" === "v")))
        .bindInnerResidual("C", "value", ">", expr("2 * S_value"))
        .bindGroup("C", "value"))
    assert(e1.getMessage.contains("bindInnerResidual"), e1.getMessage)
    // depth-2 inner residuals are SUPPORTED since r17 (m50) — the former
    // named rejection must no longer fire; a MID member name stays one
    Pattern.begin("S", $"event_type" === "s")
      .followedByNested2Group("G",
        Seq("B" -> ($"event_type" === "b"), "C" -> ($"event_type" === "c")),
        Seq("V" -> ($"event_type" === "v")),
        Seq("W" -> ($"event_type" === "w")))
      .bindInnerResidual("C", "value", ">", expr("2 * S_value"))
    val e2 = intercept[IllegalArgumentException](
      Pattern.begin("S", $"event_type" === "s")
        .followedByNested2Group("G",
          Seq("B" -> ($"event_type" === "b"), "C" -> ($"event_type" === "c")),
          Seq("V" -> ($"event_type" === "v")),
          Seq("W" -> ($"event_type" === "w")))
        .bindInnerResidual("V", "value", ">", expr("2 * S_value")))
    assert(e2.getMessage.contains("not an INNER member"), e2.getMessage)
  }

  test("DEPTH-2 nested group S (((B C)+ V)+ W)+ from SQL text") {
    // user 1: outer rep 1 = R1{(1,2)(3,4)}V@5 + R1{(6,7)}V@8, W@9
    //         (the R1 ending @12 is NOT absorbed: 12 >= W@9 — the outer
    //         tail punctuates the level-1 chain);
    //         outer rep 2 = R1{(10,11)}V@12, W@13
    // user 2: one outer rep, then a COMPLETE dangling R1 with no W after
    //         — discarded (greedy-no-backtracking at the outer level)
    // user 3: no W at all — no match
    val evs = Seq(
      (1L, at(0), "s", 0.0),
      (1L, at(1), "b", 0.0), (1L, at(2), "c", 0.0),
      (1L, at(3), "b", 0.0), (1L, at(4), "c", 0.0),
      (1L, at(5), "v", 0.0),
      (1L, at(6), "b", 0.0), (1L, at(7), "c", 0.0),
      (1L, at(8), "v", 0.0),
      (1L, at(9), "w", 0.0),
      (1L, at(10), "b", 0.0), (1L, at(11), "c", 0.0),
      (1L, at(12), "v", 0.0),
      (1L, at(13), "w", 0.0),
      (2L, at(0), "s", 0.0),
      (2L, at(1), "b", 0.0), (2L, at(2), "c", 0.0), (2L, at(3), "v", 0.0),
      (2L, at(4), "w", 0.0),
      (2L, at(5), "b", 0.0), (2L, at(6), "c", 0.0), (2L, at(7), "v", 0.0),
      (3L, at(0), "s", 0.0),
      (3L, at(1), "b", 0.0), (3L, at(2), "c", 0.0), (3L, at(3), "v", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val sql =
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS signup_ts, FIRST(B.ts) AS grp_first_ts,
        |           LAST(W.ts) AS grp_last_ts, COUNT(W.ts) AS n_outer,
        |           COUNT(V.ts) AS n_mid, COUNT(B.ts) AS n_inner
        |  PATTERN (S (((B C)+ V)+ W)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         W AS event_type = 'w'
        |)""".stripMargin
    val m = MatchRecognize.detect(evs, sql)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Long, Long)]
      .collect().toSet
    assert(m == Set(
      (1L, at(0), at(1), at(13), 2L, 3L, 4L),
      (2L, at(0), at(1), at(4), 1L, 1L, 1L)), m.toString)
    // the SQL clause must equal the hand-built combinator result
    val viaApi = Pattern.begin("S", $"event_type" === "s")
      .followedByNested2Group("G",
        Seq("B" -> ($"event_type" === "b"), "C" -> ($"event_type" === "c")),
        Seq("V" -> ($"event_type" === "v")),
        Seq("W" -> ($"event_type" === "w")))
      .oneOrMore()
      .within(3600000L)
      .detect(evs, $"user_id", $"ts")
      .select($"key", $"S_ts", $"G_first_ts", $"G_last_ts", $"G_n",
        $"G_mid_n", $"G_inner_n")
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Long, Long)]
      .collect().toSet
    assert(viaApi == m, viaApi.toString)
    // outer '*' (zeroOrMore): user 3's empty chain keeps the match row
    // with count 0 and null boundaries
    val z = MatchRecognize.detect(evs,
        sql.replace("(S (((B C)+ V)+ W)+)", "(S (((B C)+ V)+ W)*)"))
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp], Long, Long, Long)]
      .collect().toSet
    assert(z.contains((3L, at(0), None, None, 0L, 0L, 0L)), z.toString)
    assert(z.size == 3, z.toString)
    // a trailing plain step after the depth-2 group binds after its end
    val tr = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS signup_ts, COUNT(W.ts) AS n_outer, P.ts AS p_ts
        |  PATTERN (S (((B C)+ V)+ W)+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         W AS event_type = 'w', P AS event_type = 'b'
        |)""".stripMargin)
      .as[(Long, Timestamp, Long, Timestamp)].collect().toSet
    // user 1: the greedy chain commits 2 reps ending @13 and P (a 'b')
    // then fails — NO match (greedy-no-backtracking, the chain never
    // retries with fewer reps). User 2: chain ends @4, P binds b@5.
    assert(tr == Set((2L, at(0), 1L, at(5))), tr.toString)
    // member VALUE measures are SUPPORTED (r16 late add — behavior pinned
    // by the dedicated depth-2 value test; this corpus has value = 0.0)
    val ev = MatchRecognize.detect(evs,
      sql.replace("COUNT(B.ts) AS n_inner", "SUM(C.value) AS sum_c"))
      .collect()
    assert(ev.length == 2 && ev.forall(_.getAs[Double]("sum_c") == 0.0),
      ev.mkString(","))
    // ALL ROWS stays a named rejection
    val ea = intercept[Exception](MatchRecognize.detect(evs,
      sql.replace("PATTERN", "ALL ROWS PER MATCH\n  PATTERN")).collect())
    assert(ea.getMessage.contains("ALL ROWS"), ea.getMessage)
  }

  test("DEPTH-2 nested group with inner '*': (((B C)* V)+ W)+ binds " +
       "mid-only level-1 repetitions") {
    // user 1: R1_1 is MID-ONLY (v@1 beats the sub ending @3 — ties favor
    //   the mid, the one-level inner-'*' convention one level down),
    //   R1_2 = (2,3) v@4; W@5 -> one outer rep, mid=2, inner=1, first=v@1
    // user 2: NO subs at all — two outer reps of mid-only repetitions
    val evs = Seq(
      (1L, at(0), "s"), (1L, at(1), "v"), (1L, at(2), "b"),
      (1L, at(3), "c"), (1L, at(4), "v"), (1L, at(5), "w"),
      (2L, at(0), "s"), (2L, at(1), "v"), (2L, at(2), "w"),
      (2L, at(3), "v"), (2L, at(4), "w")
    ).toDF("user_id", "ts", "event_type")
    val sql =
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS signup_ts, LAST(W.ts) AS grp_last_ts,
        |           COUNT(W.ts) AS n_outer, COUNT(V.ts) AS n_mid,
        |           COUNT(B.ts) AS n_inner
        |  PATTERN (S (((B C)* V)+ W)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         W AS event_type = 'w'
        |)""".stripMargin
    val m = MatchRecognize.detect(evs, sql)
      .as[(Long, Timestamp, Timestamp, Long, Long, Long)].collect().toSet
    assert(m == Set(
      (1L, at(0), at(5), 1L, 2L, 1L),
      (2L, at(0), at(4), 2L, 2L, 0L)), m.toString)
    // star == plus when every level-1 repetition has subs (the m37
    // equivalence, one level down): the m39 corpus through both spellings
    val evs2 = Seq(
      (1L, at(0), "s"), (1L, at(1), "b"), (1L, at(2), "c"),
      (1L, at(3), "v"), (1L, at(4), "w")
    ).toDF("user_id", "ts", "event_type")
    val viaStar = MatchRecognize.detect(evs2, sql)
      .as[(Long, Timestamp, Timestamp, Long, Long, Long)].collect().toSet
    val viaPlus = MatchRecognize.detect(evs2,
        sql.replace("(((B C)* V)+ W)+", "(((B C)+ V)+ W)+"))
      .as[(Long, Timestamp, Timestamp, Long, Long, Long)].collect().toSet
    assert(viaStar == viaPlus && viaStar.nonEmpty, s"$viaStar vs $viaPlus")
    // FIRST over an inner member under inner '*': named error (the first
    // repetition may start at a mid step)
    val e = intercept[Exception](MatchRecognize.detect(evs,
      sql.replace("LAST(W.ts) AS grp_last_ts", "FIRST(B.ts) AS gf")).collect())
    assert(e.getMessage.contains("mid step"), e.getMessage)
  }

  test("DEPTH-2 inner '*' composes with VALUE measures and ALL ROWS " +
       "(mid-only repetitions fold values and rows with k = 0)") {
    // value = minute index; user 1: R1_1 is MID-ONLY (V@1), R1_2 =
    // (B@2 C@3) V@4, W@5; user 2 has NO subs at all
    val evs = Seq(
      (1L, at(0), "s", 0.0), (1L, at(1), "v", 1.0), (1L, at(2), "b", 2.0),
      (1L, at(3), "c", 3.0), (1L, at(4), "v", 4.0), (1L, at(5), "w", 5.0),
      (2L, at(0), "s", 0.0), (2L, at(1), "v", 1.0), (2L, at(2), "w", 2.0),
      (2L, at(3), "v", 3.0), (2L, at(4), "w", 4.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES SUM(V.value) AS sum_v, COUNT(V.value) AS cnt_v,
        |           SUM(B.value) AS sum_b, LAST(W.value) AS last_w
        |  PATTERN (S (((B C)* V)+ W)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         W AS event_type = 'w'
        |)""".stripMargin)
      .as[(Long, Double, Long, Option[Double], Double)].collect().toSet
    assert(m == Set(
      (1L, 5.0, 2L, Some(2.0), 5.0),
      (2L, 4.0, 2L, None, 4.0)), m.toString)
    // ALL ROWS: mid-only repetitions emit their V row with k = 0 subs
    val rows = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES COUNT(W.ts) AS n_reps, COUNT(V.ts) AS n_mids,
        |           COUNT(C.ts) AS n_subs
        |  ALL ROWS PER MATCH
        |  PATTERN (S (((B C)* V)+ W)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         W AS event_type = 'w'
        |)""".stripMargin)
      .select($"user_id", $"cls", $"ts", $"n_reps", $"n_mids", $"n_subs")
      .as[(Long, String, Timestamp, Long, Long, Long)].collect().toSet
    val u1 = Seq(
      ("S", 0L, 0L, 0L, 0L), ("V", 1L, 0L, 1L, 0L), ("B", 2L, 0L, 1L, 0L),
      ("C", 3L, 0L, 1L, 1L), ("V", 4L, 0L, 2L, 1L), ("W", 5L, 1L, 2L, 1L)
    ).map { case (c, t, r, mm, ss) => (1L, c, at(t), r, mm, ss) }
    val u2 = Seq(
      ("S", 0L, 0L, 0L, 0L), ("V", 1L, 0L, 1L, 0L), ("W", 2L, 1L, 1L, 0L),
      ("V", 3L, 1L, 2L, 0L), ("W", 4L, 2L, 2L, 0L)
    ).map { case (c, t, r, mm, ss) => (2L, c, at(t), r, mm, ss) }
    assert(rows == (u1 ++ u2).toSet,
      rows.toSeq.sortBy(r => (r._1, r._3.getTime)).mkString("\n"))
  }

  test("ITERATIVE condition on a DEPTH-2 OUTER TAIL: " +
       "W.value > 2 * S.value inside S (((B C)+ V)+ W)+") {
    // user 1 (S.value = 10, threshold 20): w@4(15) FAILS the residual —
    //   it neither binds nor punctuates; rep 1 closes at w@5(25), rep 2
    //   at w@9(30)
    // user 2 (S.value = 50, threshold 100): no w qualifies — NO match
    val evs = Seq(
      (1L, at(0), "s", 10.0),
      (1L, at(1), "b", 0.0), (1L, at(2), "c", 0.0), (1L, at(3), "v", 0.0),
      (1L, at(4), "w", 15.0), (1L, at(5), "w", 25.0),
      (1L, at(6), "b", 0.0), (1L, at(7), "c", 0.0), (1L, at(8), "v", 0.0),
      (1L, at(9), "w", 30.0),
      (2L, at(0), "s", 50.0),
      (2L, at(1), "b", 0.0), (2L, at(2), "c", 0.0), (2L, at(3), "v", 0.0),
      (2L, at(4), "w", 25.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val sql =
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS signup_ts, LAST(W.ts) AS grp_last_ts,
        |           COUNT(W.ts) AS n_outer, COUNT(V.ts) AS n_mid,
        |           COUNT(B.ts) AS n_inner
        |  PATTERN (S (((B C)+ V)+ W)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         W AS event_type = 'w' AND W.value > 2 * S.value
        |)""".stripMargin
    val m = MatchRecognize.detect(evs, sql)
      .as[(Long, Timestamp, Timestamp, Long, Long, Long)].collect().toSet
    assert(m == Set((1L, at(0), at(9), 2L, 2L, 2L)), m.toString)
    // INNER members with an iterative condition compose since r17 (m50);
    // an always-satisfied threshold must reproduce the unfiltered result
    // EXACTLY (the parametrized sub-match table degenerates to the plain
    // one) — behavior under a binding threshold is pinned by the
    // dedicated depth-2 inner-residual test in CepPatternSpec
    val mInv = MatchRecognize.detect(evs,
      sql.replace("C AS event_type = 'c'",
        "C AS event_type = 'c' AND C.value > S.value - 1000000"))
      .as[(Long, Timestamp, Timestamp, Long, Long, Long)].collect().toSet
    assert(mInv == m, mInv.toString)
  }

  test("ITERATIVE condition on a DEPTH-2 MID member: " +
       "V.value > 2 * S.value inside S (((B C)+ V)+ W)+ (r17)") {
    // user 1 (S.value = 10, threshold 20): v@3(15) FAILS the residual —
    //   it neither binds nor PUNCTUATES the inner chain, so the chain
    //   absorbs sub (4,5) and the level-1 repetition closes at v@6(25):
    //   ONE level-1 rep with TWO subs, then W@7 — vs the plain-V control
    //   where v@3 punctuates after sub (1,2) and the walk commits TWO
    //   level-1 reps
    // user 2 (S.value = 50, threshold 100): no v qualifies — NO match
    //   (the control matches)
    val evs = Seq(
      (1L, at(0), "s", 10.0),
      (1L, at(1), "b", 0.0), (1L, at(2), "c", 0.0),
      (1L, at(3), "v", 15.0),
      (1L, at(4), "b", 0.0), (1L, at(5), "c", 0.0),
      (1L, at(6), "v", 25.0),
      (1L, at(7), "w", 0.0),
      (2L, at(0), "s", 50.0),
      (2L, at(1), "b", 0.0), (2L, at(2), "c", 0.0),
      (2L, at(3), "v", 25.0), (2L, at(4), "w", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val sql =
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS signup_ts, LAST(W.ts) AS grp_last_ts,
        |           COUNT(W.ts) AS n_outer, COUNT(V.ts) AS n_mid,
        |           COUNT(B.ts) AS n_inner
        |  PATTERN (S (((B C)+ V)+ W)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         W AS event_type = 'w' AND W.value >= 0
        |)""".stripMargin
    val withRes = sql.replace("V AS event_type = 'v'",
      "V AS event_type = 'v' AND V.value > 2 * S.value")
    val m = MatchRecognize.detect(evs, withRes)
      .as[(Long, Timestamp, Timestamp, Long, Long, Long)].collect().toSet
    assert(m == Set((1L, at(0), at(7), 1L, 1L, 2L)), m.toString)
    // the plain-V control: v@3 punctuates, two level-1 reps; user 2 matches
    val plain = MatchRecognize.detect(evs, sql)
      .as[(Long, Timestamp, Timestamp, Long, Long, Long)].collect().toSet
    assert(plain == Set(
      (1L, at(0), at(7), 1L, 2L, 2L),
      (2L, at(0), at(4), 1L, 1L, 1L)), plain.toString)
    // combinator parity: bindTailResidual on the MID member
    import org.apache.spark.sql.functions.expr
    val viaApi = Pattern.begin("S", $"event_type" === "s").bind("value")
      .followedByNested2Group("G",
        Seq("B" -> ($"event_type" === "b"), "C" -> ($"event_type" === "c")),
        Seq("V" -> ($"event_type" === "v")),
        Seq("W" -> ($"event_type" === "w")))
      .bindTailResidual("V", "value", ">", expr("2 * S_value"))
      .oneOrMore()
      .within(3600000L)
      .detect(evs, $"user_id", $"ts")
      .select($"key", $"S_ts", $"G_last_ts", $"G_n", $"G_mid_n",
        $"G_inner_n")
      .as[(Long, Timestamp, Timestamp, Long, Long, Long)].collect().toSet
    assert(viaApi == m, viaApi.toString)
    // a mid residual with a NULL threshold (null S.value) never binds
    val evsNull = Seq(
      (9L, at(0), "s", null.asInstanceOf[java.lang.Double]),
      (9L, at(1), "b", java.lang.Double.valueOf(0.0)),
      (9L, at(2), "c", java.lang.Double.valueOf(0.0)),
      (9L, at(3), "v", java.lang.Double.valueOf(99.0)),
      (9L, at(4), "w", java.lang.Double.valueOf(0.0))
    ).toDF("user_id", "ts", "event_type", "value")
    assert(MatchRecognize.detect(evsNull, withRes).collect().isEmpty)
  }

  test("composite ORDER BY tiebreak steers NESTED-group member values " +
       "(equal-ts candidates argmin by (tie, value))") {
    // two B candidates at ts 10: (tie 2, val 4) vs (tie 1, val 6) — the
    // tiebreak binds 6 where the plain (value)-min would bind 4; two C
    // candidates at ts 20: (tie 2, val 3) vs (tie 1, val 9) — tie binds 9;
    // two V (TAIL member) candidates at ts 30: (tie 2, val 1) vs
    // (tie 1, val 8) — tie binds 8 (the r16 review caught the tail-table
    // copy still on plain min: both table shapes must steer)
    val evs = Seq(
      (1L, at(0), "s", 0L, 0.0),
      (1L, at(10), "b", 2L, 4.0), (1L, at(10), "b", 1L, 6.0),
      (1L, at(20), "c", 2L, 3.0), (1L, at(20), "c", 1L, 9.0),
      (1L, at(30), "v", 2L, 1.0), (1L, at(30), "v", 1L, 8.0)
    ).toDF("user_id", "ts", "event_type", "tie1", "value")
    val sql =
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, tie1
        |  MEASURES S.ts AS signup_ts, SUM(B.value) AS sum_b,
        |           LAST(C.value) AS last_c, LAST(V.value) AS last_v,
        |           COUNT(V.ts) AS n_reps
        |  PATTERN (S ((B C)+ V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v'
        |)""".stripMargin
    val m = MatchRecognize.detect(evs, sql)
      .as[(Long, Timestamp, Double, Double, Double, Long)].collect().toSet
    assert(m == Set((1L, at(0), 6.0, 9.0, 8.0, 1L)), m.toString)
    // the PLAIN (value)-min control: same data without the tiebreak
    val plain = MatchRecognize.detect(evs,
        sql.replace("ORDER BY ts, tie1", "ORDER BY ts"))
      .as[(Long, Timestamp, Double, Double, Double, Long)].collect().toSet
    assert(plain == Set((1L, at(0), 4.0, 3.0, 1.0, 1L)), plain.toString)
  }

  test("composite ORDER BY tiebreak steers DEPTH-2 nested-group member " +
       "values at every level (r17, the former named rejection)") {
    // equal-ts duplicate candidates on an INNER member (B@10), the MID
    // tail (V@30) and the OUTER tail (W@40): (tie 2, smaller value) vs
    // (tie 1, larger value) — the tiebreak binds the larger value at all
    // three table shapes, the plain (value)-min control the smaller
    val evs = Seq(
      (1L, at(0), "s", 0L, 0.0),
      (1L, at(10), "b", 2L, 4.0), (1L, at(10), "b", 1L, 6.0),
      (1L, at(20), "c", 0L, 5.0),
      (1L, at(30), "v", 2L, 3.0), (1L, at(30), "v", 1L, 9.0),
      (1L, at(40), "w", 2L, 1.0), (1L, at(40), "w", 1L, 8.0)
    ).toDF("user_id", "ts", "event_type", "tie1", "value")
    val sql =
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, tie1
        |  MEASURES S.ts AS signup_ts, SUM(B.value) AS sum_b,
        |           MAX(V.value) AS max_v, LAST(W.value) AS last_w,
        |           COUNT(W.ts) AS n_outer
        |  PATTERN (S (((B C)+ V)+ W)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         W AS event_type = 'w'
        |)""".stripMargin
    val m = MatchRecognize.detect(evs, sql)
      .as[(Long, Timestamp, Double, Double, Double, Long)].collect().toSet
    assert(m == Set((1L, at(0), 6.0, 9.0, 8.0, 1L)), m.toString)
    val plain = MatchRecognize.detect(evs,
        sql.replace("ORDER BY ts, tie1", "ORDER BY ts"))
      .as[(Long, Timestamp, Double, Double, Double, Long)].collect().toSet
    assert(plain == Set((1L, at(0), 4.0, 3.0, 1.0, 1L)), plain.toString)
  }

  test("DEPTH-2 nested group member VALUE measures (two pending levels)") {
    // the m39 corpus with value = minute index. Committed bindings:
    //   user 1: B@{1,3,6,10} C@{2,4,7,11} V@{5,8,12} W@{9,13}
    //     (the SPECULATED-but-unabsorbed R1 ending @12 in outer rep 1 is
    //     re-walked and committed by outer rep 2 — counted ONCE)
    //   user 2: B@1 C@2 V@3 W@4; the dangling complete R1 (5,6,7) with no
    //     W after is DISCARDED at the outer level — its values too
    def rows(k: Long, evs: (Long, String)*) =
      evs.map { case (min0, et) => (k, at(min0), et, min0.toDouble) }
    val evs = (rows(1L, 0L -> "s", 1L -> "b", 2L -> "c", 3L -> "b",
        4L -> "c", 5L -> "v", 6L -> "b", 7L -> "c", 8L -> "v", 9L -> "w",
        10L -> "b", 11L -> "c", 12L -> "v", 13L -> "w") ++
      rows(2L, 0L -> "s", 1L -> "b", 2L -> "c", 3L -> "v", 4L -> "w",
        5L -> "b", 6L -> "c", 7L -> "v"))
      .toDF("user_id", "ts", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS signup_ts, COUNT(W.ts) AS n_outer,
        |           SUM(B.value) AS sum_b, AVG(C.value) AS avg_c,
        |           MAX(V.value) AS max_v, LAST(W.value) AS last_w,
        |           COUNT(C.value) AS cnt_c
        |  PATTERN (S (((B C)+ V)+ W)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         W AS event_type = 'w'
        |)""".stripMargin)
      .as[(Long, Timestamp, Long, Double, Double, Double, Double, Long)]
      .collect().toSet
    assert(m == Set(
      (1L, at(0), 2L, 20.0, 6.0, 12.0, 13.0, 4L),
      (2L, at(0), 1L, 1.0, 2.0, 3.0, 4.0, 1L)), m.toString)
  }

  test("ALL ROWS PER MATCH over a DEPTH-2 nested group (running " +
       "reps/mids/subs per row; rejected speculations emit nothing)") {
    val evs = Seq(
      (1L, at(0), "s"), (1L, at(1), "b"), (1L, at(2), "c"),
      (1L, at(3), "b"), (1L, at(4), "c"), (1L, at(5), "v"),
      (1L, at(6), "b"), (1L, at(7), "c"), (1L, at(8), "v"),
      (1L, at(9), "w"),
      (1L, at(10), "b"), (1L, at(11), "c"), (1L, at(12), "v"),
      (1L, at(13), "w"),
      (2L, at(0), "s"), (2L, at(1), "b"), (2L, at(2), "c"),
      (2L, at(3), "v"), (2L, at(4), "w"),
      // user 2's dangling complete R1 with no W: its rows must NOT emit
      (2L, at(5), "b"), (2L, at(6), "c"), (2L, at(7), "v")
    ).toDF("user_id", "ts", "event_type")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS signup_ts, COUNT(W.ts) AS n_reps,
        |           COUNT(V.ts) AS n_mids, COUNT(C.ts) AS n_subs
        |  ALL ROWS PER MATCH
        |  PATTERN (S (((B C)+ V)+ W)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         W AS event_type = 'w'
        |)""".stripMargin)
      .select($"user_id", $"cls", $"ts", $"n_reps", $"n_mids", $"n_subs")
      .as[(Long, String, Timestamp, Long, Long, Long)].collect().toSet
    val u1 = Seq(
      ("S", 0L, 0L, 0L, 0L), ("B", 1L, 0L, 0L, 0L), ("C", 2L, 0L, 0L, 1L),
      ("B", 3L, 0L, 0L, 1L), ("C", 4L, 0L, 0L, 2L), ("V", 5L, 0L, 1L, 2L),
      ("B", 6L, 0L, 1L, 2L), ("C", 7L, 0L, 1L, 3L), ("V", 8L, 0L, 2L, 3L),
      ("W", 9L, 1L, 2L, 3L), ("B", 10L, 1L, 2L, 3L), ("C", 11L, 1L, 2L, 4L),
      ("V", 12L, 1L, 3L, 4L), ("W", 13L, 2L, 3L, 4L)
    ).map { case (c, t, r, mm, ss) => (1L, c, at(t), r, mm, ss) }
    val u2 = Seq(
      ("S", 0L, 0L, 0L, 0L), ("B", 1L, 0L, 0L, 0L), ("C", 2L, 0L, 0L, 1L),
      ("V", 3L, 0L, 1L, 1L), ("W", 4L, 1L, 1L, 1L)
    ).map { case (c, t, r, mm, ss) => (2L, c, at(t), r, mm, ss) }
    assert(m == (u1 ++ u2).toSet, m.toSeq.sortBy(r => (r._1, r._3.getTime))
      .mkString("\n"))
    // value measures under depth-2 ALL ROWS (r18, lifting the former
    // named rejection): running SUM rides the per-row vsum snapshots —
    // with value = 1.0 per event, SUM(B.value) as of a row is the number
    // of B bindings so far (own contribution included; prefix rows null)
    val ev2 = evs.withColumn("value", org.apache.spark.sql.functions.lit(1.0))
    val mv = MatchRecognize.detect(ev2,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES SUM(B.value) AS sb
        |  ALL ROWS PER MATCH
        |  PATTERN (S (((B C)+ V)+ W)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         W AS event_type = 'w'
        |)""".stripMargin)
      .select($"user_id", $"cls", $"ts", $"sb")
      .as[(Long, String, Timestamp, Option[Double])].collect().toSet
    val v1 = Seq(
      ("S", 0L, None), ("B", 1L, Some(1.0)), ("C", 2L, Some(1.0)),
      ("B", 3L, Some(2.0)), ("C", 4L, Some(2.0)), ("V", 5L, Some(2.0)),
      ("B", 6L, Some(3.0)), ("C", 7L, Some(3.0)), ("V", 8L, Some(3.0)),
      ("W", 9L, Some(3.0)), ("B", 10L, Some(4.0)), ("C", 11L, Some(4.0)),
      ("V", 12L, Some(4.0)), ("W", 13L, Some(4.0))
    ).map { case (c, t, v) => (1L, c, at(t), v) }
    val v2 = Seq(
      ("S", 0L, None), ("B", 1L, Some(1.0)), ("C", 2L, Some(1.0)),
      ("V", 3L, Some(1.0)), ("W", 4L, Some(1.0))
    ).map { case (c, t, v) => (2L, c, at(t), v) }
    assert(mv == (v1 ++ v2).toSet, mv.toSeq.sortBy(r => (r._1, r._3.getTime))
      .mkString("\n"))
  }

  test("ALL ROWS nested group with TWO tail steps: only the FINAL tail " +
       "row counts the repetition (reps convention)") {
    val evs = Seq(
      (1L, at(0), "s"), (1L, at(1), "b"), (1L, at(2), "c"),
      (1L, at(3), "v"), (1L, at(4), "u"),
      (1L, at(5), "b"), (1L, at(6), "c"), (1L, at(7), "v"), (1L, at(8), "u")
    ).toDF("user_id", "ts", "event_type")
    val sql =
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS signup_ts, COUNT(U.ts) AS n_reps,
        |           COUNT(C.ts) AS n_subs
        |  ALL ROWS PER MATCH
        |  PATTERN (S ((B C)+ V U)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         U AS event_type = 'u'
        |)""".stripMargin
    val m = MatchRecognize.detect(evs, sql)
      .select($"cls", $"ts", $"n_reps", $"n_subs")
      .as[(String, Timestamp, Long, Long)].collect().toSet
    assert(m == Set(
      ("S", at(0), 0L, 0L), ("B", at(1), 0L, 0L), ("C", at(2), 0L, 1L),
      ("V", at(3), 0L, 1L), ("U", at(4), 1L, 1L), ("B", at(5), 1L, 1L),
      ("C", at(6), 1L, 2L), ("V", at(7), 1L, 2L), ("U", at(8), 2L, 2L)),
      m.toSeq.sortBy(_._2.getTime).mkString("\n"))
    // running COUNT over a NON-FINAL tail member: named error (its true
    // running count differs from reps between it and the final tail)
    val e = intercept[Exception](MatchRecognize.detect(evs,
      sql.replace("COUNT(U.ts) AS n_reps", "COUNT(V.ts) AS n_reps")).collect())
    assert(e.getMessage.contains("FINAL tail member"), e.getMessage)
  }

  test("ALL ROWS over a MIXED group+run pattern (S (B C)+ V+ P)") {
    // two (click view) repetitions, then an error+ run, then purchase:
    // group member rows ride the repetition arrays, run member rows the
    // keyed join-back; cross-shape measures are closed-form (group FINAL
    // on run rows, run empty on group rows)
    val evs = Seq(
      (1L, at(0), "signup", 0.0),
      (1L, at(10), "click", 9.0), (1L, at(20), "view", 2.0),
      (1L, at(30), "click", 9.0), (1L, at(40), "view", 3.0),
      (1L, at(50), "error", 1.0), (1L, at(55), "error", 4.0),
      (1L, at(58), "purchase", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS s_ts, COUNT(B.ts) AS n_b, SUM(C.value) AS sum_c,
        |           COUNT(V.ts) AS n_v, SUM(V.value) AS sum_v, P.ts AS p_ts
        |  ALL ROWS PER MATCH
        |  PATTERN (S (B C)+ V+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', V AS event_type = 'error',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .select($"cls", $"ts", $"n_b", $"sum_c", $"n_v", $"sum_v", $"p_ts")
      .as[(String, Timestamp, Long, Option[Double], Long, Option[Double], Option[Timestamp])]
      .collect().toSet
    assert(m == Set(
      ("S", at(0), 0L, None, 0L, None, None),
      ("B", at(10), 1L, None, 0L, None, None),
      ("C", at(20), 1L, Some(2.0), 0L, None, None),
      ("B", at(30), 2L, Some(2.0), 0L, None, None),
      ("C", at(40), 2L, Some(5.0), 0L, None, None),
      ("V", at(50), 2L, Some(5.0), 1L, Some(1.0), None),
      ("V", at(55), 2L, Some(5.0), 2L, Some(5.0), None),
      ("P", at(58), 2L, Some(5.0), 2L, Some(5.0), Some(at(58)))), m.toString)
  }

  test("ORDER BY tiebreak: equal-ts candidates bind by the secondary column") {
    // three clicks at the SAME timestamp: without the tiebreak the binding
    // refinement would argmin by (ts, value) and pick value 1.0 (seq 30);
    // ORDER BY ts, seq must pick seq 10 (value 5.0)
    val evs = Seq(
      (1L, at(0), 1L, "signup", 0.0),
      (1L, at(10), 10L, "click", 5.0), (1L, at(10), 20L, "click", 9.0),
      (1L, at(10), 30L, "click", 1.0),
      (1L, at(20), 40L, "purchase", 0.0)
    ).toDF("user_id", "ts", "seq", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, seq
        |  MEASURES C.seq AS c_seq, C.value AS c_value, P.ts AS p_ts
        |  PATTERN (S C P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Long, Double, Timestamp)].collect().toSet
    assert(m == Set((1L, 10L, 5.0, at(20))), m.toString)
  }

  test("ALL ROWS running measures are deterministic on equal-ts members " +
       "(pinned (ts, classifier, value) member order)") {
    // a click AND a view at the SAME timestamp inside one (C|V)+ run: the
    // member window must order them classifier-first ('C' < 'V'), so the
    // RUNNING counts/sums on each row are fixed, not partition-order luck
    val evs = Seq(
      (1L, at(0), "signup", 0.0),
      (1L, at(10), "click", 1.0), (1L, at(10), "view", 2.0),
      (1L, at(15), "purchase", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, COUNT(C_V.ts) AS n_m, COUNT(C.ts) AS n_c,
        |           COUNT(V.ts) AS n_v, SUM(C_V.value) AS sv
        |  ALL ROWS PER MATCH
        |  PATTERN (S (C|V)+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         V AS event_type = 'view', P AS event_type = 'purchase'
        |)""".stripMargin)
      .select($"cls", $"n_m", $"n_c", $"n_v", $"sv")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSet
    // 'C' runs first at ts 10: its row sees (1, 1, 0, 1.0); the 'V' row
    // sees both members. A reversed order would instead produce a
    // (V, 1, 0, 1, 2.0) row — the Set comparison catches either flip.
    assert(m == Set(
      ("S", 0L, 0L, 0L, None),
      ("C", 1L, 1L, 0L, Some(1.0)),
      ("V", 2L, 1L, 1L, Some(3.0)),
      ("P", 2L, 1L, 1L, Some(3.0))), m.toString)
    // equal (ts, classifier): the VALUE field breaks the remaining tie
    val evs2 = Seq(
      (1L, at(0), "signup", 0.0),
      (1L, at(10), "click", 4.0), (1L, at(10), "click", 2.0),
      (1L, at(15), "purchase", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val m2 = MatchRecognize.detect(evs2,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES COUNT(C.ts) AS n_c, SUM(C.value) AS sv
        |  ALL ROWS PER MATCH
        |  PATTERN (S C+ P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .select($"cls", $"n_c", $"sv")
      .as[(String, Long, Option[Double])].collect().toSet
    // ascending value: the 2.0 click's running sum is 2.0, then 6.0
    assert(m2 == Set(
      ("S", 0L, None), ("C", 1L, Some(2.0)),
      ("C", 2L, Some(6.0)), ("P", 2L, Some(6.0))), m2.toString)
  }

  test("nested group member VALUE measures fold per completed repetition") {
    // S ((B C)+ V)+ — rep 1 absorbs two subs (B@5 v2, C@10 v3; B@15 v4,
    // C@20 v5) then V@25 v9; rep 2 one sub (B@30 v1, C@35 v7) then V@40 v8.
    // The third sub (B@45 C@50, v=100 each) COMPLETES but no tail follows:
    // the attempt fails and its values must be DISCARDED
    // (greedy-no-backtracking) — sum_b 7 not 107, min_c 3 not... (100 would
    // not change min, but sum/avg/last would shift).
    val evs = Seq(
      (1L, at(0), "signup", 0.0),
      (1L, at(5), "click", 2.0), (1L, at(10), "view", 3.0),
      (1L, at(15), "click", 4.0), (1L, at(20), "view", 5.0),
      (1L, at(25), "error", 9.0),
      (1L, at(30), "click", 1.0), (1L, at(35), "view", 7.0),
      (1L, at(40), "error", 8.0),
      (1L, at(45), "click", 100.0), (1L, at(50), "view", 100.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, COUNT(V.ts) AS n_reps,
        |           SUM(B.value) AS sum_b, AVG(B.value) AS avg_b,
        |           MIN(C.value) AS min_c, MAX(C.value) AS max_c,
        |           FIRST(B.value) AS first_b, LAST(V.value) AS last_v
        |  PATTERN (S ((B C)+ V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', V AS event_type = 'error'
        |)""".stripMargin)
      .selectExpr("user_id", "n_reps", "sum_b", "avg_b", "min_c", "max_c",
        "first_b", "last_v")
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)]
      .collect().toSet
    assert(m == Set((1L, 2L, 7.0, 7.0 / 3.0, 3.0, 7.0, 2.0, 8.0)), m.toString)
  }

  test("ALL ROWS + nested member values: per-row RUNNING SUM/COUNT/AVG " +
       "snapshots; a failed repetition's values never appear") {
    // same corpus as the ONE-ROW values test: two committed repetitions,
    // then a completed sub (values 100) whose tail never arrives — its
    // rows AND values must be absent
    val evs = Seq(
      (1L, at(0), "signup", 0.0),
      (1L, at(5), "click", 2.0), (1L, at(10), "view", 3.0),
      (1L, at(15), "click", 4.0), (1L, at(20), "view", 5.0),
      (1L, at(25), "error", 9.0),
      (1L, at(30), "click", 1.0), (1L, at(35), "view", 7.0),
      (1L, at(40), "error", 8.0),
      (1L, at(45), "click", 100.0), (1L, at(50), "view", 100.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val rows = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES SUM(B.value) AS sum_b, COUNT(C.value) AS n_c,
        |           AVG(B.value) AS avg_b
        |  ALL ROWS PER MATCH
        |  PATTERN (S ((B C)+ V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', V AS event_type = 'error'
        |)""".stripMargin)
      .selectExpr("cls", "ts", "sum_b", "n_c")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getLong(3)))
    assert(rows.sortBy(_._2.getTime).toSeq == Seq(
      ("S", at(0), None, 0L),
      ("B", at(5), Some(2.0), 0L), ("C", at(10), Some(2.0), 1L),
      ("B", at(15), Some(6.0), 1L), ("C", at(20), Some(6.0), 2L),
      ("V", at(25), Some(6.0), 2L),
      ("B", at(30), Some(7.0), 2L), ("C", at(35), Some(7.0), 3L),
      ("V", at(40), Some(7.0), 3L)).sortBy(_._2.getTime), rows.toSeq.toString)
    // running MIN/MAX compose since r18 (per-row vmin/vmax snapshots,
    // null-ignoring like the aggregates)
    val mn = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES MIN(B.value) AS min_b, MAX(B.value) AS max_b
        |  ALL ROWS PER MATCH
        |  PATTERN (S ((B C)+ V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', V AS event_type = 'error'
        |)""".stripMargin)
      .selectExpr("ts", "min_b", "max_b")
      .collect().map(r => (r.getTimestamp(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(mn.sortBy(_._1.getTime).toSeq == Seq(
      (at(0), None, None),
      (at(5), Some(2.0), Some(2.0)), (at(10), Some(2.0), Some(2.0)),
      (at(15), Some(2.0), Some(4.0)), (at(20), Some(2.0), Some(4.0)),
      (at(25), Some(2.0), Some(4.0)),
      (at(30), Some(1.0), Some(4.0)), (at(35), Some(1.0), Some(4.0)),
      (at(40), Some(1.0), Some(4.0))), mn.toSeq.toString)
    // running FIRST/LAST compose since r19 ((value, bound) slot pairs —
    // the former named rejection; the null-freeze corner is pinned in the
    // dedicated r19 spec below): B binds 2, 4, 1 across the committed
    // repetitions — FIRST freezes at 2, LAST tracks the latest binding
    val fl = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES FIRST(B.value) AS first_b, LAST(B.value) AS last_b
        |  ALL ROWS PER MATCH
        |  PATTERN (S ((B C)+ V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', V AS event_type = 'error'
        |)""".stripMargin)
      .selectExpr("ts", "first_b", "last_b")
      .collect().map(r => (r.getTimestamp(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(fl.sortBy(_._1.getTime).toSeq == Seq(
      (at(0), None, None),
      (at(5), Some(2.0), Some(2.0)), (at(10), Some(2.0), Some(2.0)),
      (at(15), Some(2.0), Some(4.0)), (at(20), Some(2.0), Some(4.0)),
      (at(25), Some(2.0), Some(4.0)),
      (at(30), Some(2.0), Some(1.0)), (at(35), Some(2.0), Some(1.0)),
      (at(40), Some(2.0), Some(1.0))), fl.toSeq.toString)
  }

  test("reluctant '+?' mid-pattern binds the minimal single member") {
    def run(pat: String) = MatchRecognize.detect(events,
      s"""MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(C.ts) AS fc, LAST(C.ts) AS lc,
        |           COUNT(C.ts) AS nc, P.ts AS p_ts
        |  PATTERN ($pat)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Timestamp)]
      .collect().toSet
    // user 1 has TWO clicks before the purchase: reluctant C+? takes ONE
    // (the earliest), identical to the explicit {1} lowering — the greedy
    // C+ run would report nc = 2
    val reluctant = run("S C+? P")
    assert(reluctant == run("S C{1} P"))
    assert(reluctant == Set((1L, at(0), at(10), at(10), 1L, at(30))))
    val greedy = run("S C+ P")
    assert(greedy.head._5 == 2L, s"greedy control: $greedy")
  }

  test("reluctant '{n,}?' / '{n,m}?' collapse to exactly n") {
    def run(pat: String) = MatchRecognize.detect(events,
      s"""MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(C.ts) AS fc, LAST(C.ts) AS lc, P.ts AS p_ts
        |  PATTERN ($pat)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Timestamp)].collect().toSet
    val expected = Set((1L, at(0), at(10), at(20), at(30)))
    assert(run("S C{2,}? P") == expected)
    assert(run("S C{2,5}? P") == expected)
    assert(run("S C{2,}? P") == run("S C{2} P"))
  }

  test("reluctant final element — the shape the reference REQUIRES") {
    // StreamExecMatch.scala:203-207 rejects greedy-final patterns; `S C+?`
    // is the canonical compliant spelling and completes at the first C
    val m = MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(C.ts) AS c_ts, COUNT(C.ts) AS nc
        |  PATTERN (S C+?)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(m == Set((1L, at(0), at(10), 1L), (2L, at(0), at(5), 1L)))
  }

  test("inner '*' in a nested group: ((B C)* V)+ from SQL text") {
    val evs = Seq(
      (1L, at(0), "signup"), (1L, at(10), "error"), (1L, at(20), "error"),
      (1L, at(25), "click"), (1L, at(30), "view"), (1L, at(35), "error")
    ).toDF("user_id", "ts", "event_type")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, COUNT(V.ts) AS n_reps, COUNT(B.ts) AS n_inner,
        |           LAST(V.ts) AS last_v
        |  PATTERN (S ((B C)* V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', V AS event_type = 'error'
        |)""".stripMargin)
      .as[(Long, Timestamp, Long, Long, Timestamp)].collect().toSet
    // two tail-only repetitions (V@10, V@20) then one sub + V@35
    assert(m == Set((1L, at(0), 3L, 1L, at(35))), m.toString)
    // FIRST over an inner member is ambiguous under inner '*' (the first
    // repetition may start at a tail) — named rejection steering to the
    // group-level spelling
    val e = intercept[IllegalArgumentException](MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(B.ts) AS fb
        |  PATTERN (S ((B C)* V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', V AS event_type = 'error'
        |)""".stripMargin))
    assert(e.getMessage.contains("inner '*'"), e.getMessage)
  }

  test("reluctant '(B C)+?' and '(B|C)+?' collapse to ONE repetition; " +
       "bare groups are the same single-repetition shape") {
    val evs = Seq(
      (1L, at(0), "signup"), (1L, at(5), "click"), (1L, at(10), "view"),
      (1L, at(15), "click"), (1L, at(20), "view"), (1L, at(25), "purchase")
    ).toDF("user_id", "ts", "event_type")
    def run(pat: String) = MatchRecognize.detect(evs,
      s"""MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(B.ts) AS fb, LAST(C.ts) AS lc,
        |           COUNT(C.ts) AS n, P.ts AS p_ts
        |  PATTERN ($pat)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp, Long, Timestamp)]
      .collect().toSet
    // greedy (B C)+ absorbs BOTH subs (both complete before P@25): n = 2;
    // reluctant (B C)+? takes exactly ONE — identical to the bare group
    assert(run("S (B C)+ P").head._5 == 2L)
    val one = Set((1L, at(0), at(5), at(10), 1L, at(25)))
    assert(run("S (B C)+? P") == one)
    assert(run("S (B C) P") == one)
    // alternation: (B|C)+? = one member of any branch = bare (B|C)
    def runAlt(pat: String) = MatchRecognize.detect(evs,
      s"""MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, B_C.ts AS m_ts, P.ts AS p_ts
        |  PATTERN ($pat)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', P AS event_type = 'purchase'
        |)""".stripMargin)
      .as[(Long, Timestamp, Timestamp, Timestamp)].collect().toSet
    assert(runAlt("S (B|C)+? P") == runAlt("S (B|C) P"))
    assert(runAlt("S (B|C)+? P") == Set((1L, at(0), at(5), at(25))))
  }

  test("'*?' and '??' lower to the ELEMENT-ABSENT compile (r18: reluctant " +
       "zero-minimum prefers zero occurrences, always achievable — the " +
       "pattern sans the element, null/0 measures)") {
    val ctrl = MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, P.ts AS p_ts
        |  PATTERN (S P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)""".stripMargin)
      .select($"s_ts", $"p_ts").as[(Timestamp, Timestamp)].collect().toSet
    assert(ctrl.nonEmpty)
    for (q <- Seq("C*?", "C??", "C{0,3}?")) {
      val m = MatchRecognize.detect(events,
        s"""MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY ts
          |  MEASURES S.ts AS s_ts, P.ts AS p_ts, COUNT(C.ts) AS n_c,
          |           LAST(C.ts) AS c_last, SUM(C.value) AS c_sum
          |  PATTERN (S $q P)
          |  WITHIN INTERVAL '1' HOUR
          |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
          |         P AS event_type = 'purchase'
          |)""".stripMargin)
        .select($"s_ts", $"p_ts", $"n_c", $"c_last", $"c_sum")
        .as[(Timestamp, Timestamp, Long, Option[Timestamp], Option[Double])]
        .collect()
      assert(m.map(r => (r._1, r._2)).toSet == ctrl, s"$q: ${m.toSeq}")
      assert(m.forall(r => r._3 == 0L && r._4.isEmpty && r._5.isEmpty),
        s"$q: ${m.toSeq}")
    }
    // the anchor must bind: an absent FIRST element is a named error
    val e1 = intercept[RuntimeException](MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES P.ts AS p_ts
        |  PATTERN (S*? P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', P AS event_type = 'purchase'
        |)""".stripMargin))
    assert(e1.getMessage.contains("anchor"), e1.getMessage)
    // a DEFINE referencing the absent variable could only read null: named
    // error, not a silently null-poisoned predicate
    val e2 = intercept[RuntimeException](MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts
        |  PATTERN (S C*? P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase' AND P.value > LAST(C.value)
        |)""".stripMargin))
    assert(e2.getMessage.contains("never binds"), e2.getMessage)
    // ...but the reference scan is string-literal-blind: 'c.example.com'
    // inside a predicate is NOT a reference to variable C (review find)
    MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts
        |  PATTERN (S C*? P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase' AND 'c.example.com' = 'c.example.com'
        |)""".stripMargin).collect()
    // duplicate variable names: always broken (aliased bound columns), and
    // SILENTLY wrong under the absent lowering (the bound C's measures
    // would null) — named error (review find)
    val e3 = intercept[RuntimeException](MatchRecognize.detect(events,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES S.ts AS s_ts, COUNT(C.ts) AS n_c
        |  PATTERN (S C C*? P)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', C AS event_type = 'click',
        |         P AS event_type = 'purchase'
        |)""".stripMargin))
    assert(e3.getMessage.contains("more than once"), e3.getMessage)
  }

  test("depth-3 nested group SQL front door: ((((B C)+ V)+ W)+ X)+ parity " +
       "with the Pattern API walk, COUNT at all four levels") {
    // the CepPatternSpec hand-walked corpus: one outer repetition holding
    // 3 level-2 reps, 4 level-1 reps, 5 inner subs, closing at x@40
    val evs = Seq(
      (1L, at(0), "signup", 0.0),
      (1L, at(2), "click", 0.0), (1L, at(4), "view", 0.0),
      (1L, at(5), "click", 0.0), (1L, at(6), "view", 0.0), (1L, at(8), "error", 0.0),
      (1L, at(10), "click", 0.0), (1L, at(12), "view", 0.0), (1L, at(14), "error", 0.0),
      (1L, at(15), "purchase", 5.0),
      (1L, at(16), "click", 0.0), (1L, at(18), "view", 0.0), (1L, at(20), "error", 0.0),
      (1L, at(22), "purchase", 3.0),
      (1L, at(24), "click", 0.0), (1L, at(26), "view", 0.0), (1L, at(28), "error", 0.0),
      (1L, at(30), "purchase", 7.0),
      (1L, at(40), "refund", 9.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val m = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(B.ts) AS first_b, LAST(X.ts) AS last_x,
        |           COUNT(X.ts) AS n_outer, COUNT(W.ts) AS n_mid2,
        |           COUNT(V.ts) AS n_mid, COUNT(B.ts) AS n_inner,
        |           SUM(W.value) AS w_sum
        |  PATTERN (S ((((B C)+ V)+ W)+ X)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 'signup', B AS event_type = 'click',
        |         C AS event_type = 'view', V AS event_type = 'error',
        |         W AS event_type = 'purchase', X AS event_type = 'refund'
        |)""".stripMargin)
      .select($"s_ts", $"first_b", $"last_x", $"n_outer", $"n_mid2",
        $"n_mid", $"n_inner", $"w_sum")
      .as[(Timestamp, Timestamp, Timestamp, Long, Long, Long, Long, Double)]
      .collect().toSet
    assert(m == Set((at(0), at(2), at(40), 1L, 3L, 4L, 5L, 15.0)), m.toString)
  }

  test("running FIRST/LAST per-row snapshots freeze a NULL first binding " +
       "(r19, the last per-row value rejection lifted): positional " +
       "nullability rides the (value, bound) pair, not the value") {
    // first C binds NULL, second binds 5.0, third binds NULL again:
    // running FIRST must STAY null after c@8 (frozen at the null first
    // binding — a null-ignoring impl would report 5.0), and running LAST
    // at c@14 must be null (the latest positional binding — a
    // null-ignoring impl would keep 5.0)
    val evs = Seq(
      (1L, at(0), "s", Option.empty[Double]),
      (1L, at(2), "b", None), (1L, at(4), "c", None),
      (1L, at(6), "b", None), (1L, at(8), "c", Some(5.0)),
      (1L, at(10), "v", None),
      (1L, at(12), "b", None), (1L, at(14), "c", None),
      (1L, at(16), "v", None)
    ).toDF("user_id", "ts", "event_type", "value")
    // depth-1 nested walk
    val d1 = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(C.value) AS first_c,
        |           LAST(C.value) AS last_c
        |  ALL ROWS PER MATCH
        |  PATTERN (S ((B C)+ V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v'
        |)""".stripMargin)
      .select($"cls", $"ts", $"first_c", $"last_c")
      .as[(String, Timestamp, Option[Double], Option[Double])]
      .collect().toSet
    val want = Set[(String, Timestamp, Option[Double], Option[Double])](
      ("S", at(0), None, None),
      ("B", at(2), None, None),
      ("C", at(4), None, None), // first binding IS null: both frozen null
      ("B", at(6), None, None),
      ("C", at(8), None, Some(5.0)), // FIRST stays frozen at null
      ("V", at(10), None, Some(5.0)),
      ("B", at(12), None, Some(5.0)),
      ("C", at(14), None, None), // positional LAST: the null binding
      ("V", at(16), None, None))
    assert(d1 == want, d1.toString)
    // depth-2 walk (the depth-parametric repAt path): same corpus with a
    // tail W closing the outer repetition
    val evs2 = evs.union(Seq((1L, at(18), "w", Option.empty[Double]))
      .toDF("user_id", "ts", "event_type", "value"))
    val d2 = MatchRecognize.detect(evs2,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(C.value) AS first_c,
        |           LAST(C.value) AS last_c
        |  ALL ROWS PER MATCH
        |  PATTERN (S (((B C)+ V)+ W)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v',
        |         W AS event_type = 'w'
        |)""".stripMargin)
      .select($"cls", $"ts", $"first_c", $"last_c")
      .as[(String, Timestamp, Option[Double], Option[Double])]
      .collect().toSet
    assert(d2 == want + (("W", at(18), None, None)), d2.toString)
    // ONE ROW committed FIRST/LAST were always positional (commitPending):
    // both null on this corpus — pinned so the row snapshots and the
    // committed aggregates cannot diverge
    val one = MatchRecognize.detect(evs,
      """MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts
        |  MEASURES S.ts AS s_ts, FIRST(C.value) AS first_c,
        |           LAST(C.value) AS last_c, MAX(C.value) AS max_c
        |  PATTERN (S ((B C)+ V)+)
        |  WITHIN INTERVAL '1' HOUR
        |  DEFINE S AS event_type = 's', B AS event_type = 'b',
        |         C AS event_type = 'c', V AS event_type = 'v'
        |)""".stripMargin)
      .select($"first_c", $"last_c", $"max_c")
      .as[(Option[Double], Option[Double], Option[Double])]
      .collect().toSet
    assert(one == Set((None, None, Some(5.0))), one.toString)
  }
}
