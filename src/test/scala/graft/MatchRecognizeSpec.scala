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
}
