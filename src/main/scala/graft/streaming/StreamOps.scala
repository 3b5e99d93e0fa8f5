package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analogs of the reference's DataStream API:
  *  - windowed aggregates: flink-streaming-java/.../windowing/assigners
  *  - deduplication: Blink StreamExecDeduplicate
  *  - ProcessFunction + keyed state + timers:
  *    flink-streaming-java/.../functions/KeyedProcessFunction.java →
  *    flatMapGroupsWithState with event-time timeout
  *  - intervalJoin: KeyedStream#intervalJoin → watermarked stream-stream join
  *  - CEP followed-by: flink-libraries/flink-cep NFA → NFA-lite in keyed state
  *
  * State scale: every op keys its state by the grouping columns, and the
  * watermark bounds state retention — at 100 TB/day the state store holds
  * only the watermark horizon per key, exactly like Flink's keyed state
  * backend with TTL.
  */
// State/row types live at package level: Janino-generated encoder code cannot
// construct nested-in-object (outer-pointer) case classes.
case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
case class SessionOut(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                      n: Long, sum_value: Double)
case class PairOut(user_id: Long, first_ts: Timestamp, second_ts: Timestamp)
case class SessionAcc(startMs: Long, lastMs: Long, n: Long, sum: Double)
case class CepAcc(pendingFirstMs: List[Long])
case class Scored(tsMs: Long, value: Double)
case class TopNAcc(top: List[Scored])
case class TopNOut(user_id: Long, rank: Int, value: Double, ts: Timestamp)
case class Tagged(user_id: Long, tsMs: Long, side: String)
case class CoAcc(leftMs: List[Long], rightMs: List[Long])
case class MatchOut(user_id: Long, left_ts: Timestamp, right_ts: Timestamp)
case class Partial(boundMs: List[Long]) // bound step times, newest first
case class CepPatternAcc(partials: List[Partial])
case class PatternMatch(user_id: Long, step_ts: Seq[Timestamp])

object StreamOps {
  type Event = graft.streaming.Event
  val Event = graft.streaming.Event

  /** TUMBLE with watermark-bounded state. */
  def tumblingAgg(events: DataFrame, watermark: String, size: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** HOP (sliding) with watermark-bounded state. */
  def slidingAgg(events: DataFrame, watermark: String, size: String, slide: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** SESSION windows (gap-merged, native session_window). */
  def sessionAgg(events: DataFrame, watermark: String, gap: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n"), col("sum_value"))

  /** Keyed dedup under a watermark (Blink deduplicate-keep-first). */
  def dedupWithinWatermark(events: DataFrame, watermark: String, keys: Seq[String]): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)

  /** ProcessFunction analog: explicit sessionization with keyed state and an
    * event-time timer. Emits a session when the watermark passes
    * last-event + gap. */
  def sessionize(events: Dataset[Event], watermark: String, gapMs: Long): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val accEnc = Encoders.product[SessionAcc]
    implicit val keyEnc = Encoders.scalaLong
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val acc = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(acc.startMs),
              new Timestamp(acc.lastMs + gapMs), acc.n, acc.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var acc = state.getOption.orNull
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (acc == null) acc = SessionAcc(t, t, 1L, e.value)
              else if (t - acc.lastMs < gapMs)
                acc = acc.copy(lastMs = math.max(acc.lastMs, t), n = acc.n + 1, sum = acc.sum + e.value)
              else { // gap exceeded within a batch: close the old session inline
                out += SessionOut(userId, new Timestamp(acc.startMs),
                  new Timestamp(acc.lastMs + gapMs), acc.n, acc.sum)
                acc = SessionAcc(t, t, 1L, e.value)
              }
            }
            state.update(acc)
            state.setTimeoutTimestamp(acc.lastMs + gapMs)
            out.result().iterator
          }
      }
  }

  /** CEP followed-by: emit (first, second) when `secondType` arrives within
    * `windowMs` of a pending `firstType` for the same key. */
  def cepFollowedBy(events: Dataset[Event], watermark: String,
                    firstType: String, secondType: String, windowMs: Long): Dataset[PairOut] = {
    implicit val outEnc = Encoders.product[PairOut]
    implicit val accEnc = Encoders.product[CepAcc]
    implicit val keyEnc = Encoders.scalaLong
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CepAcc, PairOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[CepAcc]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var pending = state.getOption.map(_.pendingFirstMs).getOrElse(Nil)
          val out = Seq.newBuilder[PairOut]
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (e.event_type == firstType) pending = (t :: pending).take(64)
            else if (e.event_type == secondType) {
              pending.filter(f => t > f && t - f <= windowMs).sorted.headOption.foreach { f =>
                out += PairOut(userId, new Timestamp(f), new Timestamp(t))
              }
              pending = pending.filterNot(f => t > f && t - f <= windowMs)
            }
          }
          state.update(CepAcc(pending))
          out.result().iterator
      }
  }

  /** Flink intervalJoin on streams: right rows within (left.ts, left.ts+upper].
    * joinType "left_outer"/"full_outer" gives Flink's outer interval-join
    * semantics: the unmatched side is emitted null-extended once the
    * watermark proves no in-window partner can still arrive. */
  def streamStreamIntervalJoin(left: DataFrame, right: DataFrame,
                               leftWm: String, rightWm: String, upper: String,
                               joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", leftWm).as("l")
    val r = right.withWatermark("ts", rightWm).as("r")
    l.join(r, expr(
      s"l.user_id = r.user_id AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL $upper"),
      joinType)
  }

  /** Streaming Top-N per key — the Blink streaming Rank operator
    * (reference flink-table-planner-blink/.../physical/stream/
    * StreamExecRank.scala, UpdatableTopNFunction): keyed state holds only the
    * current top `n` rows; whenever an arriving event changes the top set, the
    * refreshed ranking for that key is re-emitted (update semantics, so the
    * sink sees upsert-style rows exactly like Flink's retract stream).
    * State is O(n) per key regardless of stream length. */
  def streamingTopN(events: Dataset[Event], watermark: String, n: Int): Dataset[TopNOut] = {
    implicit val outEnc = Encoders.product[TopNOut]
    implicit val accEnc = Encoders.product[TopNAcc]
    implicit val keyEnc = Encoders.scalaLong
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TopNAcc, TopNOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[TopNAcc]) =>
          val prev = state.getOption.map(_.top).getOrElse(Nil)
          // deterministic order: value desc, then event time asc as tie-break
          val ord = Ordering.by((s: Scored) => (-s.value, s.tsMs))
          val top = (prev ++ rows.map(e => Scored(e.ts.getTime, e.value)))
            .sorted(ord).take(n)
          if (top == prev) Iterator.empty
          else {
            state.update(TopNAcc(top))
            top.iterator.zipWithIndex.map { case (s, i) =>
              TopNOut(userId, i + 1, s.value, new Timestamp(s.tsMs))
            }
          }
      }
  }

  /** Side outputs (reference flink-streaming-java/.../functions/
    * ProcessFunction.java OutputTag): one pass over each micro-batch, routed
    * to per-predicate sinks inside foreachBatch. The batch is persisted so
    * the source is read ONCE regardless of how many outputs exist — the same
    * single-pass guarantee as Flink's side-output collector. */
  def sideOutputs(stream: DataFrame,
                  routes: Seq[(org.apache.spark.sql.Column, DataFrame => Unit)]): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      batch.persist()
      try routes.foreach { case (pred, sink) => sink(batch.filter(pred)) }
      finally batch.unpersist()
    }

  /** Connected streams + CoProcessFunction (reference
    * flink-streaming-java/.../datastream/ConnectedStreams.java,
    * CoProcessFunction): two streams keyed the same share one keyed state.
    * Earliest-pending matching: a left event pairs with the earliest
    * unmatched right event for the key (and vice versa), emitted on arrival
    * of the second side. State holds only unmatched timestamps. */
  def coProcessMatch(left: Dataset[Event], right: Dataset[Event],
                     watermark: String): Dataset[MatchOut] = {
    val spark = left.sparkSession
    import spark.implicits._
    implicit val accEnc = Encoders.product[CoAcc]
    val tagged = left.withWatermark("ts", watermark)
      .map(e => Tagged(e.user_id, e.ts.getTime, "L"))
      .unionByName(right.withWatermark("ts", watermark)
        .map(e => Tagged(e.user_id, e.ts.getTime, "R")))
    tagged.groupByKey(_.user_id)
      .flatMapGroupsWithState[CoAcc, MatchOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Tagged], state: GroupState[CoAcc]) =>
          var acc = state.getOption.getOrElse(CoAcc(Nil, Nil))
          val out = Seq.newBuilder[MatchOut]
          rows.toSeq.sortBy(t => (t.tsMs, t.side)).foreach { t =>
            if (t.side == "L") acc.rightMs.sorted.headOption match {
              case Some(r) => out += MatchOut(userId, new Timestamp(t.tsMs), new Timestamp(r))
                acc = CoAcc(acc.leftMs, acc.rightMs.diff(List(r)))
              case None => acc = CoAcc((t.tsMs :: acc.leftMs).take(1024), acc.rightMs)
            } else acc.leftMs.sorted.headOption match {
              case Some(l) => out += MatchOut(userId, new Timestamp(l), new Timestamp(t.tsMs))
                acc = CoAcc(acc.leftMs.diff(List(l)), acc.rightMs)
              case None => acc = CoAcc(acc.leftMs, (t.tsMs :: acc.rightMs).take(1024))
            }
          }
          state.update(acc)
          out.result().iterator
      }
  }

  /** Streaming linear CEP — the unbounded counterpart of
    * `graft.cep.Pattern.detect` (reference flink-libraries/flink-cep NFA on
    * DataStream): every event matching step 0 opens a partial match; each
    * later step binds the first following event matching its predicate
    * within `withinMs` of the start. Completed matches emit immediately.
    * Negative (notFollowedBy) endings need window-expiry emission and are
    * batch-only. State per key is bounded: at most `maxPartials` open
    * partial matches survive a micro-batch. */
  def cepPattern(events: Dataset[Event], watermark: String,
                 steps: Seq[Event => Boolean], withinMs: Long,
                 maxPartials: Int = 256): Dataset[PatternMatch] = {
    require(steps.size >= 2, "a pattern needs at least two steps")
    implicit val outEnc = Encoders.product[PatternMatch]
    implicit val accEnc = Encoders.product[CepPatternAcc]
    implicit val keyEnc = Encoders.scalaLong
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CepPatternAcc, PatternMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[CepPatternAcc]) =>
          var partials = state.getOption.map(_.partials).getOrElse(Nil)
          val out = Seq.newBuilder[PatternMatch]
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val t = e.ts.getTime
            // advance every open partial expecting its next step (earliest binds:
            // events arrive time-sorted, so the first candidate wins)
            partials = partials.flatMap { p =>
              val i = p.boundMs.length
              val start = p.boundMs.last
              if (t <= start + withinMs && t > p.boundMs.head && steps(i)(e)) {
                val bound = t :: p.boundMs
                if (bound.length == steps.size) {
                  out += PatternMatch(userId,
                    bound.reverse.map(new Timestamp(_)))
                  None // completed
                } else Some(Partial(bound))
              } else if (start + withinMs < t) None // expired
              else Some(p)
            }
            if (steps.head(e)) partials = (Partial(List(t)) :: partials).take(maxPartials)
          }
          state.update(CepPatternAcc(partials))
          out.result().iterator
      }
  }

  /** Stream-static enrichment (broadcast dimension join). */
  def streamStaticEnrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left_outer")

  /** Broadcast state analog (Flink BroadcastConnectedStream /
    * BroadcastProcessFunction, flink-streaming-java/.../datastream/
    * BroadcastConnectedStream.java): a small, slowly-changing rule set
    * visible to every task. In Structured Streaming the idiomatic mechanism
    * is foreachBatch — each micro-batch re-loads the current rules snapshot
    * and broadcast-joins it, so rule updates take effect at the next trigger
    * (same refresh granularity as Flink's broadcast-side elements). */
  def broadcastRulesEnrich(stream: DataFrame, loadRules: () => DataFrame,
                           key: String)(sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
      sink(batch.join(broadcast(loadRules()), Seq(key), "left_outer"))
    }.start()
}
