package graft.cep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CEP pattern API — the reference's flink-cep surface
  * (flink-libraries/flink-cep/src/main/java/org/apache/flink/cep/pattern/
  * Pattern.java: begin/where/followedBy/notFollowedBy/times/within),
  * re-expressed as a compiler from a linear pattern spec to declarative
  * Spark plans instead of a per-event NFA
  * (flink-libraries/flink-cep/.../nfa/NFA.java).
  *
  * Semantics (matching flink-cep defaults for relaxed contiguity +
  * skip-till-next): every event matching the first step starts a candidate
  * match; each following step binds the EARLIEST event of the same key that
  * matches its predicate, is strictly after the previous binding, and falls
  * within `within` of the match start. A `times(n)` step binds n such events
  * in sequence. A terminal `notFollowedBy` requires NO matching event in the
  * remainder of the window.
  *
  * Scale: each step compiles to one keyed equi-join with a time-range
  * residual plus a min-aggregation — shuffles are on the key only, state is
  * never materialized per-NFA, and Catalyst/AQE optimize the whole pipeline
  * (broadcast small sides, skew-split hot keys). An NFA translation would
  * serialize per key; this stays embarrassingly parallel in the key space.
  */
final case class Step(name: String, pred: Column, reps: Int = 1, opt: Boolean = false)

final class Pattern private (steps: Vector[Step], notStep: Option[Step],
                             windowMs: Option[Long]) {

  def followedBy(name: String, pred: Column): Pattern = {
    require(notStep.isEmpty, "notFollowedBy must be the terminal step")
    new Pattern(steps :+ Step(name, pred), notStep, windowMs)
  }

  /** Quantifier on the LAST added step: bind n successive occurrences. */
  def times(n: Int): Pattern = {
    require(n >= 1 && steps.nonEmpty)
    new Pattern(steps.init :+ steps.last.copy(reps = n), notStep, windowMs)
  }

  /** Make the LAST added step optional (flink-cep `optional()`): a match may
    * skip it; its `<name>_ts` column is null when skipped. Not valid on the
    * first step. */
  def optional(): Pattern = {
    require(steps.size >= 2, "optional() applies to a followedBy step")
    require(steps.last.reps == 1, "optional() and times(n) are exclusive")
    new Pattern(steps.init :+ steps.last.copy(opt = true), notStep, windowMs)
  }

  def notFollowedBy(name: String, pred: Column): Pattern =
    new Pattern(steps, Some(Step(name, pred)), windowMs)

  /** Match window measured from the first step's event time. */
  def within(ms: Long): Pattern = new Pattern(steps, notStep, Some(ms))

  /** Compile to a DataFrame of matches: one row per match, one `<name>_ts`
    * column per binding (suffixed `_1.._n` for quantified steps). */
  def detect(events: DataFrame, key: Column, ts: Column): DataFrame = {
    require(windowMs.nonEmpty, "call within(...) before detect")
    // exact millisecond interval: integer-dividing into whole seconds would
    // silently shrink windows like within(1500) and break parity with the
    // streaming cepPattern, which honors withinMs exactly
    val win = expr(s"INTERVAL ${windowMs.get} MILLISECONDS")
    val expanded: Vector[(String, Column, Boolean)] = steps.flatMap { s =>
      if (s.reps == 1) Vector((s.name, s.pred, s.opt))
      else (1 to s.reps).map(i => (s"${s.name}_$i", s.pred, false)).toVector
    }
    val first = expanded.head
    var out = events.filter(first._2)
      .select(key.as("__k"), ts.as(s"${first._1}_ts"))
    val startTs = s"${first._1}_ts"
    // the "time of the previous binding": for optional steps this falls back
    // to the binding before them when the step was skipped
    var prevTs: Column = col(startTs)
    expanded.tail.foreach { case (name, pred, opt) =>
      val cand = events.filter(pred).select(key.as("__k2"), ts.as("__cts"))
      val kept = out.columns.map(col)
      out = out.join(cand,
          col("__k") === col("__k2") && col("__cts") > prevTs &&
            col("__cts") <= col(startTs) + win,
          if (opt) "left_outer" else "inner")
        .groupBy(kept.toIndexedSeq: _*)
        .agg(min(col("__cts")).as(s"${name}_ts"))
      prevTs = if (opt) coalesce(col(s"${name}_ts"), prevTs) else col(s"${name}_ts")
    }
    notStep.foreach { s =>
      val cand = events.filter(s.pred).select(key.as("__k2"), ts.as("__cts"))
      out = out.join(cand,
        col("__k") === col("__k2") && col("__cts") > prevTs &&
          col("__cts") <= col(startTs) + win, "left_anti")
    }
    out.withColumnRenamed("__k", "key")
  }
}

object Pattern {
  def begin(name: String, pred: Column): Pattern =
    new Pattern(Vector(Step(name, pred)), None, None)
}
