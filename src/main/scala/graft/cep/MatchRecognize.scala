package graft.cep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQL front door for CEP: a MATCH_RECOGNIZE-subset parser compiling to the
  * [[Pattern]] combinator API — the reference plans the full clause through
  * its Blink planner (flink-table/flink-table-planner-blink/src/main/scala/
  * org/apache/flink/table/planner/plan/nodes/physical/stream/
  * StreamExecMatch.scala; behavior fixture MatchRecognizeITCase.scala).
  *
  * Supported subset (one clause each, in this order):
  * {{{
  * MATCH_RECOGNIZE (
  *   PARTITION BY <col>
  *   ORDER BY <col>
  *   MEASURES <item>, ...        -- <item> ::= V.<col> AS alias
  *                               --          | FIRST(V.<col>) AS alias
  *                               --          | LAST(V.<col>)  AS alias
  *                               --          | SUM(V.<col>)   AS alias
  *                               --          | COUNT(V.<col>) AS alias
  *   [AFTER MATCH SKIP PAST LAST ROW | AFTER MATCH SKIP TO NEXT ROW]
  *   PATTERN (V1 V2[?|{n}|{n,m}] ...) -- linear; '?' = optional,
  *                               -- '{n}' = times(n), '{n,m}' = greedy range
  *                               -- (timesRange: n mandatory + up to m-n more);
  *                               -- (B|C) = alternation (followedByOneOf):
  *                               -- the group binds as variable "B_C" and
  *                               -- `B_C.cls AS alias` measures the matched
  *                               -- branch (the SQL CLASSIFIER() analog)
  *   WITHIN INTERVAL '<n>' <SECOND|MINUTE|HOUR|DAY>
  *   DEFINE V1 AS <predicate>, ...  -- Spark SQL boolean exprs over the event
  *                                  -- row; vars left undefined match TRUE
  * )
  * }}}
  * Semantics are [[Pattern]]'s (flink-cep relaxed contiguity,
  * skip-till-next, earliest binding). Measures over non-timestamp columns
  * bind the column at the step via [[Pattern.bind]] (earliest-(ts, value)
  * struct-min binding); FIRST/LAST/SUM/COUNT index or fold over a quantified
  * variable's `{n}` expansions (reference MatchRecognizeITCase.scala's
  * `SUM(A.price)`-style aggregate measures). AFTER MATCH SKIP PAST LAST ROW
  * lowers to [[Pattern.afterMatchSkipPastLastEvent]]; SKIP TO NEXT ROW is
  * this compilation's default (each start row opens at most one match), so
  * the clause parses as an explicit no-op.
  */
object MatchRecognize {

  private val UnitMs = Map("SECOND" -> 1000L, "MINUTE" -> 60000L,
    "HOUR" -> 3600000L, "DAY" -> 86400000L)

  private case class PatternVar(name: String, quant: Option[String],
                                alts: Seq[String] = Nil)
  private case class Measure(fn: Option[String], varName: String,
                             field: String, alias: String)
  private case class Spec(partitionBy: String, orderBy: String,
                          measures: Seq[Measure], vars: Seq[PatternVar],
                          withinMs: Long, defines: Map[String, String],
                          skipPastLast: Boolean)

  private def sectionRx(name: String, stopAt: String) =
    (s"(?is)\\b$name\\b\\s+(.*?)\\s*(?=\\b(?:$stopAt)\\b)").r

  private def parse(sql: String): Spec = {
    val body = "(?is)\\s*MATCH_RECOGNIZE\\s*\\((.*)\\)\\s*".r
      .findFirstMatchIn(sql)
      .getOrElse(sys.error("expected MATCH_RECOGNIZE ( ... )"))
      .group(1)
    def section(name: String, stopAt: String): Option[String] =
      sectionRx(name, stopAt).findFirstMatchIn(body).map(_.group(1).trim)
    val partitionBy = section("PARTITION\\s+BY", "ORDER").getOrElse(sys.error("PARTITION BY required"))
    val orderBy = section("ORDER\\s+BY", "MEASURES|AFTER|PATTERN").getOrElse(sys.error("ORDER BY required"))
    val measures = section("MEASURES", "AFTER|PATTERN").toSeq.flatMap(_.split(",").toSeq).map { m =>
      "(?is)\\s*(?:(FIRST|LAST|SUM|COUNT)\\s*\\(\\s*)?(\\w+)\\.(\\w+)\\s*\\)?\\s+AS\\s+(\\w+)\\s*".r
        .findFirstMatchIn(m)
        .map(g => Measure(Option(g.group(1)).map(_.toUpperCase), g.group(2),
          g.group(3), g.group(4)))
        .getOrElse(sys.error(s"unsupported MEASURES item: $m " +
          "(only [FIRST|LAST|SUM|COUNT](V.col) AS alias)"))
    }
    val skipPastLast =
      "(?is)\\bAFTER\\s+MATCH\\s+SKIP\\s+PAST\\s+LAST\\s+ROW\\b".r.findFirstIn(body).nonEmpty
    // one level of nesting for alternation groups: (A (B|C) D)
    val patternBody = "(?is)\\bPATTERN\\s*\\(((?:[^()]|\\([^()]*\\))*)\\)".r
      .findFirstMatchIn(body)
      .getOrElse(sys.error("PATTERN (...) required")).group(1).trim
    // elements: a bare variable with an optional quantifier, or an
    // alternation group (B|C) — named by joining its branches
    val vars = "(?:\\((\\w+(?:\\|\\w+)+)\\)|(\\w+))(\\?|\\{(\\d+)(?:,(\\d+))?\\})?".r
      .findAllMatchIn(patternBody).map { g =>
        Option(g.group(1)) match {
          case Some(alt) =>
            val branches = alt.split("\\|").toSeq
            require(g.group(3) == null, "alternation groups cannot be quantified")
            PatternVar(branches.mkString("_"), None, branches)
          case None => PatternVar(g.group(2), Option(g.group(3)))
        }
      }.toSeq
    require(vars.nonEmpty, "PATTERN must bind at least one variable")
    val within = "(?is)\\bWITHIN\\s+INTERVAL\\s+'(\\d+)'\\s+(\\w+?)S?\\b".r
      .findFirstMatchIn(body).getOrElse(sys.error("WITHIN INTERVAL '<n>' <unit> required"))
    val withinMs = within.group(1).toLong *
      UnitMs.getOrElse(within.group(2).toUpperCase, sys.error(s"unit ${within.group(2)}"))
    // DEFINE is the last clause: take everything after the keyword
    val defines = "(?is)\\bDEFINE\\b\\s+(.*)".r.findFirstMatchIn(body)
      .map(_.group(1).trim).map { d =>
      // split on commas that start the next `V AS ...` item, so predicates
      // may contain function-call commas
      d.split(",(?=\\s*\\w+\\s+(?i:AS)\\s)").toSeq.map { item =>
        val m = "(?is)\\s*(\\w+)\\s+AS\\s+(.*)".r.findFirstMatchIn(item)
          .getOrElse(sys.error(s"bad DEFINE item: $item"))
        m.group(1) -> m.group(2).trim
      }.toMap
    }.getOrElse(Map.empty)
    Spec(partitionBy, orderBy, measures, vars, withinMs, defines, skipPastLast)
  }

  private def predOf(spec: Spec, v: String): Column =
    spec.defines.get(v).map(expr).getOrElse(lit(true))

  /** Parse `sql` and run the compiled pattern over `events`. Output: the
    * partition column (under its own name) + one column per MEASURES item;
    * with no MEASURES clause, the raw [[Pattern.detect]] binding columns. */
  def detect(events: DataFrame, sql: String): DataFrame = {
    val spec = parse(sql)
    // non-timestamp columns referenced by measures must be bound at the
    // step — except `cls` on an alternation group, which the compile emits
    // automatically (the CLASSIFIER analog, not an event column)
    val altVars = spec.vars.filter(_.alts.nonEmpty).map(_.name).toSet
    val keepByVar: Map[String, Seq[String]] = spec.measures
      .filter(m => m.field != "ts" && !(altVars(m.varName) && m.field == "cls"))
      .groupBy(_.varName)
      .map { case (v, ms) => v -> ms.map(_.field).distinct }
    require(spec.vars.head.alts.isEmpty, "first pattern variable cannot be an alternation")
    var pat = Pattern.begin(spec.vars.head.name, predOf(spec, spec.vars.head.name))
    require(spec.vars.head.quant.isEmpty, "first pattern variable cannot be quantified")
    keepByVar.get(spec.vars.head.name).foreach(ks => pat = pat.bind(ks: _*))
    spec.vars.tail.foreach { v =>
      if (v.alts.nonEmpty)
        pat = pat.followedByOneOf(v.name, v.alts.map(b => b -> predOf(spec, b)): _*)
      else {
        pat = pat.followedBy(v.name, predOf(spec, v.name))
        v.quant.foreach {
          case "?" => pat = pat.optional()
          case q =>
            val b = q.stripPrefix("{").stripSuffix("}").split(",")
            val (from, to) = if (b.length == 2) (b(0).toInt, b(1).toInt)
                             else (b(0).toInt, b(0).toInt)
            // {n,n} is valid MATCH_RECOGNIZE syntax and means exactly-n:
            // lower to times(n), not timesRange (which requires to > from)
            if (from == to) {
              require(from >= 1, s"quantifier {$from} on ${v.name} must be >= 1")
              pat = pat.times(from)
            } else {
              require(from >= 1, s"quantifier {$from,$to} on ${v.name}: a zero " +
                "lower bound is not supported — use '?' for an optional step")
              pat = pat.timesRange(from, to)
            }
        }
      }
      keepByVar.get(v.name).foreach { ks =>
        // bind() (value measures) needs a fixed occurrence count; catch the
        // documented-syntax-but-unbindable combinations here with a named
        // error instead of Pattern.bind's opaque require
        val inexact = v.quant.exists {
          case "?" => true
          case q =>
            val b = q.stripPrefix("{").stripSuffix("}").split(",")
            b.length == 2 && b(0) != b(1)
        }
        require(!inexact, s"value measures over ${v.name} (${ks.mkString(", ")}) " +
          s"need an exact {n} quantifier, not ${v.quant.get}")
        pat = pat.bind(ks: _*)
      }
    }
    if (spec.skipPastLast) pat = pat.afterMatchSkipPastLastEvent()
    val matches = pat.within(spec.withinMs)
      .detect(events, col(spec.partitionBy), col(spec.orderBy))
    if (spec.measures.isEmpty) matches
    else {
      // (min, max) occurrences per variable: '?' = (0,1), '{n}' = (n,n),
      // '{n,m}' = (n,m), unquantified = (1,1)
      val bounds: Map[String, (Int, Int)] = spec.vars.map { v =>
        v.name -> (v.quant match {
          case Some("?") => (0, 1)
          case Some(q) if q.startsWith("{") =>
            val b = q.stripPrefix("{").stripSuffix("}").split(",")
            if (b.length == 2) (b(0).toInt, b(1).toInt) else (b(0).toInt, b(0).toInt)
          case _ => (1, 1)
        })
      }.toMap
      val cols = spec.measures.map { m =>
        val (mn, mx) = bounds.getOrElse(m.varName, sys.error(s"unknown variable ${m.varName}"))
        // one source column per expansion: V_field or V_i_field; with a
        // range quantifier the tail expansions are nullable
        val srcs = if (mx == 1) Seq(s"${m.varName}_${m.field}")
                   else (1 to mx).map(i => s"${m.varName}_${i}_${m.field}")
        val c = m.fn match {
          case None =>
            require(mx == 1, s"${m.varName} is quantified — use FIRST/LAST/SUM/COUNT")
            col(srcs.head)
          case Some("FIRST") => col(srcs.head)
          case Some("LAST") =>
            if (mn == mx) col(srcs.last) else coalesce(srcs.reverse.map(col): _*)
          case Some("SUM") =>
            require(mn == mx, s"SUM(${m.varName}.${m.field}) needs an exact {n} quantifier")
            srcs.map(col).reduce(_ + _)
          case Some("COUNT") =>
            srcs.map(s => when(col(s).isNotNull, 1L).otherwise(0L)).reduce(_ + _)
          case Some(f) => sys.error(s"unsupported measure function $f")
        }
        c.as(m.alias)
      }
      matches.select(col("key").as(spec.partitionBy) +: cols: _*)
    }
  }
}
