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
  *   MEASURES <item>, ...        -- <item> ::= V.ts AS alias
  *                               --          | FIRST(V.ts) AS alias
  *                               --          | LAST(V.ts)  AS alias
  *   PATTERN (V1 V2[?|{n}] ...)  -- linear; '?' = optional, '{n}' = times(n)
  *   WITHIN INTERVAL '<n>' <SECOND|MINUTE|HOUR|DAY>
  *   DEFINE V1 AS <predicate>, ...  -- Spark SQL boolean exprs over the event
  *                                  -- row; vars left undefined match TRUE
  * )
  * }}}
  * Semantics are [[Pattern]]'s (flink-cep relaxed contiguity,
  * skip-till-next, earliest binding); measures are restricted to binding
  * timestamps because that is what the batch NFA-free compilation retains.
  * FIRST/LAST index into a quantified variable's bindings (`V_1`/`V_n`).
  */
object MatchRecognize {

  private val UnitMs = Map("SECOND" -> 1000L, "MINUTE" -> 60000L,
    "HOUR" -> 3600000L, "DAY" -> 86400000L)

  private case class PatternVar(name: String, quant: Option[String])
  private case class Measure(fn: Option[String], varName: String, alias: String)
  private case class Spec(partitionBy: String, orderBy: String,
                          measures: Seq[Measure], vars: Seq[PatternVar],
                          withinMs: Long, defines: Map[String, String])

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
    val orderBy = section("ORDER\\s+BY", "MEASURES|PATTERN").getOrElse(sys.error("ORDER BY required"))
    val measures = section("MEASURES", "PATTERN").toSeq.flatMap(_.split(",").toSeq).map { m =>
      "(?is)\\s*(?:(FIRST|LAST)\\s*\\(\\s*)?(\\w+)\\.ts\\s*\\)?\\s+AS\\s+(\\w+)\\s*".r
        .findFirstMatchIn(m)
        .map(g => Measure(Option(g.group(1)).map(_.toUpperCase), g.group(2), g.group(3)))
        .getOrElse(sys.error(s"unsupported MEASURES item: $m (only [FIRST|LAST](V.ts) AS alias)"))
    }
    val patternBody = "(?is)\\bPATTERN\\s*\\(([^)]*)\\)".r.findFirstMatchIn(body)
      .getOrElse(sys.error("PATTERN (...) required")).group(1).trim
    val vars = "(\\w+)(\\?|\\{(\\d+)\\})?".r.findAllMatchIn(patternBody).map { g =>
      PatternVar(g.group(1), Option(g.group(2)))
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
    Spec(partitionBy, orderBy, measures, vars, withinMs, defines)
  }

  private def predOf(spec: Spec, v: String): Column =
    spec.defines.get(v).map(expr).getOrElse(lit(true))

  /** Parse `sql` and run the compiled pattern over `events`. Output: the
    * partition column (under its own name) + one column per MEASURES item;
    * with no MEASURES clause, the raw [[Pattern.detect]] binding columns. */
  def detect(events: DataFrame, sql: String): DataFrame = {
    val spec = parse(sql)
    var pat = Pattern.begin(spec.vars.head.name, predOf(spec, spec.vars.head.name))
    require(spec.vars.head.quant.isEmpty, "first pattern variable cannot be quantified")
    spec.vars.tail.foreach { v =>
      pat = pat.followedBy(v.name, predOf(spec, v.name))
      v.quant.foreach {
        case "?" => pat = pat.optional()
        case q => pat = pat.times(q.stripPrefix("{").stripSuffix("}").toInt)
      }
    }
    val matches = pat.within(spec.withinMs)
      .detect(events, col(spec.partitionBy), col(spec.orderBy))
    if (spec.measures.isEmpty) matches
    else {
      val reps = spec.vars.map(v => v.name ->
        v.quant.collect { case q if q.startsWith("{") => q.stripPrefix("{").stripSuffix("}").toInt }
          .getOrElse(1)).toMap
      val cols = spec.measures.map { m =>
        val n = reps.getOrElse(m.varName, sys.error(s"unknown variable ${m.varName}"))
        val src = m.fn match {
          case None => require(n == 1, s"${m.varName} is quantified — use FIRST/LAST"); s"${m.varName}_ts"
          case Some("FIRST") => if (n == 1) s"${m.varName}_ts" else s"${m.varName}_1_ts"
          case Some(_) => if (n == 1) s"${m.varName}_ts" else s"${m.varName}_${n}_ts"
        }
        col(src).as(m.alias)
      }
      matches.select(col("key").as(spec.partitionBy) +: cols: _*)
    }
  }
}
