package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser extension making MATCH_RECOGNIZE reachable from `spark.sql` text —
  * the way Flink SQL users reach CEP (reference flink-table-planner-blink
  * StreamExecMatch.scala plans the clause from Calcite's parse tree; fixtures
  * MatchRecognizeITCase.scala). Installed via
  * `GraftExtensions` (`spark.sql.extensions=graft.plans.GraftExtensions` or
  * `.withExtensions(GraftExtensions.install)`).
  *
  * Strategy: textual pre-rewrite, then delegate. A FROM-clause segment
  * {{{ FROM <table> MATCH_RECOGNIZE ( ... ) }}}
  * is compiled through [[graft.cep.MatchRecognize.detect]] (the same subset
  * grammar), registered as a temp view, and the segment is replaced by the
  * view name — so any enclosing SELECT / WHERE / GROUP BY / JOIN / alias
  * parses unchanged through Spark's own parser. Multiple MATCH_RECOGNIZE
  * segments rewrite recursively.
  *
  * Contract (the price of the textual strategy — a full LogicalPlan lowering
  * like the `graph_pagerank` TVF bridge would lift all three):
  *  - The FROM source MUST be a resolvable catalog table or temp view.
  *    Subqueries and CTE aliases are rejected with a named error — register
  *    a temp view instead. This includes a CTE alias that SHADOWS an
  *    existing table name: the statement text is scanned for `WITH/,"name"
  *    AS (` and rejected, because the textual rewrite would otherwise bind
  *    the pattern to the catalog object, not the CTE.
  *  - The pattern compiles EAGERLY at parse time: `EXPLAIN` (and any
  *    plan-only path) runs the pattern compilation, though match rows are
  *    only computed when the plan executes.
  *  - Each distinct (table, clause) pair registers one `__graft_mr_*` temp
  *    view in the session catalog; re-parsing the same text reuses it
  *    (createOrReplace), so views do not grow with repetition, only with
  *    distinct patterns. */
class MatchRecognizeSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(MatchRecognizeSqlParser.rewrite(session, sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(MatchRecognizeSqlParser.rewrite(session, sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object MatchRecognizeSqlParser {
  private val FromRx = "(?is)\\bFROM\\s+([\\w.]+)\\s+MATCH_RECOGNIZE\\s*\\(".r

  /** Replace every `FROM <table> MATCH_RECOGNIZE (...)` segment with a temp
    * view holding the compiled matches; other statements pass through. */
  def rewrite(session: SparkSession, sqlText: String): String =
    FromRx.findFirstMatchIn(sqlText) match {
      case None => sqlText
      case Some(m) =>
        val table = m.group(1)
        val open = m.end - 1 // the regex ends at the clause's open paren
        var depth = 0; var i = open
        while (i < sqlText.length && {
          val c = sqlText(i)
          if (c == '(') depth += 1 else if (c == ')') depth -= 1
          depth != 0
        }) i += 1
        require(i < sqlText.length, "unbalanced MATCH_RECOGNIZE parentheses")
        val clause = "MATCH_RECOGNIZE " + sqlText.substring(open, i + 1)
        // a CTE alias shadowing a real table would silently bind the pattern
        // to the catalog object — reject it instead of returning wrong rows
        // \s* (not \s+) after the comma/WITH: `WITH a AS (...),events AS (`
        // has no space after the comma; RECURSIVE is an optional prefix
        val cteRx = (s"(?is)(?:\\bWITH\\b(?:\\s+RECURSIVE\\b)?|,)\\s*" +
          s"${java.util.regex.Pattern.quote(table)}\\s+AS\\s*\\(").r
        if (cteRx.findFirstIn(sqlText).isDefined)
          throw new IllegalArgumentException(
            s"MATCH_RECOGNIZE front door: FROM source '$table' is defined as " +
              "a CTE in this statement; the textual rewrite binds sources to " +
              "catalog tables/views only — createOrReplaceTempView the input " +
              "instead of a WITH clause")
        val source =
          try session.table(table)
          catch {
            case e: org.apache.spark.sql.AnalysisException =>
              throw new IllegalArgumentException(
                s"MATCH_RECOGNIZE front door: FROM source '$table' is not a " +
                  "resolvable table or temp view (subqueries and CTE aliases " +
                  "are not supported — createOrReplaceTempView the input first)",
                e)
          }
        val matches = graft.cep.MatchRecognize.detect(source, clause)
        // deterministic per (table, clause): re-parsing the same text reuses
        // the same view name (createOrReplace makes that idempotent)
        val view = s"__graft_mr_${Integer.toHexString(table.hashCode * 31 + clause.hashCode)}"
        matches.createOrReplaceTempView(view)
        rewrite(session,
          sqlText.substring(0, m.start) + s"FROM $view" + sqlText.substring(i + 1))
    }
}
