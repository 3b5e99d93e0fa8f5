package graft.plans

/** The Flink SQL LOOKUP-JOIN spelling — `JOIN dim FOR SYSTEM_TIME AS OF
  * x.proctime ON …` (reference flink-table planner temporal-table-join
  * rules over `SqlSnapshot`; the per-record lookup execution half is
  * flink-connectors/flink-jdbc `JDBCLookupFunction`, see
  * [[FlinkDdl.jdbcLookupEnrich]]).
  *
  * A PROCESSING-time lookup joins the dimension's CURRENT snapshot — in
  * this engine that is exactly what a plain join against the registered
  * table view already does (batch: the table as of planning; streaming
  * foreachBatch: the snapshot re-read each trigger), so the clause is
  * textually STRIPPED when the time attribute's last identifier segment
  * is `proctime` (the attribute PROCTIME() computed columns
  * conventionally bind to). An EVENT-time (`rowtime`) versioned lookup
  * has different semantics — each fact must see the version valid AT ITS
  * OWN timestamp, which needs version buffering — and is a NAMED
  * rejection pointing at the implemented paths
  * ([[graft.operators.Relational.temporalJoin]] for batch — the w13
  * idiom — and `StreamOps.temporalJoinStream` for streams). */
object LookupJoinSql {
  private val Rx =
    """(?i)\bFOR\s+SYSTEM_TIME\s+AS\s+OF\s+([\w.]+)""".r

  def rewrite(sql: String): String =
    GroupWindowSql.replaceOutside(Rx, sql) { m =>
      val attr = m.group(1)
      if (attr.toLowerCase.split('.').last == "proctime") ""
      else sys.error(s"FOR SYSTEM_TIME AS OF $attr: an event-time versioned " +
        "lookup needs version buffering (each fact sees the version valid " +
        "at its own timestamp) — use Relational.temporalJoin (batch, the " +
        "w13 idiom) or StreamOps.temporalJoinStream (streams). The SQL " +
        "front door strips only PROCESSING-time lookups, whose semantics " +
        "ARE the plain current-snapshot join")
    }
}
