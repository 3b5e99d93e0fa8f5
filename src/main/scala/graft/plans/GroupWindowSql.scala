package graft.plans

/** Flink SQL GROUP-WINDOW spellings → Spark's window functions, as a pure
  * text rewrite (reference flink-table/flink-table-planner-blink/.../
  * functions/sql/FlinkSqlOperatorTable.java TUMBLE/HOP/SESSION +
  * auxiliary _START/_END group-window operators; the grammar half lives in
  * the calcite extension). The most common Flink SQL idiom —
  * {{{ SELECT TUMBLE_START(ts, INTERVAL '10' MINUTE), count(*)
  *     FROM t GROUP BY TUMBLE(ts, INTERVAL '10' MINUTE) }}}
  * — runs VERBATIM through `spark.sql` once rewritten:
  *
  *  - `TUMBLE(ts, INTERVAL 'n' unit)`       → `window(ts, 'n unit')`
  *  - `HOP(ts, INTERVAL slide, INTERVAL size)` → `window(ts, 'size', 'slide')`
  *    (Flink's argument order is (slide, size); Spark's is (size, slide))
  *  - `SESSION(ts, INTERVAL 'gap' unit)`    → `session_window(ts, 'gap unit')`
  *  - `TUMBLE_START/_END`, `HOP_START/_END` → `window.start` / `window.end`
  *  - `SESSION_START/_END`                  → `session_window.start` / `.end`
  *
  * The rewrite applies on batch AND streaming frames exactly as Spark's
  * own window functions do (a GROUP BY window(...) exposes the `window`
  * struct to the SELECT list — same scoping as Flink's auxiliary
  * functions). The `_ROWTIME`/`_PROCTIME` auxiliaries are NAMED
  * rejections: they re-export a time ATTRIBUTE for further windowing
  * (end − 1ms, a planner-internal notion); in Spark the event-time column
  * + `withWatermark` carry that role — cascade windows over `window.end`
  * instead (the engine's w25 pattern). */
object GroupWindowSql {

  private val Unit = """(?:SECOND|MINUTE|HOUR|DAY)S?"""
  private val Iv = s"""INTERVAL\\s+'([\\d.]+)'\\s+($Unit)"""
  // the time argument: a column, optionally qualified (t.ts)
  private val Arg = """([\w.]+)"""

  private val TumbleRx = s"""(?i)\\bTUMBLE\\s*\\(\\s*$Arg\\s*,\\s*$Iv\\s*\\)""".r
  private val TumbleAuxRx = s"""(?i)\\bTUMBLE_(START|END)\\s*\\(\\s*$Arg\\s*,\\s*$Iv\\s*\\)""".r
  private val HopRx = s"""(?i)\\bHOP\\s*\\(\\s*$Arg\\s*,\\s*$Iv\\s*,\\s*$Iv\\s*\\)""".r
  private val HopAuxRx = s"""(?i)\\bHOP_(START|END)\\s*\\(\\s*$Arg\\s*,\\s*$Iv\\s*,\\s*$Iv\\s*\\)""".r
  private val SessionRx = s"""(?i)\\bSESSION\\s*\\(\\s*$Arg\\s*,\\s*$Iv\\s*\\)""".r
  private val SessionAuxRx = s"""(?i)\\bSESSION_(START|END)\\s*\\(\\s*$Arg\\s*,\\s*$Iv\\s*\\)""".r
  private val TimeAttrRx =
    """(?i)\b(TUMBLE|HOP|SESSION)_(ROWTIME|PROCTIME)\s*\(""".r

  private def dur(n: String, unit: String): String =
    s"$n ${unit.toLowerCase.stripSuffix("s")}s"

  /** Rewrite every group-window spelling in `sql`; text without them
    * passes through byte-identical. An auxiliary whose arguments do not
    * match any group-window call in the statement is a NAMED error — the
    * rewrite maps it to `window.start/end` of the GROUP BY's window, so a
    * silent mismatch would return the wrong window's bound (Flink's
    * validator rejects the same mismatch). */
  def rewrite(sql: String): String = {
    TimeAttrRx.findFirstMatchIn(sql).foreach { m =>
      sys.error(s"${m.group(1)}_${m.group(2)}() re-exports a time ATTRIBUTE " +
        "for further windowing — in Spark the event-time column + " +
        "withWatermark carry that role; cascade over window.end instead " +
        "(StreamOps/w25 pattern)")
    }
    // signatures normalize the interval (MINUTE == MINUTES) but keep the
    // time argument verbatim (case-folded)
    def sig1(kind: String, arg: String, n: String, u: String) =
      s"$kind(${arg.toLowerCase}, ${dur(n, u)})"
    def sig2(kind: String, arg: String, n1: String, u1: String, n2: String, u2: String) =
      s"$kind(${arg.toLowerCase}, ${dur(n1, u1)}, ${dur(n2, u2)})"
    val winSigs =
      TumbleRx.findAllMatchIn(sql).map(m => sig1("tumble", m.group(1), m.group(2), m.group(3))).toSet ++
        HopRx.findAllMatchIn(sql).map(m => sig2("hop", m.group(1), m.group(2), m.group(3), m.group(4), m.group(5))).toSet ++
        SessionRx.findAllMatchIn(sql).map(m => sig1("session", m.group(1), m.group(2), m.group(3))).toSet
    val auxSigs =
      TumbleAuxRx.findAllMatchIn(sql).map(m => sig1("tumble", m.group(2), m.group(3), m.group(4))).toSet ++
        HopAuxRx.findAllMatchIn(sql).map(m => sig2("hop", m.group(2), m.group(3), m.group(4), m.group(5), m.group(6))).toSet ++
        SessionAuxRx.findAllMatchIn(sql).map(m => sig1("session", m.group(2), m.group(3), m.group(4))).toSet
    val orphans = auxSigs -- winSigs
    require(orphans.isEmpty,
      s"group-window auxiliary arguments ${orphans.mkString(", ")} match no " +
        "group-window call in the statement — the auxiliary must repeat the " +
        "GROUP BY window's exact arguments (Flink validates the same way)")
    var out = sql
    out = TumbleAuxRx.replaceAllIn(out, m => s"window.${m.group(1).toLowerCase}")
    out = HopAuxRx.replaceAllIn(out, m => s"window.${m.group(1).toLowerCase}")
    out = SessionAuxRx.replaceAllIn(out, m => s"session_window.${m.group(1).toLowerCase}")
    out = TumbleRx.replaceAllIn(out, m =>
      s"window(${m.group(1)}, '${dur(m.group(2), m.group(3))}')")
    // Flink HOP args are (slide, size); Spark window args are (size, slide)
    out = HopRx.replaceAllIn(out, m =>
      s"window(${m.group(1)}, '${dur(m.group(4), m.group(5))}', '${dur(m.group(2), m.group(3))}')")
    out = SessionRx.replaceAllIn(out, m =>
      s"session_window(${m.group(1)}, '${dur(m.group(2), m.group(3))}')")
    out
  }
}
