package graft.queries

/** DuckDB oracle GENERATOR for the depth-d nested-group COUNT walk —
  * the m48/m52 speculation-checkpoint recursive CTE with the checkpoint
  * levels emitted by a LOOP instead of spelled case-by-case (r20,
  * matching the engine side: the SQL front door now parses nested
  * groups recursively to any depth, and the walk has been
  * depth-parametric since r18 — reference flink-cep
  * GroupPattern.java:30 composes recursively without limit).
  *
  * Semantics reproduced exactly from the committed m52 oracle (depth 4,
  * hash-green since r18; `NestedOracleParitySpec` pins generator(4) ==
  * the hand-written m52 text's results):
  *  - a LEVEL-1 repetition is a greedy chain of (B C) sub-matches
  *    punctuated by the earliest level-1 closer, then that closer bound
  *    (reluctant close, greedy-no-backtracking);
  *  - a LEVEL-l repetition (l >= 2) is a greedy chain of level-(l-1)
  *    repetitions punctuated by the earliest level-l closer after the
  *    attempt's last absorbed child, then that closer bound;
  *  - failures cascade: when an attempt can neither extend nor close,
  *    the NEAREST enclosing level that can close does, discarding the
  *    in-progress levels below (their counts never commit);
  *  - every walk row has exactly ONE successor (the mode CASE is a
  *    priority list), so the recursion is linear per anchor.
  *
  * `closerPreds(l-1)` is the SQL predicate over `events` for the level-l
  * closer (level 1 innermost punctuation, level `depth` the outer tail).
  * Output columns: user_id, signup_ts, grp_first_ts, grp_last_ts,
  * n_outer, n_mid{depth-1} .. n_mid2, n_mid, n_inner. */
private[graft] object NestedOracle {
  def countWalk(depth: Int, withinHours: Int,
                anchorPred: String, bPred: String, cPred: String,
                closerPreds: Seq[String]): String = {
    require(depth >= 2 && closerPreds.size == depth)
    val d = depth
    val L = (1 to d).toSeq // closer levels
    def midAlias(j: Int): String = if (j == 1) "n_mid" else s"n_mid$j"
    // ---- base CTEs --------------------------------------------------
    val base = new StringBuilder
    base ++= "WITH RECURSIVE\n"
    base ++= s"s AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts FROM events WHERE $anchorPred),\n"
    base ++= s"b AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts FROM events WHERE $bPred),\n"
    base ++= s"c AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts FROM events WHERE $cPred),\n"
    for (l <- L)
      base ++= s"k$l AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts FROM events WHERE ${closerPreds(l - 1)}),\n"
    base ++=
      s"""subs AS (
         |  SELECT b.user_id, b.ts AS b_ts, min(c.ts) AS e_ts
         |  FROM b JOIN c ON c.user_id = b.user_id AND c.ts > b.ts
         |              AND c.ts <= b.ts + INTERVAL $withinHours HOURS
         |  GROUP BY 1, 2),
         |link AS (
         |  SELECT s1.user_id, s1.b_ts, min(s2.b_ts) AS nb
         |  FROM subs s1 LEFT JOIN subs s2 ON s2.user_id = s1.user_id AND s2.b_ts > s1.e_ts
         |  GROUP BY 1, 2),
         |k1next AS (
         |  SELECT su.user_id, su.b_ts, min(k.ts) AS k_ts
         |  FROM subs su LEFT JOIN k1 k ON k.user_id = su.user_id AND k.ts > su.e_ts
         |  GROUP BY 1, 2),
         |""".stripMargin
    // nx{l}: per level-(l-1) closer event, the earliest level-l closer after it
    for (l <- 2 to d)
      base ++=
        s"""nx$l AS (
           |  SELECT p.user_id, p.ts AS p_ts, min(k.ts) AS k_ts
           |  FROM k${l - 1} p LEFT JOIN k$l k ON k.user_id = p.user_id AND k.ts > p.ts
           |  GROUP BY 1, 2),
           |""".stripMargin
    // ns{l}: per level-l closer event, the earliest sub start after it
    for (l <- L)
      base ++=
        s"""ns$l AS (
           |  SELECT k.user_id, k.ts AS k_ts, min(su.b_ts) AS nb
           |  FROM k$l k LEFT JOIN subs su ON su.user_id = k.user_id AND su.b_ts > k.ts
           |  GROUP BY 1, 2),
           |""".stripMargin
    base ++=
      s"""entry AS (
         |  SELECT s.user_id, s.ts AS s_ts, s.ts + INTERVAL $withinHours HOURS AS w_end,
         |         min(su.b_ts) AS b1
         |  FROM s JOIN subs su ON su.user_id = s.user_id AND su.b_ts > s.ts
         |  GROUP BY 1, 2, 3),
         |""".stripMargin
    // ---- walk columns ----------------------------------------------
    // checkpoint a{l} (attempt at level l, l in 2..d): counts of level-j
    // closers bound inside the attempt (j < l), inner-sub count, and the
    // end ts of the last absorbed child repetition
    def aCols(l: Int): Seq[String] =
      ((1 until l).map(j => s"a${l}_c$j") :+ s"a${l}_in") :+ s"a${l}_gend"
    val ckptCols: Seq[String] = (2 to d).flatMap(aCols)
    val doneCols: Seq[String] = (1 to d).map(j => s"d_c$j") :+ "d_in"
    // ---- seed row ---------------------------------------------------
    val w = new StringBuilder
    w ++= "walk AS (\n"
    w ++= "  SELECT e.user_id, e.s_ts, e.w_end, e.b1 AS first_b,\n"
    w ++= "         su.b_ts AS cur_b, su.e_ts AS cur_e,\n"
    w ++= "         CAST(1 AS BIGINT) AS chain_k,\n"
    for (cl <- ckptCols)
      w ++= (if (cl.endsWith("_gend"))
        s"         CAST(NULL AS TIMESTAMP) AS $cl,\n"
      else s"         CAST(0 AS BIGINT) AS $cl,\n")
    for (cl <- doneCols)
      w ++= s"         CAST(0 AS BIGINT) AS $cl,\n"
    w ++= "         CAST(NULL AS TIMESTAMP) AS match_end, 'chain' AS phase\n"
    w ++= "  FROM entry e JOIN subs su ON su.user_id = e.user_id AND su.b_ts = e.b1\n"
    w ++= "  WHERE su.e_ts <= e.w_end\n"
    w ++= "  UNION ALL\n"
    // ---- recursive select: one successor per row --------------------
    val specModes = (2 to d).map(l => s"'abs${l}_spec'") :+ "'newatt'"
    w ++= "  SELECT user_id, s_ts, w_end, first_b,\n"
    // cur_b
    w ++= "         CASE WHEN mode='extend' THEN nx_b\n"
    w ++= s"              WHEN mode IN (${specModes.mkString(",")}) THEN nr_b\n"
    w ++= "              ELSE cur_b END,\n"
    // cur_e: extend -> next sub end; close1 -> the level-1 closer;
    // spec/newatt -> new sub end; intermediate-level closes (l < d) bind
    // the closer ts; OUTER-level closes set match_end instead
    w ++= "         CASE WHEN mode='extend' THEN nx_e\n"
    w ++= "              WHEN mode='close1' THEN k1n\n"
    w ++= s"              WHEN mode IN (${specModes.mkString(",")}) THEN nr_e\n"
    for (l <- 2 until d) {
      w ++= s"              WHEN mode IN ('chfail$l','rej$l') THEN g${l}_ts\n"
      w ++= s"              WHEN mode='abs${l}_close' THEN c2${l}_ts\n"
    }
    w ++= "              ELSE cur_e END,\n"
    // chain_k
    w ++= "         CASE WHEN mode='extend' THEN chain_k + 1\n"
    w ++= s"              WHEN mode IN (${specModes.mkString(",")}) THEN CAST(1 AS BIGINT)\n"
    w ++= "              ELSE chain_k END,\n"
    // checkpoints: a{l} bumps on abs{l}_spec/close (folding the completed
    // child: chain_k for l = 2, the a{l-1} checkpoint for l >= 3) and
    // RESETS on any level-(m>l) transition (the attempt either committed
    // upward or was discarded by a cascade past it)
    for (l <- 2 to d) {
      val bump = s"'abs${l}_spec','abs${l}_close'"
      val resets = ((l + 1) to d).flatMap { m =>
        val base0 = Seq(s"'abs${m}_spec'", s"'abs${m}_close'",
          s"'chfail$m'", s"'rej$m'")
        base0
      } :+ "'newatt'"
      val resetList = resets.mkString(",")
      for (j <- 1 until l) {
        val add = if (j == l - 1) "1"
        else s"a${l - 1}_c$j"
        w ++= s"         CASE WHEN mode IN ($bump) THEN a${l}_c$j + $add\n"
        w ++= s"              WHEN mode IN ($resetList) THEN CAST(0 AS BIGINT)\n"
        w ++= s"              ELSE a${l}_c$j END,\n"
      }
      val addIn = if (l == 2) "chain_k" else s"a${l - 1}_in"
      w ++= s"         CASE WHEN mode IN ($bump) THEN a${l}_in + $addIn\n"
      w ++= s"              WHEN mode IN ($resetList) THEN CAST(0 AS BIGINT)\n"
      w ++= s"              ELSE a${l}_in END,\n"
      w ++= s"         CASE WHEN mode IN ($bump) THEN cur_e\n"
      w ++= s"              WHEN mode IN ($resetList) THEN CAST(NULL AS TIMESTAMP)\n"
      w ++= s"              ELSE a${l}_gend END,\n"
    }
    // done totals: the OUTER close commits the checkpoint chain. At
    // abs{d}_close a completed level-(d-1) repetition is pending
    // (not yet folded into a{d}) — commit a{d} + a{d-1} + the pending
    // rep itself; at chfail{d}/rej{d} the in-progress attempt below
    // FAILED — only a{d} commits.
    for (j <- 1 to d) {
      if (j == d) {
        w ++= s"         CASE WHEN mode IN ('abs${d}_close','chfail$d','rej$d') THEN d_c$j + 1 ELSE d_c$j END,\n"
      } else if (j == d - 1) {
        w ++= s"         CASE WHEN mode='abs${d}_close' THEN d_c$j + a${d}_c$j + 1\n"
        w ++= s"              WHEN mode IN ('chfail$d','rej$d') THEN d_c$j + a${d}_c$j\n"
        w ++= s"              ELSE d_c$j END,\n"
      } else {
        w ++= s"         CASE WHEN mode='abs${d}_close' THEN d_c$j + a${d}_c$j + a${d - 1}_c$j\n"
        w ++= s"              WHEN mode IN ('chfail$d','rej$d') THEN d_c$j + a${d}_c$j\n"
        w ++= s"              ELSE d_c$j END,\n"
      }
    }
    w ++= s"         CASE WHEN mode='abs${d}_close' THEN d_in + a${d}_in + a${d - 1}_in\n"
    w ++= s"              WHEN mode IN ('chfail$d','rej$d') THEN d_in + a${d}_in\n"
    w ++= "              ELSE d_in END,\n"
    // match_end + phase
    w ++= s"         CASE WHEN mode='abs${d}_close' THEN c2${d}_ts\n"
    w ++= s"              WHEN mode IN ('chfail$d','rej$d') THEN g${d}_ts\n"
    w ++= "              ELSE match_end END,\n"
    w ++= s"         CASE WHEN mode IN ('abs${d}_close','chfail$d','rej$d') THEN 'closed'\n"
    w ++= "              WHEN mode='close1' THEN 'mid1'\n"
    for (l <- 2 until d)
      w ++= s"              WHEN mode IN ('chfail$l','abs${l}_close','rej$l') THEN 'mid$l'\n"
    w ++= "              ELSE 'chain' END\n"
    // ---- the joined source with the mode priority list --------------
    w ++= "  FROM (\n"
    w ++= "    SELECT wk.*, nx.b_ts AS nx_b, nx.e_ts AS nx_e, vn.k_ts AS k1n,\n"
    for (l <- 2 to d)
      w ++= s"           g$l.k_ts AS g${l}_ts, c2$l.k_ts AS c2${l}_ts,\n"
    w ++= "           nr.b_ts AS nr_b, nr.e_ts AS nr_e,\n"
    w ++= "      CASE WHEN wk.phase = 'chain' AND nx.b_ts IS NOT NULL\n"
    w ++= "                AND nx.e_ts <= wk.w_end\n"
    w ++= "                AND NOT (vn.k_ts IS NOT NULL AND vn.k_ts <= wk.w_end\n"
    w ++= "                         AND nx.e_ts >= vn.k_ts) THEN 'extend'\n"
    w ++= "           WHEN wk.phase = 'chain' AND vn.k_ts IS NOT NULL\n"
    w ++= "                AND vn.k_ts <= wk.w_end THEN 'close1'\n"
    for (l <- 2 to d) {
      w ++= s"           WHEN wk.phase = 'chain' AND wk.a${l}_c${l - 1} > 0\n"
      w ++= s"                AND g$l.k_ts IS NOT NULL AND g$l.k_ts <= wk.w_end\n"
      w ++= s"                THEN 'chfail$l'\n"
    }
    for (l <- 2 to d) {
      // phase mid{l-1}: a completed level-(l-1) repetition awaits its
      // fate in the level-l attempt. Absorb (spec: a next sub exists;
      // close: the level-l closer after it exists) when the punctuation
      // rule holds — the rep must precede the earliest level-l closer
      // after the attempt's last absorbed child — else the attempt
      // REJECTS the rep and closes at that closer; when neither absorb
      // path exists the cascade closes the nearest level above that can.
      w ++= s"           WHEN wk.phase = 'mid${l - 1}' AND (wk.a${l}_c${l - 1} = 0\n"
      w ++= s"                OR g$l.k_ts IS NULL OR g$l.k_ts > wk.w_end\n"
      w ++= s"                OR wk.cur_e < g$l.k_ts) THEN\n"
      w ++= s"             CASE WHEN nr.b_ts IS NOT NULL AND nr.e_ts <= wk.w_end\n"
      w ++= s"                  THEN 'abs${l}_spec'\n"
      w ++= s"                  WHEN c2$l.k_ts IS NOT NULL AND c2$l.k_ts <= wk.w_end\n"
      w ++= s"                  THEN 'abs${l}_close'\n"
      for (m <- (l + 1) to d) {
        w ++= s"                  WHEN wk.a${m}_c${m - 1} > 0 AND g$m.k_ts IS NOT NULL\n"
        w ++= s"                       AND g$m.k_ts <= wk.w_end THEN 'chfail$m'\n"
      }
      w ++= "             END\n"
      w ++= s"           WHEN wk.phase = 'mid${l - 1}' THEN 'rej$l'\n"
    }
    w ++= "           WHEN wk.phase = 'closed' AND nr.b_ts IS NOT NULL\n"
    w ++= "                AND nr.e_ts <= wk.w_end THEN 'newatt'\n"
    w ++= "      END AS mode\n"
    w ++= "    FROM walk wk\n"
    w ++= "    LEFT JOIN link l  ON wk.phase='chain' AND l.user_id = wk.user_id\n"
    w ++= "                      AND l.b_ts = wk.cur_b\n"
    w ++= "    LEFT JOIN subs nx ON nx.user_id = wk.user_id AND nx.b_ts = l.nb\n"
    w ++= "    LEFT JOIN k1next vn ON wk.phase='chain' AND vn.user_id = wk.user_id\n"
    w ++= "                       AND vn.b_ts = wk.cur_b\n"
    for (l <- 2 to d) {
      w ++= s"    LEFT JOIN nx$l g$l ON g$l.user_id = wk.user_id\n"
      w ++= s"                        AND g$l.p_ts = wk.a${l}_gend\n"
      w ++= s"    LEFT JOIN nx$l c2$l ON wk.phase='mid${l - 1}' AND c2$l.user_id = wk.user_id\n"
      w ++= s"                        AND c2$l.p_ts = wk.cur_e\n"
    }
    for (l <- 1 to d) {
      val (ph, key) = if (l < d) (s"'mid$l'", "wk.cur_e") else ("'closed'", "wk.match_end")
      w ++= s"    LEFT JOIN ns$l nv$l ON wk.phase=$ph AND nv$l.user_id = wk.user_id\n"
      w ++= s"                        AND nv$l.k_ts = $key\n"
    }
    val coalesceNb = (1 to d).map(l => s"nv$l.nb").mkString(", ")
    w ++= "    LEFT JOIN subs nr ON nr.user_id = wk.user_id\n"
    w ++= s"                      AND nr.b_ts = COALESCE($coalesceNb)\n"
    w ++= "  ) WHERE mode IS NOT NULL),\n"
    // ---- winner per anchor + final projection -----------------------
    val doneList = doneCols.mkString(", ")
    w ++=
      s"""best AS (
         |  SELECT user_id, s_ts, first_b, match_end, $doneList,
         |         row_number() OVER (PARTITION BY user_id, s_ts
         |                            ORDER BY d_c$d DESC) AS rn
         |  FROM walk WHERE phase = 'closed')
         |SELECT user_id, s_ts AS signup_ts, first_b AS grp_first_ts,
         |       match_end AS grp_last_ts, d_c$d AS n_outer,
         |""".stripMargin
    w ++= (d - 1 to 1 by -1).map(j => s"       d_c$j AS ${midAlias(j)}")
      .mkString(",\n") + ",\n"
    w ++= "       d_in AS n_inner\nFROM best WHERE rn = 1"
    base.toString + w.toString
  }
}
