package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextDedup
import graft.sources.Tables

/** §2.5b — training-data CURATION ops: the selection/mixing layer that sits
  * after dedup (d-series) and scoring (t-series) in a real pretraining
  * pipeline. All shuffle-minimal: t06 is scan-only; d09 filters on a
  * deterministic content-hash bucket (no shuffle at all — the sampling
  * decision is row-local, exactly what survives 100 TB); d10 is one keyed
  * window over the (small) per-language ordering.
  */
object LlmQueries3 {
  type Q = (SparkSession, String) => DataFrame
  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  // ---------- t06: regex pattern scan (the PII-scan shape) ----------
  // Count pattern hits per document — the plumbing of a PII/contamination
  // scan (emails, phone numbers, canary strings), demonstrated on patterns
  // that occur in the synthetic corpus. Non-overlapping greedy scan on both
  // engines (Java regex / RE2 agree for these patterns).
  private val t06: Q = (s, dir) =>
    docs(s, dir).select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[a-z]{7,}"), lit(0))).as("n_long_words"),
      size(regexp_extract_all(col("text"), lit("[aeiou][aeiou]"), lit(0))).as("n_vowel_pairs"),
      (size(regexp_extract_all(col("text"), lit("[a-z]{7,}"), lit(0))) > 10).as("flagged"))
  private val t06Sql =
    """SELECT doc_id,
      | CAST(len(regexp_extract_all(text, '[a-z]{7,}')) AS INT) AS n_long_words,
      | CAST(len(regexp_extract_all(text, '[aeiou][aeiou]')) AS INT) AS n_vowel_pairs,
      | len(regexp_extract_all(text, '[a-z]{7,}')) > 10 AS flagged
      |FROM documents""".stripMargin

  // ---------- t09: PII redaction (the scrub complement of t06's scan) ----------
  // The redaction half of a PII pipeline (C4/Dolma-style scrubbing):
  // matched spans are REPLACED with a placeholder token and the document
  // re-hashed, rather than merely counted (t06). Demonstrated on the
  // corpus's own token shapes (long lowercase words stand in for
  // emails/phones — the synthetic text carries no real PII): per document,
  // the redaction count, the md5 of the redacted text (the downstream
  // dedup key — redaction must precede hashing or scrubbed near-dups
  // diverge), and the character delta. Row-local regexp_replace over the
  // scan — zero shuffles, the same scan-only plan class as t06; Spark
  // regexp_replace is replace-ALL, matching DuckDB's 'g' flag.
  private val t09: Q = (s, dir) => {
    val pat = "[a-z]{9,}"
    docs(s, dir).select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_redacted"),
      md5(regexp_replace(col("text"), pat, "<TOK>")).as("redacted_md5"),
      (length(col("text")) -
        length(regexp_replace(col("text"), pat, "<TOK>"))).as("len_delta"))
  }
  private val t09Sql =
    """SELECT doc_id,
      | CAST(len(regexp_extract_all(text, '[a-z]{9,}')) AS INT) AS n_redacted,
      | md5(regexp_replace(text, '[a-z]{9,}', '<TOK>', 'g')) AS redacted_md5,
      | CAST(len(text) - len(regexp_replace(text, '[a-z]{9,}', '<TOK>', 'g'))
      |      AS INT) AS len_delta
      |FROM documents""".stripMargin

  // ---------- t07: intra-document repetition filter (Gopher-style) ----------
  // The Rae et al. (Gopher) / MassiveText repetition quality signals: a
  // document dominated by one repeated n-gram (or by duplicated n-grams
  // generally) is boilerplate/spam and is dropped before training.
  //   top2_frac — fraction of word-2-gram positions taken by the MOST
  //               FREQUENT 2-gram (the "fraction of characters in the most
  //               common n-gram" signal, position-normalized so tie-broken
  //               gram identity never matters);
  //   dup3_frac — fraction of word-3-gram positions whose gram occurs more
  //               than once (the "duplicate n-gram fraction" signal).
  // Scale shape: explode → per-(doc, gram) hash count → per-doc hash
  // re-aggregate — two keyed shuffles of gram tokens, no windows, no sort,
  // O(corpus tokens). (A row-local array_distinct/filter variant is
  // shuffle-free but O(words²) per document — wrong trade past ~1k-word
  // docs, so the exploded path is the default.)
  private val t07: Q = (s, dir) => {
    val d = docs(s, dir)
    def grams(n: Int) = {
      val toks = split(col("text"), " ")
      // Guard: Spark's sequence(1, stop) with stop < 1 yields a DESCENDING
      // [1, 0] (step defaults to -1), not an empty array — a doc with fewer
      // than n words would then evaluate element_at(toks, 0) and throw.
      // DuckDB's generate_series(1, 0) is empty; match that.
      val nPos = size(toks) - (n - 1)
      val positions = when(nPos >= 1, sequence(lit(1), nPos))
        .otherwise(array().cast("array<int>"))
      transform(positions,
        i => struct(lit(n).as("n"),
          concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*).as("g")))
    }
    // ONE tagged explode + ONE (doc, n, gram) count + ONE per-doc aggregate
    // (r20, guide §2.3/§2.4): the former per-n chains scanned/exploded the
    // corpus twice, shuffled gram tokens twice, and paid a doc-keyed join to
    // combine — same gram multiset, half the passes, no join. The fractions
    // are the identical integer ratios (max/Σ over n=2 counts, conditional
    // Σ/Σ over n=3 counts), so values are bit-identical.
    d.select(col("doc_id"), explode(concat(grams(2), grams(3))).as("t"))
      .groupBy(col("doc_id"), col("t.n").as("n"), col("t.g").as("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(
        (max(when(col("n") === 2, col("c"))) /
          sum(when(col("n") === 2, col("c")))).as("top2"),
        (sum(when(col("n") === 3 && col("c") >= 2, col("c")).otherwise(lit(0))) /
          sum(when(col("n") === 3, col("c")))).as("dup3"))
      // a 2-word doc has 2-grams but no 3-grams: the former inner join
      // dropped it — keep that contract (dup3 is null exactly then)
      .filter(col("dup3").isNotNull)
      .select(col("doc_id"), round(col("top2"), 6).as("top2_frac"),
        round(col("dup3"), 6).as("dup3_frac"),
        (round(col("top2"), 6) < 0.1 && round(col("dup3"), 6) < 0.05).as("keep"))
  }
  private val t07Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g2 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-1),
      |         i -> w[i] || ' ' || w[i+1])) AS g FROM t),
      |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
      |a2 AS (SELECT doc_id, max(c)*1.0/sum(c) AS top2 FROM c2 GROUP BY 1),
      |g3 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w)-2),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g FROM t),
      |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
      |a3 AS (SELECT doc_id, sum(CASE WHEN c >= 2 THEN c ELSE 0 END)*1.0/sum(c) AS dup3
      |       FROM c3 GROUP BY 1)
      |SELECT a2.doc_id, round(top2, 6) AS top2_frac, round(dup3, 6) AS dup3_frac,
      |       (round(top2, 6) < 0.1 AND round(dup3, 6) < 0.05) AS keep
      |FROM a2 JOIN a3 USING (doc_id)""".stripMargin

  // ---------- d09: deterministic stratified sampling (mixing weights) ----------
  // Training mixes downsample strata at different rates (e.g. common-crawl
  // vs curated). Deterministic content-hash bucketing (last md5 hex char =
  // 16 buckets) makes the sample reproducible and join-free: en keeps 13/16
  // (~81%), every other language 4/16 (25%). Hex-char IN-lists agree
  // bit-for-bit across engines (no int conversion).
  private val EnBuckets = "0123456789abc" // 13 of 16
  private val RestBuckets = "0123"        // 4 of 16
  private val d09: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("bucket", substring(md5(col("text")), 32, 1))
      .filter((col("lang") === "en" &&
          col("bucket").isin(EnBuckets.map(_.toString): _*)) ||
        (col("lang") =!= "en" && col("bucket").isin(RestBuckets.map(_.toString): _*)))
      .select(col("doc_id"), col("lang"), col("bucket"))
  private val d09Sql = {
    val en = EnBuckets.map(c => s"'$c'").mkString(",")
    val rest = RestBuckets.map(c => s"'$c'").mkString(",")
    s"""SELECT doc_id, lang, substr(md5(text), 32, 1) AS bucket
       |FROM documents
       |WHERE (lang = 'en' AND substr(md5(text), 32, 1) IN ($en))
       |   OR (lang <> 'en' AND substr(md5(text), 32, 1) IN ($rest))""".stripMargin
  }

  // ---------- d10: token-budget curation ----------
  // "Best documents first until the budget is spent": per language, rank by
  // length (quality proxy; n_chars desc, doc_id tiebreak) and keep every
  // document that STARTS before the 2000-token budget is exhausted — the
  // greedy cutoff real data-mix builders use. One keyed window, rank on
  // exact ints so the cutoff cannot drift.
  private val TokenBudget = 2000L
  private val d10: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id"))
    docs(s, dir)
      .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .filter(col("cum_tokens") - col("tokens") < TokenBudget)
      .select(col("doc_id"), col("lang"), col("tokens"), col("cum_tokens"))
  }
  private val d10Sql =
    s"""SELECT doc_id, lang, tokens, cum_tokens FROM (
       | SELECT doc_id, lang,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
       |  CAST(sum(len(string_split(text, ' '))) OVER (PARTITION BY lang
       |    ORDER BY n_chars DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       | FROM documents
       |) WHERE cum_tokens - tokens < $TokenBudget""".stripMargin

  // ---------- d11: token budget, the 100 TB path ----------
  // d10's per-language running sum serializes each language into one task
  // (low-cardinality PARTITION BY — the q31 problem). Histogram cutoff
  // (the q38 pattern): (1) aggregate token sums per (lang, ordering level
  // = n_chars) — a tiny histogram; (2) running-sum the HISTOGRAM to split
  // levels into fully-kept / dropped / ONE boundary level per language;
  // (3) per-doc ordering only inside the boundary levels. Same kept set as
  // d10 (oracle replays the d10 semantics), but the expensive ordered scan
  // touches one level per language instead of every document. If the
  // boundary level itself were huge, the same histogram recursion applies
  // on doc_id ranges (documented, not needed at these scales).
  private val d11: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val toks = docs(s, dir)
      .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
      .select("doc_id", "lang", "n_chars", "tokens")
    val hist = toks.groupBy("lang", "n_chars").agg(sum("tokens").as("lvl_tokens"))
    val hw = Window.partitionBy("lang").orderBy(col("n_chars").desc)
    val lv = hist.withColumn("cum_before",
      coalesce(sum(col("lvl_tokens")).over(
        hw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    // a level is fully kept when its whole token mass fits the remaining
    // budget (every doc's intra-level prefix is then < the remainder)
    val keepAll = lv.filter(col("cum_before") + col("lvl_tokens") <= TokenBudget)
      .select(col("lang").as("kl"), col("n_chars").as("kc"))
    val boundary = lv.filter(col("cum_before") < TokenBudget &&
        col("cum_before") + col("lvl_tokens") > TokenBudget)
      .select(col("lang").as("bl"), col("n_chars").as("bc"), col("cum_before"))
    val keptFull = toks.join(broadcast(keepAll),
        col("lang") === col("kl") && col("n_chars") === col("kc"))
      .select("doc_id", "lang", "tokens")
    val bw = Window.partitionBy("lang", "n_chars").orderBy("doc_id")
    val keptBoundary = toks.join(broadcast(boundary),
        col("lang") === col("bl") && col("n_chars") === col("bc"))
      .withColumn("prefix_before", coalesce(sum(col("tokens")).over(
        bw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("cum_before") + col("prefix_before") < TokenBudget)
      .select("doc_id", "lang", "tokens")
    keptFull.unionByName(keptBoundary)
  }
  private val d11Sql = // same kept set as d10, without the per-doc cum column
    s"""SELECT doc_id, lang, tokens FROM (
       | SELECT doc_id, lang,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
       |  CAST(sum(len(string_split(text, ' '))) OVER (PARTITION BY lang
       |    ORDER BY n_chars DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       | FROM documents
       |) WHERE cum_tokens - tokens < $TokenBudget""".stripMargin

  // ---------- d12: incremental corpus dedup (the steady-state ingest shape) ----------
  // A real pretraining pipeline dedups a NEW document batch against an
  // EXISTING corpus every ingest; re-deriving signatures corpus-wide per
  // batch (the d02..d08 shape) re-pays the full shingle+hash cost daily.
  // Steady state instead maintains a SIGNATURE STORE, built once at ingest
  // and only appended to afterwards:
  //   bands — (doc_id, band, bkey) MinHash-LSH band keys, hot buckets
  //           dropped at build time (the d02 cap policy, same constant);
  //   grams — (doc_id, distinct 3-gram set) for Jaccard verification.
  // Storing the gram sets trades store space (≈ corpus text size; a longer-
  // shingle deployment would store 8-byte gram hashes instead — Jaccard over
  // distinct md5(gram) sets equals Jaccard over the gram sets) for an
  // incremental path that NEVER rescans the corpus text column: at 100 TB
  // the alternative — fetching bucket-mate texts by key — re-reads the full
  // text column of the corpus every batch just to shingle 0.01% of it.
  // The incremental path (the returned plan) shingles ONLY the new batch
  // (pushed doc_id filter on every documents scan), equi-joins its bands
  // against the store (shuffle is O(new-batch bands): AQE broadcasts the
  // small new side), Jaccard-verifies against bucket-mates only, and emits
  // one verdict row per new document. Asserted in PlanQualitySpec.
  // The batch split is deterministic: docs above 9/10 of max(doc_id) are
  // "new". d07's JaccardMin and d02's band layout are reused so the verdict
  // agrees with the batch pipeline's.
  private val d12: Q = (s, dir) => {
    val d = docs(s, dir)
    val maxRow = d.agg(max(col("doc_id"))).head()
    if (maxRow.isNullAt(0)) { // empty corpus: no batch, no verdicts
      d.select(col("doc_id"), col("doc_id").as("dup_of"),
        lit(0L).as("n_dups")).limit(0)
    } else {
    val cutoff = 9L * maxRow.getLong(0) / 10
    // store path = the caller's corpus-version contract (operators/
    // IncrementalDedup): a cluster deployment passes a durable table path
    // embedding the corpus version. The HARNESS default below is tmpdir
    // keyed by applicationId + corpus version (dir hash + cutoff) — two
    // concurrent runs never race on overwrite-mode writes, at the
    // documented cost that "built once per corpus version" only holds
    // within one application. Cross-session durability is spec-verified
    // with an explicit path in IncrementalDedupSpec.
    val store = sys.env.getOrElse("GRAFT_D12_STORE",
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_d12_store_${s.sparkContext.applicationId}_" +
          s"${Integer.toHexString(dir.hashCode)}_$cutoff").toString)
    // ---- ingest-time store build (once per corpus version) ----
    graft.operators.IncrementalDedup.buildStore(
      d.filter(col("doc_id") <= cutoff), store, 5,
      LlmQueries.Bands, LlmQueries.RowsPerBand, LlmQueries.MaxBucket, 3)
    // ---- incremental path: new batch vs the store ----
    graft.operators.IncrementalDedup.dedupAgainstStore(
      s, d.filter(col("doc_id") > cutoff), store, 5,
      LlmQueries.Bands, LlmQueries.RowsPerBand, 3, D12JaccardMin)
    }
  }
  /** Same near-dup bar as d07's cluster edges — the incremental verdict must
    * agree with what the batch pipeline would have decided. */
  private val D12JaccardMin = 0.5
  private val d12Sql = {
    import LlmQueries.{Bands, RowsPerBand, MaxBucket, shingleSql, minhashSql}
    val sigCols = (0 until Bands * RowsPerBand)
      .map(i => s"${minhashSql(i)} AS h$i").mkString(", ")
    def bandSel(tbl: String) = (0 until Bands).map { b =>
      val key = (0 until RowsPerBand).map(j => s"h${b * RowsPerBand + j}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $key AS bkey FROM $tbl"
    }.mkString(" UNION ALL ")
    s"""WITH mx AS (SELECT 9*max(doc_id)//10 AS cutoff FROM documents),
       |sho AS (SELECT doc_id, ${shingleSql("text", 5)} AS shingles
       |        FROM documents, mx WHERE doc_id <= cutoff),
       |sigo AS (SELECT doc_id, $sigCols FROM sho),
       |bo0 AS (${bandSel("sigo")}),
       |bands_old AS (SELECT b.* FROM bo0 b JOIN (SELECT band, bkey FROM bo0
       |              GROUP BY band, bkey HAVING count(*) <= $MaxBucket) s USING (band, bkey)),
       |shn AS (SELECT doc_id, ${shingleSql("text", 5)} AS shingles
       |        FROM documents, mx WHERE doc_id > cutoff),
       |sign AS (SELECT doc_id, $sigCols FROM shn),
       |bands_new AS (${bandSel("sign")}),
       |cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
       |         FROM bands_new n JOIN bands_old o ON n.band = o.band AND n.bkey = o.bkey),
       |j AS (SELECT new_id, old_id FROM cand c
       |      JOIN documents dn ON dn.doc_id = c.new_id
       |      JOIN documents do_ ON do_.doc_id = c.old_id
       |      WHERE len(list_intersect(list_distinct(${shingleSql("dn.text", 3)}),
       |                               list_distinct(${shingleSql("do_.text", 3)}))) * 1.0
       |            / len(list_distinct(list_distinct(${shingleSql("dn.text", 3)})
       |                                || list_distinct(${shingleSql("do_.text", 3)}))) >= $D12JaccardMin),
       |hit AS (SELECT new_id, CAST(min(old_id) AS BIGINT) AS dup_of,
       |        count(*) AS n_dups FROM j GROUP BY 1)
       |SELECT d.doc_id, h.dup_of, CAST(coalesce(h.n_dups, 0) AS BIGINT) AS n_dups
       |FROM (SELECT doc_id FROM documents, mx WHERE doc_id > cutoff) d
       |LEFT JOIN hit h ON h.new_id = d.doc_id""".stripMargin
  }

  // ---------- d13: benchmark decontamination (n-gram overlap scan) ----------
  // The canonical pretraining hygiene step (the GPT-3/C4 13-gram scan shape):
  // flag training documents sharing any long n-gram with the EVAL set, so
  // benchmark answers don't leak into the training mix. Eval set here = the
  // deterministic 2% doc_id sample; grams are char-12 shingles (the word
  // 13-gram variant swaps the shingle source, same plan). Scale shape: the
  // eval gram table collapses to one row per distinct gram (min eval doc)
  // and is ~2% of the corpus — AQE broadcasts it; the training side is one
  // explode + equi-join + hash re-aggregate per doc, O(corpus grams), no
  // cross product, nothing sorted.
  private val d13: Q = (s, dir) => {
    val d = docs(s, dir)
    val evalGrams = d.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("eval_id"),
        explode(array_distinct(TextDedup.shingles(col("text"), 12))).as("gram"))
      .groupBy("gram").agg(min(col("eval_id")).as("eval_id"))
    d.filter(col("doc_id") % 50 =!= 0)
      .select(col("doc_id"),
        explode(array_distinct(TextDedup.shingles(col("text"), 12))).as("gram"))
      .join(evalGrams, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_grams"),
        min(col("eval_id")).as("first_eval_id"))
  }
  private val d13Sql = {
    import LlmQueries.shingleSql
    s"""WITH eg0 AS (SELECT doc_id, unnest(list_distinct(${shingleSql("text", 12)})) AS gram
       |             FROM documents WHERE doc_id % 50 = 0),
       |eg AS (SELECT gram, min(doc_id) AS eval_id FROM eg0 GROUP BY 1),
       |tg AS (SELECT doc_id, unnest(list_distinct(${shingleSql("text", 12)})) AS gram
       |       FROM documents WHERE doc_id % 50 <> 0)
       |SELECT tg.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_grams,
       |       min(eg.eval_id) AS first_eval_id
       |FROM tg JOIN eg USING (gram)
       |GROUP BY 1""".stripMargin
  }

  // ---------- d14: FUZZY decontamination (near-dup eval ↔ train) ----------
  // d13 flags EXACT long-n-gram overlap; paraphrased or lightly-edited
  // benchmark leaks need the near-dup machinery instead: MinHash-LSH
  // candidates between the eval set (the d13 2% sample — the "index" side,
  // hot buckets capped like d12's store) and the training side, then exact
  // 3-gram Jaccard at the d12 bar. Shuffle is O(band keys) — the eval side
  // collapses to its bands (~2% of corpus) and AQE broadcasts it; no cross
  // product, plan-asserted discipline shared with d02/d05.
  private val d14: Q = (s, dir) => {
    import graft.operators.IncrementalDedup
    val d = docs(s, dir)
    val evalSide = d.filter(col("doc_id") % 50 === 0)
    val trainSide = d.filter(col("doc_id") % 50 =!= 0)
    // one copy of the bucket-cap + candidate-join + Jaccard-bar semantics:
    // the training corpus PROBES the eval-set INDEX through the same core
    // the d12 signature store uses (operators/IncrementalDedup)
    IncrementalDedup.probeAgainstIndex(
      TextDedup.lshBands(trainSide, "doc_id", "text", 5,
        LlmQueries.Bands, LlmQueries.RowsPerBand),
      IncrementalDedup.cappedBands(evalSide, 5,
        LlmQueries.Bands, LlmQueries.RowsPerBand, LlmQueries.MaxBucket),
      IncrementalDedup.distinctGrams(trainSide, 3),
      IncrementalDedup.distinctGrams(evalSide, 3),
      D12JaccardMin)
      .select(col("doc_id"), col("dup_of").as("eval_dup_of"),
        col("n_dups").as("n_eval_dups"))
  }
  private val d14Sql = {
    import LlmQueries.{Bands, RowsPerBand, MaxBucket, shingleSql, minhashSql}
    val sigCols = (0 until Bands * RowsPerBand)
      .map(i => s"${minhashSql(i)} AS h$i").mkString(", ")
    def bandSel(tbl: String) = (0 until Bands).map { b =>
      val key = (0 until RowsPerBand).map(j => s"h${b * RowsPerBand + j}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $key AS bkey FROM $tbl"
    }.mkString(" UNION ALL ")
    s"""WITH she AS (SELECT doc_id, ${shingleSql("text", 5)} AS shingles
       |             FROM documents WHERE doc_id % 50 = 0),
       |sige AS (SELECT doc_id, $sigCols FROM she),
       |be0 AS (${bandSel("sige")}),
       |bands_eval AS (SELECT b.* FROM be0 b JOIN (SELECT band, bkey FROM be0
       |               GROUP BY band, bkey HAVING count(*) <= $MaxBucket) s USING (band, bkey)),
       |sht AS (SELECT doc_id, ${shingleSql("text", 5)} AS shingles
       |        FROM documents WHERE doc_id % 50 <> 0),
       |sigt AS (SELECT doc_id, $sigCols FROM sht),
       |bands_train AS (${bandSel("sigt")}),
       |cand AS (SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
       |         FROM bands_train t JOIN bands_eval e ON t.band = e.band AND t.bkey = e.bkey),
       |j AS (SELECT train_id, eval_id FROM cand c
       |      JOIN documents dt ON dt.doc_id = c.train_id
       |      JOIN documents de ON de.doc_id = c.eval_id
       |      WHERE len(list_intersect(list_distinct(${shingleSql("dt.text", 3)}),
       |                               list_distinct(${shingleSql("de.text", 3)}))) * 1.0
       |            / len(list_distinct(list_distinct(${shingleSql("dt.text", 3)})
       |                                || list_distinct(${shingleSql("de.text", 3)}))) >= $D12JaccardMin)
       |SELECT train_id AS doc_id, CAST(min(eval_id) AS BIGINT) AS eval_dup_of,
       |       count(*) AS n_eval_dups
       |FROM j GROUP BY 1""".stripMargin
  }

  // ---------- d15: sub-document exact-substring dedup (chunked) ----------
  // Whole-document dedup (d01..d08) misses boilerplate REPEATED INSIDE
  // otherwise-distinct documents — the signal Lee et al. ("Deduplicating
  // Training Data Makes Language Models Better") remove with exact 50-token
  // substring dedup via suffix arrays. The distributed approximation:
  // non-overlapping k-word chunks (k scaled to this corpus' ~30-word
  // vocabulary), global FIRST OCCURRENCE of each chunk (min doc_id, then
  // min position) survives, every later occurrence counts as duplicated
  // text; per-doc duplicated-chunk fraction drives the keep verdict.
  // Scale shape: chunks travel as md5 keys (fixed 32 bytes, never the
  // chunk text), first-occurrence is TWO HASH aggregations on the same key
  // (min doc per chunk, then min pos within that doc — no min-of-struct,
  // which Spark plans as SortAggregate) + equi-joins; O(corpus tokens),
  // no windows, no sorts, no cross products. Suffix-array exactness
  // (arbitrary-offset 50-grams) would explode k overlapping grams per
  // position — same plan, k× the exploded rows; chunked is the
  // bandwidth-proportionate default.
  private val ChunkK = 3
  private val D15DupMax = 0.2
  private val d15: Q = (s, dir) => {
    val toks = split(col("text"), " ")
    // sequence(1, n) with n < 1 yields DESCENDING [1, 0] (t07's guard)
    val nch = floor(size(toks) / ChunkK).cast("int")
    val ch = docs(s, dir)
      .select(col("doc_id"), toks.as("w"),
        explode(when(nch >= 1, sequence(lit(1), nch))
          .otherwise(array().cast("array<int>"))).as("p"))
      .select(col("doc_id"), col("p"),
        md5(array_join(slice(col("w"), (col("p") - 1) * ChunkK + 1, lit(ChunkK)), " ")).as("ck"))
    val w1 = ch.groupBy("ck").agg(min("doc_id").as("wdoc"))
    val w2 = ch.join(w1, "ck").filter(col("doc_id") === col("wdoc"))
      .groupBy("ck", "wdoc").agg(min("p").as("wpos"))
    ch.join(w2, "ck")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("doc_id") === col("wdoc") && col("p") === col("wpos"), 0L)
          .otherwise(1L)).as("n_dup"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup"),
        round(col("n_dup") / col("n_chunks"), 6).as("dup_frac"),
        (round(col("n_dup") / col("n_chunks"), 6) <= D15DupMax).as("keep"))
  }
  private val d15Sql =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |chp AS (SELECT doc_id, unnest(generate_series(1, len(w)//$ChunkK)) AS p, w FROM t),
       |ckt AS (SELECT doc_id, p,
       |        md5(array_to_string(w[(p-1)*$ChunkK+1:p*$ChunkK], ' ')) AS ck FROM chp),
       |w1 AS (SELECT ck, min(doc_id) AS wdoc FROM ckt GROUP BY 1),
       |w2 AS (SELECT c.ck, w1.wdoc, min(c.p) AS wpos FROM ckt c
       |       JOIN w1 ON c.ck = w1.ck AND c.doc_id = w1.wdoc GROUP BY 1, 2)
       |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN c.doc_id = w2.wdoc AND c.p = w2.wpos THEN 0 ELSE 1 END) AS BIGINT) AS n_dup,
       |  round(sum(CASE WHEN c.doc_id = w2.wdoc AND c.p = w2.wpos THEN 0 ELSE 1 END) * 1.0
       |        / count(*), 6) AS dup_frac,
       |  round(sum(CASE WHEN c.doc_id = w2.wdoc AND c.p = w2.wpos THEN 0 ELSE 1 END) * 1.0
       |        / count(*), 6) <= $D15DupMax AS keep
       |FROM ckt c JOIN w2 ON c.ck = w2.ck
       |GROUP BY 1""".stripMargin

  // ---------- p01: training-sequence packing (bucketed greedy cumsum) ----------
  // Pretraining consumes FIXED-LENGTH token sequences, not documents; the
  // packing step assigns each doc to a sequence so sequences fill a token
  // budget. A global greedy pack (running cumsum over ALL docs) is a
  // single-partition window — the a03 anti-pattern. The scale shape packs
  // WITHIN deterministic content-hash buckets (the d09 bucketing): each
  // bucket runs its own greedy cumsum (a PARTITIONED window), and
  // seq_id = bucket * 2^20 + floor(tokens-before-this-doc / budget) — a
  // doc belongs to the sequence its first token lands in (sequences may
  // overflow the budget by one doc tail; the trainer truncates, nothing
  // is dropped silently). 16 buckets here ≡ thousands on a cluster: the
  // window never sees more than one bucket's rows in one task.
  private val PackBudget = 512L
  private val p01: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs(s, dir)
      .withColumn("tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("bkt", conv(substring(md5(col("text")), 32, 1), 16, 10).cast("int"))
      .withColumn("cum_before", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("tokens"), col("bkt"),
        (col("bkt").cast("long") * (1L << 20) +
          floor(col("cum_before") / PackBudget).cast("long")).as("seq_id"),
        (col("cum_before") % PackBudget).as("seq_off"))
  }
  private val p01Sql =
    s"""SELECT doc_id, tokens, bkt,
       |  CAST(bkt AS BIGINT) * ${1L << 20} + cum_before // $PackBudget AS seq_id,
       |  cum_before % $PackBudget AS seq_off
       |FROM (
       | SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
       |  CAST(strpos('0123456789abcdef', substr(md5(text), 32, 1)) - 1 AS INT) AS bkt,
       |  CAST(coalesce(sum(len(string_split(text, ' '))) OVER (
       |    PARTITION BY strpos('0123456789abcdef', substr(md5(text), 32, 1))
       |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS cum_before
       | FROM documents)""".stripMargin

  // ---------- p02: target-share domain mixing (computed resample rates) ----------
  // d09 applies GIVEN per-stratum keep rates; the mixing step one level up
  // COMPUTES the rates from a target distribution (the DoReMi/Pile
  // reweighting shape with fixed targets): rate(g) = min(1,
  // (total/n_groups)/cnt(g)) — over-represented groups are downsampled to
  // the uniform target share, under-represented ones kept whole. The mix
  // stratum here is `lang` (the skewed one in this corpus — en is ~50%;
  // `source` is synthesized exactly balanced, which would make every rate
  // 1); a deployment swaps in source/url-host. The keep decision is
  // integer-exact (no float boundary): u256(doc) — two md5 hex chars, a
  // deterministic uniform in [0,256) — keeps doc iff
  // n_groups * u256 * cnt < 256 * total, which is u256/256 < rate with
  // min(1,·) implied. Scale shape: the per-group count table is
  // metadata-sized (broadcast), the decision is row-local; one scan, one
  // broadcast join, no shuffle of facts.
  private val p02: Q = (s, dir) => {
    val d = docs(s, dir)
    val cnts = d.groupBy("lang").agg(count(lit(1)).as("cnt"))
    val tot = cnts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_groups"))
    d.select(col("doc_id"), col("lang"),
        conv(substring(md5(col("text")), 31, 2), 16, 10).cast("int").as("u256"))
      .join(broadcast(cnts), "lang")
      .crossJoin(broadcast(tot))
      .filter(col("n_groups") * col("u256") * col("cnt") <
        lit(256L) * col("total"))
      .select(col("doc_id"), col("lang"), col("u256"))
  }
  private val p02Sql =
    """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
      |t AS (SELECT sum(cnt) AS total, count(*) AS n_groups FROM c),
      |u AS (SELECT doc_id, lang,
      |      CAST((strpos('0123456789abcdef', substr(md5(text), 31, 1)) - 1) * 16
      |         + (strpos('0123456789abcdef', substr(md5(text), 32, 1)) - 1) AS INT) AS u256
      |      FROM documents)
      |SELECT u.doc_id, u.lang, u.u256
      |FROM u JOIN c USING (lang), t
      |WHERE t.n_groups * u.u256 * c.cnt < 256 * t.total""".stripMargin

  // ---------- p03: overlapping token-window chunking ----------
  // The context-window chunking step of a training pipeline (a long
  // document becomes overlapping fixed-size token windows — the RAG /
  // pretraining "sliding window with stride" convention): window W = 32
  // tokens, stride S = 24 (8-token overlap), last window keeps the
  // remainder. Scale shape: split + generator expressions per row — NO
  // shuffle, NO window, embarrassingly parallel over documents; output
  // volume is tokens × W/S (the overlap factor), the inherent cost of
  // overlapped chunking. Reference: flink-table UNNEST/generate_series
  // lateral shapes (flink-table-planner CorrelateITCase).
  private val p03: Q = (s, dir) => {
    val W = 32
    val S = 24
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(S))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        least(lit(W), size(col("toks")) - col("col")).as("n_tokens"),
        concat_ws(" ", slice(col("toks"), col("col") + 1, lit(W))).as("chunk_text"))
  }
  private val p03Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |st AS (SELECT doc_id, toks,
      |        unnest(generate_series(0, greatest(len(toks) - 1, 0), 24)) AS st0
      |       FROM t)
      |SELECT doc_id, CAST(st0 // 24 AS INT) AS chunk_idx,
      |       CAST(least(32, len(toks) - st0) AS INT) AS n_tokens,
      |       array_to_string(toks[st0 + 1 : st0 + 32], ' ') AS chunk_text
      |FROM st""".stripMargin

  // ---------- p04: chunk-then-pack composition ----------
  // The two pipeline stages composed the way a real pretraining flow runs
  // them: p03's overlapping token windows become the PACKING UNITS of a
  // p01-style greedy bin pack (budget 128 tokens, deterministic chunk-hash
  // buckets). Proves the operators compose declaratively — the whole
  // pipeline is still ONE Catalyst plan: generator expressions feed a
  // partitioned window, one shuffle total (the bucket hash), no collect,
  // no intermediate materialization.
  private val p04: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val W = 32; val S = 24; val budget = 128L
    val chunks = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(S))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        least(lit(W), size(col("toks")) - col("col")).cast("long").as("tokens"))
    val keyed = chunks.withColumn("bkt",
      conv(substring(md5(concat_ws(":", col("doc_id"), col("chunk_idx"))), 32, 1),
        16, 10).cast("int"))
    val w = Window.partitionBy(col("bkt")).orderBy(col("doc_id"), col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.withColumn("cum_before", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("chunk_idx"), col("tokens"), col("bkt"),
        (col("bkt").cast("long") * (1L << 20) +
          floor(col("cum_before") / budget).cast("long")).as("seq_id"),
        (col("cum_before") % budget).as("seq_off"))
  }
  private val p04Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |ch AS (SELECT doc_id, CAST(st0 // 24 AS INT) AS chunk_idx,
      |        CAST(least(32, len(toks) - st0) AS BIGINT) AS tokens
      |       FROM (SELECT doc_id, toks,
      |              unnest(generate_series(0, greatest(len(toks) - 1, 0), 24)) AS st0
      |             FROM t)),
      |k AS (SELECT doc_id, chunk_idx, tokens,
      |       CAST(strpos('0123456789abcdef', substr(md5(
      |         CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR)),
      |         32, 1)) - 1 AS INT) AS bkt
      |      FROM ch),
      |c2 AS (SELECT *, CAST(coalesce(sum(tokens) OVER (
      |         PARTITION BY bkt ORDER BY doc_id, chunk_idx
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |         AS cum_before
      |       FROM k)
      |SELECT doc_id, chunk_idx, tokens, bkt,
      |       CAST(bkt AS BIGINT) * 1048576 + cum_before // 128 AS seq_id,
      |       cum_before % 128 AS seq_off
      |FROM c2""".stripMargin

  // ---------- e01: end-to-end curation pipeline capstone ----------
  // The production pretraining-data flow composed from the engine's own
  // verified stages, as ONE Catalyst plan: quality FILTER (t02's signals,
  // integer-exact cross-multiplied threshold — no float boundary) →
  // PII REDACTION (t09's regexp_replace) → exact DEDUP on the redacted
  // hash keeping the min doc_id (d01's shape — redaction BEFORE hashing,
  // so scrubbed near-dups converge) → overlapping token-window CHUNKING
  // (p03's generator expressions) → greedy bucket PACKING (p01/p04's
  // partitioned cumsum). Two shuffles total at any scale: the dedup hash
  // aggregate and the packing bucket window — filter/redact/chunk are
  // row-local, nothing is materialized between stages, and the plan is
  // asserted cartesian-free with the shuffle count pinned (CurationSpec).
  private val e01: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val W = 32; val S = 24; val budget = 128L
    val stopWords = graft.operators.TextOps.langProfiles.head._2
    val toks0 = split(col("text"), " ")
    val stop = graft.operators.TextOps.profileScore(toks0, stopWords)
    // keep: >= 30 tokens AND stopword ratio >= 0.1 (stop*10 >= n, exact)
    val kept = docs(s, dir)
      .filter(size(toks0) >= 30 && stop * lit(10) >= size(toks0))
      .select(col("doc_id"),
        regexp_replace(col("text"), "[a-z]{9,}", "<TOK>").as("cleaned"))
    val ddup = kept.groupBy(md5(col("cleaned")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("cleaned")).as("cleaned"))
    val chunks = ddup
      .select(col("doc_id"), split(col("cleaned"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), greatest(size(col("toks")) - 1, lit(0)), lit(S))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        least(lit(W), size(col("toks")) - col("col")).cast("long").as("tokens"))
    val keyed = chunks.withColumn("bkt",
      conv(substring(md5(concat_ws(":", col("doc_id"), col("chunk_idx"))), 32, 1),
        16, 10).cast("int"))
    val w = Window.partitionBy(col("bkt")).orderBy(col("doc_id"), col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    keyed.withColumn("cum_before", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("chunk_idx"), col("tokens"), col("bkt"),
        (col("bkt").cast("long") * (1L << 20) +
          floor(col("cum_before") / budget).cast("long")).as("seq_id"),
        (col("cum_before") % budget).as("seq_off"))
  }
  private val e01Sql = {
    val set = graft.operators.TextOps.langProfiles.head._2
      .map(w => s"'$w'").mkString(", ")
    s"""WITH f AS (SELECT doc_id,
       |  regexp_replace(text, '[a-z]{9,}', '<TOK>', 'g') AS cleaned,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  len(list_filter(string_split(text, ' '), t -> t IN ($set))) AS stop
       | FROM documents),
       |kept AS (SELECT doc_id, cleaned FROM f
       |         WHERE n_tokens >= 30 AND stop * 10 >= n_tokens),
       |ddup AS (SELECT md5(cleaned) AS h, min(doc_id) AS doc_id,
       |                min(cleaned) AS cleaned
       |         FROM kept GROUP BY 1),
       |t AS (SELECT doc_id, string_split(cleaned, ' ') AS toks FROM ddup),
       |ch AS (SELECT doc_id, CAST(st0 // 24 AS INT) AS chunk_idx,
       |        CAST(least(32, len(toks) - st0) AS BIGINT) AS tokens
       |       FROM (SELECT doc_id, toks,
       |              unnest(generate_series(0, greatest(len(toks) - 1, 0), 24)) AS st0
       |             FROM t)),
       |k AS (SELECT doc_id, chunk_idx, tokens,
       |       CAST(strpos('0123456789abcdef', substr(md5(
       |         CAST(doc_id AS VARCHAR) || ':' || CAST(chunk_idx AS VARCHAR)),
       |         32, 1)) - 1 AS INT) AS bkt
       |      FROM ch),
       |c2 AS (SELECT *, CAST(coalesce(sum(tokens) OVER (
       |         PARTITION BY bkt ORDER BY doc_id, chunk_idx
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |         AS cum_before
       |       FROM k)
       |SELECT doc_id, chunk_idx, tokens, bkt,
       |       CAST(bkt AS BIGINT) * 1048576 + cum_before // 128 AS seq_id,
       |       cum_before % 128 AS seq_off
       |FROM c2""".stripMargin
  }

  // ---------- t08: unigram log-probability (novelty) score ----------
  // The CCNet/Dolma-style LM-score proxy without a model: a document's
  // mean negative log corpus-unigram probability. Low = boilerplate made
  // of ubiquitous tokens; high = rare-token text. Scale shape: explode →
  // per-token hash count (the corpus LM, one shuffle keyed on the token)
  // → keyed join back → per-doc hash agg — O(corpus tokens), no sorts, no
  // windows; the scalar token total rides a broadcast.
  private val t08: Q = (s, dir) => {
    val tk = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = tk.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val tot = tf.agg(sum(col("cnt")).as("total"))
    tk.join(tf, "tok")
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("cnt") / col("total"))), 4).as("novelty"))
  }
  private val t08Sql =
    """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |            FROM documents),
      |tf AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
      |tot AS (SELECT sum(cnt) AS total FROM tf)
      |SELECT doc_id, count(*) AS n_tokens,
      |       round(avg(-ln(cnt / total)), 4) AS novelty
      |FROM tk JOIN tf USING (tok), tot
      |GROUP BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "p03_doc_chunking" -> p03, "p04_chunk_packing" -> p04,
    "t08_novelty_score" -> t08, "t09_pii_redact" -> t09,
    "t06_regex_scan" -> t06, "t07_repetition_filter" -> t07,
    "d09_stratified_sample" -> d09, "d10_token_budget" -> d10,
    "d11_token_budget_scalable" -> d11, "d12_incremental_dedup" -> d12,
    "d13_decontaminate" -> d13, "d14_fuzzy_decontaminate" -> d14,
    "d15_chunk_dedup" -> d15, "p01_seq_packing" -> p01,
    "p02_domain_mix" -> p02, "e01_curation_pipeline" -> e01)
  val oracles: Map[String, String] = Map(
    "p03_doc_chunking" -> p03Sql, "p04_chunk_packing" -> p04Sql,
    "t08_novelty_score" -> t08Sql, "t09_pii_redact" -> t09Sql,
    "t06_regex_scan" -> t06Sql, "t07_repetition_filter" -> t07Sql,
    "d09_stratified_sample" -> d09Sql, "d10_token_budget" -> d10Sql,
    "d11_token_budget_scalable" -> d11Sql, "d12_incremental_dedup" -> d12Sql,
    "d13_decontaminate" -> d13Sql, "d14_fuzzy_decontaminate" -> d14Sql,
    "d15_chunk_dedup" -> d15Sql, "p01_seq_packing" -> p01Sql,
    "p02_domain_mix" -> p02Sql, "e01_curation_pipeline" -> e01Sql)
}
