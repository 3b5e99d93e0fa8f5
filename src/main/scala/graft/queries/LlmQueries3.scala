package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  val queries: Map[String, Q] = Map(
    "t06_regex_scan" -> t06, "d09_stratified_sample" -> d09, "d10_token_budget" -> d10,
    "d11_token_budget_scalable" -> d11)
  val oracles: Map[String, String] = Map(
    "t06_regex_scan" -> t06Sql, "d09_stratified_sample" -> d09Sql, "d10_token_budget" -> d10Sql,
    "d11_token_budget_scalable" -> d11Sql)
}
