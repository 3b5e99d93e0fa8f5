package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the r9 curation additions (d15 chunk dedup, p01
  * sequence packing, p02 domain mixing) on crafted corpora — the DuckDB
  * oracle proves engine agreement at sf0.01; these prove the SEMANTICS on
  * inputs where the right answer is known by construction.
  */
class CurationSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  /** Write a minimal documents table and return its dir. */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_curation").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d15: the first occurrence of a shared chunk is never the duplicate") {
    // docs 1 and 2 share their first 3-word chunk; doc 1 (lower id) owns it
    val dir = docsDir(Seq(
      (1L, "a b c x y z", "en", "s0"),
      (2L, "a b c q r s", "en", "s0")))
    val out = SparkEntry.queries("d15_chunk_dedup")(spark, dir)
      .select("doc_id", "n_chunks", "n_dup").as[(Long, Long, Long)]
      .collect().map { case (k, v2, v3) => k -> ((v2, v3)) }.toMap
    assert(out(1L) == (2L, 0L), s"doc 1 owns every chunk: $out")
    assert(out(2L) == (2L, 1L), s"doc 2 duplicates exactly 'a b c': $out")
  }

  test("d15: within one doc the earlier position owns a repeated chunk") {
    val dir = docsDir(Seq((7L, "a b c a b c", "en", "s0")))
    val row = SparkEntry.queries("d15_chunk_dedup")(spark, dir)
      .select("n_chunks", "n_dup").as[(Long, Long)].head()
    assert(row == (2L, 1L), s"second repetition must count as dup: $row")
  }

  test("d15: docs shorter than one chunk vanish (no descending-sequence crash)") {
    val dir = docsDir(Seq((1L, "a b", "en", "s0"), (2L, "x y z w", "en", "s0")))
    val ids = SparkEntry.queries("d15_chunk_dedup")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L), s"2-word doc has zero chunks: $ids")
  }

  test("p01: packing is exhaustive, budget-aligned, and starts at offset 0") {
    val out = SparkEntry.queries("p01_seq_packing")(spark, sfDir)
      .select("doc_id", "tokens", "bkt", "seq_id", "seq_off")
      .as[(Long, Long, Int, Long, Long)].collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.length == nDocs, "packing must assign every document")
    assert(out.forall { case (_, _, _, _, off) => off >= 0 && off < 512 },
      "a doc's start offset always lands inside its sequence's budget")
    // per bucket: seq index derives from the running sum — reconstruct and
    // compare (doc order within bucket = doc_id)
    out.groupBy(_._3).foreach { case (bkt, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, toks, _, seqId, off) =>
        assert(seqId == bkt.toLong * (1L << 20) + cum / 512,
          s"doc $id in bucket $bkt: seq_id mismatch (cum=$cum)")
        assert(off == cum % 512, s"doc $id: offset mismatch")
        cum += toks
      }
    }
  }

  test("p04: chunk-then-pack composition covers every chunk, one plan") {
    val out = SparkEntry.queries("p04_chunk_packing")(spark, sfDir)
    val rows = out.select("doc_id", "chunk_idx", "tokens", "bkt", "seq_id", "seq_off")
      .as[(Long, Int, Long, Int, Long, Long)].collect()
    val nChunks = SparkEntry.queries("p03_doc_chunking")(spark, sfDir).count()
    assert(rows.length == nChunks, "every p03 chunk must be packed")
    assert(rows.forall { case (_, _, _, _, _, off) => off >= 0 && off < 128 })
    // the composed pipeline stays ONE plan with ONE shuffle of its own:
    // generator expressions feed the partitioned packing window directly
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("Generate") && p.contains("Window"),
      s"expected generator + partitioned window in one plan:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), "no cross product")
  }

  test("e01: end-to-end pipeline — filter/redact/dedup semantics, two shuffles") {
    // doc 1+2: exact duplicates AFTER redaction (differ only inside a
    // 9+-char word) -> one survives (min doc_id); doc 3: too few tokens ->
    // filtered; doc 4: no stopwords -> filtered; doc 5: distinct keeper
    val stopy = (1 to 15).map(_ => "the a").mkString(" ")       // 30 toks, all stop
    val d1 = s"$stopy longwordxxa"
    val d2 = s"$stopy longwordyyb"                              // same after <TOK>
    val d5 = s"$stopy extra"
    val dir = docsDir(Seq(
      (1L, d1, "en", "s"), (2L, d2, "en", "s"),
      (3L, "the a", "en", "s"), (4L, (1 to 40).map(_ => "zz").mkString(" "), "en", "s"),
      (5L, d5, "en", "s")))
    val out = SparkEntry.queries("e01_curation_pipeline")(spark, dir)
    val kept = out.select("doc_id").distinct().as[Long].collect().toSet
    assert(kept == Set(1L, 5L), s"kept=$kept")
    // ONE Catalyst plan, cartesian-free, exactly TWO shuffles of its own
    // (dedup hash aggregate + packing bucket window)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // AQE's toString prints the initial AND final trees (with distinct
    // plan ids) — count exchanges in the FINAL tree only
    val exchanges = p.split("== Initial Plan ==").head
      .split("\n").count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"expected <= 2 shuffles, got $exchanges:\n${p.take(3000)}")
  }

  test("p02: over-represented groups downsample, under-represented keep whole") {
    // 4 docs of lang a (200% of uniform share), 2 of b, 2 of c... target
    // share = 8/3 ≈ 2.67 docs → b and c keep all, a keeps u256 < 2/3*256
    val dir = docsDir(
      (1L to 4L).map(i => (i, s"alpha text $i", "a", "s0")) ++
        Seq((5L, "beta one", "b", "s0"), (6L, "beta two", "b", "s0"),
          (7L, "gamma one", "c", "s0"), (8L, "gamma two", "c", "s0")))
    val kept = SparkEntry.queries("p02_domain_mix")(spark, dir)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang.getOrElse("b", 0) == 2 && byLang.getOrElse("c", 0) == 2,
      s"groups at/below the target share are never downsampled: $byLang")
    // lang a's keep decision is deterministic in the text hashes: recompute
    val u = (1L to 4L).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"alpha text $i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      i -> Integer.parseInt(h.substring(30, 32), 16)
    }.toMap
    val expectA = u.count { case (_, u256) => 3L * u256 * 4 < 256L * 8 }
    assert(byLang.getOrElse("a", 0) == expectA,
      s"lang a keeps exactly the docs with u256 < 2/3*256: $byLang vs $expectA")
  }
}
