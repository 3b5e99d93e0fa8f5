package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalDedup

/** The d12 engine's operator form: an EXPLICIT store path (the cluster
  * contract — a durable table path embedding the corpus version) must
  * round-trip across SparkSessions: build the store in one session,
  * incremental-dedup a later batch in a DIFFERENT session, with nothing
  * keyed by applicationId or session state in between. */
class IncrementalDedupSpec extends AnyFunSuite with SparkTest {

  test("signature store round-trips across SparkSessions at an explicit path") {
    val store = java.nio.file.Files.createTempDirectory("graft_incdedup").toString
    val sBuild = spark.newSession()
    val sQuery = spark.newSession()

    val corpusRows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "an entirely different document about distributed query engines"),
      (3L, "yet another unrelated text concerning parquet column pruning"))
    locally {
      import sBuild.implicits._
      IncrementalDedup.buildStore(corpusRows.toDF("doc_id", "text"), store,
        shingleN = 5, bands = 2, rowsPerBand = 4, maxBucket = 100, gramN = 3)
    }

    // a later application ingests a batch: doc 10 duplicates doc 1, doc 11
    // is novel — the verdicts must come purely from the on-disk store
    val verdicts = {
      import sQuery.implicits._
      val batch = Seq(
        (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
        (11L, "completely fresh material that matches nothing in the corpus")
      ).toDF("doc_id", "text")
      IncrementalDedup.dedupAgainstStore(sQuery, batch, store,
        shingleN = 5, bands = 2, rowsPerBand = 4, gramN = 3, jaccardMin = 0.5)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2))).toSet
    }
    assert(verdicts == Set((10L, Some(1L), 1L), (11L, None, 0L)), verdicts.toString)

    // rebuilding the same corpus version is idempotent (overwrite mode):
    // the verdicts do not change
    locally {
      import sBuild.implicits._
      IncrementalDedup.buildStore(corpusRows.toDF("doc_id", "text"), store,
        shingleN = 5, bands = 2, rowsPerBand = 4, maxBucket = 100, gramN = 3)
    }
    val again = {
      import sQuery.implicits._
      val batch = Seq((10L, "the quick brown fox jumps over the lazy dog near the river bank"))
        .toDF("doc_id", "text")
      IncrementalDedup.dedupAgainstStore(sQuery, batch, store,
        shingleN = 5, bands = 2, rowsPerBand = 4, gramN = 3, jaccardMin = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(again == Set((10L, 1L)), again.toString)
  }
}
