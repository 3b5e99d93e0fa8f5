package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The flink-state-processing-api analog (reference flink-libraries/
  * flink-state-processing-api/src/main/java/org/apache/flink/state/api/
  * Savepoint.java, ExistingSavepoint.java, BootstrapTransformation.java):
  * treat a streaming job's persisted state as a queryable BATCH table, and
  * seed a new job's initial state from a batch dataset.
  *
  * Spark-first mapping — all three capabilities are native reads/APIs, no
  * custom machinery:
  *  - `Savepoint.load(...).readKeyedState(uid, readerFn)` →
  *    `spark.read.format("statestore").load(checkpointDir)`: every keyed
  *    operator's state store in a Structured Streaming checkpoint is a
  *    batch DataFrame of (key, value, partition_id) rows, addressable by
  *    operator/store/batch exactly like the reference's operator-uid
  *    addressing. Distributed read — one task per state partition.
  *  - savepoint metadata (operator ids, state names) →
  *    `spark.read.format("state-metadata")`.
  *  - `Savepoint.create(...).withOperator(uid, bootstrapWith(dataset))` →
  *    `flatMapGroupsWithState(..., initialState = keyedBatchDataset)`:
  *    the first streaming batch starts from the supplied per-key state
  *    instead of empty — the bootstrap path, state format handled by the
  *    engine on both sides.
  */
object StateInspect {

  /** Checkpoint metadata: one row per stateful operator/store —
    * (operatorId, operatorName, stateStoreName, numPartitions,
    * minBatchId, maxBatchId, ...). The ExistingSavepoint metadata
    * surface. */
  def stateMetadata(spark: SparkSession, checkpointDir: String): DataFrame =
    spark.read.format("state-metadata").load(checkpointDir)

  /** One keyed state store as a batch DataFrame — readKeyedState. Defaults
    * (the engine's): last committed batch, operator 0, store "default".
    * Columns: key struct, value struct (for flatMapGroupsWithState state:
    * groupState fields + timeoutTimestamp), partition_id. */
  def operatorState(spark: SparkSession, checkpointDir: String,
                    batchId: Option[Long] = None,
                    operatorId: Option[Long] = None,
                    storeName: Option[String] = None): DataFrame = {
    var r = spark.read.format("statestore")
    batchId.foreach(b => r = r.option("batchId", b))
    operatorId.foreach(o => r = r.option("operatorId", o))
    storeName.foreach(n => r = r.option("storeName", n))
    r.load(checkpointDir)
  }

  /** The savepoint WRITE surface — the `Savepoint.create(backend)
    * .withOperator(uid, transformation).write(path)` analog (reference
    * flink-state-processing-api WritableSavepoint.java): materialize a
    * batch state frame into a REAL streaming checkpoint at
    * `checkpointDir`, which a later run of the same operator RESTORES
    * from via its `checkpointLocation` alone — NO initialState plumbing
    * in the restarted job, exactly how a reference job restores a written
    * savepoint. Closes the state-processing loop: read =
    * [[operatorState]], bootstrap-at-start = `initialState`, write = this.
    *
    * Mechanics: `build` receives an EMPTY-looking in-memory stream and
    * must return the operator pipeline with the state to write supplied
    * as its `initialState` (e.g. `ev => StreamOps.sessionize(ev, wm, gap,
    * initialState = Some(stateFrame))`). A streaming query with no
    * available data commits no batch at all (so no state files would be
    * written): the bootstrap therefore feeds ONE sentinel event — epoch
    * timestamp, reserved key, FILTERED OUT before `build` ever sees it —
    * purely to make batch 0 commit. The initial-state relation is part of
    * that first batch's plan, so Spark's own state store machinery writes
    * every seeded entry into the checkpoint — no hand-written store
    * files, so the on-disk format stays version-proof. The sentinel never
    * reaches the operator (no state pollution) and its epoch timestamp
    * advances the watermark nowhere (no seeded timer can have fired).
    *
    * The sentinel DID consume one source offset, which is a bootstrap
    * artifact, not real input — left in place it would alias against the
    * restarted run's own first block (the restart would silently skip
    * it). The offset log's batch-0 entry is therefore re-pointed at the
    * pre-data offset (-1) after the run: the checkpoint then presents
    * exactly a written savepoint's semantics — "state exists, no input
    * consumed" — and the restarted source replays from ITS beginning.
    * The offset log is the checkpoint's stable line-oriented text format
    * (version header, metadata json, one offset json per source).
    *
    * The restarted query must use the same operator shape (same state
    * and output encoders) and the same `checkpointLocation`, with NO
    * initialState plumbing — the same contract as restoring any
    * checkpoint.
    *
    * `restartSourceOffsetJson` (r17, lifting the LongOffset-only named
    * rejection — the reference's WritableSavepoint writes state files for
    * ANY source, flink-state-processing-api/.../WritableSavepoint.java):
    * when the RESTARTED query reads a source with STRUCTURED json offsets
    * (Kafka's per-partition map, the file source's `{"logOffset":N}`),
    * the default `-1` rewrite would fail that source's offset
    * deserialization. Pass the restart source's own "nothing consumed"
    * sentinel instead — Kafka: `{"<topic>":{"<part>":-2}}` (the earliest
    * sentinel), file source: `{"logOffset":-1}` — and batch 0's committed
    * offset is rewritten to it verbatim, so the restarted source replays
    * from ITS beginning while the written state restores as usual. The
    * state files are source-agnostic; ONLY the offset line is
    * format-bound, which is why the sentinel is caller-supplied. */
  def writeSavepoint(spark: SparkSession, checkpointDir: String,
                     outputMode: String = "update",
                     restartSourceOffsetJson: Option[String] = None)(
      build: Dataset[Event] => Dataset[_]): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    implicit val evEnc = Encoders.product[Event]
    val src = MemoryStream[Event]
    src.addData(Event(Long.MinValue, new java.sql.Timestamp(0L), "__bootstrap__", 0.0))
    val q = build(src.toDS().filter(_.user_id != Long.MinValue))
      .writeStream.format("noop")
      .option("checkpointLocation", checkpointDir)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // re-point batch 0's committed source offset at "nothing consumed"
    val off = new java.io.File(s"$checkpointDir/offsets/0")
    require(off.isFile, s"writeSavepoint: bootstrap batch did not commit " +
      s"(no ${off.getPath})")
    val lines = scala.io.Source.fromFile(off, "UTF-8") match {
      case s => try s.getLines().toVector finally s.close()
    }
    // v1 header + metadata json stay; the single source's offset -> -1.
    // EXACTLY one source and one committed batch are the bootstrap
    // contract: with a second source (or a trailing no-data batch) the
    // rewrite would leave a consumed offset in place and the restarted
    // run would silently skip its first block — refuse by name instead.
    require(lines.length == 3, "writeSavepoint: the bootstrap pipeline " +
      s"must read exactly ONE streaming source (offset log has " +
      s"${lines.length - 2} source offset lines) — multi-source operators " +
      "cannot be savepoint-bootstrapped this way")
    require(!new java.io.File(s"$checkpointDir/offsets/1").exists(),
      "writeSavepoint: the bootstrap run committed more than one batch — " +
      "the batch-0 offset rewrite would be ineffective")
    // the rewritten sentinel: '-1' deserializes as a LongOffset — the
    // format of MemoryStream (this bootstrap's source). A restart source
    // with STRUCTURED json offsets (Kafka's per-partition map, the file
    // source's {"logOffset":N}) would fail to parse it — the caller
    // supplies that source's own "nothing consumed" sentinel instead
    // (r17; validated as json so a typo fails HERE, not as an opaque
    // deserialization error on restart)
    val sentinel = restartSourceOffsetJson match {
      case None => "-1"
      case Some(json) =>
        val j = json.trim
        require(j.startsWith("{") || j.startsWith("["),
          s"writeSavepoint: restartSourceOffsetJson ('$json') is not a " +
            "structured json offset — for LongOffset-style restart " +
            "sources (MemoryStream, a plain integer offset) omit it")
        // FAIL_ON_TRAILING_TOKENS: readTree alone accepts '{...} garbage'
        // (parses the leading object, ignores the rest) — exactly the
        // typo this validation exists to catch at write time
        require(scala.util.Try(
            new com.fasterxml.jackson.databind.ObjectMapper()
              .enable(com.fasterxml.jackson.databind.DeserializationFeature
                .FAIL_ON_TRAILING_TOKENS)
              .readTree(j))
          .isSuccess,
          s"writeSavepoint: restartSourceOffsetJson does not parse as " +
            s"json: '$json'")
        // the offset log is line-oriented: one offset per line
        require(!j.contains("\n") && !j.contains("\r"),
          "writeSavepoint: restartSourceOffsetJson must be a single line")
        j
    }
    require(restartSourceOffsetJson.nonEmpty ||
        scala.util.Try(lines.last.trim.toLong).isSuccess,
      "writeSavepoint: the bootstrap source's committed offset " +
        s"('${lines.last}') is not a plain LongOffset integer — only " +
        "LongOffset-style sources (MemoryStream, file sources) can be " +
        "savepoint-bootstrapped (a structured-offset source like Kafka " +
        "would fail to deserialize the '-1' rewrite on restart)")
    java.nio.file.Files.write(off.toPath,
      (lines.dropRight(1) :+ sentinel).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** [[StreamOps.dedupKeepLast]] with BOOTSTRAPPED state — the
    * BootstrapTransformation analog: `initial` (a batch dataset, one row
    * per key at most — enforce upstream) becomes each key's pre-existing
    * "latest row" before the first streaming batch, exactly as if a prior
    * run had checkpointed it. Same update-mode emission, TTL, and timeout
    * behavior as the un-seeded operator. */
  def dedupKeepLastBootstrapped(events: Dataset[Event], watermark: String,
                                initial: Dataset[Event],
                                idleTtlMs: Long = 86400000L): Dataset[Event] = {
    implicit val evEnc = Encoders.product[Event]
    implicit val keyEnc = Encoders.scalaLong
    val init = initial.groupByKey(_.user_id)
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Event, Event](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout, init) {
        (_: Long, rows: Iterator[Event], state: GroupState[Event]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val latest = (state.getOption.iterator ++ rows)
              .maxBy(e => (e.ts.getTime, e.value))
            state.update(latest)
            state.setTimeoutTimestamp(
              math.max(latest.ts.getTime, state.getCurrentWatermarkMs()) + idleTtlMs)
            Iterator.single(latest)
          }
      }
  }
}
