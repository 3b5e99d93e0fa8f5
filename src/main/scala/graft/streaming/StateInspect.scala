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
