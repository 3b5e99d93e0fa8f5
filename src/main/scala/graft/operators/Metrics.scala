package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Flink accumulator / metric analog (reference flink-core/src/main/java/
  * org/apache/flink/api/common/accumulators/{Accumulator,IntCounter,
  * LongCounter,DoubleCounter,Histogram}.java and the runtime metric groups
  * registered through RuntimeContext#addAccumulator): counters that ride
  * INSIDE the job and surface with its result, instead of a second pass
  * over the data.
  *
  * Spark-first mapping: `Dataset.observe` — named aggregate expressions
  * evaluated inline with the query plan (one extra CollectMetrics node, no
  * extra scan, no shuffle):
  *  - batch: register an [[Observation]], read `observation.get` after the
  *    first action — the JobExecutionResult#getAccumulatorResult analog;
  *  - streaming: `observe(name, ...)` and read per-micro-batch values from
  *    `StreamingQueryProgress.observedMetrics` — the metric-group analog,
  *    one row per batch exactly like Flink's per-checkpoint metric reports.
  */
object Metrics {

  /** Batch accumulators: attach named aggregates, read via `obs.get` after
    * an action. */
  def observed(df: DataFrame, obs: Observation, aggs: Seq[Column]): DataFrame =
    df.observe(obs, aggs.head, aggs.tail: _*)

  /** Streaming metrics: attach named aggregates under `name`; values arrive
    * in every StreamingQueryProgress.observedMetrics(name). */
  def observedStream(df: DataFrame, name: String, aggs: Seq[Column]): DataFrame =
    df.observe(name, aggs.head, aggs.tail: _*)
}
