package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing operators — batch analogs of the reference's
  * DataStream window assigners and joins:
  *  - flink-streaming-java/src/main/java/org/apache/flink/streaming/api/
  *    windowing/assigners/{TumblingEventTimeWindows,SlidingEventTimeWindows,
  *    EventTimeSessionWindows}.java
  *  - KeyedStream#intervalJoin (flink-streaming-java/.../datastream/KeyedStream.java)
  *  - flink-libraries/flink-cep (followed-by patterns)
  *
  * The same window functions work unchanged under Structured Streaming with
  * `withWatermark` — see graft.streaming.StreamOps. At scale, every operator
  * here shuffles once on its grouping keys; the hop window's row
  * amplification is bounded by size/slide.
  */
object EventWindows {

  /** TUMBLE: fixed, non-overlapping event-time windows. */
  def tumbleAgg(df: DataFrame, tsCol: Column, size: String, keys: Seq[Column],
                aggs: Seq[Column]): DataFrame =
    df.groupBy((window(tsCol, size).as("w") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start")).drop("w")

  /** HOP: overlapping windows; each row lands in size/slide windows. */
  def hopAgg(df: DataFrame, tsCol: Column, size: String, slide: String,
             keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy((window(tsCol, size, slide).as("w") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("w.start")).drop("w")

  /** SESSION: gap-based windows; end = last event + gap. */
  def sessionAgg(df: DataFrame, tsCol: Column, gap: String, keys: Seq[Column],
                 aggs: Seq[Column]): DataFrame =
    df.groupBy((session_window(tsCol, gap).as("w") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("w.start"))
      .withColumn("session_end", col("w.end")).drop("w")

  /** Dynamic-gap session windows (reference flink-streaming-java/.../
    * windowing/assigners/DynamicEventTimeSessionWindows.java with
    * SessionWindowTimeGapExtractor): each element carries its OWN gap — its
    * range is [ts, ts + gap) and overlapping ranges merge, so the session
    * end is the max merged range end. Spark's `session_window` accepts a
    * per-row gap expression natively; this stays ONE keyed aggregation with
    * the same shuffle/state shape as the static-gap [[sessionAgg]]. Keep
    * `gap` strictly positive — Spark drops rows whose gap evaluates
    * non-positive. */
  def dynamicSessionAgg(df: DataFrame, tsCol: Column, gap: Column,
                        keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy((session_window(tsCol, gap).as("w") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("w.start"))
      .withColumn("session_end", col("w.end")).drop("w")

  /** TimeEvictor analog (reference flink-streaming-java/.../windowing/
    * evictors/TimeEvictor.java): before the window function runs, elements
    * older than `keep` relative to the window's max element timestamp are
    * evicted — only the trailing `keep` span of each window contributes to
    * the aggregate.
    *
    * Plan shape (the q38 pattern): the per-(window, key) max is ONE scalar
    * per group, so it's computed with a map-side-partial groupBy (tiny
    * shuffle) and joined back to the facts — the fact rows are never
    * sorted. The alternative (`max over (partition by w, keys)`) forces
    * WindowExec to sort every fact row within partitions just to attach
    * that one scalar; at 100 TB the per-partition sort dominates.
    *
    * The join back carries a SHUFFLE_HASH hint (not broadcast): with
    * low-cardinality (window, key) groups AQE still upgrades it to
    * broadcast, and with billions of distinct groups at 100 TB a forced
    * broadcast would OOM the driver. The hint matters because under
    * default configs (spark.sql.join.preferSortMergeJoin=true) a group
    * table above the broadcast threshold would otherwise plan as
    * SortMergeJoin — which sorts the fact rows, the exact regression this
    * helper exists to avoid. shuffle_hash keeps the no-Sort property in
    * both regimes. */
  def timeEvictedTumbleAgg(df: DataFrame, tsCol: Column, size: String,
                           keep: String, keys: Seq[Column],
                           aggs: Seq[Column]): DataFrame = {
    // keys may be arbitrary expressions: materialize them once under stable
    // names so the equi-join back is on plain columns
    val keyNames = keys.indices.map(i => s"__gk$i")
    val bucketed = keys.zip(keyNames)
      .foldLeft(df.withColumn("__w", window(tsCol, size))) {
        case (d, (k, n)) => d.withColumn(n, k)
      }
    val groupCols = (col("__w") +: keyNames.map(col)).toIndexedSeq
    val mx = bucketed.groupBy(groupCols: _*).agg(max(tsCol).as("__mx"))
    bucketed.join(mx.hint("shuffle_hash"), "__w" +: keyNames)
      .filter(tsCol > col("__mx") - expr(s"INTERVAL $keep"))
      .groupBy((col("__w") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("__w.start")).drop("__w")
  }

  /** CountEvictor analog (reference .../windowing/evictors/CountEvictor
    * .java): only the LAST `keep` elements of each window (by event time,
    * tie-broken on `tieCol`) reach the window function. */
  def countEvictedTumbleAgg(df: DataFrame, tsCol: Column, size: String,
                            keep: Int, tieCol: Column, keys: Seq[Column],
                            aggs: Seq[Column]): DataFrame = {
    val bucketed = df.withColumn("__w", window(tsCol, size))
    val keyCols = col("__w") +: keys
    val rn = row_number().over(
      Window.partitionBy(keyCols: _*).orderBy(tsCol.desc, tieCol.desc))
    bucketed.withColumn("__rn", rn)
      .filter(col("__rn") <= keep)
      .groupBy(keyCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("__w.start")).drop("__w")
  }

  /** DeltaEvictor analog (reference flink-streaming-java/.../windowing/
    * evictors/DeltaEvictor.java): elements whose delta from the window's
    * LAST element reaches `threshold` are evicted before the window
    * function runs — only elements close to the final element contribute.
    * `delta` is the DeltaFunction analog (default |a - b|); the last
    * element is the (ts, value)-lexicographic max, deterministic on ties.
    *
    * Plan shape (w17's discipline): the last element's value comes from
    * TWO hash aggregates — max ts per (window, key), then max value AT
    * that ts (the q38 refinement shape; a struct-max would plan as
    * SortAggregate over every fact row) — joined back with shuffle_hash
    * (AQE upgrades to broadcast when small; above the threshold default
    * configs would pick SortMergeJoin and re-sort the facts). No Sort on
    * facts in either regime, plan-asserted. */
  def deltaEvictedTumbleAgg(df: DataFrame, tsCol: Column, size: String,
                            valueCol: Column, threshold: Double,
                            keys: Seq[Column], aggs: Seq[Column],
                            delta: (Column, Column) => Column =
                              (a, b) => abs(a - b)): DataFrame = {
    val keyNames = keys.indices.map(i => s"__gk$i")
    val bucketed = keys.zip(keyNames)
      .foldLeft(df.withColumn("__w", window(tsCol, size))
        .withColumn("__v", valueCol)) {
        case (d, (k, n)) => d.withColumn(n, k)
      }
    val groupCols = (col("__w") +: keyNames.map(col)).toIndexedSeq
    val mxTs = bucketed.groupBy(groupCols: _*).agg(max(tsCol).as("__mxts"))
    val lastVal = bucketed.join(mxTs.hint("shuffle_hash"), "__w" +: keyNames)
      .filter(tsCol === col("__mxts"))
      .groupBy(groupCols: _*).agg(max(col("__v")).as("__lastv"))
    bucketed.join(lastVal.hint("shuffle_hash"), "__w" +: keyNames)
      .filter(delta(col("__v"), col("__lastv")) < threshold)
      .groupBy((col("__w") +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("__w.start")).drop("__w")
  }

  /** Flink intervalJoin: left row joins right rows of the same key whose time
    * is in (left.ts + lowerExclusive, left.ts + upper]. Planned as an
    * equi-join on the key with a range residual — at scale the shuffle is on
    * the key only, and AQE handles skewed keys. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyEq: Column,
                   leftTs: Column, rightTs: Column,
                   lower: String, upper: String): DataFrame =
    left.join(right, keyEq &&
      rightTs > leftTs + expr(s"INTERVAL $lower") &&
      rightTs <= leftTs + expr(s"INTERVAL $upper"))

  /** Per-row trailing time-range aggregate (OVER RANGE ... PRECEDING).
    * Ordered on integer epoch-micros so the frame boundary is exact. */
  def trailingRangeAgg(df: DataFrame, keys: Seq[Column], tsCol: Column,
                       trailingMicros: Long, aggs: Map[String, Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(unix_micros(tsCol))
      .rangeBetween(-trailingMicros, 0)
    aggs.foldLeft(df) { case (d, (name, a)) => d.withColumn(name, a.over(w)) }
  }
}
