package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators mirroring the Blink planner's physical
  * operators in the reference:
  *  - Top-N / Rank: flink-table/flink-table-planner-blink/src/main/scala/
  *    org/apache/flink/table/planner/plan/nodes/physical/stream/StreamExecRank.scala
  *  - Deduplicate: .../stream/StreamExecDeduplicate.scala
  *  - Over aggregate: .../stream/StreamExecOverAggregate.scala
  *
  * All are expressed as declarative window functions so Catalyst plans a
  * single shuffle on the partition keys; at 100 TB the partition-by columns
  * are the shuffle keys and state per key is O(n) only within a partition.
  */
object Relational {

  /** Blink Top-N: keep the first `n` rows per group in the given order.
    * `orderBy` must be made deterministic by the caller (unique tie-break). */
  def topNPerGroup(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
                   n: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  /** Blink Deduplicate: keep exactly one row per key (first in order). */
  def dedupFirstRow(df: DataFrame, keys: Seq[Column], orderBy: Seq[Column]): DataFrame =
    topNPerGroup(df, keys, orderBy, 1).drop("rn")

  /** Flink OVER-window running aggregate (ROWS UNBOUNDED PRECEDING). */
  def runningAgg(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column],
                 agg: Column, asCol: String): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(asCol, agg.over(w))
  }

  /** DataSet coGroup (reference flink-java/src/main/java/org/apache/flink/
    * api/java/operators/CoGroupOperator.java): both sides grouped on a key,
    * the user function sees the two full groups. One shuffle per side on the
    * key, state bounded by the two groups. */
  def coGroup[K: org.apache.spark.sql.Encoder, L, R, O: org.apache.spark.sql.Encoder](
      left: org.apache.spark.sql.Dataset[L], right: org.apache.spark.sql.Dataset[R])(
      leftKey: L => K, rightKey: R => K)(
      f: (K, Iterator[L], Iterator[R]) => IterableOnce[O]): org.apache.spark.sql.Dataset[O] =
    left.groupByKey(leftKey).cogroup(right.groupByKey(rightKey))(f)
}
