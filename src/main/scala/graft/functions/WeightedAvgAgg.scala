package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

// package-level: Janino-generated encoder code cannot construct
// nested-in-object case classes
case class WAvgBuf(num: Double, den: Double)

/** User-defined AGGREGATE function — the reference's AggregateFunction /
  * UDAGG surface (flink-table/flink-table-common/src/main/java/org/apache/
  * flink/table/functions/AggregateFunction.java: createAccumulator /
  * accumulate / merge / getValue), re-expressed as Spark's typed
  * [[Aggregator]] (zero / reduce / merge / finish — the same contract, and
  * `merge` makes it map-side-combining + retraction-free exactly like a
  * Flink accumulator with merge()). Registered through `functions.udaf` it
  * is callable from BOTH the DataFrame API and SQL text, mirroring Flink's
  * `tableEnv.registerFunction("wavg", new WeightedAvg)`.
  *
  * Weighted average: Σ(x·w) / Σ(w), the canonical UDAGG example in the
  * reference's docs. For builtin-expressible aggregates prefer the codegen'd
  * builtins (this object is the extension-surface demo; the oracle replays
  * it with builtins).
  */
object WeightedAvgAgg extends Aggregator[(Double, Double), WAvgBuf, Double] {
  override def zero: WAvgBuf = WAvgBuf(0.0, 0.0)
  override def reduce(b: WAvgBuf, a: (Double, Double)): WAvgBuf =
    WAvgBuf(b.num + a._1 * a._2, b.den + a._2)
  override def merge(x: WAvgBuf, y: WAvgBuf): WAvgBuf =
    WAvgBuf(x.num + y.num, x.den + y.den)
  override def finish(b: WAvgBuf): Double =
    if (b.den == 0.0) Double.NaN else b.num / b.den
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
