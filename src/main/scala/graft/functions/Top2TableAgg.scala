package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

// package-level: Janino-generated encoder code cannot construct
// nested-in-object case classes
case class TopPair(price: Double, linenumber: Long)
case class Top2Buf(a: Seq[TopPair])
case class TopRow(price: Double, linenumber: Long, rnk: Int)
case class Top2Rows(rows: Seq[TopRow])

/** TABLE aggregate function — the reference's TableAggregateFunction /
  * flatAggregate surface (flink-table/flink-table-common/src/main/java/org/
  * apache/flink/table/functions/TableAggregateFunction.java and the Top2
  * example at flink-table/flink-table-api-java/src/main/java/org/apache/
  * flink/table/api/GroupedTable.java:96): an aggregate that emits MULTIPLE
  * rows per group through `collect(...)`.
  *
  * Spark's typed [[Aggregator]] returns one value per group, so the
  * emit-many contract is re-expressed as finish() returning the row SET as
  * an array-of-structs which the caller explodes — `inline(top2(...).rows)`
  * from SQL text is the `flatAggregate(call("top2", ...))` analog, and the
  * explode is a generator projection over the (already tiny) one-row-per-
  * group aggregate output, so the plan is the same single hash aggregate a
  * scalar UDAGG gets; the O(1)-bounded buffer merges map-side exactly like
  * a Flink accumulator with merge().
  *
  * Top-2 (price, linenumber) per group, rank attached — ties broken by the
  * lowest line number so the emitted set is deterministic (the oracle
  * replays it as a row_number window).
  */
object Top2TableAgg extends Aggregator[(Double, Long), Top2Buf, Top2Rows] {
  private def better(x: TopPair, y: TopPair): Boolean =
    x.price > y.price || (x.price == y.price && x.linenumber < y.linenumber)
  override def zero: Top2Buf = Top2Buf(Nil)
  override def reduce(b: Top2Buf, a: (Double, Long)): Top2Buf =
    Top2Buf((b.a :+ TopPair(a._1, a._2)).sortWith(better).take(2))
  override def merge(x: Top2Buf, y: Top2Buf): Top2Buf =
    Top2Buf((x.a ++ y.a).sortWith(better).take(2))
  override def finish(b: Top2Buf): Top2Rows =
    Top2Rows(b.a.zipWithIndex.map { case (p, i) =>
      TopRow(p.price, p.linenumber, i + 1)
    })
  override def bufferEncoder: Encoder[Top2Buf] = Encoders.product[Top2Buf]
  override def outputEncoder: Encoder[Top2Rows] = Encoders.product[Top2Rows]
}
