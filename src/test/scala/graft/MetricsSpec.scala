package graft

import java.sql.Timestamp
import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Metrics
import graft.streaming.StreamOps.Event

/** Flink accumulator/metric analog — pipeline-embedded counters via
  * Dataset.observe, batch (Observation) and streaming (observedMetrics). */
class MetricsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._
  private implicit def sqlCtx = spark.sqlContext

  private val T0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(sec: Long) = new Timestamp(T0.getTime + sec * 1000)

  test("batch accumulators ride the job: counts/sums with no second scan") {
    val obs = new Observation("acc")
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
    val out = Metrics.observed(li, obs, Seq(
      count(lit(1)).as("rows_seen"),
      sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("large_qty")))
      .filter(col("l_quantity") > 25)
    val kept = out.count() // the action that materializes the metrics
    val m = obs.get
    assert(m("large_qty").asInstanceOf[Long] == kept,
      "inline counter must agree with the filtered result")
    assert(m("rows_seen").asInstanceOf[Long] >= kept)
  }

  test("streaming metrics surface per micro-batch in observedMetrics") {
    val in = MemoryStream[Event]
    val observed = Metrics.observedStream(in.toDF(), "batch_stats", Seq(
      count(lit(1)).as("n_events"),
      max(col("value")).as("max_value")))
    val q = observed.writeStream.format("memory").queryName("s_metrics")
      .outputMode("append").start()
    in.addData(Event(1, at(0), "click", 1.0), Event(1, at(10), "click", 7.0))
    q.processAllAvailable()
    val metrics = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("batch_stats")))
    q.stop()
    assert(metrics.nonEmpty, "observedMetrics must carry the batch_stats row")
    val last = metrics.last
    assert(last.getAs[Long]("n_events") == 2L && last.getAs[Double]("max_value") == 7.0)
  }
}
