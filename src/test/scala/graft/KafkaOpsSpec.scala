package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

/** Kafka connector mapping (§2.9). No broker/connector jar ships in this
  * environment, so the wire-schema transforms are specced by MemoryStream
  * substitution: a stream with EXACTLY the schema Spark's kafka source
  * emits drives decodeKafka, and encodeKafka's producer-record shape is
  * asserted batch-side. kafkaRaw/kafkaSink are thin format("kafka") wiring
  * over these, documented in StreamOps.
  */
// package-level for the product encoder (Janino cannot build nested-in-object
// case classes) — mirrors Spark's kafka source schema field-for-field
case class KafkaRecord(key: Array[Byte], value: Array[Byte], topic: String,
                       partition: Int, offset: Long, timestamp: Timestamp,
                       timestampType: Int)

class KafkaOpsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._
  private implicit def sqlCtx = spark.sqlContext

  private val T0 = Timestamp.valueOf("2024-01-01 00:00:00")

  test("decodeKafka parses the kafka wire schema (MemoryStream substitution)") {
    val in = MemoryStream[KafkaRecord]
    in.addData(
      KafkaRecord("k1".getBytes("UTF-8"), """{"a":1}""".getBytes("UTF-8"),
        "events", 0, 42L, T0, 0),
      KafkaRecord(null, "plain".getBytes("UTF-8"), "events", 1, 7L, T0, 0))
    val q = StreamOps.decodeKafka(in.toDF())
      .writeStream.format("memory").queryName("s_kafka_dec").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("s_kafka_dec")
      .select("key", "value", "topic", "partition", "offset")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getLong(4))).sortBy(_._5).toSeq
    assert(rows == Seq(
      (null, "plain", "events", 1, 7L),
      ("k1", """{"a":1}""", "events", 0, 42L)))
  }

  test("encodeKafka produces the producer record shape (string key, JSON value)") {
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "click", 2.5)).toDF("user_id", "event_type", "value")
    val rec = StreamOps.encodeKafka(df, col("user_id"),
      Seq(col("event_type"), col("value"))).collect()
    assert(rec.length == 1)
    assert(rec(0).getString(0) == "1")
    assert(rec(0).getString(1) == """{"event_type":"click","value":2.5}""")
  }

  test("decodeKafka -> watermarked window agg: the consumer pipeline shape") {
    import org.apache.spark.sql.functions._
    val in = MemoryStream[KafkaRecord]
    def rec(off: Long, sec: Int, v: Int) = KafkaRecord(null,
      s"""{"value":$v}""".getBytes("UTF-8"), "t", 0, off,
      new Timestamp(T0.getTime + sec * 1000L), 0)
    in.addData(rec(0, 10, 1), rec(1, 20, 2), rec(2, 36000, 0)) // last advances the watermark
    val parsed = StreamOps.decodeKafka(in.toDF())
      .select(col("timestamp").as("ts"),
        get_json_object(col("value"), "$.value").cast("int").as("v"))
    val agg = parsed.withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute")).agg(sum("v").as("sv"))
    val q = agg.writeStream.format("memory").queryName("s_kafka_agg")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val sv = spark.table("s_kafka_agg").select("sv").as[Long].collect().toSet
    assert(sv.contains(3L), s"first window must sum to 3, got $sv")
  }
}
