package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** DataSet physical-distribution ops (reference flink-java DataSet:
  * rebalance, partitionByHash, partitionByRange, sortPartition, first-n)
  * mapped to Spark's repartition family. */
class PhysicalOpsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private lazy val orders = Tables.load(spark, sfDir, "orders")

  test("rebalance → round-robin repartition") {
    val df = orders.repartition(8)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning"))
    assert(df.count() == orders.count())
  }

  test("partitionByHash → repartition(cols): co-partitioned keys") {
    val df = orders.repartition(8, col("o_custkey"))
    val twoPlaces = df.select("o_custkey")
      .withColumn("pid", spark_partition_id())
      .groupBy("o_custkey").agg(countDistinct("pid").as("np"))
      .filter(col("np") > 1).count()
    assert(twoPlaces == 0, "each key must land in exactly one partition")
  }

  test("partitionByRange + sortPartition: globally range-split, locally sorted") {
    val df = orders.repartitionByRange(4, col("o_totalprice"))
      .sortWithinPartitions("o_totalprice")
    assert(df.queryExecution.executedPlan.toString.contains("rangepartitioning"))
    // within every partition the rows are sorted
    val violations = df.select("o_totalprice").rdd.mapPartitions { it =>
      val v = it.map(_.getDouble(0)).toSeq
      Iterator.single(v.zip(v.drop(1)).count { case (a, b) => a > b })
    }.sum()
    assert(violations == 0.0)
  }

  test("first-n (DataSet.first) via limit") {
    assert(orders.limit(7).count() == 7)
  }

  test("zipWithIndex: contiguous 1..N ids, range-partitioned fact side") {
    // DataSetUtils.zipWithIndex analog: no single-partition shuffle of the
    // FACT rows — the order is established by a range repartition (the
    // offsets table is metadata-sized)
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("k", col("id") * 7 % 10000) // unique, shuffled order
    val out = graft.operators.Relational.zipWithIndex(df, Seq(col("k")))
    out.collect()
    val idx = out.select("idx").as[Long].collect().sorted
    assert(idx.head == 1L && idx.last == 10000L && idx.distinct.length == 10000)
    // index follows the k-order
    val pairs = out.select("k", "idx").as[(Long, Long)].collect().sortBy(_._1)
    assert(pairs.map(_._2).toSeq == (1L to 10000L), "idx must follow the order")
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning"), p.take(2000))
  }

  test("zipWithUniqueId → monotonically_increasing_id: unique, count-preserving") {
    // DataSetUtils.zipWithUniqueId (unique but non-contiguous ids) maps to
    // the built-in: partition-prefixed counters, no shuffle at all
    val df = spark.range(0, 10000).repartition(7)
      .withColumn("uid", monotonically_increasing_id())
    assert(df.count() == 10000)
    assert(df.select("uid").distinct().count() == 10000)
  }
}
