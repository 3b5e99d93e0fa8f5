package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** DataSet physical-distribution ops (reference flink-java DataSet:
  * rebalance, partitionByHash, partitionByRange, sortPartition, first-n)
  * mapped to Spark's repartition family. */
class PhysicalOpsSpec extends AnyFunSuite with SparkTest {

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
}
