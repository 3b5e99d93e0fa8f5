package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (the reference rebalances via
  * flink-java DataSet#rebalance / partitionByHash; Spark-side the analog is
  * salting + AQE skew-join).
  *
  * `saltedEquiJoin` splits each hot left-side key across `factor` reducers by
  * appending a deterministic salt derived from the left row's other columns,
  * and replicates the right side `factor` times. Result set is identical to
  * the plain equi-join; the shuffle fan-out per key drops by ~`factor`.
  * Use when a known-skewed key distribution defeats AQE's size-based
  * splitting (e.g. one tenant = 30% of rows).
  */
object Skew {

  def saltedEquiJoin(left: DataFrame, right: DataFrame, leftKey: String,
                     rightKey: String, factor: Int,
                     saltSource: Column): DataFrame = {
    val l = left.withColumn("__salt", pmod(hash(saltSource), lit(factor)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
