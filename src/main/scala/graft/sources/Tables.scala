package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Star-schema loaders.
  *
  * Mirrors the reference's table-source surface (Flink
  * `flink-table/flink-table-api-java/.../TableEnvironment.java` table
  * registration + `flink-formats/flink-parquet` input format), re-expressed
  * as Spark DataSource V2 parquet reads so Catalyst gets predicate pushdown
  * and column pruning for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Spark 4 cannot read parquet TIMESTAMP(NANOS) natively; sessions set
    // spark.sql.legacy.parquet.nanosAsLong=true, which surfaces `ts` as long
    // nanos. Convert back to a microsecond timestamp (`div` keeps 64-bit
    // integer precision; a double division would lose sub-ms accuracy).
    if (df.schema.fields.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
