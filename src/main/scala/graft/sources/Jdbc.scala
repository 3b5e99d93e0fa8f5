package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink — the reference's flink-jdbc analog
  * (flink-connectors/flink-jdbc/src/main/java/org/apache/flink/api/java/io/
  * jdbc/JDBCInputFormat.java, JDBCOutputFormat.java) over Spark's built-in
  * `jdbc` format.
  *
  * Scale mapping: JDBCInputFormat's parameterized-query splits become
  * Spark's partitionColumn/lowerBound/upperBound/numPartitions — each
  * executor opens its own connection and reads one slice, so a 10^9-row
  * table fans out instead of serializing through one cursor. Predicates and
  * column pruning push into the remote engine (the generated WHERE clause),
  * like JDBCInputFormat's query rewriting. Writes batch per partition
  * (`batchsize`), the JDBCOutputFormat flush analog.
  */
object Jdbc {

  /** Whole-table (or subquery) read. `table` may be a table name or a
    * parenthesized subquery alias, exactly as the jdbc format accepts. */
  def read(spark: SparkSession, url: String, table: String,
           options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options).load()

  /** Partition-parallel read: `numPartitions` concurrent range scans over
    * `partitionColumn` ∈ [lowerBound, upperBound] — the scale path. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int,
                      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .options(options).load()

  /** Batched write (per-partition connections, `batchsize` rows per flush). */
  def write(df: DataFrame, url: String, table: String,
            mode: String = "append", batchSize: Int = 1000,
            options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize)
      .options(options).mode(mode).save()
}
