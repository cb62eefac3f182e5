package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink parity (SURVEY §2.1 S2): the reference bulk-loads
  * into Postgres over a DB connection (`products_import.py:20` — psycopg2
  * `copy_expert`; per-row `execute_values` inserts are `rag.py:52-59`)
  * and reads it back per query; the Spark-native mapping is
  * `.format("jdbc")`, which this object wraps with the two settings that
  * matter at scale:
  *
  *  - READS are range-partitioned on a numeric column
  *    (partitionColumn/lowerBound/upperBound/numPartitions), so N
  *    executors each pull their own key range over their own connection
  *    — without it Spark reads the whole table through ONE connection on
  *    one task, the single-pipe antipattern. Predicates and column
  *    pruning push into the generated SQL (the plan's JDBCRelation shows
  *    PushedFilters), so the database ships only matching rows.
  *  - WRITES batch inserts per partition (reWriteBatchedInserts-class
  *    behavior is driver-specific; the engine-side contract is one
  *    connection per partition, `batchsize` rows per round trip).
  *
  * The in-sandbox target is embedded Derby (the one JDBC engine on the
  * classpath — zero egress); against Postgres only the URL/driver
  * change. The engine's declared primary store stays the parquet
  * vector-store layout — this is the parity path for callers whose
  * corpus lives behind JDBC.
  */
object Jdbc {

  /** Bulk-load `df` into `table` (overwrite), one connection per
    * partition, `batchsize` rows per executeBatch round trip.
    */
  def writeTable(df: DataFrame, url: String, table: String,
                 batchSize: Int = 1000): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .mode("overwrite")
      .save()

  /** Range-partitioned read of `table`: `numPartitions` concurrent
    * range scans on `partitionCol` ∈ [lower, upper]. Filters and
    * projections composed on the result push down into the per-range
    * SQL.
    */
  def readTable(spark: SparkSession, url: String, table: String,
                partitionCol: String, lower: Long, upper: Long,
                numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()
}
