package graft.sources

import graft.catalog.TableMeta
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot (bulk-load) scans — the Spark form of the reference's
  * migration engine (reference: migrate_v3.py).
  *
  * The reference's hand-built parallelism collapses into Spark built-ins:
  *  - S2 paged scan (`LIMIT batch OFFSET n` loop, migrate_v3.py:766-806)
  *    → a single `spark.read.jdbc` (fetchsize replaces paging);
  *  - S3 ID-range partitioned scan (MIN/MAX/COUNT ranges + 10 thread
  *    workers, migrate_v3.py:527-554,570-679) → `partitionColumn` /
  *    `lowerBound` / `upperBound` / `numPartitions`, each partition a
  *    `WHERE pk BETWEEN a AND b` pushed to the database;
  *  - A7 range planning (migrate_v3.py:531-539) → `pkRange` below.
  *
  * Exercised live against an embedded Derby database (bundled with
  * Spark) in `JdbcRoundTripSpec` — real reads, range-partitioned scans,
  * and JDBC write-back; the parquet path (`Tables`) is the bulk-tested
  * store.
  */
object Snapshot {

  /** S2: single-partition JDBC snapshot. */
  def jdbcTable(spark: SparkSession, url: String, table: String,
      props: java.util.Properties, fetchSize: Int = 100000): DataFrame = {
    props.setProperty("fetchsize", fetchSize.toString)
    spark.read.jdbc(url, table, props)
  }

  /** S3: ID-range partitioned JDBC snapshot — `numPartitions` concurrent
    * range scans, the built-in replacement for the reference's
    * chunk-worker pool (chunk size 1M rows, 10 workers,
    * migrate_v3.py:51-53).
    */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String, pkCol: String,
      lower: Long, upper: Long, numPartitions: Int,
      props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, pkCol, lower, upper, numPartitions, props)

  /** A7: MIN/MAX/COUNT range planning over any DataFrame source. */
  def pkRange(df: DataFrame, pkCol: String): (Long, Long, Long) = {
    val r = df.agg(
      min(col(pkCol)).cast("long"), max(col(pkCol)).cast("long"),
      count(lit(1))).head()
    (if (r.isNullAt(0)) 0L else r.getLong(0),
      if (r.isNullAt(1)) 0L else r.getLong(1), r.getLong(2))
  }

  /** Snapshot materialization: source scan → typed repair projection →
    * partitioned analytic store (the reference's 3-phase migrate_table
    * collapses to one declarative write, SURVEY §3.2).
    */
  def materialize(df: DataFrame, meta: TableMeta, outPath: String,
      numBuckets: Int = 64): Unit = {
    val repaired = graft.operators.Envelope.castColumns(
      graft.functions.Conversions.lowercaseColumns(df), meta.casts)
    new graft.operators.ParquetUpsertTable(
      df.sparkSession, outPath, meta.pkCols, numBuckets).seed(repaired)
  }
}
