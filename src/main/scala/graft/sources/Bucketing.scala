package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffled, co-located joins. Writing both
  * sides of a frequent join bucketed by the join key (same bucket
  * count) lets Spark plan the join with ZERO shuffle — each task reads
  * matching buckets from both tables. At 100 TB this converts the
  * biggest recurring cost (re-shuffling fact tables for every join/agg
  * on the same key) into a one-time layout decision; the engine's
  * upsert store applies the same idea via its PK hash-bucket
  * directories.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets, so
    * downstream merge-joins also skip the sort).
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int = 16): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)

  /** Join two same-bucketed tables on the bucket key — plans with no
    * Exchange on either side.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
