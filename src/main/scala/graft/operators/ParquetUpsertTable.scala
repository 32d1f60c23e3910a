package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mutable keyed table over immutable parquet — the engineering core of
  * the reference's upsert sink (SURVEY §7.4.1). Plain parquet cannot be
  * updated in place, so the table is hash-bucketed on the PK
  * (`pmod(xxhash64(pk), numBuckets)` directory partitions) and a merge
  * rewrites ONLY the buckets that the incoming batch touches.
  *
  * Scale rationale: at 100 TB with e.g. 4096 buckets a CDC micro-batch
  * that touches 1% of keys rewrites ~1% of the table instead of all of
  * it, and the bucket column keeps merge shuffles aligned across batches.
  * (This is a hand-rolled equivalent of what Delta/Iceberg MERGE does;
  * neither is available in this dependency-free build.)
  */
class ParquetUpsertTable(
    spark: SparkSession,
    val path: String,
    val pkCols: Seq[String],
    val numBuckets: Int = 64) {

  private val BucketCol = "__bucket"
  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketExpr: Column =
    pmod(xxhash64(pkCols.map(col): _*), lit(numBuckets.toLong)).cast("int")

  def exists: Boolean = fs.exists(new Path(path))

  /** Current materialized state (without the internal bucket column). */
  def read(): DataFrame = spark.read.parquet(path).drop(BucketCol)

  /** Bootstrap/seed the table from a snapshot (T2 `schema_only` seed:
    * batch load then stream from the recorded position).
    */
  def seed(snapshot: DataFrame): Unit =
    snapshot.withColumn(BucketCol, bucketExpr)
      .repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(path)

  /** Merge a batch of unwrapped change events (`__op`, ordering cols +
    * row fields): upsert latest-per-key, apply deletes, rewriting only
    * affected buckets. Idempotent under replay (T9) because the merge is
    * latest-state, not append.
    */
  def merge(changes: DataFrame, orderCols: Seq[Column]): Unit = {
    if (changes.isEmpty) return
    if (!exists) {
      val latest = CdcMerge.latestPerKey(changes, pkCols, orderCols)
        .filter(col("__op") =!= Envelope.OpDelete)
        .drop("__op")
      seed(latest.drop(latest.columns.filter(_.startsWith("__")): _*))
      return
    }
    val bucketed = changes.withColumn(BucketCol, bucketExpr)
    val touched = bucketed.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted // bounded by numBuckets, driver-safe
    val current = spark.read.parquet(path)
      .filter(col(BucketCol).isin(touched: _*))
      .drop(BucketCol)
    val rowCols = current.columns.toSeq
    val merged = CdcMerge.applyChanges(
      current, bucketed.drop(BucketCol), pkCols, orderCols)
      .select(rowCols.map(col): _*)
      .withColumn(BucketCol, bucketExpr)

    // Write merged buckets to a staging dir, then atomically swap the
    // touched bucket directories (read-current + overwrite-in-place would
    // corrupt on failure; swap keeps each bucket all-old or all-new).
    val staging = s"$path.staging"
    merged.repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(staging)
    val f = fs
    touched.foreach { b =>
      val oldDir = new Path(s"$path/$BucketCol=$b")
      val newDir = new Path(s"$staging/$BucketCol=$b")
      if (f.exists(oldDir)) f.delete(oldDir, true)
      if (f.exists(newDir)) f.rename(newDir, oldDir)
    }
    f.delete(new Path(staging), true)
  }
}
