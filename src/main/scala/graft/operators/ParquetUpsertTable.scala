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

  /** P9 at scale: PK point lookup reading ONLY the key's hash bucket —
    * partition pruning via the bucket directory, so a lookup touches
    * 1/numBuckets of the table regardless of size.
    */
  def lookup(pkValues: Map[String, Any]): DataFrame = {
    require(pkValues.keySet == pkCols.toSet, s"lookup needs all PK cols $pkCols")
    val keyRow = pkCols.map(pkValues)
    val bucketDf = spark.range(1).select(
      pmod(xxhash64(keyRow.map(v => lit(v)): _*), lit(numBuckets.toLong)).cast("int"))
    val bucket = bucketDf.head().getInt(0)
    spark.read.parquet(s"$path/$BucketCol=$bucket")
      .filter(pkValues.map { case (c, v) => col(c) === lit(v) }.reduce(_ && _))
  }

  /** Bootstrap/seed the table from a snapshot (T2 `schema_only` seed:
    * batch load then stream from the recorded position).
    */
  def seed(snapshot: DataFrame): Unit = {
    snapshot.withColumn(BucketCol, bucketExpr)
      .repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(path)
    recordSchemaVersion(snapshot.schema)
  }

  /** S11 schema-history log — every schema version is appended as JSON
    * under `<path>.schema_history/` for restart/forensics, the engine
    * analog of Debezium's schema-history topic (reference:
    * connectors/sources/mariadb/trading.json:22-25).
    */
  def recordSchemaVersion(schema: org.apache.spark.sql.types.StructType): Unit = {
    val dir = new Path(s"$path.schema_history")
    val f = fs
    if (!f.exists(dir)) f.mkdirs(dir)
    val version = f.listStatus(dir).length
    val out = f.create(new Path(dir, f"v$version%05d.json"), true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  /** Recorded schema versions, oldest first (S11 read side). */
  def schemaHistory(): Seq[org.apache.spark.sql.types.StructType] = {
    val dir = new Path(s"$path.schema_history")
    val f = fs
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).map(_.getPath).sortBy(_.getName).toSeq.map { p =>
      val in = f.open(p)
      val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      try in.readFully(0, buf) finally in.close()
      org.apache.spark.sql.types.DataType.fromJson(new String(buf, "UTF-8"))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
  }

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
      seed(latest.drop(latest.columns.toIndexedSeq.filter(_.startsWith("__")): _*))
      return
    }
    val bucketed = changes.withColumn(BucketCol, bucketExpr)
    val touched = bucketed.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted // bounded by numBuckets, driver-safe
    val currentRaw = spark.read.parquet(path)
      .filter(col(BucketCol).isin(touched: _*))
      .drop(BucketCol)
    // T8 additive schema evolution (schema.evolution=basic, reference:
    // connectors/sinks/postgres/trading.json:17): new incoming fields
    // are added to the table as nulls for pre-existing rows.
    val incomingFields = changes.schema.fields
      .filter(f => !f.name.startsWith("__") && !currentRaw.columns.contains(f.name))
    val current = incomingFields.foldLeft(currentRaw) { (d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    if (incomingFields.nonEmpty) recordSchemaVersion(current.schema)
    // reverse alignment: short batches (columns dropped upstream) get
    // nulls for table columns they don't carry
    val missingInChanges = current.schema.fields
      .filter(f => !bucketed.columns.contains(f.name))
    val alignedChanges = missingInChanges.foldLeft(bucketed.drop(BucketCol)) { (d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    val rowCols = current.columns.toSeq
    val merged = CdcMerge.applyChanges(
      current, alignedChanges, pkCols, orderCols)
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
