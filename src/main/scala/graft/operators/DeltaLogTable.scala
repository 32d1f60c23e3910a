package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read keyed table: the append-optimized alternative to
  * `ParquetUpsertTable` (SURVEY §7.4.1 "base + deltas with W1 view").
  *
  * Write path: each change batch APPENDS a delta file — no read, no
  * rewrite, O(batch) per micro-batch regardless of table size. Read
  * path: base ∪ deltas collapsed to latest-per-key with deletes applied
  * (the W1 view). `compact()` folds deltas into a new base when the
  * read amplification grows.
  *
  * Trade-off vs the bucket-rewriting table: writes are cheap and
  * constant-time (the right choice when micro-batches are frequent and
  * small relative to the table — the reference's ≤10 s propagation
  * SLA), reads pay the merge until compaction. Both stores share merge
  * semantics via `CdcMerge`, so correctness tests apply to each.
  *
  * Scale notes: deltas carry a monotonically increasing `__delta_seq`
  * so replayed appends stay ordered; compaction is itself one W1
  * window over base∪deltas — a single shuffle on the PK.
  */
class DeltaLogTable(
    spark: SparkSession,
    val path: String,
    val pkCols: Seq[String]) {

  private def basePath = s"$path/base"
  private def deltaPath = s"$path/delta"
  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(new Path(basePath))

  /** Same NULL-PK boundary policy as ParquetUpsertTable (the two stores
    * share merge semantics): violations are quarantined to
    * `<path>.nullpk/`, never admitted — a NULL key can't be upserted or
    * deleted by any later batch.
    */
  private def quarantineNullPk(changes: DataFrame): DataFrame = {
    val (keyed, ghosts) = CdcMerge.splitKeyed(changes, pkCols)
    if (!ghosts.isEmpty)
      ghosts.write.mode("append").parquet(s"$path.nullpk")
    keyed
  }

  def seed(snapshot: DataFrame): Unit =
    quarantineNullPk(snapshot).write.mode("overwrite").parquet(basePath)

  private def listSeqs(): Seq[Long] = {
    val dir = new Path(deltaPath)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("seq=")).map(_.stripPrefix("seq=").toLong)
  }

  /** max(seq)+1, not directory count: survives sparse seq dirs left by a
    * partial compaction or manual cleanup. Single-writer per table path is
    * still assumed (same as the reference's one-migrator-per-table model).
    */
  private def nextDeltaSeq(): Long =
    listSeqs().foldLeft(-1L)(math.max) + 1

  /** Append one change batch (unwrapped rows + `__op` + ordering cols).
    * No table read — constant-time in table size.
    */
  def append(changes: DataFrame, orderCols: Seq[Column]): Unit = {
    val keyed = quarantineNullPk(changes)
    val seq = nextDeltaSeq()
    // keep only the batch-latest event per key; cross-batch order is
    // resolved at read time via __delta_seq
    CdcMerge.latestPerKey(keyed, pkCols, orderCols)
      .withColumn("__delta_seq", lit(seq))
      .write.mode("overwrite").parquet(s"$deltaPath/seq=$seq")
  }

  /** The W1 merge-on-read view: latest state per key, deletes applied. */
  def read(): DataFrame = {
    val base = spark.read.parquet(basePath)
    val dir = new Path(deltaPath)
    if (!fs.exists(dir) || fs.listStatus(dir).isEmpty) return base
    val deltas = spark.read.parquet(deltaPath)
    val rowCols = base.columns.toSeq
    val baseAsChanges = base
      .withColumn("__op", lit("r"))
      .withColumn("__delta_seq", lit(-1L))
    val all = baseAsChanges.unionByName(
      deltas.select((rowCols ++ Seq("__op", "__delta_seq")).map(col): _*))
    CdcMerge.latestPerKey(all, pkCols, Seq(col("__delta_seq")))
      .filter(col("__op") =!= Envelope.OpDelete)
      .select(rowCols.map(col): _*)
  }

  def deltaCount: Long = listSeqs().size.toLong

  /** Fold all deltas into a fresh base (one PK shuffle), then drop them. */
  def compact(): Unit = {
    val merged = read()
    val tmp = s"$path/base.compact"
    merged.write.mode("overwrite").parquet(tmp)
    val f = fs
    f.delete(new Path(basePath), true)
    f.rename(new Path(tmp), new Path(basePath))
    f.delete(new Path(deltaPath), true)
  }

  /** Append and auto-compact past a read-amplification threshold. */
  def merge(changes: DataFrame, orderCols: Seq[Column], maxDeltas: Int = 16): Unit = {
    if (!exists) {
      val latest = CdcMerge.latestPerKey(changes, pkCols, orderCols)
        .filter(col("__op") =!= Envelope.OpDelete)
      seed(latest.drop(latest.columns.toIndexedSeq.filter(_.startsWith("__")): _*))
      return
    }
    append(changes, orderCols)
    if (deltaCount >= maxDeltas) compact()
  }
}
