package graft.streaming

import graft.catalog.TableMeta
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Multi-table / multi-database orchestration — the engine analog of the
  * reference's 9 source connectors × 42 tables (reference:
  * .env.template allowlists; one Debezium connector per DB with
  * `tasks.max=1`). In Spark each table is an independent streaming
  * query; the scheduler interleaves all of them over the executors, so
  * there is no fixed worker-pool sizing to tune (reference:
  * migrate_v3.py:49 MIGRATION_WORKERS).
  *
  * Lifecycle mirrors the reference's register/pause/resume/delete
  * connector workflow (reference: Makefile:64-110) with
  * start/stop/awaitAll on streaming queries.
  */
class CdcOrchestrator(spark: SparkSession, root: String) {

  private val pipelines = scala.collection.concurrent.TrieMap.empty[String, CdcPipeline]
  private val queries = scala.collection.concurrent.TrieMap.empty[String, StreamingQuery]

  def pipeline(meta: TableMeta): CdcPipeline =
    pipelines.getOrElseUpdate(meta.name,
      new CdcPipeline(spark, meta, s"$root/tables/${meta.name}",
        s"$root/checkpoints/${meta.name}", dlqPath = Some(s"$root/dlq/${meta.name}")))

  /** Register a table: optional snapshot seed (T2), then start its
    * change stream.
    */
  def register(meta: TableMeta, envelopeStream: DataFrame,
      snapshot: Option[DataFrame] = None): StreamingQuery = {
    val p = pipeline(meta)
    snapshot.foreach(p.bootstrap(_))
    val q = p.start(envelopeStream)
    queries.put(meta.name, q)
    q
  }

  def stop(table: String): Unit = queries.remove(table).foreach(_.stop())
  def stopAll(): Unit = queries.keys.toSeq.foreach(stop)
  def running: Seq[String] = queries.keys.toSeq.sorted
  def table(name: String): Option[graft.operators.ParquetUpsertTable] =
    pipelines.get(name).map(_.table)
}
