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

  def pipeline(meta: TableMeta): CdcPipeline = {
    val p = pipelines.getOrElseUpdate(meta.name,
      new CdcPipeline(spark, meta, s"$root/tables/${meta.name}",
        s"$root/checkpoints/${meta.name}", dlqPath = Some(s"$root/dlq/${meta.name}")))
    // pipelines are keyed by table name; silently reusing one built from
    // a DIFFERENT meta would drop the caller's casts/renames on merged
    // data — fail loudly instead
    require(p.meta == meta,
      s"pipeline for '${meta.name}' already exists with different metadata " +
        s"(${p.meta}); stop it before re-registering with $meta")
    p
  }

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

object CdcOrchestrator {
  import graft.catalog.ConnectorConfig

  /** Stand up the orchestrator's table set from a deployed connector
    * config file — the reference's whole ingestion surface is 18 such
    * JSONs (reference: the connectors/sources/mariadb JSONs), so "run this
    * config" has to be the entry point, not hand-built TableMetas. Keys
    * and timestamp columns come from catalog discovery (S4/S5); bit
    * repairs, casts, and conditional renames come from the config's SMT
    * chain.
    *
    * Returns the orchestrator plus the per-table metas it will register
    * with — the caller attaches each table's envelope stream (transport
    * is deployment-specific: Kafka in production, file/memory in tests).
    */
  def fromConfig(spark: SparkSession, root: String, cfg: ConnectorConfig,
      discover: String => Option[TableMeta]): (CdcOrchestrator, Map[String, TableMeta]) = {
    val orch = new CdcOrchestrator(spark, root)
    val metas = cfg.tableMetas(discover)
    metas.values.foreach(orch.pipeline) // pre-create so table() resolves pre-start
    (orch, metas)
  }
}
