package graft.streaming

import graft.catalog.TableMeta
import graft.operators.Validation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Active round-trip test harness — the engine analog of the
  * reference's live CDC test (reference: tests/test_cdc_live.py:214-324):
  * pick a row, mutate a safe column through the change stream, wait for
  * propagation into the materialized table, assert and time it.
  *
  * The reference picks `ORDER BY RAND() LIMIT 1` and expects
  * propagation ≤ 10 s (reference: tests/test_cdc_live.py:114-125,
  * 333-334); here row choice is deterministic (md5-keyed order, same
  * trick as query o3_sample) so runs are reproducible.
  */
object LiveRoundTrip {

  case class RoundTripResult(key: Map[String, Any], column: String,
      testValue: String, propagated: Boolean, latencyMs: Long)

  /** Pick the deterministic "random" row (md5 over the PK). */
  def pickRow(table: DataFrame, meta: TableMeta): Map[String, Any] = {
    val r = table
      .orderBy(md5(concat_ws("|", meta.pkCols.map(col(_).cast("string")): _*)),
        meta.pkCols.map(col).head)
      .select(meta.pkCols.map(col): _*)
      .head()
    meta.pkCols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
  }

  /** Safe column to mutate: comment/remark/note-ish, else any string
    * column (reference: tests/test_cdc_live.py:79-111).
    */
  def pickSafeColumn(df: DataFrame): Option[String] = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)
    stringCols.find(c => Seq("comment", "remark", "note").exists(c.toLowerCase.contains))
      .orElse(stringCols.headOption)
  }

  /** Run the round trip: emit an update event for the chosen row into
    * `emit`, then poll the materialized table until the marker value
    * appears or the deadline passes.
    *
    * @param emit      callback that injects the update change-event into
    *                  the running pipeline's source (MemoryStream add,
    *                  file write, Kafka produce)
    * @param readTable reads current materialized state
    */
  def run(spark: SparkSession, meta: TableMeta, readTable: () => DataFrame,
      emit: (Map[String, Any], String, String) => Unit,
      timeoutMs: Long = 10000L, pollMs: Long = 250L): RoundTripResult = {
    val current = readTable()
    val key = pickRow(current, meta)
    val column = pickSafeColumn(current).getOrElse(
      throw new IllegalStateException(s"no mutable string column on ${meta.name}"))
    val marker = "CDC_TEST_" + java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd_HHmmss").format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))
    val t0 = System.currentTimeMillis()
    emit(key, column, marker)
    var propagated = false
    while (!propagated && System.currentTimeMillis() - t0 < timeoutMs) {
      val hit = Validation.pointLookup(readTable(), key)
        .filter(col(column) === marker).limit(1).count() > 0
      if (hit) propagated = true else Thread.sleep(pollMs)
    }
    RoundTripResult(key, column, marker, propagated, System.currentTimeMillis() - t0)
  }
}
