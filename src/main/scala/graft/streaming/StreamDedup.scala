package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T1 in streaming form — at-least-once delivery means redelivered
  * events (reference: tests/validation.py:8-12 docstring), and the
  * engine's batch answer is the idempotent W1 merge. This operator trims
  * duplicates EARLIER, inside the stream, with Spark's watermark-bounded
  * dedup state (`dropDuplicatesWithinWatermark`): a redelivered event
  * whose id was seen within the watermark horizon never reaches the
  * merge shuffle at all.
  *
  * Scale notes: state is keyed by the id columns and evicted at the
  * watermark — bounded by (event rate × horizon), not by stream
  * lifetime (a plain `dropDuplicates` on a stream grows state forever).
  * Duplicates that straddle the horizon (rare: redelivery gaps are
  * seconds, horizons minutes) still land on the idempotent merge, so
  * end-to-end semantics stay exactly-once-effect either way.
  */
object StreamDedup {

  /** The watermarked event-time column kept on the output so downstream
    * event-time stateful operators (windowed aggs, further watermark-bounded
    * ops) can reuse the watermark instead of re-deriving it; drop it if
    * unwanted.
    */
  val EventTimeCol = "__dedup_event_time"

  /** Drop redelivered events within `horizon` of the watermark.
    *
    * @param idCols    event identity (e.g. PK + source ts/seq)
    * @param tsMsCol   event-time column in epoch millis (CDC `ts_ms`)
    * @param horizon   watermark delay, e.g. "10 minutes"
    */
  def dedupWithinWatermark(stream: DataFrame, idCols: Seq[String],
      tsMsCol: String, horizon: String): DataFrame = {
    require(!stream.columns.contains(EventTimeCol),
      s"input already carries $EventTimeCol — drop or rename it first")
    stream
      .withColumn(EventTimeCol, timestamp_millis(col(tsMsCol)))
      .withWatermark(EventTimeCol, horizon)
      .dropDuplicatesWithinWatermark(idCols)
  }
}
