package graft

import graft.streaming.MetricsExport
import graft.streaming.MetricsExport.{Gauge, PipelineSnapshot}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Metrics-export parity (reference: metrics.yaml:5-40 — the JMX→
  * Prometheus rule set users of the reference dashboard against).
  * Golden-pins the rendered exposition text for a fixed snapshot, the
  * name/label sanitization rules, and drives the live adapter over a
  * real memory-stream query's progress.
  */
class MetricsExportSpec extends SparkSuite {
  import spark.implicits._

  test("golden: one pipeline snapshot renders the reference's gauge shapes exactly") {
    val s = PipelineSnapshot(ns = "graft", server = "trading", connector = "mariadb-trading",
      task = 0, context = "streaming", status = "RUNNING",
      totalEvents = 20480, eventsPerSecond = 9500.25, lagSeconds = 0.75,
      batchDurationMs = 500, commitSuccessPct = 100.0, commitAvgTimeMs = 12.5)
    val expected =
      """graft_cdc_streaming_total_events{server="trading"} 20480
        |graft_cdc_streaming_events_per_second{server="trading"} 9500.25
        |graft_cdc_streaming_lag_seconds{server="trading"} 0.75
        |kafka_connect_source_task_source_record_write_rate{connector="mariadb-trading",task="0"} 9500.25
        |kafka_connect_source_task_poll_batch_avg_time_ms{connector="mariadb-trading",task="0"} 500
        |kafka_connect_task_status{connector="mariadb-trading",task="0"} 1
        |kafka_connect_task_offset_commit_success_percentage{connector="mariadb-trading",task="0"} 100
        |kafka_connect_task_offset_commit_avg_time_ms{connector="mariadb-trading",task="0"} 12.5
        |""".stripMargin
    assert(MetricsExport.render(MetricsExport.gaugesFor(s)) == expected)
  }

  test("snapshot context, non-running status, and label escaping render correctly") {
    val s = PipelineSnapshot("graft", "srv\"x\"", "c1", 2, "snapshot", "FAILED",
      1, 0.0, 0.0, 0.0, 0.0, 0.0)
    val text = MetricsExport.render(MetricsExport.gaugesFor(s))
    assert(text.contains("graft_cdc_snapshot_total_events{server=\"srv\\\"x\\\"\"} 1"))
    assert(text.contains("kafka_connect_task_status{connector=\"c1\",task=\"2\"} 0"))
    // PAUSED is the reference's half-up state
    assert(MetricsExport.statusValue("paused") == 0.5)
    // sanitize: the reference's lowercaseOutputName + hyphen rewrite
    assert(MetricsExport.sanitize("Record-Send.Rate") == "record_send_rate")
    // a leading digit is invalid in a Prometheus name — prefixed, not
    // passed through (one bad name fails the whole scrape body)
    assert(MetricsExport.sanitize("3pl-metrics") == "_3pl_metrics")
    // non-finite values use the Prometheus spellings
    assert(MetricsExport.renderLine(Gauge("g", Nil, Double.NaN)) == "g NaN")
    assert(MetricsExport.renderLine(Gauge("g", Nil, Double.PositiveInfinity)) == "g +Inf")
  }

  test("live adapter: a running query's progress renders through the same shapes") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    val q = stream.toDF().writeStream
      .queryName("metrics_export_live")
      .format("memory")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      stream.addData(1L to 1000L: _*)
      q.processAllAvailable()
      val p = q.lastProgress
      assert(p != null)
      val snap = MetricsExport.fromProgress("graft", "srv", "live", 0, p,
        lagSeconds = 1.5, totalEvents = 1000L)
      val text = MetricsExport.render(MetricsExport.gaugesFor(snap))
      assert(text.contains("graft_cdc_streaming_total_events{server=\"srv\"} 1000"))
      assert(text.contains("graft_cdc_streaming_lag_seconds{server=\"srv\"} 1.5"))
      assert(text.contains("kafka_connect_task_status{connector=\"live\",task=\"0\"} 1"))
      // offset-commit analogs come from the progress's duration map —
      // present and non-negative on a completed batch
      val commitLine = text.linesIterator
        .find(_.startsWith("kafka_connect_task_offset_commit_avg_time_ms")).get
      assert(commitLine.split(' ').last.toDouble >= 0.0)
      // commit-success is OMITTED unless the caller tracks it (a
      // hardcoded 100 would blind dashboards thresholding on commit
      // failures — r12 ADVICE); supplying it renders the gauge
      assert(!text.contains("offset_commit_success_percentage"))
      val tracked = MetricsExport.fromProgress("graft", "srv", "live", 0, p,
        totalEvents = 1000L, commitSuccessPct = 98.5)
      assert(MetricsExport.render(MetricsExport.gaugesFor(tracked)).contains(
        "kafka_connect_task_offset_commit_success_percentage{connector=\"live\",task=\"0\"} 98.5"))
    } finally q.stop()
  }
}
