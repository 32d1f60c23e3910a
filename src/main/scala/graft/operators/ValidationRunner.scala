package graft.operators

import graft.catalog.TableMeta
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.{Failure, Success, Try}

/** Multi-table validation orchestration — the Spark form of the
  * reference validator's `main()` (reference: tests/validation.py:
  * 1079-1159): resolve the table list, run all checks per table, fold
  * statuses, render a report, and expose an exit code (any
  * inconsistency ⇒ 1, reference: tests/validation.py:1154-1156).
  *
  * The reference runs tables sequentially per database, hourly per
  * cron; here tables are submitted as concurrent Spark jobs (the
  * scheduler interleaves their stages across the cluster — the analog
  * of the reference's worker pools, without the fixed pool size).
  */
object ValidationRunner {

  case class SuiteReport(reports: Seq[Validation.TableValidationReport],
      errors: Map[String, String]) {
    def allConsistent: Boolean = errors.isEmpty && reports.forall(_.cdcConsistent)
    def exitCode: Int = if (allConsistent) 0 else 1
  }

  /** Run checks 1–6 for every table pair; table-level failures are
    * captured, not fatal (one broken table must not hide the others —
    * same contract as the reference's per-table try/except).
    */
  def runAll(tables: Seq[(TableMeta, DataFrame, DataFrame)],
      slaMinutes: Double = 15.0,
      parallelism: Int = 4): SuiteReport = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = tables.map { case (meta, source, sink) =>
        Future(meta.name -> Try(Validation.runAllChecks(source, sink, meta, slaMinutes)))
      }
      val results = Await.result(Future.sequence(futures), Duration.Inf)
      SuiteReport(
        reports = results.collect { case (_, Success(r)) => r },
        errors = results.collect { case (n, Failure(e)) => n -> e.getMessage }.toMap)
    } finally pool.shutdown()
  }

  /** Slack Block Kit JSON for a suite report — structural parity with
    * the reference's notifier (reference: tests/validation.py:795-935):
    * header with status emoji, a six-field summary section, a failure
    * breakdown limited to 10 tables × 3 checks each with per-check
    * metric summaries, and the "Common Causes" section on failure.
    * Pure rendering: the caller owns delivery (the reference posts via
    * WebClient; this engine only produces the payload), and the
    * timestamp is injected for deterministic tests.
    */
  def renderSlackBlocks(suite: SuiteReport, database: Option[String] = None,
      mentionUser: Option[String] = None,
      timestamp: String = ""): String = {
    import org.json4s.JsonDSL._
    import org.json4s.JsonAST.JValue
    import org.json4s.jackson.JsonMethods
    val total = suite.reports.size
    val passed = suite.reports.count(_.status == "PASS")
    val warned = suite.reports.count(_.status == "WARN")
    val failed = suite.reports.count(_.status == "FAIL")
    val consistent = suite.reports.count(_.cdcConsistent)
    val (emoji, statusText) =
      if (failed > 0 || suite.errors.nonEmpty) (":x:", "FAILURES DETECTED")
      else if (warned > 0) (":warning:", "WARNINGS DETECTED")
      else (":white_check_mark:", "ALL PASSED")
    val headerText = database match {
      case Some(db) => s"$emoji CDC Validation Report - ${db.toUpperCase} - $statusText"
      case None => s"$emoji CDC Validation Report - $statusText"
    }
    val header: JValue =
      ("type" -> "header") ~ ("text" -> (("type" -> "plain_text") ~ ("text" -> headerText)))
    val summary: JValue = ("type" -> "section") ~ ("fields" -> List(
      ("type" -> "mrkdwn") ~ ("text" -> s"*Total Tables:*\n$total"),
      ("type" -> "mrkdwn") ~ ("text" -> s"*CDC Consistent:*\n$consistent/$total"),
      ("type" -> "mrkdwn") ~ ("text" -> s"*Passed:*\n$passed"),
      ("type" -> "mrkdwn") ~ ("text" -> s"*Warned:*\n$warned"),
      ("type" -> "mrkdwn") ~ ("text" -> s"*Failed:*\n$failed"),
      ("type" -> "mrkdwn") ~ ("text" -> s"*Timestamp:*\n$timestamp")))
    // per-check one-line metric summary (reference :884-905 pattern)
    def metricSummary(c: Validation.CheckResult): Option[String] = c.check match {
      case "row_count_smoke" =>
        for {
          s <- c.details.get("source_rows").map(_.toLong)
          k <- c.details.get("sink_rows").map(_.toLong)
          pct <- c.details.get("drift_pct")
        } yield if (k >= s) s"${k - s} excess rows ($pct%)"
          else s"${s - k} missing rows ($pct%)"
      case "duplication_profile" =>
        c.details.get("duplicate_rows").filter(_ != "0").map(d => s"$d duplicates")
      case "anti_join_orphans" =>
        c.details.get("orphans").filter(_ != "0").map(o => s"$o orphan rows")
      case _ => None
    }
    val failedReports = suite.reports.filterNot(_.cdcConsistent)
    val failureBlocks: List[JValue] =
      if (failedReports.isEmpty) Nil
      else {
        val mention = mentionUser.map(m => s"$m ").getOrElse("")
        val sb = new StringBuilder(
          s"$mention*Failed Tables (${failedReports.size}):*\n\n")
        failedReports.take(10).foreach { r =>
          sb.append(s"• *${r.table}* (${r.status})\n")
          r.checks.filter(c => c.status == "FAIL" || c.status == "WARN")
            .take(3).foreach { c =>
              val m = metricSummary(c).map(s => s" - $s").getOrElse("")
              sb.append(s"  ◦ ${c.check}$m\n")
            }
          sb.append('\n')
        }
        if (failedReports.size > 10)
          sb.append(s"_...and ${failedReports.size - 10} more_\n")
        List(
          ("type" -> "section") ~ ("text" -> (("type" -> "mrkdwn") ~ ("text" -> sb.toString))),
          ("type" -> "section") ~ ("text" -> (("type" -> "mrkdwn") ~ ("text" ->
            ("*Common Causes:*\n• Snapshot + streaming replay overlap\n" +
              "• Connector restart without proper offset management\n" +
              "• Missing primary key enforcement\n• Dirty database resets")))))
      }
    JsonMethods.compact(JsonMethods.render(
      ("blocks" -> (List(header, summary) ++ failureBlocks)) ~
        ("text" -> s"CDC Validation Report - $statusText")))
  }

  /** Text report — the console-rendering analog of the reference's
    * report (reference: tests/validation.py:942-1072; Slack blocks
    * :795-935 reduce to the same text content).
    */
  def render(suite: SuiteReport): String = {
    val sb = new StringBuilder
    sb.append("=" * 72).append('\n')
    sb.append("CDC VALIDATION REPORT\n")
    sb.append("=" * 72).append('\n')
    suite.reports.foreach { r =>
      val mark = r.status match {
        case "PASS" => "[PASS]"
        case "WARN" => "[WARN]"
        case _ => "[FAIL]"
      }
      sb.append(s"\n$mark ${r.table} (cdc_consistent=${r.cdcConsistent})\n")
      r.checks.foreach { c =>
        sb.append(f"    ${c.status}%-4s ${c.check}%-28s ")
        sb.append(c.details.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(", "))
        sb.append('\n')
      }
    }
    suite.errors.toSeq.sortBy(_._1).foreach { case (t, e) =>
      sb.append(s"\n[ERROR] $t: $e\n")
    }
    val verdict = if (suite.allConsistent) "CONSISTENT" else "INCONSISTENT"
    sb.append('\n').append("=" * 72).append('\n')
    sb.append(s"OVERALL: $verdict (exit ${suite.exitCode})\n")
    sb.toString
  }
}
