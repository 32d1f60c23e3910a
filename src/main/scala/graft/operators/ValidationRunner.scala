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
