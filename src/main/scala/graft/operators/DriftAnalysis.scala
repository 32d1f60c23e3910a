package graft.operators

import graft.catalog.TableMeta
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Forensic drift analysis — the Spark form of the reference's
  * drift-analysis tool (reference: tests/drift_analysis.py:141-455):
  * quantify duplicates and orphans, profile replay windows via the
  * timestamp ranges, and fold the signals into the reference's
  * root-cause heuristics (reference: tests/drift_analysis.py:427-454).
  *
  * All scans are single-pass aggregations / distributed joins; sample
  * lists are capped (`LIMIT`-style) exactly like the reference's
  * `[:10]` report truncation (reference: tests/drift_analysis.py:391,396).
  */
object DriftAnalysis {

  case class TsRange(min: java.sql.Timestamp, max: java.sql.Timestamp)
  case class DriftReport(
      table: String,
      sourceCount: Long,
      sinkCount: Long,
      distinctSinkPks: Long,
      duplicateCount: Long,
      duplicatePks: Seq[Row],
      orphanCount: Long,
      orphanPks: Seq[Row],
      sourceRange: Option[TsRange],
      sinkRange: Option[TsRange],
      rootCauses: Seq[String])

  private def tsRange(df: DataFrame, tsCol: String): Option[TsRange] = {
    val r = df.agg(min(col(tsCol)).cast("timestamp"), max(col(tsCol)).cast("timestamp")).head()
    if (r.isNullAt(0)) None else Some(TsRange(r.getTimestamp(0), r.getTimestamp(1)))
  }

  /** Root-cause heuristic rules, mirroring the reference's decision tree
    * (reference: tests/drift_analysis.py:427-454).
    */
  def rootCauses(duplicateCount: Long, orphanCount: Long,
      sourceRange: Option[TsRange], sinkRange: Option[TsRange]): Seq[String] = {
    val causes = Seq.newBuilder[String]
    if (duplicateCount > 0)
      causes += "duplicates_detected: likely snapshot + streaming replay overlap"
    if (orphanCount > 0) {
      val orphansOlder = (sourceRange, sinkRange) match {
        case (Some(s), Some(k)) => k.min.before(s.min)
        case _ => false
      }
      if (orphansOlder)
        causes += "orphans_older_than_source: pre-migration artifacts"
      else
        causes += "orphans_detected: source deletes not propagated or stale sink data"
    }
    (sourceRange, sinkRange) match {
      case (Some(s), Some(k)) if k.max.after(s.max) =>
        causes += "sink_newer_than_source: impossible under CDC"
      case _ => ()
    }
    if (duplicateCount == 0 && orphanCount == 0)
      causes += "clean: check in-flight transactions or concurrent-write races if counts differ"
    causes.result()
  }

  /** Full drift analysis for one table pair (reference:
    * tests/drift_analysis.py:283-372 `analyze_drift`).
    */
  def analyze(source: DataFrame, sink: DataFrame, meta: TableMeta,
      sampleSize: Int = 10): DriftReport = {
    val profile = Validation.duplicationProfile(sink, meta.pkCols).head()
    val dupPks = Validation.duplicateGroups(sink, meta.pkCols, sampleSize).collect().toSeq
    val orphanDf = Validation.orphans(sink, source, meta.pkCols)
    val orphanCount = orphanDf.count()
    val orphanSample = orphanDf.orderBy(meta.pkCols.map(col): _*).limit(sampleSize)
      .collect().toSeq
    val (srcRange, snkRange) = meta.tsCol match {
      case Some(ts) => (tsRange(source, ts), tsRange(sink, ts))
      case None => (None, None)
    }
    DriftReport(
      table = meta.name,
      sourceCount = source.count(),
      sinkCount = profile.getLong(0),
      distinctSinkPks = profile.getLong(1),
      duplicateCount = profile.getLong(2),
      duplicatePks = dupPks,
      orphanCount = orphanCount,
      orphanPks = orphanSample,
      sourceRange = srcRange,
      sinkRange = snkRange,
      rootCauses = rootCauses(profile.getLong(2), orphanCount, srcRange, snkRange))
  }
}
