package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming edition of the exact-substring ingest gate
  * ([[graft.operators.Dedup.substringDupSpansAgainst]]): each arriving
  * micro-batch of candidate documents is checked for ≥k-token spans
  * that already exist verbatim in the ACCEPTED corpus, and the flagged
  * spans stream to a parquet audit log — the span-precise admission
  * control a live training-data pipeline runs in front of its corpus
  * store (cu_decontaminate flags whole docs; this localizes exactly
  * which region of an incoming doc is already trained on).
  *
  * Shape: `foreachBatch` over the batch operator — the same
  * composition contract as [[graft.streaming.CdcPipeline]]'s merge.
  * The corpus side contributes its ONE distinct gram-hash dictionary;
  * above the scale floor the batch operator pins it with a tracked
  * scratch persist, so consecutive micro-batches re-probe the SAME
  * materialized dictionary instead of re-scanning the corpus — the
  * amortization the batch scaladoc promises "in a live pipeline,
  * across ingests" is exactly this call site. Each batch's marking
  * cost is then bounded by the batch's own gram count (ingest batches
  * are bounded), and checkpointed `foreachBatch` gives at-least-once
  * span emission with batch-id-keyed idempotence available downstream.
  *
  * Restart contract: the audit sink is append-mode parquet keyed by
  * nothing — a replayed batch appends duplicate span rows; consumers
  * needing exactly-once read the log with
  * `dropDuplicates("doc_id","span_start","span_len")`, the same
  * replay-tolerant read every at-least-once sink in this engine
  * documents (T1).
  */
object StreamSubstringGate {

  /** Start the gate: spans of `newDocs` (streaming; `idCol` long +
    * `textCol` string) already present in `corpus` (static) append to
    * `auditDir` as parquet.
    */
  def start(newDocs: DataFrame, corpus: DataFrame, textCol: String,
      idCol: String, k: Int, checkpoint: String, auditDir: String): StreamingQuery =
    newDocs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Dedup.substringDupSpansAgainst(batch, corpus, textCol, idCol, k)
          .write.mode("append").parquet(auditDir)
      }
      .start()
}
