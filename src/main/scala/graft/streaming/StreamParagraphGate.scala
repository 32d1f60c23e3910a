package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming PARAGRAPH-granularity boilerplate gate (r20 — VERDICT r19
  * ask #7): [[StreamNearDup]]'s stateful banded index composed with the
  * batch paragraph splitter ([[Dedup.paragraphFrame]] — structural
  * blank-line split with the token-window fallback), so live ingest
  * flags paragraph-level boilerplate the moment it lands. A doc whose
  * paragraph near-dups one indexed minutes or days earlier (within OR
  * across documents) emits a hit without re-scanning the corpus — the
  * streaming admission edition of `dd_paragraph`'s readout, the same
  * relationship [[StreamSubstringGate]] has to the substring family.
  *
  * Composition contract: the split is a pure scan-side Generate
  * (stream-safe — no aggregation before the stateful stage), banding
  * and state are [[StreamNearDup.candidatePairs]] VERBATIM over the
  * packed paragraph ids, so a paragraph indexed by the stream and the
  * same paragraph indexed by a batch backfill land in the same
  * buckets, and all of StreamNearDup's bounds carry over unchanged:
  * bounded per-bucket state, truncation (not drop) on saturation,
  * idle-bucket eviction, redelivery-swallowed emission (T1).
  *
  * Emission: hits carry UNPACKED (doc, chunk) coordinates per side
  * plus the signature-estimated Jaccard; the same pair can surface
  * from several bands — dedup downstream like every append-mode pure
  * emitter in this engine.
  */
object StreamParagraphGate {

  /** One paragraph-level boilerplate hit: (doc_a, chunk_a) collided
    * with (doc_b, chunk_b) at signature-estimated Jaccard ≥ threshold.
    */
  case class ParagraphHit(doc_a: Long, chunk_a: Long, doc_b: Long,
      chunk_b: Long, est_jaccard: Double)

  private val ParaIdShift = 20
  private val ChunkMask = (1L << ParaIdShift) - 1

  /** @param docs streaming DataFrame with `idCol` (long) + `textCol`
    * @param prePartition widen the RAW doc stream before the split and
    *   the per-paragraph minhash kernels (the [[StreamNearDup]]
    *   narrow-source reasoning; the split multiplies rows, so the
    *   exchange is cheapest before it)
    */
  def paragraphHits(docs: DataFrame, textCol: String, idCol: String,
      paraTokens: Int = 32, shingleLen: Int = 8, numHashes: Int = 32,
      bands: Int = 8, threshold: Double = 0.5, maxBucketSize: Int = 1000,
      idleEvictMs: Long = 0L, prePartition: Int = 0): Dataset[ParagraphHit] = {
    import docs.sparkSession.implicits._
    val src = if (prePartition > 0) docs.repartition(prePartition) else docs
    val paras = Dedup.paragraphFrame(src, textCol, idCol, paraTokens)
      .select(col("para_id"), col("para_text"))
    StreamNearDup.candidatePairs(paras, "para_text", "para_id",
      shingleLen = shingleLen, numHashes = numHashes, bands = bands,
      threshold = threshold, maxBucketSize = maxBucketSize,
      idleEvictMs = idleEvictMs)
      .map(p => ParagraphHit(p.id_a >>> ParaIdShift, p.id_a & ChunkMask,
        p.id_b >>> ParaIdShift, p.id_b & ChunkMask, p.est_jaccard))
  }
}
