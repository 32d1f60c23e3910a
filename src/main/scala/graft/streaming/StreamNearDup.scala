package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash-LSH near-duplicate detection: the stream-side
  * counterpart of [[graft.operators.Dedup.minhashNearDupPairs]]. Each
  * arriving document is minhashed and banded with EXACTLY the batch
  * operator's scheme (same shingle hashing, same band hashes), then
  * checked against the accumulated per-bucket index held in streaming
  * state — a near-duplicate of a document that arrived minutes or days
  * earlier is flagged the moment it lands, without re-scanning the
  * corpus.
  *
  * Emission contract: CANDIDATE pairs with the signature-estimated
  * Jaccard ≥ threshold. The estimate's error bound is the batch
  * operator's (±~0.09 std at 32 hashes); pipelines needing the exact
  * decision join the pair stream against stored shingle sets (the
  * batch verify step) downstream. The same pair can surface from
  * several bands — run `dropDuplicates("id_a","id_b")` on the output
  * (kept out of this operator so the emission stays append-mode pure).
  *
  * Scale: state is keyed by (band, bandHash) — the SAME key space that
  * bounds the batch bucket join — and each bucket holds at most
  * `maxBucketSize` (id, signature) entries, so state size is bounded by
  * (#active buckets × cap × sigBytes), independent of stream lifetime.
  * A saturated bucket stops absorbing new entries but KEEPS matching
  * against the docs it holds (truncation semantics, not drop — the
  * [[graft.operators.Skew.truncateHotKeys]] lesson); `idleEvictMs`
  * evicts buckets untouched for the configured horizon, the streaming
  * analog of index compaction.
  */
object StreamNearDup {

  case class BandedDoc(band: Int, bandHash: Long, id: Long, sig: Seq[Long])
  case class BucketEntry(id: Long, sig: Seq[Long])
  /** `overflowSeen`: ids that arrived while the bucket was saturated —
    * matched but not indexed. Tracked (bounded by `maxBucketSize`, like
    * the entries themselves) so a REDELIVERY of such a doc doesn't
    * re-emit its candidate pairs; without it the `entries` membership
    * check only recognizes indexed docs.
    *
    * STATE SCHEMA v2: adding this field changes the
    * flatMapGroupsWithState state row, so a stream checkpointed by the
    * single-field v1 Bucket cannot restart against this build (the
    * state-store schema check fails the restart). Migrate by draining
    * the old query and starting a fresh checkpoint; the operator keys
    * state by (band, bandHash), so a re-index from the stored corpus
    * rebuilds equivalent state.
    */
  case class Bucket(entries: Seq[BucketEntry], overflowSeen: Seq[Long] = Seq.empty)
  case class CandidatePair(id_a: Long, id_b: Long, est_jaccard: Double)

  implicit val bucketEnc: Encoder[Bucket] = Encoders.product[Bucket]

  private def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    var agree = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) agree += 1; i += 1 }
    agree.toDouble / a.length.toDouble
  }

  /** @param docs streaming DataFrame with `idCol` (long) and `textCol` */
  def candidatePairs(docs: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 8, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, maxBucketSize: Int = 1000,
      idleEvictMs: Long = 0L): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val rowsPerBand = numHashes / bands
    // identical banding to the batch operator: a doc indexed by the
    // stream and the same doc indexed by a batch backfill land in the
    // same buckets
    val sig = docs.select(col(idCol).cast("long").as("id"),
      graft.plans.GraftFunctions.minhashSigL(
        graft.plans.GraftFunctions.hashedCharShingles(
          col(textCol), shingleLen), numHashes).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_",
          transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            _.cast("string")))))).as(Seq("band", "bandHash")))
      .select(col("band").cast("int").as("band"), col("bandHash"),
        col("id"), col("sig"))
      .as[BandedDoc]
    val timeoutMode =
      if (idleEvictMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded.groupByKey(d => (d.band, d.bandHash))
      .flatMapGroupsWithState[Bucket, CandidatePair](
        OutputMode.Append, timeoutMode) {
        (_: (Int, Long), docs: Iterator[BandedDoc], state: GroupState[Bucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic order within a micro-batch
            val arrivals = docs.toSeq.sortBy(_.id)
            val st = state.getOption.getOrElse(Bucket(Seq.empty))
            var held = st.entries
            var overflow = st.overflowSeen
            val out = Seq.newBuilder[CandidatePair]
            arrivals.foreach { d =>
              // redelivery-safe (T1) for BOTH indexed docs and docs that
              // arrived while the bucket was saturated (matched but never
              // appended) — the latter would otherwise re-emit all their
              // pairs on redelivery
              if (!held.exists(_.id == d.id) && !overflow.contains(d.id)) {
                held.foreach { e =>
                  val est = estJaccard(d.sig, e.sig)
                  if (est >= threshold)
                    out += CandidatePair(math.min(d.id, e.id),
                      math.max(d.id, e.id), est)
                }
                // saturated buckets keep matching but stop growing; the
                // overflow-seen set is bounded by the same cap — beyond
                // 2·cap distinct docs the guard degrades to the
                // documented multi-band duplicate semantics
                if (held.length < maxBucketSize) held = held :+ BucketEntry(d.id, d.sig)
                else if (overflow.length < maxBucketSize) overflow = overflow :+ d.id
              }
            }
            state.update(Bucket(held, overflow))
            if (idleEvictMs > 0) state.setTimeoutDuration(idleEvictMs)
            out.result().iterator
          }
      }
  }
}
