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

  case class BandedDoc(band: Int, bandHash: Long, id: Long, sig: Array[Long])
  /** `overflowSeen`: ids that arrived while the bucket was saturated —
    * matched but not indexed. Tracked (bounded by `maxBucketSize`, like
    * the entries themselves) so a REDELIVERY of such a doc doesn't
    * re-emit its candidate pairs; without it the `ids` membership
    * check only recognizes indexed docs.
    *
    * STATE SCHEMA v3 (r14): entries flattened to primitive columns —
    * `ids(i)` owns `sigs[i·numHashes, (i+1)·numHashes)`. The v2 layout
    * (Seq of (id, Seq[Long]) entries) paid nested product
    * encode/decode per TOUCHED GROUP per micro-batch, which profiling
    * put at the heart of the stateful stage's cost; three primitive
    * arrays take the encoder fast paths. As with v1→v2, a stream
    * checkpointed on the old schema cannot restart against this build
    * (the state-store schema check fails the restart): drain the old
    * query, start a fresh checkpoint — state is keyed by
    * (band, bandHash), so a re-index from the stored corpus rebuilds
    * equivalent state.
    */
  case class Bucket(ids: Array[Long], sigs: Array[Long],
      overflowSeen: Array[Long])
  case class CandidatePair(id_a: Long, id_b: Long, est_jaccard: Double)

  implicit val bucketEnc: Encoder[Bucket] = Encoders.product[Bucket]

  private def contains(a: Array[Long], n: Int, x: Long): Boolean = {
    var i = 0
    while (i < n) { if (a(i) == x) return true; i += 1 }
    false
  }

  /** The signature+banding stage, shared with the throughput probe so
    * its cost can be measured apart from the stateful stage. Banding is
    * identical to the batch operator: a doc indexed by the stream and
    * the same doc indexed by a batch backfill land in the same buckets.
    */
  private[graft] def bandedDocs(docs: DataFrame, textCol: String,
      idCol: String, shingleLen: Int, numHashes: Int,
      bands: Int): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    val sig = docs.select(col(idCol).cast("long").as("id"),
      graft.plans.GraftFunctions.minhashSigL(
        graft.plans.GraftFunctions.hashedCharShingles(
          col(textCol), shingleLen), numHashes).as("sig"))
    // fused single-pass band hashing (MinhashBandHashes) — bit-identical
    // to the batch operators' declarative banding SPEC
    // (xxhash64(concat_ws("_", slice casts)); spec-pinned parity), ~2×
    // cheaper per doc than the per-band string expression tree
    sig.select(col("id"), col("sig"),
      posexplode(graft.plans.GraftFunctions.minhashBandHashes(
        col("sig"), bands)).as(Seq("band", "bandHash")))
      .select(col("band").cast("int").as("band"), col("bandHash"),
        col("id"), col("sig"))
      .as[BandedDoc]
  }

  /** @param docs streaming DataFrame with `idCol` (long) and `textCol`
    * @param prePartition when > 0, repartition the RAW doc stream to
    *   this width before the signature/banding kernels — the streaming
    *   edition of the r15 kernels-below-exchange fix. A micro-batch
    *   inherits its SOURCE's partitioning (one partition for
    *   MemoryStream, topic-partition count for Kafka), so the
    *   per-doc minhash kernel (~78 µs/doc, half the pipeline per the
    *   r15 StreamProbe split) can serialize on a narrow source while
    *   the cluster idles. The added exchange carries raw (id, text)
    *   once; the banded exchange into the state stores is unchanged.
    *   Left 0 (off) by default: a source already as wide as the
    *   cluster gains nothing and would pay a pure-overhead text
    *   shuffle — the same gate reasoning as the batch operators'
    *   `getNumPartitions < defaultParallelism` check, which a static
    *   streaming plan cannot evaluate per batch.
    */
  def candidatePairs(docs: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 8, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, maxBucketSize: Int = 1000,
      idleEvictMs: Long = 0L, prePartition: Int = 0): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val src = if (prePartition > 0) docs.repartition(prePartition) else docs
    val banded = bandedDocs(src, textCol, idCol, shingleLen, numHashes, bands)
    val timeoutMode =
      if (idleEvictMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    val nh = numHashes
    banded.groupByKey(d => (d.band, d.bandHash))
      .flatMapGroupsWithState[Bucket, CandidatePair](
        OutputMode.Append, timeoutMode) {
        (_: (Int, Long), docs: Iterator[BandedDoc], state: GroupState[Bucket]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic order within a micro-batch
            val arrivals = docs.toArray.sortBy(_.id)
            val st = state.getOption.getOrElse(
              Bucket(Array.emptyLongArray, Array.emptyLongArray,
                Array.emptyLongArray))
            var ids = st.ids
            var n = ids.length
            var sigs = st.sigs
            var overflow = st.overflowSeen
            var on = overflow.length
            // one growth reallocation per micro-batch, not per arrival
            val mayAdd = math.min(arrivals.length, maxBucketSize - n)
            if (mayAdd > 0) {
              ids = java.util.Arrays.copyOf(ids, n + mayAdd)
              sigs = java.util.Arrays.copyOf(sigs, (n + mayAdd) * nh)
            }
            val mayOverflow = math.min(arrivals.length, maxBucketSize - on)
            if (mayOverflow > 0)
              overflow = java.util.Arrays.copyOf(overflow, on + mayOverflow)
            val out = Seq.newBuilder[CandidatePair]
            arrivals.foreach { d =>
              // redelivery-safe (T1) for BOTH indexed docs and docs that
              // arrived while the bucket was saturated (matched but never
              // appended) — the latter would otherwise re-emit all their
              // pairs on redelivery
              if (!contains(ids, n, d.id) && !contains(overflow, on, d.id)) {
                val dsig = d.sig
                var j = 0
                while (j < n) {
                  var agree = 0
                  var k = 0
                  val base = j * nh
                  while (k < nh) {
                    if (dsig(k) == sigs(base + k)) agree += 1
                    k += 1
                  }
                  val est = agree.toDouble / nh.toDouble
                  if (est >= threshold)
                    out += CandidatePair(math.min(d.id, ids(j)),
                      math.max(d.id, ids(j)), est)
                  j += 1
                }
                // saturated buckets keep matching but stop growing; the
                // overflow-seen set is bounded by the same cap — beyond
                // 2·cap distinct docs the guard degrades to the
                // documented multi-band duplicate semantics
                if (n < maxBucketSize) {
                  ids(n) = d.id
                  System.arraycopy(dsig, 0, sigs, n * nh, nh)
                  n += 1
                } else if (on < maxBucketSize) {
                  overflow(on) = d.id
                  on += 1
                }
              }
            }
            state.update(Bucket(
              if (n == ids.length) ids else java.util.Arrays.copyOf(ids, n),
              if (n * nh == sigs.length) sigs
              else java.util.Arrays.copyOf(sigs, n * nh),
              if (on == overflow.length) overflow
              else java.util.Arrays.copyOf(overflow, on)))
            if (idleEvictMs > 0) state.setTimeoutDuration(idleEvictMs)
            out.result().iterator
          }
      }
  }
}
