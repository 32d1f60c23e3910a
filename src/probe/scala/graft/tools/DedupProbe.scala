package graft.tools

import graft.GraftSession
import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Diagnostic for the shingle-family candidate pipeline at scale: counts
  * the banding intermediates of [[graft.operators.Dedup.minhashNearDupPairs]]
  * (same expressions, same parameters) so a scratch-exhaustion failure can
  * be attributed to a specific stage — banded rows, bucket-size histogram,
  * pre-distinct candidate-join output, post-distinct candidates — without
  * re-running the full operator. Reads `SPARK_GRAFT_SF_DIR`.
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]")
    val numHashes = 32; val bands = 8; val rowsPerBand = 4
    val maxBucketSize = 10000

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val withSig = docs.select(col("doc_id").as("id"),
      graft.plans.GraftFunctions.hashedCharShingles(col("text"), 8).as("shingles"))
      .select(col("id"), col("shingles"),
        graft.plans.GraftFunctions.minhashSigL(col("shingles"), numHashes).as("sig"))
      .persist()
    println(s"[probe] docs=${withSig.count()}")

    val bandedRaw = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_",
          transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            _.cast("string")))))).as(Seq("band", "band_hash")))
    val buckets = bandedRaw.groupBy("band", "band_hash").agg(count(lit(1)).as("n"))
      .persist()
    println(s"[probe] buckets=${buckets.count()}")
    buckets.select(sum(col("n")).as("banded_rows"),
      max(col("n")).as("max_bucket"),
      sum(col("n") * (col("n") - 1) / 2).as("pairs_unsalted"),
      sum(when(col("n") > 1, col("n") * (col("n") - 1) / 2)).as("pairs_gt1"),
      count(when(col("n") > 100, 1)).as("buckets_gt100"),
      count(when(col("n") > maxBucketSize, 1)).as("buckets_gt_cap"))
      .show(false)
    buckets.filter(col("n") > 100)
      .groupBy(ceil(log2(col("n"))).as("log2_n"))
      .agg(count(lit(1)).as("buckets"), sum(col("n") * (col("n") - 1) / 2).as("pairs"))
      .orderBy("log2_n").show(40, false)

    // post-salt candidate volume: exactly the join the operator runs
    val banded = Skew.saltOversized(bandedRaw, Seq("band", "band_hash"),
      maxBucketSize, saltOn = col("id"))
    val salted = banded.groupBy("band", "band_hash", "__salt").agg(count(lit(1)).as("n"))
    salted.select(sum(col("n") * (col("n") - 1) / 2).as("cand_join_rows_post_salt"))
      .show(false)

    // distinct candidates + signature-estimate distribution: how many
    // pairs survive the stage-1 prefilter at each cutoff — i.e. how many
    // array-attach rows the exact-verify stage would move
    val cand = banded.as("x").join(banded.as("y").hint("merge"),
        Seq("band", "band_hash", "__salt"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    val est = cand
      .join(withSig.select(col("id").as("id_a"), col("sig").as("sig_a"))
        .hint("merge"), Seq("id_a"))
      .join(withSig.select(col("id").as("id_b"), col("sig").as("sig_b"))
        .hint("merge"), Seq("id_b"))
      .select((size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
        when(x === y, lit(1)).otherwise(lit(null))), v => v.isNotNull))
        .cast("double") / lit(numHashes.toDouble)).as("est"))
      .persist()
    println(s"[probe] cand_distinct=${est.count()}")
    est.groupBy(floor(col("est") * 20).as("est_bucket_0p05"))
      .agg(count(lit(1)).as("pairs"))
      .orderBy("est_bucket_0p05").show(25, false)
    spark.stop()
  }
}
