package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for `dd_embed_neardup` (the adversarial
  * threshold-0.45 entry — 562 s at sf10, >50% of the whole soak):
  * separates the sketch-build scratch from the bucket-join collision
  * enumeration, the Hamming prefilter, the distinct, and the exact
  * verify, and counts the mass at each layer. The question it answers:
  * is the time the ρ≈0.62 collision MASS (physics — irreducible), or
  * the per-collision COST of streaming every collision through join
  * machinery (engineering — a bucket-local pairwise loop pays ~popcount
  * per collision instead)?
  */
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val threshold = sys.env.getOrElse("SPARK_GRAFT_PROBE_THRESHOLD", "0.45").toDouble
    val spark = GraftSession.get(s"local[$cpus]")
    import graft.plans.GraftFunctions.{arrayHamming, hyperplanePoolSketch, poolBucketKeys}
    import graft.functions.VectorFunctions._
    import graft.operators.{CorpusStats, Dedup, Skew}

    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = CorpusStats.rowCount(emb)
    val poolBits = 2048
    val maxBucketSize = 100000
    val (bits, _) = Dedup.embeddingLshParamsBroadcast(n, threshold)
    val tabs = math.min(4096, Dedup.embeddingLshTablesFor(bits, threshold))
    val maxHd = Dedup.hammingCutoff(poolBits, threshold)
    println(s"[embed-probe] n=$n threshold=$threshold bits=$bits tables=$tabs " +
      s"maxHd=$maxHd rho=${Dedup.embedThresholdRho(threshold)}")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[embed-probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // stage 1: per-vector scratch (the only heavy per-row math)
    val sig = emb.select(col("id"), col("vec"),
      normSq(col("vec")).as("nsq"),
      hyperplanePoolSketch(col("vec"), poolBits).as("sk"))
      .persist()
    timed("scratch (sketch+norm)")(sig.count())

    // stage 2: exploded index volume
    val exploded = Skew.saltOversized(
      sig.select(col("id"),
        explode(poolBucketKeys(col("sk"), poolBits, bits, tabs)).as("bk")),
      Seq("bk"), maxBucketSize, saltOn = col("id")).persist()
    val idxRows = timed("exploded index materialize")(exploded.count())

    // stage 3: raw collision enumeration through the merge self-join
    // (ids-only — this measures the join machinery cost per collision)
    val a = exploded.select(col("bk"), col("__salt"), col("id").as("id_a"))
    val b = exploded.select(col("bk"), col("__salt"), col("id").as("id_b"))
    val cand = a.join(b.hint("merge"), Seq("bk", "__salt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val collisions = timed("collision enumeration (count)")(cand.count())

    // stage 4: + broadcast sketch attaches + Hamming prefilter — at the
    // shipped 6σ margin AND at tighter 5σ/4σ margins, to measure how
    // much of the candidate mass lives between the margins (cutoff c
    // admits pairs down to cos(cπ/poolBits); 6σ at θ=0.45 reaches
    // ~0.255, 4σ ~0.32 — the mass in between is pure distinct+verify
    // waste if the 4σ per-pair miss (~3e-5) is acceptable)
    val skA = sig.select(col("id").as("id_a"), col("sk").as("sk_a"))
    val skB = sig.select(col("id").as("id_b"), col("sk").as("sk_b"))
    val p1 = 1.0 - math.acos(math.min(threshold, 0.999)) / math.Pi
    def cutoffAt(sigmas: Double): Int = math.min(poolBits,
      math.ceil(poolBits * (1.0 - p1) + sigmas * 0.5 * math.sqrt(poolBits.toDouble)).toInt)
    def prefilteredAt(hd: Int) = cand
      .join(broadcast(skA), Seq("id_a")).join(broadcast(skB), Seq("id_b"))
      .filter(arrayHamming(col("sk_a"), col("sk_b")) <= hd)
      .select(col("id_a"), col("id_b"))
    val prefiltered = prefilteredAt(maxHd)
    val survivors = timed("  + attach + hamming prefilter 6s")(prefiltered.count())
    val surv5 = timed("  + prefilter at 5 sigma")(prefilteredAt(cutoffAt(5.0)).count())
    val surv4 = timed("  + prefilter at 4 sigma")(prefilteredAt(cutoffAt(4.0)).count())

    // stage 5: + distinct (the only candidate-volume shuffle), at both margins
    val distinctPairs = timed("  + distinct (6 sigma)")(prefiltered.distinct().count())
    val distinct4 = timed("  + distinct (4 sigma)")(
      prefilteredAt(cutoffAt(4.0)).distinct().count())
    println(s"[embed-probe] cutoffs 6s=$maxHd 5s=${cutoffAt(5.0)} 4s=${cutoffAt(4.0)} " +
      s"surv 6s=$survivors 5s=$surv5 4s=$surv4 distinct 6s=$distinctPairs 4s=$distinct4")

    // stage 6: full operator (adds the exact-cosine verify)
    val shipped = timed("full operator")(
      Dedup.embeddingNearDupPairs(emb, "vec", "id", threshold = threshold).count())
    println(s"[embed-probe] idx_rows=$idxRows collisions=$collisions " +
      s"post_hamming=$survivors distinct=$distinctPairs shipped=$shipped " +
      f"pairs_per_idx_row=${collisions.toDouble / math.max(1, idxRows)}%.1f")
    spark.stop()
  }
}
