package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** r14 stage-split for `dd_minhash_lsh` (the simhash/winnow treatment):
  * wall time per layer of the scale path at sf10 — scratch persist,
  * banding + salt window, candidate join + distinct, signature
  * prefilter attaches, full operator.
  */
object MinhashStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]")
    import graft.plans.GraftFunctions._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val numHashes = 32
    val bands = 8
    val rpb = numHashes / bands
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[minhash-probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val withSig = docs.select(col("doc_id").as("id"),
      hashedCharShingles(col("text"), 8).as("shingles"))
      .select(col("id"), col("shingles"),
        minhashSigL(col("shingles"), numHashes).as("sig"))
      .repartition(col("id")).sortWithinPartitions("id").persist()
    timed("scratch materialize")(withSig.count())
    def stringBanded = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_",
          transform(slice(col("sig"), b * rpb + 1, lit(rpb)),
            _.cast("string")))))).as(Seq("band", "band_hash")))
    timed("banding (string expr)")(stringBanded.count())
    def fusedBanded = withSig.select(col("id"),
      posexplode(minhashBandHashes(col("sig"), bands))
        .as(Seq("band", "band_hash")))
    timed("banding (fused expr)")(fusedBanded.count())
    val salted = graft.operators.Skew.saltOversized(stringBanded,
      Seq("band", "band_hash"), 10000, saltOn = col("id"))
    timed("  + salt window")(salted.count())
    val saltedP = salted.persist()
    saltedP.count()
    val cand = saltedP.as("x").join(saltedP.as("y").hint("merge"),
      Seq("band", "band_hash", "__salt"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
    val nColl = timed("candidate join (no distinct)")(cand.count())
    val nCand = timed("  + distinct")(cand.distinct().count())
    println(s"[minhash-probe] collisions=$nColl distinct_pairs=$nCand")
    val candP = cand.distinct().persist()
    candP.count()
    val estCutoff = 0.5 - 4.0 * math.sqrt(0.5 * 0.5 / numHashes)
    def estJaccard(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      size(filter(zip_with(a, b, (x, y) =>
        when(x === y, lit(1)).otherwise(lit(null))), v => v.isNotNull))
        .cast("double") / lit(numHashes.toDouble)
    val nPre = timed("est-prefilter attaches")(candP
      .join(withSig.select(col("id").as("id_a"), col("sig").as("sig_a")).hint("merge"), Seq("id_a"))
      .join(withSig.select(col("id").as("id_b"), col("sig").as("sig_b")).hint("merge"), Seq("id_b"))
      .filter(estJaccard(col("sig_a"), col("sig_b")) >= estCutoff).count())
    println(s"[minhash-probe] prefilter_survivors=$nPre")
    timed("full operator")(
      graft.operators.Dedup.minhashNearDupPairs(docs, "text", "doc_id",
        threshold = 0.5).count())
    spark.stop()
  }
}
