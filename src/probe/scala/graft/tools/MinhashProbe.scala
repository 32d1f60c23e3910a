package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Pinpoints which stage inflates the minhash candidate estimate at
  * scale: for cross-copy sibling doc pairs (same base id, different
  * ScaleDataGen copy), compares the EXACT hash-space Jaccard
  * (sortedJaccard over hashedCharShingles — the operator's own verify
  * metric) against the 32-hash signature match fraction (the operator's
  * banding/prefilter estimate). If the sets say ~0.05 but the signature
  * says ~0.4, the signature scheme itself is biased on this structure.
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10")
    val spark = GraftSession.get("local[8]")
    val numHashes = 32
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 1000000000L < 20 && col("doc_id") / 1000000000L < 6)
    val withSig = docs.select(col("doc_id").as("id"),
      (col("doc_id") % 1000000000L).as("base"),
      graft.plans.GraftFunctions.hashedCharShingles(col("text"), 8).as("shingles"))
      .select(col("id"), col("base"), col("shingles"),
        graft.plans.GraftFunctions.minhashSigL(col("shingles"), numHashes).as("sig"))
      .cache()
    val pairs = withSig.as("a").join(withSig.as("b"), col("a.base") === col("b.base")
        && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.plans.GraftFunctions.sortedJaccard(col("a.shingles"), col("b.shingles"))
          .as("hash_jaccard"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) =>
          when(x === y, lit(1)).otherwise(lit(null))), v => v.isNotNull))
          .cast("double") / lit(numHashes.toDouble)).as("est"))
    pairs.select(
      count(lit(1)).as("pairs"),
      avg(col("hash_jaccard")).as("avg_hash_j"),
      max(col("hash_jaccard")).as("max_hash_j"),
      avg(col("est")).as("avg_est"),
      max(col("est")).as("max_est")).show(false)
    pairs.orderBy(desc("est")).show(10, false)
    spark.stop()
  }
}
