package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** r19: cu_trim_paragraph ran 276+ CPU-min at sf10 while background
  * paragraph Jaccard is 0.03 (candidates should be tame). Stage the
  * paragraph pipeline: split, banding candidates, verified pairs,
  * trim+noop — with row counts, to find the mass.
  */
object ParaStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[para-stage] $label%-38s ${(System.nanoTime() - t0) / 1e9}%8.2fs  -> $r")
      r
    }

    val P = graft.QueriesExt.ParagraphTokens
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val toks = regexp_extract_all(col("text"), lit("\\S+"), lit(0))
    val starts = sequence(lit(0),
      greatest(size(col("__toks")), lit(1)) - 1, lit(P))
    val paras = docs.select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), col("__toks"),
        posexplode(starts).as(Seq("chunk_id", "__start")))
      .select((col("doc_id") * lit(1L << 20) + col("chunk_id")).as("para_id"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(P)), " ")
          .as("para_text"))
    timed("paragraph count")(paras.count())
    // band-bucket profile: the candidate mass is sum over buckets of
    // size^2/2 — report the heavy tail
    val sig = paras.select(col("para_id"),
      graft.plans.GraftFunctions.minhashSigL(
        graft.plans.GraftFunctions.hashedCharShingles(col("para_text"), 8),
        32).as("sig"))
    val buckets = sig.select(posexplode(
        graft.plans.GraftFunctions.minhashBandHashes(col("sig"), 8))
        .as(Seq("band", "band_hash")))
      .groupBy("band", "band_hash").count()
    timed("bucket count")(buckets.count())
    val heavy = timed("top bucket sizes")(
      buckets.orderBy(col("count").desc).limit(10).collect()
        .map(_.getLong(2)).toSeq)
    println(s"[para-stage] top-10 bucket sizes: $heavy")
    val candMass = timed("sum size^2 over buckets (candidate mass)")(
      buckets.agg(sum(col("count") * col("count"))).head().getLong(0))
    println(s"[para-stage] candidate mass ~ $candMass")
    val pairs = Dedup.minhashNearDupPairs(paras, "para_text", "para_id",
      shingleLen = 8, threshold = graft.QueriesExt.JaccardThreshold)
    timed("verified pairs count")(pairs.count())
    spark.stop()
  }
}
