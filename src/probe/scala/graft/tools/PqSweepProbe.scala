package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** r19 verdict ask #3: sim_ann_ivfpq's recall@5 at the r19 geometry
  * (m=4 subspaces × k=16 entries, 4-bit codes) drew 0.27 vs ivf's
  * 0.43 — the coarse-probe ceiling, since ivfpq probes the SAME lists
  * and ivf ranks every probed member by exact cosine. Under-sized
  * codebooks are the standard cause (Jégou §V recommends k=256 / 8-bit
  * codes); a larger exact-rerank pool (rerankC) recovers ADC ranking
  * error directly. This probe sweeps (m, k, rerankC) against the exact
  * baseline on the 1-in-AnnRecallMod probe sample and prints
  * recall@5 + wall per point, so the production geometry is a measured
  * choice, not a guess. Run at sf0.01 (grading SF) and sf0.1 (cost).
  */
object PqSweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.get(s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")
    val k = graft.QueriesExt.AnnCandK
    val e = graft.sources.Tables.embeddings(spark, sfDir).persist()
    val n = e.count()
    val sampled: Column => Column =
      id => id % graft.QueriesExt.AnnRecallMod === 0
    val probes = e.filter(sampled(col("vec_id")))
    val exact = Similarity.bruteForceTopK(probes, e, "vec_id", "embedding",
      k = k).persist()
    exact.count()
    // ivf's recall = the coarse-probe ceiling (same lists, exact cosine
    // over every probed member)
    val ivf = Similarity.ivfSeededTopK(e, "vec_id", "embedding", k = k,
      queryFilter = Some(sampled))
    println(f"[pq-sweep] n=$n ivf(ceiling) recall@$k = ${Similarity.recallAtK(ivf, exact)}%.4f")
    val points = Seq(
      (4, 16, 32), (4, 16, 64), (4, 16, 128),
      (4, 64, 32), (8, 64, 32), (8, 64, 64),
      (8, 256, 32), (8, 256, 64), (8, 256, 128))
    for ((m, cbK, c) <- points) {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val ivfpq = Similarity.ivfPqSeededTopK(e, "vec_id", "embedding",
        k = k, rerankC = c, m = m, codebookK = cbK,
        queryFilter = Some(sampled))
      val r = Similarity.recallAtK(ivfpq, exact)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[pq-sweep] m=$m%d k=$cbK%3d rerankC=$c%3d  recall@$k = $r%.4f  wall=$wall%7.2fs")
    }
    spark.stop()
  }
}
