package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** r12 probe: where do `sim_ann_ivf` scan-tier seconds go at sf10?
  * Times the bank build, the probe-assignment expression alone, and
  * the full scan; prints the final partition counts actually executed
  * (the tier has no candidate shuffle, so parallelism comes from the
  * query-side round-robin spread — this verifies AQE didn't collapse
  * it) and the total probed-candidate mass (Σ over queries of probed
  * list sizes — the true MAC count, which seeded Voronoi cells can
  * skew well above the uniform n·probe·(n/lists) estimate).
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scan-probe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val n = emb.count()
    println(s"[scan-probe] n=$n scanPartitions=${emb.rdd.getNumPartitions} " +
      s"defaultParallelism=${spark.sparkContext.defaultParallelism}")

    // pass 1 builds the memoized banks; pass 2 is pure scan
    val scan = Similarity.ivfSeededTopK(emb, "vec_id", "embedding", k = 5)
    time("pass 1 (bank build + scan)")(scan.count())
    val scan2 = Similarity.ivfSeededTopK(emb, "vec_id", "embedding", k = 5)
    time("pass 2 (scan only)")(scan2.count())
    println(s"[scan-probe] result partitions=${scan2.rdd.getNumPartitions}")

    // probed-candidate mass via the graded candidate query (the join
    // tier enumerates exactly the (query, probed-member) pairs the
    // scan tier loops over): how many MACs the scan really does —
    // seeded Voronoi cells can skew this well above uniform
    val mass = time("candidate mass (join-tier count)")(
      graft.QueriesExt.simAnnIvfCand(spark, sfDir).count())
    println(f"[scan-probe] probed_pairs=$mass (${mass.toDouble / n}%.0f per query)")
    spark.stop()
  }
}
