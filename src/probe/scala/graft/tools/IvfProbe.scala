package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Empirical cost probe for the two-level IVF tier: times `ivfTopK`
  * end-to-end in (a) single-level auto geometry and (b) two-level
  * forced by a 16-list centroid budget — same corpus, same √N list
  * count, same auto probe count — and prints one JSON line with the
  * wall times, the [[Similarity.ivfAssignOps]] model counts, and the
  * recall of each tier against brute force (sampled queries). The
  * VERDICT-r8 ask was evidence that hierarchical assignment actually
  * buys what the model claims at a real corpus size; run at sf1
  * (`SPARK_GRAFT_SF_DIR=target/testdata/sf1`, 20 k vectors) or above.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val sqrtN = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    val probe = Similarity.autoProbe(sqrtN)
    // queries: deterministic 1-in-20 sample keeps the search stage small
    // relative to assignment, which is what the two tiers differ on
    val qf = Some((id: org.apache.spark.sql.Column) => id % 20 === 0)
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    // tiny budget → ivfListsFor caps at 16 < √N → two-level branch
    val tinyBudget = 16L * (4L * dim + 64L)
    val single = med((1 to passes).map { _ =>
      spark.sharedState.cacheManager.clearCache()
      time(Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5,
        nLists = sqrtN, nProbe = probe, queryFilter = qf).count())
    })
    val two = med((1 to passes).map { _ =>
      spark.sharedState.cacheManager.clearCache()
      time(Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5,
        queryFilter = qf, maxCentroidBytes = tinyBudget).count())
    })
    val exact = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") % 20 === 0), emb, "vec_id", "embedding", k = 5)
      .persist()
    val rSingle = Similarity.recallAtK(
      Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5,
        nLists = sqrtN, nProbe = probe, queryFilter = qf), exact)
    val rTwo = Similarity.recallAtK(
      Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5,
        queryFilter = qf, maxCentroidBytes = tinyBudget), exact)
    val (opsSingle, opsTwo) = Similarity.ivfAssignOps(n, sqrtN)
    println(f"""{"n":$n,"lists":$sqrtN,"probe":$probe,"passes":$passes,"single_sec":$single%.2f,"two_level_sec":$two%.2f,"assign_ops_single":$opsSingle,"assign_ops_two":$opsTwo,"recall_single":$rSingle%.3f,"recall_two":$rTwo%.3f}""")
    spark.stop()
  }
}
