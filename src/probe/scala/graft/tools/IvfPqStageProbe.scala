package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** r19 stage attribution for sim_ann_ivfpq (5.4 s at sf0.1 vs
  * sim_ann_ivf's 0.24 s in the same window): which stage carries it —
  * the codebook seed collect, the corpus encode, the LUT projection,
  * the ADC join + top-c window, or the exact rerank?
  */
object IvfPqStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3").toInt
    val spark = GraftSession.get(s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfpq-stage] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    (1 to passes).foreach { p =>
      println(s"[ivfpq-stage] --- pass $p ---")
      spark.sharedState.cacheManager.clearCache()
      val e = graft.sources.Tables.embeddings(spark, sfDir)
      timed("full sim_ann_ivfpq")(
        graft.QueriesExt.simAnnIvfpq(spark, sfDir).write.format("noop")
          .mode("overwrite").save())
      timed("sim_ann_ivf (reference)")(
        graft.QueriesExt.simAnnIvf(spark, sfDir).write.format("noop")
          .mode("overwrite").save())
      // stage splits: construction (codebook collect happens at plan
      // construction) then each frame in pipeline order
      val t0 = System.nanoTime()
      val fr = graft.operators.Similarity.ivfPqFrames(
        e, "vec_id", "embedding", k = 5, rerankC = 32,
        m = graft.QueriesExt.PqSubspaces,
        codebookK = graft.QueriesExt.PqCodebookSize).get
      println(f"[ivfpq-stage] construction (incl codebook collect)    ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      timed("assigned (encode corpus, noop)")(
        fr.assigned.write.format("noop").mode("overwrite").save())
      timed("probesLut (noop)")(
        fr.probesLut.write.format("noop").mode("overwrite").save())
      timed("adc pairs (noop)")(
        fr.adc.write.format("noop").mode("overwrite").save())
      timed("cand top-c (noop)")(
        fr.cand.write.format("noop").mode("overwrite").save())
      timed("topk full (noop)")(
        fr.topk.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
