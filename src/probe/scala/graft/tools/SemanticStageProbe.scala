package graft.tools

import graft.GraftSession
import graft.QueriesExt
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** r16 #2: attribute `cu_dedup_semantic`'s COLD path (13.3 s isolated
  * median vs 2.0 s label-warm at sf10). The composition is
  * clusterLabels (exact + minhash pairs + CC) → survivors →
  * semDedupPairs over survivor embeddings (its own seeded IvfIndexBank
  * — a DIFFERENT corpus from dd_semdedup's full-corpus bank by graded
  * semantics) → CC → token join. This probe times each stage from a
  * genuinely cold cache state, then the residual composition with each
  * tier pre-warmed, to split "re-paid memoized work" from "genuine
  * one-time cost".
  */
object SemanticStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sem-stage] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    def coldCaches(): Unit = {
      QueriesExt.clearClusterLabelCache()
      Dedup.releaseIntermediates(spark)
      spark.sharedState.cacheManager.clearCache()
    }
    val q = graft.SparkEntry.queries("cu_dedup_semantic")

    // full cold → full warm → label-cold-only
    // r17 ask #3: the survivor bank is now CONTENT-keyed (docs+emb file
    // signatures + recipe), so the label-cold leg re-pays ONLY label
    // production — the bank memo survives the label-frame churn. Before
    // r17 this leg re-paid labels + the 5.6 s bank rebuild.
    coldCaches()
    timed("full cu_dedup_semantic (all cold)")(
      q(spark, sfDir).write.format("noop").mode("overwrite").save())
    timed("full cu_dedup_semantic (all warm)")(
      q(spark, sfDir).write.format("noop").mode("overwrite").save())
    QueriesExt.clearClusterLabelCache()
    timed("full cu_dedup_semantic (label cold / bank warm)")(
      q(spark, sfDir).write.format("noop").mode("overwrite").save())

    // stage splits from cold
    coldCaches()
    val labels = timed("1. clusterLabels production")(
      QueriesExt.clusterLabels(spark, sfDir))
    val survivors = labels.filter(col("cluster_id") === col("doc_id"))
      .select("doc_id")
    val nSurv = timed("2. survivors count")(survivors.count())
    val survEmb = graft.sources.Tables.embeddings(spark, sfDir)
      .join(survivors.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"))
    timed("3. survEmb materialize (count)")(survEmb.count())
    val pairs = timed("4a. semDedupPairs cold (bank build + pairs)") {
      val p = Dedup.semDedupPairs(survEmb, "embedding", "vec_id",
        threshold = QueriesExt.NearDupCosine)
      p.count(); p
    }
    timed("4b. semDedupPairs warm")(
      Dedup.semDedupPairs(survEmb, "embedding", "vec_id",
        threshold = QueriesExt.NearDupCosine).count())
    val comp = timed("5. connectedComponents")(
      Dedup.connectedComponents(pairs, "id_a", "id_b")
        .withColumnRenamed("id", "doc_id"))
    timed("5b. comp count")(comp.count())
    timed("6. residual full query (everything warm)")(
      q(spark, sfDir).write.format("noop").mode("overwrite").save())
    println(s"[sem-stage] nSurv=$nSurv")

    // lever: does persisting survEmb cut the bank-cold build (the ~4
    // actions each re-pay the embeddings ⋈ survivors join)?
    coldCaches()
    val labels2 = QueriesExt.clusterLabels(spark, sfDir)
    val surv2 = labels2.filter(col("cluster_id") === col("doc_id"))
      .select("doc_id").withColumnRenamed("doc_id", "vec_id")
    val survEmb2 = graft.sources.Tables.embeddings(spark, sfDir)
      .join(surv2, Seq("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("7a. survEmb persist+materialize")(survEmb2.count())
    timed("7b. semDedupPairs cold over PERSISTED survEmb")(
      Dedup.semDedupPairs(survEmb2, "embedding", "vec_id",
        threshold = QueriesExt.NearDupCosine).count())
    survEmb2.unpersist()
    spark.stop()
  }
}
