package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** r15 stage split of `dd_cluster` (clusterLabels) at the post-r14
  * HEAD: the driver union-find tier removed the fixed ~8-round
  * distributed-contraction cost, leaving an 8.1 s sf10 isolated
  * median whose remaining attribution (exact-group window? minhash
  * pair production? CC's distinct+collect? the label join?) was
  * un-probed after the tier change.
  */
object ClusterStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cluster-stage] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val dd = graft.sources.Tables.documents(spark, sfDir)
    import org.apache.spark.sql.expressions.Window
    val marked = dd.select(col("doc_id"), col("text"))
      .withColumn("__keep", min(col("doc_id")).over(
        Window.partitionBy(md5(col("text").cast("binary")))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("exact-group window + persist")(marked.count())
    val kept1 = marked.filter(col("doc_id") === col("__keep"))
      .select(col("doc_id"), col("text"))
    val exactEdges = marked.filter(col("doc_id") =!= col("__keep"))
      .select(col("doc_id").as("id_a"), col("__keep").as("id_b"))
    val pairs = Dedup.minhashNearDupPairs(kept1, "text", "doc_id",
      shingleLen = 8, threshold = graft.QueriesExt.JaccardThreshold)
      .select(col("id_a"), col("id_b"))
    val nPairs = timed("minhash pair production (count)")(pairs.count())
    println(s"[cluster-stage] pairs=$nPairs")
    val allEdges = pairs.union(exactEdges)
    val comp = timed("connectedComponents (driver tier)")(
      Dedup.connectedComponents(allEdges, "id_a", "id_b"))
    timed("cc labels count")(comp.count())
    val labeled = dd.select(col("doc_id"))
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).cast("long").as("cluster_id"))
      .localCheckpoint(true)
    timed("label join + checkpoint")(labeled.count())
    timed("orderBy + final collect-ish count")(
      labeled.orderBy("doc_id").count())
    // second run of pair production to split JIT/page-cache from steady
    timed("minhash pair production (re-run)")(
      Dedup.minhashNearDupPairs(kept1, "text", "doc_id",
        shingleLen = 8, threshold = graft.QueriesExt.JaccardThreshold)
        .select(col("id_a"), col("id_b")).count())
    spark.stop()
  }
}
