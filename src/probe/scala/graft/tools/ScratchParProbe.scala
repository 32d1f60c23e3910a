package graft.tools

import org.apache.spark.sql.functions._

/** r15: is the embed broadcast-tier scratch kernel split-starved?
  * (r12 lesson: zero-exchange pipelines inherit file-split
  * parallelism; 51 MB of embeddings bin-packs into very few splits.)
  */
object ScratchParProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10")
    val spark = graft.GraftSession.get("local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    def run(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val sig = df.select(col("vec_id").as("id"),
        graft.plans.GraftFunctions.hyperplanePoolSketch(col("embedding"), 2048).as("sk"))
      println(s"[scratch-par] $label partitions=" + sig.rdd.getNumPartitions)
      val t0 = System.nanoTime()
      val n = sig.select(sum(element_at(col("sk"), 1) % 1000000L)).head().getLong(0)
      println(f"[scratch-par] $label sketch-all ${(System.nanoTime() - t0) / 1e9}%.2f s (chk=$n)")
    }
    run("natural", emb)
    run("repart32", emb.repartition(32))
    spark.stop()
  }
}
