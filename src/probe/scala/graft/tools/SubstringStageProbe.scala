package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** r17: attribute dd_substring's sf10 cost, v2 (the TokenGramHashes
  * one-pass window-mark shape — the md5/semi-join first cut measured
  * 74 s isolated and is recorded in SCALE_SOAK). Legs: gram expression
  * scan, the h-partitioned mark exchange + dense_rank/max windows, the
  * doc_id span windows, the full graded queries.
  */
object SubstringStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]")
    spark.sparkContext.setLogLevel("ERROR")
    val k = graft.QueriesExt.SubstringK
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[substr-stage] $label%-58s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    timed("0. corpus scan + count")(docs.count())
    val grams = docs.select(col("doc_id"),
      posexplode(graft.plans.GraftFunctions.tokenGramHashes(col("text"), k))
        .as(Seq("pos", "h")))
    timed("1. gram scan (TokenGramHashes + posexplode, count)")(grams.count())
    import org.apache.spark.sql.expressions.Window
    val byH = Window.partitionBy("h").orderBy("doc_id")
    val marked = grams
      .withColumn("__r", dense_rank().over(byH))
      .withColumn("__nd", max(col("__r")).over(Window.partitionBy("h")))
      .filter(col("__nd") >= 2)
      .select(col("doc_id"), col("pos"))
    timed("2. mark exchange + h windows (count)")(marked.count())
    timed("3. full dd_substring")(
      graft.SparkEntry.queries("dd_substring")(spark, sfDir).count())
    timed("3b. full dd_substring again")(
      graft.SparkEntry.queries("dd_substring")(spark, sfDir).count())
    timed("4. full dd_substring_stats")(
      graft.SparkEntry.queries("dd_substring_stats")(spark, sfDir).count())
    spark.stop()
  }
}
