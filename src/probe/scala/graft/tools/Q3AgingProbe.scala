package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** r19: q3_topk_join at sf10 runs FASTER cold than warm inside one
  * JVM (isolated passes [16.4, 150.8, 39.1, 50.8] — pass 2 is 10×
  * pass 1, reproducibly), the only query with that signature; three
  * rounds of host adjudication never explained it. Per pass this
  * probe prints the executed plan's join/exchange shape and splits
  * the pipeline (scan-only, join-only, full) to locate what ages.
  */
object Q3AgingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3").toInt
    val spark = GraftSession.get(s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[q3-aging] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    def planShape(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Scan") || l.contains("Aggregate"))
        .map(_.trim.take(120)).mkString("\n")

    (1 to passes).foreach { p =>
      println(s"[q3-aging] --- pass $p ---")
      spark.sharedState.cacheManager.clearCache()
      val l = graft.sources.Tables.lineitem(spark, sfDir)
      val o = graft.sources.Tables.orders(spark, sfDir)
      timed("lineitem scan count")(l.count())
      timed("orders scan count")(o.count())
      val join = l.join(o, col("l_orderkey") === col("o_orderkey"))
      timed("l JOIN o count")(join.count())
      val full = graft.Queries.q3TopkJoin(spark, sfDir)
      timed("full q3 collect")(full.collect())
      println("[q3-aging] plan shape:\n" + planShape(full))
      val rt = Runtime.getRuntime
      println(f"[q3-aging] heap used ${(rt.totalMemory - rt.freeMemory) / 1e9}%.1f GB, total ${rt.totalMemory / 1e9}%.1f GB")
      System.gc()
    }
    spark.stop()
  }
}
