package graft.tools

import org.apache.spark.sql.functions._

/** r15: where do s7_cdc_upsert_apply's ~5 s go at sf10 — the change
  * window, the anti-join (and does AQE broadcast a 6.4 M-key build?),
  * or the final total order?
  */
object UpsertStageProbe {
  def main(a: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10")
    val spark = graft.GraftSession.get("local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s7-stage] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val df = graft.SparkEntry.queries("s7_cdc_upsert_apply")(spark, sfDir)
    timed("full query (noop write)")(
      df.write.format("noop").mode("overwrite").save())
    val plan = df.queryExecution.executedPlan.toString
    println("[s7-stage] joins: " + plan.linesIterator
      .filter(l => l.contains("Join")).map(_.trim.take(90)).mkString(" | "))
    // pieces
    val current = graft.sources.Tables.orders(spark, sfDir)
    val changes = current
      .filter(col("o_orderkey") % 3 === 0 || col("o_orderkey") % 7 === 0)
      .withColumn("__op", when(col("o_orderkey") % 7 === 0, lit("d")).otherwise(lit("u")))
      .withColumn("__source_ts_ms", lit(1L)).withColumn("__seq", col("o_orderkey"))
    val latest = graft.operators.CdcMerge.latestPerKey(changes, Seq("o_orderkey"),
      Seq(col("__source_ts_ms"), col("__seq")))
    timed("latestPerKey count")(latest.count())
    val untouched = current.join(latest.select(col("o_orderkey")), Seq("o_orderkey"), "left_anti")
    timed("anti-join count (AQE choice)")(untouched.count())
    val pinned = current.join(latest.select(col("o_orderkey")).hint("shuffle_hash"),
      Seq("o_orderkey"), "left_anti")
    timed("anti-join count (shuffle_hash)")(pinned.count())
    timed("full query again (warm)")(
      df.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
