package graft.tools

import graft.GraftSession

/** r16 #3: A-B harness for the s7 admission-gate cost on the streaming
  * path — runs the full BenchStreaming section N times in one JVM and
  * prints each pass's rates, so the gate variants (r15 dedicated
  * count() per merge vs r16 touched-bucket piggyback) can be compared
  * on one host window.
  */
object StreamBenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to passes).foreach { p =>
      val m = graft.BenchStreaming.run(spark, sfDir).toMap
      val keys = Seq("cdc_events_per_sec", "stateful_latest_events_per_sec",
        "neardup_docs_per_sec", "propagation_ms")
      println(s"[stream-ab] pass $p " + keys.map(k =>
        f"$k=${m.getOrElse(k, -1.0)}%.0f").mkString(" "))
    }
    spark.stop()
  }
}
