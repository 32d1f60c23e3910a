package graft

/** Plan inspection helper: prints formatted physical plans for selected
  * queries (dev tool; run via `sbt "runMain graft.Explain q1_agg ..."`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("local[8]")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg", "q5_star_join", "w1_latest_per_key", "j1_anti_join")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
