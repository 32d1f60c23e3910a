package graft.tools

import graft.GraftSession

/** Streaming-section probe: runs [[graft.BenchStreaming]] alone (the
  * full bench charges ~35 s of batch queries first) for the r14
  * StreamNearDup throughput work.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]")
    sys.env.get("STREAM_PROBE_SHUFFLE").foreach { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      println(s"[stream-probe] shuffle.partitions=$p")
    }
    (1 to sys.env.getOrElse("STREAM_PROBE_REPS", "2").toInt).foreach { rep =>
      val res = graft.BenchStreaming.run(spark, sfDir)
      res.foreach { case (k, v) => println(f"[stream-probe] rep$rep $k%-32s $v%12.1f") }
    }

    // stage split: the banding pipeline ALONE (no stateful op, no
    // state store, no shuffle) through the same MemoryStream harness —
    // what the kernel+serialization side costs vs the stateful stage
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val nDocs = 20000
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
        org.apache.spark.sql.functions.col("text")).limit(nDocs)
      .as[(Long, String)].collect()
    val tmp = java.nio.file.Files.createTempDirectory("stream_probe").toString
    val st = MemoryStream[(Long, String)]
    val banded = graft.streaming.StreamNearDup.bandedDocs(
      st.toDF().toDF("doc_id", "text"), "text", "doc_id", 8, 32, 8)
    val q = banded.writeStream.format("noop")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()
    val ms = docs.grouped(math.max(1, nDocs / 5)).map { chunk =>
      st.addData(chunk.toIndexedSeq)
      val t0 = System.nanoTime()
      q.processAllAvailable()
      (System.nanoTime() - t0) / 1e6
    }.toSeq
    q.stop()
    println(f"[stream-probe] banding_only_docs_per_sec ${nDocs / (ms.sum / 1e3)}%12.1f")
    spark.stop()
  }
}
