package graft.tools

import graft.GraftSession
import graft.streaming.StreamNearDup

/** r16 #4: A-B-A the pre-banded input partitioning lever on the
  * streaming near-dup pipeline. The r15 StreamProbe split put banding
  * at ~50% of the per-doc cost; a MemoryStream (and a narrow Kafka
  * topic) delivers each micro-batch in ONE partition, so the minhash
  * kernel may serialize while the stateful side runs at its 8 state
  * partitions. Variant A: status quo (prePartition = 0). Variant B:
  * repartition the raw doc stream to the core count before banding.
  */
object NearDupPartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.get(s"local[$cpus]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val nDocs = 20000
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id").cast("long"),
        org.apache.spark.sql.functions.col("text")).limit(nDocs)
      .as[(Long, String)].collect()

    def run(label: String, pre: Int): Double = {
      val tmp = java.nio.file.Files.createTempDirectory("ndpart").toString
      val st = MemoryStream[(Long, String)]
      val out = StreamNearDup.candidatePairs(
        st.toDF().toDF("doc_id", "text"), "text", "doc_id",
        prePartition = pre)
      val q = out.writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/ckpt")
        .outputMode("append").start()
      val ms = docs.grouped(math.max(1, nDocs / 5)).map { chunk =>
        st.addData(chunk.toIndexedSeq)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e6
      }.toSeq
      q.stop()
      val rate = nDocs / (ms.sum / 1e3)
      println(f"[ndpart] $label%-28s ${rate}%10.1f docs/s (batches ${ms.map(m => f"$m%.0f").mkString(",")} ms)")
      rate
    }
    // interleaved A-B-A-B to ride out host drift
    run("warmup (A pre=0)", 0)
    val a1 = run("A pre=0", 0)
    val b1 = run(s"B pre=$cpus", cpus)
    val a2 = run("A pre=0", 0)
    val b2 = run(s"B pre=$cpus", cpus)
    println(f"[ndpart] A median ${(a1 + a2) / 2}%10.1f  B median ${(b1 + b2) / 2}%10.1f  ratio ${(b1 + b2) / (a1 + a2)}%.2f")
    spark.stop()
  }
}
