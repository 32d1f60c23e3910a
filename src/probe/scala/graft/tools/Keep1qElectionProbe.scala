package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r19 A-B for the keep1q canonical election (VERDICT r18 ask #3):
  * OLD = `first_value(doc_id)` over a second in-partition ordering
  * (h, __q desc, doc_id) of the gram exchange — forces a second full
  * sort of the widest exchange in the engine; NEW = order-free
  * `min(struct(-__q, doc_id))` over the unordered h window, which
  * collapses into the dense_rank WindowExec's (h, doc_id) sort.
  * Both elect the identical canonical (negation is a strict order
  * reversal); the probe asserts result parity per pass, then reports
  * interleaved timings (A,B,A,B,…) so host drift smears evenly.
  * keep1 (the id election) runs as the floor reference.
  */
object Keep1qElectionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "3").toInt
    val spark = GraftSession.get(s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val k = 8
    val docs = graft.sources.Tables.documents(spark, sfDir)

    def gramsQ = docs.select(col("doc_id"),
      graft.functions.TextAnalysis.qualityScore(col("text")).as("__q"),
      posexplode(graft.plans.GraftFunctions.tokenGramHashes(col("text"), k))
        .as(Seq("pos", "h")))

    val byH = Window.partitionBy("h").orderBy("doc_id")
    val unordered = Window.partitionBy("h")

    // OLD shape: first_value over a second (h, __q desc, doc_id) sort
    def oldSpans = {
      val byQual = Window.partitionBy("h").orderBy(col("__q").desc, col("doc_id").asc)
      val marked = gramsQ
        .withColumn("__r", dense_rank().over(byH))
        .withColumn("__nd", max(col("__r")).over(unordered))
        .withColumn("__canon", first(col("doc_id")).over(byQual))
        .filter(col("__nd") >= 2 && col("doc_id") =!= col("__canon"))
        .select(col("doc_id"), col("pos"))
      Dedup.assembleSpans(marked, k)
    }
    // NEW shape: the shipped operator
    def newSpans = Dedup.substringDupSpansKeep1Quality(docs, "text", "doc_id", k)
    // floor: the id election
    def keep1Spans = Dedup.substringDupSpansKeep1(docs, "text", "doc_id", k)

    def timed(label: String)(f: => Long): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[keep1q-ab] $label%-28s $s%8.2fs  rows=$n")
      s
    }

    // parity once (cheap at small SF; at sf10 it's two runs — still run it:
    // an A-B between non-equivalent shapes is meaningless)
    val a = oldSpans.orderBy("doc_id", "span_start")
      .collect().map(_.toSeq).toSeq
    val b = newSpans.orderBy("doc_id", "span_start")
      .collect().map(_.toSeq).toSeq
    require(a == b, s"election parity broken: old=${a.size} rows, new=${b.size} rows")
    println(s"[keep1q-ab] parity OK: ${a.size} identical span rows")

    val results = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to passes).foreach { _ =>
      results("old_first_value") :+= timed("old: first_value sorted")(oldSpans.count())
      results("new_min_struct") :+= timed("new: min(struct) unordered")(newSpans.count())
      results("keep1_id") :+= timed("keep1 id election (floor)")(keep1Spans.count())
    }
    results.toSeq.sortBy(_._1).foreach { case (l, ts) =>
      val m = ts.sorted.apply(ts.size / 2)
      println(f"[keep1q-ab] MEDIAN $l%-22s $m%8.2fs  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
