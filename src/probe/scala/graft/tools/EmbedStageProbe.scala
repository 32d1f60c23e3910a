package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** r12 stage split of the CURRENT broadcast-tier embed-neardup shape
  * (the r11 bucket-local rewrite): scratch → exploded+salt → one
  * (bk, salt) shuffle + in-partition sort + pairwise loop → distinct →
  * verify. The prorated-checkpoint gate (r12) did NOT move the sf10
  * total (219.5 vs 218.6 s), so the popcount loop is evidently not the
  * bulk — this probe names the stage that is.
  */
object EmbedStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val threshold = sys.env.getOrElse("SPARK_GRAFT_PROBE_THRESHOLD", "0.45").toDouble
    val spark = GraftSession.get(s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")
    import graft.plans.GraftFunctions.{hyperplanePoolSketch, poolBucketKeys}
    import graft.functions.VectorFunctions._
    import graft.operators.{CorpusStats, Dedup, Skew}
    import spark.implicits._

    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = CorpusStats.rowCount(emb)
    val poolBits = 2048
    val maxBucketSize = 100000
    val (bits, _) = Dedup.embeddingLshParamsBroadcast(n, threshold)
    val tabs = math.min(4096, Dedup.embeddingLshTablesFor(bits, threshold))
    val cps = Dedup.hammingCheckpoints(poolBits, threshold)
    println(s"[embed-stage] n=$n bits=$bits tables=$tabs")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[embed-stage] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val sig = emb.select(col("id"), col("vec"),
      normSq(col("vec")).as("nsq"),
      hyperplanePoolSketch(col("vec"), poolBits).as("sk")).persist()
    timed("scratch (sketch+norm)")(sig.count())

    val bank = {
      val m = new java.util.HashMap[Long, Array[Long]](math.max(16, n.toInt * 2))
      timed("bank collect")(
        sig.select(col("id"), col("sk")).collect().foreach { r =>
          m.put(r.getLong(0), r.getSeq[Long](1).toArray)
        })
      spark.sparkContext.broadcast(m)
    }

    val exploded = Skew.saltOversized(
      sig.select(col("id"),
        explode(poolBucketKeys(col("sk"), poolBits, bits, tabs)).as("bk")),
      Seq("bk"), maxBucketSize, saltOn = col("id"))
    val idxRows = timed("exploded+salt count (pipeline only)")(exploded.count())

    val sorted = exploded.select(
        shiftleft(col("bk"), 24).bitwiseOR(col("__salt")).as("pk"), col("id"))
      .repartition(col("pk"))
      .sortWithinPartitions("pk")
      .as[(Long, Long)]
    // shuffle+sort+decode WITHOUT the pair loop: same frame, trivial
    // per-group work — isolates row machinery from pair math
    timed("shuffle+sort+decode (no pairs)")(sorted.mapPartitions { rows =>
      var c = 0L
      rows.foreach(_ => c += 1)
      Iterator.single(c)
    }.reduce(_ + _))

    // + the real pairwise loop (prorated gate), no distinct
    val survivors = sorted.mapPartitions { rows =>
      val b = bank.value
      val it = rows.buffered
      def nextGroup(): Iterator[(Long, Long)] = {
        if (!it.hasNext) return null
        val head = it.head
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (it.hasNext && it.head._1 == head._1)
          ids += it.next()._2
        if (ids.length < 2) return Iterator.empty
        val arr = ids.toArray
        val sks = arr.map(b.get)
        for {
          i <- (0 until arr.length).iterator
          j <- (i + 1 until arr.length).iterator
          if arr(i) != arr(j) &&
            graft.plans.HammingWithinCheckpoints.within(sks(i), sks(j), cps)
        } yield if (arr(i) < arr(j)) (arr(i), arr(j)) else (arr(j), arr(i))
      }
      Iterator.continually(nextGroup()).takeWhile(_ != null).flatten
    }
    val survCount = timed("+ pairwise loop (count, no distinct)")(survivors.rdd.count())
    val distinctCount = timed("+ distinct")(survivors.toDF("id_a", "id_b").distinct().count())
    val shipped = timed("full operator")(
      Dedup.embeddingNearDupPairs(emb, "vec", "id", threshold = threshold).count())
    println(s"[embed-stage] idx_rows=$idxRows survivors=$survCount " +
      s"distinct=$distinctCount shipped=$shipped")
    spark.stop()
  }
}
