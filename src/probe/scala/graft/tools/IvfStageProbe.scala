package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** r16 #1: stage-split `sim_ann_ivf` at the post-r15 HEAD the way the
  * embed/minhash probes were — the 8–10.5 s isolated band was accepted
  * in r13, BEFORE the kernel-parallelism and scan-tier batching
  * lessons. Decomposes the scan tier into: centroid pick, corpus
  * assignment (the ibank build's compute), ibank collect+broadcast,
  * query assignment + probe-set sort (with run-length stats — how deep
  * does the MaxBatch=32 same-probe-set batching actually get?), probed
  * member mass, and a driver-local kernel A-B (current float→double
  * inline-convert shape vs pre-converted doubles vs per-list deep
  * tiling) to size the restructure win before building it.
  */
object IvfStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sc = spark.sparkContext
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivf-stage] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val lists = Similarity.ivfListsFor(n, dim)
    val probe = Similarity.autoProbe(lists)
    println(s"[ivf-stage] n=$n dim=$dim lists=$lists probe=$probe")

    val q = graft.SparkEntry.queries("sim_ann_ivf")
    (1 to 3).foreach { p =>
      timed(s"full sim_ann_ivf pass $p")(
        q(spark, sfDir).write.format("noop").mode("overwrite").save())
    }

    val cents = Similarity.seededCentroids(emb, "vec_id", "embedding", lists)
    val centRows = timed("seededCentroids collect")(
      cents.select(col("list_id").cast("int"), col("centroid")).collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)))
    val cbank = sc.broadcast(graft.plans.CentroidBank(centRows))
    val par = sc.defaultParallelism

    // corpus assignment compute alone (what the ibank build pays
    // before its collect) — forced through a mapPartitions consumer so
    // column pruning can't elide the kernel
    timed("corpus assign (compute only)") {
      emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        .repartition(par)
        .withColumn("__l",
          graft.plans.GraftFunctions.nearestCentroidLists(col("vec"), cbank, 1))
        .filter(size(col("__l")) > 0)
        .select(element_at(col("__l"), 1).as("list_id"))
        .as[Int].mapPartitions(it => Iterator(it.foldLeft(0L)(_ + _)))
        .collect()
    }
    val ibankRows = timed("ibank assign+collect") {
      emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
        .repartition(par)
        .withColumn("__l",
          graft.plans.GraftFunctions.nearestCentroidLists(col("vec"), cbank, 1))
        .filter(size(col("__l")) > 0)
        .select(element_at(col("__l"), 1).as("list_id"), col("id"), col("vec"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    }
    val ibank = timed("ibank broadcast")(
      sc.broadcast(graft.plans.IvfIndexBank(ibankRows)))

    // list size histogram + probed mass
    val listSize = new java.util.HashMap[Int, Long]()
    ibankRows.foreach(r => listSize.merge(r._1, 1L, java.lang.Long.sum))
    val sizes = listSize.values().toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
    println(s"[ivf-stage] list sizes: min=${sizes.head} p50=${sizes(sizes.length / 2)} " +
      s"p99=${sizes((sizes.length * 99) / 100)} max=${sizes.last}")

    // query assignment + probe-set sort, with run-length + mass stats
    val lsBc = sc.broadcast(listSize)
    val assigned = emb
      .select(col("vec_id").as("query_id"), col("embedding").as("vec"))
      .filter(col("vec").isNotNull)
      .repartition(par)
      .withColumn("__lists",
        graft.plans.GraftFunctions.nearestCentroidLists(col("vec"), cbank, probe))
      .sortWithinPartitions("__lists")
      .select(col("query_id"), col("vec"), col("__lists"))
      .as[(Long, Array[Float], Array[Int])]
    val stats = timed("query assign+sort+run-length pass") {
      assigned.mapPartitions { it =>
        val ls = lsBc.value
        var rows = 0L; var runs = 0L; var batches = 0L
        var mass = 0L
        var cur: Array[Int] = null; var curLen = 0
        it.foreach { case (_, _, l) =>
          rows += 1
          var i = 0
          while (i < l.length) { mass += ls.getOrDefault(l(i), 0L); i += 1 }
          if (cur == null || !java.util.Arrays.equals(cur, l)) {
            runs += 1; batches += 1; cur = l; curLen = 1
          } else {
            curLen += 1
            if (curLen > 32) { batches += 1; curLen = 1 } // MaxBatch roll
          }
        }
        Iterator((rows, runs, batches, mass))
      }.collect().reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
    }
    val (rows, runs, batches, mass) = stats
    println(f"[ivf-stage] queries=$rows runs=$runs (mean run ${rows.toDouble / runs}%.2f) " +
      f"batches=$batches probedMembers=$mass (${mass.toDouble / rows}%.0f/query, " +
      f"macs=${mass.toDouble * dim / 1e12}%.2fe12)")

    // driver-local kernel A-B at the real dim/data: score W pairs
    // (a) current shape: float arrays, inline toDouble, 4-acc + gate
    // (b) pre-converted double arrays, same loop
    // (c) per-list deep tile: member converted once, scored vs Q queries
    val b = ibank.value
    val nv = b.ids.length
    val qCount = 256
    val qf = Array.tabulate(qCount)(i => b.vecs((i * 7919) % nv))
    val qd = qf.map(v => v.map(_.toDouble))
    val sq = qd.map(v => math.sqrt(v.map(x => x * x).sum))
    val k = 5
    def runKernel(label: String, reps: Int)(body: () => Double): Unit = {
      body(); body() // warm JIT
      val t0 = System.nanoTime()
      var acc = 0.0
      (1 to reps).foreach(_ => acc += body())
      val dt = (System.nanoTime() - t0) / 1e9
      val pairs = reps.toLong * qCount * nv
      println(f"[ivf-kernel] $label%-34s ${pairs / dt / 1e9}%6.3f Gpair/s " +
        f"(${pairs.toDouble * dim / dt / 1e9}%6.1f GMAC/s) [acc=$acc%.3f]")
    }
    // (a) current: per query, stream all members, inline converts
    runKernel("a: float inline-convert 4-acc", 2) { () =>
      var out = 0.0
      var qi = 0
      while (qi < qCount) {
        val qv = qf(qi)
        val heap = new graft.plans.TopKHeap(k)
        val qn = sq(qi)
        var m = 0
        while (m < nv) {
          val cv = b.vecs(m)
          val lim = math.min(qv.length, cv.length)
          val main = lim - (lim & 3)
          var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
          var j = 0
          while (j < main) {
            d0 += qv(j).toDouble * cv(j).toDouble
            d1 += qv(j + 1).toDouble * cv(j + 1).toDouble
            d2 += qv(j + 2).toDouble * cv(j + 2).toDouble
            d3 += qv(j + 3).toDouble * cv(j + 3).toDouble
            j += 4
          }
          var fast = (d0 + d1) + (d2 + d3)
          while (j < lim) { fast += qv(j).toDouble * cv(j).toDouble; j += 1 }
          val nn = qn * b.sqrtNorms(m)
          if (heap.size < k ||
              fast >= heap.scores(0) * nn - (1e-13 + 5e-16 * lim) * nn) {
            var d = 0.0
            j = 0
            while (j < lim) { d += qv(j).toDouble * cv(j).toDouble; j += 1 }
            heap.offer(if (nn == 0.0) 0.0 else d / nn, b.ids(m))
          }
          m += 1
        }
        out += heap.scores(0)
        qi += 1
      }
      out
    }
    // (b) pre-converted doubles, same per-query streaming
    val vecsD = b.vecs.map(v => v.map(_.toDouble))
    runKernel("b: pre-converted doubles 4-acc", 2) { () =>
      var out = 0.0
      var qi = 0
      while (qi < qCount) {
        val qv = qd(qi)
        val heap = new graft.plans.TopKHeap(k)
        val qn = sq(qi)
        var m = 0
        while (m < nv) {
          val cv = vecsD(m)
          val lim = math.min(qv.length, cv.length)
          val main = lim - (lim & 3)
          var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
          var j = 0
          while (j < main) {
            d0 += qv(j) * cv(j)
            d1 += qv(j + 1) * cv(j + 1)
            d2 += qv(j + 2) * cv(j + 2)
            d3 += qv(j + 3) * cv(j + 3)
            j += 4
          }
          var fast = (d0 + d1) + (d2 + d3)
          while (j < lim) { fast += qv(j) * cv(j); j += 1 }
          val nn = qn * b.sqrtNorms(m)
          if (heap.size < k ||
              fast >= heap.scores(0) * nn - (1e-13 + 5e-16 * lim) * nn) {
            var d = 0.0
            j = 0
            while (j < lim) { d += qv(j) * cv(j); j += 1 }
            heap.offer(if (nn == 0.0) 0.0 else d / nn, b.ids(m))
          }
          m += 1
        }
        out += heap.scores(0)
        qi += 1
      }
      out
    }
    // (c) member-major deep tile: member converted to double ONCE,
    // scored against all queries (the per-list grouping shape where
    // the tile is the list's local probers, not a same-probe-set run)
    runKernel("c: member-major tile, dbl convert 1x", 2) { () =>
      var out = 0.0
      val heaps = Array.fill(qCount)(new graft.plans.TopKHeap(k))
      val cvd = new Array[Double](dim)
      var m = 0
      while (m < nv) {
        val cv = b.vecs(m)
        var j = 0
        while (j < cv.length) { cvd(j) = cv(j).toDouble; j += 1 }
        val lim = cv.length
        val main = lim - (lim & 3)
        val sn = b.sqrtNorms(m)
        val id = b.ids(m)
        var qi = 0
        while (qi < qCount) {
          val qv = qd(qi)
          var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
          j = 0
          while (j < main) {
            d0 += qv(j) * cvd(j)
            d1 += qv(j + 1) * cvd(j + 1)
            d2 += qv(j + 2) * cvd(j + 2)
            d3 += qv(j + 3) * cvd(j + 3)
            j += 4
          }
          var fast = (d0 + d1) + (d2 + d3)
          while (j < lim) { fast += qv(j) * cvd(j); j += 1 }
          val heap = heaps(qi)
          val nn = sq(qi) * sn
          if (heap.size < k ||
              fast >= heap.scores(0) * nn - (1e-13 + 5e-16 * lim) * nn) {
            var d = 0.0
            j = 0
            while (j < lim) { d += qv(j) * cvd(j); j += 1 }
            heap.offer(if (nn == 0.0) 0.0 else d / nn, id)
          }
          qi += 1
        }
        m += 1
      }
      heaps.foreach(h => out += h.scores(0))
      out
    }
    spark.stop()
  }
}
