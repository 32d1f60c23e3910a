package graft.tools

/** r12 micro-probe (no Spark): per-candidate scan-loop variants over a
  * synthetic flat bank, single-threaded — which inner-loop shape
  * actually wins on this JIT/CPU before committing the IVF scan loop
  * (Similarity.scanTopKWithBank) to one.
  * Variants: (a) strict left fold over flat array (baseline = the
  * oracle-parity dot), (b) 4-accumulator gate + strict recompute for
  * heap entrants, (c) 4-accumulator gate only (no recompute — lower
  * bound), (d) strict fold over array-of-arrays (the r11-shape bank).
  */
object DotLoopProbe {
  def main(args: Array[String]): Unit = {
    val dim = 64
    val members = 200000
    val queries = 200
    val perQuery = 50000
    val k = 5
    val rnd = new java.util.Random(42)
    val flat = Array.fill(members * dim)(rnd.nextFloat() * 2 - 1)
    val aoa = Array.tabulate(members)(m =>
      java.util.Arrays.copyOfRange(flat, m * dim, (m + 1) * dim))
    val sqrtNorms = Array.tabulate(members) { m =>
      var s = 0.0; var j = 0
      while (j < dim) { val x = flat(m * dim + j).toDouble; s += x * x; j += 1 }
      math.sqrt(s)
    }
    val qs = Array.fill(queries)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))

    def time(label: String)(f: => Double): Unit = {
      var best = Double.MaxValue
      var sink = 0.0
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        sink += f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      val ns = best * 1e9 / (queries.toLong * perQuery)
      println(f"[dot-probe] $label%-28s best=$best%6.2fs  $ns%5.1f ns/candidate (sink=$sink%.3f)")
    }

    def strictFlat(q: Array[Float], base: Int): Double = {
      var d = 0.0; var j = 0
      while (j < dim) { d += q(j).toDouble * flat(base + j).toDouble; j += 1 }
      d
    }
    def fastFlat(q: Array[Float], base: Int): Double = {
      var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
      var j = 0
      while (j < dim) {
        d0 += q(j).toDouble * flat(base + j).toDouble
        d1 += q(j + 1).toDouble * flat(base + j + 1).toDouble
        d2 += q(j + 2).toDouble * flat(base + j + 2).toDouble
        d3 += q(j + 3).toDouble * flat(base + j + 3).toDouble
        j += 4
      }
      (d0 + d1) + (d2 + d3)
    }

    time("strict flat + heap") {
      var acc = 0.0
      for (qi <- 0 until queries) {
        val q = qs(qi)
        var qn = 0.0; var i = 0
        while (i < dim) { val x = q(i).toDouble; qn += x * x; i += 1 }
        val sq = math.sqrt(qn)
        val heap = new graft.plans.TopKHeap(k)
        var m = qi % (members - perQuery)
        val end = m + perQuery
        while (m < end) {
          val d = strictFlat(q, m * dim)
          val nn = sq * sqrtNorms(m)
          heap.offer(if (nn == 0.0) 0.0 else d / nn, m.toLong)
          m += 1
        }
        acc += heap.scores(0)
      }
      acc
    }

    time("gate4 + strict recompute") {
      var acc = 0.0
      for (qi <- 0 until queries) {
        val q = qs(qi)
        var qn = 0.0; var i = 0
        while (i < dim) { val x = q(i).toDouble; qn += x * x; i += 1 }
        val sq = math.sqrt(qn)
        val heap = new graft.plans.TopKHeap(k)
        var m = qi % (members - perQuery)
        val end = m + perQuery
        while (m < end) {
          val nn = sq * sqrtNorms(m)
          val fast = fastFlat(q, m * dim)
          if (heap.size < k || fast >= heap.scores(0) * nn - 1e-12 * nn) {
            val d = strictFlat(q, m * dim)
            heap.offer(if (nn == 0.0) 0.0 else d / nn, m.toLong)
          }
          m += 1
        }
        acc += heap.scores(0)
      }
      acc
    }

    time("gate4 only (lower bound)") {
      var acc = 0.0
      for (qi <- 0 until queries) {
        val q = qs(qi)
        var m = qi % (members - perQuery)
        val end = m + perQuery
        var s = 0.0
        while (m < end) { s += fastFlat(q, m * dim); m += 1 }
        acc += s
      }
      acc
    }

    time("aoa gate4 + strict recompute") {
      var acc = 0.0
      for (qi <- 0 until queries) {
        val q = qs(qi)
        var qn = 0.0; var i = 0
        while (i < dim) { val x = q(i).toDouble; qn += x * x; i += 1 }
        val sq = math.sqrt(qn)
        val heap = new graft.plans.TopKHeap(k)
        var m = qi % (members - perQuery)
        val end = m + perQuery
        while (m < end) {
          val cv = aoa(m)
          var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
          var j = 0
          while (j < dim) {
            d0 += q(j).toDouble * cv(j).toDouble
            d1 += q(j + 1).toDouble * cv(j + 1).toDouble
            d2 += q(j + 2).toDouble * cv(j + 2).toDouble
            d3 += q(j + 3).toDouble * cv(j + 3).toDouble
            j += 4
          }
          val fast = (d0 + d1) + (d2 + d3)
          val nn = sq * sqrtNorms(m)
          if (heap.size < k || fast >= heap.scores(0) * nn - 1e-12 * nn) {
            var d = 0.0; var jj = 0
            while (jj < dim) { d += q(jj).toDouble * cv(jj).toDouble; jj += 1 }
            heap.offer(if (nn == 0.0) 0.0 else d / nn, m.toLong)
          }
          m += 1
        }
        acc += heap.scores(0)
      }
      acc
    }

    // locality: re-scan the SAME 13 MB window for consecutive queries
    // (the sorted-by-probed-list shape) vs a sliding window per query
    time("strict aoa + heap, shared window") {
      var acc = 0.0
      for (qi <- 0 until queries) {
        val q = qs(qi)
        var qn = 0.0; var i = 0
        while (i < dim) { val x = q(i).toDouble; qn += x * x; i += 1 }
        val sq = math.sqrt(qn)
        val heap = new graft.plans.TopKHeap(k)
        var m = (qi / 16) * 1000 % (members - perQuery)
        val end = m + perQuery
        while (m < end) {
          val cv = aoa(m)
          var d = 0.0; var j = 0
          while (j < dim) { d += q(j).toDouble * cv(j).toDouble; j += 1 }
          val nn = sq * sqrtNorms(m)
          heap.offer(if (nn == 0.0) 0.0 else d / nn, m.toLong)
          m += 1
        }
        acc += heap.scores(0)
      }
      acc
    }

    // member-major batch: B queries share each member load (GEMM-style
    // tiling — the DRAM-traffic fix; traffic ÷ B)
    for (batch <- Seq(8, 16, 32)) {
      time(s"batch-$batch member-major gate4+strict") {
        var acc = 0.0
        var qi = 0
        while (qi < queries) {
          val bEnd = math.min(qi + batch, queries)
          val bSize = bEnd - qi
          val qb = new Array[Array[Float]](bSize)
          val sqb = new Array[Double](bSize)
          val heaps = new Array[graft.plans.TopKHeap](bSize)
          var bi = 0
          while (bi < bSize) {
            val q = qs(qi + bi)
            var qn = 0.0; var i = 0
            while (i < dim) { val x = q(i).toDouble; qn += x * x; i += 1 }
            qb(bi) = q; sqb(bi) = math.sqrt(qn)
            heaps(bi) = new graft.plans.TopKHeap(k)
            bi += 1
          }
          var m = qi % (members - perQuery)
          val end = m + perQuery
          while (m < end) {
            val cv = aoa(m)
            val sn = sqrtNorms(m)
            bi = 0
            while (bi < bSize) {
              val q = qb(bi)
              var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
              var j = 0
              while (j < dim) {
                d0 += q(j).toDouble * cv(j).toDouble
                d1 += q(j + 1).toDouble * cv(j + 1).toDouble
                d2 += q(j + 2).toDouble * cv(j + 2).toDouble
                d3 += q(j + 3).toDouble * cv(j + 3).toDouble
                j += 4
              }
              val fast = (d0 + d1) + (d2 + d3)
              val nn = sqb(bi) * sn
              val heap = heaps(bi)
              if (heap.size < k || fast >= heap.scores(0) * nn - 1e-12 * nn) {
                var d = 0.0; var jj = 0
                while (jj < dim) { d += q(jj).toDouble * cv(jj).toDouble; jj += 1 }
                heap.offer(if (nn == 0.0) 0.0 else d / nn, m.toLong)
              }
              bi += 1
            }
            m += 1
          }
          bi = 0
          while (bi < bSize) { acc += heaps(bi).scores(0); bi += 1 }
          qi = bEnd
        }
        acc
      }
    }

    // float-accumulator gate (wider 1e-5 margin): no f32→f64 converts
    // in the gate — the JIT may vectorize
    time("batch-16 member-major gateF+strict") {
      val batch = 16
      var acc = 0.0
      var qi = 0
      while (qi < queries) {
        val bEnd = math.min(qi + batch, queries)
        val bSize = bEnd - qi
        val qb = new Array[Array[Float]](bSize)
        val sqb = new Array[Double](bSize)
        val heaps = new Array[graft.plans.TopKHeap](bSize)
        var bi = 0
        while (bi < bSize) {
          val q = qs(qi + bi)
          var qn = 0.0; var i = 0
          while (i < dim) { val x = q(i).toDouble; qn += x * x; i += 1 }
          qb(bi) = q; sqb(bi) = math.sqrt(qn)
          heaps(bi) = new graft.plans.TopKHeap(k)
          bi += 1
        }
        var m = qi % (members - perQuery)
        val end = m + perQuery
        while (m < end) {
          val cv = aoa(m)
          val sn = sqrtNorms(m)
          bi = 0
          while (bi < bSize) {
            val q = qb(bi)
            var f0 = 0f; var f1 = 0f; var f2 = 0f; var f3 = 0f
            var j = 0
            while (j < dim) {
              f0 += q(j) * cv(j)
              f1 += q(j + 1) * cv(j + 1)
              f2 += q(j + 2) * cv(j + 2)
              f3 += q(j + 3) * cv(j + 3)
              j += 4
            }
            val fast = ((f0 + f1) + (f2 + f3)).toDouble
            val nn = sqb(bi) * sn
            val heap = heaps(bi)
            if (heap.size < k || fast >= heap.scores(0) * nn - 1e-5 * nn) {
              var d = 0.0; var jj = 0
              while (jj < dim) { d += q(jj).toDouble * cv(jj).toDouble; jj += 1 }
              heap.offer(if (nn == 0.0) 0.0 else d / nn, m.toLong)
            }
            bi += 1
          }
          m += 1
        }
        bi = 0
        while (bi < bSize) { acc += heaps(bi).scores(0); bi += 1 }
        qi = bEnd
      }
      acc
    }

    time("strict array-of-arrays + heap") {
      var acc = 0.0
      for (qi <- 0 until queries) {
        val q = qs(qi)
        var qn = 0.0; var i = 0
        while (i < dim) { val x = q(i).toDouble; qn += x * x; i += 1 }
        val sq = math.sqrt(qn)
        val heap = new graft.plans.TopKHeap(k)
        var m = qi % (members - perQuery)
        val end = m + perQuery
        while (m < end) {
          val cv = aoa(m)
          var d = 0.0; var j = 0
          while (j < dim) { d += q(j).toDouble * cv(j).toDouble; j += 1 }
          val nn = sq * sqrtNorms(m)
          heap.offer(if (nn == 0.0) 0.0 else d / nn, m.toLong)
          m += 1
        }
        acc += heap.scores(0)
      }
      acc
    }
  }
}
