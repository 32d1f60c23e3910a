package graft.plans

/** Broadcast multi-table LSH index for the LSH scan tier
  * ([[graft.operators.Similarity.lshTopK]]): corpus vectors stored once
  * (position-indexed), plus one CSR bucket directory per table —
  * sorted distinct signatures, member-position ranges, flat position
  * array — so a bucket probe is one binary search + a tight position
  * scan, the same access shape as [[IvfIndexBank.listRange]].
  *
  * Signatures come from the SAME [[HyperplaneSig.of]] kernel the join
  * tier's `hyperplaneSignature` expression evaluates, so the bucket
  * membership of every row is identical across tiers by construction.
  * Vectors stay one `Array[Float]` per member and norms are the
  * sequential-double-fold √ (the r12 IVF bank findings — bounds-check
  * elimination and [[DotProductFF]] bit-parity respectively).
  */
case class LshIndexBank(ids: Array[Long], vecs: Array[Array[Float]],
    sqrtNorms: Array[Double],
    tableSigs: Array[Array[Long]], tableStarts: Array[Array[Int]],
    tablePos: Array[Array[Int]]) extends Serializable {

  /** [start, end) range into `tablePos(t)` of table `t`'s bucket with
    * signature `sig`, packed (start << 32 | end); 0L when absent.
    */
  def bucketRange(t: Int, sig: Long): Long = {
    val p = java.util.Arrays.binarySearch(tableSigs(t), sig)
    if (p < 0) 0L
    else (tableStarts(t)(p).toLong << 32) | (tableStarts(t)(p + 1).toLong & 0xffffffffL)
  }
}

object LshIndexBank {
  /** Build from (id, vec, per-table signatures) rows, any order.
    * Members are position-indexed in (id) order so the layout is
    * deterministic for a given corpus.
    */
  def apply(rows: Array[(Long, Array[Float], Array[Long])]): LshIndexBank = {
    val sorted = rows.sortBy(_._1)
    val n = sorted.length
    val nTables = if (n == 0) 0 else sorted(0)._3.length
    val sqrtNorms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val v = sorted(i)._2
      var s = 0.0
      var j = 0
      while (j < v.length) { s += v(j).toDouble * v(j).toDouble; j += 1 }
      sqrtNorms(i) = math.sqrt(s)
      i += 1
    }
    val tableSigs = new Array[Array[Long]](nTables)
    val tableStarts = new Array[Array[Int]](nTables)
    val tablePos = new Array[Array[Int]](nTables)
    var t = 0
    while (t < nTables) {
      // (sig, pos) sorted by sig then pos → CSR directory
      val order = Array.range(0, n).sortBy(p => (sorted(p)._3(t), p))
      val sigs = scala.collection.mutable.ArrayBuffer.empty[Long]
      val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
      i = 0
      while (i < n) {
        val s = sorted(order(i))._3(t)
        if (sigs.isEmpty || sigs.last != s) { sigs += s; starts += i }
        i += 1
      }
      starts += n
      tableSigs(t) = sigs.toArray
      tableStarts(t) = starts.toArray
      tablePos(t) = order
      t += 1
    }
    LshIndexBank(sorted.map(_._1), sorted.map(_._2), sqrtNorms,
      tableSigs, tableStarts, tablePos)
  }
}
