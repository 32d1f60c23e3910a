package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Broadcast inverted-file index for the IVF scan tier
  * ([[graft.operators.Similarity.ivfTopK]] /
  * `ivfSeededTopK`): every corpus row's (id, vector, norm) grouped by
  * its assigned list, members contiguous per list so a probe is one
  * binary search + a tight linear scan. Built from the SAME
  * [[NearestCentroidLists]] assignment the join tier computes, so the
  * member set of each list is identical across tiers.
  *
  * Duplicate ids are kept as distinct member rows (not last-write-wins)
  * — the join tier scores every corpus ROW, so the bank must too.
  * Norms are precomputed with the [[DotProductFF]] sequential double
  * fold, making scan-tier cosines bit-identical to the joined
  * `cosineFromParts(dot, qn, cn)` form and the SQL oracle.
  */
case class IvfIndexBank(listIds: Array[Int], starts: Array[Int],
    ids: Array[Long], vecs: Array[Array[Float]], norms: Array[Double])
    extends Serializable {
  /** [start, end) member range of `listId`; (0, 0) when absent. */
  def listRange(listId: Int): Long = {
    val p = java.util.Arrays.binarySearch(listIds, listId)
    if (p < 0) 0L else (starts(p).toLong << 32) | (starts(p + 1).toLong & 0xffffffffL)
  }
}

object IvfIndexBank {
  /** Build from (list_id, id, vec) member rows, any order. */
  def apply(rows: Array[(Int, Long, Array[Float])]): IvfIndexBank = {
    val sorted = rows.sortBy(r => (r._1, r._2))
    val n = sorted.length
    val distinctLists = scala.collection.mutable.ArrayBuffer.empty[Int]
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < n) {
      if (distinctLists.isEmpty || distinctLists.last != sorted(i)._1) {
        distinctLists += sorted(i)._1
        starts += i
      }
      i += 1
    }
    starts += n
    val norms = sorted.map { case (_, _, v) =>
      var s = 0.0
      var j = 0
      while (j < v.length) { s += v(j).toDouble * v(j).toDouble; j += 1 }
      s
    }
    IvfIndexBank(distinctLists.toArray, starts.toArray,
      sorted.map(_._2), sorted.map(_._3), norms)
  }
}

/** Map-side IVF search: scan the query's probed lists in a BROADCAST
  * [[IvfIndexBank]] into a bounded [[TopKHeap]], emitting the ranked
  * `array<struct<neighbor_id, cosine>>` — the same payload
  * [[TopKNeighbors]] aggregates from the joined candidate stream, with
  * ZERO candidate rows ever materialized: the probes⋈assigned join
  * (N·probe·listSize rows — ~2·10⁹ at the sf10 soak, 29 s of
  * `sim_ann_ivf`'s 33.8 s measured r11) collapses into one in-task
  * loop per query.
  *
  * Parity contract (the oracle hashes this result):
  *  - cosine = dot/(√qn·√cn), dot and both norms strict left-to-right
  *    double folds (the [[DotProductFF]] order), 0.0 when either norm
  *    is 0 — identical to `cosineFromParts` over joined rows;
  *  - self-pairs (member id == query id) are skipped, the join tier's
  *    `query_id =!= id` filter;
  *  - ranking is [[TopKHeap]] itself — the same (cosine desc, id asc)
  *    bounded heap [[TopKNeighbors]] runs, so the emitted rows and
  *    their order are the aggregate path's exactly.
  */
case class IvfScanTopK(first: Expression, second: Expression,
    third: Expression,
    bank: org.apache.spark.broadcast.Broadcast[IvfIndexBank], k: Int)
    extends TernaryExpression with CodegenFallback {
  require(k > 0, s"top-k needs k > 0 (got $k)")
  override def dataType: DataType = ArrayType(new StructType()
    .add("neighbor_id", LongType, nullable = false)
    .add("cosine", DoubleType, nullable = false), containsNull = false)
  override protected def nullSafeEval(qid: Any, v: Any, ls: Any): Any = {
    val queryId = qid.asInstanceOf[Long]
    val vec = v.asInstanceOf[ArrayData]
    val lists = ls.asInstanceOf[ArrayData]
    val b = bank.value
    val dim = vec.numElements()
    var qn = 0.0
    var i = 0
    while (i < dim) { val x = vec.getFloat(i).toDouble; qn += x * x; i += 1 }
    val sq = math.sqrt(qn)
    val heap = new TopKHeap(k)
    val nl = lists.numElements()
    var li = 0
    while (li < nl) {
      val range = b.listRange(lists.getInt(li))
      var m = (range >> 32).toInt
      val end = range.toInt
      while (m < end) {
        val nid = b.ids(m)
        if (nid != queryId) {
          val cv = b.vecs(m)
          val lim = math.min(dim, cv.length)
          var d = 0.0
          var j = 0
          while (j < lim) { d += vec.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
          val nn = sq * math.sqrt(b.norms(m))
          heap.offer(if (nn == 0.0) 0.0 else d / nn, nid)
        }
        m += 1
      }
      li += 1
    }
    new GenericArrayData(heap.rankedIndices
      .map(x => InternalRow(heap.ids(x), heap.scores(x)): Any))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(first = f, second = s, third = t)
}
