package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

// INVARIANT FOR NEW AGGREGATES IN THIS FILE: GraftSession raises
// spark.sql.objectHashAggregate.sortBased.fallbackThreshold to 2M
// groups session-wide, which disables ObjectHashAggregate's sort-based
// spill valve. Every TypedImperativeAggregate here must therefore keep
// its per-group state BOUNDED (TopKHeap: ~16·k+50 B); an
// unbounded-state aggregate (collect_list-style) over many groups
// would OOM where stock Spark would have spilled. If you need
// unbounded state, scope the threshold back down around that query.

/** Bounded top-k buffer for [[TopKNeighbors]]: the k best
  * (score desc, id asc) entries, held as a binary min-heap on that
  * ordering so the root is always the current evictee — offer() is
  * O(1) for the overwhelmingly-common reject case (candidate worse
  * than the k-th best) and O(log k) otherwise. ~(16·k + 50) bytes per
  * group; see the objectHashAggregate.sortBased.fallbackThreshold note
  * in GraftSession for why that matters.
  */
final class TopKHeap(val k: Int) extends Serializable {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0
  // "i worse than j" under (score desc, id asc); total because ids are
  // distinct within a group in every caller. NaN is the GREATEST score
  // (Spark's descending-first sort order), compared explicitly rather
  // than via primitive `<`/`==` — with those a NaN candidate is
  // retained in ARRIVAL order and a NaN at the root blocks every
  // replacement, so the two ANN tiers (expression vs kernel) diverge
  // on the same input (r20, found by the ivfpq NaN parity spec).
  // ±0.0 keeps primitive `==` semantics (id tie-break), matching the
  // oracle's sort, where Double.compare would rank 0.0 above -0.0.
  @inline private def worse(si: Double, ii: Long, sj: Double, ij: Long): Boolean = {
    val ni = java.lang.Double.isNaN(si)
    val nj = java.lang.Double.isNaN(sj)
    if (ni != nj) nj
    else if (ni) ii > ij
    else si < sj || (si == sj && ii > ij)
  }
  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }
  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }
  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      var m = i
      val l = 2 * i + 1
      val r = l + 1
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }
  def offer(s: Double, id: Long): Unit =
    if (size < k) { scores(size) = s; ids(size) = id; size += 1; siftUp(size - 1) }
    else if (worse(scores(0), ids(0), s, id)) { scores(0) = s; ids(0) = id; siftDown(0) }
  def mergeInto(other: TopKHeap): Unit = {
    var i = 0
    while (i < size) { other.offer(scores(i), ids(i)); i += 1 }
  }
  /** Indices of the held entries, best (score desc, id asc) first. */
  def rankedIndices: Array[Int] =
    Array.range(0, size).sortWith((a, b) => worse(scores(b), ids(b), scores(a), ids(a)))
}

/** Exact top-k per group as a typed-imperative aggregate:
  * `array<struct<neighbor_id, cosine>>` of the k best
  * (cosine desc, neighbor_id asc) input rows, best first — the
  * aggregate form of `row_number() over (partition by g order by
  * cosine desc, id asc) <= k`, and PROVABLY the same rows: the window
  * takes the first k of a strict total order (ids are unique), the
  * heap keeps an entry iff fewer than k better entries exist — the
  * same set — and both emit it in that order.
  *
  * Why it exists: the window form must SORT the full candidate stream
  * (locally for the partial WindowGroupLimit, then again after the
  * partition-by exchange). The ANN rankers feed it N·probe·listSize
  * candidate rows — 2·10⁹ at the sf10 soak — so the two sorts and the
  * exchange dominate the query. As an aggregate, candidates die
  * map-side in the join stage (hash-aggregate partial mode: one heap
  * probe each, no sort), and the exchange carries ≤ groups·k packed
  * entries. Same plan-shape class as a partial count, applied to
  * top-k.
  */
case class TopKNeighbors(scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {
  require(k > 0, s"top-k needs k > 0 (got $k)")
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("neighbor_id", LongType, nullable = false)
    .add("cosine", DoubleType, nullable = false), containsNull = false)
  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)
  override def update(b: TopKHeap, input: InternalRow): TopKHeap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) b.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }
  override def merge(b: TopKHeap, o: TopKHeap): TopKHeap = { o.mergeInto(b); b }
  override def eval(b: TopKHeap): Any =
    new GenericArrayData(b.rankedIndices
      .map(i => InternalRow(b.ids(i), b.scores(i)): Any))
  override def serialize(b: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + b.size * 16)
    bb.putInt(b.k)
    bb.putInt(b.size)
    var i = 0
    while (i < b.size) { bb.putDouble(b.scores(i)); bb.putLong(b.ids(i)); i += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val h = new TopKHeap(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { val s = bb.getDouble; val id = bb.getLong; h.offer(s, id); i += 1 }
    h
  }
  override def withNewMutableAggBufferOffset(o: Int): TopKNeighbors =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKNeighbors =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = c(0), idExpr = c(1))
  override def prettyName: String = "graft_top_k_neighbors"
}
