package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the operators where Spark's built-in
  * higher-order functions (`transform`/`zip_with`/`aggregate`) are the
  * bottleneck: HOFs evaluate one lambda call per element with boxing and
  * per-element closures, which at millions of rows × 64-element arrays
  * dominates runtime. Each expression below is a single tight eval loop
  * per row (SURVEY §2 preference order (b): custom Expression before
  * custom physical operator).
  *
  * Numeric parity note: `DotProductFF` folds strictly left-to-right in
  * double, the same order DuckDB's `list_reduce` uses, so query results
  * stay bit-identical to the SQL oracle.
  */
object Hash64 {
  @inline final def splitmix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes with a splitmix finisher — deterministic,
    * dependency-free, well-mixed for LSH/minhash use.
    */
  final def utf8(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    splitmix64(h)
  }
}

/** Sequential-fold dot product of two float arrays in double precision.
  * Participates in whole-stage codegen (`doGenCode` emits the tight
  * loop inline), with an interpreted eval fallback.
  */
case class DotProductFF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** MinHash signature: for each of `numHashes` hash functions, the min
  * over the shingle set of h_i(s) = splitmix64(base(s) ^ mix(i)). One
  * pass over the shingles computes all signature positions.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val base = Hash64.utf8(arr.getUTF8String(i), seed)
      var j = 0
      while (j < numHashes) {
        val h = Hash64.splitmix64(base ^ (j * 0xbf58476d1ce4e5b9L))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over a token array: per-bit vote of each token hash. */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = Hash64.utf8(arr.getUTF8String(i), seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Random-hyperplane LSH signature of a float vector: `nBits` sign bits,
  * plane components ±1 derived from splitmix64(seed, bit, dim).
  */
case class HyperplaneSig(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    // one primitive copy per row (r12 lesson: ArrayData.getFloat is a
    // virtual per-element call and this loop reads every element nBits
    // times), then the shared static kernel — the LSH scan tier calls
    // the SAME kernel per query row, which is what makes the tiers'
    // signatures identical by construction
    HyperplaneSig.of(v.asInstanceOf[ArrayData].toFloatArray(), nBits, seed)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object HyperplaneSig {
  /** `nBits` sign bits of seeded-hyperplane projections, packed into a
    * long — the single implementation both the Catalyst expression and
    * the scan-tier per-query loop evaluate.
    */
  def of(v: Array[Float], nBits: Int, seed: Long): Long = {
    val n = v.length
    var sig = 0L
    var j = 0
    while (j < nBits) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val s = Hash64.splitmix64(seed ^ (j * 0x9e3779b97f4a7c15L) ^ (i * 0xc2b2ae3d27d4eb4fL))
        val sign = if ((s & 1L) == 0L) 1.0 else -1.0
        proj += v(i).toDouble * sign
        i += 1
      }
      if (proj >= 0.0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Shingle set as a SORTED, DEDUPED array of 64-bit hashes: hash each
  * string once (same base hash as [[MinHashSig]], so minhash signatures
  * computed from this set are identical to string-fed ones), sort
  * primitives, dedupe in place. Per-DOC cost, paid once — downstream
  * pair verification then runs on primitive longs. Collision risk of
  * treating hash equality as set equality: ~(elements²/2⁶⁴) per pair
  * ≈ 1e-14 at 300-element sets — and the DuckDB oracle gate would
  * surface any actual collision as a hash mismatch.
  */
case class HashedShingleSet(child: Expression, seed: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = Hash64.utf8(arr.getUTF8String(i), seed); i += 1 }
    java.util.Arrays.sort(hs)
    var w = 0
    i = 0
    while (i < n) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == n) hs else java.util.Arrays.copyOf(hs, w))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Set-Jaccard of two sorted long arrays by merge-scan: intersection
  * counted in one pass of primitive compares, union from sizes. The
  * `array_intersect`+`array_union` formulation builds four hash
  * structures and two result arrays PER PAIR — at ~1M candidate pairs ×
  * ~300-element sets that allocation was the whole verify stage (7.8 s
  * of 9.7 s at sf0.1); this runs the same decision in ~600 long
  * comparisons per pair.
  */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val xa = x.getLong(i)
      val yb = y.getLong(j)
      if (xa == yb) { inter += 1; i += 1; j += 1 }
      else if (xa < yb) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** FUSED character shingling + hashing: the sorted, deduped 64-bit
  * hash set of all length-`n` character shingles at stride `stride` —
  * bit-identical to `HashedShingleSet(charShingles(text, n, stride))`
  * but in ONE pass over the text's UTF-8 bytes. The composed form
  * materializes one substring object per position (a 2000-char doc at
  * stride 1 allocates ~2000 UTF8Strings through a transform/filter HOF
  * chain) before hashing each; this walks code-point boundaries once
  * and FNV-hashes each shingle's byte slice in place — a character
  * substring's UTF-8 bytes ARE the slice between its boundary offsets,
  * so the hashes match the composed form for any input, not just
  * ASCII. Shingle-string duplicates hash equal, so hash-dedup equals
  * the composed form's set semantics.
  */
case class HashedCharShingles(child: Expression, n: Int, stride: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(n > 0 && stride > 0, s"shingle length ($n) and stride ($stride) must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val nb = bytes.length
    val nc = s.numChars()
    if (nc < n) return new GenericArrayData(Array.empty[Long])
    // char-start byte offsets; ASCII fast path needs no boundary table
    val ascii = nb == nc
    val offs = if (ascii) null else {
      val o = new Array[Int](nc + 1)
      var i = 0
      var c = 0
      while (i < nb) {
        o(c) = i
        i += UTF8String.numBytesForFirstByte(bytes(i))
        c += 1
      }
      o(nc) = nb
      o
    }
    val count = (nc - n) / stride + 1
    val hs = new Array[Long](count)
    var k = 0
    var p = 0
    while (p + n <= nc) {
      var h = 0xcbf29ce484222325L ^ seed
      var b = if (ascii) p else offs(p)
      val end = if (ascii) p + n else offs(p + n)
      while (b < end) { h ^= (bytes(b) & 0xffL); h *= 0x100000001b3L; b += 1 }
      hs(k) = Hash64.splitmix64(h)
      k += 1
      p += stride
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var i = 0
    while (i < count) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(if (w == count) hs else java.util.Arrays.copyOf(hs, w))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature from pre-hashed shingles (the [[HashedShingleSet]]
  * base hashes): identical output to [[MinHashSig]] on the string set,
  * without re-hashing the strings.
  */
case class MinHashSigL(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    if (n == 0) return new GenericArrayData(mins)
    // bit-identical restructure (r14, the MinhashBits256 r13 lesson):
    // elements copied to a primitive array once (ArrayData.getLong is a
    // virtual call per element) and the HASH loop outside — the shingle
    // set streams from L1 numHashes times while the running min stays
    // in a register, instead of numHashes mins-array loads/stores per
    // element. Same splitmix64 per (element, hash), same minima — the
    // signature bytes (and so every bucket and estimate) are unchanged.
    val xs = arr.toLongArray()
    // 4 hashes per element pass where numHashes allows (r14, the
    // sketchOf lesson): splitmix64 is itself a serial ~10-op chain, so
    // four independent (hash, min) chains interleave to hide it and
    // each element loads once per four hashes. Same splitmix64 per
    // (element, hash), same minima — signature bytes unchanged.
    val main = numHashes - (numHashes & 3)
    var j = 0
    while (j < main) {
      val c0 = j * 0xbf58476d1ce4e5b9L
      val c1 = (j + 1) * 0xbf58476d1ce4e5b9L
      val c2 = (j + 2) * 0xbf58476d1ce4e5b9L
      val c3 = (j + 3) * 0xbf58476d1ce4e5b9L
      var m0 = Long.MaxValue; var m1 = Long.MaxValue
      var m2 = Long.MaxValue; var m3 = Long.MaxValue
      var i = 0
      while (i < n) {
        val x = xs(i)
        val h0 = Hash64.splitmix64(x ^ c0)
        val h1 = Hash64.splitmix64(x ^ c1)
        val h2 = Hash64.splitmix64(x ^ c2)
        val h3 = Hash64.splitmix64(x ^ c3)
        if (h0 < m0) m0 = h0
        if (h1 < m1) m1 = h1
        if (h2 < m2) m2 = h2
        if (h3 < m3) m3 = h3
        i += 1
      }
      mins(j) = m0; mins(j + 1) = m1; mins(j + 2) = m2; mins(j + 3) = m3
      j += 4
    }
    while (j < numHashes) {
      val c = j * 0xbf58476d1ce4e5b9L
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val h = Hash64.splitmix64(xs(i) ^ c)
        if (h < mn) mn = h
        i += 1
      }
      mins(j) = mn
      j += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 256-bit b-bit minhash sketch from 256 INDEPENDENT 1-bit minwise
  * hashes (Li & König, "b-Bit Minwise Hashing", WWW'10), packed into 4
  * longs: bit j is the lowest bit of min over the set of
  * splitmix64(x ⊕ seed_j) — the [[MinHashSigL]] mixing family, one
  * independent permutation per bit.
  *
  * Estimator: each bit matches with EXACTLY p = J + (1−J)/2 = (1+J)/2
  * (same minimizer element with probability J ⇒ equal bits; different
  * minimizers ⇒ independent low bits), and the 256 draws are
  * INDEPENDENT AT EVERY SET SIZE — unlike the one-permutation/
  * densified form this replaces (r11), whose effective sample size was
  * the occupied-bucket count: on a short-doc corpus (the bench docs
  * are 78–520 chars) the one-perm σ had to be widened per pair to keep
  * the 4σ contract, which doubled the radius-band mass surviving the
  * reject (dd_simhash sf4 5.0→10.7 s). Here σ = √(p(1−p)/256) is exact
  * for every doc length, so the cutoff stays flat AND honest.
  *
  * Purpose: a 32-byte pair-level REJECT filter (est 4σ under the
  * threshold ⇒ drop before any shingle array moves) that rides
  * candidate rows through a join, where the full minhash signature
  * (256 B) or shingle set (KBs) would dominate the shuffle. Match
  * count = 256 − [[LongArrayHamming]] of two sketches. A true pair at
  * J ≥ τ clears a (τ−4σ) cutoff with ~3e-5 miss — the same probability
  * class as the banding/radius recall contracts of the operators that
  * use it.
  *
  * Cost design: the inner loop is O(256·|set|) and sits in the scan
  * stage of every simhash run, so each of the 256 orders is a cheap
  * AFFINE permutation of Z/2⁶⁴ (odd a_j · x + b_j — 1 IMUL + 1 ADD +
  * unsigned compare per bit; a full splitmix per (element, bit) was
  * measured at 10 s of the sf4 scratch build, ~3× this form). Affine
  * families are only approximately min-wise independent, which is fine
  * here: the sketch is a reject HEURISTIC backed by an exact verify,
  * and the estimator spec gates tracking error empirically. The bit is
  * NOT taken from the min value directly — bit0 of a·x+b is
  * bit0(x)⊕bit0(b) for odd a, perfectly correlated across j — but from
  * one FINAL splitmix of the per-bit minimum (256 mixes per doc, not
  * per element): same minimizer ⇒ same bit; different minimizers ⇒
  * independent mixed bits. Empty sets get the all-zero sketch.
  */
case class MinhashBits256(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import MinhashBits256.{MulA, AddB}
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val words = new Array[Long](4)
    if (n == 0) return new GenericArrayData(words)
    // bit-identical restructure of the (element × bit) min scan (r13):
    // elements copied to a primitive array once (virtual getLong —
    // r12 lesson) and the BIT loop outside — a typical shingle set
    // (≤ a few thousand longs) streams from L1 256 times while the
    // running min stays in a register, instead of 256 mins-array
    // loads/stores per element. Same affine products, same unsigned
    // compares, same minima.
    val xs = arr.toLongArray()
    // 4 BITS per element pass (r14, the sketchOf lesson): the per-bit
    // running min is a serial cmp/cmov chain; four independent chains
    // interleave to hide it, and each element is loaded once per FOUR
    // bits instead of once per bit. Minima are order-free — the sketch
    // bits are identical.
    var j = 0
    while (j < 256) {
      val a0 = MulA(j); val b0 = AddB(j)
      val a1 = MulA(j + 1); val b1 = AddB(j + 1)
      val a2 = MulA(j + 2); val b2 = AddB(j + 2)
      val a3 = MulA(j + 3); val b3 = AddB(j + 3)
      var m0 = -1L; var m1 = -1L; var m2 = -1L; var m3 = -1L // unsigned max
      var i = 0
      while (i < n) {
        val x = xs(i)
        val p0 = a0 * x + b0
        val p1 = a1 * x + b1
        val p2 = a2 * x + b2
        val p3 = a3 * x + b3
        if (java.lang.Long.compareUnsigned(p0, m0) < 0) m0 = p0
        if (java.lang.Long.compareUnsigned(p1, m1) < 0) m1 = p1
        if (java.lang.Long.compareUnsigned(p2, m2) < 0) m2 = p2
        if (java.lang.Long.compareUnsigned(p3, m3) < 0) m3 = p3
        i += 1
      }
      if ((Hash64.splitmix64(m0) & 1L) == 1L) words(j >>> 6) |= 1L << (j & 63)
      if ((Hash64.splitmix64(m1) & 1L) == 1L) words((j + 1) >>> 6) |= 1L << ((j + 1) & 63)
      if ((Hash64.splitmix64(m2) & 1L) == 1L) words((j + 2) >>> 6) |= 1L << ((j + 2) & 63)
      if ((Hash64.splitmix64(m3) & 1L) == 1L) words((j + 3) >>> 6) |= 1L << ((j + 3) & 63)
      j += 4
    }
    new GenericArrayData(words)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinhashBits256 {
  // deterministic per-bit affine permutations of Z/2^64: odd multiplier
  // (any odd constant is invertible mod 2^64) + independent offset,
  // both derived from the shared splitmix stream
  private val MulA: Array[Long] =
    Array.tabulate(256)(j => Hash64.splitmix64(0x9e3779b97f4a7c15L * (j + 1)) | 1L)
  private val AddB: Array[Long] =
    Array.tabulate(256)(j => Hash64.splitmix64(0xc2b2ae3d27d4eb4fL * (j + 1)))
}

/** Broadcast centroid bank for [[NearestCentroidLists]]: ids,
  * vectors, and norms precomputed ONCE (driver side, same sequential
  * double fold as [[DotProductFF]] so assignment decisions are
  * bit-identical to the joined form and the SQL oracle).
  */
case class CentroidBank(listIds: Array[Int], vecs: Array[Array[Float]],
    norms: Array[Double]) extends Serializable

object CentroidBank {
  /** `rows` as (list_id, centroid) pairs, any order; stored sorted by
    * list_id so the scan tie-break (below) is positional.
    */
  def apply(rows: Array[(Int, Array[Float])]): CentroidBank = {
    val sorted = rows.sortBy(_._1)
    val norms = sorted.map { case (_, v) =>
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      s
    }
    CentroidBank(sorted.map(_._1), sorted.map(_._2), norms)
  }
}

/** Map-side IVF assignment: the `probe` nearest centroid list_ids of a
  * float vector (cosine, smaller-list_id tiebreak), best first, against
  * a BROADCAST centroid bank. Replaces the
  * crossJoin(centroids) → Window(partitionBy id) assignment shape,
  * which shuffles N·lists VECTOR-carrying rows through a sort — 27 GB
  * at 200 k vectors × 447 lists (r10 sf10 soak) for what is a per-row
  * argmax. Here the N·lists cosines run pipelined in the scan stage and
  * NOTHING shuffles; the task ships only the broadcast handle.
  *
  * Parity contract: csim = dot/(√nsq·√cnorm) with dot and both norms
  * as strict left-to-right double folds (the [[DotProductFF]] order),
  * 0.0 when either norm is 0 — and ties prefer the smaller list_id
  * (strict-greater replacement over a list_id-ascending scan), exactly
  * the `row_number over (csim desc, list_id asc)` the window computed,
  * so graded assignments stay bit-identical to the DuckDB oracle.
  * Comparisons use `java.lang.Double.compare` — Spark's SQL total
  * order, where NaN sorts GREATER than every value and equal to
  * itself — so a vector with a non-finite component (all csims NaN)
  * still assigns to its smallest-list_id centroid exactly as the
  * window form did, instead of falling out of the result via an empty
  * list (a plain `>` is always false for NaN; r10's scan silently
  * DROPPED such rows where the windowed plan kept them).
  */
case class NearestCentroidLists(child: Expression,
    bank: org.apache.spark.broadcast.Broadcast[CentroidBank], probe: Int)
    extends UnaryExpression with CodegenFallback {
  require(probe > 0, s"probe must be positive (got $probe)")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    // one primitive copy per row: the loop below reads every element
    // lists×dim times, and ArrayData.getFloat is a virtual per-element
    // call (same r12 finding as the IVF batched scan loop — at √N lists this scan is
    // ~n·√N·dim element reads)
    val vec = v.asInstanceOf[ArrayData].toFloatArray()
    val b = bank.value
    val n = b.listIds.length
    val dim = vec.length
    var nsq = 0.0
    var i = 0
    while (i < dim) { val x = vec(i).toDouble; nsq += x * x; i += 1 }
    val p = math.min(probe, n)
    if (p == 0) return new GenericArrayData(Array.empty[Int])
    val topSim = Array.fill(p)(Double.NegativeInfinity)
    val topIdx = Array.fill(p)(-1)
    var c = 0
    while (c < n) {
      val cv = b.vecs(c)
      val m = math.min(dim, cv.length)
      var d = 0.0
      var k = 0
      while (k < m) { d += vec(k).toDouble * cv(k).toDouble; k += 1 }
      val nn = math.sqrt(nsq) * math.sqrt(b.norms(c))
      val csim = if (nn == 0.0) 0.0 else d / nn
      // strict > over a list_id-ascending scan = (csim desc, list_id
      // asc); Double.compare = the SQL total order (NaN greatest), so
      // NaN csims rank first with list_id tiebreak like the window did
      if (java.lang.Double.compare(csim, topSim(p - 1)) > 0) {
        var j = p - 1
        while (j > 0 && java.lang.Double.compare(csim, topSim(j - 1)) > 0) {
          topSim(j) = topSim(j - 1); topIdx(j) = topIdx(j - 1); j -= 1
        }
        topSim(j) = csim; topIdx(j) = c
      }
      c += 1
    }
    new GenericArrayData(topIdx.takeWhile(_ >= 0).map(b.listIds(_)))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-subspace PQ squared distances (the IVF-PQ ADC lookup-table /
  * encode kernel — r19): for residual `child` (array<double>, length
  * m·sub) and codebook `cb` (m × k × sub doubles, an expression
  * CONSTANT like [[NearestCentroidLists]]' bank), emits the m×k array
  * of Σ_d (res[j·sub+d] − cb[j][i][d])², accumulated in d-ascending
  * order — the identical operation sequence as the
  * zip_with+aggregate HOF form it replaces (the HOFs evaluate
  * interpreted per (row, j, i): 512 k lambda evals at sf0.1 made the
  * LUT projection the hot stage of sim_ann_ivfpq; this is one
  * primitive-loop eval per row) and as the oracle's
  * list_reduce(list_transform(list_zip(…))) left fold.
  */
case class PqSubspaceDists(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(cb.nonEmpty && cb.head.nonEmpty, "codebook must be non-empty")
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val res = v.asInstanceOf[ArrayData].toDoubleArray()
    val m = cb.length
    val sub = cb(0)(0).length
    val out = new Array[ArrayData](m)
    var j = 0
    while (j < m) {
      val kN = cb(j).length
      val dists = new Array[Double](kN)
      var i = 0
      while (i < kN) {
        val c = cb(j)(i)
        var acc = 0.0
        var d = 0
        while (d < sub) {
          val diff = res(j * sub + d) - c(d)
          acc += diff * diff
          d += 1
        }
        dists(i) = acc
        i += 1
      }
      out(j) = new GenericArrayData(dists)
      j += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** PQ code assignment from a residual (the encode half of the ADC
  * kernel): per subspace j, the 1-BASED index of the codebook entry
  * with the smallest squared distance — strict `<` over an
  * i-ascending scan keeps the EARLIEST entry on exact ties, the same
  * election as sim_quantize_pq's fold and the oracle's
  * ROW_NUMBER() OVER (ORDER BY dist ASC, cidx ASC) = 1. NaN distances
  * (a NaN component in the embedding makes EVERY entry's distance in
  * that subspace NaN) lose to any finite distance and an all-NaN
  * subspace elects entry 1 — `java.lang.Double.compare` order, which
  * is exactly the oracle's NULLS/NaN-LAST sort with the cidx ASC tie;
  * a `<`-only election would emit the out-of-contract code 0 and crash
  * both ADC tiers on one NaN row (r19 advice).
  */
case class PqCodes(child: Expression, cb: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(cb.nonEmpty && cb.head.nonEmpty, "codebook must be non-empty")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val res = v.asInstanceOf[ArrayData].toDoubleArray()
    val m = cb.length
    val sub = cb(0)(0).length
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val kN = cb(j).length
      var best = Double.NaN
      var bestI = 1
      var i = 0
      while (i < kN) {
        val c = cb(j)(i)
        var acc = 0.0
        var d = 0
        while (d < sub) {
          val diff = res(j * sub + d) - c(d)
          acc += diff * diff
          d += 1
        }
        if (i == 0 || java.lang.Double.compare(acc, best) < 0) { best = acc; bestI = i + 1 }
        i += 1
      }
      codes(j) = bestI
      j += 1
    }
    new GenericArrayData(codes)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken's MOSS
  * algorithm): Karp-Rabin ROLLING hash over character k-grams, then the
  * minimum hash of every window of `w` consecutive k-gram hashes
  * (rightmost min on ties), deduplicated in order. Guarantees any
  * shared substring of length ≥ w+k-1 yields a shared fingerprint —
  * the standard plagiarism/near-dup document fingerprint.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  // reachable from the SQL surface (graft_winnow) with arbitrary
  // literals: negative k reads negative byte indices, w <= 0 overruns
  require(k > 0 && w > 0, s"winnow k ($k) and window w ($w) must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    // rolling Karp-Rabin: h_{i+1} = (h_i - b_i*B^(k-1)) * B + b_{i+k}
    val B = 0x100000001b3L
    var bk = 1L
    var j = 1
    while (j < k) { bk *= B; j += 1 }
    val hashes = new Array[Long](n)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    hashes(0) = Hash64.splitmix64(h)
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xffL) * bk) * B + (bytes(i + k - 1) & 0xffL)
      hashes(i) = Hash64.splitmix64(h)
      i += 1
    }
    if (n <= w) {
      var m = 0
      var mi = 0
      i = 0
      while (i < n) { if (i == 0 || java.lang.Long.compareUnsigned(hashes(i), hashes(mi)) <= 0) { mi = i }; i += 1 }
      m = mi
      return new GenericArrayData(Array(hashes(m)))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var last = -1
    i = 0
    while (i + w <= n) {
      var mi = i
      var j2 = i + 1
      while (j2 < i + w) {
        if (java.lang.Long.compareUnsigned(hashes(j2), hashes(mi)) <= 0) mi = j2
        j2 += 1
      }
      if (mi != last) { out += hashes(mi); last = mi }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Rolling k-TOKEN-gram hashes for exact substring dedup
  * ([[graft.operators.Dedup.substringDupSpans]]): element p is a
  * 64-bit hash of the k whitespace-tokens starting at token position p
  * (array length = numTokens − k + 1; empty below k tokens).
  *
  * ONE byte scan per document: tokens are maximal non-`\s` byte runs
  * ([[TextScan]]'s ASCII `\s` contract — multi-byte UTF-8 bytes are
  * all non-space, so boundaries equal the regex tokenizer's), each
  * token hashes as splitmix64(Karp-Rabin over its bytes), and gram
  * hashes ROLL over the token-hash sequence (g·B + tokenHash mod 2⁶⁴,
  * de-rolled at the left edge) with a final splitmix64 — no token
  * array, no gram-string materialization (the md5-of-joined-slice
  * formulation this replaced copied every token ~k times and hashed
  * ~150-byte strings: 10 s/pass at sf10 vs ~1 s for this scan, and it
  * was paid once per plan branch). Exact mod-2⁶⁴ wraparound arithmetic
  * by construction (Java semantics, no ANSI overflow), replayed
  * bit-for-bit by the DuckDB oracle via the winnow HUGEINT device —
  * ASCII corpus assumed there, same documented guard as the winnow
  * oracle.
  */
case class TokenGramHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 2, s"token gram width must be >= 2, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val B = 0x100000001b3L
    // token hashes, single pass
    val th = scala.collection.mutable.ArrayBuilder.make[Long]
    th.sizeHint(bytes.length / 6 + 1)
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && TextScan.isSpacePublic(bytes(i))) i += 1
      if (i < bytes.length) {
        var h = 0L
        while (i < bytes.length && !TextScan.isSpacePublic(bytes(i))) {
          h = h * B + (bytes(i) & 0xffL)
          i += 1
        }
        th += Hash64.splitmix64(h)
      }
    }
    val hs = th.result()
    val n = hs.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    var bk = 1L
    var j = 1
    while (j < k) { bk *= B; j += 1 }
    val out = new Array[Long](n)
    var g = 0L
    j = 0
    while (j < k) { g = g * B + hs(j); j += 1 }
    out(0) = Hash64.splitmix64(g)
    var p = 1
    while (p < n) {
      g = (g - hs(p - 1) * bk) * B + hs(p + k - 1)
      out(p) = Hash64.splitmix64(g)
      p += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Bit-pool hyperplane LSH buckets: ONE `poolBits`-bit hyperplane
  * sketch per vector (the expensive part — `poolBits` signed
  * projections against a precomputed ±1 matrix), then `tables` bucket
  * keys formed by sampling `bits` pool positions per table (cheap bit
  * selects). Output element t = (t << bits) | bucket — table id packed
  * into the high bits so one long is the whole join key.
  *
  * Why: independent per-table hyperplanes cost tables×bits projections
  * per row, which is what makes high-table-count LSH (the recall
  * requirement at low cosine thresholds) infeasible — at 4096 tables ×
  * 14 bits that is 57k projections/row vs the pool's 2048. Sharing the
  * pool correlates tables: two random `bits`-subsets of the pool share
  * ~bits²/poolBits positions (≈0.1 at the defaults), and the per-pair
  * agreement rate concentrates within ±1σ = sqrt(p(1-p)/poolBits) ≈
  * ±0.011 of its mean, so the independent-table miss bound holds to
  * within a small constant; the exactness gates (all-pairs oracle at
  * sf0.01, crafted-geometry specs) check the realized candidate sets.
  */
/** Shared machinery for the bit-pool hyperplane LSH family: the ±1
  * projection matrix, the packed pool sketch, and the per-table bit
  * subsets are all deterministic functions of (seed, poolBits, bits,
  * tables), so [[HyperplanePoolSketch]] + [[PoolBucketKeys]] staged over
  * a stored sketch column produce bit-identical bucket keys to the fused
  * [[HyperplanePoolBuckets]] — callers can pay the poolBits×dim
  * projections once and derive both bucket keys and Hamming prefilter
  * distances from the same sketch.
  */
private[graft] object HyperplanePool {
  def signsFor(seed: Long, poolBits: Int, dim: Int): Array[Float] = {
    val s = new Array[Float](poolBits * dim)
    var j = 0
    while (j < poolBits) {
      var i = 0
      while (i < dim) {
        val h = Hash64.splitmix64(seed ^ (j * 0x9e3779b97f4a7c15L) ^ (i * 0xc2b2ae3d27d4eb4fL))
        s(j * dim + i) = if ((h & 1L) == 0L) 1.0f else -1.0f
        i += 1
      }
      j += 1
    }
    s
  }

  /** Packed sign bits of the `poolBits` projections of one vector. */
  def sketchOf(arr: ArrayData, signs: Array[Float], poolBits: Int, dim: Int): Array[Long] = {
    // one primitive copy per row: the projection loop reads every
    // element poolBits times (2048·dim reads/row), and
    // ArrayData.getFloat is a virtual per-element call (r12 finding,
    // same as the IVF scan loop / NearestCentroidLists)
    val v = arr.toFloatArray()
    val pool = new Array[Long]((poolBits + 63) >> 6)
    // 4 BITS per pass over the vector (r14): each bit's projection is
    // a strictly SERIAL double fold (order unchanged — the sketch is
    // bit-identical by construction, no tolerance involved), but the
    // four folds are independent chains, so interleaving them hides
    // the ~4-cycle FMA latency the single-bit loop serialized on.
    val main = poolBits - (poolBits & 3)
    var j = 0
    while (j < main) {
      var p0 = 0.0; var p1 = 0.0; var p2 = 0.0; var p3 = 0.0
      val b0 = j * dim; val b1 = b0 + dim; val b2 = b1 + dim; val b3 = b2 + dim
      var i = 0
      while (i < dim) {
        val x = v(i).toDouble
        p0 += x * signs(b0 + i)
        p1 += x * signs(b1 + i)
        p2 += x * signs(b2 + i)
        p3 += x * signs(b3 + i)
        i += 1
      }
      if (p0 >= 0.0) pool(j >> 6) |= (1L << (j & 63))
      if (p1 >= 0.0) pool((j + 1) >> 6) |= (1L << ((j + 1) & 63))
      if (p2 >= 0.0) pool((j + 2) >> 6) |= (1L << ((j + 2) & 63))
      if (p3 >= 0.0) pool((j + 3) >> 6) |= (1L << ((j + 3) & 63))
      j += 4
    }
    while (j < poolBits) {
      var proj = 0.0
      var i = 0
      while (i < dim) { proj += v(i).toDouble * signs(j * dim + i); i += 1 }
      if (proj >= 0.0) pool(j >> 6) |= (1L << (j & 63))
      j += 1
    }
    pool
  }

  /** Per-table pool positions: deterministic from the seed. */
  def tableIdxFor(seed: Long, poolBits: Int, bits: Int, tables: Int): Array[Array[Int]] = {
    val rnd = new java.util.Random(seed ^ 0x5deece66d1ce4e5bL)
    Array.fill(tables) {
      val seen = new java.util.LinkedHashSet[Integer]()
      while (seen.size < bits) seen.add(rnd.nextInt(poolBits))
      val it = seen.iterator(); Array.fill(bits)(it.next().intValue())
    }
  }

  /** `tables` bucket keys from a packed pool sketch, table id in the
    * high bits so one long is the whole join key.
    */
  def bucketKeys(pool: Array[Long], tableIdx: Array[Array[Int]], bits: Int): Array[Long] = {
    val out = new Array[Long](tableIdx.length)
    var t = 0
    while (t < tableIdx.length) {
      val idx = tableIdx(t)
      var b = 0L
      var k = 0
      while (k < idx.length) {
        val p = idx(k)
        b |= ((pool(p >> 6) >>> (p & 63)) & 1L) << k
        k += 1
      }
      out(t) = (t.toLong << bits) | b
      t += 1
    }
    out
  }

  // construction-time validation shared by the bucket-key expressions,
  // which are reachable from the SQL surface with arbitrary literals:
  // bits > min(poolBits, 62) would spin the distinct-position sampling
  // loop forever, and a table id shifted past 63 - bits would corrupt
  // the (t << bits) | bucket key packing
  def validate(poolBits: Int, bits: Int, tables: Int): Unit = {
    require(poolBits > 0 && bits > 0 && tables > 0,
      s"poolBits ($poolBits), bits ($bits) and tables ($tables) must all be positive")
    require(bits <= math.min(poolBits, 62),
      s"bits ($bits) must be <= min(poolBits ($poolBits), 62)")
    require(tables.toLong <= (Long.MaxValue >>> bits),
      s"tables ($tables) << bits ($bits) would overflow the packed bucket key")
  }
}

case class HyperplanePoolBuckets(child: Expression, poolBits: Int, bits: Int,
    tables: Int, seed: Long) extends UnaryExpression with CodegenFallback {
  HyperplanePool.validate(poolBits, bits, tables)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val tableIdx: Array[Array[Int]] =
    HyperplanePool.tableIdxFor(seed, poolBits, bits, tables)
  // ±1 hyperplane matrix, materialized on first eval once the dimension
  // is known (poolBits × dim floats; 512 KB at the 2048×64 defaults)
  @transient private var signs: Array[Float] = _
  @transient private var signDim: Int = -1

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (signDim != n) { signs = HyperplanePool.signsFor(seed, poolBits, n); signDim = n }
    val pool = HyperplanePool.sketchOf(arr, signs, poolBits, n)
    new GenericArrayData(HyperplanePool.bucketKeys(pool, tableIdx, bits))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The packed `poolBits`-bit hyperplane sketch alone (array of
  * ⌈poolBits/64⌉ longs). Storing the sketch as a column lets one set of
  * projections serve BOTH bucket-key derivation ([[PoolBucketKeys]]) and
  * the Hamming-distance candidate prefilter ([[LongArrayHamming]]):
  * E[hamming/poolBits] = θ/π for a pair at angle θ, concentrated within
  * ±sqrt(p(1-p)/poolBits) ≈ ±0.011 at 2048 bits — separating a
  * threshold-angle pair from an orthogonal one by many σ, which is what
  * makes the prefilter safe to run before the exact cosine verify.
  */
case class HyperplanePoolSketch(child: Expression, poolBits: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(poolBits > 0, s"poolBits ($poolBits) must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private var signs: Array[Float] = _
  @transient private var signDim: Int = -1

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (signDim != n) { signs = HyperplanePool.signsFor(seed, poolBits, n); signDim = n }
    new GenericArrayData(HyperplanePool.sketchOf(arr, signs, poolBits, n))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Bucket keys derived from a STORED pool sketch (the cheap half of
  * [[HyperplanePoolBuckets]] — bit selects only, no projections).
  * Bit-identical to the fused expression at the same (seed, poolBits,
  * bits, tables).
  */
case class PoolBucketKeys(child: Expression, poolBits: Int, bits: Int,
    tables: Int, seed: Long) extends UnaryExpression with CodegenFallback {
  HyperplanePool.validate(poolBits, bits, tables)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val tableIdx: Array[Array[Int]] =
    HyperplanePool.tableIdxFor(seed, poolBits, bits, tables)

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val words = (poolBits + 63) >> 6
    require(arr.numElements() == words,
      s"pool sketch has ${arr.numElements()} words, expected $words for poolBits=$poolBits")
    val pool = new Array[Long](words)
    var i = 0
    while (i < words) { pool(i) = arr.getLong(i); i += 1 }
    new GenericArrayData(HyperplanePool.bucketKeys(pool, tableIdx, bits))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance between two packed bit arrays (XOR + popcount over
  * longs) — the candidate-pair prefilter for the embedding near-dup
  * path: one popcount loop per candidate instead of a dim-MAC dot.
  * Real `doGenCode` (not [[CodegenFallback]]) because this filter sits
  * on the UNDEDUPED candidate stream — ~t·2⁻ᵇ of all pairs — where a
  * fallback's per-row boxing would re-introduce the row-machinery cost
  * the prefilter exists to remove, and a fallback would also split the
  * bucket-join stage out of whole-stage codegen.
  */
case class LongArrayHamming(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  // mismatched widths FAIL instead of truncating to the shorter array:
  // sketches from different poolBits would silently compare a common
  // prefix, yielding an artificially small distance that slips through
  // a hammingCutoff computed for the wider pool — a wrong-join bug
  // masked as a plausible result. One branch per pair, negligible next
  // to the popcount loop.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"LongArrayHamming: mismatched sketch widths (${n} vs ${y.numElements()} words) " +
          "— both sides must be built with the same poolBits")
    var hd = 0
    var i = 0
    while (i < n) { hd += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
    hd
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val hd = ctx.freshName("hd")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "LongArrayHamming: mismatched sketch widths (" + $n + " vs " +
         |      $b.numElements() + " words) — both sides must be built with the same poolBits");
         |}
         |int $hd = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $hd += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $hd;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sequential (prorated) Hamming reject for packed bit-pool sketches:
  * the running popcount is checked against a per-word-boundary
  * checkpoint array instead of only the full-width cutoff. A
  * non-qualifying pair's running Hamming grows at its true
  * disagreement rate (~0.5/bit for uncorrelated vectors), so with
  * checkpoints prorated at the expected rate plus a 5σ margin it
  * crosses after ~4 of 32 words instead of scanning ~25 before the
  * single full-width 4σ cutoff can fire — a ~4× cut of the collision
  * popcount loop that dominates the adversarial embedding near-dup
  * tier (r12; the final checkpoint IS the 4σ full cutoff, so this
  * predicate is a strict subset of `hamming ≤ cutoff`).
  *
  * Recall accounting: a TRUE pair at cosine ≥ threshold trips any one
  * 5σ prefix checkpoint with probability ≤ ~3e-7; union over ≤32
  * checkpoints adds ≤ ~1e-5 per-pair miss on top of the final
  * cutoff's ~3e-5 — the same contract class (the operator scaladoc
  * carries the combined figure). Both the broadcast tier's in-loop
  * gate ([[HammingWithinCheckpoints.within]]) and the shuffle tier's
  * filter (this expression) use the SAME checkpoint array, so the
  * candidate sets of the two tiers stay exactly identical — tier
  * parity holds pre-verify, not just post-verify.
  *
  * Real `doGenCode` for the same reason as [[LongArrayHamming]]: the
  * filter sits on the candidate stream inside the bucket-join stage.
  */
case class HammingWithinCheckpoints(left: Expression, right: Expression,
    checkpoints: Array[Int]) extends BinaryExpression {
  require(checkpoints.nonEmpty, "checkpoints must be non-empty")
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n || checkpoints.length != n)
      throw new IllegalArgumentException(
        s"HammingWithinCheckpoints: widths (${n}, ${y.numElements()}, " +
          s"${checkpoints.length} checkpoints) must all match — sketches and " +
          "checkpoints must come from the same poolBits")
    var hd = 0
    var i = 0
    while (i < n) {
      hd += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      if (hd > checkpoints(i)) return false
      i += 1
    }
    true
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cps = ctx.addReferenceObj("checkpoints", checkpoints, "int[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val hd = ctx.freshName("hd")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n || $cps.length != $n) {
         |  throw new IllegalArgumentException(
         |    "HammingWithinCheckpoints: widths (" + $n + ", " + $b.numElements() +
         |      ", " + $cps.length + " checkpoints) must all match — sketches and " +
         |      "checkpoints must come from the same poolBits");
         |}
         |int $hd = 0;
         |${ev.value} = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  $hd += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  if ($hd > $cps[$i]) { ${ev.value} = false; break; }
         |}
       """.stripMargin
    })
  }
  // Array[Int] is reference-compared by case-class equality; compare by
  // content so plan canonicalization/semanticHash treat equal-checkpoint
  // filters as equal
  override def equals(o: Any): Boolean = o match {
    case h: HammingWithinCheckpoints =>
      left == h.left && right == h.right &&
        java.util.Arrays.equals(checkpoints, h.checkpoints)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * left.hashCode() + right.hashCode()) +
      java.util.Arrays.hashCode(checkpoints)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HammingWithinCheckpoints {
  /** The same gate as the expression, over plain arrays — shared by the
    * broadcast tier's bucket-local pairwise loop so both tiers reject
    * identically.
    */
  @inline final def within(x: Array[Long], y: Array[Long], cps: Array[Int]): Boolean = {
    var hd = 0
    var i = 0
    while (i < x.length) {
      hd += java.lang.Long.bitCount(x(i) ^ y(i))
      if (hd > cps(i)) return false
      i += 1
    }
    true
  }

  /** The identical gate over two `words`-long slices of one flat
    * sketch array (the [[EmbedIndexBank]] layout) — same per-word
    * checkpoints, same early exit, no per-member array allocation.
    */
  @inline final def withinFlat(sk: Array[Long], xo: Int, yo: Int,
      words: Int, cps: Array[Int]): Boolean = {
    var hd = 0
    var i = 0
    while (i < words) {
      hd += java.lang.Long.bitCount(sk(xo + i) ^ sk(yo + i))
      if (hd > cps(i)) return false
      i += 1
    }
    true
  }
}

/** Single-pass byte-scan replacements for the regex counters the text
  * family was built on (r13). The language-score regex —
  * `\b(?:w1|…|w8)\b` over the whole document — backtracks through the
  * 8-way alternation at every input position, and [[graft.functions
  * .TextAnalysis.langId]] pays it once per language; at sf10 the
  * quality/lang scans dominated four curation queries (cu_quality
  * _threshold isolated 19.2 s). Each counter below is one linear scan
  * over the UTF-8 BYTES.
  *
  * EQUIVALENCE CONTRACT (the DuckDB oracle keeps running the regex
  * forms, so these must count identically — pinned by
  * `TextCountParitySpec` against `regexp_count` on adversarial and
  * random inputs):
  *  - word chars are Java/RE2 ASCII `\w` = [A-Za-z0-9_]; every
  *    non-ASCII byte (0x80+) is a non-word char in BOTH engines
  *    (neither runs in Unicode-classes mode), so byte-scanning is
  *    exact: a `\b(?:w)\b` match is precisely a MAXIMAL word-char run
  *    equal to a dictionary word (boundaries exist only at run edges,
  *    and an equal-length prefix/suffix match inside a longer run
  *    fails its closing `\b`).
  *  - `\s` is the ASCII six [ \t\n\x0B\f\r]; multi-byte chars are
  *    non-space, so `\S+` runs are byte-run-countable.
  *  - char-class COUNTS count CHARACTERS, so multi-byte chars count
  *    once: only UTF-8 lead bytes ((b & 0xC0) != 0x80) are counted in
  *    the non-ASCII branch.
  */
object TextScan {
  @inline private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'
  @inline private def isSpaceByte(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
  // the same `\s` contract for expressions outside this object
  // ([[TermFrequencies]])
  @inline private[plans] def isSpacePublic(b: Byte): Boolean = isSpaceByte(b)
  @inline private def isLeadByte(b: Byte): Boolean = (b & 0xC0) != 0x80

  /** Dictionary words grouped by byte length for allocation-free
    * whole-token compares (words are lowercase ASCII by construction —
    * [[graft.functions.TextAnalysis.stopwords]]).
    */
  final class Dict(val words: Seq[String]) extends Serializable {
    require(words.nonEmpty && words.forall(_.matches("[a-z0-9_]+")),
      s"dictionary words must be nonempty ASCII word-char strings: $words")
    val maxLen: Int = words.map(_.length).max
    val byLen: Array[Array[Array[Byte]]] = {
      val a = new Array[Array[Array[Byte]]](maxLen + 1)
      words.groupBy(_.length).foreach { case (l, ws) =>
        a(l) = ws.map(_.getBytes("UTF-8")).toArray
      }
      a
    }
    override def equals(o: Any): Boolean = o match {
      case d: Dict => words == d.words
      case _ => false
    }
    override def hashCode(): Int = words.hashCode()
  }

  /** ≡ `regexp_count(s, "\\b(?:" + words.mkString("|") + ")\\b")`. */
  def stopwordCount(s: UTF8String, d: Dict): Long = {
    val b = s.getBytes
    val n = b.length
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (isWordByte(b(i))) {
        val start = i
        i += 1
        while (i < n && isWordByte(b(i))) i += 1
        val len = i - start
        if (len <= d.maxLen) {
          val bucket = d.byLen(len)
          if (bucket != null) {
            var j = 0
            while (j < bucket.length) {
              val w = bucket(j)
              var k = 0
              while (k < len && w(k) == b(start + k)) k += 1
              if (k == len) { cnt += 1; j = bucket.length } else j += 1
            }
          }
        }
      } else i += 1
    }
    cnt
  }

  /** ≡ `regexp_count(s, "\\S+")`. */
  def tokenCount(s: UTF8String): Long = {
    val b = s.getBytes
    val n = b.length
    var cnt = 0L
    var i = 0
    while (i < n) {
      if (!isSpaceByte(b(i))) {
        cnt += 1
        while (i < n && !isSpaceByte(b(i))) i += 1
      } else i += 1
    }
    cnt
  }

  /** ≡ `regexp_count(s, "[^A-Za-z0-9\\s]")` (note: '_' and every
    * non-ASCII character are in the class; characters, not bytes).
    */
  def punctCount(s: UTF8String): Long = {
    val b = s.getBytes
    var cnt = 0L
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if (c < 0) { if (isLeadByte(c)) cnt += 1 }
      else if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || isSpaceByte(c))) cnt += 1
      i += 1
    }
    cnt
  }

  /** ≡ `regexp_count(s, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")`: a maximal
    * letter run counts once; every digit char once; every other
    * non-space char (incl. '_' and each non-ASCII character) once.
    */
  def subwordCount(s: UTF8String): Long = {
    val b = s.getBytes
    val n = b.length
    var cnt = 0L
    var i = 0
    while (i < n) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) {
        cnt += 1
        i += 1
        while (i < n && ((b(i) >= 'a' && b(i) <= 'z') || (b(i) >= 'A' && b(i) <= 'Z'))) i += 1
      } else {
        if (c < 0) { if (isLeadByte(c)) cnt += 1 }
        else if (c >= '0' && c <= '9') cnt += 1 // each digit char
        else if (!isSpaceByte(c)) cnt += 1 // punct class, incl '_'
        i += 1
      }
    }
    cnt
  }

  /** ≡ `regexp_count(s, "[A-Z]")`. */
  def upperCount(s: UTF8String): Long = {
    val b = s.getBytes
    var cnt = 0L
    var i = 0
    while (i < b.length) { if (b(i) >= 'A' && b(i) <= 'Z') cnt += 1; i += 1 }
    cnt
  }
}

/** Whole-word dictionary-hit count (≡ the `\b(?:…)\b` alternation
  * regex — see [[TextScan]] for the equivalence argument). Count is
  * over the input AS GIVEN: callers lowercase first, exactly like the
  * regex form they replace.
  */
case class StopwordCount(child: Expression, dict: TextScan.Dict)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftStringInput {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    TextScan.stopwordCount(v.asInstanceOf[UTF8String], dict)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** One of the fixed [[TextScan]] char-class counters, selected by
  * `kind` ("token" | "punct" | "subword" | "upper") — a plain string so
  * plan canonicalization/equality stay structural.
  */
case class TextCount(child: Expression, kind: String)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftStringInput {
  require(TextCount.Kinds.contains(kind), s"unknown TextCount kind: $kind")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    kind match {
      case "token" => TextScan.tokenCount(s)
      case "punct" => TextScan.punctCount(s)
      case "subword" => TextScan.subwordCount(s)
      case "upper" => TextScan.upperCount(s)
      // unreachable while Kinds and this match agree — fail loudly if a
      // new kind is added to one and not the other, never miscount
      case other => throw new IllegalStateException(s"unhandled TextCount kind: $other")
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TextCount { val Kinds = Set("token", "punct", "subword", "upper") }

/** Per-document term frequencies in ONE pass: `array<struct<term
  * string, c bigint>>`, terms distinct and byte-sorted. Term boundaries
  * are the `\S+` contract of [[TextScan]] (ASCII-six whitespace;
  * multi-byte chars are non-space, so byte runs ≡ the regex's
  * character runs), and UTF-8 byte equality ≡ string equality — so
  * `explode(termFrequencies(text))` is row-for-row the
  * `explode(regexp_extract_all(text, "\\S+")) → groupBy(doc, term) →
  * count` pipeline, with the per-(doc, term) aggregation done map-side
  * inside the expression instead of through a corpus-sized string
  * exchange + hash aggregate (the r15 tx_tfidf lever: the 10⁷-row
  * (doc, term) exchange and TWO of the query's three groupBys never
  * exist; the per-doc total is a free `aggregate()` fold over the
  * array). Parity is spec-pinned against the regex+groupBy form on
  * adversarial inputs (TextCountParitySpec).
  */
case class TermFrequencies(child: Expression)
    extends UnaryExpression with CodegenFallback
    with org.apache.spark.sql.GraftStringInput {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val b = s.getBytes
    val n = b.length
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      if (!TextScan.isSpacePublic(b(i))) {
        val start = i
        i += 1
        while (i < n && !TextScan.isSpacePublic(b(i))) i += 1
        val term = UTF8String.fromBytes(b, start, i - start)
        val prev = counts.get(term)
        if (prev == null) counts.put(term, Array(1L)) else prev(0) += 1L
      } else i += 1
    }
    val terms = new Array[UTF8String](counts.size())
    val it = counts.keySet().iterator()
    var k = 0
    while (it.hasNext) { terms(k) = it.next(); k += 1 }
    // byte-order sort: deterministic output independent of hash layout
    java.util.Arrays.sort(terms, (a: UTF8String, c: UTF8String) => a.compareTo(c))
    val rows = new Array[Any](terms.length)
    k = 0
    while (k < terms.length) {
      rows(k) = org.apache.spark.sql.catalyst.InternalRow(
        terms(k), counts.get(terms(k))(0))
      k += 1
    }
    new GenericArrayData(rows)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** All `bands` LSH band hashes of a minhash signature in ONE pass —
  * bit-identical to the declarative banding SPEC the batch operators
  * keep for oracle replay:
  * `xxhash64(concat_ws("_", transform(slice(sig, b·rpb+1, rpb),
  * cast string)))` — same decimal rendering (`Long.toString` ≡ Spark's
  * long→string cast), same '_' joins, same xxhash64 seed (42). The
  * string-expression form allocates per-element UTF8Strings and an
  * array per band per row; this builds each band's exact byte string
  * in one reused builder and hashes it directly (r14, the streaming
  * near-dup banding stage — measured at ~half the stream's per-doc
  * cost). Equality is spec-pinned (`StreamNearDupSpec` banding parity).
  */
case class MinhashBandHashes(child: Expression, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(bands > 0, "bands must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any = {
    val sig = v.asInstanceOf[ArrayData].toLongArray()
    val rpb = sig.length / bands
    val out = new Array[Long](bands)
    val sb = new java.lang.StringBuilder(rpb * 21)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var i = 0
      while (i < rpb) {
        if (i > 0) sb.append('_')
        sb.append(sig(b * rpb + i))
        i += 1
      }
      out(b) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
        UTF8String.fromString(sb.toString), 42L)
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column-API wrappers. */
object GraftFunctions {
  /** The one LSH/sketch seed every hash-family default shares. Hoisted
    * (r15 advice) so scan-tier bank builds that REPLAY a pipeline's
    * hashing (e.g. [[graft.plans.EmbedIndexBank]] vs [[poolBucketKeys]])
    * reference the same named constant instead of a re-typed literal —
    * a seed change can no longer desync the tiers silently.
    */
  val DefaultSeed = 42L

  private def e(c: Column): Expression = GraftSqlShim.expression(c)
  private def col(x: Expression): Column = GraftSqlShim.column(x)

  def dotFF(a: Column, b: Column): Column = col(DotProductFF(e(a), e(b)))
  def minhashSig(shingles: Column, numHashes: Int, seed: Long = DefaultSeed): Column =
    col(MinHashSig(e(shingles), numHashes, seed))
  def simhash64(tokens: Column, seed: Long = DefaultSeed): Column = col(SimHash64(e(tokens), seed))
  def hyperplaneSig(vec: Column, nBits: Int, seed: Long = DefaultSeed): Column =
    col(HyperplaneSig(e(vec), nBits, seed))
  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    col(Winnow(e(text), k, w))
  def tokenGramHashes(text: Column, k: Int): Column =
    col(TokenGramHashes(e(text), k))
  def hashedShingleSet(shingles: Column, seed: Long = DefaultSeed): Column =
    col(HashedShingleSet(e(shingles), seed))
  def hashedCharShingles(text: Column, n: Int, stride: Int = 1,
      seed: Long = DefaultSeed): Column =
    col(HashedCharShingles(e(text), n, stride, seed))
  def sortedJaccard(a: Column, b: Column): Column = col(SortedLongJaccard(e(a), e(b)))
  def hyperplanePoolBuckets(vec: Column, poolBits: Int, bits: Int,
      tables: Int, seed: Long = DefaultSeed): Column =
    col(HyperplanePoolBuckets(e(vec), poolBits, bits, tables, seed))
  def hyperplanePoolSketch(vec: Column, poolBits: Int, seed: Long = DefaultSeed): Column =
    col(HyperplanePoolSketch(e(vec), poolBits, seed))
  def poolBucketKeys(sketch: Column, poolBits: Int, bits: Int,
      tables: Int, seed: Long = DefaultSeed): Column =
    col(PoolBucketKeys(e(sketch), poolBits, bits, tables, seed))
  def arrayHamming(a: Column, b: Column): Column =
    col(LongArrayHamming(e(a), e(b)))
  def termFrequencies(text: Column): Column = col(TermFrequencies(e(text)))
  def minhashSigL(hashedSet: Column, numHashes: Int): Column =
    col(MinHashSigL(e(hashedSet), numHashes))
  def minhashBandHashes(sig: Column, bands: Int): Column =
    col(MinhashBandHashes(e(sig), bands))
  def minhashBits256(hashedSet: Column): Column =
    col(MinhashBits256(e(hashedSet)))
  def nearestCentroidLists(vec: Column,
      bank: org.apache.spark.broadcast.Broadcast[CentroidBank],
      probe: Int): Column =
    col(NearestCentroidLists(e(vec), bank, probe))
  def topKNeighbors(score: Column, id: Column, k: Int): Column =
    col(TopKNeighbors(e(score), e(id), k).toAggregateExpression())
  def pqSubspaceDists(res: Column, cb: Array[Array[Array[Double]]]): Column =
    col(PqSubspaceDists(e(res), cb))
  def pqCodes(res: Column, cb: Array[Array[Array[Double]]]): Column =
    col(PqCodes(e(res), cb))
  def hammingWithinCheckpoints(a: Column, b: Column, cps: Array[Int]): Column =
    col(HammingWithinCheckpoints(e(a), e(b), cps))
  def stopwordCount(text: Column, words: Seq[String]): Column =
    col(StopwordCount(e(text), new TextScan.Dict(words)))
  def textCount(text: Column, kind: String): Column =
    col(TextCount(e(text), kind))
}
