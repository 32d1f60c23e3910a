package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.plans.MinhashBits256

/** Statistical gate for the [[graft.plans.MinhashBits256]] sketch
  * family (r11 advice): the ~3e-5 reject-miss contract was previously
  * gated by 3 crafted pairs with a 0.06 tolerance, so an affine-family
  * bias beyond the stated contract would have passed silently. Here the
  * estimator is pinned over thousands of RANDOM set pairs per
  * (J, set-size) regime — deterministic seed, so the gate is exact-
  * reproducible, not flaky — asserting
  *  (a) the per-bit match probability is (1+J)/2 within a 5σ mean gate
  *      (detects min-wise-independence bias down to ~0.25% per bit),
  *  (b) the match-count variance is binomial — inter-bit correlation
  *      is what would silently inflate the 4σ tail, and
  *  (c) the OPERATOR'S OWN reject (the skCutoff formula of
  *      `Dedup.simhashNearDupPairs`, Dedup.scala — m ≥ 256·(p − 4σ)
  *      via sketch Hamming ≤ skCutoff) misses true pairs at τ = J
  *      (the worst case the contract covers) at a rate inside the
  *      ~3e-5 class across every regime combined.
  *
  * The expression is evaluated directly (no Spark session): ~72k
  * sketches over sets of 16/64/256 hashed shingles run in seconds
  * driver-side, which is what makes a statistically powered gate
  * affordable in the suite.
  */
class SketchStatSpec extends AnyFunSuite {

  private val expr = MinhashBits256(
    BoundReference(0, ArrayType(LongType, containsNull = false), nullable = false))

  private def sketch(xs: Array[Long]): Array[Long] =
    expr.eval(InternalRow(ArrayData.toArrayData(xs)))
      .asInstanceOf[ArrayData].toLongArray()

  private def matchingBits(a: Array[Long], b: Array[Long]): Int = {
    var m = 256
    var i = 0
    while (i < 4) { m -= java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    m
  }

  test("per-bit probability, binomial variance, and 4-sigma reject-miss rate " +
      "hold across J regimes and set sizes") {
    val rng = new java.util.Random(0x5eed5eedL)
    val sizes = Seq(16, 64, 256)
    val jTargets = Seq(0.3, 0.5, 0.7, 0.9)
    val pairsPerRegime = 3000
    var totalPairs = 0
    var totalMisses = 0
    for (s <- sizes; jt <- jTargets) {
      // shared-element construction: |A|=|B|=s sharing exactly c
      // elements makes J = c/(2s−c) EXACT for every pair in the regime
      // (random 64-bit elements: collision probability negligible)
      val c = math.round(2.0 * s * jt / (1.0 + jt)).toInt
      val j = c.toDouble / (2 * s - c)
      val p = (1.0 + j) / 2.0
      // the operator's reject at threshold τ = this regime's exact J —
      // the boundary pair the miss contract is stated for
      val mCut = p - 4.0 * math.sqrt(p * (1.0 - p) / 256.0)
      val skCutoff = math.min(256, math.ceil(256.0 * (1.0 - mCut)).toInt)
      var sum = 0.0
      var sumSq = 0.0
      var misses = 0
      var i = 0
      while (i < pairsPerRegime) {
        val shared = Array.fill(c)(rng.nextLong())
        val a = shared ++ Array.fill(s - c)(rng.nextLong())
        val b = shared ++ Array.fill(s - c)(rng.nextLong())
        val m = matchingBits(sketch(a), sketch(b))
        sum += m
        sumSq += m.toDouble * m
        if (256 - m > skCutoff) misses += 1
        i += 1
      }
      totalPairs += pairsPerRegime
      totalMisses += misses
      val mean = sum / pairsPerRegime
      val expMean = 256.0 * p
      val binomVar = 256.0 * p * (1.0 - p)
      // mean gate: 5σ of the mean estimator — a per-bit bias of ~0.25%
      // (the kind an insufficiently min-wise affine family introduces)
      // lands outside this window
      val meanTol = 5.0 * math.sqrt(binomVar / pairsPerRegime)
      assert(math.abs(mean - expMean) <= meanTol,
        s"regime s=$s J=$j: mean match count $mean vs expected $expMean ± $meanTol")
      // variance gate: positive inter-bit correlation inflates this and
      // with it the real 4σ tail; sampling error of the sample variance
      // at n=3000 is ~2.6%, so the window is generous but decisive
      val svar = (sumSq - sum * sum / pairsPerRegime) / (pairsPerRegime - 1)
      assert(svar >= binomVar * 0.65 && svar <= binomVar * 1.35,
        s"regime s=$s J=$j: match-count variance $svar vs binomial $binomVar")
    }
    // tail gate: at the contract's ~3e-5 the expectation over these
    // 36k worst-case pairs is ~1.1 misses; 8 rejects a family whose
    // miss rate left the contract's probability class (and the fixed
    // seed makes this a deterministic check, not a flaky one)
    assert(totalMisses <= 8,
      s"$totalMisses reject misses over $totalPairs boundary pairs — " +
        "outside the ~3e-5 contract class")
  }
}
