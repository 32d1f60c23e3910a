package graft.functions

import graft.plans.GraftFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns. Dot products run
  * through the custom `DotProductFF` Catalyst expression — a tight
  * per-row loop folding sequentially in double precision, the same
  * left-to-right order an external oracle (DuckDB `list_reduce`) uses,
  * so results hash-match across engines; ~50× faster than the
  * `aggregate`/`zip_with` higher-order-function formulation at
  * millions of pairs.
  */
object VectorFunctions {

  /** Sequential left-fold dot product of two float arrays, in double. */
  def dot(a: Column, b: Column): Column = GraftFunctions.dotFF(a, b)

  /** Squared L2 norm (sequential fold, double). */
  def normSq(a: Column): Column = GraftFunctions.dotFF(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0 for zero-norm vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** Cosine from a precomputed pair dot and squared norms — lets plans
    * compute each vector's norm once instead of once per pair (the
    * norms join beats re-folding 2× per pair at O(n²) pair counts).
    */
  def cosineFromParts(d: Column, normSqA: Column, normSqB: Column): Column = {
    val nn = sqrt(normSqA) * sqrt(normSqB)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** Random-hyperplane LSH signature: `nBits` sign bits packed into a
    * long (custom expression, one pass per row). Bucket collisions
    * concentrate cosine-similar vectors.
    */
  def hyperplaneSignature(vec: Column, nBits: Int, seed: Long = 42L): Column =
    GraftFunctions.hyperplaneSig(vec, nBits, seed)
}
