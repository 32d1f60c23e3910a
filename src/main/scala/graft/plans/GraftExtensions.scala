package graft.plans

import org.apache.spark.sql.{GraftSqlShim, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL-surface registration of the custom expressions, two ways:
  *
  *  - `GraftExtensions` for cluster deployment:
  *    `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *  - `registerAll(spark)` for an existing session (tests, Verify).
  *
  * After registration the functions are callable from `spark.sql`:
  * {{{
  *   SELECT graft_dot(a.embedding, b.embedding)          -- double
  *   SELECT graft_minhash(shingles, 32, 42)              -- array<bigint>
  *   SELECT graft_simhash(tokens, 42)                    -- bigint
  *   SELECT graft_hyperplane_sig(embedding, 8, 42)       -- bigint
  *   SELECT graft_lsh_buckets(embedding, 2048, 12, 64)   -- array<bigint>
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            "graft.plans.GraftExtensions", name),
          builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }
  private def longLit(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be a long literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (es => DotProductFF(es(0), es(1))),
    "graft_minhash" -> (es =>
      MinHashSig(es(0), intLit(es(1), "numHashes"),
        if (es.size > 2) longLit(es(2), "seed") else 42L)),
    "graft_simhash" -> (es =>
      SimHash64(es(0), if (es.size > 1) longLit(es(1), "seed") else 42L)),
    "graft_hyperplane_sig" -> (es =>
      HyperplaneSig(es(0), intLit(es(1), "nBits"),
        if (es.size > 2) longLit(es(2), "seed") else 42L)),
    "graft_lsh_buckets" -> (es =>
      HyperplanePoolBuckets(es(0), intLit(es(1), "poolBits"),
        intLit(es(2), "bits"), intLit(es(3), "tables"),
        if (es.size > 4) longLit(es(4), "seed") else 42L)),
    "graft_shingle_hashes" -> (es =>
      HashedCharShingles(es(0), intLit(es(1), "n"),
        if (es.size > 2) intLit(es(2), "stride") else 1,
        if (es.size > 3) longLit(es(3), "seed") else 42L)),
    "graft_winnow" -> (es =>
      Winnow(es(0), intLit(es(1), "k"), intLit(es(2), "w"))))

  /** Register into an already-running session. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      GraftSqlShim.registerFunction(spark, name, builder)
    }
}
