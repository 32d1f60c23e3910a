package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** The library's ONLY file inside Spark's package namespace, kept to
  * the minimum set of `private[sql]` touch points that Spark 4's
  * public API cannot replace. Each member below documents why the
  * public surface is insufficient; if a public equivalent appears in
  * a later Spark, delete the member (and eventually this file).
  */
/** Analysis-time "this expression takes one string column" contract
  * for graft text expressions (TextCount, StopwordCount): resolves the
  * implicit cast / fails at analysis like the `regexp_count` forms they
  * replaced, instead of a per-row ClassCastException. Lives here
  * because `AbstractDataType` (the `inputTypes` element type) is
  * `private[sql]` — a graft-package expression cannot name it.
  */
trait GraftStringInput
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)
}

object GraftSqlShim {
  // Spark 4 made Column expression-agnostic (SPARK-46144: Column wraps
  // a ColumnNode, not an Expression) and moved the converters to
  // `private[sql] classic.ExpressionUtils`. A library defining custom
  // Catalyst expressions (GraftExpressions: Winnow, HyperplanePoolSketch,
  // …) has NO public way to wrap one into a Column or to extract the
  // Expression a Column resolves to — `expr("...")` only covers
  // registered SQL functions and `Column(String)` only named columns.
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a temp SQL function on a live session (the extensions
    * path covers new sessions; this covers getOrCreate'd ones).
    * `sessionState` (and the FunctionRegistry behind it) is
    * `private[sql]`: the public alternatives register UDFs
    * (`spark.udf.register`, black-box to codegen) or require a restart
    * (`SparkSessionExtensions.injectFunction` applies only to sessions
    * built AFTER the extension is installed). Registering a raw
    * `Seq[Expression] => Expression` builder keeps the functions
    * codegen-native for SQL-text callers on an already-live session.
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** Release the block-manager storage behind a `localCheckpoint`ed
    * Dataset. `Dataset.unpersist()` only clears the SQL cache — a
    * checkpointed frame's data lives in the RDD storage of the
    * underlying `LogicalRDD`, which otherwise waits for the
    * ContextCleaner to notice the RDD is unreferenced. Long-lived
    * library sessions that checkpoint per call (iterative connected
    * components, shared label frames) release deterministically through
    * this instead. No-op on non-checkpointed frames.
    */
  def releaseCheckpoint(df: Dataset[_]): Unit = releaseCheckpoint(df, Set.empty)

  /** Scoped variant: skips checkpoints whose RDD id is in `exclude` —
    * for releasing a frame COMPOSED over a shared memoized checkpoint
    * (e.g. a dedup-family result built on the cluster-label stage)
    * without poisoning the shared stage for later consumers.
    */
  def releaseCheckpoint(df: Dataset[_], exclude: Set[Int]): Unit =
    // traversal, not a top-level match: a renamed/projected view of a
    // checkpointed frame analyzes to Project(LogicalRDD) and a
    // top-level match would silently no-op on it.
    // `queryExecution` and `execution.LogicalRDD` are private[sql]:
    // the public API exposes neither the analyzed plan nor the RDD a
    // localCheckpoint materialized, so deterministic storage release
    // (vs waiting on the ContextCleaner) has no public route.
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        if (!exclude.contains(l.rdd.id)) l.rdd.unpersist(false)
      case _ => ()
    }

  /** RDD ids of every checkpoint-backed node in the frame's plan — the
    * identity set for [[releaseCheckpoint]]'s scoped variant.
    */
  def checkpointRddIds(df: Dataset[_]): Set[Int] = {
    val b = Set.newBuilder[Int]
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => b += l.rdd.id
      case _ => ()
    }
    b.result()
  }
}
