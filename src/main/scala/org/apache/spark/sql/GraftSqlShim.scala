package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * supported pattern for libraries that define custom Catalyst
  * expressions against Spark 4's unified Column API.
  */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a temp SQL function on a live session (the extensions
    * path covers new sessions; this covers getOrCreate'd ones).
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
    // top-level match would silently no-op on it
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
