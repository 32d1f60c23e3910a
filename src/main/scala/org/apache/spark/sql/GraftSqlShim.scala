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
  def releaseCheckpoint(df: Dataset[_]): Unit =
    // collect, not a top-level match: a renamed/projected view of a
    // checkpointed frame analyzes to Project(LogicalRDD) and a
    // top-level match would silently no-op on it
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
