package graft

import graft.operators.Validation
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graded entries for the reference's documented-but-unimplemented
  * checks 1/5/10 (reference: tests/README.md:19-27): schema shape,
  * recent activity flow, CDC coverage.
  */
object QueriesChecks {
  import Queries.Q

  /** Spark type → the neutral vocabulary both engines' introspection is
    * graded in (DuckDB's information_schema names mapped by the oracle's
    * CASE to the same words).
    */
  private def neutralType(dt: DataType): String = dt match {
    case LongType => "bigint"
    case IntegerType => "int"
    case ShortType => "smallint"
    case StringType => "string"
    case DoubleType => "double"
    case FloatType => "float"
    case BooleanType => "boolean"
    case DateType => "date"
    case _: TimestampType | _: TimestampNTZType => "timestamp"
    case other => other.simpleString
  }

  /** Check 1 graded as introspection parity: both engines independently
    * describe the same parquet table (S5 schema introspection); a match
    * requires correct name, ordinal, and a correct type mapping. The
    * source-vs-sink StructType DIFF form of check 1 is exercised in
    * `ValidationSpec` (it needs a mutated sink, which SQL can't build
    * from the same views).
    */
  val c1SchemaShape: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d).schema.fields.zipWithIndex.toSeq
      .map { case (f, i) => (f.name, i + 1, neutralType(f.dataType)) }
      .toDF("column_name", "ordinal", "data_type")
      .orderBy("ordinal")
  }
  val c1Sql =
    """SELECT column_name, CAST(ordinal_position AS INT) AS ordinal,
      |  CASE data_type
      |    WHEN 'BIGINT' THEN 'bigint' WHEN 'INTEGER' THEN 'int'
      |    WHEN 'SMALLINT' THEN 'smallint' WHEN 'VARCHAR' THEN 'string'
      |    WHEN 'DOUBLE' THEN 'double' WHEN 'FLOAT' THEN 'float'
      |    WHEN 'BOOLEAN' THEN 'boolean' WHEN 'DATE' THEN 'date'
      |    WHEN 'TIMESTAMP' THEN 'timestamp'
      |    ELSE lower(data_type) END AS data_type
      |FROM information_schema.columns WHERE table_name = 'orders'
      |ORDER BY ordinal""".stripMargin

  /** Check 5: recent activity flow on the events stream, with a
    * deterministic stalled sink (everything newer than anchor−30min
    * dropped — a CDC pipeline that died half an hour ago). Anchor is the
    * source max(ts), not wall clock, so the check replays identically.
    */
  val RecentWindowMinutes = 60
  val StallMinutes = 30
  val c5RecentActivity: Q = (s, d) => {
    val src = Tables.events(s, d)
    val anchor = src.agg(max(col("ts")).as("__mx"))
    val sink = src.crossJoin(broadcast(anchor))
      .filter(col("ts") <= col("__mx") - expr(s"INTERVAL $StallMinutes MINUTES"))
      .drop("__mx")
    val r = Validation.recentActivity(src, sink, "ts", RecentWindowMinutes)
    import s.implicits._
    Seq((RecentWindowMinutes, r.details("source_recent").toLong,
      r.details("sink_recent").toLong, r.status))
      .toDF("window_minutes", "source_recent", "sink_recent", "status")
  }
  val c5Sql =
    s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events),
       |a AS (SELECT max(ts) AS mx FROM e),
       |s AS (SELECT count(*) AS n FROM e, a
       |  WHERE ts > mx - INTERVAL $RecentWindowMinutes MINUTE),
       |k AS (SELECT count(*) AS n FROM e, a
       |  WHERE ts <= mx - INTERVAL $StallMinutes MINUTE
       |    AND ts > mx - INTERVAL $RecentWindowMinutes MINUTE)
       |SELECT CAST($RecentWindowMinutes AS INT) AS window_minutes,
       |  CAST(s.n AS BIGINT) AS source_recent, CAST(k.n AS BIGINT) AS sink_recent,
       |  CASE WHEN s.n > 0 AND k.n = 0 THEN 'FAIL'
       |       WHEN k.n < s.n THEN 'WARN' ELSE 'PASS' END AS status
       |FROM s, k""".stripMargin

  /** Check 6: delete semantics — a sink holding rows whose PK was
    * deleted upstream (here: every 100th key "deleted" from the source;
    * the full table plays the stale sink). Ghosts are the reversed J1
    * anti-join.
    */
  val c6DeleteSemantics: Q = (s, d) => {
    val sink = Tables.orders(s, d)
    val source = sink.filter(col("o_orderkey") % 100 =!= 0)
    val ghosts = Validation.ghostRows(sink, source, Seq("o_orderkey"))
    ghosts.agg(count(lit(1)).cast("long").as("ghost_rows"))
      .select(col("ghost_rows"),
        when(col("ghost_rows") === 0, "PASS").otherwise("FAIL").as("status"))
  }
  val c6Sql =
    """SELECT CAST(count(*) AS BIGINT) AS ghost_rows,
      |  CASE WHEN count(*) = 0 THEN 'PASS' ELSE 'FAIL' END AS status
      |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin

  /** Check 8: sample row content — deterministic md5-keyed sample of
    * source rows compared column-by-column against a sink with a planted
    * corruption (status overwritten on every 37th key).
    */
  val c8SampleContent: Q = (s, d) => {
    val src = Tables.orders(s, d)
    val sink = src.withColumn("o_orderstatus",
      when(col("o_orderkey") % 37 === 0, lit("X")).otherwise(col("o_orderstatus")))
    Validation.sampleContent(src, sink, Seq("o_orderkey"), sampleSize = 500)
  }
  val c8Sql =
    """WITH sink AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 37 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      |    o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders),
      |samp AS (
      |  SELECT * FROM orders
      |  ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey LIMIT 500),
      |j AS (
      |  SELECT (k.o_orderkey IS NULL
      |       OR s.o_custkey       IS DISTINCT FROM k.o_custkey
      |       OR s.o_orderstatus   IS DISTINCT FROM k.o_orderstatus
      |       OR s.o_totalprice    IS DISTINCT FROM k.o_totalprice
      |       OR s.o_orderdate     IS DISTINCT FROM k.o_orderdate
      |       OR s.o_orderpriority IS DISTINCT FROM k.o_orderpriority) AS mismatch
      |  FROM samp s LEFT JOIN sink k ON s.o_orderkey = k.o_orderkey)
      |SELECT CAST(count(*) AS BIGINT) AS sampled_rows,
      |  CAST(sum(CASE WHEN mismatch THEN 1 ELSE 0 END) AS BIGINT) AS mismatched_rows,
      |  CASE WHEN sum(CASE WHEN mismatch THEN 1 ELSE 0 END) = 0
      |    THEN 'PASS' ELSE 'FAIL' END AS status
      |FROM j""".stripMargin

  /** Check 10: CDC coverage — every allowlisted table materialized and
    * non-empty. One zero-column count scan per table.
    */
  val c10CdcCoverage: Q = (s, d) =>
    Validation.cdcCoverage(s, Tables.all, t => Some(Tables(s, d, t)))
      .orderBy("table_name")
  val c10Sql: String =
    Tables.all.sorted.map(t =>
      s"SELECT '$t' AS table_name, CAST(count(*) AS BIGINT) AS sink_rows, count(*) > 0 AS covered FROM $t")
      .mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
}
