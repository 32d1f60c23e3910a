package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Change-event envelope — the Spark form of the Debezium event shape the
  * reference produces on Kafka, and the source-side SMT chain that
  * processes it (reference: connectors/sources/mariadb/trading.json:73-76
  * `unwrap`, connectors/sinks/postgres/trading.json:32-38 `route` +
  * `castBits`).
  *
  * An envelope row is:
  * {{{
  *   op: string               -- c (create) | u (update) | d (delete) | r (snapshot read)
  *   ts_ms: long              -- source change timestamp (epoch millis)
  *   source: struct(db, table, ts_ms)
  *   before: struct(<row>)    -- null except for u/d
  *   after:  struct(<row>)    -- null for d
  * }}}
  */
object Envelope {

  val OpCreate = "c"
  val OpUpdate = "u"
  val OpDelete = "d"
  val OpSnapshotRead = "r"

  /** Envelope StructType for a given row schema — what `from_json` needs
    * to parse a serialized change event (reference JSON-with-schema
    * converters: connectors/sources/mariadb/trading.json:68-71).
    */
  def schemaFor(rowSchema: StructType): StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType),
      StructField("ts_ms", LongType))), nullable = false),
    StructField("before", rowSchema, nullable = true),
    StructField("after", rowSchema, nullable = true)))

  /** Wrap a plain row DataFrame into change events (test/replay helper):
    * every row becomes an event with the given op derived per-row.
    */
  def wrap(df: DataFrame, db: String, table: String, opCol: Column, tsMsCol: Column): DataFrame = {
    val rowStruct = struct(df.columns.toIndexedSeq.map(col): _*)
    df.select(
      opCol.as("op"),
      tsMsCol.as("ts_ms"),
      struct(lit(db).as("db"), lit(table).as("table"), tsMsCol.as("ts_ms")).as("source"),
      when(opCol === OpDelete || opCol === OpUpdate, rowStruct).as("before"),
      when(opCol =!= OpDelete, rowStruct).as("after"))
  }

  /** P3: ExtractNewRecordState — project `after.*` out of the envelope and
    * append metadata columns; delete events are kept (the reference sets
    * `delete.handling.mode=none`) with their row fields taken from
    * `before` so the key survives for sink-side delete application
    * (reference: connectors/sources/mariadb/trading.json:73-76).
    */
  def unwrap(envelope: DataFrame): DataFrame = {
    val rowFields = envelope.schema("after").dataType.asInstanceOf[StructType].fieldNames
    val rowCols = rowFields.map { f =>
      when(col("op") === OpDelete, col(s"before.$f")).otherwise(col(s"after.$f")).as(f)
    }
    // Extra top-level "__" columns (e.g. a stream offset "__seq") pass through.
    val passthrough = envelope.columns.toIndexedSeq.filter(_.startsWith("__")).map(col(_))
    envelope.select(rowCols ++ Seq(
      col("op").as("__op"),
      col("source.ts_ms").as("__source_ts_ms"),
      col("source.db").as("__db"),
      col("source.table").as("__table")) ++ passthrough: _*)
  }

  /** P4: RegexRouter — derive the sink table name from the topic
    * (reference: connectors/sinks/postgres/trading.json:32-35, e.g.
    * `xchange_trading_v2.xchange_trading.(.*)` → `trading_$1`), lowercased
    * downstream (reference: migrate_v3.py:373).
    */
  def route(topic: Column, pattern: String, replacement: String): Column =
    lower(regexp_replace(topic, pattern, replacement))

  /** P5: per-column cast repair (Cast$Value SMT) — e.g. bit(1) columns to
    * boolean, tinyint to int16 (reference:
    * connectors/sinks/postgres/trading.json:37-38).
    */
  def castColumns(df: DataFrame, casts: Map[String, DataType]): DataFrame =
    casts.foldLeft(df) { case (d, (c, t)) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast(t)) else d
    }

  /** P6: conditional field rename under a topic predicate (reference:
    * connectors/sources/mariadb/live.json:70-79 — rename `user` →
    * `owner_user_id` only for topics matching `.*T_CARRIER`).
    */
  def renameIf(df: DataFrame, topicName: String, topicPattern: String,
      renames: Map[String, String]): DataFrame =
    if (topicName.matches(topicPattern))
      renames.foldLeft(df) { case (d, (from, to)) =>
        if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
      }
    else df

  /** P1: allowlist filter on db.table (reference:
    * connectors/sources/mariadb/trading.json:14-16, .env.template:17).
    */
  def includeFilter(envelope: DataFrame, allowlist: Seq[(String, String)]): DataFrame =
    envelope.filter(
      allowlist.map { case (db, t) => col("source.db") === db && col("source.table") === t }
        .reduce(_ || _))
}
