package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Config-driven SMT (Single Message Transform) chain — the engine's
  * mirror of the reference's declarative Kafka-Connect transform
  * configuration (SURVEY §7.3). Each connector JSON in the reference
  * declares an ordered `transforms` list with per-transform config;
  * here the same semantics are data (`Smt` ADT) interpreted into a
  * composed `DataFrame => DataFrame`.
  *
  * Reference transform vocabulary covered:
  *  - `ExtractNewRecordState` (unwrap + metadata columns,
  *    connectors/sources/mariadb/trading.json:73-76)
  *  - `RegexRouter` (topic → table routing,
  *    connectors/sinks/postgres/trading.json:32-35)
  *  - `Cast$Value` (per-column cast repairs,
  *    connectors/sinks/postgres/trading.json:36-38)
  *  - `ReplaceField$Value` under a `TopicNameMatches` predicate
  *    (conditional renames, connectors/sources/mariadb/live.json:70-79)
  *  - include-list filtering (`table.include.list`,
  *    connectors/sources/mariadb/trading.json:14-16)
  */
object SmtChain {

  sealed trait Smt
  /** P3: unwrap the Debezium envelope, append __op/__source_ts_ms/__db/__table. */
  case object Unwrap extends Smt
  /** P1: keep only events for allowlisted (db, table) pairs (pre-unwrap). */
  case class IncludeList(allow: Seq[(String, String)]) extends Smt
  /** P5: cast named columns (post-unwrap). */
  case class CastValues(casts: Map[String, DataType]) extends Smt
  /** P6: rename fields when the topic matches the predicate pattern. */
  case class RenameIf(topicPattern: String, renames: Map[String, String]) extends Smt
  /** P8: lowercase all column names (sink-side identifier rule). */
  case object LowercaseNames extends Smt
  /** P4: derive a routing column from a topic column via regex. */
  case class RegexRoute(topicCol: String, pattern: String, replacement: String,
      outCol: String = "__sink_table") extends Smt

  /** Interpret one transform for a given topic context. */
  def apply(smt: Smt, topic: String)(df: DataFrame): DataFrame = smt match {
    case Unwrap => Envelope.unwrap(df)
    case IncludeList(allow) => Envelope.includeFilter(df, allow)
    case CastValues(casts) => Envelope.castColumns(df, casts)
    case RenameIf(pat, renames) => Envelope.renameIf(df, topic, pat, renames)
    case LowercaseNames => graft.functions.Conversions.lowercaseColumns(df)
    case RegexRoute(topicCol, pat, repl, out) =>
      df.withColumn(out, Envelope.route(col(topicCol), pat, repl))
  }

  /** Compose an ordered chain, exactly like Kafka Connect applies its
    * `transforms` list left to right.
    */
  def chain(smts: Seq[Smt], topic: String): DataFrame => DataFrame =
    smts.foldLeft(identity[DataFrame] _) { (f, smt) =>
      f.andThen(apply(smt, topic))
    }
}
