package graft.catalog

import org.apache.spark.sql.types._

/** MySQL type-string → Spark DataType mapping — the Spark equivalent of
  * the reference's migration type map (reference: migrate_v3.py:167-193
  * `TYPE_MAP` and migrate_v3.py:225-248 `convert_mysql_type`).
  *
  * The reference maps MySQL DDL types to Postgres DDL; here the target is
  * a Spark `StructType`, so `varchar(n)` width and index DDL drop away and
  * only the value domain matters.
  */
object TypeMapper {

  // `zerofill` (always implies a display width, often follows `unsigned`
  // in MariaDB's COLUMN_TYPE output, e.g. "int(10) unsigned zerofill")
  // is a formatting attribute with no value-domain effect — tolerate and
  // ignore it, like the reference's substring-based checks do
  // (migrate_v3.py:225-248 match on the base-type substring).
  private val ParamType = """^\s*(\w+)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)\s*(unsigned)?\s*(?:zerofill)?\s*$""".r
  private val BareType = """^\s*(\w+)\s*(unsigned)?\s*(?:zerofill)?\s*$""".r

  /** Parse a MySQL column type string, e.g. "decimal(10,2)", "tinyint(1)",
    * "int unsigned", "varchar(255)". Unknown types fall back to string
    * (reference: migrate_v3.py:248 text fallback).
    */
  def toSparkType(mysqlType: String): DataType = mysqlType.toLowerCase match {
    case ParamType("tinyint", "1", null, _) => BooleanType // tinyint(1) -> bool (migrate_v3.py:231-234)
    case ParamType("bit", "1", null, _) => BooleanType // bit(1) -> bool (migrate_v3.py:168)
    case ParamType("decimal" | "numeric", p, s, _) =>
      DecimalType(p.toInt, Option(s).map(_.toInt).getOrElse(0)) // precision preserved (migrate_v3.py:239-243)
    case ParamType(base, _, _, unsigned) => bare(base, unsigned != null)
    case BareType(base, unsigned) => bare(base, unsigned != null)
    case _ => StringType
  }

  private def bare(base: String, unsigned: Boolean): DataType = base match {
    case "tinyint" | "smallint" => if (unsigned) IntegerType else ShortType // migrate_v3.py:170-171
    case "mediumint" | "int" | "integer" => if (unsigned) LongType else IntegerType // :172-173,235-236
    case "bigint" => LongType // :174 (unsigned handled as long, trading.json:40)
    case "decimal" | "numeric" => DecimalType(10, 0)
    case "float" => FloatType // :176
    case "double" | "real" => DoubleType // :177
    case "date" => DateType // :178
    case "datetime" => TimestampNTZType // :179 (no tz; session pinned UTC)
    case "timestamp" => TimestampType // :180
    case "time" => LongType // micros-of-day; Spark has no TimeType (trading.json:41)
    case "year" => IntegerType
    case "char" | "varchar" | "text" | "tinytext" | "mediumtext" | "longtext" | "enum" | "set" =>
      StringType // :182-186,192
    case "binary" | "varbinary" | "blob" | "tinyblob" | "mediumblob" | "longblob" =>
      BinaryType // :187-191
    case "json" => StringType
    case "boolean" | "bool" => BooleanType
    case _ => StringType // unknown -> text fallback (:248)
  }
}
