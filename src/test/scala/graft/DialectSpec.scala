package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, ResultSet}

import graft.catalog.{CatalogDiscovery, TypeMapper}
import graft.functions.Conversions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dialect-metadata golden tests: the MySQL/MariaDB and Postgres JDBC
  * drivers report catalog metadata with dialect-specific shapes (PK
  * index naming, FK constraint naming, COLUMN_TYPE spellings). The
  * embedded-Derby round-trip (`JdbcRoundTripSpec`) exercises a real
  * driver but not THESE dialects — no MySQL/PG server exists in the
  * build sandbox — so each dialect's `DatabaseMetaData` surface is
  * mocked at the exact shapes the real drivers emit and the discovery
  * code is asserted to normalize both to the same structures.
  *
  * Golden sources: SURVEY.md §1.2 (type map), reference
  * migrate_v3.py:167-248 (TYPE_MAP + convert_mysql_type),
  * :250-280 (convert_value), :341-352 (FK query), :310-336 (SHOW INDEX).
  */
class DialectSpec extends SparkSuite {

  // ------------------------------------------------------------ mocks

  /** Minimal forward-only ResultSet over named rows — implements just
    * the accessors the discovery code calls (next/getString/getInt/
    * getShort/getBoolean/close/wasNull).
    */
  private def resultSet(rows: Seq[Map[String, Any]]): ResultSet = {
    var i = -1
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[ResultSet]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "next" => i += 1; java.lang.Boolean.valueOf(i < rows.size)
          case "close" | "clearWarnings" => null
          case "getString" => rows(i)(args(0).asInstanceOf[String]).asInstanceOf[AnyRef]
          case "getInt" => Int.box(rows(i)(args(0).asInstanceOf[String]) match {
            case n: Int => n case n: Short => n.toInt case null => 0 })
          case "getShort" => Short.box(rows(i)(args(0).asInstanceOf[String]) match {
            case n: Short => n case n: Int => n.toShort case null => 0 })
          case "getBoolean" => Boolean.box(rows(i)(args(0).asInstanceOf[String]) match {
            case b: Boolean => b case n: Int => n != 0 case null => false })
          case "wasNull" => java.lang.Boolean.valueOf(i >= 0 && i < rows.size && false)
          case other => throw new UnsupportedOperationException(other)
        }
      }).asInstanceOf[ResultSet]
  }

  /** Connection whose DatabaseMetaData serves the three catalog calls
    * from canned per-dialect rows.
    */
  private def mockConnection(
      primaryKeys: Seq[Map[String, Any]],
      importedKeys: Seq[Map[String, Any]],
      indexInfo: Seq[Map[String, Any]]): Connection = {
    val md = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[DatabaseMetaData]), new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "getPrimaryKeys" => resultSet(primaryKeys)
          case "getImportedKeys" => resultSet(importedKeys)
          case "getIndexInfo" => resultSet(indexInfo)
          case other => throw new UnsupportedOperationException(other)
        }
      }).asInstanceOf[DatabaseMetaData]
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "getMetaData" => md
          case "close" | "clearWarnings" => null
          case "isClosed" => java.lang.Boolean.FALSE
          case other => throw new UnsupportedOperationException(other)
        }
      }).asInstanceOf[Connection]
  }

  // ------------------------------------------- §1.2 type-map goldens

  test("MariaDB COLUMN_TYPE spellings map to the SURVEY §1.2 Spark types") {
    // exact strings MariaDB 10.x INFORMATION_SCHEMA emits (display
    // widths, unsigned/zerofill attributes, enum/set value lists)
    val golden: Seq[(String, DataType)] = Seq(
      "bigint(20)" -> LongType,
      "bigint(20) unsigned" -> LongType,      // unsigned-as-long, trading.json:40
      "bigint unsigned" -> LongType,          // MySQL >= 8.0.19 drops widths
      "int(11)" -> IntegerType,
      "int(10) unsigned" -> LongType,         // migrate_v3.py:235-236 promotion
      "int(10) unsigned zerofill" -> LongType,
      "mediumint(9)" -> IntegerType,
      "mediumint(8) unsigned" -> LongType,
      "smallint(6)" -> ShortType,
      "smallint(5) unsigned" -> IntegerType,
      "tinyint(1)" -> BooleanType,            // migrate_v3.py:231-234
      "tinyint(4)" -> ShortType,
      "tinyint(3) unsigned" -> IntegerType,
      "bit(1)" -> BooleanType,                // migrate_v3.py:168
      "decimal(18,4)" -> DecimalType(18, 4),  // precision preserved, :239-243
      "decimal(10,0) unsigned" -> DecimalType(10, 0),
      "float" -> FloatType,
      "double" -> DoubleType,
      "double(16,4)" -> DoubleType,
      "date" -> DateType,
      "datetime" -> TimestampNTZType,         // no tz; session pinned UTC
      "datetime(6)" -> TimestampNTZType,
      "timestamp" -> TimestampType,
      "timestamp(3)" -> TimestampType,
      "time" -> LongType,                     // micros-of-day, trading.json:41
      "time(6)" -> LongType,
      "year(4)" -> IntegerType,
      "char(36)" -> StringType,
      "varchar(255)" -> StringType,
      "text" -> StringType,
      "longtext" -> StringType,
      "enum('new','open','done')" -> StringType, // enum -> varchar, :192
      "set('a','b')" -> StringType,
      "binary(16)" -> BinaryType,
      "varbinary(255)" -> BinaryType,
      "blob" -> BinaryType,
      "longblob" -> BinaryType,
      "json" -> StringType,
      "geometry" -> StringType)               // unknown -> text fallback, :248
    golden.foreach { case (colType, expect) =>
      assert(TypeMapper.toSparkType(colType) == expect,
        s"$colType should map to $expect, got ${TypeMapper.toSparkType(colType)}")
    }
  }

  // ------------------------------- FK discovery through both dialects

  private val FkMysql = Seq(
    // MySQL Connector/J getImportedKeys shape: auto-generated
    // `<table>_ibfk_N` constraint names, KEY_SEQ 1-based short
    Map[String, Any]("FK_NAME" -> "orders_ibfk_1", "FKCOLUMN_NAME" -> "o_custkey",
      "PKTABLE_NAME" -> "customer", "PKCOLUMN_NAME" -> "c_custkey", "KEY_SEQ" -> 1),
    // composite FK: two rows, same constraint, ordered by KEY_SEQ
    Map[String, Any]("FK_NAME" -> "orders_ibfk_2", "FKCOLUMN_NAME" -> "o_regionkey",
      "PKTABLE_NAME" -> "region_nation", "PKCOLUMN_NAME" -> "rn_regionkey", "KEY_SEQ" -> 1),
    Map[String, Any]("FK_NAME" -> "orders_ibfk_2", "FKCOLUMN_NAME" -> "o_nationkey",
      "PKTABLE_NAME" -> "region_nation", "PKCOLUMN_NAME" -> "rn_nationkey", "KEY_SEQ" -> 2))

  private val FkPostgres = Seq(
    // PG JDBC shape: `<table>_<col>_fkey` names
    Map[String, Any]("FK_NAME" -> "orders_o_custkey_fkey", "FKCOLUMN_NAME" -> "o_custkey",
      "PKTABLE_NAME" -> "customer", "PKCOLUMN_NAME" -> "c_custkey", "KEY_SEQ" -> 1),
    Map[String, Any]("FK_NAME" -> "orders_composite_fkey", "FKCOLUMN_NAME" -> "o_regionkey",
      "PKTABLE_NAME" -> "region_nation", "PKCOLUMN_NAME" -> "rn_regionkey", "KEY_SEQ" -> 1),
    Map[String, Any]("FK_NAME" -> "orders_composite_fkey", "FKCOLUMN_NAME" -> "o_nationkey",
      "PKTABLE_NAME" -> "region_nation", "PKCOLUMN_NAME" -> "rn_nationkey", "KEY_SEQ" -> 2))

  test("FK discovery normalizes MySQL and PG metadata to identical structure") {
    for ((rows, dialect) <- Seq((FkMysql, "mysql"), (FkPostgres, "postgres"))) {
      val conn = mockConnection(Nil, rows, Nil)
      val fks = CatalogDiscovery.foreignKeysFromRows(
        CatalogDiscovery.foreignKeysFromJdbc(spark, conn, "orders"))("orders")
      assert(fks.size == 2, s"$dialect: $fks")
      val byTarget = fks.map(fk => fk.refTable -> fk).toMap
      assert(byTarget("customer").columns == Seq("o_custkey"), dialect)
      assert(byTarget("customer").refColumns == Seq("c_custkey"), dialect)
      // composite constraint keeps KEY_SEQ order regardless of name style
      assert(byTarget("region_nation").columns == Seq("o_regionkey", "o_nationkey"), dialect)
      assert(byTarget("region_nation").refColumns ==
        Seq("rn_regionkey", "rn_nationkey"), dialect)
    }
  }

  // ---------------------------- index discovery through both dialects

  test("index discovery excludes the PK index under both naming schemes") {
    // MySQL: PK-backing index is literally named PRIMARY
    // (the reference skips on that name, migrate_v3.py:322-324);
    // PG: it is `<table>_pkey` — name-based skipping would keep it,
    // the column-list exclusion drops both. MySQL also emits a
    // tableIndexStatistic row with INDEX_NAME null.
    val mysqlIdx = Seq(
      Map[String, Any]("INDEX_NAME" -> null, "NON_UNIQUE" -> false,
        "ORDINAL_POSITION" -> 0, "COLUMN_NAME" -> null, "ASC_OR_DESC" -> null),
      Map[String, Any]("INDEX_NAME" -> "PRIMARY", "NON_UNIQUE" -> false,
        "ORDINAL_POSITION" -> 1, "COLUMN_NAME" -> "o_orderkey", "ASC_OR_DESC" -> "A"),
      Map[String, Any]("INDEX_NAME" -> "idx_orders_custkey", "NON_UNIQUE" -> true,
        "ORDINAL_POSITION" -> 1, "COLUMN_NAME" -> "o_custkey", "ASC_OR_DESC" -> "A"),
      Map[String, Any]("INDEX_NAME" -> "uq_cust_date", "NON_UNIQUE" -> false,
        "ORDINAL_POSITION" -> 1, "COLUMN_NAME" -> "o_custkey", "ASC_OR_DESC" -> "A"),
      Map[String, Any]("INDEX_NAME" -> "uq_cust_date", "NON_UNIQUE" -> false,
        "ORDINAL_POSITION" -> 2, "COLUMN_NAME" -> "o_orderdate", "ASC_OR_DESC" -> "A"))
    val pgIdx = Seq(
      Map[String, Any]("INDEX_NAME" -> "orders_pkey", "NON_UNIQUE" -> false,
        "ORDINAL_POSITION" -> 1, "COLUMN_NAME" -> "o_orderkey", "ASC_OR_DESC" -> "A"),
      Map[String, Any]("INDEX_NAME" -> "idx_orders_custkey", "NON_UNIQUE" -> true,
        "ORDINAL_POSITION" -> 1, "COLUMN_NAME" -> "o_custkey", "ASC_OR_DESC" -> "A"),
      Map[String, Any]("INDEX_NAME" -> "uq_cust_date", "NON_UNIQUE" -> false,
        "ORDINAL_POSITION" -> 1, "COLUMN_NAME" -> "o_custkey", "ASC_OR_DESC" -> "A"),
      Map[String, Any]("INDEX_NAME" -> "uq_cust_date", "NON_UNIQUE" -> false,
        "ORDINAL_POSITION" -> 2, "COLUMN_NAME" -> "o_orderdate", "ASC_OR_DESC" -> "A"))
    val pk = Seq(Map[String, Any]("COLUMN_NAME" -> "o_orderkey", "KEY_SEQ" -> 1))
    for ((rows, dialect) <- Seq((mysqlIdx, "mysql"), (pgIdx, "postgres"))) {
      val conn = mockConnection(pk, Nil, rows)
      val idxs = CatalogDiscovery.indexesFromRows(
        CatalogDiscovery.indexesFromJdbc(spark, conn, "orders"))("orders")
      assert(idxs.map(_.name).toSet == Set("idx_orders_custkey", "uq_cust_date"),
        s"$dialect: PK-backing index must be excluded, got ${idxs.map(_.name)}")
      val byName = idxs.map(i => i.name -> i).toMap
      assert(!byName("idx_orders_custkey").unique, dialect)
      assert(byName("uq_cust_date").unique, dialect)
      assert(byName("uq_cust_date").columns == Seq("o_custkey", "o_orderdate"), dialect)
    }
  }

  // --------------------------- wire-value boundaries (migrate_v3.py:250-280)

  test("MariaDB wire values: bit(1) bytes, zero-dates, NUL bytes normalize") {
    import spark.implicits._
    // bit(1) arrives as a byte string off the MySQL wire; any value
    // other than a single zero byte is true (migrate_v3.py:256-261)
    val bits = Seq(
      (1L, Array[Byte](0)), (2L, Array[Byte](1)), (3L, Array[Byte](2)))
      .toDF("id", "raw")
      .select($"id", Conversions.bitBytesToBool($"raw").as("b"))
      .orderBy("id").collect().map(r => if (r.isNullAt(1)) null else r.getBoolean(1))
    assert(bits.toSeq == Seq(false, true, true))
    // zero-dates: MySQL's 0000-00-00 placeholders must become NULL
    // before they reach a date/timestamp-typed sink (migrate_v3.py:268-270)
    val dates = Seq((1L, "0000-00-00"), (2L, "0000-00-00 00:00:00"),
      (3L, "2024-02-29"), (4L, null.asInstanceOf[String]))
      .toDF("id", "raw")
      .select($"id", Conversions.zeroDateToNull($"raw").as("d"))
      .orderBy("id").collect().map(r => if (r.isNullAt(1)) null else r.getString(1))
    assert(dates.toSeq == Seq(null, null, "2024-02-29", null))
    // NUL bytes: Postgres text cannot store \x00 (migrate_v3.py:273-278)
    val nul = Seq((1L, "a" + "\u0000" + "b")).toDF("id", "s")
      .select(Conversions.stripNul($"s")).head().getString(0)
    assert(nul == "ab")
  }

  test("unsigned bigint beyond Long.MaxValue follows the reference's long mode") {
    // bigint.unsigned.handling.mode=long (trading.json:40): the wire
    // value is reinterpreted as the two's-complement long — 2^64-1
    // arrives as -1. The mapping keeps LongType (SURVEY §1.2) rather
    // than widening to Decimal; this pin documents that choice.
    assert(TypeMapper.toSparkType("bigint(20) unsigned") == LongType)
    import spark.implicits._
    val wrapped = Seq(java.lang.Long.parseUnsignedLong("18446744073709551615"))
      .toDF("v").select($"v".cast(LongType)).head().getLong(0)
    assert(wrapped == -1L)
  }
}
