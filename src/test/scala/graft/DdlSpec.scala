package graft

import graft.catalog.{DdlEmitter, ForeignKey, SecondaryIndex, SourceColumn, TypeMapper}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the relational-sink DDL emission — every row of the
  * reference's TYPE_MAP (migrate_v3.py:167-193), its convert_mysql_type
  * special cases (:225-248), and the 3-phase DDL strings (:371-511).
  */
class DdlSpec extends AnyFunSuite {

  /** (mysql COLUMN_TYPE, expected Postgres DDL type). Covers every
    * reference TYPE_MAP row — bare, with display width, and with the
    * modifiers the reference special-cases.
    */
  val golden: Seq[(String, String)] = Seq(
    // special cases first, like the reference's check order
    "tinyint(1)" -> "boolean",
    "tinyint(1) unsigned" -> "boolean", // substring check, modifier kept
    "bit(1)" -> "boolean",
    "int(10) unsigned" -> "bigint",
    "int unsigned" -> "bigint", // MySQL ≥8.0.19 spelling (documented divergence)
    "integer unsigned" -> "bigint",
    // integer family
    "tinyint" -> "smallint",
    "tinyint(4)" -> "smallint",
    "smallint" -> "smallint",
    "smallint(5) unsigned" -> "smallint", // reference: only int promotes
    "mediumint" -> "integer",
    "mediumint(9)" -> "integer",
    "int" -> "integer",
    "int(11)" -> "integer",
    "integer" -> "integer",
    "bigint" -> "bigint",
    "bigint(20)" -> "bigint",
    "bigint(20) unsigned" -> "bigint", // reference: no widening row
    // exact / floating numerics
    "decimal" -> "numeric",
    "decimal(10,2)" -> "numeric(10,2)",
    "decimal(18)" -> "numeric(18)",
    "numeric(10,2)" -> "numeric(10,2)", // documented divergence from the text(10,2) slip
    "float" -> "real",
    "double" -> "double precision",
    // temporal
    "date" -> "date",
    "datetime" -> "timestamp",
    "datetime(6)" -> "timestamp",
    "timestamp" -> "timestamptz",
    "time" -> "time",
    // character
    "char" -> "varchar",
    "char(8)" -> "varchar", // reference drops char width
    "varchar" -> "varchar",
    "varchar(255)" -> "varchar(255)",
    "text" -> "text",
    "tinytext" -> "text",
    "mediumtext" -> "text",
    "longtext" -> "text",
    // binary
    "binary" -> "bytea",
    "binary(16)" -> "bytea",
    "varbinary" -> "bytea",
    "varbinary(255)" -> "bytea",
    "blob" -> "bytea",
    "tinyblob" -> "bytea",
    "mediumblob" -> "bytea",
    "longblob" -> "bytea",
    // enum/set/fallthrough
    "enum('a','b')" -> "varchar",
    "set('x','y')" -> "text", // not in TYPE_MAP → text fallback
    "json" -> "text",
    "bit(8)" -> "text", // only bit(1) is special-cased
    "geometry" -> "text")

  test("pgType matches the reference type map on every row") {
    golden.foreach { case (mysql, pg) =>
      assert(DdlEmitter.pgType(mysql) == pg, s"for COLUMN_TYPE '$mysql'")
    }
  }

  test("pgType and TypeMapper agree on the value domain") {
    // the two sides of the engine (parquet store schema, relational
    // sink DDL) must not disagree about what a column IS
    golden.foreach { case (mysql, pg) =>
      val spark = TypeMapper.toSparkType(mysql)
      val coherent = pg match {
        case "boolean" => spark == BooleanType
        case "smallint" => spark == ShortType || spark == IntegerType
        case "integer" => spark == IntegerType
        case "bigint" => spark == LongType
        case p if p.startsWith("numeric") => spark.isInstanceOf[DecimalType]
        case "real" => spark == FloatType
        case "double precision" => spark == DoubleType
        case "date" => spark == DateType
        case "timestamp" => spark == TimestampNTZType
        case "timestamptz" => spark == TimestampType
        case "time" => spark == LongType // micros-of-day (no Spark TimeType)
        case p if p.startsWith("varchar") => spark == StringType
        case "text" => spark == StringType
        case "bytea" => spark == BinaryType
        case _ => false
      }
      assert(coherent, s"'$mysql': pg=$pg vs spark=$spark")
    }
  }

  val cols = Seq(
    SourceColumn("ID", "bigint(20)", nullable = false, isPrimary = true),
    SourceColumn("User", "varchar(64)", nullable = false),
    SourceColumn("Is_Active", "tinyint(1)"),
    SourceColumn("Balance", "decimal(18,4)"),
    SourceColumn("Created_Date", "datetime"))

  test("phase 1: unlogged constraint-free create, identifiers lowercased") {
    assert(DdlEmitter.createTableSql("public", "Trades", cols, tablePrefix = "x_") ==
      """CREATE UNLOGGED TABLE "public"."x_trades" ("id" bigint NOT NULL, """ +
        """"user" varchar(64) NOT NULL, "is_active" boolean, """ +
        """"balance" numeric(18,4), "created_date" timestamp)""")
  }

  test("phase 1 variant: logged create with inline PK") {
    assert(DdlEmitter.createTableSql("public", "Trades", cols,
      unlogged = false, skipConstraints = false) ==
      """CREATE TABLE "public"."trades" ("id" bigint NOT NULL, """ +
        """"user" varchar(64) NOT NULL, "is_active" boolean, """ +
        """"balance" numeric(18,4), "created_date" timestamp, PRIMARY KEY ("id"))""")
  }

  test("phase 3: SET LOGGED, deferred PK, then secondary indexes, in order") {
    val idx = Seq(
      SecondaryIndex("IDX_User", Seq("User"), unique = false),
      SecondaryIndex("UQ_Ref", Seq("Ref_No", "Seq_No"), unique = true))
    assert(DdlEmitter.finalizeSql("public", "Trades", Seq("ID"), idx, "x_") == Seq(
      """ALTER TABLE "public"."x_trades" SET LOGGED""",
      """ALTER TABLE "public"."x_trades" ADD PRIMARY KEY ("id")""",
      """CREATE INDEX "idx_user" ON "public"."x_trades" ("user")""",
      """CREATE UNIQUE INDEX "uq_ref" ON "public"."x_trades" ("ref_no", "seq_no")"""))
  }

  test("composite PK renders in ordinal order") {
    assert(DdlEmitter.addPrimaryKeySql("s", "T", Seq("A", "B")) ==
      """ALTER TABLE "s"."t" ADD PRIMARY KEY ("a", "b")""")
  }

  test("FK DDL renders but is excluded from the finalize sequence") {
    val fk = ForeignKey("FK_Order", Seq("Order_Id"), "Orders", Seq("ID"))
    assert(DdlEmitter.createForeignKeySql("public", "Trades", fk) ==
      """ALTER TABLE "public"."trades" ADD CONSTRAINT "fk_order" """ +
        """FOREIGN KEY ("order_id") REFERENCES "public"."orders" ("id")""")
    assert(!DdlEmitter.finalizeSql("public", "Trades", Seq("ID"))
      .exists(_.contains("FOREIGN KEY")))
  }

  test("existence probe matches the reference's skip-if-present check") {
    assert(DdlEmitter.tableExistsSql("public", "Trades", "x_") ==
      """SELECT EXISTS (SELECT FROM information_schema.tables
        |  WHERE table_schema = 'public'
        |  AND table_name = 'x_trades')""".stripMargin)
    // mixed-case schema: probe and DDL agree on the lowercased name
    // (the reference binds the schema verbatim here while its unquoted
    // phase-1 DDL case-folds — the probe would never match)
    assert(DdlEmitter.tableExistsSql("Trading", "T_Deal").contains("table_schema = 'trading'"))
  }

  test("migrationDdl composes phase 1 + phase 3 for one table") {
    val ddl = DdlEmitter.migrationDdl("public", "Trades", cols)
    assert(ddl.head.startsWith("CREATE UNLOGGED TABLE \"public\".\"trades\" ("))
    assert(ddl(1) == """ALTER TABLE "public"."trades" SET LOGGED""")
    assert(ddl(2) == """ALTER TABLE "public"."trades" ADD PRIMARY KEY ("id")""")
    assert(ddl.size == 3)
  }
}
