package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S4/S5: automatic table discovery + metadata introspection, mirroring
  * the reference's runtime discovery (reference: tests/validation.py:216-279
  * `discover_table_metadata` — INFORMATION_SCHEMA.KEY_COLUMN_USAGE for PKs
  * in ordinal order, INFORMATION_SCHEMA.COLUMNS for timestamp/bit columns;
  * migrate_v3.py:292-369 DESCRIBE / SHOW INDEX / FK extraction). At the
  * reference's real scale (9 databases × 42 tables) a hand-written
  * metadata map is the first wall a user hits; discovery is the product.
  *
  * Two tiers:
  *  - [[fromInformationSchema]]: strict catalog-backed discovery from an
  *    INFORMATION_SCHEMA-shaped DataFrame (from `spark.read.jdbc` on a
  *    live database — [[columnsSql]]/[[keyColumnUsageSql]] are the exact
  *    queries — or any other catalog export). Tables without an explicit
  *    PK are REJECTED, like the reference ("CDC validation requires
  *    explicit PK").
  *  - [[fromParquet]]: file-lake fallback — schema introspection from
  *    parquet footers plus a documented naming convention for PKs
  *    (parquet carries no key metadata). Convention, not data profiling:
  *    verifying uniqueness against the data would be circular in a CDC
  *    validator whose job is to detect duplicate PKs in drifted sinks.
  */
object CatalogDiscovery {

  // ------------------------------------------------------------ S4: discovery

  /** Parse a `db.table,table` allowlist into table names (reference:
    * tests/validation.py:188-199 `get_allowlist`).
    */
  def parseAllowlist(allowlist: String): Seq[String] =
    allowlist.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      .map(item => if (item.contains('.')) item.split('.').last else item)

  /** Discover tables in a parquet lake directory (one `<table>.parquet`
    * file/dir per table — the layout TESTDATA.md uses).
    */
  def discoverTables(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .sorted
  }

  // ------------------------------------------------ S5a: catalog-backed (strict)

  /** The reference's PK query, verbatim semantics (validation.py:222-230):
    * run via `spark.read.jdbc` against a live MySQL/MariaDB.
    */
  def keyColumnUsageSql(schema: String, table: String): String =
    s"""SELECT COLUMN_NAME
       |FROM INFORMATION_SCHEMA.KEY_COLUMN_USAGE
       |WHERE TABLE_SCHEMA = '$schema'
       |  AND TABLE_NAME = '$table'
       |  AND CONSTRAINT_NAME = 'PRIMARY'
       |ORDER BY ORDINAL_POSITION""".stripMargin

  /** The reference's column query (validation.py:240-246). */
  def columnsSql(schema: String, table: String): String =
    s"""SELECT COLUMN_NAME, DATA_TYPE, COLUMN_TYPE
       |FROM INFORMATION_SCHEMA.COLUMNS
       |WHERE TABLE_SCHEMA = '$schema' AND TABLE_NAME = '$table'
       |ORDER BY ORDINAL_POSITION""".stripMargin

  /** The reference's FK query, verbatim semantics (migrate_v3.py:341-352):
    * one row per FK column, grouped by constraint in ordinal order.
    */
  def foreignKeysSql(schema: String, table: String): String =
    s"""SELECT CONSTRAINT_NAME, COLUMN_NAME,
       |  REFERENCED_TABLE_NAME, REFERENCED_COLUMN_NAME
       |FROM INFORMATION_SCHEMA.KEY_COLUMN_USAGE
       |WHERE TABLE_SCHEMA = '$schema'
       |  AND TABLE_NAME = '$table'
       |  AND REFERENCED_TABLE_NAME IS NOT NULL
       |ORDER BY CONSTRAINT_NAME, ORDINAL_POSITION""".stripMargin

  /** Expected shape of an FK rows DataFrame (the [[foreignKeysSql]]
    * result plus the owning table): one row per constraint column,
    * `ordinal_position` ordering the columns within a constraint.
    */
  val FkSchema: StructType = StructType(Seq(
    StructField("table_name", StringType),
    StructField("constraint_name", StringType),
    StructField("column_name", StringType),
    StructField("referenced_table_name", StringType),
    StructField("referenced_column_name", StringType),
    StructField("ordinal_position", IntegerType)))

  /** Group FK rows into [[ForeignKey]] constraints per table — the Scala
    * form of the reference's per-constraint accumulation loop
    * (migrate_v3.py:355-369). Bounded catalog metadata: the collect is
    * rows-per-constraint-column, never data.
    */
  def foreignKeysFromRows(fkRows: DataFrame): Map[String, Seq[ForeignKey]] = {
    val rows = fkRows.select("table_name", "constraint_name", "column_name",
      "referenced_table_name", "referenced_column_name", "ordinal_position").collect()
    rows.groupBy(_.getString(0)).map { case (table, rs) =>
      val fks = rs.groupBy(_.getString(1)).toSeq.sortBy(_._1).map { case (cname, cols) =>
        val ordered = cols.sortBy(_.getInt(5))
        ForeignKey(cname, ordered.map(_.getString(2)).toSeq,
          ordered.head.getString(3), ordered.map(_.getString(4)).toSeq)
      }
      table -> fks
    }
  }

  /** Live-JDBC FK discovery via `DatabaseMetaData.getImportedKeys` —
    * engines whose INFORMATION_SCHEMA dialect differs (Derby, Postgres)
    * surface the same constraint structure through the standard JDBC
    * metadata API; rows come back in the [[FkSchema]] shape.
    */
  def foreignKeysFromJdbc(spark: SparkSession, url: String, table: String): DataFrame = {
    val conn = java.sql.DriverManager.getConnection(url)
    try foreignKeysFromJdbc(spark, conn, table) finally conn.close()
  }

  /** Connection-injected variant — the unit under dialect golden tests
    * (`DialectSpec` drives it with mocked MySQL- and Postgres-shaped
    * `DatabaseMetaData`); the URL overload owns connection lifecycle.
    */
  def foreignKeysFromJdbc(spark: SparkSession, conn: java.sql.Connection,
      table: String): DataFrame = {
    val rs = conn.getMetaData.getImportedKeys(null, null, table)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    while (rs.next()) {
      buf += Row(table, rs.getString("FK_NAME"), rs.getString("FKCOLUMN_NAME"),
        rs.getString("PKTABLE_NAME"), rs.getString("PKCOLUMN_NAME"),
        rs.getInt("KEY_SEQ"))
    }
    rs.close()
    spark.createDataFrame(
      spark.sparkContext.parallelize(buf.toIndexedSeq, 1), FkSchema)
  }

  // ------------------------------------------------ S5c: secondary indexes

  /** The reference's index query, verbatim (migrate_v3.py:310): MySQL's
    * `SHOW INDEX` — one row per (index, column) with NON_UNIQUE,
    * SEQ_IN_INDEX and INDEX_TYPE fields.
    */
  def showIndexSql(table: String): String = s"SHOW INDEX FROM $table"

  /** The same rows through standard INFORMATION_SCHEMA (`SHOW` verbs
    * can't ride a `spark.read.jdbc` dbtable subquery; STATISTICS can).
    * PRIMARY is excluded here, matching the reference's skip
    * (migrate_v3.py:322-324) — the PK is introspected separately.
    */
  def statisticsSql(schema: String, table: String): String =
    s"""SELECT TABLE_NAME, INDEX_NAME, NON_UNIQUE, SEQ_IN_INDEX,
       |  COLUMN_NAME, INDEX_TYPE
       |FROM INFORMATION_SCHEMA.STATISTICS
       |WHERE TABLE_SCHEMA = '$schema'
       |  AND TABLE_NAME = '$table'
       |  AND INDEX_NAME <> 'PRIMARY'
       |ORDER BY INDEX_NAME, SEQ_IN_INDEX""".stripMargin

  /** Expected shape of an index rows DataFrame ([[statisticsSql]] /
    * [[indexesFromJdbc]] result): one row per (index, column),
    * `seq_in_index` ordering columns within an index.
    */
  val IndexSchema: StructType = StructType(Seq(
    StructField("table_name", StringType),
    StructField("index_name", StringType),
    StructField("non_unique", IntegerType),
    StructField("seq_in_index", IntegerType),
    StructField("column_name", StringType),
    StructField("index_type", StringType)))

  /** Group index rows into [[SecondaryIndex]] per table — the Scala form
    * of the reference's per-key accumulation (migrate_v3.py:326-336).
    * Bounded catalog metadata: the collect is rows-per-index-column,
    * never data.
    */
  def indexesFromRows(idxRows: DataFrame): Map[String, Seq[SecondaryIndex]] = {
    val rows = idxRows.select("table_name", "index_name", "non_unique",
      "seq_in_index", "column_name", "index_type").collect()
    rows.groupBy(_.getString(0)).map { case (table, rs) =>
      val idxs = rs.filter(_.getString(1) != "PRIMARY")
        .groupBy(_.getString(1)).toSeq.sortBy(_._1).map { case (name, cols) =>
          val ordered = cols.sortBy(_.getInt(3))
          SecondaryIndex(name, ordered.map(_.getString(4)).toSeq,
            unique = ordered.head.getInt(2) == 0,
            indexType = Option(ordered.head.getString(5)).getOrElse("BTREE"))
        }
      table -> idxs
    }
  }

  /** Live-JDBC index discovery via `DatabaseMetaData.getIndexInfo` — the
    * engine-portable form of `SHOW INDEX`. The PK's backing index is
    * excluded by COLUMN LIST (an index over exactly the PK columns in
    * order), not by name: engines like Derby give the PK conglomerate a
    * generated name, never the literal 'PRIMARY' the reference skips on.
    */
  def indexesFromJdbc(spark: SparkSession, url: String, table: String): DataFrame = {
    val conn = java.sql.DriverManager.getConnection(url)
    try indexesFromJdbc(spark, conn, table) finally conn.close()
  }

  /** Connection-injected variant (see [[foreignKeysFromJdbc]]). */
  def indexesFromJdbc(spark: SparkSession, conn: java.sql.Connection,
      table: String): DataFrame = {
    {
      val md = conn.getMetaData
      val pkRs = md.getPrimaryKeys(null, null, table)
      val pkCols = scala.collection.mutable.ArrayBuffer.empty[(Short, String)]
      while (pkRs.next()) pkCols += ((pkRs.getShort("KEY_SEQ"), pkRs.getString("COLUMN_NAME")))
      pkRs.close()
      val pk = pkCols.sortBy(_._1).map(_._2).toSeq
      val rs = md.getIndexInfo(null, null, table, false, false)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (rs.next()) {
        val name = rs.getString("INDEX_NAME")
        if (name != null) // statistics rows (TYPE tableIndexStatistic) have none
          buf += Row(table, name,
            if (rs.getBoolean("NON_UNIQUE")) 1 else 0,
            rs.getShort("ORDINAL_POSITION").toInt,
            rs.getString("COLUMN_NAME"),
            Option(rs.getString("ASC_OR_DESC")).map(_ => "BTREE").getOrElse("BTREE"))
      }
      rs.close()
      val byIdx = buf.groupBy(_.getString(1))
      val keep = byIdx.filter { case (_, rows) =>
        rows.sortBy(_.getInt(3)).map(_.getString(4)).toSeq != pk
      }.values.flatten.toIndexedSeq.sortBy(r => (r.getString(1), r.getInt(3)))
      spark.createDataFrame(spark.sparkContext.parallelize(keep, 1), IndexSchema)
    }
  }

  /** Sink-side DDL for one discovered index — delegates to
    * [[DdlEmitter.createIndexSql]] (the reference's phase-3 rebuild
    * shape, migrate_v3.py:459-481) so index DDL has one renderer.
    */
  def renderCreateIndex(schema: String, table: String, idx: SecondaryIndex): String =
    DdlEmitter.createIndexSql(schema, table, idx)

  /** Expected shape of the catalog DataFrame consumed below — a join of
    * the two INFORMATION_SCHEMA queries: one row per column with
    * `pk_ordinal` null for non-key columns.
    */
  val CatalogSchema: StructType = StructType(Seq(
    StructField("table_name", StringType),
    StructField("column_name", StringType),
    StructField("data_type", StringType),     // e.g. "bigint", "timestamp"
    StructField("column_type", StringType),   // e.g. "bit(1)", "tinyint(1)"
    StructField("ordinal_position", IntegerType),
    StructField("pk_ordinal", IntegerType)))  // null = not part of the PK

  /** MySQL column types repaired to boolean on the sink (reference:
    * validation.py:261-264; TinyIntOneToBooleanConverter in
    * connectors/sources/mariadb/trading.json:47-48).
    */
  private val BitColumnTypes = Set("bit(1)", "tinyint(1)")

  /** Strict catalog discovery: one TableMeta per table that HAS a
    * primary key; tables without one are dropped (reference logs an
    * error and returns None — validation.py:233-236).
    */
  def fromInformationSchema(catalog: DataFrame): Map[String, TableMeta] =
    fromInformationSchema(catalog, fkRows = None)

  /** Strict discovery with FK metadata attached from an [[FkSchema]]-shaped
    * DataFrame ([[foreignKeysSql]] against a live catalog, or
    * [[foreignKeysFromJdbc]]).
    */
  def fromInformationSchema(catalog: DataFrame,
      fkRows: Option[DataFrame]): Map[String, TableMeta] =
    fromInformationSchema(catalog, fkRows, idxRows = None)

  /** Strict discovery with FK and secondary-index metadata attached
    * ([[statisticsSql]]/[[showIndexSql]] rows or [[indexesFromJdbc]]).
    */
  def fromInformationSchema(catalog: DataFrame, fkRows: Option[DataFrame],
      idxRows: Option[DataFrame]): Map[String, TableMeta] = {
    val fksByTable = fkRows.map(foreignKeysFromRows).getOrElse(Map.empty)
    val idxByTable = idxRows.map(indexesFromRows).getOrElse(Map.empty)
    val rows = catalog.select("table_name", "column_name", "data_type",
      "column_type", "ordinal_position", "pk_ordinal").collect()
    rows.groupBy(_.getString(0)).flatMap { case (table, cols) =>
      val ordered = cols.sortBy(_.getInt(4))
      val pks = ordered.filter(!_.isNullAt(5)).sortBy(_.getInt(5)).map(_.getString(1)).toSeq
      if (pks.isEmpty) None // strict: CDC validation requires explicit PK
      else {
        val names = ordered.map(_.getString(1))
        val tsCol = TableMeta.TimestampPatterns.collectFirst {
          case p if names.exists(_.equalsIgnoreCase(p)) =>
            names.find(_.equalsIgnoreCase(p)).get
        }
        val bitCols = ordered.filter(r => !r.isNullAt(3) &&
          BitColumnTypes.contains(r.getString(3).toLowerCase)).map(_.getString(1)).toSeq
        Some(table -> TableMeta(table, pks, tsCol, bitCols,
          fks = fksByTable.getOrElse(table, Nil),
          indexes = idxByTable.getOrElse(table, Nil)))
      }
    }
  }

  // ------------------------------------------------ S5b: parquet-lake fallback

  private val PkNamePattern = "(?i)^(.*_)?id$|^.*key$".r
  private val PkSecondaryPattern = "(?i)^.*(linenumber|line_number|lineno|seqno|sequence)$".r
  private val TemporalNamePattern = "(?i)^ts$|.*_ts$|.*date$|.*_at$|.*timestamp.*".r

  /** Convention-based PK for catalog-less parquet: the first id/key-named
    * column in ordinal order, plus a line-number-ish column when present
    * (composite keys of the lineitem shape). Returns Nil when nothing
    * matches — the caller must then supply keys explicitly (connector
    * config), same strictness as the reference.
    */
  def conventionPks(schema: StructType): Seq[String] = {
    val names = schema.fieldNames.toSeq
    names.find(n => PkNamePattern.matches(n)) match {
      case None => Nil
      case Some(primary) =>
        primary +: names.filter(n => n != primary && PkSecondaryPattern.matches(n))
    }
  }

  /** Timestamp column: reference patterns first (validation.py:251-258),
    * then name conventions restricted to temporal-TYPED columns, then any
    * temporal-typed column in ordinal order, and only as a last resort a
    * name-convention column of any other type (raw CDC string payloads,
    * epoch longs). The loose `.*date$` suffix must not outrank a typed
    * timestamp: a string column named "update" or "candidate" would
    * otherwise win and cast to all nulls downstream.
    */
  def detectTemporal(schema: StructType): Option[String] = {
    def temporal(f: StructField): Boolean = f.dataType match {
      case _: DateType | _: TimestampType | _: TimestampNTZType => true
      case _ => false
    }
    TableMeta.detectTsCol(schema)
      .orElse(schema.fields.find(f => temporal(f) && TemporalNamePattern.matches(f.name)).map(_.name))
      .orElse(schema.fields.find(temporal).map(_.name))
      .orElse(schema.fieldNames.find(n => TemporalNamePattern.matches(n)))
  }

  /** Check 0 (reference: tests/README.md:17 "Metadata completeness"):
    * every LISTED table must have discovered metadata with a PK (CDC
    * cannot key upserts without one) and reports whether a timestamp
    * column exists (freshness/recent-activity checks degrade to skipped
    * without it). Takes the table LISTING separately from the discovery
    * result: discovery drops undiscoverable tables from its map, so a
    * metas-only check could never flag exactly the tables it exists to
    * catch — a listed table absent from `metas` reports (false, false).
    */
  def metadataCompleteness(tables: Seq[String],
      metas: Map[String, TableMeta]): Seq[(String, Boolean, Boolean)] =
    tables.sorted.map { t =>
      metas.get(t) match {
        case Some(m) => (t, m.pkCols.nonEmpty, m.tsCol.isDefined)
        case None => (t, false, false)
      }
    }

  /** Introspect one parquet table (S5): footer schema → TableMeta. */
  def fromParquet(spark: SparkSession, dir: String, table: String): Option[TableMeta] = {
    val schema = spark.read.parquet(s"$dir/$table.parquet").schema
    val pks = conventionPks(schema)
    if (pks.isEmpty) None
    else Some(TableMeta(
      name = table,
      pkCols = pks,
      tsCol = detectTemporal(schema),
      bitCols = schema.fields.filter(_.dataType == BooleanType).map(_.name).toSeq))
  }

  /** S4+S5 end-to-end over a lake directory. */
  def discoverAll(spark: SparkSession, dir: String): Map[String, TableMeta] =
    discoverTables(spark, dir)
      .flatMap(t => fromParquet(spark, dir, t).map(t -> _)).toMap

  /** COLUMNS-shaped introspection of a parquet file — lets file-lake
    * tables participate in catalog tooling built for the
    * INFORMATION_SCHEMA shape (pk_ordinal filled from the convention).
    */
  def columnsFromParquet(spark: SparkSession, dir: String, table: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/$table.parquet").schema
    val pks = conventionPks(schema)
    val rows = schema.fields.zipWithIndex.map { case (f, i) =>
      val pkOrd = pks.indexOf(f.name)
      Row(table, f.name, f.dataType.simpleString, f.dataType.simpleString,
        i + 1, if (pkOrd >= 0) Integer.valueOf(pkOrd + 1) else null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), CatalogSchema)
  }
}
