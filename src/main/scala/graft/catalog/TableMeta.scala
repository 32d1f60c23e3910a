package graft.catalog

import org.apache.spark.sql.types._

/** Per-table CDC metadata — the Scala mirror of the reference's
  * `TableMetadata` (reference: tests/validation.py:66-77) plus the
  * declarative per-table transform config that the reference keeps in
  * Kafka-Connect JSON (column cast repairs, conditional renames).
  *
  * @param name      table name (lowercased on the sink side, reference:
  *                  migrate_v3.py:373,396)
  * @param pkCols    primary-key columns in ordinal order (reference:
  *                  tests/validation.py:222-236 — "CDC validation
  *                  requires explicit PK")
  * @param tsCol     freshness timestamp column, if detected (reference:
  *                  tests/validation.py:250-258)
  * @param bitCols   columns that arrive as bit(1)/tinyint(1) and must be
  *                  repaired to boolean (reference:
  *                  connectors/sinks/postgres/trading.json:37-38)
  * @param renames   conditional column renames, e.g. user->owner_user_id
  *                  (reference: connectors/sources/mariadb/live.json:70-79)
  * @param casts     per-column sink-side cast repairs (Cast$Value SMT,
  *                  reference: connectors/sinks/postgres/trading.json:36-38)
  * @param fks       foreign-key constraints discovered on the source
  *                  (reference: migrate_v3.py:338-369 — extracted for the
  *                  catalog even though the sink skips creating them,
  *                  migrate_v3.py:484-506; same here: metadata surface
  *                  only, the parquet store enforces nothing)
  */
case class TableMeta(
    name: String,
    pkCols: Seq[String],
    tsCol: Option[String] = None,
    bitCols: Seq[String] = Nil,
    renames: Map[String, String] = Map.empty,
    casts: Map[String, DataType] = Map.empty,
    fks: Seq[ForeignKey] = Nil,
    indexes: Seq[SecondaryIndex] = Nil) {
  require(pkCols.nonEmpty, s"CDC validation requires explicit PK for $name")
}

/** One foreign-key constraint: multi-column keys keep `columns` and
  * `refColumns` aligned in ordinal order (reference: migrate_v3.py:355-369
  * accumulates both lists per CONSTRAINT_NAME in ORDINAL_POSITION order).
  */
case class ForeignKey(
    name: String,
    columns: Seq[String],
    refTable: String,
    refColumns: Seq[String])

/** One secondary index (the PRIMARY key is never represented here —
  * it lives in [[TableMeta.pkCols]], mirroring the reference's
  * `SHOW INDEX` loop that skips `key_name == 'PRIMARY'`,
  * migrate_v3.py:322-324). `columns` is ordinal-ordered
  * (SEQ_IN_INDEX); `indexType` is the engine's access-method string
  * ("BTREE" unless the catalog says otherwise — migrate_v3.py:321).
  * Metadata surface only: the parquet store has no index structures,
  * but a migration user sees (and a relational sink rebuilds,
  * migrate_v3.py:459-481) exactly this shape.
  */
case class SecondaryIndex(
    name: String,
    columns: Seq[String],
    unique: Boolean,
    indexType: String = "BTREE")

object TableMeta {

  /** Timestamp-column detection order (reference: tests/validation.py:251,
    * tests/drift_analysis.py:129). Case-insensitive against the schema.
    */
  val TimestampPatterns: Seq[String] =
    Seq("LAST_MODIFIED_DATE", "MODIFIED_DATE", "UPDATED_AT", "CREATED_DATE", "CREATED_AT")

  def detectTsCol(schema: StructType): Option[String] = {
    val byUpper = schema.fieldNames.map(f => f.toUpperCase -> f).toMap
    TimestampPatterns.collectFirst { case p if byUpper.contains(p) => byUpper(p) }
  }

  /** Metadata for the bundled test tables (PKs per TESTDATA.md schema). */
  val testTables: Map[String, TableMeta] = Map(
    "region" -> TableMeta("region", Seq("r_regionkey")),
    "nation" -> TableMeta("nation", Seq("n_nationkey")),
    "customer" -> TableMeta("customer", Seq("c_custkey")),
    "supplier" -> TableMeta("supplier", Seq("s_suppkey")),
    "part" -> TableMeta("part", Seq("p_partkey")),
    "orders" -> TableMeta("orders", Seq("o_orderkey"), tsCol = Some("o_orderdate")),
    "lineitem" -> TableMeta("lineitem", Seq("l_orderkey", "l_linenumber"), tsCol = Some("l_shipdate")),
    "events" -> TableMeta("events", Seq("event_id"), tsCol = Some("ts")),
    "documents" -> TableMeta("documents", Seq("doc_id")),
    "embeddings" -> TableMeta("embeddings", Seq("vec_id")))
}
