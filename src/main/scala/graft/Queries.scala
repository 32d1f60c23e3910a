package graft

import graft.catalog.TableMeta
import graft.functions.{Conversions, TextAnalysis, VectorFunctions}
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's query surface: one entry per SURVEY §2 operator (plus the
  * north-star dedup/similarity/text/multimodal extensions), each with an
  * equivalent DuckDB oracle SQL where SQL-expressible.
  *
  * Determinism rules shared by the Spark plan and the oracle SQL so that
  * result hashes match bit-for-bit:
  *  - every aggregate over doubles goes through exact DECIMAL sums
  *    (order-independent) and casts to DOUBLE only at the boundary;
  *  - per-row double arithmetic uses the identical operation order;
  *  - vector dot products fold arrays sequentially left-to-right in both
  *    engines (Spark `aggregate`, DuckDB `list_reduce`);
  *  - every query ends in a total ORDER BY (unique tiebreak).
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)
  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  // ---------------------------------------------------------------- A: aggregations

  /** A1 — row-count smoke scan per table (reference: tests/validation.py:336-397). */
  val a1RowcountSmoke: Q = (s, d) => {
    def cnt(name: String) =
      Tables(s, d, name).agg(count(lit(1)).cast("long").as("row_cnt"))
        .select(lit(name).as("table_name"), col("row_cnt"))
    Tables.all.map(cnt).reduce(_ unionByName _).orderBy("table_name")
  }
  val a1Sql: String =
    Tables.all
      .map(t => s"SELECT '$t' AS table_name, CAST(COUNT(*) AS BIGINT) AS row_cnt FROM $t")
      .mkString("", "\nUNION ALL ", "\nORDER BY table_name")

  /** A2 — composite distinct-PK cardinality (reference: tests/validation.py:399-461). */
  val a2DistinctPk: Q = (s, d) =>
    li(s, d).agg(
      count(lit(1)).cast("long").as("total_rows"),
      countDistinct(col("l_orderkey"), col("l_linenumber")).cast("long").as("distinct_pks"))
  val a2Sql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
      |  CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS distinct_pks
      |FROM lineitem""".stripMargin

  /** A3 — duplication + NULL-PK profile (reference: tests/validation.py:463-536). */
  val a3DupProfile: Q = (s, d) =>
    Validation.duplicationProfile(li(s, d), Seq("l_orderkey", "l_linenumber"))
  val a3Sql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS total_rows,
      |  CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS distinct_pks,
      |  CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS duplicate_rows,
      |  CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE) * 100.0
      |    / CAST(COUNT(*) AS DOUBLE) AS duplicate_pct,
      |  CAST(SUM(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS null_pk_rows
      |FROM lineitem""".stripMargin

  /** A4 — duplicate groups top-k (reference: tests/drift_analysis.py:150-157). */
  val a4DupGroups: Q = (s, d) =>
    Validation.duplicateGroups(li(s, d), Seq("l_orderkey"), 100)
  val a4Sql =
    """SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS occurrence_count
      |FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1
      |ORDER BY occurrence_count DESC, l_orderkey ASC LIMIT 100""".stripMargin

  /** A5 — freshness lag between two tables (reference: tests/validation.py:640-717). */
  val a5FreshnessLag: Q = (s, d) => {
    val src = li(s, d).agg(max(col("l_shipdate")).as("source_max_ts"))
    val snk = ord(s, d).agg(max(col("o_orderdate")).as("sink_max_ts"))
    src.crossJoin(snk).select(
      col("source_max_ts"), col("sink_max_ts"),
      ((unix_millis(col("source_max_ts").cast("timestamp"))
        - unix_millis(col("sink_max_ts").cast("timestamp")))
        .cast("double") / 60000.0).as("lag_minutes"))
  }
  val a5Sql =
    """SELECT CAST(s AS TIMESTAMP) AS source_max_ts, CAST(k AS TIMESTAMP) AS sink_max_ts,
      |  CAST(epoch_ms(CAST(s AS TIMESTAMP)) - epoch_ms(CAST(k AS TIMESTAMP)) AS DOUBLE)
      |    / 60000.0 AS lag_minutes
      |FROM (SELECT MAX(l_shipdate) AS s FROM lineitem), (SELECT MAX(o_orderdate) AS k FROM orders)""".stripMargin

  /** A6 — timestamp range profile per group (reference: tests/drift_analysis.py:227-280). */
  val a6TsRange: Q = (s, d) =>
    ev(s, d).groupBy(col("event_type")).agg(
      min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
      count(lit(1)).cast("long").as("row_cnt"))
      .orderBy("event_type")
  val a6Sql =
    """SELECT event_type, CAST(MIN(ts) AS TIMESTAMP) AS min_ts,
      |  CAST(MAX(ts) AS TIMESTAMP) AS max_ts, CAST(COUNT(*) AS BIGINT) AS row_cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** A7 — PK MIN/MAX/COUNT range planning (reference: migrate_v3.py:527-554). */
  val a7PkRange: Q = (s, d) =>
    ord(s, d).agg(
      min(col("o_orderkey")).cast("long").as("min_pk"),
      max(col("o_orderkey")).cast("long").as("max_pk"),
      count(lit(1)).cast("long").as("cnt"))
  val a7Sql =
    """SELECT CAST(MIN(o_orderkey) AS BIGINT) AS min_pk,
      |  CAST(MAX(o_orderkey) AS BIGINT) AS max_pk,
      |  CAST(COUNT(*) AS BIGINT) AS cnt FROM orders""".stripMargin

  /** Check 7 (documented-only in reference, tests/README.md:24-27) — NULL ratios. */
  val c7NullRatios: Q = (s, d) =>
    Validation.nullRatios(ord(s, d),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"))
  val c7Sql =
    """SELECT
      |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS null_ratio_o_orderkey,
      |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS null_ratio_o_custkey,
      |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS null_ratio_o_orderstatus,
      |  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS null_ratio_o_totalprice
      |FROM orders""".stripMargin

  /** Check 9 — aggregate invariants via exact decimal sums. */
  val c9AggInvariants: Q = (s, d) =>
    Validation.aggregateInvariants(li(s, d),
      Seq("l_quantity", "l_extendedprice", "l_discount"))
  val c9Sql =
    """SELECT
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_l_quantity,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_l_quantity,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_l_extendedprice,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_l_extendedprice,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) AS sum_l_discount,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE) AS avg_l_discount,
      |  CAST(COUNT(*) AS BIGINT) AS row_cnt
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- J: joins

  /** J1 — anti-join orphans: customers with no orders (reference:
    * tests/validation.py:538-638, distributed — no 10M cap).
    */
  val j1AntiJoin: Q = (s, d) =>
    Validation.orphans(
      cust(s, d).select(col("c_custkey").as("custkey")),
      ord(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey")),
      Seq("custkey")).orderBy("custkey")
  val j1Sql =
    """SELECT DISTINCT c_custkey AS custkey FROM customer
      |WHERE c_custkey IS NOT NULL
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL
      |                    AND o_custkey = c_custkey)
      |ORDER BY custkey""".stripMargin

  /** J3 — row-diff between source and (synthetically drifted) sink rows
    * (reference: tests/test_cdc_live.py:266-311).
    */
  val j3RowDiff: Q = (s, d) => {
    val src = ord(s, d)
    val snk = src.select(col("o_orderkey"),
      when(col("o_orderkey") % 100 === 0, col("o_totalprice") + 1.0)
        .otherwise(col("o_totalprice")).as("sink_price"))
    src.join(snk, "o_orderkey")
      .filter(col("o_totalprice") =!= col("sink_price"))
      .select(col("o_orderkey"), col("o_totalprice").as("source_price"), col("sink_price"))
      .orderBy("o_orderkey")
  }
  val j3Sql =
    """SELECT o_orderkey, o_totalprice AS source_price, o_totalprice + 1.0 AS sink_price
      |FROM orders WHERE o_orderkey % 100 = 0 AND o_totalprice + 1.0 <> o_totalprice
      |ORDER BY o_orderkey""".stripMargin

  /** J4 — existence semi-join (reference: tests/test_cdc_live.py:268-272).
    * Shuffle-hash pinned: the build side is every order's custkey —
    * ~10× the probe side by TPC-H shape — but bigint keys compress
    * under AQE's broadcast threshold at bench scale (sf10: a 15 M-key
    * hashed relation built and shipped for a "small" side; isolated
    * 7.2 s broadcast vs ~2 s pinned — the c6/ghostRows cliff class).
    */
  val j4SemiJoin: Q = (s, d) =>
    cust(s, d).select(col("c_custkey").as("custkey"), col("c_name"))
      .join(ord(s, d).select(col("o_custkey").as("custkey")).hint("shuffle_hash"),
        Seq("custkey"), "left_semi")
      .orderBy("custkey")
  val j4Sql =
    """SELECT c_custkey AS custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------------- P: projections / filters

  /** P1 — allowlist include filter (reference: sources/mariadb/trading.json:14-16). */
  val p1IncludeFilter: Q = (s, d) =>
    ev(s, d).filter(col("event_type").isin("click", "view"))
      .select(col("event_id"), col("event_type"), col("user_id"))
      .orderBy("event_id")
  val p1Sql =
    """SELECT event_id, event_type, user_id FROM events
      |WHERE event_type IN ('click', 'view') ORDER BY event_id""".stripMargin

  /** P2 — topic-regex subscribe filter (reference: sinks/postgres/trading.json:11). */
  val p2TopicRegex: Q = (s, d) =>
    ev(s, d).filter(col("event_type").rlike("^(click|purchase)$"))
      .select(col("event_id"), col("event_type")).orderBy("event_id")
  val p2Sql =
    """SELECT event_id, event_type FROM events
      |WHERE regexp_matches(event_type, '^(click|purchase)$') ORDER BY event_id""".stripMargin

  /** P4 — RegexRouter topic → sink table (reference: sinks/postgres/trading.json:32-35). */
  val p4Route: Q = (s, d) =>
    ev(s, d).select(
      concat(lit("xchange_trading_v2.xchange_trading.T_"), upper(col("event_type")))
        .as("topic")).distinct()
      .withColumn("sink_table",
        Envelope.route(col("topic"), "^[^.]+\\.[^.]+\\.(.*)$", "trading_$1"))
      .orderBy("topic")
  val p4Sql =
    """SELECT topic, lower(regexp_replace(topic, '^[^.]+\.[^.]+\.(.*)$', 'trading_\1')) AS sink_table
      |FROM (SELECT DISTINCT 'xchange_trading_v2.xchange_trading.T_' || UPPER(event_type) AS topic FROM events)
      |ORDER BY topic""".stripMargin

  /** P9 — PK point lookup at the MIN key (reference: tests/test_cdc_live.py:128-153). */
  val p9PointLookup: Q = (s, d) => {
    val o = ord(s, d)
    o.join(broadcast(o.agg(min(col("o_orderkey")).as("__mk"))),
      col("o_orderkey") === col("__mk")).drop("__mk")
  }
  val p9Sql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM orders)""".stripMargin

  /** P10 — NULL-PK rows (reference: tests/validation.py:491-497). */
  val p10NullPk: Q = (s, d) =>
    li(s, d).filter(col("l_orderkey").isNull || col("l_linenumber").isNull)
      .agg(count(lit(1)).cast("long").as("null_pk_rows"))
  val p10Sql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS null_pk_rows FROM lineitem
      |WHERE l_orderkey IS NULL OR l_linenumber IS NULL""".stripMargin

  // ---------------------------------------------------------------- F: scalar conversions

  /** F1–F4 / P5 / P7 — type-repair conversions (reference: migrate_v3.py:250-280). */
  val f1f4Typeconv: Q = (s, d) =>
    ord(s, d).select(
      col("o_orderkey"),
      Conversions.bitBytesToBool(
        when(col("o_orderkey") % 2 === 0, lit(Array[Byte](0.toByte)))
          .otherwise(lit(Array[Byte](1.toByte)))).as("bit_flag"),
      Conversions.tinyintToBool(col("o_orderkey") % 3).as("tinyint_flag"),
      Conversions.zeroDateToNull(
        when(col("o_orderkey") % 5 === 0, lit("0000-00-00 00:00:00"))
          .otherwise(col("o_orderdate").cast("string"))).as("fixed_date"),
      Conversions.stripNul(concat(col("o_orderpriority"), lit("\u0000"), lit("x")))
        .as("clean_text"))
      .orderBy("o_orderkey")
  val f1f4Sql =
    """SELECT o_orderkey,
      |  (o_orderkey % 2) <> 0 AS bit_flag,
      |  (o_orderkey % 3) <> 0 AS tinyint_flag,
      |  CASE WHEN o_orderkey % 5 = 0 THEN NULL
      |       ELSE CAST(CAST(o_orderdate AS TIMESTAMP) AS VARCHAR) END AS fixed_date,
      |  replace(o_orderpriority || chr(0) || 'x', chr(0), '') AS clean_text
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** F5–F7 — COPY encoders (reference: migrate_v3.py:617-631). */
  val f5f7CopyEncode: Q = (s, d) =>
    docs(s, d).filter(col("doc_id") < 50).select(
      col("doc_id"),
      Conversions.bytesToPgHex(substring(col("text"), 1, 8).cast("binary")).as("hexed"),
      Conversions.boolToPgText(col("doc_id") % 2 === 0).as("bool_txt"),
      Conversions.copyEscape(
        concat(lit("a\tb\\c\nd"), substring(col("text"), 1, 5))).as("escaped"))
      .orderBy("doc_id")
  val f5f7Sql =
    """SELECT doc_id,
      |  '\x' || lower(hex(CAST(substr(text, 1, 8) AS BLOB))) AS hexed,
      |  CASE WHEN doc_id % 2 = 0 THEN 't' ELSE 'f' END AS bool_txt,
      |  replace(replace(replace(replace(
      |    'a' || chr(9) || 'b\c' || chr(10) || 'd' || substr(text, 1, 5),
      |    '\', '\\'), chr(10), '\n'), chr(13), '\r'), chr(9), '\t') AS escaped
      |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- W: windows / CDC

  /** W1 — latest-event-per-key (reference: sinks/postgres/trading.json:13-14). */
  val w1LatestPerKey: Q = (s, d) =>
    CdcMerge.latestPerKey(ev(s, d), Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts"))
      .orderBy("user_id")
  val w1Sql =
    """SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
      |FROM (SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
      |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** W2 — duplicate-group ranking as a window (reference: tests/drift_analysis.py:150-157). */
  val w2DupRank: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
    li(s, d).select(col("l_orderkey"), col("l_linenumber"),
      count(lit(1)).over(w).cast("long").as("group_size"))
      .orderBy("l_orderkey", "l_linenumber")
  }
  val w2Sql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(COUNT(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS group_size
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- CDC pipeline ops

  private def eventChanges(s: SparkSession, d: String): DataFrame =
    ev(s, d).withColumn("__op",
      when(col("event_type") === "error", lit(Envelope.OpDelete)).otherwise(lit("u")))

  /** P3 — envelope wrap/unwrap round trip (reference:
    * sources/mariadb/trading.json:73-76 ExtractNewRecordState).
    */
  val cdcUnwrap: Q = (s, d) => {
    val e = ev(s, d)
    val env = Envelope.wrap(e, "testdb", "events",
      when(col("event_type") === "error", lit("d")).otherwise(lit("u")),
      unix_millis(col("ts").cast("timestamp")))
    Envelope.unwrap(env)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("ts"), col("__op"), col("__source_ts_ms"), col("__db"), col("__table"))
      .orderBy("event_id")
  }
  val cdcUnwrapSql =
    """SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
      |  CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS __op,
      |  epoch_ms(CAST(ts AS TIMESTAMP)) AS __source_ts_ms,
      |  'testdb' AS __db, 'events' AS __table
      |FROM events ORDER BY event_id""".stripMargin

  /** S7/T3 — batch upsert/delete apply onto a materialized table
    * (reference: sinks/postgres/trading.json:13-15).
    */
  val cdcUpsertApply: Q = (s, d) => {
    val current = ord(s, d)
    val changes = current
      .filter(col("o_orderkey") % 3 === 0 || col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 =!= 0, col("o_totalprice") + 1000.0)
          .otherwise(col("o_totalprice")))
      .withColumn("__op",
        when(col("o_orderkey") % 7 === 0, lit(Envelope.OpDelete)).otherwise(lit("u")))
      .withColumn("__source_ts_ms", lit(1L))
      .withColumn("__seq", col("o_orderkey"))
    CdcMerge.applyChanges(current, changes, Seq("o_orderkey"),
      Seq(col("__source_ts_ms"), col("__seq")))
      .orderBy("o_orderkey")
  }
  val cdcUpsertApplySql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 3 = 0 AND o_orderkey % 7 <> 0
      |       THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
      |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey % 7 <> 0 ORDER BY o_orderkey""".stripMargin

  /** T1/T3 — changelog materialization: latest state per key, deletes
    * applied (Kafka-compaction semantics).
    */
  val cdcMaterialize: Q = (s, d) => {
    val changes = eventChanges(s, d)
    val current = ev(s, d).limit(0)
    CdcMerge.applyChanges(current, changes, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts"))
      .orderBy("user_id")
  }
  val cdcMaterializeSql =
    """SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
      |FROM (SELECT user_id, event_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
      |        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin

  /** Changelog per-op statistics (monitoring of T1). */
  val cdcChangelogStats: Q = (s, d) =>
    CdcMerge.changelogStats(eventChanges(s, d), Seq("user_id"))
  val cdcChangelogStatsSql =
    """SELECT CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS __op,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- O: sort / limit / sample

  /** O1 — keyed pagination (reference: migrate_v3.py:603-607). */
  val o1Pagination: Q = (s, d) =>
    ord(s, d).select(col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_orderkey").offset(100).limit(50)
  val o1Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin

  /** O2 — top-k (reference: tests/drift_analysis.py:156-157). */
  val o2Topk: Q = (s, d) =>
    ord(s, d).select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc).limit(100)
  val o2Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin

  /** O3 — deterministic pseudo-random sample: md5-keyed order replaces
    * ORDER BY RAND() (reference: tests/test_cdc_live.py:114-125) so the
    * oracle can reproduce it.
    */
  val o3Sample: Q = (s, d) =>
    ord(s, d).select(col("o_orderkey"))
      .orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey")).limit(5)
  val o3Sql =
    """SELECT o_orderkey FROM orders
      |ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey LIMIT 5""".stripMargin

  /** Set op — EXCEPT shape (SURVEY §2.8). */
  val x1Except: Q = (s, d) =>
    ord(s, d).filter(col("o_orderstatus") === "P").select(col("o_orderkey").as("orderkey"))
      .except(li(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("orderkey")))
      .orderBy("orderkey")
  val x1Sql =
    """SELECT o_orderkey AS orderkey FROM orders WHERE o_orderstatus = 'P'
      |EXCEPT SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
      |ORDER BY orderkey""".stripMargin

  /** Set op — INTERSECT: order keys present both as 'P'-status orders
    * and as returned lineitems.
    */
  val x2Intersect: Q = (s, d) =>
    ord(s, d).filter(col("o_orderstatus") === "P").select(col("o_orderkey").as("orderkey"))
      .intersect(li(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("orderkey")))
      .orderBy("orderkey")
  val x2Sql =
    """SELECT o_orderkey AS orderkey FROM orders WHERE o_orderstatus = 'P'
      |INTERSECT SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
      |ORDER BY orderkey""".stripMargin

  /** Set op — UNION (distinct): all keys appearing on either side. */
  val x3Union: Q = (s, d) =>
    ord(s, d).filter(col("o_orderstatus") === "P").select(col("o_orderkey").as("orderkey"))
      .union(li(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("orderkey")))
      .distinct()
      .orderBy("orderkey")
  val x3Sql =
    """SELECT o_orderkey AS orderkey FROM orders WHERE o_orderstatus = 'P'
      |UNION SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
      |ORDER BY orderkey""".stripMargin

  // ---------------------------------------------------------------- Q: analytic joins/aggs

  private def decimal(c: String) = col(c).cast("decimal(18,4)")

  /** Exact disc-price revenue sum, bit-reproducible as a double across
    * engines AT SCALE: the raw SUM carries scale 8, and once its scaled
    * integer passes 2^53 (~9e7 in revenue units — sf0.1 already does)
    * DuckDB's int->double conversion rounds where Java's
    * BigDecimal.doubleValue is correctly rounded, drifting the last ulp.
    * The product price*(1-disc) has at most 4 real decimal places (2+2),
    * so rescaling the sum to scale 4 is LOSSLESS and buys 4 more orders
    * of magnitude of exact-integer headroom before the double cast.
    */
  private def discPriceSum: Column =
    sum(decimal("l_extendedprice") * (lit(1) - decimal("l_discount")))
      .cast("decimal(28,4)").cast("double")

  /** TPC-H Q1-shaped pricing summary (exact decimal arithmetic). */
  val q1Agg: Q = (s, d) =>
    li(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(28,4)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(28,4)")).cast("double").as("sum_base_price"),
        discPriceSum.as("sum_disc_price"),
        count(lit(1)).cast("long").as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_disc_price,
      |  CAST(COUNT(*) AS BIGINT) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-shaped: top unshipped-revenue orders for one segment;
    * customer dimension broadcast.
    */
  val q3TopkJoin: Q = (s, d) => {
    val c = cust(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = ord(s, d)
    val l = li(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(discPriceSum.as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }
  val q3Sql =
    """SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(28,4)) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** TPC-H Q5-shaped star join: revenue by customer nation/region;
    * dimensions broadcast.
    */
  val q5StarJoin: Q = (s, d) => {
    val n = Tables.nation(s, d); val r = Tables.region(s, d)
    li(s, d)
      .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        discPriceSum.as("revenue"),
        count(lit(1)).cast("long").as("n_items"))
      .orderBy("r_name", "n_name")
  }
  val q5Sql =
    """SELECT r_name, n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(28,4)) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** S2/S6-shaped snapshot scan: full typed projection of the largest
    * table (bench: scan throughput; reference: migrate_v3.py:766-806).
    */
  val snapLoad: Q = (s, d) =>
    Conversions.lowercaseColumns(li(s, d)).orderBy("l_orderkey", "l_linenumber")

  /** The whole validation suite (checks 1–6) over orders-vs-drifted-sink
    * as one benchmarkable entry (rows-only oracle: multi-action driver
    * logic). BASELINE target: < 10 s at sf0.1.
    */
  val validationSuite: Q = (s, d) => {
    val source = li(s, d)
    val sink = source.filter(col("l_orderkey") % 97 =!= 0)
      .unionByName(source.filter(col("l_orderkey") % 31 === 0))
    val report = Validation.runAllChecks(source, sink,
      graft.catalog.TableMeta.testTables("lineitem"))
    import s.implicits._
    report.checks.map(c => (report.table, c.check, c.status,
      c.details.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString("; ")))
      .toDF("table_name", "check", "status", "details")
  }
  val snapLoadSql =
    """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
      |  CAST(l_shipdate AS TIMESTAMP) AS l_shipdate
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Oracle for the full validation-suite report: the drift injection is
    * deterministic (`% 97` drop, `% 31` duplicate), so every check row —
    * status AND the rendered detail string — is computable in SQL from
    * the same lineitem table. Reproduces `runAllChecks`'s semantics:
    * thresholds (1%/0.1% drift, 15-min SLA with 80% WARN band), the
    * shared anti-join feeding both orphan and delete rows, and the
    * key-sorted `k=v; k=v` detail rendering.
    */
  val validationSuiteSql: String =
    """WITH sink AS (
      |  SELECT * FROM lineitem WHERE l_orderkey % 97 <> 0
      |  UNION ALL SELECT * FROM lineitem WHERE l_orderkey % 31 = 0
      |),
      |sp AS (
      |  SELECT count(*) AS total, count(DISTINCT (l_orderkey, l_linenumber)) AS dpk,
      |         coalesce(sum(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL THEN 1 ELSE 0 END), 0) AS nullpk,
      |         max(l_shipdate) AS maxts
      |  FROM lineitem),
      |kp AS (
      |  SELECT count(*) AS total, count(DISTINCT (l_orderkey, l_linenumber)) AS dpk,
      |         coalesce(sum(CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL THEN 1 ELSE 0 END), 0) AS nullpk,
      |         max(l_shipdate) AS maxts
      |  FROM sink),
      |orph AS (
      |  SELECT count(*) AS n FROM (
      |    SELECT DISTINCT s.l_orderkey, s.l_linenumber FROM sink s
      |    WHERE s.l_orderkey IS NOT NULL AND s.l_linenumber IS NOT NULL
      |      AND NOT EXISTS (SELECT 1 FROM lineitem t
      |        WHERE t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber))),
      |drift AS (
      |  SELECT CASE WHEN sp.total = 0 THEN (CASE WHEN kp.total = 0 THEN 0.0 ELSE 100.0 END)
      |              ELSE abs(sp.total - kp.total) * 100.0 / sp.total END AS pct
      |  FROM sp, kp),
      |lagm AS (SELECT (epoch_ms(sp.maxts) - epoch_ms(kp.maxts)) / 60000.0 AS m FROM sp, kp),
      |rec AS (
      |  SELECT (SELECT count(*) FROM lineitem, sp WHERE l_shipdate > sp.maxts - INTERVAL 60 MINUTE) AS s,
      |         (SELECT count(*) FROM sink, sp WHERE l_shipdate > sp.maxts - INTERVAL 60 MINUTE) AS k),
      |ncols AS (SELECT count(*) AS n FROM (DESCRIBE SELECT * FROM lineitem))
      |SELECT 'lineitem' AS table_name, 'schema_shape' AS "check", 'PASS' AS status,
      |       'columns_checked=' || n || '; diffs=' AS details FROM ncols
      |UNION ALL
      |SELECT 'lineitem', 'row_count_smoke',
      |       CASE WHEN pct >= 1.0 THEN 'FAIL' WHEN pct >= 0.1 THEN 'WARN' ELSE 'PASS' END,
      |       'drift_pct=' || printf('%.4f', pct) || '; sink_rows=' || kp.total || '; source_rows=' || sp.total
      |FROM drift, sp, kp
      |UNION ALL
      |SELECT 'lineitem', 'distinct_pk_cardinality',
      |       CASE WHEN sp.dpk = kp.dpk THEN 'PASS' ELSE 'FAIL' END,
      |       'sink_distinct=' || kp.dpk || '; source_distinct=' || sp.dpk || '; verdict=' ||
      |         CASE WHEN kp.dpk > sp.dpk THEN 'phantom_rows' WHEN kp.dpk < sp.dpk THEN 'data_loss' ELSE 'ok' END
      |FROM sp, kp
      |UNION ALL
      |SELECT 'lineitem', 'duplication_profile',
      |       CASE WHEN kp.total - kp.dpk = 0 AND kp.nullpk = 0 THEN 'PASS' ELSE 'WARN' END,
      |       'duplicate_rows=' || (kp.total - kp.dpk) || '; null_pk_rows=' || kp.nullpk || '; total_rows=' || kp.total
      |FROM kp
      |UNION ALL
      |SELECT 'lineitem', 'anti_join_orphans', CASE WHEN n = 0 THEN 'PASS' ELSE 'FAIL' END,
      |       'orphans=' || n FROM orph
      |UNION ALL
      |SELECT 'lineitem', 'delete_semantics', CASE WHEN n = 0 THEN 'PASS' ELSE 'FAIL' END,
      |       'ghost_rows=' || n FROM orph
      |UNION ALL
      |SELECT 'lineitem', 'freshness_lag',
      |       CASE WHEN m IS NULL THEN 'WARN' WHEN m > 15.0 THEN 'FAIL' WHEN m > 12.0 THEN 'WARN' ELSE 'PASS' END,
      |       'lag_minutes=' || printf('%.4f', m) || '; sink_max_ts=' || strftime(kp.maxts, '%Y-%m-%d %H:%M:%S') ||
      |         '; source_max_ts=' || strftime(sp.maxts, '%Y-%m-%d %H:%M:%S')
      |FROM lagm, sp, kp
      |UNION ALL
      |SELECT 'lineitem', 'recent_activity',
      |       CASE WHEN s > 0 AND k = 0 THEN 'FAIL' WHEN k < s THEN 'WARN' ELSE 'PASS' END,
      |       'sink_recent=' || k || '; source_recent=' || s || '; window_minutes=60'
      |FROM rec""".stripMargin
}
