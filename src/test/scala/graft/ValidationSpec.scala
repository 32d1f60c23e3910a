package graft

import graft.catalog.TableMeta
import graft.operators.Validation
import graft.sources.Tables
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSuite {

  private lazy val li = Tables.lineitem(spark, sf001)
  private val meta = TableMeta.testTables("lineitem")

  test("clean sink passes all checks") {
    // orders has a clean PK; lineitem carries driver-injected duplicates
    val o = Tables.orders(spark, sf001)
    val report = Validation.runAllChecks(o, o, TableMeta.testTables("orders"))
    assert(report.status == "PASS" && report.cdcConsistent)
  }

  test("source-carried duplicates surface as a WARN on the sink profile") {
    val report = Validation.runAllChecks(li, li, meta)
    assert(report.status == "WARN") // lineitem itself has duplicate PKs
  }

  test("injected duplicates + loss are flagged") {
    val sink = li.filter(col("l_orderkey") % 97 =!= 0) // loss
      .unionByName(li.filter(col("l_orderkey") % 31 === 0)) // duplicates
    val report = Validation.runAllChecks(li, sink, meta)
    assert(!report.cdcConsistent)
    val byName = report.checks.map(c => c.check -> c.status).toMap
    assert(byName("distinct_pk_cardinality") == "FAIL")
    assert(byName("duplication_profile") == "WARN")
  }

  test("orphans (phantom sink rows) are detected by the anti-join") {
    val phantom = li.limit(5)
      .withColumn("l_orderkey", lit(999999999L))
      .withColumn("l_linenumber",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(monotonically_increasing_id())))
    val sink = li.unionByName(phantom)
    val orphans = Validation.orphans(sink, li, meta.pkCols)
    assert(orphans.count() == 5)
    val report = Validation.runAllChecks(li, sink, meta)
    assert(report.checks.exists(c => c.check == "anti_join_orphans" && c.status == "FAIL"))
  }

  test("anti_join_orphans and delete_semantics report the SAME counter by design") {
    // fused-suite contract (Validation.fusedSuiteProfile): in a keyed
    // CDC mirror an unpropagated delete IS an orphan — both are the
    // sink⟂source anti-join on PK — so runAllChecks feeds ONE orphan
    // counter into both report rows. Pin it with a sink that carries
    // BOTH flavors at once: a ghost from a missed delete (source rows
    // removed, sink kept) and a phantom from bad routing (sink row that
    // never existed upstream). A future reader must not "fix" this into
    // two separate anti-join jobs — the semantics are identical; only
    // the narrative differs.
    val ghosts = li.filter(col("l_orderkey") % 101 === 0) // will be "deleted" upstream
    val source = li.exceptAll(ghosts)
    val phantom = li.limit(3)
      .withColumn("l_orderkey", lit(888888888L))
      .withColumn("l_linenumber",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(monotonically_increasing_id())))
    val sink = li.unionByName(phantom)
    val expected = Validation.orphans(sink, source, meta.pkCols).count()
    assert(expected > 3, s"fixture must carry both ghost and phantom keys, got $expected")
    val report = Validation.runAllChecks(source, sink, meta)
    val byName = report.checks.map(c => c.check -> c).toMap
    assert(byName("anti_join_orphans").status == "FAIL")
    assert(byName("delete_semantics").status == "FAIL")
    assert(byName("anti_join_orphans").details("orphans") == expected.toString)
    assert(byName("delete_semantics").details("ghost_rows") == expected.toString,
      "delete_semantics must report the same fused counter as anti_join_orphans")
  }

  test("HLL approx distinct agrees with exact within rsd") {
    val exact = li.select("l_orderkey").distinct().count()
    val approx = Validation.distinctPkApprox(li, Seq("l_orderkey"), rsd = 0.02)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("freshness lag computed from max timestamps") {
    val snk = li.orderBy("l_shipdate").limit(100) // 100 earliest rows: stale sink
    val r = Validation.freshness(li, snk, "l_shipdate", slaMinutes = 15.0)
    assert(r.status == "FAIL")
    val clean = Validation.freshness(li, li, "l_shipdate", slaMinutes = 15.0)
    assert(clean.status == "PASS")
  }

  test("check 1: schema-shape diff flags missing/type-mismatch, tolerates repairs") {
    import org.apache.spark.sql.types._
    val source = StructType(Seq(
      StructField("ID", LongType), StructField("user", StringType),
      StructField("active", ByteType), StructField("amount", DoubleType),
      StructField("note", StringType)))
    val sink = StructType(Seq(
      StructField("id", LongType),
      StructField("owner_user_id", StringType), // configured rename
      StructField("active", BooleanType),       // bit(1) repair -> allowed
      StructField("amount", StringType),        // genuine type drift -> FAIL
      StructField("added_later", IntegerType),  // extra -> WARN-only
      StructField("__op", StringType)))         // engine metadata ignored
    // `note` missing in sink -> FAIL
    val m = TableMeta("t", Seq("ID"), bitCols = Seq("active"),
      renames = Map("user" -> "owner_user_id"))
    val (check, diffs) = Validation.schemaShape(source, sink, m)
    assert(check.status == "FAIL")
    val byCol = diffs.map(d => d.column -> d.status).toMap
    assert(byCol("amount") == "type_mismatch")
    assert(byCol("note") == "missing_in_sink")
    assert(byCol("added_later") == "extra_in_sink")
    assert(!byCol.contains("active") && !byCol.contains("owner_user_id"))
    // identical schemas -> PASS
    assert(Validation.schemaShape(source, source, m.copy(renames = Map.empty))
      ._1.status == "PASS")
  }

  test("check 5: recent-activity flow distinguishes stalled from lagging sinks") {
    val ev = Tables.events(spark, sf001)
    // flowing: identical sides
    assert(Validation.recentActivity(ev, ev, "ts").status == "PASS")
    // stalled: sink has NOTHING in the last hour of source activity
    val anchor = ev.agg(max(col("ts")).as("mx"))
    val stalled = ev.crossJoin(broadcast(anchor))
      .filter(col("ts") <= col("mx") - expr("INTERVAL 100 DAYS")).drop("mx")
    assert(Validation.recentActivity(ev, stalled, "ts").status == "FAIL")
    // partially flowing: some recent rows missing
    val lagging = ev.crossJoin(broadcast(anchor))
      .filter(col("ts") <= col("mx") - expr("INTERVAL 30 MINUTES")).drop("mx")
    val r = Validation.recentActivity(ev, lagging, "ts")
    assert(r.status == "WARN" || r.status == "FAIL") // depends on data density in window
  }

  test("check 10: coverage report flags missing/empty tables") {
    val tables = Map(
      "orders" -> Tables.orders(spark, sf001),
      "customer" -> Tables.customer(spark, sf001),
      "empty_t" -> Tables.orders(spark, sf001).limit(0))
    // "ghost" is allowlisted but never materialized (sinkTable -> None):
    // must report covered=false, not crash — even when it sorts first
    val rep = Validation.cdcCoverage(spark,
      Seq("a_ghost", "orders", "customer", "empty_t"), tables.get)
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rep("orders") && rep("customer") && !rep("empty_t") && !rep("a_ghost"))
    assert(Validation.cdcCoverage(spark, Nil, tables.get).count() == 0L)
  }

  test("check 6: ghosts are sink rows whose PK was deleted upstream") {
    val sink = Tables.orders(spark, sf001)
    val source = sink.filter(col("o_orderkey") % 100 =!= 0)
    assert(Validation.deleteSemantics(source, sink, Seq("o_orderkey")).status == "FAIL")
    // forward direction is clean: deletes, not orphans
    assert(Validation.deleteSemantics(sink, source, Seq("o_orderkey")).status == "PASS")
  }

  test("check 8: sampled content diff finds a planted corruption, NULL-safe") {
    val src = Tables.orders(spark, sf001)
    val corrupted = src.withColumn("o_orderstatus",
      when(col("o_orderkey") % 37 === 0, lit(null: String)) // NULL corruption too
        .otherwise(col("o_orderstatus")))
    val r = Validation.sampleContent(src, corrupted, Seq("o_orderkey"), 200).head()
    assert(r.getLong(0) == 200L && r.getLong(1) > 0L && r.getString(2) == "FAIL")
    val clean = Validation.sampleContent(src, src, Seq("o_orderkey"), 200).head()
    assert(clean.getLong(1) == 0L && clean.getString(2) == "PASS")
    // missing sink rows count as mismatches
    val truncated = Validation.sampleContent(
      src, src.filter(col("o_orderkey") % 2 === 0), Seq("o_orderkey"), 200).head()
    assert(truncated.getLong(1) > 0L)
    // duplicate-PK sink must not fan out the sample: a key with one clean
    // and one corrupt copy still matches, and sampled_rows stays 200
    val dupSink = src.unionByName(
      src.withColumn("o_orderstatus", lit("X")))
    val dup = Validation.sampleContent(src, dupSink, Seq("o_orderkey"), 200).head()
    assert(dup.getLong(0) == 200L && dup.getLong(1) == 0L)
    // PK-only schemas degrade to an existence check instead of crashing
    val pkOnly = Validation.sampleContent(
      src.select("o_orderkey"), src.select("o_orderkey"), Seq("o_orderkey"), 50).head()
    assert(pkOnly.getLong(0) == 50L && pkOnly.getString(2) == "PASS")
  }

  test("runAllChecks now includes schema-shape, delete, and recent-activity rows") {
    val ev = Tables.events(spark, sf001)
    val report = Validation.runAllChecks(ev, ev, TableMeta.testTables("events"))
    val names = report.checks.map(_.check)
    assert(names.contains("schema_shape") && names.contains("recent_activity"))
    assert(names.contains("delete_semantics"))
    assert(report.status == "PASS")
  }

  test("null-PK rows counted separately, excluded from anti-join") {
    import spark.implicits._
    val src = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val snk = Seq((Some(1L), "a"), (None, "x"), (Some(9L), "o")).toDF("k", "v")
    assert(Validation.nullPkRows(snk, Seq("k")).count() == 1)
    val orphans = Validation.orphans(snk, src, Seq("k"))
    assert(orphans.as[Long].collect().toSeq == Seq(9L)) // null key not an orphan
  }
}

class ValidationRunnerSpec extends SparkSuite {
  import graft.catalog.TableMeta
  import graft.operators.ValidationRunner
  import graft.sources.Tables
  import org.apache.spark.sql.functions._

  test("multi-table suite folds statuses and renders a report") {
    val o = Tables.orders(spark, sf001)
    val c = Tables.customer(spark, sf001)
    val driftedOrders = o.filter(col("o_orderkey") % 50 =!= 0) // 2% loss -> FAIL smoke
    val suite = ValidationRunner.runAll(Seq(
      (TableMeta.testTables("orders"), o, driftedOrders),
      (TableMeta.testTables("customer"), c, c)))
    assert(suite.reports.size == 2)
    assert(!suite.allConsistent && suite.exitCode == 1)
    val text = ValidationRunner.render(suite)
    assert(text.contains("[FAIL] orders") || text.contains("[WARN] orders"))
    assert(text.contains("[PASS] customer"))
    assert(text.contains("OVERALL: INCONSISTENT"))
  }

  test("clean suite exits 0") {
    val c = Tables.customer(spark, sf001)
    val suite = ValidationRunner.runAll(Seq((TableMeta.testTables("customer"), c, c)))
    assert(suite.allConsistent && suite.exitCode == 0)
    assert(ValidationRunner.render(suite).contains("OVERALL: CONSISTENT"))
  }

  test("Slack blocks render header/summary/failure-breakdown/common-causes for a FAIL suite") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val o = Tables.orders(spark, sf001)
    val c = Tables.customer(spark, sf001)
    // inject loss AND phantoms so the orphan metric line has content
    val drifted = o.filter(col("o_orderkey") % 50 =!= 0)
      .unionByName(o.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L)))
    val suite = ValidationRunner.runAll(Seq(
      (TableMeta.testTables("orders"), o, drifted),
      (TableMeta.testTables("customer"), c, c)))
    val json = ValidationRunner.renderSlackBlocks(suite,
      database = Some("xchange_trading"), mentionUser = Some("<@U123>"),
      timestamp = "2026-08-12 00:00:00 UTC")
    val parsed = JsonMethods.parse(json)
    val blocks = (parsed \ "blocks").asInstanceOf[JArray].arr
    assert(blocks.size == 4) // header, summary, failures, common causes
    val JString(header) = blocks(0) \ "text" \ "text"
    assert(header.startsWith(":x:") && header.contains("XCHANGE_TRADING")
      && header.endsWith("FAILURES DETECTED"))
    val fields = (blocks(1) \ "fields").asInstanceOf[JArray].arr
    assert(fields.size == 6)
    val fieldTexts = fields.map(f => { val JString(t) = f \ "text"; t })
    assert(fieldTexts.exists(_ == "*Total Tables:*\n2"))
    assert(fieldTexts.exists(_ == "*CDC Consistent:*\n1/2"))
    assert(fieldTexts.exists(_ == "*Timestamp:*\n2026-08-12 00:00:00 UTC"))
    val JString(failures) = blocks(2) \ "text" \ "text"
    assert(failures.startsWith("<@U123> *Failed Tables (1):*"))
    assert(failures.contains("*orders*"))
    assert(failures.contains("orphan rows")) // anti-join metric summary
    val JString(causes) = blocks(3) \ "text" \ "text"
    assert(causes.startsWith("*Common Causes:*")
      && causes.contains("Snapshot + streaming replay overlap"))
    // fallback text mirrors the status
    val JString(fallback) = parsed \ "text"
    assert(fallback == "CDC Validation Report - FAILURES DETECTED")
    // a clean suite renders just header + summary, no failure sections
    val clean = ValidationRunner.runAll(Seq((TableMeta.testTables("customer"), c, c)))
    val cleanBlocks = (JsonMethods.parse(ValidationRunner.renderSlackBlocks(clean))
      \ "blocks").asInstanceOf[JArray].arr
    assert(cleanBlocks.size == 2)
  }
}
