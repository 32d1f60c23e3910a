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
}
