package graft

import graft.sources.{Snapshot, Tables}
import org.apache.spark.sql.functions._

/** S2/S3/S6 over a REAL JDBC database — embedded Derby (bundled with
  * Spark for the Hive metastore), standing in for the reference's
  * MariaDB source and Postgres sink (migrate_v3.py:527-806). Closes the
  * "JDBC plan-only" gap: these are live reads/writes through
  * `spark.read.jdbc` / `df.write.jdbc`, not plan construction.
  */
class JdbcRoundTripSpec extends SparkSuite {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props = new java.util.Properties()

  private lazy val seeded: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        """CREATE TABLE t_deal (
          |  id BIGINT NOT NULL PRIMARY KEY,
          |  amount DOUBLE,
          |  status VARCHAR(8))""".stripMargin)
      val ps = conn.prepareStatement("INSERT INTO t_deal VALUES (?, ?, ?)")
      (1 to 1000).foreach { i =>
        ps.setLong(1, i.toLong); ps.setDouble(2, i * 1.5)
        ps.setString(3, if (i % 3 == 0) "OPEN" else "DONE")
        ps.addBatch()
      }
      ps.executeBatch(); ps.close(); st.close()
    } finally conn.close()
  }

  test("S2: single-partition JDBC snapshot reads the full table") {
    seeded
    val df = Snapshot.jdbcTable(spark, url, "t_deal", props)
    assert(df.count() == 1000L)
    assert(df.columns.map(_.toLowerCase).toSet == Set("id", "amount", "status"))
  }

  test("S3: range-partitioned JDBC scan splits into N real partitions, same rows") {
    seeded
    val whole = Snapshot.jdbcTable(spark, url, "t_deal", props)
    val (lo, hi, n) = Snapshot.pkRange(whole, "ID") // A7 planning feeds S3
    assert((lo, hi, n) == (1L, 1000L, 1000L))
    val part = Snapshot.jdbcPartitioned(spark, url, "t_deal", "ID", lo, hi,
      numPartitions = 4, props)
    assert(part.rdd.getNumPartitions == 4) // 4 concurrent BETWEEN scans
    assert(part.count() == 1000L)
    val sums = part.agg(sum(col("ID")).cast("long"), sum(col("AMOUNT"))).head()
    assert(sums.getLong(0) == 500500L && sums.getDouble(1) == 750750.0)
  }

  test("S6: JDBC bulk sink round-trips a parquet table through the database") {
    val src = Tables.nation(spark, sf001)
    src.write.mode("overwrite")
      .jdbc(url, "nation_sink", props)
    val back = spark.read.jdbc(url, "nation_sink", props)
    assert(back.count() == src.count())
    val got = back.select(lower(col("N_NAME")).as("n")).orderBy("n")
      .collect().map(_.getString(0)).toSeq
    val want = src.select(lower(col("n_name")).as("n")).orderBy("n")
      .collect().map(_.getString(0)).toSeq
    assert(got == want)
  }
}
