package graft

import graft.operators.{CdcMerge, Envelope, ParquetUpsertTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

case class KV(k: Long, v: String)

class CdcSpec extends SparkSuite {
  import spark.implicits._

  private def changes(rows: (Long, String, String, Long)*) = // (k, v, op, ts)
    rows.toSeq.toDF("k", "v", "__op", "__source_ts_ms")
      .withColumn("__seq", monotonically_increasing_id())

  test("W1 latest-per-key resolves ts ties by sequence") {
    val df = Seq(
      (1L, "a", "u", 10L, 0L), (1L, "b", "u", 10L, 1L), // tie on ts -> seq wins
      (2L, "x", "u", 5L, 2L), (2L, "y", "u", 9L, 3L))
      .toDF("k", "v", "__op", "__source_ts_ms", "__seq")
    val got = CdcMerge.latestPerKey(df, Seq("k"), Seq(col("__source_ts_ms"), col("__seq")))
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b", 2L -> "y"))
  }

  test("applyChanges upserts, inserts and deletes") {
    val current = Seq(KV(1, "old"), KV(2, "keep"), KV(3, "dead")).toDS().toDF()
    val ch = changes((1L, "new", "u", 1L), (3L, "", "d", 1L), (4L, "ins", "c", 1L))
    val got = CdcMerge.applyChanges(current, ch, Seq("k"),
      Seq(col("__source_ts_ms"), col("__seq")))
      .as[KV].collect().sortBy(_.k)
    assert(got.toSeq == Seq(KV(1, "new"), KV(2, "keep"), KV(4, "ins")))
  }

  test("applyChanges is idempotent under replay (T9)") {
    val current = Seq(KV(1, "old"), KV(2, "keep")).toDS().toDF()
    val ch = changes((1L, "new", "u", 1L), (2L, "", "d", 2L))
    val once = CdcMerge.applyChanges(current, ch, Seq("k"),
      Seq(col("__source_ts_ms"), col("__seq")))
    val twice = CdcMerge.applyChanges(once, ch, Seq("k"),
      Seq(col("__source_ts_ms"), col("__seq")))
    assert(twice.as[KV].collect().toSeq.sortBy(_.k) == Seq(KV(1, "new")))
  }

  // The anti-join admission gate (r15/r16): the pin must respond to the
  // TRUE batch size (hint or memoized count), and "-1" (broadcast
  // disabled session-wide) must disable the gate entirely — the plain
  // long parse, not byteStringAsBytes, handles it.
  private def hintedShuffleHash(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
          if h.hints.strategy.exists(_.toString.contains("shuffle_hash")) => h
    }.nonEmpty

  test("applyChanges pins shuffle_hash only above the bytes model; -1 disables the gate") {
    val current = Seq(KV(1, "old"), KV(2, "keep")).toDS().toDF()
    val ch = changes((1L, "new", "u", 1L))
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "10MB")
      val small = CdcMerge.applyChanges(current, ch, Seq("k"),
        Seq(col("__source_ts_ms"), col("__seq")), batchRowsHint = Some(1L))
      assert(!hintedShuffleHash(small))
      val big = CdcMerge.applyChanges(current, ch, Seq("k"),
        Seq(col("__source_ts_ms"), col("__seq")), batchRowsHint = Some(10_000_000L))
      assert(hintedShuffleHash(big))
      assert(big.as[KV].collect().toSeq.sortBy(_.k) == Seq(KV(1, "new"), KV(2, "keep")))
      spark.conf.set(key, "-1")
      val disabled = CdcMerge.applyChanges(current, ch, Seq("k"),
        Seq(col("__source_ts_ms"), col("__seq")), batchRowsHint = Some(10_000_000L))
      assert(!hintedShuffleHash(disabled))
      assert(disabled.as[KV].collect().toSeq.sortBy(_.k) ==
        Seq(KV(1, "new"), KV(2, "keep")))
    } finally spark.conf.set(key, saved)
  }

  test("P3 unwrap keeps delete rows via before-image") {
    val rows = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val env = Envelope.wrap(rows, "db1", "t1",
      when($"k" === 2L, "d").otherwise("c"), lit(7L))
    val got = Envelope.unwrap(env).orderBy("k")
      .select("k", "v", "__op", "__source_ts_ms", "__db", "__table")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", "c", 7L), (2L, "b", "d", 7L)))
  }

  test("P5 castColumns repairs bit columns") {
    val df = Seq((1L, 1), (2L, 0)).toDF("k", "flag")
    val got = Envelope.castColumns(df, Map("flag" -> BooleanType))
    assert(got.schema("flag").dataType == BooleanType)
    assert(got.orderBy("k").as[(Long, Boolean)].collect().toSeq ==
      Seq((1L, true), (2L, false)))
  }

  test("P6 conditional rename under topic predicate") {
    val df = Seq((1L, "u1")).toDF("k", "user")
    val yes = Envelope.renameIf(df, "prefix.db.T_CARRIER", ".*T_CARRIER",
      Map("user" -> "owner_user_id"))
    val no = Envelope.renameIf(df, "prefix.db.T_OTHER", ".*T_CARRIER",
      Map("user" -> "owner_user_id"))
    assert(yes.columns.contains("owner_user_id") && !no.columns.contains("owner_user_id"))
  }

  test("ParquetUpsertTable seed + merge rewrites only touched buckets") {
    val path = tmpDir("upsert") + "/t"
    val t = new ParquetUpsertTable(spark, path, Seq("k"), numBuckets = 8)
    t.seed(Seq(KV(1, "a"), KV(2, "b"), KV(3, "c"), KV(10, "j")).toDS().toDF())
    assert(t.read().as[KV].collect().sortBy(_.k).toSeq ==
      Seq(KV(1, "a"), KV(2, "b"), KV(3, "c"), KV(10, "j")))
    val ch = changes((2L, "B", "u", 1L), (3L, "", "d", 1L), (5L, "e", "c", 1L))
    t.merge(ch, Seq(col("__source_ts_ms"), col("__seq")))
    assert(t.read().as[KV].collect().sortBy(_.k).toSeq ==
      Seq(KV(1, "a"), KV(2, "B"), KV(5, "e"), KV(10, "j")))
    // replay the same batch -> unchanged (idempotent)
    t.merge(ch, Seq(col("__source_ts_ms"), col("__seq")))
    assert(t.read().as[KV].collect().sortBy(_.k).toSeq ==
      Seq(KV(1, "a"), KV(2, "B"), KV(5, "e"), KV(10, "j")))
  }
}

class SchemaEvolutionSpec extends SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.ParquetUpsertTable

  test("T8 additive schema evolution + S11 schema history") {
    val path = tmpDir("evolve") + "/t"
    val t = new ParquetUpsertTable(spark, path, Seq("k"), numBuckets = 4)
    t.seed(Seq(KV(1, "a"), KV(2, "b")).toDS().toDF())
    // batch carries a new column `extra`
    val ch = Seq((2L, "B", 7, "u", 1L, 0L), (3L, "c", 9, "c", 1L, 1L))
      .toDF("k", "v", "extra", "__op", "__source_ts_ms", "__seq")
    t.merge(ch, Seq(col("__source_ts_ms"), col("__seq")))
    val got = t.read().orderBy("k").collect()
    assert(t.read().columns.toSet == Set("k", "v", "extra"))
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byK = got.map(r => r.getLong(0) -> r).toMap
    assert(byK(1L).isNullAt(byK(1L).fieldIndex("extra"))) // old row -> null
    assert(byK(2L).getInt(byK(2L).fieldIndex("extra")) == 7)
    assert(t.schemaHistory().size == 2) // seed schema + evolved schema
    assert(t.schemaHistory().last.fieldNames.contains("extra"))
  }

  test("short batches (missing table columns) merge as nulls") {
    val path = tmpDir("shortb") + "/t"
    val t = new ParquetUpsertTable(spark, path, Seq("k"), numBuckets = 4)
    t.seed(Seq(KV(1, "a")).toDS().toDF())
    val ch = Seq((2L, "u", 1L, 0L)).toDF("k", "__op", "__source_ts_ms", "__seq")
    t.merge(ch, Seq(col("__source_ts_ms"), col("__seq")))
    val rows = t.read().orderBy("k").collect()
    assert(rows.length == 2 && rows(1).isNullAt(rows(1).fieldIndex("v")))
  }
}

class DriftAnalysisSpec extends SparkSuite {
  import org.apache.spark.sql.functions._
  import graft.catalog.TableMeta
  import graft.operators.DriftAnalysis
  import graft.sources.Tables

  test("drift report quantifies duplicates/orphans with root causes") {
    val src = Tables.orders(spark, sf001)
    val sink = src
      .unionByName(src.filter(col("o_orderkey") % 100 === 0)) // duplicates
      .unionByName(src.limit(3).withColumn("o_orderkey", col("o_orderkey") + 10000000L)) // orphans
    val r = DriftAnalysis.analyze(src, sink, TableMeta.testTables("orders"))
    assert(r.duplicateCount >= 15)
    assert(r.orphanCount == 3)
    assert(r.rootCauses.exists(_.startsWith("duplicates_detected")))
    assert(r.rootCauses.exists(_.contains("orphans")))
    assert(r.orphanPks.size == 3 && r.duplicatePks.nonEmpty)
  }

  test("clean tables produce the clean verdict") {
    val src = Tables.orders(spark, sf001)
    val r = DriftAnalysis.analyze(src, src, TableMeta.testTables("orders"))
    assert(r.duplicateCount == 0 && r.orphanCount == 0)
    assert(r.rootCauses.exists(_.startsWith("clean")))
  }
}

class LookupSpec extends SparkSuite {
  import spark.implicits._
  import graft.operators.ParquetUpsertTable

  test("P9 bucket-pruned point lookup reads one bucket and finds the row") {
    val path = tmpDir("lookup") + "/t"
    val t = new ParquetUpsertTable(spark, path, Seq("k"), numBuckets = 16)
    t.seed((1L to 500L).map(i => KV(i, s"v$i")).toDF("k", "v"))
    val hit = t.lookup(Map("k" -> 123L))
    assert(hit.as[KV].collect().toSeq == Seq(KV(123, "v123")))
    // the pruned scan reads a single bucket directory
    val scanned = hit.queryExecution.executedPlan.toString
    assert(scanned.contains("__bucket="))
    assert(t.lookup(Map("k" -> 99999L)).count() == 0)
  }
}
