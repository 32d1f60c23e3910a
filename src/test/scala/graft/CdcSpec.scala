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
