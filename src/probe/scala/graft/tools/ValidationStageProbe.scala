package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** r15 stage split of `v0_validation_suite` at soak scale: the r14
  * verdict asked for a shared-scan runner, but `runAllChecks` is
  * already 2-action fused — this probe names where the ~8 s isolated
  * sf10 median actually goes (scan of the union? the per-key
  * exchange? the 60 M-key hash aggregate? the recent-activity pass?)
  * before any further restructuring.
  */
object ValidationStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]")
    spark.sparkContext.setLogLevel("WARN")
    val meta = graft.catalog.TableMeta.testTables("lineitem")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[v0-stage] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val source = graft.sources.Tables.lineitem(spark, sfDir)
    val sink = source.filter(col("l_orderkey") % 97 =!= 0)
      .unionByName(source.filter(col("l_orderkey") % 31 === 0))
    val pk = meta.pkCols.map(col)
    val nullPk = meta.pkCols.map(col(_).isNull).reduce(_ || _)

    // raw scan costs
    timed("source scan pk-pruned count")(
      source.select(pk: _*).filter(!nullPk).count())
    timed("sink scan pk-pruned count")(
      sink.select(pk: _*).filter(!nullPk).count())

    // scalar pass alone
    def scalarSide(df: org.apache.spark.sql.DataFrame, s: Int) = {
      val tsCols = meta.tsCol.toSeq.map(t => col(t).cast("timestamp").as("__ts"))
      df.select(nullPk.as("__np") +: lit(s).as("__s") +: tsCols: _*)
    }
    timed("scalar pass (totals/nullpk/maxts)") {
      val t = scalarSide(source, 1).unionByName(scalarSide(sink, 0))
      t.agg(count(when(col("__s") === 1, 1)),
        count(when(col("__s") === 0, 1)),
        max(when(col("__s") === 1, col("__ts"))),
        max(when(col("__s") === 0, col("__ts")))).head()
    }

    // key pass alone
    def keySide(df: org.apache.spark.sql.DataFrame, s: Int) =
      df.filter(!nullPk).select(pk :+ lit(s).as("__s"): _*)
    timed("key pass (distinct/orphans, 2-col pk)") {
      val t = keySide(source, 1).unionByName(keySide(sink, 0))
      val perKey = t.groupBy(pk: _*).agg(
        count(when(col("__s") === 1, 1)).as("__s_cnt"),
        count(when(col("__s") === 0, 1)).as("__k_cnt"))
      perKey.agg(count(when(col("__s_cnt") > 0, 1)),
        count(when(col("__k_cnt") > 0, 1)),
        count(when(col("__k_cnt") > 0 && col("__s_cnt") === 0, 1))).head()
    }

    // key pass with a packed single-long key (l_orderkey * 8 | linenumber)
    timed("key pass (packed single-long pk)") {
      def packedSide(df: org.apache.spark.sql.DataFrame, s: Int) =
        df.filter(!nullPk).select(
          (col("l_orderkey") * 8 + col("l_linenumber")).as("__pk"),
          lit(s).as("__s"))
      val t = packedSide(source, 1).unionByName(packedSide(sink, 0))
      val perKey = t.groupBy(col("__pk")).agg(
        count(when(col("__s") === 1, 1)).as("__s_cnt"),
        count(when(col("__s") === 0, 1)).as("__k_cnt"))
      perKey.agg(count(when(col("__s_cnt") > 0, 1)),
        count(when(col("__k_cnt") > 0, 1)),
        count(when(col("__k_cnt") > 0 && col("__s_cnt") === 0, 1))).head()
    }

    // recent activity pass
    timed("recent activity pass") {
      val anchor = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
      val ts = meta.tsCol.get
      val lo = lit(anchor).cast("timestamp") - expr("INTERVAL 60 MINUTES")
      val s = source.filter(col(ts).cast("timestamp") > lo).count()
      val k = sink.filter(col(ts).cast("timestamp") > lo).count()
      (s, k)
    }

    // the r15 cached-tagged shape, stage by stage
    val sink1 = {
      val copies = when(col("l_orderkey") % 97 =!= 0, 1).otherwise(0) +
        when(col("l_orderkey") % 31 === 0, 1).otherwise(0)
      source.withColumn("__copies", copies)
        .filter(col("__copies") > 0)
        .withColumn("__dup", explode(array_repeat(lit(1), col("__copies"))))
        .drop("__copies", "__dup")
    }
    def side(df: org.apache.spark.sql.DataFrame, s: Int) = {
      val tsCols = meta.tsCol.toSeq.map(t => col(t).cast("timestamp").as("__ts"))
      df.select(pk ++ tsCols ++ Seq(lit(s).as("__s")): _*)
    }
    val tagged = side(source, 1).unionByName(side(sink1, 0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("cached: scalar pass + cache build") {
      tagged.agg(count(when(col("__s") === 1, 1)),
        count(when(col("__s") === 0, 1)),
        max(when(col("__s") === 1, col("__ts"))),
        max(when(col("__s") === 0, col("__ts")))).head()
    }
    timed("cached: key pass from cache") {
      val perKey = tagged.filter(!nullPk)
        .select(pk :+ col("__s"): _*)
        .groupBy(pk: _*).agg(
          count(when(col("__s") === 1, 1)).as("__s_cnt"),
          count(when(col("__s") === 0, 1)).as("__k_cnt"))
      perKey.agg(count(when(col("__s_cnt") > 0, 1)),
        count(when(col("__k_cnt") > 0, 1)),
        count(when(col("__k_cnt") > 0 && col("__s_cnt") === 0, 1))).head()
    }
    timed("cached: recent pass from cache") {
      val lo = lit(java.sql.Timestamp.valueOf("1995-06-01 00:00:00"))
      tagged.filter(col("__ts") > lo).agg(
        count(when(col("__s") === 1, 1)),
        count(when(col("__s") === 0, 1))).head()
    }
    tagged.unpersist(true)

    // uncached baseline of the same three passes, one-scan sink
    val tagged2 = side(source, 1).unionByName(side(sink1, 0))
    timed("uncached: scalar pass (1-scan sink)") {
      tagged2.agg(count(when(col("__s") === 1, 1)),
        count(when(col("__s") === 0, 1)),
        max(when(col("__s") === 1, col("__ts"))),
        max(when(col("__s") === 0, col("__ts")))).head()
    }
    timed("uncached: key pass (1-scan sink)") {
      val perKey = tagged2.filter(!nullPk)
        .select(pk :+ col("__s"): _*)
        .groupBy(pk: _*).agg(
          count(when(col("__s") === 1, 1)).as("__s_cnt"),
          count(when(col("__s") === 0, 1)).as("__k_cnt"))
      perKey.agg(count(when(col("__s_cnt") > 0, 1)),
        count(when(col("__k_cnt") > 0, 1)),
        count(when(col("__k_cnt") > 0 && col("__s_cnt") === 0, 1))).head()
    }
    spark.stop()
  }
}
