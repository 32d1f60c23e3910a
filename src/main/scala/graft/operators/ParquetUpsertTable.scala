package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Mutable keyed table over immutable parquet — the engineering core of
  * the reference's upsert sink (SURVEY §7.4.1). Plain parquet cannot be
  * updated in place, so the table is hash-bucketed on the PK
  * (`pmod(xxhash64(pk), numBuckets)` directory partitions) and a merge
  * rewrites ONLY the buckets that the incoming batch touches.
  *
  * Storage layout (MVCC, Delta/Iceberg-lite — neither is available in
  * this dependency-free build):
  * {{{
  *   <path>/_manifest/v00000.json      committed snapshots (atomic rename)
  *   <path>/data/e00000/__bucket=<b>/  immutable epoch data, one per commit
  * }}}
  * Each commit writes a NEW epoch directory and then publishes a new
  * manifest mapping every bucket to the epoch dir holding its current
  * data. Readers resolve the latest manifest and read only immutable
  * dirs, so a concurrent merge can never yank files out from under them
  * (the old delete-then-rename swap did exactly that — it was a
  * reproduced `FILE_NOT_EXIST` race under a polling reader). Old epochs
  * are GC'd only once they fall out of the last [[ParquetUpsertTable.KeptManifests]]
  * manifests, giving in-flight readers a grace window.
  *
  * The manifest also records the table's current schema; reads apply it
  * explicitly, so after an additive evolution rewrote only touched
  * buckets, untouched buckets still surface the new column (as nulls)
  * instead of footer-inference silently dropping it (T8).
  *
  * Single-writer by design (one CDC apply stream per table, matching the
  * reference's one-connector-per-table deployment); the atomic manifest
  * rename makes a second concurrent writer fail loudly instead of
  * corrupting state. NULL-PK rows are quarantined to `<path>.nullpk/`
  * at both write boundaries (violations — see quarantineNullPk).
  *
  * Scale rationale: at 100 TB with e.g. 4096 buckets a CDC micro-batch
  * that touches 1% of keys rewrites ~1% of the table instead of all of
  * it, and the bucket column keeps merge shuffles aligned across batches.
  */
class ParquetUpsertTable(
    spark: SparkSession,
    val path: String,
    val pkCols: Seq[String],
    val numBuckets: Int = 64) {

  import ParquetUpsertTable._

  private val BucketCol = "__bucket"
  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def manifestDir = new Path(path, "_manifest")

  private def bucketExpr: Column =
    pmod(xxhash64(pkCols.map(col): _*), lit(numBuckets.toLong)).cast("int")

  def exists: Boolean = loadManifest().isDefined

  // ------------------------------------------------------------ manifest

  /** A committed snapshot: table schema + bucket -> relative data dir. */
  private case class Manifest(version: Int, schema: StructType, buckets: Map[Int, String])

  private def manifestName(v: Int) = f"v$v%05d.json"

  private def loadManifest(): Option[Manifest] = {
    val f = fs
    if (!f.exists(manifestDir)) return None
    // numeric sort, not lexicographic: past v99999 the zero-padding no
    // longer orders names ("v100000.json" < "v99998.json" as strings),
    // which would resolve a stale snapshot and brick the next commit
    val names = f.listStatus(manifestDir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .sortBy(_.stripPrefix("v").stripSuffix(".json").toInt)
    names.lastOption.map { latest =>
      val p = new Path(manifestDir, latest)
      val len = f.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = f.open(p)
      try in.readFully(0, buf) finally in.close()
      parseManifest(new String(buf, "UTF-8"))
    }
  }

  private def parseManifest(s: String): Manifest = {
    val j = JsonMethods.parse(s)
    val version = j \ "version" match {
      case JInt(n) => n.toInt
      case other => sys.error(s"bad manifest version: $other")
    }
    val buckets = j \ "buckets" match {
      case JObject(fields) => fields.collect { case (k, JString(rel)) => k.toInt -> rel }.toMap
      case other => sys.error(s"bad manifest buckets: $other")
    }
    val schema = DataType.fromJson(JsonMethods.compact(j \ "schema"))
      .asInstanceOf[StructType]
    Manifest(version, schema, buckets)
  }

  /** Publish a new snapshot: write to a temp file, then atomically rename
    * into place. A failed writer leaves only an ignorable temp file; a
    * concurrent writer loses the rename race and throws.
    */
  private def commitManifest(m: Manifest): Unit = {
    val f = fs
    if (!f.exists(manifestDir)) f.mkdirs(manifestDir)
    val json = JsonMethods.compact(JsonMethods.render(JObject(
      "version" -> JInt(m.version),
      "buckets" -> JObject(m.buckets.toSeq.sortBy(_._1)
        .map { case (b, rel) => b.toString -> (JString(rel): JValue) }: _*),
      "schema" -> JsonMethods.parse(m.schema.json))))
    val tmp = new Path(manifestDir, s".tmp-${manifestName(m.version)}")
    val out = f.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val dest = new Path(manifestDir, manifestName(m.version))
    if (f.exists(dest) || !f.rename(tmp, dest))
      sys.error(s"manifest commit conflict at $dest — concurrent writer?")
    gc(m.version)
  }

  /** Drop manifests older than the kept window and any epoch dir no kept
    * manifest references. Readers always re-resolve the latest manifest,
    * so the window only needs to cover reads in flight across a commit.
    */
  private def gc(latestVersion: Int): Unit = {
    val f = fs
    val keepFrom = latestVersion - (KeptManifests - 1)
    val all = f.listStatus(manifestDir).map(_.getPath)
      .filter(p => p.getName.startsWith("v") && p.getName.endsWith(".json"))
    val (kept, dropped) = all.partition { p =>
      p.getName.stripPrefix("v").stripSuffix(".json").toInt >= keepFrom
    }
    dropped.foreach(f.delete(_, false))
    val referenced: Set[String] = kept.flatMap { p =>
      val len = f.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = f.open(p)
      try in.readFully(0, buf) finally in.close()
      parseManifest(new String(buf, "UTF-8")).buckets.values
        .map(_.split('/').take(2).mkString("/")) // "data/eNNNNN"
    }.toSet
    val dataDir = new Path(path, "data")
    if (f.exists(dataDir)) {
      f.listStatus(dataDir).map(_.getPath).foreach { e =>
        if (!referenced.contains(s"data/${e.getName}")) f.delete(e, true)
      }
    }
  }

  private def epochDir(version: Int) = f"data/e$version%05d"

  // ------------------------------------------------------------ reads

  /** Current materialized state. Resolves the latest committed manifest
    * and reads its (immutable) epoch dirs under the manifest's schema —
    * safe under concurrent merges, stable under T8 evolution.
    */
  def read(): DataFrame = {
    val m = loadManifest().getOrElse(
      sys.error(s"no committed snapshot at $path — seed() or merge() first"))
    readBuckets(m, m.buckets.keys.toSeq)
  }

  private def readBuckets(m: Manifest, buckets: Seq[Int]): DataFrame = {
    val dirs = buckets.sorted.flatMap(m.buckets.get).map(rel => s"$path/$rel")
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], m.schema)
    else spark.read.schema(m.schema).parquet(dirs: _*)
  }

  /** P9 at scale: PK point lookup reading ONLY the key's hash bucket —
    * partition pruning via the bucket directory, so a lookup touches
    * 1/numBuckets of the table regardless of size. Literals are cast to
    * the stored column types before hashing: `xxhash64(1: Int)` differs
    * from `xxhash64(1L)`, so an uncast literal of the "wrong" Scala type
    * would land on the wrong bucket and silently return nothing.
    */
  def lookup(pkValues: Map[String, Any]): DataFrame = {
    require(pkValues.keySet == pkCols.toSet, s"lookup needs all PK cols $pkCols")
    val m = loadManifest().getOrElse(
      sys.error(s"no committed snapshot at $path"))
    val typed = pkCols.map(c => lit(pkValues(c)).cast(m.schema(c).dataType))
    val bucket = spark.range(1)
      .select(pmod(xxhash64(typed: _*), lit(numBuckets.toLong)).cast("int"))
      .head().getInt(0)
    readBuckets(m, Seq(bucket)).filter(
      pkCols.map(c => col(c) === lit(pkValues(c)).cast(m.schema(c).dataType))
        .reduce(_ && _))
  }

  // ------------------------------------------------------------ writes

  /** Bootstrap/seed the table from a snapshot (T2 `schema_only` seed:
    * batch load then stream from the recorded position).
    */
  def seed(snapshot: DataFrame): Unit = {
    // a seeded NULL-PK row would be a PERMANENT ghost — no later merge
    // could update or delete it — so the seed path quarantines too
    val keyed = quarantineNullPk(snapshot)
    val version = loadManifest().map(_.version + 1).getOrElse(0)
    val buckets = writeEpoch(keyed.withColumn(BucketCol, bucketExpr), version)
    commitManifest(Manifest(version, keyed.schema, buckets))
    recordSchemaVersion(keyed.schema)
  }

  /** Write one immutable epoch dir; return bucket -> relative dir for the
    * buckets that actually materialized (a fully-deleted bucket writes no
    * dir and drops out of the manifest).
    */
  private def writeEpoch(bucketed: DataFrame, version: Int): Map[Int, String] = {
    val rel = epochDir(version)
    val dir = s"$path/$rel"
    bucketed.repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(dir)
    val f = fs
    f.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith(s"$BucketCol="))
      .map(n => n.stripPrefix(s"$BucketCol=").toInt -> s"$rel/$n")
      .toMap
  }

  /** S11 schema-history log — every schema version is appended as JSON
    * under `<path>.schema_history/` for restart/forensics, the engine
    * analog of Debezium's schema-history topic (reference:
    * connectors/sources/mariadb/trading.json:22-25).
    */
  def recordSchemaVersion(schema: StructType): Unit = {
    val dir = new Path(s"$path.schema_history")
    val f = fs
    if (!f.exists(dir)) f.mkdirs(dir)
    val version = f.listStatus(dir).length
    val out = f.create(new Path(dir, f"v$version%05d.json"), true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  /** Recorded schema versions, oldest first (S11 read side). */
  def schemaHistory(): Seq[StructType] = {
    val dir = new Path(s"$path.schema_history")
    val f = fs
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).map(_.getPath).sortBy(_.getName).toSeq.map { p =>
      val in = f.open(p)
      val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
      try in.readFully(0, buf) finally in.close()
      DataType.fromJson(new String(buf, "UTF-8")).asInstanceOf[StructType]
    }
  }

  /** Merge a batch of unwrapped change events (`__op`, ordering cols +
    * row fields): upsert latest-per-key, apply deletes, rewriting only
    * affected buckets. Idempotent under replay (T9) because the merge is
    * latest-state, not append. Publishes a new epoch + manifest; readers
    * on the previous snapshot are unaffected.
    */
  def merge(changes: DataFrame, orderCols: Seq[Column]): Unit = {
    // NULL-PK events are violations, not keyable changes: NULL never
    // equals itself in the upsert anti-join, so such a row would append
    // a fresh duplicate on EVERY batch instead of upserting. They are
    // quarantined (never silently dropped) — see quarantineNullPk.
    doMerge(quarantineNullPk(changes), orderCols)
  }

  /** Side-write NULL-PK rows to `<path>.nullpk/` and return the keyable
    * remainder. The quarantine dir is the observability surface for the
    * drop (alongside the P10/A3 checks on the SOURCE side); zero-ghost
    * batches cost one cheap isEmpty probe.
    */
  private def quarantineNullPk(changes: DataFrame): DataFrame = {
    val (keyed, ghosts) = CdcMerge.splitKeyed(changes, pkCols)
    if (!ghosts.isEmpty)
      ghosts.write.mode("append").parquet(s"$path.nullpk")
    keyed
  }

  /** NULL-PK rows quarantined by merge()/seed(), empty if none. */
  def nullPkQuarantine(): DataFrame = {
    val dir = new Path(s"$path.nullpk")
    if (fs.exists(dir)) spark.read.parquet(dir.toString)
    else spark.emptyDataFrame
  }

  private def doMerge(changes: DataFrame, orderCols: Seq[Column]): Unit = {
    if (changes.isEmpty) return
    val manifest = loadManifest() match {
      case Some(m) => m
      case None =>
        val latest = CdcMerge.latestPerKey(changes, pkCols, orderCols)
          .filter(col("__op") =!= Envelope.OpDelete)
          .drop("__op")
        seed(latest.drop(latest.columns.toIndexedSeq.filter(_.startsWith("__")): _*))
        return
    }
    val bucketed = changes.withColumn(BucketCol, bucketExpr)
    // One job yields BOTH the touched-bucket set (bounded by numBuckets,
    // driver-safe) and the batch row count — the count feeds
    // applyChanges' anti-join admission gate as a hint, so the
    // streaming path never schedules a dedicated count() job per
    // micro-batch (r15 verdict: the gate's extra action cost ~6% CDC
    // apply throughput).
    val perBucket = bucketed.groupBy(BucketCol).count().collect()
    val touched = perBucket.map(_.getInt(0)).sorted
    val batchRows = perBucket.map(_.getLong(1)).sum
    val currentRaw = readBuckets(manifest, touched.toSeq)
    // T8 additive schema evolution (schema.evolution=basic, reference:
    // connectors/sinks/postgres/trading.json:17): new incoming fields
    // are added to the table as nulls for pre-existing rows.
    val incomingFields = changes.schema.fields
      .filter(f => !f.name.startsWith("__") && !currentRaw.columns.contains(f.name))
    val current = incomingFields.foldLeft(currentRaw) { (d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    if (incomingFields.nonEmpty) recordSchemaVersion(current.schema)
    // reverse alignment: short batches (columns dropped upstream) get
    // nulls for table columns they don't carry
    val missingInChanges = current.schema.fields
      .filter(f => !bucketed.columns.contains(f.name))
    val alignedChanges = missingInChanges.foldLeft(bucketed.drop(BucketCol)) { (d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType))
    }
    val rowCols = current.columns.toSeq
    val merged = CdcMerge.applyChanges(
      current, alignedChanges, pkCols, orderCols, Some(batchRows))
      .select(rowCols.map(col): _*)
      .withColumn(BucketCol, bucketExpr)

    val version = manifest.version + 1
    val written = writeEpoch(merged, version)
    // untouched buckets keep their old dirs; touched ones move to the new
    // epoch (or drop out entirely if every row in them was deleted)
    val buckets = (manifest.buckets -- touched) ++ written
    val newSchema = StructType(current.schema.fields)
    commitManifest(Manifest(version, newSchema, buckets))
  }
}

object ParquetUpsertTable {
  /** Snapshots kept before GC — the grace window for readers that
    * resolved a manifest just before a commit.
    */
  val KeptManifests = 3
}
