package graft

import graft.streaming.StreamNearDup
import graft.streaming.StreamNearDup.CandidatePair
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class StreamNearDupSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home " * 6
  private val docs = Seq(
    0L -> base,
    1L -> (base + " tail"), // near-dup of 0
    2L -> "completely different content about spark catalyst optimizer rules and tungsten codegen",
    3L -> base.replace("quick", "rapid")) // near-dup of 0 (and of 1)

  test("streaming near-dup: cross-batch match, within-batch match, redelivery swallowed") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = StreamNearDup.candidatePairs(
      stream.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append).start()
    // batch 1: base doc + unrelated + a within-batch near-dup pair
    stream.addData(docs(0), docs(2), docs(1))
    q.processAllAvailable()
    val afterB1 = spark.table("neardup").as[CandidatePair].collect()
      .map(p => (p.id_a, p.id_b)).toSet
    assert(afterB1.contains((0L, 1L)), s"within-batch pair missing: $afterB1")
    assert(!afterB1.exists(p => p._1 == 2L || p._2 == 2L), "unrelated doc matched")
    // batch 2: a near-dup of a doc indexed in batch 1, plus a replay of doc 1
    stream.addData(docs(3), docs(1))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("neardup").as[CandidatePair].collect()
    val pairs = all.map(p => (p.id_a, p.id_b)).toSet
    assert(pairs.contains((0L, 3L)), s"cross-batch pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    // replayed doc 1 must not pair with itself or re-emit anything new
    assert(!pairs.contains((1L, 1L)))
    // every emitted pair is a true near-dup under the batch operator
    val batch = Dedup.minhashNearDupPairs(docs.toDF("doc_id", "text"),
      "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(batch),
      s"stream emitted pairs the batch operator rejects: ${pairs -- batch}")
    assert(pairs == batch,
      s"stream missed batch pairs: ${batch -- pairs}")
  }

  test("streaming substring gate: per-batch spans equal the batch operator; shard-internal ignored") {
    import graft.streaming.StreamSubstringGate
    implicit val sqlCtx = spark.sqlContext
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val k = 5
    val inCorpus = words("s", 6)
    val corpus = Seq(
      (100L, words("a", 8) + " " + inCorpus),
      (101L, words("b", 8))).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("ssgate").toString
    val stream = MemoryStream[(Long, String)]
    val q = StreamSubstringGate.start(
      stream.toDF().toDF("doc_id", "text"), corpus, "text", "doc_id",
      k = k, checkpoint = s"$tmp/ckpt", auditDir = s"$tmp/audit")
    // batch 1: one contaminated doc + one clean
    stream.addData(1L -> (words("d", 3) + " " + inCorpus + " " + words("e", 4)),
      2L -> words("z", 12))
    q.processAllAvailable()
    // batch 2: two docs sharing a run with EACH OTHER but not the corpus
    val shardOnly = words("y", 6)
    stream.addData(3L -> (shardOnly + " " + words("f", 5)),
      4L -> (shardOnly + " " + words("g", 5)))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$tmp/audit")
      .select("doc_id", "span_start", "span_len", "n_grams")
      .as[(Long, Long, Long, Long)].collect().toSet
    // only doc 1's corpus-shared span; the shard-internal y-run is the
    // BATCH dd_substring operator's job, not the ingest gate's
    assert(got == Set((1L, 3L, 6L, 2L)), s"got $got")
    // parity: the union of streamed batches through the batch operator
    val allNew = Seq(
      1L -> (words("d", 3) + " " + inCorpus + " " + words("e", 4)),
      2L -> words("z", 12),
      3L -> (shardOnly + " " + words("f", 5)),
      4L -> (shardOnly + " " + words("g", 5))).toDF("doc_id", "text")
    val batch = Dedup.substringDupSpansAgainst(allNew, corpus, "text", "doc_id", k)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == batch, s"stream/batch divergence: got $got vs $batch")
  }

  test("streamed candidates + stored-shingle exact verify equal the batch operator") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    // threshold 0 emits every band-collision candidate — the batch
    // operator's candidate semantics — so the downstream exact verify
    // is the only ship gate, completing batch parity all the way to the
    // exact decision (the documented composition in StreamNearDup's
    // emission contract)
    val out = StreamNearDup.candidatePairs(
      stream.toDF().toDF("doc_id", "text"), "text", "doc_id", threshold = 0.0)
    val q = out.writeStream.format("memory").queryName("neardup_verify")
      .outputMode(OutputMode.Append).start()
    stream.addData(docs(0), docs(2))
    q.processAllAvailable()
    stream.addData(docs(1), docs(3))
    q.processAllAvailable()
    q.stop()
    val candPairs = spark.table("neardup_verify")
      .dropDuplicates("id_a", "id_b").select("id_a", "id_b")
    // downstream exact verify: join the pair stream against the stored
    // per-doc shingle sets (the batch verify step), gate on exact Jaccard
    val sets = docs.toDF("doc_id", "text").select(col("doc_id"),
      graft.plans.GraftFunctions.hashedShingleSet(
        graft.functions.TextAnalysis.charShingles(col("text"), 8)).as("sh"))
    val verified = candPairs
      .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.plans.GraftFunctions.sortedJaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val batch = Dedup.minhashNearDupPairs(docs.toDF("doc_id", "text"),
      "text", "doc_id")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(verified == batch,
      s"stream+verify != batch: extra=${verified -- batch} missing=${batch -- verified}")
  }

  test("prePartition variant emits the same pairs as the unpartitioned stream") {
    implicit val sqlCtx = spark.sqlContext
    def run(pre: Int, name: String): Set[(Long, Long)] = {
      val stream = MemoryStream[(Long, String)]
      val out = StreamNearDup.candidatePairs(
        stream.toDF().toDF("doc_id", "text"), "text", "doc_id",
        prePartition = pre)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).start()
      stream.addData(docs(0), docs(2))
      q.processAllAvailable()
      stream.addData(docs(1), docs(3))
      q.processAllAvailable()
      q.stop()
      spark.table(name).dropDuplicates("id_a", "id_b")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    }
    val plain = run(0, "ndpp_plain")
    val pre = run(8, "ndpp_pre")
    assert(pre == plain,
      s"prePartition changed pairs: extra=${pre -- plain} missing=${plain -- pre}")
    assert(plain.nonEmpty)
  }

  test("redelivery of a doc that arrived while saturated does not re-emit") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = StreamNearDup.candidatePairs(
      stream.toDF().toDF("doc_id", "text"), "text", "doc_id",
      maxBucketSize = 2)
    val q = out.writeStream.format("memory").queryName("neardup_redeliver")
      .outputMode(OutputMode.Append).start()
    val same = "identical saturation corpus text " * 8
    stream.addData(10L -> same, 11L -> same) // fill the bucket (cap 2)
    q.processAllAvailable()
    stream.addData(12L -> same) // matched but NOT indexed (saturated)
    q.processAllAvailable()
    val before = spark.table("neardup_redeliver").count()
    stream.addData(12L -> same) // at-least-once redelivery
    q.processAllAvailable()
    q.stop()
    val after = spark.table("neardup_redeliver").count()
    assert(after == before,
      s"redelivered unindexed doc re-emitted ${after - before} pairs")
  }

  // paragraph gate fixture: doc10 = [pA, pB] (structural), doc11 flat
  // (window fallback), doc12's SECOND paragraph near-dups doc10's first
  private val pgBase =
    "the quick brown fox jumps over the lazy dog and runs far away home " * 4
  private val pgDocs = Seq(
    10L -> s"$pgBase\n\ncompletely different content about spark catalyst optimizer rules and tungsten codegen working hard",
    11L -> "flat unrelated words nothing matches here at all in any way",
    12L -> ("zebra yak xylophone wombat vulture unicorn\n\n" +
      pgBase.replace("quick", "rapid")))

  test("paragraph gate: structural split feeds the banded state; batch parity (r20)") {
    import graft.streaming.StreamParagraphGate
    import graft.streaming.StreamParagraphGate.ParagraphHit
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = StreamParagraphGate.paragraphHits(
      stream.toDF().toDF("doc_id", "text"), "text", "doc_id")
    val q = out.writeStream.format("memory").queryName("paragate")
      .outputMode(OutputMode.Append).start()
    stream.addData(pgDocs(0), pgDocs(1)) // index doc10's paragraphs
    q.processAllAvailable()
    stream.addData(pgDocs(2), pgDocs(2)) // hit + same-batch redelivery
    q.processAllAvailable()
    q.stop()
    val hits = spark.table("paragate").as[ParagraphHit].collect()
      .map(h => (h.doc_a, h.chunk_a, h.doc_b, h.chunk_b)).toSet
    assert(hits == Set((10L, 0L, 12L, 1L)),
      s"expected exactly the cross-doc paragraph hit, got $hits")
    // batch parity: the streamed hit set equals the batch paragraph
    // pair list over the union of all streamed docs
    val batch = graft.operators.Dedup.paragraphFrame(
      pgDocs.toDF("doc_id", "text"), "text", "doc_id", paraTokens = 32)
    val batchPairs = graft.operators.Dedup.minhashNearDupPairs(
      batch.select($"para_id", $"para_text"), "para_text", "para_id")
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .map { case (a, b) =>
        (a >>> 20, a & 0xFFFFFL, b >>> 20, b & 0xFFFFFL) }.toSet
    assert(hits == batchPairs, s"stream/batch divergence: $hits vs $batchPairs")
  }

  test("paragraph gate: bucket state survives a checkpointed restart (r20)") {
    import graft.streaming.StreamParagraphGate
    import graft.streaming.StreamParagraphGate.ParagraphHit
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("paragate_ckpt")
    val stream = MemoryStream[(Long, String)]
    val collected = new scala.collection.mutable.ArrayBuffer[ParagraphHit]()
    def start() = StreamParagraphGate.paragraphHits(
      stream.toDF().toDF("doc_id", "text"), "text", "doc_id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ParagraphHit], _: Long) =>
        val rows = batch.collect()
        collected.synchronized { collected ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    val q1 = start()
    stream.addData(pgDocs(0), pgDocs(1))
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    stream.addData(pgDocs(2)) // near-dups a PRE-restart paragraph
    q2.processAllAvailable()
    q2.stop()
    val hits = collected.synchronized {
      collected.map(h => (h.doc_a, h.chunk_a, h.doc_b, h.chunk_b)).toSet }
    assert(hits == Set((10L, 0L, 12L, 1L)),
      s"paragraph bucket state lost across restart: $hits")
  }

  test("bucket state survives a checkpointed query restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("neardup_ckpt")
    val stream = MemoryStream[(Long, String)]
    // foreachBatch sink: the memory sink refuses checkpoint recovery
    val collected = new scala.collection.mutable.ArrayBuffer[CandidatePair]()
    def start() = StreamNearDup.candidatePairs(
      stream.toDF().toDF("doc_id", "text"), "text", "doc_id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[CandidatePair], _: Long) =>
        val rows = batch.collect()
        collected.synchronized { collected ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append).start()
    val q1 = start()
    stream.addData(docs(0), docs(2)) // index the base doc before the restart
    q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint: the bucket index holding doc 0 must be
    // recovered from state, not rebuilt from reprocessed input
    val q2 = start()
    stream.addData(docs(3)) // near-dup of the PRE-restart doc 0
    q2.processAllAvailable()
    q2.stop()
    val pairs = collected.synchronized {
      collected.map(p => (p.id_a, p.id_b)).toSet
    }
    assert(pairs.contains((0L, 3L)),
      s"state lost across restart — cross-restart pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  /** r14: the fused [[graft.plans.MinhashBandHashes]] banding must be
    * bit-identical to the declarative SPEC form the batch operators
    * keep for oracle replay — same decimal rendering, '_' joins, and
    * xxhash64 seed — or a streamed doc and its batch backfill land in
    * different buckets.
    */
  test("fused band hashing equals the xxhash64(concat_ws(...)) spec form") {
    import org.apache.spark.sql.functions._
    val bands = 8
    val rpb = 4
    val rng = new scala.util.Random(7)
    val sigs = (1 to 200).map(_ => Seq.fill(bands * rpb)(rng.nextLong()))
    val df = sigs.toDF("sig")
    val rows = df.select(
      graft.plans.GraftFunctions.minhashBandHashes(col("sig"), bands).as("fused"),
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_",
          transform(slice(col("sig"), b * rpb + 1, lit(rpb)),
            _.cast("string"))))).as("spec")).collect()
    rows.foreach { r =>
      val fused = r.getSeq[Long](0)
      val spec = r.getSeq[Long](1)
      assert(fused == spec, s"fused=$fused spec=$spec")
    }
  }

  test("streaming near-dup: saturated buckets keep matching, stop growing") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val out = StreamNearDup.candidatePairs(
      stream.toDF().toDF("doc_id", "text"), "text", "doc_id",
      maxBucketSize = 2)
    val q = out.writeStream.format("memory").queryName("neardup_sat")
      .outputMode(OutputMode.Append).start()
    // four identical docs, cap 2: docs 10,11 fill the bucket; 12,13 still
    // match the held two but are not indexed (no 12-13 pair)
    val same = "identical saturation corpus text " * 8
    stream.addData(10L -> same, 11L -> same)
    q.processAllAvailable()
    stream.addData(12L -> same, 13L -> same)
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("neardup_sat").as[CandidatePair].collect()
      .map(p => (p.id_a, p.id_b)).toSet
    assert(pairs.contains((10L, 11L)))
    assert(pairs.contains((10L, 12L)) && pairs.contains((11L, 13L)),
      s"saturated bucket stopped matching: $pairs")
    assert(!pairs.contains((12L, 13L)), "saturated bucket kept growing")
  }
}
