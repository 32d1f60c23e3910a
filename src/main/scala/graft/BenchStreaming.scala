package graft

import graft.catalog.TableMeta
import graft.streaming.{CdcPipeline, StatefulLatest, StreamNearDup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming-surface throughput section of the bench: the reference's
  * one hard streaming number is end-to-end propagation ≤ 10 s
  * (reference: tests/test_cdc_live.py:333-334 waits up to 10 s for a
  * change to appear in the sink); everything else it reports is
  * qualitative. This section measures, at sf-scaled volumes:
  *
  *  - `cdc_apply`: envelope → unwrap/SMT → latest-per-key → bucketed
  *    upsert merge ([[CdcPipeline]], the production microbatch path),
  *    events/sec and mean per-microbatch latency;
  *  - `stateful_latest`: the flatMapGroupsWithState changelog
  *    normalizer ([[StatefulLatest]]) at the same volume;
  *  - `stream_neardup`: the stateful banded near-dup indexer
  *    ([[StreamNearDup]]) over the documents corpus;
  *  - `propagation_ms`: one small late batch through the ALREADY-WARM
  *    CDC pipeline — the honest analog of the reference's ≤ 10 s gate
  *    (cold-start JVM/codegen cost is a separate number, not
  *    propagation).
  *
  * Volumes derive from the sf directory (events count for the CDC
  * surfaces, documents count for near-dup) so the section scales with
  * the graded SF like every batch query.
  */
object BenchStreaming {

  case class SrcMeta(db: String, table: String, ts_ms: Long)
  case class KV(k: Long, v: String)
  case class Env(op: String, ts_ms: Long, source: SrcMeta, before: KV, after: KV)

  private def timeMs[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e6)
  }

  /** Run the section; returns flat metric map (all values doubles). */
  def run(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("bench_stream").toString

    // State-store partitioning for the streaming queries (r14,
    // measured): each stateful micro-batch pays a fixed load+commit
    // (delta file + rename) PER state partition, so at micro-batch
    // rates the 32 batch-shuffle partitions are mostly per-batch fixed
    // cost — 8 measured near-dup 4.4→6.5k docs/s and stateful-latest
    // 33→55k ev/s on identical code (4 was equal; 16 halfway). A real
    // deployment sizes a streaming job's `spark.sql.shuffle.partitions`
    // to its STATE volume and rate, not to the batch-query width —
    // Spark pins the choice into the checkpoint at first start. Set for
    // the streaming section only, restored after.
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions",
      math.min(8, prevShuffle.toInt).toString)
    try runStreams(spark, sfDir, tmp)
    finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
  }

  private def runStreams(spark: SparkSession, sfDir: String,
      tmp: String): Seq[(String, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // sf-scaled volumes: events rows drive the CDC surfaces (sf0.1 →
    // 100k envelope events over a 20k keyspace), documents drive near-dup
    val nEvents = math.min(200000L,
      graft.sources.Tables(spark, sfDir, "events").count()).toInt
    val nDocs = math.min(20000L,
      graft.sources.Tables(spark, sfDir, "documents").count()).toInt
    val keyspace = math.max(1, nEvents / 5)
    val batches = 10
    // half-open per-batch ranges partitioning [0, nEvents) exactly: the
    // last batch takes the division remainder (a plain nEvents/batches
    // split silently dropped up to batches-1 events from every rate),
    // and a fixture smaller than `batches` yields fewer, 1-event
    // batches instead of ten empty ones under an unchanged event count
    val perBatch = math.max(1, nEvents / batches)
    val batchRanges = (0 until batches).map { b =>
      (b * perBatch,
        if (b == batches - 1) nEvents else math.min(nEvents, (b + 1) * perBatch))
    }.filter { case (lo, hi) => hi > lo }

    def env(i: Int): Env = {
      val k = (i * 2654435761L) % keyspace
      val op = i % 10 match { case 9 => "d" case x if x >= 6 => "u" case _ => "c" }
      Env(op, i.toLong, SrcMeta("db", "t", i.toLong),
        if (op != "c") KV(k, s"v${i - 1}") else null,
        if (op != "d") KV(k, s"v$i") else null)
    }

    // ---- cdc_apply: the full production microbatch path
    val pipe = new CdcPipeline(spark, TableMeta("bench_t", Seq("k")),
      s"$tmp/table", s"$tmp/ckpt", numBuckets = 16)
    val cdcStream = MemoryStream[Env]
    val q2 = pipe.start(cdcStream.toDF(), Trigger.ProcessingTime("50 milliseconds"))
    val batchMs = batchRanges.map { case (lo, hi) =>
      cdcStream.addData((lo until hi).map(env))
      timeMs(q2.processAllAvailable())._2
    }
    // propagation: one 100-event batch through the warm pipeline
    val (_, propMs) = timeMs {
      cdcStream.addData((nEvents until nEvents + 100).map(env))
      q2.processAllAvailable()
    }
    q2.stop()
    val cdcSecs = batchMs.sum / 1e3

    // ---- stateful_latest: changelog normalizer at the same volume
    val slStream = MemoryStream[StatefulLatest.KeyedChange]
    val slOut = StatefulLatest(slStream.toDS())
    val slq = slOut.writeStream.format("noop")
      .option("checkpointLocation", s"$tmp/ckpt_sl")
      .outputMode("append").start()
    val slMs = batchRanges.map { case (lo, hi) =>
      slStream.addData((lo until hi).map { i =>
        StatefulLatest.KeyedChange((i * 2654435761L) % keyspace,
          if (i % 10 == 9) "d" else "u", i.toLong, i.toLong, s"v$i")
      })
      timeMs(slq.processAllAvailable())._2
    }
    slq.stop()

    // ---- stream_neardup: stateful banded indexer over the doc corpus
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select($"doc_id".cast("long"), $"text").limit(nDocs)
      .as[(Long, String)].collect()
    val ndStream = MemoryStream[(Long, String)]
    // prePartition: MemoryStream delivers each micro-batch in ONE
    // partition, serializing the ~78 µs/doc banding kernel (half the
    // per-doc cost) while the cluster idles — the r16 NearDupPartProbe
    // A-B-A measured the raw-doc pre-exchange at +27% end-to-end
    val ndOut = StreamNearDup.candidatePairs(
      ndStream.toDF().toDF("doc_id", "text"), "text", "doc_id",
      prePartition = spark.sparkContext.defaultParallelism)
    val ndq = ndOut.writeStream.format("noop")
      .option("checkpointLocation", s"$tmp/ckpt_nd")
      .outputMode("append").start()
    val ndBatch = math.max(1, nDocs / 5)
    val ndMs = docs.grouped(ndBatch).map { chunk =>
      ndStream.addData(chunk.toIndexedSeq)
      timeMs(ndq.processAllAvailable())._2
    }.toSeq
    ndq.stop()

    // ---- paragraph_gate: the paragraph-split edition of the stateful
    // banded indexer (StreamParagraphGate — split -> banding -> state
    // over packed paragraph ids), same doc sample and chunking as
    // stream_neardup so the two rates are comparable
    val pgStream = MemoryStream[(Long, String)]
    val pgOut = graft.streaming.StreamParagraphGate.paragraphHits(
      pgStream.toDF().toDF("doc_id", "text"), "text", "doc_id",
      paraTokens = QueriesExt.ParagraphTokens,
      prePartition = spark.sparkContext.defaultParallelism)
    val pgq = pgOut.writeStream.format("noop")
      .option("checkpointLocation", s"$tmp/ckpt_pg")
      .outputMode("append").start()
    val pgMs = docs.grouped(ndBatch).map { chunk =>
      pgStream.addData(chunk.toIndexedSeq)
      timeMs(pgq.processAllAvailable())._2
    }.toSeq
    pgq.stop()

    // ---- substring_gate: foreachBatch span-precise ingest gate —
    // the second half of the doc sample streams against the first
    // half as the accepted corpus (the live-admission shape; the
    // corpus gram dictionary amortizes across micro-batches)
    val half = docs.length / 2
    val sgCorpus = docs.take(half).toIndexedSeq.toDF("doc_id", "text")
    val sgDocs = docs.drop(half)
    val sgStream = MemoryStream[(Long, String)]
    val sgq = graft.streaming.StreamSubstringGate.start(
      sgStream.toDF().toDF("doc_id", "text"), sgCorpus, "text", "doc_id",
      k = QueriesExt.SubstringK, s"$tmp/ckpt_sg", s"$tmp/audit_sg")
    val sgMs = sgDocs.grouped(math.max(1, sgDocs.length / 5)).map { chunk =>
      sgStream.addData(chunk.toIndexedSeq)
      timeMs(sgq.processAllAvailable())._2
    }.toSeq
    sgq.stop()

    Seq(
      "cdc_events" -> nEvents.toDouble,
      "cdc_events_per_sec" -> (if (cdcSecs > 0) nEvents / cdcSecs else -1.0),
      "cdc_batch_ms_avg" -> batchMs.sum / batchMs.size,
      "propagation_ms" -> propMs,
      "propagation_target_ms" -> 10000.0,
      "stateful_latest_events_per_sec" ->
        (nEvents / math.max(1e-9, slMs.sum / 1e3)),
      "neardup_docs" -> nDocs.toDouble,
      "neardup_docs_per_sec" -> (nDocs / math.max(1e-9, ndMs.sum / 1e3)),
      "paragraph_gate_docs_per_sec" ->
        (nDocs / math.max(1e-9, pgMs.sum / 1e3)),
      "substring_gate_docs_per_sec" ->
        (sgDocs.length / math.max(1e-9, sgMs.sum / 1e3)))
  }
}
