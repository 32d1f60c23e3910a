package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for `dd_simhash` at scale: separates the scratch
  * materialization cost (shingles + simhash + 256-bit sketch, one
  * co-partitioned persist) from the candidate-join + sketch-reject +
  * radius stage and from the full operator, and counts the mass each
  * reject layer passes. Used in r11 to attribute an sf4 in-suite
  * regression between the sketch family swap (one-perm → 256
  * independent 1-bit minhashes) and candidate-volume changes.
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf4")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]")
    import graft.plans.GraftFunctions._
    val docs = graft.sources.Tables.documents(spark, sfDir)

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[simhash-probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    // stage 0 (r14): per-kernel costs, forced by aggregating each
    // output (count() alone lets column pruning skip the kernels)
    val sh = hashedCharShingles(col("text"), 8)
    val sim0 = graft.operators.Dedup.simhash(
      split(lower(trim(col("text"))), "\\s+"))
    timed("scan only (sum length)")(
      docs.select(sum(length(col("text")))).head())
    timed("kernel: shingles")(
      docs.select(sum(size(sh))).head())
    // % keeps ANSI sum from overflowing
    timed("kernel: simhash (split+hash)")(
      docs.select(sum(sim0 % 1000000L)).head())
    timed("kernel: sketch (shingles+minhash256)")(
      docs.select(sum(element_at(minhashBits256(sh), 1) % 1000000L)).head())
    timed("kernel: all three")(
      docs.select(sum(sim0 % 1000000L
        + element_at(minhashBits256(sh), 1) % 1000000L)).head())
    // stage 0b (r14): the meta persist the operator now does — kernel +
    // 50 B/row shuffle + tiny cache write
    val meta = docs.select(col("doc_id").as("id"),
      hashedCharShingles(col("text"), 8).as("shingles"),
      graft.operators.Dedup.simhash(
        split(lower(trim(col("text"))), "\\s+")).as("sim"))
      .select(col("id"), col("sim"), minhashBits256(col("shingles")).as("sk"))
      .repartition(col("id")).sortWithinPartitions("id").persist()
    timed("meta persist (no arrays)")(meta.count())
    meta.unpersist()

    // stage 1: scratch (what persistScratchById materialized pre-r14)
    val sets = docs.select(col("doc_id").as("id"),
      hashedCharShingles(col("text"), 8).as("shingles"),
      graft.operators.Dedup.simhash(
        split(lower(trim(col("text"))), "\\s+")).as("sim"))
      .select(col("id"), col("shingles"), col("sim"),
        minhashBits256(col("shingles")).as("sk"))
      .repartition(col("id")).sortWithinPartitions("id")
      .persist()
    timed("scratch materialize")(sets.count())

    // stage 2: chunk index + probe join, pre-sketch candidate volume
    val cb = 16; val nChunks = 4; val mask = (1L << cb) - 1
    val idx = sets.select(col("id"), col("sim"), col("sk"),
      posexplode(array((0 until nChunks).map(c =>
        shiftright(col("sim"), c * cb).bitwiseAND(lit(mask))): _*))
        .as(Seq("chunk", "chunk_val")))
    val probes = idx.select(col("id"), col("sim"), col("sk"), col("chunk"),
      explode(array(col("chunk_val") +: (0 until cb).map(b =>
        col("chunk_val").bitwiseXOR(lit(1L << b))): _*)).as("chunk_val"))
    val joined = probes.as("x").join(idx.as("y"), Seq("chunk", "chunk_val"))
      .filter(col("x.id") < col("y.id"))
    val preSketch = timed("candidate join (no sketch)")(joined.count())

    val pTau = 0.75
    val mCut = pTau - 4.0 * math.sqrt(pTau * (1.0 - pTau) / 256.0)
    val cut = math.min(256, math.ceil(256.0 * (1.0 - mCut)).toInt)
    val postSketch = timed("  + sketch reject")(
      joined.filter(arrayHamming(col("x.sk"), col("y.sk")) <= lit(cut)).count())
    val postRadius = timed("  + radius filter")(
      joined.filter(arrayHamming(col("x.sk"), col("y.sk")) <= lit(cut))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
          graft.operators.Dedup.hamming64(col("x.sim"), col("y.sim"))
            .cast("int").as("hamming"))
        .filter(col("hamming") <= 12)
        .groupBy("id_a", "id_b").agg(min("hamming")).count())
    println(s"[simhash-probe] cutoff=$cut candidates=$preSketch " +
      s"post_sketch=$postSketch post_radius_pairs=$postRadius")

    // r14: the scratch-persist lever — how many docs does the verify
    // actually need arrays for, and what does materializing ONLY those
    // cost vs the corpus-wide array persist above?
    val pairs = joined
      .filter(arrayHamming(col("x.sk"), col("y.sk")) <= lit(cut))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        graft.operators.Dedup.hamming64(col("x.sim"), col("y.sim"))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= 12)
      .groupBy("id_a", "id_b").agg(min("hamming")).persist()
    val nPairs = timed("cand persist")(pairs.count())
    val needed = pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
    val varr = docs.join(needed, docs("doc_id") === needed("id"), "left_semi")
      .select(col("doc_id").as("id"), hashedCharShingles(col("text"), 8).as("shingles"))
      .repartition(col("id")).sortWithinPartitions("id").persist()
    val nNeeded = timed("varr materialize (needed-only)")(varr.count())
    val nDocs = docs.count()
    println(s"[simhash-probe] docs=$nDocs pairs=$nPairs needed=$nNeeded " +
      f"frac=${nNeeded.toDouble / nDocs}%.3f")
    pairs.unpersist(); varr.unpersist()

    val full = timed("full operator")(
      graft.operators.Dedup.simhashNearDupPairs(docs, "text", "doc_id",
        threshold = 0.5).count())
    println(s"[simhash-probe] shipped_pairs=$full")
    spark.stop()
  }
}
