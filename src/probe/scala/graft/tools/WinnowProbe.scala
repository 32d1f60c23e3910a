package graft.tools

import graft.GraftSession
import graft.QueriesExt
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/** Cost-model probe for `dd_winnow_overlap` (r10 verdict ask #4: "61 s
  * / 5.9× for 2.5× at sf10 — bound it at scale or prove it's
  * mass-limited").
  *
  * The operator's only super-constant term is the pair-instance mass of
  * the inverted-index self-join: Σ_kept C(df, 2) over fingerprints with
  * doc-freq ≤ WinnowMaxDocFreq (= 100). That sum has a HARD LINEAR
  * bound — each kept occurrence pairs with at most (maxDocFreq − 1)
  * others, so pairRows ≤ (maxDocFreq − 1)/2 · keptOccurrences ≈ 49.5 ·
  * keptOccurrences — but how much of the bound is REALIZED depends on
  * the doc-frequency profile: at small N most fingerprints are
  * singletons (df = 1 ⇒ 0 pairs), and as the corpus grows each
  * fingerprint's df grows toward (and past) the cap, so the realized
  * pairs-per-occurrence ratio climbs toward the 49.5 ceiling before
  * growth settles to linear. Super-linear wall-clock growth in that
  * regime is the operator APPROACHING its linear asymptote, not a plan
  * defect.
  *
  * This probe measures, per corpus: docs, distinct-fingerprint
  * occurrences, kept occurrences (after the over-common exclusion),
  * realized pair rows, the pairs/keptOccurrence ratio vs the 49.5
  * ceiling, and the df histogram mass near the cap. A plan regression
  * would show pairs GROWING FASTER than Σ C(df,2); a profile shift
  * shows the ratio climbing while pairs stay equal to the formula.
  *
  * Why not a sketch reject (the r10 suggestion): simhash/minhash spend
  * their time VERIFYING candidates against shingle arrays, so a
  * pair-level reject saves array movement. Winnow-overlap's decision
  * IS the per-pair shared-fingerprint count, produced by the same join
  * that generates the pair instances — there is no later verify stage
  * to protect, so a sketch could only discard pairs whose exact count
  * the output contract requires.
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.get(s"local[$cpus]")
    val maxDf = QueriesExt.WinnowMaxDocFreq
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val fps = docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.winnowFingerprints(
        col("text"), QueriesExt.WinnowK, QueriesExt.WinnowOverlapW))).as("fp"))
      .persist()
    val nDocs = docs.count()
    val byDf = fps.groupBy("fp").agg(count(lit(1)).as("df")).persist()
    val prof = byDf.agg(
      count(lit(1)).as("distinct_fps"),
      sum(col("df")).as("occurrences"),
      sum(when(col("df") <= maxDf, col("df")).otherwise(0L)).as("kept_occ"),
      sum(when(col("df") > maxDf, col("df")).otherwise(0L)).as("excluded_occ"),
      sum(when(col("df") <= maxDf, col("df") * (col("df") - 1))
        .otherwise(0L)).cast("long").as("pair_mass_x2"),
      sum(when(col("df") > lit(maxDf / 2) && col("df") <= maxDf, col("df"))
        .otherwise(0L)).as("occ_near_cap")).head()
    // realized pair rows from the operator's own join shape
    val keep = byDf.filter(col("df") <= maxDf).select("fp")
    val inv = fps.join(keep, Seq("fp"), "left_semi")
    val pairRows = inv.as("x").join(inv.as("y"), Seq("fp"))
      .filter(col("x.doc_id") < col("y.doc_id")).count()
    val keptOcc = prof.getLong(2)
    val ratio = if (keptOcc == 0) 0.0 else pairRows.toDouble / keptOcc
    println(s"[winnow-probe] sf=$sfDir docs=$nDocs " +
      s"distinct_fps=${prof.getLong(0)} occurrences=${prof.getLong(1)} " +
      s"kept_occ=$keptOcc excluded_occ=${prof.getLong(3)} " +
      s"occ_near_cap(df in (${maxDf / 2},$maxDf])=${prof.getLong(5)}")
    println(s"[winnow-probe] pair_mass_formula=${prof.getLong(4) / 2} " +
      s"realized_pair_rows=$pairRows " +
      s"pairs_per_kept_occ=${f"$ratio%.2f"} ceiling=${(maxDf - 1) / 2.0}")

    // r14 stage-split (the simhash treatment, verdict ask #4): wall
    // time per stage of the ACTUAL operator shape — fps is NOT
    // persisted in the operator (r11 measured the persist neutral), so
    // the kernel runs once per consumer; this split measures what each
    // layer adds on top of the previous one, fresh plans each time.
    fps.unpersist(); byDf.unpersist()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[winnow-probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    def freshFps = docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.winnowFingerprints(
        col("text"), QueriesExt.WinnowK, QueriesExt.WinnowOverlapW))).as("fp"))
    timed("scan only (sum length)")(
      docs.select(sum(length(col("text")))).head())
    timed("fps kernel+explode")(freshFps.count())
    timed("  + keep agg (df<=cap)")(freshFps.groupBy("fp")
      .agg(count(lit(1)).as("__df")).filter(col("__df") <= maxDf).count())
    val keepF = freshFps.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf).select("fp")
    timed("  + inv semi join")(freshFps.join(keepF, Seq("fp"), "left_semi").count())
    val invF = freshFps.join(keepF, Seq("fp"), "left_semi")
    timed("  + pair join (no agg)")(invF.as("x").join(invF.as("y"), Seq("fp"))
      .filter(col("x.doc_id") < col("y.doc_id")).count())
    timed("  + pair agg (shared_fps)")(invF.as("x").join(invF.as("y"), Seq("fp"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= QueriesExt.WinnowMinShared).count())
    timed("full operator")(
      QueriesExt.ddWinnowOverlap(spark, sfDir).count())
    spark.stop()
  }
}
