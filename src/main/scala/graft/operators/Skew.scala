package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale. The reference never needed
  * this (per-table workers, single-node SQL); a 100 TB Spark job does:
  * one pathological key (a boilerplate document hash, a null-ish PK, a
  * mega-customer) turns a groupBy/join into a single straggler task.
  *
  * Two tools:
  *  - AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default in the
  *    session factory) re-splits skewed join partitions at runtime;
  *  - explicit two-phase salted aggregation below for skewed groupBys,
  *    where AQE cannot help because the skew is in the aggregation key
  *    itself.
  */
object Skew {

  /** Two-phase salted aggregation: groupBy(keys :+ salt) partial-agg,
    * then groupBy(keys) final-agg. Correct for any algebraic aggregate
    * expressed as (partial, merge) pairs.
    *
    * @param partials per-output: (partialExpr, mergeExprOnPartialCol)
    *                 e.g. ("cnt", count(lit(1)), c => sum(c)) computes a
    *                 global count via per-salt counts.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partials: Seq[(String, Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(s"__p_${partials.head._1}"),
        partials.tail.map(p => p._2.as(s"__p_${p._1}")): _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(partials.head._3(col(s"__p_${partials.head._1}")).as(partials.head._1),
        partials.tail.map(p => p._3(col(s"__p_${p._1}")).as(p._1)): _*)
  }

  /** Salted count/sum convenience: the common monitoring shape. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], sumCol: String,
      saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keys, saltBuckets, Seq(
      ("cnt", count(lit(1)), (c: Column) => sum(c).cast("long")),
      (s"sum_$sumCol", sum(col(sumCol)), (c: Column) => sum(c))))

  /** Cap blocking-key fan-out: drop all rows of any key group larger
    * than `maxPerKey`. For candidate-pair generation (LSH bands, shingle
    * inverted indexes) a bucket of size s produces s²/2 pairs, so one
    * boilerplate bucket shared by a million docs is a half-trillion-pair
    * straggler at 100 TB; such a bucket also carries no blocking signal
    * (it matches everything). One count shuffle (window, no orderBy).
    * Pair with [[hotKeyReport]] so the dropped volume is observable, not
    * silent.
    */
  def capHotKeys(df: DataFrame, keys: Seq[String], maxPerKey: Int): DataFrame = {
    if (maxPerKey == Int.MaxValue) return df
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    df.withColumn("__key_n", count(lit(1)).over(w))
      .filter(col("__key_n") <= maxPerKey)
      .drop("__key_n")
  }

  /** Split over-large key groups into `__salt` sub-groups of ≤ maxPerKey
    * rows instead of dropping them (include `__salt` in the downstream
    * join keys). Pairs split across sub-groups of ONE blocking table are
    * missed, so use this under multi-table blocking (e.g. multi-table
    * LSH) where every other table gives the pair an independent retry —
    * recall degrades gracefully with bucket size instead of collapsing
    * to zero the moment a bucket crosses the cap. Bounds candidate
    * volume at ~N·maxPerKey/2 pairs per table. Use [[capHotKeys]] when
    * the hot bucket carries no signal at all (boilerplate shingles);
    * use this when it still does (dense LSH buckets of genuinely
    * similar vectors).
    */
  def saltOversized(df: DataFrame, keys: Seq[String], maxPerKey: Int,
      saltOn: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
    df.withColumn("__key_n", count(lit(1)).over(w))
      .withColumn("__salt",
        when(col("__key_n") <= maxPerKey, lit(0L))
          // salt on (row, KEY GROUP), not the row alone: hashed on the row
          // only, a pair would land in the same sub-group in either EVERY
          // table or NONE — the multi-table retry that makes salting
          // recall-safe requires per-group-independent splits
          .otherwise(pmod(xxhash64(saltOn +: keys.map(col): _*),
            ceil(col("__key_n") / lit(maxPerKey)).cast("long"))))
      .drop("__key_n")
  }

  /** Keep a deterministic first `maxPerKey` rows (ordered by `ord`) of
    * each key group instead of dropping the whole group. For a blocked
    * index where EVERY key of a hot cluster saturates at once (simhash
    * chunks: an identical-content flood is hot in all 64/chunkBits
    * positions, so [[capHotKeys]] would zero its pairs with no retry
    * path), truncation degrades to pairs-among-survivors: the flood's
    * survivors still pair with each other, exact-dedup-first pipelines
    * and transitive clustering recover the cluster, and only cross
    * pairs to truncated rows are lost. Costs a per-group sort (vs the
    * count-only window of [[capHotKeys]]) — use where the hot group
    * still carries signal.
    */
  def truncateHotKeys(df: DataFrame, keys: Seq[String], maxPerKey: Int,
      ord: Column): DataFrame = {
    if (maxPerKey == Int.MaxValue) return df
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(ord)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPerKey)
      .drop("__rn")
  }

  /** The keys [[capHotKeys]] dropped, with their sizes — surfaced so a
    * capped dedup run reports what it skipped instead of silently
    * under-matching.
    */
  def hotKeyReport(df: DataFrame, keys: Seq[String], maxPerKey: Int): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).cast("long").as("group_size"))
      .filter(col("group_size") > maxPerKey)

  /** Broadcast-salt join helper for a skewed LEFT key joining a small-ish
    * right side: replicate each right row `saltBuckets` times, salt the
    * left side randomly-but-deterministically, join on (key, salt). Use
    * when the right side is too big for a plain broadcast but the left
    * key histogram is pathological.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
