package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the settings every entry point (Verify, Bench,
  * tests) must share for deterministic, oracle-comparable output.
  *
  * Scale notes: shuffle partitions default to the local core count
  * (local[32] here); on a real cluster this is superseded by AQE
  * coalescing (`spark.sql.adaptive.*` left on). Session time zone is
  * pinned UTC for parity with the reference, which pins UTC end to end
  * (reference: connectors/sources/mariadb/trading.json:52, fly.toml:13).
  */
object GraftSession {
  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // 64 MB broadcast ceiling (vs the 10 MB stock default): executors
      // sized for analytics (multi-GB heaps) comfortably hold a 64 MB
      // table, and the candidate-verification joins in the dedup
      // operators hinge on the per-doc feature table (arrays of
      // shingles) broadcasting instead of shuffling multi-GB candidate
      // streams through a sort-merge join.
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // The top-k rankers aggregate with a typed-imperative bounded
      // heap (TopKNeighbors, ~16·k+50 B per group). The stock 128-group
      // fallback threshold is sized for unbounded object state
      // (collect_list) and would flip these to SORT-based aggregation —
      // re-sorting the billion-row candidate streams the aggregate
      // exists to avoid. 2 M groups ≈ 500 MB/task at k=10, far above
      // any ranker's per-partition group count (= query count).
      // SESSION-GLOBAL CONSTRAINT: this also disarms the sort-based
      // spill valve for every OTHER ObjectHashAggregate in the session,
      // so any new TypedImperativeAggregate added to this library MUST
      // keep its per-group state bounded (a few hundred bytes) — an
      // unbounded-state aggregate (collect_list-style) over millions of
      // groups would OOM where stock Spark would have spilled. The rule
      // is restated at the definition site (plans/GraftAggregates.scala).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (2 * 1000 * 1000).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.parquet carries TIMESTAMP(NANOS), which Spark only reads
      // as long under this flag; Tables.events converts to micros.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
