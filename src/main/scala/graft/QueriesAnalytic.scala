package graft

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic breadth beyond the reference's validation surface: rollup
  * aggregation, ordered window math (running sums, lead/lag deltas),
  * gap-based sessionization, histogram binning, and stream-enrichment
  * joins — the shapes a monitoring/training pipeline runs over the
  * change stream's materialized tables.
  *
  * Determinism: window frames are totally ordered (unique tiebreak),
  * running sums fold decimals (exact) and cast to double per row, and
  * rollup NULL rows sort NULLS FIRST in both engines.
  */
object QueriesAnalytic {
  import Queries.Q

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** Rollup: revenue by region/nation with subtotals and a grand total. */
  val q6Rollup: Q = (s, d) => {
    val n = Tables.nation(s, d); val r = Tables.region(s, d)
    val c = Tables.customer(s, d); val o = Tables.orders(s, d)
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        sum(col("o_totalprice").cast("decimal(28,4)")).cast("double").as("revenue"),
        count(lit(1)).cast("long").as("n_orders"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
  }
  val q6Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** Cube: revenue/count over every subset of (status, priority) — the
    * 2-D drill-down matrix in ONE pass (Expand + a single agg shuffle,
    * not 4 separate scans). NULL subtotal rows sort NULLS FIRST in both
    * engines, same as q6_rollup; both grouping columns are NOT NULL in
    * the data, so a NULL unambiguously marks a subtotal.
    */
  val q8Cube: Q = (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        sum(col("o_totalprice").cast("decimal(28,4)")).cast("double").as("revenue"),
        count(lit(1)).cast("long").as("n_orders"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  val q8Sql =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Sliding time-range window: per-user value total over the trailing
    * hour at each event (RANGE frame over epoch-ms — value-based, so
    * tie rows share a frame and the result is order-independent; decimal
    * accumulation keeps the sum exact cross-engine). The time-bounded
    * cousin of w3's running sum — rate limiting / rolling exposure, the
    * shape a feature pipeline computes per entity.
    */
  val w7RangeWindow: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("__epoch_ms"))
      .rangeBetween(-3600000L, 0L)
    ev(s, d)
      .withColumn("__epoch_ms", unix_millis(col("ts").cast("timestamp")))
      .select(col("user_id"), col("event_id"),
        sum(col("value").cast("decimal(28,6)")).over(w).cast("double").as("hour_value"))
      .orderBy("user_id", "event_id")
  }
  val w7Sql =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
      |    PARTITION BY user_id ORDER BY epoch_ms(CAST(ts AS TIMESTAMP))
      |    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Pivot (status × priority matrix): the idiomatic Spark form with
    * EXPLICIT pivot values — `.pivot(col)` without values runs an extra
    * distinct job over the whole table to discover them, which at 100 TB
    * is a full scan spent learning three letters. Decimal sums cast to
    * double for cross-engine bit parity.
    */
  val q7Pivot: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(sum(col("o_totalprice").cast("decimal(28,4)")).cast("double"))
      .orderBy("o_orderpriority")
  val q7Sql =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) FILTER (o_orderstatus = 'O') AS DOUBLE) AS "O",
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS "F",
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) FILTER (o_orderstatus = 'P') AS DOUBLE) AS "P"
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Distribution windows: decile, percent_rank, cume_dist within each
    * priority class (partitioned — a single global ORDER BY window would
    * serialize onto one task at scale). The doubles are exact cross-engine:
    * both engines compute the same integer-ratio divisions.
    */
  val w6Distribution: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"),
      ntile(10).over(w).as("decile"),
      percent_rank().over(w).as("pct_rank"),
      cume_dist().over(w).as("cume"))
      .orderBy("o_orderkey")
  }
  val w6Sql =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(NTILE(10) OVER w AS INT) AS decile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Running (cumulative) value per user over event time — exact decimal
    * accumulation cast to double per row.
    */
  val w3RunningSum: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev(s, d).select(col("user_id"), col("event_id"),
      sum(col("value").cast("decimal(28,6)")).over(w).cast("double").as("running_value"))
      .orderBy("user_id", "event_id")
  }
  val w3Sql =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
      |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** Lead/lag: inter-event gap per user in milliseconds (exact longs). */
  val w4LeadLag: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev(s, d).select(col("user_id"), col("event_id"),
      (unix_millis(col("ts").cast("timestamp")) -
        lag(unix_millis(col("ts").cast("timestamp")), 1).over(w)).as("gap_ms"),
      (lead(unix_millis(col("ts").cast("timestamp")), 1).over(w) -
        unix_millis(col("ts").cast("timestamp"))).as("next_gap_ms"))
      .orderBy("user_id", "event_id")
  }
  val w4Sql =
    """SELECT user_id, event_id,
      |  epoch_ms(CAST(ts AS TIMESTAMP)) - LAG(epoch_ms(CAST(ts AS TIMESTAMP)), 1) OVER w AS gap_ms,
      |  LEAD(epoch_ms(CAST(ts AS TIMESTAMP)), 1) OVER w - epoch_ms(CAST(ts AS TIMESTAMP)) AS next_gap_ms
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** Gap-based sessionization: a new session starts after a >30-minute
    * silence; session_id = cumulative count of session starts (exact
    * integer logic, the classic training-pipeline event grouping).
    */
  val w5Sessionize: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMs = unix_millis(col("ts").cast("timestamp")) -
      lag(unix_millis(col("ts").cast("timestamp")), 1).over(w)
    ev(s, d)
      .withColumn("__new_session",
        when(gapMs.isNull || gapMs > 30L * 60000L, 1L).otherwise(0L))
      .select(col("user_id"), col("event_id"),
        sum(col("__new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long").as("session_id"))
      .orderBy("user_id", "event_id")
  }
  val w5Sql =
    """SELECT user_id, event_id,
      |  CAST(SUM(new_session) OVER (
      |    PARTITION BY user_id ORDER BY ts2, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |FROM (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts2,
      |    CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP)) - LAG(epoch_ms(CAST(ts AS TIMESTAMP)), 1)
      |           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) > 1800000
      |         OR LAG(epoch_ms(CAST(ts AS TIMESTAMP)), 1)
      |           OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events)
      |ORDER BY user_id, event_id""".stripMargin

  /** Exact interpolated percentiles (Spark `percentile` and DuckDB
    * `quantile_cont` share the linear-interpolation definition —
    * verified bit-identical).
    */
  val a9Percentiles: Q = (s, d) =>
    Tables.lineitem(s, d).groupBy(col("l_returnflag")).agg(
      expr("percentile(l_quantity, 0.5)").as("median_qty"),
      expr("percentile(l_quantity, 0.9)").as("p90_qty"),
      expr("percentile(l_extendedprice, 0.99)").as("p99_price"))
      .orderBy("l_returnflag")
  val a9Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  quantile_cont(l_extendedprice, 0.99) AS p99_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** HLL approximate distinct — the 100 TB fast path for check 3.
    * The raw HLL estimate is engine-specific (Spark's HLL++ vs DuckDB's
    * HLL give different values), so the GRADED claim is the estimate's
    * CHECKED ERROR BOUND: |HLL − exact| ≤ k·σ where σ = rsd·exact (the
    * analytic HLL standard deviation at the configured rsd) and k = 6
    * (P(violation) ~ 1e-9 for an unbiased estimator). The oracle
    * recomputes the exact count and asserts the bound held — a biased
    * or broken approx implementation flips `within_bound` to false and
    * the hash row goes red. The production fast path remains the
    * approx-only aggregate (no exact pass); this entry is its
    * certification.
    */
  val A2ApproxRsd = 0.01
  /** 6·rsd — one LITERAL constant (not a computed product, whose
    * round-to-nearest could differ from the SQL parser's) interpolated
    * into both engines so the graded double is bit-identical.
    */
  val A2ApproxRelBound = 0.06
  val a2Approx: Q = (s, d) =>
    Tables.lineitem(s, d).agg(
      count_distinct(concat_ws("|",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string")))
        .cast("long").as("n_exact"),
      approx_count_distinct(concat_ws("|",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string")),
        A2ApproxRsd).cast("long").as("approx"))
      .select(col("n_exact"),
        lit(A2ApproxRelBound).as("rel_err_bound"),
        (abs(col("approx") - col("n_exact")).cast("double") <=
          lit(A2ApproxRelBound) * col("n_exact").cast("double"))
          .as("within_bound"))
  val a2ApproxSql: String =
    s"""SELECT CAST(COUNT(DISTINCT CAST(l_orderkey AS VARCHAR) || '|' ||
       |    CAST(l_linenumber AS VARCHAR)) AS BIGINT) AS n_exact,
       |  CAST($A2ApproxRelBound AS DOUBLE) AS rel_err_bound,
       |  true AS within_bound
       |FROM lineitem""".stripMargin

  /** Histogram binning over order totals (exact integer bins). */
  val h1Histogram: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 10000.0).cast("long").as("bin"))
      .agg(count(lit(1)).cast("long").as("n_orders"))
      .orderBy("bin")
  val h1Sql =
    """SELECT CAST(FLOOR(o_totalprice / 10000.0) AS BIGINT) AS bin,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin

  /** As-of join: each click event enriched with the user's most recent
    * purchase value at-or-before the click (union+window technique —
    * one shuffle, no pair blow-up; see operators/AsOfJoin).
    */
  val j6Asof: Q = (s, d) => {
    val e = ev(s, d)
    val left = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val right = graft.operators.AsOfJoin.dedupRight(
      e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("purchase_value"),
          col("event_id")),
      "user_id", "ts", "event_id").drop("event_id")
    graft.operators.AsOfJoin.asOf(left, right, "user_id", "ts", Seq("purchase_value"))
      .orderBy("event_id")
  }
  val j6Sql =
    """WITH l AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |           FROM events WHERE event_type = 'click'),
      |r0 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value AS purchase_value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS TIMESTAMP)
      |                            ORDER BY event_id DESC) AS rn
      |       FROM events WHERE event_type = 'purchase'),
      |r AS (SELECT user_id, ts, purchase_value FROM r0 WHERE rn = 1)
      |SELECT l.event_id, l.user_id, l.ts, r.purchase_value
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.event_id""".stripMargin

  /** Stream-enrichment join shape: events enriched with a broadcast
    * dimension (the batch form of a stream-table join).
    */
  val j5Enrich: Q = (s, d) =>
    ev(s, d)
      .join(broadcast(Tables.customer(s, d)), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_name"), col("c_mktsegment"))
      .orderBy("event_id")
  val j5Sql =
    """SELECT event_id, user_id, event_type, c_name, c_mktsegment
      |FROM events JOIN customer ON user_id = c_custkey
      |ORDER BY event_id""".stripMargin
}
