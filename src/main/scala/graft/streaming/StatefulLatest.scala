package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful per-key latest-state operator on
  * `flatMapGroupsWithState` — the continuously-stateful alternative to
  * the foreachBatch merge: the store lives in the streaming state
  * backend (RocksDB/HDFS at scale) and every input change emits a
  * normalized output event, turning an at-least-once CDC feed into a
  * clean upsert/delete changelog for downstream consumers.
  *
  * Emission rules per key (reference upsert-sink semantics,
  * connectors/sinks/postgres/trading.json:13-15):
  *  - newer event (ts, seq) than the held state → state updates and a
  *    `+` (upsert) or `-` (delete) record is emitted;
  *  - older/duplicate event (replay, T1/T9) → swallowed, nothing
  *    emitted — dedup happens here instead of at the sink.
  *
  * State is bounded per key (one row), and `ProcessingTimeTimeout`
  * evicts keys idle longer than `idleEvictMs` (tombstoned keys don't
  * linger forever — the analog of Kafka compaction's delete retention,
  * reference: connectors/sources/mariadb/trading.json:64-66).
  */
object StatefulLatest {

  case class KeyedChange(key: Long, op: String, tsMs: Long, seq: Long, payload: String)
  case class KeyState(tsMs: Long, seq: Long, op: String, payload: String)
  case class Emitted(key: Long, op: String, tsMs: Long, payload: String)

  implicit val keyStateEnc: Encoder[KeyState] = Encoders.product[KeyState]
  implicit val emittedEnc: Encoder[Emitted] = Encoders.product[Emitted]

  /** @param idleEvictMs 0 disables idle-key eviction (NoTimeout —
    * required when a test driver relies on `processAllAvailable`, which
    * never settles under continuous timeout-firing batches); positive
    * values evict keys idle longer than the duration.
    */
  def apply(changes: Dataset[KeyedChange], idleEvictMs: Long = 0L): Dataset[Emitted] = {
    import changes.sparkSession.implicits._
    val timeoutMode =
      if (idleEvictMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    changes.groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, Emitted](
        OutputMode.Append, timeoutMode) {
        (key: Long, events: Iterator[KeyedChange], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = events.toSeq.sortBy(e => (e.tsMs, e.seq))
            var cur = state.getOption
            val out = Seq.newBuilder[Emitted]
            sorted.foreach { e =>
              val newer = cur.forall(c =>
                e.tsMs > c.tsMs || (e.tsMs == c.tsMs && e.seq > c.seq))
              if (newer) {
                cur = Some(KeyState(e.tsMs, e.seq, e.op, e.payload))
                out += Emitted(key,
                  if (e.op == graft.operators.Envelope.OpDelete) "-" else "+",
                  e.tsMs, e.payload)
              } // else: stale replay — swallowed (T1 dedup)
            }
            cur.foreach(state.update)
            if (idleEvictMs > 0) state.setTimeoutDuration(idleEvictMs)
            out.result().iterator
          }
      }
  }
}
