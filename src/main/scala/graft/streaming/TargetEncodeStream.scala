package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming target-encoding state — q251's per-key (event count,
  * conversion count) pair as LIVE per-key state, completing the
  * feature-engineering medallion story next to [[RfmStream]]: the
  * serving store keeps each user's support and conversions current,
  * and the encoder enc = (conv + m·prior) / (n + m) is computed at
  * read time against the prior of the consumer's choice.
  *
  * State per user is exactly 2 longs —
  *   n_events ← n_events + 1                       (support)
  *   n_conv   ← n_conv + [event is a conversion]   (positives)
  * — and each arriving event emits the post-update pair, so the
  * LATEST emission per key is always the user's current feature row.
  *
  * Equivalence contract (pinned in EquivalenceSpec): (count, sum) is
  * a commutative monoid, so the FINAL per-key state equals q251's
  * batch per-user aggregate under ANY arrival order — the same
  * order-free contract as RfmStream, stronger than the in-order
  * Holt/EWMA recurrences. The smoothing PRIOR stays a batch (or
  * periodic) concern, exactly like RFM's quintile boundaries: it is
  * a global statistic over all keys, not per-key state — a streaming
  * "running prior" would make every past emission retroactively
  * stale, which is the leak the m-estimate exists to prevent.
  *
  * Scale shape: state is O(|active users|) × 2 longs, no watermark
  * (support never expires); RocksDB holds the map, and the update is
  * one point-read + one point-write per event — the same
  * bounded-state discipline as BalanceStream/RfmStream. */
object TargetEncodeStream {

  final case class EventRow(user_id: Long, event_type: String)
  final case class TeRow(user_id: Long, n_events: Long, n_conv: Long)

  /** The full streaming state for one user. */
  final case class TE(n: Long, conv: Long)

  private def step(st: TE, eventType: String): TE =
    TE(st.n + 1L, st.conv + (if (eventType == "purchase") 1L else 0L))

  def targetCounts(rows: Dataset[EventRow]): Dataset[TeRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[TE, TeRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[EventRow], state: GroupState[TE]) =>
          var st = state.getOption.getOrElse(TE(0L, 0L))
          val out = batch.map { r =>
            st = step(st, r.event_type)
            TeRow(key, st.n, st.conv)
          }.toVector
          state.update(st)
          out.iterator
      }
  }
}
