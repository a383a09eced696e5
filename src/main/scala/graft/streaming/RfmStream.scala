package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming RFM feature accumulation — q231's per-customer
  * (Recency, Frequency, Monetary) metric triple as LIVE per-key
  * state: the medallion story extended from dimensions and sketches
  * to feature engineering. State per customer is exactly 3 longs —
  *   r_day   ← max(r_day, order day)    (most recent order)
  *   f_cnt   ← f_cnt + 1                (lifetime order count)
  *   m_cents ← m_cents + order cents    (lifetime value)
  * — and each arriving order emits the post-update triple, so the
  * LATEST emission per key is always the customer's current feature
  * row (the serving-store shape a retention model reads).
  *
  * Equivalence contract (pinned in EquivalenceSpec): because
  * (max, count, sum) is a commutative monoid, the FINAL per-key
  * state equals q231's batch metric frame under ANY arrival order —
  * no in-order contract needed, unlike the Holt/EWMA recurrences
  * whose per-row emissions are order-sensitive. Downstream quintile
  * boundaries stay a batch (or periodic) concern: they are global
  * order statistics, not per-key state.
  *
  * Scale shape: state is O(|active customers|) × 3 longs, no
  * watermark needed (the triple never expires); RocksDB holds the
  * map, and the update is one point-read + one point-write per
  * order — the same bounded-state discipline as BalanceStream. */
object RfmStream {

  final case class OrderRow(o_custkey: Long, day: Long, cents: Long)
  final case class RfmRow(
      o_custkey: Long, r_day: Long, f_cnt: Long, m_cents: Long)

  /** The full streaming state for one customer. */
  final case class RFM(r: Long, f: Long, m: Long)

  private def step(st: RFM, day: Long, cents: Long): RFM =
    RFM(math.max(st.r, day), st.f + 1L, st.m + cents)

  def rfm(rows: Dataset[OrderRow]): Dataset[RfmRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.o_custkey)
      .flatMapGroupsWithState[RFM, RfmRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[OrderRow], state: GroupState[RFM]) =>
          var st = state.getOption.getOrElse(RFM(Long.MinValue, 0L, 0L))
          val out = batch.map { r =>
            st = step(st, r.day, r.cents)
            RfmRow(key, st.r, st.f, st.m)
          }.toVector
          state.update(st)
          out.iterator
      }
  }
}
