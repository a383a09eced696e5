package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming clamped running balance — q225's wallet fold as LIVE
  * per-user state. The batch twin folds a day-ordered array; here the
  * fold state is carried across micro-batches as EXACTLY three longs
  * per user (balance, zero-day count, days seen) however long the
  * stream runs — the bounded-state discipline every streaming twin in
  * this engine keeps (EmaStream's ring buffer, KmvStream's k
  * registers). The clamp makes the fold non-associative, so order is
  * the semantics: rows for a user must arrive in non-decreasing day
  * order across batches (the upstream daily aggregate emits them that
  * way), and within a micro-batch the group is sorted by day before
  * folding. Each day emits one row carrying the post-clamp balance —
  * batch ≡ streaming is pinned bit-exact in EquivalenceSpec.
  */
object BalanceStream {

  final case class DayNet(user_id: Long, day: Long, net: Long)
  final case class BalanceRow(
      user_id: Long, day: Long, n_days: Long, bal: Long, z: Long)

  final case class WalletState(bal: Long, z: Long, n: Long)

  def balances(rows: Dataset[DayNet]): Dataset[BalanceRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.user_id)
      .flatMapGroupsWithState[WalletState, BalanceRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[DayNet], state: GroupState[WalletState]) =>
          var st = state.getOption.getOrElse(WalletState(0L, 0L, 0L))
          val out = batch.toSeq.sortBy(_.day).map { r =>
            val bal = math.max(st.bal + r.net, 0L)
            st = WalletState(bal, st.z + (if (bal == 0L) 1L else 0L), st.n + 1L)
            BalanceRow(user, r.day, st.n, st.bal, st.z)
          }
          state.update(st)
          out.iterator
      }
  }
}
