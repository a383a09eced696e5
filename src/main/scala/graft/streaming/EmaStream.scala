package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming EWMA — q202's truncated α=1/2 smoother as LIVE per-key
  * state. The batch twin's window frame ("this hour plus the 7
  * observed hours before it") becomes a per-key ring buffer of the
  * last 7 counts: state is EXACTLY ≤ 7 longs per key however long the
  * stream runs — the bounded-state discipline every streaming operator
  * in this engine keeps (cf. KmvStream's O(k) registers, Scd1's
  * current row). Each arriving hourly count emits one smoothed row
  * computed from the buffer with the same integer weights 128…1 and
  * partial-window renormalization as the batch operator, so
  * batch ≡ streaming is bit-exact on in-order feeds (EquivalenceSpec
  * pins it).
  *
  * Contract: rows for a key arrive in non-decreasing hour order
  * (the upstream hourly aggregate emits them that way); within a
  * micro-batch the group is sorted by hour before folding.
  */
object EmaStream {

  final case class HourCount(event_type: String, h: Long, c: Long)
  final case class EmaRow(
      event_type: String, h: Long, c: Long,
      ema_num: Long, ema_den: Long, ema_milli: Long)

  private val Terms = graft.ops.Audit.EmaTerms

  /** prev is most-recent-first, length ≤ Terms − 1. */
  private def smooth(key: String, h: Long, c: Long, prev: List[Long]): EmaRow = {
    val vals = c :: prev // index i = lag i
    val num = vals.zipWithIndex.map { case (v, i) =>
      v * (1L << (Terms - 1 - i))
    }.sum
    val den = vals.indices.map(i => 1L << (Terms - 1 - i)).sum
    EmaRow(key, h, c, num, den, num * 1000 / den)
  }

  def ema(rows: Dataset[HourCount]): Dataset[EmaRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.event_type)
      .flatMapGroupsWithState[List[Long], EmaRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[HourCount], state: GroupState[List[Long]]) =>
          var prev = state.getOption.getOrElse(Nil)
          val out = batch.toSeq.sortBy(_.h).map { r =>
            val row = smooth(key, r.h, r.c, prev)
            prev = (r.c :: prev).take(Terms - 1)
            row
          }
          state.update(prev)
          out.iterator
      }
  }
}
