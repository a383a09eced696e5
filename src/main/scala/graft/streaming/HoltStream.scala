package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Holt linear-trend smoothing — q229's integer double
  * exponential smoother as LIVE per-key state. Unlike EmaStream's ring
  * buffer, Holt's state is the two accumulators the recurrence itself
  * carries: (level, trend) — exactly 2 longs + a seed flag per key
  * however long the stream runs, the tightest state bound in the
  * streaming family. Each arriving hourly count advances
  *   L ← (x·1000 + 3·(L + B)) div 4,  B ← (B + (L' − L)) div 2
  * (truncating div, the q229 arithmetic verbatim), and emits the same
  * row the batch fold produces — batch ≡ streaming is bit-exact on
  * in-order feeds (EquivalenceSpec pins it against q229's
  * aggregate-HOF fold over the same rows).
  *
  * Contract: rows for a key arrive in non-decreasing hour order;
  * within a micro-batch the group is sorted by hour before folding
  * (the EmaStream contract).
  */
object HoltStream {

  final case class HourCount(event_type: String, h: Long, x: Long)
  final case class HoltRow(
      event_type: String, h: Long, x: Long,
      level_milli: Long, trend_milli: Long, forecast_milli: Long)

  private val Scale = graft.ops.Trend.HoltScale

  /** (level, trend, seeded) — the full streaming state for one key. */
  final case class LB(l: Long, b: Long, seeded: Boolean)

  private def step(key: String, h: Long, x: Long, st: LB): (HoltRow, LB) =
    if (!st.seeded) {
      val l = x * Scale
      (HoltRow(key, h, x, l, 0L, l), LB(l, 0L, seeded = true))
    } else {
      val lNext = (x * Scale + 3L * (st.l + st.b)) / 4L
      val bNext = (st.b + (lNext - st.l)) / 2L
      (HoltRow(key, h, x, lNext, bNext, lNext + bNext),
        LB(lNext, bNext, seeded = true))
    }

  def holt(rows: Dataset[HourCount]): Dataset[HoltRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.event_type)
      .flatMapGroupsWithState[LB, HoltRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[HourCount], state: GroupState[LB]) =>
          var st = state.getOption.getOrElse(LB(0L, 0L, seeded = false))
          val out = batch.toSeq.sortBy(_.h).map { r =>
            val (row, next) = step(key, r.h, r.x, st)
            st = next
            row
          }
          state.update(st)
          out.iterator
      }
  }
}
