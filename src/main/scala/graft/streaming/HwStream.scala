package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Holt–Winters additive seasonal smoothing — q249's
  * integer triple smoother as LIVE per-key state: (level, trend, the
  * 24 hour-of-day seasonal slots) = 26 longs + a seed flag per key
  * however long the stream runs. [[HoltStream]] holds the tightest
  * state in the family (2 longs); this is the same recurrence with
  * the seasonal ring riding along — still CONSTANT per key, which is
  * the whole 100 TB streaming argument.
  *
  * Each arriving hourly count advances (q249's arithmetic verbatim,
  * truncating division at every step, slot = h mod 24):
  *   L' = ((x·1000 − S[slot]) + 3·(L + B)) div 4
  *   B' = (B + (L' − L)) div 2
  *   S[slot] ← (S[slot] + (x·1000 − L')) div 2
  *   forecast = L' + B' + S[(h+1) mod 24]   (pre-update next slot)
  * and emits the same row the batch fold produces — batch ≡ streaming
  * is bit-exact on in-order feeds (EquivalenceSpec pins it against
  * q249's aggregate-HOF fold over the same rows).
  *
  * Contract: rows for a key arrive in non-decreasing hour order;
  * within a micro-batch the group is sorted by hour before folding
  * (the EmaStream/HoltStream contract).
  */
object HwStream {

  final case class HourCount(event_type: String, h: Long, x: Long)
  final case class HwRow(
      event_type: String, h: Long, x: Long,
      level_milli: Long, trend_milli: Long, seasonal_milli: Long,
      forecast_milli: Long)

  private val Scale = graft.ops.Trend.HoltScale
  private val Period = 24

  /** (level, trend, seasonal slots, seeded) — one key's full state. */
  final case class LBS(l: Long, b: Long, s: Seq[Long], seeded: Boolean)

  private def step(key: String, h: Long, x: Long, st: LBS): (HwRow, LBS) = {
    val slot = (h % Period).toInt
    val next = ((h + 1) % Period).toInt
    if (!st.seeded) {
      val l = x * Scale
      (HwRow(key, h, x, l, 0L, 0L, l + st.s(next)),
        LBS(l, 0L, st.s, seeded = true))
    } else {
      val det = x * Scale - st.s(slot)
      val lN = (det + 3L * (st.l + st.b)) / 4L
      val bN = (st.b + (lN - st.l)) / 2L
      val sN = (st.s(slot) + (x * Scale - lN)) / 2L
      (HwRow(key, h, x, lN, bN, sN, lN + bN + st.s(next)),
        LBS(lN, bN, st.s.updated(slot, sN), seeded = true))
    }
  }

  def holtWinters(rows: Dataset[HourCount]): Dataset[HwRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_.event_type)
      .flatMapGroupsWithState[LBS, HwRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[HourCount], state: GroupState[LBS]) =>
          var st = state.getOption
            .getOrElse(LBS(0L, 0L, Seq.fill(Period)(0L), seeded = false))
          val out = batch.toSeq.sortBy(_.h).map { r =>
            val (row, nextSt) = step(key, r.h, r.x, st)
            st = nextSt
            row
          }
          state.update(st)
          out.iterator
      }
  }
}
