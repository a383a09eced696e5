package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming LOCF gap fill — the stateful twin of the batch q97
  * operator: per key, emit one row per event-time hour as the
  * watermark passes it, carrying the last observed hourly sum forward
  * through empty hours (last-observation-carried-forward) and marking
  * imputed rows. flatMapGroupsWithState with an event-time timeout so
  * gap rows keep flowing while a key is silent — a windowed aggregate
  * alone cannot emit rows for hours that had NO input.
  *
  * State per key: the pending (not yet watermark-passed) hourly sums,
  * the last flushed hour, and the last observed fill value — bounded
  * by the watermark lateness window, never by stream length (flushed
  * hours leave the map; the q97 batch twin's grid is time-bounded the
  * same way). Emission is deterministic in event time: hours flush in
  * order, exactly once, when `hour + 1h ≤ watermark`.
  */
object GapFill {

  final case class Tick(event_type: String, ts: Timestamp, value: Double)
  final case class FillState(
      pending: Map[Long, (Long, Long)], // hourMs -> (n, cents)
      lastFlushed: Long,                // hourMs of last emitted row, or -1
      lastFill: Option[Long])           // cents carried forward
  final case class Filled(
      event_type: String, hour: Timestamp, n_events: Long,
      filled_cents: Option[Long], is_gap: Boolean)

  private val HourMs = 3600L * 1000L

  def fill(spark: SparkSession, events: Dataset[Tick],
      watermarkDelay: String = "10 seconds"): Dataset[Filled] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[FillState, Filled](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, batch: Iterator[Tick], state: GroupState[FillState]) =>
          val prev = state.getOption.getOrElse(FillState(Map.empty, -1L, None))
          // fold the new events into the pending hour sums
          val pending = batch.foldLeft(prev.pending) { (m, e) =>
            val h = math.floorDiv(e.ts.getTime, HourMs) * HourMs
            val cents = math.round(e.value * 100.0)
            val (n, c) = m.getOrElse(h, (0L, 0L))
            m.updated(h, (n + 1L, c + cents))
          }
          val wm = state.getCurrentWatermarkMs()
          // flush every hour whose end the watermark has passed, in
          // order, filling holes since the last flushed hour
          val flushable = pending.keys.filter(_ + HourMs <= wm)
          val out = Seq.newBuilder[Filled]
          var lastFlushed = prev.lastFlushed
          var lastFill = prev.lastFill
          if (flushable.nonEmpty) {
            val hi = flushable.max
            val lo =
              if (lastFlushed >= 0L) lastFlushed + HourMs else flushable.min
            var h = lo
            while (h <= hi) {
              pending.get(h) match {
                case Some((n, c)) =>
                  lastFill = Some(c)
                  out += Filled(key, new Timestamp(h), n, lastFill, is_gap = false)
                case None =>
                  out += Filled(key, new Timestamp(h), 0L, lastFill, is_gap = true)
              }
              lastFlushed = h
              h += HourMs
            }
          } else if (state.hasTimedOut && lastFlushed >= 0L) {
            // silent key: keep emitting gap rows up to the watermark
            var h = lastFlushed + HourMs
            while (h + HourMs <= wm) {
              out += Filled(key, new Timestamp(h), 0L, lastFill, is_gap = true)
              lastFlushed = h
              h += HourMs
            }
          }
          val remaining = pending.filter { case (h, _) => h > lastFlushed }
          state.update(FillState(remaining, lastFlushed, lastFill))
          // re-arm past the current watermark so gap emission continues
          // even if this key never sees another event
          state.setTimeoutTimestamp(math.max(wm, 0L) + HourMs)
          out.result().iterator
      }
  }
}
