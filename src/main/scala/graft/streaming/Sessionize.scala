package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming via flatMapGroupsWithState — the
  * KeyValueGroupedDataset state API the engine exposes for operators
  * that watermarked joins/aggregations can't express (per-key session
  * assembly with gap timeout). State is per-key and bounded by the
  * event-time timeout, so it scales horizontally with the key space.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, lastSeen: Long, events: Int, total: Double)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, total_value: Double)

  /** Emits a session once a user has been idle past `gapMillis`
    * (event-time timeout keyed to the watermark). */
  def sessions(spark: SparkSession, events: Dataset[Event], gapMillis: Long,
      watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(
              userId, new Timestamp(s.start), new Timestamp(s.lastSeen),
              s.events, s.total))
          } else {
            val evs = batch.toSeq
            val prev = state.getOption
            val minTs = evs.map(_.ts.getTime).min
            val maxTs = evs.map(_.ts.getTime).max
            val next = prev match {
              case Some(s) => SessionState(
                math.min(s.start, minTs), math.max(s.lastSeen, maxTs),
                s.events + evs.size, s.total + evs.map(_.value).sum)
              case None => SessionState(minTs, maxTs, evs.size, evs.map(_.value).sum)
            }
            state.update(next)
            state.setTimeoutTimestamp(next.lastSeen + gapMillis)
            Iterator.empty
          }
      }
  }
}
