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
            // Walk the batch in event-time order, splitting at every
            // >gap step — a micro-batch carrying several sessions'
            // events must close all but the trailing one immediately,
            // or the operator diverges from the batch gap rule
            // (EquivalenceSpec pins this equivalence).
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMillis =>
                  cur = Some(SessionState(
                    s.start, math.max(s.lastSeen, t), s.events + 1, s.total + e.value))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start),
                    new Timestamp(s.lastSeen), s.events, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMillis)
            }
            closed.result().iterator
          }
      }
  }
}
