package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming distribution-drift monitoring — q176's binned TV-drift
  * cells as LIVE STATE. The per-(event_type, bin) reference/current
  * counts are a count monoid (SketchStream's argument: counts and
  * maxes are the two canonical mergeable aggregates), so the SAME
  * declarative aggregate `Audit.q176Cells` runs incrementally per
  * micro-batch with no custom state code; the state store holds
  * |types|·|bins| integer cells however long the stream runs — the
  * streaming answer to "is today's traffic drifting from the
  * reference window?", whose exact event-level state would grow with
  * the stream.
  *
  * The exact TV statistic itself (`Audit.q176Finish`) is cells-sized
  * arithmetic: run it inside `foreachBatch` over these cells (or on
  * the Complete-mode output table) to publish a live ppm drift score
  * per event type. The batch≡streaming equivalence spec pins the
  * streamed cells bit-exactly to the oracle-checked batch q176.
  */
object DriftStream {

  /** Works on batch AND streaming frames with
    * (event_type, ts, value); on a stream run with
    * OutputMode.Complete (or Update for deltas). */
  def cells(events: DataFrame): DataFrame =
    graft.ops.Audit.q176Cells(events)
}
