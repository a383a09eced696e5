package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming HLL register maintenance — the distinct-count sketch as
  * LIVE STATE. q49 proves the register state batch-exactly and q101
  * proves max-merge across groups; this operator runs the identical
  * register computation as a streaming keyed aggregate, so the state
  * store holds ≤ |event_types|·2^p integer cells however long the
  * stream runs — the 100 TB streaming answer to COUNT(DISTINCT),
  * whose exact keyed state would grow with the stream.
  *
  * The plan is the SAME declarative aggregate for batch and streaming
  * input (groupBy(type, bucket).max(rank)): max is the canonical
  * mergeable monoid, so Structured Streaming maintains it
  * incrementally per micro-batch with no custom state code. The
  * hash/rank expressions textually mirror the q49 generator
  * (Curation.hllRegisterSql, Spark dialect); the streaming≡batch
  * equivalence spec pins the two together bit-exactly, so any drift
  * between the copies fails CI.
  */
object SketchStream {

  private val wBits = 60 - graft.ops.Curation.HllP

  private val nibs = (0 until 15).map(j =>
    s"(instr('0123456789abcdef', substring(md5(CAST(user_id AS STRING)), ${j + 1}, 1)) - 1)")
  private val h = nibs.tail.foldLeft(s"CAST(${nibs.head} AS BIGINT)")(
    (acc, nib) => s"($acc * 16 + $nib)")
  private val rankCase = (1 to wBits)
    .map(k => s"WHEN ($h % ${1L << wBits}) >= ${1L << (wBits - k)} THEN $k")
    .mkString("CASE ", " ", s" ELSE ${wBits + 1} END")

  /** Works on batch AND streaming frames with (event_type, user_id):
    * one projection to (bucket, rank), one keyed max aggregate. On a
    * stream, run with OutputMode.Complete (or Update for deltas). */
  def registers(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr(s"$h div ${1L << wBits}").as("bucket"),
        expr(rankCase).as("rank"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rank")).as("max_rank"))

  /** Streaming count-min sketch — q80's frequency sketch as live
    * state. Counts are the other canonical mergeable monoid (HLL's is
    * max), so the SAME `Sketches.cmsCells` aggregate runs
    * incrementally per micro-batch; state is ≤ depth×width = 1024
    * integer cells however long the stream runs — the streaming
    * answer to "token frequencies over an unbounded corpus", whose
    * exact keyed state would grow with the vocabulary. Works on batch
    * AND streaming frames with a `text` column; on a stream run with
    * OutputMode.Complete (or Update for deltas). The batch≡streaming
    * equivalence spec pins the cells to q80's oracle-checked sketch. */
  def cmsSketch(docs: DataFrame): DataFrame =
    graft.ops.Sketches.cmsCells(docs.select(
      explode(graft.functions.TextFunctions.wsTokens(col("text"))).as("tok")))
}
