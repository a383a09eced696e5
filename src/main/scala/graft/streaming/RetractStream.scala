package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming retractable-aggregate maintenance — q197's delta merge as
  * LIVE STATE. The insight carried over from the batch operator: per
  * group, (Δcount, Δcents) = (+1/-1/0, new − old) per change row form
  * an abelian GROUP under addition, so the maintained aggregate is a
  * plain keyed sum — Structured Streaming keeps it incrementally with
  * no custom state code, state bounded by |groups| (never by stream
  * length), and deletes/updates arrive as ordinary rows with negative
  * components rather than as state surgery. The serving-time view is
  * base_aggregate + these deltas (the q197 merge join); groups whose
  * membership retracts to zero carry (dn, dc) that exactly cancel the
  * base — the same cancellation the batch twin's filter relies on.
  *
  * Works on batch AND streaming frames with
  * (customer_id, change_type ∈ insert|delete|update, old_cents,
  * new_cents); on a stream run with OutputMode.Complete (or Update
  * for per-batch deltas). The batch≡streaming equivalence spec pins
  * the two bit-exactly.
  */
object RetractStream {

  def deltas(changes: DataFrame): DataFrame =
    changes.groupBy(col("customer_id"))
      .agg(
        sum(when(col("change_type") === "insert", lit(1L))
          .when(col("change_type") === "delete", lit(-1L))
          .otherwise(lit(0L))).as("dn"),
        sum(coalesce(col("new_cents"), lit(0L)) -
          coalesce(col("old_cents"), lit(0L))).as("dc"))
}
