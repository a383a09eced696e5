package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Keyless temporal band join — the missing shuffle plan for
  * `L JOIN R ON r.ts > l.ts AND r.ts <= l.ts + band` when no equi-key
  * exists.
  *
  * Spark executes a pure range theta-join as BroadcastNestedLoopJoin
  * (or a cartesian product when neither side fits in a broadcast):
  * O(|L|·|R|) comparisons and, at 100 TB, a plan that never finishes —
  * there is no open-source analog of Databricks' range-join
  * optimization in stock Spark 4.1. The classic fix is to QUANTIZE
  * time into buckets the width of the band: a right row at time t can
  * only band-match left rows whose bucket is floor(t/band) or the one
  * before, so duplicating each LEFT row into its own bucket and its
  * successor turns the theta join into an EQUI-join on the bucket id
  * with the exact predicate left as a residual filter. Cost: one
  * 2×|L| + |R| shuffle co-partitioned on the bucket — the same plan a
  * hand-partitioned MapReduce band join would use, expressed
  * declaratively so Catalyst still prunes/pushes around it.
  *
  * Correctness does not depend on the bucketing: every qualifying pair
  * lands in exactly ONE (probe bucket = right bucket) match — the
  * right row's bucket is unique, and the left row's two probe buckets
  * are distinct — so no dedup pass is needed; the residual predicate
  * then keeps exactly the in-band pairs.
  *
  * Reference behavior being generalized: the ±2-minute stream–stream
  * interval joins of the silver layer (
  * aw_silver_layer_sales/src/aw_silver_layer_sales/transformations/
  * sales_aw_silver_layer_dim_store.py) — this is the BATCH plan that
  * survives when neither side is a broadcastable dimension.
  */
object BandJoin {

  /** Inner band join of `left` to `right` on
    * `right.tsCol ∈ (left.tsCol, left.tsCol + bandSeconds]`, executed
    * as a bucket equi-join (shuffle co-partitioned, no nested loop).
    * Column name collisions are the caller's responsibility (alias
    * before calling); the bucket columns are dropped on exit. */
  def temporalBand(left: DataFrame, leftTs: Column, right: DataFrame,
      rightTs: Column, bandSeconds: Long): DataFrame = {
    // FLOOR division, not truncating `div`: for negative epoch seconds
    // (pre-1970 timestamps) truncation rounds toward zero, which would
    // put a qualifying right row outside the two probe buckets. With
    // floor, rsec ∈ (lsec, lsec+band] ⇒ ⌊rsec/band⌋ ∈ {⌊lsec/band⌋,
    // ⌊lsec/band⌋+1} holds for ALL epochs.
    def fdiv(x: String): String =
      s"($x div $bandSeconds) + (CASE WHEN $x % $bandSeconds < 0" +
        " THEN -1 ELSE 0 END)"
    val lb = left.withColumn("_lsec", unix_timestamp(leftTs))
      .withColumn("_probe_bkt",
        explode(array(expr(fdiv("_lsec")), expr(fdiv("_lsec") + " + 1"))))
    val rb = right.withColumn("_rsec", unix_timestamp(rightTs))
      .withColumn("_rbkt", expr(fdiv("_rsec")))
    lb.join(rb, col("_probe_bkt") === col("_rbkt") &&
        rightTs > leftTs &&
        rightTs <= leftTs + expr(s"INTERVAL $bandSeconds SECONDS"))
      .drop("_lsec", "_probe_bkt", "_rsec", "_rbkt")
  }

  /** q240: error-follows-purchase temporal correlation — for every
    * purchase event, how many `error` events (from ANY user — there is
    * deliberately no equi-key) land in the following 60 seconds, then
    * the distribution of that count. The per-purchase counts come from
    * [[temporalBand]]'s bucket equi-join; purchases with zero
    * following errors are restored by a left join back to the purchase
    * frame (the exploded probe side can't carry them through an outer
    * join without double-counting).
    *
    * Scale shape: two scans of events (filtered to one type each,
    * filters pushed to the parquet scan), one bucket-co-partitioned
    * shuffle ~2×|purchases| + |errors|, one map-combined count per
    * purchase, and a histogram aggregate bounded by the max in-band
    * error count. The oracle runs the same join as a plain range
    * theta-join — DuckDB's IEJoin handles it at test scale; stock
    * Spark would not at 100 TB, which is the point of the operator. */
  def q240BandJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("ts").as("e_ts"))
    val matched = temporalBand(purchases, col("p_ts"), errors,
        col("e_ts"), 60L)
      .groupBy(col("p_id")).agg(count(lit(1)).as("n_err"))
    purchases.join(matched, Seq("p_id"), "left")
      .select(coalesce(col("n_err"), lit(0L)).as("n_errors_60s"))
      .groupBy(col("n_errors_60s"))
      .agg(count(lit(1)).as("n_purchases"))
  }

  val q240Oracle: String =
    """WITH p AS (
      |  SELECT event_id AS p_id, ts AS p_ts FROM events
      |  WHERE event_type = 'purchase'
      |), e AS (
      |  SELECT ts AS e_ts FROM events WHERE event_type = 'error'
      |), cnt AS (
      |  SELECT p.p_id, count(e.e_ts) AS n_err
      |  FROM p LEFT JOIN e
      |    ON e.e_ts > p.p_ts AND e.e_ts <= p.p_ts + INTERVAL 60 SECOND
      |  GROUP BY 1
      |)
      |SELECT CAST(n_err AS BIGINT) AS n_errors_60s,
      |  count(*) AS n_purchases
      |FROM cnt GROUP BY 1""".stripMargin
}
