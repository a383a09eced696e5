package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Causal-evaluation operators: stratified treatment-effect estimation
  * and isotonic (PAV) probability calibration — the measurement layer a
  * production experimentation/ML platform runs over the same star
  * schema the reference's silver tables land (dim_customer segments,
  * fact event streams). Companions to q224's χ² A/B test: q233 answers
  * "how BIG is the effect, de-confounded by stratum", q234 makes a
  * score's probabilities honest before anyone thresholds it.
  *
  * Discipline as everywhere: deterministic md5 assignment, exact
  * integer sums, floor divisions at documented points only — both
  * engines replay the identical protocol bit-for-bit.
  */
object Causal {

  /** q233: stratified average treatment effect (the direct-
    * standardization / blocking estimator; Cochran 1968). Customers
    * are deterministically split into treatment (md5 hex < '8' — one
    * bit, 50/50) and control; the outcome is lifetime order cents
    * (customers with no orders count as zero — the intent-to-treat
    * frame); strata are market segments. Per stratum: arm sizes, arm
    * outcome totals, and the arm-mean difference in milli-cents
    * (each mean floored once); overall: the stratum-size-weighted ATE
    * Σ nₛ·dₛ / Σ nₛ — the confounder-adjusted effect a naive pooled
    * difference would misstate if segment sizes drifted between arms.
    *
    * Scale shape: one map-combined aggregate per table — customer
    * (assignment + stratum) left-joins the pre-aggregated per-customer
    * order totals on the FK, then collapses to the |segments|×2 cell
    * frame; every division happens on that statistics-sized frame. The
    * zero-arm guard mirrors q224: an empty arm yields NULL on BOTH
    * engines instead of Spark-NULL-vs-DuckDB-error. */
  def q233StratifiedAte(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), Exact.units(col("o_totalprice"), 2).as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
    val cells = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("segment"),
        (substring(md5(concat(lit("ate_"), col("c_custkey").cast("string"))),
          1, 1) < "8").as("treat"))
      .join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("segment"))
      .agg(
        sum(when(col("treat"), 1L).otherwise(0L)).as("n_treat"),
        sum(when(!col("treat"), 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("treat"), coalesce(col("cents"), lit(0L)))
          .otherwise(0L)).as("y_treat_cents"),
        sum(when(!col("treat"), coalesce(col("cents"), lit(0L)))
          .otherwise(0L)).as("y_ctrl_cents"))
      .withColumn("diff_milli",
        expr("""CASE WHEN n_treat = 0 OR n_ctrl = 0 THEN NULL
               |  ELSE y_treat_cents * 1000 div n_treat
               |     - y_ctrl_cents * 1000 div n_ctrl END""".stripMargin))
      .persist()
    // weighted over strata with BOTH arms populated (weights and
    // contributions must cover the same strata). The numerator can be
    // negative: both Spark `div` and DuckDB `//` truncate toward zero
    // (verified: SELECT -657 // 2 → -328), so plain div matches.
    val ate = cells.agg(
      expr("""CASE
             |  WHEN coalesce(sum(CASE WHEN diff_milli IS NOT NULL
             |      THEN n_treat + n_ctrl END), 0) = 0 THEN NULL
             |  ELSE sum(CASE WHEN diff_milli IS NOT NULL
             |      THEN (n_treat + n_ctrl) * diff_milli END)
             |    div sum(CASE WHEN diff_milli IS NOT NULL
             |      THEN n_treat + n_ctrl END)
             |END""".stripMargin).as("ate_milli"))
    cells.crossJoin(broadcast(ate))
      .select(col("segment"), col("n_treat"), col("n_ctrl"),
        col("y_treat_cents"), col("y_ctrl_cents"), col("diff_milli"),
        col("ate_milli"))
  }

  val q233Oracle: String =
    """WITH o AS (
      |  SELECT o_custkey,
      |    sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1
      |), cust AS (
      |  SELECT c.c_mktsegment AS segment,
      |    substring(md5('ate_' || CAST(c.c_custkey AS VARCHAR)), 1, 1) < '8'
      |      AS treat,
      |    coalesce(o.cents, 0) AS cents
      |  FROM customer c LEFT JOIN o ON o.o_custkey = c.c_custkey
      |), cells AS (
      |  SELECT segment,
      |    CAST(sum(CASE WHEN treat THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
      |    CAST(sum(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_ctrl,
      |    CAST(sum(CASE WHEN treat THEN cents ELSE 0 END) AS BIGINT)
      |      AS y_treat_cents,
      |    CAST(sum(CASE WHEN NOT treat THEN cents ELSE 0 END) AS BIGINT)
      |      AS y_ctrl_cents
      |  FROM cust GROUP BY 1
      |), d AS (
      |  SELECT *,
      |    CASE WHEN n_treat = 0 OR n_ctrl = 0 THEN NULL
      |      ELSE CAST(y_treat_cents * 1000 // n_treat
      |              - y_ctrl_cents * 1000 // n_ctrl AS BIGINT)
      |    END AS diff_milli
      |  FROM cells
      |), a AS (
      |  SELECT CASE WHEN coalesce(sum(CASE WHEN diff_milli IS NOT NULL
      |        THEN n_treat + n_ctrl END), 0) = 0 THEN NULL
      |    ELSE CAST(sum(CASE WHEN diff_milli IS NOT NULL
      |        THEN (n_treat + n_ctrl) * diff_milli END)
      |      // sum(CASE WHEN diff_milli IS NOT NULL
      |        THEN n_treat + n_ctrl END) AS BIGINT) END AS ate_milli
      |  FROM d
      |)
      |SELECT segment, n_treat, n_ctrl, y_treat_cents, y_ctrl_cents,
      |  diff_milli, ate_milli
      |FROM d CROSS JOIN a""".stripMargin

  /** q234 bin count: the calibration curve's score axis resolution. */
  val IsotonicBins = 10

  /** Pure PAV kernel (exposed for property tests): given the ordered
    * per-bin (conversions, trials) sequence, returns each input bin's
    * POOL totals after pool-adjacent-violators — the classic stack
    * scan, violations compared by cross-multiplication only. The
    * result is the unique isotonic L2 fit, so any merge order
    * reaches it; the property suite checks monotonicity, total
    * preservation, idempotence, and agreement with a brute-force
    * leftmost-merge fixpoint. */
  def pavPool(bins: IndexedSeq[(Long, Long)]): IndexedSeq[(Long, Long)] = {
    val st = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long, Long)]
    for (i <- bins.indices) {
      var cur = (i, i, bins(i)._1, bins(i)._2)
      while (st.nonEmpty && st.last._3 * cur._4 > cur._3 * st.last._4) {
        val p = st.remove(st.length - 1)
        cur = (p._1, cur._2, p._3 + cur._3, p._4 + cur._4)
      }
      st += cur
    }
    val out = new Array[(Long, Long)](bins.length)
    st.foreach { case (s, e, c, n) =>
      (s to e).foreach(i => out(i) = (c, n))
    }
    out.toIndexedSeq
  }

  /** q234: isotonic calibration via pool-adjacent-violators (Ayer et
    * al. 1955; the `CalibratedClassifierCV(method="isotonic")` step of
    * every score-producing pipeline). The "score" is the event value
    * binned into [[IsotonicBins]] equal-width bins over its observed
    * range; the label is whether the event converted (`purchase`).
    * PAV pools adjacent bins until the conversion-rate curve is
    * monotone nondecreasing, and each original bin reports its pool's
    * pooled rate in ppm — the calibrated probability.
    *
    * Violation tests compare rates by CROSS-MULTIPLICATION
    * (cₗ·nᵣ > cᵣ·nₗ), never by floating division, so the pooling
    * decisions — and therefore the pools themselves — are exact
    * integer arithmetic; PAV's solution is the unique isotonic
    * L2-minimizer, so the merge ORDER cannot change the result, which
    * is what lets the oracle merge leftmost-first while the Spark fold
    * runs the classic stack scan.
    *
    * Scale shape: the corpus collapses to the ≤[[IsotonicBins]]-row
    * (bin, conversions, trials) frame in one map-combined aggregate
    * (min/max bounds are one statistics aggregate broadcast into the
    * binning expression); the PAV scan itself runs in ONE task over
    * that statistics-sized group via flatMapGroups — the q189/q216
    * argument: the sequential part of the algorithm touches only
    * aggregate-sized state, corpus size only widens the parallel
    * aggregate below it. */
  def q234IsotonicCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, dir, "events")
      .select(Exact.units(col("value"), 2).as("centi"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("conv"))
    val bounds = ev.agg(min(col("centi")).as("mn"), max(col("centi")).as("mx"))
    val binned = ev.crossJoin(broadcast(bounds))
      .select(expr(s"((centi - mn) * $IsotonicBins) div (mx - mn + 1)")
        .as("bin"), col("conv"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("conv"))
    binned.as[(Long, Long, Long)]
      .groupByKey(_ => 0)
      .flatMapGroups { (_, it) =>
        val bins = it.toArray.sortBy(_._1) // ≤ IsotonicBins rows
        val pooled = pavPool(bins.toIndexedSeq.map {
          case (_, n, conv) => (conv, n)
        })
        bins.iterator.zip(pooled.iterator).map {
          case ((bin, bn, bc), (c, n)) => (bin, bn, bc, c * 1000000L / n)
        }
      }
      .toDF("bin", "n", "conv", "calibrated_ppm")
  }

  /** PAV by leftmost-merge, unrolled to [[IsotonicBins]] − 1 CTE steps
    * (the q189 unrolling pattern): each step finds the leftmost
    * adjacent rate violation (cross-multiplied, exact) and merges that
    * one pair; with ≤ 10 pools, 9 steps reach the fixpoint. Merge
    * order provably can't change the PAV solution — agreeing with the
    * Spark side's stack scan IS the test. */
  val q234Oracle: String = {
    val steps = (1 until IsotonicBins).map { i =>
      s"""x$i AS (
         |  SELECT ps, pe, c, n,
         |    lag(ps) OVER (ORDER BY ps) AS pps,
         |    lead(pe) OVER (ORDER BY ps) AS npe,
         |    lead(c) OVER (ORDER BY ps) AS nc,
         |    lead(n) OVER (ORDER BY ps) AS nn
         |  FROM s${i - 1}
         |), v$i AS (
         |  SELECT min(ps) AS vps FROM x$i
         |  WHERE nn IS NOT NULL AND c * nn > nc * n
         |), s$i AS (
         |  SELECT ps,
         |    CASE WHEN vps IS NOT NULL AND ps = vps THEN npe ELSE pe END
         |      AS pe,
         |    CASE WHEN vps IS NOT NULL AND ps = vps THEN c + nc ELSE c END
         |      AS c,
         |    CASE WHEN vps IS NOT NULL AND ps = vps THEN n + nn ELSE n END
         |      AS n
         |  FROM x$i CROSS JOIN v$i
         |  WHERE vps IS NULL OR pps IS NULL OR pps <> vps)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT CAST(round(value * 100.0) AS BIGINT) AS centi,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
       |  FROM events
       |), b AS (SELECT min(centi) AS mn, max(centi) AS mx FROM ev
       |), binned AS (
       |  SELECT ((centi - mn) * $IsotonicBins) // (mx - mn + 1) AS bin,
       |    count(*) AS n, CAST(sum(conv) AS BIGINT) AS conv
       |  FROM ev CROSS JOIN b GROUP BY 1
       |), s0 AS (
       |  SELECT bin AS ps, bin AS pe, conv AS c, n FROM binned
       |),
       |$steps
       |SELECT CAST(bi.bin AS BIGINT) AS bin, CAST(bi.n AS BIGINT) AS n,
       |  CAST(bi.conv AS BIGINT) AS conv,
       |  CAST(p.c * 1000000 // p.n AS BIGINT) AS calibrated_ppm
       |FROM binned bi
       |JOIN s${IsotonicBins - 1} p ON bi.bin BETWEEN p.ps AND p.pe""".stripMargin
  }

  /** q241: difference-in-differences (the Card–Krueger 1994 two-group
    * two-period estimator) — the panel companion to q233's stratified
    * ATE: when "treatment" arrives as a POLICY at a known date rather
    * than as a randomized split, the causal read is (post − pre) in
    * the treated group minus (post − pre) in the controls, which
    * cancels both the permanent group gap and the common time trend.
    * Treated group: BUILDING-segment customers; event date:
    * 1998-01-01; outcome: per-order value in cents.
    *
    * Exact protocol: the four cell means are each ONE truncating
    * milli-cent division of exact integer sums (q233's discipline);
    * the DiD is then pure subtraction of those already-floored longs —
    * a defined protocol both engines replay bit-for-bit (div and //
    * both truncate toward zero on the possibly-negative deltas). An
    * empty cell yields NULL, not an error, on both engines.
    *
    * Scale shape: one map-combined conditional aggregate over orders
    * with the customer dimension broadcast into the fact join — the
    * corpus collapses straight to the 2×2 cell totals; every division
    * happens on the single-row frame. */
  val DidCutoff = "1998-01-01"

  def q241DiffInDiff(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").as("treat"))
    def cell(t: Boolean, p: Boolean, suffix: String) = Seq(
      sum(when(col("treat") === t && col("post") === p, 1L).otherwise(0L))
        .as(s"n_$suffix"),
      sum(when(col("treat") === t && col("post") === p, col("cents"))
        .otherwise(0L)).as(s"y_$suffix"))
    val cells = cell(t = true, p = false, "treat_pre") ++
      cell(t = true, p = true, "treat_post") ++
      cell(t = false, p = false, "ctrl_pre") ++
      cell(t = false, p = true, "ctrl_post")
    val avgs = Seq("treat_pre", "treat_post", "ctrl_pre", "ctrl_post").map {
      s =>
        expr(s"CASE WHEN n_$s = 0 THEN NULL" +
          s" ELSE y_$s * 1000 div n_$s END").as(s"avg_${s}_milli")
    }
    // no broadcast hint on customer — it grows with the corpus and a
    // forced hint OOMs at scale; the optimizer (or AQE) broadcasts the
    // projection exactly while it fits (the q138 rule)
    Tables.load(spark, dir, "orders")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("treat"),
        (col("o_orderdate") >= lit(DidCutoff).cast("timestamp")).as("post"),
        Exact.units(col("o_totalprice"), 2).as("cents"))
      .agg(cells.head, cells.tail: _*)
      .select((Seq("treat_pre", "treat_post", "ctrl_pre", "ctrl_post")
        .map(s => col(s"n_$s")) ++ avgs): _*)
      .withColumn("did_milli",
        (col("avg_treat_post_milli") - col("avg_treat_pre_milli")) -
          (col("avg_ctrl_post_milli") - col("avg_ctrl_pre_milli")))
  }

  val q241Oracle: String =
    s"""WITH o AS (
       |  SELECT (c.c_mktsegment = 'BUILDING') AS treat,
       |    (o.o_orderdate >= TIMESTAMP '$DidCutoff') AS post,
       |    CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS cents
       |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |), cells AS (
       |  SELECT
       |    CAST(sum(CASE WHEN treat AND NOT post THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_treat_pre,
       |    CAST(sum(CASE WHEN treat AND post THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_treat_post,
       |    CAST(sum(CASE WHEN NOT treat AND NOT post THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_ctrl_pre,
       |    CAST(sum(CASE WHEN NOT treat AND post THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_ctrl_post,
       |    CAST(sum(CASE WHEN treat AND NOT post THEN cents ELSE 0 END)
       |      AS BIGINT) AS y_treat_pre,
       |    CAST(sum(CASE WHEN treat AND post THEN cents ELSE 0 END)
       |      AS BIGINT) AS y_treat_post,
       |    CAST(sum(CASE WHEN NOT treat AND NOT post THEN cents ELSE 0 END)
       |      AS BIGINT) AS y_ctrl_pre,
       |    CAST(sum(CASE WHEN NOT treat AND post THEN cents ELSE 0 END)
       |      AS BIGINT) AS y_ctrl_post
       |  FROM o
       |), a AS (
       |  SELECT n_treat_pre, n_treat_post, n_ctrl_pre, n_ctrl_post,
       |    CASE WHEN n_treat_pre = 0 THEN NULL
       |      ELSE CAST(y_treat_pre * 1000 // n_treat_pre AS BIGINT) END
       |      AS avg_treat_pre_milli,
       |    CASE WHEN n_treat_post = 0 THEN NULL
       |      ELSE CAST(y_treat_post * 1000 // n_treat_post AS BIGINT) END
       |      AS avg_treat_post_milli,
       |    CASE WHEN n_ctrl_pre = 0 THEN NULL
       |      ELSE CAST(y_ctrl_pre * 1000 // n_ctrl_pre AS BIGINT) END
       |      AS avg_ctrl_pre_milli,
       |    CASE WHEN n_ctrl_post = 0 THEN NULL
       |      ELSE CAST(y_ctrl_post * 1000 // n_ctrl_post AS BIGINT) END
       |      AS avg_ctrl_post_milli
       |  FROM cells
       |)
       |SELECT *,
       |  (avg_treat_post_milli - avg_treat_pre_milli)
       |    - (avg_ctrl_post_milli - avg_ctrl_pre_milli) AS did_milli
       |FROM a""".stripMargin
}
