package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Trend analytics over the event stream's hourly series: Holt double
  * exponential smoothing (level + trend state, the forecasting step up
  * from q202's level-only EWMA) and the Mann–Kendall monotonic-trend
  * test (the standard nonparametric "is this metric drifting" check a
  * data-quality monitor runs per partition/day). The reference's
  * pipelines land exactly this kind of per-window operational series
  * (reference: noaa_bronze_layer daily batch cadence,
  * noaa_bronze_layer/resources/sample_job.job.yml:8-12), and trend
  * detection over it is what pages someone.
  *
  * Both operators follow the repo's exact-arithmetic discipline: state
  * and statistics are integers end to end (floor division at every
  * smoothing step; sign counts and 18-scaled variance for MK), so the
  * DuckDB oracles hash-match bit-for-bit — no transcendentals except
  * IEEE-exact sqrt from identical integers on both engines.
  */
object Trend {

  /** Holt smoothing weights as exact dyadic rationals: α = 1/4
    * (level), β = 1/2 (trend) — divisors 4 and 2 keep every step one
    * truncating integer division, and the state scale (milli) keeps
    * three digits of sub-count resolution through the recurrence. */
  val HoltScale = 1000L

  /** Integer division for the smoothing steps. The trend state B can
    * dip below zero on a falling series, and there both engines
    * TRUNCATE toward zero — Spark's `div` by definition, and DuckDB's
    * `//` verified empirically (SELECT -657 // 2 → -328, not -329; it
    * is C-style truncating division, not Python's floor) — so plain
    * `div` is the bit-exact mirror and no floor emulation is needed. */
  private def floorDivSql(n: String, d: Long): String =
    s"(($n) div $d)"

  /** q229: Holt linear-trend smoothing (double exponential smoothing,
    * Holt 1957) of each event type's hourly count series. Per step:
    * L_t = (x_t·1000 + 3·(L_{t−1} + B_{t−1})) div 4   (α = 1/4)
    * B_t = (B_{t−1} + (L_t − L_{t−1})) div 2           (β = 1/2)
    * (div = truncation toward zero, identical on both engines);
    * seeded L_1 = x_1·1000, B_1 = 0; per-hour output carries the
    * level, the trend, and the one-step-ahead forecast L + B the
    * smoother would have issued for the NEXT hour.
    *
    * Scale shape: the corpus collapses to the (type, hour) count frame
    * in one map-combined aggregate — time-range bounded (q97/q202
    * argument), independent of corpus rows — and the order-sensitive
    * recurrence runs as ONE grouped aggregate-HOF fold over each
    * type's sorted array (the q220/q225 fold discipline), not as a
    * per-row recursion: no window, no driver loop, one shuffle. The
    * DuckDB oracle executes the same recurrence as a per-row recursive
    * CTE — the two formulations agreeing bit-for-bit IS the test. */
  def q229HoltTrend(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.load(spark, dir, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("h"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("x"))
    val lNext = floorDivSql(s"x.x * $HoltScale + 3 * (acc.l + acc.b)", 4L)
    val bNext = floorDivSql(s"acc.b + ($lNext - acc.l)", 2L)
    hourly.groupBy(col("event_type"))
      .agg(expr(
        s"""aggregate(
           |  array_sort(collect_list(named_struct('h', h, 'x', x))),
           |  named_struct('l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
           |    'first', true,
           |    'out', CAST(array() AS ARRAY<STRUCT<
           |      h: BIGINT, x: BIGINT, level_milli: BIGINT,
           |      trend_milli: BIGINT, forecast_milli: BIGINT>>)),
           |  (acc, x) -> CASE WHEN acc.first THEN named_struct(
           |      'l', x.x * $HoltScale, 'b', CAST(0 AS BIGINT),
           |      'first', false,
           |      'out', array_append(acc.out, named_struct(
           |        'h', x.h, 'x', x.x, 'level_milli', x.x * $HoltScale,
           |        'trend_milli', CAST(0 AS BIGINT),
           |        'forecast_milli', x.x * $HoltScale)))
           |    ELSE named_struct(
           |      'l', $lNext, 'b', $bNext, 'first', false,
           |      'out', array_append(acc.out, named_struct(
           |        'h', x.h, 'x', x.x, 'level_milli', $lNext,
           |        'trend_milli', $bNext,
           |        'forecast_milli', $lNext + $bNext))) END,
           |  acc -> acc.out)""".stripMargin).as("curve"))
      .select(col("event_type"), explode(col("curve")).as("f"))
      .select(col("event_type"), col("f.h").as("h"), col("f.x").as("x"),
        col("f.level_milli"), col("f.trend_milli"), col("f.forecast_milli"))
  }

  val q229Oracle: String =
    s"""WITH RECURSIVE hourly AS (
       |  SELECT event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS x
       |  FROM events GROUP BY 1, 2
       |), ranked AS (
       |  SELECT event_type, h, x,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
       |  FROM hourly
       |), holt(event_type, rk, h, x, l, b) AS (
       |  SELECT event_type, rk, h, x,
       |    x * $HoltScale AS l, CAST(0 AS BIGINT) AS b
       |  FROM ranked WHERE rk = 1
       |  UNION ALL
       |  SELECT r.event_type, r.rk, r.h, r.x,
       |    (r.x * $HoltScale + 3 * (p.l + p.b)) // 4,
       |    (p.b + ((r.x * $HoltScale + 3 * (p.l + p.b)) // 4 - p.l)) // 2
       |  FROM holt p JOIN ranked r
       |    ON r.event_type = p.event_type AND r.rk = p.rk + 1
       |)
       |SELECT event_type, CAST(h AS BIGINT) AS h, CAST(x AS BIGINT) AS x,
       |  CAST(l AS BIGINT) AS level_milli, CAST(b AS BIGINT) AS trend_milli,
       |  CAST(l + b AS BIGINT) AS forecast_milli
       |FROM holt""".stripMargin

  /** q232: Mann–Kendall trend test (Mann 1945, Kendall 1975) per event
    * type over the hourly count series: S = Σ_{i<j} sign(x_j − x_i),
    * tie-corrected variance Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]
    * / 18, and the continuity-corrected Z. S, the 18-scaled variance,
    * and the tie term are exact integers; Z alone is a double, computed
    * from those integers by one division and one sqrt — bit-identical
    * on both engines.
    *
    * Scale shape: the pair join is |hours|² PER TYPE — quadratic in the
    * TIME RANGE, not the corpus (720 hours → 260k pairs; a year of
    * minutes would instead call for the O(n log n) rank formulation) —
    * and it equi-joins on event_type, so pairs stay co-partitioned with
    * no cross-type fan-out. The tie term reuses the same hourly frame
    * grouped by count value. */
  def q232MannKendall(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.load(spark, dir, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("h"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("x"))
      .persist()
    val a = hourly.select(col("event_type"), col("h").as("hi"),
      col("x").as("xi"))
    val b = hourly.select(col("event_type"), col("h").as("hj"),
      col("x").as("xj"))
    val s = a.join(b, Seq("event_type")).filter(col("hi") < col("hj"))
      .groupBy(col("event_type"))
      .agg(sum(signum(col("xj") - col("xi")).cast("long")).as("s_stat"))
    val ties = hourly.groupBy(col("event_type"), col("x"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
          .as("tie_term"))
    s.join(ties, Seq("event_type"))
      .select(col("event_type"), col("n"), col("s_stat"),
        (col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L) -
          col("tie_term")).as("var18"),
        expr("""CASE WHEN var18 <= 0 THEN CAST(0.0 AS DOUBLE)
               |  WHEN s_stat > 0 THEN
               |    CAST(s_stat - 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
               |  WHEN s_stat < 0 THEN
               |    CAST(s_stat + 1 AS DOUBLE) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
               |  ELSE CAST(0.0 AS DOUBLE) END""".stripMargin).as("z"),
        expr("""CASE WHEN s_stat > 0 THEN 'increasing'
               |  WHEN s_stat < 0 THEN 'decreasing'
               |  ELSE 'none' END""".stripMargin).as("direction"))
  }

  val q232Oracle: String =
    """WITH hourly AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS x
      |  FROM events GROUP BY 1, 2
      |), s AS (
      |  SELECT a.event_type,
      |    CAST(sum(CASE WHEN b.x > a.x THEN 1
      |                  WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
      |      AS s_stat
      |  FROM hourly a JOIN hourly b
      |    ON b.event_type = a.event_type AND a.h < b.h
      |  GROUP BY 1
      |), ties AS (
      |  SELECT event_type, CAST(sum(t) AS BIGINT) AS n,
      |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      |  FROM (SELECT event_type, x, count(*) AS t
      |        FROM hourly GROUP BY 1, 2)
      |  GROUP BY 1
      |)
      |SELECT s.event_type, n, s_stat,
      |  CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT) AS var18,
      |  CASE WHEN n * (n - 1) * (2 * n + 5) - tie_term <= 0
      |      THEN CAST(0.0 AS DOUBLE)
      |    WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) /
      |      sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) /
      |           CAST(18.0 AS DOUBLE))
      |    WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) /
      |      sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) /
      |           CAST(18.0 AS DOUBLE))
      |    ELSE CAST(0.0 AS DOUBLE) END AS z,
      |  CASE WHEN s_stat > 0 THEN 'increasing'
      |    WHEN s_stat < 0 THEN 'decreasing'
      |    ELSE 'none' END AS direction
      |FROM s JOIN ties ON ties.event_type = s.event_type""".stripMargin
}
