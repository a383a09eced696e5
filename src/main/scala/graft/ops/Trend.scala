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

  /** q239: index-of-dispersion (Fano factor) audit per event type over
    * the hourly count series — the classic "is this arrival process
    * Poisson?" check (variance-to-mean ratio; Fano 1947). Bursty bot
    * traffic and retry storms are overdispersed (ratio ≫ 1), while a
    * rate-limited or batched feed is underdispersed (ratio ≪ 1); a
    * pipeline that alerts on either catches upstream behavior changes
    * before volume alarms do.
    *
    * Exact protocol: with S = Σc and Q = Σc² over the n observed
    * hours, sample-variance-to-mean = (nQ − S²) / ((n−1)·S), emitted
    * as one truncating ppm division over pure integer counts —
    * bit-identical on both engines. Intermediate products run in
    * DECIMAL(38,0): at cluster scale an hourly count is bounded by
    * ingest rate, not corpus size, but nQ crosses 2⁶³ long before the
    * ratio loses meaning.
    *
    * Scale shape: corpus → (type, hour) counts is one map-combined
    * aggregate bounded by |types| × time range (the q229/q232 frame);
    * the dispersion rollup re-aggregates that frame, never the
    * corpus. */
  def q239Dispersion(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("h"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("x")).as("sum_c"),
        sum(col("x") * col("x")).as("sum_c2"))
      .select(col("event_type"), col("n_hours"), col("sum_c"),
        expr("sum_c * 1000 div n_hours").as("mean_milli"),
        expr("""CAST((CAST(n_hours AS DECIMAL(38,0)) * sum_c2
               | - CAST(sum_c AS DECIMAL(38,0)) * sum_c) * 1000000
               | div ((n_hours - 1) * CAST(sum_c AS DECIMAL(38,0)))
               | AS BIGINT)""".stripMargin).as("dispersion_ppm"))
      .withColumn("verdict",
        when(col("dispersion_ppm") > 1100000L, lit("overdispersed"))
          .when(col("dispersion_ppm") < 900000L, lit("underdispersed"))
          .otherwise(lit("poisson-like")))
  }

  val q239Oracle: String =
    """WITH hourly AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS x
      |  FROM events GROUP BY 1, 2
      |), agg AS (
      |  SELECT event_type, count(*) AS n_hours,
      |    CAST(sum(x) AS BIGINT) AS sum_c,
      |    CAST(sum(x * x) AS BIGINT) AS sum_c2
      |  FROM hourly GROUP BY 1
      |)
      |SELECT event_type, n_hours, sum_c,
      |  CAST(sum_c * 1000 // n_hours AS BIGINT) AS mean_milli,
      |  CAST((CAST(n_hours AS HUGEINT) * sum_c2
      |    - CAST(sum_c AS HUGEINT) * sum_c) * 1000000
      |    // ((n_hours - 1) * CAST(sum_c AS HUGEINT)) AS BIGINT)
      |    AS dispersion_ppm,
      |  CASE WHEN CAST((CAST(n_hours AS HUGEINT) * sum_c2
      |      - CAST(sum_c AS HUGEINT) * sum_c) * 1000000
      |      // ((n_hours - 1) * CAST(sum_c AS HUGEINT)) AS BIGINT)
      |      > 1100000 THEN 'overdispersed'
      |    WHEN CAST((CAST(n_hours AS HUGEINT) * sum_c2
      |      - CAST(sum_c AS HUGEINT) * sum_c) * 1000000
      |      // ((n_hours - 1) * CAST(sum_c AS HUGEINT)) AS BIGINT)
      |      < 900000 THEN 'underdispersed'
      |    ELSE 'poisson-like' END AS verdict
      |FROM agg""".stripMargin

  /** q243: Theil–Sen slope estimator (Theil 1950, Sen 1968) per event
    * type over the hourly count series — the robust companion to
    * q232's Mann–Kendall direction test: MK says WHETHER the series
    * trends, Theil–Sen says HOW FAST, and unlike the q96/q109 OLS
    * family it shrugs off the outlier hours a traffic spike plants.
    * Estimate = the median of all pairwise slopes (x_j − x_i)/(h_j −
    * h_i), each slope held as one exact ppm-scaled truncating
    * division; the median is the LOWER median (0-based rank
    * (n−1) div 2), so the reported value is an element of the slope
    * set, not an average — exact on both engines.
    *
    * Scale shape: the pair join is |hours|² per type — quadratic in
    * the TIME RANGE, not the corpus (q232's argument; 720 hours →
    * 259k pairs/type) — equi-joined on event_type so pairs never
    * cross types. The median runs through [[Rank.groupRank]]'s
    * two-phase bucketed rank: no per-type full sort, no window over
    * the pair set. */
  def q243TheilSen(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.load(spark, dir, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("h"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("x"))
      .persist()
    val a = hourly.select(col("event_type"), col("h").as("hi"),
      col("x").as("xi"))
    val b = hourly.select(col("event_type"), col("h").as("hj"),
      col("x").as("xj"))
    val slopes = a.join(b, Seq("event_type")).filter(col("hi") < col("hj"))
      .select(col("event_type"),
        expr("(xj - xi) * 1000000 div (hj - hi)").as("slope_ppm"))
    Rank.groupRank(slopes, Seq("event_type"), "slope_ppm", Seq.empty,
        "rk", "n_pairs")
      .filter(col("rk") === expr("(n_pairs - 1) div 2"))
      .select(col("event_type"), col("n_pairs"),
        col("slope_ppm").as("sen_slope_ppm"))
  }

  val q243Oracle: String =
    """WITH hourly AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS x
      |  FROM events GROUP BY 1, 2
      |), slopes AS (
      |  SELECT a.event_type,
      |    CAST((b.x - a.x) * 1000000 // (b.h - a.h) AS BIGINT)
      |      AS slope_ppm
      |  FROM hourly a JOIN hourly b
      |    ON b.event_type = a.event_type AND a.h < b.h
      |), ranked AS (
      |  SELECT event_type, slope_ppm,
      |    row_number() OVER (PARTITION BY event_type ORDER BY slope_ppm)
      |      AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n_pairs
      |  FROM slopes
      |)
      |SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
      |  slope_ppm AS sen_slope_ppm
      |FROM ranked WHERE rn = (n_pairs + 1) // 2""".stripMargin

  /** q245: lagged cross-covariance between the purchase and error
    * hourly series — "do errors follow purchases?" The lead–lag sign
    * and magnitude of cov(x_t, y_{t+L}) over L ∈ {0..3} hours is the
    * screening statistic behind incident correlation and
    * cause-precedes-effect dashboards (the cross-series step up from
    * q191's single-series ACF).
    *
    * Exactness: both series are ZERO-FILLED onto the complete hour
    * grid [min h, max h] of the whole event stream before aligning —
    * a missing hour is a 0 count, not a dropped observation (skipping
    * it would silently bias every lag differently). The covariance
    * numerator n·Σxy − Σx·Σy is pure integer arithmetic in
    * DECIMAL(38,0); no normalization is applied, so no sqrt and no
    * float enters the output.
    *
    * Scale shape: events collapse once to the (type, hour) count
    * frame; the grid is `sequence()` over a 1-row min/max aggregate —
    * everything after the first aggregate is time-range-bounded
    * (|hours| × |lags| rows), independent of corpus size. */
  val Q245Lags: Seq[Int] = Seq(0, 1, 2, 3)

  def q245CrossCov(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("h"))
    val hourly = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("c"))
      .persist()
    // bounds from the already-aggregated hourly frame, not a second
    // corpus scan: min/max hour over counts == min/max hour over rows
    val grid = hourly.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      .select(explode(expr("sequence(mn, mx)")).as("t"),
        col("mx"))
    val px = hourly.filter(col("event_type") === "purchase")
      .select(col("h"), col("c").as("xc"))
    val ex = hourly.filter(col("event_type") === "error")
      .select(col("h"), col("c").as("yc"))
    Q245Lags.map { lag =>
      grid.filter(col("t") <= col("mx") - lag.toLong)
        .join(px, col("t") === px("h"), "left")
        .drop("h")
        .join(ex, col("t") + lag.toLong === ex("h"), "left")
        .select(col("t"), coalesce(col("xc"), lit(0L)).as("x"),
          coalesce(col("yc"), lit(0L)).as("y"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_x"),
          sum(col("y")).as("sum_y"),
          sum(col("x") * col("y")).as("sum_xy"))
        .select(lit(lag.toLong).as("lag"), col("n"), col("sum_x"),
          col("sum_y"), col("sum_xy"),
          expr("""CAST(CAST(n AS DECIMAL(38,0)) * sum_xy
                 | - CAST(sum_x AS DECIMAL(38,0)) * sum_y
                 | AS BIGINT)""".stripMargin).as("cov_num"))
    }.reduce(_ unionByName _)
  }

  val q245Oracle: String = {
    def one(lag: Int): String =
      s"""SELECT CAST($lag AS BIGINT) AS lag, count(*) AS n,
         |  CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
         |  CAST(sum(x * y) AS BIGINT) AS sum_xy,
         |  CAST(count(*) * CAST(sum(x * y) AS HUGEINT)
         |    - CAST(sum(x) AS HUGEINT) * sum(y) AS BIGINT) AS cov_num
         |FROM (
         |  SELECT g.t,
         |    coalesce(px.c, 0) AS x, coalesce(ex.c, 0) AS y
         |  FROM (SELECT unnest(generate_series(b.mn, b.mx - $lag)) AS t
         |        FROM bounds b) g
         |  LEFT JOIN hc px ON px.event_type = 'purchase' AND px.h = g.t
         |  LEFT JOIN hc ex ON ex.event_type = 'error' AND ex.h = g.t + $lag
         |)""".stripMargin
    s"""WITH hc AS (
       |  SELECT event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS c
       |  FROM events GROUP BY 1, 2
       |), bounds AS (
       |  SELECT min(CAST(floor(epoch(ts)) AS BIGINT) // 3600) AS mn,
       |         max(CAST(floor(epoch(ts)) AS BIGINT) // 3600) AS mx
       |  FROM events
       |)
       |${Q245Lags.map(one).mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** q249: Holt–Winters additive seasonal smoothing (Winters 1960) —
    * the seasonal completion of q229's level+trend Holt: hourly event
    * traffic has a strong hour-of-day cycle, and a forecaster that
    * ignores it pages someone every midnight. State per series is
    * (level, trend, 24 seasonal slots); weights are exact dyadics
    * (α = 1/4, β = 1/2, γ = 1/2), every step one truncating integer
    * division in a DEFINED order:
    *
    *   det  = x_t·1000 − S[h mod 24]
    *   L_t  = (det + 3·(L₋ + B₋)) div 4
    *   B_t  = (B₋ + (L_t − L₋)) div 2
    *   S[h mod 24] ← (S[h mod 24] + (x_t·1000 − L_t)) div 2
    *   forecast(next hour) = L_t + B_t + S[(h+1) mod 24]
    *
    * seeded L₁ = x₁·1000, B₁ = 0, S ≡ 0 (the first cycle learns the
    * seasonals from zero — a defined protocol, not an estimate).
    *
    * Scale shape: q229's exactly — corpus → (type, hour) counts in one
    * map-combined aggregate, then the order-sensitive recurrence runs
    * as ONE grouped aggregate-HOF fold whose state is 26 longs per
    * series (the 24-slot array rides inside the fold struct); no
    * window, no driver loop, no recursion. The DuckDB oracle replays
    * the identical recurrence as a recursive CTE carrying the 24-slot
    * LIST — the two formulations agreeing bit-for-bit is the test. */
  def q249HoltWinters(spark: SparkSession, dir: String): DataFrame = {
    val M = HoltScale
    val slot = "CAST(x.h % 24 AS INT)"
    val nextSlot = "CAST((x.h + 1) % 24 AS INT)"
    val det = s"(x.x * $M - element_at(acc.s, $slot + 1))"
    val lN = s"(($det + 3 * (acc.l + acc.b)) div 4)"
    val bN = s"((acc.b + ($lN - acc.l)) div 2)"
    val sN = s"((element_at(acc.s, $slot + 1) + (x.x * $M - $lN)) div 2)"
    val sUpd = s"transform(acc.s, (e, i) -> IF(i = $slot, $sN, e))"
    Tables.load(spark, dir, "events")
      .select(col("event_type"), expr("unix_timestamp(ts) div 3600").as("h"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(expr(
        s"""aggregate(
           |  array_sort(collect_list(named_struct('h', h, 'x', x))),
           |  named_struct('l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
           |    's', array_repeat(CAST(0 AS BIGINT), 24), 'first', true,
           |    'out', CAST(array() AS ARRAY<STRUCT<
           |      h: BIGINT, x: BIGINT, level_milli: BIGINT,
           |      trend_milli: BIGINT, seasonal_milli: BIGINT,
           |      forecast_milli: BIGINT>>)),
           |  (acc, x) -> CASE WHEN acc.first THEN named_struct(
           |      'l', x.x * $M, 'b', CAST(0 AS BIGINT), 's', acc.s,
           |      'first', false,
           |      'out', array_append(acc.out, named_struct(
           |        'h', x.h, 'x', x.x, 'level_milli', x.x * $M,
           |        'trend_milli', CAST(0 AS BIGINT),
           |        'seasonal_milli', CAST(0 AS BIGINT),
           |        'forecast_milli',
           |          x.x * $M + element_at(acc.s, $nextSlot + 1))))
           |    ELSE named_struct(
           |      'l', $lN, 'b', $bN, 's', $sUpd, 'first', false,
           |      'out', array_append(acc.out, named_struct(
           |        'h', x.h, 'x', x.x, 'level_milli', $lN,
           |        'trend_milli', $bN, 'seasonal_milli', $sN,
           |        'forecast_milli',
           |          $lN + $bN + element_at(acc.s, $nextSlot + 1)))) END,
           |  acc -> acc.out)""".stripMargin).as("curve"))
      .select(col("event_type"), explode(col("curve")).as("f"))
      .select(col("event_type"), col("f.h").as("h"), col("f.x").as("x"),
        col("f.level_milli"), col("f.trend_milli"),
        col("f.seasonal_milli"), col("f.forecast_milli"))
  }

  val q249Oracle: String = {
    val M = HoltScale
    val slot = "CAST(r.h % 24 AS INT)"
    val det = s"(r.x * $M - p.s[($slot) + 1])"
    val lN = s"(($det + 3 * (p.l + p.b)) // 4)"
    val bN = s"((p.b + ($lN - p.l)) // 2)"
    val sN = s"((p.s[($slot) + 1] + (r.x * $M - $lN)) // 2)"
    val sUpd = s"p.s[1:($slot)] || [$sN] || p.s[($slot) + 2:24]"
    val zeros = "[" + Seq.fill(24)("CAST(0 AS BIGINT)").mkString(", ") + "]"
    s"""WITH RECURSIVE hourly AS (
       |  SELECT event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, count(*) AS x
       |  FROM events GROUP BY 1, 2
       |), ranked AS (
       |  SELECT event_type, h, x,
       |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
       |  FROM hourly
       |), hw(event_type, rk, h, x, l, b, s) AS (
       |  SELECT event_type, rk, h, x, x * $M AS l, CAST(0 AS BIGINT) AS b,
       |    $zeros AS s
       |  FROM ranked WHERE rk = 1
       |  UNION ALL
       |  SELECT r.event_type, r.rk, r.h, r.x, $lN, $bN, $sUpd
       |  FROM hw p JOIN ranked r
       |    ON r.event_type = p.event_type AND r.rk = p.rk + 1
       |)
       |SELECT event_type, CAST(h AS BIGINT) AS h, CAST(x AS BIGINT) AS x,
       |  CAST(l AS BIGINT) AS level_milli, CAST(b AS BIGINT) AS trend_milli,
       |  CAST(s[(CAST(h % 24 AS INT)) + 1] AS BIGINT) AS seasonal_milli,
       |  CAST(l + b + s[(CAST((h + 1) % 24 AS INT)) + 1] AS BIGINT)
       |    AS forecast_milli
       |FROM hw""".stripMargin
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
