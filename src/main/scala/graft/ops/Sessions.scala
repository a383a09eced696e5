package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch sessionization and vocabulary building — the batch
  * counterparts of the streaming Sessionize operator and the
  * tokenizer-training first step.
  */
object Sessions {

  /** Sessionize events per user with a 30-minute gap rule, via window
    * composition: lag() marks session starts, a cumulative sum numbers
    * sessions, then one aggregation per (user, session). Two window
    * passes over the same (user, ts) partitioning — Catalyst reuses the
    * single sort+shuffle, so the whole operator costs one exchange. */
  /** Events annotated with their per-user gap-rule session number —
    * the shared first stage of sessionization (q31) and session-level
    * co-occurrence mining (q71). */
  def assignSessions(ev: DataFrame, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > gapMs, 1)
          .otherwise(0))
      .withColumn("session_no",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  def sessionizeBatch(ev: DataFrame, gapMs: Long): DataFrame = {
    val marked = assignSessions(ev, gapMs)
    marked.groupBy(col("user_id"), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        Exact.sumFixed(col("value"), 2).as("session_value"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  def q31SessionizeBatch(spark: SparkSession, dir: String): DataFrame =
    sessionizeBatch(Tables.load(spark, dir, "events"), gapMs = 30 * 60 * 1000L)
      .select(col("user_id"), col("session_no"), col("n_events"),
        col("session_value"), to_date(col("session_start")).as("session_date"))

  val q31Oracle: String =
    s"""WITH marked AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
       |), numbered AS (
       |  SELECT user_id, ts, value,
       |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
       |  FROM marked)
       |SELECT user_id, session_no,
       |  count(*) AS n_events,
       |  ${Exact.sumFixedSql("value", 2)} AS session_value,
       |  CAST(min(ts) AS DATE) AS session_date
       |FROM numbered GROUP BY user_id, session_no""".stripMargin

  /** Vocabulary building: token → document frequency + total count,
    * top 100 by count (deterministic tiebreak). The first step of any
    * tokenizer training run: explode + two-level aggregation, partial
    * combines carry (token, counts) so the shuffle is vocabulary-sized,
    * not corpus-sized. */
  def q32Vocabulary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val tok = docs
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
    tok.groupBy(col("token"))
      .agg(
        count(lit(1)).as("total_count"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("total_count").desc, col("token").asc)
      .limit(100)
  }

  val q32Oracle: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      |  FROM documents)
      |SELECT token, count(*) AS total_count, count(DISTINCT doc_id) AS doc_freq
      |FROM tok GROUP BY token
      |ORDER BY total_count DESC, token ASC LIMIT 100""".stripMargin

  /** q61: ordered funnel analysis — how far each user progresses
    * through view → click → purchase with earliest-first matching
    * (first view, first STRICTLY-later click, first strictly-later
    * purchase). One shuffle: events collapse to a per-user sorted
    * array, then a single codegen'd `aggregate` fold replays the
    * user's history — the same sequential-fold trick that makes q37's
    * training oracle-checkable. Greedy earliest-first matching equals
    * the three-step min selection the SQL oracle runs, so the check is
    * bit-exact including the stage timestamps. The irrelevant
    * event_type rows are filtered BEFORE the shuffle (and the filter
    * reaches the parquet scan), so only funnel events move.
    * Per-user state is one array — the sessionization-class skew
    * assumption; `SkewJoin` salting applies if a key runs hot. */
  def q61Funnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val ev = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("event_type").as("et")).as("e"))
    val nullTs = lit(null).cast("timestamp")
    val init = struct(lit(0).as("stage"), nullTs.as("t_view"),
      nullTs.as("t_click"), nullTs.as("t_purchase"))
    def step(st: Column, e: Column): Column = {
      val ts = e.getField("ts")
      val et = e.getField("et")
      when(st.getField("stage") === 0 && et === "view",
        struct(lit(1).as("stage"), ts.as("t_view"),
          st.getField("t_click").as("t_click"),
          st.getField("t_purchase").as("t_purchase")))
        .when(st.getField("stage") === 1 && et === "click" &&
            ts > st.getField("t_view"),
          struct(lit(2).as("stage"), st.getField("t_view").as("t_view"),
            ts.as("t_click"), st.getField("t_purchase").as("t_purchase")))
        .when(st.getField("stage") === 2 && et === "purchase" &&
            ts > st.getField("t_click"),
          struct(lit(3).as("stage"), st.getField("t_view").as("t_view"),
            st.getField("t_click").as("t_click"), ts.as("t_purchase")))
        .otherwise(st)
    }
    ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("user_id"), aggregate(col("es"), init, step _).as("f"))
      .select(col("user_id"),
        col("f.stage").cast("long").as("funnel_stage"),
        col("f.t_view"), col("f.t_click"), col("f.t_purchase"))
  }

  /** Three-step min selection — provably the same greedy matching the
    * fold computes. */
  val q61Oracle: String =
    """WITH u AS (
      |  SELECT DISTINCT user_id FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')
      |), v AS (
      |  SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY 1
      |), c AS (
      |  SELECT e.user_id, min(e.ts) AS t_click
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
      |), p AS (
      |  SELECT e.user_id, min(e.ts) AS t_purchase
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
      |SELECT u.user_id,
      |  CAST(CASE WHEN p.t_purchase IS NOT NULL THEN 3
      |            WHEN c.t_click IS NOT NULL THEN 2
      |            WHEN v.t_view IS NOT NULL THEN 1
      |            ELSE 0 END AS BIGINT) AS funnel_stage,
      |  v.t_view, c.t_click, p.t_purchase
      |FROM u
      |LEFT JOIN v ON v.user_id = u.user_id
      |LEFT JOIN c ON c.user_id = u.user_id
      |LEFT JOIN p ON p.user_id = u.user_id""".stripMargin

  /** q62: weekly retention cohorts — users grouped by first-seen week,
    * counted per (cohort week, weeks-since-cohort) activity cell; the
    * classic growth-analytics triangle. Plan: first-seen agg (one
    * shuffle on user), the per-user cohort broadcast back onto the
    * event stream (cohort table is user-cardinality — broadcast at
    * dim scale, hash join beyond), distinct activity cells, then a
    * cell-count agg over cohort×offset (tiny). All date math is
    * Monday-truncated integer day arithmetic — exact in both engines. */
  def q62Retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    ev.join(cohorts, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** q71: session-level association mining — for every pair of event
    * types, how many gap-rule sessions contain both, with the derived
    * confidence (P(b|a)) and lift (observed / expected co-occurrence).
    * The classic market-basket pass, run on q31's session definition.
    * All supports are integers; confidence and lift are single
    * divisions of exact integers, so both engines produce identical
    * doubles. Plan: one sessionize window shuffle (shared sort with
    * q31), distinct (session, type) item sets, a self-join keyed on
    * the session id — bounded by items-per-session, never corpus² —
    * and a broadcast of the tiny per-type support table. */
  def q71Association(spark: SparkSession, dir: String): DataFrame = {
    val items = assignSessions(
        Tables.load(spark, dir, "events"), gapMs = 30 * 60 * 1000L)
      .select(col("user_id"), col("session_no"), col("event_type"))
      .distinct()
    val nSessions = items.select(col("user_id"), col("session_no"))
      .distinct().count()
    val singles = items.groupBy(col("event_type"))
      .agg(count(lit(1)).as("support"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.session_no") === col("b.session_no") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("support_ab"))
    pairs
      .join(broadcast(singles.select(col("event_type").as("type_a"),
        col("support").as("support_a"))), "type_a")
      .join(broadcast(singles.select(col("event_type").as("type_b"),
        col("support").as("support_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("support_ab"),
        col("support_a"), col("support_b"),
        (col("support_ab") / col("support_a")).as("confidence"),
        (col("support_ab") * lit(nSessions) /
          (col("support_a") * col("support_b"))).as("lift"))
  }

  val q71Oracle: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |), items AS (
      |  SELECT DISTINCT user_id, session_no, event_type FROM (
      |    SELECT user_id, event_type,
      |      sum(new_session) OVER (PARTITION BY user_id
      |                             ORDER BY ts ASC, event_id ASC
      |                             ROWS UNBOUNDED PRECEDING) AS session_no
      |    FROM marked) t
      |), n AS (
      |  SELECT count(*) AS n_sessions FROM
      |    (SELECT DISTINCT user_id, session_no FROM items) s
      |), singles AS (
      |  SELECT event_type, count(*) AS support FROM items GROUP BY 1
      |), pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    count(*) AS support_ab
      |  FROM items a JOIN items b
      |    ON a.user_id = b.user_id AND a.session_no = b.session_no
      |   AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, support_ab, sa.support AS support_a,
      |  sb.support AS support_b,
      |  support_ab / sa.support AS confidence,
      |  support_ab * n.n_sessions / (sa.support * sb.support) AS lift
      |FROM pairs
      |JOIN singles sa ON sa.event_type = type_a
      |JOIN singles sb ON sb.event_type = type_b
      |CROSS JOIN n""".stripMargin

  val q62Oracle: String =
    """WITH w AS (
      |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
      |), f AS (
      |  SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1
      |), cells AS (
      |  SELECT DISTINCT w.user_id, f.cohort_week,
      |    CAST(date_diff('day', f.cohort_week, w.week) // 7 AS BIGINT) AS week_offset
      |  FROM w JOIN f ON f.user_id = w.user_id)
      |SELECT cohort_week, week_offset, count(*) AS active_users
      |FROM cells GROUP BY 1, 2""".stripMargin

  /** q89: sliding event-time windows — `window(ts, 1 hour, 15 min)`,
    * the overlapping-window aggregation Structured Streaming uses for
    * rolling dashboards, run here in batch so the oracle can check the
    * window-assignment semantics exactly: each event lands in
    * duration/slide = 4 epoch-aligned windows. Spark expands the
    * windows with a generator BEFORE the hash aggregate, so the plan
    * is explode(4×) → partial agg → one shuffle on (window, type) —
    * per-event constant fan-out, no per-key state, exactly how the
    * streaming twin accumulates. Value sums are integer cents
    * ([[Exact]]); window bounds are µs timestamps on both sides.
    *
    * Oracle: reconstructs Spark's assignment rule — window starts are
    * the 4 slide-aligned µs marks at or before ts — with epoch_us
    * integer arithmetic, and aggregates identically. */
  def q89SlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(Exact.units(col("value"), 2)).cast("long").as("value_cents"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("value_cents"))
  }

  val q89Oracle: String =
    """WITH assigned AS (
      |  SELECT
      |    make_timestamp(((epoch_us(ts) // 900000000) - k) * 900000000)
      |      AS win_start,
      |    event_type, value
      |  FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
      |)
      |SELECT win_start, win_start + INTERVAL 1 HOUR AS win_end, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM assigned GROUP BY 1, 2, 3""".stripMargin

  /** q114: bot-traffic signals — per-user inter-event timing
    * statistics, the behavioral-curation screen that keeps automated
    * traffic out of a training corpus (the event-stream analog of
    * q47's text-repetition filters). Humans are bursty-but-irregular;
    * bots are fast and metronomic — so the signals are the gap
    * distribution's moments and its fast/zero tail, all in exact
    * integer milliseconds:
    *
    *   - mean and population variance of the per-user gaps via the
    *     q96/q72 moment discipline (Σg, Σg² as Decimal(38,0);
    *     n·Σg² − (Σg)² stays in integer space; both engines evaluate
    *     the identical double division) — low variance at high rate
    *     is the metronome signature;
    *   - n_zero_gaps (same-millisecond repeats) and n_fast_gaps
    *     (< 1 s), with the flag rule "majority of gaps fast" kept as
    *     an exact integer comparison (2·fast > gaps).
    *
    * One lag window partitioned by the high-cardinality user key, one
    * aggregate — the same two-exchange shape as q31 sessionization. */
  def q114BotSignals(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val g = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap",
        unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(byUser))
    val m = g.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("gap")).cast(dec).as("ng"),
        sum(col("gap").cast(dec)).as("sg"),
        sum((col("gap").cast(dec) * col("gap").cast(dec))).as("sgg"),
        min(col("gap")).as("min_gap_ms"),
        max(col("gap")).as("max_gap_ms"),
        sum((col("gap") === 0L).cast("long")).as("n_zero_gaps"),
        sum((col("gap") < 1000L).cast("long")).as("n_fast_gaps"))
      .filter(col("ng") > 0)
    m.select(col("user_id"), col("n_events"),
      col("ng").cast("long").as("n_gaps"),
      col("min_gap_ms"), col("max_gap_ms"),
      col("n_zero_gaps"), col("n_fast_gaps"),
      (col("sg").cast("double") / col("ng").cast("double"))
        .as("mean_gap_ms"),
      ((col("ng") * col("sgg") - col("sg") * col("sg")).cast("double") /
        (col("ng") * col("ng")).cast("double")).as("var_gap_ms"),
      (lit(2L) * col("n_fast_gaps") > col("ng").cast("long"))
        .as("is_bot_like"))
  }

  /** q118: TIME-weighted average value (TWAP) per (event_type, day) —
    * the metric that answers "what was the value, weighted by how long
    * it HELD", where a plain avg() overweights bursts. Each
    * observation holds from its timestamp until the next observation
    * of the same (type, day), the day's last until midnight (LOCF
    * weighting); the day's first observation starts at its own
    * timestamp, so the pre-first span is deliberately unweighted.
    *
    * Exactness: durations are integer milliseconds (ordering and
    * differencing at ms precision on BOTH engines — the raw ns digits
    * are not engine-shared, the q105 lesson), values integer cents,
    * so Σ(cents·dur) and Σdur are exact longs and the one double
    * division is over identical integers. Windows partition by
    * (type, day) — date-bounded slices, the scale-safe class. */
  def q118Twap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("ts"), col("event_id"),
        Exact.units(col("value"), 2).as("cents"))
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("day", to_date(col("ts")))
    val w = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ms").asc, col("event_id").asc)
    val dayEnd = unix_millis(col("day").cast("timestamp")) + lit(86400000L)
    ev.withColumn("nxt", lead(col("ms"), 1).over(w))
      .withColumn("dur", coalesce(col("nxt"), dayEnd) - col("ms"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("dur")).as("dur_ms"),
        sum(col("cents") * col("dur")).as("wsum_cents_ms"))
      .select(col("event_type"), col("day"), col("n_events"),
        col("dur_ms"), col("wsum_cents_ms"),
        (col("wsum_cents_ms").cast("double") / col("dur_ms").cast("double"))
          .as("twap_cents"))
  }

  val q118Oracle: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, epoch_ms(ts) AS ms,
      |    event_id, CAST(round(value * 100.0) AS BIGINT) AS cents
      |  FROM events
      |), d AS (
      |  SELECT *, lead(ms) OVER (PARTITION BY event_type, day
      |    ORDER BY ms ASC, event_id ASC) AS nxt
      |  FROM ev
      |), x AS (
      |  SELECT event_type, day, cents,
      |    coalesce(nxt, epoch_ms(CAST(day AS TIMESTAMP)) + 86400000) - ms AS dur
      |  FROM d)
      |SELECT event_type, day, count(*) AS n_events,
      |  CAST(sum(dur) AS BIGINT) AS dur_ms,
      |  CAST(sum(cents * dur) AS BIGINT) AS wsum_cents_ms,
      |  CAST(sum(cents * dur) AS DOUBLE) / CAST(sum(dur) AS DOUBLE)
      |    AS twap_cents
      |FROM x GROUP BY 1, 2""".stripMargin

  val q114Oracle: String =
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER
      |      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap
      |  FROM events
      |), m AS (
      |  SELECT user_id, count(*) AS n_events, count(gap) AS ng,
      |    sum(gap) AS sg, sum(gap * gap) AS sgg,
      |    min(gap) AS min_gap_ms, max(gap) AS max_gap_ms,
      |    CAST(sum(CASE WHEN gap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_gaps,
      |    CAST(sum(CASE WHEN gap < 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_fast_gaps
      |  FROM g GROUP BY user_id)
      |SELECT user_id, n_events, CAST(ng AS BIGINT) AS n_gaps,
      |  min_gap_ms, max_gap_ms, n_zero_gaps, n_fast_gaps,
      |  CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS mean_gap_ms,
      |  CAST(ng * sgg - sg * sg AS DOUBLE) / CAST(ng * ng AS DOUBLE)
      |    AS var_gap_ms,
      |  2 * n_fast_gaps > ng AS is_bot_like
      |FROM m WHERE ng > 0""".stripMargin

  /** q120: gaps-and-islands — each user's longest streak of
    * consecutive active days (the engagement-reporting rollup a
    * gold-layer consumer runs on the events feed).
    * The classic anchor trick: within a user, `day − rank`
    * is constant exactly on a run of consecutive days, so one window
    * rank plus one aggregation finds every island without a self-join.
    * Both windows partition by user_id (bounded groups — the
    * sessionization-class skew assumption), and the day list is
    * `distinct` BEFORE the window, so the sort input is one row per
    * active day, not per event. Integer day arithmetic end to end —
    * bit-exact across engines. */
  def q120GapsIslands(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
    val islands = days
      .withColumn("rn", row_number().over(byUser))
      .withColumn("anchor", date_sub(col("day"), col("rn")))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"),
        min(col("day")).as("start_day"), max(col("day")).as("end_day"))
    val perUser = Window.partitionBy(col("user_id"))
    islands
      .withColumn("n_streaks", count(lit(1)).over(perUser))
      .withColumn("n_active_days", sum(col("len")).over(perUser))
      .withColumn("rk", row_number().over(
        perUser.orderBy(col("len").desc, col("start_day").asc)))
      .where(col("rk") === 1)
      .select(col("user_id"), col("len").as("best_streak_days"),
        col("start_day"), col("end_day"),
        col("n_streaks"), col("n_active_days"))
  }

  val q120Oracle: String =
    """WITH d AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |), r AS (
      |  SELECT user_id, day,
      |    row_number() OVER (PARTITION BY user_id ORDER BY day ASC) AS rn
      |  FROM d
      |), isl AS (
      |  SELECT user_id, day - CAST(rn AS INTEGER) AS anchor, count(*) AS len,
      |    min(day) AS start_day, max(day) AS end_day
      |  FROM r GROUP BY user_id, anchor
      |), ranked AS (
      |  SELECT user_id, len, start_day, end_day,
      |    count(*) OVER (PARTITION BY user_id) AS n_streaks,
      |    sum(len) OVER (PARTITION BY user_id) AS n_active_days,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY len DESC, start_day ASC) AS rk
      |  FROM isl)
      |SELECT user_id, len AS best_streak_days, start_day, end_day,
      |  CAST(n_streaks AS BIGINT) AS n_streaks,
      |  CAST(n_active_days AS BIGINT) AS n_active_days
      |FROM ranked WHERE rk = 1""".stripMargin

  /** q121: top event paths — the 20 most common within-session
    * event-type sequences (the "what do users do" product-analytics
    * query, ClickHouse sequenceMatch / Amplitude pathfinder shape).
    * Reuses [[assignSessions]] (the q31 gap rule) for the session
    * boundary, then collapses each session to an ordered path string:
    * `collect_list` of (ts, event_id, event_type) structs is
    * order-nondeterministic, so `array_sort` restores the unique
    * (ts, event_id) total order before the join — making the path, and
    * hence the oracle hash, exact. Path counting is a vocabulary-sized
    * aggregate (partial combines carry path strings, not events), and
    * top-20 is a TakeOrdered, never a global sort. Tie at the cut
    * breaks on path ASC so the selected SET is deterministic. */
  def q121EventPaths(spark: SparkSession, dir: String): DataFrame = {
    val sess = assignSessions(
      Tables.load(spark, dir, "events"), gapMs = 30 * 60 * 1000L)
    sess
      .groupBy(col("user_id"), col("session_no"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          s => s.getField("event_type")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(20)
  }

  val q121Oracle: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |), numbered AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(new_session) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC
      |      ROWS UNBOUNDED PRECEDING) AS session_no
      |  FROM marked
      |), paths AS (
      |  SELECT user_id, session_no,
      |    string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC) AS path
      |  FROM numbered GROUP BY user_id, session_no)
      |SELECT path, count(*) AS n_sessions,
      |  count(DISTINCT user_id) AS n_users
      |FROM paths GROUP BY path
      |ORDER BY n_sessions DESC, path ASC LIMIT 20""".stripMargin

  /** Shared session-numbering CTE prefix (the [[assignSessions]] gap
    * rule in DuckDB form) used by the q121/q124/q126 oracles. */
  private val SessionCtePrefix: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, event_type, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |), numbered AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    sum(new_session) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC
      |      ROWS UNBOUNDED PRECEDING) AS session_no
      |  FROM marked
      |)""".stripMargin

  /** q124: Markov transition matrix — P(next event | event) within a
    * session, the first-order behavioral model product analytics fits
    * before anything fancier (and the propensity baseline an LLM-agent
    * trace pipeline reports). lead() inside the (user, session) window
    * pairs each event with its successor; the pair counts then shrink
    * to a |types|² frame, so the per-from totals window runs over an
    * aggregate-sized input. Probability is emitted as an integer
    * (n·10⁶ div from_total) — exact on both engines, no float agg. */
  def q124MarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val sess = assignSessions(
      Tables.load(spark, dir, "events"), gapMs = 30 * 60 * 1000L)
    val w = Window.partitionBy(col("user_id"), col("session_no"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val pairs = sess
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("from_total",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("prob_ppm", expr("(n * 1000000) div from_total"))
      .select(col("from_type"), col("to_type"), col("n"),
        col("from_total"), col("prob_ppm"))
  }

  val q124Oracle: String =
    s"""$SessionCtePrefix, pairs AS (
       |  SELECT event_type AS from_type,
       |    lead(event_type) OVER (PARTITION BY user_id, session_no
       |      ORDER BY ts ASC, event_id ASC) AS to_type
       |  FROM numbered
       |), agg AS (
       |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
       |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
       |)
       |SELECT from_type, to_type, n,
       |  CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
       |  CAST((n * 1000000) // (sum(n) OVER (PARTITION BY from_type))
       |    AS BIGINT) AS prob_ppm
       |FROM agg""".stripMargin

  /** q125: cumulative distinct users by day — the growth-curve query
    * ("how many unique users have we ever seen, per day"). The naive
    * form is a running COUNT(DISTINCT) — quadratic state or a global
    * window at scale. The scale-correct factoring: distinct-ness is
    * decided once per user (groupBy user → min day, one shuffle), the
    * per-day new-user counts are calendar-sized, and the running total
    * over them runs through [[Rank.globalPrefixSum]]'s bucketed
    * two-phase plan — no global single-task window anywhere. */
  def q125CumulativeUsers(spark: SparkSession, dir: String): DataFrame = {
    val firstDay = Tables.load(spark, dir, "events")
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("day"))
    val perDay = firstDay.groupBy(col("day"))
      .agg(count(lit(1)).as("new_users"))
      .withColumn("day_num", unix_date(col("day")).cast("long"))
    Rank.globalPrefixSum(perDay, "day_num", Nil, "new_users", "cum_users")
      .select(col("day"), col("new_users"), col("cum_users"))
  }

  val q125Oracle: String =
    """WITH f AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events
      |  GROUP BY user_id
      |), d AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS new_users FROM f
      |  GROUP BY day
      |)
      |SELECT day, new_users,
      |  CAST(sum(new_users) OVER (ORDER BY day ASC) AS BIGINT) AS cum_users
      |FROM d""".stripMargin

  /** q127: exact trailing 7-day distinct users per day — the rolling
    * engagement metric (WAU by day). A sliding COUNT(DISTINCT) is
    * quadratic state at scale; the exact linear factoring: per user,
    * each active day covers window-end days [day, day+6] TRUNCATED at
    * the next active day, so the per-user coverage intervals are
    * disjoint and their explosion (≤7 rows per active day) counts
    * every user at most once per window-end day. One distinct, one
    * bounded per-user window for the truncation, one explode, one
    * count — no window ever sees more than one user's days. Reported
    * days are the observed event days (broadcast-joined; the day list
    * is calendar-bounded). */
  def q127RollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val activeDays = Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val days = activeDays.select(col("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
    val cover = activeDays
      .withColumn("next_day", lead(col("day"), 1).over(w))
      .withColumn("stop",
        least(date_add(col("day"), 6),
          coalesce(date_sub(col("next_day"), 1), date_add(col("day"), 6))))
      .select(col("user_id"),
        explode(sequence(col("day"), col("stop"))).as("day"))
    cover.join(broadcast(days), "day")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("rolling_users"))
      .select(col("day"), col("rolling_users"))
  }

  val q127Oracle: String =
    """WITH ad AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      |), days AS (
      |  SELECT DISTINCT day FROM ad
      |)
      |SELECT d.day, CAST(count(DISTINCT a.user_id) AS BIGINT)
      |  AS rolling_users
      |FROM days d JOIN ad a ON a.day BETWEEN d.day - 6 AND d.day
      |GROUP BY d.day""".stripMargin

  /** q126: last-touch attribution — each purchase is credited to the
    * most recent non-purchase event in the same session ("direct" when
    * the purchase opens its session). The marketing-attribution shape:
    * a conditional last_value over an UNBOUNDED-PRECEDING-to-−1 frame,
    * i.e. an ordered scan per (user, session) partition — bounded
    * groups, same skew class as sessionization itself. Revenue is
    * summed in integer cents (round(value·100)) so the attribution
    * totals hash bit-exactly across engines. */
  def q126Attribution(spark: SparkSession, dir: String): DataFrame = {
    val sess = assignSessions(
      Tables.load(spark, dir, "events"), gapMs = 30 * 60 * 1000L)
    val w = Window.partitionBy(col("user_id"), col("session_no"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    sess
      .withColumn("ch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .groupBy(coalesce(col("ch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(expr("CAST(round(value * 100.0) AS BIGINT)"))
          .as("revenue_cents"))
  }

  val q126Oracle: String =
    s"""$SessionCtePrefix, attr AS (
       |  SELECT event_type, value,
       |    last_value(CASE WHEN event_type <> 'purchase'
       |        THEN event_type END IGNORE NULLS)
       |      OVER (PARTITION BY user_id, session_no
       |        ORDER BY ts ASC, event_id ASC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ch
       |  FROM numbered
       |)
       |SELECT coalesce(ch, 'direct') AS channel,
       |  CAST(count(*) AS BIGINT) AS n_purchases,
       |  CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
       |    AS revenue_cents
       |FROM attr WHERE event_type = 'purchase' GROUP BY 1""".stripMargin

  /** q146: audience-overlap matrix — exact pairwise Jaccard and
    * overlap coefficient between the user audiences of every
    * event-type pair (the segment-overlap report behind "users who
    * search also purchase"; the exact ground truth the q30/q101 HLL
    * sketches approximate at scale).
    *
    * Scale shape: the intersection self-join keys on `user_id`, and a
    * user belongs to at most |event types| audiences, so the join
    * emits ≤ C(|types|, 2) pairs PER USER — linear in users, never
    * quadratic (the q138 basket-bound argument). Audience sizes are a
    * |types|-row aggregate, safely broadcast to the pair frame. All
    * counts integer, scores integer ppm → bit-exact oracle. */
  def q146AudienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val aud = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
    val sizes = aud.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_aud"))
    val inter = aud.as("a")
      .join(aud.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("n_aud", "n_a")), Seq("type_a"))
      .join(broadcast(sizes.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("n_aud", "n_b")), Seq("type_b"))
      .withColumn("jaccard_ppm",
        expr("(n_inter * 1000000) div (n_a + n_b - n_inter)"))
      .withColumn("overlap_ppm",
        expr("(n_inter * 1000000) div least(n_a, n_b)"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_inter"), col("jaccard_ppm"), col("overlap_ppm"))
  }

  val q146Oracle: String =
    """WITH aud AS (
      |  SELECT DISTINCT event_type, user_id FROM events
      |), sz AS (
      |  SELECT event_type, count(*) AS n_aud FROM aud GROUP BY 1
      |), pr AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    count(*) AS n_inter
      |  FROM aud a JOIN aud b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2
      |)
      |SELECT pr.type_a, pr.type_b,
      |  CAST(sa.n_aud AS BIGINT) AS n_a, CAST(sb.n_aud AS BIGINT) AS n_b,
      |  CAST(pr.n_inter AS BIGINT) AS n_inter,
      |  CAST((pr.n_inter * 1000000)
      |    // (sa.n_aud + sb.n_aud - pr.n_inter) AS BIGINT) AS jaccard_ppm,
      |  CAST((pr.n_inter * 1000000)
      |    // least(sa.n_aud, sb.n_aud) AS BIGINT) AS overlap_ppm
      |FROM pr
      |JOIN sz sa ON sa.event_type = pr.type_a
      |JOIN sz sb ON sb.event_type = pr.type_b""".stripMargin

  /** q217: Allen interval-algebra census (Allen 1983). Per user, each
    * event type spans an activity interval [min ts, max ts]; for every
    * ordered type pair (type_a < type_b) the pair of intervals is
    * classified into one of the 13 Allen relations (before, meets,
    * overlaps, starts, during, finishes, equals, and the six
    * inverses), then the census counts users per (pair, relation).
    * Timestamps are exact microseconds on both engines, so every
    * boundary case (meets vs overlaps vs before) is deterministic —
    * the discipline interval joins (q12/q39) only need "overlaps", but
    * temporal reasoning over a lakehouse needs the full algebra.
    *
    * Scale shape: one grouped min/max per (user, type), then a
    * per-user self-join whose fan-out is bounded by |event types|² —
    * the corpus shuffles once on user_id and never again. */
  def q217AllenIntervals(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
    val a = iv.select(col("user_id"), col("event_type").as("type_a"),
      col("s").as("as_"), col("e").as("ae"))
    val b = iv.select(col("user_id"), col("event_type").as("type_b"),
      col("s").as("bs"), col("e").as("be"))
    val rel =
      when(col("ae") < col("bs"), "before")
        .when(col("ae") === col("bs"), "meets")
        .when(col("be") < col("as_"), "after")
        .when(col("be") === col("as_"), "met_by")
        .when(col("as_") < col("bs"),
          when(col("ae") < col("be"), "overlaps")
            .when(col("ae") === col("be"), "finished_by")
            .otherwise("contains"))
        .when(col("as_") === col("bs"),
          when(col("ae") < col("be"), "starts")
            .when(col("ae") === col("be"), "equals")
            .otherwise("started_by"))
        .otherwise(
          when(col("ae") < col("be"), "during")
            .when(col("ae") === col("be"), "finishes")
            .otherwise("overlapped_by"))
    a.join(b, "user_id")
      .filter(col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"), rel.as("relation"))
      .groupBy(col("type_a"), col("type_b"), col("relation"))
      .agg(count(lit(1)).as("n_users"))
  }

  val q217Oracle: String =
    """WITH iv AS (
      |  SELECT user_id, event_type, min(ts) AS s, max(ts) AS e
      |  FROM events GROUP BY 1, 2
      |), pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CASE
      |      WHEN a.e < b.s THEN 'before'
      |      WHEN a.e = b.s THEN 'meets'
      |      WHEN b.e < a.s THEN 'after'
      |      WHEN b.e = a.s THEN 'met_by'
      |      WHEN a.s < b.s THEN
      |        CASE WHEN a.e < b.e THEN 'overlaps'
      |             WHEN a.e = b.e THEN 'finished_by'
      |             ELSE 'contains' END
      |      WHEN a.s = b.s THEN
      |        CASE WHEN a.e < b.e THEN 'starts'
      |             WHEN a.e = b.e THEN 'equals'
      |             ELSE 'started_by' END
      |      ELSE
      |        CASE WHEN a.e < b.e THEN 'during'
      |             WHEN a.e = b.e THEN 'finishes'
      |             ELSE 'overlapped_by' END
      |    END AS relation
      |  FROM iv a JOIN iv b ON a.user_id = b.user_id
      |    AND a.event_type < b.event_type)
      |SELECT type_a, type_b, relation, count(*) AS n_users
      |FROM pairs GROUP BY 1, 2, 3""".stripMargin

  /** q225: clamped running balance — the wallet/inventory simulation
    * fold. Per user per day: credits (value of `view` events, cents)
    * minus debits (`purchase` events), folded in day order with the
    * balance FLOORED AT ZERO — a genuinely non-associative scan (the
    * clamp destroys prefix-sum decomposability, so no window trick
    * applies; order of application is the semantics). Reports each
    * user's final balance and how many days ended pinned at zero.
    *
    * Scale shape: the corpus collapses to (user, day) nets in one
    * aggregate; the per-user fold then runs over a TIME-RANGE-bounded
    * array (≤ |days| elements — the q97/q202/q220 argument), inside a
    * codegen'd `aggregate()` with a struct accumulator, never a
    * driver loop. The DuckDB oracle replays the identical fold with
    * `list_reduce` over a day-ordered list (zero-seed prepended, since
    * list_reduce treats the first element as the seed). */
  def q225ClampedBalance(spark: SparkSession, dir: String): DataFrame = {
    val nets = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .agg(sum(when(col("event_type") === "view",
          round(col("value") * 100.0).cast("long"))
        .otherwise(-round(col("value") * 100.0).cast("long"))).as("net"))
    nets.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("day"), col("net"))))
        .as("series"))
      .select(col("user_id"), size(col("series")).cast("long").as("n_days"),
        aggregate(
          transform(col("series"), s => s.getField("net")),
          struct(lit(0L).as("bal"), lit(0L).as("z")),
          (acc, x) => {
            val nb = greatest(acc.getField("bal") + x, lit(0L))
            struct(nb.as("bal"),
              (acc.getField("z") + when(nb === 0L, 1L).otherwise(0L))
                .as("z"))
          }).as("fold"))
      .select(col("user_id"), col("n_days"),
        col("fold.bal").as("final_bal_cents"),
        col("fold.z").as("days_at_zero"))
  }

  /** q227: time-to-convert percentiles per signup cohort — the product
    * funnel's latency dashboard: for each user, the seconds from first
    * `signup` to the first `purchase` AT OR AFTER it; converters are
    * grouped by signup week and each cohort reports its conversion
    * count plus exact P50/P90 latency (nearest-rank, ⌈p·n⌉-th
    * smallest).
    *
    * Exactness: latencies are integer seconds; the percentile is a
    * rank lookup, not an interpolation. Scale shape: one grouped
    * min-filter pass to per-user (signup, first purchase ≥ signup),
    * then the cohort percentiles come from [[Rank.groupRank]]'s
    * bucketed two-phase plan — no per-cohort single-task sort; the
    * final rollup joins two rank-filtered single-row-per-cohort
    * frames. */
  def q227ConvertLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_signup"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(signups, "user_id")
      .filter(col("ts") >= col("t_signup"))
      .groupBy(col("user_id"), col("t_signup"))
      .agg(min(col("ts")).as("t_conv"))
      .select(col("user_id"),
        expr("unix_millis(t_signup) div (86400000 * 7)").as("cohort_week"),
        expr("(unix_millis(t_conv) - unix_millis(t_signup)) div 1000")
          .as("lat_s"))
    val ranked = Rank.groupRank(conv, Seq("cohort_week"), "lat_s",
      Seq("user_id"), "rk", "n")
    def pick(p: Int, name: String) = ranked
      // nearest-rank ⌈p·n/100⌉ as a 0-based rank
      .filter(col("rk") === expr(s"(($p * n) + 99) div 100") - 1L)
      .groupBy(col("cohort_week"))
      .agg(min(col("lat_s")).as(name))
    signupsPerCohort(signups)
      .join(conv.groupBy(col("cohort_week"))
        .agg(count(lit(1)).as("n_converted")), Seq("cohort_week"))
      .join(pick(50, "p50_s"), Seq("cohort_week"))
      .join(pick(90, "p90_s"), Seq("cohort_week"))
  }

  private def signupsPerCohort(signups: DataFrame): DataFrame =
    signups
      .select(expr("unix_millis(t_signup) div (86400000 * 7)")
        .as("cohort_week"))
      .groupBy(col("cohort_week")).agg(count(lit(1)).as("n_signups"))

  val q227Oracle: String =
    """WITH s AS (
      |  SELECT user_id, min(ts) AS t_signup FROM events
      |  WHERE event_type = 'signup' GROUP BY 1
      |), conv AS (
      |  SELECT e.user_id, s.t_signup, min(e.ts) AS t_conv
      |  FROM events e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= s.t_signup
      |  GROUP BY 1, 2
      |), lat AS (
      |  SELECT user_id,
      |    epoch_ms(t_signup) // (86400000 * 7) AS cohort_week,
      |    (epoch_ms(t_conv) - epoch_ms(t_signup)) // 1000 AS lat_s
      |  FROM conv
      |), rk AS (
      |  SELECT cohort_week, lat_s,
      |    row_number() OVER (PARTITION BY cohort_week
      |      ORDER BY lat_s, user_id) AS r,
      |    count(*) OVER (PARTITION BY cohort_week) AS n
      |  FROM lat
      |), coh AS (
      |  SELECT epoch_ms(t_signup) // (86400000 * 7) AS cohort_week,
      |    count(*) AS n_signups
      |  FROM s GROUP BY 1
      |)
      |SELECT coh.cohort_week, coh.n_signups,
      |  (SELECT count(*) FROM lat
      |   WHERE lat.cohort_week = coh.cohort_week) AS n_converted,
      |  CAST((SELECT min(lat_s) FROM rk WHERE rk.cohort_week = coh.cohort_week
      |        AND r = (50 * n + 99) // 100) AS BIGINT) AS p50_s,
      |  CAST((SELECT min(lat_s) FROM rk WHERE rk.cohort_week = coh.cohort_week
      |        AND r = (90 * n + 99) // 100) AS BIGINT) AS p90_s
      |FROM coh
      |WHERE EXISTS (SELECT 1 FROM lat
      |              WHERE lat.cohort_week = coh.cohort_week)""".stripMargin

  // NOTE the field ORDER in the fold struct: DuckDB 1.0's list_reduce
  // updates the accumulator struct field-by-field in declaration order,
  // so a field reading acc.bal must be declared BEFORE the field that
  // overwrites bal (z first) — with bal first, z's condition read the
  // already-updated balance and miscounted (reproduced on this corpus).
  val q225Oracle: String =
    """WITH nets AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
      |    sum(CASE WHEN event_type = 'view'
      |        THEN CAST(round(value * 100.0) AS BIGINT)
      |        ELSE -CAST(round(value * 100.0) AS BIGINT) END) AS net
      |  FROM events
      |  WHERE event_type IN ('view', 'purchase')
      |  GROUP BY 1, 2
      |), series AS (
      |  SELECT user_id, count(*) AS n_days,
      |    list_prepend({'z': CAST(0 AS BIGINT), 'bal': CAST(0 AS BIGINT)},
      |      list_transform(list(net ORDER BY day),
      |        x -> {'z': CAST(0 AS BIGINT), 'bal': CAST(x AS BIGINT)}))
      |      AS l
      |  FROM nets GROUP BY 1)
      |SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
      |  f.bal AS final_bal_cents, f.z AS days_at_zero
      |FROM (
      |  SELECT user_id, n_days,
      |    list_reduce(l, (acc, x) ->
      |      {'z': acc.z + CASE WHEN greatest(acc.bal + x.bal, 0) = 0
      |                    THEN 1 ELSE 0 END,
      |       'bal': greatest(acc.bal + x.bal, 0)}) AS f
      |  FROM series)""".stripMargin
}
