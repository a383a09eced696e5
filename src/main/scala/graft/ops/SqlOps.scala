package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** SQL-frontier operators: recursive common table expressions and
  * correlated LATERAL subqueries — surfaces a warehouse user of the
  * reference would reach for in ad-hoc SQL (the reference's gold layer
  * is notebook SQL over the silver star: aw_gold_layer_sales/src/
  * notebook.ipynb). Both run through `spark.sql` on temp views of the
  * catalog tables, exercising the engine's SQL front door rather than
  * the DataFrame DSL.
  */
object SqlOps {

  private def view(spark: SparkSession, dir: String, t: String): Unit =
    Tables.load(spark, dir, t).createOrReplaceTempView(s"${t}_sql")

  /** q218: recursive part-hierarchy rollup (the BOM / org-chart shape,
    * via WITH RECURSIVE — supported natively by Spark 4.1). The part
    * catalog is arranged into a deterministic containment tree
    * (parent = partkey ÷ 10, so depth ≤ ⌈log₁₀ |parts|⌉); the
    * recursive closure expands every part → ancestor pair, then the
    * fact table's per-part revenue rolls up into every ancestor,
    * INCLUDING revenue booked directly against internal nodes.
    *
    * Scale shape: recursion depth is logarithmic in the catalog (4
    * levels at 2000 parts, 8 at 100 M), and each level is one
    * hash join of the frontier against nothing (the step is pure
    * column arithmetic) — the expensive side, lineitem, is aggregated
    * ONCE to |parts| rows before touching the closure, so the
    * closure join handles catalog-sized data only.
    *
    * LEVEL-batched, not row-batched: each UNION ALL round strips one
    * decimal digit from EVERY frontier row at once (`ancestor div 10`
    * has no cross-row dependency), so Spark's recursive execution runs
    * ⌈log₁₀ max(p_partkey)⌉ + 1 rounds total — measured: 5 frontier
    * rounds + 1 empty-termination round at sf0.1 (20 000 parts, 5-digit
    * keys), 0.49 s. Contrast q220, whose survival recursion advanced
    * one ROW per round and was therefore rewritten as a single
    * aggregate-HOF fold — per-level recursion like this one is the
    * shape `WITH RECURSIVE` executes well. */
  def q218RecursiveRollup(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "part")
    view(spark, dir, "lineitem")
    spark.sql(
      """WITH RECURSIVE anc(p_partkey, ancestor) AS (
        |  SELECT p_partkey, p_partkey AS ancestor FROM part_sql
        |  UNION ALL
        |  SELECT p_partkey, ancestor div 10 AS ancestor
        |  FROM anc WHERE ancestor >= 10
        |), rev AS (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100.0) AS DECIMAL(38,0)))
        |      AS rev_cents
        |  FROM lineitem_sql GROUP BY l_partkey
        |)
        |SELECT a.ancestor, count(*) AS n_parts,
        |  CAST(sum(coalesce(r.rev_cents, 0)) AS BIGINT) AS subtree_cents
        |FROM anc a
        |LEFT JOIN rev r ON a.p_partkey = r.l_partkey
        |GROUP BY a.ancestor
        |HAVING count(*) > 1""".stripMargin)
  }

  val q218Oracle: String =
    """WITH RECURSIVE anc(p_partkey, ancestor) AS (
      |  SELECT p_partkey, p_partkey AS ancestor FROM part
      |  UNION ALL
      |  SELECT p_partkey, ancestor // 10 AS ancestor
      |  FROM anc WHERE ancestor >= 10
      |), rev AS (
      |  SELECT l_partkey,
      |    sum(CAST(round(l_extendedprice * 100.0) AS HUGEINT)) AS rev_cents
      |  FROM lineitem GROUP BY l_partkey
      |)
      |SELECT a.ancestor, count(*) AS n_parts,
      |  CAST(sum(coalesce(r.rev_cents, 0)) AS BIGINT) AS subtree_cents
      |FROM anc a
      |LEFT JOIN rev r ON a.p_partkey = r.l_partkey
      |GROUP BY a.ancestor
      |HAVING count(*) > 1""".stripMargin

  /** q219: correlated LATERAL top-k (the OUTER APPLY shape): each
    * customer's three highest-value orders, written as a lateral
    * correlated subquery with ORDER BY + LIMIT — the form an analyst
    * writes; Catalyst decorrelates it into a per-customer ranking
    * rather than |customers| separate scans. The money column is exact
    * cents on both engines, and (price, orderkey) ordering makes the
    * top-3 selection a total order — partitioning-independent. */
  def q219LateralTopk(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "customer")
    view(spark, dir, "orders")
    spark.sql(
      """SELECT c.c_custkey, l.o_orderkey, l.price_cents
        |FROM customer_sql c,
        |LATERAL (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_cents
        |  FROM orders_sql o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY price_cents DESC, o_orderkey
        |  LIMIT 3
        |) l""".stripMargin)
  }

  val q219Oracle: String =
    """SELECT c.c_custkey, l.o_orderkey, l.price_cents
      |FROM customer c,
      |LATERAL (
      |  SELECT o_orderkey,
      |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_cents
      |  FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY price_cents DESC, o_orderkey
      |  LIMIT 3
      |) l""".stripMargin

  /** q220: Kaplan–Meier survival curve (Kaplan & Meier 1958) over user
    * lifetimes — time-to-churn analysis where "death" is a user whose
    * stream contains an `error` event and everyone else is
    * right-censored at their last observed day. S(t) multiplies
    * (n_i − d_i)/n_i over event days; the running product is kept in
    * EXACT integer ppm with floor division at every step, evaluated by
    * a recursive CTE on BOTH engines — the multiplication order is the
    * day order by construction, so the (order-sensitive) truncated
    * product is bit-identical. Day granularity bounds recursion depth
    * by the observation window (≤ 31 steps here), far under Spark's
    * recursion limit.
    *
    * Scale shape: one corpus aggregate per user, then one aggregate to
    * the per-day event table — bounded by the TIME RANGE, not the
    * corpus (the q97/q202 argument) — and everything after (the
    * risk-set countdown AND the survival product, both carried by one
    * ordered fold) runs on that ≤|days| frame. Censored
    * days ride along as d = 0 rows: their factor is exactly 1 under
    * integer division, so they cannot perturb the product.
    *
    * The running product itself is NOT a recursive CTE on the Spark
    * side: Spark executes `WITH RECURSIVE` one UNION round per
    * recursion step, and this recursion advances a single day per
    * round — |distinct lifetime-days| sequential driver-planned jobs
    * (a 10-year corpus would mean ~3,650 of them). The day table is
    * aggregate-sized by construction, so instead the ordered fold runs
    * as ONE job: `array_sort(collect_list(struct(...)))` + the integer
    * `aggregate` HOF carrying the running floor-product (the q225
    * wallet-fold discipline on an aggregate-sized array), then one
    * explode back to rows. The DuckDB oracle keeps the recursive form —
    * the two formulations agreeing bit-for-bit IS the test (s ≤ 10⁶ and
    * n ≤ |users| keep s·(n−d) under 2⁶³ for any real corpus). */
  def q220KaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "events")
    spark.sql(
      """WITH u AS (
        |  SELECT user_id,
        |    (unix_millis(max(ts)) - unix_millis(min(ts))) div 86400000 AS lt,
        |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS death
        |  FROM events_sql GROUP BY user_id
        |), tot AS (SELECT count(*) AS n_tot FROM u
        |), ev AS (
        |  SELECT lt AS t, sum(death) AS d, count(*) AS ended
        |  FROM u GROUP BY lt
        |), folded AS (
        |  SELECT aggregate(
        |    array_sort(collect_list(named_struct('t', t, 'd', d,
        |      'e', ended))),
        |    named_struct('s', CAST(1000000 AS BIGINT), 'rem', max(n_tot),
        |      'out', CAST(array() AS
        |        ARRAY<STRUCT<t: BIGINT, n: BIGINT, d: BIGINT, s: BIGINT>>)),
        |    (acc, x) -> named_struct(
        |      's', (acc.s * (acc.rem - x.d)) div acc.rem,
        |      'rem', acc.rem - x.e,
        |      'out', array_append(acc.out, named_struct(
        |        't', x.t, 'n', acc.rem, 'd', x.d,
        |        's', (acc.s * (acc.rem - x.d)) div acc.rem))),
        |    acc -> acc.out) AS curve
        |  FROM ev CROSS JOIN tot
        |)
        |SELECT f.t AS t_days, f.n AS n_risk, f.d AS d_events,
        |  f.s AS surv_ppm
        |FROM folded LATERAL VIEW explode(curve) AS f
        |WHERE f.d > 0""".stripMargin)
  }

  val q220Oracle: String =
    """WITH RECURSIVE u AS (
      |  SELECT user_id,
      |    (epoch_ms(max(ts)) - epoch_ms(min(ts))) // 86400000 AS lt,
      |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS death
      |  FROM events GROUP BY user_id
      |), tot AS (SELECT count(*) AS n_tot FROM u
      |), ev AS (
      |  SELECT lt AS t, sum(death) AS d, count(*) AS ended
      |  FROM u GROUP BY lt
      |), ranked AS (
      |  SELECT t, d, row_number() OVER (ORDER BY t) AS rk,
      |    n_tot - coalesce(sum(ended) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
      |  FROM ev CROSS JOIN tot
      |), km(rk, t, n, d, s) AS (
      |  SELECT rk, t, n, d, (1000000 * (n - d)) // n
      |  FROM ranked WHERE rk = 1
      |  UNION ALL
      |  SELECT r.rk, r.t, r.n, r.d, (km.s * (r.n - r.d)) // r.n
      |  FROM km JOIN ranked r ON r.rk = km.rk + 1
      |)
      |SELECT CAST(t AS BIGINT) AS t_days, CAST(n AS BIGINT) AS n_risk,
      |  CAST(d AS BIGINT) AS d_events, CAST(s AS BIGINT) AS surv_ppm
      |FROM km WHERE d > 0""".stripMargin

  /** q244: Nelson–Aalen cumulative hazard (Nelson 1972, Aalen 1978) —
    * the additive counterpart to q220's Kaplan–Meier product over the
    * identical user-lifetime frame: Ĥ(t) = Σ_{tᵢ≤t} dᵢ/nᵢ. Where KM
    * answers "what fraction survives past t", NA answers "how much
    * hazard has accumulated by t" — the estimator of choice when rates
    * get compared or fed into a downstream intensity model, and its
    * sum form is numerically tame where a product underflows.
    *
    * Exact protocol: each day's increment is ONE truncating ppm
    * division dᵢ·10⁶ div nᵢ, and the cumulative hazard is the plain
    * integer prefix sum of those already-floored increments — order
    * fixed by day, bit-identical on both engines. Same
    * intent-to-treat/censoring frame as q220 (death = an `error`
    * event; everyone else right-censored at last observed day);
    * censored days carry d = 0, an exact zero increment.
    *
    * Scale shape: q220's exactly — corpus → per-user aggregate →
    * per-day event table bounded by the TIME RANGE; the risk-set
    * countdown and both hazard columns ride ONE aggregate-HOF fold
    * over the sorted aggregate-sized array (no window over rows, no
    * recursion, no driver loop). The oracle uses DuckDB windows over
    * the same day table — the two formulations agreeing bit-for-bit
    * is the test. */
  def q244NelsonAalen(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "events")
    spark.sql(
      """WITH u AS (
        |  SELECT user_id,
        |    (unix_millis(max(ts)) - unix_millis(min(ts))) div 86400000 AS lt,
        |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS death
        |  FROM events_sql GROUP BY user_id
        |), tot AS (SELECT count(*) AS n_tot FROM u
        |), ev AS (
        |  SELECT lt AS t, sum(death) AS d, count(*) AS ended
        |  FROM u GROUP BY lt
        |), folded AS (
        |  SELECT aggregate(
        |    array_sort(collect_list(named_struct('t', t, 'd', d,
        |      'e', ended))),
        |    named_struct('h', CAST(0 AS BIGINT), 'rem', max(n_tot),
        |      'out', CAST(array() AS
        |        ARRAY<STRUCT<t: BIGINT, n: BIGINT, d: BIGINT,
        |          inc: BIGINT, h: BIGINT>>)),
        |    (acc, x) -> named_struct(
        |      'h', acc.h + (x.d * 1000000) div acc.rem,
        |      'rem', acc.rem - x.e,
        |      'out', array_append(acc.out, named_struct(
        |        't', x.t, 'n', acc.rem, 'd', x.d,
        |        'inc', (x.d * 1000000) div acc.rem,
        |        'h', acc.h + (x.d * 1000000) div acc.rem))),
        |    acc -> acc.out) AS curve
        |  FROM ev CROSS JOIN tot
        |)
        |SELECT f.t AS t_days, f.n AS n_risk, f.d AS d_events,
        |  f.inc AS hazard_inc_ppm, f.h AS cum_hazard_ppm
        |FROM folded LATERAL VIEW explode(curve) AS f
        |WHERE f.d > 0""".stripMargin)
  }

  val q244Oracle: String =
    """WITH u AS (
      |  SELECT user_id,
      |    (epoch_ms(max(ts)) - epoch_ms(min(ts))) // 86400000 AS lt,
      |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS death
      |  FROM events GROUP BY user_id
      |), tot AS (SELECT count(*) AS n_tot FROM u
      |), ev AS (
      |  SELECT lt AS t, sum(death) AS d, count(*) AS ended
      |  FROM u GROUP BY lt
      |), ranked AS (
      |  SELECT t, d,
      |    n_tot - coalesce(sum(ended) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
      |  FROM ev CROSS JOIN tot
      |), inc AS (
      |  SELECT t, n, d, (d * 1000000) // n AS hinc FROM ranked
      |)
      |SELECT CAST(t AS BIGINT) AS t_days, CAST(n AS BIGINT) AS n_risk,
      |  CAST(d AS BIGINT) AS d_events,
      |  CAST(hinc AS BIGINT) AS hazard_inc_ppm,
      |  CAST(sum(hinc) OVER (ORDER BY t) AS BIGINT) AS cum_hazard_ppm
      |FROM inc WHERE d > 0""".stripMargin
}
