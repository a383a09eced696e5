package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Global-order sweep analytics on the bucket prefix primitives of
  * [[Rank]]: interval-concurrency profiling (q105) and the Pareto
  * frontier / skyline (q106).
  *
  * Both are classically "ORDER BY the whole table" problems. The naive
  * plans — a range self-join (quadratic in overlap count) for
  * concurrency, an all-pairs NOT EXISTS for the skyline, or a global
  * unpartitioned window for either — are exactly the shapes the plan
  * lint bans: at 100 TB they either explode combinatorially or funnel
  * the corpus through one task. Here every step is a hash shuffle, a
  * constant-bounded (≤256-row) driver prefix, or a window confined to
  * a bucket slice.
  */
object Sweep {

  /** q105: peak concurrent sessions per hour — the interval-overlap
    * profile of the 30-minute gap-rule sessions (q31's sessions viewed
    * as [start, end] intervals). Sweep-line: each session contributes
    * a +1 boundary at its start and a −1 at its end; the inclusive
    * prefix sum of deltas in boundary order IS the concurrency after
    * each boundary, computed distributed via [[Rank.globalPrefixSum]].
    *
    * Boundary order is (epoch ms, start-before-end, user, session):
    * start boundaries sort before end boundaries at the same instant,
    * so touching sessions count as concurrent and a zero-length
    * session reaches concurrency ≥ 1 at its instant. Ordering is by
    * epoch MILLISECONDS on both engines deliberately: the raw event
    * timestamps carry nanosecond digits that Spark truncates to µs on
    * read while DuckDB keeps ns — an order key finer than ms would
    * compare differently across engines for boundaries inside the
    * same microsecond. The (user_id, session_no) tie keys make the
    * order total, so the prefix value at every row is deterministic.
    */
  def q105Concurrency(spark: SparkSession, dir: String): DataFrame = {
    val sess = Sessions
      .sessionizeBatch(Tables.load(spark, dir, "events"), gapMs = 30 * 60 * 1000L)
      .select(col("user_id"), col("session_no"),
        col("session_start"), col("session_end"))
    val starts = sess.select(col("session_start").as("bts"),
      lit(1L).as("delta"), lit(0).as("d_ord"), col("user_id"), col("session_no"))
    val ends = sess.select(col("session_end").as("bts"),
      lit(-1L).as("delta"), lit(1).as("d_ord"), col("user_id"), col("session_no"))
    val bounds = starts.unionByName(ends)
      .withColumn("bms", unix_millis(col("bts")))
    val cum = Rank.globalPrefixSum(bounds, "bms",
      Seq("d_ord", "user_id", "session_no"), "delta", "conc")
    cum.groupBy(date_trunc("hour", col("bts")).as("hour_ts"))
      .agg(max(col("conc")).as("max_concurrent"),
        count(lit(1)).as("n_boundaries"))
  }

  /** Shared sessions CTE — must stay textually in lockstep with
    * [[Sessions.q31Oracle]]'s gap rule (epoch_ms, 30 min, event_id
    * tiebreak) so q31 and q105 agree on what a session is. */
  private val sessCte: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      |), numbered AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      |  FROM marked
      |), sess AS (
      |  SELECT user_id, session_no,
      |    min(ts) AS session_start, max(ts) AS session_end
      |  FROM numbered GROUP BY user_id, session_no)""".stripMargin

  val q105Oracle: String =
    s"""$sessCte, bounds AS (
       |  SELECT session_start AS bts, 1 AS delta, 0 AS d_ord, user_id, session_no FROM sess
       |  UNION ALL
       |  SELECT session_end AS bts, -1 AS delta, 1 AS d_ord, user_id, session_no FROM sess
       |), cum AS (
       |  SELECT bts,
       |    CAST(sum(delta) OVER (ORDER BY epoch_ms(bts) ASC, d_ord ASC, user_id ASC, session_no ASC
       |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
       |  FROM bounds)
       |SELECT date_trunc('hour', bts) AS hour_ts, max(conc) AS max_concurrent,
       |  count(*) AS n_boundaries
       |FROM cum GROUP BY 1""".stripMargin

  /** q106: Pareto frontier (skyline) of orders under "higher
    * o_totalprice is better, later o_orderdate is better": the orders
    * no other order dominates. Dominance is the standard
    * strict-somewhere definition — a dominates b iff a ≥ b on both
    * axes and a > b on at least one; duplicate (price, date) rows are
    * mutually non-dominating and both survive.
    *
    * Plan: collapse to price level (pmax = latest date at that exact
    * price — which also decides the equal-price strictly-later-date
    * case), take the exclusive running max of pmax over strictly
    * higher prices via [[Rank.globalRunningMax]] (order by −price),
    * and join the two price-level columns back in one equi-join. Row
    * b survives iff prevmax < b.date (nothing strictly pricier is as
    * late) AND b.date = pmax (nothing equally priced is strictly
    * later). The frontier itself is O(log n)-sized on independent
    * axes, but the plan never relies on that — both aggregates are
    * hash shuffles over price, and the only driver traffic is the
    * ≤256-row bucket max table. */
  def q106ParetoFrontier(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    val pp = o.groupBy(col("o_totalprice"))
      .agg(max(unix_millis(col("o_orderdate").cast("timestamp"))).as("pmax"))
      .withColumn("negp", -col("o_totalprice"))
    val pm = Rank.globalRunningMax(pp, "negp", Nil, "pmax", "prevmax")
      .drop("negp")
    o.join(pm, "o_totalprice")
      .filter((col("prevmax").isNull ||
          col("prevmax") < unix_millis(col("o_orderdate").cast("timestamp"))) &&
        col("pmax") === unix_millis(col("o_orderdate").cast("timestamp")))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
  }

  /** The oracle replays the price-level sweep (DuckDB's global window
    * is fine single-node); SweepSpec independently checks the same
    * result against brute-force all-pairs domination at sf0.001. */
  val q106Oracle: String =
    """WITH pp AS (
      |  SELECT o_totalprice, max(o_orderdate) AS pmax
      |  FROM orders GROUP BY o_totalprice
      |), pm AS (
      |  SELECT o_totalprice, pmax,
      |    max(pmax) OVER (ORDER BY o_totalprice DESC
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
      |  FROM pp)
      |SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
      |FROM orders o JOIN pm USING (o_totalprice)
      |WHERE (pm.prevmax IS NULL OR pm.prevmax < o.o_orderdate)
      |  AND o.o_orderdate = pm.pmax""".stripMargin
}
