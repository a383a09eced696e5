package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operators beyond the reference's own surface (SURVEY.md
  * §2.11 lists them as absent there): window/top-k, set operations,
  * semi/anti joins, rollup, and a batch interval join. Any real query
  * workload over this engine needs them, and each has a clean
  * distributed plan.
  */
object Extended {

  /** Top-3 customers by balance per nation via row_number. The ordering
    * key includes c_custkey as a total tiebreak so the result is
    * deterministic (hash-comparable) despite balance ties. Window
    * shuffles once on the partition key — no global sort. */
  def q8WindowTopK(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    cust
      .withColumn("balance_rank", row_number().over(w).cast("long"))
      .filter(col("balance_rank") <= 3)
      .select(
        col("c_nationkey").as("nation_id"),
        col("balance_rank"),
        col("c_custkey").as("customer_id"),
        col("c_acctbal").as("account_balance"))
  }

  val q8Oracle: String =
    """SELECT nation_id, balance_rank, customer_id, account_balance FROM (
      |  SELECT c_nationkey AS nation_id,
      |    row_number() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey ASC) AS balance_rank,
      |    c_custkey AS customer_id,
      |    c_acctbal AS account_balance
      |  FROM customer) t
      |WHERE balance_rank <= 3""".stripMargin

  /** Global ordered top-k (sort + limit): plans as TakeOrderedAndProject
    * — per-partition heaps + a k-row driver merge, never a full sort of
    * the data. Tiebreak on the key makes it deterministic. */
  def q28GlobalTopK(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    ord
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(
        col("o_orderkey").as("order_id"),
        col("o_totalprice").as("total_price"),
        col("o_orderstatus").as("order_status"))
  }

  val q28Oracle: String =
    """SELECT o_orderkey AS order_id, o_totalprice AS total_price,
      |  o_orderstatus AS order_status
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin

  /** Set operations: BUILDING-segment customers INTERSECT actual buyers,
    * and EXCEPT (never ordered), tagged and unioned. Spark plans both as
    * shuffle-based distinct joins; keys-only projection keeps the
    * exchange narrow. */
  def q9SetOps(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("customer_id"))
    val buyers = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("customer_id"))
    building.intersect(buyers).withColumn("tag", lit("buyer"))
      .unionAll(building.except(buyers).withColumn("tag", lit("prospect")))
  }

  val q9Oracle: String =
    """SELECT customer_id, 'buyer' AS tag FROM (
      |  SELECT c_custkey AS customer_id FROM customer WHERE c_mktsegment = 'BUILDING'
      |  INTERSECT
      |  SELECT o_custkey FROM orders)
      |UNION ALL
      |SELECT customer_id, 'prospect' AS tag FROM (
      |  SELECT c_custkey AS customer_id FROM customer WHERE c_mktsegment = 'BUILDING'
      |  EXCEPT
      |  SELECT o_custkey FROM orders)""".stripMargin

  /** Semi/anti joins (EXISTS / NOT EXISTS): customers with vs without
    * open orders. left_semi/left_anti never widen rows — the probe side
    * streams through a broadcast/shuffled hash of DISTINCT keys only. */
  def q10SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val open = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    val withOrders = cust.join(open, cust("c_custkey") === open("o_custkey"), "left_semi")
      .select(col("c_custkey").as("customer_id"), col("c_name").as("customer_name"))
      .withColumn("has_open_order", lit(true))
    val without = cust.join(open, cust("c_custkey") === open("o_custkey"), "left_anti")
      .select(col("c_custkey").as("customer_id"), col("c_name").as("customer_name"))
      .withColumn("has_open_order", lit(false))
    withOrders.unionAll(without)
  }

  val q10Oracle: String =
    """SELECT c_custkey AS customer_id, c_name AS customer_name, TRUE AS has_open_order
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |UNION ALL
      |SELECT c_custkey AS customer_id, c_name AS customer_name, FALSE AS has_open_order
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""".stripMargin

  /** ROLLUP over (status, priority) with exact money sums — subtotal and
    * grand-total rows carry NULL group keys identically in both engines. */
  def q11Rollup(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    ord.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        Exact.sumFixed(col("o_totalprice"), 2).as("total_price"),
        count(lit(1)).as("order_count"))
      .select(
        col("o_orderstatus").as("order_status"),
        col("o_orderpriority").as("order_priority"),
        col("total_price"), col("order_count"))
  }

  val q11Oracle: String =
    s"""SELECT o_orderstatus AS order_status, o_orderpriority AS order_priority,
       |  ${Exact.sumFixedSql("o_totalprice", 2)} AS total_price,
       |  count(*) AS order_count
       |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  /** GROUPING SETS over (status, priority) — the general form ROLLUP and
    * CUBE desugar to, with the grouping-bit marker disambiguating
    * subtotal rows from genuine NULL keys. Exact money sums as in q11. */
  def q53GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
    ord.groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
          .cast("long").as("grp_id"),
        Exact.sumFixed(col("o_totalprice"), 2).as("total_price"),
        count(lit(1)).as("order_count"))
      .select(
        col("o_orderstatus").as("order_status"),
        col("o_orderpriority").as("order_priority"),
        col("grp_id"), col("total_price"), col("order_count"))
  }

  val q53Oracle: String =
    s"""SELECT o_orderstatus AS order_status, o_orderpriority AS order_priority,
       |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS grp_id,
       |  ${Exact.sumFixedSql("o_totalprice", 2)} AS total_price,
       |  count(*) AS order_count
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
       |                        (o_orderstatus), (o_orderpriority), ())""".stripMargin

  /** q66: CUBE over (returnflag, linestatus) — all four grouping
    * combinations in one pass, completing the rollup (q11) / grouping
    * sets (q53) / cube trio. Same one-shuffle expand-aggregate plan
    * class as q53; the grouping-bit id disambiguates real NULLs from
    * subtotal rows. */
  def q66Cube(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
          .cast("long").as("grp_id"),
        count(lit(1)).as("line_count"),
        Exact.sumFixed(col("l_extendedprice"), 2).as("total_price"))
      .select(col("l_returnflag").as("return_flag"),
        col("l_linestatus").as("line_status"),
        col("grp_id"), col("line_count"), col("total_price"))
  }

  val q66Oracle: String =
    s"""SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
       |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS grp_id,
       |  count(*) AS line_count,
       |  ${Exact.sumFixedSql("l_extendedprice", 2)} AS total_price
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** q67: correlated EXISTS / NOT EXISTS through the spark.sql path —
    * the same SQL text runs on Spark's temp-view catalog and DuckDB.
    * Catalyst rewrites EXISTS to a left-semi and NOT EXISTS to a
    * left-anti join (the decorrelation every serious engine must do —
    * a per-row subquery execution would be quadratic). */
  val q67Sql: String =
    """SELECT n_nationkey AS nation_key, n_name AS nation_name,
      |  EXISTS (SELECT 1 FROM supplier s
      |          WHERE s.s_nationkey = n.n_nationkey) AS has_supplier,
      |  NOT EXISTS (SELECT 1 FROM customer c
      |              WHERE c.c_nationkey = n.n_nationkey
      |                AND c.c_acctbal < 0) AS all_balances_nonneg
      |FROM nation n""".stripMargin

  def q67ExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.register(spark, dir, "nation", "supplier", "customer")
    spark.sql(q67Sql)
  }

  /** q69: interpolated percentiles (PERCENTILE_CONT semantics) of
    * order totals per status — complements q48's nearest-rank profile
    * with the interpolating variant analysts actually ask for. Built
    * from order statistics directly (rank rows per group, pick the
    * ⌊t⌋/⌈t⌉ neighbors of target t = p·(n−1), interpolate) rather than
    * the built-in `percentile`, because the two engines' built-ins
    * differ in interpolation formula by ulps; writing ONE formula over
    * exact integer price units — lo + (hi−lo)·g, one final /100 — is
    * what makes the doubles hash-identical. Plan: ranks come from the
    * two-phase distributed [[Rank.groupRank]] (status has ~3 values, so
    * a plain per-status window would sort a third of the table in ONE
    * task), then one join against the 4-row-per-group target table. */
  val PercentilePs = Seq(0.25, 0.5, 0.75, 0.9)

  def q69PercentileCont(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderstatus").as("status"),
        Exact.units(col("o_totalprice"), 2).as("u"))
    val ranked = Rank.groupRank(ord, Seq("status"), "u", Nil, "rn", "_n")
      .drop("_n")
    // targets come from a cheap scan-side count agg (NOT from ranked),
    // and join the ranked rows ONCE with (rn = lo OR rn = hi) as a
    // residual — rank-equi-joining ranked per bound would instantiate
    // the whole window subtree once per join (see Audit.medianOf)
    val targets = ord.groupBy(col("status")).agg(count(lit(1)).as("n"))
      .select(col("status").as("t_status"), col("n"),
        explode(array(PercentilePs.map(lit): _*)).as("p"))
      .withColumn("t", col("p") * (col("n") - 1))
      .select(col("t_status"), col("p"),
        floor(col("t")).cast("long").as("lo"),
        ceil(col("t")).cast("long").as("hi"),
        (col("t") - floor(col("t"))).as("g"))
    ranked
      .join(broadcast(targets),
        col("status") === col("t_status") &&
          (col("rn") === col("lo") || col("rn") === col("hi")))
      .groupBy(col("status"), col("p"), col("g"))
      // ranks are value-sorted, so min/max of the ≤2 matched rows ARE
      // the lo/hi order statistics; single-row case has g = 0
      .agg(min(col("u")).as("lu"), max(col("u")).as("hu"))
      .select(col("status"), col("p"),
        ((col("lu") + (col("hu") - col("lu")) * col("g")) / 100.0)
          .as("pct_value"))
  }

  val q69Oracle: String = {
    val ps = PercentilePs.map(p => s"${p}e0").mkString(", ")
    s"""WITH o AS (
       |  SELECT o_orderstatus AS status,
       |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS u
       |  FROM orders
       |), ranked AS (
       |  SELECT status, u,
       |    row_number() OVER (PARTITION BY status ORDER BY u ASC) - 1 AS rn
       |  FROM o
       |), t AS (
       |  SELECT status, p, p * (n - 1) AS t
       |  FROM (SELECT status, count(*) AS n FROM o GROUP BY 1) n,
       |       (SELECT unnest([$ps]) AS p) ps
       |), b AS (
       |  SELECT status, p, CAST(floor(t) AS BIGINT) AS lo,
       |    CAST(ceil(t) AS BIGINT) AS hi, t - floor(t) AS g
       |  FROM t)
       |SELECT b.status, b.p,
       |  (l.u + (h.u - l.u) * b.g) / 100.0 AS pct_value
       |FROM b
       |JOIN ranked l ON l.status = b.status AND l.rn = b.lo
       |JOIN ranked h ON h.status = b.status AND h.rn = b.hi""".stripMargin
  }

  /** RANGE-frame moving aggregate + ntile: each order's trailing 7-day
    * per-customer spend (a true event-time range frame — peers at the
    * same day all join the frame, so ties are deterministic) and its
    * global spend quartile. The windowed sum accumulates exact integer
    * units with one final division, so the moving doubles hash-compare.
    *
    * The quartile is NOT `ntile(4)` over an unpartitioned window (that
    * funnels every order through one task): the global 0-based rank r
    * under (price DESC, orderkey ASC) comes from the distributed
    * [[Rank.groupRank]] (negated exact units = DESC), and ntile's exact
    * tile arithmetic — the first n%4 tiles hold ⌈n/4⌉ rows, the rest
    * ⌊n/4⌋ — is then a per-row expression, bit-identical to the
    * oracle's built-in ntile. */
  def q54MovingWindow(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        unix_date(to_date(col("o_orderdate"))).as("d"))
      .withColumn("_negu", -Exact.units(col("o_totalprice"), 2))
    val ranked = Rank.groupRank(ord, Nil, "_negu", Seq("o_orderkey"),
      "_r", "_n")
    val wRange = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-6, Window.currentRow)
    ranked
      .withColumn("moving_units",
        sum(Exact.units(col("o_totalprice"), 2)).over(wRange))
      .select(
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("customer_id"),
        (col("moving_units") / lit(100.0)).as("trailing_week_spend"),
        // q = _n DIV 4, rm = _n % 4; tiles [1, rm] take q+1 rows. The
        // ELSE divisor q is only 0 when n < 4, where r < rm·(q+1) = n
        // always holds — CaseWhen is lazy, so the branch never runs
        expr("""CASE WHEN _r < (_n % 4) * (_n DIV 4 + 1)
                THEN _r DIV (_n DIV 4 + 1) + 1
                ELSE (_n % 4) + (_r - (_n % 4) * (_n DIV 4 + 1)) DIV (_n DIV 4) + 1
                END""").as("spend_quartile"))
  }

  val q54Oracle: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice,
      |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d
      |  FROM orders)
      |SELECT o_orderkey AS order_id, o_custkey AS customer_id,
      |  sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
      |    OVER (PARTITION BY o_custkey ORDER BY d
      |          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0
      |    AS trailing_week_spend,
      |  CAST(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT)
      |    AS spend_quartile
      |FROM base""".stripMargin

  /** Unpivot — the inverse of the reference's signature pivot
    * (Geo_silver_layer_common.py:27-32): melt the wide fact_weather
    * metrics back to long (metric, value) rows, dropping the NULL
    * cells the pivot introduced. Wide→long is a narrow per-row
    * expansion (no shuffle beyond the pivot's own aggregation). */
  def q55Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = Relational.qWeatherPivot(spark, dir)
    wide.unpivot(
        Array(col("segment"), col("obs_date")),
        Array(col("view_avg"), col("click_avg"), col("purchase_avg"), col("signup_avg")),
        "metric", "avg_value")
      .filter(col("avg_value").isNotNull)
  }

  val q55Oracle: String = {
    val arms = Seq("view_avg", "click_avg", "purchase_avg", "signup_avg")
      .map(m =>
        s"""SELECT segment, obs_date, '$m' AS metric, $m AS avg_value
           |FROM wide WHERE $m IS NOT NULL""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH wide AS (
       |${Relational.qWeatherPivotOracle}
       |)
       |$arms""".stripMargin
  }

  /** Scalar + IN subqueries through the spark.sql entry path: customers
    * above the global average balance who bought from a filtered order
    * set. The SAME SQL text runs on Spark (temp-view catalog) and DuckDB
    * — the subquery threshold uses exact integer-scaled arithmetic so
    * the comparison boundary is bit-identical. Catalyst rewrites the
    * scalar subquery to a broadcast and the IN to a left-semi join. */
  val q34Sql: String =
    """SELECT c_custkey AS customer_id, c_name AS customer_name,
      |  c_acctbal AS account_balance
      |FROM customer
      |WHERE c_acctbal > (SELECT sum(CAST(round(c_acctbal * 100.0) AS BIGINT))
      |                          / (count(c_acctbal) * 100.0) FROM customer)
      |  AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin

  def q34ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.register(spark, dir, "customer", "orders")
    spark.sql(q34Sql)
  }

  /** Sketch-based distinct counting via the HllAggregator extension
    * point, alongside the exact count for comparison. Rows-only check
    * (the sketch estimate is engine-specific); accuracy and
    * partition-invariance are asserted in HllSpec. */
  def q30HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.groupBy(col("event_type")).agg(
      graft.functions.HllAggregator.hllDistinct(col("user_id")).as("approx_users"),
      countDistinct(col("user_id")).as("exact_users"))
  }

  /** Batch interval join — the fact_sales band-join shape
    * (sales_aw_silver_layer_fact_sales.py:35-47) in batch form: equi key
    * + time band [o_orderdate, o_orderdate + 90 days], aggregated per
    * status. The equi conjunct keeps it a hash join (band is a residual
    * filter, not a nested-loop condition). */
  def q12IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem").as("l")
    val ord = Tables.load(spark, dir, "orders").as("o")
    li.join(ord,
        expr("""l.l_orderkey = o.o_orderkey
                AND l.l_shipdate >= o.o_orderdate
                AND l.l_shipdate <= o.o_orderdate + interval 90 days"""),
        "inner")
      .groupBy(col("o.o_orderstatus").as("order_status"))
      .agg(
        count(lit(1)).as("shipped_lines"),
        Exact.sumFixed(col("l.l_extendedprice"), 2).as("shipped_value"))
  }

  val q12Oracle: String =
    s"""SELECT o.o_orderstatus AS order_status,
       |  count(*) AS shipped_lines,
       |  ${Exact.sumFixedSql("l.l_extendedprice", 2)} AS shipped_value
       |FROM lineitem l JOIN orders o
       |  ON l.l_orderkey = o.o_orderkey
       | AND l.l_shipdate >= o.o_orderdate
       | AND l.l_shipdate <= o.o_orderdate + INTERVAL 90 DAY
       |GROUP BY o.o_orderstatus""".stripMargin

  /** q63: fuzzy entity matching — each supplier's closest customer
    * name by Levenshtein edit distance, BLOCKED on a composite key
    * that GROWS with the corpus: (nationkey, name-century), where the
    * name-century is the normalized name (the digit run after the
    * entity tag's '#') minus its last two characters. The blocking key
    * is part of the operator's semantics (a fuzzy join without a
    * blocking key cannot scale — and the r6 nation-only key was a
    * FIXED 25-value domain, so 10× rows meant 100× within-block
    * pairs); the century key adds one block per 100 entity numbers, so
    * the block DOMAIN scales linearly with the data while every block
    * stays ≤100 names wide — total candidate pairs are linear in the
    * corpus at any scale. The key is also similarity-aligned, as a
    * blocking key should be: same-century zero-padded digit strings
    * differ in at most their last two characters. Edit distance is
    * integer and both engines implement the standard DP, so the
    * argmin (distance asc, custkey asc) is bit-exact.
    *
    * Within a block the DP is still guarded by the lossless two-phase
    * prune (bounded block width makes it cheap insurance; under
    * real-corpus key skew — a century with thousands of collisions —
    * it is what bounds the work):
    *  1. ANCHOR upper bound — each supplier computes one full distance
    *     to a deterministic per-block anchor (the min-custkey
    *     customer): ub_s. The true best distance is <= ub_s because
    *     the anchor is itself a candidate. The anchor frame is
    *     block-cardinality — it grows with the corpus, so it is NOT
    *     broadcast-hinted (stats/AQE may still broadcast it while it
    *     fits).
    *  2. Candidates first pass the |len(s)-len(c)| <= ub_s filter
    *     (length difference lower-bounds edit distance — free prune
    *     before ANY DP work; vacuous on fixed-width TPC-H names, load-
    *     bearing on real variable-length corpora), then run the BANDED
    *     early-exit kernel [[graft.functions.LevenshteinWithin]] with
    *     per-row threshold ub_s: O(len·ub) band instead of the full
    *     matrix, -1 (dropped) when distance > ub_s. Every dropped pair
    *     has distance strictly above ub_s >= best, so it can affect
    *     neither the argmin nor the custkey tie-break, and the anchor
    *     pair always survives — the ranking window now sees only the
    *     survivors instead of the whole block.
    *
    * TOTALITY: the blocking key is part of the match semantics, so a
    * supplier whose (nation, century) block contains NO customer emits
    * NO row (measured: 2/100 suppliers at sf0.01, 40/1000 at sf0.1),
    * and a supplier's best match can be strictly worse than the
    * nation-wide argmin when that argmin lives in another century
    * block — blocked fuzzy matching trades exactly this recall for
    * linear scaling, and the oracle blocks identically.
    *
    * CORPUS CONTRACT: the century key presumes the `Tag#digits` name
    * shape. On a corpus whose names lack the '#' tag every entity
    * falls into ONE empty-string block per nation and the plan would
    * silently degrade to the quadratic nation-wide join — so the
    * anchor aggregate (which already groups by block) carries the
    * block width and the plan FAILS LOUDLY via assert_true when any
    * customer block exceeds [[Q63MaxBlockWidth]] (10× the contractual
    * ≤100-name width), instead of running quadratically. */
  val Q63MaxBlockWidth = 1000L

  def q63FuzzyMatch(spark: SparkSession, dir: String): DataFrame =
    fuzzyMatchBlocked(
      Tables.load(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey")),
      Tables.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey")))

  /** The blocked fuzzy-match core over (s_suppkey, s_name,
    * s_nationkey) × (c_custkey, c_name, c_nationkey) frames — see
    * [[q63FuzzyMatch]] for semantics, totality and the corpus
    * contract. */
  def fuzzyMatchBlocked(supRaw: DataFrame, custRaw: DataFrame): DataFrame = {
    def blk(name: String): org.apache.spark.sql.Column =
      expr(s"substring(split_part($name, '#', 2), 1, " +
        s"greatest(length(split_part($name, '#', 2)) - 2, 0))")
    val sup = supRaw.select(col("s_suppkey"), col("s_name"),
      col("s_nationkey"), blk("s_name").as("s_blk"))
    val cust = custRaw.select(col("c_custkey"), col("c_name"),
      col("c_nationkey"), blk("c_name").as("c_blk"))
    val anchors = cust
      .groupBy(col("c_nationkey").as("a_nationkey"), col("c_blk").as("a_blk"))
      .agg(min(struct(col("c_custkey"), col("c_name"))).as("a"),
        count(lit(1)).as("a_width"))
      // block-width invariant (corpus contract, scaladoc above): rides
      // the existing aggregate — zero extra jobs; assert_true inside a
      // filter so column pruning cannot drop it
      .filter(assert_true(col("a_width") <= lit(Q63MaxBlockWidth),
        concat(lit("q63: customer block (nation="), col("a_nationkey"),
          lit(", blk='"), col("a_blk"), lit("') holds "), col("a_width"),
          lit(s" names > $Q63MaxBlockWidth — the 'Tag#digits' blocking" +
            " key is degenerate on this corpus and the plan would go" +
            " quadratic"))).isNull)
      .select(col("a_nationkey"), col("a_blk"), col("a.c_name").as("anchor_name"))
    val supUb = sup
      .join(anchors, col("s_nationkey") === col("a_nationkey") &&
        col("s_blk") === col("a_blk"))
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_blk"),
        levenshtein(col("s_name"), col("anchor_name")).as("ub"))
    // argmin as a hash aggregate (min(struct) = (edit ASC, custkey
    // ASC) selection, map-side combined) — the survivor frame never
    // sorts; s_name is constant per s_suppkey so it rides the key
    supUb.join(cust, col("s_nationkey") === col("c_nationkey") &&
        col("s_blk") === col("c_blk"))
      .filter(abs(length(col("s_name")) - length(col("c_name"))) <= col("ub"))
      .select(col("s_suppkey"), col("s_name"), col("c_custkey"),
        graft.functions.LevenshteinWithin(col("s_name"), col("c_name"), col("ub"))
          .cast("long").as("edit_distance"))
      .filter(col("edit_distance") >= 0L)
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(min(struct(col("edit_distance"), col("c_custkey"))).as("m"))
      .select(col("s_suppkey"), col("s_name"),
        col("m.c_custkey").as("best_match"),
        col("m.edit_distance").as("edit_distance"))
  }

  val q63Oracle: String =
    """WITH s AS (
      |  SELECT s_suppkey, s_name, s_nationkey,
      |    substr(split_part(s_name, '#', 2), 1,
      |           greatest(length(split_part(s_name, '#', 2)) - 2, 0)) AS blk
      |  FROM supplier
      |), c AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    substr(split_part(c_name, '#', 2), 1,
      |           greatest(length(split_part(c_name, '#', 2)) - 2, 0)) AS blk
      |  FROM customer
      |)
      |SELECT s_suppkey, s_name, best_match, edit_distance FROM (
      |  SELECT s.s_suppkey, s.s_name, c.c_custkey AS best_match,
      |    CAST(levenshtein(s.s_name, c.c_name) AS BIGINT) AS edit_distance,
      |    row_number() OVER (PARTITION BY s.s_suppkey
      |                       ORDER BY levenshtein(s.s_name, c.c_name) ASC,
      |                                c.c_custkey ASC) AS rk
      |  FROM s JOIN c ON s.s_nationkey = c.c_nationkey AND s.blk = c.blk) t
      |WHERE rk = 1""".stripMargin

  /** q65: time-series resampling with gap fill — hourly event counts
    * and exact value sums per event type, densified so every
    * (type, hour) cell in the observed range exists, zeros where no
    * events landed (the densification every downstream window/ML
    * consumer needs before it can assume regular spacing). The hour
    * grid is generated from the global min/max (one tiny agg), crossed
    * with the distinct types, and left-joined against the aggregated
    * cells — grid and cells are both bucket-cardinality, so the join
    * is broadcast-sized no matter how large the raw event stream. */
  def q65Resample(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"),
        col("value"))
    val agg = ev.groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"), Exact.sumFixed(col("value"), 2).as("v"))
    val hours = ev.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour")))
        .as("hour"))
    val grid = hours.crossJoin(ev.select(col("event_type")).distinct())
    grid.join(agg, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        coalesce(col("v"), lit(0.0)).as("value_sum"))
  }

  val q65Oracle: String =
    s"""WITH ev AS (
       |  SELECT event_type, date_trunc('hour', ts) AS hour, value FROM events
       |), agg AS (
       |  SELECT event_type, hour, count(*) AS n,
       |    ${Exact.sumFixedSql("value", 2)} AS v
       |  FROM ev GROUP BY 1, 2
       |), hours AS (
       |  SELECT unnest(generate_series(min(hour), max(hour),
       |                                INTERVAL 1 HOUR)) AS hour
       |  FROM ev
       |), grid AS (
       |  SELECT t.event_type, h.hour
       |  FROM hours h, (SELECT DISTINCT event_type FROM ev) t)
       |SELECT g.event_type, g.hour,
       |  coalesce(a.n, 0) AS n_events,
       |  coalesce(a.v, CAST(0.0 AS DOUBLE)) AS value_sum
       |FROM grid g LEFT JOIN agg a
       |  ON a.event_type = g.event_type AND a.hour = g.hour""".stripMargin

  /** q97: LOCF gap fill — q65's dense grid, but empty buckets carry
    * the LAST OBSERVED hourly sum forward (last-observation-carried-
    * forward, the standard time-series imputation) instead of zero;
    * buckets before a type's first observation stay NULL, and `is_gap`
    * marks imputed rows. The LOCF window is partitioned by event_type
    * over the RESAMPLED GRID — an aggregate whose size is
    * hours × types (time-range bounded, independent of corpus row
    * count), so the per-partition sort is bounded at any scale: the
    * same aggregate-sized-window justification as q59's block offsets,
    * NOT the corpus-sized window the plan lint exists to catch. */
  def q97GapFillLocf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"),
        col("value"))
    val agg = ev.groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"), Exact.sumFixed(col("value"), 2).as("v"))
    val hours = ev.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour")))
        .as("hour"))
    val grid = hours.crossJoin(ev.select(col("event_type")).distinct())
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("v"), ignoreNulls = true).over(w).as("filled_value"),
        col("v").isNull.as("is_gap"))
  }

  val q97Oracle: String =
    s"""WITH ev AS (
       |  SELECT event_type, date_trunc('hour', ts) AS hour, value FROM events
       |), agg AS (
       |  SELECT event_type, hour, count(*) AS n,
       |    ${Exact.sumFixedSql("value", 2)} AS v
       |  FROM ev GROUP BY 1, 2
       |), hours AS (
       |  SELECT unnest(generate_series(min(hour), max(hour),
       |                                INTERVAL 1 HOUR)) AS hour
       |  FROM ev
       |), grid AS (
       |  SELECT t.event_type, h.hour
       |  FROM hours h, (SELECT DISTINCT event_type FROM ev) t)
       |SELECT g.event_type, g.hour,
       |  coalesce(a.n, 0) AS n_events,
       |  last_value(a.v IGNORE NULLS) OVER (
       |    PARTITION BY g.event_type ORDER BY g.hour
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       |  a.v IS NULL AS is_gap
       |FROM grid g LEFT JOIN agg a
       |  ON a.event_type = g.event_type AND a.hour = g.hour""".stripMargin

  /** q113: the analytic-window function suite over per-user event
    * streams — lag/lead gaps, first/last/nth_value frames, and the
    * rank-family ratios (percent_rank, cume_dist) in one pass. This is
    * the remaining breadth of SQL window functions not yet exercised
    * by q8 (rank top-k), q54 (range frames), q31 (lag + cumsum):
    * coverage a reference user migrating analytics would hit first.
    *
    * All windows partition by user_id — high-cardinality, so each task
    * sorts one user's events (the scale-safe window class; the banned
    * shape is the LOW-cardinality or global partition, per Rank's
    * scaladoc). One shuffle serves every function: Catalyst collapses
    * the identical window specs into a single sort. The ordering
    * (ts, event_id) is total, so the rank ratios are deterministic;
    * gaps are exact integer milliseconds; the ratios are divisions of
    * identical integers on both engines — bit-equal doubles. */
  def q113WindowSuite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val ms = unix_millis(col("ts"))
    ev.select(col("user_id"), col("event_id"),
        (ms - lag(ms, 1).over(w)).as("gap_prev_ms"),
        (lead(ms, 1).over(w) - ms).as("gap_next_ms"),
        first(col("event_id")).over(wFull).as("first_event"),
        last(col("event_id")).over(wFull).as("last_event"),
        nth_value(col("event_id"), 3).over(wFull).as("third_event"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
  }

  val q113Oracle: String =
    """SELECT user_id, event_id,
      |  epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_prev_ms,
      |  lead(epoch_ms(ts)) OVER w - epoch_ms(ts) AS gap_next_ms,
      |  first_value(event_id) OVER wf AS first_event,
      |  last_value(event_id) OVER wf AS last_event,
      |  nth_value(event_id, 3) OVER wf AS third_event,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC),
      |  wf AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |""".stripMargin

  /** q117: WEIGHTED median — the quantity level that splits each
    * (returnflag, linestatus) slice's REVENUE mass in half ("half the
    * money moves in orders of ≤ this size"), the weighted flavor of
    * the order statistics q69/q70 compute by row count. Definition:
    * the first row, in (qty, orderkey, linenumber) order, whose
    * cumulative revenue reaches ⌈total/2⌉.
    *
    * The grouping column pair has ~4 values — exactly the shape where
    * a plain cumulative window sorts a quarter of the table per task —
    * so the prefix weight runs through [[Rank.groupPrefixSum]] (the
    * weighted generalization of the q54/q69 two-phase rank). Revenue
    * weights are integer cents, so the crossing row is exact; the
    * first-crossing pick is a min over a lexicographic struct, which
    * the monotone prefix makes equal to the ordered-first row. */
  def q117WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long").as("qty"),
        Exact.units(col("l_extendedprice"), 2).as("w"),
        col("l_orderkey"), col("l_linenumber"))
    val cum = Rank.groupPrefixSum(li, Seq("l_returnflag", "l_linestatus"),
      "qty", Seq("l_orderkey", "l_linenumber"), "w", "cw")
    val totals = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("w")).as("total_cents"))
      .withColumn("target", expr("(total_cents + 1) div 2"))
    cum.join(broadcast(totals), Seq("l_returnflag", "l_linestatus"))
      .filter(col("cw") >= col("target"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(min(struct(col("qty"), col("l_orderkey"), col("l_linenumber"),
          col("cw"))).as("m"),
        max(col("total_cents")).as("total_cents"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("m.qty").as("median_qty"), col("m.cw").as("cum_cents"),
        col("total_cents"))
  }

  val q117Oracle: String =
    """WITH base AS (
      |  SELECT l_returnflag, l_linestatus, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(round(l_extendedprice * 100.0) AS BIGINT) AS w,
      |    l_orderkey, l_linenumber
      |  FROM lineitem
      |), cum AS (
      |  SELECT *, CAST(sum(w) OVER (PARTITION BY l_returnflag, l_linestatus
      |      ORDER BY qty ASC, l_orderkey ASC, l_linenumber ASC
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
      |  FROM base
      |), tot AS (
      |  SELECT l_returnflag, l_linestatus, CAST(sum(w) AS BIGINT) AS total_cents,
      |    CAST((sum(w) + 1) // 2 AS BIGINT) AS target
      |  FROM base GROUP BY 1, 2
      |), q AS (
      |  SELECT c.l_returnflag, c.l_linestatus, c.qty, c.cw, t.total_cents,
      |    row_number() OVER (PARTITION BY c.l_returnflag, c.l_linestatus
      |      ORDER BY c.qty ASC, c.l_orderkey ASC, c.l_linenumber ASC) AS rk
      |  FROM cum c JOIN tot t USING (l_returnflag, l_linestatus)
      |  WHERE c.cw >= t.target)
      |SELECT l_returnflag, l_linestatus, qty AS median_qty,
      |  cw AS cum_cents, total_cents
      |FROM q WHERE rk = 1""".stripMargin
  /** q131: exponentially weighted moving average of daily revenue per
    * event type — the smoothing curve dashboards overlay on noisy
    * daily totals. The recurrence s_t = (v_t + 7·s_{t−1}) div 8
    * (α = 1/8) is inherently sequential, so it runs as a sorted fold
    * inside each group — and the GROUP IS CALENDAR-BOUNDED (one row
    * per day after the daily aggregate), so the collect_list is ≤
    * |days| elements regardless of corpus size; the corpus-sized work
    * is all in the partial-aggregatable daily cents sum. All-integer
    * state (inputs non-negative → truncating div = floor), so the
    * DuckDB recursive-CTE replay of the same recurrence is bit-exact.
    */
  def q131Ewma(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(round(value * 100.0) AS BIGINT)")).as("cents"))
    daily.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("day"), col("cents"))))
        .as("dv"))
      .select(col("event_type"), expr(
        """explode(aggregate(
          |  dv,
          |  named_struct(
          |    'arr', CAST(array() AS
          |      ARRAY<STRUCT<day: DATE, cents: BIGINT, ewma: BIGINT>>),
          |    'prev', CAST(NULL AS BIGINT)),
          |  (acc, x) -> named_struct(
          |    'arr', array_append(acc.arr, named_struct(
          |      'day', x.day, 'cents', x.cents,
          |      'ewma', CASE WHEN acc.prev IS NULL THEN x.cents
          |        ELSE (x.cents + 7 * acc.prev) div 8 END)),
          |    'prev', CASE WHEN acc.prev IS NULL THEN x.cents
          |      ELSE (x.cents + 7 * acc.prev) div 8 END),
          |  acc -> acc.arr))""".stripMargin).as("e"))
      .select(col("event_type"), col("e.day").as("day"),
        col("e.cents").as("cents"), col("e.ewma").as("ewma_cents"))
  }

  val q131Oracle: String =
    """WITH RECURSIVE daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM events GROUP BY 1, 2
      |), d AS (
      |  SELECT event_type, day, cents,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day ASC)
      |      AS rn
      |  FROM daily
      |), r AS (
      |  SELECT event_type, day, cents, rn, cents AS ewma
      |  FROM d WHERE rn = 1
      |  UNION ALL
      |  SELECT d.event_type, d.day, d.cents, d.rn,
      |    (d.cents + 7 * r.ewma) // 8
      |  FROM r JOIN d ON d.event_type = r.event_type
      |    AND d.rn = r.rn + 1
      |)
      |SELECT event_type, day, cents, CAST(ewma AS BIGINT) AS ewma_cents
      |FROM r""".stripMargin
}
