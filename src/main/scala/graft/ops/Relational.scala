package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch relational operators re-expressing the reference's query shapes
  * over the driver test tables (TESTDATA.md). Each builder returns a
  * DataFrame; SparkEntry wires them into `queries` with a DuckDB oracle.
  *
  * Scale notes (100 TB design intent):
  *  - Dimension sides of joins (region/nation/customer at dim scale) are
  *    explicitly `broadcast()` so the fact scan never shuffles for the
  *    lookup — the same asymmetry the reference encodes by using
  *    stream-static joins for dim lookups (silver_layer_production.py:15-17).
  *  - Aggregates are declarative groupBy/agg → Catalyst plans partial
  *    (map-side) + final HashAggregate, so the shuffle carries the
  *    already-combined partials, not raw rows.
  *  - All predicates/projections are Column expressions → pushed into the
  *    parquet scan (PushedFilters / ReadSchema), never evaluated post-scan.
  */
object Relational {

  /** TPC-H Q1 shape: single-pass scan + partial/final hash aggregate.
    * Exercises the groupBy+avg pattern of Geo_silver_layer_common.py:18-24
    * at fact-table scale. All money aggregates use Exact fixed-point sums
    * so the result is bit-identical regardless of partitioning. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.sumFixed(col("l_quantity"), 2).as("sum_qty"),
        Exact.sumFixed(col("l_extendedprice"), 2).as("sum_base_price"),
        // 2dp price × 2dp rate = exact 4-decimal product
        Exact.sumFixed(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        Exact.avgFixed(col("l_quantity"), 2).as("avg_qty"),
        Exact.avgFixed(col("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Exact.sumFixedSql("l_quantity", 2)} AS sum_qty,
       |  ${Exact.sumFixedSql("l_extendedprice", 2)} AS sum_base_price,
       |  ${Exact.sumFixedSql("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
       |  ${Exact.avgFixedSql("l_quantity", 2)} AS avg_qty,
       |  ${Exact.avgFixedSql("l_discount", 2)} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** The reference's `fact_weather` shape (Geo_silver_layer_common.py:8-41):
    * batch scan ⨝ dimension → IN-list filter → groupBy on a computed key
    * (upper(variable)) + avg → pivot with an EXPLICIT value list + avg →
    * snake_case rename. Explicit pivot values skip the distinct-discovery
    * job (same manual optimization the reference encodes at :27-32); the
    * pivot desugars to avg(CASE WHEN variable=v ...) before analysis.
    * The dimension is broadcast: at 100 TB the events fact never shuffles. */
  def qWeatherPivot(spark: SparkSession, dir: String): DataFrame =
    factWeather(Tables.load(spark, dir, "events"), Tables.load(spark, dir, "customer"))

  def factWeather(events: DataFrame, customer: DataFrame): DataFrame = {
    val ev = events
    val cust = customer
    val kinds = Seq("VIEW", "CLICK", "PURCHASE", "SIGNUP")
    val daily = ev
      .filter(col("event_type").isin("view", "click", "purchase", "signup"))
      // customer: SF-growing — no fixed hint; size stats / AQE pick
      // broadcast while it fits, so the events fact still never
      // shuffles below the threshold
      .join(cust, ev("user_id") === cust("c_custkey"), "inner")
      .groupBy(
        col("c_mktsegment").as("segment"),
        to_date(col("ts")).as("obs_date"),
        upper(col("event_type")).as("variable"))
      .agg(Exact.avgFixed(col("value"), 2).as("avg_value"))
    daily.groupBy("segment", "obs_date")
      .pivot("variable", kinds)
      .agg(avg(col("avg_value")))
      .select(
        col("segment"), col("obs_date"),
        col("VIEW").as("view_avg"),
        col("CLICK").as("click_avg"),
        col("PURCHASE").as("purchase_avg"),
        col("SIGNUP").as("signup_avg"))
  }

  /** q90: star-schema rollup — the canonical warehouse read: fact
    * (lineitem) → orders → customer, with the small dimension chain
    * nation→region broadcast so the fact side never shuffles for the
    * lookup. The two fact-fact joins (lineitem⨝orders on orderkey,
    * ⨝customer on custkey) shuffle on their keys — unavoidable and
    * linear; the dim lookups ride along free. Revenue is summed as
    * integer cent·basis-point units (price_cents × (100 − disc_pct)) —
    * exact per-row products, associative integer accumulation in
    * Decimal(38,0), bit-identical under any partitioning (the Exact
    * discipline, kept inline because the product of two scaled columns
    * isn't a single fixed-point column).
    *
    * At 100 TB: two key-partitioned shuffles of the fact tables plus
    * two broadcasts of O(100)-row dims — the plan a cost-based
    * warehouse picks for this query. AQE would additionally coalesce
    * post-shuffle partitions; nothing here fights it. */
  def q90StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") =!= "R")
      .select(col("l_orderkey"),
        (Exact.units(col("l_extendedprice"), 2) *
          (lit(100L) - Exact.units(col("l_discount"), 2)))
          .cast("decimal(38,0)").as("rev_u"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val reg = Tables.load(spark, dir, "region")
      .select(col("r_regionkey"), col("r_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"), col("o_year"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("rev_u")).cast("long").as("revenue_u"))
  }

  val q90Oracle: String =
    """SELECT r_name, n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  count(*) AS n_items,
      |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT) *
      |           (100 - CAST(round(l_discount * 100.0) AS BIGINT))) AS BIGINT)
      |    AS revenue_u
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE l_returnflag <> 'R'
      |GROUP BY 1, 2, 3""".stripMargin

  /** q91: skew-salted join, oracle-checked — [[SkewJoin.saltedEquiJoin]]
    * (the technique ScaleTechniquesSpec proves plan-shape for) run as a
    * registered query whose DuckDB oracle is the UNSALTED join+rollup:
    * the external engine independently confirms that salting is
    * invisible in the result. The salted plan splits every hot key
    * across 8 sub-partitions (big side salted by row hash, small side
    * replicated 8×), bounding the largest join task at 1/8 of the
    * hottest key — the manual fallback when AQE skew-split can't kick
    * in (e.g. a hot key inside one huge row group). Rolled up by
    * supplier with exact integer quantities. */
  def q91SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"))
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    SkewJoin.saltedEquiJoin(li, sup, "l_suppkey", salts = 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        sum(Exact.units(col("l_quantity"), 0)).cast("long").as("qty_sum"))
  }

  val q91Oracle: String =
    """SELECT s_name, count(*) AS n_items,
      |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty_sum
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1""".stripMargin

  val qWeatherPivotOracle: String =
    s"""WITH daily AS (
       |  SELECT c_mktsegment AS segment, CAST(ts AS DATE) AS obs_date,
       |         upper(event_type) AS variable,
       |         ${Exact.avgFixedSql("value", 2)} AS avg_value
       |  FROM events e JOIN customer c ON e.user_id = c.c_custkey
       |  WHERE event_type IN ('view','click','purchase','signup')
       |  GROUP BY 1, 2, 3)
       |SELECT segment, obs_date,
       |  avg(CASE WHEN variable = 'VIEW' THEN avg_value END) AS view_avg,
       |  avg(CASE WHEN variable = 'CLICK' THEN avg_value END) AS click_avg,
       |  avg(CASE WHEN variable = 'PURCHASE' THEN avg_value END) AS purchase_avg,
       |  avg(CASE WHEN variable = 'SIGNUP' THEN avg_value END) AS signup_avg
       |FROM daily GROUP BY segment, obs_date""".stripMargin
  /** q133: nation-to-nation trade matrix — revenue and volume for every
    * (customer nation, supplier nation) pair, the 2-dimensional OLAP
    * rollup a trade dashboard renders as a heatmap. One pass over the
    * fact: lineitem joins orders on the key-partitioned order key,
    * then customer (key-partitioned), then BOTH nation lookups as
    * broadcasts (25 rows each, aliased twice) — the fact table is
    * touched once and only ever shuffles on join keys, and the output
    * is |nations|² rows. Revenue in exact cent·centi-units (q90's
    * integer formulation) so the sums hash bit-exactly. */
  def q133TradeMatrix(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (Exact.units(col("l_extendedprice"), 2) *
          (lit(100L) - Exact.units(col("l_discount"), 2)))
          .cast("decimal(38,0)").as("rev_u"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      // supplier: SF-growing — no hint, auto-converts while it fits
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
      .join(broadcast(nat.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("rev_u")).cast("long").as("revenue_u"))
  }

  val q133Oracle: String =
    """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
      |  count(*) AS n_items,
      |  CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT) *
      |           (100 - CAST(round(l.l_discount * 100.0) AS BIGINT)))
      |    AS BIGINT) AS revenue_u
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |GROUP BY 1, 2""".stripMargin

  /** q138: market-basket co-purchase mining over order line items —
    * part pairs bought in the same order, with support, confidence
    * and lift; the recommendation-candidate pass (and the other
    * basket shape next to q71's session co-occurrence: baskets here
    * are ORDERS, whose size is bounded by items-per-order, so the
    * within-basket pair self-join is per-key bounded — the corpus
    * never goes quadratic, unlike a naive part×part product).
    *
    * Exactness: supports are integer counts; confidence and lift are
    * SINGLE divisions of exact integer numerators/denominators
    * (correctly rounded once — bit-equal across engines; no summed
    * doubles). The order total rides a 1-row broadcast, part
    * marginals attach by part-keyed hash joins (a part catalog
    * outgrows a broadcast at 100 TB — no hint). Top-100 with full
    * lexicographic tiebreak keeps the report deterministic. */
  def q138Copurchase(spark: SparkSession, dir: String): DataFrame = {
    val items = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = items.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val singles = items.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("support"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"),
        col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("support_ab"))
    pairs
      .join(singles.select(col("l_partkey").as("part_a"),
        col("support").as("support_a")), "part_a")
      .join(singles.select(col("l_partkey").as("part_b"),
        col("support").as("support_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("support_ab"),
        col("support_a"), col("support_b"),
        (col("support_ab").cast("double") / col("support_a"))
          .as("confidence"),
        ((col("support_ab") * col("n_orders")).cast("double") /
          (col("support_a") * col("support_b")).cast("double")).as("lift"))
      .orderBy(col("support_ab").desc, col("part_a").asc, col("part_b").asc)
      .limit(100)
  }

  val q138Oracle: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |), n AS (
      |  SELECT count(DISTINCT l_orderkey) AS n_orders FROM items
      |), singles AS (
      |  SELECT l_partkey, count(*) AS support FROM items GROUP BY 1
      |), pairs AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
      |    count(*) AS support_ab
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |)
      |SELECT p.part_a, p.part_b, p.support_ab,
      |  sa.support AS support_a, sb.support AS support_b,
      |  CAST(p.support_ab AS DOUBLE) / sa.support AS confidence,
      |  CAST(p.support_ab * n.n_orders AS DOUBLE)
      |    / CAST(sa.support * sb.support AS DOUBLE) AS lift
      |FROM pairs p
      |JOIN singles sa ON sa.l_partkey = p.part_a
      |JOIN singles sb ON sb.l_partkey = p.part_b
      |CROSS JOIN n
      |ORDER BY p.support_ab DESC, p.part_a ASC, p.part_b ASC LIMIT 100""".stripMargin

  /** q161: shipping-priority top-k — the TPC-H Q3 plan shape, the
    * canonical "selective dimension filter × two date range filters ×
    * 3-way join × grouped revenue × global top-k" OLAP query: revenue
    * still unshipped as of the cutoff for one market segment, highest
    * 10 orders first.
    *
    * Exactness: revenue = Σ extendedprice·(1 − discount) accumulates
    * as integer 10⁻⁴-dollar units (cents × percent — the q90/q133
    * integer formulation) in Decimal(38,0)/HUGEINT; ties on revenue
    * break by order key, so the LIMIT is deterministic.
    *
    * Plan: the segment filter reaches the customer scan and the date
    * filters reach both fact scans as pushed parquet predicates;
    * customer (filtered, dimension-sized) broadcasts into orders,
    * the orders→lineitem join shuffles on the key both sides already
    * group by, and the global top-10 is a TakeOrdered over the
    * aggregate — never a full sort of the fact. */
  val Q161Segment = "BUILDING"
  val Q161Cutoff = "1997-07-01"

  def q161ShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === Q161Segment)
      .select(col("c_custkey"))
    val ord = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit(Q161Cutoff).cast("date"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit(Q161Cutoff).cast("date"))
      .select(col("l_orderkey"),
        (Exact.units(col("l_extendedprice"), 2) *
          (lit(100L) - Exact.units(col("l_discount"), 2)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("rev_u4"))
    ord.join(cust, col("o_custkey") === col("c_custkey")) // SF-growing: no hint
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(col("rev_u4")).as("rev"), count(lit(1)).as("n_items"))
      .select(col("l_orderkey"), to_date(col("o_orderdate")).as("order_date"),
        col("rev").cast("long").as("revenue_u4"), col("n_items"))
      .orderBy(col("revenue_u4").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val q161Oracle: String =
    s"""SELECT l.l_orderkey,
       |  CAST(o.o_orderdate AS DATE) AS order_date,
       |  CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS HUGEINT) *
       |    (100 - CAST(round(l.l_discount * 100.0) AS BIGINT)))
       |    AS BIGINT) AS revenue_u4,
       |  count(*) AS n_items
       |FROM customer c
       |JOIN orders o ON o.o_custkey = c.c_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |WHERE c.c_mktsegment = '$Q161Segment'
       |  AND o.o_orderdate < TIMESTAMP '$Q161Cutoff 00:00:00'
       |  AND l.l_shipdate > TIMESTAMP '$Q161Cutoff 00:00:00'
       |GROUP BY 1, 2
       |ORDER BY revenue_u4 DESC, l.l_orderkey ASC LIMIT 10""".stripMargin

  /** q166: large-volume customers — the TPC-H Q18 plan shape: an
    * aggregate-with-HAVING over the fact derives a key set that
    * SEMI-joins back to restrict a multi-way dimension join. The
    * HAVING aggregate and the re-join both key on the order key, so
    * Catalyst reuses one exchange for the groupBy and the join, and
    * the qualifying key set (a few hundred orders) broadcasts into
    * the dimension chain rather than shuffling it.
    *
    * Quantity is a fixed-point(2) column — summed in integer
    * centi-units (the Exact discipline) and emitted scaled, so the
    * HAVING threshold and the output hash are engine-exact. */
  val Q166MinQtyCenti = 15000L // HAVING sum(l_quantity) > 150.00

  def q166BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), Exact.units(col("l_quantity"), 2).as("qc"))
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("qc")).as("qty_centi"))
      .filter(col("qty_centi") > Q166MinQtyCenti)
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        Exact.units(col("o_totalprice"), 2).as("price_cents"))
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
    ord.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey")) // SF-growing: no hint
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        col("price_cents"), col("qty_centi"))
  }

  val q166Oracle: String =
    s"""WITH big AS (
       |  SELECT l_orderkey,
       |    CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT)
       |      AS qty_centi
       |  FROM lineitem GROUP BY 1
       |  HAVING sum(CAST(round(l_quantity * 100.0) AS BIGINT))
       |    > $Q166MinQtyCenti
       |)
       |SELECT c.c_name, c.c_custkey, o.o_orderkey,
       |  CAST(o.o_orderdate AS DATE) AS order_date,
       |  CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS price_cents,
       |  big.qty_centi
       |FROM orders o
       |JOIN big ON big.l_orderkey = o.o_orderkey
       |JOIN customer c ON c.c_custkey = o.o_custkey""".stripMargin

  /** q167: local-supplier volume — the TPC-H Q5 plan shape and the
    * only CYCLIC join graph in the registry: lineitem joins orders
    * (key), orders joins customer (key), lineitem joins supplier
    * (key), and the cycle closes with the co-location predicate
    * c_nationkey = s_nationkey — revenue only counts when the
    * customer bought from a supplier of their own nation. Region
    * filter via two broadcast dimension hops (nation → region).
    *
    * Plan: the fact chain shuffles on its join keys once each;
    * customer and supplier are dimension-sized joins carrying the
    * nation keys; nation (25 rows, region-filtered) broadcasts; the
    * closing equality is a residual predicate on an already-keyed
    * join, not an extra shuffle. Revenue in exact 10⁻⁴-dollar units
    * (q161's integer formulation). */
  val Q167Region = "ASIA"

  def q167LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.load(spark, dir, "nation").as("n")
      .join(Tables.load(spark, dir, "region").as("r"),
        col("n.n_regionkey") === col("r.r_regionkey"))
      .filter(col("r.r_name") === Q167Region)
      .select(col("n.n_nationkey").as("nk"), col("n.n_name").as("nation"))
    val cust = Tables.load(spark, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("nk"))
      .select(col("c_custkey"), col("c_nationkey"), col("nation"))
    val supp = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (Exact.units(col("l_extendedprice"), 2) *
          (lit(100L) - Exact.units(col("l_discount"), 2)))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("rev_u4"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      // no broadcast hint: supplier grows with SF and outgrows a
      // broadcast at 100 TB (the q138 argument); size stats / AQE
      // convert this equi-join to a broadcast while it actually fits
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("nation"))
      .agg(sum(col("rev_u4")).as("rev"), count(lit(1)).as("n_lines"))
      .select(col("nation"), col("rev").cast("long").as("revenue_u4"),
        col("n_lines"))
  }

  /** q186: basket diversity per market segment — how concentrated is
    * each customer segment's purchasing across part types? Per order,
    * the Gini–Simpson diversity 1 − Σc_t²/n² of its part-type
    * composition (exact rational: diversity_num = n² − Σc_t², over
    * denominator n²); per segment, the exactly-weighted average
    * Σ(n²·div_o)/Σn² ... kept as Σ diversity_num / Σ n² so the ppm
    * output is ONE integer division of two exact sums.
    *
    * Plan: lineitem joins part for the type (no fixed hint — part
    * grows with SF), one aggregate to (order, type) counts, one to
    * per-order Σc², the orders⋈customer hop attaches the segment, and
    * a |segments|-row aggregate finishes. All shuffles key-partitioned
    * fact-scale maps; nothing order-dependent. */
  def q186BasketDiversity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val part = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_type"))
    val perType = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"), col("p_type"))
      .agg(count(lit(1)).as("c_t"))
    val perOrder = perType.groupBy(col("l_orderkey"))
      .agg(sum(col("c_t")).as("n"),
        sum(col("c_t") * col("c_t")).as("sum_sq"),
        count(lit(1)).as("n_types"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    perOrder
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("n_types")).as("type_slots"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n - sum_sq"))
          .as("div_num"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("div_den"))
      .select(col("c_mktsegment"), col("n_orders"),
        col("type_slots"),
        expr("CAST((div_num * 1000000) div div_den AS BIGINT)")
          .as("diversity_ppm"))
  }

  val q186Oracle: String =
    """WITH per_type AS (
      |  SELECT l.l_orderkey, p.p_type, count(*) AS c_t
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2
      |), per_order AS (
      |  SELECT l_orderkey, sum(c_t) AS n, sum(c_t * c_t) AS sum_sq,
      |    count(*) AS n_types
      |  FROM per_type GROUP BY 1
      |)
      |SELECT c.c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(po.n_types) AS BIGINT) AS type_slots,
      |  CAST((sum(CAST(po.n AS HUGEINT) * po.n - po.sum_sq) * 1000000)
      |    // sum(CAST(po.n AS HUGEINT) * po.n) AS BIGINT)
      |    AS diversity_ppm
      |FROM per_order po
      |JOIN orders o ON po.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1""".stripMargin

  val q167Oracle: String =
    s"""SELECT n.n_name AS nation,
       |  CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS HUGEINT) *
       |    (100 - CAST(round(l.l_discount * 100.0) AS BIGINT)))
       |    AS BIGINT) AS revenue_u4,
       |  count(*) AS n_lines
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  AND c.c_nationkey = s.s_nationkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |WHERE r.r_name = '$Q167Region'
       |GROUP BY 1""".stripMargin
}
