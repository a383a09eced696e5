package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Classic decision-support shapes the reference's warehouse layer would
  * run over the sales star (reference: aw_gold_layer_sales notebooks build
  * exactly these aggregate/share/distribution reports over fact_sales —
  * aw_gold_layer_sales/src/notebook.ipynb). Each query is a canonical
  * TPC-H-derived plan shape the engine must keep efficient at 100 TB:
  * market share (Q8), promo share (Q14), top-supplier argmax (Q15),
  * customer order-count distribution (Q13), correlated small-quantity
  * revenue (Q17), disjunctive predicate pushdown (Q19), sole-supplier
  * attribution (Q21 flavor), and idle-rich-customer anti join (Q22).
  *
  * All money/quantity arithmetic is in exact integer units ([[Exact]]),
  * shares as ppm integer divisions, so every oracle hash-matches.
  */
object Classic {

  /** q168: national market share (TPC-H Q8 shape). Within AMERICA-region
    * customers' revenue, the ppm share supplied by NATION_1, per order
    * year. Two dimension hops (nation→region) broadcast onto customer;
    * supplier carries its nation key; the fact chain
    * lineitem⋈orders⋈customer shuffles once per key. The share is a
    * conditional sum over the SAME aggregated frame — numerator and
    * denominator in one pass, no second scan, no self-join. */
  val Q168Region = "AMERICA"
  val Q168SuppNation = "NATION_1"

  def q168MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val natAm = Tables.load(spark, dir, "nation").as("n")
      .join(Tables.load(spark, dir, "region").as("r"),
        col("n.n_regionkey") === col("r.r_regionkey"))
      .filter(col("r.r_name") === Q168Region)
      .select(col("n.n_nationkey").as("cust_nk"))
    val cust = Tables.load(spark, dir, "customer")
      .join(broadcast(natAm), col("c_nationkey") === col("cust_nk"))
      .select(col("c_custkey"))
    val suppNation = Tables.load(spark, dir, "nation")
      .filter(col("n_name") === Q168SuppNation)
      .select(col("n_nationkey").as("supp_nk"))
    // supplier grows with SF: no fixed hint, AQE converts while it fits
    val supp = Tables.load(spark, dir, "supplier")
      .join(broadcast(suppNation), col("s_nationkey") === col("supp_nk"),
        "left")
      .select(col("s_suppkey"), col("supp_nk").isNotNull.as("is_target"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (Exact.units(col("l_extendedprice"), 2) *
          (lit(100L) - Exact.units(col("l_discount"), 2)))
          .cast(DecimalType(38, 0)).as("rev_u4"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("is_target"), col("rev_u4")).otherwise(lit(0)))
          .as("nat_rev"),
        sum(col("rev_u4")).as("tot_rev"))
      .select(col("o_year"),
        col("nat_rev").cast("long").as("nation_rev_u4"),
        col("tot_rev").cast("long").as("total_rev_u4"),
        ((col("nat_rev") * 1000000L) / col("tot_rev"))
          .cast("long").as("share_ppm"))
  }

  val q168Oracle: String =
    s"""WITH am_cust AS (
       |  SELECT c_custkey FROM customer c
       |  JOIN nation n ON c.c_nationkey = n.n_nationkey
       |  JOIN region r ON n.n_regionkey = r.r_regionkey
       |  WHERE r.r_name = '$Q168Region'
       |), s AS (
       |  SELECT s_suppkey,
       |    s_nationkey = (SELECT n_nationkey FROM nation
       |                   WHERE n_name = '$Q168SuppNation') AS is_target
       |  FROM supplier
       |), a AS (
       |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       |    sum(CASE WHEN s.is_target THEN
       |      CAST(round(l.l_extendedprice * 100.0) AS HUGEINT) *
       |      (100 - CAST(round(l.l_discount * 100.0) AS BIGINT))
       |      ELSE 0 END) AS nat_rev,
       |    sum(CAST(round(l.l_extendedprice * 100.0) AS HUGEINT) *
       |      (100 - CAST(round(l.l_discount * 100.0) AS BIGINT))) AS tot_rev
       |  FROM lineitem l
       |  JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  JOIN am_cust ON o.o_custkey = am_cust.c_custkey
       |  JOIN s ON l.l_suppkey = s.s_suppkey
       |  GROUP BY 1
       |)
       |SELECT o_year, CAST(nat_rev AS BIGINT) AS nation_rev_u4,
       |  CAST(tot_rev AS BIGINT) AS total_rev_u4,
       |  CAST((nat_rev * 1000000) // tot_rev AS BIGINT) AS share_ppm
       |FROM a""".stripMargin

  /** q169: promo revenue share per ship month (TPC-H Q14 shape). The
    * part catalog join carries only a boolean (is the part PROMO), so
    * the join payload is minimal; numerator and denominator come out of
    * ONE grouped pass via conditional aggregation. part has no fixed
    * broadcast hint — it grows with SF (q138's argument); AQE converts
    * the equi-join while the pruned two-column projection fits. */
  def q169PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
        (Exact.units(col("l_extendedprice"), 2) *
          (lit(100L) - Exact.units(col("l_discount"), 2)))
          .cast(DecimalType(38, 0)).as("rev_u4"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("ship_month"))
      .agg(
        sum(when(col("is_promo"), col("rev_u4")).otherwise(lit(0)))
          .as("promo_rev"),
        sum(col("rev_u4")).as("tot_rev"))
      .select(col("ship_month"),
        col("promo_rev").cast("long").as("promo_rev_u4"),
        col("tot_rev").cast("long").as("total_rev_u4"),
        ((col("promo_rev") * 1000000L) / col("tot_rev"))
          .cast("long").as("promo_ppm"))
  }

  val q169Oracle: String =
    """WITH a AS (
      |  SELECT strftime(l.l_shipdate, '%Y-%m') AS ship_month,
      |    sum(CASE WHEN p.p_type = 'PROMO' THEN
      |      CAST(round(l.l_extendedprice * 100.0) AS HUGEINT) *
      |      (100 - CAST(round(l.l_discount * 100.0) AS BIGINT))
      |      ELSE 0 END) AS promo_rev,
      |    sum(CAST(round(l.l_extendedprice * 100.0) AS HUGEINT) *
      |      (100 - CAST(round(l.l_discount * 100.0) AS BIGINT))) AS tot_rev
      |  FROM lineitem l
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1
      |)
      |SELECT ship_month, CAST(promo_rev AS BIGINT) AS promo_rev_u4,
      |  CAST(tot_rev AS BIGINT) AS total_rev_u4,
      |  CAST((promo_rev * 1000000) // tot_rev AS BIGINT) AS promo_ppm
      |FROM a""".stripMargin

  /** q170: top supplier(s) by revenue in a quarter (TPC-H Q15 shape).
    * The per-supplier revenue aggregate is supplier-count-sized; the
    * argmax is a scalar-subquery max over THAT aggregate joined back —
    * never a global sort, and ties surface as multiple rows exactly as
    * Q15 specifies. The quarter filter prunes the fact scan before the
    * shuffle (PushedFilters on l_shipdate). */
  val Q170From = "1997-01-01"
  val Q170To = "1997-04-01"

  def q170TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(Q170From) &&
        col("l_shipdate") < lit(Q170To))
      .select(col("l_suppkey"),
        (Exact.units(col("l_extendedprice"), 2) *
          (lit(100L) - Exact.units(col("l_discount"), 2)))
          .cast(DecimalType(38, 0)).as("rev_u4"))
    val rev = li.groupBy(col("l_suppkey"))
      .agg(sum(col("rev_u4")).cast("long").as("total_rev_u4"))
    val top = rev.agg(max(col("total_rev_u4")).as("max_rev"))
    val supp = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
    rev.join(broadcast(top), col("total_rev_u4") === col("max_rev"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_u4"))
  }

  val q170Oracle: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    CAST(sum(CAST(round(l_extendedprice * 100.0) AS HUGEINT) *
       |      (100 - CAST(round(l_discount * 100.0) AS BIGINT)))
       |      AS BIGINT) AS total_rev_u4
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$Q170From'
       |    AND l_shipdate < TIMESTAMP '$Q170To'
       |  GROUP BY 1
       |)
       |SELECT s.s_suppkey, s.s_name, rev.total_rev_u4
       |FROM rev
       |JOIN supplier s ON rev.l_suppkey = s.s_suppkey
       |WHERE rev.total_rev_u4 = (SELECT max(total_rev_u4) FROM rev)""".stripMargin

  /** q171: customer order-count distribution (TPC-H Q13 shape). LEFT
    * join so zero-order customers land in the c_count=0 bucket; two
    * cascaded hash aggregates (orders per customer, then customers per
    * count) — the second input is customer-sized, the output is
    * distinct-count-sized. The left join shuffles both sides on
    * custkey once; no window, no sort. */
  def q171OrderCountDist(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer").select(col("c_custkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q171Oracle: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c
      |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |  GROUP BY 1
      |)
      |GROUP BY 1""".stripMargin

  /** q172: small-quantity revenue per brand (TPC-H Q17 shape). The
    * correlated per-part average-quantity subquery becomes a grouped
    * aggregate joined back onto the fact — one extra shuffle on
    * partkey, not a per-row subquery. The `qty < avg/2` comparison is
    * cross-multiplied into integer space (2·qty·n < Σqty) so no
    * division touches the predicate and the oracle is bit-exact. */
  def q172SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        Exact.units(col("l_quantity"), 2).as("qty_centi"),
        Exact.units(col("l_extendedprice"), 2).as("price_cents"))
    val avgQ = li.groupBy(col("l_partkey"))
      .agg(sum(col("qty_centi")).as("sum_qty"), count(lit(1)).as("n_li"))
      .select(col("l_partkey").as("ap_partkey"), col("sum_qty"),
        col("n_li"))
    val part = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    li.join(avgQ, col("l_partkey") === col("ap_partkey"))
      .filter(col("qty_centi") * 2 * col("n_li") < col("sum_qty"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(col("price_cents")).cast("long").as("rev_cents"),
        count(lit(1)).as("n_lines"))
  }

  val q172Oracle: String =
    """WITH li AS (
      |  SELECT l_partkey,
      |    CAST(round(l_quantity * 100.0) AS BIGINT) AS qty_centi,
      |    CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_cents
      |  FROM lineitem
      |), avg_q AS (
      |  SELECT l_partkey AS ap_partkey, sum(qty_centi) AS sum_qty,
      |    count(*) AS n_li
      |  FROM li GROUP BY 1
      |)
      |SELECT p.p_brand,
      |  CAST(sum(li.price_cents) AS BIGINT) AS rev_cents,
      |  count(*) AS n_lines
      |FROM li
      |JOIN avg_q ON li.l_partkey = avg_q.ap_partkey
      |JOIN part p ON li.l_partkey = p.p_partkey
      |WHERE li.qty_centi * 2 * avg_q.n_li < avg_q.sum_qty
      |GROUP BY 1""".stripMargin

  /** q173: disjunctive multi-band predicate revenue (TPC-H Q19 shape).
    * Three OR'd (brand, size-range, qty-range) bands. The brand/size
    * half of each band prunes the part catalog BEFORE the join (the
    * scan reads only matching parts); the residual qty half evaluates
    * post-join. One row out: the predicate-pushdown stress test. */
  def q173DisjunctiveBands(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50)))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        Exact.units(col("l_quantity"), 0).as("qty"),
        (Exact.units(col("l_extendedprice"), 2) *
          (lit(100L) - Exact.units(col("l_discount"), 2)))
          .cast(DecimalType(38, 0)).as("rev_u4"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("qty").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("qty").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("qty").between(20, 50)))
      .agg(sum(col("rev_u4")).cast("long").as("revenue_u4"),
        count(lit(1)).as("n_lines"))
  }

  val q173Oracle: String =
    """SELECT
      |  CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS HUGEINT) *
      |    (100 - CAST(round(l.l_discount * 100.0) AS BIGINT)))
      |    AS BIGINT) AS revenue_u4,
      |  count(*) AS n_lines
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE
      |  (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
      |    AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 1 AND 20)
      |  OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
      |    AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 10 AND 30)
      |  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
      |    AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 20 AND 50)""".stripMargin

  /** q174: sole-supplier attribution (TPC-H Q21 flavor without the
    * receipt/commit dates this schema lacks). Per order: line count and
    * distinct-supplier count in one grouped pass (min(supp) doubles as
    * the attribution key when distinct=1); multi-line single-supplier
    * orders credit that supplier. Two cascaded hash aggregates — the
    * anti-join-heavy original decorrelates to the same plan. */
  def q174SoleSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        min(col("l_suppkey")).as("the_supp"))
      .filter(col("n_lines") >= 2 && col("n_supp") === 1)
    val supp = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"))
    perOrder.groupBy(col("the_supp"))
      .agg(count(lit(1)).as("n_sole_orders"),
        sum(col("n_lines")).cast("long").as("n_lines_total"))
      .join(supp, col("the_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_sole_orders"),
        col("n_lines_total"))
  }

  val q174Oracle: String =
    """WITH per_order AS (
      |  SELECT l_orderkey, count(*) AS n_lines,
      |    count(DISTINCT l_suppkey) AS n_supp,
      |    min(l_suppkey) AS the_supp
      |  FROM lineitem GROUP BY 1
      |  HAVING count(*) >= 2 AND count(DISTINCT l_suppkey) = 1
      |)
      |SELECT s.s_suppkey, s.s_name,
      |  count(*) AS n_sole_orders,
      |  CAST(sum(n_lines) AS BIGINT) AS n_lines_total
      |FROM per_order
      |JOIN supplier s ON per_order.the_supp = s.s_suppkey
      |GROUP BY 1, 2""".stripMargin

  /** q175: idle rich customers (TPC-H Q22 shape). Customers whose
    * balance exceeds the positive-balance average and who have no
    * RECENT orders (none since [[Q175Cutoff]]), reported per market
    * segment. The global average is a 1-row broadcast; the no-recent-
    * orders condition is a LEFT ANTI join on custkey (the decorrelated
    * NOT EXISTS) whose right side is date-pruned at the scan; the
    * threshold comparison is cross-multiplied into cents·count integer
    * space — no division in the predicate. */
  val Q175Cutoff = "2000-01-01"

  def q175IdleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        Exact.units(col("c_acctbal"), 2).as("bal_cents"))
    val posAvg = cust.filter(col("bal_cents") > 0)
      .agg(sum(col("bal_cents")).as("sum_pos"), count(lit(1)).as("n_pos"))
    val recent = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(Q175Cutoff))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(posAvg))
      .filter(col("bal_cents") * col("n_pos") > col("sum_pos"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("bal_cents")).cast("long").as("bal_cents_total"))
  }

  val q175Oracle: String =
    s"""WITH cust AS (
       |  SELECT c_custkey, c_mktsegment,
       |    CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal_cents
       |  FROM customer
       |), pos AS (
       |  SELECT sum(bal_cents) AS sum_pos, count(*) AS n_pos
       |  FROM cust WHERE bal_cents > 0
       |)
       |SELECT c.c_mktsegment, count(*) AS n_cust,
       |  CAST(sum(c.bal_cents) AS BIGINT) AS bal_cents_total
       |FROM cust c CROSS JOIN pos
       |WHERE c.bal_cents * pos.n_pos > pos.sum_pos
       |  AND NOT EXISTS (SELECT 1 FROM orders o
       |                  WHERE o.o_custkey = c.c_custkey
       |                    AND o.o_orderdate >= TIMESTAMP '$Q175Cutoff')
       |GROUP BY 1""".stripMargin

  /** q207: part value concentration (TPC-H Q11 shape). Revenue per part
    * over the whole fact table, keeping only parts whose value exceeds
    * 1/2000 of the global total — the "important stock" HAVING-over-
    * scalar-subquery pattern. The global total is re-aggregated from the
    * per-part frame (|parts| rows), NOT a second fact scan, and joins
    * back as a broadcast single row; at 100 TB the fact table is read
    * exactly once and shuffles once on l_partkey. */
  def q207PartValueShare(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        (Exact.units(col("l_extendedprice"), 2) *
          (lit(100L) - Exact.units(col("l_discount"), 2)))
          .cast(DecimalType(38, 0)).as("rev_u4"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("rev_u4")).as("value_u4"))
    val total = perPart.agg(sum(col("value_u4")).as("total_u4"))
    perPart.crossJoin(broadcast(total))
      .filter(col("value_u4") * 2000L > col("total_u4"))
      .select(col("l_partkey").as("p_partkey"),
        col("value_u4").cast("long").as("value_u4"),
        expr("value_u4 * 1000000 div total_u4").as("share_ppm"))
  }

  val q207Oracle: String =
    """WITH per_part AS (
      |  SELECT l_partkey,
      |    sum(CAST(round(l_extendedprice * 100.0) AS HUGEINT) *
      |        (100 - CAST(round(l_discount * 100.0) AS BIGINT))) AS value_u4
      |  FROM lineitem GROUP BY 1
      |), tot AS (SELECT sum(value_u4) AS total_u4 FROM per_part)
      |SELECT l_partkey AS p_partkey, CAST(value_u4 AS BIGINT) AS value_u4,
      |  CAST((value_u4 * 1000000) // total_u4 AS BIGINT) AS share_ppm
      |FROM per_part CROSS JOIN tot
      |WHERE value_u4 * 2000 > total_u4""".stripMargin

  /** q208: supplier diversity per part profile (TPC-H Q16 shape).
    * How many distinct suppliers ship parts of each (brand, type, size)
    * profile — excluding one brand, the PROMO type, and "complaint"
    * suppliers (negative account balance, the comment-LIKE analogue).
    * The complaint list is an anti join with no broadcast hint (supplier
    * grows with SF; AQE converts while it fits); the distinct is a
    * (brand,type,size,suppkey) hash aggregate — partial distinct
    * map-side, never a global sort. */
  def q208SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val complaint = Tables.load(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey"))
    Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(complaint, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(part, col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
      .distinct()
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count(lit(1)).as("supplier_cnt"))
  }

  val q208Oracle: String =
    """SELECT p.p_brand, p.p_type, p.p_size,
      |  count(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      |  AND l.l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  /** q209: minimum-cost supplier per part (TPC-H Q2 shape). For LARGE
    * parts of size >= 40, the cheapest observed line price from a
    * EUROPE supplier, and WHICH supplier (lowest suppkey among ties) —
    * the correlated-min argmin join. Two aggregates over the SAME
    * pre-joined candidate frame (persist-free: Catalyst reuses the
    * exchange under AQE): min cost per part, then min suppkey at that
    * cost. Cost is exact cents so the tie set is well-defined; every
    * join key is an equi-key (partkey / suppkey) — no theta join. */
  val Q209Region = "EUROPE"

  def q209MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val euroNat = Tables.load(spark, dir, "nation").as("n")
      .join(Tables.load(spark, dir, "region").as("r"),
        col("n.n_regionkey") === col("r.r_regionkey"))
      .filter(col("r.r_name") === Q209Region)
      .select(col("n.n_nationkey").as("nk"), col("n.n_name"))
    val supp = Tables.load(spark, dir, "supplier")
      .join(broadcast(euroNat), col("s_nationkey") === col("nk"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val part = Tables.load(spark, dir, "part")
      .filter(col("p_type") === "LARGE" && col("p_size") >= 40)
      .select(col("p_partkey"))
    val cand = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        Exact.units(col("l_extendedprice"), 2).as("cost_u2"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
    val minCost = cand.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("cost_u2")).as("min_cost_u2"))
    cand.join(minCost,
        col("p_partkey") === col("mk") && col("cost_u2") === col("min_cost_u2"))
      .groupBy(col("p_partkey"), col("min_cost_u2"))
      .agg(min(col("s_suppkey")).as("s_suppkey"))
      .join(supp.select(col("s_suppkey").as("sk"), col("s_name"), col("n_name")),
        col("s_suppkey") === col("sk"))
      .select(col("p_partkey"), col("min_cost_u2"), col("s_suppkey"),
        col("s_name"), col("n_name"))
  }

  val q209Oracle: String =
    s"""WITH supp AS (
       |  SELECT s_suppkey, s_name, n.n_name
       |  FROM supplier s
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  JOIN region r ON n.n_regionkey = r.r_regionkey
       |  WHERE r.r_name = '$Q209Region'
       |), cand AS (
       |  SELECT l.l_partkey AS p_partkey, l.l_suppkey,
       |    CAST(round(l.l_extendedprice * 100.0) AS BIGINT) AS cost_u2
       |  FROM lineitem l
       |  JOIN part p ON l.l_partkey = p.p_partkey
       |  JOIN supp s ON l.l_suppkey = s.s_suppkey
       |  WHERE p.p_type = 'LARGE' AND p.p_size >= 40
       |), mc AS (
       |  SELECT p_partkey, min(cost_u2) AS min_cost_u2
       |  FROM cand GROUP BY 1
       |), pick AS (
       |  SELECT c.p_partkey, c.cost_u2 AS min_cost_u2,
       |    min(c.l_suppkey) AS s_suppkey
       |  FROM cand c JOIN mc ON c.p_partkey = mc.p_partkey
       |    AND c.cost_u2 = mc.min_cost_u2
       |  GROUP BY 1, 2
       |)
       |SELECT pick.p_partkey, pick.min_cost_u2, pick.s_suppkey,
       |  s.s_name, s.n_name
       |FROM pick JOIN supp s ON pick.s_suppkey = s.s_suppkey""".stripMargin

  /** q210: fresh-demand parts and who supplies them (TPC-H Q20 shape).
    * Parts whose year-2000 shipped quantity exceeds 25% of their
    * all-time shipped quantity (both exact integer units from ONE
    * grouped pass with a conditional sum — not two scans), then each
    * supplier shipping those parts in 2000 with how many such parts it
    * carries and its nation. The nested-IN chain becomes two hash
    * semi-joins; quantities never leave integer space so the 25%
    * threshold is an exact cross-multiplication. */
  def q210ExcessParts(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        Exact.units(col("l_quantity"), 0).as("qty"),
        (year(col("l_shipdate")) === 2000).as("in_2000"))
    val fresh = li
      .groupBy(col("l_partkey"))
      .agg(sum(when(col("in_2000"), col("qty")).otherwise(lit(0L))).as("q2000"),
        sum(col("qty")).as("qall"))
      .filter(col("q2000") * 4L > col("qall"))
      .select(col("l_partkey").as("fresh_pk"))
    val natSupp = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")
          .select(col("n_nationkey").as("nk"), col("n_name"))),
        col("s_nationkey") === col("nk"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    li.filter(col("in_2000"))
      .join(fresh, col("l_partkey") === col("fresh_pk"), "left_semi")
      .select(col("l_partkey"), col("l_suppkey"))
      .distinct()
      .join(natSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"), col("n_name"))
      .agg(count(lit(1)).as("n_fresh_parts"))
  }

  val q210Oracle: String =
    """WITH fresh AS (
      |  SELECT l_partkey
      |  FROM (SELECT l_partkey,
      |          sum(CASE WHEN year(l_shipdate) = 2000
      |              THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END) AS q2000,
      |          sum(CAST(round(l_quantity) AS BIGINT)) AS qall
      |        FROM lineitem GROUP BY 1)
      |  WHERE q2000 * 4 > qall
      |), ship AS (
      |  SELECT DISTINCT l_partkey, l_suppkey
      |  FROM lineitem
      |  WHERE year(l_shipdate) = 2000
      |    AND l_partkey IN (SELECT l_partkey FROM fresh)
      |)
      |SELECT s.s_suppkey, s.s_name, n.n_name, count(*) AS n_fresh_parts
      |FROM ship
      |JOIN supplier s ON ship.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY 1, 2, 3""".stripMargin

  /** q231: RFM segmentation — the canonical CRM/warehouse customer
    * scoring: per customer the Recency (last order day), Frequency
    * (order count) and Monetary (lifetime cents) metrics, each mapped
    * to its quintile 0–4 over the customer base, then the 125-cell
    * segment matrix with population and value totals (the "champions /
    * at-risk / hibernating" grid every retention report draws).
    *
    * Quintile protocol (deterministic, tie-stable): a customer's
    * quintile for metric v is ⌊cnt_lt(v)·5 / n⌋ where cnt_lt counts
    * customers with STRICTLY smaller v — all ties land in one
    * quintile, so the assignment is a pure function of the value
    * (partitioning-independent), and the oracle's `rank() − 1`
    * computes the identical number.
    *
    * Scale shape: the per-customer metric frame is one map-combined
    * aggregate of orders; each metric's cnt_lt comes from
    * [[Rank.globalPrefixSum]] over the DISTINCT-value frame (the
    * two-phase 256-bucket plan — no global window, no driver sort;
    * the q183 percentile discipline ×3). The quintile FUNCTION is then
    * fully determined by ≤4 boundary rows per metric — the smallest
    * value whose quintile reaches q, for q = 1..4 — so instead of
    * joining each quintile map back onto the customer frame by raw
    * metric value (three extra customer-frame shuffle joins), the
    * prefix frame is collapsed to ONE 4-value row per metric,
    * collected at build time (12 longs — the statistics-sized driver
    * collect globalPrefixSum already performs internally), and
    * quintiles are assigned as literal comparison sums in ONE
    * aggregation pass over `cust`: quintile(v) = #{q : v ≥ b_q},
    * exact because the quintile is nondecreasing in v and b_q is its
    * level-crossing point (ties all land with their value; a
    * mass-heavy value that skips a quintile simply yields
    * b_q = b_{q+1}, and the count still lands on the right level).
    * The final segment rollup is a ≤125-group aggregate. */
  /** q231's per-customer (Recency, Frequency, Monetary) metric frame —
    * shared with the streaming twin ([[graft.streaming.RfmStream]]),
    * whose final per-key state must equal this frame bit-for-bit
    * (EquivalenceSpec): one map-combined aggregate of orders. */
  def rfmMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        expr("unix_timestamp(o_orderdate) div 86400").as("r_day"),
        Exact.units(col("o_totalprice"), 2).as("cents"))
      .groupBy(col("o_custkey"))
      .agg(max(col("r_day")).as("r_day"), count(lit(1)).as("f_cnt"),
        sum(col("cents")).as("m_cents"))

  def q231RfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val cust = rfmMetrics(spark, dir).persist()
    // ONE pipeline for all three metrics (job count is the local cost:
    // three separate prefix pipelines pay 3× the scheduling floor):
    // unpivot cust to (metric, v), one grouped two-phase prefix sum,
    // one ≤3-row boundary collect — the statistics-sized driver
    // collect the Rank primitives already perform internally. n_cust
    // is collected first (one long; also materializes the persist).
    val nCust = cust.count()
    val metricNames = Seq("r_day", "f_cnt", "m_cents")
    val unpiv = cust.select(explode(array(metricNames.map(m =>
        struct(lit(m).as("metric"), col(m).as("v"))): _*)).as("mv"))
      .select(col("mv.metric").as("metric"), col("mv.v").as("v"))
    val pv = unpiv.groupBy(col("metric"), col("v"))
      .agg(count(lit(1)).as("_c"))
    val pre = Rank.groupPrefixSum(pv, Seq("metric"), "v", Nil, "_c", "_cum")
    val bndAggs = (1 to 4).map(q =>
      min(when(expr(s"((_cum - _c) * 5) div $nCust") >= q, col("v")))
        .as(s"b$q"))
    val bnd: Map[String, Seq[Option[Long]]] = pre.groupBy(col("metric"))
      .agg(bndAggs.head, bndAggs.tail: _*)
      .collect()
      .map(r => r.getString(0) ->
        (1 to 4).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))
      .toMap
    // quintile(v) = #{q : v ≥ b_q} as a literal comparison sum — exact
    // because the quintile is nondecreasing in v and b_q is its
    // level-crossing point; a missing boundary (metric with <5
    // occupied quintiles) contributes 0
    def quintile(metric: String): Column =
      bnd.getOrElse(metric, Seq.fill(4)(Option.empty[Long])).map {
        case Some(b) => when(col(metric) >= lit(b), 1L).otherwise(0L)
        case None => lit(0L)
      }.reduce(_ + _)
    cust
      .groupBy(quintile("r_day").as("r_day_q"),
        quintile("f_cnt").as("f_cnt_q"),
        quintile("m_cents").as("m_cents_q"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("m_cents")).as("segment_cents"))
      .select(col("r_day_q"), col("f_cnt_q"), col("m_cents_q"),
        col("n_customers"), col("segment_cents"))
  }

  /** q237: product-type profit by supplier nation and year (the TPC-H
    * Q9 plan shape, adapted to this star's tables: with no partsupp,
    * line cost is the catalog retail price × quantity — the same
    * 6-table join tree and the same exact-money discipline). Profit
    * per line = extendedprice·(100 − disc) − retailprice·qty, all in
    * u4 integer units (cents × centi-fraction); the part filter
    * (`p_name LIKE '%red%'`) is pushed to the part scan and the part
    * join prunes lineitem via the FK before the orders join.
    *
    * Scale shape: the canonical snowflake profit rollup — lineitem
    * joins part (filtered, broadcast-able at catalog scale), supplier
    * → nation (two broadcast hops), orders only for the date (FK
    * shuffle on orderkey). Group-by is |nations|×|years|. */
  def q237NationProfit(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(spark, dir, "part")
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), Exact.units(col("p_retailprice"), 2)
        .as("retail_cents"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (Exact.units(col("l_extendedprice"), 2) *
          (lit(100L) - Exact.units(col("l_discount"), 2)))
          .cast(DecimalType(38, 0)).as("rev_u4"),
        Exact.units(col("l_quantity"), 2).as("qty_centi"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).cast("long")
        .as("o_year"))
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      // supplier carries no hint (grows with the corpus — q138 rule);
      // nation is a fixed 25-row dimension, the hint stays
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("o_year"),
        (col("rev_u4") - (col("retail_cents") * col("qty_centi"))
          .cast(DecimalType(38, 0))).as("profit_u4"))
      .groupBy(col("nation"), col("o_year"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("profit_u4")).cast("long").as("profit_u4"))
  }

  val q237Oracle: String =
    """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT)
      |    AS o_year,
      |  count(*) AS n_lines,
      |  CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS HUGEINT)
      |      * (100 - CAST(round(l.l_discount * 100.0) AS BIGINT))
      |    - CAST(round(p.p_retailprice * 100.0) AS HUGEINT)
      |      * CAST(round(l.l_quantity * 100.0) AS BIGINT))
      |    AS BIGINT) AS profit_u4
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |GROUP BY 1, 2""".stripMargin

  val q231Oracle: String =
    """WITH c AS (
      |  SELECT o_custkey,
      |    max(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400) AS r_day,
      |    count(*) AS f_cnt,
      |    sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS m_cents
      |  FROM orders GROUP BY 1
      |), n AS (SELECT count(*) AS n_cust FROM c
      |), q AS (
      |  SELECT m_cents,
      |    ((rank() OVER (ORDER BY r_day) - 1) * 5) // n_cust AS r_day_q,
      |    ((rank() OVER (ORDER BY f_cnt) - 1) * 5) // n_cust AS f_cnt_q,
      |    ((rank() OVER (ORDER BY m_cents) - 1) * 5) // n_cust
      |      AS m_cents_q
      |  FROM c CROSS JOIN n
      |)
      |SELECT CAST(r_day_q AS BIGINT) AS r_day_q,
      |  CAST(f_cnt_q AS BIGINT) AS f_cnt_q,
      |  CAST(m_cents_q AS BIGINT) AS m_cents_q,
      |  count(*) AS n_customers,
      |  CAST(sum(m_cents) AS BIGINT) AS segment_cents
      |FROM q GROUP BY 1, 2, 3""".stripMargin
}
