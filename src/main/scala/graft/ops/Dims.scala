package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's silver-layer dimension shapes re-expressed over the
  * test star schema. Dimension lookups are broadcast (the reference's
  * stream-static asymmetry, silver_layer_production.py:15-17): the big
  * side never shuffles, which is the only join plan that survives a
  * 1000-executor fact scan.
  */
object Dims {

  /** `dim_product` shape (silver_layer_production.py:20-58): left-join
    * chain through two lookup dims + per-column coalesce defaults
    * ("Missing" vs "-" tokens preserved deliberately, SURVEY.md §7.3) +
    * casts + snake_case rename contract. */
  def q3DimSupplier(spark: SparkSession, dir: String): DataFrame =
    dimSupplier(Tables.load(spark, dir, "supplier"),
      Tables.load(spark, dir, "nation"), Tables.load(spark, dir, "region"))

  def dimSupplier(supplier: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val sup = supplier.as("s")
    val nat = nation.as("n")
    val reg = region.as("r")
    sup
      .join(broadcast(nat), col("s.s_nationkey") === col("n.n_nationkey"), "left")
      .join(broadcast(reg), col("n.n_regionkey") === col("r.r_regionkey"), "left")
      .select(
        col("s.s_suppkey").as("supplier_id"),
        trim(col("s.s_name")).as("supplier_name"),
        coalesce(col("n.n_name"), lit("Missing")).as("nation_name"),
        coalesce(col("r.r_name"), lit("Missing")).as("region_name"),
        coalesce(col("n.n_nationkey").cast("string"), lit("-")).as("nation_code"),
        col("s.s_acctbal").as("account_balance"),
        (col("s.s_acctbal") >= 0.0).as("in_good_standing"))
  }

  val q3Oracle: String =
    """SELECT s.s_suppkey AS supplier_id,
      |  trim(s.s_name) AS supplier_name,
      |  coalesce(n.n_name, 'Missing') AS nation_name,
      |  coalesce(r.r_name, 'Missing') AS region_name,
      |  coalesce(CAST(n.n_nationkey AS VARCHAR), '-') AS nation_code,
      |  s.s_acctbal AS account_balance,
      |  s.s_acctbal >= 0.0 AS in_good_standing
      |FROM supplier s
      |LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin

  /** `dim_customer` shape (sales_aw_silver_layer_dim_customer.py:14-47):
    * not-null FK guard → inner join → whitespace-normalized display name
    * (concat_ws + regexp_replace + trim, the "refactored for Spark SQL
    * performance" pattern at :21-28) → multi-branch categorical decode →
    * `greatest` → surrogate key concat. */
  def q4DimCustomer(spark: SparkSession, dir: String): DataFrame =
    dimCustomer(Tables.load(spark, dir, "customer"), Tables.load(spark, dir, "nation"))

  def dimCustomer(customer: DataFrame, nation: DataFrame): DataFrame = {
    val cust = customer.as("c")
    val nat = nation.as("n")
    cust
      .filter(col("c.c_nationkey").isNotNull)
      .join(broadcast(nat), col("c.c_nationkey") === col("n.n_nationkey"), "inner")
      .select(
        col("c.c_custkey").as("customer_id"),
        concat(col("c.c_custkey").cast("string"), lit("_"),
          col("n.n_nationkey").cast("string")).as("customer_nation_key"),
        trim(regexp_replace(
          concat_ws(" ", col("c.c_name"), col("n.n_name")),
          "\\s+", " ")).as("display_name"),
        when(col("c.c_mktsegment") === "AUTOMOBILE", "Automotive Buyer")
          .when(col("c.c_mktsegment") === "BUILDING", "Construction Buyer")
          .when(col("c.c_mktsegment") === "FURNITURE", "Furniture Buyer")
          .when(col("c.c_mktsegment") === "HOUSEHOLD", "Household Buyer")
          .when(col("c.c_mktsegment") === "MACHINERY", "Machinery Buyer")
          .otherwise("Unknown").as("segment_desc"),
        greatest(col("c.c_acctbal"), lit(0.0)).as("effective_balance"),
        col("n.n_name").as("nation_name"))
  }

  val q4Oracle: String =
    """SELECT c.c_custkey AS customer_id,
      |  CAST(c.c_custkey AS VARCHAR) || '_' || CAST(n.n_nationkey AS VARCHAR) AS customer_nation_key,
      |  trim(regexp_replace(concat_ws(' ', c.c_name, n.n_name), '\s+', ' ', 'g')) AS display_name,
      |  CASE c.c_mktsegment
      |    WHEN 'AUTOMOBILE' THEN 'Automotive Buyer'
      |    WHEN 'BUILDING' THEN 'Construction Buyer'
      |    WHEN 'FURNITURE' THEN 'Furniture Buyer'
      |    WHEN 'HOUSEHOLD' THEN 'Household Buyer'
      |    WHEN 'MACHINERY' THEN 'Machinery Buyer'
      |    ELSE 'Unknown' END AS segment_desc,
      |  greatest(c.c_acctbal, 0.0) AS effective_balance,
      |  n.n_name AS nation_name
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE c.c_nationkey IS NOT NULL""".stripMargin

  /** `fact_sales` shape (sales_aw_silver_layer_fact_sales.py:32-69): the
    * detail⟕header⟕dim chain with a wide typed projection: surrogate key
    * concat, to_date on the order timestamp, row-level revenue arithmetic
    * (deterministic per-row FP — safe to hash-compare unrounded). */
  def q5FactOrders(spark: SparkSession, dir: String): DataFrame =
    factOrders(Tables.load(spark, dir, "lineitem"),
      Tables.load(spark, dir, "orders"), Tables.load(spark, dir, "customer"))

  def factOrders(lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame = {
    val li = lineitem.as("l")
    val ord = orders.as("o")
    val cust = customer.as("c")
    li
      .join(ord, col("l.l_orderkey") === col("o.o_orderkey"), "left")
      // customer: SF-growing — no fixed hint (auto-converts while it fits)
      .join(cust, col("o.o_custkey") === col("c.c_custkey"), "left")
      .select(
        concat(col("l.l_orderkey").cast("string"), lit("_"),
          col("l.l_linenumber").cast("string")).as("sales_key"),
        col("l.l_orderkey").as("order_id"),
        col("l.l_linenumber").as("line_number"),
        col("l.l_partkey").as("part_id"),
        to_date(col("o.o_orderdate")).as("order_date"),
        col("o.o_orderstatus").as("order_status"),
        col("c.c_mktsegment").as("customer_segment"),
        col("l.l_quantity").as("quantity"),
        col("l.l_extendedprice").as("extended_price"),
        (col("l.l_extendedprice") * (lit(1.0) - col("l.l_discount"))).as("net_revenue"),
        col("o.o_totalprice").as("order_total"))
  }

  /** `dim_geo` shape (silver_layer_person.py:22-41): surrogate key built
    * by string concat of the natural key and the postal column (:35 —
    * `concat(AddressID, '_', PostalCode)`), then the 2-dim left lookup
    * chain (address ⟕ state_province ⟕ country_region) with snake_case
    * rename. Testdata analog: customer ⟕ nation ⟕ region with
    * c_mktsegment standing in for the postal code. */
  def q38DimGeo(spark: SparkSession, dir: String): DataFrame =
    dimGeo(Tables.load(spark, dir, "customer"),
      Tables.load(spark, dir, "nation"), Tables.load(spark, dir, "region"))

  def dimGeo(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val cust = customer.as("c")
    val nat = nation.as("n")
    val reg = region.as("r")
    cust
      .join(broadcast(nat), col("c.c_nationkey") === col("n.n_nationkey"), "left")
      .join(broadcast(reg), col("n.n_regionkey") === col("r.r_regionkey"), "left")
      .select(
        concat(col("c.c_custkey").cast("string"), lit("_"),
          trim(col("c.c_mktsegment"))).as("geo_id"),
        trim(col("c.c_name")).as("address"),
        trim(col("c.c_mktsegment")).as("postal_code"),
        coalesce(col("n.n_name"), lit("Missing")).as("nation_name"),
        coalesce(col("r.r_name"), lit("Missing")).as("region_name"))
  }

  val q38Oracle: String =
    """SELECT CAST(c.c_custkey AS VARCHAR) || '_' || trim(c.c_mktsegment) AS geo_id,
      |  trim(c.c_name) AS address,
      |  trim(c.c_mktsegment) AS postal_code,
      |  coalesce(n.n_name, 'Missing') AS nation_name,
      |  coalesce(r.r_name, 'Missing') AS region_name
      |FROM customer c
      |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin

  /** `dim_store` shape (sales_aw_silver_layer_dim_store.py:24-39): the
    * not-null guard (:25), the ±2-minute interval LEFT join on the equi
    * key (:26-33), and the `greatest`-of-both-sides refresh timestamp
    * (:39). Batch analog over events: signup events ⟕ purchase events
    * by the same user within ±2 minutes. */
  def q39DimStore(spark: SparkSession, dir: String): DataFrame =
    dimStore(Tables.load(spark, dir, "events"))

  def dimStore(events: DataFrame): DataFrame = {
    val cust = events.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("signup_ts"))
      .filter(col("user_id").isNotNull)
      .as("c")
    val store = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .as("s")
    cust
      .join(store,
        col("c.user_id") === col("s.user_id") &&
          col("s.purchase_ts") >= col("c.signup_ts") - expr("interval 2 minutes") &&
          col("s.purchase_ts") <= col("c.signup_ts") + expr("interval 2 minutes"),
        "left_outer")
      .select(
        col("signup_id"), col("c.user_id").as("user_id"),
        col("purchase_id"), col("purchase_value"),
        greatest(col("signup_ts"),
          coalesce(col("purchase_ts"), col("signup_ts"))).as("last_refresh"))
  }

  val q39Oracle: String =
    """SELECT c.event_id AS signup_id,
      |  c.user_id AS user_id,
      |  s.event_id AS purchase_id,
      |  s.value AS purchase_value,
      |  greatest(c.ts, coalesce(s.ts, c.ts)) AS last_refresh
      |FROM (SELECT * FROM events WHERE event_type = 'signup' AND user_id IS NOT NULL) c
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') s
      |  ON c.user_id = s.user_id
      | AND s.ts >= c.ts - INTERVAL 2 MINUTE
      | AND s.ts <= c.ts + INTERVAL 2 MINUTE""".stripMargin

  val q5Oracle: String =
    """SELECT CAST(l.l_orderkey AS VARCHAR) || '_' || CAST(l.l_linenumber AS VARCHAR) AS sales_key,
      |  l.l_orderkey AS order_id,
      |  l.l_linenumber AS line_number,
      |  l.l_partkey AS part_id,
      |  CAST(o.o_orderdate AS DATE) AS order_date,
      |  o.o_orderstatus AS order_status,
      |  c.c_mktsegment AS customer_segment,
      |  l.l_quantity AS quantity,
      |  l.l_extendedprice AS extended_price,
      |  l.l_extendedprice * (1.0 - l.l_discount) AS net_revenue,
      |  o.o_totalprice AS order_total
      |FROM lineitem l
      |LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |LEFT JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin
}
