package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-governance operators a lakehouse runs across the whole star
  * schema: right-to-be-forgotten impact analysis, functional-dependency
  * profiling, and privacy-preserving (randomized-response) counting.
  * The reference's silver layer carries exactly the PII-bearing
  * customer dimension these act on (reference:
  * aw_silver_layer_sales/src/aw_silver_layer_sales/transformations/
  * sales_aw_silver_layer_dim_customer.py:14-24 — name/contact columns
  * surviving into dim_customer), so deletion scoping and disclosure
  * control are first-class pipeline ops, not afterthoughts.
  *
  * All three are single-pass shapes: semi-join fan-out for the cascade,
  * one distinct-aggregate per FD candidate, one grouped conditional sum
  * for the noisy counts. Nothing collects; every count is exact
  * integer arithmetic so the DuckDB oracles hash-match.
  */
object Governance {

  /** Deterministic 1/16 erasure cohort: customers whose md5 hex starts
    * with '0'. md5 on both engines produces identical hex, so cohort
    * membership (not just its size) matches the oracle. */
  private def inCohort(key: Column): Column =
    substring(md5(concat(lit("gdpr_"), key.cast("string"))), 1, 1) === "0"

  /** q211: GDPR cascade-delete impact audit. For a deterministic 1/16
    * customer erasure cohort, the rows that a right-to-be-forgotten
    * batch would delete from every table reachable through the FK
    * graph: customer itself, their orders, those orders' lineitems,
    * and their event stream (events.user_id is the customer key). Per
    * table: rows to delete, table size, and the deletion share in ppm.
    *
    * Scale shape: the cohort is a filter on customer (no broadcast
    * hint — it grows with SF; AQE converts while it fits); orders and
    * events reach it through one semi-join each; lineitem cascades
    * through the affected-orders semi-join on its natural l_orderkey
    * shuffle key. Each fact table is scanned exactly once and only key
    * columns are read (column pruning reaches the parquet scan). */
  def q211DeleteCascade(spark: SparkSession, dir: String): DataFrame = {
    val cohort = Tables.load(spark, dir, "customer")
      .filter(inCohort(col("c_custkey")))
      .select(col("c_custkey").as("k"))
    val custAll = Tables.load(spark, dir, "customer").select(col("c_custkey"))
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val hitOrders = orders
      .join(cohort, col("o_custkey") === col("k"), "left_semi")
    val li = Tables.load(spark, dir, "lineitem").select(col("l_orderkey"))
    val hitLi = li.join(hitOrders.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    val ev = Tables.load(spark, dir, "events").select(col("user_id"))
    val hitEv = ev.join(cohort, col("user_id") === col("k"), "left_semi")

    def tally(name: String, hit: DataFrame, all: DataFrame): DataFrame =
      hit.agg(count(lit(1)).as("rows_to_delete"))
        .crossJoin(all.agg(count(lit(1)).as("total_rows")))
        .select(lit(name).as("table_name"), col("rows_to_delete"),
          col("total_rows"),
          expr("CAST(rows_to_delete AS DECIMAL(38,0)) * 1000000" +
            " div total_rows").as("share_ppm"))

    tally("customer", cohort, custAll)
      .unionByName(tally("orders", hitOrders, orders))
      .unionByName(tally("lineitem", hitLi, li))
      .unionByName(tally("events", hitEv, ev))
  }

  val q211Oracle: String =
    """WITH cohort AS (
      |  SELECT c_custkey AS k FROM customer
      |  WHERE substring(md5('gdpr_' || CAST(c_custkey AS VARCHAR)), 1, 1) = '0'
      |), hit_orders AS (
      |  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM cohort)
      |)
      |SELECT 'customer' AS table_name,
      |  (SELECT count(*) FROM cohort) AS rows_to_delete,
      |  (SELECT count(*) FROM customer) AS total_rows,
      |  (SELECT count(*) FROM cohort) * 1000000
      |    // (SELECT count(*) FROM customer) AS share_ppm
      |UNION ALL
      |SELECT 'orders',
      |  (SELECT count(*) FROM hit_orders),
      |  (SELECT count(*) FROM orders),
      |  (SELECT count(*) FROM hit_orders) * 1000000
      |    // (SELECT count(*) FROM orders)
      |UNION ALL
      |SELECT 'lineitem',
      |  (SELECT count(*) FROM lineitem
      |   WHERE l_orderkey IN (SELECT o_orderkey FROM hit_orders)),
      |  (SELECT count(*) FROM lineitem),
      |  (SELECT count(*) FROM lineitem
      |   WHERE l_orderkey IN (SELECT o_orderkey FROM hit_orders)) * 1000000
      |    // (SELECT count(*) FROM lineitem)
      |UNION ALL
      |SELECT 'events',
      |  (SELECT count(*) FROM events WHERE user_id IN (SELECT k FROM cohort)),
      |  (SELECT count(*) FROM events),
      |  (SELECT count(*) FROM events
      |   WHERE user_id IN (SELECT k FROM cohort)) * 1000000
      |    // (SELECT count(*) FROM events)""".stripMargin

  /** q212: functional-dependency profiling (the Deequ/metadata-driven
    * constraint-discovery shape). For six candidate FDs lhs → rhs
    * across the star, how many distinct lhs values exist and how many
    * of them map to MORE than one rhs value (violations). An exact FD
    * has zero violating keys; the ppm rate ranks near-FDs for schema
    * inference.
    *
    * Each candidate costs one hash aggregate on its lhs (partial
    * count-distinct map-side — rhs cardinality per key is what's
    * counted, never a sort), then a statistics-sized rollup. The six
    * branches are independent subtrees of one union — Spark schedules
    * them as parallel stages, and each table is scanned once with only
    * two columns read. */
  def q212FdProfile(spark: SparkSession, dir: String): DataFrame = {
    def fd(table: String, lhs: String, rhs: String): DataFrame =
      Tables.load(spark, dir, table)
        .groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("n_rhs"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("n_rhs") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(s"$table: $lhs -> $rhs").as("fd"),
          col("n_keys"), col("n_violating"),
          expr("CAST(n_violating AS DECIMAL(38,0)) * 1000000" +
            " div n_keys").as("violation_ppm"))

    fd("nation", "n_nationkey", "n_regionkey")
      .unionByName(fd("customer", "c_nationkey", "c_mktsegment"))
      .unionByName(fd("orders", "o_custkey", "o_orderpriority"))
      .unionByName(fd("lineitem", "l_orderkey", "l_returnflag"))
      .unionByName(fd("events", "user_id", "event_type"))
      .unionByName(fd("documents", "source", "lang"))
  }

  val q212Oracle: String = {
    def fd(table: String, lhs: String, rhs: String): String =
      s"""SELECT '$table: $lhs -> $rhs' AS fd,
         |  count(*) AS n_keys,
         |  CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violating,
         |  CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS violation_ppm
         |FROM (SELECT $lhs, count(DISTINCT $rhs) AS n_rhs
         |      FROM $table GROUP BY 1)""".stripMargin
    Seq(
      fd("nation", "n_nationkey", "n_regionkey"),
      fd("customer", "c_nationkey", "c_mktsegment"),
      fd("orders", "o_custkey", "o_orderpriority"),
      fd("lineitem", "l_orderkey", "l_returnflag"),
      fd("events", "user_id", "event_type"),
      fd("documents", "source", "lang"),
    ).mkString("\nUNION ALL\n")
  }

  /** q213: randomized-response private counting (Warner 1965 — the
    * local-DP mechanism). Each document reports whether it is English
    * truthfully with probability 1/2, otherwise reports a fair coin;
    * the per-source English count is then debiased from the noisy
    * tally: E[R] = t/2 + n/4, so t̂ = 2R − n/2 (kept as est_x2 =
    * 4R − n to stay in integer space). The per-record report gives
    * plausible deniability; only the aggregate is released.
    *
    * The "coins" are deterministic md5 bits keyed by doc_id so the
    * mechanism itself is testable: both engines flip identical coins,
    * making membership noise — not just its distribution — verifiable.
    * A production run would swap [[coin]] for a seeded PRF per release.
    * One grouped conditional-sum pass; no shuffle beyond the source
    * aggregation. err_x2 (debiased estimate minus 2× the true count)
    * is part of the output so estimator quality is itself a query. */
  private def coin(tag: String, key: Column): Column =
    substring(md5(concat(lit(tag), key.cast("string"))), 1, 1) <= "7"

  def q213RandomizedResponse(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"), (col("lang") === "en").as("truth"))
      .withColumn("reported",
        when(coin("rr1_", col("doc_id")), col("truth"))
          .otherwise(coin("rr2_", col("doc_id"))))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("truth"), 1L).otherwise(0L)).as("true_cnt"),
        sum(when(col("reported"), 1L).otherwise(0L)).as("reported_cnt"))
      .select(col("source"), col("n"), col("true_cnt"), col("reported_cnt"),
        (col("reported_cnt") * 4L - col("n")).as("est_x2"),
        (col("reported_cnt") * 4L - col("n") - col("true_cnt") * 2L)
          .as("err_x2"))
  }

  val q213Oracle: String =
    """WITH d AS (
      |  SELECT source, (lang = 'en') AS truth,
      |    CASE WHEN substring(md5('rr1_' || CAST(doc_id AS VARCHAR)), 1, 1) <= '7'
      |         THEN (lang = 'en')
      |         ELSE substring(md5('rr2_' || CAST(doc_id AS VARCHAR)), 1, 1) <= '7'
      |    END AS reported
      |  FROM documents
      |)
      |SELECT source, count(*) AS n,
      |  CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS true_cnt,
      |  CAST(sum(CASE WHEN reported THEN 1 ELSE 0 END) AS BIGINT)
      |    AS reported_cnt,
      |  CAST(sum(CASE WHEN reported THEN 1 ELSE 0 END) * 4 - count(*)
      |    AS BIGINT) AS est_x2,
      |  CAST(sum(CASE WHEN reported THEN 1 ELSE 0 END) * 4 - count(*)
      |    - sum(CASE WHEN truth THEN 1 ELSE 0 END) * 2 AS BIGINT) AS err_x2
      |FROM d GROUP BY 1""".stripMargin

  /** q223: k-anonymity audit (Sweeney 2002) — before releasing a
    * customer extract, how identifiable is each row by its
    * quasi-identifiers (nation, market segment, coarse balance
    * bucket)? For each k ∈ {2, 5, 10}: how many QI equivalence classes
    * fall below k members, how many rows those classes hold (= rows a
    * k-anonymous release must suppress or generalize), and the
    * suppression rate in ppm.
    *
    * One shuffle on the QI tuple builds the class-size table; the
    * class-size table is bounded by the QI domain (|nations| ×
    * |segments| × |balance buckets|), so the three k-threshold rollups
    * are statistics-sized aggregates — the corpus is scanned once no
    * matter how many k values are audited. */
  val Q223Ks: Seq[Int] = Seq(2, 5, 10)

  def q223KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val classes = Tables.load(spark, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("cls_n"))
    val total = classes.agg(sum(col("cls_n")).as("n_rows"))
    Q223Ks.map { k =>
      classes.crossJoin(broadcast(total))
        .agg(max(col("n_rows")).as("n_rows"),
          count(lit(1)).as("n_classes"),
          sum(when(col("cls_n") < k, 1L).otherwise(0L)).as("classes_below"),
          sum(when(col("cls_n") < k, col("cls_n")).otherwise(0L))
            .as("rows_suppressed"))
        .select(lit(k.toLong).as("k"), col("n_classes"),
          col("classes_below"), col("rows_suppressed"),
          expr("CAST(rows_suppressed AS DECIMAL(38,0)) * 1000000" +
            " div n_rows").as("suppressed_ppm"))
    }.reduce(_ unionByName _)
  }

  val q223Oracle: String = {
    def one(k: Int): String =
      s"""SELECT CAST($k AS BIGINT) AS k, count(*) AS n_classes,
         |  CAST(sum(CASE WHEN cls_n < $k THEN 1 ELSE 0 END) AS BIGINT)
         |    AS classes_below,
         |  CAST(sum(CASE WHEN cls_n < $k THEN cls_n ELSE 0 END) AS BIGINT)
         |    AS rows_suppressed,
         |  CAST(sum(CASE WHEN cls_n < $k THEN cls_n ELSE 0 END) * 1000000
         |    // sum(cls_n) AS BIGINT) AS suppressed_ppm
         |FROM (SELECT c_nationkey, c_mktsegment,
         |        CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
         |        count(*) AS cls_n
         |      FROM customer GROUP BY 1, 2, 3)""".stripMargin
    Q223Ks.map(one).mkString("\nUNION ALL\n")
  }

  /** q236: r×c mixture-independence audit — Pearson's χ² over the
    * source × language contingency table of the document corpus (the
    * generalization of q224's 2×2 test): a data-mixture bug that makes
    * language composition depend on source (a crawler that dropped
    * zh from one feed, a dedup pass that ate one source's French)
    * shows up as large cells here before it shows up in model evals.
    *
    * Exact protocol: per cell, the χ² contribution is
    * (obs·N − row·col)² · 10⁶ div (N · row · col) — one truncating
    * division per cell on pure integer counts (floored per cell, then
    * summed: a defined protocol both engines replay bit-for-bit; row
    * and col marginals are nonzero by construction since every
    * observed label has at least one row). Output: one row per cell
    * with observed count, expected count in milli-units, the cell's
    * ppm-scaled contribution, and the table-wide χ²_e6 + degrees of
    * freedom repeated for context.
    *
    * Scale shape: corpus → cells is one map-combined aggregate;
    * marginals re-aggregate the CELL frame (|sources|·|langs| rows),
    * never the corpus; the total is a broadcast cross join. */
  def q236MixtureIndependence(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.load(spark, dir, "documents")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("obs"))
      .persist()
    val rows = cells.groupBy(col("source")).agg(sum(col("obs")).as("row_n"))
    val cols = cells.groupBy(col("lang")).agg(sum(col("obs")).as("col_n"))
    val tot = cells.agg(sum(col("obs")).as("n"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"))
    val scored = cells
      .join(rows, Seq("source")).join(cols, Seq("lang"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("obs"),
        expr("row_n * col_n * 1000 div n").as("expected_milli"),
        expr("""CAST((CAST(obs AS DECIMAL(38,0)) * n - row_n * col_n)
               | * (CAST(obs AS DECIMAL(38,0)) * n - row_n * col_n)
               | * 1000000
               | div (CAST(n AS DECIMAL(38,0)) * row_n * col_n) AS BIGINT)
               |""".stripMargin).as("contrib_e6"),
        ((col("n_sources") - 1L) * (col("n_langs") - 1L)).as("dof"))
      .persist()
    val total = scored.agg(sum(col("contrib_e6")).as("chi2_e6"))
    scored.crossJoin(broadcast(total))
      .select(col("source"), col("lang"), col("obs"),
        col("expected_milli"), col("contrib_e6"), col("dof"),
        col("chi2_e6"))
  }

  val q236Oracle: String =
    """WITH cells AS (
      |  SELECT source, lang, count(*) AS obs FROM documents GROUP BY 1, 2
      |), r AS (SELECT source, CAST(sum(obs) AS BIGINT) AS row_n
      |         FROM cells GROUP BY 1
      |), c AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS col_n
      |         FROM cells GROUP BY 1
      |), t AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
      |    count(DISTINCT source) AS n_sources,
      |    count(DISTINCT lang) AS n_langs
      |  FROM cells
      |), scored AS (
      |  SELECT cells.source, cells.lang, CAST(obs AS BIGINT) AS obs,
      |    CAST(row_n * col_n * 1000 // n AS BIGINT) AS expected_milli,
      |    CAST(CAST(obs * n - row_n * col_n AS HUGEINT)
      |      * (obs * n - row_n * col_n) * 1000000
      |      // (CAST(n AS HUGEINT) * row_n * col_n) AS BIGINT)
      |      AS contrib_e6,
      |    CAST((n_sources - 1) * (n_langs - 1) AS BIGINT) AS dof
      |  FROM cells JOIN r USING (source) JOIN c USING (lang) CROSS JOIN t
      |)
      |SELECT source, lang, obs, expected_milli, contrib_e6, dof,
      |  (SELECT CAST(sum(contrib_e6) AS BIGINT) FROM scored) AS chi2_e6
      |FROM scored""".stripMargin

  /** q238: l-diversity audit (Machanavalli et al. 2007) — the attack
    * q223's k-anonymity misses: a QI class can hold k ≥ 10 members and
    * still leak if every member shares one SENSITIVE value (the
    * homogeneity attack — "all ten people in that class ordered
    * 1-URGENT" identifies nothing but reveals everything). Per QI
    * class of the released customer–orders extract (nation × segment ×
    * coarse balance bucket, q223's exact QI tuple), report: order
    * count, distinct-l over the sensitive order priority, the modal
    * priority's share in ppm (recursive-(c,l) screening), and the
    * distinct-l ≥ 3 release flag.
    *
    * Scale shape: one shuffle on (QI, sensitive) builds the cell
    * frame, bounded by |QI domain| × |priorities|, with the dimension
    * side broadcast into the fact join; the class rollup re-aggregates
    * CELLS, never orders. Exact integers end to end; the ppm share is
    * one truncating division. */
  def q238LDiversity(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_bucket"))
    // no broadcast hint on customer (grows with the corpus — q138 rule);
    // the optimizer broadcasts the 4-column projection while it fits
    val cells = Tables.load(spark, dir, "orders")
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"),
        col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
    cells.groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
      .agg(sum(col("cnt")).as("n_orders"),
        count(lit(1)).as("l_distinct"),
        max(col("cnt")).as("top_cnt"))
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        col("c_mktsegment"), col("bal_bucket"), col("n_orders"),
        col("l_distinct"),
        expr("CAST(top_cnt AS DECIMAL(38,0)) * 1000000 div n_orders")
          .cast("long").as("top_share_ppm"),
        (col("l_distinct") >= 3L).as("l_diverse"))
  }

  val q238Oracle: String =
    """WITH cells AS (
      |  SELECT c.c_nationkey, c.c_mktsegment,
      |    CAST(floor(c.c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
      |    o.o_orderpriority, count(*) AS cnt
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2, 3, 4
      |)
      |SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
      |  bal_bucket,
      |  CAST(sum(cnt) AS BIGINT) AS n_orders,
      |  count(*) AS l_distinct,
      |  CAST(CAST(max(cnt) AS HUGEINT) * 1000000 // sum(cnt) AS BIGINT)
      |    AS top_share_ppm,
      |  count(*) >= 3 AS l_diverse
      |FROM cells GROUP BY 1, 2, 3""".stripMargin
}
