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
    * closure join handles catalog-sized data only. */
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
}
