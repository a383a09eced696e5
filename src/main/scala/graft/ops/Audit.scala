package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** q64: declarative data-quality audit (the Deequ-style check suite a
  * lakehouse runs before promoting a batch): per-table constraint
  * checks evaluated in ONE conditional-aggregation pass per table,
  * plus referential checks as anti-join counts and a key-uniqueness
  * check as a group-count. Output is the audit report — one row per
  * check with its violation count and pass flag.
  *
  * Scale shape: the per-table rule groups share a single scan each
  * (conditional sums, no per-rule passes); the orphan checks are the
  * only shuffles and broadcast their dimension side when it fits. A
  * 100 TB audit is therefore ~one pass over each fact table.
  */
object Audit {

  def q64QualityAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    val cust = Tables.load(spark, dir, "customer")

    def cnt(pred: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))

    // one scan for all lineitem rules, one for all customer rules
    val liChecks = li.agg(
      cnt(col("l_discount") > 0.08).as("lineitem_discount_gt_8pct"),
      cnt(col("l_quantity") <= 0).as("lineitem_nonpositive_qty"),
      cnt(col("l_extendedprice") <= 0).as("lineitem_nonpositive_price"))
    val custChecks = cust.agg(
      cnt(col("c_acctbal") < 0).as("customer_negative_balance"))
    val orderChecks = orders.agg(
      cnt(col("o_totalprice") <= 0).as("orders_nonpositive_total"))
    val dupPk = orders.groupBy(col("o_orderkey")).count()
      .filter(col("count") > 1)
      .agg(count(lit(1)).as("orders_pk_duplicates"))
    val liOrphan = li
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("lineitem_orphan_orders"))
    val custOrphan = orders
      .join(broadcast(cust.select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orders_orphan_customers"))

    // melt each rule-group frame ONCE (explode over its columns), so a
    // table's rules really do share a single scan in the physical plan
    // — selecting each rule column separately would re-run the agg per
    // rule
    def melt(f: DataFrame): DataFrame = {
      val names = f.columns.toSeq
      f.select(explode(array(names.map(n =>
        struct(lit(n).as("check_name"), col(n).cast("long").as("violations"))): _*))
        .as("kv"))
        .select(col("kv.check_name"), col("kv.violations"))
    }
    Seq(liChecks, custChecks, orderChecks, dupPk, liOrphan, custOrphan)
      .map(melt)
      .reduce(_ unionAll _)
      .withColumn("passed", col("violations") === 0L)
  }

  val q64Oracle: String =
    """WITH checks AS (
      |  SELECT 'lineitem_discount_gt_8pct' AS check_name,
      |    (SELECT count(*) FROM lineitem WHERE l_discount > 0.08) AS violations
      |  UNION ALL SELECT 'lineitem_nonpositive_qty',
      |    (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
      |  UNION ALL SELECT 'lineitem_nonpositive_price',
      |    (SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0)
      |  UNION ALL SELECT 'customer_negative_balance',
      |    (SELECT count(*) FROM customer WHERE c_acctbal < 0)
      |  UNION ALL SELECT 'orders_nonpositive_total',
      |    (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
      |  UNION ALL SELECT 'orders_pk_duplicates',
      |    (SELECT count(*) FROM (SELECT o_orderkey FROM orders
      |                           GROUP BY 1 HAVING count(*) > 1) d)
      |  UNION ALL SELECT 'lineitem_orphan_orders',
      |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL SELECT 'orders_orphan_customers',
      |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
      |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)))
      |SELECT check_name, CAST(violations AS BIGINT) AS violations,
      |  violations = 0 AS passed
      |FROM checks""".stripMargin
}
