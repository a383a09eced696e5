package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.Streams

/** Batch CDF apply: a deterministic change feed modeled from `orders`
  * (each order row = one change event for its customer key, the order
  * key as the monotone `_commit_version`, a status/key-derived
  * `_change_type` mix of inserts, updates, pre-images and deletes),
  * resolved to current state by [[Streams.scd1Apply]].
  *
  * This is the SQL-expressible twin of the streaming Scd1 operator:
  * per-key argmax on the version with delete suppression, so the
  * oracle can hash-check the full change-application semantics —
  * including keys whose latest change is a delete (absent from the
  * output) and pre-image rows (never applied).
  */
object ChangeFeed {

  def modeledChanges(orders: DataFrame): DataFrame =
    orders.select(
      col("o_custkey").as("customer_id"),
      col("o_orderkey").as("_commit_version"),
      when(col("o_orderkey") % 11 === 0, "delete")
        .when(col("o_orderstatus") === "O", "insert")
        .when(col("o_orderkey") % 13 === 0, "update_preimage")
        .otherwise("update_postimage").as("_change_type"),
      col("o_totalprice").as("total_due"),
      col("o_orderpriority").as("priority"))

  def q40CdfScd1(spark: SparkSession, dir: String): DataFrame =
    Streams.scd1Apply(modeledChanges(Tables.load(spark, dir, "orders")),
        keyCols = Seq("customer_id"))
      .select(col("customer_id"),
        col("_commit_version").as("last_version"),
        col("_change_type").as("last_change"),
        col("total_due"), col("priority"))

  val q40Oracle: String =
    """WITH changes AS (
      |  SELECT o_custkey AS customer_id, o_orderkey AS version,
      |    CASE WHEN o_orderkey % 11 = 0 THEN 'delete'
      |         WHEN o_orderstatus = 'O' THEN 'insert'
      |         WHEN o_orderkey % 13 = 0 THEN 'update_preimage'
      |         ELSE 'update_postimage' END AS change_type,
      |    o_totalprice AS total_due, o_orderpriority AS priority
      |  FROM orders
      |), resolved AS (
      |  SELECT *, row_number() OVER (PARTITION BY customer_id
      |                               ORDER BY version DESC) AS rk
      |  FROM changes WHERE change_type <> 'update_preimage')
      |SELECT customer_id, version AS last_version, change_type AS last_change,
      |  total_due, priority
      |FROM resolved WHERE rk = 1 AND change_type <> 'delete'""".stripMargin
}
