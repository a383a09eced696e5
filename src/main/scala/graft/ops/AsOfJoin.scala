package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (nearest-earlier) join — an operator Spark's built-in join set
  * lacks. Preference order (a) from the build brief applies: the
  * semantics ARE expressible by composing built-ins without a custom
  * physical operator, via the union trick:
  *
  *   1. tag left rows (side=1) and right rows (side=0) with a common
  *      (key, time) shape, right payload nulled on left rows;
  *   2. one hash-shuffle on key, sort by (time, side, tiebreak);
  *   3. `last(payload, ignoreNulls)` over rows-unbounded-preceding —
  *      each left row sees the latest right payload at-or-before its
  *      time (side=0 sorts before side=1 at equal times);
  *   4. keep side=1 rows.
  *
  * Cost: ONE shuffle + sort over |L|+|R| rows — same complexity class
  * as a sort-merge join, no per-pair blowup, which is why this shape
  * survives 100 TB while a windowed cross-join would not. Ties on
  * right time break toward the largest tiebreak column (deterministic,
  * mirrored in the oracle).
  */
object AsOfJoin {

  /** Left as-of join: for every left row, the latest right row with
    * rightTime <= leftTime for the same key; right columns null when no
    * such row exists. `rightPayload` columns are carried through;
    * `rightTiebreak` orders equal-time right rows (max wins). */
  def asOfLeft(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], rightTiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadFields = (rightTiebreak +: rightPayload).distinct
    val payload = struct(payloadFields.map(col): _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadFields.map(f => right.schema(f)))
    val lTagged = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_tb", lit(null).cast("long"))
      .withColumn("_payload", lit(null).cast(payloadType))
    val rTagged = right
      .select(
        col(rightKey).as("_k"),
        col(rightTime).as("_t"),
        lit(0).as("_side"),
        col(rightTiebreak).cast("long").as("_tb"),
        payload.as("_payload"))
    // align schemas: left keeps its own columns, right fills nulls
    val rAligned = leftCols.foldLeft(rTagged) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) ++ Seq(col("_k"), col("_t"), col("_side"), col("_tb"), col("_payload"))): _*)
    val unioned = lTagged
      .select((leftCols.map(col) ++ Seq(col("_k"), col("_t"), col("_side"), col("_tb"), col("_payload"))): _*)
      .unionAll(rAligned)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** For each event, the customer's latest order at or before the
    * event time (events ASOF orders on user_id/o_custkey). */
  def q29AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val ord = Tables.load(spark, dir, "orders")
    asOfLeft(ev, ord,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate",
      rightPayload = Seq("o_orderkey", "o_totalprice"),
      rightTiebreak = "o_orderkey")
      .select(
        col("event_id"),
        col("user_id"),
        col("o_orderkey").as("last_order_id"),
        col("o_totalprice").as("last_order_total"))
  }

  /** Deterministic oracle: explicit argmax instead of DuckDB's ASOF
    * JOIN, whose equal-time tie choice is unspecified. */
  val q29Oracle: String =
    """SELECT event_id, user_id, last_order_id, last_order_total FROM (
      |  SELECT e.event_id, e.user_id,
      |    o.o_orderkey AS last_order_id, o.o_totalprice AS last_order_total,
      |    row_number() OVER (PARTITION BY e.event_id
      |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rk
      |  FROM events e LEFT JOIN orders o
      |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
      |WHERE rk = 1""".stripMargin
}
