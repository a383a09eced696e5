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

  /** Forward as-of join — the mirror of [[asOfLeft]]: for every left
    * row, the EARLIEST right row with rightTime >= leftTime for the
    * same key (the "next scheduled event / next order after this
    * touchpoint" lookup attribution and SLA pipelines need). Same
    * union trick, same single shuffle+sort cost: the window scans
    * time DESCENDING, so rows-unbounded-preceding holds exactly the
    * at-or-after right rows, and `last(payload, ignoreNulls)` is the
    * nearest of them. Ties on right time break toward the SMALLEST
    * tiebreak (the deterministic "first" next row; _tb desc in the
    * sort makes the min the last seen). */
  def asOfForward(
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
    val rAligned = leftCols.foldLeft(rTagged) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) ++ Seq(col("_k"), col("_t"), col("_side"), col("_tb"), col("_payload"))): _*)
    val unioned = lTagged
      .select((leftCols.map(col) ++ Seq(col("_k"), col("_t"), col("_side"), col("_tb"), col("_payload"))): _*)
      .unionAll(rAligned)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").desc, col("_side").asc, col("_tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** q247: for each `view` event, the same user's NEXT `purchase`
    * event at or after the view — q29's mirror and the point-lookup
    * form of the funnel question ("which purchase did this view lead
    * to, and how long did it take"): one forward as-of join instead of
    * a session reconstruction. Seconds-to-convert rides along as an
    * exact integer; views that never convert keep NULL payload. */
  def q247ForwardAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
    asOfForward(views, purchases,
      leftKey = "user_id", rightKey = "p_user",
      leftTime = "ts", rightTime = "p_ts",
      rightPayload = Seq("p_id", "p_ts"),
      rightTiebreak = "p_id")
      .select(
        col("event_id"),
        col("user_id"),
        col("p_id").as("next_purchase_id"),
        expr("(unix_millis(p_ts) - unix_millis(ts)) div 1000")
          .as("secs_to_purchase"))
  }

  val q247Oracle: String =
    """SELECT event_id, user_id, next_purchase_id, secs_to_purchase
      |FROM (
      |  SELECT v.event_id, v.user_id,
      |    p.event_id AS next_purchase_id,
      |    CAST((epoch_ms(p.ts) - epoch_ms(v.ts)) // 1000 AS BIGINT)
      |      AS secs_to_purchase,
      |    row_number() OVER (PARTITION BY v.event_id
      |                       ORDER BY p.ts ASC, p.event_id ASC) AS rk
      |  FROM (SELECT * FROM events WHERE event_type = 'view') v
      |  LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |    ON p.user_id = v.user_id AND p.ts >= v.ts) t
      |WHERE rk = 1""".stripMargin

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
