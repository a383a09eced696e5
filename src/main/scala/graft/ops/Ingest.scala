package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Ingestion operators: fixed-width positional parsing and when-chain
  * decode/unit-conversion — the NOAA bronze patterns
  * (noaa_bronze_layer.py:31-44, :142-176).
  */
object Ingest {

  /** Declarative fixed-width field spec → select(substring...cast).
    * The Spark-first form of the reference's positional parser
    * (noaa_bronze_layer.py:34-44): one narrow projection over a single
    * `value` string column, fully codegen'd, no UDF. */
  final case class FwField(name: String, start: Int, len: Int, cast: String = "string") {
    def toColumn(value: Column): Column = {
      val raw = trim(substring(value, start, len))
      (if (cast == "string") raw else raw.cast(cast)).as(name)
    }
  }

  def parseFixedWidth(df: DataFrame, valueCol: String, fields: Seq[FwField]): DataFrame =
    df.select(fields.map(_.toColumn(col(valueCol))): _*)

  /** Round-trips the fixed-width format: renders nation⨝region rows into
    * padded 40-char lines (rpad/lpad — identical semantics in DuckDB),
    * then parses them back positionally. Exercises the 9-field GHCN
    * station-file pattern end to end with a SQL-expressible oracle. */
  def q6FixedWidth(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.load(spark, dir, "nation").as("n")
    val reg = Tables.load(spark, dir, "region").as("r")
    val lines = nat
      .join(broadcast(reg), col("n.n_regionkey") === col("r.r_regionkey"), "inner")
      .select(concat(
        rpad(col("n.n_name"), 20, " "),
        lpad(col("n.n_nationkey").cast("string"), 5, "0"),
        rpad(col("r.r_name"), 15, " ")).as("value"))
    parseFixedWidth(lines, "value", Seq(
      FwField("nation_name", 1, 20),
      FwField("nation_id", 21, 5, "int"),
      FwField("region_name", 26, 15)))
  }

  val q6Oracle: String =
    """WITH lines AS (
      |  SELECT rpad(n.n_name, 20, ' ') || lpad(CAST(n.n_nationkey AS VARCHAR), 5, '0')
      |         || rpad(r.r_name, 15, ' ') AS value
      |  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey)
      |SELECT trim(substring(value, 1, 20)) AS nation_name,
      |  CAST(trim(substring(value, 21, 5)) AS INTEGER) AS nation_id,
      |  trim(substring(value, 26, 15)) AS region_name
      |FROM lines""".stripMargin

  /** The NOAA metric decode/convert shape (noaa_bronze_layer.py:142-176):
    * multi-branch when-chain decode (element → variable name), conditional
    * unit conversion (`value / 10.0` for tenth-scaled metrics), unit
    * labels, typed-null column, and the concat_ws flag artifact whose ","
    * output the reference deliberately preserves (:61-64). */
  def q7UnitConvert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val et = col("event_type")
    ev.select(
      col("event_id"),
      to_date(col("ts")).as("event_date"),
      when(et === "view", "Page View")
        .when(et === "click", "Click Through")
        .when(et === "purchase", "Purchase")
        .when(et === "signup", "Sign Up")
        .when(et === "error", "Error")
        .otherwise("Unknown").as("variable_name"),
      when(et.isin("purchase", "error"), col("value") / 10.0)
        .otherwise(col("value")).as("converted_value"),
      when(et.isin("purchase", "error"), "tenths")
        .when(et.isin("view", "click"), "count")
        .otherwise("unit").as("unit_label"),
      lit(null).cast("string").as("reserved_flag"),
      concat_ws(",",
        when(col("value") > 100.0, "HIGH").otherwise(""),
        when(col("user_id") % 2 === 0, "EVEN").otherwise("")).as("flags"))
  }

  /** Semi-structured extraction: JSON path over the events.props payload
    * (get_json_object → typed cast), aggregated with exact integer sums
    * and an exact distinct count. */
  def q24JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val k = get_json_object(col("props"), "$.k").cast("long")
    ev.select(col("event_type"), col("user_id"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("k_sum"),
        (sum(col("k")) / (count(col("k")) * 1.0)).as("k_avg"),
        countDistinct(col("user_id")).as("distinct_users"))
  }

  val q24Oracle: String =
    """SELECT event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      |  sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
      |    / (count(CAST(json_extract_string(props, '$.k') AS BIGINT)) * 1.0) AS k_avg,
      |  count(DISTINCT user_id) AS distinct_users
      |FROM events GROUP BY event_type""".stripMargin

  val q7Oracle: String =
    """SELECT event_id,
      |  CAST(ts AS DATE) AS event_date,
      |  CASE event_type
      |    WHEN 'view' THEN 'Page View'
      |    WHEN 'click' THEN 'Click Through'
      |    WHEN 'purchase' THEN 'Purchase'
      |    WHEN 'signup' THEN 'Sign Up'
      |    WHEN 'error' THEN 'Error'
      |    ELSE 'Unknown' END AS variable_name,
      |  CASE WHEN event_type IN ('purchase','error') THEN value / 10.0
      |       ELSE value END AS converted_value,
      |  CASE WHEN event_type IN ('purchase','error') THEN 'tenths'
      |       WHEN event_type IN ('view','click') THEN 'count'
      |       ELSE 'unit' END AS unit_label,
      |  CAST(NULL AS VARCHAR) AS reserved_flag,
      |  concat_ws(',',
      |    CASE WHEN value > 100.0 THEN 'HIGH' ELSE '' END,
      |    CASE WHEN user_id % 2 = 0 THEN 'EVEN' ELSE '' END) AS flags
      |FROM events""".stripMargin
}
