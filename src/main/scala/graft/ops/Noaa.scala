package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Ingest.{parseFixedWidth, FwField}

/** Full-fidelity NOAA bronze DAG (noaa_bronze_layer.py) re-expressed
  * over the testdata star schema: the 9-field GHCN station spec at the
  * reference's exact byte offsets (:34-44), the country decode from the
  * station-id prefix (:50-52), the network-flag concat_ws artifact
  * (:61-64), the 6-field inventory spec (:95-102), the 10-branch
  * element decode with tenths unit conversion and unit labels
  * (:142-176), and the US-stations filter join (:191-197).
  *
  * Since the container has no GHCN files, each parser is exercised as a
  * render→parse round trip (the q6 pattern): deterministic fixed-width
  * lines are built from testdata columns with lpad/rpad/concat — ops
  * DuckDB reproduces byte-for-byte — then parsed positionally. The
  * four tables form a Registry DAG (NoaaPipelines) exactly like the
  * reference's pipeline.
  */
object Noaa {

  /** GHCN-style station id: 2-char country prefix + 9-digit key —
    * country is recoverable from the id prefix, as the reference
    * assumes (noaa_bronze_layer.py:50). */
  def mkStationId(key: Column): Column =
    concat(
      when(key % 4 === 0, "US").when(key % 4 === 1, "CA")
        .when(key % 4 === 2, "MX").otherwise("ZZ"),
      lpad(key.cast("string"), 9, "0"))

  // single-line on purpose: this fragment is interpolated into
  // stripMargin oracles, where a line-leading "||" would lose a pipe
  private val mkStationIdSql =
    "CASE WHEN KEY % 4 = 0 THEN 'US' WHEN KEY % 4 = 1 THEN 'CA' " +
      "WHEN KEY % 4 = 2 THEN 'MX' ELSE 'ZZ' END || lpad(CAST(KEY AS VARCHAR), 9, '0')"

  // deterministic lat/lon/elev strings built from integers only (no
  // double formatting — both engines then parse the identical text)
  private def latStr(k: Column): Column =
    lpad(concat(lpad((k % 80).cast("string"), 2, "0"), lit("."),
      lpad((k * 7 % 10000).cast("string"), 4, "0")), 8, " ")
  private def lonStr(k: Column): Column =
    lpad(concat(lpad((k * 3 % 170).cast("string"), 3, "0"), lit("."),
      lpad((k * 13 % 10000).cast("string"), 4, "0")), 9, " ")
  private def latSql(k: String): String =
    s"lpad(lpad(CAST($k % 80 AS VARCHAR), 2, '0') || '.' || lpad(CAST($k * 7 % 10000 AS VARCHAR), 4, '0'), 8, ' ')"
  private def lonSql(k: String): String =
    s"lpad(lpad(CAST($k * 3 % 170 AS VARCHAR), 3, '0') || '.' || lpad(CAST($k * 13 % 10000 AS VARCHAR), 4, '0'), 9, ' ')"

  /** The ghcnd-stations.txt line at the reference's exact offsets:
    * id(1,11) lat(13,8) lon(22,9) elev(32,6) state(39,2) name(42,30)
    * gsn(73,3) hcn(77,3) wmo(81,5), space-separated. */
  def stationLines(customer: DataFrame, nation: DataFrame): DataFrame = {
    val k = col("c.c_custkey")
    customer.as("c")
      .join(broadcast(nation.as("n")),
        col("c.c_nationkey") === col("n.n_nationkey"), "left")
      .select(concat(
        mkStationId(k), lit(" "),
        latStr(k), lit(" "),
        lonStr(k), lit(" "),
        lpad(concat((k % 4000).cast("string"), lit("."),
          (k % 10).cast("string")), 6, " "), lit(" "),
        when(k % 5 === 0, "  ")
          .otherwise(rpad(substring(upper(col("n.n_name")), 1, 2), 2, " ")), lit(" "),
        rpad(trim(col("c.c_name")), 30, " "), lit(" "),
        when(k % 3 === 0, "GSN").otherwise("   "), lit(" "),
        when(k % 7 === 0, "HCN").otherwise("   "), lit(" "),
        when(k % 2 === 0, lpad((k % 100000).cast("string"), 5, "0"))
          .otherwise("     ")).as("value"))
  }

  /** Stations table: 9-field positional parse + prefix country decode +
    * nullable state + the concat_ws network-flag artifact. */
  def stations(customer: DataFrame, nation: DataFrame): DataFrame = {
    val parsed = parseFixedWidth(stationLines(customer, nation), "value", Seq(
      FwField("station_id", 1, 11),
      FwField("lat", 13, 8, "double"),
      FwField("lon", 22, 9, "double"),
      FwField("elevation", 32, 6, "double"),
      FwField("state", 39, 2),
      FwField("station_name", 42, 30),
      FwField("gsn_flag", 73, 3),
      FwField("hcn_flag", 77, 3),
      FwField("wmo", 81, 5)))
    parsed.select(
      col("station_id"), col("lat"), col("lon"), col("elevation"),
      nullif(col("state"), lit("")).as("state_geo_id"),
      col("station_name"),
      substring(col("station_id"), 1, 2).as("country_geo_id"),
      when(substring(col("station_id"), 1, 2) === "US", "United States")
        .when(substring(col("station_id"), 1, 2) === "CA", "Canada")
        .when(substring(col("station_id"), 1, 2) === "MX", "Mexico")
        .otherwise("Other").as("country_name"),
      // ","-artifact deliberately preserved (noaa_bronze_layer.py:61-64)
      concat_ws(",", col("gsn_flag"), col("hcn_flag")).as("network_flags"),
      nullif(col("wmo"), lit("")).as("wmo_id"))
  }

  def q41NoaaStations(spark: SparkSession, dir: String): DataFrame =
    stations(Tables.load(spark, dir, "customer"), Tables.load(spark, dir, "nation"))

  val q41Oracle: String = {
    val sid = mkStationIdSql.replace("KEY", "c.c_custkey")
    s"""WITH lines AS (
       |  SELECT $sid || ' ' ||
       |    ${latSql("c.c_custkey")} || ' ' ||
       |    ${lonSql("c.c_custkey")} || ' ' ||
       |    lpad(CAST(c.c_custkey % 4000 AS VARCHAR) || '.' ||
       |         CAST(c.c_custkey % 10 AS VARCHAR), 6, ' ') || ' ' ||
       |    CASE WHEN c.c_custkey % 5 = 0 THEN '  '
       |         ELSE rpad(substring(upper(n.n_name), 1, 2), 2, ' ') END || ' ' ||
       |    rpad(trim(c.c_name), 30, ' ') || ' ' ||
       |    CASE WHEN c.c_custkey % 3 = 0 THEN 'GSN' ELSE '   ' END || ' ' ||
       |    CASE WHEN c.c_custkey % 7 = 0 THEN 'HCN' ELSE '   ' END || ' ' ||
       |    CASE WHEN c.c_custkey % 2 = 0
       |         THEN lpad(CAST(c.c_custkey % 100000 AS VARCHAR), 5, '0')
       |         ELSE '     ' END AS value
       |  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey)
       |SELECT trim(substring(value, 1, 11)) AS station_id,
       |  CAST(trim(substring(value, 13, 8)) AS DOUBLE) AS lat,
       |  CAST(trim(substring(value, 22, 9)) AS DOUBLE) AS lon,
       |  CAST(trim(substring(value, 32, 6)) AS DOUBLE) AS elevation,
       |  nullif(trim(substring(value, 39, 2)), '') AS state_geo_id,
       |  trim(substring(value, 42, 30)) AS station_name,
       |  substring(trim(substring(value, 1, 11)), 1, 2) AS country_geo_id,
       |  CASE substring(trim(substring(value, 1, 11)), 1, 2)
       |    WHEN 'US' THEN 'United States'
       |    WHEN 'CA' THEN 'Canada'
       |    WHEN 'MX' THEN 'Mexico'
       |    ELSE 'Other' END AS country_name,
       |  concat_ws(',', trim(substring(value, 73, 3)),
       |                 trim(substring(value, 77, 3))) AS network_flags,
       |  nullif(trim(substring(value, 81, 5)), '') AS wmo_id
       |FROM lines""".stripMargin
  }

  /** ghcnd-inventory.txt: per-(station, element) observation coverage —
    * an aggregation rendered at offsets id(1,11) lat(13,8) lon(22,9)
    * element(32,4) firstyear(37,4) lastyear(42,4), then parsed. */
  def inventoryLines(events: DataFrame): DataFrame = {
    val agg = events
      .select((col("user_id") % 1500 + 1).as("k"),
        when(col("event_type") === "view", "VIEW")
          .when(col("event_type") === "click", "CLCK")
          .when(col("event_type") === "purchase", "PRCH")
          .when(col("event_type") === "signup", "SGNP")
          .otherwise("ERRR").as("element"),
        year(col("ts")).as("y"))
      .groupBy(col("k"), col("element"))
      .agg(min(col("y")).as("firstyear"), max(col("y")).as("lastyear"))
    agg.select(concat(
      mkStationId(col("k")), lit(" "),
      latStr(col("k")), lit(" "),
      lonStr(col("k")), lit(" "),
      col("element"), lit(" "),
      lpad(col("firstyear").cast("string"), 4, "0"), lit(" "),
      lpad(col("lastyear").cast("string"), 4, "0")).as("value"))
  }

  def inventory(events: DataFrame): DataFrame =
    parseFixedWidth(inventoryLines(events), "value", Seq(
      FwField("station_id", 1, 11),
      FwField("lat", 13, 8, "double"),
      FwField("lon", 22, 9, "double"),
      FwField("element", 32, 4),
      FwField("firstyear", 37, 4, "int"),
      FwField("lastyear", 42, 4, "int")))

  def q42NoaaInventory(spark: SparkSession, dir: String): DataFrame =
    inventory(Tables.load(spark, dir, "events"))

  val q42Oracle: String = {
    val sid = mkStationIdSql.replace("KEY", "k")
    s"""WITH agg AS (
       |  SELECT user_id % 1500 + 1 AS k,
       |    CASE event_type WHEN 'view' THEN 'VIEW' WHEN 'click' THEN 'CLCK'
       |      WHEN 'purchase' THEN 'PRCH' WHEN 'signup' THEN 'SGNP'
       |      ELSE 'ERRR' END AS element,
       |    min(year(ts)) AS firstyear, max(year(ts)) AS lastyear
       |  FROM events GROUP BY 1, 2
       |), lines AS (
       |  SELECT $sid || ' ' ||
       |    ${latSql("k")} || ' ' ||
       |    ${lonSql("k")} || ' ' ||
       |    element || ' ' ||
       |    lpad(CAST(firstyear AS VARCHAR), 4, '0') || ' ' ||
       |    lpad(CAST(lastyear AS VARCHAR), 4, '0') AS value
       |  FROM agg)
       |SELECT trim(substring(value, 1, 11)) AS station_id,
       |  CAST(trim(substring(value, 13, 8)) AS DOUBLE) AS lat,
       |  CAST(trim(substring(value, 22, 9)) AS DOUBLE) AS lon,
       |  trim(substring(value, 32, 4)) AS element,
       |  CAST(trim(substring(value, 37, 4)) AS INTEGER) AS firstyear,
       |  CAST(trim(substring(value, 42, 4)) AS INTEGER) AS lastyear
       |FROM lines""".stripMargin
  }

  /** Metrics timeseries: the 10-branch element decode, tenths unit
    * conversion, unit labels, and yyyyMMdd date/timestamp parsing of
    * noaa_bronze_layer.py:142-176 — elements derived deterministically
    * from (event_type, value) so all ten branches are populated. */
  def timeseries(events: DataFrame): DataFrame = {
    val hi = col("value") > 50.0
    val elem = when(col("event_type") === "view", when(hi, "TMAX").otherwise("TMIN"))
      .when(col("event_type") === "click", when(hi, "TAVG").otherwise("PRCP"))
      .when(col("event_type") === "purchase", when(hi, "SNOW").otherwise("SNWD"))
      .when(col("event_type") === "signup", when(hi, "AWND").otherwise("WSF2"))
      .otherwise(when(hi, "WSF5").otherwise("EVAP"))
    val ymd = concat(
      lpad(year(col("ts")).cast("string"), 4, "0"),
      lpad(month(col("ts")).cast("string"), 2, "0"),
      lpad(dayofmonth(col("ts")).cast("string"), 2, "0"))
    val e = col("element")
    events
      .select(
        mkStationId(col("user_id") % 1500 + 1).as("station_id"),
        ymd.as("ymd"), elem.as("element"), col("value"))
      .select(
        col("station_id"),
        to_date(col("ymd"), "yyyyMMdd").as("obs_date"),
        to_timestamp(col("ymd"), "yyyyMMdd").as("obs_ts"),
        col("element"),
        when(e === "TMAX", "Max Temperature")
          .when(e === "TMIN", "Min Temperature")
          .when(e === "TAVG", "Avg Temperature")
          .when(e === "PRCP", "Precipitation")
          .when(e === "SNOW", "Snowfall")
          .when(e === "SNWD", "Snow Depth")
          .when(e === "AWND", "Avg Wind Speed")
          .when(e === "WSF2", "Fastest 2min Wind")
          .when(e === "WSF5", "Fastest 5sec Wind")
          .otherwise("Evaporation").as("variable_name"),
        when(e.isin("TMAX", "TMIN", "TAVG", "PRCP", "EVAP"), col("value") / 10.0)
          .otherwise(col("value")).as("converted_value"),
        when(e.isin("TMAX", "TMIN", "TAVG"), "degrees_celsius")
          .when(e.isin("PRCP", "SNOW", "SNWD", "EVAP"), "millimeters")
          .otherwise("meters_per_second").as("unit_label"))
  }

  def q43NoaaTimeseries(spark: SparkSession, dir: String): DataFrame =
    timeseries(Tables.load(spark, dir, "events"))

  val q43Oracle: String = {
    val sid = mkStationIdSql.replace("KEY", "(user_id % 1500 + 1)")
    s"""WITH base AS (
       |  SELECT $sid AS station_id,
       |    lpad(CAST(year(ts) AS VARCHAR), 4, '0') ||
       |      lpad(CAST(month(ts) AS VARCHAR), 2, '0') ||
       |      lpad(CAST(day(ts) AS VARCHAR), 2, '0') AS ymd,
       |    CASE event_type
       |      WHEN 'view' THEN CASE WHEN value > 50.0 THEN 'TMAX' ELSE 'TMIN' END
       |      WHEN 'click' THEN CASE WHEN value > 50.0 THEN 'TAVG' ELSE 'PRCP' END
       |      WHEN 'purchase' THEN CASE WHEN value > 50.0 THEN 'SNOW' ELSE 'SNWD' END
       |      WHEN 'signup' THEN CASE WHEN value > 50.0 THEN 'AWND' ELSE 'WSF2' END
       |      ELSE CASE WHEN value > 50.0 THEN 'WSF5' ELSE 'EVAP' END END AS element,
       |    value
       |  FROM events)
       |SELECT station_id,
       |  CAST(strptime(ymd, '%Y%m%d') AS DATE) AS obs_date,
       |  strptime(ymd, '%Y%m%d') AS obs_ts,
       |  element,
       |  CASE element
       |    WHEN 'TMAX' THEN 'Max Temperature'
       |    WHEN 'TMIN' THEN 'Min Temperature'
       |    WHEN 'TAVG' THEN 'Avg Temperature'
       |    WHEN 'PRCP' THEN 'Precipitation'
       |    WHEN 'SNOW' THEN 'Snowfall'
       |    WHEN 'SNWD' THEN 'Snow Depth'
       |    WHEN 'AWND' THEN 'Avg Wind Speed'
       |    WHEN 'WSF2' THEN 'Fastest 2min Wind'
       |    WHEN 'WSF5' THEN 'Fastest 5sec Wind'
       |    ELSE 'Evaporation' END AS variable_name,
       |  CASE WHEN element IN ('TMAX','TMIN','TAVG','PRCP','EVAP')
       |       THEN value / 10.0 ELSE value END AS converted_value,
       |  CASE WHEN element IN ('TMAX','TMIN','TAVG') THEN 'degrees_celsius'
       |       WHEN element IN ('PRCP','SNOW','SNWD','EVAP') THEN 'millimeters'
       |       ELSE 'meters_per_second' END AS unit_label
       |FROM base""".stripMargin
  }

  /** US metrics: timeseries ⨝ US-filtered station index
    * (country_geo_id = 'US' AND state_geo_id IS NOT NULL,
    * noaa_bronze_layer.py:194-197) — the filtered dim is broadcast so
    * the big fact side never shuffles. */
  def usMetrics(ts: DataFrame, stations: DataFrame): DataFrame = {
    val us = stations
      .filter(col("country_geo_id") === "US" && col("state_geo_id").isNotNull)
      .select(col("station_id"), col("state_geo_id"), col("station_name"))
    ts.join(broadcast(us), Seq("station_id"), "inner")
      .select(col("station_id"), col("state_geo_id"), col("station_name"),
        col("obs_date"), col("variable_name"), col("converted_value"),
        col("unit_label"))
  }

  def q44NoaaUsMetrics(spark: SparkSession, dir: String): DataFrame =
    usMetrics(
      q43NoaaTimeseries(spark, dir),
      q41NoaaStations(spark, dir))

  val q44Oracle: String =
    s"""WITH ts AS (${q43Oracle.replace("\n", "\n  ")}),
       |idx AS (${q41Oracle.replace("\n", "\n  ")})
       |SELECT ts.station_id, idx.state_geo_id, idx.station_name,
       |  ts.obs_date, ts.variable_name, ts.converted_value, ts.unit_label
       |FROM ts JOIN idx ON ts.station_id = idx.station_id
       |WHERE idx.country_geo_id = 'US' AND idx.state_geo_id IS NOT NULL""".stripMargin
}
