package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` maps operator names (SURVEY.md §2 inventory) to builders;
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL for the hash compare.
  * Column names/aliases MUST match between the two.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The `fact_weather` pivot shape — the densest operator coverage per
    * line in the reference (Geo_silver_layer_common.py:8-41). */
  def entry(spark: SparkSession): DataFrame =
    Relational.qWeatherPivot(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "q2_weather_pivot" -> (Relational.qWeatherPivot _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1Oracle,
    "q2_weather_pivot" -> Relational.qWeatherPivotOracle,
  )
}
