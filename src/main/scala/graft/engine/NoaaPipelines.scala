package graft.engine

import graft.ops.Noaa

/** The NOAA bronze bundle as a Registry DAG — four datasets with the
  * same dependency shape as noaa_bronze_layer.py: two independent
  * fixed-width parses, the metric decode, and the US-filter join that
  * depends on two of them (`dp.read`-style edges).
  */
object NoaaPipelines {

  def register(reg: Registry): Unit = {
    reg.register(TableDef(
      "noaa.stations", "9-field GHCN station index + prefix country decode",
      Seq("src.customer", "src.nation"),
      (_, read) => Noaa.stations(read("src.customer"), read("src.nation"))))
    reg.register(TableDef(
      "noaa.inventory", "6-field per-(station, element) coverage inventory",
      Seq("src.events"),
      (_, read) => Noaa.inventory(read("src.events"))))
    reg.register(TableDef(
      "noaa.timeseries", "10-branch element decode + unit conversion",
      Seq("src.events"),
      (_, read) => Noaa.timeseries(read("src.events"))))
    reg.register(TableDef(
      "noaa.us_metrics", "US-filtered metrics ⨝ station index",
      Seq("noaa.timeseries", "noaa.stations"),
      (_, read) => Noaa.usMetrics(read("noaa.timeseries"), read("noaa.stations"))))
  }
}
