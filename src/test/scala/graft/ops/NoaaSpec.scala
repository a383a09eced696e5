package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NoaaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("station parse: prefix country decode, nullable state, flag artifact") {
    val st = Noaa.stations(
      Tables.load(spark, TestSpark.sfDir, "customer"),
      Tables.load(spark, TestSpark.sfDir, "nation"))
    val rows = st.select("station_id", "country_geo_id", "country_name",
      "state_geo_id", "network_flags", "wmo_id")
      .as[(String, String, String, Option[String], String, Option[String])]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, code, name, state, flags, wmo) =>
      assert(id.length == 11 && id.startsWith(code))
      assert(Map("US" -> "United States", "CA" -> "Canada", "MX" -> "Mexico")
        .get(code).forall(_ == name))
      // the "," artifact: flags is gsn,hcn with empties KEPT (reference
      // noaa_bronze_layer.py:61-64) — always exactly one comma
      assert(flags.count(_ == ',') == 1)
      assert(state.forall(_.nonEmpty), "state is NULL, never empty string")
      assert(wmo.forall(_.nonEmpty))
    }
    // every 5th station has a blank state (the nullable-state path)
    assert(rows.count(_._4.isEmpty) > 0)
    // GSN-only, HCN-only, both-blank flag variants all occur
    val flagSet = rows.map(_._5).toSet
    assert(flagSet.contains("GSN,") || flagSet.contains("GSN,HCN"))
    assert(flagSet.contains(","))
  }

  test("timeseries decode: tenths conversion applies exactly to the tenths-coded elements") {
    val ts = Noaa.timeseries(Tables.load(spark, TestSpark.sfDir, "events"))
    val tenths = Set("TMAX", "TMIN", "TAVG", "PRCP", "EVAP")
    val byElem = ts.groupBy("element", "unit_label").count()
      .as[(String, String, Long)].collect()
    assert(byElem.map(_._1).toSet.size == 10, "all ten decode branches populated")
    byElem.foreach { case (e, label, _) =>
      val expected =
        if (Set("TMAX", "TMIN", "TAVG")(e)) "degrees_celsius"
        else if (Set("PRCP", "SNOW", "SNWD", "EVAP")(e)) "millimeters"
        else "meters_per_second"
      assert(label == expected, s"element $e")
    }
    // spot-check the /10 conversion against the raw source values
    val raw = Tables.load(spark, TestSpark.sfDir, "events")
      .filter(col("event_type") === "view" && col("value") > 50.0)
      .agg(sum(col("value"))).head().getDouble(0)
    val conv = ts.filter(col("element") === "TMAX")
      .agg(sum(col("converted_value") * 10.0)).head().getDouble(0)
    assert(math.abs(raw - conv) < 1e-6)
  }
}
