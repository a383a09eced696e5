package graft.engine

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("materializes in dependency order with memoized reads") {
    import spark.implicits._
    val reg = new Registry
    var builds = 0
    reg.register(TableDef("silver", "", Seq("bronze"), (_, read) => {
      builds += 1; read("bronze").withColumn("x2", col("v") * 2)
    }))
    reg.register(TableDef("gold", "", Seq("silver"), (_, read) => {
      builds += 1; read("silver").agg(sum("x2").as("total"))
    }))
    reg.register(TableDef("bronze", "", Seq("src"), (_, read) => { builds += 1; read("src") }))
    val out = reg.materializeAll(spark, {
      case "src" => Seq(1, 2, 3).toDF("v")
      case other => fail(s"unexpected external read: $other")
    })
    assert(builds == 3)
    assert(out("gold").head.getLong(0) == 12L)
  }

  test("materializeToDir persists every dataset as parquet in dependency order") {
    import spark.implicits._
    val reg = new Registry
    reg.register(TableDef("stg.base", "", Seq("src"), (_, r) => r("src")))
    reg.register(TableDef("silver.doubled", "", Seq("stg.base"),
      (_, r) => r("stg.base").withColumn("x2", col("v") * 2)))
    val out = java.nio.file.Files.createTempDirectory("reg_out").toString
    val paths = reg.materializeToDir(spark, _ => Seq(1, 2, 3).toDF("v"), out)
    assert(paths.keySet == Set("stg.base", "silver.doubled"))
    val persisted = spark.read.parquet(paths("silver.doubled"))
    assert(persisted.agg(sum("x2")).head.getLong(0) == 12L)
    assert(paths("silver.doubled").endsWith("silver/doubled"))
  }

  test("NOAA bundle is a 4-table DAG: us_metrics builds after its two deps") {
    val reg = new Registry
    NoaaPipelines.register(reg)
    val order = reg.topoOrder(external = Set("src.customer", "src.nation", "src.events"))
    assert(order.size == 4)
    assert(order.indexOf("noaa.us_metrics") > order.indexOf("noaa.stations"))
    assert(order.indexOf("noaa.us_metrics") > order.indexOf("noaa.timeseries"))
    val out = reg.materializeAll(spark,
      name => graft.Tables.load(spark, TestSpark.sfDir, name.stripPrefix("src.")))
    assert(out("noaa.stations").count() ==
      graft.Tables.load(spark, TestSpark.sfDir, "customer").count())
    assert(out("noaa.inventory").count() > 0)
    // every element of the 10-branch decode is populated
    assert(out("noaa.timeseries").select("element").distinct().count() == 10)
    // the US filter keeps only US-prefixed stations with a state
    import spark.implicits._
    val us = out("noaa.us_metrics")
    assert(us.count() > 0)
    assert(us.select("station_id").as[String].collect().forall(_.startsWith("US")))
  }

  test("topoOrder rejects cycles") {
    val reg = new Registry
    reg.register(TableDef("a", "", Seq("b"), (_, r) => r("b")))
    reg.register(TableDef("b", "", Seq("a"), (_, r) => r("a")))
    assertThrows[IllegalArgumentException](reg.topoOrder())
  }

  test("reference bronze catalog registers all 68 staging tables, acyclic") {
    val reg = new Registry
    ReferenceCatalog.registerBronze(reg)
    assert(reg.tableNames.size == 68)
    assert(ReferenceCatalog.bronzeSchemas("sales").size == 19)
    assert(ReferenceCatalog.bronzeSchemas("production").size == 25)
    val external = for ((s, ts) <- ReferenceCatalog.bronzeSchemas.toSeq; t <- ts)
      yield s"src_$s.$t"
    assert(reg.topoOrder(external = external.toSet).size == 68)
  }

  test("bronze fan-out registers one passthrough per source table (bronze_structure shape)") {
    val reg = new Registry
    Registry.bronzeFanOut(reg, Map(
      "sales" -> Seq("customer", "store", "salesorderheader"),
      "person" -> Seq("address", "person")))
    assert(reg.tableNames.size == 5)
    assert(reg.tableNames.contains("stg_sales.stg_customer"))
    val out = reg.materializeAll(spark, name => {
      import spark.implicits._
      Seq(name).toDF("src_name")
    })
    assert(out("stg_person.stg_address").head.getString(0) == "src_person.address")
  }
}
