package graft.ops

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ingestion sources the reference uses (SURVEY.md §2.1): headerless CSV
  * with an explicit StructType (noaa_bronze_layer.py:122-135), text-file
  * scan + fixed-width positional parse (:31-44), to_date/to_timestamp
  * with explicit patterns (:153-154). */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("headerless CSV scan with explicit 8-field schema (NOAA daily shape)") {
    val dir = tmpDir("csv_in")
    Files.writeString(java.nio.file.Path.of(dir, "obs.csv"),
      """US1MNHN0184,20230101,PRCP,25,,,N,
        |US1MNHN0184,20230102,SNOW,0,,,N,0800
        |ASN00040126,20230101,TAVG,278,H,,S,""".stripMargin)
    val schema = StructType(Seq(
      StructField("station_id", StringType), StructField("obs_date", StringType),
      StructField("element", StringType), StructField("value", IntegerType),
      StructField("m_flag", StringType), StructField("q_flag", StringType),
      StructField("s_flag", StringType), StructField("obs_time", StringType)))
    val df = spark.read.schema(schema).option("header", "false").csv(dir)
      .withColumn("obs_date_d", to_date(col("obs_date"), "yyyyMMdd"))
      .withColumn("obs_ts", to_timestamp(col("obs_date"), "yyyyMMdd"))
    assert(df.count() == 3)
    val r = df.filter(col("element") === "TAVG").head
    assert(r.getAs[Int]("value") == 278)
    assert(r.getAs[java.sql.Date]("obs_date_d").toString == "2023-01-01")
    assert(r.getAs[java.sql.Timestamp]("obs_ts").toString.startsWith("2023-01-01 00:00:00"))
    assert(df.filter(col("q_flag").isNull).count() == 3) // empty CSV field -> null
  }

  test("CSV corrupt-record handling: PERMISSIVE quarantines, DROPMALFORMED skips, FAILFAST throws") {
    val dir = tmpDir("csv_bad")
    Files.writeString(java.nio.file.Path.of(dir, "rows.csv"),
      """1,alpha,10
        |2,beta,notanumber
        |3,gamma,30""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("qty", IntegerType), StructField("_corrupt", StringType)))
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(dir).cache()
    assert(permissive.count() == 3)
    assert(permissive.filter(col("_corrupt").isNotNull).count() == 1)
    assert(permissive.filter(col("id") === 2).head.getAs[Any]("qty") == null)

    // conversion failures are quarantined (above) but only STRUCTURALLY
    // malformed records (wrong token count) trip DROPMALFORMED/FAILFAST
    val dir2 = tmpDir("csv_bad2")
    Files.writeString(java.nio.file.Path.of(dir2, "rows.csv"),
      """1,alpha,10
        |2,beta,20,EXTRA,FIELDS
        |3,gamma,30""".stripMargin)
    val dropped = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("mode", "DROPMALFORMED").csv(dir2)
    // CSV column pruning means count() parses no fields and sees all 3 lines;
    // malformed records are only detected (and dropped) on a full-column read
    assert(dropped.count() == 3)
    assert(dropped.select("id", "name", "qty").collect().length == 2)

    val failfast = spark.read
      .schema(StructType(schema.dropRight(1)))
      .option("mode", "FAILFAST").csv(dir2)
    assertThrows[org.apache.spark.SparkException](failfast.collect())
  }

  test("JSON-lines scan: pinned schema, nested fields, corrupt-record modes") {
    val dir = tmpDir("jsonl_in")
    Files.writeString(java.nio.file.Path.of(dir, "rows.jsonl"),
      """{"id": 1, "meta": {"lang": "en", "score": 7}, "tags": ["a", "b"]}
        |{"id": 2, "meta": {"lang": "de", "score": 3}, "tags": []}
        |{this is not json
        |{"id": 4, "meta": {"lang": "fr", "score": 9}, "tags": ["c"]}""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(
        StructField("lang", StringType), StructField("score", LongType)))),
      StructField("tags", ArrayType(StringType)),
      StructField("_corrupt", StringType)))
    // pinned schema — no inference pass (an extra full scan at 100 TB)
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir).cache()
    assert(permissive.count() == 4)
    assert(permissive.filter(col("_corrupt").isNotNull).count() == 1)
    // nested projection works through the struct
    assert(permissive.filter(col("meta.score") >= 7)
      .select("meta.lang").collect().map(_.getString(0)).sorted
      .sameElements(Array("en", "fr")))

    val dropped = spark.read.schema(StructType(schema.dropRight(1)))
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.select("id", "meta", "tags").collect().length == 3)

    val failfast = spark.read.schema(StructType(schema.dropRight(1)))
      .option("mode", "FAILFAST").json(dir)
    assertThrows[org.apache.spark.SparkException](failfast.collect())
  }

  test("text scan + 9-field fixed-width parse (GHCN station-file shape)") {
    val dir = tmpDir("fw_in")
    // spec offsets from FIXTURES.md A.11 (1-indexed): id(1,11) lat(13,8)
    // lon(22,9) elev(32,6) state(39,2) name(42,30) gsn(73,3) hcn(77,3) wmo(81,5)
    val line1 = "ACW00011604" + " " + " 17.1167" + " " + " -61.7833" + " " +
      "  10.1" + " " + "  " + " " + "ST JOHNS COOLIDGE FLD         " + " " +
      "   " + " " + "   " + " " + "     "
    Files.writeString(java.nio.file.Path.of(dir, "stations.txt"), line1)
    val parsed = Ingest.parseFixedWidth(
      spark.read.text(dir), "value", Seq(
        Ingest.FwField("station_id", 1, 11),
        Ingest.FwField("latitude", 13, 8, "double"),
        Ingest.FwField("longitude", 22, 9, "double"),
        Ingest.FwField("elevation", 32, 6, "double"),
        Ingest.FwField("state", 39, 2),
        Ingest.FwField("name", 42, 30),
        Ingest.FwField("gsn_flag", 73, 3),
        Ingest.FwField("hcn_crn_flag", 77, 3),
        Ingest.FwField("wmo_id", 81, 5)))
    val r = parsed.head
    assert(r.getAs[String]("station_id") == "ACW00011604")
    assert(r.getAs[Double]("latitude") == 17.1167)
    assert(r.getAs[Double]("longitude") == -61.7833)
    assert(r.getAs[String]("name") == "ST JOHNS COOLIDGE FLD")
    assert(r.getAs[String]("gsn_flag") == "")
  }

  test("schema evolution: mergeSchema unions footers, absent columns are null") {
    import spark.implicits._
    // a bronze landing zone where a later batch added a column
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    Seq((1L, "a")).toDF("id", "old_col")
      .write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 9.5)).toDF("id", "old_col", "new_col")
      .write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("batch", "id", "new_col", "old_col"))
    val byId = merged.select("id", "old_col", "new_col")
      .as[(Long, String, Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, "a", None)))      // pre-drift file: null fill
    assert(byId(2L) == ((2L, "b", Some(9.5))))
  }
}
