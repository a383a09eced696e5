package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-semantics tests via MemoryStream — deterministic event
  * times, explicit processAllAvailable stepping (SURVEY.md §5.2 item 3).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def runToCompletion(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
  }

  test("stream-static left join enriches on-time rows (dim_geo shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val addr = MemoryStream[(Int, Int, Timestamp)] // (address_id, state_id, modified)
    val dim = Seq((10, "California"), (20, "Oregon")).toDF("state_id", "state_name")
    val stream = Streams.watermarked(
      addr.toDF().toDF("address_id", "state_id", "modified"), "modified")
    val joined = Streams.streamStaticLeft(stream, dim,
      stream("state_id") === dim("state_id"))
      .select(col("address_id"), col("state_name"))
    val q = joined.writeStream.format("memory").queryName("geo_out")
      .outputMode("append").start()
    addr.addData((1, 10, ts(0)), (2, 20, ts(1)), (3, 99, ts(2)))
    runToCompletion(q)
    val rows = spark.table("geo_out").as[(Int, Option[String])].collect().toMap
    assert(rows == Map(1 -> Some("California"), 2 -> Some("Oregon"), 3 -> None))
  }

  test("stream-stream LEFT interval join: in-band matches, out-of-band nulls after watermark (dim_store shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cust = MemoryStream[(Int, Int, Timestamp)] // (customer_id, store_id, c_time)
    val store = MemoryStream[(Int, String, Timestamp)] // (store_id, name, s_time)
    val c = Streams.watermarked(
      cust.toDF().toDF("customer_id", "store_fk", "c_time"), "c_time")
    val s = Streams.watermarked(
      store.toDF().toDF("store_id", "store_name", "s_time"), "s_time")
    val joined = Streams.intervalJoinLeft(
      c, s, col("store_fk") === col("store_id"),
      leftTime = "c_time", rightTime = "s_time",
      lower = "2 minutes", upper = "2 minutes")
      .select(col("customer_id"), col("store_name"))
    val q = joined.writeStream.format("memory").queryName("store_out")
      .outputMode("append").start()
    // customer 1: store row within ±2min band -> match
    // customer 2: store row 5min later -> out of band -> null pad
    // customer 3: no store row at all -> null pad
    cust.addData((1, 100, ts(10)), (2, 200, ts(10)), (3, 300, ts(10)))
    store.addData((100, "InBand", ts(11)), (200, "OutOfBand", ts(15)))
    q.processAllAvailable()
    // advance both watermarks far past the band so left-outer nulls emit
    cust.addData((99, 999, ts(40)))
    store.addData((999, "Late", ts(40)))
    q.processAllAvailable()
    cust.addData((98, 998, ts(55)))
    store.addData((998, "Later", ts(55)))
    runToCompletion(q)
    val rows = spark.table("store_out").as[(Int, Option[String])].collect()
      .filter(r => r._1 <= 3).toMap
    assert(rows == Map(1 -> Some("InBand"), 2 -> None, 3 -> None))
  }

  test("CDF-modeled stream: deletes and pre-images dropped, inner join over post-images (dim_customer shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val custCdf = MemoryStream[(Int, Int, String, Timestamp)] // (cust_id, person_fk, _change_type, t)
    val persCdf = MemoryStream[(Int, String, String, Timestamp)] // (person_id, name, _change_type, t)
    val cdf1 = custCdf.toDF().toDF("cust_id", "person_fk", "_change_type", "c_time")
    val cdf2 = persCdf.toDF().toDF("person_id", "person_name", "_change_type", "p_time")
    val joined = Streams.cdfInnerJoin(
      cdf1, cdf2.withColumnRenamed("_change_type", "_change_type2")
        .withColumnRenamed("_change_type2", "_change_type"),
      col("person_fk") === col("person_id"), "c_time", "p_time")
      .select(col("cust_id"), col("person_name"))
    val q = joined.writeStream.format("memory").queryName("cdf_out")
      .outputMode("append").start()
    custCdf.addData(
      (1, 11, "insert", ts(0)),
      (2, 22, "insert", ts(0)),
      (3, 33, "delete", ts(1))) // dropped by CDF apply
    persCdf.addData(
      (11, "Ann v0", "update_preimage", ts(0)), // dropped
      (11, "Ann", "update_postimage", ts(0)),
      (22, "Bob", "insert", ts(1)),
      (33, "Cyd", "insert", ts(1)))
    runToCompletion(q)
    val rows = spark.table("cdf_out").as[(Int, String)].collect().toSet
    assert(rows == Set((1, "Ann"), (2, "Bob")))
  }
}
