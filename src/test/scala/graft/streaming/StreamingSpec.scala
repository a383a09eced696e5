package graft.streaming

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

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

  test("stream-stream FULL OUTER interval join: both sides null-pad after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Int, Int, Timestamp)] // (a_id, key, a_time)
    val b = MemoryStream[(Int, Int, Timestamp)] // (b_id, key, b_time)
    val l = Streams.watermarked(a.toDF().toDF("a_id", "a_key", "a_time"), "a_time")
    val r = Streams.watermarked(b.toDF().toDF("b_id", "b_key", "b_time"), "b_time")
    val joined = Streams.intervalJoinFull(
      l, r, col("a_key") === col("b_key"),
      leftTime = "a_time", rightTime = "b_time",
      lower = "2 minutes", upper = "2 minutes")
      .select(col("a_id"), col("b_id"))
    val q = joined.writeStream.format("memory").queryName("full_out")
      .outputMode("append").start()
    // key 1: matched in band; key 2: only left feed; key 3: only right
    a.addData((1, 1, ts(10)), (2, 2, ts(10)))
    b.addData((11, 1, ts(11)), (13, 3, ts(11)))
    q.processAllAvailable()
    // push both watermarks far past the band so unmatched rows emit
    a.addData((90, 90, ts(40))); b.addData((91, 91, ts(40)))
    q.processAllAvailable()
    a.addData((92, 92, ts(55))); b.addData((93, 93, ts(55)))
    runToCompletion(q)
    val rows = spark.table("full_out").as[(Option[Int], Option[Int])].collect()
      .filter(r => r._1.exists(_ <= 3) || r._2.exists(_ <= 13)).toSet
    assert(rows == Set(
      (Some(1), Some(11)),  // matched pair
      (Some(2), None),      // left-only row null-pads right
      (None, Some(13))))    // right-only row null-pads left
  }

  test("3-way stream-stream LEFT interval join chain (fact_sales shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sod = MemoryStream[(Int, Int, Timestamp)] // (order_id, line_no, d_time)
    val soh = MemoryStream[(Int, Int, Timestamp)] // (order_id, addr_id, h_time)
    val addr = MemoryStream[(Int, String, Timestamp)] // (addr_id, city, a_time)
    val d = Streams.watermarked(sod.toDF().toDF("order_id", "line_no", "d_time"), "d_time")
    val h = Streams.watermarked(soh.toDF().toDF("h_order_id", "addr_fk", "h_time"), "h_time")
    val a = Streams.watermarked(addr.toDF().toDF("addr_id", "city", "a_time"), "a_time")
    // bands [-2 min, +5 min] as in sales_aw_silver_layer_fact_sales.py:35-47.
    // Both bands anchor on the driving detail's event time (d_time): after a
    // left-outer join, h_time is NULL on unmatched rows, and a null event
    // time can never satisfy the second band nor be evicted — anchoring on
    // the never-null driving time is the semantics-preserving chain.
    val j1 = Streams.intervalJoinLeft(d, h, col("order_id") === col("h_order_id"),
      "d_time", "h_time", "2 minutes", "5 minutes")
    val j2 = Streams.intervalJoinLeft(j1, a, col("addr_fk") === col("addr_id"),
      "d_time", "a_time", "2 minutes", "5 minutes")
      .select(col("order_id"), col("line_no"), col("city"))
    val q = j2.writeStream.format("memory").queryName("fact_out")
      .outputMode("append").start()
    sod.addData((1, 1, ts(10)), (2, 1, ts(10)))
    soh.addData((1, 500, ts(12))) // in band for order 1; order 2 has no header
    addr.addData((500, "Lisbon", ts(13)))
    q.processAllAvailable()
    sod.addData((9, 9, ts(40))); soh.addData((9, 9, ts(40))); addr.addData((9, "x", ts(40)))
    q.processAllAvailable()
    sod.addData((8, 8, ts(55))); soh.addData((8, 8, ts(55))); addr.addData((8, "y", ts(55)))
    runToCompletion(q)
    val rows = spark.table("fact_out").as[(Int, Int, Option[String])].collect()
      .filter(_._1 <= 2).toSet
    assert(rows == Set((1, 1, Some("Lisbon")), (2, 1, None)))
  }

  test("streaming dedup within watermark drops replayed events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[(Long, Timestamp)]
    val deduped = ev.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    ev.addData((1L, ts(0)), (2L, ts(1)), (1L, ts(2))) // replay of id 1
    q.processAllAvailable()
    ev.addData((1L, ts(3)), (3L, ts(4))) // replay again, one new
    runToCompletion(q)
    val ids = spark.table("dedup_out").as[(Long, Timestamp)].collect().map(_._1).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L))
  }

  test("watermarked tumbling-window aggregation emits closed windows only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[(Long, Timestamp, Double)]
    val agg = ev.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("wstart"), col("user_id"), col("n"), col("total"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    ev.addData((1L, ts(1), 10.0), (1L, ts(5), 20.0), (2L, ts(7), 5.0))
    q.processAllAvailable()
    assert(spark.table("win_out").count() == 0) // window [10:00,10:10) still open
    ev.addData((1L, ts(30), 1.0)) // watermark -> 10:29 closes it
    q.processAllAvailable()
    ev.addData((1L, ts(55), 1.0))
    runToCompletion(q)
    val rows = spark.table("win_out")
      .as[(Timestamp, Long, Long, Double)].collect()
      .filter(_._1 == Timestamp.valueOf("2024-01-01 10:00:00")).toSet
    assert(rows == Set(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 2L, 30.0),
      (Timestamp.valueOf("2024-01-01 10:00:00"), 2L, 1L, 5.0)))
  }

  test("flatMapGroupsWithState sessionization: session emits after gap timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[Sessionize.Event]
    val out = Sessionize.sessions(spark, ev.toDS(), gapMillis = 2 * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    ev.addData(
      Sessionize.Event(1L, ts(0), 10.0),
      Sessionize.Event(1L, ts(1), 5.0),
      Sessionize.Event(2L, ts(0), 7.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0) // sessions still open
    ev.addData(Sessionize.Event(3L, ts(30), 1.0)) // advances watermark past timeouts
    q.processAllAvailable()
    ev.addData(Sessionize.Event(3L, ts(55), 1.0))
    runToCompletion(q)
    val rows = spark.table("sess_out").as[Sessionize.Session].collect()
      .filter(_.user_id <= 2).map(s => (s.user_id, s.n_events, s.total_value)).toSet
    assert(rows == Set((1L, 2, 15.0), (2L, 1, 7.0)))
  }

  test("streaming passthrough materializes to a parquet sink with checkpoint (bronze @dp.table shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Int, String)]
    val out = java.nio.file.Files.createTempDirectory("bronze_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("bronze_ckpt").toString
    val q = src.toDF().toDF("id", "payload").writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    src.addData((1, "a"), (2, "b"), (3, "c"))
    runToCompletion(q)
    val persisted = spark.read.parquet(out)
    assert(persisted.count() == 3)
    assert(persisted.columns.toSeq == Seq("id", "payload"))
  }

  test("streaming SCD-1 applies latest-version updates and deletes per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ch = MemoryStream[Scd1.Change]
    val out = Scd1.currentState(spark, ch.toDS())
    val q = out.writeStream.format("memory").queryName("scd1_out")
      .outputMode("update").start()
    // batch 1: insert A, B; update A (higher version wins within batch);
    // a pre-image that must not apply
    ch.addData(
      Scd1.Change(1L, 1L, "A-v1", "insert"),
      Scd1.Change(1L, 2L, "A-v2-pre", "update_preimage"),
      Scd1.Change(1L, 2L, "A-v2", "update_postimage"),
      Scd1.Change(2L, 1L, "B-v1", "insert"))
    q.processAllAvailable()
    val s1 = spark.table("scd1_out").as[Scd1.CurrentRow].collect()
      .groupBy(_.key).view.mapValues(_.maxBy(_.version)).toMap
    assert(s1(1L) == Scd1.CurrentRow(1L, 2L, "A-v2", deleted = false))
    assert(s1(2L) == Scd1.CurrentRow(2L, 1L, "B-v1", deleted = false))
    // batch 2: delete A (applied, emitted as tombstone); stale
    // out-of-order update for B must NOT regress the row
    ch.addData(
      Scd1.Change(1L, 3L, null, "delete"),
      Scd1.Change(2L, 0L, "B-v0-stale", "update_postimage"))
    runToCompletion(q)
    val s2 = spark.table("scd1_out").as[Scd1.CurrentRow].collect()
      .groupBy(_.key).view.mapValues(_.maxBy(_.version)).toMap
    assert(s2(1L).deleted && s2(1L).version == 3L)
    assert(s2(2L) == Scd1.CurrentRow(2L, 1L, "B-v1", deleted = false))
  }

  test("SCD-1 emits nothing for a batch carrying only pre-images of an unseen key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ch = MemoryStream[Scd1.Change]
    val out = Scd1.currentState(spark, ch.toDS())
    val q = out.writeStream.format("memory").queryName("scd1_pre_out")
      .outputMode("update").start()
    ch.addData(
      Scd1.Change(7L, 1L, "ghost-pre", "update_preimage"), // unseen key: no output, no state
      Scd1.Change(8L, 1L, "real", "insert"))
    q.processAllAvailable()
    val s1 = spark.table("scd1_pre_out").as[Scd1.CurrentRow].collect()
    assert(s1.map(_.key).toSet == Set(8L), s"fabricated row for key 7: ${s1.toSeq}")
    // the key later genuinely inserts — state starts clean
    ch.addData(Scd1.Change(7L, 2L, "now-real", "insert"))
    runToCompletion(q)
    val s2 = spark.table("scd1_pre_out").as[Scd1.CurrentRow].collect()
      .groupBy(_.key).view.mapValues(_.maxBy(_.version)).toMap
    assert(s2(7L) == Scd1.CurrentRow(7L, 2L, "now-real", deleted = false))
  }

  test("SCD-1 batch and streaming agree on a feed compacting several change types into one version") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // key 1: insert+delete at v1 → delete outranks → suppressed/tombstone
    // key 2: insert+postimage at v1 → postimage outranks
    val feed = Seq(
      Scd1.Change(1L, 1L, "A", "insert"),
      Scd1.Change(1L, 1L, null, "delete"),
      Scd1.Change(2L, 1L, "B-ins", "insert"),
      Scd1.Change(2L, 1L, "B-post", "update_postimage"))
    val batchDf = feed.toDF()
      .withColumnRenamed("version", "_commit_version")
      .withColumnRenamed("change_type", "_change_type")
    val batch = Streams.scd1Apply(batchDf, Seq("key"))
      .select(col("key"), col("_commit_version").as("version"), col("payload"))
      .as[(Long, Long, String)].collect().toSet
    assert(batch == Set((2L, 1L, "B-post")))
    val ch = MemoryStream[Scd1.Change]
    val q = Scd1.currentState(spark, ch.toDS()).writeStream.format("memory")
      .queryName("scd1_rank_out").outputMode("update").start()
    ch.addData(feed: _*)
    runToCompletion(q)
    val stream = spark.table("scd1_rank_out").as[Scd1.CurrentRow].collect()
      .groupBy(_.key).view.mapValues(_.maxBy(_.version)).toMap
    assert(stream(1L).deleted && stream(1L).version == 1L)
    assert(stream(2L) == Scd1.CurrentRow(2L, 1L, "B-post", deleted = false))
  }

  test("stateful streaming runs on the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = Streams.useRocksDbStateStore(spark)
    try {
      val ev = MemoryStream[(Long, Timestamp)]
      val deduped = ev.toDF().toDF("event_id", "ts")
        .withWatermark("ts", "5 minutes")
        .dropDuplicatesWithinWatermark("event_id")
      val q = deduped.writeStream.format("memory").queryName("rocksdb_out")
        .outputMode("append").start()
      ev.addData((1L, ts(0)), (2L, ts(1)), (1L, ts(2)))
      q.processAllAvailable()
      val metrics = q.lastProgress.stateOperators.head.customMetrics
      assert(metrics.keySet.asScala.exists(_.startsWith("rocksdb")),
        s"state metrics carry no rocksdb counters: ${metrics.keySet}")
      ev.addData((3L, ts(3)))
      runToCompletion(q)
      val ids = spark.table("rocksdb_out").as[(Long, Timestamp)].collect()
        .map(_._1).toSeq.sorted
      assert(ids == Seq(1L, 2L, 3L))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
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
