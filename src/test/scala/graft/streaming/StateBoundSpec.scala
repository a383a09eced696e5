package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB state argument as a measured invariant (SURVEY.md §3.2):
  * a watermarked stream-stream interval join must hold state bounded
  * by the watermark band — rows older than
  * `watermark − band − delay` are EVICTED, so state is a sliding
  * window over the stream, not the stream. A soak drives event time
  * forward far past the band each round and asserts the state-store
  * row count plateaus instead of accumulating: if eviction were
  * broken (e.g. a missing watermark or a band Spark can't derive a
  * state value watermark from), state would grow linearly with input
  * and no cluster size survives that at 100 TB.
  */
class StateBoundSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp = {
    val h = 10 + minute / 60
    Timestamp.valueOf(f"2024-01-01 $h%02d:${minute % 60}%02d:00")
  }

  test("interval-join state rows plateau at the watermark band under an advancing soak") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[(Int, Int, Timestamp)]  // (id, key, l_time)
    val right = MemoryStream[(Int, String, Timestamp)] // (key, tag, r_time)
    val l = Streams.watermarked(
      left.toDF().toDF("id", "key_fk", "l_time"), "l_time", "5 minutes")
    val r = Streams.watermarked(
      right.toDF().toDF("key", "tag", "r_time"), "r_time", "5 minutes")
    val joined = Streams.intervalJoinLeft(l, r,
      col("key_fk") === col("key"),
      leftTime = "l_time", rightTime = "r_time",
      lower = "2 minutes", upper = "2 minutes")
    val q = joined.writeStream.format("memory").queryName("soak_out")
      .outputMode("append").start()
    try {
      val rounds = 8
      val perBatch = 100
      val stateSizes = (0 until rounds).map { round =>
        // each round lives 20 min after the previous: far outside the
        // ±2 min band + 5 min delay, so prior rounds' state is evictable
        val base = round * 20
        left.addData((0 until perBatch).map(i => (round * perBatch + i, i, ts(base))): _*)
        right.addData((0 until perBatch).map(i => (i, s"r$round", ts(base + 1))): _*)
        q.processAllAvailable()
        q.lastProgress.stateOperators.head.numRowsTotal
      }
      // every in-band pair joined (rows emitted throughout the soak)
      assert(spark.table("soak_out").count() >= (rounds - 1).toLong * perBatch)
      // state plateaus: the high-water mark over the soak stays within
      // a small multiple of ONE round's rows (both sides + the
      // not-yet-evicted previous round), nowhere near the cumulative
      // input (rounds × perBatch × 2 rows)
      val peak = stateSizes.max
      val cumulative = rounds.toLong * perBatch * 2
      assert(peak <= 6L * perBatch,
        s"state never evicted: peak $peak rows vs per-round ${2 * perBatch} " +
          s"(sizes ${stateSizes.mkString(",")})")
      assert(peak < cumulative / 2,
        s"state tracks cumulative input ($peak of $cumulative)")
      // and the final size after the last advance is also banded
      assert(stateSizes.last <= 6L * perBatch)
    } finally {
      q.stop()
      q.awaitTermination()
    }
  }

  test("interval-join state stays band-bounded over a 10x soak on the RocksDB provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the production state-store provider: the 100 TB streaming-state
    // argument measured where it would actually run, over a feed 10x
    // the HDFS-provider soak above
    val prev = Streams.useRocksDbStateStore(spark)
    def tsLong(minute: Int): Timestamp =
      Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(minute.toLong))
    val left = MemoryStream[(Int, Int, Timestamp)]
    val right = MemoryStream[(Int, String, Timestamp)]
    val l = Streams.watermarked(
      left.toDF().toDF("id", "key_fk", "l_time"), "l_time", "5 minutes")
    val r = Streams.watermarked(
      right.toDF().toDF("key", "tag", "r_time"), "r_time", "5 minutes")
    val joined = Streams.intervalJoinLeft(l, r,
      col("key_fk") === col("key"),
      leftTime = "l_time", rightTime = "r_time",
      lower = "2 minutes", upper = "2 minutes")
    val q = joined.writeStream.format("memory").queryName("soak_rocksdb_out")
      .outputMode("append").start()
    try {
      val rounds = 80
      val perBatch = 100
      val stateSizes = (0 until rounds).map { round =>
        val base = round * 20
        left.addData((0 until perBatch).map(i => (round * perBatch + i, i, tsLong(base))): _*)
        right.addData((0 until perBatch).map(i => (i, s"r$round", tsLong(base + 1))): _*)
        q.processAllAvailable()
        q.lastProgress.stateOperators.head.numRowsTotal
      }
      assert(spark.table("soak_rocksdb_out").count() >= (rounds - 1).toLong * perBatch)
      // band-bounded at EVERY round, not just on average: the peak over
      // an 80-round feed stays within the same small multiple of one
      // round's rows the 8-round soak allows — state is a sliding
      // window however long the stream runs
      val peak = stateSizes.max
      assert(peak <= 6L * perBatch,
        s"state never evicted on rocksdb: peak $peak " +
          s"(sizes ${stateSizes.take(10).mkString(",")}...)")
      assert(stateSizes.last <= 6L * perBatch)
      // late half of the soak must look like the early half (no creep)
      val firstHalfMax = stateSizes.slice(2, rounds / 2).max
      val secondHalfMax = stateSizes.drop(rounds / 2).max
      assert(secondHalfMax <= firstHalfMax + 2L * perBatch,
        s"state creeps across the soak: $firstHalfMax -> $secondHalfMax")
    } finally {
      q.stop()
      q.awaitTermination()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("dedup-within-watermark drops redeliveries and evicts key state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // exactly-once ingestion: every batch delivers each id TWICE (the
    // at-least-once redelivery), rounds advance far past the delay so
    // old keys' dedup state must evict — output has each id once,
    // state plateaus at ~one round's keys instead of all keys ever
    val in = MemoryStream[(Long, Timestamp)]
    val deduped = Streams.dedupWithinWatermark(
      in.toDF().toDF("event_id", "ts"), "ts", Seq("event_id"), "5 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode("append").start()
    try {
      val rounds = 8
      val perBatch = 100
      val sizes = (0 until rounds).map { round =>
        val base = round * 20
        val ids = (0 until perBatch).map(i => (round * perBatch + i).toLong)
        // redelivery: same (id, ts) twice in one delivery + a second
        // in-batch duplicate at a slightly later ts
        val delivery: Seq[(Long, Timestamp)] =
          ids.map(id => (id, ts(base))) ++
            ids.map(id => (id, ts(base))) ++
            ids.map(id => (id, ts(base + 1)))
        in.addData(delivery: _*)
        q.processAllAvailable()
        q.lastProgress.stateOperators.head.numRowsTotal
      }
      // exactly once: every id surfaced exactly one time
      val out = spark.table("dedup_wm_out")
      assert(out.count() == rounds.toLong * perBatch)
      assert(out.groupBy(col("event_id")).count()
        .filter(col("count") > 1).count() == 0)
      // key state evicts: the peak stays near one round's key count,
      // nowhere near the rounds × perBatch keys ever seen
      val peak = sizes.max
      assert(peak <= 4L * perBatch,
        s"dedup state never evicted: peak $peak (sizes ${sizes.mkString(",")})")
      // batch twin equivalence: dropDuplicates over the same rows
      val batchIds: Seq[Long] = (0 until rounds).flatMap { round =>
        (0 until perBatch).map(i => (round * perBatch + i).toLong)
      }
      val streamed: Seq[Long] =
        out.select(col("event_id")).as[Long].collect().toSeq
      assert(streamed.sorted == batchIds.sorted)
    } finally {
      q.stop()
      q.awaitTermination()
    }
  }

  test("wallet-fold state is key-bounded over a long feed on RocksDB") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // BalanceStream keeps EXACTLY one 3-long state row per user: over
    // a 40-round feed the state row count must pin at |users| — never
    // at rows seen — on the production provider
    val prev = Streams.useRocksDbStateStore(spark)
    val users = 50
    val in = MemoryStream[BalanceStream.DayNet]
    val out = BalanceStream.balances(in.toDS())
    val q = out.writeStream.format("memory").queryName("wallet_state_soak")
      .outputMode("append").start()
    try {
      val rounds = 40
      val sizes = (0 until rounds).map { day =>
        in.addData((0 until users).map(u =>
          BalanceStream.DayNet(u.toLong, day.toLong,
            if ((u + day) % 3 == 0) -500L else 300L)): _*)
        q.processAllAvailable()
        q.lastProgress.stateOperators.head.numRowsTotal
      }
      assert(sizes.last == users.toLong,
        s"state not key-bounded: ${sizes.takeRight(5).mkString(",")}")
      assert(sizes.max == users.toLong)
      // every user emitted every day, and balances never go negative
      val rows = spark.table("wallet_state_soak")
        .as[BalanceStream.BalanceRow].collect()
      assert(rows.length == users * rounds)
      assert(rows.forall(_.bal >= 0L))
    } finally {
      q.stop()
      q.awaitTermination()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
