package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Nightly-style 100× streaming-state soak (run manually per round, not
  * in `sbt test` — the 10×/40-round versions in StateBoundSpec stay the
  * CI gate). Drives the two stateful shapes whose 100 TB viability
  * rests on bounded state — the watermarked interval join (state =
  * sliding band) and the wallet fold (state = one row per key) — for
  * 800 / 400 micro-batch rounds on the RocksDB provider, and prints a
  * JSON line per soak with the peak/final state rows AND bytes plus
  * first-vs-second-half peaks, turning the bounded-state claim into a
  * measured trend line (r5 verdict item 8).
  *
  * Exit code 1 if any bound is violated, so a cron/driver run fails
  * loudly.
  */
object StateSoak {
  private def stats(sizes: Seq[(Long, Long)], label: String,
      boundRows: Long): (String, Boolean) = {
    val rows = sizes.map(_._1)
    val bytes = sizes.map(_._2)
    val n = sizes.length
    val firstHalfPeak = rows.slice(2, n / 2).max
    val secondHalfPeak = rows.drop(n / 2).max
    val ok = rows.max <= boundRows &&
      secondHalfPeak <= firstHalfPeak + boundRows / 3
    val line = s"""{"soak":"$label","rounds":$n,""" +
      s""""peak_rows":${rows.max},"final_rows":${rows.last},""" +
      s""""first_half_peak_rows":$firstHalfPeak,""" +
      s""""second_half_peak_rows":$secondHalfPeak,""" +
      s""""peak_bytes":${bytes.max},"final_bytes":${bytes.last},""" +
      s""""bound_rows":$boundRows,"ok":$ok}"""
    (line, ok)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Streams.useRocksDbStateStore(spark)
    var allOk = true

    // ---- interval-join soak: 800 rounds (100x the HDFS-provider spec)
    locally {
      def ts(minute: Int): Timestamp = Timestamp.valueOf(
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
      val q = joined.writeStream.format("noop").outputMode("append").start()
      try {
        val rounds = 800
        val perBatch = 100
        val sizes = (0 until rounds).map { round =>
          val base = round * 20
          left.addData((0 until perBatch).map(i =>
            (round * perBatch + i, i, ts(base))): _*)
          right.addData((0 until perBatch).map(i =>
            (i, s"r$round", ts(base + 1))): _*)
          q.processAllAvailable()
          val op = q.lastProgress.stateOperators.head
          (op.numRowsTotal, op.memoryUsedBytes)
        }
        val (line, ok) = stats(sizes, "interval_join_rocksdb_800r",
          boundRows = 6L * perBatch)
        println(line)
        allOk &&= ok
      } finally { q.stop(); q.awaitTermination() }
    }

    // ---- wallet-fold soak: 400 day-rounds (10x the spec), 50 users
    locally {
      val users = 50
      val in = MemoryStream[BalanceStream.DayNet]
      val out = BalanceStream.balances(in.toDS())
      val q = out.writeStream.format("noop").outputMode("append").start()
      try {
        val rounds = 400
        val sizes = (0 until rounds).map { day =>
          in.addData((0 until users).map(u =>
            BalanceStream.DayNet(u.toLong, day.toLong,
              if ((u + day) % 3 == 0) -500L else 300L)): _*)
          q.processAllAvailable()
          val op = q.lastProgress.stateOperators.head
          (op.numRowsTotal, op.memoryUsedBytes)
        }
        // key-bounded: exactly one state row per user, forever
        val (line, ok) = stats(sizes, "wallet_fold_rocksdb_400r",
          boundRows = users.toLong)
        println(line)
        allOk &&= ok && sizes.last._1 == users.toLong
      } finally { q.stop(); q.awaitTermination() }
    }

    spark.stop()
    if (!allOk) sys.exit(1)
  }
}
