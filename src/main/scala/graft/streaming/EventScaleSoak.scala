package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.Tables

/** Scale sighting for the STREAMING surface (run manually per round,
  * not in `sbt test`): drives the streaming twins — Holt, Holt-Winters,
  * RFM, target-encode, the sliding HLL register sketch — plus the
  * watermarked interval-join and exactly-once-dedup paths over a REAL
  * scaled corpus (a MakeScale events/orders dir, 10× = 1M events) on
  * the RocksDB state-store provider, and prints one JSON line per
  * operator with throughput (rows/s), peak/final state rows AND bytes,
  * final watermark lag, and the key count — so "state grows with keys,
  * not with the stream" is a measured trend, not a spec-scale claim.
  *
  * The batch side has 1×→100× sighting chains; this is the streaming
  * side's equivalent. MemoryStream feeds event-time-ordered batches
  * (the operators' documented in-order contract); state is sampled
  * from `lastProgress.stateOperators` after each micro-batch.
  *
  * Usage: runMain graft.streaming.EventScaleSoak <scaledDir> [batches]
  *
  * Scale bound: the event-time-ordered feeds are COLLECTED to the
  * driver (MemoryStream's contract), ~100 B/event — the documented
  * ceiling is the 10× corpus (1M events + 1.5M orders ≈ 250 MB on the
  * default driver heap). Pointing it at the 60×/100× dirs the batch
  * sightings use risks a driver OOM before the first micro-batch; the
  * startup line below names the corpus size so an over-scale run
  * fails loudly AND attributably. At-scale streaming evidence past
  * 10× belongs to a partitioned file source, not a bigger driver.
  */
object EventScaleSoak {

  private def iso(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString

  private def parseIso(s: String): Long =
    java.time.Instant.parse(s).toEpochMilli

  /** Drives `batches` rounds of `feed` against a started query and
    * emits the soak line. `feed(i)` returns (rowsFed, maxEventTimeMs;
    * ms = 0 for event-time-free operators). */
  private def soak(label: String, q: StreamingQuery, nKeys: Long,
      batches: Int)(feed: Int => (Long, Long)): String = {
    var fed = 0L
    var maxEv = 0L
    var peakRows = 0L
    var peakBytes = 0L
    var finalRows = 0L
    var finalBytes = 0L
    val t0 = System.nanoTime()
    var i = 0
    while (i < batches) {
      val (r, m) = feed(i)
      fed += r
      maxEv = math.max(maxEv, m)
      q.processAllAvailable()
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty) {
        val rows = p.stateOperators.map(_.numRowsTotal).sum
        val bytes = p.stateOperators.map(_.memoryUsedBytes).sum
        peakRows = math.max(peakRows, rows)
        peakBytes = math.max(peakBytes, bytes)
        finalRows = rows
        finalBytes = bytes
      }
      i += 1
    }
    val wall = (System.nanoTime() - t0) / 1e9
    // final watermark lag vs the max event time fed (event-time ops
    // only; NoTimeout state ops carry no watermark -> -1). An
    // epoch-zero watermark means it never advanced past its initial
    // value (e.g. too few batches) — that is ABSENCE, not a
    // multi-decade lag, so it takes the same -1 sentinel; likewise
    // when no event time was fed at all (maxEv == 0).
    val lagS = Option(q.lastProgress)
      .flatMap(p => Option(p.eventTime.get("watermark")))
      .map(parseIso)
      .filter(wm => wm > 0L && maxEv > 0L)
      .map(wm => (maxEv - wm) / 1000.0)
      .getOrElse(-1.0)
    f"""{"soak":"$label","input_rows":$fed,"batches":$batches,""" +
      f""""wall_s":$wall%.2f,"rows_per_s":${fed / math.max(wall, 1e-9)}%.0f,""" +
      f""""peak_state_rows":$peakRows,"final_state_rows":$finalRows,""" +
      f""""peak_state_bytes":$peakBytes,"final_state_bytes":$finalBytes,""" +
      f""""keys":$nKeys,""" +
      f""""final_rows_per_key":${finalRows.toDouble / math.max(nKeys, 1L)}%.3f,""" +
      f""""final_watermark_lag_s":$lagS%.1f}"""
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val batches = if (args.length > 1) args(1).toInt else 40
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Streams.useRocksDbStateStore(spark)

    // ---- event-time-ordered driver-side feeds (collected once) ----
    // Guard BEFORE the collect: past ~2M events the driver-side feed
    // array outgrows the default heap mid-collect, which dies as an
    // unattributable executor OOM. Fail first, name the corpus.
    val nEvents = Tables.load(spark, dir, "events").count()
    require(nEvents <= 2000000L,
      s"EventScaleSoak feeds are driver-collected (documented ceiling: " +
        s"the 10x corpus, ~1M events); $dir has $nEvents events. " +
        "Use the batch sighting chain for larger corpora.")
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val nUsers = ev.map(_._3).distinct.length.toLong
    val evSlice = (i: Int) => {
      val lo = (ev.length.toLong * i / batches).toInt
      val hi = (ev.length.toLong * (i + 1) / batches).toInt
      ev.slice(lo, hi)
    }
    println(s"""{"soak_corpus":"$dir","events":${ev.length},""" +
      s""""users":$nUsers,"batches":$batches}""")

    val lines = scala.collection.mutable.ArrayBuffer.empty[String]

    // ---- 1. exactly-once ingestion dedup (state = keys inside the
    // watermark window; the one op whose state is allowed to track the
    // in-window EVENT rate, never the full stream)
    locally {
      val in = MemoryStream[(Long, Timestamp, Long, String)]
      val out = Streams.dedupWithinWatermark(
        in.toDF().toDF("event_id", "ts", "user_id", "event_type"),
        "ts", Seq("event_id"), "10 minutes")
      val q = out.writeStream.format("noop").outputMode("append").start()
      try {
        lines += soak("dedup_within_watermark", q, ev.length.toLong, batches) { i =>
          val s = evSlice(i)
          if (s.nonEmpty) in.addData(s.toIndexedSeq: _*)
          (s.length.toLong, if (s.isEmpty) 0L else s.map(_._2.getTime).max)
        }
      } finally { q.stop(); q.awaitTermination() }
    }

    // ---- 2. watermarked interval join at event volume on both sides
    locally {
      val left = MemoryStream[(Long, Timestamp, Long)]
      val right = MemoryStream[(Long, Timestamp, String)]
      val l = Streams.watermarked(
        left.toDF().toDF("id", "l_time", "key_fk"), "l_time", "5 minutes")
      val r = Streams.watermarked(
        right.toDF().toDF("key", "r_time", "tag"), "r_time", "5 minutes")
      val joined = Streams.intervalJoinLeft(l, r,
        col("key_fk") === col("key"),
        leftTime = "l_time", rightTime = "r_time",
        lower = "2 minutes", upper = "2 minutes")
      val q = joined.writeStream.format("noop").outputMode("append").start()
      try {
        lines += soak("interval_join_left", q, nUsers, batches) { i =>
          val s = evSlice(i)
          if (s.nonEmpty) {
            left.addData(s.map(e => (e._1, e._2, e._3)).toIndexedSeq: _*)
            right.addData(s.map(e => (e._3, e._2, e._4)).toIndexedSeq: _*)
          }
          (2L * s.length, if (s.isEmpty) 0L else s.map(_._2.getTime).max)
        }
      } finally { q.stop(); q.awaitTermination() }
    }

    // ---- 3. sliding HLL register sketch (state <= types * 2^p cells)
    locally {
      val in = MemoryStream[(String, Long)]
      val out = SketchStream.registers(
        in.toDF().toDF("event_type", "user_id"))
      val q = out.writeStream.format("noop").outputMode("update").start()
      try {
        val types = ev.map(_._4).distinct.length.toLong
        lines += soak("sliding_hll_registers", q,
          types * (1L << graft.ops.Curation.HllP), batches) { i =>
          val s = evSlice(i)
          if (s.nonEmpty) in.addData(s.map(e => (e._4, e._3)).toIndexedSeq: _*)
          (s.length.toLong, 0L)
        }
      } finally { q.stop(); q.awaitTermination() }
    }

    // ---- 4. target-encode (state = one row per user)
    locally {
      val in = MemoryStream[TargetEncodeStream.EventRow]
      val q = TargetEncodeStream.targetCounts(in.toDS())
        .writeStream.format("noop").outputMode("append").start()
      try {
        lines += soak("target_encode", q, nUsers, batches) { i =>
          val s = evSlice(i)
          if (s.nonEmpty) in.addData(s.map(e =>
            TargetEncodeStream.EventRow(e._3, e._4)).toIndexedSeq: _*)
          (s.length.toLong, 0L)
        }
      } finally { q.stop(); q.awaitTermination() }
    }

    // ---- 5. RFM over the scaled orders feed (state = one row per cust)
    locally {
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_custkey"),
          (unix_timestamp(col("o_orderdate").cast("timestamp")) / 86400L)
            .cast("long").as("day"),
          (col("o_totalprice") * 100).cast("long").as("cents"))
        .orderBy(col("day"), col("o_custkey"))
        .collect()
        .map(r => RfmStream.OrderRow(r.getLong(0), r.getLong(1), r.getLong(2)))
      val nCust = ord.map(_.o_custkey).distinct.length.toLong
      val in = MemoryStream[RfmStream.OrderRow]
      val q = RfmStream.rfm(in.toDS())
        .writeStream.format("noop").outputMode("append").start()
      try {
        lines += soak("rfm", q, nCust, batches) { i =>
          val lo = (ord.length.toLong * i / batches).toInt
          val hi = (ord.length.toLong * (i + 1) / batches).toInt
          val s = ord.slice(lo, hi)
          if (s.nonEmpty) in.addData(s.toIndexedSeq: _*)
          (s.length.toLong, 0L)
        }
      } finally { q.stop(); q.awaitTermination() }
    }

    // ---- 6/7. Holt + Holt-Winters over the hourly per-type counts
    // derived from the scaled events (key-bounded: |event_types| rows
    // of state; input volume scales with DENSITY, not rows — the time
    // range is fixed by MakeScale's design)
    locally {
      val hourly = Tables.load(spark, dir, "events")
        .groupBy(col("event_type"),
          (unix_timestamp(col("ts")) / 3600L).cast("long").as("h"))
        .agg(count(lit(1)).as("x"))
        .orderBy(col("h"), col("event_type"))
        .collect()
        .map(r => HoltStream.HourCount(r.getString(0), r.getLong(1), r.getLong(2)))
      val nTypes = hourly.map(_.event_type).distinct.length.toLong
      locally {
        val in = MemoryStream[HoltStream.HourCount]
        val q = HoltStream.holt(in.toDS())
          .writeStream.format("noop").outputMode("append").start()
        try {
          lines += soak("holt", q, nTypes, batches) { i =>
            val lo = (hourly.length.toLong * i / batches).toInt
            val hi = (hourly.length.toLong * (i + 1) / batches).toInt
            val s = hourly.slice(lo, hi)
            if (s.nonEmpty) in.addData(s.toIndexedSeq: _*)
            (s.length.toLong, 0L)
          }
        } finally { q.stop(); q.awaitTermination() }
      }
      locally {
        val in = MemoryStream[HwStream.HourCount]
        val q = HwStream.holtWinters(in.toDS())
          .writeStream.format("noop").outputMode("append").start()
        try {
          lines += soak("holt_winters", q, nTypes, batches) { i =>
            val lo = (hourly.length.toLong * i / batches).toInt
            val hi = (hourly.length.toLong * (i + 1) / batches).toInt
            val s = hourly.slice(lo, hi)
            if (s.nonEmpty) in.addData(s.map(h =>
              HwStream.HourCount(h.event_type, h.h, h.x)).toIndexedSeq: _*)
            (s.length.toLong, 0L)
          }
        } finally { q.stop(); q.awaitTermination() }
      }
    }

    lines.foreach(println)
    spark.stop()
  }
}
