package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Tables

/** Decomposes the streaming micro-batch throughput floor: the r11 soak
  * measured 20–79 k rows/s at local[8] and called it "micro-batch-floor
  *-bound" without saying what the floor is MADE of. This probe sweeps
  * the batch count over the SAME corpus (same total rows, so per-batch
  * fixed cost scales with batch count while per-row cost doesn't) for
  * one key-bounded fold (RFM) and one watermarked stream-stream join
  * (the interval join), and attributes wall time from the progress
  * metrics Spark already reports per trigger:
  *   - durationMs: addBatch (execution), getBatch/latestOffset (source),
  *     queryPlanning, walCommit + commitOffsets (offset-log fsyncs),
  *     triggerExecution (the whole trigger);
  *   - stateOperators: allUpdatesTimeMs / allRemovalsTimeMs /
  *     commitTimeMs (state-store work inside addBatch).
  * With N_total fixed, wall(b batches) ≈ rows·c_row + b·c_batch: the
  * two sweep endpoints identify c_batch directly, and the durationMs
  * split names which component c_batch lives in (planning + offset-log
  * fsyncs + state commit are per-TRIGGER costs; addBatch-minus-state
  * scales with rows). The projected steady-state ceiling is then
  * rows/s at b→small, i.e. c_row alone.
  *
  * RocksDB provider, same conventions as EventScaleSoak (driver-
  * collected feeds, 10× ceiling). Usage:
  *   runMain graft.streaming.FloorProbe <scaledDir> [batchCounts]
  * batchCounts default "40,10,4".
  */
object FloorProbe {

  private def sumDur(q: StreamingQuery, key: String): Long =
    q.recentProgress.iterator.map { p =>
      Option(p.durationMs.get(key)).map(_.longValue).getOrElse(0L)
    }.sum

  private def sumState(q: StreamingQuery,
      f: org.apache.spark.sql.streaming.StateOperatorProgress => Long): Long =
    q.recentProgress.iterator.map(_.stateOperators.map(f).sum).sum

  private def probe(label: String, nBatches: Int, rows: Long,
      start: () => StreamingQuery, feed: Int => Unit): String = {
    val t0 = System.nanoTime()
    val q = start()
    try {
      var i = 0
      while (i < nBatches) { feed(i); q.processAllAvailable(); i += 1 }
      val wall = (System.nanoTime() - t0) / 1e9
      val triggers = q.recentProgress.length.toLong
      val addBatch = sumDur(q, "addBatch")
      val source = sumDur(q, "getBatch") + sumDur(q, "latestOffset")
      val planning = sumDur(q, "queryPlanning")
      val offsetLog = sumDur(q, "walCommit") + sumDur(q, "commitOffsets")
      val trigger = sumDur(q, "triggerExecution")
      val stCommit = sumState(q, _.commitTimeMs)
      val stUpdate = sumState(q, _.allUpdatesTimeMs)
      val stRemove = sumState(q, _.allRemovalsTimeMs)
      f"""{"floor":"$label","batches":$nBatches,"triggers":$triggers,""" +
        f""""rows":$rows,"wall_s":$wall%.2f,""" +
        f""""rows_per_s":${rows / math.max(wall, 1e-9)}%.0f,""" +
        f""""trigger_ms":$trigger,"addBatch_ms":$addBatch,""" +
        f""""source_ms":$source,"planning_ms":$planning,""" +
        f""""offset_log_ms":$offsetLog,"state_commit_ms":$stCommit,""" +
        f""""state_update_ms":$stUpdate,"state_remove_ms":$stRemove,""" +
        f""""harness_ms":${(wall * 1000).toLong - trigger}}"""
    } finally { q.stop(); q.awaitTermination() }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val counts = (if (args.length > 1) args(1) else "40,10,4")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // keep every trigger's progress visible to the sums above
      .config("spark.sql.streaming.numRecentProgressUpdates",
        (counts.max * 4).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    Streams.useRocksDbStateStore(spark)

    val nEvents = Tables.load(spark, dir, "events").count()
    require(nEvents <= 2000000L,
      s"FloorProbe feeds are driver-collected (ceiling: the 10x corpus); " +
        s"$dir has $nEvents events.")
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        (unix_timestamp(col("o_orderdate").cast("timestamp")) / 86400L)
          .cast("long").as("day"),
        (col("o_totalprice") * 100).cast("long").as("cents"))
      .orderBy(col("day"), col("o_custkey"))
      .collect()
      .map(r => RfmStream.OrderRow(r.getLong(0), r.getLong(1), r.getLong(2)))
    println(s"""{"floor_corpus":"$dir","events":${ev.length},""" +
      s""""orders":${ord.length},"batch_counts":[${counts.mkString(",")}]}""")

    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    counts.foreach { b =>
      // key-bounded fold: RFM over the orders feed
      locally {
        val in = MemoryStream[RfmStream.OrderRow]
        val out = RfmStream.rfm(in.toDS())
        lines += probe("rfm", b, ord.length.toLong,
          () => out.writeStream.format("noop").outputMode("append").start(),
          i => {
            val lo = (ord.length.toLong * i / b).toInt
            val hi = (ord.length.toLong * (i + 1) / b).toInt
            val s = ord.slice(lo, hi)
            if (s.nonEmpty) in.addData(s.toIndexedSeq: _*)
          })
      }
      // watermarked stream-stream join: the interval join at event
      // volume on both sides
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
        lines += probe("interval_join_left", b, 2L * ev.length,
          () => joined.writeStream.format("noop").outputMode("append").start(),
          i => {
            val lo = (ev.length.toLong * i / b).toInt
            val hi = (ev.length.toLong * (i + 1) / b).toInt
            val s = ev.slice(lo, hi)
            if (s.nonEmpty) {
              left.addData(s.map(e => (e._1, e._2, e._3)).toIndexedSeq: _*)
              right.addData(s.map(e => (e._3, e._2, e._4)).toIndexedSeq: _*)
            }
          })
      }
    }
    lines.foreach(println)
    spark.stop()
  }
}
