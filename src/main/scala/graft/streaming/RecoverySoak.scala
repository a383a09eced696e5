package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.Tables

/** Checkpoint-recovery sighting for the streaming surface: the
  * property the exactly-once claims rest on — kill a query mid-run,
  * restart it from the RocksDB checkpoint, and the FILE-SINK output is
  * row-identical to an uninterrupted run while state resumes at its
  * pre-kill level. EventScaleSoak proves state stays bounded while a
  * query RUNS; this proves the run can DIE and nothing is lost or
  * duplicated.
  *
  * Per operator (exactly-once dedup, watermarked interval join, RFM
  * key-bounded fold) three runs share identical batch slices of the
  * REAL scaled corpus:
  *   - baseline: uninterrupted, parquet sink A + checkpoint A;
  *   - kill=between: stop AFTER batch k commits, restart from the
  *     checkpoint, feed the rest — exercises offset resume + state
  *     reload from RocksDB files;
  *   - kill=during: stop IMMEDIATELY after batch k's data is added,
  *     without waiting for the commit — the batch is re-executed from
  *     the WAL on restart, and the file sink's metadata log must
  *     dedupe whatever the killed attempt half-wrote (reading the sink
  *     dir honors `_spark_metadata`, so orphan files are invisible —
  *     that IS the exactly-once mechanism under test).
  *
  * Equality is multiset equality on the sink read-back (count + sum of
  * xxhash64 over canonicalized columns). For RFM — whose per-row
  * emissions are running per-key triples, so the multiset depends on
  * within-batch arrival order that a replay is not contractually bound
  * to preserve — the strict assertion is the FINAL row per key (the
  * serving-store contract, order-free by the (max,count,sum) monoid
  * argument in [[RfmStream]]) plus the output COUNT (one row per input
  * order = no loss, no duplication); the full-multiset bit is still
  * reported.
  *
  * Driver-collected feeds, same ceiling as EventScaleSoak (10×
  * corpus). Usage:
  *   runMain graft.streaming.RecoverySoak <scaledDir> [batches] [killAt]
  */
object RecoverySoak {

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-recov-$tag")
    p.toString
  }

  /** (rows, sum(xxhash64(all cols as string))) over a sink read-back;
    * the read honors the sink's _spark_metadata commit log. */
  private def sinkDigest(spark: SparkSession, path: String): (Long, String) = {
    val df = spark.read.parquet(path)
    val r = df
      .select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
      .agg(count(lit(1)).as("n"), sum(col("h").cast("decimal(38,0)")).as("s"))
      .head()
    (r.getLong(0), Option(r.getDecimal(1)).map(_.toString).getOrElse("null"))
  }

  /** Latest row per key for the RFM sink (f_cnt is monotone per key,
    * so max f identifies the final emission without a timestamp). */
  private def rfmFinalDigest(spark: SparkSession, path: String): String = {
    val df = spark.read.parquet(path)
    val w = df.groupBy(col("o_custkey"))
      .agg(max(struct(col("f_cnt"), col("r_day"), col("m_cents"))).as("s"))
      .select(col("o_custkey"), col("s.f_cnt"), col("s.r_day"), col("s.m_cents"))
    val r = w.select(xxhash64(w.columns.map(c => col(c).cast("string")): _*)
        .as("h"))
      .agg(sum(col("h").cast("decimal(38,0)"))).head()
    Option(r.getDecimal(0)).map(_.toString).getOrElse("null")
  }

  private def stateRows(q: StreamingQuery): Long =
    Option(q.lastProgress).filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)

  /** One run of one operator. `start` opens the query on a FIXED
    * (sink, checkpoint) pair so a restart resumes; `feed(i)` pushes
    * batch i's slice. killMode "none" never stops; "between" stops
    * after batch `kill` commits (offset resume + state reload from the
    * RocksDB files); "during" stops right after batch `kill`'s data
    * lands WITHOUT waiting for the commit (WAL re-execution + sink
    * metadata-log dedup). Returns the per-batch state-row trajectory —
    * a killed arm proving recovery must rejoin the baseline's
    * trajectory at every batch after the restart — plus the wall. */
  private def run(start: () => StreamingQuery, feed: Int => Unit,
      batches: Int, kill: Int, killMode: String): (Array[Long], Double) = {
    val t0 = System.nanoTime()
    var q = start()
    val traj = Array.fill(batches)(-1L)
    var i = 0
    while (i < batches) {
      feed(i)
      if (kill == i && killMode == "during") {
        // the added batch may be mid-flight; this is the hard kill
        q.stop(); q.awaitTermination()
        q = start()
        q.processAllAvailable() // re-executes batch i from the WAL
        traj(i) = stateRows(q)
      } else {
        q.processAllAvailable()
        traj(i) = stateRows(q)
        if (kill == i && killMode == "between") {
          q.stop(); q.awaitTermination()
          q = start()
          q.processAllAvailable() // no new data: offset resume only
        }
      }
      i += 1
    }
    val wall = (System.nanoTime() - t0) / 1e9
    q.stop(); q.awaitTermination()
    (traj, wall)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val batches = if (args.length > 1) args(1).toInt else 40
    val killAt = if (args.length > 2) args(2).toInt else batches / 2
    require(killAt > 0 && killAt < batches - 1,
      s"killAt must leave batches on both sides of the kill: " +
        s"got killAt=$killAt of $batches")
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

    val nEvents = Tables.load(spark, dir, "events").count()
    require(nEvents <= 2000000L,
      s"RecoverySoak feeds are driver-collected (ceiling: the 10x corpus); " +
        s"$dir has $nEvents events.")
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val evSlice = (i: Int) => {
      val lo = (ev.length.toLong * i / batches).toInt
      val hi = (ev.length.toLong * (i + 1) / batches).toInt
      ev.slice(lo, hi)
    }
    println(s"""{"recovery_corpus":"$dir","events":${ev.length},""" +
      s""""batches":$batches,"kill_at":$killAt}""")

    val lines = scala.collection.mutable.ArrayBuffer.empty[String]

    /** Baseline + the two kill modes over a fresh source per run;
      * digests compared on the sink read-backs. */
    def soakOp(label: String,
        mk: () => (Int => Unit, DataFrame),
        strictDigest: (SparkSession, String) => String): Unit = {
      val arms = Seq("none", "between", "during")
      val digests = arms.map { mode =>
        val (feed, out) = mk()
        val sink = freshDir(s"$label-$mode-sink")
        val ckpt = freshDir(s"$label-$mode-ckpt")
        val start = () => out.writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .outputMode("append").start()
        val (traj, wall) = run(start, feed, batches, killAt, mode)
        val (n, h) = sinkDigest(spark, sink)
        val strict = strictDigest(spark, sink)
        (mode, n, h, strict, traj, wall)
      }
      val (_, n0, h0, s0, traj0, _) = digests.head
      digests.tail.foreach { case (mode, n, h, strict, traj, wall) =>
        val recovered = n == n0 && strict == s0
        // post-restart trajectory must rejoin the baseline's: the
        // between-kill compares from batch killAt+1 (batch killAt ran
        // pre-kill), the during-kill from batch killAt itself (the
        // killed batch was re-executed from the WAL after restart)
        val from = if (mode == "during") killAt else killAt + 1
        val rejoined = (from until batches).forall(i => traj(i) == traj0(i))
        lines += (s"""{"recovery":"$label","mode":"$mode",""" +
          s""""kill_at":$killAt,"batches":$batches,""" +
          s""""rows_base":$n0,"rows_recovered":$n,""" +
          s""""multiset_hash_equal":${h == h0},"strict_digest_equal":${strict == s0},""" +
          s""""pre_kill_state_rows":${if (killAt > 0) traj(killAt - 1) else -1L},""" +
          s""""post_restart_state_rows":${traj(from)},""" +
          s""""state_trajectory_rejoined":$rejoined,""" +
          s""""final_state_rows":${traj.last},"final_state_rows_base":${traj0.last},""" +
          f""""wall_s":$wall%.1f,"recovered":$recovered}""")
      }
    }

    // 1. exactly-once ingestion dedup (event_ids unique in the corpus:
    // the op suppresses nothing, so output == input iff no batch was
    // lost or replayed into the sink twice — the sharpest possible
    // exactly-once check)
    soakOp("dedup_within_watermark", () => {
      val in = MemoryStream[(Long, Timestamp, Long, String)]
      val out = Streams.dedupWithinWatermark(
        in.toDF().toDF("event_id", "ts", "user_id", "event_type"),
        "ts", Seq("event_id"), "10 minutes")
      ((i: Int) => {
        val s = evSlice(i)
        if (s.nonEmpty) in.addData(s.toIndexedSeq: _*)
      }, out)
    }, (sp, p) => sinkDigest(sp, p)._2)

    // 2. watermarked stream-stream LEFT interval join
    soakOp("interval_join_left", () => {
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
      ((i: Int) => {
        val s = evSlice(i)
        if (s.nonEmpty) {
          left.addData(s.map(e => (e._1, e._2, e._3)).toIndexedSeq: _*)
          right.addData(s.map(e => (e._3, e._2, e._4)).toIndexedSeq: _*)
        }
      }, joined)
    }, (sp, p) => sinkDigest(sp, p)._2)

    // 3. RFM key-bounded fold over the scaled orders feed
    locally {
      val ord = Tables.load(spark, dir, "orders")
        .select(col("o_custkey"),
          (unix_timestamp(col("o_orderdate").cast("timestamp")) / 86400L)
            .cast("long").as("day"),
          (col("o_totalprice") * 100).cast("long").as("cents"))
        .orderBy(col("day"), col("o_custkey"))
        .collect()
        .map(r => RfmStream.OrderRow(r.getLong(0), r.getLong(1), r.getLong(2)))
      soakOp("rfm", () => {
        val in = MemoryStream[RfmStream.OrderRow]
        val out = RfmStream.rfm(in.toDS()).toDF()
        ((i: Int) => {
          val lo = (ord.length.toLong * i / batches).toInt
          val hi = (ord.length.toLong * (i + 1) / batches).toInt
          val s = ord.slice(lo, hi)
          if (s.nonEmpty) in.addData(s.toIndexedSeq: _*)
        }, out)
      }, (sp, p) => rfmFinalDigest(sp, p))
    }

    lines.foreach(println)
    spark.stop()
  }
}
