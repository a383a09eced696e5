package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{ExtraConf, SparkEntry}

/** A/B correctness-plus-skew probe: runs one registered query and
  * prints (a) an order-free output digest — row count + sum of
  * xxhash64 over every column canonicalized to string — and (b) a
  * per-stage task distribution (tasks, median/max wall, median/max
  * records read). Built for the hot-bucket-split A/B: two arms
  * (`SPARK_GRAFT_CONF` switching `graft.dedup.q35BucketCap`) must
  * print IDENTICAL digests on the same corpus, and the split arm's
  * heaviest stage must show max task wall ≤ ~2× median where the
  * unsplit arm shows a straggler — the per-task bound the triangle
  * decomposition promises. Digest and skew table in one run so the
  * equality and the balance claim are measured on the same execution.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.HashProbe <query>
  */
object HashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
    ExtraConf(builder)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // per-stage task distributions (durations ms, records read)
      val durs = new java.util.concurrent.ConcurrentHashMap[
        Int, java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]]()
      val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      val listener = new SparkListener {
        override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            val recs = m.inputMetrics.recordsRead +
              m.shuffleReadMetrics.recordsRead
            durs.computeIfAbsent(te.stageId,
                _ => new java.util.concurrent.ConcurrentLinkedQueue[
                  (Long, Long, Long, Long)]())
              .add((te.taskInfo.duration, recs,
                m.shuffleWriteMetrics.recordsWritten, m.jvmGCTime))
          }
        }
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
          names.put(sc.stageInfo.stageId, sc.stageInfo.name.takeWhile(_ != '\n'))
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val digest = df
        .select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
        .agg(count(lit(1)).as("n"), sum(col("h").cast("decimal(38,0)")).as("s"))
        .head()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(1000) // drain the async listener bus
      import scala.jdk.CollectionConverters._
      def pct(xs: Seq[Long], p: Double): Long =
        if (xs.isEmpty) 0L
        else xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))
      durs.asScala.toSeq.sortBy(_._1).foreach { case (sid, q) =>
        val ts = q.asScala.toSeq
        val d = ts.map(_._1)
        val r = ts.map(_._2)
        val w = ts.map(_._3)
        // GC of the single slowest task: distinguishes work skew from
        // allocation-storm skew when adjudicating a straggler
        val gcOfMax = ts.maxBy(_._1)._4
        println(s"""{"probe_stage":$sid,"q":"$name","tasks":${d.size},""" +
          s""""med_ms":${pct(d, 0.5)},"max_ms":${d.max},""" +
          s""""med_recs":${pct(r, 0.5)},"max_recs":${r.max},""" +
          s""""med_wrecs":${pct(w, 0.5)},"max_wrecs":${w.max},""" +
          s""""gc_of_max_ms":$gcOfMax,""" +
          s""""name":"${names.getOrDefault(sid, "?").replace("\"", "'")}"}""")
      }
      val hash = Option(digest.getDecimal(1)).map(_.toString).getOrElse("null")
      println(f"""{"probe":"$name","sf":"$sfDir","rows":${digest.getLong(0)},""" +
        f""""hashsum":"$hash","wall_s":$wall%.1f}""")
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
