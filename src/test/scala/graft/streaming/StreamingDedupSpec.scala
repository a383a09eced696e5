package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Streaming deduplication semantics — the ingest-side twin of the
  * batch dedup family (q17/q57): exact-once emission per key with
  * `dropDuplicates` (unbounded state) vs `dropDuplicatesWithinWatermark`
  * (state bounded by the watermark — the only shape that survives an
  * unbounded 100 TB/day feed). */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def runToCompletion(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
  }

  test("dropDuplicatesWithinWatermark emits one row per key inside the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Timestamp)]
    val deduped = src.toDF().toDF("doc_key", "ingest_ts")
      .withWatermark("ingest_ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_key")
    val q = deduped.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    // batch 1: a & its duplicate in the same batch, b once
    src.addData(("a", ts(0)), ("a", ts(1)), ("b", ts(2)))
    q.processAllAvailable()
    // batch 2: duplicate of a inside the 10-min horizon → suppressed;
    // c is new → emitted
    src.addData(("a", ts(5)), ("c", ts(6)))
    runToCompletion(q)
    val keys = spark.table("sdedup_out").select("doc_key")
      .as[String].collect().sorted.toSeq
    assert(keys == Seq("a", "b", "c"))
  }

  test("state expires past the watermark: a re-arrival after the horizon is re-emitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Timestamp)]
    val deduped = src.toDF().toDF("doc_key", "ingest_ts")
      .withWatermark("ingest_ts", "5 minutes")
      .dropDuplicatesWithinWatermark("doc_key")
    val q = deduped.writeStream.format("memory").queryName("sdedup_exp_out")
      .outputMode("append").start()
    src.addData(("a", ts(0)))
    q.processAllAvailable()
    // advance the watermark far past a's expiry (10:30 − 5 min = 10:25)
    src.addData(("w", ts(30)))
    q.processAllAvailable()
    // a re-arrives AFTER its state was evicted → emitted again; this is
    // the documented horizon contract (and why the state stays bounded)
    src.addData(("a", ts(31)))
    runToCompletion(q)
    val as = spark.table("sdedup_exp_out").filter(col("doc_key") === "a").count()
    assert(as == 2L, s"expected re-emission after state expiry, got $as row(s)")
  }

  test("plain dropDuplicates never re-emits (unbounded state — the contrast case)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(String, Timestamp)]
    val deduped = src.toDF().toDF("doc_key", "ingest_ts")
      .dropDuplicates("doc_key")
    val q = deduped.writeStream.format("memory").queryName("sdedup_unb_out")
      .outputMode("append").start()
    src.addData(("a", ts(0)))
    q.processAllAvailable()
    src.addData(("w", ts(30)))
    q.processAllAvailable()
    src.addData(("a", ts(31)))
    runToCompletion(q)
    val as = spark.table("sdedup_unb_out").filter(col("doc_key") === "a").count()
    assert(as == 1L)
  }
}
