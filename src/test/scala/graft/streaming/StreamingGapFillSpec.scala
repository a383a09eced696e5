package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming LOCF gap fill: hours flush exactly once in event-time
  * order as the watermark passes them; empty hours carry the last
  * observed sum forward and are marked as gaps; silent keys keep
  * emitting gap rows on the event-time timeout alone.
  */
class StreamingGapFillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(hour: Int, minute: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-03-01 $hour%02d:$minute%02d:00")

  test("observed, gap, and carried-forward rows match the batch fill rule") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = MemoryStream[GapFill.Tick]
    val q = GapFill.fill(spark, ev.toDS())
      .writeStream.format("memory").queryName("gapfill")
      .outputMode("append").start()
    // type a: hours 0 (two events) and 3; hours 1-2 are gaps
    // type b: hour 1 only
    ev.addData(
      GapFill.Tick("a", ts(0, 10), 1.25), GapFill.Tick("a", ts(0, 40), 2.00),
      GapFill.Tick("a", ts(3, 5), 4.50),
      GapFill.Tick("b", ts(1, 30), 7.75))
    q.processAllAvailable()
    // advance the watermark far past hour 5 for both keys
    ev.addData(GapFill.Tick("a", ts(8), 0.0), GapFill.Tick("b", ts(8), 0.0))
    q.processAllAvailable()
    ev.addData(GapFill.Tick("zz", ts(20), 0.0))
    q.processAllAvailable(); q.stop(); q.awaitTermination()

    val rows = spark.table("gapfill")
      .as[(String, Timestamp, Long, Option[Long], Boolean)]
      .collect().filter(_._1 != "zz")
      .sortBy(r => (r._1, r._2.getTime))

    val a = rows.filter(_._1 == "a").map(r => (r._2, r._3, r._4, r._5))
    assert(a.take(4).toSeq == Seq(
      (ts(0), 2L, Some(325L), false), // 1.25 + 2.00 observed
      (ts(1), 0L, Some(325L), true),  // gap carries hour-0 sum
      (ts(2), 0L, Some(325L), true),
      (ts(3), 1L, Some(450L), false)))
    // hours 4..7 are gaps carrying 450 until the hour-8 flush boundary
    assert(a.drop(4).takeWhile(_._1.getTime < ts(8).getTime)
      .forall(r => r._2 == 0L && r._3 == Some(450L) && r._4))

    val b = rows.filter(_._1 == "b").map(r => (r._2, r._3, r._4, r._5))
    assert(b.head == (ts(1), 1L, Some(775L), false))
    // b starts at ITS first hour (1), not the global minimum
    assert(b.forall(_._1.getTime >= ts(1).getTime))
    assert(b.drop(1).takeWhile(_._1.getTime < ts(8).getTime)
      .forall(r => r._2 == 0L && r._3 == Some(775L) && r._4))

    // exactly-once, in-order, no holes in each key's emitted hour range
    Seq(a.map(_._1.getTime), b.map(_._1.getTime)).foreach { hours =>
      assert(hours.distinct.length == hours.length)
      assert(hours.sliding(2).forall {
        case Array(x, y) => y - x == 3600L * 1000L
        case _ => true
      })
    }
  }
}
