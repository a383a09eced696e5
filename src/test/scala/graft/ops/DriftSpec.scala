package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q176 total-variation drift semantics on planted distributions. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeEvents(dir: String,
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def ts(day: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("identical halves have zero drift; disjoint halves have full drift") {
    val dir = java.nio.file.Files.createTempDirectory("tvdrift").toString
    // type "same": both halves uniform over bins {0, 1} — TV = 0.
    // type "moved": first half all in bin 0, second all in bin 4 — TV = 1.
    val same = (0 until 40).map { i =>
      (i.toLong, ts(if (i % 2 == 0) 10 else 20), 1L, "same",
        if (i % 4 < 2) 10.0 else 60.0)
    }
    val moved = (0 until 40).map { i =>
      val firstHalf = i % 2 == 0
      (100L + i, ts(if (firstHalf) 10 else 20), 1L, "moved",
        if (firstHalf) 10.0 else 210.0)
    }
    writeEvents(dir, same ++ moved)
    val out = Audit.q176TvDrift(spark, dir)
      .select("event_type", "tv_ppm").as[(String, Long)].collect().toMap
    assert(out("same") == 0L, s"identical halves drifted: $out")
    assert(out("moved") == 1000000L, s"disjoint halves not full drift: $out")
  }

  test("q183: percentile ranks are bounded, min is 0, max is 1e6 per group") {
    val rows = Audit.q183PercentileRank(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val ps = rs.map(_.getAs[Long]("pct_ppm"))
      assert(ps.min == 0L, s"$t: min pct ${ps.min}")
      assert(ps.max == 1000000L || rs.length == 1, s"$t: max pct ${ps.max}")
      // monotone with value: sort by value, pct must be nondecreasing
      val sorted = rs.sortBy(_.getAs[Long]("value_centi"))
        .map(_.getAs[Long]("pct_ppm"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q184: movers carry the largest shifts and respect the support floor") {
    val rows = TextOps.q184TokenDrift(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty && rows.length <= TextOps.Q184TopK)
    val shifts = rows.map(_.getAs[Long]("shift_ppm"))
    assert(shifts.zip(shifts.tail).forall { case (a, b) => a >= b },
      "movers not in descending shift order")
    rows.foreach(r => assert(
      r.getAs[Long]("c_a") + r.getAs[Long]("c_b") >= TextOps.Q184MinSupport))
  }

  test("tv_ppm is bounded on the real corpus and both halves are populated") {
    val rows = Audit.q176TvDrift(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("tv_ppm")
      assert(ppm >= 0L && ppm <= 1000000L, s"out of range: $r")
      assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0,
        s"a half is empty — the split constant no longer bisects events: $r")
    }
  }
}
