package graft.ops

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BandJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("temporalBand matches the naive theta join exactly, including band edges") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (2L, ts("2024-01-01 10:00:30")),  // straddles a minute boundary
      (3L, ts("2024-01-01 10:05:00"))   // no right rows in band
    ).toDF("p_id", "p_ts")
    val right = Seq(
      ts("2024-01-01 10:00:00"),        // == left 1: excluded (strict >)
      ts("2024-01-01 10:00:59.999999"), // in band for 1 and 2
      ts("2024-01-01 10:01:00"),        // == left1 + 60s exactly: included
      ts("2024-01-01 10:01:30"),        // in band for 2 only (== 2 + 60s)
      ts("2024-01-01 10:01:30.000001"), // just past 2's band: excluded
      ts("2024-01-01 10:02:00")         // in nobody's band
    ).toDF("e_ts")

    val got = BandJoin.temporalBand(left, col("p_ts"), right, col("e_ts"), 60L)
      .select("p_id", "e_ts").as[(Long, Timestamp)].collect().toSet

    val naive = left.join(right,
        col("e_ts") > col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 60 SECONDS"))
      .select("p_id", "e_ts").as[(Long, Timestamp)].collect().toSet

    assert(got == naive)
    assert(got == Set(
      (1L, ts("2024-01-01 10:00:59.999999")),
      (1L, ts("2024-01-01 10:01:00")),
      (2L, ts("2024-01-01 10:00:59.999999")),
      (2L, ts("2024-01-01 10:01:00")),
      (2L, ts("2024-01-01 10:01:30"))))
  }

  test("temporalBand emits no duplicate pairs (each pair matches in exactly one bucket)") {
    import spark.implicits._
    // right rows dense across several bucket boundaries
    val left = (0 until 20).map(i => (i.toLong, ts(f"2024-01-01 10:${i % 10}%02d:${(i * 7) % 60}%02d")))
      .toDF("p_id", "p_ts")
    val right = (0 until 50).map(i => (i.toLong, ts(f"2024-01-01 10:${i % 11}%02d:${(i * 13) % 60}%02d")))
      .toDF("e_id", "e_ts")
    val pairs = BandJoin.temporalBand(left, col("p_ts"), right, col("e_ts"), 60L)
      .select("p_id", "e_id")
    assert(pairs.count() == pairs.distinct().count())
  }

  test("q240 plan is a shuffle equi-join on the bucket, not a nested-loop") {
    val plan = BandJoin.q240BandJoin(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"band join fell back to a nested loop:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"band join fell back to a cartesian product:\n$plan")
  }
}
