package graft.ops

import java.sql.Timestamp

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asOfLeft picks latest at-or-before match, max tiebreak on equal times, null when none") {
    import spark.implicits._
    val quotes = Seq(
      (1L, 100L, ts(10)),          // event before any order for key 100
      (2L, 100L, ts(31)),          // after both orders at :30 -> tie broken by max id
      (3L, 200L, ts(50)),          // key with no orders at all
      (4L, 100L, ts(20))           // between :15 and :30 -> order 7
    ).toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (7L, 100L, 55.0, ts(15)),
      (8L, 100L, 66.0, ts(30)),    // equal times ↓
      (9L, 100L, 77.0, ts(30))
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val got = AsOfJoin.asOfLeft(quotes, orders,
      "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
      .select("event_id", "o_orderkey", "o_totalprice")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(got == Set(
      (1L, None, None),
      (2L, Some(9L), Some(77.0)),
      (3L, None, None),
      (4L, Some(7L), Some(55.0))))
  }
}
