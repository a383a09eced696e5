package graft.functions

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HLL estimate within 5% of exact distinct per group") {
    import spark.implicits._
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
    val rows = ev.groupBy(col("event_type")).agg(
      HllAggregator.hllDistinct(col("user_id")).as("approx_users"),
      countDistinct(col("user_id")).as("exact_users"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.05, s"$et: approx=$approx exact=$exact err=$err")
    }
  }

  test("HLL is invariant under repartitioning (deterministic merge)") {
    import spark.implicits._
    val ids = (1L to 5000L).map(i => i * 7919L)
    val a = ids.toDF("id").repartition(1)
      .agg(HllAggregator.hllDistinct(col("id"))).head.getLong(0)
    val b = ids.toDF("id").repartition(37)
      .agg(HllAggregator.hllDistinct(col("id"))).head.getLong(0)
    assert(a == b)
  }
}
