package graft

import org.scalatest.funsuite.AnyFunSuite

/** The fixed `broadcast()` hints on SF-GROWING side-inputs (customer /
  * supplier) are gone — a hint pinned at authoring time is wrong at
  * 100 TB, where those tables outgrow any broadcast. This spec pins
  * the other half of that trade: with no hint, the planner must still
  * pick a broadcast hash join from parquet size stats while the table
  * actually fits (static planning, AQE does the same at runtime), so
  * de-hinting costs nothing at bench scale. */
class BroadcastPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // query -> join key that must appear on a BroadcastHashJoin line
  private val expectations = Seq(
    "q167_local_supplier" -> "s_suppkey",  // supplier side of the cycle
    "q133_trade_matrix" -> "s_suppkey",    // supplier (was hinted)
    "q161_ship_priority" -> "c_custkey",   // filtered customer
    "q166_big_orders" -> "c_custkey",      // customer name join
    "q2_weather_pivot" -> "c_custkey",     // events ⋈ customer
    "q5_fact_orders" -> "c_custkey",       // detail chain customer hop
    // r7: the last four authoring-time hints on growing tables dropped
    "q252_rank_correlation" -> "c_custkey",
    "q241_diff_in_diff" -> "c_custkey",
    "q238_l_diversity" -> "c_custkey",
    "q237_nation_profit" -> "s_suppkey")

  for ((name, key) <- expectations if SparkEntry.queries.contains(name)) {
    test(s"$name broadcasts its $key join without a hint") {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val plan = SparkEntry.queries(name)(spark, TestSpark.sfDir)
          .queryExecution.sparkPlan.toString
        val ok = plan.linesIterator.exists(l =>
          l.contains("BroadcastHashJoin") && l.contains(key))
        assert(ok, s"no BroadcastHashJoin on $key in:\n$plan")
      } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
  }
}
