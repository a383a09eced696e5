package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Cross-checks the SQL-frontier operators against independent
  * DataFrame-DSL recomputes: the recursive rollup against an explicit
  * ancestor expansion, the lateral top-k against a ranking window. */
class SqlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("q218: recursive rollup equals an explicit ancestor expansion") {
    val got = SqlOps.q218RecursiveRollup(spark, dir).collect()
      .map(r => r.getAs[Long]("ancestor") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("subtree_cents"))).toMap
    // non-recursive expansion: ancestors of p are p, p/10, p/100, ...
    // (≤ 7 levels covers any partkey < 10^7)
    val anc = Tables.load(spark, dir, "part")
      .select(col("p_partkey"),
        explode(sequence(lit(0), lit(6))).as("lvl"))
      .select(col("p_partkey"),
        (col("p_partkey") / pow(lit(10.0), col("lvl"))).cast("long")
          .as("ancestor"))
      .filter(col("ancestor") >= 1)
      // dedup guards the 0-level collision when p < 10^lvl truncates to
      // the same ancestor twice (can't happen for >=1, but keep it tight)
      .distinct()
    val rev = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(Exact.units(col("l_extendedprice"), 2)
        .cast("decimal(38,0)")).as("rc"))
    val expect = anc
      .join(rev, col("p_partkey") === col("l_partkey"), "left")
      .groupBy(col("ancestor"))
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("rc"), lit(0))).cast("long").as("cents"))
      .filter(col("n") > 1)
      .collect().map(r => r.getAs[Long]("ancestor") ->
        (r.getAs[Long]("n"), r.getAs[Long]("cents"))).toMap
    assert(got == expect)
  }

  test("q219: lateral top-3 equals the ranking-window recompute") {
    val got = SqlOps.q219LateralTopk(spark, dir).collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("o_orderkey"),
        r.getAs[Long]("price_cents"))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
    val expect = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        Exact.units(col("o_totalprice"), 2).as("price_cents"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getAs[Long]("o_custkey"),
        r.getAs[Long]("o_orderkey"), r.getAs[Long]("price_cents"))).toSet
    assert(got == expect)
    // every customer with at least one order appears
    val nCust = Tables.load(spark, dir, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(got.map(_._1).size == nCust)
  }

  test("q220: KM curve equals a local sequential-fold recompute") {
    val users = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(((unix_millis(max(col("ts"))) - unix_millis(min(col("ts")))) /
        lit(86400000L)).cast("long").as("lt"),
        max(when(col("event_type") === "error", 1).otherwise(0)).as("death"))
      .collect().map(r => (r.getAs[Long]("lt"), r.getAs[Int]("death")))
    val byDay = users.groupBy(_._1).view
      .mapValues(v => (v.count(_._2 == 1).toLong, v.length.toLong)).toMap
    var atRisk = users.length.toLong
    var s = 1000000L
    val expect = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    byDay.keys.toSeq.sorted.foreach { t =>
      val (d, ended) = byDay(t)
      s = s * (atRisk - d) / atRisk
      if (d > 0) expect += ((t, atRisk, d, s))
      atRisk -= ended
    }
    val got = SqlOps.q220KaplanMeier(spark, dir).collect()
      .map(r => (r.getAs[Long]("t_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("d_events"), r.getAs[Long]("surv_ppm"))).toSeq.sorted
    assert(got == expect.toSeq.sorted, s"got=$got expect=$expect")
    // survival is monotonically non-increasing along time
    val surv = got.map(_._4)
    assert(surv == surv.sorted.reverse)
  }
}
