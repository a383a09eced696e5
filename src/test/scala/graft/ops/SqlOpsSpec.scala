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
}
