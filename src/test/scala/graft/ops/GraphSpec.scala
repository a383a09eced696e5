package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q84 integer PageRank: structural invariants of the exact-arithmetic
  * formulation on the supply graph. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q84: suppliers (no in-edges) settle at base rank; customers above it") {
    val base = Graph.PrScale * 15L / 100L
    val rows = Graph.q84PageRank(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    val (supp, cust) = rows.partition(_.getString(0).startsWith("s"))
    assert(supp.nonEmpty && cust.nonEmpty)
    supp.foreach(r => assert(r.getLong(1) == base,
      s"supplier ${r.getString(0)} rank ${r.getLong(1)} != base $base"))
    cust.foreach(r => assert(r.getLong(1) >= base))
    assert(cust.exists(_.getLong(1) > base), "no customer accumulated rank")
  }

  test("q84: rank order follows supplier-fan-in on the final iteration") {
    // a customer served by more suppliers receives more base-rank flow;
    // check the extremes rather than full monotonicity (flow depends on
    // each supplier's outdegree, not fan-in alone)
    val pr = Graph.q84PageRank(spark, TestSpark.sfDir)
      .filter(col("node").startsWith("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = graft.Tables.load(spark, TestSpark.sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val fanIn = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("node"), col("l_suppkey"))
      .distinct()
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxFan = fanIn.maxBy(_._2)._1
    val minFan = fanIn.minBy(_._2)._1
    assert(pr(maxFan) >= pr(minFan),
      s"max-fan-in $maxFan ranked below min-fan-in $minFan")
  }
}
