package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph analytics beyond connected components (q33) and
  * triangle counting (q75): PageRank in exact integer arithmetic.
  *
  * Graph: the supply network — a directed edge supplier→customer for
  * every (supplier, customer) pair connected through a lineitem's
  * order. Rank flows from suppliers to the customers they serve.
  *
  * The scaled-integer formulation is what makes this ORACLE-CHECKABLE:
  * pr₀ = 10⁶; each round pr'(v) = 150000 + Σ_{u→v} (pr(u)·85) div
  * (100·outdeg(u)). Every operation is integer multiply/divide/sum —
  * commutative, associative, partition-order-independent — so DuckDB
  * replays the identical trajectory (a double-precision PageRank would
  * diverge in final ulps across engines/partitionings). Dangling mass
  * (customers have no out-edges) is deliberately NOT redistributed —
  * the textbook "leaked mass" variant; rankings are unaffected and the
  * contract is stated here.
  *
  * Scale shape: per iteration exactly two hash shuffles (join ranks to
  * edges on src; sum contributions on dst) over hash-partitioned
  * DataFrames — the Pregel pattern expressed declaratively. The edge
  * list with outdegrees is computed once and persisted; iteration
  * count is fixed (no driver-side convergence collect). At 100 TB the
  * plan is K rounds of co-partitioned join + partial-agg sum, never a
  * broadcast of anything data-sized and no per-round driver traffic.
  */
object Graph {

  val PrIters = 5
  val PrScale = 1000000L // pr₀; base = 15% of it, damping 85%

  def q84PageRank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("c"), col("o_custkey")).as("dst"))
      .distinct()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) — the per-iteration join input, built once
    val edgesDeg = edges.join(outdeg, "src").persist()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct().persist()
    val base = PrScale * 15L / 100L
    var pr = nodes.withColumn("pr", lit(PrScale))
    for (_ <- 1 to PrIters) {
      val contribs = edgesDeg
        .join(pr, edgesDeg("src") === pr("node"))
        // exact integer flow: (pr·85) div (100·outdeg), all positive
        .select(col("dst").as("node"),
          expr("(pr * 85) div (100 * outdeg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      pr = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("pr"))
    }
    // edgesDeg/nodes stay persisted until the consumer releases them
    // (Bench releaseAll / clearCache): the returned plan is LAZY and
    // references both once per iteration, so unpersisting here would
    // gamble on ReuseExchange deduplicating the 5 references (it does
    // at bench scale — measured neutral — but a downstream projection
    // that breaks subplan identity would silently rebuild the edge
    // join per iteration).
    pr.select(col("node"), col("pr"))
  }

  val q84Oracle: String = {
    val iters = (1 to PrIters).map { r =>
      s"""pr$r AS (
         |  SELECT n.node,
         |    ${PrScale * 15L / 100L} + coalesce(f.inflow, 0) AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node,
         |      sum((p.pr * 85) // (100 * e.outdeg)) AS inflow
         |    FROM ed e JOIN pr${r - 1} p ON p.node = e.src
         |    GROUP BY 1) f ON f.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS (
       |  SELECT DISTINCT 's' || l.l_suppkey AS src, 'c' || o.o_custkey AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |), ed AS (
       |  SELECT e.src, e.dst, d.outdeg
       |  FROM edges e JOIN (
       |    SELECT src, count(*) AS outdeg FROM edges GROUP BY 1) d
       |  ON d.src = e.src
       |), nodes AS (
       |  SELECT src AS node FROM edges UNION SELECT dst FROM edges
       |), pr0 AS (
       |  SELECT node, CAST($PrScale AS BIGINT) AS pr FROM nodes
       |),
       |$iters
       |SELECT node, CAST(pr AS BIGINT) AS pr FROM pr$PrIters""".stripMargin
  }
}
