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

  private def sym(pairs: Seq[(String, String)]) = {
    import spark.implicits._
    val e = pairs.toDF("src", "dst")
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("q108: a cycle survives its own 2-core; a path peels to nothing") {
    val cycle = sym(Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a"))
    assert(Graph.kCore(cycle, 2, 6).count() == 8L)
    val path = sym(Seq("a" -> "b", "b" -> "c", "c" -> "d"))
    assert(Graph.kCore(path, 2, 6).count() == 0L)
  }

  test("q108: peeling cascades — removing a leaf can unravel a chain") {
    // triangle {a,b,c} + pendant chain c-d-e: for k=2 the chain peels
    // over TWO rounds (e first, then d), the triangle stays
    val g = sym(Seq("a" -> "b", "b" -> "c", "a" -> "c", "c" -> "d", "d" -> "e"))
    val core = Graph.kCore(g, 2, 6)
    val nodes = core.select("src").distinct().collect().map(_.getString(0)).toSet
    assert(nodes == Set("a", "b", "c"))
    // one round is NOT enough — d still had degree 2 when e was alive
    val oneRound = Graph.kCore(g, 2, 1)
    val after1 = oneRound.select("src").distinct().collect().map(_.getString(0)).toSet
    assert(after1.contains("d"))
  }

  test("q108: fixpoint is reached within the round budget on real data") {
    val atBudget = Graph.q108KCore(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).sorted.toSeq
    assert(atBudget.nonEmpty, "the whole graph peeled away — K too high")
    // one extra round changes nothing ⇒ the budgeted result IS the k-core
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = graft.Tables.load(spark, TestSpark.sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val base = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey")).as("a"),
        concat(lit("c"), col("o_custkey")).as("b"))
      .distinct()
    val symE = base.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(base.select(col("b").as("src"), col("a").as("dst")))
    val extra = Graph.kCore(symE, Graph.CoreK, Graph.CoreRounds + 1)
      .groupBy(col("src")).agg(count(lit(1)).as("core_degree"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sorted.toSeq
    assert(atBudget == extra)
    // and every surviving node indeed keeps >= K in-core neighbors
    assert(atBudget.forall(_._2 >= Graph.CoreK))
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

  test("q122: BFS labels a hand-built chain with min hop distances") {
    import spark.implicits._
    // chain: s1 -(o1)- c1 -(o2)- s2 -(o3)- c2 ; s3/c3 isolated in nation 1
    val dir = java.nio.file.Files.createTempDirectory("bfs").toString
    Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 3L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 0), (2L, 1), (3L, 1))
      .toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = Graph.q122Reachability(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s1" -> 0L, "c1" -> 1L, "s2" -> 2L, "c2" -> 3L),
      s"got $got")
  }

  test("q123: Bellman-Ford accumulates lineitem-count edge weights") {
    import spark.implicits._
    // s1 =2 lineitems= c1 -(1)- s2 -(1)- c2; seed s1 (nation 0)
    val dir = java.nio.file.Files.createTempDirectory("sp").toString
    Seq((1L, 1L), (1L, 1L), (2L, 2L), (3L, 2L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 0), (2L, 1))
      .toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = Graph.q123ShortestPath(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s1" -> 0L, "c1" -> 2L, "s2" -> 3L, "c2" -> 4L),
      s"got $got")
  }

  test("q128: LPA floods min labels with deterministic tie-breaks") {
    import spark.implicits._
    // path graph s1 - c1, s1 - c2, s2 - c2: hand-traced 3 synchronous
    // rounds land on the bipartite two-coloring oscillation state
    val dir = java.nio.file.Files.createTempDirectory("lpa").toString
    Seq((1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L), (2L, 2L), (3L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Graph.q128LabelPropagation(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("s1" -> "c1", "c1" -> "s1", "s2" -> "c1",
      "c2" -> "s1"), s"got $got")
  }

  test("q193: hand-traced modularity of the bipartite oscillation is -1/2") {
    import spark.implicits._
    // same graph as the q128 test: LPA's two-coloring puts every edge
    // ACROSS communities, so e_in = 0 everywhere and
    // Q_c = -d_c^2 / 4m^2 = -9/36 per community, Q = -0.5 total
    val dir = java.nio.file.Files.createTempDirectory("mod").toString
    Seq((1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1L), (2L, 2L), (3L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Graph.q193Modularity(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)),
          r.getDouble(5))).toMap
    assert(got.keySet == Set("c1", "s1"), s"got $got")
    for ((_, ((n, eIn, dSum, qNum), qc)) <- got) {
      assert((n, eIn, dSum, qNum) == ((2L, 0L, 3L, -9L)), s"got $got")
      assert(qc == -0.25, s"got $got")
    }
  }

  test("q193: real-corpus conservation — degrees sum to 2m, e_in <= m, Q in [-1,1]") {
    import org.apache.spark.sql.functions._
    val mod = Graph.q193Modularity(spark, TestSpark.sfDir)
    val base = mod.agg(
      sum(col("d_sum")).as("dTot"), sum(col("e_in")).as("eTot"),
      sum(col("q_contrib")).as("q")).head()
    val dTot = base.getLong(0); val eTot = base.getLong(1)
    val q = base.getDouble(2)
    // every edge contributes 2 degree endpoints; intra-community edges
    // are a subset of all edges
    assert(dTot % 2 == 0 && eTot <= dTot / 2,
      s"degree/edge conservation broken: dTot=$dTot eTot=$eTot")
    assert(q >= -1.0 && q <= 1.0, s"Q=$q out of range")
  }

  test("hits: hand-traced unnormalized power iteration on a 3x2 bipartite graph") {
    import spark.implicits._
    // s1->{c1,c2}, s2->{c1}, s3->{c2}; h0 = 1 each
    // a1: c1 = 2, c2 = 2;  h1: s1 = 4, s2 = 2, s3 = 2
    // a2: c1 = h1(s1)+h1(s2) = 6, c2 = 6;  h2: s1 = 12, s2 = 6, s3 = 6
    // end rescale by max, S = 1e6: hubs (S, S/2, S/2), auths (S, S)
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 2L)).toDF("src", "dst")
    val (hub, auth) = Graph.hits(edges, Graph.HitsIters)
    val s = Graph.HitsScale
    assert(hub.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> s, 2L -> s / 2, 3L -> s / 2))
    assert(auth.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> s, 2L -> s))
  }

  test("q195: scores bounded by Scale, maxima attained, node sides disjoint") {
    val rows = Graph.q195Hits(spark, TestSpark.sfDir).collect()
    val (hubs, auths) = rows.partition(_.getString(1) == "hub")
    assert(hubs.nonEmpty && auths.nonEmpty)
    assert(hubs.forall(_.getString(0).startsWith("s")) &&
      auths.forall(_.getString(0).startsWith("c")),
      "bipartite sides must not mix")
    for (g <- Seq(hubs, auths)) {
      val scores = g.map(_.getLong(2))
      assert(scores.forall(x => x >= 0 && x <= Graph.HitsScale))
      assert(scores.max == Graph.HitsScale,
        "max-rescaling must pin the top score to Scale")
    }
  }

  test("q226: double-sweep invariants — second eccentricity dominates") {
    val r = Graph.q226GraphDiameter(spark, graft.TestSpark.sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val ecc1 = row.getAs[Long]("sweep1_ecc")
    val lb = row.getAs[Long]("diameter_lb")
    // dist(start, far1) = ecc1 is one path from far1, so ecc(far1) ≥ ecc1
    // (both capped by the same hop limit)
    assert(lb >= ecc1 && ecc1 >= 1L)
    assert(lb <= Graph.DiamMaxHops)
    assert(row.getAs[Long]("n_reached") >= 2L)
    // bipartite parity: an even-hop endpoint is the same side as far1
    val far1 = row.getAs[String]("sweep1_far")
    val far2 = row.getAs[String]("sweep2_far")
    val sameSide = far1.charAt(0) == far2.charAt(0)
    assert(sameSide == (lb % 2 == 0),
      s"bipartite parity violated: $far1 -> $far2 at hop $lb")
  }
}
