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
    // packed-long node ids (q122's trick): the per-iteration join and
    // the contribution aggregate key on longs; names render at the end
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2L).as("src"),
        (col("o_custkey") * 2L + 1L).as("dst"))
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
    pr.select(
      concat(when(col("node") % 2 === 0, lit("s")).otherwise(lit("c")),
        expr("node div 2")).as("node"),
      col("pr"))
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

  /** q108 peel threshold and round budget. K=8 bites on every SF (the
    * customer side's degrees straddle 8; suppliers only fall out via
    * cascade). [[CoreRounds]] is a FIXED budget: the oracle computes
    * exactly this many peels, so it is data-independent; the Spark
    * side proves the fixpoint per round (peeling is monotone, so an
    * unchanged edge count ⟹ no-op) and exits the no-op tail early
    * with a bit-identical result — see [[kCore]]. GraphSpec asserts
    * the fixpoint is actually reached on the test corpora (one extra
    * round changes nothing), making the result the true k-core
    * there — the supply graph converges after ONE effective round at
    * every SF (measured), so 4 budgeted rounds carry 3 rounds of
    * safety margin. */
  val CoreK = 8
  val CoreRounds = 4

  /** q108: k-core decomposition of the (undirected) supply graph —
    * the classic "dense-enough subgraph" curation primitive: repeatedly
    * peel every node whose degree is < k; what survives is the maximal
    * subgraph where every node keeps ≥ k neighbors (spam/boilerplate
    * clusters and barely-connected tendrils peel away; q33's connected
    * components keeps them).
    *
    * Plan: the symmetrized edge list is peeled [[CoreRounds]] times
    * through the linear window-count chain of [[kCore]] (see its
    * scaladoc for the measured plan comparison). Peeling preserves
    * edge symmetry (the keep condition is symmetric in the
    * endpoints), so the final per-src count IS the in-core degree. */
  def q108KCore(spark: SparkSession, dir: String): DataFrame = {
    // packed-long node ids through the peel loop (q122's trick): the
    // 2·CoreRounds window-count shuffles hash and sort longs, not
    // concatenated strings; names render only in the final projection
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val base = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2L).as("a"),
        (col("o_custkey") * 2L + 1L).as("b"))
      .distinct()
    val sym = base.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(base.select(col("b").as("src"), col("a").as("dst")))
    kCore(sym, CoreK, CoreRounds)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("core_degree"))
      .select(
        concat(when(col("src") % 2 === 0, lit("s")).otherwise(lit("c")),
          expr("src div 2")).as("node"),
        col("core_degree"))
  }

  /** The peel loop over a SYMMETRIC distinct edge list (every edge
    * present in both directions); returns the surviving edges, still
    * symmetric. Exposed for spec-level graphs.
    *
    * Each round annotates endpoint degrees via two window COUNTs
    * (partitioned by the high-cardinality node keys) and filters both
    * ends ≥ k: 2 hash shuffles of a monotonically shrinking edge
    * list, q84's Pregel shape. (The tempting alternative — per-round
    * degree aggregates broadcast back as semi-joins so edges "never
    * shuffle" — measured 4× SLOWER at sf0.1: every round's broadcast
    * subtree nests the previous rounds' broadcasts, and Spark
    * materializes those driver-side sequentially per level,
    * recomputing the chain; the window plan is the one that scales.)
    *
    * Rounds past the fixpoint are exited early: peeling only REMOVES
    * edges, so an unchanged per-round count proves no edge peeled —
    * the remaining budgeted rounds are no-ops by definition and the
    * result is bit-identical to running the full budget (the oracle
    * still runs all [[CoreRounds]]; its no-op rounds are free in
    * DuckDB, while Spark would pay 2 full shuffles of the surviving
    * edge list per skipped round). Cost of the check: each round
    * persists its survivors (data that was materializing as shuffle
    * files anyway) and runs one cached count — on the measured corpora
    * the peel converges after ONE effective round, so the exit saves
    * half the budget's shuffles at every scale. */
  def kCore(symEdges: DataFrame, k: Int, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSrc = Window.partitionBy(col("src"))
    val wDst = Window.partitionBy(col("dst"))
    var edges = symEdges
    var prev: DataFrame = null
    var prevCount = -1L
    var r = 0
    var fixed = false
    while (r < rounds && !fixed) {
      val next = edges
        .withColumn("_ds", count(lit(1)).over(wSrc))
        .withColumn("_dd", count(lit(1)).over(wDst))
        .filter(col("_ds") >= k && col("_dd") >= k)
        .drop("_ds", "_dd")
        .persist()
      val c = next.count()
      if (prev != null) prev.unpersist(false)
      fixed = c == prevCount
      prevCount = c
      prev = next
      edges = next
      r += 1
    }
    // Hand the caller a lineage-free frame (connectedComponents'
    // localCheckpoint-then-unpersist discipline) instead of the loop's
    // last persist: the count above already materialized the
    // survivors, so the checkpoint is a cache-to-cache copy, the
    // returned plan no longer chains through every peel round (an
    // eviction would otherwise recompute the whole loop), and the
    // working cache is released here rather than leaking until the
    // session harness cleans up.
    if (prev != null) {
      val out = prev.localCheckpoint(true)
      prev.unpersist(false)
      out
    } else edges
  }

  val q108Oracle: String = {
    val rounds = (1 to CoreRounds).map { r =>
      s"""s$r AS (
         |  SELECT src, dst FROM (
         |    SELECT src, dst,
         |      count(*) OVER (PARTITION BY src) AS ds,
         |      count(*) OVER (PARTITION BY dst) AS dd
         |    FROM s${r - 1})
         |  WHERE ds >= $CoreK AND dd >= $CoreK)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT DISTINCT 's' || l.l_suppkey AS a, 'c' || o.o_custkey AS b
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |), s0 AS (
       |  SELECT a AS src, b AS dst FROM e0
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM e0
       |),
       |$rounds
       |SELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree
       |FROM s$CoreRounds GROUP BY src""".stripMargin
  }

  /** BFS hop cap for q122 — the supply graph is dense bipartite, so
    * alternating supplier/customer layers exhaust it in ≤4 hops. */
  val BfsMaxHops = 4

  /** q122: multi-hop reachability — the minimum hop distance from the
    * nation-0 suppliers to every node of the undirected supply graph
    * (the blast-radius / impact-analysis query: "which customers are
    * within k hops of these suppliers"). Textbook frontier BFS in
    * Pregel style: each round expands the CURRENT frontier only
    * (persisted, so the growing union chain never recomputes), removes
    * already-labeled nodes with a left-anti join against the distance
    * table, and tags survivors with the round number. First-discovery
    * round IS the min hop, so all arithmetic is integer and the DuckDB
    * recursive-CTE oracle (min over generated hops) matches
    * bit-exactly. Scale shape: per round one hash join
    * frontier⋈edges + distinct + one anti join — all partitioned on
    * the node key, frontier-sized (not graph-sized) inputs, no
    * broadcasts, no driver-side convergence collect (fixed hop cap). */
  def q122Reachability(spark: SparkSession, dir: String): DataFrame = {
    // Node ids are packed into a long (supplier 2k, customer 2k+1):
    // every join/distinct/anti in the loop hashes and compares a
    // single long, not a concatenated string — strings appear only in
    // the final projection the oracle sees.
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val base = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2L).as("a"),
        (col("o_custkey") * 2L + 1L).as("b"))
      .distinct()
    val sym = base.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(base.select(col("b").as("src"), col("a").as("dst")))
      // Hash-partition AND pre-sort the cached edge list on the join
      // key so all BfsMaxHops round-joins reuse this one exchange and
      // this one sort (the cached scan propagates both) — only the
      // (small) frontier side shuffles and sorts per round.
      .repartition(col("src"))
      .sortWithinPartitions(col("src"))
      .persist()
    // seed on the MINIMUM nation key present (not literal 0) so the
    // query exercises the graph at every scale factor — tiny SFs may
    // not sample nation 0 at all
    val sup = Tables.load(spark, dir, "supplier")
    val seeds = sup
      .crossJoin(broadcast(sup.agg(min(col("s_nationkey")).as("_mn"))))
      .where(col("s_nationkey") === col("_mn"))
      .select((col("s_suppkey") * 2L).as("node"))
    var dist = seeds.withColumn("hop", lit(0L)).persist()
    var frontier = dist
    for (h <- 1 to BfsMaxHops) {
      val next = frontier
        .join(sym, frontier("node") === sym("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(h.toLong))
        .persist()
      dist = dist.unionByName(next)
      frontier = next
    }
    dist.select(
      concat(when(col("node") % 2 === 0, lit("s")).otherwise(lit("c")),
        expr("node div 2")).as("node"),
      col("hop"))
  }

  val q122Oracle: String =
    s"""WITH RECURSIVE e0 AS (
       |  SELECT DISTINCT 's' || l.l_suppkey AS a, 'c' || o.o_custkey AS b
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |), sym AS (
       |  SELECT a AS src, b AS dst FROM e0
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM e0
       |), bfs AS (
       |  SELECT 's' || s_suppkey AS node, 0 AS hop
       |  FROM supplier
       |  WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)
       |  UNION
       |  SELECT sym.dst AS node, bfs.hop + 1 AS hop
       |  FROM bfs JOIN sym ON bfs.node = sym.src
       |  WHERE bfs.hop < $BfsMaxHops
       |)
       |SELECT node, CAST(min(hop) AS BIGINT) AS hop
       |FROM bfs GROUP BY node""".stripMargin

  /** Relaxation-round cap for q123 — like [[BfsMaxHops]] but one less:
    * costs stabilize for the overwhelming majority of nodes by hop 3,
    * and the contract is explicitly "cheapest path within 3 hops". */
  val SpMaxHops = 3

  /** q123: weighted shortest path — the cheapest ≤3-hop route from the
    * nation-0 suppliers to every reachable node of the supply graph,
    * where an edge's weight is the lineitem count linking the
    * supplier/customer pair (a "how thin is the relationship" routing
    * metric). Bellman-Ford expressed declaratively: each round relaxes
    * every edge out of the current distance table and folds the result
    * back with a groupBy-min — min-plus over longs, so every engine
    * replays the identical trajectory and the oracle (the same three
    * rounds unrolled as CTEs) is bit-exact. Same scale shape as q122:
    * node ids packed into longs, the weighted edge list built once,
    * hash-partitioned on the join key and persisted, so each round is
    * one frontier-shuffle join plus one partial-agg min — no
    * broadcasts, no driver-side convergence test. */
  def q123ShortestPath(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("l_suppkey") * 2L).as("a"),
        (col("o_custkey") * 2L + 1L).as("b"))
      .agg(count(lit(1)).as("w"))
    val edges = e0.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(e0.select(col("b").as("src"), col("a").as("dst"), col("w")))
      // partitioned + sorted once for all SpMaxHops round-joins (the
      // cached scan propagates both; q122's comment)
      .repartition(col("src"))
      .sortWithinPartitions(col("src"))
      .persist()
    // min-nation seed for the same every-SF reason as q122
    val sup = Tables.load(spark, dir, "supplier")
    var dist = sup
      .crossJoin(broadcast(sup.agg(min(col("s_nationkey")).as("_mn"))))
      .where(col("s_nationkey") === col("_mn"))
      .select((col("s_suppkey") * 2L).as("node"), lit(0L).as("cost"))
      .persist()
    for (_ <- 1 to SpMaxHops) {
      val relaxed = dist.join(edges, dist("node") === edges("src"))
        .select(col("dst").as("node"), (col("cost") + col("w")).as("cost"))
      dist = dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("cost")).as("cost"))
        .persist()
    }
    dist.select(
      concat(when(col("node") % 2 === 0, lit("s")).otherwise(lit("c")),
        expr("node div 2")).as("node"),
      col("cost"))
  }

  /** Synchronous-update round count for q128. Three rounds are enough
    * for labels to flood the dense bipartite supply graph's
    * communities; the budget is FIXED (both engines replay exactly
    * three rounds) so the oracle is data-independent. */
  val LpaRounds = 3

  /** q128: label-propagation community detection — every node starts
    * as its own label; each synchronous round relabels a node to the
    * most frequent label among its neighbors, ties to the SMALLEST
    * label (Raghavan et al. 2007, made deterministic by the tie rule
    * and fixed rounds — classic LPA's random tie-breaks and
    * asynchronous order would never hash-match across engines).
    * All-integer: label frequencies are counts, the argmax is
    * max(struct(cnt, −label)) — one hash aggregate, no per-node sort
    * — so the DuckDB oracle (three unrolled rounds with a row_number
    * argmax) is bit-exact. Scale shape per round: one hash join of
    * the label table to the pre-partitioned cached edge list + two
    * hash aggregates, all keyed on packed-long node ids — Pregel via
    * relational ops, no broadcasts of anything data-sized. */
  /** Packed-id LPA state shared by q128 (which decodes it) and q193
    * (which scores the partition): returns (final labels (node,
    * label), undirected base edges (a, b) — both in packed-long id
    * space). */
  /** `persistBase = true` caches the distinct packed edge list before
    * the symmetrization: q193 consumes `base` three more times (the
    * 1-row m count, the degree aggregate and the two-sided e_in label
    * join), and unpersisted each consumer re-runs the lineitem⋈orders
    * scan + distinct (~15 s at the 30× sighting). q128 touches `base`
    * only through `sym`, so it skips the cache write. */
  private[ops] def lpaPacked(
      spark: SparkSession, dir: String,
      persistBase: Boolean = false): (DataFrame, DataFrame) = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val base0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2L).as("a"),
        (col("o_custkey") * 2L + 1L).as("b"))
      .distinct()
    val base = if (persistBase) base0.persist() else base0
    // Pre-partitioned AND pre-sorted on src: the per-round sort-merge
    // join reuses the cached ordering (InMemoryTableScan propagates
    // outputPartitioning and outputOrdering), so each round sorts only
    // the round's labels — the edge side pays its shuffle + sort ONCE
    // for all rounds instead of once per round.
    val sym = base.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(base.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .sortWithinPartitions(col("src"))
      .persist()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist()
    for (_ <- 1 to LpaRounds) {
      // Two exchanges per round, ON PURPOSE: the (n, label) vote count
      // keeps its map-side partial aggregate, which collapses the
      // edge-sized join output to ~distinct (dst, label) rows BEFORE
      // the wire (measured ~5× fewer shuffled rows at the 30×
      // sighting's 244-avg-degree graph); a single repartition-on-n
      // "fusion" would push the full edge-sized stream through the
      // exchange instead. The second exchange then moves only the
      // vote rows.
      labels = labels.join(sym, labels("node") === sym("src"))
        .groupBy(col("dst").as("n"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("n").as("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
        .persist()
    }
    (labels, base)
  }

  def q128LabelPropagation(spark: SparkSession, dir: String): DataFrame = {
    val (labels, _) = lpaPacked(spark, dir)
    labels.select(
      concat(when(col("node") % 2 === 0, lit("s")).otherwise(lit("c")),
        expr("node div 2")).as("node"),
      concat(when(col("label") % 2 === 0, lit("s")).otherwise(lit("c")),
        expr("label div 2")).as("community"))
  }

  /** Shared LPA oracle prefix (packed-id edges + unrolled propagation
    * rounds ending at `l<LpaRounds>`) — composed by q128's decode and
    * q193's modularity scoring so both stay definitionally in
    * lockstep. */
  private val LpaCtePrefix: String = {
    val rounds = (1 to LpaRounds).map { r =>
      s"""l$r AS (
         |  SELECT node, label FROM (
         |    SELECT n AS node, label,
         |      row_number() OVER (PARTITION BY n
         |        ORDER BY cnt DESC, label ASC) AS rk
         |    FROM (
         |      SELECT e.dst AS n, l.label, count(*) AS cnt
         |      FROM l${r - 1} l JOIN e ON l.node = e.src
         |      GROUP BY 1, 2) c) t
         |  WHERE rk = 1)""".stripMargin
    }.mkString(", ")
    s"""WITH e0 AS (
       |  SELECT DISTINCT l.l_suppkey * 2 AS a, o.o_custkey * 2 + 1 AS b
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |), e AS (
       |  SELECT a AS src, b AS dst FROM e0
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM e0
       |), l0 AS (
       |  SELECT DISTINCT src AS node, src AS label FROM e
       |), $rounds""".stripMargin
  }

  val q128Oracle: String =
    s"""$LpaCtePrefix
       |SELECT CASE WHEN node % 2 = 0 THEN 's' || (node // 2)
       |            ELSE 'c' || (node // 2) END AS node,
       |  CASE WHEN label % 2 = 0 THEN 's' || (label // 2)
       |       ELSE 'c' || (label // 2) END AS community
       |FROM l$LpaRounds""".stripMargin

  val q123Oracle: String = {
    // unroll the SpMaxHops relaxation rounds as chained CTEs
    val rounds = (1 to SpMaxHops).map { h =>
      s"""d$h AS (
         |  SELECT node, min(cost) AS cost FROM (
         |    SELECT node, cost FROM d${h - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, d${h - 1}.cost + e.w AS cost
         |    FROM d${h - 1} JOIN e ON d${h - 1}.node = e.src
         |  ) u GROUP BY node
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH e0 AS (
       |  SELECT l.l_suppkey * 2 AS a, o.o_custkey * 2 + 1 AS b,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2
       |), e AS (
       |  SELECT a AS src, b AS dst, w FROM e0
       |  UNION ALL
       |  SELECT b AS src, a AS dst, w FROM e0
       |), d0 AS (
       |  SELECT s_suppkey * 2 AS node, CAST(0 AS BIGINT) AS cost
       |  FROM supplier
       |  WHERE s_nationkey = (SELECT min(s_nationkey) FROM supplier)
       |), $rounds
       |SELECT CASE WHEN node % 2 = 0 THEN 's' || (node // 2)
       |            ELSE 'c' || (node // 2) END AS node,
       |  CAST(cost AS BIGINT) AS cost
       |FROM d$SpMaxHops""".stripMargin
  }

  /** q160: degree assortativity of the supply graph — the Pearson
    * correlation of endpoint degrees over the symmetrized edge list
    * (Newman's r): negative means hubs attach to leaves
    * (hub-and-spoke, the typical bipartite trade shape), positive
    * means like attaches to like. The single scalar a graph pipeline
    * tracks release-over-release to notice structural drift that node
    * and edge counts miss.
    *
    * Exactness: degrees are integers, so every moment up to
    * n·Σxy − ΣxΣy stays in Decimal(38,0)/HUGEINT exactly (the q72
    * discipline); only the last three terms become doubles, and
    * sqrt / × / ÷ are IEEE correctly-rounded in both engines.
    *
    * Plan: one distinct fact shuffle builds the edges, a per-node
    * hash-aggregate computes degrees, the edge list joins the degree
    * table on each endpoint key (both high-cardinality hash joins),
    * and everything reduces to ONE exact-moment row. No windows, no
    * collect, no quadratic stage. */
  def q160Assortativity(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val base = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2L).as("a"),
        (col("o_custkey") * 2L + 1L).as("b"))
      .distinct()
    val sym = base.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(base.select(col("b").as("src"), col("a").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val pairs = sym
      .join(deg, "src").withColumnRenamed("d", "dx")
      .join(deg.select(col("src").as("dst"), col("d").as("dy")), "dst")
      .select(col("dx").cast(dec).as("x"), col("dy").cast(dec).as("y"))
    pairs
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").cast("long").as("n_edges"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("assortativity"))
  }

  val q160Oracle: String =
    """WITH e0 AS (
      |  SELECT DISTINCT l.l_suppkey * 2 AS a, o.o_custkey * 2 + 1 AS b
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |), sym AS (
      |  SELECT a AS src, b AS dst FROM e0
      |  UNION ALL SELECT b, a FROM e0
      |), deg AS (
      |  SELECT src, count(*) AS d FROM sym GROUP BY src
      |), pairs AS (
      |  SELECT CAST(dx.d AS HUGEINT) AS x, CAST(dy.d AS HUGEINT) AS y
      |  FROM sym
      |  JOIN deg dx ON dx.src = sym.src
      |  JOIN deg dy ON dy.src = sym.dst
      |), m AS (
      |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM pairs
      |)
      |SELECT CAST(n AS BIGINT) AS n_edges,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS assortativity
      |FROM m""".stripMargin

  /** q193: modularity of the LPA partition — Newman's Q, the standard
    * "are these communities real?" score for q128's output: per
    * community c, Q_c = e_c/m − (d_c/2m)², summed over communities.
    * The audit that turns community detection from a label dump into
    * a judged result (Q near 0 → the partition is no better than
    * random; the per-community contributions localize WHICH labels
    * carry structure).
    *
    * Exactness: the contribution numerator 4·m·e_c − d_c² is computed
    * in Decimal(38,0) (products of two edge-scale counts overflow
    * longs at 100 TB; DuckDB runs the same algebra in HUGEINT) and
    * emitted as the exact integer `q_num` next to the double
    * q_contrib = q_num / 4m², computed with the identical expression
    * on both engines.
    *
    * Scale shape: degrees are one map-combined aggregate over the
    * edge list; e_c is the label join on the two endpoint keys (the
    * edges shuffle twice on node id — the same exchanges LPA itself
    * pays per round); m is a 1-row broadcast. Nothing sorts, nothing
    * is driver-side. */
  def q193Modularity(spark: SparkSession, dir: String): DataFrame = {
    val (labels, base) = lpaPacked(spark, dir, persistBase = true)
    val mDf = base.agg(count(lit(1)).as("m"))
    val deg = base.select(col("a").as("node"))
      .unionByName(base.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val la = labels.select(col("node").as("a"), col("label").as("ca"))
    val lb = labels.select(col("node").as("b"), col("label").as("cb"))
    val eIn = base.join(la, "a").join(lb, "b")
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("cid")).agg(count(lit(1)).as("e_in"))
    val ds = labels.join(deg, "node")
      .groupBy(col("label").as("cid"))
      .agg(sum(col("deg")).as("d_sum"), count(lit(1)).as("n_nodes"))
    ds.join(eIn, Seq("cid"), "left")
      .crossJoin(broadcast(mDf))
      .select(
        concat(when(col("cid") % 2 === 0, lit("s")).otherwise(lit("c")),
          expr("cid div 2")).as("community"),
        col("n_nodes"), coalesce(col("e_in"), lit(0L)).as("e_in"),
        col("d_sum"),
        expr("""CAST(CAST(4 AS DECIMAL(38,0)) * m * coalesce(e_in, 0)
               |  - CAST(d_sum AS DECIMAL(38,0)) * d_sum AS BIGINT)"""
          .stripMargin).as("q_num"),
        expr("""CAST(CAST(4 AS DECIMAL(38,0)) * m * coalesce(e_in, 0)
               |  - CAST(d_sum AS DECIMAL(38,0)) * d_sum AS DOUBLE)
               |  / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE))"""
          .stripMargin).as("q_contrib"))
  }

  val q193Oracle: String =
    s"""$LpaCtePrefix,
       |lab AS (SELECT node, label FROM l$LpaRounds),
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e0),
       |deg AS (
       |  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
       |  FROM e GROUP BY 1
       |), din AS (
       |  SELECT la.label AS cid, CAST(count(*) AS BIGINT) AS e_in
       |  FROM e0
       |  JOIN lab la ON la.node = e0.a
       |  JOIN lab lb ON lb.node = e0.b
       |  WHERE la.label = lb.label GROUP BY 1
       |), ds AS (
       |  SELECT l.label AS cid, CAST(sum(d.deg) AS BIGINT) AS d_sum,
       |    CAST(count(*) AS BIGINT) AS n_nodes
       |  FROM lab l JOIN deg d ON d.node = l.node GROUP BY 1)
       |SELECT CASE WHEN cid % 2 = 0 THEN 's' || (cid // 2)
       |            ELSE 'c' || (cid // 2) END AS community,
       |  n_nodes, coalesce(e_in, CAST(0 AS BIGINT)) AS e_in, d_sum,
       |  CAST(4 * mm.m * coalesce(e_in, 0)
       |    - CAST(d_sum AS HUGEINT) * d_sum AS BIGINT) AS q_num,
       |  CAST(4 * mm.m * coalesce(e_in, 0)
       |    - CAST(d_sum AS HUGEINT) * d_sum AS DOUBLE)
       |    / (4.0 * CAST(mm.m AS DOUBLE) * CAST(mm.m AS DOUBLE)) AS q_contrib
       |FROM ds LEFT JOIN din USING (cid) CROSS JOIN mm""".stripMargin

  val HitsIters = 2
  val HitsScale = 1000000L

  /** q195: HITS hubs & authorities (Kleinberg, JACM'99) over the
    * supplier→customer supply graph — the companion centrality to
    * q84's PageRank: suppliers are hubs (they point at the customers
    * they serve), customers are authorities.
    *
    * Exactness trick: textbook HITS L2-normalizes each round — dead
    * on arrival for a cross-engine bit-exact oracle (sqrt of a sum of
    * squares in doubles). But power iteration is scale-invariant:
    * intermediate normalization is COSMETIC, so the iterations run
    * unnormalized in exact Decimal(38,0) integer space and a single
    * max-rescale at the end maps scores to [0, Scale] —
    * o(v) = (v · Scale) div max. Magnitudes grow as at most
    * degree_max per half-round: after 2 full rounds ≤ D⁴, inside
    * Decimal(38,0) for any D up to ~3·10⁹ — beyond any real graph's
    * max degree.
    *
    * Why end-only normalization also matters for the PLAN: a per-round
    * rescale needs that round's max — a broadcast barrier whose
    * subtree must fully materialize before the next round plans, a
    * sequential chain of 4 jobs (measured 4.7 s at sf0.1). Without it
    * the 2 rounds fuse into ONE linear DAG — per half-round one
    * co-partitioned hash join + one map-combined sum, the Pregel
    * pattern, exactly q84's shape and cost — with two 1-row max
    * broadcasts only at the very end over persisted finals. Reference
    * anchor: the supply-chain join lineitem→orders
    * (aw_silver_layer_sales transformations) that defines every graph
    * family here. */
  def q195Hits(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val edges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("src"), col("o_custkey").as("dst"))
      .distinct()
      .persist()
    val (hub, auth) = hits(edges, HitsIters)
    hub.select(concat(lit("s"), col("src")).as("node"),
        lit("hub").as("kind"), col("h").as("score"))
      .unionAll(auth.select(concat(lit("c"), col("dst")).as("node"),
        lit("authority").as("kind"), col("a").as("score")))
  }

  /** The unnormalized exact power iteration over a (src, dst) edge
    * frame, max-rescaled once at the end; returns
    * (hubs (src, h), authorities (dst, a)) after `iters` full rounds,
    * scores in [0, Scale]. */
  def hits(edges: DataFrame, iters: Int): (DataFrame, DataFrame) = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    var hub = edges.select(col("src")).distinct()
      .withColumn("h", lit(1L).cast(dec))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      auth = edges.join(hub, "src")
        .groupBy(col("dst")).agg(sum(col("h")).as("a"))
      hub = edges.join(auth, "dst")
        .groupBy(col("src")).agg(sum(col("a")).as("h"))
    }
    // finals are each referenced twice (their own max + the rescale):
    // persist node-sized frames so the two 1-row max broadcasts read
    // cache instead of re-running the iteration chain (the q104
    // lesson); released by the consumer's clearCache.
    //
    // ORDER MATTERS (the q104 lesson applied one node earlier): auth is
    // hub's ancestor, and persist() compiles the cached plan at call
    // time — persisting hub first would bake in an UNcached auth
    // subtree and run the whole power-iteration chain twice (once to
    // fill hub's cache, once for auth's). So: persist auth, materialize
    // it (one count — the chain runs exactly once), THEN persist hub,
    // whose cached plan is now just one join + aggregate over auth's
    // populated cache.
    val authP = auth.persist()
    authP.count()
    val hubP = hub.persist()
    val hMax = hubP.agg(max(col("h")).as("hm"))
    val aMax = authP.agg(max(col("a")).as("am"))
    (hubP.crossJoin(broadcast(hMax))
      .select(col("src"),
        expr(s"CAST((h * $HitsScale) div hm AS BIGINT)").as("h")),
      authP.crossJoin(broadcast(aMax))
        .select(col("dst"),
          expr(s"CAST((a * $HitsScale) div am AS BIGINT)").as("a")))
  }

  val q195Oracle: String = {
    val rounds = (1 to HitsIters).map { r =>
      s"""a$r AS (
         |  SELECT e.dst, sum(h.h) AS a
         |  FROM e JOIN h${r - 1} h ON h.src = e.src GROUP BY 1),
         |h$r AS (
         |  SELECT e.src, sum(a.a) AS h
         |  FROM e JOIN a$r a ON a.dst = e.dst GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT l.l_suppkey AS src, o.o_custkey AS dst
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |), h0 AS (
       |  SELECT DISTINCT src, CAST(1 AS HUGEINT) AS h FROM e
       |),
       |$rounds
       |SELECT 's' || src AS node, 'hub' AS kind,
       |  CAST(h * $HitsScale // (SELECT max(h) FROM h$HitsIters) AS BIGINT)
       |    AS score
       |FROM h$HitsIters
       |UNION ALL
       |SELECT 'c' || dst AS node, 'authority' AS kind,
       |  CAST(a * $HitsScale // (SELECT max(a) FROM a$HitsIters) AS BIGINT)
       |    AS score
       |FROM a$HitsIters""".stripMargin
  }

  /** q226: graph diameter lower bound by the double-sweep BFS heuristic
    * (Magnien–Latapy–Habib): BFS from a deterministic start, hop to the
    * farthest node found (ties → lowest packed id), BFS again from
    * there — the second eccentricity is a certified LOWER bound on the
    * diameter, and on real-world graphs usually IS the diameter. Runs
    * on the supplier–customer co-transaction graph in packed-long id
    * space (q122's trick); both sweeps share one cached symmetric edge
    * list partitioned on the join key.
    *
    * Scale shape: two q122-style frontier loops (≤ [[DiamMaxHops]]
    * rounds each, only the frontier shuffles per round); the two
    * argmax "collects" are single rows (statistics-sized, the BPE/
    * k-center precedent). Hop caps are part of the operator contract —
    * identical on the oracle side, so a cap-truncated sweep still
    * hash-matches. */
  val DiamMaxHops = 6

  def q226GraphDiameter(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val base = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2L).as("a"),
        (col("o_custkey") * 2L + 1L).as("b"))
      .distinct()
    val sym = base.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(base.select(col("b").as("src"), col("a").as("dst")))
      .repartition(col("src"))
      .persist()

    def bfs(seed: Long): DataFrame = {
      var dist = spark.range(1).select(lit(seed).as("node"),
        lit(0L).as("hop")).persist()
      var frontier = dist
      var h = 1
      var done = false
      while (h <= DiamMaxHops && !done) {
        val next = frontier
          .join(sym, frontier("node") === sym("src"))
          .select(col("dst").as("node")).distinct()
          .join(dist.select("node"), Seq("node"), "left_anti")
          .withColumn("hop", lit(h.toLong))
          .persist()
        // fixpoint early-exit: a dense graph saturates in a few hops —
        // running the remaining capped rounds over an EMPTY frontier
        // only pays join-stage latency (17.9 s → 8.7 s at sf0.1; what
        // remains is the two sweeps' inherent round latency, the q122/
        // q194 tradeoff that amortizes at real scale). The oracle's
        // recursive CTE stops the same way, so results are unchanged.
        if (next.isEmpty) done = true
        else { dist = dist.unionByName(next); frontier = next }
        h += 1
      }
      dist
    }

    def farthest(dist: DataFrame): (Long, Long) = {
      val r = dist.orderBy(col("hop").desc, col("node")).limit(1)
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    // min over the PERSISTED symmetric list (it carries every node as
    // src) — deriving it from `base` would re-run the join + distinct
    val start = sym.agg(min(col("src"))).collect()(0).getLong(0)
    val (far1, ecc1) = farthest(bfs(start))
    val d2 = bfs(far1).persist()
    val (far2, ecc2) = farthest(d2)
    val nReached = d2.count()

    def label(node: Long): String =
      (if (node % 2 == 0) "s" else "c") + (node / 2)

    spark.range(1).select(
      lit(label(start)).as("start_node"),
      lit(label(far1)).as("sweep1_far"), lit(ecc1).as("sweep1_ecc"),
      lit(label(far2)).as("sweep2_far"), lit(ecc2).as("diameter_lb"),
      lit(nReached).as("n_reached"))
  }

  val q226Oracle: String =
    s"""WITH RECURSIVE e0 AS (
       |  SELECT DISTINCT l.l_suppkey * 2 AS a, o.o_custkey * 2 + 1 AS b
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |), sym AS (
       |  SELECT a AS src, b AS dst FROM e0
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM e0
       |), start1 AS (
       |  SELECT min(n) AS s FROM
       |    (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0)
       |), bfs1(node, hop) AS (
       |  SELECT s, 0 FROM start1
       |  UNION
       |  SELECT sym.dst, bfs1.hop + 1
       |  FROM bfs1 JOIN sym ON bfs1.node = sym.src
       |  WHERE bfs1.hop < $DiamMaxHops
       |), d1 AS (
       |  SELECT node, min(hop) AS hop FROM bfs1 GROUP BY 1
       |), far1 AS (
       |  SELECT node, hop FROM d1 ORDER BY hop DESC, node LIMIT 1
       |), bfs2(node, hop) AS (
       |  SELECT node, 0 FROM far1
       |  UNION
       |  SELECT sym.dst, bfs2.hop + 1
       |  FROM bfs2 JOIN sym ON bfs2.node = sym.src
       |  WHERE bfs2.hop < $DiamMaxHops
       |), d2 AS (
       |  SELECT node, min(hop) AS hop FROM bfs2 GROUP BY 1
       |), far2 AS (
       |  SELECT node, hop FROM d2 ORDER BY hop DESC, node LIMIT 1
       |), lbl AS (
       |  SELECT
       |    (SELECT CASE WHEN s % 2 = 0 THEN 's' ELSE 'c' END || (s // 2)
       |     FROM start1) AS start_node,
       |    (SELECT CASE WHEN node % 2 = 0 THEN 's' ELSE 'c' END ||
       |       (node // 2) FROM far1) AS sweep1_far,
       |    (SELECT CAST(hop AS BIGINT) FROM far1) AS sweep1_ecc,
       |    (SELECT CASE WHEN node % 2 = 0 THEN 's' ELSE 'c' END ||
       |       (node // 2) FROM far2) AS sweep2_far,
       |    (SELECT CAST(hop AS BIGINT) FROM far2) AS diameter_lb,
       |    (SELECT count(*) FROM d2) AS n_reached)
       |SELECT * FROM lbl""".stripMargin

  /** q246 iteration count / restart scale (α = 1/2 as an exact dyadic,
    * the q229 discipline: every smoothing step is one truncating
    * division). */
  val PprIters = 3
  val PprScale = 1000000000L

  /** q246: personalized PageRank (random walk with restart; Haveliwala
    * 2002) from a SEED SET — "which customers and suppliers sit
    * closest, by co-transaction structure, to the best-covered
    * nation's suppliers?"
    * The recommendation/expansion primitive q84's global PageRank
    * can't answer: teleport mass returns to the seeds, so proximity
    * is measured FROM the seed neighborhood instead of from the whole
    * graph's stationary flow.
    *
    * Exact integer protocol: rank mass starts as ⌊S/|seeds|⌋ on each
    * seed; one round is r'(v) = (Σ_{u∼v} r(u) div d(u)) div 2 +
    * ⌊⌊S/|seeds|⌋/2⌋·[v ∈ seeds] — per-neighbor floor first, then the
    * α = 1/2 damping floor, teleport last: a defined order both
    * engines replay bit-for-bit (div ≡ // on nonnegative mass). The
    * walk runs on the symmetrized supplier–customer co-transaction
    * graph in packed-long id space (q122's trick: supplier k → 2k,
    * customer k → 2k+1).
    *
    * Scale shape: [[PprIters]] rounds of (edges ⋈ rank frame on src,
    * map-combined sum per dst, full-outer with the broadcast seed
    * frame) — the rank frame stays node-sized, only it shuffles per
    * round, and the chain is LINEAR (each r_i consumed exactly once —
    * no q195-style double materialization to guard). Seed-share
    * derivation is a 1-row broadcast, not a driver collect. */
  def q246PersonalizedPagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val sc = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2L).as("s"),
        (col("o_custkey") * 2L + 1L).as("c"))
      .distinct()
    val edges = sc.select(col("s").as("src"), col("c").as("dst"))
      .unionAll(sc.select(col("c").as("src"), col("s").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // persist the degree-annotated edge list, not the bare edges: it is
    // what every round joins against, and an unpersisted ecd would
    // re-run the lineitem⋈orders scan + degree shuffle once per round
    val ecd = edges.join(deg, "src").persist()

    // seed nation: the one with the MOST suppliers (ties -> lowest
    // key) — deterministic and non-empty at every scale factor (a
    // fixed nation id would seed nothing at sf0.001's 10 suppliers)
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val seedNat = sup.groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("cnt"))
      .agg(max(struct(col("cnt"),
        (-col("s_nationkey")).as("negk"))).as("m"))
      .select((-col("m.negk")).cast("int").as("seed_nat"),
        col("m.cnt").as("n_seeds"))
    val seeds = sup
      .join(broadcast(seedNat), col("s_nationkey") === col("seed_nat"))
      .select((col("s_suppkey") * 2L).as("v"),
        expr(s"$PprScale div n_seeds").as("share"))
      .persist()

    var r = seeds.select(col("v"), col("share").as("r"))
    for (_ <- 1 to PprIters) {
      val flow = ecd.join(r, col("src") === r("v"))
        .groupBy(col("dst").as("fv"))
        .agg(expr("sum(r div d) div 2").as("fl"))
      r = flow.join(seeds.select(col("v"), expr("share div 2").as("tele")),
          col("fv") === col("v"), "full")
        .select(coalesce(col("fv"), col("v")).as("v"),
          (coalesce(col("fl"), lit(0L)) + coalesce(col("tele"), lit(0L)))
            .as("r"))
    }
    r.filter(col("r") > 0L)
      .select(
        concat(when(col("v") % 2L === 0L, lit("s")).otherwise(lit("c")),
          expr("v div 2")).as("node"),
        col("r").as("ppr_score"))
  }

  val q246Oracle: String = {
    val rounds = (1 to PprIters).map { i =>
      s"""r$i AS (
         |  SELECT coalesce(f.v, s.v) AS v,
         |    coalesce(f.fl, 0) + coalesce(s.tele, 0) AS r
         |  FROM (
         |    SELECT e.dst AS v, CAST(sum(r.r // d.d) // 2 AS BIGINT) AS fl
         |    FROM e JOIN r${i - 1} r ON r.v = e.src
         |    JOIN deg d ON d.v = e.src
         |    GROUP BY 1) f
         |  FULL JOIN (SELECT v, CAST(share // 2 AS BIGINT) AS tele
         |             FROM seeds) s ON s.v = f.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH sc AS (
       |  SELECT DISTINCT l.l_suppkey * 2 AS s, o.o_custkey * 2 + 1 AS c
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |), e AS (
       |  SELECT s AS src, c AS dst FROM sc
       |  UNION ALL
       |  SELECT c AS src, s AS dst FROM sc
       |), deg AS (
       |  SELECT src AS v, count(*) AS d FROM e GROUP BY 1
       |), sn AS (
       |  SELECT s_nationkey AS seed_nat, count(*) AS n_seeds
       |  FROM supplier GROUP BY 1
       |  ORDER BY n_seeds DESC, seed_nat ASC LIMIT 1
       |), seeds AS (
       |  SELECT s_suppkey * 2 AS v,
       |    CAST($PprScale // n_seeds AS BIGINT) AS share
       |  FROM supplier JOIN sn ON s_nationkey = seed_nat
       |), r0 AS (
       |  SELECT v, share AS r FROM seeds
       |),
       |$rounds
       |SELECT (CASE WHEN v % 2 = 0 THEN 's' ELSE 'c' END ||
       |    CAST(v // 2 AS VARCHAR)) AS node,
       |  CAST(r AS BIGINT) AS ppr_score
       |FROM r$PprIters WHERE r > 0""".stripMargin
  }

  /** q248: degree-distribution profile of the co-transaction graph —
    * the first thing anyone asks of a graph at scale ("is it
    * power-law? where does the tail start?") and the diagnostic that
    * decides whether the OTHER graph queries need skew handling: a
    * heavy log-log tail here is exactly what breaks per-key joins in
    * q84/q195 (and what q91's salting exists for).
    *
    * Buckets are EXACT log2 bins — bucket = bit length of the degree
    * (length of its binary representation: an integer string op on
    * both engines, no transcendental log whose floor could flip at a
    * power-of-two boundary). Per (node kind, bucket): node count, edge
    * sum, degree extremes, and the kind-share in ppm (one truncating
    * division on the ≤64-row bucket frame).
    *
    * Scale shape: one shuffle to the per-node degree frame (map-
    * combined count on src), one aggregate to the |kinds|×|buckets|
    * frame, kind totals re-aggregate THAT frame broadcast back — the
    * corpus is touched once. */
  def q248DegreeDist(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val sc = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") * 2L).as("s"),
        (col("o_custkey") * 2L + 1L).as("c"))
      .distinct()
    val deg = sc.select(col("s").as("v")).unionAll(sc.select(col("c").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val buckets = deg
      .select(when(col("v") % 2L === 0L, lit("supplier"))
          .otherwise(lit("customer")).as("kind"),
        length(expr("bin(d)")).cast("long").as("bucket"), col("d"))
      .groupBy(col("kind"), col("bucket"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("sum_deg"),
        min(col("d")).as("min_deg"), max(col("d")).as("max_deg"))
    val totals = buckets.groupBy(col("kind"))
      .agg(sum(col("n_nodes")).as("kind_nodes"))
    buckets.join(broadcast(totals), Seq("kind"))
      .select(col("kind"), col("bucket"),
        expr("CAST(shiftleft(1, CAST(bucket - 1 AS INT)) AS BIGINT)")
          .as("deg_lo"),
        col("n_nodes"), col("sum_deg"), col("min_deg"), col("max_deg"),
        expr("CAST(n_nodes AS DECIMAL(38,0)) * 1000000 div kind_nodes")
          .cast("long").as("share_ppm"))
  }

  val q248Oracle: String =
    """WITH sc AS (
      |  SELECT DISTINCT l.l_suppkey * 2 AS s, o.o_custkey * 2 + 1 AS c
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |), deg AS (
      |  SELECT v, count(*) AS d FROM (
      |    SELECT s AS v FROM sc UNION ALL SELECT c AS v FROM sc)
      |  GROUP BY 1
      |), b AS (
      |  SELECT CASE WHEN v % 2 = 0 THEN 'supplier' ELSE 'customer' END
      |      AS kind,
      |    CAST(length(printf('%b', d)) AS BIGINT) AS bucket, d
      |  FROM deg
      |), agg AS (
      |  SELECT kind, bucket, count(*) AS n_nodes,
      |    CAST(sum(d) AS BIGINT) AS sum_deg,
      |    CAST(min(d) AS BIGINT) AS min_deg,
      |    CAST(max(d) AS BIGINT) AS max_deg
      |  FROM b GROUP BY 1, 2
      |), tot AS (
      |  SELECT kind, CAST(sum(n_nodes) AS BIGINT) AS kind_nodes
      |  FROM agg GROUP BY 1
      |)
      |SELECT a.kind, a.bucket,
      |  CAST(1 << CAST(a.bucket - 1 AS INT) AS BIGINT) AS deg_lo,
      |  a.n_nodes, a.sum_deg, a.min_deg, a.max_deg,
      |  CAST(CAST(a.n_nodes AS HUGEINT) * 1000000 // t.kind_nodes
      |    AS BIGINT) AS share_ppm
      |FROM agg a JOIN tot t ON t.kind = a.kind""".stripMargin
}
