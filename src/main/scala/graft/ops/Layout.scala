package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-layout operators: multi-dimensional clustering for scan
  * pruning. At 100 TB the scan you avoid is worth more than any join
  * trick — Z-ordering (bit-interleaved space-filling curve) is how
  * lakehouse tables (Delta OPTIMIZE ZORDER, Iceberg sort orders) keep
  * min/max file statistics tight on TWO dimensions at once, so a
  * predicate on either column prunes most files.
  */
object Layout {

  /** Bits per dimension; 2·[[ZBits]] total z-value bits. */
  val ZBits = 8

  /** Rows per z-range "file": 64 consecutive z-values = one aligned
    * 8×8 tile of the (bx, by) grid, so every file's per-dimension
    * extent is provably ≤ 8 of 256 bucket values — the tight min/max
    * stats that make skipping work. */
  val ZTile = 64

  /** The bit-interleave z-value as a SQL fragment, generated once for
    * both dialects (only integer division differs): z = Σᵢ bit_i(bx)·4ⁱ
    * + 2·bit_i(by)·4ⁱ. Pure integer arithmetic — evaluates identically
    * in Spark codegen and DuckDB. */
  def zInterleaveSql(bx: String, by: String, intDiv: String): String =
    (0 until ZBits).map { i =>
      val p = 1L << i
      s"((($bx) $intDiv $p) % 2) * ${1L << (2 * i)} + " +
        s"((($by) $intDiv $p) % 2) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** q92: Z-order layout audit — bucket lineitem on two independent
    * columns (partkey, suppkey) into 256×256 cells, interleave the
    * bucket bits into a z-value, group rows into [[ZTile]]-wide z-range
    * files, and report each file's row count and per-dimension min/max
    * extents (the zone-map a scan would prune on) plus its covered
    * cell area. With z-ordering every file covers an aligned 8×8 tile
    * (extent ≤ 8 on BOTH dimensions); linear ordering by one column
    * would leave the other dimension's extent at the full 256.
    *
    * Plan: one narrow projection (the interleave is a codegen'd integer
    * expression — no UDF), one hash aggregate on file_id. At 100 TB the
    * same z-value is what you'd `repartitionByRange(z).sortWithinPartitions(z)`
    * on before writing — the audit here is the layout-quality report
    * that decides whether that rewrite is worth it. */
  def q92ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select((col("l_partkey") % 256).as("bx"), (col("l_suppkey") % 256).as("yb"))
    val z = expr(zInterleaveSql("bx", "yb", "div"))
    li.select((z.cast("long") / ZTile).cast("long").as("file_id"),
        col("bx"), col("yb"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("bx")).as("bx_min"), max(col("bx")).as("bx_max"),
        min(col("yb")).as("by_min"), max(col("yb")).as("by_max"))
      .select(col("file_id"), col("n_rows"),
        col("bx_min"), col("bx_max"), col("by_min"), col("by_max"),
        ((col("bx_max") - col("bx_min") + 1) *
          (col("by_max") - col("by_min") + 1)).as("extent_area"))
  }

  val q92Oracle: String = {
    val z = zInterleaveSql("bx", "yb", "//")
    s"""WITH b AS (
       |  SELECT l_partkey % 256 AS bx, l_suppkey % 256 AS yb FROM lineitem
       |), f AS (
       |  SELECT CAST($z // $ZTile AS BIGINT) AS file_id, bx, yb FROM b
       |), agg AS (
       |  SELECT file_id, count(*) AS n_rows,
       |    min(bx) AS bx_min, max(bx) AS bx_max,
       |    min(yb) AS by_min, max(yb) AS by_max
       |  FROM f GROUP BY 1)
       |SELECT file_id, n_rows, bx_min, bx_max, by_min, by_max,
       |  (bx_max - bx_min + 1) * (by_max - by_min + 1) AS extent_area
       |FROM agg""".stripMargin
  }

  /** Target rows per compacted output file (bin). */
  val CompactTarget = 4096L

  /** q143: compaction plan — the OPTIMIZE/bin-packing maintenance pass
    * a lakehouse runs over small files: assign the q92 z-range
    * "files" to [[CompactTarget]]-row output bins, packing by
    * next-fit over the size-descending order (each file lands in the
    * bin its exclusive prefix-sum START offset falls into — bins can
    * overflow by at most one file, the q59/q60 chunk-boundary
    * semantics). The prefix runs through [[Rank.globalPrefixSum]]'s
    * bucketed two-phase plan — the plan stays distributed even when
    * "files" means millions of them, exactly the real OPTIMIZE input
    * (the frame here is already aggregate-sized; the primitive costs
    * nothing extra). Output: each file's bin plus the bin's total
    * rows and file count — the work manifest a compactor would
    * execute. All-integer → bit-exact oracle. */
  def q143CompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val files = q92ZorderLayout(spark, dir)
      .select(col("file_id"), col("n_rows"))
      .withColumn("_negrows", -col("n_rows"))
    val cum = Rank.globalPrefixSum(files, "_negrows", Seq("file_id"),
      "n_rows", "cum")
    val assigned = cum
      .withColumn("bin_id", expr(s"(cum - n_rows) div ${CompactTarget}L"))
      .select(col("file_id"), col("n_rows"), col("bin_id"))
    val bins = assigned.groupBy(col("bin_id"))
      .agg(sum(col("n_rows")).as("bin_rows"),
        count(lit(1)).as("bin_files"))
    assigned.join(broadcast(bins), Seq("bin_id"))
      .select(col("file_id"), col("n_rows"), col("bin_id"),
        col("bin_rows"), col("bin_files"))
  }

  val q143Oracle: String = {
    val z = zInterleaveSql("bx", "yb", "//")
    s"""WITH b AS (
       |  SELECT l_partkey % 256 AS bx, l_suppkey % 256 AS yb FROM lineitem
       |), f AS (
       |  SELECT CAST($z // $ZTile AS BIGINT) AS file_id, count(*) AS n_rows
       |  FROM b GROUP BY 1
       |), c AS (
       |  SELECT file_id, n_rows,
       |    sum(n_rows) OVER (ORDER BY n_rows DESC, file_id ASC) AS cum
       |  FROM f
       |), a AS (
       |  SELECT file_id, CAST(n_rows AS BIGINT) AS n_rows,
       |    CAST((cum - n_rows) // $CompactTarget AS BIGINT) AS bin_id
       |  FROM c
       |)
       |SELECT a.file_id, a.n_rows, a.bin_id,
       |  g.bin_rows, g.bin_files
       |FROM a JOIN (
       |  SELECT bin_id, CAST(sum(n_rows) AS BIGINT) AS bin_rows,
       |    count(*) AS bin_files
       |  FROM a GROUP BY 1) g USING (bin_id)""".stripMargin
  }

  /** Target partition count for the q144 range-partition plan. */
  val RangeSplits = 16L

  /** q144: equi-depth range-partition planner — the EXACT version of
    * what `RangePartitioner` / `repartitionByRange` estimate by
    * sampling: the [[RangeSplits]]−1 split values that divide lineitem
    * (ordered by price cents, then the (orderkey, linenumber) total
    * order) into equal-row ranges. A skew-proof layout needs true
    * equi-depth boundaries — equi-WIDTH splits put most rows in a few
    * partitions whenever the value distribution is heavy-tailed.
    *
    * Boundary i (1-based, i < B) is the row whose 1-based global rank
    * t = ceil(i·n/B). Rather than joining a splits table against the
    * corpus (a nested-loop over every row), each ranked row decides
    * LOCALLY whether it is a boundary: i₀ = (B·t) div n is the only
    * candidate split for rank t, and t = ceil(i₀·n/B) ⟺
    * B·(t−1) < i₀·n — a codegen'd integer filter on top of
    * [[Rank.groupRank]]'s bucketed global rank (no single-task window,
    * no driver pass over data; the mapping t→i₀ is injective for
    * n > B, which holds from sf0.001 up). All-integer → bit-exact
    * oracle. */
  def q144PartitionPlan(spark: SparkSession, dir: String): DataFrame = {
    val B = RangeSplits
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)").as("cents"))
    Rank.groupRank(li, Nil, "cents", Seq("l_orderkey", "l_linenumber"),
        "rk", "n")
      .withColumn("t", col("rk") + 1)
      .withColumn("split_id", expr(s"(${B}L * t) div n"))
      .where(col("split_id") >= 1 && col("split_id") <= (B - 1) &&
        expr(s"${B}L * (t - 1) < split_id * n"))
      .select(col("split_id"), col("t").as("rows_le"),
        col("cents").as("boundary_cents"), col("n").as("n_rows"))
  }

  val q144Oracle: String =
    s"""WITH v AS (
       |  SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT) AS cents,
       |    row_number() OVER (
       |      ORDER BY CAST(round(l_extendedprice * 100.0) AS BIGINT) ASC,
       |        l_orderkey ASC, l_linenumber ASC) AS t,
       |    count(*) OVER () AS n
       |  FROM lineitem
       |)
       |SELECT CAST(($RangeSplits * t) // n AS BIGINT) AS split_id,
       |  CAST(t AS BIGINT) AS rows_le, cents AS boundary_cents,
       |  CAST(n AS BIGINT) AS n_rows
       |FROM v
       |WHERE ($RangeSplits * t) // n BETWEEN 1 AND ${RangeSplits - 1}
       |  AND $RangeSplits * (t - 1) < (($RangeSplits * t) // n) * n"""
      .stripMargin

  /** q154: zone-map overlap depth — the clustering-quality metric
    * behind OPTIMIZE decisions: at each point of the bx key domain,
    * how many of the q92 z-range files' [bx_min, bx_max] extents
    * cover it — i.e. how many files a point predicate on that value
    * must read. A perfectly clustered layout has depth ≈ files/domain;
    * overlap depth growing with file count means the zone maps have
    * stopped pruning and a re-cluster pays for itself. Classic sweep
    * line: +1 at each extent start, −1 past each end, prefix-summed
    * over the position order; reported at every change point (depth is
    * constant between them), with the per-position start/end counts
    * that localize WHICH compaction created the pile-up.
    *
    * Plan: the boundary-event frame is 2 rows per file, hash-aggregated
    * by position (map-side combinable), then [[Rank.globalPrefixSum]]'s
    * bucketed two-phase sweep — no single-task global window even when
    * "files" means millions of them and the key domain is a full
    * column range rather than q92's 256 buckets. */
  def q154OverlapDepth(spark: SparkSession, dir: String): DataFrame = {
    val files = q92ZorderLayout(spark, dir)
      .select(col("file_id"), col("bx_min"), col("bx_max"))
    val events = files
      .select(col("bx_min").as("bx_pos"), lit(1L).as("delta"))
      .unionAll(files.select((col("bx_max") + 1L).as("bx_pos"),
        lit(-1L).as("delta")))
    val grouped = events.groupBy(col("bx_pos"))
      .agg(sum(col("delta")).as("net"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("files_start"),
        sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("files_end"))
    Rank.globalPrefixSum(grouped, "bx_pos", Nil, "net", "depth")
      .select(col("bx_pos"), col("files_start"), col("files_end"),
        col("depth"))
  }

  val q154Oracle: String = {
    val z = zInterleaveSql("bx", "yb", "//")
    s"""WITH b AS (
       |  SELECT l_partkey % 256 AS bx, l_suppkey % 256 AS yb FROM lineitem
       |), f AS (
       |  SELECT CAST($z // $ZTile AS BIGINT) AS file_id,
       |    min(bx) AS bx_min, max(bx) AS bx_max
       |  FROM b GROUP BY 1
       |), e AS (
       |  SELECT bx_min AS bx_pos, 1 AS delta FROM f
       |  UNION ALL SELECT bx_max + 1, -1 FROM f
       |), g AS (
       |  SELECT bx_pos, sum(delta) AS net,
       |    sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS files_start,
       |    sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS files_end
       |  FROM e GROUP BY 1
       |)
       |SELECT bx_pos, CAST(files_start AS BIGINT) AS files_start,
       |  CAST(files_end AS BIGINT) AS files_end,
       |  CAST(sum(net) OVER (ORDER BY bx_pos ASC) AS BIGINT) AS depth
       |FROM g""".stripMargin
  }

  /** q164 file width under each candidate ordering. */
  val AdvisorRowsPerFile = 4096L

  /** q164: sort-order advisor — the decision OPTIMIZE/cluster-by has
    * to make, answered by measurement instead of folklore: lay the
    * fact table out under three candidate orderings (cluster by x,
    * cluster by y, z-order both), cut each layout into
    * [[AdvisorRowsPerFile]]-row files, and report each layout's
    * zone-map quality per probe dimension — the average fraction of
    * the value domain a file's [min, max] extent covers, which IS the
    * probability a random point probe on that column fails to skip
    * the file. Single-column clustering gives ~perfect skipping on
    * its own column and none on the other; z-order pays a small
    * factor on both — the advisor makes that trade-off a number.
    *
    * Plan: each layout's file assignment is a bucketed two-phase
    * global rank ([[Rank.groupRank]] — no single-task corpus sort,
    * unlike a naive row_number() OVER (ORDER BY …)), followed by a
    * per-file zone aggregate and a |files|-sized rollup; the three
    * layouts are one scan each, unioned at aggregate size. All-integer
    * ppm output. */
  def q164SortAdvisor(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "lineitem")
      .select((col("l_partkey") % 256).as("bx"),
        (col("l_suppkey") % 256).as("yb"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("z", expr(zInterleaveSql("bx", "yb", "div")).cast("long"))
    def layout(name: String, orderCol: String): DataFrame = {
      val ranked = Rank.groupRank(base, Seq.empty, orderCol,
        Seq("l_orderkey", "l_linenumber"), "_rk", "_n")
      ranked
        .select(expr(s"_rk div $AdvisorRowsPerFile").as("file_id"),
          col("bx"), col("yb"))
        .groupBy(col("file_id"))
        .agg((max(col("bx")) - min(col("bx")) + 1L).as("wx"),
          (max(col("yb")) - min(col("yb")) + 1L).as("wy"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("wx")).as("sx"), sum(col("wy")).as("sy"))
        .select(lit(name).as("layout"), col("n_files"),
          expr("(sx * 1000000) div (n_files * 256)").as("x_hit_ppm"),
          expr("(sy * 1000000) div (n_files * 256)").as("y_hit_ppm"))
    }
    layout("cluster_x", "bx")
      .unionByName(layout("cluster_y", "yb"))
      .unionByName(layout("zorder", "z"))
  }

  val q164Oracle: String = {
    val z = zInterleaveSql("bx", "yb", "//")
    // per-file zone widths then one rollup row per layout
    def lay(name: String, orderCol: String) =
      s"""SELECT '$name' AS layout, CAST(count(*) AS BIGINT) AS n_files,
         |  CAST((sum(wx) * 1000000) // (count(*) * 256) AS BIGINT)
         |    AS x_hit_ppm,
         |  CAST((sum(wy) * 1000000) // (count(*) * 256) AS BIGINT)
         |    AS y_hit_ppm
         |FROM (
         |  SELECT file_id, max(bx) - min(bx) + 1 AS wx,
         |    max(yb) - min(yb) + 1 AS wy
         |  FROM (
         |    SELECT (row_number() OVER (ORDER BY $orderCol ASC,
         |        l_orderkey ASC, l_linenumber ASC) - 1)
         |        // $AdvisorRowsPerFile AS file_id, bx, yb
         |    FROM b) a
         |  GROUP BY file_id) f""".stripMargin
    s"""WITH b AS (
       |  SELECT l_partkey % 256 AS bx, l_suppkey % 256 AS yb,
       |    CAST($z AS BIGINT) AS z, l_orderkey, l_linenumber
       |  FROM lineitem
       |)
       |${lay("cluster_x", "bx")}
       |UNION ALL
       |${lay("cluster_y", "yb")}
       |UNION ALL
       |${lay("zorder", "z")}""".stripMargin
  }

  /** q192: column-encoding advisor — the physical-design sibling of
    * the sort advisor (q164): per profiled lineitem column, the
    * statistics a writer needs to pick parquet encodings — value
    * count, distinct count (dictionary size), run count under the
    * table's key order (l_orderkey, then the in-order line key), the
    * derived average
    * run length, the dictionary index width in bits, and a
    * recommendation (RLE when runs average ≥ 2 values, DICT when the
    * dictionary is ≤ 1% of the rows, else PLAIN).
    *
    * Runs are counted WITHIN each order (a run never spans orders) —
    * the page/row-group analogy, and it keeps the lag window
    * partitioned by the high-cardinality l_orderkey instead of a
    * global sort. dict_bits is computed in integer space
    * (bit-length of n_distinct − 1), not ceil(log2(...)) — libm log2
    * is engine-dependent in the last ulp. One scan: the per-column
    * frames come from a generated `stack()` over a single projection,
    * not one pass per column.
    *
    * Scale shape: melt is narrow (RowGen, no shuffle); the run window
    * hash-partitions on (column, orderkey); two aggregates per column.
    * All outputs integer/string → bit-exact oracle. */
  val ProfiledCols: Seq[String] =
    Seq("l_returnflag", "l_linestatus", "l_quantity", "l_suppkey")

  def q192EncodingAdvisor(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stackArgs = ProfiledCols
      .map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    // (l_linenumber, l_partkey, l_suppkey, l_extendedprice) because
    // the generator does NOT keep l_linenumber unique within an order
    // — a tied sort key would make the lag order (hence run counts)
    // engine- and partitioning-dependent; this composite is a verified
    // unique key of lineitem at every SF
    val melted = Tables.load(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_extendedprice",
        s"stack(${ProfiledCols.size}, $stackArgs) AS (col_name, v)")
    val w = Window.partitionBy(col("col_name"), col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"))
    val marked = melted
      .withColumn("prev", lag(col("v"), 1).over(w))
      .select(col("col_name"), col("v"),
        when(col("prev").isNull || col("prev") =!= col("v"), 1L)
          .otherwise(0L).as("is_start"))
    val runs = marked.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_values"), sum(col("is_start")).as("n_runs"))
    val dist = melted.groupBy(col("col_name"))
      .agg(countDistinct(col("v")).as("n_distinct"))
    runs.join(dist, "col_name")
      .select(col("col_name"), col("n_values"), col("n_distinct"), col("n_runs"),
        expr("n_values * 1000000 div n_runs").as("avg_run_ppm"),
        expr("""CAST(CASE WHEN n_distinct <= 1 THEN 0
               |  ELSE length(conv(CAST(n_distinct - 1 AS STRING), 10, 2))
               |  END AS BIGINT)""".stripMargin).as("dict_bits"),
        expr("""CASE WHEN n_values * 1000000 div n_runs >= 2000000 THEN 'RLE'
               |     WHEN n_distinct * 100 <= n_values THEN 'DICT'
               |     ELSE 'PLAIN' END""".stripMargin).as("recommendation"))
  }

  val q192Oracle: String = {
    val melt = ProfiledCols
      .map(c => s"SELECT '$c' AS col_name, l_orderkey, l_linenumber, " +
        s"l_partkey, l_suppkey, l_extendedprice, " +
        s"CAST($c AS VARCHAR) AS v FROM lineitem")
      .mkString("\n  UNION ALL\n")
    s"""WITH melted AS (
       |$melt
       |), marked AS (
       |  SELECT col_name, v,
       |    CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v
       |      THEN 1 ELSE 0 END AS is_start
       |  FROM melted
       |  WINDOW w AS (PARTITION BY col_name, l_orderkey
       |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice)
       |), runs AS (
       |  SELECT col_name, CAST(count(*) AS BIGINT) AS n_values,
       |    CAST(sum(is_start) AS BIGINT) AS n_runs
       |  FROM marked GROUP BY 1
       |), dist AS (
       |  SELECT col_name, CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
       |  FROM melted GROUP BY 1)
       |SELECT r.col_name, n_values, n_distinct, n_runs,
       |  CAST(n_values * 1000000 // n_runs AS BIGINT) AS avg_run_ppm,
       |  CAST(CASE WHEN n_distinct <= 1 THEN 0
       |    ELSE length(printf('%b', n_distinct - 1)) END AS BIGINT) AS dict_bits,
       |  CASE WHEN n_values * 1000000 // n_runs >= 2000000 THEN 'RLE'
       |       WHEN n_distinct * 100 <= n_values THEN 'DICT'
       |       ELSE 'PLAIN' END AS recommendation
       |FROM runs r JOIN dist d USING (col_name)""".stripMargin
  }

  /** q200 shard counts: the rebalance under audit is 8 → 9 shards. */
  val ShardsOld = 8
  val ShardsNew = 9

  /** q200: shard-rebalance cost planner — how much data MOVES when the
    * shard count grows, under (a) modulo hashing and (b) rendezvous /
    * highest-random-weight hashing (Thaler & Ravishankar 1996, the
    * cache-array scheme consistent hashing generalizes). Per doc the
    * HRW home is argmax_s H(doc, s); adding shard s' only steals the
    * docs whose new hash wins — an expected 1/(n+1) of the corpus —
    * while mod hashing relocates ~n/(n+1) of everything. At 100 TB
    * that's the difference between re-writing 11 TB and re-writing
    * 89 TB on a resharding, which is why every distributed store uses
    * a consistent scheme; this query MEASURES the two fractions on the
    * real corpus rather than asserting the formula.
    *
    * All hashing is md5-hex, compared as fixed-length strings (the
    * q156 KMV trick: equal-length hex compares lexicographically ≡
    * numerically), so both engines replay the argmax bit-exactly.
    * Plan: one narrow projection computing both homes per doc (the
    * candidate array is shard-count-sized, in-row), one 2-row
    * aggregate. No shuffle at all beyond the final agg. */
  def q200ShardRebalance(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents").select(col("doc_id"))
    def cand(s: Int) = struct(
      md5(concat_ws("_", lit("shard"), lit(s), col("doc_id"))).as("h"),
      lit(s.toLong).as("s"))
    val all = (0 until ShardsNew).map(cand)
    val homes = docs.select(col("doc_id"),
      array_max(array(all.take(ShardsOld): _*)).getField("s").as("hrw_old"),
      array_max(array(all: _*)).getField("s").as("hrw_new"),
      (col("doc_id") % ShardsOld).as("mod_old"),
      (col("doc_id") % ShardsNew).as("mod_new"))
    val hrw = homes.agg(count(lit(1)).as("n_docs"),
        sum((col("hrw_old") =!= col("hrw_new")).cast("long")).as("moved"))
      .select(lit("rendezvous").as("scheme"), col("n_docs"), col("moved"),
        expr("moved * 1000000 div n_docs").as("moved_ppm"))
    val md = homes.agg(count(lit(1)).as("n_docs"),
        sum((col("mod_old") =!= col("mod_new")).cast("long")).as("moved"))
      .select(lit("mod").as("scheme"), col("n_docs"), col("moved"),
        expr("moved * 1000000 div n_docs").as("moved_ppm"))
    md.unionAll(hrw)
  }

  val q200Oracle: String =
    s"""WITH h AS (
       |  SELECT doc_id, s, md5('shard_' || s || '_' || doc_id) AS hv
       |  FROM documents, unnest(generate_series(0, ${ShardsNew - 1})) AS t(s)
       |), old_home AS (
       |  SELECT doc_id, s FROM (
       |    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY hv DESC, s DESC) AS rk
       |    FROM h WHERE s < $ShardsOld) x WHERE rk = 1
       |), new_home AS (
       |  SELECT doc_id, s FROM (
       |    SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
       |      ORDER BY hv DESC, s DESC) AS rk
       |    FROM h) x WHERE rk = 1
       |), hrw AS (
       |  SELECT count(*) AS n_docs,
       |    sum(CASE WHEN o.s <> n.s THEN 1 ELSE 0 END) AS moved
       |  FROM old_home o JOIN new_home n USING (doc_id)
       |), md AS (
       |  SELECT count(*) AS n_docs,
       |    sum(CASE WHEN doc_id % $ShardsOld <> doc_id % $ShardsNew
       |      THEN 1 ELSE 0 END) AS moved
       |  FROM documents)
       |SELECT 'mod' AS scheme, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(moved AS BIGINT) AS moved,
       |  CAST(moved * 1000000 // n_docs AS BIGINT) AS moved_ppm FROM md
       |UNION ALL
       |SELECT 'rendezvous', CAST(n_docs AS BIGINT), CAST(moved AS BIGINT),
       |  CAST(moved * 1000000 // n_docs AS BIGINT) FROM hrw""".stripMargin
}
