package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => TF}

/** KMV (k-minimum-values) distinct sketches — the third sketch family
  * next to HLL (q30/q49/q101) and CMS (q80): keep the k numerically
  * smallest hash values per group; the k-th smallest estimates the
  * distinct count ((k−1)/θ with θ = kth/2^60), and — unlike HLL —
  * the register SET supports direct intersection/Jaccard estimates
  * (Beyer et al., SIGMOD'07), which is how a corpus pipeline prices
  * cross-source overlap without a corpus-scale join.
  *
  * Everything here is exactly deterministic: the hash is the md5
  * content digest's first 15 nibbles read as a 60-bit integer (hex
  * strings sort identically to their numeric values, so "k smallest"
  * needs no numeric conversion until the estimate), the estimator is
  * one integer division, and the register state itself is emitted as
  * an md5 checksum — the same bit-exact-state discipline as q49's HLL
  * registers. No sampling, no RNG, no floats.
  *
  * Scale shape: one distinct-digest shuffle builds the sketch input;
  * [[Rank.groupRank]] takes the k smallest per source without a
  * per-source single-task sort; every later stage (set ops included)
  * runs on sketch-sized frames — ≤ k·|sources| rows by construction —
  * which is the entire point of a sketch at 100 TB: the union/
  * intersection algebra never touches the corpus again.
  */
object Kmv {

  /** Register width. 32 keeps the relative error ~1/√(k−2) ≈ 18 % —
    * coarse, but the demo corpus has few distinct digests per source;
    * production would run k = 1024 with the identical plan. */
  val K = 32

  private val Pow60 = "1152921504606846976" // 2^60, the hash-space size

  private val NormMd5Prefix15 = // shared digest fragment (q17 contract)
    "substring(md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))), 1, 15)"

  /** Sketch rows: per source, the K smallest distinct 60-bit content
    * hashes, ranked. The distinct() collapses exact-dup documents
    * before ranking — KMV estimates distinct CONTENTS, so duplicate
    * digests must count once. */
  private[ops] def sketchRows(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("source"),
        substring(md5(TF.normText(col("text"))), 1, 15).as("h15"))
      .distinct()
      .withColumn("hv", conv(col("h15"), 16, 10).cast("long"))
    Rank.groupRank(d, Seq("source"), "hv", Nil, "rk", "n")
      .filter(col("rk") < K)
  }

  /** q156: per-source KMV sketch build + distinct-content estimate.
    * `n_kept` < K means the source has fewer distinct digests than
    * registers — the sketch is the exact digest set and the estimate
    * is the exact count; otherwise est = (K−1)·2^60 div kth_hv
    * (integer-exact, products in Decimal(38,0)/HUGEINT since
    * 31·2^60 > int64). `register_md5` bit-checks the full register
    * state, so a hash-function or rank regression cannot hide inside
    * an estimate that happens to round the same. */
  def q156KmvSketch(spark: SparkSession, dir: String): DataFrame =
    sketchRows(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_kept"),
        max(col("hv")).as("kth_hv"),
        max(col("n")).as("n_distinct"),
        md5(concat_ws(",", sort_array(collect_list(col("h15")))))
          .as("register_md5"))
      .select(col("source"), col("n_kept"), col("kth_hv"),
        expr(
          s"""CAST(CASE WHEN n_distinct <= $K THEN n_distinct
             |  ELSE (CAST(${K - 1} AS DECIMAL(38,0)) * $Pow60) div kth_hv
             |END AS BIGINT)""".stripMargin).as("est_distinct"),
        col("register_md5"))

  val q156Oracle: String =
    s"""WITH d AS (
       |  SELECT DISTINCT source, $NormMd5Prefix15 AS h15 FROM documents
       |), r AS (
       |  SELECT source, h15, CAST('0x' || h15 AS BIGINT) AS hv,
       |    row_number() OVER (PARTITION BY source ORDER BY h15 ASC) AS rk,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM d
       |), k AS (SELECT * FROM r WHERE rk <= $K)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       |  CAST(max(hv) AS BIGINT) AS kth_hv,
       |  CAST(CASE WHEN max(n) <= $K THEN max(n)
       |    ELSE (${K - 1} * CAST($Pow60 AS HUGEINT)) // max(hv)
       |  END AS BIGINT) AS est_distinct,
       |  md5(string_agg(h15, ',' ORDER BY h15 ASC)) AS register_md5
       |FROM k GROUP BY source""".stripMargin

  /** q157: pairwise source-overlap estimates from the q156 sketches —
    * KMV's defining capability (HLL unions but cannot intersect).
    * For every source pair, merge the two sketches (KMV is mergeable:
    * the K smallest of A∪B all sit inside sketch(A) ∪ sketch(B)),
    * count how many of the merged top-K hashes live in BOTH input
    * sketches (ρ = matched/k estimates the Jaccard), and price the
    * intersection as ρ · est_union. k_used < K ⇒ both sketches were
    * complete digest sets and every figure is exact.
    *
    * Plan: the sketch frame (≤ K·|sources| rows) expands by the
    * broadcast source list (|sources| rows — a broadcast nested loop
    * over a provably tiny side, not a corpus cross), so the pair frame
    * is ≤ 2K·C(|sources|,2) rows; the per-pair rank window partitions
    * on (src_a, src_b) with ≤ 2K rows per partition BY CONSTRUCTION —
    * bounded by sketch size, independent of corpus scale. */
  def q157KmvSetops(spark: SparkSession, dir: String): DataFrame = {
    val s = sketchRows(spark, dir).select(col("source"), col("h15"), col("hv"))
    val srcs = Tables.load(spark, dir, "documents")
      .select(col("source").as("other")).distinct()
    val pairRows = s.crossJoin(broadcast(srcs))
      .filter(col("source") =!= col("other"))
      .select(least(col("source"), col("other")).as("src_a"),
        greatest(col("source"), col("other")).as("src_b"),
        col("source").as("member"), col("h15"), col("hv"))
    val merged = pairRows
      .groupBy(col("src_a"), col("src_b"), col("h15"))
      .agg(max(col("hv")).as("hv"), countDistinct(col("member")).as("nm"))
    val byPair = Window.partitionBy(col("src_a"), col("src_b"))
    val top = merged
      .withColumn("rk", row_number().over(byPair.orderBy(col("hv").asc)))
      .filter(col("rk") <= K)
    top.groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("k_used"),
        max(col("hv")).as("kth_hv"),
        sum(when(col("nm") === 2, 1L).otherwise(0L)).as("matched"))
      .withColumn("est_union", expr(
        s"""CAST(CASE WHEN k_used < $K THEN k_used
           |  ELSE (CAST(${K - 1} AS DECIMAL(38,0)) * $Pow60) div kth_hv
           |END AS BIGINT)""".stripMargin))
      .select(col("src_a"), col("src_b"), col("k_used"), col("matched"),
        col("est_union"),
        expr("(matched * 1000000) div k_used").as("jaccard_ppm"),
        expr("CAST((CAST(matched AS DECIMAL(38,0)) * est_union) div k_used AS BIGINT)")
          .as("est_intersection"))
  }

  val q157Oracle: String =
    s"""WITH d AS (
       |  SELECT DISTINCT source, $NormMd5Prefix15 AS h15 FROM documents
       |), r AS (
       |  SELECT source, h15, CAST('0x' || h15 AS BIGINT) AS hv,
       |    row_number() OVER (PARTITION BY source ORDER BY h15 ASC) AS rk
       |  FROM d
       |), s AS (SELECT source, h15, hv FROM r WHERE rk <= $K),
       |src AS (SELECT DISTINCT source FROM documents),
       |pr AS (
       |  SELECT least(s.source, o.source) AS src_a,
       |    greatest(s.source, o.source) AS src_b,
       |    s.source AS member, h15, hv
       |  FROM s CROSS JOIN src o WHERE s.source <> o.source
       |), u AS (
       |  SELECT src_a, src_b, h15, max(hv) AS hv,
       |    count(DISTINCT member) AS nm
       |  FROM pr GROUP BY 1, 2, 3
       |), rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY src_a, src_b
       |    ORDER BY hv ASC) AS rk
       |  FROM u
       |), top AS (SELECT * FROM rk WHERE rk <= $K),
       |agg AS (
       |  SELECT src_a, src_b, count(*) AS k_used, max(hv) AS kth_hv,
       |    sum(CASE WHEN nm = 2 THEN 1 ELSE 0 END) AS matched
       |  FROM top GROUP BY 1, 2
       |)
       |SELECT src_a, src_b, CAST(k_used AS BIGINT) AS k_used,
       |  CAST(matched AS BIGINT) AS matched,
       |  CAST(CASE WHEN k_used < $K THEN k_used
       |    ELSE (${K - 1} * CAST($Pow60 AS HUGEINT)) // kth_hv
       |  END AS BIGINT) AS est_union,
       |  CAST((matched * 1000000) // k_used AS BIGINT) AS jaccard_ppm,
       |  CAST((CAST(matched AS HUGEINT) *
       |    (CASE WHEN k_used < $K THEN k_used
       |      ELSE (${K - 1} * CAST($Pow60 AS HUGEINT)) // kth_hv END))
       |    // k_used AS BIGINT) AS est_intersection
       |FROM agg""".stripMargin

  /** q206's audited columns: (name, Spark string expr, DuckDB string
    * expr) — value stringification pinned to forms both engines render
    * identically (keys as integers, money/quantity as integer cents,
    * timestamps as epoch seconds; raw double/timestamp casts would
    * drift on formatting). */
  private val NdvCols: Seq[(String, String, String)] = Seq(
    ("l_orderkey", "CAST(l_orderkey AS STRING)", "CAST(l_orderkey AS VARCHAR)"),
    ("l_partkey", "CAST(l_partkey AS STRING)", "CAST(l_partkey AS VARCHAR)"),
    ("l_suppkey", "CAST(l_suppkey AS STRING)", "CAST(l_suppkey AS VARCHAR)"),
    ("l_quantity",
      "CAST(CAST(round(l_quantity * 100.0) AS BIGINT) AS STRING)",
      "CAST(CAST(round(l_quantity * 100.0) AS BIGINT) AS VARCHAR)"),
    ("l_extendedprice",
      "CAST(CAST(round(l_extendedprice * 100.0) AS BIGINT) AS STRING)",
      "CAST(CAST(round(l_extendedprice * 100.0) AS BIGINT) AS VARCHAR)"),
    ("l_returnflag", "l_returnflag", "l_returnflag"),
    ("l_shipdate", "CAST(unix_timestamp(l_shipdate) AS STRING)",
      "CAST(CAST(floor(epoch(l_shipdate)) AS BIGINT) AS VARCHAR)"))

  /** q206: one-pass per-column NDV statistics — the `ANALYZE TABLE …
    * FOR COLUMNS` workload, with the estimator's honesty on display.
    * The table melts once into (col_name, value-as-string) — a narrow
    * explode, one row per cell for the audited columns — then ONE
    * distinct shuffle and one [[Rank.groupRank]] pass build a KMV
    * sketch per column, and because groupRank also returns the group
    * size, the EXACT distinct count falls out of the same pass for
    * free. Output per column: exact NDV, sketch estimate, and the
    * relative error in ppm — the number a cost-based optimizer
    * (cf. q201) would actually consume, next to the truth.
    *
    * At 100 TB the exact-NDV side is the expensive half (a distinct
    * per column); the sketch mechanics shown here are what production
    * stats collection keeps — and the identical plan serves both,
    * which is the point of auditing estimator error per column before
    * trusting it. */
  def q206ColumnNdv(spark: SparkSession, dir: String): DataFrame = {
    // One column-pruned scan + TYPED distinct per column, unioned,
    // with stringification AFTER the distinct: the former melt plan
    // stringified every cell and shuffled 7×|rows| 15-char strings
    // through one distinct; this plan shuffles each column's native
    // longs with map-side partial dedup (a few percent of the rows for
    // the low-NDV columns) and runs the one cast + md5 only on the
    // |distinct| survivors. Same values, same hashes, same oracle.
    // Local wall time is parity (~5.4 s A/B at sf0.1 — the small-scale
    // cost is elsewhere); the win is shuffle BYTES (longs vs strings,
    // deduped early), which is what matters at cluster scale.
    val li = Tables.load(spark, dir, "lineitem")
    // pre-stringification typed form of each NdvCols expr: the distinct
    // dedupes native longs, then ONE cast per surviving value rebuilds
    // exactly the string the melt plan hashed
    val typed = Map(
      "l_orderkey" -> "l_orderkey", "l_partkey" -> "l_partkey",
      "l_suppkey" -> "l_suppkey",
      "l_quantity" -> "CAST(round(l_quantity * 100.0) AS BIGINT)",
      "l_extendedprice" -> "CAST(round(l_extendedprice * 100.0) AS BIGINT)",
      "l_returnflag" -> "l_returnflag",
      "l_shipdate" -> "unix_timestamp(l_shipdate)")
    val melted = NdvCols.map { case (n, _, _) =>
      li.select(expr(typed(n)).as("tv")).distinct()
        .select(lit(n).as("col_name"), col("tv").cast("string").as("v"))
    }.reduce(_ unionAll _)
      .withColumn("h15", substring(md5(col("v")), 1, 15))
      .withColumn("hv", conv(col("h15"), 16, 10).cast("long"))
      // Persisted: groupRank's two-phase plan references its input
      // three times (the min/max stats broadcast, the bucket-count
      // offsets broadcast, and the final ranked pass), and here that
      // input is the 7-branch scan+distinct union — measured as three
      // ~0.8-1.5 s 224-task stages in q206's JobProfile at sf0.1
      // (r12): the whole union executed once per reference. The cache
      // is |distinct values| rows across the audited columns — the
      // same volume the distinct shuffle already carries (guide §5).
      .persist()
    val kept = Rank.groupRank(melted, Seq("col_name"), "hv", Seq("h15"),
      "rk", "n").filter(col("rk") < K)
    kept.groupBy(col("col_name"))
      .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("kth_hv"),
        max(col("n")).as("exact_ndv"))
      .select(col("col_name"), col("exact_ndv"), col("n_kept"),
        expr(
          s"""CAST(CASE WHEN exact_ndv <= $K THEN exact_ndv
             |  ELSE (CAST(${K - 1} AS DECIMAL(38,0)) * $Pow60) div kth_hv
             |END AS BIGINT)""".stripMargin).as("est_ndv"))
      .withColumn("err_ppm",
        expr("abs(est_ndv - exact_ndv) * 1000000 div exact_ndv"))
  }

  val q206Oracle: String = {
    val arms = NdvCols.map { case (n, _, duckExpr) =>
      s"SELECT '$n' AS col_name, $duckExpr AS v FROM lineitem"
    }.mkString("\n      |  UNION ALL\n      |  ")
    s"""WITH melted AS (
       |  SELECT DISTINCT col_name, v FROM (
       |  $arms)
       |), r AS (
       |  SELECT col_name, substring(md5(v), 1, 15) AS h15,
       |    CAST('0x' || substring(md5(v), 1, 15) AS BIGINT) AS hv,
       |    count(*) OVER (PARTITION BY col_name) AS n
       |  FROM melted
       |), k AS (
       |  SELECT * FROM (
       |    SELECT col_name, hv, n,
       |      row_number() OVER (PARTITION BY col_name
       |        ORDER BY hv ASC, h15 ASC) AS rk
       |    FROM r) x WHERE rk <= $K
       |), agg AS (
       |  SELECT col_name, count(*) AS n_kept, max(hv) AS kth_hv,
       |    max(n) AS exact_ndv
       |  FROM k GROUP BY 1)
       |SELECT col_name, CAST(exact_ndv AS BIGINT) AS exact_ndv,
       |  CAST(n_kept AS BIGINT) AS n_kept,
       |  CAST(CASE WHEN exact_ndv <= $K THEN exact_ndv
       |    ELSE (${K - 1} * CAST($Pow60 AS HUGEINT)) // kth_hv
       |  END AS BIGINT) AS est_ndv,
       |  CAST(abs((CASE WHEN exact_ndv <= $K THEN exact_ndv
       |    ELSE (${K - 1} * CAST($Pow60 AS HUGEINT)) // kth_hv END)
       |    - exact_ndv) * 1000000 // exact_ndv AS BIGINT) AS err_ppm
       |FROM agg""".stripMargin
  }
}
