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
}
