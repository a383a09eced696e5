package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent exact aggregation over fixed-point decimal columns.
  *
  * Naive `sum(double)` is non-associative: parallel/partial aggregation
  * makes the last ulps depend on partition order, so a hash-compare
  * against another engine (the DuckDB oracle) diverges nondeterministically
  * — and `round()` only hides it until a value lands on a rounding
  * boundary. The test data's numeric columns are fixed-point (2-decimal
  * money, 2-decimal rates), so we scale to integer units, sum as exact
  * longs (associative — any partitioning/shuffle order yields the same
  * bits), and perform a single deterministic double division at the end.
  * The oracle SQL mirrors the same arithmetic, so results are bit-identical
  * with NO tolerance needed. This also survives 1000-executor scale, where
  * partial-aggregation ordering is maximally nondeterministic.
  */
object Exact {
  private def factor(dec: Int): Double = math.pow(10.0, dec.toDouble)

  /** Exact scaled integer units of a fixed-point column (`dec` decimals). */
  def units(c: Column, dec: Int): Column = round(c * factor(dec)).cast("long")

  /** Accumulate units as DecimalType(38,0): a `sum(long)` wraps silently
    * in non-ANSI mode once a hot group's scaled units pass 2⁶³ (~1e18 —
    * reachable at 100 TB); 128-bit decimal accumulation cannot. DuckDB's
    * integer `sum` already returns HUGEINT, so this also mirrors the
    * oracle's arithmetic more closely. The final double division is
    * unchanged bit-wise for any sum that fits a long. */
  private def unitsSum(c: Column, dec: Int): Column =
    sum(units(c, dec).cast(org.apache.spark.sql.types.DecimalType(38, 0)))

  /** Exact sum of a fixed-point column, returned as double. */
  def sumFixed(c: Column, dec: Int): Column = unitsSum(c, dec) / factor(dec)

  /** Exact mean of a fixed-point column, returned as double.
    * `count(c)` (non-null) matches SQL AVG null semantics. */
  def avgFixed(c: Column, dec: Int): Column =
    unitsSum(c, dec) / (count(c) * factor(dec))

  /** DuckDB-side fragments mirroring the same arithmetic. */
  def sumFixedSql(expr: String, dec: Int): String = {
    val f = factor(dec)
    s"sum(CAST(round(($expr) * $f) AS BIGINT)) / $f"
  }
  def avgFixedSql(expr: String, dec: Int): String = {
    val f = factor(dec)
    s"sum(CAST(round(($expr) * $f) AS BIGINT)) / (count($expr) * $f)"
  }
}
