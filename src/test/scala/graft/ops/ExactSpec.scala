package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact fixed-point aggregation: bit-identical results regardless of
  * partitioning — the invariant the DuckDB hash-compare relies on. */
class ExactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sumFixed is invariant under repartitioning") {
    import spark.implicits._
    val values = Seq.tabulate(5000)(i => math.round(math.sin(i) * 1000 * 100) / 100.0)
    val s1 = values.toDF("v").repartition(1)
      .agg(Exact.sumFixed(col("v"), 2)).head.getDouble(0)
    val s37 = values.toDF("v").repartition(37)
      .agg(Exact.sumFixed(col("v"), 2)).head.getDouble(0)
    assert(java.lang.Double.doubleToLongBits(s1) == java.lang.Double.doubleToLongBits(s37))
  }

  test("sumFixed equals exact integer-cents sum (100 random cases)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val cents = List.fill(rnd.nextInt(50) + 1)(rnd.between(-99999L, 99999L))
      val got = cents.map(_ / 100.0).toDF("v")
        .agg(Exact.sumFixed(col("v"), 2)).head.getDouble(0)
      assert(got == cents.sum / 100.0, s"cents=$cents")
    }
  }

  test("avgFixed ignores nulls like SQL AVG") {
    import spark.implicits._
    val df = Seq(Some(1.50), None, Some(2.50)).toDF("v")
    assert(df.agg(Exact.avgFixed(col("v"), 2)).head.getDouble(0) == 2.0)
  }
}
