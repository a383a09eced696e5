package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch invariants (q156/q157): mergeability, estimator
  * exactness below k, and the small-error guarantee the k-th order
  * statistic carries on the real corpus. */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val sketch = Kmv.q156KmvSketch(spark, TestSpark.sfDir)
  private lazy val docs = Tables.load(spark, TestSpark.sfDir, "documents")

  test("a source with fewer distinct digests than K estimates exactly") {
    import spark.implicits._
    val exact = docs
      .select(col("source"),
        md5(graft.functions.TextFunctions.normText(col("text"))).as("h"))
      .groupBy("source").agg(countDistinct(col("h")).as("nd"))
    val joined = sketch.join(exact, "source")
      .select($"source", $"n_kept", $"est_distinct", $"nd")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (kept, est, nd) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      if (nd <= Kmv.K) {
        assert(kept == nd && est == nd,
          s"${r.getString(0)}: below-K source must be exact ($kept/$est/$nd)")
      } else {
        assert(kept == Kmv.K)
        // (k-1)/θ with k=32 has ~18% relative stddev; 3σ bound
        assert(math.abs(est - nd) <= math.max(8, (0.55 * nd).toLong),
          s"${r.getString(0)}: est=$est vs exact=$nd out of tolerance")
      }
    }
  }

  test("pair union sketch equals the sketch of the pooled digests (mergeability)") {
    import spark.implicits._
    // pick the lexicographically first two sources
    val srcs = docs.select("source").distinct()
      .orderBy("source").as[String].take(2)
    val Seq(a, b) = srcs.toSeq
    // q157's merged top-K hash set for the pair
    val pooled = docs.filter(col("source").isin(a, b))
      .select(substring(md5(
        graft.functions.TextFunctions.normText(col("text"))), 1, 15).as("h15"))
      .distinct()
      .orderBy("h15").limit(Kmv.K)
      .as[String].collect().toSet
    val fromSketches = Kmv.q157KmvSetops(spark, TestSpark.sfDir)
      .filter(col("src_a") === least(lit(a), lit(b)) &&
        col("src_b") === greatest(lit(a), lit(b)))
      .select($"k_used").as[Long].head()
    assert(fromSketches == pooled.size,
      s"merged sketch size $fromSketches != pooled top-K ${pooled.size}")
  }

  test("jaccard_ppm and est_intersection are consistent integer algebra") {
    import spark.implicits._
    Kmv.q157KmvSetops(spark, TestSpark.sfDir)
      .select($"k_used", $"matched", $"est_union", $"jaccard_ppm",
        $"est_intersection")
      .collect().foreach { r =>
        val (k, m, u, j, i) = (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))
        assert(j == m * 1000000L / k)
        assert(i == (BigInt(m) * u / k).toLong)
        assert(m <= k && i <= u)
      }
  }

  test("q206: exact NDV matches countDistinct per column; tiny columns are exact") {
    import org.apache.spark.sql.functions._
    val rows = Kmv.q206ColumnNdv(spark, graft.TestSpark.sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == 7)
    val li = graft.Tables.load(spark, graft.TestSpark.sfDir, "lineitem")
    val expect = Map(
      "l_orderkey" -> li.select(countDistinct(col("l_orderkey"))),
      "l_returnflag" -> li.select(countDistinct(col("l_returnflag"))),
      "l_quantity" -> li.select(
        countDistinct(expr("CAST(round(l_quantity * 100.0) AS BIGINT)"))))
    for ((c, df) <- expect) {
      val truth = df.head().getLong(0)
      val (exact, kept, est, err) = rows(c)
      assert(exact == truth, s"$c exact NDV $exact != $truth")
      if (truth <= Kmv.K) {
        assert(est == truth && err == 0L, s"$c small-NDV case must be exact")
        assert(kept == truth)
      } else assert(kept == Kmv.K)
    }
  }
}
