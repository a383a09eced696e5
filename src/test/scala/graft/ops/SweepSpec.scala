package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sweep primitives must equal the plain single-task global window
  * on every bucketing-hostile shape, and the two registered sweep
  * queries must equal brute-force reference semantics on real data:
  * q105 against the global-window concurrency profile, q106 against
  * all-pairs domination. The windows/cross-joins here are the semantic
  * spec only — the primitives exist to change the PLAN.
  */
class SweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def refPrefixSum(df: DataFrame, valueCol: String,
      tieCols: Seq[String], deltaCol: String): DataFrame = {
    val w = Window.partitionBy()
      .orderBy((col(valueCol).asc +: tieCols.map(col(_).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("out", sum(col(deltaCol)).over(w))
  }

  private def refRunningMax(df: DataFrame, valueCol: String,
      tieCols: Seq[String], aggCol: String): DataFrame = {
    val w = Window.partitionBy()
      .orderBy((col(valueCol).asc +: tieCols.map(col(_).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("out", max(col(aggCol)).over(w))
  }

  private def rows(df: DataFrame, cols: Seq[String]): Seq[String] =
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq

  test("globalPrefixSum equals the global window on mixed-sign deltas") {
    // values collide inside buckets (mod 97) and deltas go negative —
    // the concurrency shape
    val df = (0 until 2000)
      .map(i => ((i * 31 % 97).toLong, i.toLong, if (i % 3 == 0) -1L else 1L))
      .toDF("v", "id", "d")
    val got = Rank.globalPrefixSum(df, "v", Seq("id"), "d", "out")
    val want = refPrefixSum(df, "v", Seq("id"), "d")
    assert(rows(got, Seq("v", "id", "d", "out")) ==
      rows(want, Seq("v", "id", "d", "out")))
  }

  test("globalPrefixSum single-valued input degenerates to one bucket") {
    val df = (0 until 50).map(i => (7L, i.toLong, 1L)).toDF("v", "id", "d")
    val got = Rank.globalPrefixSum(df, "v", Seq("id"), "d", "out")
    assert(rows(got, Seq("id", "out")) ==
      rows(refPrefixSum(df, "v", Seq("id"), "d"), Seq("id", "out")))
  }

  test("globalRunningMax equals the exclusive global window, null head") {
    val df = (0 until 1500)
      .map(i => (((i * 17) % 211).toDouble - 100.0, i.toLong,
        ((i * 7919) % 500).toLong - 250L))
      .toDF("v", "id", "m")
    val got = Rank.globalRunningMax(df, "v", Seq("id"), "m", "out")
    val want = refRunningMax(df, "v", Seq("id"), "m")
    assert(rows(got, Seq("v", "id", "m", "out")) ==
      rows(want, Seq("v", "id", "m", "out")))
    // the global minimum-order row must have a null running max
    assert(got.filter(col("out").isNull).count() >= 1)
  }

  test("q105 concurrency equals the single-window sweep on sf0.001") {
    val sess = Sessions
      .sessionizeBatch(graft.Tables.load(spark, sf, "events"), 30 * 60 * 1000L)
    val starts = sess.select(col("session_start").as("bts"), lit(1L).as("delta"),
      lit(0).as("d_ord"), col("user_id"), col("session_no"))
    val ends = sess.select(col("session_end").as("bts"), lit(-1L).as("delta"),
      lit(1).as("d_ord"), col("user_id"), col("session_no"))
    val w = Window.partitionBy()
      .orderBy(unix_millis(col("bts")).asc, col("d_ord").asc,
        col("user_id").asc, col("session_no").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = starts.unionByName(ends)
      .withColumn("conc", sum(col("delta")).over(w))
      .groupBy(date_trunc("hour", col("bts")).as("hour_ts"))
      .agg(max(col("conc")).as("max_concurrent"),
        count(lit(1)).as("n_boundaries"))
    val got = Sweep.q105Concurrency(spark, sf)
    val cols = Seq("hour_ts", "max_concurrent", "n_boundaries")
    assert(rows(got, cols).nonEmpty && rows(got, cols) == rows(want, cols))
    // sanity: concurrency exceeds 1 somewhere (the sweep is not a no-op)
    assert(got.agg(max(col("max_concurrent"))).head.getLong(0) >= 2L)
  }

  test("q106 frontier equals brute-force all-pairs domination on sf0.001") {
    val o = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    val a = o.select(col("o_orderkey").as("k"), col("o_totalprice").as("p"),
      col("o_orderdate").as("d"))
    val dominated = o.join(a,
        col("p") >= col("o_totalprice") && col("d") >= col("o_orderdate") &&
          (col("p") > col("o_totalprice") || col("d") > col("o_orderdate")),
        "left_semi")
    val want = o.exceptAll(dominated)
    val got = Sweep.q106ParetoFrontier(spark, sf)
    val cols = Seq("o_orderkey", "o_totalprice", "o_orderdate")
    assert(rows(got, cols).nonEmpty && rows(got, cols) == rows(want, cols))
    // every frontier row is mutually non-dominated with every other
    val f = got.select(col("o_totalprice").as("fp"), col("o_orderdate").as("fd"))
    val bad = got.join(f,
      col("fp") >= col("o_totalprice") && col("fd") >= col("o_orderdate") &&
        (col("fp") > col("o_totalprice") || col("fd") > col("o_orderdate")),
      "left_semi")
    assert(bad.count() == 0L)
  }
}
