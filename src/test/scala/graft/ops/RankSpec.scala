package graft.ops

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.ops.Rank.groupRank must equal the plain (single-task) window
  * rank on every data shape that stresses its bucketing: dense values,
  * heavy ties, a single-valued group, negative ranges, doubles, a
  * global (no-group) rank, and unbalanced groups. The plain window is
  * the semantic spec; the primitive exists only to change the PLAN.
  */
class RankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def referenceRank(df: DataFrame, grpCols: Seq[String],
      valueCol: String, tieCols: Seq[String]): DataFrame = {
    val w = (if (grpCols.nonEmpty) Window.partitionBy(grpCols.map(col): _*)
             else Window.partitionBy())
      .orderBy((col(valueCol).asc +: tieCols.map(col(_).asc)): _*)
    val wAll = if (grpCols.nonEmpty) Window.partitionBy(grpCols.map(col): _*)
               else Window.partitionBy()
    df.withColumn("rk", row_number().over(w).cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(wAll))
  }

  private def assertMatches(df: DataFrame, grpCols: Seq[String],
      valueCol: String, tieCols: Seq[String]): Unit = {
    val got = Rank.groupRank(df, grpCols, valueCol, tieCols, "rk", "n")
      .select((grpCols ++ Seq(valueCol) ++ tieCols ++ Seq("rk", "n")).map(col): _*)
      .collect().map(_.toString).sorted.toSeq
    val want = referenceRank(df, grpCols, valueCol, tieCols)
      .select((grpCols ++ Seq(valueCol) ++ tieCols ++ Seq("rk", "n")).map(col): _*)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == want)
  }

  test("unique long values per group, unbalanced groups") {
    // group g0: 1000 rows, g1: 3 rows, g2: 1 row
    val df = ((0 until 1000).map(i => ("g0", (i * 37 % 1000).toLong * 13 - 500, i.toLong)) ++
      Seq(("g1", 5L, 0L), ("g1", -5L, 1L), ("g1", 0L, 2L)) ++
      Seq(("g2", 42L, 0L))).toDF("g", "v", "id")
    assertMatches(df, Seq("g"), "v", Seq("id"))
  }

  test("heavy ties resolved by tiebreak column") {
    // only 4 distinct values over 800 rows — tie mass shares buckets
    val df = (0 until 800).map(i => ("g" + i % 2, (i % 4).toLong, i.toLong))
      .toDF("g", "v", "id")
    assertMatches(df, Seq("g"), "v", Seq("id"))
  }

  test("single-valued group degenerates to one bucket, still correct") {
    val df = ((0 until 100).map(i => ("flat", 7L, i.toLong)) ++
      (0 until 100).map(i => ("vary", i.toLong, i.toLong)))
      .toDF("g", "v", "id")
    assertMatches(df, Seq("g"), "v", Seq("id"))
  }

  test("double values (median/MAD deviation shape)") {
    val df = (0 until 500)
      .map(i => ("e" + i % 5, math.abs(i * 97 % 250 - 125) + 0.5, i.toLong))
      .toDF("g", "v", "id")
    assertMatches(df, Seq("g"), "v", Seq("id"))
  }

  test("global rank (no group) equals unpartitioned window") {
    val df = (0 until 1000).map(i => ((i * 613 % 1000).toLong - 77, i.toLong))
      .toDF("v", "id")
    assertMatches(df, Nil, "v", Seq("id"))
  }

  test("value-at-rank is stable under ties even without a tiebreak") {
    // ranks among equal values are arbitrary, but the VALUE at any
    // given rank index is determined by sorted order — the property
    // q69/q70 rely on
    val df = (0 until 400).map(i => ("g" + i % 3, (i % 10).toLong))
      .toDF("g", "v")
    val ranked = Rank.groupRank(df, Seq("g"), "v", Nil, "rk", "n")
      .select(col("g"), col("rk"), col("v"))
      .collect().map(_.toString).sorted.toSeq
    val want = referenceRank(df, Seq("g"), "v", Nil)
      .select(col("g"), col("rk"), col("v"))
      .collect().map(_.toString).sorted.toSeq
    assert(ranked == want)
  }

  test("valuesAtRanks selects exactly the groupRank rows at the target ranks") {
    val df = (0 until 500).map(i => ("g" + i % 4, ((i * 37) % 23).toLong,
      i.toLong)).toDF("g", "v", "id")
    // targets: per group, ranks {0, n/2, n-1} (min, middle, max)
    val got = Rank.valuesAtRanks(df, Seq("g"), "v", Seq("id"),
        sizes => sizes.select(col("g"), explode(array(lit(0L),
          (col("_n") / 2).cast("long"), col("_n") - 1L)).as("_tgt")),
        "_tgt")
      .select(col("g"), col("_tgt"), col("v"), col("id"))
      .collect().map(_.toString).sorted.toSeq
    val ranked = Rank.groupRank(df, Seq("g"), "v", Seq("id"), "rk", "n")
    val want = ranked
      .filter(col("rk") === 0L || col("rk") === (col("n") / 2).cast("long") ||
        col("rk") === col("n") - 1L)
      .select(col("g"), col("rk").as("_tgt"), col("v"), col("id"))
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == want)
    // global form: the median of 0..499 under value order is 249
    val globalMedian = Rank.valuesAtRanks(
        (0 until 500).map(i => (i.toLong, i.toLong)).toDF("v", "id"),
        Seq.empty, "v", Seq("id"),
        sizes => sizes.select(((col("_n") - 1) / 2).cast("long").as("_tgt")),
        "_tgt")
      .select(col("v")).collect().map(_.getLong(0)).toSeq
    assert(globalMedian == Seq(249L))
  }

  test("plan contains no unpartitioned window and no group-only window") {
    val df = (0 until 100).map(i => ("g" + i % 3, i.toLong, i.toLong))
      .toDF("g", "v", "id")
    val plan = Rank.groupRank(df, Seq("g"), "v", Seq("id"), "rk", "n")
      .queryExecution.executedPlan.toString
    // every window over row data must be partitioned by (g, _bkt) —
    // a window partitioned by g alone would be the single-task sort
    // this primitive replaces (the counts-table windows are also
    // g-partitioned but run over ≤ Buckets rows per group; they are
    // distinguishable here because groupRank's row-data windows list
    // _bkt in their partition spec)
    val specs = "windowspecdefinition\\(([^,]*, [^,]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty)
    assert(specs.exists(_.contains("_bkt")),
      s"expected a (group, _bkt)-partitioned local rank window, got: $specs")
  }

  test("groupPrefixSum equals the plain per-group cumulative window") {
    import spark.implicits._
    // heavy value ties within small groups + a weight column
    val df = ((0 until 1200).map(i =>
      (s"g${i % 3}", (i * 7 % 11).toLong, i.toLong, (i % 5 + 1).toLong)) ++
      Seq(("solo", 1L, 9999L, 42L))).toDF("g", "v", "id", "w")
    val got = Rank.groupPrefixSum(df, Seq("g"), "v", Seq("id"), "w", "cw")
      .select("g", "v", "id", "cw").collect().map(_.toString).sorted.toSeq
    val w = Window.partitionBy(col("g")).orderBy(col("v").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = df.withColumn("cw", sum(col("w")).over(w))
      .select("g", "v", "id", "cw").collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty && got == want)
  }

  test("q117 weighted median matches a driver-side sorted scan") {
    import spark.implicits._
    val got = Extended.q117WeightedMedian(spark, graft.TestSpark.sfDir)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.nonEmpty)
    val li = graft.Tables.load(spark, graft.TestSpark.sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast("long"),
        expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)"),
        col("l_orderkey"), col("l_linenumber").cast("long"))
      .as[(String, String, Long, Long, Long, Long)].collect()
    li.groupBy(r => (r._1, r._2)).foreach { case (k, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._5, r._6))
      val total = ordered.map(_._4).sum
      val target = (total + 1) / 2
      var acc = 0L
      val cross = ordered.find { r => acc += r._4; acc >= target }.get
      val (_, _, mq, cc, tc) = got(k)
      assert(tc == total && mq == cross._3)
      assert(cc == ordered.takeWhile(_ != cross).map(_._4).sum + cross._4)
      // the median splits revenue: mass strictly below is < half
      assert(cc - cross._4 < target && cc >= target)
    }
  }
}
