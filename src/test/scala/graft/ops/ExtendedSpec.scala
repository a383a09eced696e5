package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtendedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("manual interpolated percentiles agree with Spark's built-in percentile") {
    val manual = Extended.q69PercentileCont(spark, TestSpark.sfDir)
      .as[(String, Double, Double)].collect()
      .map { case (s, p, v) => (s, p) -> v }.toMap
    val builtin = graft.Tables.load(spark, TestSpark.sfDir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(percentile(col("o_totalprice"),
        array(Extended.PercentilePs.map(lit): _*)).as("ps"))
      .as[(String, Seq[Double])].collect()
    assert(manual.nonEmpty)
    for ((s, vs) <- builtin; (p, v) <- Extended.PercentilePs.zip(vs))
      assert(math.abs(manual((s, p)) - v) < 1e-6,
        s"status $s p=$p manual=${manual((s, p))} builtin=$v")
  }

  test("LevenshteinWithin is exact at and below the threshold, -1 above it") {
    val rows = Seq(
      ("kitten", "sitting", 3), // true distance 3 == threshold → exact
      ("kitten", "sitting", 2), // 3 > 2 → -1
      ("kitten", "sitting", 10),
      ("abc", "abc", 0),
      ("", "abc", 3),
      ("", "abc", 2),
      ("Supplier#000000001", "Customer#000000001", 5))
      .toDF("a", "b", "k")
      .select(col("a"), col("b"), col("k"),
        graft.functions.LevenshteinWithin(col("a"), col("b"), col("k")).as("d"),
        levenshtein(col("a"), col("b")).as("full"))
      .as[(String, String, Int, Int, Int)].collect()
    assert(rows.length == 7)
    for ((a, b, k, d, full) <- rows) {
      if (full <= k) assert(d == full, s"($a,$b,$k): banded $d != full $full")
      else assert(d == -1, s"($a,$b,$k): expected -1, got $d (full $full)")
    }
  }

  test("q63 anchor-pruned fuzzy match equals the exhaustive per-block argmin") {
    import org.apache.spark.sql.expressions.Window
    val sup = graft.Tables.load(spark, TestSpark.sfDir, "supplier")
    val cust = graft.Tables.load(spark, TestSpark.sfDir, "customer")
    val w = Window.partitionBy(col("s_suppkey"))
      .orderBy(col("edit_distance").asc, col("c_custkey").asc)
    val exhaustive = sup.join(cust, col("s_nationkey") === col("c_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("c_custkey"),
        levenshtein(col("s_name"), col("c_name")).cast("long").as("edit_distance"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("s_suppkey"), col("s_name"),
        col("c_custkey").as("best_match"), col("edit_distance"))
      .as[(Long, String, Long, Long)].collect().sorted
    val pruned = Extended.q63FuzzyMatch(spark, TestSpark.sfDir)
      .as[(Long, String, Long, Long)].collect().sorted
    assert(pruned.nonEmpty && (pruned sameElements exhaustive))
    // the prune is load-bearing: count survivors entering the ranking
    // window vs the full block pair count
    val allPairs = sup.join(cust, col("s_nationkey") === col("c_nationkey")).count()
    val anchors = cust.groupBy(col("c_nationkey").as("a_nationkey"))
      .agg(min(struct(col("c_custkey"), col("c_name"))).as("a"))
      .select(col("a_nationkey"), col("a.c_name").as("anchor_name"))
    val survivors = sup.join(broadcast(anchors), col("s_nationkey") === col("a_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        levenshtein(col("s_name"), col("anchor_name")).as("ub"))
      .join(cust, col("s_nationkey") === col("c_nationkey"))
      .filter(graft.functions.LevenshteinWithin(
        col("s_name"), col("c_name"), col("ub")) >= 0)
      .count()
    info(s"q63 prune: $survivors of $allPairs block pairs reach the ranking window")
    assert(survivors * 3 <= allPairs * 2,
      s"expected the banded prune to drop at least a third of the pairs: $survivors / $allPairs")
  }

  test("mixture sampling emits floor(r) epochs for every doc plus a hash-selected fraction") {
    val out = Curation.q68MixtureSample(spark, TestSpark.sfDir)
      .groupBy("source").agg(countDistinct("doc_id").as("docs"),
        count(lit(1)).as("rows"), max("epoch").as("max_epoch"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // r = 2.0 sources: every doc exactly twice
    assert(out("src0")._3 == 2 * out("src0")._2 && out("src0")._4 == 1L)
    // r = 1.0 sources: every doc exactly once
    assert(out("src5")._3 == out("src5")._2 && out("src5")._4 == 0L)
    // r = 0.25 sources: a strict subset selected, epoch 0 only
    val total19 = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .filter(col("source") === "src19").count()
    assert(out("src19")._2 < total19 && out("src19")._4 == 0L)
  }

  test("q97 LOCF fills every gap with the latest preceding observed sum") {
    val rows = Extended.q97GapFillLocf(spark, TestSpark.sfDir)
      .as[(String, java.sql.Timestamp, Long, Option[Double], Boolean)]
      .collect()
      .groupBy(_._1).map { case (t, rs) => t -> rs.sortBy(_._2.getTime) }
    assert(rows.nonEmpty)
    rows.values.foreach { series =>
      var lastSeen: Option[Double] = None
      series.foreach { case (_, _, n, filled, isGap) =>
        assert(isGap == (n == 0L))
        if (!isGap) { assert(filled.isDefined); lastSeen = filled }
        else assert(filled == lastSeen) // None before first observation
      }
    }
    // q65 and q97 agree on the grid shape and observed buckets
    val zeroFill = Extended.q65Resample(spark, TestSpark.sfDir)
      .as[(String, java.sql.Timestamp, Long, Double)].collect()
    assert(zeroFill.length == rows.values.map(_.length).sum)
  }

  test("q96 regression slopes match a driver-side exact least squares") {
    val got = graft.ops.Audit.q96GroupRegression(spark, TestSpark.sfDir)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val ev = graft.Tables.load(spark, TestSpark.sfDir, "events")
      .select(col("event_type"), hour(col("ts")).cast("long"),
        expr("CAST(round(value * 100.0) AS BIGINT)"))
      .as[(String, Long, Long)].collect()
    ev.groupBy(_._1).foreach { case (t, rs) =>
      val n = BigInt(rs.length)
      val sx = BigInt(rs.map(_._2).sum); val sy = BigInt(rs.map(_._3).sum)
      val sxx = BigInt(rs.map(r => r._2 * r._2).sum)
      val sxy = BigInt(rs.map(r => r._2 * r._3).sum)
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val (_, gn, gs, gi) = got(t)
      assert(gn == rs.length.toLong)
      assert(gs == slope, s"$t slope $gs vs $slope")
      assert(gi == (sy.toDouble - slope * sx.toDouble) / n.toDouble)
    }
  }
}
