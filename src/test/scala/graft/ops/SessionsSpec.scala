package graft.ops

import java.sql.Timestamp

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("funnel fold matches greedy earliest-first stage progression") {
    // user 1: full funnel, with a decoy click BEFORE the first view
    // (must not count) and a purchase before the click (must not count)
    // user 2: view then purchase but never a click -> stalls at stage 1
    // user 3: click/purchase only -> stage 0
    val rows = Seq(
      (1L, 1L, ts(0), "click"), (2L, 1L, ts(1), "purchase"),
      (3L, 1L, ts(2), "view"), (4L, 1L, ts(3), "click"), (5L, 1L, ts(4), "purchase"),
      (6L, 2L, ts(0), "view"), (7L, 2L, ts(1), "purchase"),
      (8L, 3L, ts(0), "click"), (9L, 3L, ts(1), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Sessions.q61Funnel(spark, dir)
      .as[(Long, Long, Option[Timestamp], Option[Timestamp], Option[Timestamp])]
      .collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq ==
      Seq((1L, 3L), (2L, 1L), (3L, 0L)))
    assert(out(0)._3.contains(ts(2)) && out(0)._4.contains(ts(3)) && out(0)._5.contains(ts(4)))
    assert(out(1)._3.contains(ts(0)) && out(1)._4.isEmpty && out(1)._5.isEmpty)
    assert(out(2)._3.isEmpty && out(2)._4.isEmpty && out(2)._5.isEmpty)
  }

  test("retention cohorts: every user appears in week_offset 0 of their own cohort") {
    val cells = Sessions.q62Retention(spark, TestSpark.sfDir)
      .as[(java.sql.Date, Long, Long)].collect()
    val week0 = cells.filter(_._2 == 0L).map(_._3).sum
    val users = graft.Tables.load(spark, TestSpark.sfDir, "events")
      .select("user_id").distinct().count()
    assert(week0 == users, "every user is active in their cohort's week 0")
    assert(cells.forall(_._2 >= 0))
  }

  test("q114 bot signals match a driver-side gap profile") {
    import org.apache.spark.sql.functions._
    val got = Sessions.q114BotSignals(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    val ev = graft.Tables.load(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long, Long)].collect()
    ev.groupBy(_._1).foreach { case (u, rows) =>
      val ms = rows.sortBy(e => (e._3, e._2)).map(e => Math.floorDiv(e._3, 1000L))
      val gaps = ms.sliding(2).collect { case Array(a, b) => b - a }.toSeq
      if (gaps.isEmpty) assert(!got.contains(u))
      else {
        val (_, ne, ng, mn, mx, nz, nf, mean, varg, bot) = got(u)
        assert(ne == ms.length.toLong && ng == gaps.length.toLong)
        assert(mn == gaps.min && mx == gaps.max)
        assert(nz == gaps.count(_ == 0L).toLong)
        assert(nf == gaps.count(_ < 1000L).toLong)
        val n = BigInt(gaps.length)
        val sg = gaps.map(BigInt(_)).sum
        val sgg = gaps.map(g => BigInt(g) * g).sum
        assert(mean == sg.toDouble / n.toDouble)
        assert(varg == (n * sgg - sg * sg).toDouble / (n * n).toDouble)
        assert(bot == (2L * nf > ng))
        assert(varg >= -1e-9)
      }
    }
  }

  test("q118 TWAP matches a driver-side hold-duration replay") {
    import org.apache.spark.sql.functions._
    val got = Sessions.q118Twap(spark, TestSpark.sfDir)
      .as[(String, java.sql.Date, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2.toString) -> r).toMap
    assert(got.nonEmpty)
    val ev = graft.Tables.load(spark, TestSpark.sfDir, "events")
      .select(col("event_type"), to_date(col("ts")).cast("string"),
        unix_millis(col("ts")), col("event_id"),
        expr("CAST(round(value * 100.0) AS BIGINT)"))
      .as[(String, String, Long, Long, Long)].collect()
    ev.groupBy(r => (r._1, r._2)).foreach { case (k, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._4))
      val dayEnd = (ordered.head._3 / 86400000L + 1L) * 86400000L
      val durs = ordered.map(_._3).sliding(2)
        .collect { case Array(a, b) => b - a }.toSeq :+
        (dayEnd - ordered.last._3)
      val wsum = ordered.map(_._5).zip(durs).map { case (c, d) => c * d }.sum
      val (_, _, n, dm, ws, twap) = got(k)
      assert(n == ordered.length.toLong)
      assert(dm == durs.sum && ws == wsum)
      assert(twap == wsum.toDouble / durs.sum.toDouble)
      // each day's weighted span ends exactly at midnight
      assert(ordered.head._3 + durs.sum == dayEnd)
    }
  }

  test("q120: longest streak, counts, and bounds on a hand-built calendar") {
    // user 1: Jan 1-3 (two events on Jan 1), gap, Jan 5-6 -> best 3
    // user 2: one day -> best 1, one streak
    val rows = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 08:00:00")),
      (2L, 1L, Timestamp.valueOf("2024-01-01 21:00:00")),
      (3L, 1L, Timestamp.valueOf("2024-01-02 08:00:00")),
      (4L, 1L, Timestamp.valueOf("2024-01-03 08:00:00")),
      (5L, 1L, Timestamp.valueOf("2024-01-05 08:00:00")),
      (6L, 1L, Timestamp.valueOf("2024-01-06 08:00:00")),
      (7L, 2L, Timestamp.valueOf("2024-02-10 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val dir = java.nio.file.Files.createTempDirectory("streak").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Sessions.q120GapsIslands(spark, dir)
      .as[(Long, Long, java.sql.Date, java.sql.Date, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.length == 2)
    val (u1, u2) = (out(0), out(1))
    assert(u1 == ((1L, 3L, java.sql.Date.valueOf("2024-01-01"),
      java.sql.Date.valueOf("2024-01-03"), 2L, 5L)))
    assert(u2 == ((2L, 1L, java.sql.Date.valueOf("2024-02-10"),
      java.sql.Date.valueOf("2024-02-10"), 1L, 1L)))
  }

  test("q121: session paths are ordered by (ts, event_id) and counted globally") {
    // user 1 session A: view->click (same gap window); then a >30min gap
    // opens session B: view alone. user 2: one session view->click.
    // two events share a timestamp -> event_id breaks the tie.
    val rows = Seq(
      (1L, 1L, ts(0), "view"), (2L, 1L, ts(0), "click"),
      (3L, 1L, Timestamp.valueOf("2024-01-01 11:00:00"), "view"),
      (4L, 2L, ts(5), "view"), (5L, 2L, ts(6), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("paths").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Sessions.q121EventPaths(spark, dir)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("view", 1L, 1L), ("view>click", 2L, 2L)))
  }

  test("q124: transition counts and exact ppm probabilities") {
    // user 1: view->click->purchase; user 2: view->view
    val rows = Seq(
      (1L, 1L, ts(0), "view", 0.0), (2L, 1L, ts(1), "click", 0.0),
      (3L, 1L, ts(2), "purchase", 5.0),
      (4L, 2L, ts(0), "view", 0.0), (5L, 2L, ts(1), "view", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("markov").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Sessions.q124MarkovTransitions(spark, dir)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out == Map(
      ("view", "click") -> ((1L, 2L, 500000L)),
      ("view", "view") -> ((1L, 2L, 500000L)),
      ("click", "purchase") -> ((1L, 1L, 1000000L))), s"got $out")
  }

  test("q125: cumulative distinct users counts each user on first day only") {
    // u1,u2 first on Jan 1 (u1 again Jan 3), u3 first on Jan 3
    val rows = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 08:00:00")),
      (2L, 2L, Timestamp.valueOf("2024-01-01 09:00:00")),
      (3L, 1L, Timestamp.valueOf("2024-01-03 08:00:00")),
      (4L, 3L, Timestamp.valueOf("2024-01-03 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val dir = java.nio.file.Files.createTempDirectory("cumu").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Sessions.q125CumulativeUsers(spark, dir)
      .as[(java.sql.Date, Long, Long)].collect().sortBy(_._1.getTime)
    assert(out.toSeq == Seq(
      (java.sql.Date.valueOf("2024-01-01"), 2L, 2L),
      (java.sql.Date.valueOf("2024-01-03"), 1L, 3L)), s"got ${out.toSeq}")
  }

  test("q126: purchases credit the last prior non-purchase event, else direct") {
    // user 1: view -> purchase(10.005) -> purchase(2.0) both credit "view"
    // user 2: session opens with purchase(3.0) -> direct
    val rows = Seq(
      (1L, 1L, ts(0), "view", 0.0), (2L, 1L, ts(1), "purchase", 10.005),
      (3L, 1L, ts(2), "purchase", 2.0),
      (4L, 2L, ts(0), "purchase", 3.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Sessions.q126Attribution(spark, dir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // 10.005*100 = 1000.5000000000001 in binary -> round = 1001, + 200
    assert(out == Map("view" -> ((2L, 1201L)), "direct" -> ((1L, 300L))),
      s"got $out")
  }

  test("q127: trailing 7-day distinct counts each user once per window") {
    // u1 active Jan 1 and Jan 9 (interval truncation at the 2nd day),
    // u2 active Jan 2; observed days are 1, 2, 9
    val rows = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 08:00:00")),
      (2L, 1L, Timestamp.valueOf("2024-01-09 08:00:00")),
      (3L, 2L, Timestamp.valueOf("2024-01-02 09:00:00")))
      .toDF("event_id", "user_id", "ts")
    val dir = java.nio.file.Files.createTempDirectory("roll").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Sessions.q127RollingDistinct(spark, dir)
      .as[(java.sql.Date, Long)].collect().toMap
    assert(out == Map(
      java.sql.Date.valueOf("2024-01-01") -> 1L,   // u1 only
      java.sql.Date.valueOf("2024-01-02") -> 2L,   // u1 (Jan 1) + u2
      java.sql.Date.valueOf("2024-01-09") -> 1L),  // u1 only (u2 aged out)
      s"got $out")
  }

  test("q217: relation census conserves pair mass and respects inverses") {
    import org.apache.spark.sql.functions._
    import graft.{Tables, TestSpark}
    val dir = TestSpark.sfDir
    val out = Sessions.q217AllenIntervals(spark, dir).collect()
    assert(out.nonEmpty)
    // mass conservation: per (type_a, type_b), relation counts sum to
    // the number of users having BOTH types
    val iv = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
    val both = iv.select(col("user_id"), col("event_type").as("type_a"))
      .join(iv.select(col("user_id"), col("event_type").as("type_b")),
        "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sums = out.groupBy(r => (r.getAs[String]("type_a"),
        r.getAs[String]("type_b")))
      .view.mapValues(_.map(_.getAs[Long]("n_users")).sum).toMap
    assert(sums == both, "relation counts do not partition the pair set")
    // inverse consistency on hand-built intervals: classify(A,B) must be
    // the inverse of classify(B,A) for every relation in the census
    val inverse = Map("before" -> "after", "after" -> "before",
      "meets" -> "met_by", "met_by" -> "meets",
      "overlaps" -> "overlapped_by", "overlapped_by" -> "overlaps",
      "starts" -> "started_by", "started_by" -> "starts",
      "during" -> "contains", "contains" -> "during",
      "finishes" -> "finished_by", "finished_by" -> "finishes",
      "equals" -> "equals")
    out.foreach(r =>
      assert(inverse.contains(r.getAs[String]("relation")),
        s"unknown relation: $r"))
  }

  test("q225: clamped fold equals a local sequential recompute per user") {
    import org.apache.spark.sql.functions._
    import graft.{Tables, TestSpark}
    val dir = TestSpark.sfDir
    val got = Sessions.q225ClampedBalance(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("final_bal_cents"),
          r.getAs[Long]("days_at_zero"))).toMap
    val raw = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
      .agg(sum(when(col("event_type") === "view",
          round(col("value") * 100.0).cast("long"))
        .otherwise(-round(col("value") * 100.0).cast("long"))).as("net"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"),
        r.getAs[Long]("net")))
    val expect = raw.groupBy(_._1).map { case (u, rows) =>
      var bal = 0L; var z = 0L
      rows.sortBy(_._2).foreach { case (_, _, net) =>
        bal = math.max(bal + net, 0L)
        if (bal == 0L) z += 1
      }
      u -> (rows.length.toLong, bal, z)
    }
    assert(got == expect)
    got.values.foreach { case (n, bal, z) =>
      assert(bal >= 0L && z <= n)
    }
  }

  test("q227: cohort percentiles equal a window recompute; invariants hold") {
    import org.apache.spark.sql.functions._
    import graft.{Tables, TestSpark}
    val dir = TestSpark.sfDir
    val rows = Sessions.q227ConvertLatency(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("p90_s") >= r.getAs[Long]("p50_s"))
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_signups"))
    }
    // plain-window recompute of the per-cohort nearest-rank percentiles
    val ev = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("signup", "purchase"))
    val s = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_signup"))
    val lat = ev.filter(col("event_type") === "purchase")
      .join(s, "user_id").filter(col("ts") >= col("t_signup"))
      .groupBy(col("user_id"), col("t_signup"))
      .agg(min(col("ts")).as("t_conv"))
      .select(col("user_id"),
        expr("unix_millis(t_signup) div (86400000 * 7)").as("w"),
        expr("(unix_millis(t_conv) - unix_millis(t_signup)) div 1000")
          .as("lat_s"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w")).orderBy(col("lat_s"), col("user_id"))
    val ranked = lat.withColumn("r", row_number().over(win))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w"))))
    def q(p: Int) = ranked
      .filter(col("r") === expr(s"(($p * n) + 99) div 100"))
      .collect().map(r => r.getAs[Long]("w") -> r.getAs[Long]("lat_s")).toMap
    val (p50, p90) = (q(50), q(90))
    rows.foreach { r =>
      val w = r.getAs[Long]("cohort_week")
      assert(r.getAs[Long]("p50_s") == p50(w), s"p50 mismatch at $w")
      assert(r.getAs[Long]("p90_s") == p90(w), s"p90 mismatch at $w")
    }
  }
}
