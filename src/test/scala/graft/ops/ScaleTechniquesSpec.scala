package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-scale techniques: salting for skew, bucketing for
  * exchange-free co-located joins. Correctness is asserted here;
  * the plan shapes are asserted from the executed plan text. */
class ScaleTechniquesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted equi-join returns exactly the plain join result") {
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val ord = Tables.load(spark, TestSpark.sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(ord, "l_orderkey")
    val salted = SkewJoin.saltedEquiJoin(li, ord, "l_orderkey", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("date-partitioned layout prunes partitions at scan time") {
    val out = java.nio.file.Files.createTempDirectory("part").toString
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
      .withColumn("event_date", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("event_date").parquet(out)
    val nDates = ev.select("event_date").distinct().count()
    val filtered = spark.read.parquet(out)
      .filter(col("event_date") === ev.select(min("event_date")).head.getDate(0))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // only one of nDates partitions is read
    val scanned = filtered.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(filtered.count() > 0 && nDates > 1)
    assert(filtered.count() < ev.count())
  }

  test("dynamic partition pruning reaches the fact scan through a join") {
    // the 100 TB shape: a date-partitioned fact joined to a filtered
    // dimension with NO literal predicate on the fact — the partition
    // filter must be INJECTED at runtime from the dimension's build
    // side (DPP), or every partition of the fact is read
    val out = java.nio.file.Files.createTempDirectory("dpp").toString
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
      .withColumn("event_date", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("event_date").parquet(out)
    // the dim side must carry a SELECTIVE FILTER (the PartitionPruning
    // rule keys on one); an orderBy/limit derivation does not qualify
    val dim = ev.select(col("event_date").as("d")).distinct()
      .filter(dayofmonth(col("d")) <= 2)
    val fact = spark.read.parquet(out)
    val joined = fact.join(broadcast(dim), col("event_date") === col("d"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no DPP subquery in the fact scan:\n${plan.take(2000)}")
    // correctness: same rows as the literal-filtered equivalent
    val dates = dim.collect().map(_.getDate(0))
    val expect = ev.filter(col("event_date").isin(dates: _*)).count()
    assert(joined.count() == expect && expect > 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
      val ord = Tables.load(spark, TestSpark.sfDir, "orders")
        .select("o_orderkey", "o_totalprice")
      li.write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li_b").saveAsTable("li_b")
      ord.write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/ord_b").saveAsTable("ord_b")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val planText = joined.queryExecution.executedPlan.toString
      assert(!planText.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$planText")
      assert(joined.count() ==
        Tables.load(spark, TestSpark.sfDir, "lineitem").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the plan)") {
    import spark.implicits._
    // one key carries ~all left rows — the classic hot-key join. With
    // AQE skew handling forced on (tiny thresholds so test-sized data
    // qualifies), the executed SortMergeJoin must be marked skew=true:
    // the runtime re-plan that replaces manual salting at 100 TB.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 60000)
        .select(when(col("id") % 3 =!= 0, lit(7L))
          .otherwise(col("id") % 5000).as("k"), col("id").as("payload"))
      val right = spark.range(0, 5000).select(col("id").as("k"),
        (col("id") * 2).as("r"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame's QueryExecution so the adaptive plan
      // finalizes (count() would plan a separate aggregate query)
      assert(joined.collect().length == 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the adaptive plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q112 skew advisor matches a driver-side count profile") {
    import spark.implicits._
    val got = SkewJoin.q112SkewAdvisor(spark, TestSpark.sfDir)
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got.size == SkewJoin.AdvisedKeys.size)
    SkewJoin.AdvisedKeys.foreach { case (t, k) =>
      val keys = Tables.load(spark, TestSpark.sfDir, t)
        .select(col(k).cast("long")).as[Long].collect()
      val byKey = keys.groupBy(identity).view.mapValues(_.length.toLong)
      val mx = byKey.values.max
      val (_, _, n, nk, gmx, hot, salt) = got((t, k))
      assert(n == keys.length.toLong && nk == byKey.size.toLong && gmx == mx)
      assert(hot == byKey.filter(_._2 == mx).keys.min)
      assert(salt == (mx * nk + n - 1) / n)
      assert(salt >= 1)
    }
    // at least one advised key is genuinely skewed (salting matters)
    assert(got.values.exists(_._7 > 1))
  }

  test("q148 join-size advisor predicts the executed self-join exactly") {
    import spark.implicits._
    val got = SkewJoin.q148JoinSize(spark, TestSpark.sfDir)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // predicted Σc² must equal the cardinality of the actual self-join
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
      .select(col("user_id").as("k"))
    val executed = ev.as("a")
      .join(ev.as("b"), col("a.k") === col("b.k")).count()
    val (_, _, n, _, sj, pairs, _, hotSq, sharePpm) =
      got(("events", "user_id"))
    assert(sj == executed)
    assert(pairs == (sj - n) / 2)
    assert(hotSq <= sj && sharePpm == hotSq * 1000000L / sj)
  }

  test("q113 window suite: gaps, frame values, rank ratios per user") {
    import spark.implicits._
    val rows = graft.ops.Extended.q113WindowSuite(spark, TestSpark.sfDir)
      .as[(Long, Long, Option[Long], Option[Long], Long, Long, Option[Long],
        Double, Double)].collect()
    assert(rows.nonEmpty)
    val ev = Tables.load(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long, Long)].collect()
    // order by full µs precision (what the engine sorts on); emit ms
    val byUser = ev.groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._3, e._2))
        .map(e => (e._2, Math.floorDiv(e._3, 1000L))).toIndexedSeq)
      .toMap
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val ord = byUser(u)
      val n = ord.length
      val pos = ord.zipWithIndex.map { case ((id, _), i) => id -> i }.toMap
      rs.foreach { case (_, id, gp, gn, fe, le, te, pr, cd) =>
        val i = pos(id)
        assert(gp == (if (i == 0) None else Some(ord(i)._2 - ord(i - 1)._2)))
        assert(gn == (if (i == n - 1) None else Some(ord(i + 1)._2 - ord(i)._2)))
        assert(fe == ord.head._1 && le == ord.last._1)
        assert(te == (if (n >= 3) Some(ord(2)._1) else None))
        assert(pr == (if (n == 1) 0.0 else i.toDouble / (n - 1).toDouble))
        assert(cd == (i + 1).toDouble / n.toDouble)
      }
    }
  }
}
