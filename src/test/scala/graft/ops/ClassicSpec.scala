package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Semantic invariants for the classic decision-support shapes
  * (q168–q175) beyond the DuckDB hash gate: shares bounded, argmax
  * unique, distributions conserve mass, disjunctive bands partition. */
class ClassicSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("q168: share is bounded and numerator never exceeds denominator") {
    val rows = Classic.q168MarketShare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nat = r.getAs[Long]("nation_rev_u4")
      val tot = r.getAs[Long]("total_rev_u4")
      val ppm = r.getAs[Long]("share_ppm")
      assert(nat >= 0 && nat <= tot, s"numerator out of range: $r")
      assert(ppm >= 0 && ppm <= 1000000L, s"ppm out of range: $r")
    }
  }

  test("q169: promo share per month consistent with its own parts") {
    val rows = Classic.q169PromoShare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val promo = r.getAs[Long]("promo_rev_u4")
      val tot = r.getAs[Long]("total_rev_u4")
      assert(promo >= 0 && promo <= tot)
      assert(r.getAs[Long]("promo_ppm") == promo * 1000000L / tot)
    }
  }

  test("q170: every returned supplier carries the global max revenue") {
    val df = Classic.q170TopSupplier(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Long]("total_rev_u4")).distinct
    assert(revs.length == 1, s"mixed revenues in argmax result: ${revs.toSeq}")
    // independent recompute of the max via a different plan
    val expect = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(Classic.Q170From) &&
        col("l_shipdate") < lit(Classic.Q170To))
      .groupBy(col("l_suppkey"))
      .agg(sum(Exact.units(col("l_extendedprice"), 2) *
        (lit(100L) - Exact.units(col("l_discount"), 2))).as("r"))
      .agg(max(col("r"))).collect()(0).getLong(0)
    assert(revs.head == expect)
  }

  test("q171: distribution conserves the customer population") {
    val rows = Classic.q171OrderCountDist(spark, dir).collect()
    val totalCust = rows.map(_.getAs[Long]("custdist")).sum
    val nCust = Tables.load(spark, dir, "customer").count()
    assert(totalCust == nCust, s"$totalCust != $nCust")
    // weighted count-sum equals the order count (every order has a customer)
    val totalOrders = rows.map(r =>
      r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum
    assert(totalOrders == Tables.load(spark, dir, "orders").count())
  }

  test("q172: small-quantity lines are a strict subset per brand") {
    val rows = Classic.q172SmallQtyRevenue(spark, dir).collect()
    assert(rows.nonEmpty)
    val flagged = rows.map(_.getAs[Long]("n_lines")).sum
    val all = Tables.load(spark, dir, "lineitem").count()
    assert(flagged > 0 && flagged < all)
  }

  test("q173: disjoint brand bands sum to the combined result") {
    val combined = Classic.q173DisjunctiveBands(spark, dir).collect()(0)
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), Exact.units(col("l_quantity"), 0).as("qty"),
        (Exact.units(col("l_extendedprice"), 2) *
          (lit(100L) - Exact.units(col("l_discount"), 2))).as("rev"))
    val part = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val bands = Seq(
      ("Brand#1", 1, 15, 1, 20), ("Brand#2", 10, 30, 10, 30),
      ("Brand#3", 20, 50, 20, 50))
    val per = bands.map { case (b, s0, s1, q0, q1) =>
      li.join(part, col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === b && col("p_size").between(s0, s1) &&
          col("qty").between(q0, q1))
        .agg(coalesce(sum(col("rev")), lit(0L)).cast("long"),
          count(lit(1)))
        .collect()(0)
    }
    assert(per.map(_.getLong(0)).sum == combined.getAs[Long]("revenue_u4"))
    assert(per.map(_.getLong(1)).sum == combined.getAs[Long]("n_lines"))
  }

  test("q174: sole-supplier orders recomputed via a self-join agree") {
    val rows = Classic.q174SoleSupplier(spark, dir).collect()
    assert(rows.nonEmpty)
    val claimed = rows.map(_.getAs[Long]("n_sole_orders")).sum
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val expect = li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"), countDistinct(col("l_suppkey")).as("d"))
      .filter(col("n") >= 2 && col("d") === 1).count()
    assert(claimed == expect)
  }

  test("q175: every reported customer is rich and idle") {
    val agg = Classic.q175IdleRichCustomers(spark, dir).collect()
    assert(agg.nonEmpty)
    val nReported = agg.map(_.getAs[Long]("n_cust")).sum
    // direct recompute with spark.sql correlated NOT EXISTS
    Tables.load(spark, dir, "customer").createOrReplaceTempView("c_v")
    Tables.load(spark, dir, "orders").createOrReplaceTempView("o_v")
    val expect = spark.sql(
      s"""WITH cust AS (SELECT c_custkey,
         |  CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal FROM c_v),
         |pos AS (SELECT sum(bal) s, count(*) n FROM cust WHERE bal > 0)
         |SELECT count(*) FROM cust, pos
         |WHERE bal * n > s AND NOT EXISTS (
         |  SELECT 1 FROM o_v WHERE o_custkey = c_custkey
         |    AND o_orderdate >= TIMESTAMP '${Classic.Q175Cutoff}')
         |""".stripMargin).collect()(0).getLong(0)
    assert(nReported == expect)
  }

  test("q207: shares bounded and every kept part clears the threshold") {
    val rows = Classic.q207PartValueShare(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = Tables.load(spark, dir, "lineitem")
      .agg(sum(Exact.units(col("l_extendedprice"), 2) *
        (lit(100L) - Exact.units(col("l_discount"), 2))).cast("decimal(38,0)"))
      .collect()(0).getDecimal(0)
    rows.foreach { r =>
      val v = BigDecimal(r.getAs[Long]("value_u4"))
      assert(v * 2000 > BigDecimal(total), s"below threshold: $r")
      assert(r.getAs[Long]("share_ppm") >= 500L)
    }
  }

  test("q208: no complaint supplier contributes to any count") {
    // recompute one group's distinct-supplier count including complaint
    // suppliers: it must be >= the reported count, and the reported
    // count must equal the clean recount.
    val df = Classic.q208SupplierCnt(spark, dir)
    val one = df.orderBy(col("supplier_cnt").desc,
      col("p_brand"), col("p_type"), col("p_size")).limit(1).collect()(0)
    val (b, t, s) = (one.getAs[String]("p_brand"),
      one.getAs[String]("p_type"), one.getAs[Int]("p_size"))
    val complaint = Tables.load(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0.0).select(col("s_suppkey"))
    val base = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === b && col("p_type") === t &&
        col("p_size") === s)
    val clean = base
      .join(complaint, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .select(col("l_suppkey")).distinct().count()
    assert(one.getAs[Long]("supplier_cnt") == clean)
  }

  test("q209: chosen supplier achieves the true min cost for its part") {
    val rows = Classic.q209MinCostSupplier(spark, dir).collect()
    assert(rows.nonEmpty)
    // independent recompute of per-part min over the same candidate set
    val euroSupp = Tables.load(spark, dir, "supplier").as("s")
      .join(Tables.load(spark, dir, "nation").as("n"),
        col("s.s_nationkey") === col("n.n_nationkey"))
      .join(Tables.load(spark, dir, "region").as("r"),
        col("n.n_regionkey") === col("r.r_regionkey"))
      .filter(col("r.r_name") === Classic.Q209Region)
      .select(col("s.s_suppkey").as("esk"))
    val mins = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .filter(col("p_type") === "LARGE" && col("p_size") >= 40)
      .join(euroSupp, col("l_suppkey") === col("esk"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(min(Exact.units(col("l_extendedprice"), 2)).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == mins.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_cost_u2") ==
        mins(r.getAs[Long]("p_partkey")), s"not the min: $r")
    }
  }

  test("q210: every fresh part really exceeds 25% of all-time quantity") {
    val rows = Classic.q210ExcessParts(spark, dir).collect()
    assert(rows.nonEmpty)
    val byPart = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(when(year(col("l_shipdate")) === 2000,
          Exact.units(col("l_quantity"), 0)).otherwise(lit(0L))).as("q2000"),
        sum(Exact.units(col("l_quantity"), 0)).as("qall"))
    val nFresh = byPart.filter(col("q2000") * 4L > col("qall")).count()
    assert(nFresh > 0)
    // the per-supplier counts can never exceed the fresh-part universe
    rows.foreach(r => assert(r.getAs[Long]("n_fresh_parts") <= nFresh))
  }
}
