package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** Semantic invariants for the governance operators (q211–q213) beyond
  * the DuckDB hash gate: cascade counts recomputed through an
  * independent join path, true FDs report zero violations, and the
  * randomized-response mechanism honours its truth-coin. */
class GovernanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("q211: cascade counts match an independent join-path recompute") {
    val rows = Governance.q211DeleteCascade(spark, dir).collect()
      .map(r => r.getAs[String]("table_name") ->
        (r.getAs[Long]("rows_to_delete"), r.getAs[Long]("total_rows"))).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem", "events"))
    // independent path: customer ⋈ orders ⋈ lineitem counted in one go
    val cohort = Tables.load(spark, dir, "customer")
      .filter(substring(md5(concat(lit("gdpr_"),
        col("c_custkey").cast("string"))), 1, 1) === "0")
      .select(col("c_custkey"))
    val oCnt = Tables.load(spark, dir, "orders")
      .join(cohort, col("o_custkey") === col("c_custkey")).count()
    val liCnt = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders")
          .join(cohort, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(rows("customer")._1 == cohort.count())
    assert(rows("orders")._1 == oCnt)
    assert(rows("lineitem")._1 == liCnt)
    // cascade monotonicity: a customer cohort can't delete more rows
    // than each table holds
    rows.values.foreach { case (del, tot) => assert(del <= tot) }
  }

  test("q212: true FD reports zero violations, near-FDs are bounded") {
    val rows = Governance.q212FdProfile(spark, dir).collect()
      .map(r => r.getAs[String]("fd") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("n_violating"))).toMap
    assert(rows.size == 6)
    // n_nationkey is nation's primary key: the FD holds exactly
    assert(rows("nation: n_nationkey -> n_regionkey")._2 == 0L)
    rows.values.foreach { case (keys, viol) =>
      assert(viol >= 0 && viol <= keys)
    }
  }

  test("q213: mechanism honours the truth-coin and tallies conserve") {
    val out = Governance.q213RandomizedResponse(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("true_cnt") <= n)
      assert(r.getAs[Long]("reported_cnt") <= n)
      assert(r.getAs[Long]("est_x2") ==
        r.getAs[Long]("reported_cnt") * 4L - n)
    }
    // per-record check: whenever the first coin says "truth", the
    // reported bit equals the true bit
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), (col("lang") === "en").as("truth"))
      .withColumn("c1", substring(md5(concat(lit("rr1_"),
        col("doc_id").cast("string"))), 1, 1) <= "7")
      .withColumn("c2", substring(md5(concat(lit("rr2_"),
        col("doc_id").cast("string"))), 1, 1) <= "7")
      .withColumn("reported", when(col("c1"), col("truth")).otherwise(col("c2")))
    val broken = docs.filter(col("c1") && col("reported") =!= col("truth")).count()
    assert(broken == 0L)
    // the truth-coin is keyed on doc_id only: both branches occur
    assert(docs.filter(col("c1")).count() > 0)
    assert(docs.filter(!col("c1")).count() > 0)
  }

  test("q223: suppression grows with k and matches a direct recount") {
    val rows = Governance.q223KAnonymity(spark, dir).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("classes_below"), r.getAs[Long]("rows_suppressed")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Governance.Q223Ks.map(_.toLong))
    // monotone in k on both counters
    rows.sliding(2).foreach { case Array((_, (cb1, rs1)), (_, (cb2, rs2))) =>
      assert(cb1 <= cb2 && rs1 <= rs2)
    }
    // direct recount for k = 5
    val sizes = Tables.load(spark, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long"))
      .agg(count(lit(1)).as("n")).collect().map(_.getAs[Long]("n"))
    val (cb5, rs5) = rows.find(_._1 == 5L).get._2
    assert(cb5 == sizes.count(_ < 5).toLong)
    assert(rs5 == sizes.filter(_ < 5).sum)
  }
}
