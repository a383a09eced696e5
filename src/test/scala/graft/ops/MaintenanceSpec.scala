package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q85–q87: LM scoring, SCD-2 history, incremental aggregate
  * maintenance — cross-operator consistency checks. */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q86 SCD-2: version chains link and current rows equal the q40 SCD-1 state") {
    val hist = ChangeFeed.q86Scd2History(spark, TestSpark.sfDir).collect()
    assert(hist.nonEmpty)
    // chain: within a key, version_to = the next version_from
    hist.groupBy(_.getLong(0)).foreach { case (k, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert(!a.isNullAt(2) && a.getLong(2) == b.getLong(1),
          s"key $k: broken chain ${a.getLong(1)} -> ${b.getLong(1)}")
      }
      assert(sorted.last.isNullAt(2), s"key $k: last row not open")
      assert(rows.count(_.getBoolean(3)) <= 1, s"key $k: multiple current rows")
    }
    // current rows ≡ SCD-1 current state (key, version, payload)
    val current = hist.filter(_.getBoolean(3))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSet
    val scd1 = ChangeFeed.q40CdfScd1(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(current == scd1,
      s"SCD-2 current slice diverges from SCD-1: ${(current diff scd1).take(3)} / ${(scd1 diff current).take(3)}")
  }

  test("q87 incremental merge equals the full recompute") {
    val orders = graft.Tables.load(spark, TestSpark.sfDir, "orders")
    val full = orders.groupBy(col("o_custkey").as("customer_id"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")).as("total_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val incr = ChangeFeed.q87IncrementalAgg(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(incr == full)
  }

  test("q85 LM score: train docs have zero unseen bigrams; probabilities in (0,1]") {
    val rows = TextOps.q85LmScore(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    val trainIds = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .filter(substring(md5(col("doc_id").cast("string")), 1, 1).between("0", "b"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val (id, nb, nu) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nu <= nb)
      if (trainIds(id))
        assert(nu == 0L, s"train doc $id has $nu unseen bigrams")
      if (!r.isNullAt(3)) {
        val p = r.getDouble(3)
        assert(p > 0.0 && p <= 1.0, s"doc $id worst_p $p out of range")
      } else assert(nu == nb, s"doc $id null worst_p but has seen bigrams")
    }
    // the LM actually discriminates: some non-train doc has unseen mass
    assert(rows.exists(r => r.getLong(2) > 0), "no unseen bigrams anywhere")
  }
}
