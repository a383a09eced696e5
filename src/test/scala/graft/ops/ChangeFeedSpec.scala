package graft.ops

import graft.TestSpark
import graft.streaming.Streams
import org.scalatest.funsuite.AnyFunSuite

class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scd1Apply resolves latest version, drops pre-images, applies deletes") {
    val changes = Seq(
      // key 1: insert then update — latest wins
      (1L, 1L, "insert", "a-v1"),
      (1L, 3L, "update_postimage", "a-v3"),
      (1L, 3L, "update_preimage", "a-v2-pre"), // never applies
      // key 2: latest change is a delete — key suppressed
      (2L, 1L, "insert", "b-v1"),
      (2L, 2L, "delete", null),
      // key 3: delete then REINSERT at a higher version — key lives
      (3L, 1L, "delete", null),
      (3L, 2L, "insert", "c-v2"))
      .toDF("k", "_commit_version", "_change_type", "payload")
    val out = Streams.scd1Apply(changes, Seq("k"))
      .select("k", "_commit_version", "payload")
      .as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 3L, "a-v3"), (3L, 2L, "c-v2")))
  }

  test("q110 PIT lookup replays argmax-by-version semantics per probe") {
    val sf = "/root/testdata/sf0.001"
    val got = ChangeFeed.q110PitLookup(spark, sf)
      .select("customer_id", "probe_version", "dim_version")
      .as[(Long, Long, Option[Long])].collect()
    assert(got.nonEmpty)
    // driver-side reference: latest applied change at or before the probe
    val orders = graft.Tables.load(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderstatus")
      .as[(Long, Long, String)].collect()
    def changeType(k: Long, st: String) =
      if (k % 11 == 0) "delete"
      else if (st == "O") "insert"
      else if (k % 13 == 0) "update_preimage"
      else "update_postimage"
    val applied = orders
      .map { case (c, v, st) => (c, v, changeType(v, st)) }
      .filter(_._3 != "update_preimage")
      .groupBy(_._1)
    val want = orders.map { case (c, pv, _) =>
      val visible = applied.getOrElse(c, Array.empty[(Long, Long, String)])
        .filter(_._2 <= pv)
      val dim = if (visible.isEmpty) None
      else {
        val last = visible.maxBy(_._2)
        if (last._3 == "delete") None else Some(last._2)
      }
      (c, pv, dim)
    }.toSet
    assert(got.toSet == want)
    // both absence modes occur in the data: pre-first-change probes and
    // post-delete probes resolve to an absent dimension
    assert(got.exists(_._3.isEmpty))
    assert(got.count(_._3.isDefined) > 0)
  }

  test("q197 retraction merge equals a full recompute of the new snapshot") {
    import org.apache.spark.sql.functions._
    val sf = graft.TestSpark.sfDir
    val orders = graft.Tables.load(spark, sf, "orders")
    val cents = expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")
    val full = orders.filter(col("o_orderkey") % 11 =!= 0)
      .groupBy(col("o_custkey").as("customer_id"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("o_orderkey") % 3 === 0,
          (cents * 110L / lit(100L)).cast("long")).otherwise(cents))
          .as("total_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inc = ChangeFeed.q197RetractAgg(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full)
    // deletions genuinely retract: some customer must have FEWER orders
    // in the maintained view than in the base snapshot's aggregate
    val baseCounts = orders.filter(col("o_orderkey") % 7 =!= 0)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val incCounts = inc.map(t => t._1 -> t._2).toMap
    assert(incCounts.exists { case (c, n) => baseCounts.getOrElse(c, 0L) > n },
      "expected at least one group to shrink under retraction")
  }

  test("q197 on a hand-built table retracts a group to zero membership") {
    import org.apache.spark.sql.functions._
    // customer 100 owns only order 22 (22%7!=0 -> in base; 22%11==0 ->
    // absent from new): the delete must erase the whole group from the
    // maintained view. customer 200's order 3 is re-stated (+10%).
    val dir = java.nio.file.Files.createTempDirectory("ivm").toString
    Seq((22L, 100L, 50.0, "O", "1-URGENT", java.sql.Date.valueOf("2024-01-01")),
      (3L, 200L, 10.0, "F", "2-HIGH", java.sql.Date.valueOf("2024-01-02")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
        "o_orderpriority", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = ChangeFeed.q197RetractAgg(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((200L, 1L, 1100L)))
  }
}
