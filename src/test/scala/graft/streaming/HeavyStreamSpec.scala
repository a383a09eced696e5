package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sharded Space-Saving heavy hitters as live state: bounded counters
  * per shard, exact when within capacity (bit-equal to the batch
  * groupBy count however the stream is cut), and the deterministic
  * Metwally guarantees — no false negatives above N_shard/m, and
  * true ≤ est ≤ true + err — once eviction kicks in.
  */
class HeavyStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Shards = 4

  test("within capacity the streaming summary is EXACT and equals batch counts, any micro-batch cuts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 30 distinct users over 4 shards: ≤ m=16 distinct per shard
    val rows = (0 until 500).map(i => s"user${i % 30}")

    val in = MemoryStream[String]
    val out = HeavyStream.summaries(
      HeavyStream.sharded(in.toDS().toDF("item"), "item", Shards), m = 16)
    val q = out.writeStream.format("memory").queryName("ss_exact")
      .outputMode("update").start()
    val chunks = Seq(rows.take(13), rows.slice(13, 14), rows.drop(14))
    chunks.filter(_.nonEmpty).foreach { c =>
      in.addData(c.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()

    // update mode re-emits a shard each batch it is touched: keep the
    // LAST summary per shard, then flatten
    val streaming = spark.table("ss_exact")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("shard")
          .orderBy(monotonically_increasing_id().desc)))
      .filter(col("rn") === 1)
      .select(explode(col("counters")).as("c"))
      .select(col("c.item"), col("c.est"), col("c.err"))
      .as[(String, Long, Long)].collect().toSet

    val batch = rows.toDF("item").groupBy("item").count()
      .as[(String, Long)].collect().map { case (i, c) => (i, c, 0L) }.toSet

    assert(batch.nonEmpty && streaming == batch)
  }

  test("past capacity: state stays ≤ m per shard; every hitter above N_shard/m survives; true ≤ est ≤ true + err") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val m = 8
    // 5 hot items (100 occurrences each) among 120 cold singletons:
    // far past 8 counters per shard, so eviction churns constantly
    val rows = new scala.util.Random(42).shuffle(
      (0 until 5).flatMap(h => Seq.fill(100)(s"hot$h")) ++
        (0 until 120).map(c => s"cold$c"))

    val in = MemoryStream[String]
    val out = HeavyStream.summaries(
      HeavyStream.sharded(in.toDS().toDF("item"), "item", Shards), m = m)
    val q = out.writeStream.format("memory").queryName("ss_soak")
      .outputMode("update").start()
    rows.grouped(97).foreach { c =>
      in.addData(c.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()

    val finalSummaries = spark.table("ss_soak")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("shard")
          .orderBy(monotonically_increasing_id().desc)))
      .filter(col("rn") === 1)
      .select(col("shard"), explode(col("counters")).as("c"))
      .select(col("shard"), col("c.item"), col("c.est"), col("c.err"))
      .as[(Int, String, Long, Long)].collect()

    // ground truth: per-item count and shard, via the same shard expr
    val truth = HeavyStream.sharded(rows.toDF("item"), "item", Shards)
      .groupBy("shard", "item").count()
      .as[(Int, String, Long)].collect()
    val trueCnt = truth.map { case (_, i, c) => i -> c }.toMap
    val shardN = truth.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap

    // bounded state
    finalSummaries.groupBy(_._1).foreach { case (shard, cs) =>
      assert(cs.length <= m, s"shard $shard holds ${cs.length} > $m counters")
    }
    // no false negatives above the per-shard threshold
    truth.foreach { case (shard, item, c) =>
      if (c > shardN(shard) / m) {
        assert(finalSummaries.exists(f => f._1 == shard && f._2 == item),
          s"hitter $item (count $c > ${shardN(shard)}/$m) missing from shard $shard")
      }
    }
    // estimate bounds
    finalSummaries.foreach { case (_, item, est, err) =>
      val t = trueCnt(item)
      assert(est >= t && est - err <= t,
        s"$item: est=$est err=$err violates bounds around true=$t")
    }
  }
}
