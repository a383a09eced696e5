package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("two-phase distributed prefix sum equals a driver-side sequential cumsum") {
    val rows = Packing.q59SequencePack(spark, TestSpark.sfDir)
      .select("doc_id", "n_tok", "seq_id", "offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    var cum = 0L
    rows.foreach { case (id, n, seqId, off) =>
      assert(seqId == cum / Packing.PackCapacity, s"doc $id seq_id")
      assert(off == cum % Packing.PackCapacity, s"doc $id offset")
      cum += n
    }
  }

  test("packing marks exactly the docs whose span crosses a capacity boundary") {
    val rows = Packing.q59SequencePack(spark, TestSpark.sfDir)
      .select("n_tok", "offset", "spans_boundary")
      .as[(Long, Long, Boolean)].collect()
    rows.foreach { case (n, off, spans) =>
      assert(spans == (off + n > Packing.PackCapacity))
    }
    assert(rows.exists(_._3), "test corpus should produce at least one boundary-spanning doc")
  }

  test("sequencePack equals sequential scanLeft on randomized sparse inputs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      // sparse, shuffled doc_ids with gaps; token counts incl. zeros
      val ids = rnd.shuffle((0 until 3000).toList).take(200)
        .map(_.toLong * (trial + 1)).sorted
      val toks = ids.map(id => (id, rnd.nextInt(5000).toLong))
      val out = Packing.sequencePack(
          rnd.shuffle(toks).toDF("doc_id", "n_tok"))
        .select("doc_id", "seq_id", "offset")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      var cum = 0L
      val expected = toks.map { case (id, n) =>
        val r = (id, cum / Packing.PackCapacity, cum % Packing.PackCapacity)
        cum += n; r
      }
      assert(out.toSeq == expected, s"trial $trial")
    }
  }

  test("shard assignment is a permutation-complete, token-balanced partition") {
    val out = Packing.q78ShardAssign(spark, TestSpark.sfDir)
      .as[(Long, Long, Long)].collect()
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents").count()
    assert(out.length.toLong == docs, "every doc assigned exactly once")
    assert(out.map(_._3).toSet == (0L until Packing.NumShards).toSet,
      "all shards populated")
    // snake-LPT balance: per-shard token budgets within a few percent
    val totals = out.groupBy(_._3).view.mapValues(_.map(_._2).sum).values.toSeq
    val (mx, mn) = (totals.max, totals.min)
    assert(mx - mn <= math.max(8L, totals.sum / Packing.NumShards / 20),
      s"shard token budgets skewed: min=$mn max=$mx")
    // deterministic: snake fold of the (tokens desc, doc_id) rank
    val byRank = out.sortBy(r => (-r._2, r._1)).zipWithIndex
    byRank.foreach { case ((_, _, shard), r) =>
      val fold = r % (2 * Packing.NumShards)
      val want = if (fold < Packing.NumShards) fold else 2 * Packing.NumShards - 1 - fold
      assert(shard == want.toLong, s"rank $r got shard $shard want $want")
    }
  }

  test("overlapped chunking covers every token with the configured stride") {
    val doc = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    // drive the same op body on a synthetic doc via the documents schema
    val w = graft.functions.TextFunctions.wsTokens(col("text"))
    val out = doc
      .select(col("doc_id"), w.as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tok"),
        explode(sequence(lit(1), size(col("w")), lit(Packing.ChunkStride))).as("s"))
      .select(col("s"),
        least(col("n_tok") - col("s") + 1, lit(Packing.ChunkSize.toLong)).as("len"))
      .as[(Int, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1, 49, 97))
    assert(out.map(_._2).toSeq == Seq(64L, 52L, 4L))
    // consecutive chunks overlap by ChunkSize - ChunkStride tokens
    assert(Packing.ChunkSize - Packing.ChunkStride == 16)
    // coverage: chunk i spans [s, s+len-1]; next chunk starts inside it
    out.sliding(2).foreach { case Array((s1, l1), (s2, _)) =>
      assert(s2 <= s1 + l1.toInt, "gap between consecutive chunks")
    }
  }
}
