package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior of the shared primitives: empty frames,
  * singletons, and single-group shapes must yield empty/identity
  * results — never throw — because at 100 TB a partition, source
  * slice, or time window being empty is routine, not exceptional.
  */
class EdgeCasesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q63 fails loudly on a tagless corpus instead of going quadratic") {
    // names without the 'Tag#digits' shape all land in one
    // empty-string block per nation; once that block outgrows
    // Q63MaxBlockWidth the width guard must throw, not silently run
    // the quadratic nation-wide join
    val n = (Extended.Q63MaxBlockWidth + 100).toInt
    val cust = (1 to n).map(i => (i.toLong, s"customer $i", 7L))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val sup = Seq((1L, "supplier one", 7L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val e = intercept[Exception] {
      Extended.fuzzyMatchBlocked(sup, cust).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("blocking")),
      s"expected the block-width guard message, got: ${messages(e).mkString(" | ")}")

    // and a healthy tagged corpus of the same size sails through
    val tagged = (1 to n).map(i =>
      (i.toLong, f"Customer#$i%09d", 7L)).toDF("c_custkey", "c_name", "c_nationkey")
    val supT = Seq((1L, "Supplier#000000001", 7L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    assert(Extended.fuzzyMatchBlocked(supT, tagged).count() == 1)
  }

  test("groupRank on an empty frame returns an empty frame") {
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "v", "id")
    val out = Rank.groupRank(empty, Seq("g"), "v", Seq("id"), "rk", "n")
    assert(out.count() == 0)
  }

  test("groupRank on a single row ranks it 0 of 1") {
    val one = Seq(("a", 5L, 1L)).toDF("g", "v", "id")
    val r = Rank.groupRank(one, Seq("g"), "v", Seq("id"), "rk", "n")
      .select("rk", "n").head
    assert(r.getLong(0) == 0 && r.getLong(1) == 1)
  }

  test("globalPrefixSum on an empty frame returns an empty frame") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("v", "id", "d")
    val out = Rank.globalPrefixSum(empty, "v", Seq("id"), "d", "cum")
    assert(out.count() == 0)
  }

  test("radiusPairs: empty input, single point, and two coincident points") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("k", "lat", "lon")
    assert(Spatial.radiusPairs(empty, 10L).count() == 0)

    val one = Seq((1L, 5L, 5L)).toDF("k", "lat", "lon")
    assert(Spatial.radiusPairs(one, 10L).count() == 0,
      "a point is never paired with itself")

    val coincident = Seq((1L, 5L, 5L), (2L, 5L, 5L)).toDF("k", "lat", "lon")
    val rows = Spatial.radiusPairs(coincident, 10L).collect()
    assert(rows.length == 1 && rows.head.getLong(2) == 0L,
      "coincident points pair exactly once at distance 0")
  }

  test("cmsCells on an empty token frame is an empty sketch") {
    val empty = Seq.empty[String].toDF("tok")
    assert(Sketches.cmsCells(empty).count() == 0)
  }

  test("groupPrefixSum single-group singleton equals its own delta") {
    val one = Seq(("g", 3L, 1L, 7L)).toDF("g", "v", "id", "d")
    val r = Rank.groupPrefixSum(one, Seq("g"), "v", Seq("id"), "d", "cum")
    assert(r.select("cum").head.getLong(0) == 7L)
  }

  test("KmvStream.registers: empty frame is empty, singleton is its own register") {
    val empty = Seq.empty[(String, String)].toDF("source", "h15")
    assert(graft.streaming.KmvStream.registers(empty).count() == 0)

    val one = Seq(("s", "0123456789abcde")).toDF("source", "h15")
    val r = graft.streaming.KmvStream.registers(one).collect()
    assert(r.length == 1 && r.head.register == Seq("0123456789abcde"))
  }

  test("KmvStream.registers truncates past K and dedupes replayed hashes") {
    val rows = ((0 until graft.ops.Kmv.K + 5).map(i =>
      ("s", f"$i%015x")) ++ Seq(("s", f"${0}%015x"))) // replay smallest
    val r = graft.streaming.KmvStream.registers(rows.toDF("source", "h15"))
      .collect().head.register
    assert(r.length == graft.ops.Kmv.K)
    assert(r == (0 until graft.ops.Kmv.K).map(i => f"$i%015x"))
  }

  test("q196 VAD: hand-built docs segment exactly at frame runs") {
    // Frames are 64 bytes; 'e'*64 has energy 64 (active), 'x'*64 has 0
    // (inactive). Doc 1: active,inactive,active -> two 1-frame
    // segments. Doc 2: active,active -> one 2-frame segment. Doc 3:
    // all inactive -> no rows.
    val e = "e" * MultimodalOps.VadFrame
    val x = "x" * MultimodalOps.VadFrame
    val dir = java.nio.file.Files.createTempDirectory("vad").toString
    Seq((1L, e + x + e, "s"), (2L, e + e, "s"), (3L, x + x, "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = MultimodalOps.q196AudioVad(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val f = MultimodalOps.VadFrame.toLong
    assert(got === Set(
      (1L, 0L, 0L, 0L, 1L, f),
      (1L, 1L, 2L, 2L, 1L, f),
      (2L, 0L, 0L, 1L, 2L, 2 * f)))
  }

  test("q196 VAD: a short tail frame below threshold ends the segment") {
    // 64 active bytes + a 4-byte tail ('eeee' -> energy 4 < 18):
    // exactly one 1-frame segment covering frame 0 only
    val dir = java.nio.file.Files.createTempDirectory("vad2").toString
    Seq((7L, "e" * MultimodalOps.VadFrame + "eeee", "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = MultimodalOps.q196AudioVad(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((0L, 0L, 0L, 1L)))
  }
}
