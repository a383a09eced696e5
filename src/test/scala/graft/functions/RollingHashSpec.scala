package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class RollingHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Mod = RollingHashUtil.Mod

  /** Reference: per-window left fold seeded with the first char code —
    * exactly what the DuckDB oracle recomputes. */
  private def brute(s: String, k: Int): Long = {
    def fold(cs: Seq[Char]): Long =
      cs.tail.foldLeft(cs.head.toLong % Mod)((a, c) => (a * 31 + c) % Mod)
    if (s.isEmpty) 0L
    else if (s.length <= k) fold(s.toSeq)
    else (0 to s.length - k).map(i => fold(s.slice(i, i + k).toSeq)).min
  }

  test("rolling O(n) fingerprint equals brute-force per-window fold") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdefgh ijklmnop"
    for (_ <- 1 to 200) {
      val s = List.fill(rnd.nextInt(60) + 1)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val k = rnd.nextInt(10) + 2
      assert(RollingHashUtil.minWindowHash(UTF8String.fromString(s), k) == brute(s, k), s"s='$s' k=$k")
    }
  }

  test("shifted documents share the min-window fingerprint") {
    val body = "the quick brown fox jumps over the lazy dog again and again"
    val a = UTF8String.fromString(body)
    val b = UTF8String.fromString("PREFIX " + body) // content shifted, windows preserved
    // min over windows of b covers all windows of a, so min(b) <= min(a);
    // near-dup detection uses equality in practice on long docs:
    assert(RollingHashUtil.minWindowHash(b, 8) <= RollingHashUtil.minWindowHash(a, 8))
  }

  test("expression works through the Column API with codegen") {
    import spark.implicits._
    val df = Seq("hello world", "abc", "").toDF("s")
    val got = df.select(RollingMinHash(col("s"), 4).as("fp")).collect().map(_.getLong(0))
    val expect = Seq("hello world", "abc", "").map(s => brute(s, 4))
    assert(got.toSeq == expect)
  }
}
