package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q83 BPE merge training: hand-traced merges on a synthetic corpus
  * (including the left-to-right non-overlap rule and early exhaustion),
  * plus the full-corpus shape check. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bpeTrain reproduces the hand-computed merge sequence and stops when exhausted") {
    // words: aaab ×2, ab ×3
    // r1: pairs (a,a)=4, (a,b)=5            → merge (a,b,5);  aaab→"a a ab", ab→"ab"
    // r2: pairs (a,a)=2, (a,ab)=2 — tie, rhs "a" < "ab" → (a,a,2); → "aa ab"
    // r3: pairs (aa,ab)=2                    → (aa,ab,2);      → "aaab"
    // r4: no adjacent pairs left             → stop (3 rows, not 6)
    val wc = Seq(("aaab", 2L), ("ab", 3L)).toDF("word", "cnt")
    val got = TextOps.bpeTrain(wc, 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "b", 5L), (2, "a", "a", 2L), (3, "aa", "ab", 2L)))
  }

  test("non-overlap fold: aaa merges to (aa, a), not (aa, aa-phantom)") {
    // "a a a" with merge (a,a) must produce "aa a" — the fused symbol
    // no longer equals the left part, so the third a is NOT re-merged
    val wc = Seq(("aaa", 1L)).toDF("word", "cnt")
    val got = TextOps.bpeTrain(wc, 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", "a", 2L))) // two overlapping (a,a) pairs both counted
  }

  test("q83 trains the full merge budget on the corpus") {
    val rows = TextOps.q83BpeMerges(spark, TestSpark.sfDir).collect()
    assert(rows.length == TextOps.BpeMerges)
    // ranks are 1..n and every merged symbol is the concat of its parts
    assert(rows.map(_.getInt(0)).toSeq == (1 to TextOps.BpeMerges).toSeq)
    rows.foreach(r => assert(r.getLong(3) > 0))
  }

  test("q93 encodings concatenate back to their words and shrink token counts") {
    val rows = TextOps.q93BpeEncode(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (word, tokens, n, cnt) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      // lossless: tokens concatenated without separators = the word
      assert(tokens.split(" ").mkString == word, s"word=$word tokens=$tokens")
      assert(tokens.split(" ").length.toLong == n)
      assert(n >= 1 && n <= word.length && cnt > 0)
    }
    // the trained merges actually fire: some word encodes to fewer
    // symbols than its character count
    assert(rows.exists(r => r.getLong(2) < r.getString(0).length))
  }
}
