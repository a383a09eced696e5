package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SpanDedup.dupSpans semantics on crafted corpora (span extent, island
  * merging, the within-document-repetition exclusion) plus structural
  * invariants on real data. K=3 in the crafted cases keeps phrases
  * readable; the registered q107 uses K=5.
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spansOf(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long, Long)] =
    SpanDedup.dupSpans(docs.toDF("doc_id", "text"), k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("a shared phrase yields one maximal span in each document") {
    // the 5-token phrase "a b c d e" is shared; k=3 grams at starts
    // 1,2,3 of doc 1 merge into one island
    val docs = Seq(
      (1L, "x a b c d e y"),
      (2L, "a b c d e"))
    val got = spansOf(docs, 3)
    assert(got == Set((1L, 1L, 5L, 5L), (2L, 0L, 4L, 5L)))
  }

  test("disjoint shared phrases stay separate islands") {
    // doc 1 shares "p q r" with doc 2 and "u v w" with doc 3, separated
    // by a gap wider than k
    val docs = Seq(
      (1L, "p q r junk1 junk2 junk3 junk4 u v w"),
      (2L, "zz p q r zz2"),
      (3L, "u v w tail1 tail2"))
    val got = spansOf(docs, 3)
    assert(got == Set(
      (1L, 0L, 2L, 3L), (1L, 7L, 9L, 3L),
      (2L, 1L, 3L, 3L),
      (3L, 0L, 2L, 3L)))
  }

  test("repetition inside a single document is not a duplicate span") {
    val docs = Seq(
      (1L, "m n o m n o m n o"),
      (2L, "totally different words here"))
    assert(spansOf(docs, 3).isEmpty)
  }

  test("touching grams merge; a gap of exactly k+1 starts a new span") {
    // doc1/doc2 share "a b c" (start 0) and "e f g" (start 4): gap 4 =
    // k+1 > k ⇒ two spans, adjacent-but-distinct ranges [0,2] [4,6]
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c x e f g"))
    val got = spansOf(docs, 3)
    assert(got == Set(
      (1L, 0L, 2L, 3L), (1L, 4L, 6L, 3L),
      (2L, 0L, 2L, 3L), (2L, 4L, 6L, 3L)))
  }

  test("real corpus: spans are well-formed, disjoint, and ≥ K long") {
    val got = SpanDedup.q107DupSpans(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty) // the synthetic corpus contains repeated phrases
    assert(got.forall { case (_, s, e, l) => l == e - s + 1 && l >= SpanDedup.K })
    // maximality: spans of one doc are separated by > K start positions
    got.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, s1, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1 + 1, s"overlapping/touching spans at doc start $s1")
        case _ =>
      }
    }
  }
}
