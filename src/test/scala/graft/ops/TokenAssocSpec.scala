package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q116 χ² token–source association: driver-side exact replay of the
  * contingency math and the top-k-per-source selection.
  */
class TokenAssocSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q116 matches a driver-side exact contingency replay") {
    val got = TextOps.q116TokenAssoc(spark, TestSpark.sfDir)
      .as[(String, Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.nonEmpty)

    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("source"), lower(trim(col("text"))))
      .as[(Long, String, String)].collect()
    val n = BigInt(docs.length)
    val bySource = docs.groupBy(_._2).view.mapValues(d => BigInt(d.length)).toMap
    val pairs = docs.flatMap { case (id, s, t) =>
      t.split("\\s+").distinct.map(tok => (s, tok, id))
    }.distinct
    val rTot = pairs.map(p => (p._2, p._3)).distinct
      .groupBy(_._1).view.mapValues(d => BigInt(d.length)).toMap

    val cells = pairs.groupBy(p => (p._1, p._2)).flatMap { case ((s, tok), ps) =>
      val a = BigInt(ps.length); val r = rTot(tok); val c = bySource(s)
      if (r >= 5 && r < n && a * n > r * c) {
        val adbc = a * (n - r - c + a) - (r - a) * (c - a)
        val chi2 = (n * adbc * adbc).toDouble /
          (r * (n - r) * c * (n - c)).toDouble
        Some((s, tok, a.toLong, r.toLong, chi2))
      } else None
    }.toSeq
    val want = cells.groupBy(_._1).flatMap { case (s, cs) =>
      cs.sortBy(x => (-x._5, x._2)).take(TextOps.AssocTopK).zipWithIndex
        .map { case ((_, tok, a, r, chi2), i) =>
          (s, i + 1L) -> ((s, i + 1L, tok, a, r, chi2)) }
    }
    assert(got == want)
    // ranks are 1..k per source, χ² non-increasing within a source
    got.groupBy(_._1._1).foreach { case (_, rs) =>
      val ordered = rs.toSeq.sortBy(_._1._2).map(_._2)
      assert(ordered.map(_._2) == (1L to ordered.length.toLong))
      ordered.map(_._6).sliding(2).foreach {
        case Seq(x, y) => assert(x >= y)
        case _ =>
      }
    }
  }
}
