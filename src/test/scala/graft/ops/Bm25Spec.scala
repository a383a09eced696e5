package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q182 BM25 semantics beyond the oracle hash: rank contiguity, and
  * the idf ordering a retrieval engine must honor (rare terms
  * dominate common ones). */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ranks are contiguous from 1 and capped at K per query") {
    val rows = TextOps.q182Bm25TopK(spark, TestSpark.sfDir)
      .select("query_id", "rank").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (q, rks) =>
      assert(rks == (1L to rks.length.toLong), s"$q ranks: $rks")
      assert(rks.length <= TextOps.Q182K)
    }
  }

  test("the rare term dominates: dup_scan's top docs all contain 'dup'") {
    // 'dup' df ~5% vs 'scan' df ~80%: the odds-idf makes any
    // dup-bearing doc outscore every scan-only doc, so as long as >=K
    // docs contain 'dup', the whole top-K must
    val docsWithDup = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .filter(array_contains(split(lower(trim(col("text"))), "\\s+"), "dup"))
      .select("doc_id").as[Long].collect().toSet
    val top = TextOps.q182Bm25TopK(spark, TestSpark.sfDir)
      .filter(col("query_id") === "dup_scan")
      .select("doc_id").as[Long].collect()
    assert(top.nonEmpty)
    if (docsWithDup.size >= top.length)
      top.foreach(d => assert(docsWithDup.contains(d),
        s"scan-only doc $d outranked a dup-bearing doc"))
  }

  test("per-term integer scores recompute exactly for the top hit") {
    // independent scalar replay of the BM25 formula for one (query,
    // doc) pair, against the query's emitted score
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        split(lower(trim(col("text"))), "\\s+").as("toks"))
      .as[(Long, Seq[String])].collect()
    val nDocs = docs.length.toLong
    val tTokens = docs.map(_._2.length.toLong).sum
    val top = TextOps.q182Bm25TopK(spark, TestSpark.sfDir)
      .filter(col("query_id") === "hash_join" && col("rank") === 1)
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().head
    val terms = TextOps.Q182Queries.toMap.apply("hash_join")
    val byDoc = docs.toMap
    val dl = byDoc(top._1).length.toLong
    val expected = terms.map { t =>
      val tf = byDoc(top._1).count(_ == t).toLong
      if (tf == 0) 0L
      else {
        val df = docs.count(_._2.contains(t)).toLong
        val num = BigInt(2 * nDocs - 2 * df + 1) * 22 * tTokens * tf * 1000000L
        val den = BigInt(2 * df + 1) *
          (10 * tTokens * tf + 3 * tTokens + 9 * dl * nDocs)
        (num / den).toLong
      }
    }.sum
    assert(expected == top._2, s"replayed $expected vs emitted ${top._2}")
  }
}
