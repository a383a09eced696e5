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

  test("q198 phrase search: adjacency in order, overlaps, no false bigrams") {
    // doc 1: two hits ("table hash ... table hash"); doc 2: strictly
    //   reversed order -> no hit; doc 3: words present but separated ->
    //   no hit; doc 4: hit at position 0; doc 5: triple "table table
    //   hash" -> exactly one hit at pos 1
    val dir = java.nio.file.Files.createTempDirectory("phrase").toString
    Seq(
      (1L, "a table hash b table hash", "s"),
      (2L, "hash table x hash table", "s"),
      (3L, "table b hash table c hash", "s"),
      (4L, "table hash", "s"),
      (5L, "table table hash", "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.q198PhraseSearch(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 1L), (4L, 1L, 0L), (5L, 1L, 1L)))
  }

  test("q198 real-corpus hits replay against a substring scan") {
    // single-spaced corpus: phrase occurrences == non-overlapping
    // window scan over the token array
    val phrase = TextOps.PhraseTerms
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val want = docs.flatMap { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+")
      val hits = toks.indices.filter(i =>
        i + phrase.length <= toks.length &&
          phrase.indices.forall(j => toks(i + j) == phrase(j)))
      if (hits.isEmpty) None
      else Some((id, hits.length.toLong, hits.min.toLong))
    }.toSet
    val got = TextOps.q198PhraseSearch(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want && got.nonEmpty)
  }
}
