package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Bitmap-index presence algebra: the OLAP secondary-index structure
  * (Oracle bitmap indexes, Druid/Pinot/Lucene roaring bitmaps)
  * expressed as a Spark aggregate — docs-containing-term as packed
  * 64-bit words keyed by (term, doc-block), boolean query evaluation
  * as bitwise AND/OR + popcount over co-partitioned blocks.
  *
  * Why this representation wins at 100 TB: a term's presence set
  * compresses from one row per (term, doc) to one LONG per 64 docs
  * (plus roaring-style run/array containers in a real store), and a
  * conjunctive query "docs with A AND B" never touches the corpus —
  * it joins two block-keyed bitmap slices and popcounts, work
  * proportional to the DENSER term's block count, not the corpus.
  * The build is one distinct + one `bit_or` aggregate, both
  * map-side-combinable; evaluation is an equi-join per pair on the
  * block key. Everything is integer-exact, so the oracle can verify
  * the bitmap algebra against plain distinct-doc counting — the two
  * evaluation strategies agreeing IS the test.
  *
  * Reference anchor: the term-presence shape of the reference's token
  * filters (documents table, TESTDATA.md); popcount-over-packed-longs
  * follows q75/q122's packed-long id discipline.
  */
object BitmapIndex {

  /** The indexed vocabulary — fixed, as a real bitmap index is built
    * per chosen low-cardinality column values. */
  val IndexTerms: Seq[String] = Seq("fast", "slow", "table", "hash")

  /** (term, block, word) bitmap slices: bit (doc_id mod 64) of block
    * (doc_id div 64) is set iff the doc contains the term. */
  def termBitmaps(docs: DataFrame): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    docs
      .select(col("doc_id"), explode(TF.wsTokens(col("text"))).as("term"))
      .filter(col("term").isin(IndexTerms: _*))
      .distinct()
      .groupBy(col("term"), expr("doc_id div 64").as("blk"))
      .agg(expr("bit_or(shiftleft(1L, cast(doc_id % 64 AS INT)))").as("word"))
  }

  /** q199: every ordered term pair's conjunction and disjunction
    * cardinality, evaluated ENTIRELY on the bitmap index. */
  def q199BitmapIndex(spark: SparkSession, dir: String): DataFrame = {
    val bm = termBitmaps(Tables.load(spark, dir, "documents")).persist()
    val sorted = IndexTerms.sorted
    val pairs = for {
      i <- sorted.indices; j <- sorted.indices if i < j
    } yield (sorted(i), sorted(j))
    pairs.map { case (a, b) =>
      bm.filter(col("term") === a).select(col("blk"), col("word").as("wa"))
        .join(bm.filter(col("term") === b).select(col("blk"), col("word").as("wb")),
          Seq("blk"), "full_outer")
        .agg(
          coalesce(sum(bit_count(
            coalesce(col("wa"), lit(0L)).bitwiseAND(coalesce(col("wb"), lit(0L))))
            .cast("long")), lit(0L)).as("and_count"),
          coalesce(sum(bit_count(
            coalesce(col("wa"), lit(0L)).bitwiseOR(coalesce(col("wb"), lit(0L))))
            .cast("long")), lit(0L)).as("or_count"))
        .select(lit(a).as("term_a"), lit(b).as("term_b"),
          col("and_count"), col("or_count"))
    }.reduce(_.unionAll(_))
  }

  /** The oracle evaluates the same queries WITHOUT the index: plain
    * distinct-presence joins — bitmap algebra ≡ set algebra. */
  val q199Oracle: String = {
    val inList = IndexTerms.map(t => s"'$t'").mkString(", ")
    val values = IndexTerms.sorted.map(t => s"('$t')").mkString(", ")
    // Pairs come from the fixed IndexTerms vocabulary (not terms present
    // in this corpus) so a term absent from a sparse corpus still yields
    // its (0, 0) rows — matching the Spark side, which always emits one
    // row per vocabulary pair.
    s"""WITH terms(term) AS (VALUES $values
       |), pres AS (
       |  SELECT DISTINCT doc_id, term FROM (
       |    SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS term
       |    FROM documents)
       |  WHERE term IN ($inList)
       |), cnt AS (
       |  SELECT term, count(*) AS n FROM pres GROUP BY 1
       |), andc AS (
       |  SELECT a.term AS ta, b.term AS tb, count(*) AS n_and
       |  FROM pres a JOIN pres b
       |    ON a.doc_id = b.doc_id AND a.term < b.term
       |  GROUP BY 1, 2)
       |SELECT ta.term AS term_a, tb.term AS term_b,
       |  CAST(coalesce(x.n_and, 0) AS BIGINT) AS and_count,
       |  CAST(coalesce(ca.n, 0) + coalesce(cb.n, 0) - coalesce(x.n_and, 0)
       |    AS BIGINT) AS or_count
       |FROM terms ta JOIN terms tb ON ta.term < tb.term
       |LEFT JOIN cnt ca ON ca.term = ta.term
       |LEFT JOIN cnt cb ON cb.term = tb.term
       |LEFT JOIN andc x ON x.ta = ta.term AND x.tb = tb.term""".stripMargin
  }
}
