package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** q107: cross-document duplicate SPAN detection — the
  * exact-substring flavor of training-data dedup (the operation
  * popularized for LLM corpora as "ExactSubstr": remove verbatim
  * passages repeated across documents, even when the documents as a
  * whole are unique). Where q17/q19 decide at document granularity and
  * q46 counts shared n-grams across split boundaries, this reports the
  * maximal duplicated token RANGES inside each document:
  *
  *   1. tokenize (the shared q32/q46 whitespace contract) and emit
  *      every word [[K]]-gram with its 0-based start position;
  *   2. a gram is duplicated iff it occurs in ≥ 2 distinct documents
  *      (within-document repetition is q47's business, not a dup);
  *   3. per document, merge duplicated gram starts whose K-token
  *      windows overlap or touch (gap in start positions ≤ K) into
  *      maximal spans — the gaps-and-islands pattern.
  *
  * Scale shape: the gram table shuffles once on the 128-bit gram hash
  * to find cross-document repeats (an inverted-index build, like q74);
  * the semi-join back prunes to duplicated positions before any
  * windowing; and the island windows partition by doc_id, so no task
  * ever sorts more than one document's positions — bounded by document
  * length, independent of corpus size. Nothing here is quadratic: a
  * phrase shared by a million documents costs one hash-aggregate row
  * plus its postings, never a pairwise join.
  */
object SpanDedup {

  /** Word-gram width. 5 matches q46's contamination shingles: long
    * enough that English text collides rarely, short enough that real
    * boilerplate is caught. */
  val K = 5

  /** Core operator over any (doc_id, text) frame — q107 binds it to
    * the documents table. Output: one row per maximal duplicated span,
    * (doc_id, span_start, span_end, span_len), positions 0-based
    * token indices, span_end inclusive. */
  def dupSpans(docs: DataFrame, k: Int): DataFrame = {
    // spread: the per-row gram md5 explode is the hot loop, and it is
    // evaluated on both sides of the dup semi-join (Tables.spread)
    val toks = Tables.spread(docs)
      .select(col("doc_id"),
        graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .filter(size(col("w")) >= k)
    val grams = toks.select(col("doc_id"),
      explode(transform(
        sequence(lit(1), size(col("w")) - (k - 1)),
        i => struct((i - lit(1)).cast("long").as("pos"),
          md5(concat_ws(" ",
            (0 until k).map(j => element_at(col("w"), i + lit(j))): _*))
            .as("gh")))).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"), col("g.gh").as("gh"))
    val dup = grams.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("gh"))
    val hits = grams.join(dup, Seq("gh"), "left_semi")
      .select(col("doc_id"), col("pos"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    hits
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") > col("prev") + k, 1)
          .otherwise(0))
      .withColumn("isl",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit((k - 1).toLong)).as("span_end"))
      .withColumn("span_len", col("span_end") - col("span_start") + 1L)
      .select(col("doc_id"), col("span_start"), col("span_end"),
        col("span_len"))
  }

  def q107DupSpans(spark: SparkSession, dir: String): DataFrame =
    dupSpans(Tables.load(spark, dir, "documents"), K)

  val q107Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id,
      |    unnest([{'pos': CAST(i - 1 AS BIGINT),
      |             'gh': md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
      |                       w[i+3] || ' ' || w[i+4])}
      |            for i in generate_series(1, len(w) - 4)], recursive := true)
      |  FROM toks WHERE len(w) >= 5
      |), dup AS (
      |  SELECT gh FROM grams GROUP BY gh HAVING count(DISTINCT doc_id) >= 2
      |), hits AS (
      |  SELECT doc_id, pos FROM grams WHERE gh IN (SELECT gh FROM dup)
      |), marked AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 5
      |         THEN 1 ELSE 0 END AS brk
      |  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos ASC)
      |), isl AS (
      |  SELECT doc_id, pos,
      |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ASC
      |                   ROWS UNBOUNDED PRECEDING) AS isl
      |  FROM marked)
      |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
      |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
      |  CAST(max(pos) + 4 - min(pos) + 1 AS BIGINT) AS span_len
      |FROM isl GROUP BY doc_id, isl""".stripMargin
}
