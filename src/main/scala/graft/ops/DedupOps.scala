package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => TF}

/** Deduplication operators for LLM training-data pipelines.
  *
  * Scale design: the exact path is a single hash-shuffle on the content
  * digest; the near-dup path offers two plans — the inverted-index
  * shingle join (exact Jaccard, quadratic in bucket size — fine when
  * shingles are selective) and MinHash+LSH banding (the 100 TB path:
  * candidate generation is a shuffle on (band, bucket) with O(docs ×
  * bands) rows, and only candidates pay the exact-Jaccard verify).
  */
object DedupOps {

  val NumHashes = 32
  val Bands = 8
  val RowsPerBand = 4 // NumHashes / Bands
  val JaccardThreshold = 0.5

  /** doc_id → distinct word-3-gram shingles (docs with ≥3 tokens). */
  def shingleDf(docs: DataFrame): DataFrame = {
    val w = TF.wsTokens(col("text"))
    docs
      .filter(size(w) >= 3)
      .select(col("doc_id"), explode(TF.shingles3(w)).as("shingle"))
  }

  /** Exact dedup: group by canonical-content md5; keep the smallest
    * doc_id as the cluster representative. One shuffle on the digest —
    * the only exact-dedup plan that works at corpus scale. */
  def q17DedupExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs
      .select(col("doc_id"), md5(TF.normText(col("text"))).as("content_md5"))
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("cluster_size"))
  }

  val q17Oracle: String =
    """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_md5,
      |  min(doc_id) AS keeper_doc_id,
      |  count(*) AS cluster_size
      |FROM documents GROUP BY 1""".stripMargin

  /** Exact n-gram Jaccard near-dup pairs via inverted shingle index:
    * explode shingles → self-join on shingle → per-pair intersection
    * count → |A∩B| / (|A|+|B|−|A∩B|) ≥ 0.5. Counts are exact integers,
    * so the Jaccard double is deterministic and hash-comparable. */
  def q18NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleDf(Tables.load(spark, dir, "documents")).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id_1"), col("b.doc_id").as("doc_id_2"))
      .agg(count(lit(1)).as("common"))
    jaccardVerify(pairs, sizes)
  }

  /** Shared tail: pair intersection counts + per-doc sizes → jaccard ≥ t. */
  private def jaccardVerify(pairs: DataFrame, sizes: DataFrame): DataFrame =
    pairs
      .join(sizes.as("s1"), col("doc_id_1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("doc_id_2") === col("s2.doc_id"))
      .select(col("doc_id_1"), col("doc_id_2"),
        (col("common") * lit(1.0) /
          (col("s1.n") + col("s2.n") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)

  val jaccardOracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
       |                           for i in generate_series(1, len(w)-2)]) AS shingle
       |    FROM toks WHERE len(w) >= 3)
       |), sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2, count(*) AS c
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_id_1, doc_id_2, c * 1.0 / (s1.n + s2.n - c) AS jaccard
       |FROM pairs
       |JOIN sizes s1 ON doc_id_1 = s1.doc_id
       |JOIN sizes s2 ON doc_id_2 = s2.doc_id
       |WHERE c * 1.0 / (s1.n + s2.n - c) >= $JaccardThreshold""".stripMargin

  /** MinHash signature columns mh0..mh{n-1}: per-hash min of seeded
    * xxhash64 over the doc's shingle set. */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val mins = (0 until NumHashes)
      .map(j => min(xxhash64(lit(j), col("shingle"))).as(s"mh$j"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** (doc_id, band, bucket) rows: bucket = hash of the band's minhash
    * slice. Shuffling on (band, bucket) is the LSH candidate plan. */
  def lshBands(signatures: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { b =>
      val slice = (b * RowsPerBand until (b + 1) * RowsPerBand).map(j => col(s"mh$j"))
      struct(lit(b).as("band"), xxhash64(lit(b) +: slice: _*).as("bucket"))
    }
    signatures
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** MinHash+LSH near-dup detection, exact-verified: signatures → band
    * buckets → candidate pairs (share ≥1 bucket) → exact Jaccard ≥ 0.5.
    * With 32 hashes / 8 bands, a 0.98-similar pair is missed with
    * probability (1−0.98⁴)⁸ ≈ 1e-9, so the verified output equals the
    * exhaustive q18 result — which is exactly what the oracle asserts. */
  def q19MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleDf(Tables.load(spark, dir, "documents")).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val bands = lshBands(minhashSignatures(sh))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_id_1"), col("y.doc_id").as("doc_id_2"))
      .distinct()
    val pairs = cand
      .join(sh.as("s1"), col("doc_id_1") === col("s1.doc_id"))
      .join(sh.as("s2"),
        col("doc_id_2") === col("s2.doc_id") && col("s1.shingle") === col("s2.shingle"))
      .groupBy(col("doc_id_1"), col("doc_id_2"))
      .agg(count(lit(1)).as("common"))
    jaccardVerify(pairs, sizes)
  }

  /** 64-bit SimHash over whitespace tokens (xxhash64 token hashes,
    * ±1 votes per bit, sign → bit). Emitted with a 16-bit prefix bucket:
    * near-dups differ in few bits, so prefix-bucketing gives a cheap
    * blocking key. Not SQL-expressible in the oracle (xxhash64) →
    * rows-only check; semantics covered by DedupSpec. */
  def q20Simhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val tok = docs.select(col("doc_id"),
      explode(TF.wsTokens(col("text"))).as("token"))
    val h = xxhash64(col("token"))
    val votes = (0 until 64).map { i =>
      sum(when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$i")
    }
    val bits = (0 until 64).map { i =>
      when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        bits.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
      .withColumn("prefix_bucket", shiftrightunsigned(col("simhash"), 48))
  }
}
