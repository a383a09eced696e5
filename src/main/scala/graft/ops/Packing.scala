package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => TF}

/** Context-window packing operators: turning a document corpus into
  * fixed-capacity training sequences.
  *
  * q59 models GPT-style concat-then-chunk packing: documents in
  * doc_id order form one conceptual token stream cut every
  * `PackCapacity` tokens; each doc learns which training sequence it
  * starts in, at what offset, and whether it crosses a boundary.
  * q60 models overlapped chunking: each document split into
  * `ChunkSize`-token windows every `ChunkStride` tokens (retrieval /
  * long-doc training prep).
  */
object Packing {

  val PackCapacity = 2048L

  /** q59: the global token prefix-sum gives every doc its start
    * position in the concatenated stream; seq_id/offset follow by
    * integer div/mod. A global window (ORDER BY doc_id, no partition)
    * would funnel the corpus through ONE task, so the cumsum runs as a
    * two-phase distributed prefix sum instead:
    *   1. block-local cumsum, hash-partitioned on block = doc_id /
    *      blockSize (blockSize sized from the doc_id range so block
    *      count stays a few × shuffle parallelism at any id density);
    *   2. block totals (one row per block — thousands, not billions)
    *      prefix-summed on one task and broadcast back as offsets.
    * Integer addition is exact and commutative, so blocking does not
    * change the result — the oracle is a plain single-stream cumsum. */
  def q59SequencePack(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    sequencePack(docs.select(col("doc_id"),
      size(TF.wsTokens(col("text"))).cast("long").as("n_tok")))
  }

  /** Core packing over any (doc_id, n_tok) frame — exposed so the
    * property suite can drive it with generated token counts. */
  def sequencePack(toks: DataFrame): DataFrame = {
    val spark = toks.sparkSession
    // size blocks from the doc_id RANGE, not the row count: block =
    // doc_id / blockSize, so a count-derived size under sparse ids
    // (snowflake-style, gaps) would put ~every doc in its own block
    // and collapse phase 2 into the single-task global window this
    // design exists to avoid. Range-derived sizing keeps block count
    // ≈ 4× parallelism for ANY id density; ids clustered within the
    // range just make some blocks empty (harmless).
    val bounds = toks.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val span = if (bounds.isNullAt(0)) 1L
      else bounds.getLong(1) - bounds.getLong(0) + 1
    val parallelism = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val blockSize = math.max(1L, math.ceil(span.toDouble / (4.0 * parallelism)).toLong)
    val blocked = toks.withColumn("block",
      floor(col("doc_id") / lit(blockSize)).cast("long"))
    val wIn = Window.partitionBy(col("block")).orderBy(col("doc_id"))
    val local = blocked.withColumn("local_cum", sum(col("n_tok")).over(wIn))
    val blockTotals = blocked.groupBy(col("block"))
      .agg(sum(col("n_tok")).as("btot"))
    val wB = Window.orderBy(col("block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blockTotals
      .withColumn("boffset", coalesce(sum(col("btot")).over(wB), lit(0L)))
      .select(col("block"), col("boffset"))
    local.join(broadcast(offsets), "block")
      .withColumn("start", col("boffset") + col("local_cum") - col("n_tok"))
      .select(col("doc_id"), col("n_tok"),
        expr(s"start DIV $PackCapacity").as("seq_id"),
        (col("start") % PackCapacity).as("offset"),
        ((col("start") % PackCapacity) + col("n_tok") > PackCapacity)
          .as("spans_boundary"))
  }

  val q59Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tok
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, n_tok,
       |    CAST(sum(n_tok) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS BIGINT) AS start
       |  FROM t)
       |SELECT doc_id, n_tok,
       |  CAST(start // $PackCapacity AS BIGINT) AS seq_id,
       |  CAST(start % $PackCapacity AS BIGINT) AS "offset",
       |  (start % $PackCapacity) + n_tok > $PackCapacity AS spans_boundary
       |FROM c""".stripMargin

  val ChunkSize = 64
  val ChunkStride = 48 // 16-token overlap between consecutive chunks

  /** q60: overlapped fixed-window chunking — each doc's token array
    * cut into `ChunkSize`-token windows starting every `ChunkStride`
    * tokens (the trailing window may be shorter). A pure per-row
    * explode: narrow, no shuffle, scales linearly with input splits.
    * Chunk text is emitted as an md5 (chunks are corpus-sized ×
    * overlap — a pipeline materializing them would write them sharded,
    * not carry them through a compare). */
  def q60Chunk(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    docs
      .select(col("doc_id"), TF.wsTokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("n_tok"),
        explode(sequence(lit(1), size(col("w")), lit(ChunkStride)))
          .as("chunk_start"))
      .select(col("doc_id"),
        ((col("chunk_start") - 1) / ChunkStride).cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(col("n_tok") - col("chunk_start") + 1, lit(ChunkSize.toLong))
          .as("chunk_len"),
        md5(concat_ws(" ", slice(col("w"), col("chunk_start"), lit(ChunkSize))))
          .as("chunk_md5"))
  }

  val q60Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
       |  FROM documents)
       |SELECT doc_id,
       |  CAST((s - 1) // $ChunkStride AS BIGINT) AS chunk_idx,
       |  CAST(s AS BIGINT) AS chunk_start,
       |  CAST(least(len(w) - s + 1, $ChunkSize) AS BIGINT) AS chunk_len,
       |  md5(array_to_string(list_slice(w, s, s + ${ChunkSize - 1}), ' ')) AS chunk_md5
       |FROM t, LATERAL (SELECT unnest(generate_series(1, len(w), $ChunkStride)) AS s) g""".stripMargin

  val NumShards = 8

  /** q78: token-balanced shard assignment — distributing a corpus over
    * training-data shards so every shard carries a near-equal token
    * budget (what a dataloader wants; naive doc-count sharding skews
    * token counts badly on heavy-tailed corpora). Longest-processing-
    * time order: rank docs by (tokens DESC, doc_id), deal rank r to a
    * shard in boustrophedon (snake) order — pass r/N alternates
    * direction so the "big doc" end of each pass rotates. The global
    * rank runs through [[Rank.groupRank]]'s driver-side bucket prefix
    * sum — NO corpus-sized global window task anywhere (the same
    * discipline as q59's packing positions). */
  def q78ShardAssign(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("_neg", -col("n_tokens"))
    // snake via one integer mod (r mod 2N folds back past N) — no
    // true-division double in the path
    val fold = col("_r") % lit(2L * NumShards)
    Rank.groupRank(toks, Seq.empty, "_neg", Seq("doc_id"), "_r", "_cnt")
      .withColumn("shard_id",
        when(fold < NumShards, fold).otherwise(lit(2L * NumShards - 1) - fold))
      .select(col("doc_id"), col("n_tokens"), col("shard_id"))
  }

  val q78Oracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, n_tokens,
       |    row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) - 1 AS r
       |  FROM t)
       |SELECT doc_id, n_tokens,
       |  CAST(CASE WHEN r % ${2 * NumShards} < $NumShards THEN r % ${2 * NumShards}
       |       ELSE ${2 * NumShards - 1} - r % ${2 * NumShards} END AS BIGINT) AS shard_id
       |FROM r""".stripMargin
}
