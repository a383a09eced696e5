package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fixed-size probabilistic sketches next to the HLL family (q30/q49):
  * a count-min sketch for heavy-hitter frequency estimation (q80) and
  * a Bloom-filter semi-join prune (q81).
  *
  * Both sketches are built from md5-derived hash positions (the same
  * Horner-nibble trick as `Curation.hllRegisterSql`), so DuckDB can
  * rebuild the identical sketch and the oracle compare is bit-exact —
  * not rows-only. The same SQL text is fed to Spark (`expr`, `instr`)
  * and DuckDB (`strpos`); only the position-function name differs.
  *
  * Scale shape: a sketch is the O(1)-state answer to a corpus-scale
  * question. The CMS is a single map-side-combinable aggregation into
  * depth×width cells (here 4×256 = 1 KiB of state on a 100 TB corpus);
  * the Bloom filter is 4096 bits built from the small key set and
  * applied as a broadcast-free scan predicate — rows that fail it never
  * reach the exchange, which is exactly what Spark's own runtime
  * bloom-filter join does, made deterministic and oracle-checkable.
  * Reference analog: the curation-pipeline membership/frequency checks
  * (aw_silver_layer_sales dedup guards); re-expressed as sketches
  * because at 100 TB the exact structures don't fit.
  */
object Sketches {

  /** `posFn('0123456789abcdef', nibble) - 1` — hex nibble at 1-based
    * position `j` of an md5-hex expression, as an integer 0..15. Same
    * text in both engines; only the position function differs (Spark
    * `instr`, DuckDB `strpos`). */
  private def nibAt(posFn: String, hex: String, j: Int): String =
    s"($posFn('0123456789abcdef', substring($hex, $j, 1)) - 1)"

  // ---------------------------------------------------------------- CMS

  val CmsDepth = 4 // hash rows
  val CmsWidth = 256 // buckets per row (2 md5 nibbles, mod-free)

  /** One digest feeds every CMS row: bucket of row `j` is nibbles
    * 2j+1, 2j+2 of md5("cms_" || key) → 0..255. Distinct nibble ranges
    * of one md5 serve as the d hash functions (the Kirsch–Mitzenmacher
    * style of deriving a hash family from one digest) — measured 4×
    * cheaper than four independent md5 calls per token, and the
    * overestimate bound still holds per-row. Width 256 = exactly two
    * nibbles, so there is no modulo and no bias. */
  def cmsHexSql(key: String): String = s"md5(concat('cms_', $key))"

  private def cmsBucketSql(j: Int, hex: String, posFn: String): String =
    s"(${nibAt(posFn, hex, 2 * j + 1)} * 16 + ${nibAt(posFn, hex, 2 * j + 2)})"

  /** q80: count-min-sketch heavy hitters over the corpus token stream.
    * Build the 4×256 sketch in ONE partially-aggregated pass (each cell
    * is a count — commutative, so map-side combine does almost all the
    * work and the exchange carries ≤ depth×width rows per partition),
    * then estimate every distinct token's frequency as the min over its
    * 4 row-buckets. The exact per-token count rides along as the
    * yardstick column — the CMS ≥ exact overestimate guarantee is
    * asserted in SketchesSpec and visible in the output.
    *
    * At 100 TB the sketch build is the only full-data pass and its
    * state is 1 KiB regardless of corpus size; the exact-count column
    * is the demonstration baseline (a real deployment queries the
    * sketch directly for candidate keys). */
  /** The 4×256 cell counts from a token-occurrence frame (`tok`
    * column) — ≤ 1024 cells whatever the corpus size. Shared by batch
    * q80 and the streaming twin ([[graft.streaming.SketchStream
    * .cmsSketch]]): count is a mergeable monoid, so the identical
    * declarative aggregate runs incrementally on a stream. */
  def cmsCells(toks: DataFrame): DataFrame = {
    // digest once per occurrence; all four row-buckets read nibbles of it
    val buckets = array((0 until CmsDepth).map(j =>
      expr(cmsBucketSql(j, "h", "instr"))): _*)
    toks.withColumn("h", expr(cmsHexSql("tok")))
      .select(col("tok"), posexplode(buckets).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("bucket_cnt"))
  }

  def q80HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.wsTokens(col("text"))).as("tok"))
    val buckets = array((0 until CmsDepth).map(j =>
      expr(cmsBucketSql(j, "h", "instr"))): _*)
    // CMS is a LINEAR sketch: cell (j,b) = Σ exact_cnt over the tokens
    // hashing there — so both the sketch and the yardstick derive from
    // ONE per-token aggregate. The corpus is scanned and the token
    // stream shuffled exactly once (map-side combined), the md5 runs
    // per DISTINCT token instead of per occurrence, and the persisted
    // frame is vocabulary-sized (scale-safe; released by the
    // consumer's clearCache). The per-occurrence build stays in
    // [[cmsCells]], which the streaming twin needs — a stream can't
    // wait for final exact counts.
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
      .persist()
    val occ = exact
      .withColumn("h", expr(cmsHexSql("tok")))
      .select(col("tok"), col("exact_cnt"), posexplode(buckets).as(Seq("j", "bucket")))
    val sketch = occ.groupBy(col("j"), col("bucket"))
      .agg(sum(col("exact_cnt")).as("bucket_cnt"))
    occ
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(col("tok"), col("exact_cnt"))
      .agg(min(col("bucket_cnt")).as("est_cnt"))
      .select(col("tok"), col("exact_cnt"), col("est_cnt"))
  }

  val q80Oracle: String = {
    val bucket = {
      // j is a column here (unnest), not a literal — nibble positions
      // 2j+1 and 2j+2 of the same single digest
      val h = "md5(concat('cms_', tok))"
      s"(strpos('0123456789abcdef', substring($h, 2 * j + 1, 1)) - 1) * 16" +
        s" + (strpos('0123456789abcdef', substring($h, 2 * j + 2, 1)) - 1)"
    }
    s"""WITH toks AS (
       |  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
       |  FROM documents
       |), occ AS (
       |  SELECT tok, j, $bucket AS bucket
       |  FROM toks, (SELECT unnest([0, 1, 2, 3]) AS j) js
       |), sketch AS (
       |  SELECT j, bucket, count(*) AS bucket_cnt FROM occ GROUP BY 1, 2
       |), ex AS (
       |  SELECT tok, count(*) AS exact_cnt FROM toks GROUP BY 1
       |), tb AS (
       |  SELECT DISTINCT tok, j, bucket FROM occ
       |)
       |SELECT tok, exact_cnt, min(bucket_cnt) AS est_cnt
       |FROM tb JOIN sketch USING (j, bucket) JOIN ex USING (tok)
       |GROUP BY tok, exact_cnt""".stripMargin
  }

  // -------------------------------------------------------------- Bloom

  val BloomBits = 4096 // 64 longs; 3 nibbles index it exactly
  val BloomHashes = 3
  /** Flagged = users whose exact purchase total (in integer cents — the
    * `Exact` pattern: a double sum could flip membership at the
    * threshold between partitionings/engines, an integer sum cannot)
    * exceeds this. */
  val SpendThresholdCents = 90000L

  /** One digest per key feeds every Bloom probe: bit position of hash
    * `i` is nibbles 3i+1..3i+3 of md5("bf_" || key) → 0..4095 —
    * BloomBits is 16³ so three nibbles index the filter with no modulo,
    * and 3 probes consume 9 of the 32 digest nibbles. */
  def bloomHexSql(keyExpr: String): String = s"md5(concat('bf_', $keyExpr))"

  private def bloomPosSql(i: Int, hex: String, posFn: String): String =
    s"((${nibAt(posFn, hex, 3 * i + 1)} * 16 + ${nibAt(posFn, hex, 3 * i + 2)}) * 16" +
      s" + ${nibAt(posFn, hex, 3 * i + 3)})"

  /** The flagged key set: big spenders by exact integer-cent total. */
  private def flaggedUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(round(value * 100.0) AS BIGINT)")).as("spend_cents"))
      .filter(col("spend_cents") > SpendThresholdCents)
      .select(col("user_id"))

  /** The 64-word bit array for a key DataFrame — a distributed build
    * (explode k positions, OR per word) collapsed to a fixed 512-byte
    * driver-side array. The collect is sketch-sized (≤ 64 rows), not
    * data-sized — the same budget as CorrDedup's 256-cell statistics. */
  def bloomBits(keys: DataFrame, keyExpr: String): Array[Long] = {
    val posArr = array((0 until BloomHashes).map(i =>
      expr(bloomPosSql(i, "_h", "instr"))): _*)
    val words = keys
      .withColumn("_h", expr(bloomHexSql(keyExpr)))
      .select(explode(posArr).as("p"))
      .select(expr("p div 64").as("word"), expr("shiftleft(1L, p % 64)").as("mask"))
      .groupBy(col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
      .collect()
    val bits = new Array[Long](BloomBits / 64)
    // SQL `div` yields BIGINT whatever its operands
    words.foreach(r => bits(r.getAs[Long]("word").toInt) = r.getAs[Long]("bits"))
    bits
  }

  /** SQL predicate over a digest column: all `BloomHashes` bits set in
    * `bits`. `hexExpr` is the `bloomHexSql` digest (compute it once in
    * a projection; the probes only read nibbles of it). */
  def bloomHitSql(bits: Array[Long], hexExpr: String): String = {
    val arr = bits.mkString("array(", "L, ", "L)")
    (0 until BloomHashes).map { i =>
      val p = bloomPosSql(i, hexExpr, "instr")
      // SQL div yields BIGINT; element_at wants an INT index
      s"((element_at($arr, CAST(($p div 64) + 1 AS INT)) & shiftleft(1L, $p % 64)) <> 0)"
    }.mkString("(", " AND ", ")")
  }

  /** q81: Bloom-pruned semi-join — click activity of the flagged big
    * spenders. The click scan is filtered by the 4096-bit Bloom
    * predicate BEFORE the exchange, so at 100 TB only the (tiny)
    * bloom-positive fraction of the fact table shuffles; the exact
    * left_semi join then kills the false positives, which is why the
    * result is exact and the oracle is a plain semi-join. This is
    * Spark's own runtime bloom-filter pushdown made explicit,
    * deterministic, and engine-portable. The two driver-side actions
    * (flagged-set aggregation + 64-row bit collect) are sketch-sized,
    * independent of corpus scale. */
  def q81BloomPrune(spark: SparkSession, dir: String): DataFrame = {
    val flagged = flaggedUsers(spark, dir).persist()
    val bits = bloomBits(flagged, "CAST(user_id AS STRING)")
    val clicks = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "click")
      .withColumn("_h", expr(bloomHexSql("CAST(user_id AS STRING)")))
      .filter(expr(bloomHitSql(bits, "_h")))
      .drop("_h")
    clicks
      .join(flagged, Seq("user_id"), "left_semi")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(expr("CAST(round(value * 100.0) AS BIGINT)")).as("click_cents"))
  }

  val q81Oracle: String =
    s"""WITH flagged AS (
       |  SELECT user_id
       |  FROM events
       |  WHERE event_type = 'purchase'
       |  GROUP BY user_id
       |  HAVING sum(CAST(round(value * 100.0) AS BIGINT)) > $SpendThresholdCents
       |)
       |SELECT user_id, count(*) AS n_clicks,
       |  CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS click_cents
       |FROM events
       |WHERE event_type = 'click'
       |  AND user_id IN (SELECT user_id FROM flagged)
       |GROUP BY user_id""".stripMargin
}
