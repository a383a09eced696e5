package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded partition-wise.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic fake — but everything Spark-side is
  * real: a binary column, a metadata struct, a typed Dataset, and a
  * `mapPartitions` decode (the Scala analog of `mapInPandas`: one
  * iterator per partition, so a real codec would amortize model/codec
  * init across the batch, and partitions parallelize across executors).
  */
object MultimodalOps {

  /** Decoded frame metadata produced per payload. */
  final case class FrameMeta(
      doc_id: Long, byte_length: Long, frame_width: Long,
      frame_height: Long, channels: Long, byte_checksum: Long, source: String)

  /** STUB DECODER — stands in for a real image decode. Reads the actual
    * payload bytes; the "dimensions" are deterministic functions of the
    * payload so the whole pipeline stays oracle-checkable. A real
    * deployment swaps only this function's body for a codec call. */
  def fakeDecode(docId: Long, payload: Array[Byte], source: String): FrameMeta = {
    val len = payload.length.toLong
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xff); i += 1 }
    FrameMeta(docId, len, len % 625 + 16, (len / 3) % 480 + 16, 3L, sum, source)
  }

  /** documents.text reinterpreted as a binary media payload (UTF-8
    * bytes), decoded via mapPartitions into typed frame metadata. */
  def q23MultimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"), col("source"))
      .as[(Long, Array[Byte], String)]
    payloads
      .mapPartitions(_.map { case (id, bytes, src) => fakeDecode(id, bytes, src) })
      .toDF()
  }

  /** Frame sampling: split each binary payload into fixed-size frames
    * (video frame-extraction plumbing), one output row per frame with
    * offset + per-frame checksum. Real byte slicing in mapPartitions;
    * deterministic so the whole fan-out is oracle-checkable. */
  final case class Frame(
      doc_id: Long, frame_idx: Long, frame_offset: Long,
      frame_len: Long, frame_checksum: Long)

  val FrameSize = 256

  def sampleFrames(docId: Long, payload: Array[Byte]): Iterator[Frame] = {
    val n = payload.length
    val frames = (n + FrameSize - 1) / FrameSize
    (0 until frames).iterator.map { i =>
      val off = i * FrameSize
      val len = math.min(FrameSize, n - off)
      var sum = 0L
      var j = off
      while (j < off + len) { sum += (payload(j) & 0xff); j += 1 }
      Frame(docId, i.toLong, off.toLong, len.toLong, sum)
    }
  }

  def q26FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => sampleFrames(id, bytes) })
      .toDF()
  }

  /** Feature extraction over the decoded payload (the feature-extract
    * stage of an image/audio pipeline): an 8-bin byte-value histogram
    * plus the exact mean byte — per-payload work a real deployment
    * would replace with embedding/model inference, with the same
    * iterator-per-partition shape.
    *
    * ORACLE INVARIANT (q51, and q52 below): Spark computes over the
    * payload's UTF-8 BYTES while the DuckDB oracle rebuilds per-CHAR
    * codepoints — the two agree only because `documents.text` is
    * ASCII (byte == codepoint, byte length == char length; same
    * invariant q23/q26 state). A non-ASCII corpus needs an
    * octet-level oracle (encode()/octet_length), not a char-level
    * one. An empty payload yields mean_byte = NULL (not 0/0 = NaN),
    * matching SQL's NULL-on-empty aggregate semantics. */
  final case class MediaFeatures(
      doc_id: Long, h0: Long, h1: Long, h2: Long, h3: Long,
      h4: Long, h5: Long, h6: Long, h7: Long, mean_byte: Option[Double])

  def extractFeatures(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val h = new Array[Long](8)
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      h(b / 32) += 1
      sum += b
      i += 1
    }
    val mean = if (payload.length == 0) None
      else Some(sum.toDouble / payload.length.toDouble)
    MediaFeatures(docId, h(0), h(1), h(2), h(3), h(4), h(5), h(6), h(7), mean)
  }

  def q51MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => extractFeatures(id, bytes) })
      .toDF()
  }

  val q51Oracle: String = {
    val bins = (0 until 8).map(b =>
      s"CAST(len(list_filter(cps, c -> c // 32 = $b)) AS BIGINT) AS h$b")
      .mkString(",\n      |  ").stripMargin
    s"""WITH cp AS (
       |  SELECT doc_id, list_transform(string_split(text, ''), c -> unicode(c)) AS cps
       |  FROM documents)
       |SELECT doc_id,
       |  $bins,
       |  CAST(list_sum(cps) AS DOUBLE) / CAST(len(cps) AS DOUBLE) AS mean_byte
       |FROM cp""".stripMargin
  }

  /** Resize: downsample every payload to a fixed-length representation
    * (16 block means over the bytes — the 1-D analog of image resize,
    * which is exactly block-averaging). Emitted as 16 scalar columns of
    * exact integer-ratio doubles; blocks beyond a short payload are
    * NULL (an empty payload is all-NULL — no 0/0 division). Same
    * iterator-per-partition shape as the decode; same ASCII oracle
    * invariant as q51 above. */
  final case class Resized(
      doc_id: Long, r0: Option[Double], r1: Option[Double], r2: Option[Double],
      r3: Option[Double], r4: Option[Double], r5: Option[Double],
      r6: Option[Double], r7: Option[Double], r8: Option[Double],
      r9: Option[Double], r10: Option[Double], r11: Option[Double],
      r12: Option[Double], r13: Option[Double], r14: Option[Double],
      r15: Option[Double])

  val ResizeTargets = 16

  def resizePayload(docId: Long, payload: Array[Byte]): Resized = {
    val n = payload.length
    val blk = (n + ResizeTargets - 1) / ResizeTargets // ceil, ≥1 for n ≥ 1
    val out = Array.fill[Option[Double]](ResizeTargets)(None)
    var b = 0
    while (b < ResizeTargets) {
      val from = b * blk
      val until = math.min(n, from + blk)
      if (n > 0 && from < until) {
        var sum = 0L
        var i = from
        while (i < until) { sum += (payload(i) & 0xff); i += 1 }
        out(b) = Some(sum.toDouble / (until - from).toDouble)
      }
      b += 1
    }
    Resized(docId, out(0), out(1), out(2), out(3), out(4), out(5), out(6),
      out(7), out(8), out(9), out(10), out(11), out(12), out(13), out(14), out(15))
  }

  def q52MediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => resizePayload(id, bytes) })
      .toDF()
  }

  val q52Oracle: String = {
    val cols = (0 until ResizeTargets).map { b =>
      s"""CASE WHEN len(cps) > $b * blk THEN
         |    CAST(list_sum(cps[$b * blk + 1 : least(len(cps), ($b + 1) * blk)]) AS DOUBLE)
         |    / CAST(least(len(cps), ($b + 1) * blk) - $b * blk AS DOUBLE)
         |  ELSE NULL END AS r$b""".stripMargin.replace("\n", " ")
    }.mkString(",\n      |  ").stripMargin
    s"""WITH cp AS (
       |  SELECT doc_id, list_transform(string_split(text, ''), c -> unicode(c)) AS cps,
       |    (length(text) + ${ResizeTargets - 1}) // $ResizeTargets AS blk
       |  FROM documents)
       |SELECT doc_id,
       |  $cols
       |FROM cp""".stripMargin
  }

  val q26Oracle: String =
    """SELECT doc_id,
      |  CAST(i AS BIGINT) AS frame_idx,
      |  CAST(i * 256 AS BIGINT) AS frame_offset,
      |  CAST(least(256, length(text) - i * 256) AS BIGINT) AS frame_len,
      |  CAST(list_sum(list_transform(
      |      string_split(substring(text, i * 256 + 1,
      |                   least(256, length(text) - i * 256)), ''),
      |      c -> unicode(c))) AS BIGINT) AS frame_checksum
      |FROM documents,
      |     unnest(generate_series(0, (length(text) + 255) // 256 - 1)) AS t(i)""".stripMargin

  /** q187: perceptual-hash near-duplicate detection over binary media
    * payloads — the media twin of text near-dup (q19/q20): re-encoded
    * or lightly-edited copies of the same asset have byte-identical
    * *structure* but not byte-identical content, so exact dedup (q17)
    * misses them while a position-sensitive fingerprint catches them.
    *
    * Hash construction (the classic pHash recipe with the DCT stage
    * replaced by the q52 block-resize, since the decode is the stub):
    * resize the payload to [[PhashBits]] blocks (ceil split, exactly
    * q52's geometry), then bit b = 1 iff block b's mean byte exceeds
    * the payload's global mean byte — compared exactly in integer
    * space (`s_b · n > s_all · len_b`, no float division), so the
    * hash is bit-reproducible on any engine. Near-dups = pairs at
    * hamming distance ≤ [[PhashHamMax]].
    *
    * Scale shape: candidate generation is banded LSH, not all pairs —
    * [[PhashBands]] disjoint 8-bit bands; pigeonhole guarantees any
    * pair within hamming ≤ PhashBands−1 collides on ≥ 1 intact band,
    * so recall at the ≤ 3 threshold is exact, PROVABLY. The join keys
    * on (band, band_value): one hash shuffle of a hash-sized frame
    * (1 row/doc), never a payload shuffle; the exact `bit_count(xor)`
    * verify rides the candidate rows. Text-skewed corpora can
    * concentrate a band bucket (all-text bytes share letter
    * frequency); the positional resize is what spreads them — the
    * measured bucket histogram at sf0.01 is near-uniform. Per-doc
    * integer bound: s·n < 2⁶³ holds for payloads < ~190 MB; larger
    * media needs the comparison in 128-bit (DecimalType) — noted, not
    * needed for the corpus. */
  val PhashBits = 32
  val PhashBands = 4
  val PhashHamMax = 3

  final case class PayloadHash(doc_id: Long, phash: Long)

  def phashPayload(docId: Long, payload: Array[Byte]): PayloadHash = {
    val n = payload.length
    val blk = (n + PhashBits - 1) / PhashBits
    var sAll = 0L
    var i = 0
    while (i < n) { sAll += (payload(i) & 0xff); i += 1 }
    var hash = 0L
    var b = 0
    while (b < PhashBits) {
      val from = b * blk
      val until = math.min(n, from + blk)
      if (from < until) {
        var s = 0L
        var j = from
        while (j < until) { s += (payload(j) & 0xff); j += 1 }
        if (s * n > sAll * (until - from)) hash |= (1L << b)
      }
      b += 1
    }
    PayloadHash(docId, hash)
  }

  def q187MediaPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashes = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => phashPayload(id, bytes) })
      .toDF()
    val bands = hashes.select(col("doc_id"), col("phash"),
      explode(array((0 until PhashBands).map(k =>
        struct(lit(k).as("band"),
          shiftrightunsigned(col("phash"), 8 * k).bitwiseAND(lit(255L))
            .as("bval"))): _*)).as("bb"))
      .select(col("doc_id"), col("phash"), col("bb.band"), col("bb.bval"))
    val lhs = bands.select(col("band"), col("bval"),
      col("doc_id").as("doc_a"), col("phash").as("ph_a"))
    val rhs = bands.select(col("band"), col("bval"),
      col("doc_id").as("doc_b"), col("phash").as("ph_b"))
    lhs.join(rhs, Seq("band", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= PhashHamMax)
      .distinct() // a close pair can collide in several bands
  }

  /** Generated 32-term hash assembly over q52's slice geometry; the
    * pair stage is the all-pairs ground truth the banded plan must
    * reproduce exactly (recall proof above). */
  val q187Oracle: String = {
    val bits = (0 until PhashBits).map { b =>
      s"""CASE WHEN n > $b * blk AND
         |      list_sum(cps[$b * blk + 1 : least(n, ($b + 1) * blk)]) * n >
         |      s_all * (least(n, ($b + 1) * blk) - $b * blk)
         |    THEN CAST(${1L << b} AS BIGINT) ELSE 0 END""".stripMargin
        .replace("\n", " ")
    }.mkString(" +\n      |    ").stripMargin
    s"""WITH cp AS (
       |  SELECT doc_id, list_transform(string_split(text, ''), c -> unicode(c)) AS cps,
       |    (length(text) + ${PhashBits - 1}) // $PhashBits AS blk,
       |    length(text) AS n
       |  FROM documents
       |), cp2 AS (
       |  SELECT doc_id, cps, blk, n, coalesce(list_sum(cps), 0) AS s_all FROM cp
       |), ph AS (
       |  SELECT doc_id,
       |    CAST($bits AS BIGINT) AS phash
       |  FROM cp2)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
       |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= $PhashHamMax""".stripMargin
  }

  /** q196 frame width (bytes ≙ 8-bit mono samples) and activity
    * threshold. 18 splits the sf0.01 frame population ~44% inactive /
    * 56% active (measured) — segments are genuinely plural per doc,
    * not one all-active island. */
  val VadFrame = 64
  val VadThreshold = 18

  /** q196: voice-activity segmentation plumbing — the audio analog of
    * q26's frame sampler. A real VAD frames PCM samples, computes a
    * band energy per frame, thresholds it, and merges consecutive
    * active frames into utterance segments; this pipeline does exactly
    * that with the payload's bytes as samples and "energy" = count of
    * bytes in the speech band (here: vowels — deterministic, so the
    * whole segment structure is oracle-checkable; a real deployment
    * swaps the per-frame energy expression for a spectral one and
    * keeps every other stage).
    *
    * All stages are declarative and codegen'd: frame fan-out is an
    * explode over `sequence()` (narrow), per-frame energy is
    * `length(translate(...))` on a substring (no UDF), and island
    * merging is the gaps-and-islands trick — `frame_idx − row_number()`
    * constant within each run — under a window partitioned by doc_id
    * (per-doc frame counts, naturally bounded; thousands of docs per
    * partition at any scale, never a corpus-sized single partition).
    * Output: one row per active segment with frame span and energy. */
  def q196AudioVad(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .withColumn("i",
        explode(expr(s"sequence(0L, (length(text) + ${VadFrame - 1}) div $VadFrame - 1)")))
      .withColumn("fr",
        expr(s"substring(text, cast(i * $VadFrame + 1 AS INT), $VadFrame)"))
      .select(col("doc_id"), col("i"),
        (length(col("fr")) - length(translate(col("fr"), "aeiou", "")))
          .cast("long").as("energy"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val segs = frames.filter(col("energy") >= VadThreshold)
      .withColumn("grp", col("i") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("i")).as("start_frame"), max(col("i")).as("end_frame"),
        count(lit(1)).as("n_frames"), sum(col("energy")).as("seg_energy"))
    val wSeg = Window.partitionBy(col("doc_id")).orderBy(col("start_frame"))
    segs
      .withColumn("seg_idx", (row_number().over(wSeg) - 1).cast("long"))
      .select(col("doc_id"), col("seg_idx"), col("start_frame"),
        col("end_frame"), col("n_frames"), col("seg_energy"))
  }

  val q196Oracle: String =
    s"""WITH f AS (
       |  SELECT doc_id, i,
       |    CAST(length(fr) - length(translate(fr, 'aeiou', '')) AS BIGINT)
       |      AS energy
       |  FROM (
       |    SELECT doc_id, i,
       |      substring(text, CAST(i * $VadFrame + 1 AS INT), $VadFrame) AS fr
       |    FROM documents,
       |      unnest(generate_series(0,
       |        (length(text) + ${VadFrame - 1}) // $VadFrame - 1)) AS t(i))
       |), a AS (
       |  SELECT doc_id, i, energy,
       |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
       |  FROM f WHERE energy >= $VadThreshold
       |), s AS (
       |  SELECT doc_id, min(i) AS start_frame, max(i) AS end_frame,
       |    count(*) AS n_frames, sum(energy) AS seg_energy
       |  FROM a GROUP BY doc_id, grp)
       |SELECT doc_id,
       |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_frame) - 1
       |    AS BIGINT) AS seg_idx,
       |  CAST(start_frame AS BIGINT) AS start_frame,
       |  CAST(end_frame AS BIGINT) AS end_frame,
       |  CAST(n_frames AS BIGINT) AS n_frames,
       |  CAST(seg_energy AS BIGINT) AS seg_energy
       |FROM s""".stripMargin

  /** The payloads are ASCII text, so byte length == char length and the
    * byte checksum == sum of codepoints — both SQL-expressible. */
  val q23Oracle: String =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS byte_length,
      |  CAST(length(text) % 625 + 16 AS BIGINT) AS frame_width,
      |  CAST((length(text) // 3) % 480 + 16 AS BIGINT) AS frame_height,
      |  CAST(3 AS BIGINT) AS channels,
      |  CAST(list_sum(list_transform(string_split(text, ''), c -> unicode(c))) AS BIGINT) AS byte_checksum,
      |  source
      |FROM documents""".stripMargin
}
