package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data curation operators: deterministic splits/sampling and
  * cross-split contamination detection — the two steps between "corpus"
  * and "training set" that every LLM data pipeline runs after dedup.
  */
object Curation {

  /** Uniform deterministic hash of the doc id — the md5 hex string.
    * Hash-derived ordering and bucketing are reproducible across
    * engines, runs, and cluster layouts (unlike rand(seed), which
    * depends on partitioning). */
  private def docHash(id: Column): Column = md5(id.cast("string"))

  /** q45: train/val/test assignment + per-(source, split) hash-ranked
    * stratified sample. The split is a pure projection (first hex
    * nibble: 12/16 train, 2/16 val, 2/16 test); the sample takes the
    * `SampleQuota` hash-smallest docs of each stratum, so growing the
    * corpus only ever ADDS strata members deterministically — resample
    * stability, the property curation pipelines need for incremental
    * corpus refreshes.
    *
    * Ranks run through the two-phase [[Rank.groupRank]] (bucketed on
    * the hash's first 15 nibbles as a long — a weakly monotone
    * function of the hex string's lexicographic order, with the full
    * hash + doc_id as tiebreak), because (source, split) is ~60 groups:
    * a plain partitioned window would sort corpus/60 rows in single
    * tasks — the q48/q69/q70 scale flaw this family already fixed. */
  val SampleQuota = 25

  def q45StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val h = docHash(col("doc_id"))
    val split = when(substring(h, 1, 1).between("0", "b"), "train")
      .when(substring(h, 1, 1).isin("c", "d"), "val")
      .otherwise("test")
    val tagged = docs
      .select(col("doc_id"), col("source"), h.as("h"), split.as("split"))
      .withColumn("_hv", conv(substring(col("h"), 1, 15), 16, 10).cast("long"))
    Rank.groupRank(tagged, Seq("source", "split"), "_hv",
        Seq("h", "doc_id"), "_r", "_n")
      .withColumn("sample_rank", col("_r") + 1L)
      .filter(col("sample_rank") <= SampleQuota)
      .select(col("doc_id"), col("source"), col("split"), col("sample_rank"))
  }

  val q45Oracle: String =
    s"""WITH tagged AS (
       |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
       |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND 'b' THEN 'train'
       |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents)
       |SELECT doc_id, source, split, sample_rank FROM (
       |  SELECT doc_id, source, split,
       |    row_number() OVER (PARTITION BY source, split
       |                       ORDER BY h ASC, doc_id ASC) AS sample_rank
       |  FROM tagged) t
       |WHERE sample_rank <= $SampleQuota""".stripMargin

  /** q46: test-set contamination — (test doc, train doc) pairs sharing
    * word 5-grams, with the shared-shingle count. The join is an
    * inverted index on the shingle STRING (5-grams are selective enough
    * that no prefix filtering is needed at overlap-threshold 1, which
    * is what contamination means); both sides come from one scan, and
    * the shuffle carries (shingle → doc) postings like a search index
    * build. Any hit is a leak: a training document that shares a
    * 13-gram-class phrase with an evaluation document. */
  def q46Contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.load(spark, dir, "documents"))
    val h = docHash(col("doc_id"))
    val split = when(substring(h, 1, 1).between("0", "b"), "train")
      .when(substring(h, 1, 1).isin("c", "d"), "val")
      .otherwise("test")
    val toks = docs
      .select(col("doc_id"), split.as("split"),
        graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .filter(size(col("w")) >= 5)
    val sh = toks.select(col("doc_id"), col("split"),
      explode(array_distinct(transform(
        sequence(lit(1), size(col("w")) - 4),
        i => concat_ws(" ",
          element_at(col("w"), i), element_at(col("w"), i + lit(1)),
          element_at(col("w"), i + lit(2)), element_at(col("w"), i + lit(3)),
          element_at(col("w"), i + lit(4)))))).as("shingle"))
    val test = sh.filter(col("split") === "test")
      .select(col("doc_id").as("test_doc_id"), col("shingle"))
    val train = sh.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc_id"), col("shingle"))
    test.join(train, "shingle")
      .groupBy(col("test_doc_id"), col("train_doc_id"))
      .agg(count(lit(1)).as("shared_ngrams"))
  }

  /** q47: within-document repetition signals (the Gopher repetition
    * filters): duplicate-word fraction, most-frequent-word share, and
    * the same two over word 2-grams. All four are ratios of exact
    * integer counts, so the doubles hash-compare. Shape: one explode +
    * two-level aggregation per granularity — the shuffle carries
    * (doc, term) partial counts, never raw text. */
  def q47Repetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.load(spark, dir, "documents"))
    val toks = docs
      .select(col("doc_id"), graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .filter(size(col("w")) >= 2)

    def stats(term: Column, suffix: String) = {
      toks.select(col("doc_id"), explode(term).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as(s"total_$suffix"),
          count(lit(1)).as(s"distinct_$suffix"),
          max(col("c")).as(s"top_$suffix"))
    }

    val grams2 = transform(sequence(lit(1), size(col("w")) - 1),
      i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + lit(1))))
    stats(col("w"), "words").join(stats(grams2, "grams"), "doc_id")
      .select(col("doc_id"), col("total_words"),
        (lit(1.0) - col("distinct_words") * lit(1.0) / col("total_words"))
          .as("dup_word_frac"),
        (col("top_words") * lit(1.0) / col("total_words")).as("top_word_frac"),
        (lit(1.0) - col("distinct_grams") * lit(1.0) / col("total_grams"))
          .as("dup_2gram_frac"),
        (col("top_grams") * lit(1.0) / col("total_grams")).as("top_2gram_frac"))
  }

  val q47Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
      |  FROM documents WHERE len(string_split_regex(lower(trim(text)), '\s+')) >= 2
      |), wstats AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_words,
      |    count(*) AS distinct_words, max(c) AS top_words
      |  FROM (
      |    SELECT doc_id, t, count(*) AS c
      |    FROM (SELECT doc_id, unnest(w) AS t FROM toks) u
      |    GROUP BY doc_id, t) x
      |  GROUP BY doc_id
      |), gstats AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_grams,
      |    count(*) AS distinct_grams, max(c) AS top_grams
      |  FROM (
      |    SELECT doc_id, g AS t, count(*) AS c FROM (
      |      SELECT doc_id, unnest([w[i] || ' ' || w[i+1]
      |                             for i in generate_series(1, len(w) - 1)]) AS g
      |      FROM toks) y
      |    GROUP BY doc_id, g) x
      |  GROUP BY doc_id)
      |SELECT w.doc_id, w.total_words,
      |  1.0 - w.distinct_words * 1.0 / w.total_words AS dup_word_frac,
      |  w.top_words * 1.0 / w.total_words AS top_word_frac,
      |  1.0 - g.distinct_grams * 1.0 / g.total_grams AS dup_2gram_frac,
      |  g.top_grams * 1.0 / g.total_grams AS top_2gram_frac
      |FROM wstats w JOIN gstats g ON w.doc_id = g.doc_id""".stripMargin

  /** q50: PII/URL scrubbing — the safety pass an LLM corpus runs before
    * training: redact emails, URLs, and long digit runs (phone/account
    * numbers), emitting the scrubbed text plus per-category redaction
    * counts (count first, then replace — pure codegen'd regex work on
    * the scan, no UDFs; the regexes avoid lookarounds and anchors that
    * diverge between RE2-style engines). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val DigitRunRe = "[0-9]{7,}"

  def q50PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    def hits(re: String) =
      size(regexp_extract_all(col("text"), lit(re), lit(0))).cast("long")
    docs.select(
      col("doc_id"),
      hits(EmailRe).as("n_emails"),
      hits(UrlRe).as("n_urls"),
      hits(DigitRunRe).as("n_digit_runs"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          UrlRe, "<URL>"),
        DigitRunRe, "<NUM>").as("scrubbed_text"))
  }

  val q50Oracle: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$UrlRe')) AS BIGINT) AS n_urls,
       |  CAST(len(regexp_extract_all(text, '$DigitRunRe')) AS BIGINT) AS n_digit_runs,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$UrlRe', '<URL>', 'g'),
       |    '$DigitRunRe', '<NUM>', 'g') AS scrubbed_text
       |FROM documents""".stripMargin

  /** q48: per-source corpus length profile — count/min/max/mean plus
    * NEAREST-RANK percentiles (median, p90). Nearest-rank (value at
    * row_number ceil(p·n) in (n_chars, doc_id) order) is chosen over
    * interpolated percentiles deliberately: it is pure integer
    * indexing, so any two engines agree bitwise, and at corpus scale
    * it is one bucketed rank pass per stratum instead of a global
    * sort: ranks come from the two-phase distributed [[Rank.groupRank]]
    * (~20 sources, so a plain per-source window would sort each
    * source's full slice in ONE task — the group count n comes back
    * from the same pass for free).
    * Mean is the exact integer sum with one final double division. */
  def q48LengthProfile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val stats = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      sum(col("n_chars")).as("sum_chars"))
    val ranked = Rank.groupRank(
      docs.select(col("source"), col("n_chars"), col("doc_id")),
      Seq("source"), "n_chars", Seq("doc_id"), "_rk0", "_n")
    def atRank(p: Double, name: String) =
      ranked
        .filter(col("_rk0") + 1L === ceil(col("_n") * p).cast("long"))
        .select(col("source"), col("n_chars").as(name))
    stats
      .join(atRank(0.5, "median_chars"), "source")
      .join(atRank(0.9, "p90_chars"), "source")
      .select(col("source"), col("n_docs"), col("min_chars"), col("max_chars"),
        (col("sum_chars") * lit(1.0) / col("n_docs")).as("mean_chars"),
        col("median_chars"), col("p90_chars"))
  }

  /** q49: the HLL sketch's REGISTER STATE, exactly — per (event_type,
    * bucket) the max leading-zero rank over md5-derived 60-bit element
    * hashes. The q30 estimate can never hash-compare (ln() differs in
    * the last ulp across libms), but the registers are pure integer
    * state: max-merge is commutative/associative (the partition-
    * invariance that makes sketches work on 1000 executors), and both
    * engines rebuild identical hashes from md5 nibbles. The rank is a
    * generated integer CASE chain (no floating log2), emitted as the
    * SAME SQL text to Spark (expr) and DuckDB — one dialect swap,
    * instr vs strpos. */
  val HllP = 10 // 2^10 buckets; 50 hash bits feed the rank

  /** The shared hash/rank SQL fragments: (h — the Horner-assembled
    * 60-bit hash from the first 15 md5 nibbles of user_id, rank — the
    * leading-zero CASE over a column named `w`, wBits). One builder so
    * the register queries and q204's per-user-day register rows stay
    * definitionally in lockstep. */
  private def hllHashRank(posFn: String): (String, String, Int) = {
    // accumulator starts as BIGINT — the int positions overflow 32 bits
    val nibs = (0 until 15)
      .map(j => s"($posFn('0123456789abcdef', substring(md5(CAST(user_id AS VARCHAR)), ${j + 1}, 1)) - 1)")
    val h = nibs.tail.foldLeft(s"CAST(${nibs.head} AS BIGINT)")(
      (acc, nib) => s"($acc * 16 + $nib)")
    val wBits = 60 - HllP
    // rank = (leading zeros of the low wBits bits) + 1, via integer compares
    val rank = (1 to wBits)
      .map(k => s"WHEN w >= ${1L << (wBits - k)} THEN $k")
      .mkString("CASE ", " ", s" ELSE ${wBits + 1} END") // w = 0 → wBits + 1
    (h, rank, wBits)
  }

  private def hllRegisterSql(posFn: String,
      grpCols: Seq[String] = Seq("event_type")): String = {
    val (h, rank, wBits) = hllHashRank(posFn)
    val g = grpCols.map(_ + ", ").mkString
    s"""SELECT ${g}bucket, max(rank) AS max_rank FROM (
       |  SELECT ${g}h // ${1L << wBits} AS bucket,
       |    $rank AS rank
       |  FROM (SELECT ${g}$h AS h, ($h % ${1L << wBits}) AS w
       |        FROM events) x) y
       |GROUP BY ${(grpCols :+ "bucket").mkString(", ")}""".stripMargin
  }

  def q49HllRegisters(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(hllRegisterSql("instr").replace(" // ", " div ")
      .replace("AS VARCHAR", "AS STRING"))
  }

  val q49Oracle: String = hllRegisterSql("strpos")

  /** q101: HLL register MERGE — the property that makes sketches a
    * distributed-systems primitive at all: per-group register states
    * max-merge into EXACTLY the register state computed directly over
    * the union. Output: per bucket, the rank merged from the five
    * per-event_type sketches next to the directly-computed global
    * rank, plus the equality flag — so the oracle hash-checks
    * mergeability itself, not just one sketch. This is the engine
    * behavior a 1000-executor HLL relies on (partials merged across
    * executors ≡ single-pass state), proven here as a query. */
  private def hllUnionSql(posFn: String): String =
    s"""WITH per AS (
       |${hllRegisterSql(posFn, Seq("event_type"))}
       |), merged AS (
       |  SELECT bucket, max(max_rank) AS merged_rank FROM per GROUP BY bucket
       |), direct AS (
       |${hllRegisterSql(posFn, Seq.empty)}
       |)
       |SELECT m.bucket, m.merged_rank, d.max_rank AS direct_rank,
       |  m.merged_rank = d.max_rank AS merge_consistent
       |FROM merged m JOIN direct d ON d.bucket = m.bucket""".stripMargin

  def q101HllUnion(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(hllUnionSql("instr").replace(" // ", " div ")
      .replace("AS VARCHAR", "AS STRING"))
  }

  val q101Oracle: String = hllUnionSql("strpos")

  /** q204 window width: 7 trailing days per target day. */
  val HllWindowDays = 7

  /** q204: sliding-window distinct-user sketches by TIME ROLLUP —
    * the production pattern q101's merge property exists FOR: keep one
    * small HLL register set per day, answer "distinct users over the
    * trailing week" for EVERY day by max-merging 7 daily sketches,
    * never re-reading the raw events. The query emits, per (day,
    * bucket), the week-merged rank next to the rank computed directly
    * from the raw rows of that window, plus the equality flag — so
    * the oracle hash-checks that the rollup is lossless for every
    * window position, which is the exact claim a pre-aggregated
    * sketch table at 100 TB stands on (a day of raw events compresses
    * to 2¹⁰ integer cells; 30 days of reprocessing becomes 30×1024
    * rows of max()).
    *
    * Plan: the daily register build is one keyed max-aggregate over
    * the DISTINCT (user, day) frame — the q206 discipline: dedup on
    * native types BEFORE the 15-nibble md5 hash, so the expensive
    * expression runs once per user-day, not once per event (max over
    * duplicate hashes is the identity, so the registers are
    * unchanged); the window merge is a 7-way explode on the DAILY
    * REGISTERS (sketch-sized, not event-sized) + one more
    * max-aggregate; the direct check replays the same explode on the
    * deduped user-day frame (re-deduped after the shift — overlapping
    * windows re-collide the same user across source days). */
  private def hllSlidingSql(posFn: String, dayDiv: String): String = {
    val offs = (0 until HllWindowDays).map(o => s"($o)").mkString(", ")
    s"""WITH daily AS (
       |${hllRegisterSql(posFn, Seq("day"))
        .replace("FROM events",
          s"FROM (SELECT DISTINCT user_id, $dayDiv AS day FROM events) ev")}
       |), days AS (
       |  SELECT DISTINCT day FROM daily
       |), rolled AS (
       |  SELECT d.day + o.off AS day, d.bucket, max(d.max_rank) AS merged_rank
       |  FROM daily d
       |  CROSS JOIN (SELECT unnest([$offs]) AS off) o
       |  GROUP BY 1, 2
       |), direct AS (
       |${hllRegisterSql(posFn, Seq("day"))
        .replace("FROM events",
          s"""FROM (SELECT DISTINCT e0.user_id, e0.day0 + o.off AS day
             |      FROM (SELECT DISTINCT user_id, $dayDiv AS day0
             |            FROM events) e0
             |      CROSS JOIN (SELECT unnest([$offs]) AS off) o) ev"""
            .stripMargin)}
       |)
       |SELECT r.day, r.bucket, r.merged_rank, dr.max_rank AS direct_rank,
       |  r.merged_rank = dr.max_rank AS merge_consistent
       |FROM rolled r
       |JOIN days dy ON dy.day = r.day
       |JOIN direct dr ON dr.day = r.day AND dr.bucket = r.bucket""".stripMargin
  }

  /** Spark-side q204 plan: the oracle's algebra with the shared work
    * factored out ONCE. Both arms — the daily-register rollup and the
    * direct per-window check — derive from a single persisted
    * per-user-day register frame (day, bucket, rank): the raw events
    * are scanned once, the (user, day) dedup aggregate runs once, and
    * the 15-nibble md5 hash is computed once per user-day (the oracle
    * text computes each of these twice). The direct arm's post-shift
    * re-dedup is dropped as a provable identity: rank is a function of
    * user_id alone, so max(rank) over the multiset of (user, day+off)
    * rows equals max over the deduped set — the emitted registers, and
    * every hash downstream, are unchanged. What remains event-shaped
    * is only the intentional direct-check aggregate (user-days × 7
    * window offsets), which IS the lossless-rollup proof the query
    * exists to emit. */
  def q204SlidingHll(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    val (h, rank, wBits) = hllHashRank("instr")
    val udr = spark.sql(
      s"""SELECT day, h div ${1L << wBits} AS bucket, $rank AS rank
         |FROM (SELECT day, $h AS h, ($h % ${1L << wBits}) AS w
         |      FROM (SELECT DISTINCT user_id,
         |                   unix_timestamp(ts) div 86400 AS day
         |            FROM events) ud) x""".stripMargin
        .replace("AS VARCHAR", "AS STRING"))
      .persist()
    udr.createOrReplaceTempView("q204_udr")
    val offs = (0 until HllWindowDays).mkString(", ")
    spark.sql(
      s"""WITH daily AS (
         |  SELECT day, bucket, max(rank) AS max_rank
         |  FROM q204_udr GROUP BY day, bucket
         |), days AS (
         |  SELECT DISTINCT day FROM daily
         |), rolled AS (
         |  SELECT d.day + o.off AS day, d.bucket, max(d.max_rank) AS merged_rank
         |  FROM daily d
         |  CROSS JOIN (SELECT explode(array($offs)) AS off) o
         |  GROUP BY 1, 2
         |), direct AS (
         |  SELECT u.day + o.off AS day, u.bucket, max(u.rank) AS max_rank
         |  FROM q204_udr u
         |  CROSS JOIN (SELECT explode(array($offs)) AS off) o
         |  GROUP BY 1, 2
         |)
         |SELECT r.day, r.bucket, r.merged_rank, dr.max_rank AS direct_rank,
         |  r.merged_rank = dr.max_rank AS merge_consistent
         |FROM rolled r
         |JOIN days dy ON dy.day = r.day
         |JOIN direct dr ON dr.day = r.day AND dr.bucket = r.bucket""".stripMargin)
  }

  val q204Oracle: String =
    hllSlidingSql("strpos", "CAST(floor(epoch(ts)) AS BIGINT) // 86400")

  val q48Oracle: String =
    """WITH stats AS (
      |  SELECT source, count(*) AS n_docs, min(n_chars) AS min_chars,
      |    max(n_chars) AS max_chars, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |  FROM documents GROUP BY source
      |), ranked AS (
      |  SELECT source, n_chars, doc_id,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY n_chars ASC, doc_id ASC) AS rk
      |  FROM documents)
      |SELECT s.source, s.n_docs, s.min_chars, s.max_chars,
      |  s.sum_chars * 1.0 / s.n_docs AS mean_chars,
      |  med.n_chars AS median_chars,
      |  p90.n_chars AS p90_chars
      |FROM stats s
      |JOIN ranked med ON med.source = s.source
      |  AND med.rk = CAST(ceil(s.n_docs * 0.5) AS BIGINT)
      |JOIN ranked p90 ON p90.source = s.source
      |  AND p90.rk = CAST(ceil(s.n_docs * 0.9) AS BIGINT)""".stripMargin

  val q46Oracle: String =
    """WITH tagged AS (
      |  SELECT doc_id, text,
      |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND 'b' THEN 'train'
      |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents
      |), toks AS (
      |  SELECT doc_id, split, string_split_regex(lower(trim(text)), '\s+') AS w
      |  FROM tagged WHERE split <> 'val'
      |), sh AS (
      |  SELECT DISTINCT doc_id, split, shingle FROM (
      |    SELECT doc_id, split,
      |      unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
      |              for i in generate_series(1, len(w) - 4)]) AS shingle
      |    FROM toks WHERE len(w) >= 5))
      |SELECT a.doc_id AS test_doc_id, b.doc_id AS train_doc_id,
      |  count(*) AS shared_ngrams
      |FROM sh a JOIN sh b ON a.shingle = b.shingle
      |WHERE a.split = 'test' AND b.split = 'train'
      |GROUP BY 1, 2""".stripMargin

  /** q68: weighted data mixing — the per-source up/down-sampling step
    * that turns a deduped corpus into the training MIXTURE (wiki-like
    * sources repeated, web crawl thinned). Rate r emits ⌊r⌋ full
    * epochs of every doc plus one extra epoch for the hash-selected
    * r−⌊r⌋ fraction. Selection compares the first 4 md5 nibbles of
    * ("mix_" + doc_id) against an INTEGER threshold ⌊frac·65536⌋ —
    * both engines compute the identical md5, so membership (not just
    * the rate) is reproducible across engines, runs, and cluster
    * layouts, and a corpus refresh re-selects the same docs.
    * Pure projection + explode: no shuffle at any scale. */
  val MixtureRates: Seq[(Seq[String], Int, Int)] = Seq(
    // (sources, full epochs ⌊r⌋, 16-bit fractional threshold)
    (Seq("src0", "src1", "src2", "src3", "src4"), 2, 0),          // r = 2.0
    (Seq("src5", "src6", "src7", "src8", "src9"), 1, 0),          // r = 1.0
    ((10 to 19).map(i => s"src$i"), 0, 16384))                    // r = 0.25

  def q68MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val v = MixBits(col("doc_id")) // first 4 md5 nibbles of "mix_<id>"
    val fullEpochs = MixtureRates.tail.foldLeft(
      when(col("source").isin(MixtureRates.head._1: _*), MixtureRates.head._2)) {
      case (acc, (srcs, k, _)) => acc.when(col("source").isin(srcs: _*), k)
    }
    val thresh = MixtureRates.tail.foldLeft(
      when(col("source").isin(MixtureRates.head._1: _*), MixtureRates.head._3)) {
      case (acc, (srcs, _, t)) => acc.when(col("source").isin(srcs: _*), t)
    }
    docs
      .select(col("doc_id"), col("source"),
        (fullEpochs + when(v < thresh, 1).otherwise(0)).as("copies"))
      .filter(col("copies") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(0L), col("copies").cast("long") - 1L)).as("epoch"))
  }

  /** q119: deterministic bootstrap replicates — error bars for a
    * corpus statistic computed AT SCALE, without resampling rows
    * through a driver: [[BootReplicas]] half-sample replicates of mean
    * order revenue, each defined by a deterministic md5 coin per
    * (replica, order). The spread of the replicate means IS the
    * sampling-uncertainty estimate (half-sampling: a delete-d jackknife
    * variant; weights are exactly reproducible on any engine or
    * cluster, unlike rng-based resampling which can never
    * hash-compare).
    *
    * Plan: one scan, a 16-way explode (the shuffle carries only
    * (replica, partial-sum) combiners — map-side combine collapses the
    * blowup before any exchange), and a 17-row output: each replicate's
    * exact integer (n, Σcents) plus its mean as the one double
    * division; replica −1 is the full sample for reference. */
  val BootReplicas = 16

  def q119BootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    // spread: 16 md5 coins per order row is the hot loop (Tables.spread)
    val orders = Tables.spread(Tables.load(spark, dir, "orders"))
      .select(col("o_orderkey"), Exact.units(col("o_totalprice"), 2).as("cents"))
    val reps = orders
      .select(col("o_orderkey"), col("cents"),
        explode(sequence(lit(0), lit(BootReplicas - 1))).as("replica"))
      .withColumn("w",
        conv(substring(md5(concat(lit("boot_"), col("replica"),
          lit("_"), col("o_orderkey"))), 1, 1), 16, 10).cast("long") % 2L)
      .filter(col("w") === 1L)
      .groupBy(col("replica").cast("long").as("replica"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    val full = orders
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .select(lit(-1L).as("replica"), col("n"), col("sum_cents"))
    reps.unionByName(full)
      .select(col("replica"), col("n"), col("sum_cents"),
        (col("sum_cents").cast("double") / col("n").cast("double"))
          .as("mean_cents"))
  }

  val q119Oracle: String =
    s"""WITH o AS (
       |  SELECT o_orderkey,
       |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
       |  FROM orders
       |), reps AS (
       |  SELECT r.replica, o.o_orderkey, o.cents,
       |    (strpos('0123456789abcdef',
       |       substring(md5('boot_' || r.replica || '_' || o.o_orderkey), 1, 1))
       |     - 1) % 2 AS w
       |  FROM o CROSS JOIN
       |    (SELECT unnest(generate_series(0, ${BootReplicas - 1})) AS replica) r
       |), agg AS (
       |  SELECT CAST(replica AS BIGINT) AS replica, count(*) AS n,
       |    CAST(sum(cents) AS BIGINT) AS sum_cents
       |  FROM reps WHERE w = 1 GROUP BY 1
       |  UNION ALL
       |  SELECT -1, count(*), CAST(sum(cents) AS BIGINT) FROM o)
       |SELECT replica, n, sum_cents,
       |  CAST(sum_cents AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents
       |FROM agg""".stripMargin
  private def MixBits(id: Column): Column = {
    val h = md5(concat(lit("mix_"), id.cast("string")))
    (0 until 4).map { i =>
      (instr(lit("0123456789abcdef"), substring(h, i + 1, 1)) - 1) *
        lit(1 << (4 * (3 - i)))
    }.reduce(_ + _)
  }

  val q68Oracle: String = {
    def inList(srcs: Seq[String]) = srcs.map(s => s"'$s'").mkString(", ")
    val caseK = MixtureRates.map { case (srcs, k, _) =>
      s"WHEN source IN (${inList(srcs)}) THEN $k" }.mkString(" ")
    val caseT = MixtureRates.map { case (srcs, _, t) =>
      s"WHEN source IN (${inList(srcs)}) THEN $t" }.mkString(" ")
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    (strpos('0123456789abcdef', substring(md5('mix_' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
       |    + (strpos('0123456789abcdef', substring(md5('mix_' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
       |    + (strpos('0123456789abcdef', substring(md5('mix_' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
       |    + strpos('0123456789abcdef', substring(md5('mix_' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1 AS v,
       |    CASE $caseK END AS k,
       |    CASE $caseT END AS t
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, source,
       |    k + CASE WHEN v < t THEN 1 ELSE 0 END AS copies
       |  FROM d)
       |SELECT doc_id, source, CAST(e AS BIGINT) AS epoch
       |FROM c, LATERAL (SELECT unnest(generate_series(0, copies - 1)) AS e) g
       |WHERE copies > 0""".stripMargin
  }

  /** q95: median quality gate — keep every document scoring at or
    * above the EXACT corpus median of the q14 composite quality score:
    * the percentile-threshold filter every corpus-curation pipeline
    * runs ("drop the bottom half by quality"), composed from existing
    * primitives rather than a new kernel. The median comes from
    * [[Rank.groupRank]] with no group columns — the two-phase global
    * rank (bucket counts + offsets), NOT a global ORDER BY window, so
    * no corpus-sized single-task sort exists anywhere; the selected
    * 1-row threshold broadcasts back against the scored scan.
    *
    * Filtering `score >= threshold` on doubles is hash-safe because
    * both engines build the score from the identical literal
    * expression tree (q14's hash-checked guarantee) and the threshold
    * is one of those exact values — no arithmetic happens after
    * selection. Lower-median (rank ⌊(n−1)/2⌋, ties broken by doc_id)
    * keeps the contract exact for even counts. */
  def q95QualityGate(spark: SparkSession, dir: String): DataFrame = {
    // Persisted: four references (groupRank's three + the final gated
    // scan) each re-ran the regex-heavy q14 scoring — the q141
    // precedent, same shape, measured at sf0.1 (r12).
    val scored = graft.ops.TextOps.q14Quality(spark, dir)
      .select(col("doc_id"), col("quality_score"))
      .persist()
    val thr = Rank.groupRank(scored, Seq.empty, "quality_score",
        Seq("doc_id"), "_r", "_n")
      .filter(col("_r") === ((col("_n") - 1) / 2).cast("long"))
      .select(col("quality_score").as("_thr"))
    scored.crossJoin(broadcast(thr))
      .filter(col("quality_score") >= col("_thr"))
      .select(col("doc_id"), col("quality_score"))
  }

  val q95Oracle: String =
    """WITH t AS (
      |  SELECT doc_id, text,
      |    len(string_split_regex(trim(text), '\s+')) AS ws,
      |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
      |      / length(text) AS alpha_ratio,
      |    CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|a|is)\b')) AS DOUBLE)
      |      / len(string_split_regex(trim(text), '\s+')) AS stop_ratio
      |  FROM documents
      |), q AS (
      |  SELECT doc_id,
      |    alpha_ratio * 0.5 + least(stop_ratio * 5.0, 1.0) * 0.3
      |      + least(CAST(ws AS DOUBLE) / 100.0, 1.0) * 0.2 AS quality_score
      |  FROM t
      |), r AS (
      |  SELECT quality_score,
      |    row_number() OVER (ORDER BY quality_score ASC, doc_id ASC) - 1 AS r,
      |    count(*) OVER () AS n
      |  FROM q)
      |SELECT doc_id, quality_score FROM q
      |WHERE quality_score >= (SELECT quality_score FROM r WHERE r = (n - 1) // 2)""".stripMargin

  /** q99: n-gram novelty — the per-document complement of q46's
    * pairwise contamination: for every NON-train document (val+test),
    * how many of its distinct 5-gram shingles never occur in the train
    * split, as count and integer permille. High novelty = safe eval
    * material; low novelty = leaked/boilerplate. Same md5 split and
    * shingle construction as q45/q46, so the three queries agree on
    * boundaries by construction.
    *
    * Plan: explode distinct shingles on both sides, one shingle-keyed
    * LEFT join of eval shingles against the DISTINCT train shingle
    * set, one per-doc count aggregation — shuffle volume is bounded by
    * shingle count, nothing broadcasts (the train shingle set is
    * corpus-sized at 100 TB; a Bloom-filter prune (q81's machinery)
    * would cut the shuffle if the novelty rate is high). Docs with
    * < 5 tokens carry no shingles and are out of contract (q46's
    * stated invariant). */
  def q99NgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val h = docHash(col("doc_id"))
    val isTrain = substring(h, 1, 1).between("0", "b")
    val toks = docs
      .select(col("doc_id"), isTrain.as("is_train"),
        graft.functions.TextFunctions.wsTokens(col("text")).as("w"))
      .filter(size(col("w")) >= 5)
    val sh = toks.select(col("doc_id"), col("is_train"),
      explode(array_distinct(transform(
        sequence(lit(1), size(col("w")) - 4),
        i => concat_ws(" ",
          element_at(col("w"), i), element_at(col("w"), i + lit(1)),
          element_at(col("w"), i + lit(2)), element_at(col("w"), i + lit(3)),
          element_at(col("w"), i + lit(4)))))).as("shingle"))
    val trainSh = sh.filter(col("is_train")).select(col("shingle")).distinct()
      .withColumn("seen", lit(1L))
    sh.filter(!col("is_train"))
      .join(trainSh, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_ngrams"), col("n_novel"),
        expr("n_novel * 1000 div n_ngrams").as("novelty_permille"))
  }

  val q99Oracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND 'b'
      |      AS is_train,
      |    string_split_regex(lower(trim(text)), '\s+') AS w
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, is_train, shingle FROM (
      |    SELECT doc_id, is_train,
      |      unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
      |              || ' ' || w[i+4]
      |              for i in generate_series(1, len(w) - 4)]) AS shingle
      |    FROM t WHERE len(w) >= 5) x
      |), train AS (
      |  SELECT DISTINCT shingle FROM sh WHERE is_train
      |)
      |SELECT s.doc_id, count(*) AS n_ngrams,
      |  CAST(sum(CASE WHEN tr.shingle IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_novel,
      |  CAST(sum(CASE WHEN tr.shingle IS NULL THEN 1 ELSE 0 END) * 1000
      |       // count(*) AS BIGINT) AS novelty_permille
      |FROM sh s LEFT JOIN train tr ON tr.shingle = s.shingle
      |WHERE NOT s.is_train
      |GROUP BY 1""".stripMargin

  /** q137: temperature-scaled source mixture weights — the domain
    * reweighting pass (DoReMi / data-mixing style) that decides how
    * often each source is sampled during training. Per source: exact
    * token share in ppm, the inverse-share weight that would equalize
    * sources (uniform target), and the α = 0.5 temperature weight
    * ∝ share^(α−1) = 1/√share that UPWEIGHTS small domains without
    * fully flattening the mixture.
    *
    * Exactness: shares and inverse shares are integer-ppm divisions in
    * Decimal(38,0)/HUGEINT; the only float is the final
    * `sqrt(inv_share_ppm)` — a single sqrt of an exact integer, which
    * IEEE 754 requires to be correctly rounded, so it is bit-equal
    * across engines (the q115 invariant). No normalization sum over
    * doubles (order-dependent); consumers normalize the weights
    * themselves.
    *
    * Scale shape: one corpus scan into a partial-aggregatable
    * per-source count; everything after runs on the |sources|-row
    * frame with the 1-row total as a broadcast. */
  def q137MixtureWeights(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(spark, dir, "documents")
      .select(col("source"),
        size(graft.functions.TextFunctions.wsTokens(col("text")))
          .cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("source_tokens"))
    val tot = per.agg(sum(col("source_tokens")).as("total_tokens"),
      count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr(
        "(CAST(source_tokens AS DECIMAL(38,0)) * 1000000) div total_tokens"))
      .withColumn("inv_share_ppm", expr(
        "(CAST(total_tokens AS DECIMAL(38,0)) * 1000000) div source_tokens"))
      .withColumn("temp_weight", sqrt(col("inv_share_ppm").cast("double")))
      .select(col("source"), col("n_docs"), col("source_tokens"),
        col("share_ppm"), col("inv_share_ppm"), col("temp_weight"))
  }

  /** q162: token-budget water-filling allocator — the mixture PLANNER
    * that turns q137's per-source token inventory into an executable
    * sampling plan: spend a token budget B = [[Q162BudgetEpochs]]×(total
    * corpus tokens) across sources so that every source gets an EQUAL
    * token allocation (upweighting small sources) except that no source
    * may repeat more than [[Q162MaxEpochs]] epochs of itself — the
    * repetition cap LLM data work treats as a quality cliff. The
    * optimum is classic water-filling: sources whose capacity
    * cap·T_s sits below the water level saturate at their cap; the
    * rest split the remaining budget evenly.
    *
    * All integer and closed-form — no iteration: sort sources by
    * capacity ascending (ties by name); prefix sums give, for each
    * source, the budget left after saturating every smaller source
    * (B − prefix_{i−1}); source i saturates iff even handing ALL
    * remaining sources its capacity is affordable
    * (c_i·(n−i+1) ≤ B − prefix_{i−1} — monotone in i, so the
    * saturated set is a prefix). Unsaturated sources get
    * R* div m tokens (R* = budget after all saturations, m = their
    * count), with the leftover R* mod m spread one token each to the
    * first m-by-capacity-order — Σ allocated == B EXACTLY (asserted
    * in CurationSpec).
    *
    * Plan: one corpus scan for the token tally; the planning frame is
    * |sources| rows — prefix sums through [[Rank.globalPrefixSum]]
    * (lint-clean even if |sources| grew to millions), totals as a
    * 1-row broadcast. */
  val Q162MaxEpochs = 4L
  val Q162BudgetEpochs = 2L

  def q162TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.load(spark, dir, "documents")
      .select(col("source"),
        size(graft.functions.TextFunctions.wsTokens(col("text")))
          .cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tokens"))
      .withColumn("capacity", col("tokens") * Q162MaxEpochs)
    val tot = per.agg(sum(col("tokens")).as("t"), count(lit(1)).as("n"))
      .select((col("t") * Q162BudgetEpochs).as("budget"), col("n"))
    val ranked = Rank.groupRank(per, Seq.empty, "capacity", Seq("source"),
        "_r", "_nsrc")
      .drop("_nsrc")
    val pre = Rank.globalPrefixSum(ranked, "capacity", Seq("source"),
        "capacity", "prefix")
      .crossJoin(broadcast(tot))
      .withColumn("i", col("_r") + 1L) // 1-based position
      .withColumn("sat",
        col("capacity") * (col("n") - col("_r")) <=
          col("budget") - (col("prefix") - col("capacity")))
    val satStats = pre.agg(
      sum(when(col("sat"), 1L).otherwise(0L)).as("k"),
      sum(when(col("sat"), col("capacity")).otherwise(0L)).as("sat_total"))
    pre.crossJoin(broadcast(satStats))
      .withColumn("m", col("n") - col("k"))
      .withColumn("rstar", col("budget") - col("sat_total"))
      .withColumn("allocated",
        when(col("sat"), col("capacity")).otherwise(
          expr("rstar div m") +
            when(col("i") - col("k") <= col("rstar") % col("m"), 1L)
              .otherwise(0L)))
      .select(col("source"), col("tokens"), col("capacity"),
        col("allocated"), col("sat").as("saturated"),
        expr("(allocated * 1000000) div tokens").as("repeat_ppm"))
  }

  val q162Oracle: String =
    s"""WITH per AS (
       |  SELECT source,
       |    CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+')))
       |      AS BIGINT) AS tokens
       |  FROM documents GROUP BY 1
       |), cap AS (
       |  SELECT source, tokens, tokens * $Q162MaxEpochs AS capacity FROM per
       |), tot AS (
       |  SELECT CAST(sum(tokens) * $Q162BudgetEpochs AS BIGINT) AS budget,
       |    count(*) AS n
       |  FROM cap
       |), r AS (
       |  SELECT cap.*, tot.budget, tot.n,
       |    row_number() OVER (ORDER BY capacity ASC, source ASC) AS i,
       |    sum(capacity) OVER (ORDER BY capacity ASC, source ASC
       |      ROWS UNBOUNDED PRECEDING) AS prefix
       |  FROM cap CROSS JOIN tot
       |), s AS (
       |  SELECT *,
       |    capacity * (n - i + 1) <= budget - (prefix - capacity) AS sat
       |  FROM r
       |), ks AS (
       |  SELECT sum(CASE WHEN sat THEN 1 ELSE 0 END) AS k,
       |    CAST(sum(CASE WHEN sat THEN capacity ELSE 0 END) AS BIGINT)
       |      AS sat_total
       |  FROM s
       |)
       |SELECT source, tokens, capacity,
       |  CAST(CASE WHEN sat THEN capacity
       |    ELSE (budget - sat_total) // (n - k)
       |      + (CASE WHEN i - k <= (budget - sat_total) % (n - k)
       |         THEN 1 ELSE 0 END)
       |  END AS BIGINT) AS allocated,
       |  sat AS saturated,
       |  CAST((CASE WHEN sat THEN capacity
       |    ELSE (budget - sat_total) // (n - k)
       |      + (CASE WHEN i - k <= (budget - sat_total) % (n - k)
       |         THEN 1 ELSE 0 END)
       |  END * 1000000) // tokens AS BIGINT) AS repeat_ppm
       |FROM s CROSS JOIN ks""".stripMargin

  /** q165: dataset card — the datasheet row a corpus release ships
    * (corpus size, composition, duplication, central tendency) as ONE
    * query, melted to (metric, value) rows so a release pipeline can
    * diff cards across versions with a plain anti-join. Everything is
    * an exact integer: counts, ppm shares, and a nearest-rank median
    * through the bucketed global rank (no single-task sort). The
    * duplication metrics reuse the engine's own signals — q17's
    * content digest (exact) and q33's cluster membership (near) — so
    * the card can't drift from what the dedup pipeline would actually
    * do.
    *
    * Plan: one corpus scan feeds the token/char/doc tallies and the
    * rank pass; digests aggregate on the digest key; the q33 label
    * frame joins nothing (its row count is the metric); the final
    * frame is a dozen 1-row aggregates unioned at aggregate size. */
  def q165DatasetCard(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    // Persisted (the q141 precedent): four of the card's arms — the
    // base tallies, the digest dups, the source shares and the rank
    // pass — consume this same narrow frame, and each arm is a
    // broadcast subtree that materializes separately; without the
    // persist the scan AND the per-doc text functions (normalize, md5,
    // tokenize) re-run once per arm.
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        size(TF.wsTokens(col("text"))).cast("long").as("n_tokens"),
        md5(TF.normText(col("text"))).as("h"))
      .persist()
    // materialize ONCE before the five broadcast arms fan out (the
    // q104 codes.count() precedent): the arms' broadcast subqueries
    // run concurrently, and racing tasks each recompute a
    // not-yet-cached partition — with the scan spread this means five
    // duplicate shuffled tokenize+md5 passes (measured: q165 4.0 →
    // 9.1 s at sf0.1 before this count, back under 4 s with it).
    docs.count()
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum(col("n_tokens")).as("total_tokens"),
      sum(col("n_chars")).as("total_chars"))
    val dupDocs = docs.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .agg(coalesce(sum(col("c")), lit(0L)).as("exact_dup_docs"))
    val nearDocs = DedupOps.q33DedupClusters(spark, dir)
      .agg(count(lit(1)).as("near_dup_docs"))
    val topShare = docs.groupBy(col("source")).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("top_source_docs"))
    val medianTok = Rank.groupRank(docs.select(col("doc_id"), col("n_tokens")),
        Seq.empty, "n_tokens", Seq("doc_id"), "_rk", "_n")
      .filter(col("_rk") === expr("(_n - 1) div 2"))
      .select(col("n_tokens").as("median_doc_tokens"))
    val one = base.crossJoin(broadcast(dupDocs))
      .crossJoin(broadcast(nearDocs))
      .crossJoin(broadcast(topShare))
      .crossJoin(broadcast(medianTok))
    one.select(expr(
      """stack(9,
        |  'n_docs', n_docs,
        |  'n_sources', n_sources,
        |  'n_langs', n_langs,
        |  'total_tokens', total_tokens,
        |  'total_chars', total_chars,
        |  'median_doc_tokens', median_doc_tokens,
        |  'exact_dup_ppm', (exact_dup_docs * 1000000) div n_docs,
        |  'near_dup_ppm', (near_dup_docs * 1000000) div n_docs,
        |  'top_source_ppm', (top_source_docs * 1000000) div n_docs
        |) AS (metric, value)""".stripMargin))
  }

  val q165Oracle: String =
    s"""${DedupOps.ClusterCtePrefix}, d AS (
       |  SELECT doc_id, source, lang, length(text) AS n_chars,
       |    len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
       |    md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
       |  FROM documents
       |), base AS (
       |  SELECT count(*) AS n_docs, count(DISTINCT source) AS n_sources,
       |    count(DISTINCT lang) AS n_langs,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |    CAST(sum(n_chars) AS BIGINT) AS total_chars
       |  FROM d
       |), dups AS (
       |  SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS exact_dup_docs
       |  FROM (SELECT count(*) AS c FROM d GROUP BY h HAVING count(*) > 1)
       |), nears AS (
       |  SELECT count(*) AS near_dup_docs
       |  FROM (SELECT DISTINCT a FROM reach WHERE a <> b)
       |), tops AS (
       |  SELECT max(c) AS top_source_docs
       |  FROM (SELECT count(*) AS c FROM d GROUP BY source)
       |), med AS (
       |  SELECT n_tokens AS median_doc_tokens FROM (
       |    SELECT n_tokens, row_number() OVER (ORDER BY n_tokens ASC,
       |      doc_id ASC) - 1 AS rk, count(*) OVER () AS n
       |    FROM d) t
       |  WHERE rk = (n - 1) // 2
       |)
       |SELECT metric, CAST(value AS BIGINT) AS value FROM (
       |  SELECT unnest(['n_docs', 'n_sources', 'n_langs', 'total_tokens',
       |      'total_chars', 'median_doc_tokens', 'exact_dup_ppm',
       |      'near_dup_ppm', 'top_source_ppm']) AS metric,
       |    unnest([n_docs, n_sources, n_langs, total_tokens, total_chars,
       |      median_doc_tokens,
       |      (exact_dup_docs * 1000000) // n_docs,
       |      (near_dup_docs * 1000000) // n_docs,
       |      (top_source_docs * 1000000) // n_docs]) AS value
       |  FROM base CROSS JOIN dups CROSS JOIN nears
       |  CROSS JOIN tops CROSS JOIN med) u""".stripMargin

  /** q141: quality-decile duplicate-lift table — the calibration
    * report that answers "does the quality score predict boilerplate
    * duplication?" (the cross-signal sanity check a curation pipeline
    * runs before gating on either signal). Documents rank into global
    * deciles by the q14 quality score through [[Rank.groupRank]] (no
    * single-task global sort), each decile's near-dup rate (membership
    * in a q33 cluster) is compared to the corpus base rate, and the
    * ratio ships as integer-ppm lift.
    *
    * Exactness: the only doubles are the q14 scores themselves
    * (computed identically in both engines — the q95 precedent); decile
    * assignment is integer `(rk·10) div n`; rates and lifts are
    * integer-ppm divisions in Decimal(38,0)/HUGEINT. Plan: one rank
    * pass, a doc-keyed left join against the (small) cluster-member
    * set, one 10-row aggregate with the 1-row totals broadcast. */
  def q141DecileLift(spark: SparkSession, dir: String): DataFrame = {
    // Persisted: groupRank references its input three times (stats
    // broadcast, offsets broadcast, final pass) and the q14 score is a
    // regex-heavy projection — measured as three ~0.4 s single-stage
    // jobs in q141's JobProfile at sf0.1 (r12). The cache is two
    // columns per doc (guide §5: reused AND expensive to recompute).
    val scored = graft.ops.TextOps.q14Quality(spark, dir)
      .select(col("doc_id"), col("quality_score"))
      .persist()
    val dups = DedupOps.q33DedupClusters(spark, dir)
      .select(col("doc_id")).withColumn("is_dup", lit(1L))
    val labeled = Rank.groupRank(scored, Seq.empty, "quality_score",
        Seq("doc_id"), "rk", "n")
      .join(dups, Seq("doc_id"), "left")
      .withColumn("dup", coalesce(col("is_dup"), lit(0L)))
      .withColumn("decile", expr("(rk * 10) div n"))
    // persisted: 10 rows, but its lineage is the whole rank + LSH/CC
    // cluster pipeline — both consumers below (the totals and the final
    // projection) would otherwise re-run that pipeline end to end (the
    // q104 recompute cascade, measured 6.5 s -> ~3 s at sf0.1)
    val perDecile = labeled.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dup")).as("n_dups"))
      .persist()
    // corpus totals derived from the decile-sized frame, not a second
    // pass over the labeled corpus
    val tot = perDecile.agg(sum(col("n_docs")).as("total_docs"),
      sum(col("n_dups")).as("total_dups"))
    perDecile
      .crossJoin(broadcast(tot))
      .withColumn("dup_rate_ppm", expr("(n_dups * 1000000) div n_docs"))
      .withColumn("lift_ppm", expr(
        """(CAST(n_dups AS DECIMAL(38,0)) * total_docs * 1000000)
          |  div (CAST(n_docs AS DECIMAL(38,0)) * total_dups)""".stripMargin))
      .select(col("decile"), col("n_docs"), col("n_dups"),
        col("dup_rate_ppm"), col("lift_ppm"))
  }

  val q141Oracle: String =
    s"""${DedupOps.ClusterCtePrefix}, cl AS (
       |  SELECT DISTINCT a AS doc_id FROM reach WHERE a <> b
       |), t AS (
       |  SELECT doc_id,
       |    len(string_split_regex(trim(text), '\\s+')) AS ws,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
       |      / length(text) AS alpha_ratio,
       |    CAST(len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|a|is)\\b')) AS DOUBLE)
       |      / len(string_split_regex(trim(text), '\\s+')) AS stop_ratio
       |  FROM documents
       |), q AS (
       |  SELECT doc_id,
       |    alpha_ratio * 0.5 + least(stop_ratio * 5.0, 1.0) * 0.3
       |      + least(CAST(ws AS DOUBLE) / 100.0, 1.0) * 0.2 AS quality_score
       |  FROM t
       |), r AS (
       |  SELECT q.doc_id, quality_score,
       |    row_number() OVER (ORDER BY quality_score ASC, q.doc_id ASC) - 1
       |      AS rk,
       |    count(*) OVER () AS n,
       |    CASE WHEN cl.doc_id IS NULL THEN 0 ELSE 1 END AS dup
       |  FROM q LEFT JOIN cl ON cl.doc_id = q.doc_id
       |), tot AS (
       |  SELECT count(*) AS total_docs, sum(dup) AS total_dups FROM r
       |)
       |SELECT CAST((rk * 10) // n AS BIGINT) AS decile,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(dup) AS BIGINT) AS n_dups,
       |  CAST(sum(dup) * 1000000 // count(*) AS BIGINT) AS dup_rate_ppm,
       |  CAST((CAST(sum(dup) AS HUGEINT) * tot.total_docs * 1000000)
       |    // (CAST(count(*) AS HUGEINT) * tot.total_dups) AS BIGINT)
       |    AS lift_ppm
       |FROM r CROSS JOIN tot
       |GROUP BY 1, tot.total_docs, tot.total_dups""".stripMargin

  val q137Oracle: String =
    """WITH per AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(string_split_regex(lower(trim(text)), '\s+')))
      |      AS BIGINT) AS source_tokens
      |  FROM documents GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(source_tokens) AS BIGINT) AS total_tokens,
      |    count(*) AS n_sources
      |  FROM per
      |)
      |SELECT per.source, CAST(per.n_docs AS BIGINT) AS n_docs,
      |  per.source_tokens,
      |  CAST((CAST(per.source_tokens AS HUGEINT) * 1000000)
      |    // tot.total_tokens AS BIGINT) AS share_ppm,
      |  CAST((CAST(tot.total_tokens AS HUGEINT) * 1000000)
      |    // per.source_tokens AS BIGINT) AS inv_share_ppm,
      |  sqrt(CAST(CAST((CAST(tot.total_tokens AS HUGEINT) * 1000000)
      |    // per.source_tokens AS BIGINT) AS DOUBLE)) AS temp_weight
      |FROM per CROSS JOIN tot""".stripMargin

  /** q147: filter-funnel attrition report — the per-stage survival
    * accounting every curation pipeline publishes alongside its
    * output (what fraction of the crawl survived language ID, then
    * length, then repetition, then the token band — and where did the
    * volume go). Stages apply CUMULATIVELY (each counts docs that
    * passed every earlier stage too), so `docs_in` of stage k equals
    * `docs_out` of stage k−1 and the last `cum_survival_ppm` is the
    * pipeline yield.
    *
    * Plan: ONE corpus scan computes all four per-doc predicates in a
    * single codegen'd projection, one partial-aggregatable sum pass
    * reduces them to a single row, and `stack` unfolds that row into
    * the 4-row report — no per-stage scans, no joins, output
    * aggregate-sized. Counts and ppm scores are exact integers; the
    * zero-input division is guarded (NULL drop rate on an empty
    * stage, identically in both engines). */
  def q147FilterFunnel(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.functions.TextFunctions.wsTokens(col("text"))
    val flags = Tables.load(spark, dir, "documents")
      .select(col("lang"), col("n_chars"),
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_uniq"))
      .select(
        (col("lang") === "en").as("p1"),
        (col("n_chars") >= 150L).as("p2"),
        (col("n_uniq") * 100L >= col("n_tok") * 35L).as("p3"),
        (col("n_tok") <= 90L).as("p4"))
      .select(col("p1").as("c1"),
        (col("p1") && col("p2")).as("c2"),
        (col("p1") && col("p2") && col("p3")).as("c3"),
        (col("p1") && col("p2") && col("p3") && col("p4")).as("c4"))
    val tallied = flags.agg(
      count(lit(1)).as("total"),
      sum(when(col("c1"), 1L).otherwise(0L)).as("o1"),
      sum(when(col("c2"), 1L).otherwise(0L)).as("o2"),
      sum(when(col("c3"), 1L).otherwise(0L)).as("o3"),
      sum(when(col("c4"), 1L).otherwise(0L)).as("o4"))
    tallied.selectExpr(
        """stack(4,
          |  1L, 'lang_en',    total, o1,
          |  2L, 'min_len',    o1,    o2,
          |  3L, 'uniq_ratio', o2,    o3,
          |  4L, 'tok_band',   o3,    o4
          |) AS (stage_id, stage, docs_in, docs_out)""".stripMargin,
        "total")
      .select(col("stage_id"), col("stage"), col("docs_in"),
        col("docs_out"),
        expr("""CASE WHEN docs_in = 0 THEN NULL
                |  ELSE ((docs_in - docs_out) * 1000000) div docs_in
                |END""".stripMargin).as("drop_ppm"),
        expr("(docs_out * 1000000) div total").as("cum_survival_ppm"))
  }

  val q147Oracle: String =
    """WITH f AS (
      |  SELECT (lang = 'en') AS p1, (n_chars >= 150) AS p2,
      |    (len(list_distinct(string_split_regex(lower(trim(text)), '\s+')))
      |       * 100
      |     >= len(string_split_regex(lower(trim(text)), '\s+')) * 35)
      |      AS p3,
      |    (len(string_split_regex(lower(trim(text)), '\s+')) <= 90) AS p4
      |  FROM documents
      |), t AS (
      |  SELECT count(*) AS total,
      |    sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS o1,
      |    sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS o2,
      |    sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS o3,
      |    sum(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS o4
      |  FROM f
      |), s AS (
      |  SELECT 1 AS stage_id, 'lang_en' AS stage, total AS docs_in,
      |    o1 AS docs_out, total FROM t
      |  UNION ALL SELECT 2, 'min_len', o1, o2, total FROM t
      |  UNION ALL SELECT 3, 'uniq_ratio', o2, o3, total FROM t
      |  UNION ALL SELECT 4, 'tok_band', o3, o4, total FROM t
      |)
      |SELECT CAST(stage_id AS BIGINT) AS stage_id, stage,
      |  CAST(docs_in AS BIGINT) AS docs_in,
      |  CAST(docs_out AS BIGINT) AS docs_out,
      |  CAST(CASE WHEN docs_in = 0 THEN NULL
      |    ELSE ((docs_in - docs_out) * 1000000) // docs_in
      |  END AS BIGINT) AS drop_ppm,
      |  CAST((docs_out * 1000000) // total AS BIGINT) AS cum_survival_ppm
      |FROM s""".stripMargin

  /** q178: systematic PPS (probability-proportional-to-size) document
    * sampling — the deterministic token-budgeted subset selector:
    * walk the corpus in doc_id order, lay each doc's token weight end
    * to end on a number line, and take a sample at every multiple of
    * W/K (K = [[Q178SampleTarget]] sample points over total weight W).
    * A doc is selected with multiplicity = how many grid points land
    * inside its weight span: ⌊cum_i·K/W⌋ − ⌊(cum_i−w_i)·K/W⌋ — the
    * textbook systematic estimator with implicit start 0, fully
    * deterministic, exactly K draws corpus-wide, and big docs (span >
    * W/K) sampled with multiplicity ≥ 1 (certainty units) as PPS
    * requires.
    *
    * Plan: the cumulative weight comes from [[Rank.globalPrefixSum]]
    * (bucketed — no single-task global window); the 1-row total
    * broadcasts; selection is a per-row integer predicate. Products
    * stay in Decimal(38,0): cum·K ≤ corpus_tokens·K overflows int64
    * only past ~2·10¹⁴ tokens, which a 100 TB corpus reaches. */
  val Q178SampleTarget = 50

  def q178SystematicSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val docs = Tables.spread(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"),
        size(TF.wsTokens(col("text"))).cast("long").as("w"))
    val cum = Rank.globalPrefixSum(docs, "doc_id", Nil, "w", "cum_w")
    val tot = cum.agg(max(col("cum_w")).as("total_w"))
    cum.crossJoin(broadcast(tot))
      .withColumn("m", expr(
        s"""(CAST(cum_w AS DECIMAL(38,0)) * $Q178SampleTarget) div total_w
           | - (CAST(cum_w - w AS DECIMAL(38,0)) * $Q178SampleTarget)
           |     div total_w""".stripMargin).cast("long"))
      .filter(col("m") > 0)
      .select(col("doc_id"), col("w").as("n_tokens"), col("cum_w"),
        col("m").as("multiplicity"))
  }

  val q178Oracle: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
       |      AS w
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, w,
       |    sum(w) OVER (ORDER BY doc_id ASC) AS cum_w
       |  FROM d
       |), t AS (SELECT max(cum_w) AS total_w FROM c)
       |SELECT doc_id, w AS n_tokens, CAST(cum_w AS BIGINT) AS cum_w,
       |  CAST((CAST(cum_w AS HUGEINT) * $Q178SampleTarget) // total_w
       |    - (CAST(cum_w - w AS HUGEINT) * $Q178SampleTarget) // total_w
       |    AS BIGINT) AS multiplicity
       |FROM c CROSS JOIN t
       |WHERE (CAST(cum_w AS HUGEINT) * $Q178SampleTarget) // total_w
       |    - (CAST(cum_w - w AS HUGEINT) * $Q178SampleTarget) // total_w
       |  > 0""".stripMargin

  /** q188: leakage-safe train/val/test split — the fix for the classic
    * contamination bug the naive per-document hash split (q45's rule)
    * carries: near-duplicate documents land in DIFFERENT splits, so
    * the model is evaluated on paraphrases of its training data.
    * Split by CLUSTER instead: every member of a q33 near-dup cluster
    * hashes on the cluster representative (singletons on themselves),
    * so a whole duplicate family moves as one unit and cross-split
    * leakage is zero BY CONSTRUCTION. Per split: docs, distinct
    * clusters, char volume, near-dup edges landing in the split, and
    * the edges the naive doc-level rule would have torn across splits
    * — the measured leakage this operator eliminates.
    *
    * Scale shape: the split tag is a scalar hash (no shuffle); stats
    * are one hash aggregate; the audit join keys edges on doc_id
    * against the tagged frame (hash-partitioned, edge-bounded). The
    * clustering input is q33's star-contraction — already the scale
    * path. Same md5-nibble split rule as q45 (12/2/2 of 16) so the
    * two operators' splits are comparable in reports. */
  def q188LeakageSplit(spark: SparkSession, dir: String): DataFrame = {
    def splitOf(c: Column): Column = {
      val h = substring(md5(c.cast("string")), 1, 1)
      when(h.between("0", "b"), "train")
        .when(h.isin("c", "d"), "val")
        .otherwise("test")
    }
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    // ONE candidate+verify pipeline for both consumers: the split tag
    // needs the clusters, the torn-edge audit needs the raw pair rows
    // — calling q33 and q18 separately ran the whole LSH prefix-join +
    // verify twice (r12 JobProfile; the CC loop materializes its
    // input eagerly, so the persisted edge frame costs no extra
    // barrier — the loop IS the barrier).
    val edges = DedupOps.q18NgramJaccard(spark, dir)
      .select(col("doc_id_1"), col("doc_id_2"))
      .persist()
    val clusters = DedupOps.dedupClustersOfEdges(edges)
      .select(col("doc_id"), col("cluster_rep"))
    val tagged = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_key", coalesce(col("cluster_rep"), col("doc_id")))
      .withColumn("split", splitOf(col("cluster_key")))
    val stats = tagged.groupBy(col("split")).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("cluster_key")).as("n_clusters"),
      sum(col("n_chars")).as("total_chars"))
    // each edge belongs to exactly one cluster-aware split (both
    // endpoints share a cluster, hence a split); count how many of
    // them the naive doc-hash rule would separate
    val torn = edges
      .withColumn("torn",
        when(splitOf(col("doc_id_1")) =!= splitOf(col("doc_id_2")), 1L)
          .otherwise(0L))
      .join(tagged.select(col("doc_id").as("doc_id_1"), col("split")), "doc_id_1")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_edges"), sum(col("torn")).as("naive_torn_edges"))
    stats.join(torn, Seq("split"), "left")
      .select(col("split"), col("n_docs"), col("n_clusters"), col("total_chars"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        coalesce(col("naive_torn_edges"), lit(0L)).as("naive_torn_edges"))
  }

  /** Composes [[DedupOps.ClusterCtePrefix]] (the q33 ground truth) so
    * the split audit and the clustering stay definitionally in
    * lockstep. */
  val q188Oracle: String = {
    def splitSql(c: String): String =
      s"""CASE WHEN substring(md5(CAST($c AS VARCHAR)), 1, 1) BETWEEN '0' AND 'b' THEN 'train'
         |         WHEN substring(md5(CAST($c AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
         |         ELSE 'test' END""".stripMargin
    s"""${DedupOps.ClusterCtePrefix}, cl AS (
       |  SELECT a AS doc_id, least(a, min(b)) AS cluster_rep
       |  FROM (SELECT a, b FROM reach WHERE a <> b) t GROUP BY a
       |), tagged AS (
       |  SELECT d.doc_id, d.n_chars,
       |    coalesce(cl.cluster_rep, d.doc_id) AS cluster_key,
       |    ${splitSql("coalesce(cl.cluster_rep, d.doc_id)")} AS split
       |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
       |), stats AS (
       |  SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(count(DISTINCT cluster_key) AS BIGINT) AS n_clusters,
       |    CAST(sum(n_chars) AS BIGINT) AS total_chars
       |  FROM tagged GROUP BY split
       |), torn AS (
       |  SELECT t.split, CAST(count(*) AS BIGINT) AS n_edges,
       |    CAST(sum(CASE WHEN ${splitSql("e.d1")} <> ${splitSql("e.d2")}
       |      THEN 1 ELSE 0 END) AS BIGINT) AS naive_torn_edges
       |  FROM edges e JOIN tagged t ON e.d1 = t.doc_id
       |  GROUP BY t.split)
       |SELECT s.split, s.n_docs, s.n_clusters, s.total_chars,
       |  coalesce(t.n_edges, CAST(0 AS BIGINT)) AS n_edges,
       |  coalesce(t.naive_torn_edges, CAST(0 AS BIGINT)) AS naive_torn_edges
       |FROM stats s LEFT JOIN torn t ON s.split = t.split""".stripMargin
  }

  /** q203: contrastive preference-pair construction — the RLHF/DPO
    * data-prep step that turns a scored corpus into (chosen, rejected)
    * training pairs. The naive recipe ("join every good doc with every
    * bad doc in its source, pick contrasts") is quadratic per source
    * and sources are few — a guaranteed 100 TB blowup. This operator
    * pairs by QUANTILE MATCHING instead: rank each source's docs by
    * quality (here: distinct-token count — swap in any scorer), take
    * the top half as chosen and bottom half as rejected, and pair the
    * i-th best with the i-th worst positionally. One equi-join on
    * (source, position), pair count = ⌊n/2⌋ per source, quality gap
    * maximal at the extremes and ≥ 0 by construction for every pair.
    *
    * Ranks come from [[Rank.groupRank]] (bucketed two-phase rank — no
    * source-sized single-task sort), so the whole pipeline is two
    * keyed aggregates, the rank machinery, and one join. */
  def q203PreferencePairs(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val q = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(TF.wsTokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("source"))
      .agg(countDistinct(col("term")).as("q"))
      .withColumn("negq", -col("q"))
    val ranked = Rank.groupRank(q, Seq("source"), "negq", Seq("doc_id"),
      "rk", "n").persist()
    val m = expr("n div 2")
    val chosen = ranked.filter(col("rk") < m)
      .select(col("source"), col("doc_id").as("chosen_doc"),
        col("q").as("q_chosen"), col("rk").as("i"))
    val rejected = ranked.filter(col("rk") >= col("n") - m)
      .select(col("source"), col("doc_id").as("rejected_doc"),
        col("q").as("q_rejected"), (col("rk") - (col("n") - m)).as("i"))
    chosen.join(rejected, Seq("source", "i"))
      .select(col("source"), col("chosen_doc"), col("rejected_doc"),
        col("q_chosen"), col("q_rejected"),
        (col("q_chosen") - col("q_rejected")).as("gap"))
  }

  val q203Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    unnest(string_split(lower(trim(text)), ' ')) AS term
      |  FROM documents
      |), sc AS (
      |  SELECT doc_id, source, count(DISTINCT term) AS q
      |  FROM toks GROUP BY 1, 2
      |), r AS (
      |  SELECT doc_id, source, q,
      |    row_number() OVER (PARTITION BY source ORDER BY q DESC, doc_id) - 1
      |      AS rk,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM sc
      |), c AS (
      |  SELECT source, doc_id AS chosen_doc, q AS q_chosen, rk AS i
      |  FROM r WHERE rk < n // 2
      |), j AS (
      |  SELECT source, doc_id AS rejected_doc, q AS q_rejected,
      |    rk - (n - n // 2) AS i
      |  FROM r WHERE rk >= n - n // 2)
      |SELECT c.source, chosen_doc, rejected_doc,
      |  CAST(q_chosen AS BIGINT) AS q_chosen,
      |  CAST(q_rejected AS BIGINT) AS q_rejected,
      |  CAST(q_chosen - q_rejected AS BIGINT) AS gap
      |FROM c JOIN j ON c.source = j.source AND c.i = j.i""".stripMargin

  /** q214: temperature-balanced mixture allocation — the multilingual
    * sampling step (p_i ∝ n_i^α with α = 1/2) that keeps low-resource
    * languages from vanishing out of a training mix. Per language:
    * weight = ⌊√n⌋ (EXACT integer square root — ⌊sqrt⌋ is computed in
    * doubles then corrected by one integer comparison each way, so a
    * boundary ulp can never flip it on either engine), then a budget of
    * [[Q214Budget]] documents is split by largest-remainder (Hamilton)
    * apportionment: floor shares first, the leftover goes to the
    * largest remainders (ties → lexicographic lang). Allocations sum to
    * the budget EXACTLY — asserted in CurationSpec.
    *
    * Scale shape: one grouped count per language (a map-side partial
    * count), then all apportionment arithmetic — windows included —
    * runs on the language-count frame, which is bounded by |languages|,
    * not by data. */
  val Q214Budget = 100000L

  def q214TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.load(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    // exact integer sqrt: float estimate, then ±1 integer correction
    val w0 = floor(sqrt(col("n_docs").cast("double"))).cast("long")
    val w1 = when(w0 * w0 > col("n_docs"), w0 - 1L).otherwise(w0)
    val weighted = counts.withColumn("weight",
      when((w1 + 1L) * (w1 + 1L) <= col("n_docs"), w1 + 1L).otherwise(w1))
    val totW = weighted.agg(sum(col("weight")).as("tot_w"))
    val shares = weighted.crossJoin(broadcast(totW))
      .withColumn("alloc_floor",
        expr(s"CAST(weight AS DECIMAL(38,0)) * $Q214Budget div tot_w"))
      .withColumn("rem", (col("weight") * Q214Budget) % col("tot_w"))
    // everything below operates on the |languages|-sized frame
    val wRem = Window.orderBy(col("rem").desc, col("lang"))
    val wAll = Window.partitionBy()
    shares
      .withColumn("rem_rank", row_number().over(wRem))
      .withColumn("leftover",
        lit(Q214Budget) - sum(col("alloc_floor")).over(wAll))
      .select(col("lang"), col("n_docs"), col("weight"),
        (col("alloc_floor") +
          when(col("rem_rank") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc"))
  }

  val q214Oracle: String =
    s"""WITH counts AS (
       |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1
       |), w AS (
       |  SELECT lang, n_docs,
       |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w0
       |  FROM counts
       |), w1 AS (
       |  SELECT lang, n_docs,
       |    CASE WHEN w0 * w0 > n_docs THEN w0 - 1 ELSE w0 END AS w1
       |  FROM w
       |), wt AS (
       |  SELECT lang, n_docs,
       |    CASE WHEN (w1 + 1) * (w1 + 1) <= n_docs THEN w1 + 1 ELSE w1 END
       |      AS weight
       |  FROM w1
       |), tot AS (SELECT sum(weight) AS tot_w FROM wt
       |), shares AS (
       |  SELECT lang, n_docs, weight,
       |    CAST(weight * ${Q214Budget} // tot_w AS BIGINT) AS alloc_floor,
       |    CAST(weight * ${Q214Budget} % tot_w AS BIGINT) AS rem
       |  FROM wt CROSS JOIN tot
       |), ranked AS (
       |  SELECT *, row_number() OVER (ORDER BY rem DESC, lang) AS rem_rank,
       |    ${Q214Budget} - sum(alloc_floor) OVER () AS leftover
       |  FROM shares)
       |SELECT lang, n_docs, CAST(weight AS BIGINT) AS weight,
       |  CAST(alloc_floor +
       |    CASE WHEN rem_rank <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
       |FROM ranked""".stripMargin

  /** q221: weighted sampling WITHOUT replacement, exact-k — the
    * Efraimidis–Spirakis bottom-k scheme realized with integer-only
    * machinery: an item of integer weight w is replicated w times with
    * independent md5 "random" keys, its priority is the MINIMUM key
    * (min of w uniforms ~ Beta(1, w) — exactly the E–S priority law),
    * and the sample is the k lowest priorities corpus-wide. Heavier
    * line items (by quantity) are proportionally likelier to win, no
    * item can win twice, and the whole draw is deterministic —
    * membership itself is hash-checked against the oracle.
    *
    * Scale shape: the replication factor is the mean weight — kept a
    * small CONSTANT by bucketing total quantity (w = 1 + Σqty÷10, a
    * handful of replicas per item; full-resolution weights would 25×
    * the hash work for the same ranking law) — the min collapses
    * map-side before any exchange,
    * and the final k = 20 selection is a TakeOrdered (per-partition
    * top-k heaps, never a global sort). Md5 hex compares
    * lexicographically = numerically (fixed length, one case), so
    * priorities never leave string space. */
  val Q221K = 20

  def q221WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in this corpus — the
    // item universe is the aggregated pair, weighted by total quantity
    val li = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("qty_sum"))
      .select(col("l_orderkey"), col("l_linenumber"),
        (lit(1) + (col("qty_sum") / lit(10L)).cast("int")).as("w"))
    // the min-of-w hashes folds INLINE over a generated array — after
    // the item pre-aggregation the key is unique, so a second
    // item-cardinality shuffle (explode → regroup → min) would only
    // re-partition what is already grouped; array_min keeps the whole
    // priority computation map-side (measured 8x-soak: 20.1 s → the
    // one-shuffle plan, with the TakeOrdered heap the only exchange
    // after the pre-agg)
    li.select(col("l_orderkey"), col("l_linenumber"), col("w"),
        array_min(transform(sequence(lit(1), col("w")),
          i => md5(concat(lit("ws_"), col("l_orderkey").cast("string"),
            lit("_"), col("l_linenumber").cast("string"), lit("_"),
            i.cast("string"))))).as("priority"))
      .orderBy(col("priority"), col("l_orderkey"), col("l_linenumber"))
      .limit(Q221K)
  }

  val q221Oracle: String =
    s"""WITH items AS (
       |  SELECT l_orderkey, l_linenumber,
       |    1 + CAST(sum(CAST(round(l_quantity) AS BIGINT)) // 10 AS INT)
       |      AS w
       |  FROM lineitem GROUP BY 1, 2
       |)
       |SELECT l_orderkey, l_linenumber, w, min(h) AS priority
       |FROM (
       |  SELECT l.l_orderkey, l.l_linenumber, l.w,
       |    md5('ws_' || l.l_orderkey || '_' || l.l_linenumber || '_' || t.i)
       |      AS h
       |  FROM items l,
       |  LATERAL unnest(generate_series(1, l.w)) AS t(i))
       |GROUP BY 1, 2, 3
       |ORDER BY priority, l_orderkey, l_linenumber
       |LIMIT $Q221K""".stripMargin

  /** q250: CART split-gain feature ranking — before anyone trains a
    * model on the event stream, which candidate features actually
    * separate converters from non-converters? For each feature, the
    * Gini impurity DECREASE of splitting the corpus by its values
    * (Breiman et al. 1984's split criterion, the supervised step up
    * from q242's unsupervised impurity): gain = G(parent) −
    * Σ_v (n_v/n)·G(child_v). A near-zero gain says drop the feature
    * before it bloats the pipeline; a suspiciously LARGE gain on an
    * id-like feature is the leakage smell q188 splits guard against.
    *
    * Exact protocol: every child impurity is one truncating ppm
    * division on integer counts (G_ppm = (n² − pos² − neg²)·10⁶ div
    * n²), the weighted sum floors once more over the cell frame, and
    * the parent term uses the same formula — both engines replay the
    * identical floor order. Candidate features are deterministic
    * integer buckets (hour of day, day of week, value band, a user
    * hash bucket).
    *
    * Scale shape: the corpus melts through one generated `stack` into
    * (feature, bucket, label) triples — ONE map-combined shuffle to
    * the cell frame (bounded by Σ per-feature buckets), and both
    * impurity rollups re-aggregate cells. */
  val Q250Features: Seq[(String, String)] = Seq(
    "hour_of_day" -> "hour(ts)",
    "day_of_week" -> "dayofweek(ts)",
    "value_band" -> "CAST(round(value * 100.0) AS BIGINT) div 2000",
    "user_bucket" -> "pmod(user_id, 16)")

  def q250SplitGain(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Q250Features.map { case (n, e) =>
      s"'$n', CAST($e AS BIGINT)"
    }.mkString(", ")
    val cells = Tables.load(spark, dir, "events")
      .select(expr(s"stack(${Q250Features.length}, $pairs)")
          .as(Seq("feature", "bucket")),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      .groupBy(col("feature"), col("bucket"))
      .agg(count(lit(1)).as("n_v"), sum(col("pos")).as("pos_v"))
    cells.groupBy(col("feature"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("n_v")).as("n"), sum(col("pos_v")).as("pos"),
        sum(expr("""n_v * ((CAST(n_v AS DECIMAL(38,0)) * n_v
                   | - CAST(pos_v AS DECIMAL(38,0)) * pos_v
                   | - CAST(n_v - pos_v AS DECIMAL(38,0)) * (n_v - pos_v))
                   | * 1000000
                   | div (CAST(n_v AS DECIMAL(38,0)) * n_v))"""
          .stripMargin)).as("wsum"))
      .select(col("feature"), col("n_buckets"),
        expr("""CAST((CAST(n AS DECIMAL(38,0)) * n
               | - CAST(pos AS DECIMAL(38,0)) * pos
               | - CAST(n - pos AS DECIMAL(38,0)) * (n - pos)) * 1000000
               | div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"""
          .stripMargin).as("parent_ppm"),
        expr("CAST(wsum div n AS BIGINT)").as("weighted_child_ppm"))
      .withColumn("gain_ppm",
        col("parent_ppm") - col("weighted_child_ppm"))
  }

  val q250Oracle: String = {
    def one(n: String, e: String): String =
      s"SELECT '$n' AS feature, CAST($e AS BIGINT) AS bucket," +
        s" CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos" +
        s" FROM events"
    val melted = Q250Features.map { case (n, e) =>
      val de = e
        .replace("hour(ts)", "CAST(hour(ts) AS BIGINT)")
        .replace("dayofweek(ts)", "CAST(dayofweek(ts) + 1 AS BIGINT)")
        .replace(" div ", " // ")
        .replace("pmod(user_id, 16)", "user_id % 16")
      one(n, de)
    }.mkString("\nUNION ALL\n")
    s"""WITH melted AS (
       |$melted
       |), cells AS (
       |  SELECT feature, bucket, count(*) AS n_v,
       |    CAST(sum(pos) AS BIGINT) AS pos_v
       |  FROM melted GROUP BY 1, 2
       |), agg AS (
       |  SELECT feature, count(*) AS n_buckets,
       |    CAST(sum(n_v) AS BIGINT) AS n, CAST(sum(pos_v) AS BIGINT) AS pos,
       |    CAST(sum(n_v * ((CAST(n_v AS HUGEINT) * n_v
       |      - CAST(pos_v AS HUGEINT) * pos_v
       |      - CAST(n_v - pos_v AS HUGEINT) * (n_v - pos_v)) * 1000000
       |      // (CAST(n_v AS HUGEINT) * n_v))) AS HUGEINT) AS wsum
       |  FROM cells GROUP BY 1
       |)
       |SELECT feature, n_buckets,
       |  CAST((CAST(n AS HUGEINT) * n - CAST(pos AS HUGEINT) * pos
       |    - CAST(n - pos AS HUGEINT) * (n - pos)) * 1000000
       |    // (CAST(n AS HUGEINT) * n) AS BIGINT) AS parent_ppm,
       |  CAST(wsum // n AS BIGINT) AS weighted_child_ppm,
       |  CAST((CAST(n AS HUGEINT) * n - CAST(pos AS HUGEINT) * pos
       |    - CAST(n - pos AS HUGEINT) * (n - pos)) * 1000000
       |    // (CAST(n AS HUGEINT) * n) AS BIGINT)
       |    - CAST(wsum // n AS BIGINT) AS gain_ppm
       |FROM agg""".stripMargin
  }

  /** q251: smoothed target encoding (the m-estimate / "mean encoding"
    * of Micci-Barreca 2001) — replacing a high-cardinality categorical
    * (the user id) with its shrunken conversion rate, the standard
    * feature-prep step before gradient-boosting on tabular events.
    * enc = (conversions + m·prior) / (n + m) with m = [[Q251M]]: a
    * user with 2 events reads mostly as the global prior, a user with
    * 500 events reads as their own rate — exactly the bias/variance
    * knob the raw per-key mean lacks (and the raw mean is the classic
    * overfit-leak this op exists to prevent).
    *
    * Exact protocol: prior_ppm = total_conv·10⁶ div n (floored once,
    * globally); enc_ppm = (conv_u·10⁶ + m·prior_ppm) div (n_u + m) —
    * integer end to end, one truncating division per key, the prior
    * broadcast as a 1-row frame.
    *
    * Scale shape: ONE map-combined aggregate to the per-key frame;
    * the prior re-aggregates it. Keys are emitted with their support
    * so a consumer can threshold. */
  val Q251M = 10L

  def q251TargetEncoding(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.load(spark, dir, "events")
      .select(col("user_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("pos")).as("n_conv"))
    val prior = perUser
      .agg(sum(col("n_events")).as("n"), sum(col("n_conv")).as("conv"))
      .select(expr("CAST(conv AS DECIMAL(38,0)) * 1000000 div n")
        .cast("long").as("prior_ppm"))
    perUser.crossJoin(broadcast(prior))
      .select(col("user_id"), col("n_events"), col("n_conv"),
        col("prior_ppm"),
        expr(s"""CAST((CAST(n_conv AS DECIMAL(38,0)) * 1000000
                 | + $Q251M * prior_ppm) div (n_events + $Q251M)
                 | AS BIGINT)""".stripMargin).as("enc_ppm"))
  }

  val q251Oracle: String =
    s"""WITH u AS (
       |  SELECT user_id, count(*) AS n_events,
       |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_conv
       |  FROM events GROUP BY 1
       |), p AS (
       |  SELECT CAST(CAST(sum(n_conv) AS HUGEINT) * 1000000
       |    // sum(n_events) AS BIGINT) AS prior_ppm
       |  FROM u
       |)
       |SELECT user_id, n_events, n_conv, prior_ppm,
       |  CAST((CAST(n_conv AS HUGEINT) * 1000000 + $Q251M * prior_ppm)
       |    // (n_events + $Q251M) AS BIGINT) AS enc_ppm
       |FROM u CROSS JOIN p""".stripMargin
}
