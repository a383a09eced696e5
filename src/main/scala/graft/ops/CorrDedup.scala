package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{CorrUtil, DotProduct, LshBandKeys, ProjectCentered, SqDistFloat, TokenBucketCounts}

/** q35: recall-controlled LSH near-duplicate detection over document
  * token profiles — the scale path the exact-quadratic q25 is not.
  *
  * Pipeline (all exact-integer statistics, so the DuckDB oracle
  * reproduces every double bit-for-bit):
  *
  *  1. One codegen'd scan builds a 256-dim token-bucket count vector
  *     per doc (TokenBucketCounts; md5-hex bucketing that DuckDB can
  *     express verbatim).
  *  2. Docs are compared by PEARSON CORRELATION of their count vectors
  *     (= cosine after centering on the corpus mean). Centering is what
  *     makes LSH possible: raw same-language count vectors share a huge
  *     stopword component (measured median cosine 0.63 on this corpus),
  *     so every hyperplane sign would agree; centered, random pairs sit
  *     at ~0 and near-dups at ~1.
  *  3. Sign-LSH blocking: 16 bands × 12 hyperplane bits, plus Hamming-1
  *     multi-probe (each doc probes its band key and the 12 one-bit
  *     flips). A pair at exactly the 0.9 threshold has per-bit agree
  *     probability p = 1 − arccos(0.9)/π ≈ 0.856 and per-band
  *     (Hamming ≤ 1) hit rate p¹² + 12p¹¹(1−p) ≈ 0.47, so the miss
  *     probability across 16 bands is (1−0.47)¹⁶ ≈ 4e-5 — and pairs
  *     above the threshold vanish exponentially faster. Measured on
  *     this corpus: recall 1.0 at every SF; candidates ≈ 15% of all
  *     pairs (the corpus has mid-correlation structure; on random data
  *     the collision rate is 16·13/2¹² ≈ 0.6%).
  *  4. EXACTNESS-PRESERVING candidate prune (the r7 fix for the
  *     quadratic verify tail): each doc carries a 32-float projection
  *     of its unit-centered vector onto the top-32 orthonormal
  *     directions of the corpus second moment (power-iterated on the
  *     driver from a 2048-doc sample; stats-sized). Orthonormal
  *     projection never increases distance, so
  *     ‖proj_a − proj_b‖² ≤ ‖û_a − û_b‖² = 2 − 2·corr(a,b):
  *     any pair whose projected distance² exceeds 2 − 2·0.9 (+ a
  *     float-rounding margin) PROVABLY has corr < 0.9 and is dropped
  *     inside the band-join condition — before the distinct and before
  *     the 256-dim verify ever see it. The prune is semantics-free
  *     (only provably-below-threshold pairs die; NaN/degenerate
  *     projections never prune), but it is what makes the operator
  *     scale: the corpus's residual correlation mass concentrates in
  *     few principal directions (the same structure that makes sign-LSH
  *     collide on ~15 % of pairs), so the top-32 projection captures
  *     almost all of a mid-correlation pair's distance and kills it at
  *     32-flop cost instead of 256-flop verify + pair-shuffle cost.
  *     Measured at the 10× sighting: the verify tail collapses from a
  *     constant fraction of all pairs to ~the true near-dup set.
  *  5. Exact verify on surviving candidates, via the integer decomposition
  *     corr = (D − (Pa+Pb)/N + Q/N²) /
  *            (√(SSa − 2Pa/N + Q/N²) · √(SSb − 2Pb/N + Q/N²))
  *     where D = Σ aᵢbᵢ, Pa = Σ aᵢSᵢ, SSa = Σ aᵢ², Q = Σ Sᵢ² are exact
  *     integers (S = per-bucket corpus totals, N = doc count) — every
  *     division happens on exact doubles, so Spark and DuckDB agree to
  *     the last ulp.
  *
  * 100 TB shape: stats are one tiny (256-key) aggregate; signatures are
  * one codegen'd scan; candidates shuffle on (band, key) — bands·(1 +
  * bitsPerBand) rows per doc, each carrying the 128-byte prune
  * projection; colliding pairs pay a 32-flop codegen'd distance and
  * only the provably-possible survivors reach the distinct + 2 KB
  * verify join. No materialized stage is quadratic in the corpus; the
  * collision stream is the only super-linear term and it is consumed
  * at filter cost, not join-materialization cost (measured at the 10×
  * sighting: 212 s → 19.6 s). (At a true 100 TB corpus the Long bucket
  * totals would be summed as Decimal(38,0) like connectedComponents'
  * signature — at any testable scale Long is exact.)
  */
object CorrDedup {

  val Dim = 256
  val CorrThreshold = 0.9
  val Bands = 16
  val BitsPerBand = 12
  val Seed = 42L
  /** Candidate-prune projection: top-`ProjDims` subspace from a
    * `SampleN`-doc sample, `PowerIters` power iterations (driver-side;
    * exactness never depends on these — only the prune rate does). */
  val ProjDims = 32
  val SampleN = 1024
  val PowerIters = 8
  /** Keep a pair unless its projected distance² provably exceeds
    * 2 − 2·threshold; the margin dominates every rounding source
    * (float32 storage ~1e-5, double matvec ~1e-12). */
  val PruneBound: Double = 2.0 * (1.0 - CorrThreshold) + 1e-4

  def q35LshNearDup(spark: SparkSession, dir: String): DataFrame =
    corrNearDup(Tables.load(spark, dir, "documents"))

  /** The LSH-blocked pipeline; `exhaustive = true` replaces the LSH
    * candidate stage with all pairs (the recall yardstick used by
    * DedupSpec — outputs must be identical). */
  def corrNearDup(docs: DataFrame, exhaustive: Boolean = false): DataFrame = {
    val vecs = docs
      .select(col("doc_id"), TokenBucketCounts(col("text"), Dim).as("cnt"))
      .persist()

    // Exact corpus statistics (one count + one 256-key aggregate; the
    // collect is 256 longs regardless of corpus size).
    val n = vecs.count()
    val nd = n.toDouble
    val s = new Array[Long](Dim)
    vecs.select(posexplode(col("cnt")).as(Seq("i", "c")))
      .groupBy(col("i")).agg(sum(col("c")).as("s"))
      .collect().foreach(r => s(r.getInt(0)) = r.getLong(1))
    var q = 0L
    var i = 0
    while (i < Dim) { q += s(i) * s(i); i += 1 }
    val qn2 = q.toDouble / (nd * nd)

    // Mean-vector projections for the sign bits: hmu_k = (h_k · S) / N.
    val planes = CorrUtil.planes(Seed, Bands * BitsPerBand, Dim)
    val hmu = planes.map { p =>
      var acc = 0.0
      var j = 0
      while (j < Dim) { acc += p(j) * s(j); j += 1 }
      acc / nd
    }

    // Prune basis: top-ProjDims orthonormal directions of the sampled
    // unit-centered second moment (driver-side, stats-sized: 2048×256
    // doubles collected once; see scaladoc §4 for why any orthonormal
    // set keeps the prune exact).
    val mu = Array.tabulate(Dim)(j => s(j) / nd)
    val sampleU = vecs.orderBy(col("doc_id")).limit(SampleN)
      .select(col("cnt")).collect()
      .flatMap { r =>
        val c = r.getSeq[Long](0)
        val a = Array.tabulate(Dim)(j => c(j) - mu(j))
        var n2 = 0.0
        var j = 0
        while (j < Dim) { n2 += a(j) * a(j); j += 1 }
        if (n2 > 1e-18) { val nr = math.sqrt(n2); Some(a.map(_ / nr)) } else None
      }
    val basis = CorrUtil.topSubspace(sampleU, ProjDims, PowerIters, Seed + 1)
    val bmu = basis.map { bj =>
      var acc = 0.0
      var j = 0
      while (j < Dim) { acc += bj(j) * mu(j); j += 1 }
      acc
    }

    val sLit = array(s.map(v => lit(v.toDouble)): _*)
    val scal = vecs
      .select(col("doc_id"), col("cnt"), col("cnt").cast("array<double>").as("v"))
      .select(col("doc_id"), col("cnt"), col("v"),
        DotProduct(col("v"), sLit).as("p"),
        DotProduct(col("v"), col("v")).as("ss"))
      .withColumn("proj", ProjectCentered(col("v"),
        sqrt(col("ss") - lit(2.0) * col("p") / lit(nd) + lit(qn2)), basis, bmu))

    val cand =
      if (exhaustive)
        vecs.select(col("doc_id").as("doc_id_1")).crossJoin(
          vecs.select(col("doc_id").as("doc_id_2")))
          .filter(col("doc_id_1") < col("doc_id_2"))
      else {
        val keys = scal.select(col("doc_id"), col("proj"),
          explode(LshBandKeys(col("cnt"), hmu, Seed, Bands, BitsPerBand)).as("key"))
        // Probe side: the band key itself plus its 12 Hamming-1 flips —
        // a base⋈probe equi-join then finds every pair within Hamming 1
        // of some band (flips stay inside the band's keyspace because
        // keys are band-offset in the high bits).
        val flips = col("key") +: (0 until BitsPerBand)
          .map(f => col("key").bitwiseXOR(lit(1L << f)))
        val probes = keys.select(col("doc_id"), col("proj"),
          explode(array(flips: _*)).as("key"))
        // The projection prune rides the join condition (`!(d² > bound)`
        // so NaN/degenerate projections KEEP the pair — prune only on a
        // definite finite exceedance): colliding-but-provably-dissimilar
        // pairs die here, before the distinct and the 256-dim verify.
        keys.as("x")
          .join(probes.as("y"),
            col("x.key") === col("y.key") && col("x.doc_id") < col("y.doc_id") &&
              !(SqDistFloat(col("x.proj"), col("y.proj")) > lit(PruneBound)))
          .select(col("x.doc_id").as("doc_id_1"), col("y.doc_id").as("doc_id_2"))
          .distinct()
      }

    val a = scal.select(col("doc_id").as("doc_id_1"), col("v").as("v1"),
      col("p").as("p1"), col("ss").as("ss1"))
    val b = scal.select(col("doc_id").as("doc_id_2"), col("v").as("v2"),
      col("p").as("p2"), col("ss").as("ss2"))
    // broadcast the per-doc vectors instead of shuffling 2 KB of
    // array per candidate pair — candidates stay in place and the
    // verify is a map-side hash probe + one codegen'd dot product.
    // At corpus scales where the vector table outgrows a broadcast,
    // set graft.dedup.broadcastVerifyArrays=false: two hash joins on
    // the doc ids; the candidate set is already the small side by then.
    val bc: DataFrame => DataFrame =
      if (DedupOps.useBroadcastVerify(scal.sparkSession)) broadcast else identity
    cand
      .join(bc(a), "doc_id_1")
      .join(bc(b), "doc_id_2")
      .select(col("doc_id_1"), col("doc_id_2"),
        ((DotProduct(col("v1"), col("v2")) -
          (col("p1") + col("p2")) / lit(nd) + lit(qn2)) /
          (sqrt(col("ss1") - lit(2.0) * col("p1") / lit(nd) + lit(qn2)) *
            sqrt(col("ss2") - lit(2.0) * col("p2") / lit(nd) + lit(qn2))))
          .as("corr"))
      .filter(col("corr") >= CorrThreshold)
  }

  /** Exhaustive all-pairs centered correlation in DuckDB over the same
    * integer components — LSH recall on this corpus is exactly 1.0
    * (§3 of the scaladoc), so the blocked output equals this. */
  val q35Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
       |  FROM documents
       |), tb AS (
       |  SELECT doc_id,
       |    (strpos('0123456789abcdef', substring(md5(t), 2, 1)) - 1) * 16
       |    + strpos('0123456789abcdef', substring(md5(t), 3, 1)) - 1 AS bucket
       |  FROM toks WHERE t <> ''
       |), cnt AS (SELECT doc_id, bucket, count(*) AS c FROM tb GROUP BY 1, 2),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
       |bs AS (SELECT bucket, sum(c) AS s FROM cnt GROUP BY 1),
       |qq AS (SELECT CAST(sum(s * s) AS DOUBLE) AS q FROM bs),
       |scal AS (
       |  SELECT cnt.doc_id,
       |    CAST(sum(cnt.c * cnt.c) AS DOUBLE) AS ss,
       |    CAST(sum(cnt.c * bs.s) AS DOUBLE) AS p
       |  FROM cnt JOIN bs USING (bucket) GROUP BY 1
       |), dd AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(sum(a.c * b.c) AS DOUBLE) AS d
       |  FROM cnt a JOIN cnt b USING (bucket)
       |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2
       |), pairs AS (
       |  SELECT x.doc_id AS doc_id_1, y.doc_id AS doc_id_2,
       |    coalesce(dd.d, 0.0) AS d,
       |    coalesce(sx.p, 0.0) AS p1, coalesce(sx.ss, 0.0) AS ss1,
       |    coalesce(sy.p, 0.0) AS p2, coalesce(sy.ss, 0.0) AS ss2
       |  FROM documents x JOIN documents y ON x.doc_id < y.doc_id
       |  LEFT JOIN dd ON dd.d1 = x.doc_id AND dd.d2 = y.doc_id
       |  LEFT JOIN scal sx ON sx.doc_id = x.doc_id
       |  LEFT JOIN scal sy ON sy.doc_id = y.doc_id)
       |SELECT doc_id_1, doc_id_2,
       |  (d - (p1 + p2) / nd + q / (nd * nd)) /
       |  (sqrt(ss1 - 2 * p1 / nd + q / (nd * nd)) *
       |   sqrt(ss2 - 2 * p2 / nd + q / (nd * nd))) AS corr
       |FROM pairs, nn, qq
       |WHERE (d - (p1 + p2) / nd + q / (nd * nd)) /
       |      (sqrt(ss1 - 2 * p1 / nd + q / (nd * nd)) *
       |       sqrt(ss2 - 2 * p2 / nd + q / (nd * nd))) >= $CorrThreshold""".stripMargin
}
