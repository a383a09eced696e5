package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q79–q82: the sketch family (CMS, Bloom, histogram quantiles) and
  * SemDeDup semantic dedup — structural guarantees the oracle hash
  * can't express (overestimate bounds, no-false-negative membership,
  * recall vs the exact pair set, quantile monotonicity). */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q80 CMS: est >= exact for every token (overestimate-only)") {
    val out = Sketches.q80HeavyHitters(spark, TestSpark.sfDir)
      .select(col("tok"), col("exact_cnt"), col("est_cnt")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS underestimated ${r.getString(0)}: est=${r.getLong(2)} exact=${r.getLong(1)}")
    }
  }

  test("q80 CMS: heavy hitters rank correctly by estimate") {
    // the heaviest true token must be within the top few estimates —
    // with depth 4 the probability of all four rows colliding a heavier
    // phantom above it is negligible at this vocabulary size
    val out = Sketches.q80HeavyHitters(spark, TestSpark.sfDir).collect()
    val byExact = out.sortBy(-_.getLong(1)).map(_.getString(0))
    val byEst = out.sortBy(-_.getLong(2)).map(_.getString(0))
    assert(byEst.take(5).contains(byExact.head),
      s"true heaviest ${byExact.head} not in top-5 estimates ${byEst.take(5).toSeq}")
  }

  test("bloom filter: no false negatives, bounded false positives") {
    val keys = (0L until 50L).toDF("user_id")
    val bits = Sketches.bloomBits(keys, "CAST(user_id AS STRING)")
    val probe = (0L until 5000L).toDF("user_id")
      .withColumn("h", expr(Sketches.bloomHexSql("CAST(user_id AS STRING)")))
      .withColumn("hit", expr(Sketches.bloomHitSql(bits, "h")))
      .select("user_id", "hit")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0L until 50L).foreach(k => assert(probe(k), s"member $k missed — false negative"))
    val fps = (50L until 5000L).count(probe(_))
    // m=4096, n=50, k=3 → theoretical FP ~ (1-e^(-150/4096))^3 ≈ 4.4e-5;
    // 4950 probes → expect ~0.2; 25 is a >100× safety margin
    assert(fps <= 25, s"bloom false-positive count $fps out of bounds")
  }

  test("q81 bloom prune returns exactly the unpruned semi-join result") {
    val got = Sketches.q81BloomPrune(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val events = graft.Tables.load(spark, TestSpark.sfDir, "events")
    val cents = expr("CAST(round(value * 100.0) AS BIGINT)")
    val flagged = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(cents).as("spend_cents"))
      .filter(col("spend_cents") > Sketches.SpendThresholdCents)
      .select(col("user_id"))
    val exact = events.filter(col("event_type") === "click")
      .join(flagged, Seq("user_id"), "left_semi")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_clicks"), sum(cents).as("click_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exact)
    assert(got.nonEmpty)
  }

  test("q79 semantic dedup: pairs are a subset of the exact q25 pair set, with recall") {
    val sem = SimilarityOps.q79SemanticDedup(spark, TestSpark.sfDir)
      .select(col("vec_id_1"), col("vec_id_2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = DedupOps.q25EmbedNearDup(spark, TestSpark.sfDir)
      .select(col("vec_id_1"), col("vec_id_2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.nonEmpty, "semantic dedup found no pairs")
    assert(sem.subsetOf(exact), s"non-near-dup pairs emitted: ${(sem -- exact).take(3)}")
    val recall = sem.size.toDouble / exact.size
    info(f"SemDeDup cell-bounded recall vs exact all-pairs: $recall%.3f (${sem.size}/${exact.size})")
    assert(recall >= 0.2, f"recall $recall%.3f implausibly low for trained cells")
  }

  test("q82 histogram quantiles: bounded by min/max and monotone in p") {
    val rows = Audit.q82HistQuantile(spark, TestSpark.sfDir).collect()
    assert(rows.length > 0 && rows.length % 3 == 0)
    val byType = rows.groupBy(_.getString(0))
    val ev = graft.Tables.load(spark, TestSpark.sfDir, "events")
      .groupBy(col("event_type")).agg(min("value").as("mn"), max("value").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    byType.foreach { case (t, rs) =>
      val (mn, mx) = ev(t)
      val est = rs.sortBy(_.getDouble(1)).map(_.getDouble(2))
      assert(est.length == 3)
      est.foreach(e => assert(e >= mn && e <= mx, s"$t estimate $e outside [$mn,$mx]"))
      assert(est(0) <= est(1) && est(1) <= est(2), s"$t quantiles not monotone: ${est.toSeq}")
    }
  }

  test("q199 bitmaps: block boundaries (docs 63/64/127/128) pack into the right words") {
    import spark.implicits._
    // 'fast' in docs 63,64 (last bit of block 0, first of block 1);
    // 'slow' in docs 64,127,128; 'table' nowhere; doc 63 also 'hash'
    val dir = java.nio.file.Files.createTempDirectory("bmp").toString
    Seq((63L, "fast hash", "s"), (64L, "fast slow", "s"),
      (127L, "slow", "s"), (128L, "slow", "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val bm = BitmapIndex.termBitmaps(
      graft.Tables.load(spark, dir, "documents"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(bm(("fast", 0L)) == (1L << 63))
    assert(bm(("fast", 1L)) == 1L)
    assert(bm(("slow", 1L)) == (1L | (1L << 63)))
    assert(bm(("slow", 2L)) == 1L)
    assert(!bm.keySet.exists(_._1 == "table"))
    val q = BitmapIndex.q199BitmapIndex(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(q(("fast", "slow")) == ((1L, 4L)))   // doc 64 in both
    assert(q(("fast", "hash")) == ((1L, 2L)))   // doc 63 in both
    assert(q(("slow", "table")) == ((0L, 3L)))
  }

  test("q199 on the real corpus satisfies inclusion–exclusion against direct counts") {
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
    val pres = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.wsTokens(col("text"))).as("term"))
      .filter(col("term").isin(BitmapIndex.IndexTerms: _*))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val byTerm = pres.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val got = BitmapIndex.q199BitmapIndex(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got.size == 6)
    for (((a, b), (andC, orC)) <- got) {
      val sa = byTerm.getOrElse(a, Set.empty)
      val sb = byTerm.getOrElse(b, Set.empty)
      assert(andC == (sa & sb).size.toLong, s"$a&$b")
      assert(orC == (sa | sb).size.toLong, s"$a|$b")
    }
  }
}
