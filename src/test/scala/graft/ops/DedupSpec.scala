package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("minhash+LSH finds exactly the pairs the exhaustive Jaccard join finds") {
    val exhaustive = DedupOps.q18NgramJaccard(spark, TestSpark.sfDir)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    val lsh = DedupOps.q19MinhashLsh(spark, TestSpark.sfDir)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(exhaustive.nonEmpty, "test data should contain planted near-dups")
    assert(lsh == exhaustive)
  }

  test("q25: the projection prune changes nothing — forced-on equals forced-off") {
    // the prune is exactness-preserving by the orthonormal-projection
    // bound; this pins the implementation (basis fit, float early
    // exit, NaN rule) against the unpruned kernel on real data, since
    // no driver SF crosses the q25PruneMinRows cutoff organically
    def run(cutoff: String): Set[(Long, Long, Double)] = {
      spark.conf.set("graft.dedup.q25PruneMinRows", cutoff)
      try DedupOps.q25EmbedNearDup(spark, TestSpark.sfDir)
        .as[(Long, Long, Double)].collect().toSet
      finally spark.conf.unset("graft.dedup.q25PruneMinRows")
    }
    val pruned = run("0")
    val unpruned = run(Long.MaxValue.toString)
    assert(pruned.nonEmpty && pruned == unpruned)
  }

  test("exact dedup groups a planted duplicate") {
    val docs = Seq(
      (1L, "alpha beta gamma  delta"),
      (2L, "alpha beta GAMMA delta"), // differs only in case/spacing
      (3L, "something else entirely here")).toDF("doc_id", "text")
    val clusters = docs
      .select(col("doc_id"), md5(graft.functions.TextFunctions.normText(col("text"))).as("k"))
      .groupBy("k").agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
    assert(clusters.length == 2)
    assert(clusters.find(_._3 == 2).map(_._2).contains(1L))
  }

  test("q130: near-dup cluster keeps its longest doc, singletons keep themselves") {
    // docs 1/2 share 2 of 4 distinct shingles (J = 0.5, at threshold);
    // doc 2 is one char longer -> the keeper. doc 3 is unrelated.
    val dir = java.nio.file.Files.createTempDirectory("keepbest").toString
    Seq(
      (1L, "a b c d e"),
      (2L, "a b c d ff"),
      (3L, "x y z w v"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupOps.q130DedupKeepBest(spark, dir)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(out == Map(
      1L -> ((2L, false)), 2L -> ((2L, true)), 3L -> ((3L, true))),
      s"got $out")
  }

  test("shuffled (non-broadcast) verify join returns the same pairs as the broadcast plan") {
    val broadcastPairs = DedupOps.q18NgramJaccard(spark, TestSpark.sfDir)
      .as[(Long, Long, Double)].collect().toSet
    spark.conf.set("graft.dedup.broadcastVerifyArrays", "false")
    try {
      val shuffledPairs = DedupOps.q18NgramJaccard(spark, TestSpark.sfDir)
        .as[(Long, Long, Double)].collect().toSet
      assert(shuffledPairs == broadcastPairs)
    } finally spark.conf.unset("graft.dedup.broadcastVerifyArrays")
  }

  test("q57 LSH candidate stage finds every above-threshold batch-corpus pair (blocked ≡ exhaustive)") {
    // q57's bit-exact oracle rests on the LSH stage missing nothing the
    // exhaustive join finds. That is NOT a thresholds-alone guarantee —
    // a pair at exactly J = 0.5 has a ~60% deterministic miss chance
    // with 8 bands × 4 rows — so assert it on the real corpus, the same
    // way DedupSpec pins q35's blocked ≡ exhaustive equivalence.
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
    val isNew = col("source").isin(DedupOps.NewBatchSources: _*)
    val newArr = DedupOps.shingleArrayDf(
      docs.filter(isNew).select(col("doc_id"), col("text")))
    val oldArr = DedupOps.shingleArrayDf(
      docs.filter(!isNew).select(col("doc_id"), col("text")))
    val allCand = newArr.select(col("doc_id").as("doc_id_1"))
      .crossJoin(oldArr.select(col("doc_id").as("doc_id_2")))
    val exhaustive = DedupOps.jaccardVerifyBetween(allCand, newArr, oldArr)
      .as[(Long, Long, Double)].collect().toSet
    val nb = DedupOps.lshBands(DedupOps.minhashSignatures(newArr))
      .select(col("doc_id").as("doc_id_1"), col("band"), col("bucket"))
    val ob = DedupOps.lshBands(DedupOps.minhashSignatures(oldArr))
      .select(col("doc_id").as("doc_id_2"), col("band"), col("bucket"))
    val cand = nb.join(ob, Seq("band", "bucket"))
      .select(col("doc_id_1"), col("doc_id_2")).distinct()
    val blocked = DedupOps.jaccardVerifyBetween(cand, newArr, oldArr)
      .as[(Long, Long, Double)].collect().toSet
    assert(exhaustive.nonEmpty, "corpus should contain planted batch-vs-corpus near-dups")
    assert(blocked == exhaustive)
  }

  test("q177 prefix-blocked containment finds exactly the exhaustive pairs") {
    // the prefix theorem applied to the SMALLER doc only — assert the
    // blocking loses nothing against a full all-pairs verify on the
    // real corpus (same way q18/q57 pin their blocked ≡ exhaustive)
    val arr = DedupOps.shingleArrayDf(
      graft.Tables.load(spark, TestSpark.sfDir, "documents"))
    val ids = arr.select(col("doc_id"))
    val allCand = ids.select(col("doc_id").as("doc_id_1"))
      .crossJoin(ids.select(col("doc_id").as("doc_id_2")))
      .filter(col("doc_id_1") < col("doc_id_2"))
    val a1 = arr.select(col("doc_id").as("doc_id_1"),
      col("hshs").as("h1"), col("n").as("n1"))
    val a2 = arr.select(col("doc_id").as("doc_id_2"),
      col("hshs").as("h2"), col("n").as("n2"))
    val exhaustive = allCand.join(a1, "doc_id_1").join(a2, "doc_id_2")
      .select(col("doc_id_1"), col("doc_id_2"),
        (size(array_intersect(col("h1"), col("h2"))) * lit(1.0) /
          least(col("n1"), col("n2"))).as("c"))
      .filter(col("c") >= DedupOps.ContainmentThreshold)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    val blocked = DedupOps.q177Containment(spark, TestSpark.sfDir)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(exhaustive.nonEmpty, "corpus should contain containment dups")
    assert(blocked == exhaustive)
  }

  test("q177 catches a planted subset doc that Jaccard misses") {
    // doc 2 = doc 1's text embedded in 3x the content: containment 1.0
    // (every shingle of doc 1 appears in doc 2), Jaccard well under 0.5
    val dir = java.nio.file.Files.createTempDirectory("contain").toString
    val small = "alpha beta gamma delta epsilon zeta"
    val big = s"one two three four five six seven $small " +
      "eight nine ten eleven twelve thirteen fourteen fifteen sixteen"
    Seq((1L, small), (2L, big), (3L, "totally unrelated words here now"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val contained = DedupOps.q177Containment(spark, dir)
      .as[(Long, Long, Double, Double)].collect()
    assert(contained.map(r => (r._1, r._2)).toSet == Set((1L, 2L)),
      s"got ${contained.toSeq}")
    val (c, j) = (contained.head._3, contained.head._4)
    assert(c == 1.0, s"containment of planted subset should be 1.0, got $c")
    assert(j < DedupOps.JaccardThreshold,
      s"planted pair must be invisible to Jaccard dedup (j=$j)")
  }

  test("q76 member join carries no static broadcast hint (corpus-scale side)") {
    // the near-dup member set grows with the duplicate count, so q76
    // must leave the join strategy to AQE (runtime size) rather than
    // pin a broadcast that becomes corpus-sized on a dup-heavy corpus
    val plan = DedupOps.q76DedupReport(spark, TestSpark.sfDir)
      .queryExecution.optimizedPlan.toString
    val leftOuterJoins = plan.linesIterator.filter(_.contains("Join LeftOuter")).toSeq
    assert(leftOuterJoins.nonEmpty)
    assert(leftOuterJoins.forall(!_.contains("strategy=broadcast")),
      s"q76's member join is hint-broadcast: ${leftOuterJoins.mkString("; ")}")
  }

  test("degree orientation bounds a hub's out-degree even when the hub has the smallest id") {
    // star: hub 0 — the SMALLEST id — connected to 50 leaves. Id-only
    // orientation points all 50 edges OUT of the hub, so the 2-path
    // join materializes 50·49 pairs for a triangle-free graph; degree
    // orientation points every edge leaf→hub (deg 1 ≺ deg 50), giving
    // max out-degree 1 and an empty 2-path set.
    val star = (1L to 50L).map(l => (0L, l)).toDF("u", "v")
    val degree = star.select(explode(array(col("u"), col("v"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    val outDeg = DedupOps.orientByDegree(star, degree)
      .groupBy(col("src")).agg(count(lit(1)).as("od"))
      .agg(max(col("od"))).as[Long].head()
    assert(outDeg == 1L)
    val counts = DedupOps.triangleCounts(star).as[(Long, Long, Long)].collect()
    assert(counts.length == 51 && counts.forall(_._3 == 0L))
  }

  test("triangle counts on K4 are orientation-independent: every node in 3 triangles") {
    val k4 = (for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)).toDF("u", "v")
    val counts = DedupOps.triangleCounts(k4).as[(Long, Long, Long)].collect()
    assert(counts.length == 4)
    assert(counts.forall { case (_, deg, tri) => deg == 3L && tri == 3L })
  }

  test("incremental near-dup classifies exact_dup, near_dup, and unique batch docs") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "an entirely different corpus document about spark engines"),
      (12L, "the quick brown fox jumps over the lazy dog today")) // dup of 10 within corpus
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "THE quick   brown fox jumps over the lazy dog today"), // exact (normalized) dup of 10/12
      (101L, "the quick brown fox jumps over the lazy dog yesterday"), // near-dup of 10
      (102L, "completely unrelated new content with novel words throughout"))
      .toDF("doc_id", "text")
    val out = DedupOps.incrementalNearDup(batch, corpus)
      .as[(Long, String, Option[Long], Option[Double])].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq ==
      Seq((100L, "exact_dup"), (101L, "near_dup"), (102L, "unique")))
    assert(out(0)._3.contains(10L), "exact match should be the min corpus doc_id")
    assert(out(0)._4.contains(1.0))
    assert(out(1)._3.contains(10L) && out(1)._4.exists(j => j >= 0.5 && j < 1.0))
    assert(out(2)._3.isEmpty && out(2)._4.isEmpty)
  }

  test("q35 LSH-blocked correlation near-dup equals the exhaustive all-pairs result") {
    // real corpus: the LSH candidate stage must not lose a single pair
    // vs brute force (this is the recall-1.0 claim the oracle relies on)
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
    val blocked = CorrDedup.corrNearDup(docs)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    val exhaustive = CorrDedup.corrNearDup(docs, exhaustive = true)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(exhaustive.nonEmpty, "corpus should contain correlated near-dups")
    assert(blocked == exhaustive)
  }

  test("q35 hot-bucket block split is exact — forced split equals unsplit") {
    // force the gate and cap low enough that REAL buckets of the test
    // corpus get salt-split into block-pair cells (cap 3 → nearly
    // every occupied bucket splits, exercising (i,i) triangles, mixed
    // A×B cells and the cold path together); the candidate pair set —
    // and so the output — must be byte-identical to the single-pass
    // plan, which the previous test already pins against exhaustive
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
    val base = CorrDedup.corrNearDup(docs)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    spark.conf.set("graft.dedup.q35SplitMinRows", "1")
    spark.conf.set("graft.dedup.q35BucketCap", "3")
    try {
      val split = CorrDedup.corrNearDup(docs)
        .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
      assert(split == base)
    } finally {
      spark.conf.unset("graft.dedup.q35SplitMinRows")
      spark.conf.unset("graft.dedup.q35BucketCap")
    }
  }

  test("q35 candidate-exchange sizing floors at the session width and scales with volume") {
    // plan-identity guarantee at driver SFs: every corpus whose entry
    // volume fits one CandPartBytes slab keeps the session's shuffle
    // width, so the sized repartition is byte-identical to the r10
    // plan there (sf0.1: 5000 docs x 128 bands x 236 B = 151 MB)
    val sess = spark.sessionState.conf.numShufflePartitions
    assert(CorrDedup.candShuffleParts(spark, 5000L, 128, 96) == sess)
    assert(CorrDedup.candShuffleParts(spark, 500L, 128, 96) == sess)
    // engaged scales size up from the known n*bands*(44+2m) volume:
    // 60x = 300k x 151 bands x 236 B = 10.69 GB -> ceil-ish 40 slabs
    val parts60 = CorrDedup.candShuffleParts(spark, 300000L, 151, 96)
    val bytes60 = 300000L * 151 * (44 + 2 * 96)
    assert(parts60 == math.max(sess, (bytes60 / CorrDedup.CandPartBytes + 1).toInt))
    assert(parts60 > sess)
    // monotone in every argument, and capped so a pathological corpus
    // cannot request an unbounded partition count
    assert(CorrDedup.candShuffleParts(spark, 500000L, 151, 96) >= parts60)
    assert(CorrDedup.candShuffleParts(spark, 300000L, 151, 96) >=
      CorrDedup.candShuffleParts(spark, 300000L, 151, 16))
    assert(CorrDedup.candShuffleParts(spark, Long.MaxValue / 1000, 151, 96) <=
      math.max(sess, 2000))
  }

  test("q35 pipeline finds a planted near-dup and ignores unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "sailors navigate uncharted waters seeking distant harbors before dawn " +
      "breaks across the frozen mountain range and valleys echo with birdsong"
    val nearDup = base.replace("sailors", "pirates")
    val others = (3L to 30L).map { i =>
      (i, s"document number $i talks about topic${i} subject${i * 7} item${i * 13} " +
        s"matter${i * 3} detail${i * 11} aspect${i * 5} element${i * 17} unique${i * 23}")
    }
    val docs = (Seq((1L, base), (2L, nearDup)) ++ others).toDF("doc_id", "text")
    val found = CorrDedup.corrNearDup(docs)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    val exhaustive = CorrDedup.corrNearDup(docs, exhaustive = true)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L)))
    assert(found == exhaustive)
  }

  test("q35 pipeline handles empty documents (zero vectors pair as identical)") {
    // empty docs are maximally average: centered vectors equal -mean,
    // so two of them correlate at exactly 1.0 and must pair up; they
    // must not pair with substantive docs
    val docs = (Seq((1L, ""), (2L, "   ")) ++ (3L to 20L).map(i =>
      (i, s"substantive document $i about topic${i * 3} item${i * 7} thing${i * 11}")))
      .toDF("doc_id", "text")
    val found = CorrDedup.corrNearDup(docs)
      .select("doc_id_1", "doc_id_2").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L)))
    assert(!found.exists(p => (p._1 <= 2L) != (p._2 <= 2L)),
      "empty docs must not pair with substantive ones")
  }

  test("connected components resolves a long path graph across convergence blocks") {
    // a 65-node path needs several large/small-star rounds (> one
    // convergence block of 2) before contracting to a single star
    val edges = (0L until 64L).map(i => (i, i + 1)).toDF("u", "v")
    val cc = DedupOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(cc.keySet == (0L to 64L).toSet)
    assert(cc.values.toSet == Set(0L))
  }

  test("connected components throws rather than returning un-converged labels") {
    val edges = (0L until 64L).map(i => (i, i + 1)).toDF("u", "v")
    val e = intercept[IllegalStateException] {
      DedupOps.connectedComponents(edges, maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("md5 simhash (q20) of near-identical docs differs in few bits") {
    val base = "spark shuffles partition data across executors during wide transformations " +
      "and the optimizer prunes columns predicates and partitions before the scan"
    val docs = Seq(
      (1L, base), (2L, base.replace("prunes", "removes")),
      (3L, "completely different content about cooking recipes and garden furniture " +
        "with nothing shared at all in vocabulary or structure or intent"))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      graft.functions.SimHashMd5(graft.functions.TextFunctions.wsTokens(col("text"))).as("s"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
    assert(hamming(sh(1L), sh(2L)) <= 8)
  }

  test("simhash of near-identical docs differs in few bits") {
    val base = "spark shuffles partition data across executors during wide transformations " +
      "and the optimizer prunes columns predicates and partitions before the scan"
    val nearDup = base.replace("prunes", "removes")
    val far = "completely different content about cooking recipes and garden furniture " +
      "with nothing shared at all in vocabulary or structure or intent"
    val docs = Seq((1L, base), (2L, nearDup), (3L, far)).toDF("doc_id", "text")
    docs.createOrReplaceTempView("sim_docs")
    // reuse the q20 pipeline over a temp dir-free path: inline the same logic
    val tok = docs.select(col("doc_id"), explode(graft.functions.TextFunctions.wsTokens(col("text"))).as("token"))
    val h = xxhash64(col("token"))
    val votes = (0 until 64).map(i => sum(when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"v$i"))
    val bits = (0 until 64).map(i => when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
    val sh = tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), bits.reduce(_ bitwiseOR _).as("simhash"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) < hamming(sh(1L), sh(3L)))
    assert(hamming(sh(1L), sh(2L)) <= 8)
  }

  test("q187 banded pHash blocking finds exactly the exhaustive hamming pairs") {
    // the pigeonhole guarantee (4 disjoint 8-bit bands catch every
    // pair at hamming <= 3) asserted against a brute-force all-pairs
    // join over the same per-doc hashes, on the real corpus
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
    val hashes = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => MultimodalOps.phashPayload(id, b) })
      .toDF()
    val a = hashes.select(col("doc_id").as("doc_a"), col("phash").as("pa"))
    val b = hashes.select(col("doc_id").as("doc_b"), col("phash").as("pb"))
    val exhaustive = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= MultimodalOps.PhashHamMax)
      .as[(Long, Long, Long)].collect().toSet
    val banded = MultimodalOps.q187MediaPhash(spark, TestSpark.sfDir)
      .as[(Long, Long, Long)].collect().toSet
    assert(exhaustive.nonEmpty, "corpus should contain pHash near-dups")
    assert(banded == exhaustive)
  }
}
