package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("int8 quantization kernel: codes bounded, extremes hit ±127, degenerate vectors zero") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, Seq(1.0f, -1.0f, 0.5f)),   // extremes: +127, −127; 0.5→64
      (2L, Seq(0.0f, 0.0f)),          // all-zero → zeros, scale 0
      (3L, Seq.empty[Float]),         // empty → zeros, scale 0
      (4L, Seq(-2.0f)),               // single negative: q=−127, scale 2
      (5L, Seq(3.5f, 3.5f)))          // constant: both 127
      .toDF("vec_id", "embedding")
    val out = rows
      .select(col("vec_id"), graft.functions.Int8Quantize(col("embedding")).as("q"))
      .select(col("vec_id"), col("q.q_sum"), col("q.q_min"), col("q.q_max"), col("q.scale"))
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 64L, -127L, 127L, 1.0)))
    assert(out(2L) == ((2L, 0L, 0L, 0L, 0.0)))
    assert(out(3L) == ((3L, 0L, 0L, 0L, 0.0)))
    assert(out(4L) == ((4L, -127L, -127L, -127L, 2.0)))
    assert(out(5L) == ((5L, 254L, 127L, 127L, 3.5)))
    // real corpus: every vector's codes stay in the int8 envelope
    val env = SimilarityOps.q77EmbedQuantize(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(env.nonEmpty)
    env.foreach { case (id, _, mn, mx, scale) =>
      assert(mn >= -127L && mx <= 127L && scale >= 0.0, s"vec $id out of envelope")
      assert(mx == 127L || mn == -127L || scale == 0.0,
        s"vec $id: symmetric quantization must saturate one end")
    }
  }

  test("brute-force KNN ranks are complete and cosine-descending per query") {
    val rows = SimilarityOps.q21KnnCosine(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Double)].collect()
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    for ((q, rs) <- byQuery) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to 10L), s"query $q ranks")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq, s"query $q not descending")
      assert(sorted.forall(r => r._4 <= 1.0 + 1e-9 && r._4 >= -1.0 - 1e-9))
    }
  }

  test("IVF search recall@10 vs brute force is high while probing half the cells") {
    val exact = SimilarityOps.q21KnnCosine(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val ivf = SimilarityOps.q36IvfSearch(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(ivf.keySet == exact.keySet)
    val recalls = exact.keys.toSeq.map { q =>
      exact(q).intersect(ivf(q)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(recalls.forall(_ >= 0.7), s"per-query recall too low: $recalls")
    assert(mean >= 0.9, s"mean recall@10 $mean < 0.9")
  }

  test("trained-index IVF search (q56) recall@10 vs brute force >= 0.9") {
    val exact = SimilarityOps.q21KnnCosine(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val trained = SimilarityOps.q56IvfSearchTrained(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(trained.keySet == exact.keySet)
    val recalls = exact.keys.toSeq.map { q =>
      exact(q).intersect(trained(q)).size.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 $mean < 0.9 (per-query: $recalls)")
  }

  test("k-means objective (sum of max cosines) is non-decreasing per iteration") {
    import org.apache.spark.sql.functions._
    val emb = graft.Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(graft.functions.DotProduct(col("v"), col("v"))))
      .cache()
    val objectives = (0 to 3).map { iters =>
      val cents = SimilarityOps.kmeansCentroids(emb, iters)
      emb.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          (graft.functions.DotProduct(col("v"), col("cv")) / (col("nrm") * col("cnrm"))).as("cos"))
        .groupBy("vec_id").agg(max("cos").as("best"))
        .agg(sum("best")).head().getDouble(0)
    }
    objectives.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"objective decreased: $objectives")
    }
    assert(objectives.last > objectives.head, "training should improve the objective")
  }

  test("sign-LSH puts identical vectors in the same bucket and splits distant ones") {
    val planes = SimilarityOps.hyperplanes(bits = 16, dim = 4)
    def bucket(v: Array[Double]): Long =
      planes.zipWithIndex.map { case (p, i) =>
        if (p.zip(v).map { case (a, b) => a * b }.sum >= 0.0) 1L << i else 0L
      }.reduce(_ | _)
    val v = Array(0.5, -0.2, 0.9, 0.1)
    assert(bucket(v) == bucket(v.clone()))
    val neg = v.map(-_)
    assert(bucket(v) != bucket(neg), "antipodal vectors must differ in every bit")
    assert(java.lang.Long.bitCount(bucket(v) ^ bucket(neg)) == 16)
  }

  test("LSH bucket query output covers every vector exactly once") {
    val df = SimilarityOps.q22AnnLshBuckets(spark, TestSpark.sfDir)
    val n = graft.Tables.load(spark, TestSpark.sfDir, "embeddings").count()
    assert(df.count() == n)
    assert(df.select("vec_id").distinct().count() == n)
  }

  test("q103 PQ codes cover every (vector, subspace) once and compress energy") {
    val rows = SimilarityOps.q103PqCodes(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Double)].collect()
    val n = graft.Tables.load(spark, TestSpark.sfDir, "embeddings").count()
    assert(rows.length.toLong == n * SimilarityOps.PqM)
    assert(rows.map(r => (r._1, r._2)).distinct.length.toLong == n * SimilarityOps.PqM)
    assert(rows.forall(r => r._3 >= 0 && r._3 < SimilarityOps.PqK))
    assert(rows.forall(_._4 >= -1e-9), "negative squared distance")
    // quantization error must beat the trivial all-zeros codebook
    // (= total subvector energy). The margin is thin by DATA, not by
    // bug: the synthetic embeddings are near-isotropic unit vectors,
    // and K=4 centroids in a random 16-dim subspace can only absorb
    // ~10% of the variance (measured 447.7 of 500.0 at sf0.001) —
    // real embeddings cluster and compress far better.
    val energy = graft.Tables.load(spark, TestSpark.sfDir, "embeddings")
      .selectExpr("aggregate(embedding, 0.0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS e")
      .agg(org.apache.spark.sql.functions.sum("e")).head.getDouble(0)
    val distortion = rows.map(_._4).sum
    assert(distortion < energy * 0.95,
      s"PQ distortion $distortion not below 95% of energy $energy")
  }

  test("q102 quantized top-10 overlaps the exact cosine top-10 heavily") {
    val exact = SimilarityOps.q21KnnCosine(spark, TestSpark.sfDir)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
    val quant = SimilarityOps.q102QuantizedKnn(spark, TestSpark.sfDir)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
    assert(quant.keySet == exact.keySet && quant.nonEmpty)
    val recalls = exact.keys.toSeq
      .map(q => quant(q).intersect(exact(q)).size.toDouble / exact(q).size)
    // int8 codes drop the per-vector scale from the score (q_dot ranks
    // by quantized direction only), so recall is high, not perfect
    assert(recalls.sum / recalls.size >= 0.6,
      s"mean quantized recall@10 too low: $recalls")
  }

  test("q115 label centroids match a driver-side integer replay") {
    import spark.implicits._
    val got = SimilarityOps.q115LabelCentroids(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val emb = graft.Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select("label", "embedding").as[(Int, Array[Float])].collect()
    val sums = scala.collection.mutable.Map
      .empty[Long, Array[Long]].withDefault(_ => Array.fill(64)(0L))
    emb.foreach { case (l, vf) =>
      val v = vf.map(_.toDouble)
      val scale = v.map(math.abs).max
      if (scale > 0) {
        val codes = v.map(x => math.floor(x / scale * 127.0 + 0.5).toLong)
        val acc = sums(l.toLong).clone()
        codes.indices.foreach(i => acc(i) += codes(i))
        sums(l.toLong) = acc
      }
    }
    val labels = sums.keys.toSeq.sorted
    assert(got.length == labels.size * (labels.size - 1) / 2)
    got.foreach { case (a, b, dot, n2a, n2b, cos) =>
      val (va, vb) = (sums(a), sums(b))
      assert(dot == va.zip(vb).map { case (x, y) => x * y }.sum)
      assert(n2a == va.map(x => x * x).sum && n2b == vb.map(x => x * x).sum)
      assert(cos == dot.toDouble /
        (math.sqrt(n2a.toDouble) * math.sqrt(n2b.toDouble)))
      assert(cos >= -1.0 - 1e-12 && cos <= 1.0 + 1e-12)
    }
  }

  test("q149 hard positives match a driver-side brute-force argmax") {
    import spark.implicits._
    val got = SimilarityOps.q149HardPositives(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Double, Long)].collect()
      .map(r => r._2 -> r).toMap
    val emb = graft.Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select("label", "vec_id", "embedding")
      .as[(Int, Long, Array[Float])].collect()
      .map { case (l, id, vf) => (l, id, vf.map(_.toDouble)) }
    def norm(v: Array[Double]) =
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    val byLabel = emb.groupBy(_._1)
    assert(got.size == emb.length)
    byLabel.values.foreach { members =>
      members.foreach { case (_, id, v) =>
        val best = members.filter(_._2 != id)
          .map { case (_, cid, cv) =>
            val d = v.zip(cv).foldLeft(0.0)((a, p) => a + p._1 * p._2)
            (d / (norm(v) * norm(cv)), cid)
          }
          // struct-max tie-break: cosine DESC, then SMALLEST cand id
          .maxBy { case (c, cid) => (c, -cid) }
        val (_, _, posId, cos, nCand) = got(id)
        assert(nCand == members.length - 1L)
        assert(posId == best._2, s"anchor $id: $posId vs ${best._2}")
        assert(math.abs(cos - best._1) < 1e-12)
      }
    }
  }

  test("q180: vote bookkeeping is internally consistent and agreement bounded") {
    val rows = SimilarityOps.q180KnnLabelEval(spark, TestSpark.sfDir).collect()
    assert(rows.length == SimilarityOps.Q180Panel ||
      rows.length > 0 && rows.length <= SimilarityOps.Q180Panel)
    rows.foreach { r =>
      val agree = r.getAs[Long]("n_agree")
      assert(agree >= 0 && agree <= SimilarityOps.Q180K.toLong)
      assert(r.getAs[Boolean]("correct") ==
        (r.getAs[Long]("pred_label") == r.getAs[Long]("true_label")))
      // the majority label must hold at least as many votes as the
      // true label received
      if (!r.getAs[Boolean]("correct"))
        assert(agree <= SimilarityOps.Q180K.toLong / 2 + 1,
          s"true label outvoted the majority pick: $r")
    }
  }

  test("q180 on planted separable clusters predicts every label perfectly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("knneval").toString
    // two orthogonal clusters with tiny within-cluster jitter in a
    // different dimension: neighbors always share the cluster label
    val rows = (0 until 20).map { i =>
      val lbl = i % 2
      val v = Array.fill(4)(0.0f)
      v(lbl) = 1.0f
      v(2 + lbl) = 0.01f * (i / 2).toFloat
      (i.toLong, v.toSeq, lbl.toLong)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SimilarityOps.q180KnnLabelEval(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Boolean]("correct") &&
      r.getAs[Long]("n_agree") == SimilarityOps.Q180K.toLong, s"$r"))
  }

  test("q181: cosine bounded, vector population conserved across sources") {
    val rows = SimilarityOps.q181SourceCentroidDrift(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"cosine oob: $r")
      assert(r.getAs[Long]("n2_glob") > 0)
    }
    val totalVecs = rows.map(_.getAs[Long]("n_vecs")).sum
    val expected = graft.Tables.load(spark, TestSpark.sfDir, "embeddings")
      .join(graft.Tables.load(spark, TestSpark.sfDir, "documents"),
        org.apache.spark.sql.functions.col("vec_id") ===
          org.apache.spark.sql.functions.col("doc_id")).count()
    assert(totalVecs == expected, s"$totalVecs != $expected")
  }

  test("q189 MMR: step 1 is the relevance argmax, picks are distinct candidates, k per query") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val mmr = SimilarityOps.q189MmrDiverse(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Double)].collect()
    val top = SimilarityOps.q21KnnCosine(spark, TestSpark.sfDir)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .as[(Long, Long, Long)].collect()
    val topByQuery = top.groupBy(_._1)
    val byQuery = mmr.groupBy(_._1)
    assert(byQuery.nonEmpty)
    for ((q, rows) <- byQuery) {
      // exactly MmrK picks, ranked 1..k, all distinct
      assert(rows.length == SimilarityOps.MmrK)
      assert(rows.map(_._2).sorted.toSeq == (1 to SimilarityOps.MmrK).map(_.toLong))
      assert(rows.map(_._3).distinct.length == rows.length)
      // every pick comes from q21's candidate pool
      val pool = topByQuery(q).map(_._3).toSet
      assert(rows.forall(r => pool.contains(r._3)))
      // the first pick IS the most-relevant candidate (rank 1 in q21)
      val first = rows.find(_._2 == 1L).get._3
      assert(first == topByQuery(q).find(_._2 == 1L).get._3)
    }
    // diversification bites somewhere: at least one query's MMR top-5
    // differs from its plain relevance top-5 (the corpus has near-dup
    // neighbor sets, so redundancy must get penalized for some query)
    val diverged = byQuery.exists { case (q, rows) =>
      val plain5 = topByQuery(q).filter(_._2 <= SimilarityOps.MmrK).map(_._3).toSet
      rows.map(_._3).toSet != plain5
    }
    assert(diverged, "MMR never diverged from plain top-k")
  }

  test("q190 IVF-PQ: results come from probed cells and ADC distances agree with full-scan q104") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val ivfpq = SimilarityOps.q190IvfPqSearch(spark, TestSpark.sfDir)
      .select(col("query_id"), col("neighbor_id"), col("cell_id"), col("adc_d2"))
      .as[(Long, Long, Long, Double)].collect()
    assert(ivfpq.nonEmpty)
    val q104 = SimilarityOps.q104PqAdcSearch(spark, TestSpark.sfDir)
      .select(col("query_id"), col("neighbor_id"), col("adc_d2"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    for ((q, nid, _, d2) <- ivfpq) {
      // any (query, neighbor) q104 also surfaced must carry the SAME
      // ADC distance — same codes, same books, same fold
      q104.get((q, nid)).foreach(full => assert(full == d2,
        s"ADC mismatch for ($q,$nid): ivfpq=$d2 full=$full"))
    }
    // recall vs the full ADC scan stays high (the probe prune skips
    // cells, it must not collapse the result set)
    val byQ = ivfpq.groupBy(_._1)
    val overlaps = byQ.map { case (q, rows) =>
      val full10 = q104.keys.filter(_._1 == q).map(_._2).toSet
      rows.count(r => full10.contains(r._2)).toDouble / math.max(1, rows.length)
    }
    assert(overlaps.sum / overlaps.size >= 0.5,
      s"IVF-PQ overlap vs full ADC collapsed: $overlaps")
  }

  test("q215: projection of one vector matches a local JVM recompute") {
    import org.apache.spark.sql.functions._
    import graft.Tables
    val dir = TestSpark.sfDir
    val vid = Tables.load(spark, dir, "embeddings")
      .agg(org.apache.spark.sql.functions.min("vec_id")).head().getLong(0)
    val emb = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") === vid)
      .select(col("embedding")).head().getSeq[Float](0)
    val vq = emb.map(x => math.floor(x.toDouble * 10000.0 + 0.5).toLong)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0 until SimilarityOps.Q215OutDims).map { j =>
      j.toLong -> vq.zipWithIndex.map { case (q, d) =>
        val sgn = if (md5hex(s"rp_${j}_$d").charAt(0) <= '7') 1L else -1L
        sgn * q
      }.sum
    }.toMap
    val got = SimilarityOps.q215RandomProjection(spark, dir)
      .filter(col("vec_id") === vid).collect()
      .map(r => r.getAs[Long]("j") -> r.getAs[Long]("proj")).toMap
    assert(got == expected)
  }

  test("q228: negatives cross labels and dominate their cell's impostors") {
    import org.apache.spark.sql.functions._
    import graft.Tables
    val dir = TestSpark.sfDir
    val rows = SimilarityOps.q228HardNegatives(spark, dir).collect()
    assert(rows.nonEmpty)
    val labels = Tables.load(spark, dir, "embeddings")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Int]("label").toLong).toMap
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("neg_id")) != r.getAs[Long]("label"),
        s"negative shares the anchor's label: $r")
      assert(labels(r.getAs[Long]("anchor_id")) == r.getAs[Long]("label"))
      assert(r.getAs[Long]("n_candidates") >= 1L)
    }
    // no anchor appears twice; every picked cosine is a valid cosine
    assert(rows.map(_.getAs[Long]("anchor_id")).distinct.length == rows.length)
    rows.foreach(r => {
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0000001 && c <= 1.0000001)
    })
  }

  test("q216: assignment is the true argmin over the selected centers") {
    import org.apache.spark.sql.functions._
    import graft.Tables
    val dir = TestSpark.sfDir
    val out = SimilarityOps.q216KcenterCoreset(spark, dir)
    val centers = out.select(col("center_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(centers.length == SimilarityOps.Q216K)
    // recompute min distance over the center set through an exploded
    // join (a different plan than the broadcast-literal fold)
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * 10000.0 + 0.5).cast("long")).as("q"))
    val cent = emb.filter(col("vec_id").isin(centers: _*))
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    val best = emb.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"),
        aggregate(zip_with(col("q"), col("cq"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, x) => acc + x)
          .as("d2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"), col("m.d2").as("d2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.collect().foreach { r =>
      val (cid, d2) = best(r.getAs[Long]("vec_id"))
      assert(r.getAs[Long]("center_id") == cid && r.getAs[Long]("dist2") == d2,
        s"assignment mismatch: $r vs ($cid,$d2)")
    }
  }
}
