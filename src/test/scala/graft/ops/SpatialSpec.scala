package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The grid-blocked radius join must equal the all-pairs filter —
  * every qualifying pair found, none duplicated — on shapes chosen to
  * stress the blocking: cell-boundary pairs, exact-threshold
  * distances, dense single-cell clusters, and a seeded random cloud.
  * The cross-join here is the semantic spec only; the operator exists
  * to avoid that plan.
  */
class SpatialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(points: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    (for {
      (ak, alat, alon) <- points
      (bk, blat, blon) <- points
      if ak < bk
      d2 = (alat - blat) * (alat - blat) + (alon - blon) * (alon - blon)
      if d2 <= r * r
    } yield (ak, bk, d2)).toSet

  private def blocked(points: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    Spatial.radiusPairs(points.toDF("k", "lat", "lon"), r)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet

  test("boundary pairs: exact-threshold distance included, one over excluded") {
    val r = 10L
    // horizontal pair exactly at distance r spanning two cells; a
    // vertical one at r+1; a diagonal 3-4-5 pair at exactly r=5 scale
    val pts = Seq(
      (1L, 9L, 9L), (2L, 9L, 19L),   // dist 10 == r, cells (0,0)/(0,1)
      (3L, 40L, 7L), (4L, 51L, 7L),  // dist 11 > r, cells (4,0)/(5,0)
      (5L, 73L, 95L), (6L, 79L, 103L)) // 3-4-5 scaled: dist² = 100
    val exp = brute(pts, r)
    assert(exp.contains((1L, 2L, 100L)) && exp.contains((5L, 6L, 100L)),
      s"spec sanity: expected boundary pairs present, got $exp")
    assert(!exp.exists(p => p._1 == 3L && p._2 == 4L))
    assert(blocked(pts, r) === exp)
  }

  test("dense single-cell cluster and corner-adjacent cells") {
    val r = 100L
    // 6 points inside one cell (all pairwise within r) + one point in
    // the diagonal (+1,+1) cell within r of the cluster's corner point
    val cluster = (0 until 6).map(i => (i.toLong, 50L + i, 60L + i * 2))
    val corner = Seq((10L, 130L, 140L)) // cell (1,1); within r of several
    val pts = cluster ++ corner
    assert(blocked(pts, r) === brute(pts, r))
  }

  test("seeded random cloud equals all-pairs at two radii") {
    val rnd = new scala.util.Random(42)
    val pts = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong))
    for (r <- Seq(37L, 250L))
      assert(blocked(pts, r) === brute(pts, r), s"radius $r")
  }

  /** Textbook DBSCAN as the semantic spec: neighbor counts (incl.
    * self), cores, union-find over core-core pairs with min-id reps,
    * border = non-core with a core neighbor assigned min core rep. */
  private def bruteDbscan(points: Seq[(Long, Long, Long)], r: Long, minPts: Int)
    : Set[(Long, String, Long, Long)] = {
    val within = points.map { case (k, lat, lon) =>
      k -> points.filter { case (k2, lat2, lon2) =>
        k2 != k &&
          (lat - lat2) * (lat - lat2) + (lon - lon2) * (lon - lon2) <= r * r
      }.map(_._1).toSet
    }.toMap
    val core = points.map(_._1).filter(k => within(k).size + 1 >= minPts).toSet
    // union-find over core-core eps-pairs
    val parent = scala.collection.mutable.Map(core.map(k => k -> k).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r0 = find(parent(x)); parent(x) = r0; r0 }
    for (k <- core; n <- within(k) if core(n)) {
      val (ra, rb) = (find(k), find(n))
      if (ra != rb) { val m = math.min(ra, rb); parent(math.max(ra, rb)) = m }
    }
    val coreRep = core.map(k => k -> find(k)).toMap
      .map { case (k, r0) => k -> find(r0) } // path-compress to final roots
    val borderRep = points.map(_._1).filterNot(core)
      .flatMap { k =>
        val cn = within(k).filter(core)
        if (cn.isEmpty) None else Some(k -> cn.map(coreRep).min)
      }.toMap
    val sizes = (coreRep.values ++ borderRep.values).toSeq
      .groupBy(identity).map { case (rep, xs) => rep -> xs.size.toLong }
    points.map(_._1).map { k =>
      if (core(k)) (k, "core", coreRep(k), sizes(coreRep(k)))
      else if (borderRep.contains(k)) (k, "border", borderRep(k), sizes(borderRep(k)))
      else (k, "noise", -1L, 0L)
    }.toSet
  }

  private def distDbscan(points: Seq[(Long, Long, Long)], r: Long, minPts: Int)
    : Set[(Long, String, Long, Long)] =
    Spatial.dbscan(points.toDF("k", "lat", "lon"), r, minPts)
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
      .toSet

  test("dbscan: two dense blobs, a bridge border point, and outliers") {
    val r = 10L
    // blob A around (100,100), blob B around (200,200) — each 5 points
    // pairwise within r (core at minPts=5); a border point within r of
    // one A-core but with too few neighbors to be core itself; two
    // isolated noise points
    val blobA = (0 until 5).map(i => (i.toLong, 100L + i, 100L + i))
    val blobB = (10 until 15).map(i => (i.toLong, 200L + (i - 10), 200L + (i - 10)))
    val border = Seq((20L, 110L, 108L)) // within r of A's (4,104,104)? d2=36+16=52 <= 100
    val noise = Seq((30L, 500L, 500L), (31L, 700L, 100L))
    val pts = blobA ++ blobB ++ border ++ noise
    val exp = bruteDbscan(pts, r, 5)
    assert(exp.count(_._2 == "core") == 10 &&
      exp.count(_._2 == "border") == 1 && exp.count(_._2 == "noise") == 2,
      s"spec sanity: $exp")
    assert(exp.filter(_._2 != "noise").map(_._3) == Set(0L, 10L),
      "two clusters rooted at each blob's min id")
    assert(distDbscan(pts, r, 5) === exp)
  }

  test("dbscan: isolated core (dense clique with no core neighbors outside)") {
    // 3 mutually-close points with minPts=3: all three are core in one
    // cluster; plus a pair (each 2 neighbors incl self < 3) -> noise
    val pts = Seq((1L, 10L, 10L), (2L, 11L, 10L), (3L, 10L, 11L),
      (40L, 300L, 300L), (41L, 301L, 300L))
    val exp = bruteDbscan(pts, 5L, 3)
    assert(exp === distDbscan(pts, 5L, 3))
    assert(exp.count(_._2 == "noise") == 2)
    assert(exp.filter(_._2 == "core").map(_._3) == Set(1L))
  }

  test("dbscan: seeded random cloud equals textbook at two densities") {
    val rnd = new scala.util.Random(7)
    val pts = (0 until 250).map(i =>
      (i.toLong, rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
    for ((r, minPts) <- Seq((25L, 4), (60L, 8)))
      assert(distDbscan(pts, r, minPts) === bruteDbscan(pts, r, minPts),
        s"r=$r minPts=$minPts")
  }

  test("dbscan: sparsified core graph equals the dense plan and textbook") {
    // force the candidate-mass gate to 0 so the half-eps-cell-star +
    // representative-edge sparsifier runs on corpora the brute oracle
    // can check: blobs + border + noise, and the seeded cloud at two
    // densities (borders exist at minPts=4/8, exercising the
    // non-core × core border pass alongside the sparsified CC)
    spark.conf.set("graft.spatial.sparsifyMinPairs", "0")
    try {
      val r = 10L
      val blobA = (0 until 5).map(i => (i.toLong, 100L + i, 100L + i))
      val blobB = (10 until 15).map(i => (i.toLong, 200L + (i - 10), 200L + (i - 10)))
      val pts = blobA ++ blobB ++ Seq((20L, 110L, 108L)) ++
        Seq((30L, 500L, 500L), (31L, 700L, 100L))
      assert(distDbscan(pts, r, 5) === bruteDbscan(pts, r, 5))
      val rnd = new scala.util.Random(11)
      val cloud = (0 until 250).map(i =>
        (i.toLong, rnd.nextInt(400).toLong, rnd.nextInt(400).toLong))
      for ((rr, minPts) <- Seq((25L, 4), (60L, 8)))
        assert(distDbscan(cloud, rr, minPts) === bruteDbscan(cloud, rr, minPts),
          s"r=$rr minPts=$minPts")
    } finally spark.conf.unset("graft.spatial.sparsifyMinPairs")
  }

  test("dbscan: sparsified equals dense on the real sf0.01 lattice") {
    // the oracle-checked corpus (981 core / 519 non-core, 8 clusters):
    // the forced-sparsified output must match the default (dense) plan
    // row for row — the strongest practical pin that the gate is a
    // plan choice, never a result choice
    val pts = Spatial.customerPoints(
      graft.Tables.load(spark, "/root/testdata/sf0.01", "customer"))
    val dense = Spatial.dbscan(pts, Spatial.RadiusE4, Spatial.DbscanMinPts)
      .collect().map(_.toSeq).toSet
    spark.conf.set("graft.spatial.sparsifyMinPairs", "0")
    try {
      val sparse = Spatial.dbscan(pts, Spatial.RadiusE4, Spatial.DbscanMinPts)
        .collect().map(_.toSeq).toSet
      assert(sparse === dense)
    } finally spark.conf.unset("graft.spatial.sparsifyMinPairs")
  }

  test("q134 on the real table equals the exhaustive pairs at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val pts = Spatial.customerPoints(
      graft.Tables.load(spark, sf, "customer"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    val exp = brute(pts, Spatial.RadiusE4)
    val got = Spatial.q134SpatialJoin(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got === exp)
    assert(got.nonEmpty, "4° radius must yield pairs even at sf0.001")
  }
}
