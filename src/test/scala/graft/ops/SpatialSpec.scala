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
