package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Uniform-grid spatial blocking: the distributed radius self-join
  * (all point pairs within distance R) without an all-pairs product.
  *
  * The classic plan — `a CROSS JOIN b WHERE dist(a,b) <= R` — is the
  * shape the plan lint bans: quadratic in the corpus. Grid blocking
  * makes it a keyed hash join: snap each point to an R-sized cell,
  * replicate the probe side to its FORWARD half-neighborhood (the cell
  * itself plus the four lexicographically-greater adjacent cells), and
  * join probes to home points on the cell key. Any pair within R spans
  * at most one cell step per axis, and of the two directed copies of a
  * cross-cell pair exactly one direction is forward — so every
  * qualifying unordered pair is produced exactly once, with same-cell
  * pairs de-duplicated by id order instead. No `DISTINCT` pass, no
  * post-hoc dedup shuffle.
  *
  * At 100 TB this is the standard spatial-bucketing plan: one 5×
  * probe replication (narrow), one shuffle on the cell key, and
  * per-cell candidate work bounded by local density × R². A dense
  * city-block cell is ordinary hash-join skew — AQE skew splitting or
  * the q91 salting pattern applies unchanged, because the quadratic
  * work is confined inside single cells rather than global.
  *
  * Coordinates are integer 1e-4-degree units derived from customer
  * keys by the same modular pattern the NOAA station text embeds
  * (`Noaa.latStr`/`lonStr`, reference ghcnd-stations offsets
  * `noaa_bronze_layer.py`) — integer end to end, so squared distances
  * and the R² threshold compare bit-exactly in any engine.
  */
object Spatial {

  /** Radius in 1e-4-degree units (4°). Cell edge = R, so the
    * neighborhood property "pair within R ⇒ cell deltas ∈ {-1,0,1}"
    * holds by construction. 4° is the smallest radius at which the
    * modular coordinate lattice yields pairs at sf0.001 (the derived
    * points are NOT uniform — they sit on a sparse lattice, measured
    * 0 pairs under 2° there). */
  val RadiusE4 = 40000L

  /** Synthetic integer station coordinates from customer keys (the
    * same derivation the q41 fixed-width station text carries, kept
    * in integer units instead of formatted strings). */
  def customerPoints(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").as("k"),
      ((col("c_custkey") % 80) * 10000 +
        (col("c_custkey") * 7 % 10000)).as("lat"),
      ((col("c_custkey") * 3 % 170) * 10000 +
        (col("c_custkey") * 13 % 10000)).as("lon"))

  /** All unordered point pairs within Euclidean distance `r`, exactly
    * once each, from a (k: long, lat: long, lon: long) frame with
    * non-negative coordinates and unique keys. Output:
    * (a_k, b_k, dist2) with a_k < b_k. */
  def radiusPairs(points: DataFrame, r: Long): DataFrame = {
    val pts = points
      .withColumn("gx", expr(s"lat div ${r}L"))
      .withColumn("gy", expr(s"lon div ${r}L"))
    // forward half-neighborhood: (0,0) plus the four cells whose
    // (dx,dy) is lexicographically greater — covers each adjacent
    // unordered cell pair in exactly one direction
    val deltas = Seq((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
    val probes = pts
      .select(col("*"), explode(array(deltas.map { case (dx, dy) =>
        struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
      }: _*)).as("d"))
      .select(col("k").as("ak"), col("lat").as("alat"),
        col("lon").as("alon"), col("gx").as("agx"), col("gy").as("agy"),
        (col("gx") + col("d.dx")).as("cx"),
        (col("gy") + col("d.dy")).as("cy"))
    val homes = pts.select(col("k").as("bk"), col("lat").as("blat"),
      col("lon").as("blon"), col("gx").as("cx"), col("gy").as("cy"))
    val d2: Column =
      (col("alat") - col("blat")) * (col("alat") - col("blat")) +
        (col("alon") - col("blon")) * (col("alon") - col("blon"))
    val sameCell = col("agx") === col("cx") && col("agy") === col("cy")
    probes.join(homes, Seq("cx", "cy"))
      .filter((!sameCell || col("ak") < col("bk")) && d2 <= lit(r * r))
      .select(least(col("ak"), col("bk")).as("a_k"),
        greatest(col("ak"), col("bk")).as("b_k"),
        d2.cast("long").as("dist2"))
  }

  /** q134: station pairs within 4° — the grid-blocked radius
    * self-join over the customer-derived station coordinates. The
    * oracle is the exhaustive all-pairs filter, so a green hash is an
    * external proof the blocking loses no pair and duplicates none. */
  def q134SpatialJoin(spark: SparkSession, dir: String): DataFrame =
    radiusPairs(customerPoints(Tables.load(spark, dir, "customer")), RadiusE4)
      .select(col("a_k").as("a_custkey"), col("b_k").as("b_custkey"),
        col("dist2"))

  val q134Oracle: String = {
    val r2 = RadiusE4 * RadiusE4
    s"""WITH p AS (
       |  SELECT c_custkey AS k,
       |    (c_custkey % 80) * 10000 + (c_custkey * 7 % 10000) AS lat,
       |    (c_custkey * 3 % 170) * 10000 + (c_custkey * 13 % 10000) AS lon
       |  FROM customer)
       |SELECT a.k AS a_custkey, b.k AS b_custkey,
       |  CAST((a.lat - b.lat) * (a.lat - b.lat) +
       |       (a.lon - b.lon) * (a.lon - b.lon) AS BIGINT) AS dist2
       |FROM p a JOIN p b ON a.k < b.k
       |WHERE (a.lat - b.lat) * (a.lat - b.lat) +
       |      (a.lon - b.lon) * (a.lon - b.lon) <= $r2""".stripMargin
  }
}
