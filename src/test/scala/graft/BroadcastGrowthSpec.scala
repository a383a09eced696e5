package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, ResolvedHint, BROADCAST}

/** Empirical lint for every EXPLICIT broadcast() hint in every
  * registered query: a hint pinned at authoring time is only safe if
  * the hinted frame is aggregate-sized — bounded by a group count, a
  * limit, a fixed dimension — not by the corpus. (An unhinted join the
  * planner chooses to broadcast is fine: stats/AQE stop broadcasting
  * the moment the table outgrows the threshold. A HINTED one OOMs.)
  *
  * "Aggregate-sized" is operationalized by measurement, not by node
  * shape: each hinted subtree is counted at sf0.001 and at sf0.01 (10×
  * the corpus) and flagged when it grows ≥4× AND exceeds 200 rows —
  * corpus-growing frames (customer, supplier, orders projections) grow
  * ~10×; genuine aggregate frames (totals, per-group stats, nation/
  * region dims, boundary rows, block offsets) stay flat or near-flat.
  * The 4× slack absorbs time-range- and vocabulary-bounded frames that
  * densify sublinearly on tiny inputs. This is the rule the four r6
  * de-hinted sites (q252/q241/q238/q237) violated; the spec keeps the
  * mistake from being re-introduced anywhere.
  */
class BroadcastGrowthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfSmall = TestSpark.sfDir           // sf0.001
  private val sfBig = "/root/testdata/sf0.01"     // 10× rows

  // queries with a hinted frame that the growth measurement misreads —
  // in each case the frame is bounded by the DOMAIN, not the corpus:
  //   q44: the filtered NOAA station index. The real-world frame is a
  //        fixed reference catalog (the GHCN station list, ~1e5 rows /
  //        a few MB — nation/region class); the synthetic fixture
  //        derives station count from the scale factor, so it "grows"
  //        here while the production frame cannot.
  private val domainBounded = Set("q44_noaa_us_metrics")

  private def hintedChildren(df: org.apache.spark.sql.DataFrame): Seq[LogicalPlan] =
    df.queryExecution.analyzed.collect {
      // `_bkt` in the output marks graft.ops.Rank's internal offset
      // frames: ≤ |groups|·256 rows BY CONSTRUCTION (the same marker
      // PlanLintSpec trusts). Their occupancy saturates toward the 256
      // cap between tiny scale factors, which reads as growth here
      // while the true bound is constant.
      case h: ResolvedHint
          if h.hints.strategy.contains(BROADCAST) &&
            !h.child.output.exists(_.name == "_bkt") => h.child
    }

  // counts memoized on the canonicalized subtree: the shared primitives
  // (Rank offsets, totals frames) recur across many queries and must
  // not be re-counted per query
  private val memo = scala.collection.mutable.Map.empty[LogicalPlan, Long]
  private def rowsOf(p: LogicalPlan): Long =
    memo.getOrElseUpdate(p.canonicalized,
      org.apache.spark.sql.graft.ColumnBridge.ofRows(spark, p).count())

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name broadcast hints are aggregate-sized (10x-data stable)") {
      assume(!domainBounded.contains(name))
      val small = hintedChildren(fn(spark, sfSmall))
      if (small.nonEmpty) {
        val big = hintedChildren(fn(spark, sfBig))
        assert(small.size == big.size,
          s"$name hint count differs across scale factors")
        val offenders = small.zip(big).zipWithIndex.flatMap {
          case ((s, b), i) =>
            val (ns, nb) = (rowsOf(s), rowsOf(b))
            if (nb >= 200 && nb >= 4 * math.max(ns, 1L))
              Some(s"hint #$i grows ${ns}->${nb} rows at 10x data")
            else None
        }
        assert(offenders.isEmpty,
          s"$name broadcasts a corpus-growing frame: ${offenders.mkString("; ")}")
      }
    }
  }
}
