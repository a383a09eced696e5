package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan lint over EVERY registered query: no physical plan may contain
  * a true CartesianProduct (an unkeyed shuffle-cross scales as N² data
  * movement; broadcast nested-loop against a tiny side is fine and is
  * a different node), and the queries allowed an unpartitioned Window
  * are pinned to an explicit allowlist of aggregate-sized inputs so a
  * refactor can't silently route corpus-sized data through one task.
  */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // queries whose plans legitimately contain a partition-less Window —
  // in every case the window input is already aggregate-sized (block
  // totals, tiny top-k frames), not the corpus. The former members
  // (q54 global ntile, and the per-group windows behind q69/q70/q48)
  // now rank through the two-phase distributed graft.ops.Rank.
  private val globalWindowAllowed = Set(
    "q28_global_topk",      // global sort+limit demo (tiny top-k frame)
    "q59_sequence_pack",    // block-offset prefix sum over block TOTALS
    "q214_temperature_mix") // Hamilton apportionment over the LANGUAGE
                            // COUNT frame: |languages| rows, not corpus
    // q220 left this list in r6: its risk-set + survival windows became
    // one ordered aggregate-HOF fold over the per-day table (no Window
    // node at all — and no per-day recursion either)

  /** Every windowspecdefinition whose argument list holds NO partition
    * expressions: the first depth-0 argument is then already an
    * ordering expression (suffixed ASC/DESC NULLS …). Scanned with a
    * paren-balanced walk, not a char-class regex — a sort key like
    * `cast(x#1 as double) DESC` contains parens/spaces and must still
    * be caught. */
  private def unpartitionedWindows(plan: String): Seq[String] = {
    val marker = "windowspecdefinition("
    val out = Seq.newBuilder[String]
    var i = plan.indexOf(marker)
    while (i >= 0) {
      var j = i + marker.length
      var depth = 0
      val first = new StringBuilder
      var done = false
      while (!done && j < plan.length) {
        val c = plan.charAt(j)
        if (c == '(') { depth += 1; first += c }
        else if (c == ')') {
          if (depth == 0) done = true else { depth -= 1; first += c }
        } else if (c == ',' && depth == 0) done = true
        else first += c
        j += 1
      }
      val arg = first.result().trim
      if (arg.matches("(?s).*\\b(ASC|DESC)(\\s+NULLS\\s+(FIRST|LAST))?$"))
        out += arg
      i = plan.indexOf(marker, i + marker.length)
    }
    out.result()
  }

  test("unpartitioned-window detector catches parenthesized sort keys") {
    val hit = "Window [...], [windowspecdefinition(cast(x#1 as double) " +
      "DESC NULLS LAST, specifiedwindowframe(RowFrame, ...))]"
    val miss = "Window [...], [windowspecdefinition(g#2, cast(x#1 as " +
      "double) DESC NULLS LAST, specifiedwindowframe(RowFrame, ...))]"
    assert(unpartitionedWindows(hit).nonEmpty)
    assert(unpartitionedWindows(miss).isEmpty)
  }

  // queries whose plans legitimately contain a window partitioned by a
  // trivial-cardinality key — in every case the window INPUT is already
  // aggregate-sized (a fused pair of top-10 frames, probe selections
  // over |queries|×|cells| rows), so the per-partition sort is bounded
  // by construction, not by luck.
  private val smallPartitionWindowAllowed = Set(
    "q163_rrf_fusion",          // fuses two ≤10-row-per-query rankings
    "q36_ivf_search",           // probe window over queries×cells rows
    "q56_ivf_search_trained",   // same probe window, trained centroids
    "q159_ann_recall",          // recall join of two top-10 frames
    "q97_gap_fill_locf",        // LOCF over the RESAMPLED grid: its size
                                // is hours×types (time-range bounded),
                                // independent of corpus row count
    "q202_ema")                 // lag frame over the HOURLY AGGREGATE:
                                // hours×types rows (time-range bounded,
                                // like q97), not corpus-scaled

  /** Empirical companion to the textual lint: for every Window node in
    * the ANALYZED plan, measure its input — rows and distinct partition
    * keys — on the test data. A window whose key collapses a large
    * input into a handful of partitions is the q21-shape scale killer
    * (each partition becomes one corpus-sized single-task sort at
    * 100×); the textual detector can't see it because the window IS
    * partitioned. Thresholds: flag when input ≥ 500 rows funnel into
    * ≤ 16 partitions averaging ≥ 100 rows each. */
  private def trivialPartitionWindows(
      df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import org.apache.spark.sql.functions.{count_distinct, lit, struct, count => fcount}
    def touchesBkt(w: LWindow): Boolean =
      (w.partitionSpec ++ w.orderSpec.map(_.child)).exists(_.exists {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
          a.name == "_bkt"
        case _ => false
      }) ||
        // phase-2 group-total windows neither partition nor order by
        // _bkt, but they RUN OVER the (group, _bkt) counts table — the
        // marker column is in the child's output
        w.child.output.exists(_.name == "_bkt")
    df.queryExecution.analyzed.collect {
      // `_bkt` marks the two-phase Rank primitive: its windows are
      // bounded BY CONSTRUCTION (phase 2 runs over the ≤ groups×256
      // counts table; phase 3 partitions each group into 256 bucket
      // slices — tiny test data can degenerate to few occupied buckets,
      // but the fan-out is data-scaled, not fixed-trivial)
      case w: LWindow if w.partitionSpec.nonEmpty && !touchesBkt(w) =>
        val child = org.apache.spark.sql.graft.ColumnBridge.ofRows(spark, w.child)
        val keys = w.partitionSpec.map(org.apache.spark.sql.graft.ColumnBridge.toColumn)
        val row = child.agg(fcount(lit(1)), count_distinct(struct(keys: _*))).head()
        (row.getLong(0), row.getLong(1), w.partitionSpec.map(_.sql).mkString(", "))
    }.collect {
      case (rows, parts, keys)
          if rows >= 500 && parts <= 16 && rows / math.max(parts, 1) >= 100 =>
        s"window over $rows rows partitioned into $parts groups by ($keys)"
    }
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name plan has no cartesian product or stray global window") {
      val plan = fn(spark, TestSpark.sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExtendedMode)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a true cartesian product")
      val stray = unpartitionedWindows(plan)
      if (!globalWindowAllowed.contains(name))
        assert(stray.isEmpty,
          s"$name has an unpartitioned Window: ${stray.headOption.getOrElse("")}")
      if (!smallPartitionWindowAllowed.contains(name)) {
        val trivial = trivialPartitionWindows(fn(spark, TestSpark.sfDir))
        assert(trivial.isEmpty,
          s"$name funnels a large input through a trivial-cardinality " +
            s"window partition: ${trivial.headOption.getOrElse("")}")
      }
    }
  }
}
