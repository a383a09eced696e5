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
  // totals, global percentile targets, tiny rank frames), not the corpus
  private val globalWindowAllowed = Set(
    "q28_global_topk",    // global sort+limit demo (tiny top-k frame)
    "q54_moving_window",  // global ntile quartile over orders (documented)
    "q59_sequence_pack")  // block-offset prefix sum over block TOTALS

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name plan has no cartesian product or stray global window") {
      val plan = fn(spark, TestSpark.sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExtendedMode)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a true cartesian product")
      // detect Window specs with no partition columns: an unpartitioned
      // spec's FIRST argument is already an ordering expression
      // (suffixed ASC/DESC); a partitioned spec lists plain partition
      // expressions first
      val stray = raw"windowspecdefinition\([^,()]+ (ASC|DESC)".r
        .findFirstIn(plan)
      if (!globalWindowAllowed.contains(name))
        assert(stray.isEmpty,
          s"$name has an unpartitioned Window: ${stray.getOrElse("")}")
    }
  }
}
