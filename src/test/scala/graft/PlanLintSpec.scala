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
    "q28_global_topk",    // global sort+limit demo (tiny top-k frame)
    "q59_sequence_pack")  // block-offset prefix sum over block TOTALS

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
    }
  }
}
