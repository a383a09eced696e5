package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scan-hygiene lint: filters must reach the parquet scan as
  * PushedFilters and projections must prune ReadSchema — the two
  * properties that decide whether a 100 TB scan reads 100 TB or only
  * the slice the query needs. Asserted on the physical plan string of
  * representative registered queries so a refactor that breaks
  * pushdown (an opaque UDF wrapping the filter column, a premature
  * cache, a select *) fails CI rather than silently scanning wide.
  */
class PushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString

  test("q10 semi/anti: the status filter is pushed to the orders scan") {
    val p = physical("q10_semi_anti")
    assert(p.contains("PushedFilters"), "no parquet pushdown section")
    assert(p.contains("EqualTo(o_orderstatus,O)"),
      "o_orderstatus = 'O' did not reach the scan")
  }

  test("q9 set ops: the segment filter is pushed to the customer scan") {
    val p = physical("q9_setops")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      "c_mktsegment filter did not reach the scan")
  }

  test("q1 agg: the lineitem scan prunes to the aggregation columns") {
    val p = physical("q1_agg")
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.nonEmpty, "no ReadSchema in plan")
    // none of the scans may read the key/date columns q1 never touches
    assert(!scans.exists(_.contains("l_partkey")),
      s"unpruned scan: ${scans.mkString("; ")}")
    assert(!scans.exists(_.contains("l_shipdate")),
      s"unpruned scan: ${scans.mkString("; ")}")
  }

  test("q133 trade matrix: fact scan reads only keys and money columns") {
    val p = physical("q133_trade_matrix")
    val li = p.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("l_orderkey")).toSeq
    assert(li.nonEmpty, "no lineitem scan found")
    assert(!li.exists(_.contains("l_shipdate")) &&
      !li.exists(_.contains("l_quantity")),
      s"lineitem scan unpruned: ${li.mkString("; ")}")
  }

  test("q17 dedup: the documents scan never reads lang/source metadata") {
    val p = physical("q17_dedup_exact")
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.nonEmpty && !scans.exists(_.contains("source")),
      s"documents scan unpruned: ${scans.mkString("; ")}")
  }

  test("q134 spatial: the customer scan reads only the key column") {
    val p = physical("q134_spatial_join")
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.nonEmpty, "no ReadSchema in plan")
    // coordinates derive from c_custkey; nothing else may be read
    assert(!scans.exists(s => s.contains("c_name") ||
        s.contains("c_acctbal") || s.contains("c_mktsegment")),
      s"customer scan unpruned: ${scans.mkString("; ")}")
  }

  test("q170 top supplier: the quarter window is pushed to the lineitem scan") {
    val p = physical("q170_top_supplier")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_shipdate"),
      "shipdate quarter bounds did not reach the scan")
  }

  test("q173 disjunctive bands: the OR'd brand/size predicate is pushed to the part scan") {
    val p = physical("q173_disjunctive_bands")
    // the disjunction of (brand, size-range) conjuncts must reach the
    // part scan as an Or pushed filter, not evaluate post-scan
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).toSeq
    assert(pushed.exists(l => l.contains("Or(") && l.contains("p_brand")),
      s"OR predicate not pushed: ${pushed.mkString("; ")}")
  }

  test("q175 idle rich: the recency cutoff is pushed to the orders scan") {
    val p = physical("q175_idle_rich_customers")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "o_orderdate cutoff did not reach the scan")
    // the customer scan reads only the three columns the query uses
    val scans = p.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("c_custkey")).toSeq
    assert(scans.nonEmpty && !scans.exists(_.contains("c_name")),
      s"customer scan unpruned: ${scans.mkString("; ")}")
  }

  test("q138 co-purchase: the lineitem scan reads only order/part keys") {
    val p = physical("q138_copurchase")
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.nonEmpty, "no ReadSchema in plan")
    assert(!scans.exists(s => s.contains("l_extendedprice") ||
        s.contains("l_quantity") || s.contains("l_shipdate")),
      s"lineitem scan unpruned: ${scans.mkString("; ")}")
  }

  test("q237 nation profit: the name LIKE filter is pushed to the part scan") {
    val p = physical("q237_nation_profit")
    assert(p.contains("StringContains(p_name,red)"),
      "p_name LIKE '%red%' did not reach the part scan")
    // the part scan reads only the key, the filter column, and the
    // retail price the profit formula needs
    val part = p.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("p_partkey")).toSeq
    assert(part.nonEmpty && !part.exists(_.contains("p_brand")),
      s"part scan unpruned: ${part.mkString("; ")}")
  }

  test("q231 RFM: the orders scan prunes to custkey, date, price") {
    val p = physical("q231_rfm_segments")
    val scans = p.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("o_custkey")).toSeq
    assert(scans.nonEmpty, "no orders scan found")
    assert(!scans.exists(s => s.contains("o_orderstatus") ||
        s.contains("o_orderpriority")),
      s"orders scan unpruned: ${scans.mkString("; ")}")
  }

  test("q240 band join: both event_type filters reach the events scans, text stays unread") {
    val p = physical("q240_band_join")
    assert(p.contains("EqualTo(event_type,purchase)"),
      "purchase filter did not reach the scan")
    assert(p.contains("EqualTo(event_type,error)"),
      "error filter did not reach the scan")
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.nonEmpty && !scans.exists(_.contains("props")),
      s"events scan reads the wide props column: ${scans.mkString("; ")}")
  }

  test("q250 split gain: the events scan prunes to the feature source columns") {
    val p = physical("q250_split_gain")
    val scans = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.nonEmpty, "no ReadSchema in plan")
    assert(!scans.exists(_.contains("props")) &&
      !scans.exists(_.contains("event_id")),
      s"events scan unpruned: ${scans.mkString("; ")}")
  }
}
