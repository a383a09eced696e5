package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet (SURVEY §2.1/§2.2): the
  * ORC path is first-class in this Spark build (CSV/JSONL/fixed-width
  * are covered by IngestSpec/NoaaSpec; avro's external connector jar
  * is absent from /opt/spark/jars, documented here). A format is
  * "supported" only if a round-trip is bit-faithful AND the scan
  * still prunes columns and pushes filters — otherwise a 100 TB table
  * in that format silently loses the scan-side optimizations the
  * engine's plans assume.
  */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ORC round-trip is bit-faithful for the lineitem slice") {
    val src = Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate",
        "l_returnflag")
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    src.write.mode("overwrite").orc(s"$dir/li_orc")
    val back = spark.read.orc(s"$dir/li_orc")
    assert(back.schema == src.schema, s"schema drift: ${back.schema}")
    val a = src.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.length == b.length && a.sameElements(b))
  }

  test("ORC scan pushes filters and prunes columns") {
    val dir = java.nio.file.Files.createTempDirectory("orc2").toString
    Tables.load(spark, TestSpark.sfDir, "lineitem")
      .write.mode("overwrite").orc(s"$dir/li_orc")
    val q = spark.read.orc(s"$dir/li_orc")
      .filter(col("l_quantity") > 45.0)
      .select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(l_quantity"),
      s"filter not pushed into ORC scan:\n$plan")
    val schemaLine = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(schemaLine.contains("l_orderkey") &&
      !schemaLine.contains("l_comment"),
      s"column pruning failed for ORC: $schemaLine")
    assert(q.count() > 0)
  }

  test("ORC aggregate result equals the parquet-sourced result") {
    val dir = java.nio.file.Files.createTempDirectory("orc3").toString
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    li.write.mode("overwrite").orc(s"$dir/li_orc")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(graft.ops.Exact.units(col("l_quantity"), 2)).as("qty_u2"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
    assert(agg(spark.read.orc(s"$dir/li_orc")) === agg(li))
  }
}
