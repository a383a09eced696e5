package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The checksum's reconciliation properties: partitioning invariance,
  * single-row-change localization, and the duplicate-pair XOR caveat
  * the scaladoc documents.
  */
class IntegritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sums(rows: Seq[(Long, String)], parts: Int) = {
    val df = rows.toDF("id", "payload").repartition(parts)
    Integrity.bucketChecksum(df,
        concat_ws("|", col("id"), col("payload")), "t")
      .collect()
      .map(r => (r.getLong(1), (r.getLong(2), r.getLong(3)))).toMap
  }

  test("checksums are independent of partitioning and row order") {
    val rows = (0 until 500).map(i => (i.toLong, s"payload_$i"))
    assert(sums(rows, 1) == sums(rows.reverse, 13))
  }

  test("a single changed row changes exactly its bucket, count intact") {
    val rows = (0 until 500).map(i => (i.toLong, s"payload_$i"))
    val changed = rows.updated(123, (123L, "tampered"))
    val (a, b) = (sums(rows, 4), sums(changed, 4))
    val diff = (a.keySet ++ b.keySet).filter(k => a.get(k) != b.get(k))
    // the edit moves one row between (at most) two buckets; counts must
    // flag any bucket whose membership changed
    assert(diff.nonEmpty && diff.size <= 2)
    val unchanged = (a.keySet -- diff)
    assert(unchanged.forall(k => a(k) == b(k)))
  }

  test("duplicate row pairs cancel in XOR but not in the count") {
    val base = Seq((1L, "x"), (2L, "y"))
    val dup = Seq((1L, "x"), (2L, "y"), (2L, "y"), (2L, "y"))
    val (a, b) = (sums(base, 2), sums(dup, 2))
    // per bucket: XOR of (y,y) cancels, so checksums agree...
    assert(a.forall { case (k, (_, cs)) => b(k)._2 == cs })
    // ...but the row counts differ — the reason n_rows rides along
    assert(a.map(_._2._1).sum + 2 == b.map(_._2._1).sum)
  }

  test("q111 emits all three tables with full coverage of rows") {
    val out = Integrity.q111TableChecksum(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val byTable = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = Seq("orders", "customer", "lineitem").map { t =>
      t -> graft.Tables.load(spark, TestSpark.sfDir, t).count()
    }.toMap
    assert(byTable == expect)
  }
}
