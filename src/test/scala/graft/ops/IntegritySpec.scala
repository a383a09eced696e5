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

  test("q132: a planted orphan FK row is counted on exactly its edge") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fk").toString
    Seq((0L, "A")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$dir/nation.parquet")
    Seq((1L, 0L)).toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, 0L)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$dir/supplier.parquet")
    Seq(Tuple1(1L)).toDF("p_partkey").write.parquet(s"$dir/part.parquet")
    Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    // two rows on orderkey 99 -> 2 orphan rows, 1 orphan key
    Seq((1L, 1L, 1L), (99L, 1L, 1L), (99L, 1L, 1L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = Integrity.q132FkAudit(spark, dir)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("lineitem.l_orderkey->orders") ==
      (("lineitem.l_orderkey->orders", 3L, 2L, 1L)))
    assert(out.values.count(_._3 == 0L) == 5, s"got $out")
  }

  test("q133: revenue units multiply cents by (100 - discount centi-units)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("trade").toString
    Seq((0L, "A"), (1L, "B")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$dir/nation.parquet")
    Seq((1L, 0L)).toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    Seq((1L, 1L)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$dir/supplier.parquet")
    Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, 1L, 10.00, 0.05))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = Relational.q133TradeMatrix(spark, dir)
      .as[(String, String, Long, Long)].collect()
    assert(out.toSeq == Seq(("A", "B", 1L, 95000L)), s"got ${out.toSeq}")
  }
}
