package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming HLL register state must equal the oracle-checked
  * batch register state (q49) on the same events, however the stream
  * is chopped into micro-batches — the streaming face of sketch
  * mergeability (q101 proves the batch face).
  */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("streaming HLL registers (Complete mode) equal batch q49 state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.load(spark, sf, "events")
      .select("event_type", "user_id").as[(String, Long)].collect()

    val ev = MemoryStream[(String, Long)]
    val out = SketchStream.registers(ev.toDS().toDF("event_type", "user_id"))
    val q = out.writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    // three uneven micro-batches — the split must not matter
    val chunks = Seq(rows.take(100), rows.slice(100, 101), rows.drop(101))
    chunks.filter(_.nonEmpty).foreach { c =>
      ev.addData(c.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val streaming = spark.table("hll_stream")
      .as[(String, Long, Int)].collect().toSet

    val batch = graft.ops.Curation.q49HllRegisters(spark, sf)
      .as[(String, Long, Int)].collect().toSet

    assert(batch.nonEmpty && streaming == batch)
  }

  test("streaming CMS cells (Complete mode) equal the batch q80 sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val texts = graft.Tables.load(spark, sf, "documents")
      .select("text").as[String].collect()

    val docs = MemoryStream[String]
    val out = SketchStream.cmsSketch(docs.toDS().toDF("text"))
    val q = out.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    // uneven micro-batches, including a singleton — the split must not matter
    val chunks = Seq(texts.take(7), texts.slice(7, 8), texts.drop(8))
    chunks.filter(_.nonEmpty).foreach { c =>
      docs.addData(c.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val streaming = spark.table("cms_stream")
      .as[(Int, Int, Long)].collect().toSet

    val batch = SketchStream.cmsSketch(
        graft.Tables.load(spark, sf, "documents"))
      .as[(Int, Int, Long)].collect().toSet

    assert(batch.nonEmpty && streaming == batch)
  }

  test("registers() on a batch frame is the identical computation") {
    import spark.implicits._
    val batchViaOp = SketchStream.registers(
        graft.Tables.load(spark, sf, "events"))
      .as[(String, Long, Int)].collect().toSet
    val q49 = graft.ops.Curation.q49HllRegisters(spark, sf)
      .as[(String, Long, Int)].collect().toSet
    assert(batchViaOp == q49)
  }
}
