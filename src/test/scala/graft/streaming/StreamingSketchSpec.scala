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

  test("streaming KMV registers equal the oracle-checked batch q156 state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val rows = graft.Tables.load(spark, sf, "documents")
      .select(col("source"), substring(md5(
        graft.functions.TextFunctions.normText(col("text"))), 1, 15).as("h"))
      .as[(String, String)].collect()

    val in = MemoryStream[(String, String)]
    val out = KmvStream.registers(in.toDS().toDF("source", "h15"))
    val acc = new scala.collection.concurrent.TrieMap[String, Seq[String]]()
    val q = out.writeStream.outputMode("update")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[KmvStream.KmvRegister], _: Long) =>
          df.collect().foreach(r => acc.put(r.source, r.register))
      }.start()
    // uneven micro-batches INCLUDING a duplicate replay of the first
    // chunk — union-then-take-k is idempotent, so replays must not
    // change any register
    val chunks =
      Seq(rows.take(50), rows.slice(50, 51), rows.drop(51), rows.take(50))
    chunks.filter(_.nonEmpty).foreach { c =>
      in.addData(c.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()

    val expected = graft.ops.Kmv.q156KmvSketch(spark, sf)
      .select($"source", $"register_md5").as[(String, String)].collect().toMap
    assert(acc.nonEmpty && acc.keySet == expected.keySet)
    acc.foreach { case (src, reg) =>
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(reg.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(md5hex == expected(src),
        s"$src: streaming register diverges from batch q156 state")
    }
  }

  test("KmvStream.registers on a batch frame reproduces the q156 registers") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val batchRows = graft.Tables.load(spark, sf, "documents")
      .select(col("source"), substring(md5(
        graft.functions.TextFunctions.normText(col("text"))), 1, 15).as("h15"))
    val viaState = KmvStream.registers(batchRows).collect()
      .map(r => r.source -> r.register.mkString(",")).toMap
    val expected = graft.ops.Kmv.q156KmvSketch(spark, sf)
      .select($"source", $"register_md5").as[(String, String)].collect().toMap
    assert(viaState.keySet == expected.keySet)
    viaState.foreach { case (src, reg) =>
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(reg.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5hex == expected(src))
    }
  }

  test("streaming TV-drift cells (Complete mode) equal batch q176 cells, and the finisher reproduces q176") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = graft.Tables.load(spark, sf, "events")
      .select("event_type", "ts", "value")
      .as[(String, java.sql.Timestamp, Double)].collect()

    val ev = MemoryStream[(String, java.sql.Timestamp, Double)]
    val out = DriftStream.cells(ev.toDS().toDF("event_type", "ts", "value"))
    val q = out.writeStream.format("memory").queryName("drift_stream")
      .outputMode("complete").start()
    // uneven micro-batches straddling the split timestamp arbitrarily
    val chunks = Seq(rows.take(997), rows.slice(997, 998), rows.drop(998))
    chunks.filter(_.nonEmpty).foreach { c =>
      ev.addData(c.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop(); q.awaitTermination()
    val streaming = spark.table("drift_stream")
      .as[(String, Long, Long, Long)].collect().toSet
    val batch = graft.ops.Audit.q176Cells(
        graft.Tables.load(spark, sf, "events"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty && streaming == batch)

    // the cells-sized finisher over the STREAMED state reproduces the
    // oracle-checked q176 output bit-exactly (cells re-materialized as
    // a local frame: the finisher self-joins, and joining a memory-sink
    // view to its own aggregate trips conflicting-reference resolution)
    val cellsDf = streaming.toSeq
      .toDF("event_type", "bin", "c_a", "c_b")
    val finished = graft.ops.Audit.q176Finish(cellsDf)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val q176 = graft.ops.Audit.q176TvDrift(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(finished == q176)
  }
}
