package graft.streaming

import java.nio.file.Files

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The medallion pipeline in STREAMING form, end to end on real files:
  * a file-source bronze scan (the reference's incremental staging
  * read), a watermarked stream-static silver dim join (dim_geo shape),
  * and a checkpointed parquet silver sink — then the streamed silver
  * output is compared against the batch dim built from the same
  * source, closing the batch/stream loop at the pipeline level.
  */
class StreamingMedallionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file-source bronze → stream-static silver join → parquet sink equals the batch dim") {
    // bronze source: customer parquet copied into a watched directory
    val srcDir = Files.createTempDirectory("stream_src").toString
    val customer = Tables.load(spark, TestSpark.sfDir, "customer")
    customer.write.mode("overwrite").parquet(srcDir)

    val nation = Tables.load(spark, TestSpark.sfDir, "nation")
    val region = Tables.load(spark, TestSpark.sfDir, "region")

    val bronze = spark.readStream
      .schema(customer.schema)
      .parquet(srcDir)
      // synthetic arrival time to exercise the watermark path
      .withColumn("modified", current_timestamp())
      .withWatermark("modified", "5 minutes")

    val silver = graft.ops.Dims.dimGeo(bronze, nation, region)

    val outDir = Files.createTempDirectory("stream_silver").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    val q = silver.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()

    val streamed = spark.read.parquet(outDir)
    val batch = graft.ops.Dims.dimGeo(customer, nation, region)
    assert(streamed.count() == customer.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
