package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtendedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("manual interpolated percentiles agree with Spark's built-in percentile") {
    val manual = Extended.q69PercentileCont(spark, TestSpark.sfDir)
      .as[(String, Double, Double)].collect()
      .map { case (s, p, v) => (s, p) -> v }.toMap
    val builtin = graft.Tables.load(spark, TestSpark.sfDir, "orders")
      .groupBy(col("o_orderstatus").as("status"))
      .agg(percentile(col("o_totalprice"),
        array(Extended.PercentilePs.map(lit): _*)).as("ps"))
      .as[(String, Seq[Double])].collect()
    assert(manual.nonEmpty)
    for ((s, vs) <- builtin; (p, v) <- Extended.PercentilePs.zip(vs))
      assert(math.abs(manual((s, p)) - v) < 1e-6,
        s"status $s p=$p manual=${manual((s, p))} builtin=$v")
  }

  test("mixture sampling emits floor(r) epochs for every doc plus a hash-selected fraction") {
    val out = Curation.q68MixtureSample(spark, TestSpark.sfDir)
      .groupBy("source").agg(countDistinct("doc_id").as("docs"),
        count(lit(1)).as("rows"), max("epoch").as("max_epoch"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // r = 2.0 sources: every doc exactly twice
    assert(out("src0")._3 == 2 * out("src0")._2 && out("src0")._4 == 1L)
    // r = 1.0 sources: every doc exactly once
    assert(out("src5")._3 == out("src5")._2 && out("src5")._4 == 0L)
    // r = 0.25 sources: a strict subset selected, epoch 0 only
    val total19 = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .filter(col("source") === "src19").count()
    assert(out("src19")._2 < total19 && out("src19")._4 == 0L)
  }
}
