package graft.plans

import graft.{GraftExtensions, SparkEntry, TestSpark}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Optimizer-rule safety over the WHOLE query surface: every registered
  * query must return identical rows with `spark.graft.rewrite.boundedTopK`
  * on and off. The unit shapes in BoundedTopKRewriteSpec prove the rule
  * fires and what it produces; this suite proves the rule is HARMLESS
  * everywhere else — a rewrite that pattern-matched too eagerly on any
  * of the 228 production plans (whose ranking windows come in many more
  * shapes than the unit tests) would surface here as a row diff, not in
  * a driver round.
  *
  * Cost note: each query runs twice at sf0.001; plans the rule does not
  * touch re-execute identically, so this is pure regression insurance,
  * sized to the smallest test scale factor on purpose.
  */
class RewriteEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftExtensions.registerOptimizations(s)
    s
  }

  /** Order-insensitive canonical form; Row.toString is stable within a
    * single JVM for identical values, which is exactly the contract
    * here (same session, same data, two optimizer settings). */
  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def release(before: Set[Int]): Unit = {
    spark.sqlContext.clearCache()
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!before.contains(id)) rdd.unpersist(false)
    }
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name: rows identical with boundedTopK rewrite on and off") {
      val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val off =
        try canon(fn(spark, TestSpark.sfDir))
        finally release(before)
      spark.conf.set("spark.graft.rewrite.boundedTopK", "true")
      try {
        val on = canon(fn(spark, TestSpark.sfDir))
        assert(on == off,
          s"$name returns different rows under the boundedTopK rewrite")
      } finally {
        spark.conf.unset("spark.graft.rewrite.boundedTopK")
        release(before)
      }
    }
  }
}
