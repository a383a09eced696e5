package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke over every registered query at sf0.001. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, TestSpark.sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
