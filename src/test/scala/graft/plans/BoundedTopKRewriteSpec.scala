package graft.plans

import graft.{GraftExtensions, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ranking-window rewrite must (a) fire only when opted in, (b)
  * eliminate the Window node from the optimized plan, and (c) return
  * bit-identical rows to the window it replaces, across the filter
  * shapes it recognizes. */
class BoundedTopKRewriteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftExtensions.registerOptimizations(s)
    s
  }

  private def df: DataFrame = {
    import spark.implicits._
    // 3 groups × 200 rows, unique tiebreak id → total order
    (0 until 600).map(i => (i % 3, (i * 37) % 101, i.toLong))
      .toDF("g", "score", "id")
  }

  private def windowTopK(k: Int, keepRank: Boolean): DataFrame = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id").asc)
    val ranked = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
    if (keepRank) ranked else ranked.drop("rn")
  }

  private def withRule[A](f: => A): A = {
    spark.conf.set("spark.graft.rewrite.boundedTopK", "true")
    try f finally spark.conf.unset("spark.graft.rewrite.boundedTopK")
  }

  private def optimizedHasWindow(q: DataFrame): Boolean =
    q.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty

  test("disabled by default: the window survives") {
    assert(optimizedHasWindow(windowTopK(5, keepRank = true)))
  }

  test("enabled: window eliminated, rows bit-identical (rank kept)") {
    val expected = windowTopK(5, keepRank = true).collect().toSet
    withRule {
      val q = windowTopK(5, keepRank = true)
      assert(!optimizedHasWindow(q), q.queryExecution.optimizedPlan.toString)
      assert(q.queryExecution.optimizedPlan.toString.contains("bounded_top_k"))
      assert(q.collect().toSet == expected)
    }
  }

  test("enabled: rank projected away still rewrites and matches") {
    val expected = windowTopK(7, keepRank = false).collect().toSet
    withRule {
      val q = windowTopK(7, keepRank = false)
      assert(!optimizedHasWindow(q))
      assert(q.collect().toSet == expected)
    }
  }

  test("strict < bound and rn = 1 both rewrite") {
    import spark.implicits._
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id").asc)
    val lt = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") < 4)
    val top1 = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val expLt = lt.collect().toSet
    val expTop1 = top1.collect().toSet
    withRule {
      val qLt = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") < 4)
      val qTop1 = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      assert(!optimizedHasWindow(qLt) && !optimizedHasWindow(qTop1))
      assert(qLt.collect().toSet == expLt)
      assert(qTop1.collect().toSet == expTop1)
    }
  }

  test("non-row_number windows and rank() are left untouched") {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("score").desc, col("id").asc)
    withRule {
      val q = df.withColumn("rk", rank().over(w)).filter(col("rk") <= 5)
      assert(optimizedHasWindow(q), "rank() must not be rewritten")
      // and an unfiltered row_number window stays a window
      val q2 = df.withColumn("rn", row_number().over(w))
      assert(optimizedHasWindow(q2))
    }
  }

  test("rewrite survives a corpus-sized sanity run on real data") {
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    val expected = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).collect().toSet
    withRule {
      val q = docs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
      assert(!optimizedHasWindow(q))
      assert(q.collect().toSet == expected)
    }
  }
}
