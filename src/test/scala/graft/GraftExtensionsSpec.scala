package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions are reachable from SQL once registered. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftExtensions.registerFunctions(s)
    s
  }

  test("dot_product / simhash64 / minhash_sig / rolling_min_hash work from SQL") {
    import spark.implicits._
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0), "hello world foo"))
      .toDF("a", "b", "s").createOrReplaceTempView("ext_t")
    val row = spark.sql(
      """SELECT dot_product(a, b) AS dp,
        |       simhash64(split(s, ' ')) AS sh,
        |       simhash_md5(split(s, ' ')) AS shm,
        |       size(minhash_sig(transform(a, x -> CAST(x AS BIGINT)), 8)) AS mk,
        |       rolling_min_hash(s, 4) AS rh
        |FROM ext_t""".stripMargin).head
    assert(row.getAs[Double]("dp") == 32.0)
    assert(row.getAs[Long]("sh") != 0L)
    assert(row.getAs[Long]("shm") != 0L)
    assert(row.getAs[Int]("mk") == 8)
    assert(row.getAs[Long]("rh") > 0L)
  }

  test("hashed_shingles / token_bucket_counts work from SQL") {
    import spark.implicits._
    Seq("alpha beta gamma delta").toDF("s").createOrReplaceTempView("ext_t2")
    val row = spark.sql(
      """SELECT size(hashed_shingles(s, 3)) AS ns,
        |       aggregate(token_bucket_counts(s, 64), 0L, (a, x) -> a + x) AS total
        |FROM ext_t2""".stripMargin).head
    assert(row.getAs[Int]("ns") == 2) // two 3-gram shingles of 4 tokens
    assert(row.getAs[Long]("total") == 4L) // four tokens counted
  }

  test("registerAll exposes every test table to spark.sql") {
    graft.Tables.registerAll(spark, TestSpark.sfDir)
    val row = spark.sql(
      """SELECT n.n_name, count(*) AS suppliers
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY suppliers DESC, n.n_name LIMIT 1""".stripMargin).head
    assert(row.getLong(1) > 0)
    assert(spark.sql("SELECT count(*) FROM documents").head.getLong(0) > 0)
  }

  test("SQL simhash64 matches the column-function vote computation") {
    import spark.implicits._
    val docs = Seq((1L, "spark shuffles partition data across executors")).toDF("doc_id", "text")
    val viaExpr = docs.select(
      graft.functions.SimHash64(split(col("text"), " ")).as("s"))
      .head.getLong(0)
    // independent recomputation with stock column functions (xxhash64 seed 42)
    val tok = docs.select(explode(split(col("text"), " ")).as("token"))
    val h = xxhash64(col("token"))
    val votes = (0 until 64).map(i =>
      sum(when(shiftrightunsigned(h, i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"v$i"))
    val vRow = tok.agg(votes.head, votes.tail: _*).head
    val expected = (0 until 64).map { i =>
      if (vRow.getLong(i) > 0) 1L << i else 0L
    }.reduce(_ | _)
    assert(viaExpr == expected)
  }
}
