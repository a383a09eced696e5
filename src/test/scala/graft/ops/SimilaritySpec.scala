package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("brute-force KNN ranks are complete and cosine-descending per query") {
    val rows = SimilarityOps.q21KnnCosine(spark, TestSpark.sfDir)
      .as[(Long, Long, Long, Double)].collect()
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    for ((q, rs) <- byQuery) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to 10L), s"query $q ranks")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq, s"query $q not descending")
      assert(sorted.forall(r => r._4 <= 1.0 + 1e-9 && r._4 >= -1.0 - 1e-9))
    }
  }

  test("sign-LSH puts identical vectors in the same bucket and splits distant ones") {
    val planes = SimilarityOps.hyperplanes(bits = 16, dim = 4)
    def bucket(v: Array[Double]): Long =
      planes.zipWithIndex.map { case (p, i) =>
        if (p.zip(v).map { case (a, b) => a * b }.sum >= 0.0) 1L << i else 0L
      }.reduce(_ | _)
    val v = Array(0.5, -0.2, 0.9, 0.1)
    assert(bucket(v) == bucket(v.clone()))
    val neg = v.map(-_)
    assert(bucket(v) != bucket(neg), "antipodal vectors must differ in every bit")
    assert(java.lang.Long.bitCount(bucket(v) ^ bucket(neg)) == 16)
  }

  test("LSH bucket query output covers every vector exactly once") {
    val df = SimilarityOps.q22AnnLshBuckets(spark, TestSpark.sfDir)
    val n = graft.Tables.load(spark, TestSpark.sfDir, "embeddings").count()
    assert(df.count() == n)
    assert(df.select("vec_id").distinct().count() == n)
  }
}
