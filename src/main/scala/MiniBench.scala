import org.apache.spark.sql.SparkSession
object MiniBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val dir = "/root/testdata/sf0.1"
    for (n <- args) {
      val fn = graft.SparkEntry.queries(n)
      val times = (1 to 2).map { _ =>
        val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val dt = (System.nanoTime()-t0)/1e9
        spark.sqlContext.clearCache()
        spark.sparkContext.getPersistentRDDs.foreach{case(id,r)=>if(!before.contains(id)) r.unpersist(false)}
        dt
      }
      println(f"$n%-22s ${times.min}%.2f s (runs: ${times.map(t=>f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
