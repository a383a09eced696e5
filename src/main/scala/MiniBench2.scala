import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
object MiniBench2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $name%-34s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    def canon(e: DataFrame) = e.filter(col("u") =!= col("v")).distinct()
    def largeStar(e: DataFrame) = {
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
      sym.withColumn("m", least(min(col("v")).over(w), col("u")))
        .filter(col("v") > col("u")).select(col("m").as("u"), col("v"))
    }
    val edges0 = graft.ops.DedupOps.q18NgramJaccard(spark, dir)
      .select(col("doc_id_1").as("u"), col("doc_id_2").as("v"))
    val cur = canon(edges0.select(least(col("u"),col("v")).as("u"), greatest(col("u"),col("v")).as("v"))).persist()
    t("sig-style agg (materialize)")(cur.agg(count(lit(1)), sum(xxhash64(col("u"),col("v")).cast(org.apache.spark.sql.types.DecimalType(38,0)))).head())
    t("cur.count (cached?)")(cur.count())
    t("largeStar(cur).count")(largeStar(cur).count())
    t("LS(LS(cur)).count")(largeStar(largeStar(cur)).count())
    println("[t] executedPlan of largeStar contains InMemoryRelation: " +
      largeStar(cur).queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
    spark.stop()
  }
}
