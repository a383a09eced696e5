package graft

import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plan of each query (or a named subset)
  * — the iterate-until-it's-the-plan-you-want loop. Usage:
  * runMain graft.Explain [sfDir] [q1_agg q5_fact_orders ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // extra confs (the TimeQuery hook) so a plan can be dumped under
    // the exact session confs a timing arm used, e.g. AQE off to see
    // static ReuseExchange the way the bench session plans it
    ExtraConf(builder)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
