package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loaders over the driver-generated parquet directories
  * (see /root/repo/TESTDATA.md). Analog of the reference's Unity Catalog
  * reads (`spark.read.table(...)`, e.g. Geo_silver_layer_common.py:10-11):
  * a table name resolves to self-describing columnar storage, so scans get
  * column pruning + predicate pushdown from Catalyst for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
    // default; read nanos as long (runtime-settable legacy conf) and
    // normalize to Spark's native microsecond TimestampType so every
    // downstream operator sees an ordinary timestamp column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Registers every table as a temp view so `spark.sql` / `expr` can
    * reference them by name — the in-engine analog of a catalog schema. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
