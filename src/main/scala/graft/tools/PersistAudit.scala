package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{ExtraConf, SparkEntry}

/** Measures what a query LEAVES in the block manager after its action
  * completes — the evidence the documented never-unpersisted persists
  * (q204's `udr`, q165/q76's `docs`, whose returned plans read those
  * frames lazily, so in-function unpersist would recompute the lineage
  * at the caller's action) have so far only argued: session-harness
  * ownership is fine IFF the retained bytes are bounded by corpus
  * stats, not by blow-up terms. One line per query with every cached
  * RDD's name, partitions, and memory/disk bytes, then the release the
  * harness performs — run at sf1 so the bound is measured at sighting
  * scale, not argued from sf0.1.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.PersistAudit <q>...
  */
object PersistAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    ExtraConf(builder)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val rows = fn(spark, sfDir).count()
      // everything still cached once the action returned = what the
      // session harness (Verify/Bench releaseAll) is on the hook for
      val retained = spark.sparkContext.getRDDStorageInfo.filter(_.isCached)
      val detail = retained.map { r =>
        // RDD names for cached plans are multi-line plan dumps: keep
        // the first line so the artifact stays one JSON object per query
        val nm = r.name.takeWhile(_ != '\n').replace("\\", "\\\\")
          .replace("\"", "'")
        s"""{"rdd":"$nm","parts":${r.numCachedPartitions},""" +
          s""""mem_mb":${r.memSize >> 20},"disk_mb":${r.diskSize >> 20}}"""
      }.mkString("[", ",", "]")
      println(s"""{"persist_audit":"$name","sf":"$sfDir","rows":$rows,""" +
        s""""retained_rdds":${retained.length},""" +
        s""""retained_mem_mb":${retained.map(_.memSize).sum >> 20},""" +
        s""""retained_disk_mb":${retained.map(_.diskSize).sum >> 20},""" +
        s""""detail":$detail}""")
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    spark.stop()
  }
}
