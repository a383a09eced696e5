package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Builds the ADVERSARIAL-SKEW documents corpus the q35 hot-bucket
  * split exists for but has never met on real data (EnumVol: natural
  * max bucket plateaus ~1415 < cap 2048 from 30× to 100×): takes a
  * scaled sighting dir whose row count already clears the split's
  * n > 2^18 engagement gate (60×+: the 10× corpus is only 50 k docs)
  * and plants one duplicate group of `dupCount` EXACT copies of an
  * existing document under fresh doc_ids. Exact copies are the
  * limiting case of near-identical: identical token histograms land
  * in the SAME (band, bucket) in EVERY band, so each band carries one
  * bucket of occupancy ≥ dupCount > cap — the unbounded
  * genuinely-similar hot bucket the split's triangle decomposition
  * targets. Every planted pair has correlation exactly 1, so the
  * quantized prune keeps all of them (distance 0): the planted mass
  * stresses the full path — enumeration, cross-band distinct, verify —
  * not just the kernel loop.
  *
  * Sizing: the planted enumeration volume is bands·C(dupCount, 2)
  * pre-distinct (151 bands at 60×), so dupCount is kept a small
  * multiple of the cap — 3072 ⇒ g = ⌈3072/2048⌉ = 2 salt groups,
  * 3 triangle cells per band-bucket, ~712 M planted enumerations
  * (comparable to the 60× corpus's own 642 M). Buckets the base doc
  * naturally shares push occupancy (and g) higher in some bands.
  *
  * Only `documents.parquet` is written: q35 and EnumVol read nothing
  * else, and duplicating the other 60× tables would waste a GB per
  * skew variant.
  *
  * Usage: runMain graft.tools.MakeSkew <srcDir> <dstDir> [dupCount]
  */
object MakeSkew {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val dupCount = if (args.length > 2) args(2).toInt else 3072
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, src, "documents")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    // deterministic template: the smallest doc_id (copy 0 of the
    // MakeScale corpus, so the planted bucket also contains the base
    // doc's natural near-neighbors)
    val template = docs.orderBy(col("doc_id")).limit(1).head()
    val tText = template.getString(template.fieldIndex("text"))
    val tLang = template.getString(template.fieldIndex("lang"))
    val tSrc = template.getString(template.fieldIndex("source"))
    val tChars = template.getLong(template.fieldIndex("n_chars"))
    val planted = spark.range(1, dupCount + 1L)
      .select((col("id") + maxId).as("doc_id"), lit(tText).as("text"),
        lit(tLang).as("lang"), lit(tSrc).as("source"),
        lit(tChars).as("n_chars"))
    docs.unionByName(planted)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val n = Tables.load(spark, dst, "documents").count()
    println(s"[makeskew] src=$src dst=$dst planted=$dupCount " +
      s"template_doc=${template.getLong(template.fieldIndex("doc_id"))} " +
      s"total_docs=$n")
    spark.stop()
  }
}
