package graft.tools

import graft.Tables

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.ops.CorrDedup
import graft.functions.{CorrUtil, LshBandKeys, TokenBucketCounts}

/** Scratch diagnostic: q35 LSH bucket enumeration volume
  * (sum over band buckets of c*(c-1)/2) for a corpus dir, at the
  * derived band shape or an overridden bits-per-band.
  * Usage: runMain graft.tools.EnumVol <dir> [bitsOverride] */
object EnumVol {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val bitsOv = if (args.length > 1) args(1).toInt else 0
    val docs = Tables.load(spark, dir, "documents")
    val vecs = docs.select(F.col("doc_id"),
      TokenBucketCounts(F.col("text"), CorrDedup.Dim).as("cnt")).persist()
    val n = vecs.count()
    val s = new Array[Long](CorrDedup.Dim)
    vecs.select(F.posexplode(F.col("cnt")).as(Seq("i", "c")))
      .groupBy(F.col("i")).agg(F.sum(F.col("c")).as("s"))
      .collect().foreach(r => s(r.getInt(0)) = r.getLong(1))
    val bits = if (bitsOv > 0) bitsOv else CorrDedup.bitsPerBand(n)
    val bands = CorrDedup.bandsFor(bits)
    val planes = CorrUtil.planes(CorrDedup.Seed, bands * bits, CorrDedup.Dim)
    val hmu = planes.map { p =>
      var acc = 0.0; var j = 0
      while (j < CorrDedup.Dim) { acc += p(j) * s(j); j += 1 }
      acc / n.toDouble
    }
    val ent = vecs.select(
      F.explode(LshBandKeys(F.col("cnt"), hmu, CorrDedup.Seed, bands, bits))
        .as("key"))
    // empty corpus: sum/max aggregate to NULL — coalesce so the
    // artifact line stays machine-parsable instead of printing nulls
    val r = ent.groupBy("key").count()
      .agg(F.coalesce(F.sum(F.expr("count*(count-1) div 2")), F.lit(0L))
          .as("enum"),
        F.coalesce(F.max("count"), F.lit(0L)).as("maxc"),
        F.count(F.lit(1)).as("nbuckets")).head()
    println(s"[enumvol] dir=$dir n=$n bits=$bits bands=$bands " +
      s"enum=${r.get(0)} maxbucket=${r.get(1)} buckets=${r.get(2)}")
    // standing per-round artifact line (append to docs/sighting/
    // enumvol_r{N}.jsonl): machine-readable twin of the line above,
    // plus the q35 split shape so bucket-occupancy regressions are
    // visible without forensics. dir is the one interpolated string —
    // escape it so an odd path can't emit invalid JSON into the
    // cross-round artifact.
    val cap = CorrDedup.bucketCap(spark)
    val maxc = r.getLong(1)
    val dirJ = dir.replace("\\", "\\\\").replace("\"", "\\\"")
    println(s"""{"dir":"$dirJ","n":$n,"bits":$bits,"bands":$bands,""" +
      s""""enum":${r.get(0)},"maxbucket":$maxc,"buckets":${r.get(2)},""" +
      s""""cap":$cap,"split_engaged":${CorrDedup.splitEngages(n, maxc, cap)},""" +
      s""""maxcell":${math.min(maxc, cap)}}""")
    spark.stop()
  }
}
