package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes an N×-scale sighting corpus from an existing testdata
  * directory by unioning N key-shifted copies of every table — the
  * sf1 dataset the round driver does not generate, used ONLY for
  * scale sighting runs (never for correctness: oracles stay on the
  * driver-generated sf dirs).
  *
  * Shift discipline: every key space gets copy·SHIFT added (validated
  * at startup to exceed every source key, and deliberately NOT a
  * multiple of the q194 lattice moduli 80/170/10000, so shifted
  * customers map to fresh station points instead of 10 coincident
  * twins — the lattice EXTENT itself grows with the corpus via
  * [[graft.ops.Spatial.latticeScale]], keeping sighting density
  * ~constant); customer/supplier names are regenerated from the
  * shifted keys so name-derived blocking keys (q63) see N distinct
  * replicas, not N collapsed copies; foreign keys shift
  * together, so each copy is a self-consistent disconnected replica —
  * graph components, join fan-outs and group sizes scale by N while
  * per-key densities stay fixed. Fixed dimensions (nation, region)
  * and the event time RANGE stay as-is (more rows in the same window,
  * the real shape of a busier feed). Copy 0 is byte-identical to the
  * source, so literal-filter query sets (vec_id probes, seed nations)
  * keep their members. Document texts get a copy-specific suffix on
  * EVERY token (`tok` → `tok_c<c>`): a partial mutation (first
  * attempt: vowel tagging) leaves the untouched token mass shared
  * across copies, which keeps copies mid-correlated — measured in the
  * r7 sighting as near-quadratic candidate growth in the corr-LSH and
  * shared-shingle dedup families (q35 97×, q18 17× at 10× docs);
  * full-token suffixing makes copies genuinely unrelated documents,
  * so those pipelines see a true 10× corpus. Embeddings get a
  * copy-specific circular component rotation for the same reason —
  * unrotated, every vector has N−1 exact twins at distance 0 and the
  * blocked neardup self-joins measure duplication (q25 went 40×),
  * not scale.
  *
  * Usage: runMain graft.MakeScale <srcDir> <dstDir> <copies>
  */
object MakeScale {
  val Shift = 1000003L

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = args(2).toInt
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scaled(name: String, keyCols: Seq[String],
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
      val base = Tables.load(spark, src, name)
      // Shift must clear every real key in the SOURCE, or copies collide
      // into duplicate primary keys and cross-copy join edges that break
      // the disconnected-replica invariant — e.g. running MakeScale on a
      // generated sf1 (max o_orderkey ~9.15M > Shift). Fail loudly.
      val maxKey = base
        .select(keyCols.map(k => max(col(k)).cast("long").as(k)): _*)
        .head().toSeq.map(_.asInstanceOf[Long]).max
      require(Shift > maxKey,
        s"[makescale] $name: Shift=$Shift <= max source key $maxKey — " +
          "copies would collide; raise Shift (or derive it from the max)")
      (0 until copies).map { c =>
        val shifted = keyCols.foldLeft(base)((d, k) =>
          d.withColumn(k, col(k) + lit(c * Shift)))
        if (c == 0) base else mutate(shifted, c)
      }.reduce(_ unionByName _)
    }

    def docMutate(d: DataFrame, c: Int): DataFrame = d
      .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_c$c"))
      .withColumn("n_chars", length(col("text")))

    // entity names are regenerated from the SHIFTED key (same
    // 'Tag#<9-digit-zero-padded>' format): a replica with new keys but
    // the source's names is a lying corpus for every name-derived
    // operator — q63's name-block key would collapse all N copies of a
    // block into one, turning the sighting's linear blocking quadratic
    def nameMutate(tag: String, keyCol: String, nameCol: String)(
        d: DataFrame, c: Int): DataFrame =
      d.withColumn(nameCol,
        concat(lit(tag + "#"), lpad(col(keyCol).cast("string"), 9, "0")))

    // circular rotation of the embedding components by c positions:
    // norms and within-copy geometry are preserved exactly, cross-copy
    // cosines decorrelate (random-ish components), so ANN corpora scale
    // without every vector having N−1 zero-distance twins
    def embMutate(d: DataFrame, c: Int): DataFrame = d
      .withColumn("embedding", expr(
        s"transform(embedding, (x, i) -> element_at(embedding, " +
          s"(CAST(i AS INT) + $c) % size(embedding) + 1))"))

    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> Tables.load(spark, src, "region"),
      "nation" -> Tables.load(spark, src, "nation"),
      "customer" -> scaled("customer", Seq("c_custkey"),
        nameMutate("Customer", "c_custkey", "c_name")),
      "supplier" -> scaled("supplier", Seq("s_suppkey"),
        nameMutate("Supplier", "s_suppkey", "s_name")),
      "part" -> scaled("part", Seq("p_partkey")),
      "orders" -> scaled("orders", Seq("o_orderkey", "o_custkey")),
      "lineitem" -> scaled("lineitem",
        Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "events" -> scaled("events", Seq("event_id", "user_id")),
      "documents" -> scaled("documents", Seq("doc_id"), docMutate),
      "embeddings" -> scaled("embeddings", Seq("vec_id"), embMutate))

    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[makescale] $name written")
    }
    spark.stop()
  }
}
