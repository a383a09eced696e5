package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{AsOfJoin, ChangeFeed, CorrDedup, Curation, DedupOps, Dims, Extended, Ingest, MultimodalOps, Noaa, Relational, Sessions, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * `queries` maps operator names (SURVEY.md §2 inventory) to builders;
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL for the hash compare.
  * Column names/aliases MUST match between the two.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The `fact_weather` pivot shape — the densest operator coverage per
    * line in the reference (Geo_silver_layer_common.py:8-41). */
  def entry(spark: SparkSession): DataFrame =
    Relational.qWeatherPivot(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "q2_weather_pivot" -> (Relational.qWeatherPivot _),
    "q3_dim_supplier" -> (Dims.q3DimSupplier _),
    "q4_dim_customer" -> (Dims.q4DimCustomer _),
    "q5_fact_orders" -> (Dims.q5FactOrders _),
    "q6_fixed_width" -> (Ingest.q6FixedWidth _),
    "q7_unit_convert" -> (Ingest.q7UnitConvert _),
    "q8_window_topk" -> (Extended.q8WindowTopK _),
    "q9_setops" -> (Extended.q9SetOps _),
    "q10_semi_anti" -> (Extended.q10SemiAnti _),
    "q11_rollup" -> (Extended.q11Rollup _),
    "q12_interval_join" -> (Extended.q12IntervalJoin _),
    "q13_token_stats" -> (TextOps.q13TokenStats _),
    "q14_quality" -> (TextOps.q14Quality _),
    "q15_lang_id" -> (TextOps.q15LangId _),
    "q16_fingerprint" -> (TextOps.q16Fingerprint _),
    "q17_dedup_exact" -> (DedupOps.q17DedupExact _),
    "q18_ngram_jaccard" -> (DedupOps.q18NgramJaccard _),
    "q19_minhash_lsh" -> (DedupOps.q19MinhashLsh _),
    "q20_simhash" -> (DedupOps.q20Simhash _),
    "q21_knn_cosine" -> (SimilarityOps.q21KnnCosine _),
    "q22_ann_lsh" -> (SimilarityOps.q22AnnLshBuckets _),
    "q23_multimodal_decode" -> (MultimodalOps.q23MultimodalDecode _),
    "q24_json_extract" -> (Ingest.q24JsonExtract _),
    "q25_embed_neardup" -> (DedupOps.q25EmbedNearDup _),
    "q26_frame_sample" -> (MultimodalOps.q26FrameSample _),
    "q27_ivf_assign" -> (SimilarityOps.q27IvfAssign _),
    "q28_global_topk" -> (Extended.q28GlobalTopK _),
    "q29_asof_join" -> (AsOfJoin.q29AsOfJoin _),
    "q30_hll_distinct" -> (Extended.q30HllDistinct _),
    "q31_sessionize" -> (Sessions.q31SessionizeBatch _),
    "q32_vocabulary" -> (Sessions.q32Vocabulary _),
    "q33_dedup_clusters" -> (DedupOps.q33DedupClusters _),
    "q34_scalar_subquery" -> (Extended.q34ScalarSubquery _),
    "q35_lsh_neardup" -> (CorrDedup.q35LshNearDup _),
    "q36_ivf_search" -> (SimilarityOps.q36IvfSearch _),
    "q37_kmeans_ivf" -> (SimilarityOps.q37KmeansIvf _),
    "q38_dim_geo" -> (Dims.q38DimGeo _),
    "q39_dim_store" -> (Dims.q39DimStore _),
    "q40_cdf_scd1" -> (ChangeFeed.q40CdfScd1 _),
    "q41_noaa_stations" -> (Noaa.q41NoaaStations _),
    "q42_noaa_inventory" -> (Noaa.q42NoaaInventory _),
    "q43_noaa_timeseries" -> (Noaa.q43NoaaTimeseries _),
    "q44_noaa_us_metrics" -> (Noaa.q44NoaaUsMetrics _),
    "q45_stratified_sample" -> (Curation.q45StratifiedSample _),
    "q46_contamination" -> (Curation.q46Contamination _),
    "q47_repetition" -> (Curation.q47Repetition _),
    "q48_length_profile" -> (Curation.q48LengthProfile _),
    "q49_hll_registers" -> (Curation.q49HllRegisters _),
    "q50_pii_scrub" -> (Curation.q50PiiScrub _),
    "q51_media_features" -> (MultimodalOps.q51MediaFeatures _),
    "q52_media_resize" -> (MultimodalOps.q52MediaResize _),
    "q53_grouping_sets" -> (Extended.q53GroupingSets _),
    "q54_moving_window" -> (Extended.q54MovingWindow _),
    "q55_unpivot" -> (Extended.q55Unpivot _),
    "q56_ivf_search_trained" -> (SimilarityOps.q56IvfSearchTrained _),
    "q57_incremental_neardup" -> (DedupOps.q57IncrementalNearDup _),
    "q58_keywords" -> (TextOps.q58Keywords _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Relational.q1Oracle,
    "q2_weather_pivot" -> Relational.qWeatherPivotOracle,
    "q3_dim_supplier" -> Dims.q3Oracle,
    "q4_dim_customer" -> Dims.q4Oracle,
    "q5_fact_orders" -> Dims.q5Oracle,
    "q6_fixed_width" -> Ingest.q6Oracle,
    "q7_unit_convert" -> Ingest.q7Oracle,
    "q8_window_topk" -> Extended.q8Oracle,
    "q9_setops" -> Extended.q9Oracle,
    "q10_semi_anti" -> Extended.q10Oracle,
    "q11_rollup" -> Extended.q11Oracle,
    "q12_interval_join" -> Extended.q12Oracle,
    "q13_token_stats" -> TextOps.q13Oracle,
    "q14_quality" -> TextOps.q14Oracle,
    "q15_lang_id" -> TextOps.q15Oracle,
    "q16_fingerprint" -> TextOps.q16Oracle,
    "q17_dedup_exact" -> DedupOps.q17Oracle,
    "q18_ngram_jaccard" -> DedupOps.jaccardOracle,
    "q19_minhash_lsh" -> DedupOps.jaccardOracle,
    "q21_knn_cosine" -> SimilarityOps.q21Oracle,
    "q23_multimodal_decode" -> MultimodalOps.q23Oracle,
    "q24_json_extract" -> Ingest.q24Oracle,
    "q25_embed_neardup" -> DedupOps.q25Oracle,
    "q26_frame_sample" -> MultimodalOps.q26Oracle,
    "q20_simhash" -> DedupOps.q20Oracle,
    "q22_ann_lsh" -> SimilarityOps.q22Oracle,
    // q30_hll_distinct stays rows-only: the xxhash64-based HLL sketch is
    // not SQL-expressible in DuckDB; accuracy/merge semantics in HllSpec.
    "q27_ivf_assign" -> SimilarityOps.q27Oracle,
    "q28_global_topk" -> Extended.q28Oracle,
    "q29_asof_join" -> AsOfJoin.q29Oracle,
    "q31_sessionize" -> Sessions.q31Oracle,
    "q32_vocabulary" -> Sessions.q32Oracle,
    "q33_dedup_clusters" -> DedupOps.q33Oracle,
    "q34_scalar_subquery" -> Extended.q34Sql,
    "q35_lsh_neardup" -> CorrDedup.q35Oracle,
    "q36_ivf_search" -> SimilarityOps.q36Oracle,
    "q37_kmeans_ivf" -> SimilarityOps.q37Oracle,
    "q38_dim_geo" -> Dims.q38Oracle,
    "q39_dim_store" -> Dims.q39Oracle,
    "q40_cdf_scd1" -> ChangeFeed.q40Oracle,
    "q41_noaa_stations" -> Noaa.q41Oracle,
    "q42_noaa_inventory" -> Noaa.q42Oracle,
    "q43_noaa_timeseries" -> Noaa.q43Oracle,
    "q44_noaa_us_metrics" -> Noaa.q44Oracle,
    "q45_stratified_sample" -> Curation.q45Oracle,
    "q46_contamination" -> Curation.q46Oracle,
    "q47_repetition" -> Curation.q47Oracle,
    "q48_length_profile" -> Curation.q48Oracle,
    "q49_hll_registers" -> Curation.q49Oracle,
    "q50_pii_scrub" -> Curation.q50Oracle,
    "q51_media_features" -> MultimodalOps.q51Oracle,
    "q52_media_resize" -> MultimodalOps.q52Oracle,
    "q53_grouping_sets" -> Extended.q53Oracle,
    "q54_moving_window" -> Extended.q54Oracle,
    "q55_unpivot" -> Extended.q55Oracle,
    "q56_ivf_search_trained" -> SimilarityOps.q56Oracle,
    "q57_incremental_neardup" -> DedupOps.q57Oracle,
    "q58_keywords" -> TextOps.q58Oracle,
  )
}
