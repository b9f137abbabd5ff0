package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2's
  * inventory; [[oracleSql]] carries its DuckDB-runnable ANSI twin
  * (omitted only for non-SQL-expressible / implementation-defined ops,
  * which get unit tests and a rows-only check instead).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tier-P parity pipelines
    "p01_ingest_rename" -> (Pipelines.p01IngestRename _),
    "p02_transfer_cast" -> (Pipelines.p02TransferCast _),
    // training-data pipeline primitives
    "p03_hash_sample" -> (PipelineOps.p03HashSample _),
    "p04_stratified_sample" -> (PipelineOps.p04StratifiedSample _),
    "p05_train_split" -> (PipelineOps.p05TrainSplit _),
    "p06_sequence_packing" -> ((s, d) => PipelineOps.p06SequencePacking(s, d)),
    "p07_corpus_build" -> (PipelineOps.p07CorpusBuild _),
    // aggregations
    "q01_agg_pricing_summary" -> (Relational.q01PricingSummary _),
    "q12_distinct_agg" -> (Aggs.q12DistinctAgg _),
    "q13_distinct" -> (Aggs.q13Distinct _),
    "q14_approx_distinct" -> (Aggs.q14ApproxDistinct _),
    "q15_rollup" -> (Aggs.q15Rollup _),
    "q16_cube" -> (Aggs.q16Cube _),
    "q17_grouping_sets" -> (Aggs.q17GroupingSets _),
    "q18_pivot" -> (Aggs.q18Pivot _),
    "q19_subquery_avg" -> (Aggs.q19SubqueryAvg _),
    "q20_topk" -> (Aggs.q20TopK _),
    "q37_stats_moments" -> (Stats.q37StatsMoments _),
    "q38_percentiles" -> (Stats.q38Percentiles _),
    "q50_outliers" -> (Stats.q50Outliers _),
    "q39_salted_agg" -> (Scale.q39SaltedAgg _),
    "q40_salted_join" -> (Scale.q40SaltedJoin _),
    // joins
    "q04_join_broadcast" -> (Joins.q04JoinBroadcast _),
    "q05_star_join" -> (Joins.q05StarJoin _),
    "q06_semi_join" -> (Joins.q06SemiJoin _),
    "q07_anti_join" -> (Joins.q07AntiJoin _),
    "q08_outer_join" -> (Joins.q08OuterJoin _),
    "q09_theta_join" -> (Joins.q09ThetaJoin _),
    "q10_range_join" -> (Joins.q10RangeJoin _),
    "q11_asof_join" -> (Joins.q11AsofJoin _),
    // windows
    "q21_window_rank" -> (Windows.q21WindowRank _),
    "q22_window_running" -> (Windows.q22WindowRunning _),
    "q23_window_lag_lead" -> (Windows.q23WindowLagLead _),
    "q24_window_range_frame" -> (Windows.q24WindowRangeFrame _),
    "q25_window_ntile" -> (Windows.q25WindowNtile _),
    // set ops
    "q26_union" -> (SetOps.q26Union _),
    "q27_union_all" -> (SetOps.q27UnionAll _),
    "q28_intersect" -> (SetOps.q28Intersect _),
    "q29_except" -> (SetOps.q29Except _),
    // scalar functions
    "q30_string_funcs" -> (Functions.q30StringFuncs _),
    "q31_date_funcs" -> (Functions.q31DateFuncs _),
    "q32_math_funcs" -> (Functions.q32MathFuncs _),
    "q33_case_when" -> (Functions.q33CaseWhen _),
    "q34_array_funcs" -> (Functions.q34ArrayFuncs _),
    "q35_map_funcs" -> (Functions.q35MapFuncs _),
    "q36_json_funcs" -> (Functions.q36JsonFuncs _),
    "q41_generators" -> (Functions.q41Generators _),
    "q42_null_handling" -> (Functions.q42NullHandling _),
    "q43_fk_integrity" -> (Quality.q43FkIntegrity _),
    "q44_uniqueness" -> (Quality.q44Uniqueness _),
    "q45_upsert_latest" -> (Quality.q45UpsertLatest _),
    "q46_array_funcs2" -> (Functions.q46ArrayFuncs2 _),
    "q47_sql_subqueries" -> (Aggs.q47SqlSubqueries _),
    "q48_collect_sorted" -> (Aggs.q48CollectSorted _),
    "q49_string_agg" -> (Aggs.q49StringAgg _),
    "q51_lateral_topn" -> (Aggs.q51LateralTopN _),
    // event-time analytics
    "e01_tumbling_window" -> (EventOps.e01Tumbling _),
    "e02_sliding_window" -> (EventOps.e02Sliding _),
    "e03_sessionization" -> (EventOps.e03Sessions _),
    "e04_funnel" -> (EventOps.e04Funnel _),
    "e05_retention" -> (EventOps.e05Retention _),
    "e06_session_window" -> (EventOps.e06SessionWindow _),
    "e07_event_paths" -> (EventOps.e07EventPaths _),
    "m03_frame_sample" -> (Multimodal.m03FrameSample _),
    // text analysis
    "t01_token_stats" -> (TextOps.t01TokenStats _),
    "t02_quality_score" -> (TextOps.t02QualityScore _),
    "t03_lang_id" -> (TextOps.t03LangId _),
    "t04_fingerprint" -> (TextOps.t04Fingerprint _),
    "t07_redaction" -> (TextOps.t07Redaction _),
    "t08_bigrams" -> (TextOps.t08Bigrams _),
    "t09_tfidf" -> (TextOps.t09Tfidf _),
    // dedup
    "d01_exact_dedup" -> (Dedup.d01ExactDedup _),
    "d02_minhash_lsh" -> (Dedup.d02MinhashLsh _),
    "d03_simhash" -> (Dedup.d03Simhash _),
    "d04_ngram_jaccard" -> ((s, d) => Dedup.d04NgramJaccard(s, d)),
    "d05_embedding_near_dup" -> ((s, d) => Dedup.d05EmbeddingNearDup(s, d)),
    "d06_dedup_clusters" -> (Dedup.d06DedupClusters _),
    "d07_incremental_dedup" -> (Dedup.d07IncrementalDedup _),
    "d08_boilerplate" -> (Dedup.d08Boilerplate _),
    // similarity search
    "s01_knn_brute" -> (Similarity.s01KnnBrute _),
    "s02_knn_lsh" -> (Similarity.s02KnnLsh _),
    "s03_knn_ivf" -> ((s, d) => Similarity.s03KnnIvf(s, d)),
    "t05_subword_tokens" -> (TextOps.t05SubwordTokens _),
    "t06_edit_distance" -> (TextOps.t06EditDistance _),
    // multimodal
    "m01_media_features" -> (Multimodal.m01MediaFeatures _),
    "m02_media_decode" -> (Multimodal.m02DecodeStub _),
    "m04_payload_chunks" -> ((s, d) => Multimodal.m04PayloadChunks(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "p01_ingest_rename" -> Pipelines.p01Sql,
    "p02_transfer_cast" -> Pipelines.p02Sql,
    "p03_hash_sample" -> PipelineOps.p03Sql,
    "p04_stratified_sample" -> PipelineOps.p04Sql,
    "p05_train_split" -> PipelineOps.p05Sql,
    "p06_sequence_packing" -> PipelineOps.p06Sql,
    "p07_corpus_build" -> PipelineOps.p07Sql,
    "q01_agg_pricing_summary" -> Relational.q01Sql,
    "q12_distinct_agg" -> Aggs.q12Sql,
    "q13_distinct" -> Aggs.q13Sql,
    // q14_approx_distinct: HLL estimates are implementation-specific — no oracle
    "q15_rollup" -> Aggs.q15Sql,
    "q16_cube" -> Aggs.q16Sql,
    "q17_grouping_sets" -> Aggs.q17Sql,
    "q18_pivot" -> Aggs.q18Sql,
    "q19_subquery_avg" -> Aggs.q19Sql,
    "q20_topk" -> Aggs.q20Sql,
    "q37_stats_moments" -> Stats.q37Sql,
    "q38_percentiles" -> Stats.q38Sql,
    "q50_outliers" -> Stats.q50Sql,
    "q39_salted_agg" -> Scale.q39Sql,
    "q40_salted_join" -> Scale.q40Sql,
    "q04_join_broadcast" -> Joins.q04Sql,
    "q05_star_join" -> Joins.q05Sql,
    "q06_semi_join" -> Joins.q06Sql,
    "q07_anti_join" -> Joins.q07Sql,
    "q08_outer_join" -> Joins.q08Sql,
    "q09_theta_join" -> Joins.q09Sql,
    "q10_range_join" -> Joins.q10Sql,
    "q11_asof_join" -> Joins.q11Sql,
    "q21_window_rank" -> Windows.q21Sql,
    "q22_window_running" -> Windows.q22Sql,
    "q23_window_lag_lead" -> Windows.q23Sql,
    "q24_window_range_frame" -> Windows.q24Sql,
    "q25_window_ntile" -> Windows.q25Sql,
    "q26_union" -> SetOps.q26Sql,
    "q27_union_all" -> SetOps.q27Sql,
    "q28_intersect" -> SetOps.q28Sql,
    "q29_except" -> SetOps.q29Sql,
    "q30_string_funcs" -> Functions.q30Sql,
    "q31_date_funcs" -> Functions.q31Sql,
    "q32_math_funcs" -> Functions.q32Sql,
    "q33_case_when" -> Functions.q33Sql,
    "q34_array_funcs" -> Functions.q34Sql,
    "q35_map_funcs" -> Functions.q35Sql,
    "q36_json_funcs" -> Functions.q36Sql,
    "q41_generators" -> Functions.q41Sql,
    "q42_null_handling" -> Functions.q42Sql,
    "q43_fk_integrity" -> Quality.q43Sql,
    "q44_uniqueness" -> Quality.q44Sql,
    "q45_upsert_latest" -> Quality.q45Sql,
    "q46_array_funcs2" -> Functions.q46Sql,
    "q47_sql_subqueries" -> Aggs.q47Sql,
    "q48_collect_sorted" -> Aggs.q48Sql,
    "q49_string_agg" -> Aggs.q49Sql,
    "q51_lateral_topn" -> Aggs.q51Sql,
    "e01_tumbling_window" -> EventOps.e01Sql,
    "e02_sliding_window" -> EventOps.e02Sql,
    "e03_sessionization" -> EventOps.e03Sql,
    "e04_funnel" -> EventOps.e04Sql,
    "e05_retention" -> EventOps.e05Sql,
    "e06_session_window" -> EventOps.e06Sql,
    "e07_event_paths" -> EventOps.e07Sql,
    "m03_frame_sample" -> Multimodal.m03Sql,
    "t01_token_stats" -> TextOps.t01Sql,
    "t02_quality_score" -> TextOps.t02Sql,
    "t03_lang_id" -> TextOps.t03Sql,
    "t04_fingerprint" -> TextOps.t04Sql,
    "t07_redaction" -> TextOps.t07Sql,
    "t08_bigrams" -> TextOps.t08Sql,
    "t09_tfidf" -> TextOps.t09Sql,
    "d01_exact_dedup" -> Dedup.d01Sql,
    "d02_minhash_lsh" -> Dedup.d02Sql,
    "d03_simhash" -> Dedup.d03Sql,
    "d04_ngram_jaccard" -> Dedup.d04Sql,
    "d05_embedding_near_dup" -> Dedup.d05Sql,
    "d06_dedup_clusters" -> Dedup.d06Sql,
    "d07_incremental_dedup" -> Dedup.d07Sql,
    "d08_boilerplate" -> Dedup.d08Sql,
    "s01_knn_brute" -> Similarity.s01Sql,
    "s02_knn_lsh" -> Similarity.s02Sql,
    "s03_knn_ivf" -> Similarity.s03Sql,
    "t05_subword_tokens" -> TextOps.t05Sql,
    "t06_edit_distance" -> TextOps.t06Sql,
    "m01_media_features" -> Multimodal.m01Sql,
    "m04_payload_chunks" -> Multimodal.m04Sql
    // m02_media_decode: imperative mapPartitions decode stub — no SQL
    // oracle (rows-only check + MultimodalSpec)
  )
}
