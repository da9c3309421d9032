package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.ops.Relational
import graft.similarity.Similarity
import graft.streaming.EventStreams
import graft.text.TextAnalysis

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers here twice: a Spark query in
  * [[queries]] and (where SQL-expressible) a DuckDB oracle in [[oracleSql]].
  * Column names are aliased identically on both sides (driver compare
  * sorts columns by name before hashing). Cross-engine numeric determinism
  * rules live in [[graft.ops.Relational]]'s scaladoc.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- reference parity shapes (SURVEY §2.1-2.5)
    "q_scan_project"    -> (Relational.scanProject _),
    "q_filter_date_eq"  -> (Relational.filterDateEq _),
    "q_union_snapshots" -> (Relational.unionSnapshots _),
    "q_cast_types"      -> (Relational.castTypes _),
    "q_null_handling"   -> (Relational.nullHandling _),
    "q_distinct"        -> (Relational.distinctSegments _),
    // -- aggregation (SURVEY §2.7)
    "q1_agg"            -> (Relational.q1PricingSummary _),
    "q_rollup"          -> (Relational.rollupOrders _),
    "q_cube"            -> (Relational.cubeEvents _),
    "q_case_when_agg"   -> (Relational.caseWhenAgg _),
    // -- joins
    "q3_top_revenue"    -> (Relational.q3ShippingPriority _),
    "q5_local_supplier" -> (Relational.q5LocalSupplierVolume _),
    "q12_priority"      -> (Relational.q12PriorityBuckets _),
    "q14_promo"         -> (Relational.q14PromoRevenue _),
    "q_star_join"       -> (Relational.starJoin _),
    "q_semi_join"       -> (Relational.semiJoin _),
    "q_anti_join"       -> (Relational.antiJoin _),
    "q_notin_null"      -> (Relational.notInNullAware _),
    "q_outer_join_agg"  -> (Relational.outerJoinAgg _),
    // -- windows
    "q_window_latest"   -> (Relational.windowLatestOrder _),
    "q_window_running"  -> (Relational.windowRunningSum _),
    "q_topk_per_group"  -> (Relational.windowTopKPerGroup _),
    // -- sort/limit/set ops
    "q_sort_limit"      -> (Relational.sortLimit _),
    "q_set_intersect"   -> (Relational.setIntersect _),
    "q_set_except"      -> (Relational.setExcept _),
    // -- scalar function batteries
    "q_scalar_strings"  -> (Relational.scalarStrings _),
    "q_scalar_dates"    -> (Relational.scalarDates _),
    "q_scalar_math"     -> (Relational.scalarMath _),
    // -- subquery / semi-structured / time rollup
    "q_above_avg"       -> (Relational.aboveAvgOrders _),
    "q_events_json"     -> (Relational.eventsJson _),
    "q_events_hourly"   -> (Relational.eventsHourly _),
    // -- LLM-pipeline: text analysis (north star §7.4)
    "q_text_stats"      -> (TextAnalysis.textStats _),
    "q_lang_id"         -> (TextAnalysis.langId _),
    "q_lang_confusion"  -> (TextAnalysis.langConfusion _),
    "q_lsh_plan"        -> (Dedup.lshPlanningTable _),
    "q_decayed"         -> (graft.ops.TimeSeries.decayedPopularity _),
    "q_forecast_bt"     -> (graft.ops.TimeSeries.forecastBacktest _),
    "q_fingerprint"     -> (TextAnalysis.fingerprint _),
    // -- LLM-pipeline: deduplication
    "q_dedup_exact"     -> (Dedup.exactDedup _),
    "q_dedup_jaccard"   -> (Dedup.ngramJaccard _),
    "q_dedup_minhash"   -> (Dedup.minhashLsh _),
    "q_minhash_calib"   -> (Dedup.minhashCalibration _),
    "q_dedup_simhash"   -> (Dedup.simhashDedup _),
    "q_span_dedup"      -> (Dedup.spanDedup _),
    "q_block_dedup"     -> (Dedup.blockDedup _),
    "q_winnow"          -> (graft.text.Winnowing.winnowFingerprints _),
    "q_seq_pack"        -> (graft.text.Curation.seqPackCensus _),
    "q_pad_waste"       -> (graft.text.Curation.padWaste _),
    "q_bm25"            -> (graft.text.Retrieval.bm25 _),
    "q_temperature"     -> (graft.text.Curation.temperatureMixture _),
    "q_mmr"             -> (Similarity.mmrSelect _),
    "q_rrf"             -> (graft.text.Retrieval.rrfFusion _),
    "q_ndcg"            -> (graft.text.Retrieval.ndcgAtK _),
    "q_boilerplate"     -> (Dedup.boilerplateRatio _),
    "q_script_profile"  -> (graft.text.TextAnalysis.scriptProfile _),
    "q_neighborhood"    -> (graft.ops.Graph.neighborhoodFunction _),
    "q_gnn_sample"      -> (graft.ops.Graph.neighborSample _),
    "q_degree_dist"     -> (graft.ops.Graph.degreeDistribution _),
    "q_fd_histogram"    -> (graft.ops.Analytics.fdHistogram _),
    "q_topk_merge"      -> (graft.ops.Analytics.topkMergeCheck _),
    "q_mann_kendall"    -> (graft.ops.TimeSeries.mannKendall _),
    "q_zipf"            -> (graft.text.TextAnalysis.zipfFit _),
    "q_heaps"           -> (graft.text.TextAnalysis.heapsLaw _),
    "q_jsd"             -> (graft.text.TextAnalysis.jsdSources _),
    "q_growth_acct"     -> (graft.ops.Behavior.growthAccounting _),
    "q_gini"            -> (graft.ops.Analytics.giniBySegment _),
    "q_hhi"             -> (graft.ops.Analytics.hhiByNation _),
    "q_ohlc"            -> (graft.ops.TimeSeries.ohlcDaily _),
    "q_stratified"      -> (graft.ops.Analytics.neymanAllocation _),
    "q_isotonic"        -> (graft.ops.Analytics.isotonicQtyByDiscount _),
    "q_drawdown"        -> (graft.ops.TimeSeries.maxDrawdown _),
    "q_bollinger"       -> (graft.ops.TimeSeries.bollingerBreakouts _),
    "q_rsi"             -> (graft.ops.TimeSeries.rsiDaily _),
    "q_anova"           -> (graft.ops.Analytics.anovaValueByType _),
    "q_levene"          -> (graft.ops.Analytics.leveneQtyByFlag _),
    "q_burstiness"      -> (graft.ops.Behavior.burstinessPerUser _),
    "q_ljung_box"       -> (graft.ops.TimeSeries.ljungBox _),
    "q_link_pred"       -> (graft.ops.Graph.linkPrediction _),
    "q_eigencentrality" -> (graft.ops.Graph.eigenCentrality _),
    "q_hits"            -> (graft.ops.Graph.hitsBipartite _),
    "q_price_index"     -> (graft.ops.Analytics.priceIndices _),
    "q_scale_diag"      -> (graft.ops.Analytics.scaleDiagnostics _),
    "q_semdedup"        -> (graft.dedup.Dedup.semDedup _),
    "q_ngram_novelty"   -> (graft.text.TextAnalysis.ngramNovelty _),
    "q_perm_entropy"    -> (graft.ops.TimeSeries.permutationEntropy _),
    "q_abc"             -> (graft.ops.Analytics.abcAnalysis _),
    "q_new_vs_repeat"   -> (graft.ops.Analytics.newVsRepeat _),
    "q_nelson_aalen"    -> (graft.ops.Behavior.nelsonAalen _),
    "q_cohort_ltv"      -> (graft.ops.Behavior.cohortLtv _),
    "q_tukey_hsd"       -> (graft.ops.Analytics.tukeyHsdPairs _),
    "q_hurst"           -> (graft.ops.TimeSeries.hurstExponent _),
    "q_adf"             -> (graft.ops.TimeSeries.dickeyFuller _),
    "q_var_ratio"       -> (graft.ops.TimeSeries.varianceRatio _),
    "q_ktruss"          -> (graft.ops.Graph.kTruss _),
    "q_span_corruption" -> (graft.text.Curation.spanCorruption _),
    "q_mlm_mask"        -> (graft.text.Curation.mlmMasking _),
    "q_dataset_card"    -> (graft.text.Curation.datasetCard _),
    "q_sax"             -> (graft.ops.TimeSeries.saxSymbols _),
    "q_peaks"           -> (graft.ops.TimeSeries.peakDetection _),
    "q_friedman"        -> (graft.ops.Analytics.friedmanTest _),
    "q_mutual_info"     -> (graft.ops.Analytics.mutualInfoTypeHour _),
    "q_kruskal"         -> (graft.ops.Behavior.kruskalWallis _),
    "q_dunn"            -> (graft.ops.Behavior.dunnPosthoc _),
    "q_mcnemar"         -> (graft.ops.Behavior.mcnemarTest _),
    "q_cochran_q"       -> (graft.ops.Behavior.cochranQ _),
    "q_mood_median"     -> (graft.ops.Behavior.moodMedianTest _),
    "q_jonckheere"      -> (graft.ops.Analytics.jonckheereTerpstra _),
    "q_durbin_watson"   -> (graft.ops.TimeSeries.durbinWatson _),
    "q_readability"     -> (graft.text.TextAnalysis.readability _),
    "q_cem"             -> (graft.ops.Behavior.cemAtt _),
    "q_mase"            -> (graft.ops.TimeSeries.maseForecast _),
    "q_textrank"        -> (graft.text.TextAnalysis.textRank _),
    "q_changepoint"     -> (graft.ops.TimeSeries.changepoint _),
    "q_capture_recapture" -> (graft.ops.Behavior.captureRecapture _),
    "q_rate_test"       -> (graft.ops.Behavior.poissonRateTest _),
    // -- round 9: the last six TPC-H shapes over the derived partsupp /
    //    receipt-commit relations (TpchClose object doc)
    "q2_min_cost"       -> (graft.ops.TpchClose.q2MinCostSupplier _),
    "q9_product_profit" -> (graft.ops.TpchClose.q9ProductProfit _),
    "q11_important_stock" -> (graft.ops.TpchClose.q11ImportantStock _),
    "q16_parts_suppliers" -> (graft.ops.TpchClose.q16PartsSupplierRel _),
    "q20_potential_promo" -> (graft.ops.TpchClose.q20PotentialPromo _),
    "q21_waiting_supp"  -> (graft.ops.TpchClose.q21WaitingSuppliers _),
    // -- round 9: robust/inequality statistics, drift, retrieval LM,
    //    state-space filtering, vocabulary richness
    "q_gini_dist"       -> (graft.ops.Analytics.giniRevenue _),
    "q_trimmed_mean"    -> (graft.ops.Analytics.winsorizedStats _),
    "q_kalman"          -> (graft.ops.TimeSeries.kalmanLevel _),
    "q_query_likelihood" -> (graft.text.Retrieval.queryLikelihood _),
    "q_js_div"          -> (graft.ops.Behavior.jsDivergence _),
    "q_chao1"           -> (TextAnalysis.vocabRichness _),
    "q_fleiss"          -> (TextAnalysis.fleissKappa _),
    "q_rmst"            -> (graft.ops.Behavior.rmst _),
    "q_ego_betweenness" -> (graft.ops.Graph.egoBetweenness _),
    "q_pacf"            -> (graft.ops.TimeSeries.pacfDailyRevenue _),
    "q_bradley_terry"   -> (graft.ops.Analytics.bradleyTerry _),
    "q_cvm"             -> (graft.ops.Behavior.cvmTest _),
    "q_logit"           -> (graft.ops.Analytics.logisticRegression _),
    "q_rich_club"       -> (graft.ops.Graph.richClub _),
    "q_kneser_ney"      -> (TextAnalysis.knBigramScore _),
    "q_dsir"            -> (graft.text.Curation.dsirWeights _),
    "q_theil_u"         -> (graft.ops.TimeSeries.theilU _),
    "q_sampen"          -> (graft.ops.TimeSeries.sampleEntropy _),
    "q_ansari"          -> (graft.ops.Behavior.ansariBradley _),
    "q_pr_auc"          -> (TextAnalysis.prAuc _),
    "q_cronbach"        -> (TextAnalysis.cronbachAlpha _),
    "q_icc"             -> (graft.ops.Behavior.iccDesignEffect _),
    "q_curation_funnel" -> (graft.text.Curation.curationFunnel _),
    "q_odds_ratio"      -> (graft.ops.Behavior.oddsRatioConversion _),
    "q_ca_trend"        -> (graft.ops.Analytics.cochranArmitageTrend _),
    "q_classifier_metrics" -> (TextAnalysis.classifierMetrics _),
    "q_audio_census"    -> (Multimodal.audioCensus _),
    "q_stl_strength"    -> (graft.ops.TimeSeries.seasonalStrength _),
    "q_did"             -> (graft.ops.Behavior.diffInDiff _),
    "q_sequential"      -> (graft.ops.Behavior.sequentialTest _),
    "q_reco_eval"       -> (graft.ops.Graph.recommenderEval _),
    // -- LLM-pipeline: similarity search
    "q_knn_brute"       -> (Similarity.bruteForceTopK _),
    "q_bitext_mine"     -> (Similarity.bitextMining _),
    "q_triplet_mine"    -> (Similarity.tripletMining _),
    "q_lof"             -> (Similarity.lofOutliers _),
    "q_knn_lsh"         -> (Similarity.lshRecallCheck _),
    "q_knn_ivf"         -> (Similarity.ivfRecallCheck _),
    "q_centroids"       -> (Similarity.labelCentroids _),
    "q_cov_matrix"      -> (Similarity.covarianceMatrix _),
    "q_pca_power"       -> (Similarity.pcaPowerCheck _),
    "q_dbscan"          -> (Similarity.dbscanEmbeddingsBlocked _),
    // -- LLM-pipeline: multimodal + sessionization
    "q_media_meta"      -> (Multimodal.mediaMeta _),
    "q_frame_census"    -> (Multimodal.frameCensus _),
    "q_media_decode"    -> (Multimodal.decodeCensus _),
    "q_media_resize"    -> (Multimodal.resizeCensus _),
    "q_media_ahash"     -> (Multimodal.ahashCensus _),
    "q_media_neardup"   -> (Multimodal.ahashNearDup _),
    "q_media_funnel"    -> (Multimodal.mediaCurationFunnel _),
    "q_media_hist"      -> (Multimodal.histogramCensus _),
    "q_frame_checksum"  -> (Multimodal.frameChecksum _),
    "q_silhouette"      -> (Similarity.silhouette _),
    "q_cuped"           -> (graft.ops.Behavior.cupedReadout _),
    "q_power"           -> (graft.ops.Behavior.powerAnalysis _),
    "q_markov"          -> (graft.ops.Behavior.markovStationary _),
    "q_matryoshka"      -> (Similarity.matryoshkaRecall _),
    "q_sessionize"      -> (EventStreams.sessionizeBatch _),
    // -- embedding near-dup + approximate sketches
    "q_dedup_embed"     -> (Dedup.embeddingNearDup _),
    "q_dedup_embed_blocked" -> (Dedup.embeddingNearDupBlocked _),
    "q_sketches"        -> (graft.ops.Sketches.orderSketches _),
    "q_cms"             -> (graft.ops.Sketches.cmsFrequencies _),
    "q_overlap_sketch"  -> (graft.ops.Sketches.audienceOverlap _),
    "q_hll_det"         -> (graft.ops.Sketches.detHll _),
    "q_kmv"             -> (graft.ops.Sketches.kmvDistinct _),
    "q_ams_f2"          -> (graft.ops.Sketches.amsF2 _),
    // -- time-series joins/windows + ranking battery
    "q_asof_join"       -> (graft.ops.TimeSeries.asofLatestClick _),
    "q_range_join"      -> (graft.ops.TimeSeries.eventPairsWithin30Min _),
    "q_window_range"    -> (graft.ops.TimeSeries.trailingWindowStats _),
    "q_window_rank"     -> (Relational.windowRankBattery _),
    // -- deterministic corpus splitting + corpus audits
    "q_train_split"     -> (TextAnalysis.trainSplit _),
    "q_top_bigrams"     -> (TextAnalysis.topBigrams _),
    "q_len_histogram"   -> (TextAnalysis.lengthHistogram _),
    // -- analytics widening: reshaping, grouping sets, percentiles,
    //    moments, ordered string agg, window frames
    "q_pivot"           -> (graft.ops.Analytics.pivotOrderCounts _),
    "q_unpivot"         -> (graft.ops.Analytics.unpivotOrderMeasures _),
    "q_grouping_sets"   -> (graft.ops.Analytics.groupingSetsCustomers _),
    "q_percentiles"     -> (graft.ops.Analytics.percentilesByStatus _),
    "q_moments"         -> (graft.ops.Analytics.momentsByReturnFlag _),
    "q_string_agg"      -> (graft.ops.Analytics.nationsPerRegion _),
    "q_window_frames"   -> (graft.ops.Analytics.windowFrameBattery _),
    // -- deep TPC-H shapes + conditional aggs + UDAF + regexp
    "q10_returned"      -> (Relational.q10ReturnedCustomers _),
    "q17_small_qty"     -> (Relational.q17SmallQtyRevenue _),
    "q_cond_agg"        -> (graft.ops.Analytics.conditionalAggBattery _),
    "q_checksum"        -> (graft.ops.Analytics.checksumAudit _),
    "q_regexp"          -> (graft.ops.Analytics.regexpBattery _),
    // -- array HOFs + remaining set/join variants
    "q_array_hof"       -> (graft.ops.Analytics.arrayHofBattery _),
    "q_union_distinct"  -> (Relational.unionDistinct _),
    "q_nullsafe_join"   -> (Relational.nullSafeJoin _),
    // -- dedup clustering, fuzzy matching, curation/history/privacy
    "q_dedup_clusters"  -> (Dedup.dedupClusters _),
    "q_fuzzy_names"     -> (Dedup.fuzzyNames _),
    "q_tfidf"           -> (TextAnalysis.tfIdfTopTerms _),
    "q_scd2"            -> (graft.ops.TimeSeries.scd2StatusHistory _),
    "q_scd2_pit"        -> (graft.ops.TimeSeries.pitStatusLookup _),
    "q_canonical_docs"  -> (graft.text.Curation.canonicalDocs _),
    "q_source_cap"      -> (graft.text.Curation.sourceCap _),
    "q_greedy_cover"    -> (graft.text.Curation.greedyCoverage _),
    "q_pii_kanon"       -> (graft.ops.Privacy.kAnonymize _),
    "q_skew_agg"        -> (graft.ops.Skew.skewAggByFlag _),
    "q_sample_strat"    -> (Relational.stratifiedSample _),
    "q_profile"         -> (graft.ops.Profile.profileCustomer _),
    "q_join_size"       -> (graft.ops.Profile.joinSizeStats _),
    "q_map_funcs"       -> (graft.ops.Analytics.mapFuncsBattery _),
    "q_session_window"  -> (EventStreams.sessionWindowAgg _),
    // -- round 3: TPC-H subquery shapes, CDC merge, behavioral analytics,
    //    feature standardization, repetition quality filters
    "q4_priority_exists" -> (Relational.q4PriorityExists _),
    "q7_nation_volume"  -> (Relational.q7NationVolume _),
    "q18_big_orders"    -> (Relational.q18BigOrders _),
    "q_merge_upsert"    -> (graft.ops.Merge.cdcMerge _),
    "q_snapshot_diff"   -> (graft.ops.Merge.snapshotDiff _),
    "q_funnel"          -> (graft.ops.Behavior.funnelCounts _),
    "q_cohort"          -> (graft.ops.Behavior.cohortRetention _),
    "q_zscore"          -> (graft.ops.Analytics.zscorePrices _),
    "q_repetition"      -> (TextAnalysis.repetitionStats _),
    "q_share_of_total"  -> (graft.ops.Analytics.revenueShareByNation _),
    "q_vector_norms"    -> (Similarity.vectorNorms _),
    "q_deciles"         -> (graft.ops.Analytics.decileStats _),
    "q_deciles_dist"    -> (graft.ops.Analytics.decileStatsDistributed _),
    "q_window_distinct" -> (graft.ops.Analytics.windowDistinctCount _),
    "q_asof_broadcast"  -> (graft.ops.TimeSeries.asofLatestClickBroadcast _),
    "q_winsorize"       -> (graft.ops.Analytics.winsorizedPrices _),
    "q_udtf_ngrams"     -> (TextAnalysis.ngramGenerate _),
    "q_entropy"         -> (TextAnalysis.tokenEntropy _),
    "q_traffic_matrix"  -> (graft.ops.Behavior.trafficMatrix _),
    "q_sample_weighted" -> (Relational.weightedSample _),
    "q_mad"             -> (graft.ops.Analytics.madByStatus _),
    "q_iqr_outliers"    -> (graft.ops.Analytics.iqrOutliers _),
    // -- round 4: time-series repair, tolerance as-of, path/transition
    //    analytics, basket pairs, weighted median, RFM, data-quality audits
    "q_gapfill"         -> (graft.ops.TimeSeries.gapFillDailyOrders _),
    "q_asof_tolerance"  -> (graft.ops.TimeSeries.asofClickWithTolerance _),
    "q_interpolate"     -> (graft.ops.TimeSeries.interpolateDailyPrice _),
    "q_event_paths"     -> (graft.ops.Behavior.topEventPaths _),
    "q_transitions"     -> (graft.ops.Behavior.transitionMatrix _),
    "q_copurchase"      -> (graft.ops.Behavior.coPurchasePairs _),
    "q_weighted_median" -> (graft.ops.Analytics.weightedMedianPrice _),
    // _dist siblings: the range-partition prefix-sum renderings, proven
    // row-equal by sharing their window forms' oracles (the q_deciles_dist
    // precedent — window parallelism is by KEY, these are parallel by RANGE)
    "q_weighted_median_dist" -> (graft.ops.Analytics.weightedMedianPriceDist _),
    "q_spearman_dist"   -> (graft.ops.Analytics.spearmanPriceQtyDist _),
    "q_pack_shards_dist" -> (graft.text.Curation.packShardsDist _),
    "q_rfm"             -> (graft.ops.Analytics.rfmSegments _),
    "q_rfm_dist"        -> (graft.ops.Analytics.rfmSegmentsDist _),
    "q_dq_audit"        -> (graft.ops.Quality.dqAudit _),
    "q_benford"         -> (graft.ops.Quality.benfordAudit _),
    "q_psi_drift"       -> (graft.ops.Quality.psiDrift _),
    "q_anomaly"         -> (graft.ops.Quality.revenueAnomalies _),
    "q6_forecast"       -> (Relational.q6Forecast _),
    "q8_market_share"   -> (Relational.q8MarketShare _),
    "q13_custdist"      -> (Relational.q13CustomerDistribution _),
    "q15_top_supplier"  -> (Relational.q15TopSupplier _),
    "q19_disjunctive"   -> (Relational.q19Disjunctive _),
    "q22_global_sales"  -> (Relational.q22GlobalSales _),
    "q_intersect_all"   -> (Relational.setIntersectAll _),
    "q_except_all"      -> (Relational.setExceptAll _),
    "q_mode"            -> (graft.ops.Analytics.modeSegmentByNation _),
    "q_wau"             -> (graft.ops.Behavior.rollingActiveUsers _),
    "q_bounce"          -> (graft.ops.Behavior.bounceRate _),
    "q_streaks"         -> (graft.ops.Behavior.activityStreaks _),
    "q_bitmap_activity" -> (graft.ops.Behavior.activityBitmap _),
    "q_wilson"          -> (graft.ops.Behavior.wilsonDailyCtr _),
    "q_range_banded"    -> (graft.ops.TimeSeries.eventPairsWithin30MinBanded _),
    "q_oov"             -> (TextAnalysis.oovRate _),
    "q_pack_shards"     -> (graft.text.Curation.packShards _),
    "q_wau_sketch"      -> (graft.ops.Behavior.rollingActiveUsersSketch _),
    "q_spearman"        -> (graft.ops.Analytics.spearmanPriceQty _),
    "q_mom_growth"      -> (graft.ops.Analytics.monthlyGrowth _),
    "q_chi2"            -> (graft.ops.Analytics.chiSquareStatusPriority _),
    "q_trend"           -> (graft.ops.Analytics.revenueTrend _),
    "q_theilsen"        -> (graft.ops.Analytics.theilSenTrend _),
    "q_kendall"         -> (graft.ops.Analytics.kendallTauQtyDiscount _),
    "q_kaplan_meier"    -> (graft.ops.Behavior.kaplanMeier _),
    "q_hodges_lehmann"  -> (graft.ops.Analytics.hodgesLehmannQty _),
    "q_collocations"    -> (graft.text.TextAnalysis.collocations _),
    "q_rolling_ols"     -> (graft.ops.TimeSeries.rollingOlsDaily _),
    "q_dispersion"      -> (graft.ops.TimeSeries.dispersionDaily _),
    "q_elasticity"      -> (graft.ops.Analytics.discountElasticity _),
    "q_gumbel"          -> (graft.ops.Analytics.gumbelMonthlyMax _),
    "q_runs_test"       -> (graft.ops.TimeSeries.runsTestDaily _),
    "q_label_prop"      -> (graft.ops.Graph.labelPropagation _),
    "q_neg_sample"      -> (graft.ops.Training.negativeSampling _),
    "q_harmonic"        -> (graft.ops.Graph.harmonicCentrality _),
    "q_assortativity"   -> (graft.ops.Graph.degreeAssortativity _),
    "q_clustering_coef" -> (graft.ops.Graph.clusteringCoefficient _),
    "q_srm"             -> (graft.ops.Behavior.sampleRatioCheck _),
    "q_octile_shape"    -> (graft.ops.Analytics.octileShapeByFlag _),
    "q_dp_histogram"    -> (graft.ops.Privacy.dpNoisyHistogram _),
    "q_lexicon_audit"   -> (graft.text.TextAnalysis.lexiconAudit _),
    "q_heavy_hitters"   -> (graft.ops.Analytics.heavyHitterParts _),
    // -- round 5: decontamination, mixture planning, quality cascade
    "q_decontam"        -> (graft.text.Decontam.ngramOverlap _),
    "q_decontam_fuzzy"  -> (graft.text.Decontam.minhashDecontam _),
    "q_mixture"         -> (graft.text.Curation.mixturePlan _),
    "q_quality_filter"  -> (TextAnalysis.qualityFilter _),
    "q_rater_agreement" -> (TextAnalysis.classifierAgreement _),
    "q_lm_auc"          -> (TextAnalysis.lmAuc _),
    "q_lm_score"        -> (TextAnalysis.lmScore _),
    "q_lm_calibration"  -> (TextAnalysis.lmCalibration _),
    "q_lm_bigram"       -> (TextAnalysis.bigramLmScore _),
    "q_quantize"        -> (Similarity.quantizeAudit _),
    // -- round 5 late: chunking, scrub, corpus diff, skyline, graph, layout
    "q_chunk"           -> (graft.text.Curation.chunkDocuments _),
    "q_pii_scrub"       -> (graft.ops.Privacy.piiScrub _),
    "q_coverage_overlap" -> (TextAnalysis.sourceOverlap _),
    "q_skyline"         -> (graft.ops.Pareto.skylineParts _),
    "q_triangles"       -> (graft.ops.Graph.coPurchaseTriangles _),
    "q_zorder"          -> (graft.ops.Layout.zorderAudit _),
    "q_lag_features"    -> (graft.ops.Behavior.lagFeatures _),
    "q_pagerank"        -> (graft.ops.Graph.pageRank _),
    "q_ppr_seeds"       -> (graft.ops.Graph.personalizedPageRank _),
    "q_bfs"             -> (graft.ops.Graph.bfsHops _),
    "q_sssp"            -> (graft.ops.Graph.ssspBounded _),
    "q_kcore"           -> (graft.ops.Graph.kCorePeeling _),
    "q_bpe_merges"      -> (TextAnalysis.bpePairCensus _),
    "q_phrase_search"   -> (TextAnalysis.phraseSearch _),
    // -- round 5 continuation: incremental MV maintenance, interval
    //    overlap join, l-diversity audit
    "q_incr_agg"        -> (graft.ops.Merge.incrementalAgg _),
    "q_interval_overlap" -> (graft.ops.TimeSeries.intervalOverlap _),
    "q_ldiversity"      -> (graft.ops.Privacy.lDiversity _),
    "q_tcloseness"      -> (graft.ops.Privacy.tClosenessAudit _),
    "q_containment"     -> (Dedup.containment _),
    "q_text_norm"       -> (TextAnalysis.textNormalize _),
    "q_bootstrap"       -> (graft.ops.Resample.bootstrapOrderPrice _),
    "q_quantile_sketch" -> (graft.ops.Sketches.quantileSketchCheck _),
    "q_kmeans"          -> (Similarity.kmeansCheck _),
    "q_salted_join"     -> (graft.ops.Skew.saltedJoinAudit _),
    "q_hist2d"          -> (graft.ops.Analytics.hist2dPriceQty _),
    "q_pq"              -> (Similarity.pqAudit _),
    "q_percentile_disc" -> (graft.ops.Analytics.percentileDiscByStatus _),
    "q_corr_matrix"     -> (graft.ops.Analytics.corrMatrixLineitem _),
    "q_lorenz"          -> (graft.ops.Analytics.lorenzCustomerRevenue _),
    "q_attribution"     -> (graft.ops.Behavior.clickAttribution _),
    "q_shapley"         -> (graft.ops.Behavior.shapleyAttribution _),
    "q_conformal"       -> (graft.ops.Analytics.conformalIntervals _),
    "q_pinball"         -> (graft.ops.Analytics.pinballBacktest _),
    "q_jackknife"       -> (graft.ops.Analytics.jackknifeClusterSe _),
    "q_brier"           -> (graft.ops.Behavior.brierCalibration _),
    "q_time_to_convert" -> (graft.ops.Behavior.timeToConvert _),
    "q_ab_test"         -> (graft.ops.Behavior.abTestRevenue _),
    "q_mannwhitney"     -> (graft.ops.Behavior.mannWhitney _),
    "q_cliff_delta"     -> (graft.ops.Behavior.cliffDelta _),
    "q_wasserstein"     -> (graft.ops.Behavior.wassersteinDistance _),
    "q_aa_calib"        -> (graft.ops.Behavior.aaCalibration _),
    "q_perm_test"       -> (graft.ops.Behavior.permutationTest _),
    "q_sprt"            -> (graft.ops.Behavior.sprtMonitor _),
    "q_tost"            -> (graft.ops.Behavior.tostEquivalence _),
    "q_cramer"          -> (graft.ops.Behavior.cramerDistance _),
    "q_qte"             -> (graft.ops.Behavior.quantileTreatmentEffects _),
    "q_wilcoxon"        -> (graft.ops.Behavior.wilcoxonSignedRank _),
    "q_strat_ate"       -> (graft.ops.Behavior.stratifiedAte _),
    "q_logrank"         -> (graft.ops.Behavior.logRank _),
    "q_xyz"             -> (graft.ops.Analytics.xyzAnalysis _),
    "q_bh_fdr"          -> (graft.ops.Analytics.bhFdrScreen _),
    "q_holt"            -> (graft.ops.TimeSeries.holtForecast _),
    "q_croston"         -> (graft.ops.TimeSeries.crostonForecast _),
    "q_cointegration"   -> (graft.ops.TimeSeries.cointegration _),
    "q_granger"         -> (graft.ops.TimeSeries.grangerCausality _),
    "q_dtw"             -> (graft.ops.TimeSeries.dtwDistance _),
    "q_mahalanobis"     -> (graft.ops.Analytics.mahalanobisOutliers _),
    "q_seqpattern"      -> (graft.ops.Behavior.sequencePattern _),
    "q_ks_test"         -> (graft.ops.Behavior.ksTest _),
    "q_assoc_rules"     -> (graft.ops.Behavior.associationRules _),
    "q_concurrency"     -> (graft.ops.TimeSeries.intervalConcurrency _),
    "q_ewma"            -> (graft.ops.TimeSeries.ewmaDaily _),
    "q_seasonal"        -> (graft.ops.TimeSeries.seasonalDow _),
    "q_cusum"           -> (graft.ops.TimeSeries.cusumChangepoint _),
    "q_clamped_balance" -> (graft.ops.TimeSeries.clampedBalance _),
    "q_timed_funnel"    -> (graft.ops.TimeSeries.timedFunnel _),
    "q_cv_folds"        -> (graft.ops.TimeSeries.cvFolds _),
    "q_acf"             -> (graft.ops.TimeSeries.acfDailyRevenue _),
    // -- round 9, session 2: CDF-gap + block-rank family completions
    "q_anderson_darling" -> (graft.ops.Behavior.andersonDarling _),
    "q_kendall_w"       -> (graft.ops.Analytics.kendallW _),
    "q_page_trend"      -> (graft.ops.Analytics.pageTrend _),
    "q_jaro_winkler"    -> (Dedup.jaroWinklerPairs _),
    "q_good_turing"     -> (TextAnalysis.goodTuring _),
    "q_fertility"       -> (TextAnalysis.tokenizerFertility _),
    "q_burrows_delta"   -> (TextAnalysis.burrowsDelta _),
    "q_ecod"            -> (Similarity.ecodOutliers _),
    "q_ccf"             -> (graft.ops.TimeSeries.ccfClicksPurchases _),
    "q_ipw_ate"         -> (graft.ops.Analytics.ipwAte _),
    "q_brunner_munzel"  -> (graft.ops.Behavior.brunnerMunzel _),
    "q_meta_fixed"      -> (graft.ops.Behavior.metaFixedEffect _),
    "q_welch_anova"     -> (graft.ops.Analytics.welchAnova _),
    "q_bartlett"        -> (graft.ops.Analytics.bartlettQtyByFlag _),
    "q_dr_ate"          -> (graft.ops.Analytics.drAte _),
    "q_arch"            -> (graft.ops.TimeSeries.archTest _),
    "q_periodogram"     -> (graft.ops.TimeSeries.periodogram _),
    "q_mrr"             -> (graft.text.Retrieval.mrrAtK _),
    "q_hubness"         -> (Similarity.hubnessAudit _),
    "q_isotropy"        -> (Similarity.isotropyAudit _),
    "q_cluster_validity" -> (Similarity.clusterValidity _),
    "q_g_test"          -> (graft.text.TextAnalysis.gTestLangSource _),
    "q_mantel_haenszel" -> (graft.ops.Behavior.mantelHaenszel _),
    "q_hoeffding_d"     -> (graft.ops.Analytics.hoeffdingD _),
    "q_kuiper"          -> (graft.ops.Behavior.kuiperTest _),
    "q_cox_ph"          -> (graft.ops.Behavior.coxPh _),
    "q_holt_winters"    -> (graft.ops.TimeSeries.holtWinters _),
    "q_games_howell"    -> (graft.ops.Analytics.gamesHowellPairs _),
    "q_chow"            -> (graft.ops.TimeSeries.chowTest _),
    "q_dedup_eval"      -> (Dedup.dedupEval _),
    "q_poisson_glm"     -> (graft.ops.Analytics.poissonGlm _),
    "q_schoenfeld"      -> (graft.ops.Behavior.schoenfeldPh _),
    "q_breusch_pagan"   -> (graft.ops.TimeSeries.breuschPagan _),
    "q_jarque_bera"     -> (graft.ops.TimeSeries.jarqueBera _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity < 5""".stripMargin,
    "q_filter_date_eq" ->
      "SELECT * FROM orders WHERE o_orderdate = TIMESTAMP '1995-03-01 00:00:00'",
    "q_union_snapshots" ->
      """SELECT * FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1995-02-01 00:00:00'
        |UNION ALL
        |SELECT * FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-02-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1995-03-01 00:00:00'""".stripMargin,
    "q_cast_types" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS key_str,
        |       CAST(FLOOR(l_quantity) AS INTEGER) AS qty_int,
        |       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
        |       CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem""".stripMargin,
    "q_null_handling" ->
      """SELECT doc_id, nullif(lang, 'en') AS lang_or_null,
        |       coalesce(nullif(lang, 'en'), 'unknown') AS lang_norm,
        |       (lang IS NULL) AS was_null
        |FROM documents""".stripMargin,
    "q_distinct" -> "SELECT DISTINCT c_mktsegment FROM customer",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(l_quantity) AS DOUBLE) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(l_extendedprice) AS DOUBLE) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(count(l_discount) AS DOUBLE) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    // HAVING n > 0: over an EMPTY fact table Spark's ROLLUP/CUBE emit
    // zero rows while the standard (and DuckDB) still emit the
    // empty-grouping-set grand-total row (n = 0, total NULL) — the only
    // zero-count row either form can produce, so the clause is inert on
    // any non-empty input (empty-orders edge sweep)
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |HAVING count(*) > 0""".stripMargin,
    "q_cube" ->
      """SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hour_of_day,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY CUBE (event_type, hour_of_day)
        |HAVING count(*) > 0""".stripMargin,
    "q_case_when_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc,
        |  CAST(sum(CASE WHEN l_tax = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_no_tax,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q3_top_revenue" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "q12_priority" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
        |    AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY l_returnflag""".stripMargin,
    "q14_promo" ->
      """SELECT
        |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
        |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
        |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |               (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS promo_revenue_pct,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'""".stripMargin,
    "q_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995)""".stripMargin,
    "q_notin_null"    -> Relational.notInNullAwareSql,
    "q_outer_join_agg" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "q_window_latest" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t WHERE rn = 1""".stripMargin,
    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
        |  lag(l_quantity, 1) OVER (
        |    PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_qty
        |FROM lineitem WHERE l_suppkey <= 5""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_orderstatus, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice, row_number() OVER (
        |    PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t WHERE rk <= 3""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin,
    "q_set_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin,
    "q_scalar_strings" ->
      """SELECT p_partkey, upper(p_name) AS name_upper, lower(p_brand) AS brand_lower,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  substr(p_type, 1, 5) AS type_prefix,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
        |  trim(p_name) AS name_trim,
        |  (p_name LIKE '%green%') AS is_green
        |FROM part""".stripMargin,
    "q_scalar_dates" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |  CAST(day(o_orderdate) AS INTEGER) AS o_day,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS due_date,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER)
        |    AS days_to_2002
        |FROM orders""".stripMargin,
    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |  sqrt(l_extendedprice) AS price_sqrt,
        |  l_orderkey % 7 AS key_mod7,
        |  l_quantity * l_extendedprice AS qty_price
        |FROM lineitem WHERE l_orderkey <= 1000""".stripMargin,
    "q_above_avg" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT count(*) FROM orders)
        |    > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)""".stripMargin,
    "q_events_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin,
    // -- LLM-pipeline extensions. The approximate operators (ANN,
    // sketches, heavy hitters) are graded through their deterministic
    // CONTRACTS: DuckDB cannot reproduce bucket/centroid/sketch
    // internals, so those queries emit exact companion values plus
    // bound-check booleans the oracle asserts as constants.
    "q_knn_lsh"       -> Similarity.recallCheckSql,
    "q_knn_ivf"       -> Similarity.recallCheckSql,
    "q_sketches"      -> graft.ops.Sketches.orderSketchesSql,
    "q_cms"           -> graft.ops.Sketches.cmsFrequenciesSql,
    "q_overlap_sketch" -> graft.ops.Sketches.audienceOverlapSql,
    "q_hll_det"       -> graft.ops.Sketches.detHllSql,
    "q_kmv"           -> graft.ops.Sketches.kmvDistinctSql,
    "q_ams_f2"        -> graft.ops.Sketches.amsF2Sql,
    "q_wau_sketch"    -> graft.ops.Behavior.rollingActiveUsersSketchSql,
    "q_heavy_hitters" -> graft.ops.Analytics.heavyHitterPartsSql,
    "q_text_stats"    -> TextAnalysis.textStatsSql,
    "q_lang_id"       -> TextAnalysis.langIdSql,
    "q_lang_confusion" -> TextAnalysis.langConfusionSql,
    "q_lsh_plan"      -> Dedup.lshPlanningTableSql,
    "q_decayed"       -> graft.ops.TimeSeries.decayedPopularitySql,
    "q_forecast_bt"   -> graft.ops.TimeSeries.forecastBacktestSql,
    "q_fingerprint"   -> TextAnalysis.fingerprintSql,
    "q_dedup_exact"   -> Dedup.exactDedupSql,
    "q_dedup_jaccard" -> Dedup.ngramJaccardSql,
    "q_dedup_minhash" -> Dedup.minhashLshSql,
    "q_minhash_calib" -> Dedup.minhashCalibrationSql,
    "q_dedup_simhash" -> Dedup.simhashDedupSql,
    "q_span_dedup"    -> Dedup.spanDedupSql,
    "q_block_dedup"   -> Dedup.blockDedupSql,
    "q_winnow"        -> graft.text.Winnowing.winnowFingerprintsSql,
    "q_seq_pack"      -> graft.text.Curation.seqPackCensusSql,
    "q_pad_waste"     -> graft.text.Curation.padWasteSql,
    "q_bm25"          -> graft.text.Retrieval.bm25Sql,
    "q_temperature"   -> graft.text.Curation.temperatureMixtureSql,
    "q_mmr"           -> Similarity.mmrSelectSql,
    "q_rrf"           -> graft.text.Retrieval.rrfFusionSql,
    "q_ndcg"          -> graft.text.Retrieval.ndcgAtKSql,
    "q_boilerplate"   -> Dedup.boilerplateRatioSql,
    "q_script_profile" -> graft.text.TextAnalysis.scriptProfileSql,
    "q_neighborhood"  -> graft.ops.Graph.neighborhoodFunctionSql,
    "q_gnn_sample"    -> graft.ops.Graph.neighborSampleSql,
    "q_degree_dist"   -> graft.ops.Graph.degreeDistributionSql,
    "q_fd_histogram"  -> graft.ops.Analytics.fdHistogramSql,
    "q_topk_merge"    -> graft.ops.Analytics.topkMergeCheckSql,
    "q_mann_kendall"  -> graft.ops.TimeSeries.mannKendallSql,
    "q_zipf"          -> graft.text.TextAnalysis.zipfFitSql,
    "q_heaps"         -> graft.text.TextAnalysis.heapsLawSql,
    "q_jsd"           -> graft.text.TextAnalysis.jsdSourcesSql,
    "q_growth_acct"   -> graft.ops.Behavior.growthAccountingSql,
    "q_gini"          -> graft.ops.Analytics.giniBySegmentSql,
    "q_hhi"           -> graft.ops.Analytics.hhiByNationSql,
    "q_ohlc"          -> graft.ops.TimeSeries.ohlcDailySql,
    "q_stratified"    -> graft.ops.Analytics.neymanAllocationSql,
    "q_drawdown"      -> graft.ops.TimeSeries.maxDrawdownSql,
    "q_bollinger"     -> graft.ops.TimeSeries.bollingerBreakoutsSql,
    "q_rsi"           -> graft.ops.TimeSeries.rsiDailySql,
    "q_anova"         -> graft.ops.Analytics.anovaValueByTypeSql,
    "q_levene"        -> graft.ops.Analytics.leveneQtyByFlagSql,
    "q_burstiness"    -> graft.ops.Behavior.burstinessPerUserSql,
    "q_ljung_box"     -> graft.ops.TimeSeries.ljungBoxSql,
    "q_link_pred"     -> graft.ops.Graph.linkPredictionSql,
    "q_eigencentrality" -> graft.ops.Graph.eigenCentralitySql,
    "q_hits"          -> graft.ops.Graph.hitsBipartiteSql,
    "q_price_index"   -> graft.ops.Analytics.priceIndicesSql,
    "q_scale_diag"    -> graft.ops.Analytics.scaleDiagnosticsSql,
    "q_semdedup"      -> graft.dedup.Dedup.semDedupSql,
    "q_ngram_novelty" -> graft.text.TextAnalysis.ngramNoveltySql,
    "q_perm_entropy"  -> graft.ops.TimeSeries.permutationEntropySql,
    "q_abc"           -> graft.ops.Analytics.abcAnalysisSql,
    "q_new_vs_repeat" -> graft.ops.Analytics.newVsRepeatSql,
    "q_nelson_aalen"  -> graft.ops.Behavior.nelsonAalenSql,
    "q_cohort_ltv"    -> graft.ops.Behavior.cohortLtvSql,
    "q_tukey_hsd"     -> graft.ops.Analytics.tukeyHsdPairsSql,
    "q_hurst"         -> graft.ops.TimeSeries.hurstExponentSql,
    "q_adf"           -> graft.ops.TimeSeries.dickeyFullerSql,
    "q_var_ratio"     -> graft.ops.TimeSeries.varianceRatioSql,
    "q_ktruss"        -> graft.ops.Graph.kTrussSql,
    "q_span_corruption" -> graft.text.Curation.spanCorruptionSql,
    "q_mlm_mask"      -> graft.text.Curation.mlmMaskingSql,
    "q_dataset_card"  -> graft.text.Curation.datasetCardSql,
    "q_sax"           -> graft.ops.TimeSeries.saxSymbolsSql,
    "q_peaks"         -> graft.ops.TimeSeries.peakDetectionSql,
    "q_friedman"      -> graft.ops.Analytics.friedmanTestSql,
    "q_mutual_info"   -> graft.ops.Analytics.mutualInfoTypeHourSql,
    "q_kruskal"       -> graft.ops.Behavior.kruskalWallisSql,
    "q_dunn"          -> graft.ops.Behavior.dunnPosthocSql,
    "q_mcnemar"       -> graft.ops.Behavior.mcnemarTestSql,
    "q_cochran_q"     -> graft.ops.Behavior.cochranQSql,
    "q_mood_median"   -> graft.ops.Behavior.moodMedianTestSql,
    "q_jonckheere"    -> graft.ops.Analytics.jonckheereTerpstraSql,
    "q_durbin_watson" -> graft.ops.TimeSeries.durbinWatsonSql,
    "q_readability"   -> graft.text.TextAnalysis.readabilitySql,
    "q_cem"           -> graft.ops.Behavior.cemAttSql,
    "q_mase"          -> graft.ops.TimeSeries.maseForecastSql,
    "q_textrank"      -> graft.text.TextAnalysis.textRankSql,
    "q_changepoint"   -> graft.ops.TimeSeries.changepointSql,
    "q_capture_recapture" -> graft.ops.Behavior.captureRecaptureSql,
    "q_rate_test"     -> graft.ops.Behavior.poissonRateTestSql,
    "q2_min_cost"     -> graft.ops.TpchClose.q2MinCostSupplierSql,
    "q9_product_profit" -> graft.ops.TpchClose.q9ProductProfitSql,
    "q11_important_stock" -> graft.ops.TpchClose.q11ImportantStockSql,
    "q16_parts_suppliers" -> graft.ops.TpchClose.q16PartsSupplierRelSql,
    "q20_potential_promo" -> graft.ops.TpchClose.q20PotentialPromoSql,
    "q21_waiting_supp" -> graft.ops.TpchClose.q21WaitingSuppliersSql,
    "q_gini_dist"     -> graft.ops.Analytics.giniRevenueSql,
    "q_trimmed_mean"  -> graft.ops.Analytics.winsorizedStatsSql,
    "q_kalman"        -> graft.ops.TimeSeries.kalmanLevelSql,
    "q_query_likelihood" -> graft.text.Retrieval.queryLikelihoodSql,
    "q_js_div"        -> graft.ops.Behavior.jsDivergenceSql,
    "q_chao1"         -> TextAnalysis.vocabRichnessSql,
    "q_fleiss"        -> TextAnalysis.fleissKappaSql,
    "q_rmst"          -> graft.ops.Behavior.rmstSql,
    "q_ego_betweenness" -> graft.ops.Graph.egoBetweennessSql,
    "q_pacf"          -> graft.ops.TimeSeries.pacfDailyRevenueSql,
    "q_bradley_terry" -> graft.ops.Analytics.bradleyTerrySql,
    "q_cvm"           -> graft.ops.Behavior.cvmTestSql,
    "q_logit"         -> graft.ops.Analytics.logisticRegressionSql,
    "q_rich_club"     -> graft.ops.Graph.richClubSql,
    "q_kneser_ney"    -> TextAnalysis.knBigramScoreSql,
    "q_dsir"          -> graft.text.Curation.dsirWeightsSql,
    "q_theil_u"       -> graft.ops.TimeSeries.theilUSql,
    "q_sampen"        -> graft.ops.TimeSeries.sampleEntropySql,
    "q_ansari"        -> graft.ops.Behavior.ansariBradleySql,
    "q_pr_auc"        -> TextAnalysis.prAucSql,
    "q_cronbach"      -> TextAnalysis.cronbachAlphaSql,
    "q_icc"           -> graft.ops.Behavior.iccDesignEffectSql,
    "q_curation_funnel" -> graft.text.Curation.curationFunnelSql,
    "q_odds_ratio"    -> graft.ops.Behavior.oddsRatioConversionSql,
    "q_ca_trend"      -> graft.ops.Analytics.cochranArmitageTrendSql,
    "q_classifier_metrics" -> TextAnalysis.classifierMetricsSql,
    "q_audio_census"  -> Multimodal.audioCensusSql,
    "q_stl_strength"  -> graft.ops.TimeSeries.seasonalStrengthSql,
    "q_did"           -> graft.ops.Behavior.diffInDiffSql,
    "q_sequential"    -> graft.ops.Behavior.sequentialTestSql,
    "q_reco_eval"     -> graft.ops.Graph.recommenderEvalSql,
    "q_isotonic"      -> graft.ops.Analytics.isotonicQtyByDiscountSql,
    "q_knn_brute"     -> Similarity.bruteForceTopKSql,
    "q_bitext_mine"   -> Similarity.bitextMiningSql,
    "q_triplet_mine"  -> Similarity.tripletMiningSql,
    "q_lof"           -> Similarity.lofOutliersSql,
    "q_centroids"     -> Similarity.labelCentroidsSql,
    "q_cov_matrix"    -> Similarity.covarianceMatrixSql,
    "q_pca_power"     -> Similarity.pcaPowerCheckSql,
    "q_dbscan"        -> Similarity.dbscanEmbeddingsBlockedSql,
    "q_media_meta"    -> Multimodal.mediaMetaSql,
    "q_frame_census"  -> Multimodal.frameCensusSql,
    "q_media_decode"  -> Multimodal.decodeCensusSql,
    "q_media_resize"  -> Multimodal.resizeCensusSql,
    "q_media_ahash"   -> Multimodal.ahashCensusSql,
    "q_media_neardup" -> Multimodal.ahashNearDupSql,
    "q_media_funnel"  -> Multimodal.mediaCurationFunnelSql,
    "q_media_hist"    -> Multimodal.histogramCensusSql,
    "q_frame_checksum" -> Multimodal.frameChecksumSql,
    "q_silhouette"    -> Similarity.silhouetteSql,
    "q_cuped"         -> graft.ops.Behavior.cupedReadoutSql,
    "q_power"         -> graft.ops.Behavior.powerAnalysisSql,
    "q_markov"        -> graft.ops.Behavior.markovStationarySql,
    "q_matryoshka"    -> Similarity.matryoshkaRecallSql,
    "q_sessionize"    -> EventStreams.sessionizeBatchSql,
    "q_dedup_embed"   -> Dedup.embeddingNearDupSql,
    "q_dedup_embed_blocked" -> Dedup.embeddingNearDupBlockedSql,
    "q_train_split"   -> TextAnalysis.trainSplitSql,
    "q_top_bigrams"   -> TextAnalysis.topBigramsSql,
    "q_len_histogram" -> TextAnalysis.lengthHistogramSql,
    "q10_returned" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q17_small_qty" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (
        |    SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |           / CAST(count(l2.l_quantity) AS DOUBLE) * 0.2
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q_cond_agg"      -> graft.ops.Analytics.conditionalAggBatterySql,
    "q_checksum"      -> graft.ops.Analytics.checksumAuditSql,
    "q_regexp"        -> graft.ops.Analytics.regexpBatterySql,
    "q_array_hof"     -> graft.ops.Analytics.arrayHofBatterySql,
    "q_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |UNION
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""".stripMargin,
    "q_nullsafe_join" ->
      """WITH even AS (
        |  SELECT lang, count(*) AS n_even FROM documents
        |  WHERE doc_id % 2 = 0 GROUP BY lang),
        |odd AS (
        |  SELECT lang, count(*) AS n_odd FROM documents
        |  WHERE doc_id % 2 = 1 GROUP BY lang)
        |SELECT even.lang AS lang, n_even, n_odd
        |FROM even JOIN odd ON even.lang IS NOT DISTINCT FROM odd.lang""".stripMargin,
    "q_pivot"         -> graft.ops.Analytics.pivotOrderCountsSql,
    "q_unpivot"       -> graft.ops.Analytics.unpivotOrderMeasuresSql,
    "q_grouping_sets" -> graft.ops.Analytics.groupingSetsCustomersSql,
    "q_percentiles"   -> graft.ops.Analytics.percentilesByStatusSql,
    "q_moments"       -> graft.ops.Analytics.momentsByReturnFlagSql,
    "q_string_agg"    -> graft.ops.Analytics.nationsPerRegionSql,
    "q_window_frames" -> graft.ops.Analytics.windowFrameBatterySql,
    "q_asof_join"     -> graft.ops.TimeSeries.asofLatestClickSql,
    // same oracle on purpose: the custom broadcast as-of operator must
    // reproduce the window rendering's contract row-for-row
    "q_asof_broadcast" -> graft.ops.TimeSeries.asofLatestClickSql,
    "q_range_join"    -> graft.ops.TimeSeries.eventPairsWithin30MinSql,
    "q_window_range"  -> graft.ops.TimeSeries.trailingWindowStatsSql,
    "q_dedup_clusters" -> Dedup.dedupClustersSql,
    "q_fuzzy_names"   -> Dedup.fuzzyNamesSql,
    "q_tfidf"         -> TextAnalysis.tfIdfTopTermsSql,
    "q_scd2"          -> graft.ops.TimeSeries.scd2StatusHistorySql,
    "q_scd2_pit"      -> graft.ops.TimeSeries.pitStatusLookupSql,
    "q_canonical_docs" -> graft.text.Curation.canonicalDocsSql,
    "q_source_cap"    -> graft.text.Curation.sourceCapSql,
    "q_greedy_cover"  -> graft.text.Curation.greedyCoverageSql,
    "q_pii_kanon"     -> graft.ops.Privacy.kAnonymizeSql,
    "q_skew_agg"      -> graft.ops.Skew.skewAggByFlagSql,
    "q_sample_strat"  -> Relational.stratifiedSampleSql,
    "q_profile"       -> graft.ops.Profile.profileCustomerSql,
    "q_join_size"     -> graft.ops.Profile.joinSizeStatsSql,
    "q_map_funcs"     -> graft.ops.Analytics.mapFuncsBatterySql,
    "q_session_window" -> EventStreams.sessionWindowAggSql,
    "q4_priority_exists" -> Relational.q4PriorityExistsSql,
    "q7_nation_volume" -> Relational.q7NationVolumeSql,
    "q18_big_orders"  -> Relational.q18BigOrdersSql,
    "q_merge_upsert"  -> graft.ops.Merge.cdcMergeSql,
    "q_snapshot_diff" -> graft.ops.Merge.snapshotDiffSql,
    "q_funnel"        -> graft.ops.Behavior.funnelCountsSql,
    "q_cohort"        -> graft.ops.Behavior.cohortRetentionSql,
    "q_zscore"        -> graft.ops.Analytics.zscorePricesSql,
    "q_repetition"    -> TextAnalysis.repetitionStatsSql,
    "q_share_of_total" -> graft.ops.Analytics.revenueShareByNationSql,
    "q_vector_norms"  -> Similarity.vectorNormsSql,
    "q_deciles"       -> graft.ops.Analytics.decileStatsSql,
    // same oracle as q_deciles: the driver proves the distributed
    // range-partition rendering row-equal to the single-reducer window
    "q_deciles_dist"  -> graft.ops.Analytics.decileStatsSql,
    "q_window_distinct" -> graft.ops.Analytics.windowDistinctCountSql,
    "q_winsorize"     -> graft.ops.Analytics.winsorizedPricesSql,
    "q_udtf_ngrams"   -> TextAnalysis.ngramGenerateSql,
    "q_entropy"       -> TextAnalysis.tokenEntropySql,
    "q_traffic_matrix" -> graft.ops.Behavior.trafficMatrixSql,
    "q_sample_weighted" -> Relational.weightedSampleSql,
    "q_mad"           -> graft.ops.Analytics.madByStatusSql,
    "q_iqr_outliers"  -> graft.ops.Analytics.iqrOutliersSql,
    "q_gapfill"       -> graft.ops.TimeSeries.gapFillDailyOrdersSql,
    "q_asof_tolerance" -> graft.ops.TimeSeries.asofClickWithToleranceSql,
    "q_interpolate"   -> graft.ops.TimeSeries.interpolateDailyPriceSql,
    "q_event_paths"   -> graft.ops.Behavior.topEventPathsSql,
    "q_transitions"   -> graft.ops.Behavior.transitionMatrixSql,
    "q_copurchase"    -> graft.ops.Behavior.coPurchasePairsSql,
    "q_weighted_median" -> graft.ops.Analytics.weightedMedianPriceSql,
    "q_weighted_median_dist" -> graft.ops.Analytics.weightedMedianPriceSql,
    "q_spearman_dist" -> graft.ops.Analytics.spearmanPriceQtySql,
    "q_pack_shards_dist" -> graft.text.Curation.packShardsSql,
    "q_rfm"           -> graft.ops.Analytics.rfmSegmentsSql,
    "q_rfm_dist"      -> graft.ops.Analytics.rfmSegmentsSql,
    "q_dq_audit"      -> graft.ops.Quality.dqAuditSql,
    "q_benford"       -> graft.ops.Quality.benfordAuditSql,
    "q_psi_drift"     -> graft.ops.Quality.psiDriftSql,
    "q_anomaly"       -> graft.ops.Quality.revenueAnomaliesSql,
    "q6_forecast"     -> Relational.q6ForecastSql,
    "q8_market_share" -> Relational.q8MarketShareSql,
    "q13_custdist"    -> Relational.q13CustomerDistributionSql,
    "q15_top_supplier" -> Relational.q15TopSupplierSql,
    "q19_disjunctive" -> Relational.q19DisjunctiveSql,
    "q22_global_sales" -> Relational.q22GlobalSalesSql,
    "q_intersect_all" -> Relational.setIntersectAllSql,
    "q_except_all"    -> Relational.setExceptAllSql,
    "q_mode"          -> graft.ops.Analytics.modeSegmentByNationSql,
    "q_wau"           -> graft.ops.Behavior.rollingActiveUsersSql,
    "q_bounce"        -> graft.ops.Behavior.bounceRateSql,
    "q_streaks"       -> graft.ops.Behavior.activityStreaksSql,
    "q_bitmap_activity" -> graft.ops.Behavior.activityBitmapSql,
    "q_wilson"        -> graft.ops.Behavior.wilsonDailyCtrSql,
    // same oracle as q_range_join: the driver proves the banded
    // (user_id, time-bucket) join row-equal to the per-user form
    "q_range_banded"  -> graft.ops.TimeSeries.eventPairsWithin30MinSql,
    "q_oov"           -> TextAnalysis.oovRateSql,
    "q_pack_shards"   -> graft.text.Curation.packShardsSql,
    "q_spearman"      -> graft.ops.Analytics.spearmanPriceQtySql,
    "q_mom_growth"    -> graft.ops.Analytics.monthlyGrowthSql,
    "q_chi2"          -> graft.ops.Analytics.chiSquareStatusPrioritySql,
    "q_trend"         -> graft.ops.Analytics.revenueTrendSql,
    "q_theilsen"      -> graft.ops.Analytics.theilSenTrendSql,
    "q_kendall"       -> graft.ops.Analytics.kendallTauQtyDiscountSql,
    "q_kaplan_meier"  -> graft.ops.Behavior.kaplanMeierSql,
    "q_hodges_lehmann" -> graft.ops.Analytics.hodgesLehmannQtySql,
    "q_collocations"  -> graft.text.TextAnalysis.collocationsSql,
    "q_rolling_ols"   -> graft.ops.TimeSeries.rollingOlsDailySql,
    "q_dispersion"    -> graft.ops.TimeSeries.dispersionDailySql,
    "q_elasticity"    -> graft.ops.Analytics.discountElasticitySql,
    "q_gumbel"        -> graft.ops.Analytics.gumbelMonthlyMaxSql,
    "q_runs_test"     -> graft.ops.TimeSeries.runsTestDailySql,
    "q_label_prop"    -> graft.ops.Graph.labelPropagationSql,
    "q_neg_sample"    -> graft.ops.Training.negativeSamplingSql,
    "q_harmonic"      -> graft.ops.Graph.harmonicCentralitySql,
    "q_assortativity" -> graft.ops.Graph.degreeAssortativitySql,
    "q_clustering_coef" -> graft.ops.Graph.clusteringCoefficientSql,
    "q_srm"           -> graft.ops.Behavior.sampleRatioCheckSql,
    "q_octile_shape"  -> graft.ops.Analytics.octileShapeByFlagSql,
    "q_dp_histogram"  -> graft.ops.Privacy.dpNoisyHistogramSql,
    "q_lexicon_audit" -> graft.text.TextAnalysis.lexiconAuditSql,
    "q_decontam"      -> graft.text.Decontam.ngramOverlapSql,
    "q_decontam_fuzzy" -> graft.text.Decontam.minhashDecontamSql,
    "q_mixture"       -> graft.text.Curation.mixturePlanSql,
    "q_quality_filter" -> TextAnalysis.qualityFilterSql,
    "q_rater_agreement" -> TextAnalysis.classifierAgreementSql,
    "q_lm_auc"        -> TextAnalysis.lmAucSql,
    "q_lm_score"       -> TextAnalysis.lmScoreSql,
    "q_lm_calibration" -> TextAnalysis.lmCalibrationSql,
    "q_lm_bigram"      -> TextAnalysis.bigramLmScoreSql,
    "q_quantize"      -> Similarity.quantizeAuditSql,
    "q_chunk"         -> graft.text.Curation.chunkDocumentsSql,
    "q_pii_scrub"     -> graft.ops.Privacy.piiScrubSql,
    "q_coverage_overlap" -> TextAnalysis.sourceOverlapSql,
    "q_skyline"       -> graft.ops.Pareto.skylinePartsSql,
    "q_triangles"     -> graft.ops.Graph.coPurchaseTrianglesSql,
    "q_zorder"        -> graft.ops.Layout.zorderAuditSql,
    "q_lag_features"  -> graft.ops.Behavior.lagFeaturesSql,
    "q_pagerank"      -> graft.ops.Graph.pageRankSql,
    "q_ppr_seeds"     -> graft.ops.Graph.personalizedPageRankSql,
    "q_bfs"           -> graft.ops.Graph.bfsHopsSql,
    "q_sssp"          -> graft.ops.Graph.ssspBoundedSql,
    "q_kcore"         -> graft.ops.Graph.kCorePeelingSql,
    "q_bpe_merges"    -> TextAnalysis.bpePairCensusSql,
    "q_phrase_search" -> TextAnalysis.phraseSearchSql,
    "q_incr_agg"      -> graft.ops.Merge.incrementalAggSql,
    "q_interval_overlap" -> graft.ops.TimeSeries.intervalOverlapSql,
    "q_ldiversity"    -> graft.ops.Privacy.lDiversitySql,
    "q_tcloseness"    -> graft.ops.Privacy.tClosenessAuditSql,
    "q_containment"   -> Dedup.containmentSql,
    "q_text_norm"     -> TextAnalysis.textNormalizeSql,
    "q_bootstrap"     -> graft.ops.Resample.bootstrapOrderPriceSql,
    "q_quantile_sketch" -> graft.ops.Sketches.quantileSketchCheckSql,
    "q_kmeans"        -> Similarity.kmeansCheckSql,
    "q_salted_join"   -> graft.ops.Skew.saltedJoinAuditSql,
    "q_hist2d"        -> graft.ops.Analytics.hist2dPriceQtySql,
    "q_pq"            -> Similarity.pqAuditSql,
    "q_percentile_disc" -> graft.ops.Analytics.percentileDiscByStatusSql,
    "q_corr_matrix"   -> graft.ops.Analytics.corrMatrixLineitemSql,
    "q_lorenz"        -> graft.ops.Analytics.lorenzCustomerRevenueSql,
    "q_attribution"   -> graft.ops.Behavior.clickAttributionSql,
    "q_shapley"       -> graft.ops.Behavior.shapleyAttributionSql,
    "q_conformal"     -> graft.ops.Analytics.conformalIntervalsSql,
    "q_pinball"       -> graft.ops.Analytics.pinballBacktestSql,
    "q_jackknife"     -> graft.ops.Analytics.jackknifeClusterSeSql,
    "q_brier"         -> graft.ops.Behavior.brierCalibrationSql,
    "q_time_to_convert" -> graft.ops.Behavior.timeToConvertSql,
    "q_ab_test"       -> graft.ops.Behavior.abTestRevenueSql,
    "q_mannwhitney"   -> graft.ops.Behavior.mannWhitneySql,
    "q_cliff_delta"   -> graft.ops.Behavior.cliffDeltaSql,
    "q_wasserstein"   -> graft.ops.Behavior.wassersteinDistanceSql,
    "q_aa_calib"      -> graft.ops.Behavior.aaCalibrationSql,
    "q_perm_test"     -> graft.ops.Behavior.permutationTestSql,
    "q_sprt"          -> graft.ops.Behavior.sprtMonitorSql,
    "q_tost"          -> graft.ops.Behavior.tostEquivalenceSql,
    "q_cramer"        -> graft.ops.Behavior.cramerDistanceSql,
    "q_qte"           -> graft.ops.Behavior.quantileTreatmentEffectsSql,
    "q_wilcoxon"      -> graft.ops.Behavior.wilcoxonSignedRankSql,
    "q_strat_ate"     -> graft.ops.Behavior.stratifiedAteSql,
    "q_logrank"       -> graft.ops.Behavior.logRankSql,
    "q_xyz"           -> graft.ops.Analytics.xyzAnalysisSql,
    "q_bh_fdr"        -> graft.ops.Analytics.bhFdrScreenSql,
    "q_holt"          -> graft.ops.TimeSeries.holtForecastSql,
    "q_croston"       -> graft.ops.TimeSeries.crostonForecastSql,
    "q_cointegration" -> graft.ops.TimeSeries.cointegrationSql,
    "q_granger"       -> graft.ops.TimeSeries.grangerCausalitySql,
    "q_dtw"           -> graft.ops.TimeSeries.dtwDistanceSql,
    "q_mahalanobis"   -> graft.ops.Analytics.mahalanobisOutliersSql,
    "q_seqpattern"    -> graft.ops.Behavior.sequencePatternSql,
    "q_ks_test"       -> graft.ops.Behavior.ksTestSql,
    "q_assoc_rules"   -> graft.ops.Behavior.associationRulesSql,
    "q_concurrency"   -> graft.ops.TimeSeries.intervalConcurrencySql,
    "q_ewma"          -> graft.ops.TimeSeries.ewmaDailySql,
    "q_seasonal"      -> graft.ops.TimeSeries.seasonalDowSql,
    "q_cusum"         -> graft.ops.TimeSeries.cusumChangepointSql,
    "q_clamped_balance" -> graft.ops.TimeSeries.clampedBalanceSql,
    "q_timed_funnel"  -> graft.ops.TimeSeries.timedFunnelSql,
    "q_cv_folds"      -> graft.ops.TimeSeries.cvFoldsSql,
    "q_acf"           -> graft.ops.TimeSeries.acfDailyRevenueSql,
    "q_window_rank"   ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cdist,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders WHERE o_orderkey <= 2000
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,
    "q_anderson_darling" -> graft.ops.Behavior.andersonDarlingSql,
    "q_kendall_w"        -> graft.ops.Analytics.kendallWSql,
    "q_page_trend"       -> graft.ops.Analytics.pageTrendSql,
    "q_jaro_winkler"     -> graft.dedup.Dedup.jaroWinklerPairsSql,
    "q_good_turing"      -> TextAnalysis.goodTuringSql,
    "q_fertility"        -> TextAnalysis.tokenizerFertilitySql,
    "q_burrows_delta"    -> TextAnalysis.burrowsDeltaSql,
    "q_ecod"             -> graft.similarity.Similarity.ecodOutliersSql,
    "q_ccf"              -> graft.ops.TimeSeries.ccfClicksPurchasesSql,
    "q_ipw_ate"          -> graft.ops.Analytics.ipwAteSql,
    "q_brunner_munzel"   -> graft.ops.Behavior.brunnerMunzelSql,
    "q_meta_fixed"       -> graft.ops.Behavior.metaFixedEffectSql,
    "q_welch_anova"      -> graft.ops.Analytics.welchAnovaSql,
    "q_bartlett"         -> graft.ops.Analytics.bartlettQtyByFlagSql,
    "q_dr_ate"           -> graft.ops.Analytics.drAteSql,
    "q_arch"             -> graft.ops.TimeSeries.archTestSql,
    "q_periodogram"      -> graft.ops.TimeSeries.periodogramSql,
    "q_mrr"              -> graft.text.Retrieval.mrrAtKSql,
    "q_hubness"          -> graft.similarity.Similarity.hubnessAuditSql,
    "q_isotropy"         -> graft.similarity.Similarity.isotropyAuditSql,
    "q_cluster_validity" -> graft.similarity.Similarity.clusterValiditySql,
    "q_g_test"           -> TextAnalysis.gTestLangSourceSql,
    "q_mantel_haenszel"  -> graft.ops.Behavior.mantelHaenszelSql,
    "q_hoeffding_d"      -> graft.ops.Analytics.hoeffdingDSql,
    "q_kuiper"           -> graft.ops.Behavior.kuiperTestSql,
    "q_cox_ph"           -> graft.ops.Behavior.coxPhSql,
    "q_holt_winters"     -> graft.ops.TimeSeries.holtWintersSql,
    "q_games_howell"     -> graft.ops.Analytics.gamesHowellPairsSql,
    "q_chow"             -> graft.ops.TimeSeries.chowTestSql,
    "q_dedup_eval"       -> Dedup.dedupEvalSql,
    "q_poisson_glm"      -> graft.ops.Analytics.poissonGlmSql,
    "q_schoenfeld"       -> graft.ops.Behavior.schoenfeldPhSql,
    "q_breusch_pagan"    -> graft.ops.TimeSeries.breuschPaganSql,
    "q_jarque_bera"      -> graft.ops.TimeSeries.jarqueBeraSql,
  )
}
