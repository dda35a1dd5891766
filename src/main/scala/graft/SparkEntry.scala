package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticsQueries => AQ, PipelineQueries => PQ, RelationalQueries => RQ, SqlQueries => SQ, TpchQueries => TQ}
import graft.operators.{DedupOps, MultimodalOps, SimilarityOps, TimeSeriesOps}
import graft.functions.TextOps

/** Driver contract — one entry per implemented operator from SURVEY.md §2,
  * plus the training-data pipeline surface (dedup / similarity / text /
  * multimodal). Each `queries` key has a DuckDB oracle in [[oracleSql]]
  * except the explicitly-noted non-SQL-expressible ones (rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AQ.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Plane A — the reference's 11 relational shapes (SURVEY §2.1)
    "a1_semi_join"      -> (RQ.a1SemiJoin _),
    "a2_date_filter"    -> (RQ.a2DateFilter _),
    "a3_point_lookup"   -> (RQ.a3PointLookup _),
    "a4_in_filter"      -> (RQ.a4InFilter _),
    "a5_max_agg"        -> (RQ.a5MaxAgg _),
    "a6_filtered_minmax" -> (RQ.a6FilteredMinMax _),
    "a9_latest_wins"    -> (RQ.a9LatestWins _),
    "a9_merge_upsert"   -> (RQ.a9MergeUpsert _),
    "a11_count"         -> (RQ.a11Count _),
    // Plane B — relationally-expressible dataflow operators (SURVEY §2.2)
    "b6_anti_join"      -> (RQ.b6AntiJoin _),
    "b7_case_transition" -> (RQ.b7CaseTransition _),
    "b8_group_collect_set" -> (RQ.b8GroupCollectSet _),
    "b10_topk"          -> (RQ.b10TopK _),
    "j_full_outer"      -> (RQ.jFullOuter _),
    "set_except"        -> (RQ.setExcept _),
    "set_union"         -> (RQ.setUnion _),
    // Scalar function surface (SURVEY §2.3)
    "f_string_ops"      -> (RQ.fStringOps _),
    "f_date_ops"        -> (RQ.fDateOps _),
    "f_json_extract"    -> (RQ.fJsonExtract _),
    "f_numeric_format"  -> (RQ.fNumericFormat _),
    // Analytics layer (SURVEY §7.1 step 7)
    "q1_pricing_summary" -> (AQ.q1PricingSummary _),
    "q3_shipping_priority" -> (AQ.q3ShippingPriority _),
    "q5_local_supplier" -> (AQ.q5LocalSupplier _),
    "w_running_sum"     -> (AQ.wRunningSum _),
    "w_rank"            -> (AQ.wRank _),
    "w_time_bucket_ohlc" -> (AQ.wTimeBucketOhlc _),
    "w_ohlc_merge"      -> (AQ.wOhlcMerge _),
    "g_rollup"          -> (AQ.gRollup _),
    "g_rollup_serve"    -> (AQ.gRollupServe _),
    "g_rollup_filtered" -> (AQ.gRollupFiltered _),
    "g_distinct_agg"    -> (AQ.gDistinctAgg _),
    "g_cube"            -> (AQ.gCube _),
    "g_pivot"           -> (AQ.gPivot _),
    "g_unpivot"         -> (AQ.gUnpivot _),
    "g_profile"         -> (AQ.gProfile _),
    "g_histogram"       -> (AQ.gHistogram _),
    "g_mad_outliers"    -> (AQ.gMadOutliers _),
    "g_argminmax"       -> (AQ.gArgMinMax _),
    // CUSUM changepoint scan, scale-safe prefix-sum-minus-prefix-min form
    "w_cusum"           -> (AQ.wCusum _),
    // 10%-trimmed mean from histogram rank-interval overlaps
    "g_trimmed_mean"    -> (AQ.gTrimmedMean _),
    // Pareto frontier via NDV-sized prefix max (dominance query class)
    "x_skyline"         -> (AQ.skyline _),
    // two-proportion z-test on deterministic A/B cohorts
    "x_ab_test"         -> (AQ.abTest _),
    // sample-ratio-mismatch chi-square gate on the same assignment
    "x_srm_check"       -> (AQ.srmCheck _),
    // CUPED variance reduction: pre-period covariate adjustment of the A/B diff
    "x_cuped"           -> (AQ.cuped _),
    // Theil-Sen robust trend: exact median of pairwise daily slopes
    "ts_theil_sen"      -> (AQ.theilSen _),
    // deterministic Poisson bootstrap: 95% CI for the mean order value
    "x_bootstrap_ci"    -> (AQ.bootstrapCi _),
    // per-source quantile normalization onto the pooled distribution
    "t_quantile_norm"   -> (AQ.quantileNorm _),
    // Mann-Kendall monotone-trend test (tie-corrected, exact S and Var)
    "ts_mann_kendall"   -> (AQ.mannKendall _),
    // trailing-week 3-sigma anomaly flags, all-integer control chart
    "w_rolling_anomaly" -> (AQ.rollingAnomaly _),
    // isotonic (PAVA minimax) recalibration of the reliability bins
    "x_isotonic"        -> (AQ.isotonicCalibration _),
    // winsorized mean per group (clamp tails to p5/p95 order statistics)
    "g_winsor_mean"     -> (AQ.gWinsorMean _),
    // split-conformal keep-gate threshold + held-out coverage
    "x_conformal"       -> (AQ.conformalThreshold _),
    // lag-1 autocorrelation of the daily series (exact integer moments)
    "ts_acf1"           -> (AQ.acf1 _),
    // day-of-week seasonality profile
    "w_dow_profile"     -> (AQ.dowProfile _),
    // funnel conversion-latency percentiles (exact order statistics)
    "w_funnel_latency"  -> (AQ.funnelLatency _),
    // Benford first-digit audit (forensic digit-distribution screen)
    "g_benford"         -> (AQ.benford _),
    // Time-series extensions (as-of join, sessionization)
    "ts_asof_join"      -> (TimeSeriesOps.asofQuery _),
    "ts_sessionize"     -> ((s, d) => TimeSeriesOps.sessionize(s, d)),
    "ts_range_join"     -> (TimeSeriesOps.rangeJoin _),
    "ts_gap_fill"       -> (TimeSeriesOps.gapFill _),
    // same query through the custom LogicalPlan/SparkStrategy/SparkPlan
    // as-of operator (graft.plans.AsOfJoinExec)
    "ts_asof_native"    -> (TimeSeriesOps.asofQueryNative _),
    // native as-of with merge_asof-style tolerance (stale match veto)
    "ts_asof_tolerance" -> (TimeSeriesOps.asofToleranceNative _),
    // SMA/Bollinger/RSI window indicators from exact decimal sums
    "ts_indicators"     -> (TimeSeriesOps.indicators _),
    // hourly volume-weighted average price (exact integer numerator)
    "ts_vwap"           -> (TimeSeriesOps.vwap _),
    // candlestick pattern flags from integer-cent comparisons
    "ts_candles"        -> (TimeSeriesOps.candles _),
    // daily realized volatility from round-6 log returns
    "ts_realized_vol"   -> (TimeSeriesOps.realizedVol _),
    // annualized Sharpe/Sortino per instrument from exact DECIMAL moments
    "ts_sharpe"         -> (TimeSeriesOps.sharpeRatios _),
    // SQL-string entry surface (parser -> Catalyst path)
    "sql_q6"            -> (SQ.sqlQ6 _),
    "sql_set_intersect" -> (SQ.sqlIntersect _),
    "sql_exists"        -> (SQ.sqlExists _),
    "sql_having"        -> (SQ.sqlHaving _),
    "sql_lateral"       -> (SQ.sqlLateral _),
    // WITH RECURSIVE calendar spine (Spark 4 recursive CTE, parser path)
    "sql_recursive"     -> (SQ.sqlRecursive _),
    // Training-data pipeline: dedup
    "d_exact_dedup"     -> (DedupOps.exactDedup _),
    "d_substring_spans" -> (DedupOps.substringSpans _),
    "d_source_overlap"  -> (DedupOps.sourceOverlap _),
    "d_ngram_jaccard"   -> ((s, d) => DedupOps.ngramJaccardPairs(s, d)),
    "d_minhash_lsh"     -> (DedupOps.minhashLshPairs _),
    "d_simhash"         -> (DedupOps.simhash _),
    "d_simhash_pairs"   -> ((s, d) => DedupOps.simhashPairs(s, d)),
    // Training-data pipeline: similarity search
    "s_cosine_neardup"  -> ((s, d) => SimilarityOps.cosineNearDup(s, d)),
    "s_ann_brute"       -> (SimilarityOps.annBruteForce _),
    "s_ann_lsh"         -> ((s, d) => SimilarityOps.annLsh(s, d)),
    "s_ann_ivf"         -> ((s, d) => SimilarityOps.annIvf(s, d)),
    // search in the quantized domain: int8 codes + per-vector scale (SQ8)
    "s_ann_sq8"         -> (SimilarityOps.annSq8 _),
    // majority label of the k nearest labeled neighbors (label propagation)
    "s_knn_label"       -> (SimilarityOps.knnLabel _),
    // contrastive triplet mining: nearest positive + hard negative per query
    "s_triplet_mine"    -> (SimilarityOps.tripletMine _),
    // semantic clustering: quantized k-means, map-only assignment
    "s_kmeans"          -> (SimilarityOps.kmeans(_, _)),
    // cluster-then-dedup composition: k-means cells as the blocking key
    "s_cluster_neardup" -> (SimilarityOps.clusterNearDup(_, _)),
    "s_silhouette"      -> ((s, d) => SimilarityOps.silhouette(s, d)),
    "s_ncc_confusion"   -> ((s, d) => SimilarityOps.nearestCentroid(s, d)),
    "s_label_outliers"  -> ((s, d) => SimilarityOps.labelOutliers(s, d)),
    // Training-data pipeline: text analysis
    "t_langid"          -> (TextOps.langIdDf _),
    "t_quality"         -> (TextOps.qualityDf _),
    // Flesch reading ease with the vowel-group syllable proxy
    "t_readability"     -> (TextOps.readabilityDf _),
    "t_token_count"     -> (TextOps.tokenCountDf _),
    "t_fingerprint"     -> (TextOps.fingerprintDf _),
    // native one-pass repetition stats (Gopher-style quality filtering)
    "t_repetition"      -> (TextOps.repetitionDf _),
    // native one-pass Shannon token entropy (micro-nat integer accumulation)
    "t_token_entropy"   -> (TextOps.tokenEntropyDf _),
    // per-source quota through the native grouped top-k
    "t_source_cap"      -> (PQ.sourceCap _),
    // duplicated-shingle span fraction (RefinedWeb/Gopher dedup signal)
    "d_dup_span_frac"   -> (DedupOps.dupSpanFrac _),
    // first-occurrence shingle share: the corpus-growth novelty curve per doc
    "d_ngram_novelty"   -> (DedupOps.ngramNovelty _),
    // per-source mixture sampling (deterministic data-mixing weights)
    "t_mixture_sample"  -> (PQ.mixtureSample _),
    // Training-data pipeline: multimodal binary columns
    "m_binary_meta"     -> (MultimodalOps.binaryMetaDf _),
    // Round 2: correlated-subquery TPC-H shapes
    "q17_small_qty"     -> (PQ.q17SmallQty _),
    "q14_promo"         -> (PQ.q14Promo _),
    "q10_returned"      -> (PQ.q10Returned _),
    "q18_large_orders"  -> (PQ.q18LargeOrders _),
    "q22_no_orders"     -> (PQ.q22NoOrders _),
    // Round 2: corpus statistics / text pipeline
    "t_term_topk"       -> (PQ.termTopK _),
    // OLS Zipf slope over the top-100 terms (corpus-health diagnostic)
    "t_zipf_fit"        -> (PQ.zipfFit _),
    // Heaps' law vocabulary-growth exponent (two-level prefix sums + OLS)
    "t_heaps_fit"       -> ((s, d) => PQ.heapsFit(s, d)),
    // PSI drift board between corpus halves over the top-50 token features
    "t_psi_drift"       -> (PQ.psiDrift _),
    // data-constrained multi-epoch token budgeting (up-sample small sources)
    "p_epoch_plan"      -> (PQ.epochPlan _),
    "t_pii_scrub"       -> (PQ.piiScrub _),
    "t_contamination"   -> (PQ.contamination _),
    "d_lev_fuzzy"       -> (PQ.levFuzzy _),
    "d_jw_fuzzy"        -> (PQ.jwFuzzy _),
    "t_doc_freq"        -> (PQ.docFreq _),
    "t_vocab_oov"       -> ((s, d) => PQ.vocabOov(s, d)),
    "t_bigram_lm"       -> (PQ.bigramLm _),
    "t_kn_bigram"       -> (PQ.knBigram _),
    "t_textrank"        -> (PQ.textrank _),
    "t_js_sources"      -> (PQ.jsSources _),
    "p_temp_alloc"      -> (PQ.tempAlloc _),
    "t_pmi_colloc"      -> (PQ.pmiColloc _),
    // CCNet head/middle/tail quality tiers from exact xent order statistics
    "t_ppl_bucket"      -> (PQ.pplBucket _),
    // DSIR importance selection: unigram LLR vs target domain, top-quartile keep
    "t_dsir_select"     -> (PQ.dsirSelect _),
    // capstone: the whole curation pipeline as one cumulative survivor report
    "p_curation_funnel" -> (PQ.curationFunnel _),
    "t_bpe_train"       -> ((s, d) => graft.operators.TokenizerOps.bpeTrain(s, d)),
    "t_bpe_encode"      -> ((s, d) => graft.operators.TokenizerOps.bpeSegment(s, d)),
    "t_bpe_pairs"       -> ((s, d) => graft.operators.TokenizerOps.bpePairFreqs(s, d)),
    "t_uni_vocab"       -> ((s, d) => graft.operators.TokenizerOps.unigramVocab(s, d)),
    "t_uni_encode"      -> ((s, d) => graft.operators.TokenizerOps.unigramSegment(s, d)),
    "t_wp_vocab"        -> ((s, d) => graft.operators.TokenizerOps.wordpieceVocab(s, d)),
    "t_wp_encode"       -> ((s, d) => graft.operators.TokenizerOps.wordpieceSegment(s, d)),
    "t_wp_fertility"    -> ((s, d) => graft.operators.TokenizerOps.wordpieceFertility(s, d)),
    "d_cluster_canon"   -> ((s, d) => graft.operators.DedupPipeline
      .clusters(DedupOps.ngramJaccardPairs(s, d)).orderBy("doc_id")),
    "d_canon_longest"   -> (graft.operators.DedupPipeline.canonLongest _),
    "d_containment"     -> ((s, d) => DedupOps.containmentPairs(s, d)),
    // Round 2: deterministic splits / sampling / balancing
    "p_train_split"     -> (PQ.trainSplit _),
    "p_stratified_sample" -> (PQ.stratifiedSample _),
    // concat-and-chunk sequence packing via two-level distributed prefix sums
    "p_seq_pack"        -> ((s, d) => PQ.sequencePack(s, d)),
    // per-sequence manifest (the batch-materialization view of the packing)
    "p_seq_manifest"    -> ((s, d) => PQ.packedSequences(s, d)),
    // seeded deterministic shuffle-shard manifest (the epoch-permutation step)
    "p_shuffle_shard"   -> ((s, d) => PQ.shuffleShard(s, d)),
    "p_class_balance"   -> (PQ.classBalance _),
    // Round 2: window / grouping completions
    "w_lead_delta"      -> (PQ.leadDelta _),
    "g_grouping_sets"   -> (PQ.groupingSets _),
    "g_exact_median"    -> (PQ.exactMedian _),
    "g_corr_stats"      -> (PQ.corrStats _),
    "g_salted_distinct" -> (PQ.saltedDistinct _),
    "g_deciles"         -> (PQ.deciles _),
    // native bounded-heap grouped top-k (graft.plans.TopKPerGroupExec)
    "w_topk_native"     -> (PQ.topkNative _),
    // DSv2 connector scan with pushed filter, oracled via generate_series
    "x_dsv2_scan"       -> (PQ.dsv2Scan _),
    // DSv2 aggregate pushdown: COUNT/MIN/MAX answered by the source itself
    "x_dsv2_agg_pushdown" -> (PQ.dsv2AggPushdown _),
    "w_ntile_pctrank"   -> (PQ.ntilePctRank _),
    "w_first_last"      -> (PQ.firstLast _),
    "f_array_ops"       -> (PQ.arrayOps _),
    "f_map_ops"         -> (PQ.mapOps _),
    "sql_window_range"  -> (PQ.windowRange _),
    // same frame, scale-safe bucketed-join form (no single-partition window)
    "w_range_bucketed"  -> (PQ.windowRangeScaled _),
    "f_date_extra"      -> (PQ.dateExtra _),
    "f_string_extra"    -> (PQ.stringExtra _),
    "f_cond_ops"        -> (PQ.condOps _),
    "f_json_struct"     -> (PQ.jsonStruct _),
    "f_posexplode"      -> (PQ.posExplode _),
    // Sketches under the oracle via in-query error-bound booleans
    "x_approx_sketches" -> (PQ.approxSketches _),
    // mergeable HLL state table: cumulative distinct from stored partials
    "x_hll_incremental" -> (graft.operators.SketchOps.hllIncremental _),
    // Multimodal frame sampling: decode stub is a deterministic fake (no
    // codecs in-container) designed to be DuckDB-replayable end to end
    "m_frame_sample"    -> ((s, d) =>
      MultimodalOps.sampleFrames(s, d).toDF().orderBy("doc_id", "frame_idx")),
    // REAL image decode: deterministic PNGs decoded through javax.imageio,
    // dims + raster checksum oracled via a lossless closed-form replay
    "m_decode"          -> (MultimodalOps.decodeImagesDf _),
    // real resize roundtrip: decode -> NN resample -> re-encode -> decode
    "m_resize"          -> (MultimodalOps.resizeImagesDf _),
    // real feature extraction: exact intensity sum + 4-bin histogram
    "m_features"        -> (MultimodalOps.imageFeaturesDf _),
    // native expressions reached through the SQL-TEXT path (FunctionRegistry)
    "sql_native_fns"    -> (PQ.sqlNativeFns _),
    // Round 7: embedding-pipeline prep + layout/runtime-pruning operators
    "t_chunk"           -> ((s, d) => graft.functions.TextOps.chunkDf(s, d)),
    "s_quantize_int8"   -> (graft.operators.SimilarityOps.quantizeInt8 _),
    "j_bloom_semi"      -> (graft.operators.JoinOps.bloomSemiQuery _),
    "x_zorder_layout"   -> (graft.operators.LayoutOps.zorderLayout _),
    "x_bucketed_join"   -> (graft.operators.BucketingOps.bucketedJoin _),
    "x_pagerank"        -> (graft.operators.GraphOps.pagerank _),
    // deterministic synchronous label propagation (min-label tie-break)
    "x_lpa_communities" -> (graft.operators.GraphOps.lpaCommunities _),
    "x_dpp_prune"       -> (graft.operators.LayoutOps.dppPrune _),
    "t_normalize"       -> (graft.functions.TextOps.normalizeDf _),
    // C4-style boilerplate span removal (frequent-window excision + rebuild)
    "t_boilerplate"     -> (graft.functions.TextOps.boilerplateScrub _),
    "t_boilerplate_fix" -> ((s, d) => graft.functions.TextOps.boilerplateScrubFixpoint(s, d)),
    // quality-filter funnel: first-failing-rule drop attribution per doc
    "t_filter_funnel"   -> (graft.functions.TextOps.filterFunnel _),
    // frozen-LR quality classifier: per-source keep funnel (GPT-3/CCNet shape)
    "p_quality_lr"      -> (graft.operators.QualityClassifier.lrFunnel _),
    // BM25 top-k retrieval through posting lists (inverted-index shape)
    "r_bm25_topk"       -> ((s, d) => graft.operators.RetrievalOps.bm25TopK(s, d)),
    "r_rrf_fusion"      -> ((s, d) => graft.operators.RetrievalOps.rrfFusion(s, d)),
    // pseudo-relevance feedback: expanded second BM25 pass (RM1-lite)
    "r_prf_expand"      -> ((s, d) => graft.operators.RetrievalOps.prfExpand(s, d)),
    // product quantization + ADC search (FAISS PQ shape, codebooks trained in-engine)
    "s_ann_pq"          -> (SimilarityOps.annPq _),
    "ts_scd2"           -> (TimeSeriesOps.scd2History _),
    "d_incremental"     -> (DedupOps.incrementalDedupQuery _),
    // exact heavy hitters: per-partition Misra-Gries candidates + recount
    "g_heavy_hitters"   -> (graft.operators.FrequencyOps.heavyHitters _),
    // PPJoin-style prefix-filtered similarity join (exact, no stop-cap loss)
    "d_prefix_filter"   -> (DedupOps.prefixFilterPairs _),
    // ClickHouse-style behavioral analytics: windowFunnel / retention
    "w_funnel"          -> ((s, d) => graft.operators.FunnelOps.windowFunnel(s, d)),
    "w_seq_match"       -> (graft.operators.FunnelOps.seqMatch _),
    "w_islands"         -> (graft.operators.FunnelOps.streaks _),
    "w_retention"       -> (graft.operators.FunnelOps.retention _),
    // interval coalescing (merge overlapping service spans per customer)
    "w_interval_merge"  -> (graft.operators.IntervalOps.mergeIntervals _),
    // exact trailing-7-day distinct users per active day (DAU/WAU board)
    "w_sliding_distinct" -> (graft.operators.IntervalOps.slidingDistinct _),
    // chi-square term-class association (feature selection for the classifier)
    "t_chi2_terms"      -> ((s, d) => graft.operators.FeatureOps.chi2Terms(s, d)),
    // k-anonymity generalization-ladder release audit
    "t_k_anon"          -> ((s, d) => graft.operators.FeatureOps.kAnonymity(s, d)),
    // degree-oriented triangle count over the part co-purchase graph
    "x_triangles"       -> (graft.operators.GraphOps.triangles _),
    // snapshot reconciliation: per-change-type totals via row fingerprints
    "x_snapshot_diff"   -> (graft.operators.ReconcileOps.snapshotDiff _),
    // merkle anti-entropy: segment fingerprints, drill only dirty buckets
    "x_merkle_diff"     -> (graft.operators.ReconcileOps.merkleDiff _),
    // daily time-weighted average price (irregular-tick aggregate)
    "ts_twa"            -> (TimeSeriesOps.twaPrice _),
    // CAPM beta vs the equal-weight market return
    "ts_market_beta"    -> (TimeSeriesOps.marketBeta _),
    // Amihud illiquidity: |return| per dollar volume
    "ts_amihud"         -> (TimeSeriesOps.amihud _),
    // top-k most-correlated instrument pairs (pairs-trading screen)
    "ts_pair_corr"      -> (TimeSeriesOps.pairCorrelation _),
    // ANALYZE-style per-column stats (count/null/NDV/min-max)
    "x_col_stats"       -> (graft.operators.ReconcileOps.colStats _),
    // join-view incremental maintenance: 4-term delta algebra == recompute
    "x_ivm_join"        -> (AQ.ivmJoin _),
    // aggregate-view maintenance under CDC retractions (signed deltas)
    "x_ivm_agg"         -> (AQ.ivmAgg _),
    // exact Gini skew audit from the count-of-counts fold (no global rank)
    "g_hhi"             -> (AQ.gHhi _),
    "x_bh_fdr"          -> (AQ.bhFdr _),
    "g_skew_gini"       -> (graft.operators.SkewOps.giniSkew _),
    // cumulative distinct users by first-seen day (growth curve)
    "w_cume_new_users"  -> (graft.operators.IntervalOps.cumeNewUsers _),
    // DAU/MAU stickiness per month (exact distinct passes, one double chain)
    "w_stickiness"      -> (graft.operators.IntervalOps.stickiness _),
    // Hilbert-curve clustering twin of x_zorder_layout (adjacency-preserving)
    "x_hilbert_layout"  -> (graft.operators.LayoutOps.hilbertLayout _),
    // MMR diversified re-ranking in the quantized integer domain
    "s_mmr_diversify"   -> (SimilarityOps.mmrDiversify _),
    // dbt-style data-quality contract report (FK / uniqueness / ranges)
    "x_dq_report"       -> (graft.operators.ReconcileOps.dqReport _),
    // exact discrete p50/p95/p99 per group from one value-count histogram
    "g_exact_pcts"      -> (AQ.gExactPcts _),
    // tie-stable grouped mode over the NDV-sized histogram
    "g_mode"            -> (AQ.gMode _),
    // market-basket pair support + exact-integer lift
    "g_pair_lift"       -> (AQ.gPairLift _),
    // exact dyadic time-decay customer value (half-life weighting)
    "w_decay_score"     -> (graft.operators.IntervalOps.decayScore _),
    // first-order behavioral Markov transition matrix
    "w_transitions"     -> (graft.operators.FunnelOps.transitions _),
    // RFM quintile segmentation by exact midrank arithmetic
    "w_rfm"             -> (graft.operators.FunnelOps.rfmSegments _),
    // top-k 3-step session paths (the n-gram view of w_transitions)
    "w_attribution"     -> ((s, d) => graft.operators.FunnelOps.attribution(s, d)),
    "w_path_topk"       -> ((s, d) => graft.operators.FunnelOps.pathTopK(s, d)),
    // nDCG@15 of the BM25 ranking vs a term-coverage gold
    "r_ndcg"            -> ((s, d) => graft.operators.RetrievalOps.ndcgEval(s, d)),
    // greedy max-coverage corpus selection (facility-location subset pick)
    "t_greedy_cover"    -> ((s, d) => graft.operators.FeatureOps.greedyCover(s, d)),
    // LSH QA: confusion counts of LSH candidates vs exact-Jaccard truth
    "d_lsh_eval"        -> (DedupOps.lshEval _),
    // top-decile revenue share per nation (histogram rank intervals)
    "g_pareto_share"    -> (AQ.gParetoShare _),
    // maximum drawdown from a running peak, per event type
    "ts_drawdown"       -> (AQ.tsDrawdown _),
    // cohort-retention matrix (first-activity week x week offset)
    "w_cohort_matrix"   -> (graft.operators.FunnelOps.cohortMatrix _),
    // language-ID confusion matrix vs corpus labels (heuristic QA)
    "t_langid_eval"     -> (TextOps.langIdEval _),
    // Round 9: the remaining TPC-H shapes — all 22 now on the board
    "q2_min_cost"       -> (TQ.q2MinCost _),
    "q4_order_priority" -> (TQ.q4OrderPriority _),
    "q7_volume_shipping" -> (TQ.q7VolumeShipping _),
    "q8_market_share"   -> (TQ.q8MarketShare _),
    "q9_product_profit" -> (TQ.q9ProductProfit _),
    "q11_important_parts" -> (TQ.q11ImportantParts _),
    "q12_late_lines"    -> (TQ.q12LateLines _),
    "q13_custdist"      -> (TQ.q13CustDist _),
    "q15_top_supplier"  -> (TQ.q15TopSupplier _),
    "q16_supplier_cnt"  -> (TQ.q16SupplierCnt _),
    "q19_disjunctive"   -> (TQ.q19Disjunctive _),
    "q20_excess_shipments" -> (TQ.q20ExcessShipments _),
    "q21_waiting_supplier" -> (TQ.q21WaitingSupplier _),
    // KMV sketch set algebra: union AND intersection distinct estimates,
    // deterministic end to end (md5 hashes + fixed-order IEEE ops)
    "x_kmv_setops"      -> (graft.operators.SketchOps.kmvSetOps _),
    // multi-source BFS hop distances via frontier expansion (Pregel shape)
    "x_bfs_hops"        -> (graft.operators.GraphOps.bfsHops _),
    // k-core at the graph's own p75 degree: iterative peeling, early exit
    "x_kcore"           -> (graft.operators.GraphOps.kCore _),
    "x_adamic_adar"     -> (graft.operators.GraphOps.adamicAdar _),
    "x_hits"            -> (graft.operators.GraphOps.hits _),
    "x_assortativity"   -> (graft.operators.GraphOps.assortativity _),
    // exact midrank Spearman rho per return flag (no row-level rank join)
    "g_spearman"        -> (AQ.spearman _),
    // integer-domain EWMA fold per instrument + momentum flag
    "ts_ewma"           -> (TimeSeriesOps.ewma _),
    // exact 5% VaR + expected shortfall per instrument (tail-risk pair)
    "ts_var_es"         -> (TimeSeriesOps.varEs _),
    // weekly-seasonality strength of order flow + peak weekday
    "ts_dow_strength"   -> (TimeSeriesOps.dowStrength _),
    // mutual information lang<->source (+ entropies, NMI) in exact DECIMAL terms
    "g_mutual_info"     -> (AQ.mutualInfo _),
    // chi-square independence + Cramér's V over the same contingency table
    "g_cramers_v"       -> (AQ.cramersV _),
    // histogram-method decision-tree split finder (best Gini-gain threshold)
    "x_best_split"      -> (AQ.bestSplit _),
    // two-sample Kolmogorov-Smirnov over pooled value-domain CDFs
    "x_ks_test"         -> (AQ.ksTest _),
    // Mann-Whitney U rank-sum with tie-corrected normal approximation
    "x_mann_whitney"    -> (AQ.mannWhitney _),
    // weight of evidence + information value of a bucketed feature
    "g_woe_iv"          -> (AQ.woeIv _),
    // two-regressor OLS by DECIMAL-exact normal equations + Cramer solve
    "x_linreg_2f"       -> (AQ.linreg2f _),
    // Welch's unequal-variance t-test off exact per-group moments
    "x_welch_ttest"     -> (AQ.welchTTest _),
    // one-way ANOVA F + eta-squared across all event types
    "x_anova_f"         -> (AQ.anovaF _),
    // Cochran-Mantel-Haenszel stratified 2x2 test + MH pooled odds ratio
    "x_cmh_test"        -> (AQ.cmhTest _),
    // feature-importance sweep: 3 features ranked by best-split gain
    "x_feature_rank"    -> (AQ.featureRank _),
    // week-over-week returning users from stored per-week KMV sketches
    "x_kmv_retention"   -> (graft.operators.SketchOps.kmvRetention _),
    // image near-dup: real decode -> 8x8 aHash -> banded Hamming blocking
    "m_ahash_neardup"   -> (MultimodalOps.ahashNearDup _),
    // audio: per-frame energy/ZCR/peak over synth PCM (decoder is a
    // documented deterministic fake; plumbing + frame DSP are real)
    "m_audio_features"  -> (MultimodalOps.audioFeaturesDf _),
    // Round 10: model-eval family — the queries that grade the gates
    // exact tie-corrected Mann-Whitney ROC-AUC from histogram rank intervals
    "x_roc_auc"         -> (graft.operators.EvalOps.rocAuc _),
    // reliability bins + Brier decomposition of the sigmoid score
    "x_calibration"     -> (graft.operators.EvalOps.calibration _),
    // chance-corrected labeler agreement (language-ID heuristic vs gold)
    "x_cohen_kappa"     -> (graft.operators.EvalOps.cohenKappa _),
    // Kaplan-Meier + Nelson-Aalen time-to-conversion with right-censoring
    "w_kaplan_meier"    -> (graft.queries.SurvivalQueries.kaplanMeier _),
    // systematic PPS sampling: draw k docs proportional to token budget,
    // exact integer grid arithmetic (Madow systematic sampling)
    "p_pps_sample"      -> (PQ.ppsSample _),
  )

  /** Operators with no SQL twin AND no replayable oracle — verified by
    * property/reference-pinned specs only, kept out of [[queries]] so the
    * driver's DuckDB gate never records them as perpetual `no_oracle`
    * failures. Exactly one resident: `t_compress_ratio` (zlib Deflater
    * byte counts — no SQL analog exists; TextAnalysisSpec pins monotone
    * bounds and exact values on fixed inputs). The BPE train/encode loop,
    * which used to live here, IS replayable (TokenizerOps.bpeTrainSql)
    * and sits on the oracle board.
    */
  def specOnlyQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_compress_ratio"  -> (TextOps.compressRatio _),
  )

  def oracleSql: Map[String, String] = Map(
    "a1_semi_join"      -> RQ.a1SemiJoinSql,
    "a2_date_filter"    -> RQ.a2DateFilterSql,
    "a3_point_lookup"   -> RQ.a3PointLookupSql,
    "a4_in_filter"      -> RQ.a4InFilterSql,
    "a5_max_agg"        -> RQ.a5MaxAggSql,
    "a6_filtered_minmax" -> RQ.a6FilteredMinMaxSql,
    "a9_latest_wins"    -> RQ.a9LatestWinsSql,
    "a9_merge_upsert"   -> RQ.a9MergeUpsertSql,
    "a11_count"         -> RQ.a11CountSql,
    "b6_anti_join"      -> RQ.b6AntiJoinSql,
    "b7_case_transition" -> RQ.b7CaseTransitionSql,
    "b8_group_collect_set" -> RQ.b8GroupCollectSetSql,
    "b10_topk"          -> RQ.b10TopKSql,
    "j_full_outer"      -> RQ.jFullOuterSql,
    "set_except"        -> RQ.setExceptSql,
    "set_union"         -> RQ.setUnionSql,
    "f_string_ops"      -> RQ.fStringOpsSql,
    "f_date_ops"        -> RQ.fDateOpsSql,
    "f_json_extract"    -> RQ.fJsonExtractSql,
    "f_numeric_format"  -> RQ.fNumericFormatSql,
    "q1_pricing_summary" -> AQ.q1PricingSummarySql,
    "q3_shipping_priority" -> AQ.q3ShippingPrioritySql,
    "q5_local_supplier" -> AQ.q5LocalSupplierSql,
    "w_running_sum"     -> AQ.wRunningSumSql,
    "w_rank"            -> AQ.wRankSql,
    "w_time_bucket_ohlc" -> AQ.wTimeBucketOhlcSql,
    "w_ohlc_merge"      -> AQ.wOhlcMergeSql,
    "g_rollup"          -> AQ.gRollupSql,
    "g_rollup_serve"    -> AQ.gRollupServeSql,
    "g_rollup_filtered" -> AQ.gRollupFilteredSql,
    "g_distinct_agg"    -> AQ.gDistinctAggSql,
    "g_cube"            -> AQ.gCubeSql,
    "g_pivot"           -> AQ.gPivotSql,
    "g_unpivot"         -> AQ.gUnpivotSql,
    "g_profile"         -> AQ.gProfileSql,
    "ts_asof_join"      -> TimeSeriesOps.asofQuerySql,
    "ts_sessionize"     -> TimeSeriesOps.sessionizeSql(),
    "ts_range_join"     -> TimeSeriesOps.rangeJoinSql,
    "ts_gap_fill"       -> TimeSeriesOps.gapFillSql,
    "ts_asof_native"    -> TimeSeriesOps.asofQuerySql,
    "ts_asof_tolerance" -> TimeSeriesOps.asofToleranceSql,
    "ts_indicators"     -> TimeSeriesOps.indicatorsSql,
    "ts_vwap"           -> TimeSeriesOps.vwapSql,
    "ts_candles"        -> TimeSeriesOps.candlesSql,
    "ts_realized_vol"   -> TimeSeriesOps.realizedVolSql,
    "ts_sharpe"         -> TimeSeriesOps.sharpeRatiosSql,
    "sql_q6"            -> SQ.sqlQ6Sql,
    "sql_set_intersect" -> SQ.sqlIntersectSql,
    "sql_exists"        -> SQ.sqlExistsSql,
    "sql_having"        -> SQ.sqlHavingSql,
    "sql_lateral"       -> SQ.sqlLateralSql,
    "sql_recursive"     -> SQ.sqlRecursiveSql,
    "d_exact_dedup"     -> DedupOps.exactDedupSql,
    "d_substring_spans" -> DedupOps.substringSpansSql,
    "d_source_overlap"  -> DedupOps.sourceOverlapSql,
    "d_ngram_jaccard"   -> DedupOps.ngramJaccardSql,
    "d_minhash_lsh"     -> DedupOps.minhashLshSql,
    "d_simhash"         -> DedupOps.simhashSql,
    "d_simhash_pairs"   -> DedupOps.simhashPairsSql,
    "s_cosine_neardup"  -> SimilarityOps.cosineNearDupSql,
    "s_ann_brute"       -> SimilarityOps.annBruteForceSql,
    "s_ann_lsh"         -> SimilarityOps.annLshSql,
    "s_ann_ivf"         -> SimilarityOps.annIvfSql,
    "s_ann_sq8"         -> SimilarityOps.annSq8Sql,
    "s_knn_label"       -> SimilarityOps.knnLabelSql,
    "s_triplet_mine"    -> SimilarityOps.tripletMineSql,
    "s_kmeans"          -> SimilarityOps.kmeansSql,
    "s_cluster_neardup" -> SimilarityOps.clusterNearDupSql,
    "s_silhouette"      -> SimilarityOps.silhouetteSql,
    "s_ncc_confusion"   -> SimilarityOps.nearestCentroidSql,
    "s_label_outliers"  -> SimilarityOps.labelOutliersSql,
    "t_langid"          -> TextOps.langIdSql,
    "t_quality"         -> TextOps.qualitySql,
    "t_readability"     -> TextOps.readabilitySql,
    "t_token_count"     -> TextOps.tokenCountSql,
    "t_fingerprint"     -> TextOps.fingerprintSql,
    "t_repetition"      -> TextOps.repetitionSql,
    "t_token_entropy"   -> TextOps.tokenEntropySql,
    "t_source_cap"      -> PQ.sourceCapSql,
    "d_dup_span_frac"   -> DedupOps.dupSpanFracSql,
    "d_ngram_novelty"   -> DedupOps.ngramNoveltySql,
    "t_mixture_sample"  -> PQ.mixtureSampleSql,
    "m_binary_meta"     -> MultimodalOps.binaryMetaSql,
    "q17_small_qty"     -> PQ.q17SmallQtySql,
    "q14_promo"         -> PQ.q14PromoSql,
    "q10_returned"      -> PQ.q10ReturnedSql,
    "q18_large_orders"  -> PQ.q18LargeOrdersSql,
    "q22_no_orders"     -> PQ.q22NoOrdersSql,
    "t_term_topk"       -> PQ.termTopKSql,
    "t_zipf_fit"        -> PQ.zipfFitSql,
    "t_heaps_fit"       -> PQ.heapsFitSql,
    "t_psi_drift"       -> PQ.psiDriftSql,
    "p_epoch_plan"      -> PQ.epochPlanSql,
    "t_pii_scrub"       -> PQ.piiScrubSql,
    "t_contamination"   -> PQ.contaminationSql,
    "d_lev_fuzzy"       -> PQ.levFuzzySql,
    "d_jw_fuzzy"        -> PQ.jwFuzzySql,
    "t_doc_freq"        -> PQ.docFreqSql,
    "t_vocab_oov"       -> PQ.vocabOovSql,
    "t_bigram_lm"       -> PQ.bigramLmSql,
    "t_kn_bigram"       -> PQ.knBigramSql,
    "t_textrank"        -> PQ.textrankSql,
    "t_js_sources"      -> PQ.jsSourcesSql,
    "p_temp_alloc"      -> PQ.tempAllocSql,
    "t_pmi_colloc"      -> PQ.pmiCollocSql,
    "t_ppl_bucket"      -> PQ.pplBucketSql,
    "t_dsir_select"     -> PQ.dsirSelectSql,
    "p_curation_funnel" -> PQ.curationFunnelSql,
    "t_bpe_pairs"       -> graft.operators.TokenizerOps.bpePairFreqsSql,
    // full k-round merge-loop replay, unrolled (greedy pass = even offsets
    // within consecutive match-position chains — see TokenizerOps scaladoc)
    "t_bpe_train"       -> graft.operators.TokenizerOps.bpeTrainSql(),
    "t_bpe_encode"      -> graft.operators.TokenizerOps.bpeSegmentSql(),
    // unigram-LM (SentencePiece) seed vocab + Viterbi encode, DP unrolled
    // position-by-position in exact packed integers (TokenizerOps scaladoc)
    "t_uni_vocab"       -> graft.operators.TokenizerOps.unigramVocabSql,
    "t_uni_encode"      -> graft.operators.TokenizerOps.unigramSegSql,
    "t_wp_vocab"        -> graft.operators.TokenizerOps.wordpieceVocabSql,
    "t_wp_encode"       -> graft.operators.TokenizerOps.wordpieceSegSql,
    "t_wp_fertility"    -> graft.operators.TokenizerOps.wordpieceFertilitySql,
    "d_cluster_canon"   -> DedupOps.clusterCanonSql,
    "d_canon_longest"   -> DedupOps.canonLongestSql,
    "d_containment"     -> DedupOps.containmentPairsSql,
    "p_train_split"     -> PQ.trainSplitSql,
    "p_stratified_sample" -> PQ.stratifiedSampleSql,
    "p_seq_pack"        -> PQ.sequencePackSql,
    "p_seq_manifest"    -> PQ.packedSequencesSql,
    "p_shuffle_shard"   -> PQ.shuffleShardSql,
    "p_class_balance"   -> PQ.classBalanceSql,
    "w_lead_delta"      -> PQ.leadDeltaSql,
    "g_grouping_sets"   -> PQ.groupingSetsSql,
    "g_exact_median"    -> PQ.exactMedianSql,
    "g_corr_stats"      -> PQ.corrStatsSql,
    "g_salted_distinct" -> PQ.saltedDistinctSql,
    "g_deciles"         -> PQ.decilesSql,
    "w_topk_native"     -> PQ.topkNativeSql,
    "x_dsv2_scan"       -> PQ.dsv2ScanSql,
    "x_dsv2_agg_pushdown" -> PQ.dsv2AggPushdownSql,
    "w_ntile_pctrank"   -> PQ.ntilePctRankSql,
    "w_first_last"      -> PQ.firstLastSql,
    "f_array_ops"       -> PQ.arrayOpsSql,
    "f_map_ops"         -> PQ.mapOpsSql,
    "sql_window_range"  -> PQ.windowRangeSql,
    "w_range_bucketed"  -> PQ.windowRangeScaledSql,
    "f_date_extra"      -> PQ.dateExtraSql,
    "f_string_extra"    -> PQ.stringExtraSql,
    "f_cond_ops"        -> PQ.condOpsSql,
    "f_json_struct"     -> PQ.jsonStructSql,
    "f_posexplode"      -> PQ.posExplodeSql,
    "x_approx_sketches" -> PQ.approxSketchesSql,
    "x_hll_incremental" -> graft.operators.SketchOps.hllIncrementalSql,
    "m_frame_sample"    -> MultimodalOps.frameSampleSql,
    "m_decode"          -> MultimodalOps.decodeSql,
    "m_resize"          -> MultimodalOps.resizeSql,
    "m_features"        -> MultimodalOps.imageFeaturesSql,
    "sql_native_fns"    -> PQ.sqlNativeFnsSql,
    "t_chunk"           -> graft.functions.TextOps.chunkSql(),
    "s_quantize_int8"   -> graft.operators.SimilarityOps.quantizeInt8Sql,
    "j_bloom_semi"      -> graft.operators.JoinOps.bloomSemiSql,
    "x_zorder_layout"   -> graft.operators.LayoutOps.zorderLayoutSql,
    "x_bucketed_join"   -> graft.operators.BucketingOps.bucketedJoinSql,
    "x_pagerank"        -> graft.operators.GraphOps.pagerankSql,
    "x_lpa_communities" -> graft.operators.GraphOps.lpaCommunitiesSql,
    "x_dpp_prune"       -> graft.operators.LayoutOps.dppPruneSql,
    "t_normalize"       -> graft.functions.TextOps.normalizeSql,
    "t_boilerplate"     -> graft.functions.TextOps.boilerplateScrubSql,
    "t_boilerplate_fix" -> graft.functions.TextOps.boilerplateScrubFixpointSql,
    "t_filter_funnel"   -> graft.functions.TextOps.filterFunnelSql,
    "p_quality_lr"      -> graft.operators.QualityClassifier.lrFunnelSql,
    "r_bm25_topk"       -> graft.operators.RetrievalOps.bm25TopKSql,
    "r_rrf_fusion"      -> graft.operators.RetrievalOps.rrfFusionSql,
    "r_prf_expand"      -> graft.operators.RetrievalOps.prfExpandSql,
    "s_ann_pq"          -> SimilarityOps.annPqSql,
    "ts_scd2"           -> TimeSeriesOps.scd2HistorySql,
    "d_incremental"     -> DedupOps.incrementalDedupSql,
    "g_heavy_hitters"   -> graft.operators.FrequencyOps.heavyHittersSql,
    "g_histogram"       -> AQ.gHistogramSql,
    "g_mad_outliers"    -> AQ.gMadOutliersSql,
    "g_argminmax"       -> AQ.gArgMinMaxSql,
    "w_cusum"           -> AQ.wCusumSql,
    "g_trimmed_mean"    -> AQ.gTrimmedMeanSql,
    "x_skyline"         -> AQ.skylineSql,
    "x_ab_test"         -> AQ.abTestSql,
    "x_srm_check"       -> AQ.srmCheckSql,
    "x_cuped"           -> AQ.cupedSql,
    "ts_theil_sen"      -> AQ.theilSenSql,
    "x_bootstrap_ci"    -> AQ.bootstrapCiSql,
    "t_quantile_norm"   -> AQ.quantileNormSql,
    "ts_mann_kendall"   -> AQ.mannKendallSql,
    "w_rolling_anomaly" -> AQ.rollingAnomalySql,
    "x_isotonic"        -> AQ.isotonicCalibrationSql,
    "g_winsor_mean"     -> AQ.gWinsorMeanSql,
    "x_conformal"       -> AQ.conformalThresholdSql,
    "ts_acf1"           -> AQ.acf1Sql,
    "w_dow_profile"     -> AQ.dowProfileSql,
    "w_funnel_latency"  -> AQ.funnelLatencySql,
    "g_benford"         -> AQ.benfordSql,
    "d_prefix_filter"   -> DedupOps.prefixFilterSql,
    "w_funnel"          -> graft.operators.FunnelOps.windowFunnelSql,
    "w_seq_match"       -> graft.operators.FunnelOps.seqMatchSql,
    "w_islands"         -> graft.operators.FunnelOps.streaksSql,
    "w_retention"       -> graft.operators.FunnelOps.retentionSql,
    "w_interval_merge"  -> graft.operators.IntervalOps.mergeIntervalsSql,
    "w_sliding_distinct" -> graft.operators.IntervalOps.slidingDistinctSql,
    "t_chi2_terms"      -> graft.operators.FeatureOps.chi2TermsSql(),
    "t_k_anon"          -> graft.operators.FeatureOps.kAnonymitySql(),
    "x_triangles"       -> graft.operators.GraphOps.trianglesSql,
    "x_snapshot_diff"   -> graft.operators.ReconcileOps.snapshotDiffSql,
    "x_merkle_diff"     -> graft.operators.ReconcileOps.merkleDiffSql,
    "ts_twa"            -> TimeSeriesOps.twaPriceSql,
    "ts_market_beta"    -> TimeSeriesOps.marketBetaSql,
    "ts_amihud"         -> TimeSeriesOps.amihudSql,
    "ts_pair_corr"      -> TimeSeriesOps.pairCorrelationSql,
    "x_col_stats"       -> graft.operators.ReconcileOps.colStatsSql,
    "x_ivm_join"        -> AQ.ivmJoinSql,
    "x_ivm_agg"         -> AQ.ivmAggSql,
    "g_skew_gini"       -> graft.operators.SkewOps.giniSkewSql,
    "w_cume_new_users"  -> graft.operators.IntervalOps.cumeNewUsersSql,
    "w_stickiness"      -> graft.operators.IntervalOps.stickinessSql,
    // t_compress_ratio: specOnlyQueries (zlib bytes have no SQL analog)
    "x_hilbert_layout"  -> graft.operators.LayoutOps.hilbertLayoutSql,
    "s_mmr_diversify"   -> SimilarityOps.mmrDiversifySql,
    "x_dq_report"       -> graft.operators.ReconcileOps.dqReportSql,
    "g_exact_pcts"      -> AQ.gExactPctsSql,
    "g_mode"            -> AQ.gModeSql,
    "g_pair_lift"       -> AQ.gPairLiftSql,
    "w_decay_score"     -> graft.operators.IntervalOps.decayScoreSql,
    "w_transitions"     -> graft.operators.FunnelOps.transitionsSql,
    "w_rfm"             -> graft.operators.FunnelOps.rfmSegmentsSql,
    "w_attribution"     -> graft.operators.FunnelOps.attributionSql(),
    "w_path_topk"       -> graft.operators.FunnelOps.pathTopKSql(),
    "r_ndcg"            -> graft.operators.RetrievalOps.ndcgEvalSql,
    "t_greedy_cover"    -> graft.operators.FeatureOps.greedyCoverSql(),
    "d_lsh_eval"        -> DedupOps.lshEvalSql,
    "g_pareto_share"    -> AQ.gParetoShareSql,
    "g_hhi"             -> AQ.gHhiSql,
    "x_bh_fdr"          -> AQ.bhFdrSql,
    "ts_drawdown"       -> AQ.tsDrawdownSql,
    "w_cohort_matrix"   -> graft.operators.FunnelOps.cohortMatrixSql,
    "t_langid_eval"     -> TextOps.langIdEvalSql,
    "q2_min_cost"       -> TQ.q2MinCostSql,
    "q4_order_priority" -> TQ.q4OrderPrioritySql,
    "q7_volume_shipping" -> TQ.q7VolumeShippingSql,
    "q8_market_share"   -> TQ.q8MarketShareSql,
    "q9_product_profit" -> TQ.q9ProductProfitSql,
    "q11_important_parts" -> TQ.q11ImportantPartsSql,
    "q12_late_lines"    -> TQ.q12LateLinesSql,
    "q13_custdist"      -> TQ.q13CustDistSql,
    "q15_top_supplier"  -> TQ.q15TopSupplierSql,
    "q16_supplier_cnt"  -> TQ.q16SupplierCntSql,
    "q19_disjunctive"   -> TQ.q19DisjunctiveSql,
    "q20_excess_shipments" -> TQ.q20ExcessShipmentsSql,
    "q21_waiting_supplier" -> TQ.q21WaitingSupplierSql,
    "x_kmv_setops"      -> graft.operators.SketchOps.kmvSetOpsSql,
    "x_bfs_hops"        -> graft.operators.GraphOps.bfsHopsSql,
    "x_kcore"           -> graft.operators.GraphOps.kCoreSql,
    "x_adamic_adar"     -> graft.operators.GraphOps.adamicAdarSql,
    "x_hits"            -> graft.operators.GraphOps.hitsSql,
    "x_assortativity"   -> graft.operators.GraphOps.assortativitySql,
    "g_spearman"        -> AQ.spearmanSql,
    "ts_ewma"           -> TimeSeriesOps.ewmaSql,
    "ts_var_es"         -> TimeSeriesOps.varEsSql,
    "ts_dow_strength"   -> TimeSeriesOps.dowStrengthSql,
    "g_mutual_info"     -> AQ.mutualInfoSql,
    "g_cramers_v"       -> AQ.cramersVSql,
    "x_best_split"      -> AQ.bestSplitSql,
    "x_feature_rank"    -> AQ.featureRankSql,
    "x_ks_test"         -> AQ.ksTestSql,
    "x_mann_whitney"    -> AQ.mannWhitneySql,
    "g_woe_iv"          -> AQ.woeIvSql,
    "x_linreg_2f"       -> AQ.linreg2fSql,
    "x_welch_ttest"     -> AQ.welchTTestSql,
    "x_anova_f"         -> AQ.anovaFSql,
    "x_cmh_test"        -> AQ.cmhTestSql,
    "x_kmv_retention"   -> graft.operators.SketchOps.kmvRetentionSql,
    "m_ahash_neardup"   -> MultimodalOps.ahashNearDupSql,
    "m_audio_features"  -> MultimodalOps.audioFeaturesSql,
    "x_roc_auc"         -> graft.operators.EvalOps.rocAucSql,
    "x_calibration"     -> graft.operators.EvalOps.calibrationSql,
    "x_cohen_kappa"     -> graft.operators.EvalOps.cohenKappaSql,
    "w_kaplan_meier"    -> graft.queries.SurvivalQueries.kaplanMeierSql,
    "p_pps_sample"      -> PQ.ppsSampleSql,
  )
}
