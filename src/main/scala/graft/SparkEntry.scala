package graft

import graft.queries.{PipelineBench, Relational, TrainingData}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is deterministic (explicit ordering, rounded
  * floats) and — where ANSI-SQL-expressible — has a DuckDB oracle in
  * [[oracleSql]] computing the same result over the same parquet tables.
  * Column names/aliases are kept identical on both sides (the driver's
  * compare sorts columns by name before hashing values).
  *
  * Portable hashing note: oracles reproduce engine hashing via md5 (bit
  * identical in Spark and DuckDB); xxhash64-based operators (SimHash) and
  * approximate operators (LSH ANN) are rows-only checks by design.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q11NationRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * training-data-pipeline operators (dedup / similarity / text analysis /
    * multimodal).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core (SURVEY §2 operator inventory)
    "q1_pricing_summary" -> (Relational.q1PricingSummary _),
    "q2_grain_audit" -> (Relational.q2GrainAudit _),
    "q3_dup_grain_examples" -> (Relational.q3DupGrainExamples _),
    "q4_validation_split" -> (Relational.q4ValidationSplit _),
    "q5_merge_upsert" -> (Relational.q5MergeUpsert _),
    "q6_semi_join_counts" -> (Relational.q6SemiJoinCounts _),
    "q7_custom_audit" -> (Relational.q7CustomAudit _),
    "q8_dlq_cleanup" -> (Relational.q8DlqCleanup _),
    "q9_topk_orders" -> (Relational.q9TopkOrders _),
    "q10_region_revenue" -> (Relational.q10RegionRevenue _),
    "q11_nation_revenue" -> (Relational.q11NationRevenue _),
    "q12_last_event_by_user" -> (Relational.q12LastEventByUser _),
    "q13_asof_join" -> (Relational.q13AsofJoin _),
    "q14_sessionize" -> (Relational.q14Sessionize _),
    // the streaming session-window twin replayed over events — same oracle
    "q14_sessionize_stream" -> (Relational.q14SessionizeStream _),
    "q15_rollup_revenue" -> (Relational.q15RollupRevenue _),
    "q16_percentiles" -> (Relational.q16Percentiles _),
    "q17_pivot_dow" -> (Relational.q17PivotDayOfWeek _),
    "q18_json_props" -> (Relational.q18JsonProps _),
    "q19_approx_distinct" -> (Relational.q19ApproxDistinct _),
    "q20_anti_join" -> (Relational.q20AntiJoin _),
    "q21_set_ops" -> (Relational.q21SetOps _),
    "q22_moving_avg" -> (Relational.q22MovingAvg _),
    "q23_ntile" -> (Relational.q23Ntile _),
    // training-data pipeline
    "dedup_exact" -> (TrainingData.dedupExact _),
    "dedup_ngram_jaccard" -> (TrainingData.dedupNgramJaccard _),
    "dedup_minhash_lsh" -> (TrainingData.dedupMinhashLsh _),
    "dedup_minhash_recall" -> (TrainingData.dedupMinhashRecall _),
    "dedup_index_novel" -> (TrainingData.dedupIndexNovel _),
    // dedup_simhash (the unsuffixed default) is the BANDED md5 form — the
    // scale path; the brute pair-scan verifiers live under *_verify
    "dedup_simhash" -> (TrainingData.dedupSimhashBanded _),
    "dedup_simhash_verify" -> (TrainingData.dedupSimhash _),
    "dedup_embedding_cosine_verify" -> (TrainingData.dedupEmbeddingCosine _),
    "dedup_embedding_banded" -> (TrainingData.dedupEmbeddingBanded _),
    "dedup_banded_recall" -> (TrainingData.dedupBandedRecall _),
    "sim_topk_bruteforce" -> (TrainingData.simTopkBruteforce _),
    "sim_topk_lsh" -> (TrainingData.simTopkLsh _),
    "sim_topk_ivf" -> (TrainingData.simTopkIvf _),
    "sim_topk_ivf_index" -> (TrainingData.simTopkIvfIndex _),
    "sim_truncated_recall" -> (TrainingData.simTruncatedRecall _),
    "sim_quantized_recall" -> (TrainingData.simQuantizedRecall _),
    "sim_lsh_recall" -> (TrainingData.simLshRecall _),
    "sim_ivf_recall" -> (TrainingData.simIvfRecall _),
    "text_quality" -> (TrainingData.textQuality _),
    "text_pii" -> (TrainingData.textPii _),
    "select_token_budget" -> (TrainingData.selectTokenBudget _),
    // histogram-threshold scale path; must equal select_token_budget
    "select_token_budget_hist" -> (TrainingData.selectTokenBudgetHist _),
    "quality_unigram_logprob" -> (TrainingData.qualityUnigramLogprob _),
    "source_kl_divergence" -> (TrainingData.sourceKlDivergence _),
    "text_zipf_slope" -> (TrainingData.textZipfSlope _),
    "text_langid" -> (TrainingData.textLangid _),
    "text_tokens" -> (TrainingData.textTokens _),
    "text_fingerprint" -> (TrainingData.textFingerprint _),
    "multimodal_features" -> (TrainingData.multimodalFeatures _),
    "curate_corpus" -> (TrainingData.curateCorpus _),
    // corpus management (splits, sampling, n-gram stats, portable simhash,
    // duplicate clustering)
    "split_train_val" -> (TrainingData.splitTrainVal _),
    "split_leakage" -> (TrainingData.splitLeakage _),
    "sample_stratified" -> (TrainingData.sampleStratified _),
    "text_ngrams" -> (TrainingData.textNgrams _),
    "dedup_simhash_md5" -> (TrainingData.dedupSimhashMd5 _),
    "dup_clusters" -> (TrainingData.dupClusters _),
    "dup_cluster_sizes" -> (TrainingData.dupClusterSizes _),
    "dedup_keep_best" -> (TrainingData.dedupKeepBest _),
    "dup_cluster_examples" -> (TrainingData.dupClusterExamples _),
    "emb_centroids" -> (TrainingData.embCentroids _),
    "contamination_check" -> (TrainingData.contaminationCheck _),
    // eval stream vs static train grams (stream-static join, AvailableNow
    // replay) — must equal the batch check, shares its oracle
    "contamination_check_stream" -> (TrainingData.contaminationCheckStream _),
    "contamination_topdocs" -> (TrainingData.contaminationTopdocs _),
    "decontam_filter" -> (TrainingData.decontamFilter _),
    // decontam_filter through the persisted eval-gram index — same split/
    // cap/rollup, so it shares the inline filter's oracle
    "decontam_index" -> (TrainingData.decontamIndex _),
    "tfidf_top_terms" -> (TrainingData.tfidfTopTerms _),
    "quality_gate_dynamic" -> (TrainingData.qualityGateDynamic _),
    "quality_repetition" -> (TrainingData.qualityRepetition _),
    "pack_sequences" -> (TrainingData.packSequences _),
    "vocab_coverage" -> (TrainingData.vocabCoverage _),
    "dedup_containment" -> (TrainingData.dedupContainment _),
    "select_best_per_lang" -> (TrainingData.selectBestPerLang _),
    "emb_quantize" -> (TrainingData.embQuantize _),
    "emb_kmeans" -> (TrainingData.embKmeans _),
    "sample_fixed_n" -> (TrainingData.sampleFixedN _),
    "dedup_incremental" -> (TrainingData.dedupIncremental _),
    // mixture / sharding / chunking / embedding-quality ops
    "importance_weights" -> (TrainingData.importanceWeights _),
    "quality_ccnet_bucket" -> (TrainingData.qualityCcnetBucket _),
    "emb_dim_stats" -> (TrainingData.embDimStats _),
    "emb_outliers" -> (TrainingData.embOutliers _),
    "quality_gopher" -> (TrainingData.qualityGopher _),
    "seq_len_buckets" -> (TrainingData.seqLenBuckets _),
    "length_outliers" -> (TrainingData.lengthOutliers _),
    "dedup_prefix" -> (TrainingData.dedupPrefix _),
    "dedup_by_source" -> (TrainingData.dedupBySource _),
    "bm25_topk" -> (TrainingData.bm25Topk _),
    "text_entropy" -> (TrainingData.textEntropy _),
    "mixture_weights" -> (TrainingData.mixtureWeights _),
    "sample_temperature" -> (TrainingData.sampleTemperature _),
    "shard_assign" -> (TrainingData.shardAssign _),
    "bytes_per_token" -> (TrainingData.bytesPerToken _),
    "window_chunking" -> (TrainingData.windowChunking _),
    "knn_label_agreement" -> (TrainingData.knnLabelAgreement _),
    // collocations / weighted sampling / range join / spectral
    "text_pmi" -> (TrainingData.textPmi _),
    "sample_weighted" -> (TrainingData.sampleWeighted _),
    "q24_range_join" -> (Relational.q24RangeJoin _),
    "emb_pca" -> (TrainingData.embPca _),
    // semantic dedup + sketch family
    "dedup_semantic" -> (TrainingData.dedupSemantic _),
    "text_heavy_hitters" -> (TrainingData.textHeavyHitters _),
    "text_top_tokens" -> (TrainingData.textTopTokens _),
    "q25_approx_quantile" -> (Relational.q25ApproxQuantile _),
    "q26_correlated_avg" -> (Relational.q26CorrelatedAvg _),
    "q27_lateral_topn" -> (Relational.q27LateralTopPerNation _),
    "multimodal_pipeline" -> (TrainingData.multimodalPipeline _),
    "quality_funnel" -> (TrainingData.qualityFunnel _),
    "source_overlap" -> (TrainingData.sourceOverlap _),
    "text_hash_embedding" -> (TrainingData.textHashEmbedding _),
    "dedup_spans" -> (TrainingData.dedupSpans _),
    "dedup_span_coverage" -> (TrainingData.dedupSpanCoverage _),
    "text_winnow" -> (TrainingData.textWinnow _),
    "dedup_paragraphs" -> (TrainingData.dedupParagraphs _),
    // the streaming twin replayed over the corpus (AvailableNow) — its
    // survivor set must equal the batch distinct-chunk set, oracle-checked
    "dedup_paragraphs_stream" -> (TrainingData.dedupParagraphsStream _),
    "dedup_exact_stream" -> (TrainingData.dedupExactStream _),
    "quality_monitor_stream" -> (TrainingData.qualityMonitorStream _),
    "text_novelty" -> (TrainingData.textNovelty _),
    "rag_retrieval" -> (TrainingData.ragRetrieval _),
    // corpus reporting / fuzzy dedup / drift / semantic decontamination
    "corpus_card" -> (TrainingData.corpusCard _),
    "source_dup_matrix" -> (TrainingData.sourceDupMatrix _),
    "drift_psi" -> (TrainingData.driftPsi _),
    // the streaming twin replayed over the current half (AvailableNow) —
    // row-identical to drift_psi by construction, shares its oracle
    "drift_psi_stream" -> (TrainingData.driftPsiStream _),
    "q28_event_funnel" -> (Relational.q28EventFunnel _),
    "q29_cohort_retention" -> (Relational.q29CohortRetention _),
    // data-quality family: column profiling, behavior transitions, FK audit
    "profile_table" -> (Relational.profileTable _),
    "q30_event_transitions" -> (Relational.q30EventTransitions _),
    "q31_ref_integrity" -> (Relational.q31RefIntegrity _),
    "q32_anomalous_hours" -> (Relational.q32AnomalousHours _),
    "vocab_growth" -> (TrainingData.vocabGrowth _),
    "dedup_fuzzy" -> (TrainingData.dedupFuzzy _),
    "contamination_embedding" -> (TrainingData.contaminationEmbedding _),
    "sim_topk_diversified" -> (TrainingData.simTopkDiversified _),
    // model-based quality filtering (NB classifier on weak labels, bigram
    // LM scoring, BPE merge statistics)
    "quality_nb_classifier" -> (TrainingData.qualityNbClassifier _),
    "quality_nb_topfeatures" -> (TrainingData.qualityNbTopFeatures _),
    "multimodal_join_profile" -> (TrainingData.multimodalJoinProfile _),
    "quality_bigram_logprob" -> (TrainingData.qualityBigramLogprob _),
    "bpe_pair_stats" -> (TrainingData.bpePairStats _),
    // Bloom prefilter for incremental dedup (bounded broadcast state; the
    // no-false-negative contract and measured fp rate are oracle columns)
    "dedup_bloom" -> (TrainingData.dedupBloom _),
    // data-constrained mixing: exact water-filling token allocation
    "mixture_epoch_schedule" -> (TrainingData.mixtureEpochSchedule _),
    // recall@5 vs nprobe curve (candidates generated once, widest probe)
    "sim_recall_curve" -> (TrainingData.simRecallCurve _),
    // per-source chunk-df boilerplate surface (CCNet template removal)
    "text_boilerplate" -> (TrainingData.textBoilerplate _),
    // streaming twin of the Bloom probe (stream-static join, AvailableNow
    // replay) — flagged count must equal the batch filter, oracle-checked
    "dedup_bloom_stream" -> (TrainingData.dedupBloomStream _),
    // near-dup rate vs cosine threshold (one band join, N curve points)
    "dedup_threshold_sweep" -> (TrainingData.dedupThresholdSweep _),
    // contamination rate vs n-gram size (4/5/6)
    "contamination_gram_sweep" -> (TrainingData.contaminationGramSweep _),
    // dedup-bias audit: quality stats for in-cluster vs unique docs
    "dup_quality_calibration" -> (TrainingData.dupQualityCalibration _),
    // length-sorted vs arrival-order packing (boundary-split savings)
    "pack_sorted_compare" -> (TrainingData.packSortedCompare _),
    // langid eval: full confusion matrix against the labeled lang column
    "text_langid_confusion" -> (TrainingData.textLangidConfusion _),
    // RFM quintile segmentation of the event stream (5x5 R-F grid)
    "q33_rfm_segments" -> (Relational.q33RfmSegments _),
    // binary-payload exact dedup per modality (digest-only shuffles)
    "multimodal_dedup" -> (TrainingData.multimodalDedup _),
    // per-source snapshot diff: added/removed/changed/unchanged
    "corpus_snapshot_diff" -> (TrainingData.corpusSnapshotDiff _),
    // radius query over the IVF-probed buckets (no per-query sort)
    "sim_range_search" -> (TrainingData.simRangeSearch _),
    // IVF bucket balance / imbalance health report
    "emb_ivf_balance" -> (TrainingData.embIvfBalance _),
    // exact integer Spearman agreement between quality signals
    "quality_metric_agreement" -> (TrainingData.qualityMetricAgreement _),
    // dense hour spine + zero-fill + forward-filled hourly value average
    "q34_gap_fill" -> (Relational.q34GapFill _),
    "q35_interarrival" -> (Relational.q35Interarrival _),
    // full product pipeline as a benchmarkable query (BASELINE comparison)
    "pipeline_etl" -> (PipelineBench.pipelineEtl _),
    // steady-state incremental publish: O(delta) bucketed merge into an
    // existing target, counters oracle-recomputed relationally
    "pipeline_incremental" -> (PipelineBench.pipelineIncremental _),
    "pipeline_mor" -> (PipelineBench.pipelineMor _),
    // provenance snapshot lifecycle: pin -> publish past it -> pinned and
    // current reads rolled up with integer-exact counters, then drop+vacuum
    "pipeline_snapshot" -> (PipelineBench.pipelineSnapshot _),
    "pipeline_forget" -> (PipelineBench.pipelineForget _),
  )

  /** DuckDB bit-vote expression mirroring TrainingData.dedupSimhashMd5's 60
    * per-bit vote aggregates (sign of the +1/-1 vote sum sets each bit).
    */
  private val simhashVoteSql: String = (0 until 60).map { b =>
    s"CASE WHEN sum(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) >= 0" +
      s" THEN ${1L << b} ELSE 0 END"
  }.mkString(" + ")

  /** Shared oracle for `decontam_filter` (inline) and `decontam_index`
    * (persisted eval-gram index): same split, heavy-gram cap, and
    * per-source rollup by construction.
    */
  private val decontamSql: String =
      """WITH d AS (
        |  SELECT doc_id, source,
        |   CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |     % 100 < 80 THEN 'train' ELSE 'eval' END split,
        |   CAST(len(l) AS BIGINT) n_tokens,
        |   list_distinct(list_transform(
        |     list_distinct(list_transform(range(1, len(l) - 3),
        |       i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
        |            l[i+3] || ' ' || l[i+4])),
        |     x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)) ids
        |  FROM (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') l
        |        FROM documents) x),
        |ex AS (SELECT doc_id, split, unnest(ids) id FROM d),
        |heavy AS (SELECT id FROM (
        |  SELECT id, count(*) df FROM ex WHERE split = 'train' GROUP BY 1) t
        |  WHERE df > 10000),
        |evidence AS (
        |  SELECT DISTINCT id FROM ex
        |  WHERE split = 'eval' AND id NOT IN (SELECT id FROM heavy)),
        |dropped AS (
        |  SELECT DISTINCT doc_id FROM ex
        |  WHERE split = 'train' AND id IN (SELECT id FROM evidence))
        |SELECT d.source, count(*) AS n_train_docs,
        | CAST(sum(CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_dropped,
        | CAST(sum(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_kept,
        | CAST(sum(CASE WHEN dr.doc_id IS NULL THEN n_tokens ELSE 0 END) AS BIGINT)
        |   AS tokens_kept
        |FROM d LEFT JOIN dropped dr ON d.doc_id = dr.doc_id
        |WHERE d.split = 'train'
        |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared oracle for the decontamination pair: `contamination_check`
    * (batch) and `contamination_check_stream` (the stream-static
    * AvailableNow replay) are row-identical by construction.
    */
  private val contaminationCheckSql: String =
    """WITH d AS (
        |  SELECT doc_id,
        |   CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |     % 100 < 80 THEN 'train' ELSE 'eval' END split,
        |   list_distinct(list_transform(
        |     list_distinct(list_transform(range(1, len(l) - 3),
        |       i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
        |            l[i+3] || ' ' || l[i+4])),
        |     x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)) ids
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') l
        |        FROM documents) x),
        |ex AS (SELECT doc_id, split, unnest(ids) id FROM d),
        |tdf AS (SELECT id, count(*) df FROM ex WHERE split = 'train'
        |        GROUP BY 1),
        |train_ids AS (SELECT id FROM tdf WHERE df <= 10000),
        |contaminated AS (
        |  SELECT DISTINCT doc_id FROM ex
        |  WHERE split = 'eval' AND id IN (SELECT id FROM train_ids))
        |SELECT
        | (SELECT count(*) FROM d WHERE split = 'eval') AS n_eval,
        | (SELECT count(*) FROM tdf WHERE df > 10000) AS n_heavy_grams,
        | (SELECT count(*) FROM contaminated) AS n_contaminated,
        | round(CAST((SELECT count(*) FROM contaminated) AS DOUBLE) /
        |   (SELECT count(*) FROM d WHERE split = 'eval'), 4) AS contamination_rate""".stripMargin

  /** Shared oracle for the PSI drift pair: `drift_psi` (batch) and
    * `drift_psi_stream` (the AvailableNow replay through the streaming
    * monitor) are row-identical by construction, so one relational
    * recomputation checks both.
    */
  private val driftPsiSql: String =
    """WITH base AS (SELECT epoch_us(ts) ts_us, value FROM events),
      |mid AS (
      |  SELECT min(ts_us) + (max(ts_us) - min(ts_us)) // 2 mid FROM base),
      |halves AS (
      |  SELECT CASE WHEN ts_us <= (SELECT mid FROM mid)
      |    THEN 'ref' ELSE 'cur' END half, value FROM base),
      |bounds AS (
      |  SELECT min(value) lo, (max(value) - min(value)) / 10.0 w
      |  FROM halves WHERE half = 'ref'),
      |binned AS (
      |  SELECT half,
      |   CASE WHEN (SELECT w FROM bounds) = 0 THEN 0
      |    ELSE CAST(least(greatest(floor(
      |      (value - (SELECT lo FROM bounds)) / (SELECT w FROM bounds)),
      |      0), 9) AS BIGINT) END bin
      |  FROM halves),
      |counts AS (
      |  SELECT bin, count(*) FILTER (WHERE half = 'ref') n_ref,
      |   count(*) FILTER (WHERE half = 'cur') n_cur
      |  FROM binned GROUP BY bin),
      |filled AS (
      |  SELECT s.bin, CAST(COALESCE(c.n_ref, 0) AS BIGINT) n_ref,
      |   CAST(COALESCE(c.n_cur, 0) AS BIGINT) n_cur
      |  FROM (SELECT unnest(range(10)) bin) s
      |  LEFT JOIN counts c USING (bin)),
      |tot AS (SELECT CAST(sum(n_ref) AS DOUBLE) tr,
      |        CAST(sum(n_cur) AS DOUBLE) tc FROM filled),
      |pq AS (
      |  SELECT bin, n_ref, n_cur,
      |   (CAST(n_ref AS DOUBLE) + 0.5) / (tr + 5.0) p,
      |   (CAST(n_cur AS DOUBLE) + 0.5) / (tc + 5.0) q
      |  FROM filled, tot)
      |SELECT bin, n_ref, n_cur,
      | round(p, 6) AS p_ref, round(q, 6) AS p_cur,
      | round((p - q) * ln(p / q), 6) AS psi_contrib
      |FROM pq ORDER BY bin""".stripMargin

  /** Per-column profile oracle generated from the SAME column list the
    * Spark operator profiles ([[graft.queries.Relational.ProfileColumns]])
    * so the two sides cannot drift.
    */
  private val profileTableSql: String =
    graft.queries.Relational.ProfileColumns.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         | count(*) - count($c) AS n_nulls,
         | count(DISTINCT $c) AS n_distinct,
         | CAST(min($c) AS VARCHAR) AS min_value,
         | CAST(max($c) AS VARCHAR) AS max_value FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  /** Recall@5-vs-nprobe oracle: the shared candidate CTE carries the probe
    * rank (`probe_rn`), and each curve point re-ranks the `probe_rn <= np`
    * slice — generated per point from the same template so the three arms
    * cannot drift from each other or from the Spark operator's
    * filter-and-re-rank shape.
    */
  private val simRecallCurveSql: String = {
    def arm(np: Int): String =
      s"""SELECT CAST($np AS BIGINT) AS nprobe,
         |  CAST(count(*) AS BIGINT) AS exact_pairs,
         |  CAST(count(a.neighbor_id) AS BIGINT) AS hits,
         |  round(CAST(count(a.neighbor_id) AS DOUBLE) / count(*), 4) AS recall
         | FROM exact x LEFT JOIN (
         |   SELECT query_id, neighbor_id FROM (
         |     SELECT query_id, neighbor_id, row_number() OVER
         |       (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
         |     FROM cand WHERE probe_rn <= $np) t
         |   WHERE rank <= 5) a
         |  ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id"""
        .stripMargin
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
      |  FROM embeddings),
      |qids AS (
      |  SELECT vec_id FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
      |scored AS (
      |  SELECT q.vec_id query_id, b.vec_id neighbor_id,
      |   round(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * b.v[i])) /
      |     (sqrt(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * q.v[i]))) *
      |      sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i] * b.v[i])))), 4) sim
      |  FROM e q JOIN qids ON q.vec_id = qids.vec_id
      |  JOIN e b ON b.vec_id <> q.vec_id),
      |exact AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |     row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
      |    FROM scored) t
      |  WHERE rank <= 5),
      |withnorm AS (
      |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
      |norm AS (
      |  SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
      |cents AS (SELECT vec_id cent_id, nv cv FROM norm WHERE vec_id % 100 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
      |sims AS (
      |  SELECT n.vec_id, c.cent_id,
      |   round(list_sum(list_transform(range(1, len(n.nv)+1), i -> n.nv[i] * c.cv[i])), 4) csim
      |  FROM norm n CROSS JOIN cents c),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) rn
      |  FROM sims),
      |buckets AS (SELECT vec_id, cent_id bucket FROM ranked WHERE rn = 1),
      |qprobe AS (
      |  SELECT r.vec_id query_id, cent_id bucket, rn probe_rn FROM ranked r
      |  JOIN qids ON r.vec_id = qids.vec_id WHERE rn <= 3),
      |cand AS (
      |  SELECT q.query_id, q.probe_rn, d.vec_id neighbor_id,
      |   round(list_sum(list_transform(range(1, len(qn.nv)+1), i -> qn.nv[i] * dn.nv[i])), 4) sim
      |  FROM qprobe q
      |  JOIN buckets d ON q.bucket = d.bucket AND d.vec_id <> q.query_id
      |  JOIN norm qn ON qn.vec_id = q.query_id
      |  JOIN norm dn ON dn.vec_id = d.vec_id)
      |SELECT * FROM (
      |""".stripMargin +
      (1 to 3).map(arm).mkString("\nUNION ALL\n") +
      "\n) ORDER BY nprobe"
  }

  /** Contamination-vs-gram-size oracle: the per-n CTE chains are generated
    * from one template (suffix = the gram size), so the three arms are the
    * same capped semi-join at different shingle widths — exactly the Spark
    * operator's shape — and cannot drift from each other.
    */
  private val contaminationGramSweepSql: String = {
    def ctes(n: Int): String = {
      val gram = (0 until n).map(o => s"l[i+$o]").mkString(" || ' ' || ")
      s"""d$n AS (
         |  SELECT doc_id,
         |   CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         |     % 100 < 80 THEN 'train' ELSE 'eval' END split,
         |   list_distinct(list_transform(
         |     list_distinct(list_transform(range(1, len(l) - ${n - 2}),
         |       i -> $gram)),
         |     x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)) ids
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') l
         |        FROM documents) x),
         |ex$n AS (SELECT doc_id, split, unnest(ids) id FROM d$n),
         |tdf$n AS (SELECT id, count(*) df FROM ex$n WHERE split = 'train'
         |          GROUP BY 1),
         |tids$n AS (SELECT id FROM tdf$n WHERE df <= 10000),
         |cont$n AS (
         |  SELECT DISTINCT doc_id FROM ex$n
         |  WHERE split = 'eval' AND id IN (SELECT id FROM tids$n))"""
        .stripMargin
    }
    def arm(n: Int): String =
      s"""SELECT CAST($n AS BIGINT) AS gram_n,
         | (SELECT count(*) FROM d$n WHERE split = 'eval') AS n_eval,
         | (SELECT count(*) FROM tdf$n WHERE df > 10000) AS n_heavy_grams,
         | (SELECT count(*) FROM cont$n) AS n_contaminated,
         | round(CAST((SELECT count(*) FROM cont$n) AS DOUBLE) /
         |   (SELECT count(*) FROM d$n WHERE split = 'eval'), 4)
         |   AS contamination_rate""".stripMargin
    "WITH " + Seq(4, 5, 6).map(ctes).mkString(",\n") + "\n" +
      Seq(4, 5, 6).map(arm).mkString("\nUNION ALL\n") + "\nORDER BY gram_n"
  }

  /** Shared recursive-CTE prefix reproducing TrainingData.dupClusterLabels
    * (MinHash bands -> Jaccard-verified edges -> transitive closure ->
    * min-label per vertex) — the `labels(id, lbl)` relation the three
    * cluster oracles (dup_clusters, dup_cluster_sizes, dedup_keep_best)
    * roll up differently.
    */
  private val dupLabelsCte: String =
    """WITH RECURSIVE s AS (
      |  SELECT doc_id,
      |   list_distinct(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) sh
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') l FROM documents)),
      |u AS (
      |  SELECT doc_id, list_distinct(list_transform(sh, x ->
      |    ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)) ids
      |  FROM s),
      |sig AS (
      |  SELECT doc_id, ids,
      |   list_transform(range(0, 16), i ->
      |     list_aggregate(list_transform(ids, x ->
      |       (x * (2*i+1) + 1000003 * i) % 2147483647), 'min')) sg
      |  FROM u),
      |bands AS (
      |  SELECT doc_id, unnest(list_transform(range(0, 8), b ->
      |    CAST(b AS VARCHAR) || '#' || CAST(sg[2*b+1] AS VARCHAR) || '#' ||
      |    CAST(sg[2*b+2] AS VARCHAR))) band
      |  FROM sig),
      |ok AS (SELECT band FROM bands GROUP BY band HAVING count(*) <= 1000),
      |pb AS (SELECT bands.* FROM bands JOIN ok USING (band)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
      |  FROM pb a JOIN pb b ON a.band = b.band AND a.doc_id < b.doc_id),
      |edges AS (
      |  SELECT doc_a, doc_b
      |  FROM cand JOIN u ua ON cand.doc_a = ua.doc_id
      |            JOIN u ub ON cand.doc_b = ub.doc_id
      |  WHERE round(CAST(len(list_intersect(ua.ids, ub.ids)) AS DOUBLE) /
      |    (len(ua.ids) + len(ub.ids) - len(list_intersect(ua.ids, ub.ids))), 4) >= 0.2),
      |bi AS (
      |  SELECT doc_a sv, doc_b dv FROM edges
      |  UNION ALL SELECT doc_b, doc_a FROM edges),
      |verts AS (SELECT DISTINCT sv v FROM bi),
      |reach(a, b) AS (
      |  SELECT v, v FROM verts
      |  UNION
      |  SELECT reach.a, bi.dv FROM reach JOIN bi ON reach.b = bi.sv),
      |labels AS (SELECT a id, min(b) lbl FROM reach GROUP BY a)""".stripMargin

  /** DuckDB oracle SQL per query (omitted for xxhash64-based and
    * approximate operators -> driver records a rows-only check).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_grain_audit" ->
      """SELECT count(*) AS total_rows,
        | count(DISTINCT o_orderkey) AS distinct_keys,
        | CAST(count(DISTINCT o_orderkey) = count(*) AS BIGINT) AS is_unique
        |FROM orders""".stripMargin,
    "q3_dup_grain_examples" ->
      """SELECT l_orderkey, count(*) AS duplicate_count FROM lineitem
        |GROUP BY 1 HAVING count(*) > 1 ORDER BY 1 LIMIT 5""".stripMargin,
    "q4_validation_split" ->
      """SELECT count(*) AS total,
        | CAST(sum(CASE WHEN event_type NOT IN ('click','view','signup','purchase')
        |               OR value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS errors,
        | round(CAST(sum(CASE WHEN event_type NOT IN ('click','view','signup','purchase')
        |               OR value < 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS error_rate
        |FROM events""".stripMargin,
    "q5_merge_upsert" ->
      """WITH target AS (
        |  SELECT o_orderkey k, o_totalprice p FROM orders WHERE o_orderkey % 3 <> 0),
        |stage AS (
        |  SELECT o_orderkey k,
        |   o_totalprice + CASE WHEN o_orderkey % 4 = 0 THEN 1.0 ELSE 0.0 END p
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |merged AS (
        |  SELECT COALESCE(s.k, t.k) k,
        |   CASE WHEN s.k IS NOT NULL AND (t.k IS NULL OR s.p <> t.p) THEN s.p ELSE t.p END p,
        |   CASE WHEN s.k IS NOT NULL AND t.k IS NOT NULL AND s.p <> t.p THEN 'update'
        |        WHEN s.k IS NOT NULL AND t.k IS NULL THEN 'insert'
        |        ELSE 'keep' END act
        |  FROM stage s FULL OUTER JOIN target t ON s.k = t.k)
        |SELECT count(*) AS final_count,
        | CAST(sum(CASE WHEN act = 'insert' THEN 1 ELSE 0 END) AS BIGINT) AS inserts,
        | CAST(sum(CASE WHEN act = 'update' THEN 1 ELSE 0 END) AS BIGINT) AS updates,
        | round(sum(p), 2) AS total_price
        |FROM merged""".stripMargin,
    "q6_semi_join_counts" ->
      """WITH target AS (
        |  SELECT c_custkey k, c_acctbal b FROM customer WHERE c_custkey % 3 <> 0),
        |stage AS (
        |  SELECT c_custkey k,
        |   c_acctbal + CASE WHEN c_custkey % 10 = 0 THEN 10.0 ELSE 0.0 END b
        |  FROM customer WHERE c_custkey % 2 = 0)
        |SELECT
        | CAST((SELECT count(*) FROM stage) -
        |      (SELECT count(*) FROM stage s JOIN target t ON s.k = t.k) AS BIGINT) AS inserts,
        | CAST((SELECT count(*) FROM stage s JOIN target t ON s.k = t.k AND s.b <> t.b)
        |      AS BIGINT) AS updates""".stripMargin,
    "q7_custom_audit" ->
      """SELECT
        | CAST(sum(CASE WHEN l_extendedprice > 0 THEN 1 ELSE 0 END) = count(*) AS BIGINT)
        |   AS extendedprice_positive,
        | CAST(sum(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END) = count(*) AS BIGINT)
        |   AS quantity_positive,
        | CAST(sum(CASE WHEN l_discount >= 0 AND l_discount <= 1 THEN 1 ELSE 0 END) = count(*)
        |   AS BIGINT) AS discount_in_range
        |FROM lineitem""".stripMargin,
    "q8_dlq_cleanup" ->
      """SELECT event_type, count(*) AS kept FROM events
        |WHERE NOT (event_type = 'error' AND event_id < 5000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q10_region_revenue" ->
      """SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS order_count
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_nation_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_last_event_by_user" ->
      """SELECT event_type, count(*) AS users FROM (
        |  SELECT user_id, event_type,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
        |  FROM events) t
        |WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, epoch_us(ts) tus, user_id, event_type FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |w AS (
        |  SELECT event_id, user_id, event_type, tus,
        |   last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |     OVER win AS click_id,
        |   last_value(CASE WHEN event_type = 'click' THEN tus END IGNORE NULLS)
        |     OVER win AS click_tus
        |  FROM ev
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, click_id, tus - click_tus AS gap_us
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q14_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) tus, event_id FROM events),
        |l AS (
        |  SELECT user_id, tus, event_id,
        |   CASE WHEN lag(tus) OVER win IS NULL
        |         OR tus - lag(tus) OVER win > 1800000000 THEN 1 ELSE 0 END new_s
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (
        |  SELECT user_id, tus,
        |   sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) s_idx
        |  FROM l),
        |sess AS (
        |  SELECT user_id, s_idx, count(*) n_events,
        |   (max(tus) - min(tus)) // 1000000 dur_sec
        |  FROM s GROUP BY 1, 2)
        |SELECT count(*) AS n_sessions,
        | round(avg(n_events), 4) AS avg_events,
        | CAST(max(n_events) AS BIGINT) AS max_events,
        | round(avg(dur_sec), 2) AS avg_dur_sec
        |FROM sess""".stripMargin,
    // the streaming replay must land on the batch sessionization numbers
    "q14_sessionize_stream" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) tus, event_id FROM events),
        |l AS (
        |  SELECT user_id, tus, event_id,
        |   CASE WHEN lag(tus) OVER win IS NULL
        |         OR tus - lag(tus) OVER win > 1800000000 THEN 1 ELSE 0 END new_s
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (
        |  SELECT user_id, tus,
        |   sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) s_idx
        |  FROM l),
        |sess AS (
        |  SELECT user_id, s_idx, count(*) n_events,
        |   (max(tus) - min(tus)) // 1000000 dur_sec
        |  FROM s GROUP BY 1, 2)
        |SELECT count(*) AS n_sessions,
        | round(avg(n_events), 4) AS avg_events,
        | CAST(max(n_events) AS BIGINT) AS max_events,
        | round(avg(dur_sec), 2) AS avg_dur_sec
        |FROM sess""".stripMargin,
    "q15_rollup_revenue" ->
      """SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
        | round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY 1, 2""".stripMargin,
    "q16_percentiles" ->
      """SELECT o_orderstatus, count(*) AS n,
        | round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        | round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        | round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
        | round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        | round(quantile_cont(o_totalprice, 0.99), 2) AS p99
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // error-band oracles (sim_lsh_recall pattern): the sketch values are
    // engine-internal, so the query emits exact columns plus in-band
    // booleans; the oracle recomputes the exact side and pins the booleans
    // to 1 — a sketch regression turns the row red
    "q19_approx_distinct" ->
      """SELECT count(*) AS n_events,
        | count(DISTINCT user_id) AS exact_users,
        | CAST(0.06 AS DOUBLE) AS rel_err_bound,
        | CAST(1 AS BIGINT) AS within_bound
        |FROM events""".stripMargin,
    "q25_approx_quantile" ->
      """SELECT count(*) AS n_orders,
        | round(quantile_cont(o_totalprice, 0.5), 2) AS exact_p50,
        | round(quantile_cont(o_totalprice, 0.99), 2) AS exact_p99,
        | CAST(1 AS BIGINT) AS p50_in_band,
        | CAST(1 AS BIGINT) AS p99_in_band
        |FROM orders""".stripMargin,
    "q17_pivot_dow" ->
      """SELECT event_type,
        | count(CASE WHEN dow = 0 THEN 1 END) AS d0,
        | count(CASE WHEN dow = 1 THEN 1 END) AS d1,
        | count(CASE WHEN dow = 2 THEN 1 END) AS d2,
        | count(CASE WHEN dow = 3 THEN 1 END) AS d3,
        | count(CASE WHEN dow = 4 THEN 1 END) AS d4,
        | count(CASE WHEN dow = 5 THEN 1 END) AS d5,
        | count(CASE WHEN dow = 6 THEN 1 END) AS d6
        |FROM (SELECT event_type, (epoch_ns(ts) // 86400000000000 + 4) % 7 dow
        |      FROM events) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_exact" ->
      """SELECT count(*) AS n_docs,
        | count(DISTINCT md5(text)) AS n_distinct,
        | count(*) - count(DISTINCT md5(text)) AS dup_rows
        |FROM documents""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH s AS (
        |  SELECT doc_id,
        |   list_distinct(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') l FROM documents))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |   (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 4) AS jaccard
        |FROM s a JOIN s b ON a.doc_id + 1 = b.doc_id
        |ORDER BY doc_a""".stripMargin,
    "dedup_minhash_lsh" ->
      """WITH s AS (
        |  SELECT doc_id,
        |   list_distinct(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') l FROM documents)),
        |u AS (
        |  SELECT doc_id, list_distinct(list_transform(sh, x ->
        |    ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)) ids
        |  FROM s),
        |sig AS (
        |  SELECT doc_id, ids,
        |   list_transform(range(0, 16), i ->
        |     list_aggregate(list_transform(ids, x ->
        |       (x * (2*i+1) + 1000003 * i) % 2147483647), 'min')) sg
        |  FROM u),
        |bands AS (
        |  SELECT doc_id, unnest(list_transform(range(0, 8), b ->
        |    CAST(b AS VARCHAR) || '#' || CAST(sg[2*b+1] AS VARCHAR) || '#' ||
        |    CAST(sg[2*b+2] AS VARCHAR))) band
        |  FROM sig),
        |ok AS (SELECT band FROM bands GROUP BY band HAVING count(*) <= 1000),
        |pb AS (SELECT bands.* FROM bands JOIN ok USING (band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
        |  FROM pb a JOIN pb b ON a.band = b.band AND a.doc_id < b.doc_id),
        |verified AS (
        |  SELECT round(CAST(len(list_intersect(sa.ids, sb.ids)) AS DOUBLE) /
        |    (len(sa.ids) + len(sb.ids) - len(list_intersect(sa.ids, sb.ids))), 4) j
        |  FROM cand JOIN u sa ON cand.doc_a = sa.doc_id
        |            JOIN u sb ON cand.doc_b = sb.doc_id)
        |SELECT count(*) AS candidate_pairs,
        | CAST(sum(CASE WHEN j >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS verified_pairs
        |FROM verified""".stripMargin,
    "dedup_index_novel" ->
      """WITH s AS (
        |  SELECT doc_id,
        |   list_distinct(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) sh,
        |   md5(text) h,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |     % 100 < 80 is_corpus
        |  FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') l
        |        FROM documents)),
        |u AS (
        |  SELECT doc_id, h, is_corpus, list_distinct(list_transform(sh, x ->
        |    ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)) ids
        |  FROM s),
        |sig AS (
        |  SELECT doc_id, ids, h, is_corpus,
        |   list_transform(range(0, 16), i ->
        |     list_aggregate(list_transform(ids, x ->
        |       (x * (2*i+1) + 1000003 * i) % 2147483647), 'min')) sg
        |  FROM u),
        |bands AS (
        |  SELECT doc_id, ids, h, is_corpus,
        |   unnest(list_transform(range(0, 8), b ->
        |    CAST(b AS VARCHAR) || '#' || CAST(sg[2*b+1] AS VARCHAR) || '#' ||
        |    CAST(sg[2*b+2] AS VARCHAR))) band
        |  FROM sig),
        |chash AS (SELECT DISTINCT h FROM u WHERE is_corpus),
        |cb AS (SELECT band, ids FROM bands WHERE is_corpus),
        |ok AS (SELECT band FROM cb GROUP BY 1 HAVING count(*) <= 1000),
        |bb AS (
        |  SELECT doc_id, band, ids FROM bands
        |  WHERE NOT is_corpus AND h NOT IN (SELECT h FROM chash)),
        |near AS (
        |  SELECT DISTINCT bb.doc_id
        |  FROM bb JOIN (SELECT cb.* FROM cb JOIN ok USING (band)) c
        |    ON bb.band = c.band
        |  WHERE CAST(len(list_intersect(bb.ids, c.ids)) AS DOUBLE) /
        |    (len(bb.ids) + len(c.ids) - len(list_intersect(bb.ids, c.ids)))
        |    >= 0.2),
        |novel AS (
        |  SELECT DISTINCT doc_id FROM bb
        |  WHERE doc_id NOT IN (SELECT doc_id FROM near))
        |SELECT
        | (SELECT count(*) FROM u WHERE is_corpus) AS n_corpus,
        | (SELECT count(*) FROM u WHERE NOT is_corpus) AS n_batch,
        | (SELECT count(*) FROM novel) AS n_novel,
        | (SELECT count(*) FROM u WHERE NOT is_corpus) -
        |   (SELECT count(*) FROM novel) AS n_dup_dropped""".stripMargin,
    "dedup_minhash_recall" ->
      """WITH s AS (
        |  SELECT doc_id,
        |   list_distinct(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') l FROM documents)),
        |u AS (
        |  SELECT doc_id, list_distinct(list_transform(sh, x ->
        |    ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)) ids
        |  FROM s),
        |sig AS (
        |  SELECT doc_id, ids,
        |   list_transform(range(0, 16), i ->
        |     list_aggregate(list_transform(ids, x ->
        |       (x * (2*i+1) + 1000003 * i) % 2147483647), 'min')) sg
        |  FROM u),
        |bands AS (
        |  SELECT doc_id, unnest(list_transform(range(0, 8), b ->
        |    CAST(b AS VARCHAR) || '#' || CAST(sg[2*b+1] AS VARCHAR) || '#' ||
        |    CAST(sg[2*b+2] AS VARCHAR))) band
        |  FROM sig),
        |ok AS (SELECT band FROM bands GROUP BY band HAVING count(*) <= 1000),
        |pb AS (SELECT bands.* FROM bands JOIN ok USING (band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
        |  FROM pb a JOIN pb b ON a.band = b.band AND a.doc_id < b.doc_id),
        |gex AS (SELECT doc_id, unnest(ids) id FROM u),
        |gok AS (SELECT id FROM gex GROUP BY id HAVING count(*) <= 1000),
        |gpb AS (SELECT gex.* FROM gex JOIN gok USING (id)),
        |tp AS (
        |  SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
        |  FROM gpb a JOIN gpb b ON a.id = b.id AND a.doc_id < b.doc_id),
        |truth AS (
        |  SELECT tp.doc_a, tp.doc_b
        |  FROM tp JOIN u sa ON tp.doc_a = sa.doc_id
        |          JOIN u sb ON tp.doc_b = sb.doc_id
        |  WHERE CAST(len(list_intersect(sa.ids, sb.ids)) AS DOUBLE) /
        |    (len(sa.ids) + len(sb.ids) - len(list_intersect(sa.ids, sb.ids)))
        |    >= 0.2)
        |SELECT CAST(count(*) AS BIGINT) AS true_pairs,
        | CAST(sum(CASE WHEN cand.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS lsh_hits,
        | CASE WHEN count(*) = 0 THEN 1.0 ELSE
        |   round(CAST(sum(CASE WHEN cand.doc_a IS NOT NULL THEN 1 ELSE 0 END)
        |     AS DOUBLE) / count(*), 4) END AS recall
        |FROM truth LEFT JOIN cand
        |  ON truth.doc_a = cand.doc_a AND truth.doc_b = cand.doc_b""".stripMargin,
    "dedup_embedding_cosine_verify" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings)
        |SELECT vec_a, vec_b, sim FROM (
        |  SELECT a.vec_id vec_a, b.vec_id vec_b,
        |   round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i] * b.v[i])) /
        |     (sqrt(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[i] * a.v[i]))) *
        |      sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i] * b.v[i])))), 4) sim
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id) t
        |WHERE sim >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,
    "sim_topk_bruteforce" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |qids AS (
        |  SELECT vec_id FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |scored AS (
        |  SELECT q.vec_id query_id, b.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * b.v[i])) /
        |     (sqrt(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * q.v[i]))) *
        |      sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i] * b.v[i])))), 4) sim
        |  FROM e q JOIN qids ON q.vec_id = qids.vec_id
        |  JOIN e b ON b.vec_id <> q.vec_id)
        |SELECT query_id, rank, neighbor_id, sim FROM (
        |  SELECT query_id, neighbor_id, sim,
        |   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |  FROM scored) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "sim_topk_lsh" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |qids AS (
        |  SELECT vec_id FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |planes AS (
        |  SELECT p, list_transform(range(0, 64), i ->
        |    ('0x' || substr(md5('lshp_' || p || '_' || i), 1, 8))::BIGINT
        |      / 2147483648.0 - 1.0) cl
        |  FROM range(0, 6) t(p)),
        |bkt AS (
        |  SELECT n.vec_id,
        |   CAST(sum(CASE WHEN round(list_sum(list_transform(
        |       range(1, len(n.nv) + 1), i -> n.nv[i] * pl.cl[i])), 4) >= 0
        |     THEN (1 << pl.p) ELSE 0 END) AS BIGINT) bkt
        |  FROM norm n CROSS JOIN planes pl GROUP BY n.vec_id),
        |masks AS (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 3, 5, 9, 17, 33,
        |  6, 10, 18, 34, 12, 20, 36, 24, 40, 48]) m),
        |qprobe AS (
        |  SELECT q.vec_id query_id, xor(b.bkt, m.m) bkt
        |  FROM qids q JOIN bkt b ON b.vec_id = q.vec_id CROSS JOIN masks m),
        |scored AS (
        |  SELECT p.query_id, nb.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, len(qn.nv) + 1),
        |     i -> qn.nv[i] * dn.nv[i])), 4) sim
        |  FROM qprobe p
        |  JOIN bkt nb ON nb.bkt = p.bkt AND nb.vec_id <> p.query_id
        |  JOIN norm qn ON qn.vec_id = p.query_id
        |  JOIN norm dn ON dn.vec_id = nb.vec_id)
        |SELECT query_id, rank, neighbor_id, sim FROM (
        |  SELECT query_id, neighbor_id, sim,
        |   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |  FROM scored) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "sim_lsh_recall" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |qids AS (
        |  SELECT vec_id FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |bscored AS (
        |  SELECT q.vec_id query_id, b.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * b.v[i])) /
        |     (sqrt(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * q.v[i]))) *
        |      sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i] * b.v[i])))), 4) sim
        |  FROM e q JOIN qids ON q.vec_id = qids.vec_id
        |  JOIN e b ON b.vec_id <> q.vec_id),
        |exact AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |     row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |    FROM bscored) t
        |  WHERE rank <= 5),
        |planes AS (
        |  SELECT p, list_transform(range(0, 64), i ->
        |    ('0x' || substr(md5('lshp_' || p || '_' || i), 1, 8))::BIGINT
        |      / 2147483648.0 - 1.0) cl
        |  FROM range(0, 6) t(p)),
        |bkt AS (
        |  SELECT n.vec_id,
        |   CAST(sum(CASE WHEN round(list_sum(list_transform(
        |       range(1, len(n.nv) + 1), i -> n.nv[i] * pl.cl[i])), 4) >= 0
        |     THEN (1 << pl.p) ELSE 0 END) AS BIGINT) bkt
        |  FROM norm n CROSS JOIN planes pl GROUP BY n.vec_id),
        |masks AS (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 3, 5, 9, 17, 33,
        |  6, 10, 18, 34, 12, 20, 36, 24, 40, 48]) m),
        |qprobe AS (
        |  SELECT q.vec_id query_id, xor(b.bkt, m.m) bkt
        |  FROM qids q JOIN bkt b ON b.vec_id = q.vec_id CROSS JOIN masks m),
        |lscored AS (
        |  SELECT p.query_id, nb.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, len(qn.nv) + 1),
        |     i -> qn.nv[i] * dn.nv[i])), 4) sim
        |  FROM qprobe p
        |  JOIN bkt nb ON nb.bkt = p.bkt AND nb.vec_id <> p.query_id
        |  JOIN norm qn ON qn.vec_id = p.query_id
        |  JOIN norm dn ON dn.vec_id = nb.vec_id),
        |approx AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |     row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |    FROM lscored) t
        |  WHERE rank <= 5)
        |SELECT (SELECT count(*) FROM exact) AS exact_pairs,
        | (SELECT count(*) FROM exact JOIN approx USING (query_id, neighbor_id)) AS lsh_hits,
        | round((SELECT count(*) FROM exact JOIN approx USING (query_id, neighbor_id)) * 1.0 /
        |   (SELECT count(*) FROM exact), 4) AS recall""".stripMargin,
    "sim_truncated_recall" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |qids AS (
        |  SELECT vec_id FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |scored AS (
        |  SELECT q.vec_id query_id, b.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * b.v[i])) /
        |     (sqrt(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * q.v[i]))) *
        |      sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i] * b.v[i])))), 4) sim
        |  FROM e q JOIN qids ON q.vec_id = qids.vec_id
        |  JOIN e b ON b.vec_id <> q.vec_id),
        |exact AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |     row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |    FROM scored) t
        |  WHERE rank <= 5),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (
        |  SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |tr AS (SELECT vec_id, nv[1:16] s FROM norm),
        |twn AS (
        |  SELECT vec_id, s, sqrt(list_sum(list_transform(s, y -> y * y))) tn FROM tr),
        |tnorm AS (SELECT vec_id, list_transform(s, x -> x / tn) tv FROM twn),
        |tscored AS (
        |  SELECT q.vec_id query_id, b.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, 17), i -> q.tv[i] * b.tv[i])), 4) sim
        |  FROM tnorm q JOIN qids ON q.vec_id = qids.vec_id
        |  JOIN tnorm b ON b.vec_id <> q.vec_id),
        |tapprox AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |     row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |    FROM tscored) t
        |  WHERE rank <= 5)
        |SELECT CAST(count(*) AS BIGINT) AS exact_pairs,
        |  CAST(count(a.neighbor_id) AS BIGINT) AS trunc_hits,
        |  round(CAST(count(a.neighbor_id) AS DOUBLE) / count(*), 4) AS recall
        |FROM exact x LEFT JOIN tapprox a
        |  ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id""".stripMargin,
    "sim_quantized_recall" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |qids AS (
        |  SELECT vec_id FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |scored AS (
        |  SELECT q.vec_id query_id, b.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * b.v[i])) /
        |     (sqrt(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * q.v[i]))) *
        |      sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i] * b.v[i])))), 4) sim
        |  FROM e q JOIN qids ON q.vec_id = qids.vec_id
        |  JOIN e b ON b.vec_id <> q.vec_id),
        |exact AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |     row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |    FROM scored) t
        |  WHERE rank <= 5),
        |comps AS (SELECT vec_id, i AS pos, v[CAST(i AS INT)] AS x
        |          FROM e, range(1, 65) t(i)),
        |bydim AS (SELECT pos, min(x) lo, max(x) hi FROM comps GROUP BY 1),
        |dqc AS (
        |  SELECT vec_id, c.pos,
        |   CASE WHEN hi > lo
        |     THEN lo + round((x - lo) / (hi - lo) * 255, 0) * (hi - lo) / 255
        |     ELSE lo END AS dqx
        |  FROM comps c JOIN bydim USING (pos)),
        |dv AS (SELECT vec_id, list(dqx ORDER BY pos) AS d FROM dqc GROUP BY 1),
        |twn AS (
        |  SELECT vec_id, d, sqrt(list_sum(list_transform(d, y -> y * y))) tn FROM dv),
        |tnorm AS (SELECT vec_id, list_transform(d, x -> x / tn) tv FROM twn),
        |tscored AS (
        |  SELECT q.vec_id query_id, b.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, 65), i -> q.tv[i] * b.tv[i])), 4) sim
        |  FROM tnorm q JOIN qids ON q.vec_id = qids.vec_id
        |  JOIN tnorm b ON b.vec_id <> q.vec_id),
        |tapprox AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |     row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |    FROM tscored) t
        |  WHERE rank <= 5)
        |SELECT CAST(count(*) AS BIGINT) AS exact_pairs,
        |  CAST(count(a.neighbor_id) AS BIGINT) AS int8_hits,
        |  round(CAST(count(a.neighbor_id) AS DOUBLE) / count(*), 4) AS recall
        |FROM exact x LEFT JOIN tapprox a
        |  ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id""".stripMargin,
    "sim_ivf_recall" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |qids AS (
        |  SELECT vec_id FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |scored AS (
        |  SELECT q.vec_id query_id, b.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * b.v[i])) /
        |     (sqrt(list_sum(list_transform(range(1, len(q.v)+1), i -> q.v[i] * q.v[i]))) *
        |      sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[i] * b.v[i])))), 4) sim
        |  FROM e q JOIN qids ON q.vec_id = qids.vec_id
        |  JOIN e b ON b.vec_id <> q.vec_id),
        |exact AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |     row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |    FROM scored) t
        |  WHERE rank <= 5),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (
        |  SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |cents AS (SELECT vec_id cent_id, nv cv FROM norm WHERE vec_id % 100 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
        |sims AS (
        |  SELECT n.vec_id, c.cent_id,
        |   round(list_sum(list_transform(range(1, len(n.nv)+1), i -> n.nv[i] * c.cv[i])), 4) csim
        |  FROM norm n CROSS JOIN cents c),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) rn
        |  FROM sims),
        |buckets AS (SELECT vec_id, cent_id bucket FROM ranked WHERE rn = 1),
        |qprobe AS (
        |  SELECT r.vec_id query_id, cent_id bucket FROM ranked r
        |  JOIN qids ON r.vec_id = qids.vec_id WHERE rn <= 2),
        |iscored AS (
        |  SELECT q.query_id, d.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, len(qn.nv)+1), i -> qn.nv[i] * dn.nv[i])), 4) sim
        |  FROM qprobe q
        |  JOIN buckets d ON q.bucket = d.bucket AND d.vec_id <> q.query_id
        |  JOIN norm qn ON qn.vec_id = q.query_id
        |  JOIN norm dn ON dn.vec_id = d.vec_id),
        |iapprox AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |     row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |    FROM iscored) t
        |  WHERE rank <= 5)
        |SELECT CAST(count(*) AS BIGINT) AS exact_pairs,
        |  CAST(count(a.neighbor_id) AS BIGINT) AS ivf_hits,
        |  round(CAST(count(a.neighbor_id) AS DOUBLE) / count(*), 4) AS recall
        |FROM exact x LEFT JOIN iapprox a
        |  ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id""".stripMargin,
    "dedup_embedding_banded" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |cents AS (SELECT vec_id cent_id, nv cv FROM norm WHERE vec_id % 50 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
        |sims AS (
        |  SELECT n.vec_id, c.cent_id,
        |   round(list_sum(list_transform(range(1, len(n.nv)+1), i -> n.nv[i] * c.cv[i])), 4) csim
        |  FROM norm n CROSS JOIN cents c),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) rn
        |  FROM sims),
        |assign2 AS (SELECT vec_id, cent_id band FROM ranked WHERE rn <= 2),
        |kept AS (SELECT band FROM assign2 GROUP BY band HAVING count(*) <= 1000),
        |banded AS (SELECT a.vec_id, a.band FROM assign2 a JOIN kept USING (band)),
        |pairs AS (
        |  SELECT DISTINCT a.vec_id doc_a, b.vec_id doc_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT doc_a, doc_b,
        |   round(list_sum(list_transform(range(1, len(x.nv)+1), i -> x.nv[i] * y.nv[i])), 4) cos
        |  FROM pairs
        |  JOIN norm x ON x.vec_id = doc_a
        |  JOIN norm y ON y.vec_id = doc_b),
        |dropped AS (SELECT DISTINCT doc_b FROM scored WHERE cos >= 0.4)
        |SELECT (SELECT count(*) FROM e) AS n_vecs,
        | (SELECT count(*) FROM cents) AS n_centroids,
        | (SELECT count(*) FROM scored) AS candidate_pairs,
        | (SELECT count(*) FROM scored WHERE cos >= 0.4) AS dup_pairs,
        | (SELECT count(*) FROM dropped) AS n_dropped,
        | (SELECT count(*) FROM e) - (SELECT count(*) FROM dropped) AS n_kept""".stripMargin,
    "dedup_banded_recall" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |cents AS (SELECT vec_id cent_id, nv cv FROM norm WHERE vec_id % 50 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
        |sims AS (
        |  SELECT n.vec_id, c.cent_id,
        |   round(list_sum(list_transform(range(1, len(n.nv)+1), i -> n.nv[i] * c.cv[i])), 4) csim
        |  FROM norm n CROSS JOIN cents c),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) rn
        |  FROM sims),
        |assign2 AS (SELECT vec_id, cent_id band FROM ranked WHERE rn <= 2),
        |kept AS (SELECT band FROM assign2 GROUP BY band HAVING count(*) <= 1000),
        |banded AS (SELECT a.vec_id, a.band FROM assign2 a JOIN kept USING (band)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id doc_a, b.vec_id doc_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.vec_id < b.vec_id),
        |bpairs AS (
        |  SELECT doc_a, doc_b FROM cand
        |  JOIN norm x ON x.vec_id = doc_a
        |  JOIN norm y ON y.vec_id = doc_b
        |  WHERE round(list_sum(list_transform(range(1, len(x.nv)+1), i -> x.nv[i] * y.nv[i])), 4) >= 0.4),
        |exact AS (
        |  SELECT x.vec_id doc_a, y.vec_id doc_b
        |  FROM norm x JOIN norm y ON x.vec_id < y.vec_id
        |  WHERE round(list_sum(list_transform(range(1, len(x.nv)+1), i -> x.nv[i] * y.nv[i])), 4) >= 0.4)
        |SELECT (SELECT count(*) FROM exact) AS exact_pairs,
        | (SELECT count(*) FROM exact JOIN bpairs USING (doc_a, doc_b)) AS banded_hits,
        | round((SELECT count(*) FROM exact JOIN bpairs USING (doc_a, doc_b)) * 1.0 /
        |   (SELECT count(*) FROM exact), 4) AS recall""".stripMargin,
    "sim_topk_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (
        |  SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |cents AS (SELECT vec_id cent_id, nv cv FROM norm WHERE vec_id % 100 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
        |qids AS (
        |  SELECT vec_id FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |sims AS (
        |  SELECT n.vec_id, c.cent_id,
        |   round(list_sum(list_transform(range(1, len(n.nv)+1), i -> n.nv[i] * c.cv[i])), 4) csim
        |  FROM norm n CROSS JOIN cents c),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) rn
        |  FROM sims),
        |buckets AS (SELECT vec_id, cent_id bucket FROM ranked WHERE rn = 1),
        |qprobe AS (
        |  SELECT r.vec_id query_id, cent_id bucket FROM ranked r
        |  JOIN qids ON r.vec_id = qids.vec_id WHERE rn <= 2),
        |scored AS (
        |  SELECT q.query_id, d.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, len(qn.nv)+1), i -> qn.nv[i] * dn.nv[i])), 4) sim
        |  FROM qprobe q
        |  JOIN buckets d ON q.bucket = d.bucket AND d.vec_id <> q.query_id
        |  JOIN norm qn ON qn.vec_id = q.query_id
        |  JOIN norm dn ON dn.vec_id = d.vec_id)
        |SELECT query_id, rank, neighbor_id, sim FROM (
        |  SELECT query_id, neighbor_id, sim,
        |   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |  FROM scored) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "sim_topk_ivf_index" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (
        |  SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |cents AS (SELECT vec_id cent_id, nv cv FROM norm WHERE vec_id % 100 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
        |qids AS (
        |  SELECT vec_id FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |sims AS (
        |  SELECT n.vec_id, c.cent_id,
        |   round(list_sum(list_transform(range(1, len(n.nv)+1), i -> n.nv[i] * c.cv[i])), 4) csim
        |  FROM norm n CROSS JOIN cents c),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) rn
        |  FROM sims),
        |buckets AS (SELECT vec_id, cent_id bucket FROM ranked WHERE rn = 1),
        |qprobe AS (
        |  SELECT r.vec_id query_id, cent_id bucket FROM ranked r
        |  JOIN qids ON r.vec_id = qids.vec_id WHERE rn <= 2),
        |scored AS (
        |  SELECT q.query_id, d.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, len(qn.nv)+1), i -> qn.nv[i] * dn.nv[i])), 4) sim
        |  FROM qprobe q
        |  JOIN buckets d ON q.bucket = d.bucket AND d.vec_id <> q.query_id
        |  JOIN norm qn ON qn.vec_id = q.query_id
        |  JOIN norm dn ON dn.vec_id = d.vec_id)
        |SELECT query_id, rank, neighbor_id, sim FROM (
        |  SELECT query_id, neighbor_id, sim,
        |   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |  FROM scored) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "text_quality" ->
      """SELECT source, count(*) AS n_docs,
        | round(avg(length(text)), 2) AS avg_len,
        | round(avg(CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a' OR x = 'of'
        |   OR x = 'and' OR x = 'to' OR x = 'in' OR x = 'is' OR x = 'it')) AS DOUBLE)
        |   / len(toks)), 4) AS avg_stop_ratio,
        | round(avg(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
        |   AS DOUBLE) / length(text)), 4) AS avg_punct_ratio
        |FROM (SELECT source, text, regexp_split_to_array(trim(text), '\s+') toks
        |      FROM documents) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_pii" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS emails,
        | CAST(sum(len(regexp_extract_all(text, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))) AS BIGINT) AS phones,
        | CAST(sum(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) AS BIGINT) AS ipv4s,
        | CAST(sum(CASE WHEN len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |   + len(regexp_extract_all(text, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))
        |   + len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) > 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "select_token_budget" ->
      """WITH scored AS (
        |  SELECT source, doc_id, len(toks) AS ntok,
        |   round(CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a' OR x = 'of'
        |     OR x = 'and' OR x = 'to' OR x = 'in' OR x = 'is' OR x = 'it')) AS DOUBLE)
        |     / len(toks), 6) AS score
        |  FROM (SELECT source, doc_id, regexp_split_to_array(trim(text), '\s+') toks
        |        FROM documents) t),
        |cum AS (
        |  SELECT *, sum(ntok) OVER (PARTITION BY source ORDER BY score DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) c
        |  FROM scored)
        |SELECT source, count(*) AS n_selected,
        | CAST(sum(ntok) AS BIGINT) AS tokens_selected,
        | min(score) AS score_cutoff
        |FROM cum WHERE c <= 2000 GROUP BY 1 ORDER BY 1""".stripMargin,
    // the histogram scale path admits the IDENTICAL set, so its oracle is
    // select_token_budget's verbatim — the equivalence IS the check
    "select_token_budget_hist" ->
      """WITH scored AS (
        |  SELECT source, doc_id, len(toks) AS ntok,
        |   round(CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a' OR x = 'of'
        |     OR x = 'and' OR x = 'to' OR x = 'in' OR x = 'is' OR x = 'it')) AS DOUBLE)
        |     / len(toks), 6) AS score
        |  FROM (SELECT source, doc_id, regexp_split_to_array(trim(text), '\s+') toks
        |        FROM documents) t),
        |cum AS (
        |  SELECT *, sum(ntok) OVER (PARTITION BY source ORDER BY score DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) c
        |  FROM scored)
        |SELECT source, count(*) AS n_selected,
        | CAST(sum(ntok) AS BIGINT) AS tokens_selected,
        | min(score) AS score_cutoff
        |FROM cum WHERE c <= 2000 GROUP BY 1 ORDER BY 1""".stripMargin,
    "quality_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |counts AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
        |total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(log10(c / n)), 4) AS avg_logprob
        |FROM toks JOIN counts USING (token) CROSS JOIN total
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "importance_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |   unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |dt AS (SELECT doc_id, source, token, count(*) AS k
        |       FROM toks GROUP BY 1, 2, 3),
        |corpus AS (SELECT token, sum(k) AS c_all FROM dt GROUP BY 1),
        |tgt AS (SELECT token, sum(k) AS c_t FROM dt
        |        WHERE source = 'src0' GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_all) AS DOUBLE) AS n_all,
        |               CAST(count(*) AS DOUBLE) AS vocab FROM corpus),
        |tt AS (SELECT CAST(sum(c_t) AS DOUBLE) AS n_t FROM tgt),
        |docw AS (
        |  SELECT source, doc_id,
        |   sum(k * log10(((coalesce(c_t, 0) + 1) / (n_t + vocab)) /
        |                 (c_all / n_all))) / sum(k) AS doc_w
        |  FROM dt JOIN corpus USING (token) LEFT JOIN tgt USING (token)
        |  CROSS JOIN tot CROSS JOIN tt GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs,
        | round(avg(doc_w), 4) AS avg_importance
        |FROM docw GROUP BY 1 ORDER BY 1""".stripMargin,
    "quality_ccnet_bucket" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |   unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |dt AS (SELECT doc_id, lang, token, count(*) AS k
        |       FROM toks GROUP BY 1, 2, 3),
        |counts AS (SELECT token, sum(k) AS c FROM dt GROUP BY 1),
        |total AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM counts),
        |perdoc AS (
        |  SELECT doc_id, lang, sum(k * log10(c / n)) / sum(k) AS lp
        |  FROM dt JOIN counts USING (token) CROSS JOIN total GROUP BY 1, 2),
        |b AS (SELECT lang, lp, ntile(3) OVER
        |        (PARTITION BY lang ORDER BY lp DESC, doc_id) AS tercile
        |      FROM perdoc)
        |SELECT lang, tercile,
        | CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |              ELSE 'tail' END AS bucket,
        | count(*) AS n_docs, round(avg(lp), 4) AS avg_logprob
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "emb_dim_stats" ->
      """WITH e AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |comp AS (
        |  SELECT unnest(range(0, len(v))) AS pos, unnest(v) AS x FROM e)
        |SELECT pos, count(*) AS n, round(avg(x), 6) AS mean,
        | round(avg(x * x) - avg(x) * avg(x), 6) AS variance
        |FROM comp GROUP BY pos
        |ORDER BY variance DESC, pos LIMIT 8""".stripMargin,
    "bm25_topk" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks
        |  FROM documents),
        |l AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) len FROM t),
        |s AS (SELECT CAST(count(*) AS DOUBLE) n, avg(len) avgdl FROM l),
        |w AS (SELECT doc_id, unnest(toks) w FROM t),
        |tf AS (
        |  SELECT doc_id, w, CAST(count(*) AS DOUBLE) tf FROM w
        |  WHERE w IN ('spark', 'merge', 'vector') GROUP BY 1, 2),
        |df AS (SELECT w, CAST(count(*) AS DOUBLE) df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT tf.doc_id,
        |   ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * (tf.tf * 2.2) /
        |   (tf.tf + 1.2 * (0.25 + 0.75 * l.len / s.avgdl)) AS sco
        |  FROM tf JOIN df USING (w) JOIN l USING (doc_id) CROSS JOIN s)
        |SELECT doc_id, count(*) AS n_matched, round(sum(sco), 4) AS score
        |FROM sc GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "text_entropy" ->
      """WITH cnt AS (
        |  SELECT doc_id, lang, w, CAST(count(*) AS DOUBLE) c FROM (
        |    SELECT doc_id, lang,
        |     unnest(regexp_split_to_array(trim(text), '\s+')) w
        |    FROM documents) t
        |  GROUP BY 1, 2, 3),
        |perdoc AS (
        |  SELECT lang, log2(sum(c)) - sum(c * log2(c)) / sum(c) AS h
        |  FROM cnt GROUP BY doc_id, lang)
        |SELECT lang, count(*) AS n_docs,
        | round(avg(h), 4) AS avg_entropy,
        | round(min(h), 4) AS min_entropy,
        | round(max(h), 4) AS max_entropy,
        | count(*) FILTER (h < 5.0) AS n_low_entropy
        |FROM perdoc GROUP BY 1 ORDER BY 1""".stripMargin,
    "quality_gopher" ->
      """WITH t AS (
        |  SELECT source, regexp_split_to_array(trim(text), '\s+') toks
        |  FROM documents),
        |m AS (
        |  SELECT source,
        |   CAST(len(toks) AS DOUBLE) n,
        |   CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
        |     / len(toks) mean_len,
        |   CAST(list_contains(toks, 'the') AS INT)
        |     + CAST(list_contains(toks, 'a') AS INT)
        |     + CAST(list_contains(toks, 'of') AS INT)
        |     + CAST(list_contains(toks, 'and') AS INT)
        |     + CAST(list_contains(toks, 'to') AS INT) n_stop,
        |   CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))
        |     AS DOUBLE) / len(toks) alpha_frac
        |  FROM t),
        |r AS (
        |  SELECT source,
        |   (n >= 20 AND n <= 90) r_len,
        |   (mean_len >= 3.0 AND mean_len <= 10.0) r_word_len,
        |   (n_stop >= 2) r_stopwords,
        |   (alpha_frac >= 0.8) r_alpha
        |  FROM m)
        |SELECT source, count(*) AS n_docs,
        | count(*) FILTER (NOT r_len) AS n_fail_len,
        | count(*) FILTER (NOT r_word_len) AS n_fail_word_len,
        | count(*) FILTER (NOT r_stopwords) AS n_fail_stopwords,
        | count(*) FILTER (NOT r_alpha) AS n_fail_alpha,
        | round(CAST(count(*) FILTER (r_len AND r_word_len AND r_stopwords
        |   AND r_alpha) AS DOUBLE) / count(*), 4) AS pass_rate
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "seq_len_buckets" ->
      """WITH t AS (
        |  SELECT CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |    AS BIGINT) n
        |  FROM documents),
        |b AS (SELECT length(bin(n)) - 1 AS bucket, n FROM t)
        |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
        | CAST(sum(n) AS BIGINT) AS total_tokens,
        | CAST((1 << (bucket + 1)) * count(*) AS BIGINT) AS padded_tokens,
        | round(CAST(sum(n) AS DOUBLE) / ((1 << (bucket + 1)) * count(*)), 4)
        |   AS fill_ratio
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "length_outliers" ->
      """WITH l AS (
        |  SELECT lang, CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |    AS DOUBLE) n
        |  FROM documents),
        |s AS (
        |  SELECT lang, round(quantile_cont(n, 0.05), 2) p5,
        |   round(quantile_cont(n, 0.95), 2) p95
        |  FROM l GROUP BY 1)
        |SELECT lang, count(*) AS n_docs,
        | any_value(p5) AS p5_tokens, any_value(p95) AS p95_tokens,
        | count(*) FILTER (n < p5) AS n_below,
        | count(*) FILTER (n > p95) AS n_above
        |FROM l JOIN s USING (lang) GROUP BY lang ORDER BY lang""".stripMargin,
    "dedup_by_source" ->
      """WITH d AS (
        |  SELECT source, md5(text) he,
        |   md5(array_to_string(
        |     (regexp_split_to_array(trim(text), '\s+'))[1:16], ' ')) hp
        |  FROM documents),
        |ec AS (SELECT he, count(*) ce FROM d GROUP BY 1),
        |pc AS (SELECT hp, count(*) cp FROM d GROUP BY 1)
        |SELECT source, count(*) AS n_docs,
        | count(*) FILTER (ce > 1) AS n_exact_dup,
        | count(*) FILTER (cp > 1) AS n_prefix_dup,
        | round(CAST(count(*) FILTER (cp > 1) AS DOUBLE) / count(*), 4)
        |   AS prefix_dup_rate
        |FROM d JOIN ec USING (he) JOIN pc USING (hp)
        |GROUP BY source ORDER BY source""".stripMargin,
    "dedup_prefix" ->
      """WITH g AS (
        |  SELECT md5(array_to_string(
        |    (regexp_split_to_array(trim(text), '\s+'))[1:16], ' ')) fp,
        |   count(*) cnt
        |  FROM documents GROUP BY 1)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_docs,
        | count(*) FILTER (cnt > 1) AS n_dup_prefix_groups,
        | CAST(coalesce(sum(cnt) FILTER (cnt > 1), 0) AS BIGINT)
        |   AS n_docs_in_groups,
        | CAST(coalesce(sum(cnt - 1) FILTER (cnt > 1), 0) AS BIGINT)
        |   AS n_redundant,
        | max(cnt) AS max_group_size
        |FROM g""".stripMargin,
    "emb_outliers" ->
      """WITH e AS (
        |  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |wn AS (
        |  SELECT label, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm
        |  FROM e),
        |n AS (SELECT label, list_transform(v, x -> x / nrm) nv FROM wn),
        |d AS (SELECT label, unnest(nv) x, unnest(range(0, len(nv))) pos FROM n),
        |c AS (SELECT label, pos, avg(x) cx FROM d GROUP BY 1, 2),
        |cl AS (SELECT label, list(cx ORDER BY pos) cv FROM c GROUP BY 1),
        |cn AS (
        |  SELECT label, list_transform(cv,
        |    x -> x / sqrt(list_sum(list_transform(cv, y -> y * y)))) cnv
        |  FROM cl),
        |sims AS (
        |  SELECT n.label,
        |   round(list_sum(list_transform(range(1, len(nv) + 1),
        |     i -> nv[i] * cnv[i])), 4) sim
        |  FROM n JOIN cn ON n.label = cn.label),
        |h AS (SELECT label, sim, count(*) cnt FROM sims GROUP BY 1, 2),
        |st AS (
        |  SELECT label, sum(cnt) n_vecs,
        |   sum(sim * cnt) / sum(cnt) mu,
        |   sqrt(sum(sim * sim * cnt) / sum(cnt) -
        |     (sum(sim * cnt) / sum(cnt)) * (sum(sim * cnt) / sum(cnt))) sd
        |  FROM h GROUP BY 1)
        |SELECT CAST(h.label AS BIGINT) AS label,
        | CAST(st.n_vecs AS BIGINT) AS n_vecs,
        | round(st.mu, 4) AS avg_cos, round(st.sd, 4) AS std_cos,
        | CAST(coalesce(sum(h.cnt) FILTER (h.sim < st.mu - 2.0 * st.sd), 0)
        |   AS BIGINT) AS n_outliers
        |FROM h JOIN st ON h.label = st.label
        |GROUP BY h.label, st.n_vecs, st.mu, st.sd ORDER BY 1""".stripMargin,
    "source_kl_divergence" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |st AS (SELECT source, token, count(*) AS c FROM toks GROUP BY 1, 2),
        |s AS (SELECT source, sum(c) AS ns FROM st GROUP BY 1),
        |ct AS (SELECT token, sum(c) AS c_all FROM st GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM st)
        |SELECT source, CAST(ns AS BIGINT) AS n_tokens,
        |  round(sum((c / ns) * log10((c / ns) / (c_all / n))), 4) AS kl_to_corpus
        |FROM st JOIN s USING (source) JOIN ct USING (token) CROSS JOIN tot
        |GROUP BY source, ns ORDER BY source""".stripMargin,
    "text_zipf_slope" ->
      """WITH counts AS (
        |  SELECT token, count(*) AS c
        |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |        FROM documents) t
        |  GROUP BY 1),
        |ranked AS (
        |  SELECT c, row_number() OVER (ORDER BY c DESC, token) AS rank
        |  FROM counts)
        |SELECT CAST(count(*) AS BIGINT) AS n_vocab,
        |  round(regr_slope(log10(c), log10(rank)), 4) AS zipf_slope,
        |  round(regr_r2(log10(c), log10(rank)), 4) AS zipf_r2
        |FROM ranked""".stripMargin,
    "text_langid" ->
      """SELECT predicted, count(*) AS n,
        | CAST(sum(CASE WHEN predicted = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |FROM (
        |  SELECT lang,
        |   CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |    WHEN len(list_intersect(list_distinct(toks),
        |      ['der','die','und','nicht','das'])) > 0 THEN 'de'
        |    WHEN len(list_intersect(list_distinct(toks),
        |      ['el','los','las','una','pero'])) > 0 THEN 'es'
        |    WHEN len(list_intersect(list_distinct(toks),
        |      ['le','les','une','est','dans'])) > 0 THEN 'fr'
        |    ELSE 'en' END predicted
        |  FROM (SELECT lang, text, regexp_split_to_array(trim(text), '\s+') toks
        |        FROM documents) x) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_tokens" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
        | round(avg(len(toks)), 2) AS avg_tokens,
        | CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))
        |   AS BIGINT) AS total_subwords
        |FROM (SELECT lang, text, regexp_split_to_array(trim(text), '\s+') toks
        |      FROM documents) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | CASE WHEN len(sh) > 0
        |  THEN list_aggregate(list_transform(sh, s -> md5(s)), 'min')
        |  ELSE md5(trim(text)) END AS fingerprint
        |FROM (
        |  SELECT doc_id, text,
        |   list_distinct(list_transform(range(1, len(l) - 1),
        |     i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) sh
        |  FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') l
        |        FROM documents) x) t
        |ORDER BY doc_id""".stripMargin,
    "multimodal_features" ->
      """SELECT media_type, count(*) AS n_records,
        | CAST(sum(bl) AS BIGINT) AS total_bytes,
        | CAST(sum((bl + 63) // 64) AS BIGINT) AS total_frames
        |FROM (
        |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio'
        |              ELSE 'video' END media_type,
        |   octet_length(encode(text)) bl
        |  FROM documents) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "curate_corpus" ->
      """WITH q AS (
        |  SELECT doc_id, text, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) n_tokens
        |  FROM documents
        |  WHERE len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 30 AND 200),
        |ek AS (
        |  SELECT doc_id, text, n_tokens FROM (
        |    SELECT doc_id, text, n_tokens,
        |     row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
        |    FROM q) x WHERE rn = 1),
        |u AS (
        |  SELECT doc_id, n_tokens, list_distinct(list_transform(
        |    list_distinct(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])),
        |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)) ids
        |  FROM (SELECT doc_id, n_tokens, regexp_split_to_array(trim(text), '\s+') l
        |        FROM ek) y),
        |sig AS (
        |  SELECT doc_id, ids, n_tokens,
        |   list_transform(range(0, 16), i ->
        |     list_aggregate(list_transform(ids, x ->
        |       (x * (2*i+1) + 1000003 * i) % 2147483647), 'min')) sg
        |  FROM u),
        |bands AS (
        |  SELECT doc_id, unnest(list_transform(range(0, 8), b ->
        |    CAST(b AS VARCHAR) || '#' || CAST(sg[2*b+1] AS VARCHAR) || '#' ||
        |    CAST(sg[2*b+2] AS VARCHAR))) band
        |  FROM sig),
        |ok AS (SELECT band FROM bands GROUP BY band HAVING count(*) <= 1000),
        |pb AS (SELECT bands.* FROM bands JOIN ok USING (band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
        |  FROM pb a JOIN pb b ON a.band = b.band AND a.doc_id < b.doc_id),
        |losers AS (
        |  SELECT DISTINCT cand.doc_b doc_id
        |  FROM cand JOIN u ua ON cand.doc_a = ua.doc_id
        |            JOIN u ub ON cand.doc_b = ub.doc_id
        |  WHERE round(CAST(len(list_intersect(ua.ids, ub.ids)) AS DOUBLE) /
        |    (len(ua.ids) + len(ub.ids) - len(list_intersect(ua.ids, ub.ids))), 4) >= 0.2),
        |kept AS (
        |  SELECT * FROM sig WHERE doc_id NOT IN (SELECT doc_id FROM losers))
        |SELECT count(*) AS kept_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | round(avg(n_tokens), 2) AS avg_tokens
        |FROM kept""".stripMargin,
    "split_leakage" ->
      """WITH d AS (
        |  SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |              ELSE 'test' END split, h
        |  FROM (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |          % 100 b, md5(text) h
        |        FROM documents) x),
        |p AS (
        |  SELECT h,
        |   max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) in_train,
        |   max(CASE WHEN split = 'val' THEN 1 ELSE 0 END) in_val,
        |   max(CASE WHEN split = 'test' THEN 1 ELSE 0 END) in_test,
        |   count(*) n_docs
        |  FROM d GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_distinct_texts,
        | CAST(sum(CASE WHEN in_train + in_val + in_test >= 2
        |   THEN 1 ELSE 0 END) AS BIGINT) AS leaked_texts,
        | CAST(sum(CASE WHEN in_train = 1 AND in_val = 1
        |   THEN 1 ELSE 0 END) AS BIGINT) AS train_val,
        | CAST(sum(CASE WHEN in_train = 1 AND in_test = 1
        |   THEN 1 ELSE 0 END) AS BIGINT) AS train_test,
        | CAST(sum(CASE WHEN in_val = 1 AND in_test = 1
        |   THEN 1 ELSE 0 END) AS BIGINT) AS val_test,
        | CAST(sum(CASE WHEN in_train + in_val + in_test >= 2
        |   THEN n_docs ELSE 0 END) AS BIGINT) AS docs_in_leaked_texts
        |FROM p""".stripMargin,
    "decontam_filter" -> decontamSql,
    "decontam_index" -> decontamSql,
    "split_train_val" ->
      """SELECT split, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | round(avg(n_tokens), 2) AS avg_tokens
        |FROM (
        |  SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |              ELSE 'test' END split,
        |   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) n_tokens
        |  FROM (SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |          % 100 b, text
        |        FROM documents) x) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sample_stratified" ->
      """SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        | round(CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4)
        |   AS sample_rate
        |FROM (
        |  SELECT source,
        |   ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |     % 10 = 7 s
        |  FROM documents) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_top_tokens" ->
      """SELECT t AS token, count(*) AS exact_count
        |FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) t
        |      FROM documents) x
        |GROUP BY 1 ORDER BY exact_count DESC, token LIMIT 10""".stripMargin,
    // CMS heavy hitters, error-band graded: rank/token/exact recomputed
    // relationally; the CMS never-undercount and eps*N-overestimate
    // theorems arrive as booleans pinned to 1
    "text_heavy_hitters" ->
      """SELECT
        |  CAST(row_number() OVER (ORDER BY exact_count DESC, token)
        |    AS BIGINT) AS "rank",
        |  token, exact_count,
        |  CAST(1 AS BIGINT) AS overest_nonneg,
        |  CAST(1 AS BIGINT) AS overest_in_band
        |FROM (SELECT t AS token, count(*) AS exact_count
        |      FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) t
        |            FROM documents) x
        |      GROUP BY 1 ORDER BY exact_count DESC, token LIMIT 10) y""".stripMargin,
    "text_ngrams" ->
      """SELECT ngram, count(*) AS df FROM (
        |  SELECT unnest(list_distinct(list_transform(range(1, len(l)),
        |    i -> l[i] || ' ' || l[i+1]))) ngram
        |  FROM (SELECT regexp_split_to_array(trim(text), '\s+') l
        |        FROM documents) x) t
        |GROUP BY 1 ORDER BY df DESC, ngram LIMIT 20""".stripMargin,
    "dedup_simhash_md5" ->
      s"""WITH tok AS (
        |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT h
        |  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) t
        |        FROM documents) x),
        |fp AS (
        |  SELECT doc_id, CAST($simhashVoteSql AS BIGINT) fp
        |  FROM tok GROUP BY doc_id),
        |p AS (
        |  SELECT CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) d
        |  FROM fp a JOIN fp b ON a.doc_id + 1 = b.doc_id)
        |SELECT count(*) AS pairs,
        | CAST(sum(CASE WHEN d <= 8 THEN 1 ELSE 0 END) AS BIGINT) AS within_8,
        | CAST(sum(CASE WHEN d <= 16 THEN 1 ELSE 0 END) AS BIGINT) AS within_16,
        | CAST(min(d) AS BIGINT) AS min_hamming
        |FROM p""".stripMargin,
    "dedup_simhash_verify" ->
      s"""WITH tok AS (
        |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT h
        |  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) t
        |        FROM documents) x),
        |fp AS (
        |  SELECT doc_id, CAST($simhashVoteSql AS BIGINT) fp
        |  FROM tok GROUP BY doc_id),
        |p AS (
        |  SELECT CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) d
        |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
        |SELECT count(*) AS pairs,
        | count(CASE WHEN d <= 8 THEN 1 END) AS within_8,
        | count(CASE WHEN d <= 16 THEN 1 END) AS within_16,
        | CAST(min(d) AS BIGINT) AS min_hamming
        |FROM p""".stripMargin,
    "dedup_simhash" ->
      s"""WITH tok AS (
        |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT h
        |  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) t
        |        FROM documents) x),
        |fp AS (
        |  SELECT doc_id, CAST($simhashVoteSql AS BIGINT) fp
        |  FROM tok GROUP BY doc_id),
        |banded AS (
        |  SELECT doc_id, fp,
        |   unnest(list_transform(range(0, 4),
        |     b -> b * 32768 + ((fp >> (b * 15)) & 32767))) band
        |  FROM fp),
        |ok AS (SELECT band FROM banded GROUP BY band HAVING count(*) <= 1000),
        |pb AS (SELECT banded.* FROM banded JOIN ok USING (band)),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b,
        |   CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) d
        |  FROM pb a JOIN pb b ON a.band = b.band AND a.doc_id < b.doc_id)
        |SELECT count(*) AS candidate_pairs,
        | count(CASE WHEN d <= 15 THEN 1 END) AS near_pairs,
        | CAST(min(d) AS BIGINT) AS min_hamming
        |FROM pairs""".stripMargin,
    "corpus_card" ->
      """WITH d AS (
        |  SELECT source, lang, n_chars, md5(text) h,
        |   len(regexp_split_to_array(trim(text), '\s+')) n_tokens
        |  FROM documents),
        |main AS (
        |  SELECT source, count(*) n_docs, count(DISTINCT h) n_distinct,
        |   CAST(sum(n_chars) AS BIGINT) chars_total,
        |   CAST(sum(n_tokens) AS BIGINT) tokens_total,
        |   round(quantile_cont(n_tokens, 0.5), 1) tokens_p50,
        |   round(quantile_cont(n_tokens, 0.9), 1) tokens_p90
        |  FROM d GROUP BY source),
        |lc AS (SELECT source, lang, count(*) lc FROM d GROUP BY source, lang),
        |top AS (
        |  SELECT source, lang top_lang, lc FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY source ORDER BY lc DESC, lang) rn FROM lc) t
        |  WHERE rn = 1)
        |SELECT m.source, m.n_docs, m.n_distinct,
        | round(CAST(m.n_docs - m.n_distinct AS DOUBLE) / m.n_docs, 4) AS dup_rate,
        | m.chars_total, m.tokens_total, m.tokens_p50, m.tokens_p90,
        | t.top_lang,
        | round(CAST(t.lc AS DOUBLE) / m.n_docs, 4) AS top_lang_share
        |FROM main m JOIN top t USING (source)
        |ORDER BY source""".stripMargin,
    "source_dup_matrix" ->
      s"""WITH tok AS (
        |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT h
        |  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) t
        |        FROM documents WHERE text IS NOT NULL) x),
        |fp AS (
        |  SELECT doc_id, CAST($simhashVoteSql AS BIGINT) fp
        |  FROM tok GROUP BY doc_id),
        |src AS (SELECT doc_id, source FROM documents WHERE text IS NOT NULL),
        |banded AS (
        |  SELECT f.doc_id, f.fp, s.source,
        |   unnest(list_transform(range(0, 4),
        |     b -> b * 32768 + ((fp >> (b * 15)) & 32767))) band
        |  FROM fp f JOIN src s USING (doc_id)),
        |ok AS (SELECT band FROM banded GROUP BY band HAVING count(*) <= 1000),
        |pb AS (SELECT banded.* FROM banded JOIN ok USING (band)),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b,
        |   CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) d,
        |   least(a.source, b.source) src_a,
        |   greatest(a.source, b.source) src_b
        |  FROM pb a JOIN pb b ON a.band = b.band AND a.doc_id < b.doc_id)
        |SELECT src_a AS source_a, src_b AS source_b,
        | count(*) AS candidate_pairs,
        | count(CASE WHEN d <= 15 THEN 1 END) AS near_pairs,
        | CAST(min(d) AS BIGINT) AS min_hamming
        |FROM pairs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "drift_psi" -> driftPsiSql,
    "drift_psi_stream" -> driftPsiSql,
    "q28_event_funnel" ->
      """WITH b AS (SELECT user_id, event_type, epoch_us(ts) tus FROM events),
        |v AS (SELECT user_id, min(tus) t_view FROM b
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT b.user_id, min(tus) t_click FROM b JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND tus > t_view GROUP BY 1),
        |p AS (SELECT b.user_id, min(tus) t_purchase FROM b JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND tus > t_click GROUP BY 1)
        |SELECT (SELECT count(DISTINCT user_id) FROM b) AS n_users,
        | (SELECT count(*) FROM v) AS n_view,
        | (SELECT count(*) FROM c) AS n_view_click,
        | (SELECT count(*) FROM p) AS n_full_funnel,
        | round(CAST((SELECT count(*) FROM p) AS DOUBLE) /
        |   (SELECT count(*) FROM v), 4) AS funnel_rate""".stripMargin,
    "q29_cohort_retention" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 wk
        |  FROM events),
        |cohort AS (SELECT user_id, min(wk) cw FROM wk GROUP BY 1),
        |sizes AS (SELECT cw, count(*) cohort_users FROM cohort GROUP BY 1),
        |ret AS (
        |  SELECT c.cw, w.wk - c.cw week_offset, count(DISTINCT w.user_id) n_active
        |  FROM wk w JOIN cohort c USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT r.cw AS cohort_week, r.week_offset, r.n_active, s.cohort_users,
        | round(CAST(r.n_active AS DOUBLE) / s.cohort_users, 4) AS retention
        |FROM ret r JOIN sizes s USING (cw)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "profile_table" -> profileTableSql,
    "q30_event_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |   lag(event_type) OVER (
        |     PARTITION BY user_id ORDER BY epoch_us(ts), event_id) prev
        |  FROM events),
        |c AS (SELECT prev from_type, event_type to_type, count(*) n
        |      FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
        |f AS (SELECT from_type, sum(n) n_from FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        | round(CAST(c.n AS DOUBLE) / f.n_from, 4) AS p
        |FROM c JOIN f USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    "q31_ref_integrity" ->
      """SELECT
        | (SELECT count(*) FROM lineitem) AS n_lineitem,
        | (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |   AS orphan_lineitems,
        | (SELECT count(*) FROM orders) AS n_orders,
        | (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |   AS orphan_orders,
        | (SELECT count(*) FROM customer) AS n_customers,
        | (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |   (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
        |   AS childless_customers""".stripMargin,
    "q32_anomalous_hours" ->
      """WITH h AS (
        |  SELECT epoch_us(ts) // 3600000000 hour_bucket, count(*) n_events
        |  FROM events GROUP BY 1),
        |s AS (SELECT count(*) nh, sum(n_events) s1,
        |      sum(n_events * n_events) s2 FROM h),
        |z AS (
        |  SELECT hour_bucket, n_events,
        |   round((n_events - CAST(s1 AS DOUBLE) / nh) /
        |     sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nh)
        |       / (nh - 1)), 4) z
        |  FROM h, s)
        |SELECT hour_bucket, n_events, z, abs(z) >= 2.0 AS is_anomaly
        |FROM z ORDER BY abs(z) DESC, hour_bucket LIMIT 5""".stripMargin,
    "vocab_growth" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') l
        |  FROM documents WHERE text IS NOT NULL),
        |fo AS (
        |  SELECT t w, min(doc_id) first_doc
        |  FROM (SELECT doc_id, unnest(l) t FROM d) x GROUP BY 1),
        |n AS (SELECT count(*) n FROM d),
        |spine AS (
        |  SELECT i decile, (i * (SELECT n FROM n)) // 10 max_id
        |  FROM (SELECT unnest(range(1, 11)) i) t),
        |va AS (
        |  SELECT decile, max_id,
        |   count(CASE WHEN first_doc < max_id THEN 1 END) vocab_size
        |  FROM fo CROSS JOIN spine GROUP BY 1, 2),
        |ta AS (
        |  SELECT decile,
        |   sum(CASE WHEN doc_id < max_id THEN len(l) END) cum_tokens
        |  FROM d CROSS JOIN spine GROUP BY 1)
        |SELECT va.decile, va.max_id AS docs_seen,
        | CAST(COALESCE(ta.cum_tokens, 0) AS BIGINT) AS cum_tokens,
        | va.vocab_size
        |FROM va JOIN ta USING (decile) ORDER BY decile""".stripMargin,
    "dedup_fuzzy" ->
      s"""WITH tok AS (
        |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT h
        |  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) t
        |        FROM documents WHERE text IS NOT NULL) x),
        |fp AS (
        |  SELECT doc_id, CAST($simhashVoteSql AS BIGINT) fp
        |  FROM tok GROUP BY doc_id),
        |pre AS (SELECT doc_id, substr(text, 1, 200) pre
        |        FROM documents WHERE text IS NOT NULL),
        |banded AS (
        |  SELECT doc_id, fp,
        |   unnest(list_transform(range(0, 4),
        |     b -> b * 32768 + ((fp >> (b * 15)) & 32767))) band
        |  FROM fp),
        |ok AS (SELECT band FROM banded GROUP BY band HAVING count(*) <= 1000),
        |pb AS (SELECT banded.* FROM banded JOIN ok USING (band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
        |  FROM pb a JOIN pb b ON a.band = b.band AND a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.fp, b.fp)) <= 8),
        |lev AS (
        |  SELECT doc_a, doc_b,
        |   CAST(levenshtein(x.pre, y.pre) AS BIGINT) dist,
        |   greatest(length(x.pre), length(y.pre)) ml
        |  FROM cand
        |  JOIN pre x ON x.doc_id = doc_a
        |  JOIN pre y ON y.doc_id = doc_b)
        |SELECT doc_a, doc_b, dist,
        | CASE WHEN ml = 0 THEN 1.0
        |  ELSE round(1.0 - CAST(dist AS DOUBLE) / ml, 4) END sim_ratio
        |FROM lev WHERE dist <= 60
        |ORDER BY dist, doc_a, doc_b LIMIT 10""".stripMargin,
    "contamination_embedding" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |cents AS (SELECT vec_id cent_id, nv cv FROM norm WHERE vec_id % 50 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
        |sims AS (
        |  SELECT n.vec_id, c.cent_id,
        |   round(list_sum(list_transform(range(1, len(n.nv)+1), i -> n.nv[i] * c.cv[i])), 4) csim
        |  FROM norm n CROSS JOIN cents c),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) rn
        |  FROM sims),
        |assign2 AS (SELECT vec_id, cent_id band FROM ranked WHERE rn <= 2),
        |tb AS (SELECT vec_id train_id, band FROM assign2 WHERE vec_id % 10 <> 7),
        |kept AS (SELECT band FROM tb GROUP BY band HAVING count(*) <= 1000),
        |tcap AS (SELECT tb.* FROM tb JOIN kept USING (band)),
        |qb AS (SELECT vec_id eval_id, band FROM assign2 WHERE vec_id % 10 = 7),
        |scored AS (
        |  SELECT q.eval_id, t.train_id,
        |   round(list_sum(list_transform(range(1, len(x.nv)+1), i -> x.nv[i] * y.nv[i])), 4) cos
        |  FROM qb q JOIN tcap t USING (band)
        |  JOIN norm x ON x.vec_id = q.eval_id
        |  JOIN norm y ON y.vec_id = t.train_id),
        |cand AS (SELECT DISTINCT eval_id, train_id FROM scored)
        |SELECT
        | (SELECT count(*) FROM norm WHERE vec_id % 10 = 7) AS n_eval,
        | (SELECT count(*) FROM norm WHERE vec_id % 10 <> 7) AS n_train,
        | (SELECT count(*) FROM cand) AS candidate_pairs,
        | (SELECT count(DISTINCT eval_id) FROM scored WHERE cos >= 0.4)
        |   AS n_contaminated,
        | round(CAST((SELECT count(DISTINCT eval_id) FROM scored WHERE cos >= 0.4)
        |   AS DOUBLE) / (SELECT count(*) FROM norm WHERE vec_id % 10 = 7), 4)
        |   AS contamination_rate""".stripMargin,
    "sim_topk_diversified" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (
        |  SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |cents AS (SELECT vec_id cent_id, nv cv FROM norm WHERE vec_id % 100 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
        |qids AS (
        |  SELECT vec_id FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |sims AS (
        |  SELECT n.vec_id, c.cent_id,
        |   round(list_sum(list_transform(range(1, len(n.nv)+1), i -> n.nv[i] * c.cv[i])), 4) csim
        |  FROM norm n CROSS JOIN cents c),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) rn
        |  FROM sims),
        |buckets AS (SELECT vec_id, cent_id bucket FROM ranked WHERE rn = 1),
        |qprobe AS (
        |  SELECT r.vec_id query_id, cent_id bucket FROM ranked r
        |  JOIN qids ON r.vec_id = qids.vec_id WHERE rn <= 2),
        |scored AS (
        |  SELECT q.query_id, d.vec_id neighbor_id, q.bucket,
        |   round(list_sum(list_transform(range(1, len(qn.nv)+1), i -> qn.nv[i] * dn.nv[i])), 4) sim
        |  FROM qprobe q
        |  JOIN buckets d ON q.bucket = d.bucket AND d.vec_id <> q.query_id
        |  JOIN norm qn ON qn.vec_id = q.query_id
        |  JOIN norm dn ON dn.vec_id = d.vec_id),
        |dsel AS (
        |  SELECT query_id, neighbor_id, bucket, sim FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id, bucket ORDER BY sim DESC, neighbor_id) cr
        |    FROM scored) t WHERE cr = 1)
        |SELECT query_id, rank, neighbor_id, cluster_id, sim FROM (
        |  SELECT query_id, neighbor_id, bucket cluster_id, sim,
        |   row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) rank
        |  FROM dsel) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "quality_nb_classifier" ->
      """WITH d AS (
        |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') l
        |  FROM documents WHERE text IS NOT NULL),
        |lab AS (
        |  SELECT doc_id, source, l,
        |   (len(l) >= 20 AND len(l) <= 90
        |    AND CAST(list_sum(list_transform(l, w -> length(w))) AS DOUBLE) / len(l) >= 3.0
        |    AND CAST(list_sum(list_transform(l, w -> length(w))) AS DOUBLE) / len(l) <= 10.0
        |    AND (CASE WHEN list_contains(l, 'the') THEN 1 ELSE 0 END +
        |         CASE WHEN list_contains(l, 'a') THEN 1 ELSE 0 END +
        |         CASE WHEN list_contains(l, 'of') THEN 1 ELSE 0 END +
        |         CASE WHEN list_contains(l, 'and') THEN 1 ELSE 0 END +
        |         CASE WHEN list_contains(l, 'to') THEN 1 ELSE 0 END) >= 2
        |    AND CAST(len(list_filter(l, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
        |      / len(l) >= 0.8) lbl
        |  FROM d),
        |dt AS (
        |  SELECT doc_id, source, lbl, t token, count(*) k
        |  FROM (SELECT doc_id, source, lbl, unnest(l) t FROM lab) x
        |  GROUP BY 1, 2, 3, 4),
        |ct AS (
        |  SELECT token,
        |   sum(CASE WHEN lbl THEN k ELSE 0 END) c_pass,
        |   sum(CASE WHEN NOT lbl THEN k ELSE 0 END) c_fail
        |  FROM dt GROUP BY token),
        |tot AS (SELECT CAST(sum(c_pass) AS DOUBLE) np,
        |        CAST(sum(c_fail) AS DOUBLE) nf,
        |        CAST(count(*) AS DOUBLE) v FROM ct),
        |pri AS (SELECT CAST(count(*) FILTER (WHERE lbl) AS DOUBLE) npd,
        |        CAST(count(*) FILTER (WHERE NOT lbl) AS DOUBLE) nfd FROM lab),
        |llr AS (
        |  SELECT token,
        |   ln((CAST(c_pass AS DOUBLE) + 1.0) / (np + v)) -
        |   ln((CAST(c_fail AS DOUBLE) + 1.0) / (nf + v)) llr
        |  FROM ct, tot),
        |sc AS (
        |  SELECT doc_id, source, lbl,
        |   sum(CAST(k AS DOUBLE) * llr) + (SELECT ln(npd / nfd) FROM pri) score
        |  FROM dt JOIN llr USING (token)
        |  GROUP BY 1, 2, 3)
        |SELECT source, count(*) AS n_docs,
        | count(CASE WHEN lbl AND score > 0 THEN 1 END) AS n_tp,
        | count(CASE WHEN NOT lbl AND score > 0 THEN 1 END) AS n_fp,
        | count(CASE WHEN lbl AND NOT score > 0 THEN 1 END) AS n_fn,
        | count(CASE WHEN NOT lbl AND NOT score > 0 THEN 1 END) AS n_tn,
        | round(CAST(count(CASE WHEN lbl AND score > 0 THEN 1 END) +
        |   count(CASE WHEN NOT lbl AND NOT score > 0 THEN 1 END) AS DOUBLE) /
        |   count(*), 4) AS accuracy
        |FROM sc GROUP BY source ORDER BY source""".stripMargin,
    "quality_nb_topfeatures" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') l
        |  FROM documents WHERE text IS NOT NULL),
        |lab AS (
        |  SELECT doc_id, l,
        |   (len(l) >= 20 AND len(l) <= 90
        |    AND CAST(list_sum(list_transform(l, w -> length(w))) AS DOUBLE) / len(l) >= 3.0
        |    AND CAST(list_sum(list_transform(l, w -> length(w))) AS DOUBLE) / len(l) <= 10.0
        |    AND (CASE WHEN list_contains(l, 'the') THEN 1 ELSE 0 END +
        |         CASE WHEN list_contains(l, 'a') THEN 1 ELSE 0 END +
        |         CASE WHEN list_contains(l, 'of') THEN 1 ELSE 0 END +
        |         CASE WHEN list_contains(l, 'and') THEN 1 ELSE 0 END +
        |         CASE WHEN list_contains(l, 'to') THEN 1 ELSE 0 END) >= 2
        |    AND CAST(len(list_filter(l, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
        |      / len(l) >= 0.8) lbl
        |  FROM d),
        |dt AS (
        |  SELECT doc_id, lbl, t token, count(*) k
        |  FROM (SELECT doc_id, lbl, unnest(l) t FROM lab) x
        |  GROUP BY 1, 2, 3),
        |ct AS (
        |  SELECT token,
        |   sum(CASE WHEN lbl THEN k ELSE 0 END) c_pass,
        |   sum(CASE WHEN NOT lbl THEN k ELSE 0 END) c_fail
        |  FROM dt GROUP BY token),
        |tot AS (SELECT CAST(sum(c_pass) AS DOUBLE) np,
        |        CAST(sum(c_fail) AS DOUBLE) nf,
        |        CAST(count(*) AS DOUBLE) v FROM ct)
        |SELECT token, CAST(c_pass AS BIGINT) AS c_pass,
        | CAST(c_fail AS BIGINT) AS c_fail,
        | round(ln((CAST(c_pass AS DOUBLE) + 1.0) / (np + v)) -
        |   ln((CAST(c_fail AS DOUBLE) + 1.0) / (nf + v)), 4) AS llr
        |FROM ct, tot
        |ORDER BY abs(ln((CAST(c_pass AS DOUBLE) + 1.0) / (np + v)) -
        |  ln((CAST(c_fail AS DOUBLE) + 1.0) / (nf + v))) DESC, token
        |LIMIT 20""".stripMargin,
    "multimodal_join_profile" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |cents AS (SELECT vec_id cent_id, nv cv FROM norm WHERE vec_id % 100 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
        |sims AS (
        |  SELECT n.vec_id, c.cent_id,
        |   round(list_sum(list_transform(range(1, len(n.nv)+1), i -> n.nv[i] * c.cv[i])), 4) csim
        |  FROM norm n CROSS JOIN cents c),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) rn
        |  FROM sims),
        |buckets AS (SELECT vec_id, cent_id bucket FROM ranked WHERE rn = 1),
        |j AS (
        |  SELECT b.bucket, d.lang, d.n_chars
        |  FROM buckets b JOIN documents d ON d.doc_id = b.vec_id),
        |main AS (
        |  SELECT bucket, count(*) n_items,
        |   round(avg(CAST(n_chars AS DOUBLE)), 2) avg_chars,
        |   count(DISTINCT lang) n_langs
        |  FROM j GROUP BY 1),
        |lc AS (SELECT bucket, lang, count(*) lc FROM j GROUP BY 1, 2),
        |top AS (
        |  SELECT bucket, lang top_lang, lc FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY bucket ORDER BY lc DESC, lang) rn2 FROM lc) t
        |  WHERE rn2 = 1)
        |SELECT m.bucket, m.n_items, m.avg_chars, m.n_langs, t.top_lang,
        | round(CAST(t.lc AS DOUBLE) / m.n_items, 4) AS top_lang_share
        |FROM main m JOIN top t USING (bucket) ORDER BY bucket""".stripMargin,
    "quality_bigram_logprob" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') l
        |  FROM documents WHERE text IS NOT NULL),
        |d2 AS (SELECT doc_id, l FROM d WHERE len(l) >= 2),
        |db AS (
        |  SELECT doc_id, w1, w2, count(*) k FROM (
        |    SELECT doc_id, l[i] w1, l[i + 1] w2
        |    FROM (SELECT doc_id, l, unnest(range(1, len(l))) i FROM d2) x) y
        |  GROUP BY 1, 2, 3),
        |cb AS (SELECT w1, w2, sum(k) cb FROM db GROUP BY 1, 2),
        |cu AS (SELECT w1, sum(cb) cu FROM cb GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS DOUBLE) v FROM cu)
        |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
        | round(sum(CAST(k AS DOUBLE) * log10((CAST(cb AS DOUBLE) + 0.5) /
        |   (CAST(cu AS DOUBLE) + 0.5 * v))) / CAST(sum(k) AS DOUBLE), 4)
        |   AS avg_logprob
        |FROM db JOIN cb USING (w1, w2) JOIN cu USING (w1), v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "bpe_pair_stats" ->
      """WITH wc AS (
        |  SELECT t w, count(*) k FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) t
        |    FROM documents WHERE text IS NOT NULL) x
        |  GROUP BY t),
        |p AS (
        |  SELECT unnest(list_transform(range(1, length(w)),
        |    i -> substr(w, i, 2))) pair, k
        |  FROM wc WHERE length(w) >= 2)
        |SELECT pair, CAST(sum(k) AS BIGINT) AS freq
        |FROM p GROUP BY pair
        |ORDER BY freq DESC, pair LIMIT 20""".stripMargin,
    "contamination_check" -> contaminationCheckSql,
    "contamination_check_stream" -> contaminationCheckSql,
    "contamination_topdocs" ->
      """WITH d AS (
        |  SELECT doc_id,
        |   CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |     % 100 < 80 THEN 'train' ELSE 'eval' END split,
        |   list_distinct(list_transform(
        |     list_distinct(list_transform(range(1, len(l) - 3),
        |       i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
        |            l[i+3] || ' ' || l[i+4])),
        |     x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)) ids
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') l
        |        FROM documents) x),
        |ex AS (SELECT doc_id, split, unnest(ids) id FROM d),
        |train_ids AS (SELECT id FROM (
        |  SELECT id, count(*) df FROM ex WHERE split = 'train' GROUP BY 1)
        |  WHERE df <= 10000),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_grams,
        |   count(*) FILTER (id IN (SELECT id FROM train_ids)) AS n_hit
        |  FROM ex WHERE split = 'eval' GROUP BY 1)
        |SELECT doc_id, n_grams, n_hit,
        | round(CAST(n_hit AS DOUBLE) / n_grams, 4) AS overlap_frac
        |FROM hits ORDER BY overlap_frac DESC, doc_id LIMIT 10""".stripMargin,
    "tfidf_top_terms" ->
      """WITH toks AS (
        |  SELECT lang, doc_id,
        |   unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT lang, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |ranked AS (
        |  SELECT lang, term,
        |   round(CAST(tf AS DOUBLE) * (SELECT n_docs FROM n) / df, 4) AS score,
        |   row_number() OVER (
        |     PARTITION BY lang
        |     ORDER BY round(CAST(tf AS DOUBLE) * (SELECT n_docs FROM n) / df, 4)
        |              DESC, term) AS rank
        |  FROM tf JOIN df USING (term))
        |SELECT lang, rank, term, score FROM ranked
        |WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,
    "quality_gate_dynamic" ->
      """WITH t AS (
        |  SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    AS n_tokens
        |  FROM documents),
        |b AS (SELECT quantile_cont(n_tokens, 0.1) AS p10,
        |             quantile_cont(n_tokens, 0.9) AS p90 FROM t)
        |SELECT count(*) AS n_kept,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | round(avg(n_tokens), 4) AS avg_tokens
        |FROM t, b WHERE n_tokens >= p10 AND n_tokens <= p90""".stripMargin,
    "quality_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') l
        |  FROM documents),
        |base AS (SELECT doc_id, lang, CAST(len(l) AS BIGINT) n_tokens FROM t),
        |tok AS (SELECT doc_id, unnest(l) w FROM t),
        |tc AS (SELECT doc_id, w, count(*) c FROM tok GROUP BY 1, 2),
        |tt AS (SELECT doc_id, max(c) top_token, count(*) n_distinct
        |       FROM tc GROUP BY 1),
        |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |         i -> l[i] || ' ' || l[i+1])) g
        |       FROM t WHERE len(l) >= 2),
        |bc AS (SELECT doc_id, g, count(*) c FROM bi GROUP BY 1, 2),
        |tb AS (SELECT doc_id, max(c) top_bigram FROM bc GROUP BY 1),
        |pd AS (SELECT lang,
        |  CAST(n_distinct AS DOUBLE) / n_tokens ttr,
        |  CAST(top_token AS DOUBLE) / n_tokens topf,
        |  CAST(COALESCE(top_bigram, 0) AS DOUBLE) /
        |    GREATEST(n_tokens - 1, 1) topbf
        | FROM base JOIN tt USING (doc_id) LEFT JOIN tb USING (doc_id))
        |SELECT lang, count(*) AS n_docs,
        | round(avg(ttr), 4) AS avg_ttr,
        | round(avg(topf), 4) AS avg_top_token_frac,
        | round(avg(topbf), 4) AS avg_top_bigram_frac,
        | CAST(sum(CASE WHEN ttr < 0.35 OR topf > 0.14 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_flagged
        |FROM pd GROUP BY 1 ORDER BY 1""".stripMargin,
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) n,
        |   doc_id % 8 AS shard
        |  FROM documents),
        |c AS (SELECT shard, doc_id, n,
        |       sum(n) OVER (PARTITION BY shard ORDER BY doc_id) cum FROM t)
        |SELECT shard, count(*) AS n_docs,
        | CAST(sum(n) AS BIGINT) AS total_tokens,
        | CAST(floor((max(cum) + 255) / 256) AS BIGINT) AS n_sequences,
        | CAST(sum(CASE WHEN floor((cum - n) / 256) <> floor((cum - 1) / 256)
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs,
        | round(CAST(sum(n) AS DOUBLE) /
        |   (CAST(floor((max(cum) + 255) / 256) AS BIGINT) * 256), 4)
        |   AS fill_ratio
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "vocab_coverage" ->
      """WITH tok AS (
        |  SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) w
        |  FROM documents),
        |v AS (SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) rk
        |      FROM tok GROUP BY w),
        |vocab AS (SELECT w FROM v WHERE rk <= 16)
        |SELECT lang, count(*) AS n_tokens,
        | round(1.0 - CAST(sum(CASE WHEN vocab.w IS NOT NULL THEN 1 ELSE 0 END)
        |   AS DOUBLE) / count(*), 4) AS oov_rate
        |FROM tok LEFT JOIN vocab ON tok.w = vocab.w
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_containment" ->
      """WITH s AS (
        |  SELECT doc_id,
        |   list_distinct(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) sh
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') l FROM documents)),
        |u AS (
        |  SELECT doc_id, list_distinct(list_transform(sh, x ->
        |    ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)) ids
        |  FROM s),
        |sig AS (
        |  SELECT doc_id, ids,
        |   list_transform(range(0, 16), i ->
        |     list_aggregate(list_transform(ids, x ->
        |       (x * (2*i+1) + 1000003 * i) % 2147483647), 'min')) sg
        |  FROM u),
        |bands AS (
        |  SELECT doc_id, unnest(list_transform(range(0, 8), b ->
        |    CAST(b AS VARCHAR) || '#' || CAST(sg[2*b+1] AS VARCHAR) || '#' ||
        |    CAST(sg[2*b+2] AS VARCHAR))) band
        |  FROM sig),
        |ok AS (SELECT band FROM bands GROUP BY band HAVING count(*) <= 1000),
        |pb AS (SELECT bands.* FROM bands JOIN ok USING (band)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b
        |  FROM pb a JOIN pb b ON a.band = b.band AND a.doc_id < b.doc_id),
        |ct AS (
        |  SELECT round(CAST(len(list_intersect(sa.ids, sb.ids)) AS DOUBLE) /
        |    CAST(LEAST(len(sa.ids), len(sb.ids)) AS DOUBLE), 4) containment
        |  FROM cand JOIN u sa ON cand.doc_a = sa.doc_id
        |            JOIN u sb ON cand.doc_b = sb.doc_id)
        |SELECT count(*) AS n_pairs,
        | round(avg(containment), 4) AS avg_containment,
        | round(max(containment), 4) AS max_containment
        |FROM ct WHERE containment >= 0.5""".stripMargin,
    "select_best_per_lang" ->
      """WITH s AS (
        |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') l
        |  FROM documents),
        |sc AS (SELECT doc_id, lang,
        |        round(CAST(len(list_distinct(l)) AS DOUBLE) / len(l), 4) score
        |       FROM s),
        |r AS (SELECT lang, doc_id, score,
        |       row_number() OVER (PARTITION BY lang
        |         ORDER BY score DESC, doc_id) rank FROM sc)
        |SELECT lang, rank, doc_id, score FROM r
        |WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,
    "emb_quantize" ->
      """WITH comp AS (
        |  SELECT unnest(range(len(embedding))) pos,
        |         unnest(embedding)::DOUBLE x
        |  FROM embeddings),
        |d AS (SELECT pos, min(x) lo, max(x) hi FROM comp GROUP BY 1),
        |e AS (SELECT x,
        |       CASE WHEN (hi - lo) > 0
        |         THEN lo + round((x - lo) / (hi - lo) * 255, 0) * (hi - lo) / 255
        |         ELSE lo END dq
        |      FROM comp JOIN d USING (pos))
        |SELECT count(*) AS n_components,
        | round(avg((x - dq) * (x - dq)) * 1e6, 4) AS mse_x1e6,
        | round(max(abs(x - dq)) * 1e3, 4) AS max_abs_err_x1e3
        |FROM e""".stripMargin,
    "emb_kmeans" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |n2 AS (SELECT vec_id, v,
        |        list_sum(list_transform(v, y -> y * y)) vv FROM e),
        |c0 AS (SELECT vec_id cent_id, v cv, vv cvv FROM n2 WHERE vec_id % 50 = 1),
        |d1 AS (
        |  SELECT a.vec_id, c.cent_id,
        |   round(a.vv + c.cvv - 2 * list_sum(list_transform(
        |     range(1, len(a.v) + 1), i -> a.v[i] * c.cv[i])), 4) dist2
        |  FROM n2 a CROSS JOIN c0 c),
        |a1 AS (SELECT vec_id, cent_id FROM (
        |        SELECT *, row_number() OVER (PARTITION BY vec_id
        |          ORDER BY dist2, cent_id) rn FROM d1) WHERE rn = 1),
        |comp AS (SELECT vec_id, unnest(range(len(v))) pos, unnest(v) x FROM e),
        |upd AS (SELECT a1.cent_id, comp.pos, round(avg(comp.x), 6) c
        |        FROM comp JOIN a1 USING (vec_id) GROUP BY 1, 2),
        |c1 AS (SELECT cent_id, list(c ORDER BY pos) cv FROM upd GROUP BY 1),
        |c1n AS (SELECT cent_id, cv,
        |         list_sum(list_transform(cv, y -> y * y)) cvv FROM c1),
        |d2 AS (
        |  SELECT a.vec_id, c.cent_id,
        |   round(a.vv + c.cvv - 2 * list_sum(list_transform(
        |     range(1, len(a.v) + 1), i -> a.v[i] * c.cv[i])), 4) dist2
        |  FROM n2 a CROSS JOIN c1n c),
        |a2 AS (SELECT vec_id, cent_id, dist2 FROM (
        |        SELECT *, row_number() OVER (PARTITION BY vec_id
        |          ORDER BY dist2, cent_id) rn FROM d2) WHERE rn = 1)
        |SELECT cent_id AS cluster, count(*) AS n_vecs,
        | round(sum(dist2), 2) AS inertia
        |FROM a2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "sample_fixed_n" ->
      """WITH h AS (
        |  SELECT lang, doc_id,
        |   ('0x' || substr(md5('fixed:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT hv
        |  FROM documents),
        |r AS (SELECT lang, doc_id,
        |       row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) rk
        |      FROM h)
        |SELECT lang, count(*) AS n_sampled,
        | min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
        | CAST(sum(doc_id) AS BIGINT) AS sum_doc_ids
        |FROM r WHERE rk <= 10 GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_incremental" ->
      """WITH d AS (
        |  SELECT doc_id, source, md5(text) h,
        |   list_distinct(list_transform(
        |     list_distinct(list_transform(range(1, len(l) - 3),
        |       i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
        |            l[i+3] || ' ' || l[i+4])),
        |     x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)) ids
        |  FROM (SELECT doc_id, source, text,
        |         regexp_split_to_array(trim(text), '\s+') l FROM documents) t),
        |ex AS (SELECT * FROM d WHERE source = 'src0'),
        |b AS (SELECT * FROM d WHERE source <> 'src0'),
        |ext AS (SELECT doc_id FROM b WHERE h IN (SELECT h FROM ex)),
        |exids AS (SELECT DISTINCT unnest(ids) id FROM ex),
        |near AS (SELECT DISTINCT doc_id FROM
        |          (SELECT doc_id, unnest(ids) id FROM b) t
        |         WHERE id IN (SELECT id FROM exids)),
        |dropped AS (SELECT doc_id FROM ext UNION SELECT doc_id FROM near)
        |SELECT (SELECT count(*) FROM b) AS n_batch,
        | (SELECT count(*) FROM ex) AS n_existing,
        | (SELECT count(*) FROM dropped) AS n_dropped,
        | round(CAST((SELECT count(*) FROM dropped) AS DOUBLE) /
        |   (SELECT count(*) FROM b), 4) AS drop_rate""".stripMargin,
    "q20_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers_no_orders
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q26_correlated_avg" ->
      """SELECT c_nationkey, count(*) AS n_above,
        |       round(avg(c_acctbal), 2) AS avg_above_bal
        |FROM customer c1
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c1.c_nationkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q27_lateral_topn" ->
      """SELECT n.n_name, o.o_orderkey, o.o_totalprice
        |FROM nation n,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        |) o
        |ORDER BY n_name, o_totalprice DESC, o_orderkey""".stripMargin,
    "q21_set_ops" ->
      """WITH y95 AS (SELECT DISTINCT l_orderkey FROM lineitem
        |             WHERE year(l_shipdate) = 1995),
        |y96 AS (SELECT DISTINCT l_orderkey FROM lineitem
        |        WHERE year(l_shipdate) = 1996)
        |SELECT
        | (SELECT count(*) FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96))
        |   AS both_years,
        | (SELECT count(*) FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96))
        |   AS only_1995,
        | (SELECT count(*) FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95))
        |   AS only_1996""".stripMargin,
    "q22_moving_avg" ->
      """WITH m AS (
        |  SELECT round(avg(value) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) mov
        |  FROM events)
        |SELECT count(*) AS n_windows,
        | round(max(mov), 4) AS max_moving_avg,
        | round(avg(mov), 4) AS avg_moving_avg
        |FROM m""".stripMargin,
    "q23_ntile" ->
      """WITH t AS (
        |  SELECT o_totalprice,
        |   ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) q
        |  FROM orders)
        |SELECT CAST(q AS BIGINT) AS q, count(*) AS n_orders,
        | round(min(o_totalprice), 2) AS min_total,
        | round(max(o_totalprice), 2) AS max_total,
        | round(sum(o_totalprice), 2) AS sum_total
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q18_json_props" ->
      """SELECT event_type, count(*) AS n_events,
        | count(k) AS n_with_k,
        | CAST(sum(k) AS BIGINT) AS sum_k,
        | round(avg(k), 4) AS avg_k,
        | min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) k
        |      FROM events) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "emb_centroids" ->
      """WITH e AS (
        |  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |d AS (
        |  SELECT label, unnest(v) x, unnest(range(0, len(v))) pos FROM e),
        |c AS (SELECT label, pos, avg(x) c FROM d GROUP BY 1, 2),
        |n AS (
        |  SELECT label, CAST(count(*) AS BIGINT) dim,
        |   round(sqrt(sum(c * c)), 4) centroid_norm
        |  FROM c GROUP BY 1),
        |cnt AS (SELECT label, count(*) n_vecs FROM e GROUP BY 1)
        |SELECT CAST(n.label AS BIGINT) AS label, cnt.n_vecs, n.dim, n.centroid_norm
        |FROM n JOIN cnt ON n.label = cnt.label ORDER BY 1""".stripMargin,
    "dup_clusters" ->
      s"""$dupLabelsCte,
        |sizes AS (SELECT lbl, count(*) sz FROM labels GROUP BY lbl)
        |SELECT count(*) AS n_clusters,
        | CAST(sum(sz) AS BIGINT) AS docs_in_clusters,
        | CAST(max(sz) AS BIGINT) AS max_cluster_size
        |FROM sizes""".stripMargin,
    "dup_cluster_examples" ->
      s"""$dupLabelsCte,
        |m AS (SELECT lbl, labels.id, d.source
        |      FROM labels JOIN documents d ON labels.id = d.doc_id)
        |SELECT lbl AS cluster_label, count(*) AS cluster_size,
        | count(DISTINCT source) AS n_sources,
        | string_agg(DISTINCT source, ',' ORDER BY source) AS sources
        |FROM m GROUP BY lbl
        |ORDER BY cluster_size DESC, cluster_label LIMIT 5""".stripMargin,
    "dedup_keep_best" ->
      s"""$dupLabelsCte,
        |toks AS (
        |  SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) nt
        |  FROM documents),
        |m AS (SELECT lbl, labels.id, nt
        |      FROM labels JOIN toks ON labels.id = toks.doc_id),
        |r AS (SELECT lbl, id, nt,
        |       row_number() OVER (PARTITION BY lbl ORDER BY nt DESC, id) rn
        |      FROM m)
        |SELECT count(DISTINCT lbl) AS n_clusters,
        | count(*) AS docs_in_clusters,
        | count(CASE WHEN rn > 1 THEN 1 END) AS docs_dropped,
        | round(avg(CASE WHEN rn = 1 THEN CAST(nt AS DOUBLE) END), 2)
        |   AS avg_kept_tokens,
        | round(avg(CASE WHEN rn > 1 THEN CAST(nt AS DOUBLE) END), 2)
        |   AS avg_dropped_tokens
        |FROM r""".stripMargin,
    "dup_cluster_sizes" ->
      s"""$dupLabelsCte,
        |sizes AS (SELECT lbl, count(*) sz FROM labels GROUP BY lbl)
        |SELECT sz AS cluster_size, count(*) AS n_clusters
        |FROM sizes GROUP BY sz ORDER BY sz""".stripMargin,
    "pipeline_etl" ->
      """SELECT count(*) AS records_read,
        | CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') OR o_totalprice <= 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS records_failed_validation,
        | CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') AND o_totalprice > 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS publish_inserts,
        | CAST(0 AS BIGINT) AS publish_updates,
        | CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') AND o_totalprice > 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS target_rows
        |FROM orders""".stripMargin,
    // the delta carries injected failures (re-priced rows at key % 1000 = 0
    // get a negative price): they divert to the DLQ below the 10% gate and
    // their keys keep the base version, so dlq/update/target counters all
    // shift by the corrupted count — recomputed relationally here
    "pipeline_incremental" ->
      """WITH v AS (SELECT * FROM orders
        |  WHERE o_orderstatus IN ('O','F','P') AND o_totalprice > 0),
        |d AS (SELECT * FROM v WHERE o_orderkey % 100 = 0),
        |bad AS (SELECT * FROM d WHERE o_orderkey % 1000 = 0)
        |SELECT (SELECT count(*) FROM v) AS base_inserts,
        | (SELECT 2 * count(*) FROM d) AS delta_read,
        | (SELECT count(*) FROM bad) AS delta_dlq_rows,
        | (SELECT count(*) FROM d) AS delta_inserts,
        | (SELECT count(*) FROM d) - (SELECT count(*) FROM bad)
        |   AS delta_updates,
        | (SELECT count(*) FROM v) + (SELECT count(*) FROM d) AS target_rows""".stripMargin,
    // the snapshot pins the base-publish state: no inserted high keys and
    // no re-priced rows can appear through the pin, while the current read
    // carries the delta's merged effect (corrupted rows DLQ'd, so their
    // keys keep the base price and do not count as re-priced). The CDC
    // feed (snapshotDelta) sees exactly the merged delta: every offset-key
    // row as an insert, every surviving reprice as an update, no deletes
    "pipeline_snapshot" ->
      """WITH v AS (SELECT * FROM orders
        |  WHERE o_orderstatus IN ('O','F','P') AND o_totalprice > 0),
        |d AS (SELECT * FROM v ORDER BY o_orderkey LIMIT 6)
        |SELECT (SELECT count(*) FROM v) AS snap_rows,
        | CAST(0 AS BIGINT) AS snap_hi_keys,
        | CAST(0 AS BIGINT) AS snap_repriced,
        | (SELECT count(*) FROM v) + (SELECT count(*) FROM d) AS cur_rows,
        | (SELECT count(*) FROM d) AS cur_hi_keys,
        | (SELECT count(*) FROM d) AS cur_repriced,
        | (SELECT count(*) FROM d) AS cdc_inserts,
        | (SELECT count(*) FROM d) AS cdc_updates,
        | CAST(0 AS BIGINT) AS cdc_deletes""".stripMargin,
    // the takedown: current = valid minus the mod-97 victims with none
    // left behind, the pin still serves the full pre-delete state, and
    // the CDC feed since the pin is exactly the victims as deletes
    "pipeline_forget" ->
      """WITH v AS (SELECT * FROM orders
        |  WHERE o_orderstatus IN ('O','F','P') AND o_totalprice > 0),
        |del AS (SELECT * FROM v WHERE o_orderkey % 97 = 0)
        |SELECT (SELECT count(*) FROM v) AS snap_rows,
        | (SELECT count(*) FROM del) AS deleted,
        | (SELECT count(*) FROM v) - (SELECT count(*) FROM del) AS cur_rows,
        | CAST(0 AS BIGINT) AS cur_del_keys,
        | CAST(0 AS BIGINT) AS cdc_inserts,
        | CAST(0 AS BIGINT) AS cdc_updates,
        | (SELECT count(*) FROM del) AS cdc_deletes""".stripMargin,
    "pipeline_mor" ->
      """WITH v AS (SELECT * FROM orders
        |  WHERE o_orderstatus IN ('O','F','P') AND o_totalprice > 0),
        |d AS (SELECT * FROM v WHERE o_orderkey % 100 = 0),
        |bad AS (SELECT * FROM d WHERE o_orderkey % 1000 = 0)
        |SELECT (SELECT count(*) FROM v) AS base_inserts,
        | (SELECT 2 * count(*) FROM d) AS delta_read,
        | (SELECT count(*) FROM bad) AS delta_dlq_rows,
        | (SELECT count(*) FROM d) AS delta_inserts,
        | (SELECT count(*) FROM d) - (SELECT count(*) FROM bad)
        |   AS delta_updates,
        | (SELECT 2 * count(*) FROM d) AS noop_read,
        | (SELECT count(*) FROM bad) AS noop_dlq_rows,
        | CAST(0 AS BIGINT) AS noop_inserts,
        | CAST(0 AS BIGINT) AS noop_updates,
        | (SELECT count(*) FROM v) + (SELECT count(*) FROM d) AS target_rows""".stripMargin,
    "dedup_bloom" ->
      """WITH d AS (
        |  SELECT doc_id, source, md5(text) h
        |  FROM documents WHERE text IS NOT NULL),
        |ex AS (SELECT * FROM d WHERE source = 'src0'),
        |ba AS (SELECT * FROM d WHERE source <> 'src0'),
        |seeds(s) AS (VALUES ('#0'), ('#1'), ('#2')),
        |bits AS (
        |  SELECT DISTINCT ('0x' || substr(md5(h || s), 1, 15))::BIGINT % 1048576 pos
        |  FROM ex CROSS JOIN seeds),
        |probe AS (
        |  SELECT doc_id, h,
        |   ('0x' || substr(md5(h || s), 1, 15))::BIGINT % 1048576 pos
        |  FROM ba CROSS JOIN seeds),
        |flags AS (
        |  SELECT p.doc_id, p.h, count(*) = count(b.pos) flagged
        |  FROM probe p LEFT JOIN bits b ON p.pos = b.pos
        |  GROUP BY 1, 2),
        |graded AS (
        |  SELECT f.doc_id, f.flagged, eh.h IS NOT NULL is_dup
        |  FROM flags f LEFT JOIN (SELECT DISTINCT h FROM ex) eh ON f.h = eh.h)
        |SELECT (SELECT count(*) FROM ex) AS n_existing,
        | count(*) AS n_batch,
        | (SELECT count(*) FROM bits) AS n_slots_set,
        | count(CASE WHEN flagged THEN 1 END) AS n_flagged,
        | count(CASE WHEN is_dup THEN 1 END) AS n_true_dup,
        | count(CASE WHEN flagged AND NOT is_dup THEN 1 END) AS n_false_pos,
        | count(CASE WHEN NOT flagged AND is_dup THEN 1 END) AS n_false_neg,
        | round(CAST(count(CASE WHEN flagged AND NOT is_dup THEN 1 END) AS DOUBLE)
        |   / (count(*) - count(CASE WHEN is_dup THEN 1 END)), 4) AS fp_rate
        |FROM graded""".stripMargin,
    "mixture_epoch_schedule" ->
      """WITH ps AS (
        |  SELECT source,
        |   CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) n_tokens
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1),
        |w AS (
        |  SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) w,
        |   CAST(n_tokens AS DOUBLE) * 2.1 cap
        |  FROM ps),
        |t AS (
        |  SELECT sum(CAST(n_tokens AS DOUBLE)) * 2.0 budget, sum(w) w_total
        |  FROM w),
        |cum AS (
        |  SELECT source, w, cap, budget, w_total, cap / w ratio,
        |   sum(cap) OVER (ORDER BY cap / w, source) - cap cumcap_prev,
        |   sum(w) OVER (ORDER BY cap / w, source) - w cumw_prev,
        |   lag(cap / w, 1, CAST('-infinity' AS DOUBLE))
        |     OVER (ORDER BY cap / w, source) prev_ratio
        |  FROM w, t),
        |lam AS (
        |  SELECT min(CASE WHEN
        |     prev_ratio <= (budget - cumcap_prev) / (w_total - cumw_prev)
        |     AND (budget - cumcap_prev) / (w_total - cumw_prev) <= ratio
        |    THEN (budget - cumcap_prev) / (w_total - cumw_prev) END) lambda
        |  FROM cum)
        |SELECT source, n_tokens,
        | round(cap, 1) AS cap_tokens,
        | round(least(cap, lambda * w), 1) AS alloc_tokens,
        | round(least(cap, lambda * w) / n_tokens, 4) AS epochs,
        | coalesce(lambda * w, cap) >= cap AS capped
        |FROM w, lam ORDER BY source""".stripMargin,
    "sim_recall_curve" -> simRecallCurveSql,
    // streaming equivalence: same filter bits, same k-hit rule — the
    // flagged count must match the batch Bloom relationally
    "dedup_bloom_stream" ->
      """WITH d AS (
        |  SELECT doc_id, source, md5(text) h
        |  FROM documents WHERE text IS NOT NULL),
        |ex AS (SELECT * FROM d WHERE source = 'src0'),
        |ba AS (SELECT * FROM d WHERE source <> 'src0'),
        |seeds(s) AS (VALUES ('#0'), ('#1'), ('#2')),
        |bits AS (
        |  SELECT DISTINCT ('0x' || substr(md5(h || s), 1, 15))::BIGINT % 1048576 pos
        |  FROM ex CROSS JOIN seeds),
        |probe AS (
        |  SELECT doc_id, h,
        |   ('0x' || substr(md5(h || s), 1, 15))::BIGINT % 1048576 pos
        |  FROM ba CROSS JOIN seeds),
        |flags AS (
        |  SELECT p.doc_id, count(*) = count(b.pos) flagged
        |  FROM probe p LEFT JOIN bits b ON p.pos = b.pos
        |  GROUP BY 1)
        |SELECT (SELECT count(*) FROM ex) AS n_existing,
        | count(*) AS n_batch,
        | (SELECT count(*) FROM bits) AS n_slots_set,
        | count(CASE WHEN flagged THEN 1 END) AS n_flagged
        |FROM flags""".stripMargin,
    "dedup_threshold_sweep" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |cents AS (SELECT vec_id cent_id, nv cv FROM norm WHERE vec_id % 50 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
        |sims AS (
        |  SELECT n.vec_id, c.cent_id,
        |   round(list_sum(list_transform(range(1, len(n.nv)+1), i -> n.nv[i] * c.cv[i])), 4) csim
        |  FROM norm n CROSS JOIN cents c),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) rn
        |  FROM sims),
        |assign2 AS (SELECT vec_id, cent_id band FROM ranked WHERE rn <= 2),
        |kept AS (SELECT band FROM assign2 GROUP BY band HAVING count(*) <= 1000),
        |banded AS (SELECT a.vec_id, a.band FROM assign2 a JOIN kept USING (band)),
        |pairs AS (
        |  SELECT DISTINCT a.vec_id doc_a, b.vec_id doc_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT doc_a, doc_b,
        |   round(list_sum(list_transform(range(1, len(x.nv)+1), i -> x.nv[i] * y.nv[i])), 4) cos
        |  FROM pairs
        |  JOIN norm x ON x.vec_id = doc_a
        |  JOIN norm y ON y.vec_id = doc_b)
        |SELECT CAST(th AS DOUBLE) AS threshold,
        | (SELECT count(*) FROM e) AS n_vecs,
        | (SELECT count(*) FROM scored) AS candidate_pairs,
        | count(CASE WHEN cos >= th THEN 1 END) AS dup_pairs,
        | count(DISTINCT CASE WHEN cos >= th THEN doc_b END) AS n_dropped,
        | (SELECT count(*) FROM e) -
        |   count(DISTINCT CASE WHEN cos >= th THEN doc_b END) AS n_kept
        |FROM scored CROSS JOIN (VALUES (0.3), (0.4), (0.5)) t(th)
        |GROUP BY th ORDER BY threshold""".stripMargin,
    "contamination_gram_sweep" -> contaminationGramSweepSql,
    // dedup-bias audit: the recursive label CTE is the shared cluster
    // ground truth; the rollup compares cluster members to unique docs
    "dup_quality_calibration" -> (dupLabelsCte +
      """,
        |ids AS (SELECT DISTINCT id FROM labels),
        |scored AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) nt,
        |   round(CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a' OR x = 'of'
        |     OR x = 'and' OR x = 'to' OR x = 'in' OR x = 'is' OR x = 'it')) AS DOUBLE)
        |     / len(toks), 6) AS score
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks
        |        FROM documents) t)
        |SELECT ids.id IS NOT NULL AS in_dup_cluster,
        | count(*) AS n_docs,
        | round(avg(nt), 2) AS avg_tokens,
        | round(avg(score), 4) AS avg_stop_ratio
        |FROM scored LEFT JOIN ids ON scored.doc_id = ids.id
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    "text_langid_confusion" ->
      """WITH p AS (
        |  SELECT lang,
        |   CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |    WHEN len(list_intersect(list_distinct(toks),
        |      ['der','die','und','nicht','das'])) > 0 THEN 'de'
        |    WHEN len(list_intersect(list_distinct(toks),
        |      ['el','los','las','una','pero'])) > 0 THEN 'es'
        |    WHEN len(list_intersect(list_distinct(toks),
        |      ['le','les','une','est','dans'])) > 0 THEN 'fr'
        |    ELSE 'en' END predicted
        |  FROM (SELECT lang, text, regexp_split_to_array(trim(text), '\s+') toks
        |        FROM documents) x),
        |c AS (SELECT lang, predicted, count(*) n FROM p GROUP BY 1, 2),
        |t AS (SELECT lang, CAST(sum(n) AS BIGINT) n_lang FROM c GROUP BY 1)
        |SELECT c.lang, predicted, n,
        | round(CAST(n AS DOUBLE) / n_lang, 4) AS rate
        |FROM c JOIN t USING (lang) ORDER BY lang, predicted""".stripMargin,
    "q33_rfm_segments" ->
      """WITH pu AS (
        |  SELECT user_id, max(epoch_us(ts)) last_tus, count(*) freq,
        |   sum(value) monetary
        |  FROM events GROUP BY 1),
        |mx AS (SELECT max(last_tus) corpus_max FROM pu),
        |sc AS (
        |  SELECT user_id, freq, monetary,
        |   CAST(floor((corpus_max - last_tus) / 86400000000) AS BIGINT)
        |     recency_days
        |  FROM pu, mx),
        |nt AS (
        |  SELECT *,
        |   CAST(ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS BIGINT)
        |     r_score,
        |   CAST(ntile(5) OVER (ORDER BY freq, user_id) AS BIGINT) f_score
        |  FROM sc)
        |SELECT r_score, f_score, count(*) AS n_users,
        | round(avg(recency_days), 2) AS avg_recency_days,
        | round(avg(freq), 2) AS avg_frequency,
        | round(avg(monetary), 2) AS avg_monetary
        |FROM nt GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q34_gap_fill" ->
      """WITH h AS (
        |  SELECT epoch_us(ts) // 3600000000 hb, count(*) n,
        |   round(avg(value), 4) av
        |  FROM events GROUP BY 1),
        |b AS (SELECT min(hb) lo, max(hb) hi FROM h),
        |spine AS (SELECT unnest(generate_series(lo, hi)) hb FROM b),
        |j AS (
        |  SELECT spine.hb, coalesce(n, 0) n_events, av,
        |   h.hb IS NULL AS filled
        |  FROM spine LEFT JOIN h ON spine.hb = h.hb)
        |SELECT hb AS hour_bucket, CAST(n_events AS BIGINT) AS n_events,
        | filled,
        | last_value(av IGNORE NULLS) OVER (ORDER BY hb
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS avg_value_ffill
        |FROM j ORDER BY hour_bucket""".stripMargin,
    "q35_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |   CAST(tus - lag(tus) OVER (PARTITION BY user_id
        |     ORDER BY tus, event_id) AS DOUBLE) / 1e6 gap_s
        |  FROM (SELECT event_id, user_id, event_type, epoch_us(ts) tus
        |        FROM events) e)
        |SELECT event_type, count(*) AS n_gaps,
        | round(avg(gap_s), 2) AS avg_gap_s,
        | round(max(gap_s), 2) AS max_gap_s,
        | CAST(1 AS BIGINT) AS p50_in_band,
        | CAST(1 AS BIGINT) AS p90_in_band
        |FROM g WHERE gap_s IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "quality_metric_agreement" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) nt,
        |   round(CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a' OR x = 'of'
        |     OR x = 'and' OR x = 'to' OR x = 'in' OR x = 'is' OR x = 'it')) AS DOUBLE)
        |     / len(toks), 6) AS stop_ratio
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks
        |        FROM documents WHERE text IS NOT NULL) t),
        |toks2 AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |counts AS (SELECT token, count(*) AS c FROM toks2 GROUP BY 1),
        |total AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks2),
        |lp AS (
        |  SELECT doc_id, round(avg(log10(c / n)), 4) AS avg_logprob
        |  FROM toks2 JOIN counts USING (token) CROSS JOIN total
        |  GROUP BY doc_id),
        |r AS (
        |  SELECT base.doc_id,
        |   row_number() OVER (ORDER BY nt, base.doc_id) r_len,
        |   row_number() OVER (ORDER BY stop_ratio, base.doc_id) r_stop,
        |   row_number() OVER (ORDER BY avg_logprob, base.doc_id) r_lp
        |  FROM base JOIN lp ON base.doc_id = lp.doc_id),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) n,
        |   CAST(sum((r_len - r_stop) * (r_len - r_stop)) AS BIGINT) d_ls,
        |   CAST(sum((r_len - r_lp) * (r_len - r_lp)) AS BIGINT) d_ll,
        |   CAST(sum((r_stop - r_lp) * (r_stop - r_lp)) AS BIGINT) d_sl
        |  FROM r)
        |SELECT 'len_vs_logprob' AS metric_pair, n AS n_docs,
        | round(1.0 - 6.0 * d_ll / (n * (n * n - 1)), 4) AS rho FROM s
        |UNION ALL SELECT 'len_vs_stopword', n,
        | round(1.0 - 6.0 * d_ls / (n * (n * n - 1)), 4) FROM s
        |UNION ALL SELECT 'stopword_vs_logprob', n,
        | round(1.0 - 6.0 * d_sl / (n * (n * n - 1)), 4) FROM s
        |ORDER BY metric_pair""".stripMargin,
    "sim_range_search" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |qids AS (
        |  SELECT vec_id FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |cents AS (SELECT vec_id cent_id, nv cv FROM norm WHERE vec_id % 100 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
        |sims AS (
        |  SELECT n.vec_id, c.cent_id,
        |   round(list_sum(list_transform(range(1, len(n.nv)+1), i -> n.nv[i] * c.cv[i])), 4) csim
        |  FROM norm n CROSS JOIN cents c),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) rn
        |  FROM sims),
        |buckets AS (SELECT vec_id, cent_id bucket FROM ranked WHERE rn = 1),
        |qprobe AS (
        |  SELECT r.vec_id query_id, cent_id bucket FROM ranked r
        |  JOIN qids ON r.vec_id = qids.vec_id WHERE rn <= 2),
        |iscored AS (
        |  SELECT q.query_id, d.vec_id neighbor_id,
        |   round(list_sum(list_transform(range(1, len(qn.nv)+1), i -> qn.nv[i] * dn.nv[i])), 4) sim
        |  FROM qprobe q
        |  JOIN buckets d ON q.bucket = d.bucket AND d.vec_id <> q.query_id
        |  JOIN norm qn ON qn.vec_id = q.query_id
        |  JOIN norm dn ON dn.vec_id = d.vec_id),
        |m AS (
        |  SELECT query_id, count(*) n_matches, max(sim) top_sim,
        |   round(avg(sim), 4) avg_sim
        |  FROM iscored WHERE sim >= 0.3 GROUP BY 1)
        |SELECT qids.vec_id AS query_id,
        | coalesce(n_matches, 0) AS n_matches, top_sim, avg_sim
        |FROM qids LEFT JOIN m ON m.query_id = qids.vec_id
        |ORDER BY query_id""".stripMargin,
    "emb_ivf_balance" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |withnorm AS (
        |  SELECT vec_id, v, sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (SELECT vec_id, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |cents AS (SELECT vec_id cent_id, nv cv FROM norm WHERE vec_id % 100 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
        |sims AS (
        |  SELECT n.vec_id, c.cent_id,
        |   round(list_sum(list_transform(range(1, len(n.nv)+1), i -> n.nv[i] * c.cv[i])), 4) csim
        |  FROM norm n CROSS JOIN cents c),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) rn
        |  FROM sims),
        |buckets AS (SELECT vec_id, cent_id bucket FROM ranked WHERE rn = 1),
        |counts AS (SELECT bucket, count(*) n_vecs FROM buckets GROUP BY 1)
        |SELECT (SELECT count(*) FROM cents) AS n_centroids,
        | count(*) AS n_buckets,
        | CAST(sum(n_vecs) AS BIGINT) AS n_assigned,
        | max(n_vecs) AS max_bucket,
        | min(n_vecs) AS min_bucket,
        | round(CAST(max(n_vecs) AS DOUBLE) * count(*) / sum(n_vecs), 4)
        |   AS imbalance
        |FROM counts""".stripMargin,
    // payload = utf8 bytes of text, so md5(payload) == md5(text) and
    // strlen(text) is the byte length on this ASCII corpus
    "multimodal_dedup" ->
      """WITH m AS (
        |  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |    WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END media_type,
        |   md5(text) h, CAST(strlen(text) AS BIGINT) blen
        |  FROM documents WHERE text IS NOT NULL),
        |per AS (
        |  SELECT media_type, h, count(*) k, min(blen) blen
        |  FROM m GROUP BY 1, 2)
        |SELECT media_type,
        | CAST(sum(k) AS BIGINT) AS n_records,
        | count(*) AS n_distinct,
        | CAST(sum(k) - count(*) AS BIGINT) AS dup_records,
        | CAST(sum(k * blen) AS BIGINT) AS total_bytes,
        | CAST(sum(k * blen) - sum(blen) AS BIGINT) AS reclaimable_bytes
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "corpus_snapshot_diff" ->
      """WITH d AS (SELECT doc_id, source, text FROM documents
        |           WHERE text IS NOT NULL),
        |prev AS (
        |  SELECT doc_id, source,
        |   md5(CASE WHEN doc_id % 5 = 0 THEN substr(text, 1, 100)
        |       ELSE text END) h_prev
        |  FROM d WHERE doc_id % 7 <> 0),
        |curr AS (
        |  SELECT doc_id, source source_c, md5(text) h_curr
        |  FROM d WHERE doc_id % 11 <> 0),
        |j AS (
        |  SELECT coalesce(prev.source, curr.source_c) source,
        |   h_prev, h_curr
        |  FROM prev FULL OUTER JOIN curr USING (doc_id))
        |SELECT source,
        | count(h_prev) AS n_prev,
        | count(h_curr) AS n_curr,
        | count(CASE WHEN h_prev IS NULL THEN 1 END) AS added,
        | count(CASE WHEN h_curr IS NULL THEN 1 END) AS removed,
        | count(CASE WHEN h_prev IS NOT NULL AND h_curr IS NOT NULL
        |       AND h_prev <> h_curr THEN 1 END) AS changed,
        | count(CASE WHEN h_prev = h_curr THEN 1 END) AS unchanged
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "pack_sorted_compare" ->
      """WITH t AS (
        |  SELECT doc_id,
        |   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) n,
        |   doc_id % 8 AS shard
        |  FROM documents),
        |a AS (SELECT shard, doc_id, n,
        |       sum(n) OVER (PARTITION BY shard ORDER BY doc_id) cum FROM t),
        |s AS (SELECT shard, doc_id, n,
        |       sum(n) OVER (PARTITION BY shard ORDER BY n DESC, doc_id) cum
        |      FROM t),
        |ar AS (
        |  SELECT shard, count(*) n_docs, CAST(sum(n) AS BIGINT) total_tokens,
        |   CAST(floor((sum(n) + 255) / 256) AS BIGINT) n_sequences,
        |   CAST(sum(CASE WHEN floor((cum - n) / 256) <> floor((cum - 1) / 256)
        |        THEN 1 ELSE 0 END) AS BIGINT) boundary_arrival
        |  FROM a GROUP BY 1),
        |so AS (
        |  SELECT shard,
        |   CAST(sum(CASE WHEN floor((cum - n) / 256) <> floor((cum - 1) / 256)
        |        THEN 1 ELSE 0 END) AS BIGINT) boundary_sorted
        |  FROM s GROUP BY 1)
        |SELECT ar.shard, n_docs, total_tokens, n_sequences,
        | boundary_arrival, boundary_sorted,
        | boundary_arrival - boundary_sorted AS boundary_saved
        |FROM ar JOIN so USING (shard) ORDER BY shard""".stripMargin,
    "text_boilerplate" ->
      """WITH d AS (
        |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') w
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |c AS (
        |  SELECT doc_id, source,
        |   unnest(list_transform(range(0, (len(w) + 15) // 16),
        |    i -> md5(array_to_string(w[i*16+1 : i*16+16], ' ')))) h
        |  FROM d),
        |fdf AS (
        |  SELECT source, h, count(*) df
        |  FROM (SELECT DISTINCT source, h, doc_id FROM c) x GROUP BY 1, 2),
        |fl AS (SELECT source, h FROM fdf WHERE df >= 2),
        |pd AS (
        |  SELECT c.source, c.doc_id, count(*) nch, count(fl.h) bp
        |  FROM c LEFT JOIN fl ON c.source = fl.source AND c.h = fl.h
        |  GROUP BY 1, 2),
        |srcrep AS (
        |  SELECT source, count(*) n_docs,
        |   CAST(sum(nch) AS BIGINT) total_chunks,
        |   CAST(sum(bp) AS BIGINT) bp_instances,
        |   count(CASE WHEN bp > 0 THEN 1 END) affected_docs
        |  FROM pd GROUP BY 1),
        |ty AS (SELECT source, count(*) bp_chunk_types FROM fl GROUP BY 1)
        |SELECT s.source, n_docs, total_chunks,
        | CAST(coalesce(bp_chunk_types, 0) AS BIGINT) AS bp_chunk_types,
        | bp_instances, affected_docs,
        | round(CAST(bp_instances AS DOUBLE) / total_chunks, 4) AS bp_frac
        |FROM srcrep s LEFT JOIN ty USING (source) ORDER BY source""".stripMargin,
    "mixture_weights" ->
      """WITH s AS (
        |  SELECT source, count(*) n_docs, sqrt(count(*)) w_raw
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs) n_total, sum(w_raw) w_total FROM s)
        |SELECT source, n_docs,
        | round(n_docs / n_total, 4) AS raw_share,
        | round(w_raw / w_total, 4) AS mix_weight,
        | round(w_raw / w_total * n_total, 1) AS expected_docs
        |FROM s, t ORDER BY source""".stripMargin,
    "sample_temperature" ->
      """WITH s AS (
        |  SELECT lang, count(*) n_docs,
        |   pow(CAST(count(*) AS DOUBLE), 0.3) w03,
        |   pow(CAST(count(*) AS DOUBLE), 0.7) w07
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS DOUBLE) n_total,
        |  sum(w03) s03, sum(w07) s07 FROM s)
        |SELECT lang, n_docs,
        | round(n_docs / n_total, 4) AS p_raw,
        | round(w03 / s03, 4) AS p_alpha03,
        | round(w07 / s07, 4) AS p_alpha07,
        | round((w03 / s03) / (n_docs / n_total), 4) AS oversample_alpha03
        |FROM s, t ORDER BY lang""".stripMargin,
    "shard_assign" ->
      """SELECT shard, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | round(avg(n_tokens), 2) AS avg_tokens
        |FROM (
        |  SELECT ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |    % 8 AS shard,
        |   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) n_tokens
        |  FROM documents) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "bytes_per_token" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        | round(sum(strlen(text)) /
        |   sum(len(regexp_split_to_array(trim(text), '\s+'))), 4)
        |   AS bytes_per_token,
        | round(sum(strlen(text)) /
        |   sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))), 4)
        |   AS bytes_per_subword
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "window_chunking" ->
      """WITH n AS (
        |  SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) n
        |  FROM documents),
        |c AS (
        |  SELECT n, unnest(generate_series(0, CAST(floor((n - 1) / 48.0) AS BIGINT))) i
        |  FROM n),
        |l AS (SELECT least(64, n - i * 48) chunk_len FROM c)
        |SELECT count(*) AS total_chunks,
        | count(*) FILTER (chunk_len = 64) AS full_chunks,
        | round(avg(chunk_len / 64.0), 4) AS avg_fill
        |FROM l""".stripMargin,
    "knn_label_agreement" ->
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |withnorm AS (
        |  SELECT vec_id, label, v,
        |   sqrt(list_sum(list_transform(v, y -> y * y))) nrm FROM e),
        |norm AS (
        |  SELECT vec_id, label, list_transform(v, x -> x / nrm) nv FROM withnorm),
        |scored AS (
        |  SELECT q.vec_id, q.label, b.label nb_label, b.vec_id nb_id,
        |   round(list_sum(list_transform(range(1, len(q.nv)+1),
        |     i -> q.nv[i] * b.nv[i])), 4) sim
        |  FROM norm q JOIN norm b ON b.vec_id <> q.vec_id),
        |nn AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY sim DESC, nb_id) rn
        |  FROM scored)
        |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
        | count(*) FILTER (label = nb_label) AS n_agree,
        | round(count(*) FILTER (label = nb_label) / count(*), 4) AS agreement
        |FROM nn WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_pmi" ->
      """WITH t AS (SELECT regexp_split_to_array(trim(text), '\s+') l FROM documents),
        |tot AS (SELECT CAST(sum(len(l)) AS BIGINT) n_uni,
        |         CAST(sum(greatest(len(l) - 1, 0)) AS BIGINT) n_bi FROM t),
        |uc AS (SELECT w, count(*) c FROM (SELECT unnest(l) w FROM t) GROUP BY 1),
        |bc AS (SELECT g, count(*) cab FROM (
        |    SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) g
        |    FROM t) GROUP BY 1 HAVING count(*) >= 5),
        |scored AS (
        |  SELECT g bigram, cab,
        |   round(CAST(cab AS DOUBLE) * n_uni / (CAST(c1.c AS DOUBLE) * c2.c)
        |     * (CAST(n_uni AS DOUBLE) / n_bi), 4) pmi_ratio
        |  FROM bc CROSS JOIN tot
        |  JOIN uc c1 ON split_part(g, ' ', 1) = c1.w
        |  JOIN uc c2 ON split_part(g, ' ', 2) = c2.w),
        |r AS (SELECT CAST(row_number() OVER (ORDER BY pmi_ratio DESC, bigram)
        |        AS BIGINT) rank, bigram, cab, pmi_ratio FROM scored)
        |SELECT rank, bigram, cab, pmi_ratio FROM r
        |WHERE rank <= 15 ORDER BY rank""".stripMargin,
    "sample_weighted" ->
      """WITH d AS (
        |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') l
        |  FROM documents),
        |s AS (SELECT doc_id, source,
        |   round(CAST(len(list_distinct(l)) AS DOUBLE) / len(l), 4) weight,
        |   (('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |     + 1) / 1152921504606846976.0 u
        |  FROM d),
        |p AS (SELECT doc_id, source, weight, weight / u pri FROM s),
        |r AS (SELECT CAST(row_number() OVER (ORDER BY pri DESC, doc_id)
        |        AS BIGINT) rank, doc_id, source, weight,
        |        round(pri, 4) priority FROM p)
        |SELECT rank, doc_id, source, weight, priority FROM r
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "q24_range_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) tus FROM events),
        |p AS (SELECT event_id, user_id, tus FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, tus FROM ev WHERE event_type = 'click'),
        |pairs AS (
        |  SELECT p.event_id FROM p JOIN c ON p.user_id = c.user_id
        |   AND c.tus >= p.tus - 60000000 AND c.tus < p.tus),
        |pp AS (SELECT event_id, count(*) n FROM pairs GROUP BY 1)
        |SELECT (SELECT count(*) FROM p) AS n_purchases,
        | (SELECT count(*) FROM pp) AS n_with_clicks,
        | (SELECT COALESCE(CAST(sum(n) AS BIGINT), 0) FROM pp) AS total_pairs,
        | (SELECT COALESCE(CAST(max(n) AS BIGINT), 0) FROM pp) AS max_clicks""".stripMargin,
    "emb_pca" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |d AS (SELECT vec_id, unnest(v) x, unnest(range(0, len(v))) pos FROM e),
        |s1 AS (SELECT vec_id, sum(x * 0.125) s FROM d GROUP BY 1),
        |y1 AS (SELECT pos, round(sum(d.x * s1.s), 6) y
        |       FROM d JOIN s1 USING (vec_id) GROUP BY pos),
        |v1r AS (SELECT pos, round(y / (SELECT sqrt(sum(y * y)) FROM y1), 6) c
        |        FROM y1),
        |sg1 AS (SELECT CASE WHEN c > 0 THEN 1.0 ELSE -1.0 END sg
        |        FROM v1r WHERE c <> 0 ORDER BY pos LIMIT 1),
        |v1 AS (SELECT pos, c * (SELECT sg FROM sg1) c FROM v1r),
        |s2 AS (SELECT d.vec_id, sum(d.x * v1.c) s
        |       FROM d JOIN v1 USING (pos) GROUP BY 1),
        |y2 AS (SELECT pos, round(sum(d.x * s2.s), 6) y
        |       FROM d JOIN s2 USING (vec_id) GROUP BY pos),
        |v2r AS (SELECT pos, round(y / (SELECT sqrt(sum(y * y)) FROM y2), 6) c
        |        FROM y2),
        |sg2 AS (SELECT CASE WHEN c > 0 THEN 1.0 ELSE -1.0 END sg
        |        FROM v2r WHERE c <> 0 ORDER BY pos LIMIT 1),
        |v2 AS (SELECT pos, c * (SELECT sg FROM sg2) c FROM v2r),
        |r AS (SELECT d.vec_id, sum(d.x * v2.c) s, sum(d.x * d.x) vv
        |      FROM d JOIN v2 USING (pos) GROUP BY 1)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_vecs,
        | CAST(64 AS BIGINT) AS dim,
        | round(sum(s * s), 2) AS eigenvalue,
        | round(sum(s * s) / sum(vv), 4) AS explained_ratio,
        | (SELECT c FROM v2 WHERE pos = 0) AS comp0,
        | (SELECT c FROM v2 WHERE pos = 1) AS comp1,
        | (SELECT c FROM v2 WHERE pos = 2) AS comp2,
        | (SELECT c FROM v2 WHERE pos = 3) AS comp3
        |FROM r""".stripMargin,
    "dedup_semantic" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) v
        |  FROM embeddings),
        |n2 AS (SELECT vec_id, v,
        |        list_sum(list_transform(v, y -> y * y)) vv FROM e),
        |nv AS (SELECT vec_id, list_transform(v, x -> x / sqrt(vv)) nv FROM n2),
        |c0 AS (SELECT vec_id cent_id, v cv, vv cvv FROM n2 WHERE vec_id % 100 = 3 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4096),
        |d1 AS (
        |  SELECT a.vec_id, c.cent_id,
        |   round(a.vv + c.cvv - 2 * list_sum(list_transform(
        |     range(1, len(a.v) + 1), i -> a.v[i] * c.cv[i])), 4) dist2
        |  FROM n2 a CROSS JOIN c0 c),
        |a1 AS (SELECT vec_id, cent_id FROM (
        |        SELECT *, row_number() OVER (PARTITION BY vec_id
        |          ORDER BY dist2, cent_id) rn FROM d1) WHERE rn = 1),
        |w AS (SELECT a1.vec_id, a1.cent_id,
        |        (row_number() OVER (PARTITION BY a1.cent_id
        |           ORDER BY a1.vec_id) - 1) // 256 sub,
        |        nv.nv
        |      FROM a1 JOIN nv USING (vec_id)),
        |pairs AS (
        |  SELECT b.vec_id vec_b,
        |   round(list_sum(list_transform(range(1, len(a.nv) + 1),
        |     i -> a.nv[i] * b.nv[i])), 4) cos
        |  FROM w a JOIN w b ON a.cent_id = b.cent_id AND a.sub = b.sub
        |   AND a.vec_id < b.vec_id),
        |dropped AS (SELECT DISTINCT vec_b FROM pairs WHERE cos >= 0.4)
        |SELECT (SELECT count(*) FROM e) AS n_vecs,
        | (SELECT count(DISTINCT cent_id) FROM a1) AS n_clusters,
        | (SELECT count(*) FROM (SELECT cent_id FROM a1 GROUP BY cent_id
        |    HAVING count(*) > 256) o) AS n_oversize,
        | (SELECT count(*) FROM pairs) AS n_pairs,
        | (SELECT count(*) FROM pairs WHERE cos >= 0.4) AS n_dup_pairs,
        | (SELECT count(*) FROM dropped) AS n_dropped,
        | (SELECT count(*) FROM e) - (SELECT count(*) FROM dropped) AS n_kept""".stripMargin,
    "multimodal_pipeline" ->
      """-- NOTE: ord(substr(...)) walks CHARACTERS while the engine decodes
        |-- UTF-8 payload BYTES; the two agree only because the synthetic
        |-- corpus is pure ASCII (verified). A non-ASCII corpus needs a
        |-- blob-indexed decode here — DuckDB lacks byte indexing on BLOB,
        |-- so this oracle is scoped to the testdata by design.
        |WITH f AS (
        |  SELECT doc_id,
        |   CASE WHEN doc_id % 3 = 0 THEN 'image'
        |        WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END media_type,
        |   strlen(text) bl, text t
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, media_type, bl,
        |   list_transform(range(0, CAST(ceil(bl / 64.0) AS BIGINT)), i ->
        |     round(list_sum(list_transform(
        |         range(i * 64 + 1, least(bl, (i + 1) * 64) + 1),
        |         j -> ord(substr(t, CAST(j AS INT), 1)))) * 1.0 /
        |       (least(bl, (i + 1) * 64) - i * 64), 2)) means
        |  FROM f),
        |s AS (
        |  SELECT doc_id, media_type, bl,
        |   list_transform(range(0, CAST(ceil(len(means) / 3.0) AS BIGINT)),
        |     k -> means[CAST(3 * k + 1 AS INT)]) sm
        |  FROM m),
        |r AS (
        |  SELECT doc_id, media_type, bl, sm, len(sm) n,
        |   greatest(CAST(ceil(len(sm) / 4.0) AS BIGINT), 1) g
        |  FROM s),
        |rz AS (
        |  SELECT doc_id, media_type, bl,
        |   list_transform(range(0, CAST(ceil(n * 1.0 / g) AS BIGINT)), k ->
        |     list_sum(list_slice(sm, CAST(k * g + 1 AS INT),
        |       CAST(least(n, (k + 1) * g) AS INT)))
        |       / (least(n, (k + 1) * g) - k * g)) rm
        |  FROM r)
        |SELECT media_type, count(*) AS n_records,
        | CAST(sum(bl) AS BIGINT) AS total_bytes,
        | CAST(sum(len(rm)) AS BIGINT) AS total_resized_frames,
        | round(sum(list_sum(rm)), 2) AS sum_resized_means
        |FROM rz GROUP BY 1 ORDER BY 1""".stripMargin,
    "quality_funnel" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') l FROM documents),
        |tok AS (SELECT doc_id, unnest(l) w FROM t),
        |tc AS (SELECT doc_id, w, count(*) c FROM tok GROUP BY 1, 2),
        |tt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) n_tokens,
        |        count(*) n_distinct FROM tc GROUP BY 1),
        |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |         i -> l[i] || ' ' || l[i+1])) g
        |       FROM t WHERE len(l) >= 2),
        |bc AS (SELECT doc_id, g, count(*) c FROM bi GROUP BY 1, 2),
        |tb AS (SELECT doc_id, max(c) top_bigram FROM bc GROUP BY 1),
        |pd AS (SELECT n_tokens,
        |  CAST(n_distinct AS DOUBLE) / n_tokens ttr,
        |  CAST(COALESCE(top_bigram, 0) AS DOUBLE) /
        |    GREATEST(n_tokens - 1, 1) topbf
        | FROM tt LEFT JOIN tb USING (doc_id)),
        |a AS (SELECT count(*) n0,
        | CAST(sum(CASE WHEN n_tokens BETWEEN 30 AND 200 THEN 1 ELSE 0 END)
        |   AS BIGINT) n1,
        | CAST(sum(CASE WHEN n_tokens BETWEEN 30 AND 200 AND ttr >= 0.35
        |   THEN 1 ELSE 0 END) AS BIGINT) n2,
        | CAST(sum(CASE WHEN n_tokens BETWEEN 30 AND 200 AND ttr >= 0.35
        |   AND topbf <= 0.2 THEN 1 ELSE 0 END) AS BIGINT) n3
        | FROM pd)
        |SELECT * FROM (
        | SELECT CAST(0 AS BIGINT) stage, 'all' filter_name,
        |  n0 survivors, n0 - n0 dropped FROM a
        | UNION ALL SELECT 1, 'length_band', n1, n0 - n1 FROM a
        | UNION ALL SELECT 2, 'lexical_diversity', n2, n1 - n2 FROM a
        | UNION ALL SELECT 3, 'bigram_repetition', n3, n2 - n3 FROM a)
        |ORDER BY stage""".stripMargin,
    "source_overlap" ->
      """WITH s AS (
        |  SELECT source, regexp_split_to_array(trim(text), '\s+') l FROM documents),
        |gd AS (SELECT source, unnest(list_distinct(list_transform(
        |    list_distinct(list_transform(range(1, len(l) - 3),
        |      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
        |           l[i+3] || ' ' || l[i+4])),
        |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647))) id
        |  FROM s),
        |fdf AS (SELECT id, count(*) df FROM gd GROUP BY 1),
        |g AS (SELECT DISTINCT source, id FROM gd
        |      WHERE id IN (SELECT id FROM fdf WHERE df <= 10000)),
        |sz AS (SELECT source, count(*) sz FROM g GROUP BY 1),
        |cm AS (SELECT a.source src_a, b.source src_b, count(*) common_grams
        |  FROM g a JOIN g b ON a.id = b.id AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, common_grams,
        | round(CAST(common_grams AS DOUBLE) / least(x.sz, y.sz), 4) containment
        |FROM cm JOIN sz x ON cm.src_a = x.source
        |        JOIN sz y ON cm.src_b = y.source
        |ORDER BY containment DESC, src_a, src_b LIMIT 10""".stripMargin,
    "text_hash_embedding" ->
      """WITH tok AS (
        |  SELECT source, doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) w
        |  FROM documents),
        |hd AS (SELECT source, doc_id,
        |  ('0x' || substr(md5(w), 1, 15))::BIGINT % 64 dim,
        |  (((('0x' || substr(md5(w), 1, 15))::BIGINT >> 6) & 1) * 2 - 1) sgn
        | FROM tok),
        |pd AS (SELECT source, doc_id, dim, CAST(sum(sgn) AS BIGINT) s
        |       FROM hd GROUP BY 1, 2, 3),
        |dc AS (SELECT source, doc_id, sqrt(sum(s * s)) nrm,
        |        CAST(sum(CASE WHEN s <> 0 THEN 1 ELSE 0 END) AS BIGINT) nz
        |       FROM pd GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs,
        | round(avg(nrm), 4) AS avg_norm,
        | round(avg(CAST(nz AS DOUBLE) / 64), 4) AS avg_density
        |FROM dc GROUP BY 1 ORDER BY 1""".stripMargin,
    "rag_retrieval" ->
      """WITH base AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') toks
        |  FROM documents),
        |ch AS (
        |  SELECT doc_id,
        |   unnest(range(0, CAST(floor((len(toks) - 1) / 48.0) AS BIGINT) + 1)) ci,
        |   toks
        |  FROM base),
        |ct AS (
        |  SELECT doc_id, ci,
        |   unnest(toks[CAST(ci*48+1 AS BIGINT) : CAST(ci*48+64 AS BIGINT)]) w
        |  FROM ch),
        |hd AS (SELECT doc_id, ci,
        |  ('0x' || substr(md5(w), 1, 15))::BIGINT % 64 dim,
        |  (((('0x' || substr(md5(w), 1, 15))::BIGINT >> 6) & 1) * 2 - 1) sgn
        | FROM ct),
        |pd AS (SELECT doc_id, ci, dim, CAST(sum(sgn) AS BIGINT) s
        |       FROM hd GROUP BY 1, 2, 3 HAVING sum(sgn) <> 0),
        |norms AS (SELECT doc_id, ci, sqrt(sum(s * s)) nrm
        |          FROM pd GROUP BY 1, 2 HAVING sqrt(sum(s * s)) > 0),
        |qdocs AS (
        |  SELECT doc_id FROM documents
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 8),
        |qd AS (SELECT p.doc_id q_doc, dim, s qs
        |       FROM pd p JOIN qdocs q ON p.doc_id = q.doc_id WHERE ci = 0),
        |qn AS (SELECT n.doc_id q_doc, nrm qnrm
        |       FROM norms n JOIN qdocs q ON n.doc_id = q.doc_id WHERE ci = 0),
        |dots AS (
        |  SELECT qd.q_doc, pd.doc_id, pd.ci, CAST(sum(pd.s * qd.qs) AS BIGINT) dot
        |  FROM pd JOIN qd USING (dim) WHERE pd.doc_id <> qd.q_doc
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT d.q_doc, d.doc_id, d.ci,
        |   round(d.dot / (n.nrm * q.qnrm), 4) sim
        |  FROM dots d
        |  JOIN norms n ON n.doc_id = d.doc_id AND n.ci = d.ci
        |  JOIN qn q ON q.q_doc = d.q_doc)
        |SELECT q_doc, rank, chunk_doc, chunk_idx, sim FROM (
        |  SELECT q_doc, doc_id chunk_doc, ci chunk_idx, sim,
        |   row_number() OVER (PARTITION BY q_doc ORDER BY sim DESC, doc_id, ci) rank
        |  FROM scored) t
        |WHERE rank <= 3 ORDER BY q_doc, rank""".stripMargin,
    "text_novelty" ->
      """WITH d AS (
        |  SELECT doc_id,
        |   list_distinct(list_transform(
        |     list_distinct(list_transform(range(1, len(l) - 3),
        |       i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' ||
        |            l[i+3] || ' ' || l[i+4])),
        |     x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647)) ids
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') l
        |        FROM documents) x),
        |ex AS (SELECT doc_id, unnest(ids) id FROM d),
        |fo AS (SELECT id, min(doc_id) first_doc FROM ex GROUP BY 1),
        |pd AS (
        |  SELECT ex.doc_id, count(*) n_grams,
        |   count(CASE WHEN fo.first_doc = ex.doc_id THEN 1 END) novel
        |  FROM ex JOIN fo USING (id) GROUP BY 1),
        |nv AS (SELECT doc_id, CAST(novel AS DOUBLE) / n_grams novelty FROM pd)
        |SELECT count(*) AS n_docs,
        | round(avg(novelty), 4) AS avg_novelty,
        | count(CASE WHEN novelty < 0.5 THEN 1 END) AS docs_low_novelty,
        | round(min(novelty), 4) AS min_novelty
        |FROM nv""".stripMargin,
    "dedup_paragraphs" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |c AS (
        |  SELECT doc_id, unnest(list_transform(range(0, (len(w) + 15) // 16),
        |    i -> md5(array_to_string(w[i*16+1 : i*16+16], ' ')))) h
        |  FROM d),
        |cc AS (SELECT h, count(*) n FROM c GROUP BY 1),
        |pd AS (
        |  SELECT doc_id, count(*) nch, count(CASE WHEN n > 1 THEN 1 END) dup
        |  FROM c JOIN cc USING (h) GROUP BY 1)
        |SELECT count(*) AS n_docs,
        | CAST(sum(nch) AS BIGINT) AS total_chunks,
        | (SELECT count(*) FROM cc) AS distinct_chunks,
        | count(CASE WHEN dup * 2 > nch THEN 1 END) AS docs_over_half,
        | round(avg(CAST(dup AS DOUBLE) / nch), 4) AS avg_dup_frac
        |FROM pd""".stripMargin,
    // streaming equivalence: the novel-chunk stream keeps exactly one row
    // per distinct chunk hash, so both rollup counts equal the batch
    // distinct-chunk cardinality
    "dedup_paragraphs_stream" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |c AS (
        |  SELECT unnest(list_transform(range(0, (len(w) + 15) // 16),
        |    i -> md5(array_to_string(w[i*16+1 : i*16+16], ' ')))) h
        |  FROM d)
        |SELECT count(DISTINCT h) AS n_novel_chunks,
        | count(DISTINCT h) AS n_distinct_chunks
        |FROM c""".stripMargin,
    // document-level streaming equivalence: one survivor per distinct
    // content hash
    "dedup_exact_stream" ->
      """SELECT count(DISTINCT md5(text)) AS n_kept,
        | count(DISTINCT md5(text)) AS n_distinct
        |FROM documents""".stripMargin,
    // the streaming monitor's per-source stats recomputed relationally
    "quality_monitor_stream" ->
      """WITH t AS (
        |  SELECT source, regexp_split_to_array(trim(text), '\s+') toks
        |  FROM documents),
        |d AS (
        |  SELECT source, len(toks) n_tokens,
        |   CASE WHEN len(toks) BETWEEN 5 AND 1000
        |         AND len(list_filter(toks, x -> x = 'the' OR x = 'a'
        |           OR x = 'of' OR x = 'and' OR x = 'to' OR x = 'in'
        |           OR x = 'is' OR x = 'it')) > 0
        |        THEN 1.0 ELSE 0.0 END p
        |  FROM t)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | round(avg(CAST(n_tokens AS DOUBLE)), 2) AS avg_tokens,
        | round(avg(p), 4) AS quality_rate
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_spans" ->
      """WITH s AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') l FROM documents),
        |ids AS (SELECT unnest(list_distinct(list_transform(
        |    list_distinct(list_transform(range(1, len(l) - 8),
        |      i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' ||
        |           l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' || l[i+7] || ' ' ||
        |           l[i+8] || ' ' || l[i+9])),
        |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % 2147483647))) id
        |  FROM s),
        |f AS (SELECT id, count(*) df FROM ids GROUP BY 1)
        |SELECT count(*) AS distinct_spans,
        | count(CASE WHEN df > 1 THEN 1 END) AS duplicated_spans,
        | CAST(max(df) AS BIGINT) AS max_span_df,
        | round(CAST(count(CASE WHEN df > 1 THEN 1 END) AS DOUBLE) / count(*), 4)
        |   AS dup_rate
        |FROM f""".stripMargin,
    // duplicated-span coverage: interval-union size via the identical
    // running-max window; ids share dedup_spans' md5 basis
    "dedup_span_coverage" ->
      """WITH d AS (
        |  SELECT source, doc_id, regexp_split_to_array(trim(text), '\s+') w
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |sp AS (
        |  SELECT source, doc_id, len(w) n_tokens, CAST(i AS BIGINT) pos,
        |   ('0x' || substr(md5(array_to_string(w[i : i + 9], ' ')), 1, 15))::BIGINT
        |     % 2147483647 id
        |  FROM d, unnest(range(1, greatest(len(w) - 9, 0) + 1)) AS u(i)),
        |dup AS (SELECT id FROM sp GROUP BY id
        |        HAVING count(DISTINCT doc_id) > 1),
        |h AS (SELECT sp.* FROM sp JOIN dup USING (id)),
        |seg AS (
        |  SELECT source, doc_id, n_tokens,
        |   greatest(pos + 9 - greatest(
        |     coalesce(max(pos + 9) OVER (PARTITION BY doc_id ORDER BY pos
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0),
        |     pos - 1), 0) c
        |  FROM h),
        |pd AS (SELECT source, doc_id, n_tokens, sum(c) covered
        |       FROM seg GROUP BY 1, 2, 3),
        |tot AS (SELECT source, count(*) n_docs,
        |         CAST(sum(len(w)) AS BIGINT) total_tokens
        |        FROM d GROUP BY 1),
        |agg AS (SELECT source, count(*) docs_with_dup_spans,
        |         CAST(sum(covered) AS BIGINT) covered_tokens
        |        FROM pd GROUP BY 1)
        |SELECT tot.source, n_docs,
        | coalesce(docs_with_dup_spans, 0) AS docs_with_dup_spans,
        | coalesce(covered_tokens, 0) AS covered_tokens,
        | total_tokens,
        | round(CAST(coalesce(covered_tokens, 0) AS DOUBLE) / total_tokens, 4)
        |   AS coverage_frac
        |FROM tot LEFT JOIN agg USING (source)
        |ORDER BY source""".stripMargin,
    // winnowing fingerprints: identical sliding-window min in DuckDB
    "text_winnow" ->
      """WITH d AS (
        |  SELECT source, doc_id, regexp_split_to_array(trim(text), '\s+') w
        |  FROM documents
        |  WHERE text IS NOT NULL AND length(trim(text)) > 0),
        |g AS (
        |  SELECT source, doc_id, CAST(i AS BIGINT) pos,
        |   ('0x' || substr(md5(array_to_string(w[i : i + 4], ' ')), 1, 15))::BIGINT
        |     % 2147483647 id
        |  FROM d, unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS u(i)),
        |mins AS (
        |  SELECT source, doc_id, pos,
        |   min(id) OVER (PARTITION BY doc_id ORDER BY pos
        |     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) fp
        |  FROM g),
        |fps AS (SELECT DISTINCT source, doc_id, fp FROM mins WHERE pos >= 4),
        |gc AS (SELECT source, count(*) n_kgrams FROM g GROUP BY 1),
        |fdf AS (SELECT fp, count(DISTINCT doc_id) df FROM fps GROUP BY 1),
        |sh AS (
        |  SELECT source, count(*) docs_with_shared_fp FROM (
        |    SELECT DISTINCT source, doc_id FROM fps
        |    WHERE fp IN (SELECT fp FROM fdf WHERE df > 1)) x
        |  GROUP BY 1),
        |fc AS (SELECT source, count(*) n_fingerprints FROM fps GROUP BY 1),
        |nd AS (SELECT source, count(*) n_docs FROM d GROUP BY 1)
        |SELECT nd.source, n_docs,
        | coalesce(n_fingerprints, 0) AS n_fingerprints,
        | round(CAST(coalesce(n_fingerprints, 0) AS DOUBLE) / n_kgrams, 4)
        |   AS fp_density,
        | coalesce(docs_with_shared_fp, 0) AS docs_with_shared_fp
        |FROM nd JOIN gc USING (source)
        |LEFT JOIN fc USING (source) LEFT JOIN sh USING (source)
        |ORDER BY source""".stripMargin,
  )
}
