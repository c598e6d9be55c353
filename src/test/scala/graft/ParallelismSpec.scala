package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Parallelism-invariance: a query's RESULT must not depend on the
  * shuffle-partition count. The DuckDB gate pins results at one fixed
  * config; a 1000-executor cluster runs the same plans at a very
  * different parallelism, so any partition-order-dependent float sum,
  * unstable tie, or partition-count-leaking id would produce a
  * different answer at scale while staying green locally. This spec
  * replays representative queries — one per risk family — on a cloned
  * session with a co-prime partition count (7 vs the suite's 4) and
  * asserts row-for-row identical output, including float BITS (the
  * driver-gate discipline: -0.0 != +0.0).
  *
  * Families covered: decimal-sum aggregation (entropy), double
  * emission after rounding (regression), the round-8 zipWithIndex /
  * ntile decompositions (chunk_batches, rfm — explicitly
  * partition-count-parameterized machinery), bucketed prefix sums
  * (vocab growth), window decompositions (zscore), WindowGroupLimit
  * arg-max (merge upsert), hash-keyed dedup (exact), and top-k
  * selection with tiebreaks (sample_weighted, sim_search_topk).
  */
class ParallelismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val queries = Seq(
    "agg_entropy", "agg_regression", "chunk_batches", "window_rfm",
    "text_vocab_growth", "window_zscore_rolling", "merge_upsert_latest",
    "dedup_exact", "sample_weighted", "sim_search_topk", "text_zipf_fit",
    // decimal-term divergence + closed-form remainder; day fan-out
    // median; KM ln-sum; integer-exact ACF; 1e-12 fixed-point PageRank;
    // seeded-banding derived check; incremental probe vs persisted index
    "text_js_divergence", "window_rolling_median", "agg_survival_km",
    "agg_autocorrelation", "graph_pagerank", "dedup_fuzzy_minhash",
    "dedup_incremental_minhash", "agg_ks_test", "agg_auc_rank",
    "sim_search_mmr",
    // round-8 tail: cross-doc gram-key shuffle + per-doc island merge;
    // constant-width ROWS frame with integer-encoded tiebreak
    "dedup_substring_spans", "text_winnowing",
    // round-8 close: bottom-k heap with hash ties impossible; fixed
    // 8-bucket writes regardless of input partitioning; decimal-sum
    // importance weights with doc_id tiebreak
    "sample_bottom_k", "join_bucketed_colocated", "sample_dsir",
    "merge_into_cdc", "tokenize_bpe_merges", "profile_key_skew",
    "agg_corr_matrix", "privacy_k_anonymity", "agg_mann_kendall",
    // round-8 tail 2: group-bounded privacy gates (seeded Laplace is a
    // scalar of the group key); Poisson-bootstrap order statistics;
    // exact-integer G² contingency terms
    "privacy_l_diversity", "privacy_dp_count", "agg_bootstrap_ci",
    "text_g2_collocations",
    // round-8 tail 4: exact-moment experimentation stats (CUPED /
    // permutation / delta-method) — decimal moments, seeded arms
    "agg_cuped", "agg_permutation_test", "agg_delta_ratio_ci",
    "sample_neyman_allocation", "graph_reachability_cte",
    "pack_efficiency", "agg_power_analysis", "window_rolling_corr",
    "dedup_lsh_calibration",
    // round-9: hash-derived URL variants collapse to canonical
    // groups; integer stopword-mass gate with exact per-group sums;
    // all-integer log-bucket histogram; total-order vocab cut at 100
    "dedup_url_canonicalize", "text_stopword_ratio",
    "agg_exp_histogram", "text_oov_rate",
    // round-9 batch 3: lead-gap decimal mass ratio; 3-round sync LPA
    // argmax; two round-6-ranked top-k heads intersected
    "window_twap", "graph_community_lpa", "embedding_truncate_quality",
    // round-9 batch 4: source-hash split; integer contribution cap;
    // 256-bucket hash audit; integer mean-threshold bit packing
    "split_group_holdout", "privacy_contribution_bounding",
    "text_feature_hash", "multimodal_ahash",
    // round-9 batch 5: global ntile via the zipWithIndex machinery
    // (the partition-order-sensitive path); integer score bins
    "agg_gains_deciles", "agg_calibration_curve",
    // round-9 batch 6: prefix-digest grouping; integer chi2 numerator
    "dedup_prefix_truncation", "agg_srm_check",
    // round-9 batch 7: footer-stat aggregates; lag-gap quantiles
    "scan_agg_pushdown", "profile_interarrival",
    // round-9 batch 8: global tercile on the round-4 nll
    "text_perplexity_buckets",
    // round-9 batch 9: doubled-rank tie machinery over the value
    // aggregate; log-odds integer count ratios; bag-semantics residual
    // multiplicities; two-phase bucketed per-stratum top-k (the
    // bucket decomposition must pick identical rows at any input
    // partitioning)
    "agg_mann_whitney", "text_log_odds", "set_except_all",
    "set_intersect_all", "sample_stratified_fixed_k",
    // round-9 batch 10: basket ratios from exact integer marginals;
    // nested-leaf projection through the staged struct file
    "agg_association_rules", "source_nested_parquet",
    // round-9 batch 11: telescoped integer ECE/kappa; dyadic-weight
    // RBO over two k-heap heads
    "agg_ece", "agg_cohen_kappa", "text_rbo_overlap",
    // round-9 batch 12: commutative checksum (order independence IS
    // the claim); bounded-lookahead label join with per-probe 1-heap
    "agg_table_checksum", "join_asof_forward",
    // round-9 batch 13: keyed-surrogate integrity checksum; inverted-
    // index vocabulary pair meet
    "privacy_pseudonymize", "text_source_vocab_jaccard",
    // round-9 batch 14: exact group moments + decimal A-sum
    "agg_anova_f",
    // round-9 batch 15: per-probe 5-heaps over one corpus pass;
    // decimal per-(stratum, arm) masses
    "sim_search_batch_topk", "agg_stratified_effect",
    // round-9 batch 16: integer lag-7 error sums per type
    "window_forecast_backtest",
    // round-9 batch 17: doubled-midrank machinery over value tables
    // (Kruskal/Spearman), value-space pair concordance, doubled group
    // medians, endpoint-degree moments over the kNN edge list
    "agg_kruskal_wallis", "agg_spearman_corr", "agg_kendall_tau",
    "agg_levene_test", "graph_assortativity",
    // round-9 batch 18: per-user attribution carries; weighted-median
    // cumulative pick; integer TVD release decisions; LPA-label edge
    // meet; tolerance-banded 1-heap as-of; min-ownership shingles
    "agg_attribution", "agg_weighted_median", "privacy_t_closeness",
    "graph_modularity", "join_asof_tolerance", "text_ngram_novelty",
    // round-9 batch 19: iterative peel, bucketed band-join aggregates,
    // cell-expansion spatial counts, largest-remainder ranks, runner-up
    // centroid argmin
    "graph_kcore", "join_window_aggregate", "join_geo_grid",
    "window_allocate_remainder", "embedding_silhouette",
    // round-9 batch 20: bucketed sweep prefix sums, crossing-pick
    // quantiles, bigram-type statistics, cell-rep argmin decisions
    "window_max_concurrency", "agg_conformal_interval",
    "text_kneser_ney", "dedup_semdedup",
    // round-9 batch 21: dim-buffer reduction, p95 crossing pick
    "embedding_isotropy", "agg_mean_excess",
    // round-9 batch 22: beam expansion over the kNN edge table
    "sim_search_graph_beam",
    // round-9 batch 23: bucketed CDF integration, 51-head order
    // stats, struct-tagged gram explode
    "agg_cvm_test", "agg_hill_tail_index", "text_distinct_ngrams",
    // round-9 batch 24: two-level argmin chain, decimal ESS sums
    "embedding_rvq_encode", "agg_weight_ess",
    // round-9 batch 25: double global-index chain, cell argmin join
    "agg_average_precision", "join_spatial_knn",
    // round-9 batch 26: recursive hierarchy aggregation
    "hierarchy_rollup_cte",
    // round-9 batch 27: synchronous HITS rounds
    "graph_hits",
    // round-9 batch 28: bounded-state native sampler, HRW argmax
    "agg_sample_native", "sample_rendezvous_shard",
    // round-9 batch 29: double-dedup fan-out, per-doc reassembly
    "agg_dau_wau", "multimodal_chunk_roundtrip",
    // round-9 batch 30: sketch window-union over the daily series
    "window_mau_sketch",
    // round-9 batch 31: global spend ntile via the zipWithIndex
    // machinery; order-keyed pair projection with total-order top-50
    "agg_lorenz_curve", "graph_copurchase_projection",
    // round-9 batch 32: within-block integer ranks; banded-join
    // two-pick median over double slope ordering; seeded-noise
    // threshold release
    "agg_friedman_test", "window_theil_sen", "privacy_dp_histogram",
    // round-9 batch 33: 7-row centered frames; micro-integer argmin
    // + decimal scatter sums; rank-ordered integer BH step-up
    "window_seasonal_index", "embedding_calinski_harabasz",
    "agg_bh_fdr",
    // round-9 batch 34: doubled-rank quartile picks + fence census;
    // global prime-step picks via the zipWithIndex machinery
    "agg_tukey_outliers", "sample_systematic", "agg_cochran_q",
    // round-9 batch 35: presence-bit captures; fixed-product decile
    // bucketing; keyed lag/frame features
    "agg_capture_recapture", "agg_pass_at_k", "window_lag_features",
    // round-9 batch 36: per-probe 1-heaps with label filters;
    // 64-group micro moments; seeded-coin debiasing
    "sim_hard_negatives", "embedding_dim_stats",
    "privacy_randomized_response",
    // round-9 batch 37: degree-ordered wedge closure; session-island
    // global median via zipWithIndex; scaled prefix deviations
    "graph_clustering_coefficient", "agg_session_stats",
    "window_rescaled_range",
    // round-9 batch 38: band-keyed pair join; keyed cumulative
    // interval picks; bucketed contingency fan
    "multimodal_near_dup", "sample_pps_systematic", "agg_roc_points",
    // round-9 batch 39: reverse-cumulative recovery lookup; global
    // cumulative above the day rollup
    "agg_mtbf_mttr", "window_slo_burn",
    // round-9 batch 40: day-shifted self-joins; cohort-keyed
    // cumulative decimal masses
    "agg_growth_accounting", "window_cohort_ltv",
    "window_turning_points",
    // round-9 batch 41: pivoted per-dow moments; eight-cell DiD
    "window_seasonal_strength", "agg_diff_in_diff",
    // round-10: gridCumulative consumers (bucket count derives from
    // shuffle partitions — the cumulative must be invariant to it);
    // global activity deciles via zipWithIndex; the SymSpell deletion
    // join's distinct-pair set; per-bucket decimal gradient sums;
    // two-level walk over the collected type-edge relation; exact
    // partial-bucket CVaR takes; decimal EM masses
    "agg_cliffs_delta", "agg_anderson_darling",
    "agg_brier_decomposition", "dedup_edit_distance",
    "text_classifier_train_step", "graph_scc",
    "graph_harmonic_centrality", "agg_cvar", "agg_em_step",
    "agg_nelson_aalen", "text_quality_classifier",
    "composite_curation_classified", "embedding_davies_bouldin",
    "embedding_drift", "window_page_hinkley", "agg_fleiss_kappa",
    "agg_granger_causality", "subquery_lateral",
    // round-10 late: merged-grid matching windows; high-value baskets
    "agg_att_matching", "agg_association_rules",
    // round-11: the unrolled SGD loop (per-bucket decimal gradients
    // and per-doc rounded losses at every step)
    "text_classifier_train_loop",
    "agg_trimmed_mean", "agg_shapley_attribution",
    "text_burrows_delta",
    "dedup_cdc_chunking", "sample_coreset_kcenter",
    // round-12: IVFADC top-10 with (adc, id) ties; 4-round min-relax
    // unions; per-doc phrase windows + per-doc top-3 heaps; noisy-rank
    // pick over (value, event_id) ties; gazetteer mention aggregate
    "sim_search_ivf_pq", "graph_sssp_weighted", "text_keyword_rake",
    "privacy_dp_quantile", "text_ner_gazetteer",
    // round-12 batch 2: bottom-64 hash heap per cell; noisy-count
    // rank ties; per-type collect-sort + integer fold; generated-DCT
    // bit keys
    "agg_kmv_distinct", "privacy_dp_topk", "window_holt_linear",
    "multimodal_phash", "multimodal_scene_cut", "multimodal_tempo")

  private def bits(v: Any): Any = v match {
    case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d)
    case f: java.lang.Float => java.lang.Float.floatToRawIntBits(f)
    case x => x
  }

  private def run(s: SparkSession, name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(s, sf).collect().toSeq
      .map((r: Row) => r.toSeq.map(bits))

  test("results are bit-identical at a different shuffle-partition count") {
    val alt = spark.newSession()
    // newSession has a fresh temp-function registry — the custom SQL
    // functions (graft_ares_sample etc.) must be re-registered
    graft.ingest.Codecs.register(alt)
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    for (q <- queries) {
      val base = run(spark, q)
      val other = run(alt, q)
      assert(base == other,
        s"$q differs between 4 and 7 shuffle partitions: " +
          s"first-diff=${base.zip(other).find { case (a, b) => a != b }}")
    }
  }

  /** The distributed total-order machinery (Ordered.withGlobalIndex,
    * the bucketed prefix sums) derives its parallelism from
    * `spark.sql.shuffle.partitions` since round 9 — so on a
    * 1000-executor cluster it fans out with the cluster instead of
    * capping at a literal 32. This test pins the other half of that
    * contract: the ANSWER must not move when the derived width does.
    * Each consumer family runs at 8 and at 64 shuffle partitions
    * (straddling the old literal) and must agree bit-for-bit. */
  test("withGlobalIndex consumers are bit-identical at 8 and 64 parts") {
    val consumers = Seq("chunk_batches", "window_rfm",
      "text_vocab_growth", "agg_ks_test", "agg_auc_rank",
      "agg_gains_deciles", "agg_brier_decomposition")
    val s8 = spark.newSession()
    s8.conf.set("spark.sql.shuffle.partitions", "8")
    val s64 = spark.newSession()
    s64.conf.set("spark.sql.shuffle.partitions", "64")
    for (q <- consumers) {
      val a = run(s8, q)
      val b = run(s64, q)
      assert(a == b,
        s"$q differs between 8 and 64 shuffle partitions: " +
          s"first-diff=${a.zip(b).find { case (x, y) => x != y }}")
    }
  }
}
