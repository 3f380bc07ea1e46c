"""NULL/NaN hardening gate (VERDICT r5 ask 5).

Runs the float-aggregate, window, and text families against
``testdata_derived/nulls`` — the sf0.01 tables with ~3% NULL and ~3%
NaN planted in events.value and ~6% empty/whitespace-only document
texts (tools/gen_derived.py --nulls) — through the same oracle compare
the driver uses. These inputs exercise guards no standard fixture
reaches; building this gate found and fixed four real divergences in
round 6:

1. NaN meeting a DECIMAL cast: Spark silently NULLs, DuckDB faults —
   the whole exact-sum family now pins NaN≡missing on both engines
   (functions/exact.py _not_nan/_nn_sql);
2. NaN ordering inside exact percentiles: Spark sorts it greatest,
   DuckDB propagates — NaN now maps to NULL inside the quantile
   argument (agg_percentile) or is filtered with identical text
   (agg_mad_robust, agg_harmonic_mean, agg_gini_concentration,
   win_anomaly_zscore, agg_corr_covar pairwise-complete);
3. mixed-pair statistics: corr/covar sums excluded a NaN coordinate
   while the shared n still counted the row — now pairwise-complete;
4. tokenizer divergence on whitespace-only docs: Spark split("\\s+")
   vs oracle string_split(' ') gave 2 vs 6 pieces — textops.tokens is
   now the oracle's exact single-space twin.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.oracle_compare import assert_same_result, duck_fetch

NULLS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "testdata_derived", "nulls")

needs_nulls = pytest.mark.skipif(
    not os.path.isdir(NULLS_DIR),
    reason="generated fixture missing — run tools/gen_derived.py --nulls")

# The gate: every id here must be ORACLE-green on the adversarial
# fixture (≥15 required by VERDICT r5 ask 5; this list holds 24).
GATE_IDS = [
    # float-aggregate family
    "agg_basic", "agg_stddev_var", "agg_skew_kurt", "agg_corr_covar",
    "agg_percentile", "agg_mad_robust", "agg_harmonic_mean",
    "agg_minmax_range", "agg_histogram_fixed_bins",
    "agg_iqr_outlier_count", "agg_gini_concentration",
    "agg_ks_2sample", "agg_welch_ttest",
    # window family
    "agg_time_weighted_avg", "win_rolling_skew_kurt",
    "win_anomaly_zscore", "time_bucket_gapfill",
    # text family over empty/whitespace docs
    "text_quality_filter", "text_lang_id", "text_token_count",
    "text_gopher_quality", "dedup_ngram_jaccard", "text_tfidf_topk",
    "text_bm25_topk",
    # round-6 h..o additions (the gate caught two real misses on day
    # one: win_rsi and win_stochastic_osc lacked the NaN≡missing
    # guard, so an unguarded NaN meeting their DECIMAL window casts
    # faulted DuckDB outright — both now filter up front)
    "stat_anova_oneway", "stat_kruskal_wallis", "stat_levene_test",
    "stat_jarque_bera", "win_rsi", "win_stochastic_osc",
    "win_growth_index", "win_atr", "win_parkinson_volatility",
    "win_ulcer_index", "feature_scaler_train_fit",
    "feature_quantile_binning", "agg_gini_split_gain",
    "ml_auc_roc", "ml_log_loss", "ml_brier_score",
    "ml_ece_calibration", "ml_lift_gain_deciles", "ml_psi_drift",
    "ml_confusion_threshold", "ml_pr_auc", "ml_roc_curve",
    "win_sma_crossover", "win_record_highs",
    "text_char_entropy_filter", "text_llr_keyness",
    "text_pmi_cooccurrence", "ts_ljung_box", "win_underwater_duration",
    "ml_matthews_corr", "ml_cohen_kappa", "agg_var_cvar",
    "dedup_telemetry_debounce", "agg_interarrival_burstiness",
    "agg_peak_to_avg_ratio",
    # round-7 sweep (VERDICT r6 ask 8): every remaining round-6
    # float-emitting oracle id — the adversarial NULL/NaN fixture is
    # the only place their guards are exercised.
    "ab_cuped_adjustment", "ab_power_sample_size", "ab_srm_check",
    "agg_circular_mean", "agg_covariance_matrix",
    "agg_dau_mau_stickiness", "agg_geometric_mean",
    "agg_kl_divergence", "agg_kmv_distinct_sketch",
    "agg_mannwhitney_u", "agg_ols_multivariate", "agg_regr_family",
    "agg_shannon_entropy", "agg_trimmed_mean", "agg_tvd_drift",
    "feature_rfm_scores", "feature_woe_iv", "geo_haversine_trips",
    "label_survival_km", "ml_kmeans_two_iter",
    "scalar_rounding_conventions", "scan_jsonl_corrupt",
    "sink_compressed_codecs", "sink_sorted_clustered",
    "sql_insert_dml", "sql_join_hints", "sql_pivot_unpivot",
    "sql_values_table", "stat_bootstrap_ci_hash", "stat_cohens_d",
    "stat_cramers_v", "stat_mutual_information", "stat_spearman_corr",
    "stat_tukey_hsd", "stat_wilson_ci", "text_rake_keywords",
    "text_readability", "text_unigram_logprob",
    "time_resample_linear", "ts_acf_multi_lag",
    "vec_random_projection_jl", "vocab_zipf_slope",
    "win_bollinger_bands", "win_cross_sectional_rank",
    "win_decay_score", "win_mann_kendall", "win_rolling_iqr_anomaly",
    "win_theil_sen", "win_vwap",
    # round-7 additions with float totals
    "snapshot_time_travel", "merge_cow_commit", "stream_source_offsets",
    "snapshot_schema_evolution_cow", "snapshot_incremental_diff",
    "snapshot_vacuum_orphans", "snapshot_concurrent_writers",
    "stat_two_proportion_z", "agg_page_hinkley_drift",
    "stat_rank_biserial", "win_kaufman_er",
    "feature_cyclical_time_encode", "ab_sequential_sprt",
    "vec_prefix_energy_matryoshka",
    "ml_ndcg_at_k", "ml_mrr_at_k", "win_donchian_channel",
    "ts_adf_stat", "agg_two_sample_poisson",
    "stream_cow_upsert_sink", "agg_ratio_delta_method",
    "ts_hurst_exponent",
    "stat_permutation_test_hash", "graph_jaccard_link_predict",
    "stat_sign_test", "agg_mcnemar_test",
    "ml_pinball_loss", "agg_cochran_q", "audit_pii_scrub_regex",
    "dedup_lsh_recall_eval", "seq_markov_entropy_rate",
    "label_cumhazard_nelson_aalen", "agg_hodges_lehmann",
    "data_class_weight_balanced", "ts_durbin_watson",
    # round-8 additions with float totals
    "snapshot_mor_read", "snapshot_mor_compact",
    "agg_approx_distinct", "agg_hll_sketch_merge",
    "ml_ks_separation", "ml_fairness_parity",
    "agg_median_of_means", "maintain_clustering_depth",
    "stream_mor_upsert_sink", "feature_target_encoding_cumulative",
    "audit_split_exact_leak", "vocab_coverage_curve",
    # round-9: the five former rows-only dedup/ANN ids, upgraded to
    # planted-twin evals with full SQL oracles (VERDICT r8 ask 2)
    "dedup_fuzzy_minhash", "dedup_simhash", "dedup_minhash_cluster",
    "sim_lsh_ann", "sim_ivf_ann",
    # round-9 additions with float outputs
    "ml_regression_metrics", "stat_friedman_test", "win_keltner_channel",
    "win_pivot_points", "data_group_split_entity", "seq_bigram_perplexity",
    "agg_lorenz_curve", "feature_count_freq_encoding",
    # round-9 session 2: former rows-only upgrades (bound/invariant/
    # header-parse evals) + the q_round9b batch
    "agg_percentile_approx", "agg_histogram_equiheight",
    "rollup_kll_quantile_merge", "vec_pca_power_iteration",
    "stat_changepoint_pettitt", "feature_vif", "causal_did_estimator",
    "causal_iptw_subclass", "ltv_cohort_triangle", "ts_granger_lite",
    "win_hampel_filter", "dq_quarantine_dlq",
    "ml_learning_curve", "time_downsample_m4", "geo_grid_dbscan",
    "stat_js_divergence", "stat_welch_anova", "agg_retention_half_life",
    "win_rolling_beta", "win_rolling_distinct_users",
    "stream_m4_downsample", "sql_except_intersect",
    "maintain_analyze_stats", "funnel_time_to_convert",
    "snapshot_refs_rollback",
    "stat_cochran_armitage_trend", "ab_bayes_beta_binomial",
    "audit_schema_contract", "stat_capture_recapture",
    "ts_cross_correlation_lags", "stat_odds_ratio_mh",
    "agg_gumbel_block_maxima", "agg_theil_index",
    "agg_herfindahl_index",
    # round 10: the upgraded HRV bound/planted evals + the new batch
    "hrv_freq_domain", "hrv_freq_domain_sliding", "hrv_sampen",
    "hrv_tinn", "hrv_dfa", "hrv_lomb_scargle",
    "stat_bh_fdr", "stat_kendall_tau_b", "data_sample_hash_priority",
    "ml_threshold_confusion", "ts_pacf_durbin_levinson",
    "win_rolling_sharpe", "ts_seasonal_strength",
    # round 11: the metastore catalog surface (nulls fixture exercises
    # NaN prices through the decimal-string total and any null
    # partition values through the Hive default-partition path)
    "catalog_hive_roundtrip", "catalog_hive_msck_repair",
    "catalog_hive_partition_pruning",
    # round 11 session 2: every new id that consumes events.value or
    # document text — the planted NULL/NaN values and whitespace-only
    # docs are exactly what their guards exist for
    "stat_brunner_munzel", "stat_anderson_darling_2samp",
    "stat_wasserstein_1d", "stat_cramer_von_mises_2samp",
    "stat_mood_median_test", "stat_ansari_bradley",
    "ml_auc_delong_ci", "ml_conformal_split_interval",
    "ml_lof_daily", "ml_isotonic_calibration", "ml_topk_accuracy",
    "ts_matrix_profile_discord", "stat_page_trend_test",
    "text_bleu_corpus", "text_rouge2_by_source",
    "funnel_shapley_attribution",
    # round 11 session 3: every new id that consumes events.value or
    # document text (the non-events/text ids of the session —
    # Hill/GPD/Fleiss/kappa/RBO/jackknife/L-moments/skyline etc. run
    # on never-nulled TPC-H columns and are gated by the driver-style
    # nulls check instead)
    "stat_jonckheere_terpstra", "stat_fligner_killeen",
    "ml_spiegelhalter_z", "ml_hosmer_lemeshow",
    "ml_brier_decomposition", "causal_event_study",
    "ts_kpss_stat", "ts_spectral_entropy", "win_adx_dmi",
    "stat_cuzick_trend", "stat_quade_test", "agg_huber_m_location",
    "vocab_kneser_ney_bigram", "data_tokenizer_fertility",
    "text_bigram_cross_entropy", "vocab_chao1_unseen",
    "win_rolling_sortino", "stat_chow_test",
    "audit_hash_uniformity_ks", "stat_changepoint_cusum_mean",
    "data_source_overlap_matrix", "ts_cointegration_engle",
    "stat_meta_dersimonian_laird", "stat_cronbach_alpha",
    "win_macd", "agg_renyi_collision_entropy", "ts_ar1_halflife",
    "stat_bartlett_test",
]


@pytest.fixture(scope="module")
def nulls_duck():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{NULLS_DIR}/{t}.parquet'")
    yield con
    con.close()


@needs_nulls
def test_fixture_actually_plants_adversarial_values(nulls_duck):
    """Guard the guard: the fixture must contain real NULLs, NaNs and
    degenerate texts, or the gate below proves nothing."""
    n_null, n_nan = nulls_duck.execute(
        "SELECT count(*) FILTER (value IS NULL), "
        "count(*) FILTER (isnan(value)) FROM events").fetchone()
    n_empty, n_ws = nulls_duck.execute(
        "SELECT count(*) FILTER (text = ''), "
        "count(*) FILTER (text <> '' AND regexp_matches(text, '^\\s+$')) "
        "FROM documents").fetchone()
    assert n_null >= 100 and n_nan >= 100, (n_null, n_nan)
    assert n_empty >= 5 and n_ws >= 5, (n_empty, n_ws)


@needs_nulls
@pytest.mark.parametrize("name", GATE_IDS)
def test_nulls_gate(name, spark, nulls_duck):
    import __spark_entry__ as e

    qs, orc = e.queries(), e.oracle_sql()
    sdf = qs[name](spark, NULLS_DIR)
    spdf = sdf.toPandas()
    dpdf = duck_fetch(nulls_duck, orc[name])
    assert_same_result(
        name, list(spdf.columns),
        list(spdf.itertuples(index=False, name=None)),
        list(dpdf.columns),
        list(dpdf.itertuples(index=False, name=None)))
