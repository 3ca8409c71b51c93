"""Driver-gate mimic: Ray queries vs DuckDB oracles on sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()

SUBSET = [
    "q1_pricing_summary",
    "q3_order_revenue",
    "q5_nation_revenue",
    "events_by_type",
    "user_sessions",
    "doc_dedup_exact",
    "word_frequency",
    "doc_mentions",
    "cooccur_edges",
    "triples_canonical",
    "knn_bruteforce",
    # round-2 operators
    "purchase_since_signup",
    "top_events_per_user",
    "user_sliding_window",
    "doc_tfidf",
    "word_pmi_bigrams",
    "knn_self_join",
    "doc_language_id",
    "kg_string_relation",
    "kg_entity_types",
    "kg_entity_extraction",
    "q3_colocated",
    "user_session_spans",
    "quantity_quantiles",
    "kg_kegg_relation",
    # SQL reimplementations of the md5-derived kernels
    "dedup_simhash",
    "distinct_users_hll",
    # connected components vs recursive-CTE transitive closure
    "dedup_components",
    "kg_graph_nodes",
    "kg_pagerank",
    "lineitem_profile",
    "price_quantiles_hist",
    "word_heavy_hitters",
    "doc_chunks",
    "doc_decontaminate",
    "doc_pii_scrub",
    "doc_repetition",
    "lang_balance_sample",
    # round-2 late additions
    "semantic_dedup",
    "doc_pack_blocks",
    "code_commit_diff",
    # classic join/agg topologies (q7/q10/q12/q14/q18/q19/q21/q22 shapes)
    "cross_nation_trade",
    "top_return_customers",
    "urgent_by_linestatus",
    "promo_revenue_ratio",
    "large_orders",
    "disjunctive_revenue",
    "rich_idle_customers",
    "sole_return_suppliers",
    # graph kernel + code-table SCD2 history
    "kg_triangles",
    # local clustering coefficient (shares the triangle plan) + the
    # event-type Markov stationary distribution (unrolled power iteration)
    "kg_clustering_coeff",
    "event_type_stationary",
    "code_file_history",
    # per-row LAG window
    "user_event_gaps",
    "events_global_rank",
    "user_moving_avg",
    "code_secret_scan",
    "supplier_name_neardup",
    "price_quantiles_cont",
    "lineitem_checksum",
    "er_golden_records",
    "user_final_state",
    "user_event_paths",
    "cohort_retention",
    "word_countmin",
    "peak_concurrency",
    "lineitem_constraints",
    "embedding_norms",
    "doc_inverted_index",
    "user_value_rank",
    "value_outliers",
    "code_lang_loc",
    "hll_user_overlap",
    "code_import_history",
    "code_deps_asof",
    "source_heavy_words",
    "top_similar_docs",
    "value_winsorized",
    "forecast_revenue",
    "value_quantiles_cont_by_type",
    "supplier_name_clusters",
    "doc_containment",
    "embedding_covariance",
    "nation_revenue_share",
    "customer_pareto",
    "daily_top_users",
    "top_supplier_revenue",
    "event_type_transitions",
    # semi-structured JSON field extraction
    "event_props_stats",
    # winnowing clone detection over the code table
    "code_clone_pairs",
    # distributed FULL OUTER join
    "signup_purchase_users",
    # CUBE: all 2^n grouping sets
    "lineitem_cube",
    # per-group HLL registers rebuilt in SQL
    "distinct_users_hll_by_type",
    # time-series pct-change over a distributed aggregate
    "monthly_revenue_growth",
    # temperature-weighted source mixing
    "source_mixture_sample",
    # single-source BFS levels (recursive-CTE oracle)
    "kg_bfs_levels",
    # composed ER: blocking -> jaccard verify -> connected components
    "er_entity_clusters",
    # canonical-doc keep policy per dup cluster
    "dedup_keep_best",
    # windowed COUNT DISTINCT (explode + double dedup)
    "rolling_active_users",
    # ER blocking (rewritten size-class pair generation + combiner CBS)
    "er_blocking_pairs",
    # rewritten to the combiner aggregate (was native multi-col groupby)
    "user_hourly_activity",
    # composed curation recipe: gates -> dedup -> decontamination
    "curate_corpus",
    # incremental aggregation: state(t1) + delta == full recompute
    "events_incremental_hourly",
    # per-repo catalog stats over the code table
    "code_repo_stats",
    # grouped bivariate regression/correlation from one moment pass
    "lineitem_regression",
    # distributed BPE training vs the textbook serial Sennrich loop
    "bpe_merges",
    "bpe_token_counts",
    # deterministic TransE-style tail-corruption negatives (filtered)
    "kg_negative_samples",
    # synchronous weighted label propagation (unrolled-CTE oracle)
    "kg_communities",
    # 2-D box query over the z-ordered store
    "events_box_pruned",
    # FIRST_VALUE/LAST_VALUE rollup window + distinct set operations
    "user_first_last_event",
    "lang_token_set_ops",
    # Dunning G² keyness + per-label embedding centroids
    "lang_token_association",
    "label_centroids",
    # product quantization: per-subspace Lloyd chains in SQL
    "embedding_pq_codes",
    "knn_pq",
    # BM25 retrieval + Zipf-law OLS fit
    "doc_bm25",
    "word_zipf_fit",
    # approximate IVF with the deterministic Lloyd quantizer: probe sets,
    # list assignments and within-list ranking recomputed in SQL
    "knn_ivf_probed",
    # sampled-quantizer IVF: hash-sample trains the Lloyd chain (round 3)
    "knn_ivf",
    # DSIR importance resampling: hashed-unigram LM log-ratio selection
    "dsir_select",
    # HITS hubs/authorities, unrolled-round SQL recurrence (round 3)
    "kg_hits",
    # interval RANGE-frame window (peer-inclusive, varying width)
    "user_range_window",
    # composed RAG pipeline: chunk -> actor-pool embed -> cosine top-k
    "rag_retrieval",
    # retrieval metrics (MRR / NDCG@5 / P@5) + exact distributed ROC-AUC
    "rag_retrieval_eval",
    "events_score_auc",
    # two-stage retrieve-then-rerank (cross-encoder actor-pool stage)
    "rag_rerank",
    # E-S weighted sample pushed into the shuffle join (EDBT'23 shape)
    "sample_join_weighted",
    # watermark late-arrival accounting via the distributed prefix-max scan
    "events_late_arrivals",
    # k-core peeling over the strong-edge KG (unrolled-CTE oracle)
    "kg_kcore",
    # drift monitoring: smoothed PSI bins + exact two-sample KS + chi2
    "events_drift_psi",
    "events_value_ks",
    "events_type_dow_chi2",
    # shuffle-key skew diagnostics (sum-decomposable statistics)
    "events_key_skew",
    # time-grid densification with forward-fill (generated-grid as-of)
    "user_value_resampled",
    # market-basket pair mining over bounded order baskets
    "part_copurchase",
    # Adamic-Adar link prediction over non-adjacent strong-edge pairs
    "kg_link_prediction",
    # graph-health diagnostics (power-law alpha, assortativity)
    "kg_graph_stats",
    # incremental sessionize: oracle is the full recompute
    "user_sessions_incremental",
    # bigram LM scored via a distributed fact-fact join
    "doc_bigram_perplexity",
    # exact weighted median via the shared ordered-count scan
    "price_weighted_median",
    # stream-stream windowed join (time-band equi-join per user)
    "error_click_correlation",
    # embedding cluster-cohesion diagnostics (silhouette-lite)
    "embedding_cohesion",
    # hashed-linear-model inference (fastText-style quality filter)
    "doc_classifier_score",
    # TPC-H q13 custdist (left-outer join + double aggregate)
    "customer_order_distribution",
    # 2-D skyline via local-frontier union (no shuffle)
    "lineitem_skyline",
    # TPC-H q2 shape: group-wise argmin join (aggregate-rejoin-tiebreak)
    "cheapest_supplier_per_part",
    # last-touch attribution (composed as-of self-join + window gate)
    "purchase_attribution",
    # contrastive hard-negative mining (label-excluded cosine top-k)
    "hard_negatives",
    # equi-depth histogram build + apply (aggregate -> broadcast -> map)
    "price_decile_stats",
    # round-bounded Bellman-Ford weighted SSSP (unrolled-recursion oracle)
    "kg_sssp_weighted",
    # one-way ANOVA F from one raw-moment pass
    "value_anova_by_type",
    # composed one-row dataset card (two passes, exact integer rates)
    "corpus_report",
    # windowed duplicate suppression (LAG per (user, type))
    "events_dedup_window",
    # classifier reliability bins vs exact-dup labels
    "clf_calibration",
    # k-anonymity audit (quasi-id equivalence classes)
    "events_k_anonymity",
    # doc-diversified retrieval (per-doc max + grouped top-k)
    "rag_retrieval_per_doc",
    # Kaplan-Meier signup->purchase survival with censoring
    "signup_survival_km",
    # exponential smoothing over daily revenue (recursive-CTE oracle)
    "revenue_forecast_ses",
    # T5-style span corruption (deterministic hash coin + rendered md5s)
    "doc_span_corruption",
    # persisted IVF layout: reads only probed partitions, same oracle
    "knn_ivf_store",
    # level-3 frequent itemsets with the A-Priori downward-closure prune
    "part_triple_copurchase",
    # per-file code-quality gates over the latest snapshot
    "code_quality_metrics",
    # per-repo SPDX license census (incl. vendored contamination)
    "code_license_scan",
    # hash-derandomized DeepWalk corpus (argmin step function in SQL)
    "kg_random_walks",
    # seeded synchronous majority rounds over the exact kNN graph
    "embedding_label_prop",
    # Holt linear smoothing: exact float halvings, recursive-CTE oracle
    "holt_forecast",
    # Theil-Sen median slope/intercept via interpolating quantile_cont
    "daily_trend_theilsen",
    # per-predicate cardinality/functionality profile (schema induction)
    "kg_predicate_stats",
    # CCNet head/middle/tail stratification at exact LM-score terciles
    "ccnet_buckets",
    # distant-supervision context windows around vocabulary mentions
    "kg_mention_contexts",
    # repo-pair content-sha Jaccard (fork / vendored-overlap detection)
    "code_fork_pairs",
    # Boruvka MSF vs the cycle-property recursive-CTE oracle
    "kg_spanning_forest",
    # transitive call-graph closure (path doubling vs recursive CTE)
    "kg_reachability",
    # SCC labels via closure + mutual-pair exchange vs recursive CTE
    "kg_scc",
    # directed out-in degree assortativity, exact integer moments
    "kg_assortativity",
    # condensation DAG longest-path strata vs recursive-CTE levels
    "kg_condensation_levels",
    # Weisfeiler-Leman round-2 colors vs the chained md5/string_agg CTEs
    "kg_wl_colors",
    # metapath (predicate-bigram) profile of the heterogeneous code KG
    "kg_metapath_counts",
    # keyless numeric band self-join on exact cents (cell ownership rule)
    "part_price_band_pairs",
    # bow-tie core/in/out/other regions via single-node closure probes
    "kg_bowtie_regions",
    # 4-truss backbone vs the unrolled synchronous-peel oracle
    "kg_ktruss",
    # per-community Newman modularity terms over the shared LPA chain
    "kg_modularity",
    # second-order sequence patterns via double per-user LAG
    "user_event_trigrams",
    # landmark BFS hop histograms vs the (seed, node, d) recursive CTE
    "kg_landmark_distances",
    # random walk with restart to seed set vs the unrolled recurrence
    "kg_personalized_pagerank",
    # q8 market share: exact integer-cents sums, one final division
    "q8_market_share",
    # q9 profit rollup: per-row exact cents through a 3-dim broadcast
    "part_profit_by_nation",
    # q11 concentration: grouped sums vs a global-scalar threshold
    "part_value_concentration",
    # q16 variety: distinct-triple dedup + blacklist anti-semi-join
    "supplier_part_variety",
    # q20 excess quantity: nested pair/part aggregate in one exchange
    "excess_quantity_suppliers",
    # cross-repo call-graph KG triples (def/use shuffle join on fn)
    "code_call_triples",
    # q4 shape: correlated EXISTS evaluated in the join bucket
    "late_shipment_orders",
    # language-detector confusion table vs labels
    "doc_lang_confusion",
    # per-user Shannon entropy over event types
    "user_event_entropy",
    # global max-gap via day-bucket + boundary stitch
    "events_max_gap",
    # q16 shape: grouped exact COUNT DISTINCT
    "brand_supplier_counts",
    # exponentially-decayed counts (order-free streaming popularity)
    "events_decayed_counts",
    # RFM terciles (multi-metric quantile bucketing composition)
    "customer_rfm_segments",
    # integer-exact CUSUM changepoint on the daily series
    "events_changepoint",
    # Benford first-digit forensic audit
    "price_benford",
    # exact Gini via global ranking + one weighted-sum fold
    "revenue_gini",
    # closed-form NB training + eval (one-exchange sufficient statistics)
    "nb_lang_classifier",
    # directed-edge reciprocity via self-reversal semi-join
    "kg_reciprocity",
    # functional-dependency discovery profile (distinct-pair reduction)
    "part_fd_violations",
    # sample ACF of the daily value series on the dense day grid
    "events_autocorrelation",
    # top principal component via unrolled normalized power iteration
    "embedding_pca_power",
    # Gopher rule-based quality report (flattened-token Arrow kernels)
    "gopher_quality_rules",
    # Mann-Whitney rank-sum z via the shared ordered-count scan
    "events_mannwhitney",
    # reciprocal-rank fusion of BM25 and Dirichlet query likelihood
    "doc_fusion_rrf",
    # Luby maximal independent set (hash-derandomized rounds)
    "kg_mis",
    # join-consistent hash sampling (pure-function key predicate)
    "orders_consistent_sample",
    # inclusion-dependency (foreign-key) audit via anti semi joins
    "referential_integrity",
    # l-diversity audit over the k-anonymity quasi-id classes
    "events_l_diversity",
    # exact average precision (PR-AUC) via the shared ordered scan
    "events_score_pr_auc",
    # hash-greedy maximal matching (arg-min pick, count==2 winners)
    "kg_maximal_matching",
    # Hampel/MAD robust outlier audit (exact interpolated medians)
    "value_mad_outliers",
    # per-user time-weighted average (LEAD holding intervals)
    "user_time_weighted_value",
    # rich-club coefficient: hub-interconnection density per threshold
    "kg_rich_club",
    # Goh-Barabasi burstiness over pooled per-user inter-event gaps
    "events_burstiness",
    # Count-Min inner-product join-size estimate vs the exact answer
    "join_size_countmin",
    # 4-cycle motif count via the halved co-degree formula
    "kg_square_count",
    # bounded-radius harmonic centrality (all-sources distributed BFS)
    "kg_harmonic_centrality",
    # cross-document duplicated spans (Lee et al. exact-substring signal)
    "doc_cross_dup_spans",
    # sign-LSH banded ANN with the planes regenerated in SQL
    "knn_lsh",
    # MMR diversified retrieval (unrolled greedy-selection oracle)
    "rag_mmr",
    # GloVe-style windowed co-occurrence + frequency-ranked vocabulary
    "word_cooccur_window",
    "token_vocab",
    # Bag-of-Little-Bootstraps CI (hash-derandomized weights)
    "value_mean_blb",
    # DOW seasonal decomposition + categorical information-gain audit
    "dow_seasonality",
    "lang_source_infogain",
    # substring-dedup cut apply + cross-source contamination matrix
    "doc_cut_dup_spans",
    "source_ngram_overlap",
    # persisted per-band LSH index (same oracle as the scan path)
    "knn_lsh_store",
    # round-4: full oracles for the last three unit-only engine ops
    "doc_near_dedup",
    "pca_project_2d",
    "click_purchase_attribution",
]


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype in (np.float64, np.float32):
            df[c] = df[c].astype(np.float64).round(9)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, sf_dir, con):
    got = canon(entrymod.queries()[name](sf_dir))
    want = canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_entry_smoke():
    out = entrymod.entry()
    assert len(out) >= 0
    assert list(out.columns) == ["subj", "pred", "obj"]


def test_rows_only_queries_run(sf_dir):
    qs = entrymod.queries()
    for name in ["doc_language_id", "dedup_simhash", "multimodal_features"]:
        out = qs[name](sf_dir)
        assert len(out) >= 0
