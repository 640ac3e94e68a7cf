"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes every operator from SURVEY.md §2; `oracle_sql()`
gives the DuckDB-equivalent ANSI SQL for each hash-checkable one.
Column names AND integer widths are aligned between the two sides
(computed ints are BIGINT everywhere; doubles feeding the value hash
are rounded identically on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mimir_spark.operators import html as _html
from mimir_spark.operators import winnow
from mimir_spark.operators import (
    advanced,
    itemsets,
    clustering,
    core,
    corpus,
    dedup,
    dedup2,
    editdist,
    features,
    graph,
    html,
    ivfpq,
    lsh_index,
    mltrain,
    multimodal,
    octree,
    packing,
    pipeline,
    pq,
    profiling,
    sketches,
    stats,
    substr,
    quality,
    relational,
    relational2,
    relational3,
    relational4,
    retrieval,
    similarity,
    textstats,
    textstats2,
    tokenizer,
    urls,
    weighted,
)

SF_SMOKE = "/root/testdata/sf0.001"

# lang_id's oracle embeds the SAME seed passages the Spark model
# trains on (single source of truth: textstats.LANG_SEED; the strings
# contain no single quotes by construction).
_LANG_SEED_VALUES = ", ".join(
    f"('{lang}', '{text}')"
    for lang, text in sorted(textstats.LANG_SEED.items())
)


def _pii_oracle() -> str:
    """pii_scrub v2 oracle, assembled from the SAME regex constants the
    Spark operator uses (textstats2) so the two can't drift. DuckDB
    standard strings don't escape-process backslashes, so patterns
    embed verbatim; the Luhn fold and entropy gate are the literal
    list-expression translations of the Spark array expressions."""
    t2 = textstats2
    d = "regexp_replace(c, '[^0-9]', '', 'g')"
    dig = f"CAST(substring({d}, CAST(i AS INT), 1) AS INT)"
    luhn = (
        f"list_sum(list_transform(range(1, length({d}) + 1),"
        f" i -> CASE WHEN (length({d}) - i) % 2 = 1"
        f" THEN CASE WHEN 2 * {dig} > 9 THEN 2 * {dig} - 9"
        f" ELSE 2 * {dig} END ELSE {dig} END)) % 10 = 0"
    )
    chars = (
        "list_transform(range(1, length(k) + 1),"
        " i -> substring(k, CAST(i AS INT), 1))"
    )
    p = (
        f"(CAST(len(list_filter({chars}, x -> x = c)) AS DOUBLE)"
        f" / CAST(length(k) AS DOUBLE))"
    )
    entropy = (
        f"round(-list_sum(list_transform(list_distinct({chars}),"
        f" c -> {p} * ln({p}))) / ln(2), 6)"
    )
    redact = "text"
    for rx, tag in [
        (t2.EMAIL_RE, "<EMAIL>"),
        (t2.SSN_RE, "<SSN>"),
        (t2.CARD_RE, "<CARD>"),
        (t2.PHONE_RE, "<PHONE>"),
        (t2.IP_RE, "<IP>"),
        (t2.KEY_RE, "<KEY>"),
    ]:
        redact = f"regexp_replace({redact}, '{rx}', '{tag}', 'g')"
    return f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{t2.EMAIL_RE}'))::BIGINT AS n_emails,
               len(regexp_extract_all(text, '{t2.PHONE_RE}'))::BIGINT AS n_phones,
               len(regexp_extract_all(text, '{t2.SSN_RE}'))::BIGINT AS n_ssns,
               len(list_filter(regexp_extract_all(text, '{t2.CARD_RE}'),
                   c -> {luhn}))::BIGINT AS n_cards,
               len(list_filter(regexp_extract_all(text, '{t2.IP_RE}'),
                   c -> len(list_filter(string_split(c, '.'),
                        o -> CAST(o AS INT) <= 255)) = 4))::BIGINT AS n_ips,
               len(list_filter(regexp_extract_all(text, '{t2.KEY_RE}'),
                   k -> {entropy} >= {t2.KEY_ENTROPY_BITS}
                        AND regexp_matches(k, '[0-9]')
                        AND regexp_matches(k, '[A-Za-z]')))::BIGINT AS n_keys,
               length({redact})::BIGINT AS clean_len
        FROM documents
    """


_PII_ORACLE = _pii_oracle()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 pricing summary on sf0.001."""
    return relational.q1_pricing_summary(spark, SF_SMOKE)


# The driver's correctness gate walks queries() in order and covers a
# ~50-key window per round, so the first ~50 keys ARE the round's gate.
# Round-14 lead (exactly 50 — entries past the driver's 50-key cut are
# NOT checked, the round-12 lesson): the 4 brand-new keys (frozen
# tokenizer encode pair, byte-level BPE, MJPEG AVI), the 3 keys whose
# implementation changed this round (L-layer graph-ANN pair, the
# shared-scan corpus_keep_list), then ALL 42 keys whose latest driver
# hash is r08-vintage (the round-13 verdict's named rotation target),
# then one r09 key as padding — after this round no key's driver row
# predates r09.
_R14_WINDOW = [
    # new this round
    "unigram_encode_ids_frozen",
    "bpe_encode_ids_frozen",
    "byte_bpe_encode_ids",
    "multimodal_frame_sample_mjpeg",
    # implementation changed this round
    "ann_graph_topk",
    "ann_graph_recall",
    "corpus_keep_list",
    # r08-vintage driver rows (all 42)
    "multimodal_decode_png",
    "multimodal_decode_wav",
    "multimodal_dedup_images",
    "multimodal_frame_sample_gif",
    "multimodal_audio_features",
    "bm25_topk_batch",
    "hybrid_retrieval_batch",
    "phrase_search",
    "phrase_search_batch",
    "constraint_report",
    "dedup_survivors_icws",
    "multimodal_features",
    "corpus_clean_pipeline",
    "repetition_ratio",
    "text_normalize",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "multimodal_meta",
    "frame_sample",
    "json_extract_agg",
    "contamination_check",
    "token_entropy",
    "doc_length_stats",
    "source_mix_report",
    "skew_join_salted",
    "ngram_novelty",
    "user_activity_profile",
    "winsorize_events",
    "embedding_norm_stats",
    "vocab_encode",
    "inverted_index",
    "kv_combine",
    "kv_reduce",
    "distinct_keys",
    "histogram",
    "group_topk",
    "bfs_levels",
    "octree_bin",
    "octree_adaptive",
    "embedding_pca",
    "multimodal_resize",
    # r09 padding (next-oldest rows; exactly 50 total)
    "tfidf",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = _queries_base()
    out = {k: base[k] for k in _R14_WINDOW}
    out.update({k: v for k, v in base.items() if k not in out})
    return out


def _queries_base() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "multimodal_dedup_images_near": multimodal.multimodal_dedup_images_near,
        "multimodal_near_dup_survivors": multimodal.multimodal_near_dup_survivors,
        "kneser_ney3_logppl": quality.kneser_ney3_logppl,
        "dedup_survivors_capped": dedup.dedup_survivors_capped,
        "multimodal_decode_jpeg": multimodal.multimodal_decode_jpeg,
        "token_count_cjk": textstats.token_count_cjk,
        "dsir_weights": quality.dsir_weights,
        "dsir_select": quality.dsir_select,
        "ema_user_value": features.ema_user_value,
        "event_transitions": features.event_transitions,
        "l_diversity_report": profiling.l_diversity_report,
        "t_closeness_report": profiling.t_closeness_report,
        "feature_drift_psi": features.feature_drift_psi,
        "gopher_repetition_filter": quality.gopher_repetition_filter,
        "unicode_nfc_scan": textstats2.unicode_nfc_scan,
        "hypertable_gap_fill": relational.hypertable_gap_fill,
        "time_weighted_avg": relational.time_weighted_avg,
        "hybrid_rrf": retrieval.hybrid_rrf,
        "kneser_ney_logppl": quality.kneser_ney_logppl,
        "multimodal_pixel_features": multimodal.multimodal_pixel_features,
        "multimodal_resize_pixels": multimodal.multimodal_resize_pixels,
        "approx_distinct": core.approx_distinct,
        "approx_quantiles": relational2.approx_quantiles,
        "embedding_gram": clustering.embedding_gram,
        # (new round-9 keys are inserted here as they land)
        "corpus_keep_list": pipeline.corpus_keep_list,
        "minhash_bbit_jaccard": dedup.minhash_bbit_jaccard,
        "bootstrap_ci_poisson": stats.bootstrap_ci_poisson,
        "corr_matrix": stats.corr_matrix,
        "kmv_source_setops": sketches.kmv_source_setops,
        "kcenter_greedy": clustering.kcenter_greedy,
        "holt_linear_user": features.holt_linear_user,
        "benford_digit_test": profiling.benford_digit_test,
        "wordpiece_train": tokenizer.wordpiece_train,
        "unigram_lm_train": tokenizer.unigram_lm_train,
        "scd2_user_state": features.scd2_user_state,
        "winnowing_matches": winnow.winnowing_matches,
        "html_extract_text": html.html_extract_text,
        "unigram_encode_ids": tokenizer.unigram_encode_ids,
        "bpe_encode_ids": tokenizer.bpe_encode_ids,
        "unigram_encode_ids_frozen": tokenizer.unigram_encode_ids_frozen,
        "bpe_encode_ids_frozen": tokenizer.bpe_encode_ids_frozen,
        "byte_bpe_encode_ids": tokenizer.byte_bpe_encode_ids,
        "url_normalize": urls.url_normalize,
        "url_dedup_survivors": urls.url_dedup_survivors,
        "knn_graph_descent": similarity.knn_graph_descent,
        "ann_graph_topk": similarity.ann_graph_topk,
        "ann_graph_recall": similarity.ann_graph_recall,
        "cusum_changepoints": stats.cusum_changepoints,
        "holt_winters_hourly": stats.holt_winters_hourly,
        "theil_sen_hourly": stats.theil_sen_hourly,
        "quantile_binning": features.quantile_binning,
        "feature_hashing": features.feature_hashing,
        "rendezvous_shards": pipeline.rendezvous_shards,
        "wau_hll_sliding": sketches.wau_hll_sliding,
        "attribution_report": features.attribution_report,
        "seasonal_decompose_hourly": stats.seasonal_decompose_hourly,
        "winnow_clusters": winnow.winnow_clusters,
        "kfold_assign": pipeline.kfold_assign,
        "funnel_time_to_convert": features.funnel_time_to_convert,
        "gini_source_concentration": corpus.gini_source_concentration,
        "user_behavior_entropy": features.user_behavior_entropy,
        "hourly_autocorrelation": stats.hourly_autocorrelation,
        "top_session_paths": features.top_session_paths,
        "dp_count_laplace": profiling.dp_count_laplace,
        "linreg_by_group": stats.linreg_by_group,
        "chi2_lang_source": stats.chi2_lang_source,
        "sample_weighted_k": pipeline.sample_weighted_k,
        "logreg_train_quality": mltrain.logreg_train_quality,
        "logreg_score_quality": mltrain.logreg_score_quality,
        "ann_sq_topk": pq.ann_sq_topk,
        "ann_sq_recall": pq.ann_sq_recall,
        "ann_ivfsq_topk": ivfpq.ann_ivfsq_topk,
        "ann_ivfsq_recall": ivfpq.ann_ivfsq_recall,
        "ann_pq_topk": pq.ann_pq_topk,
        "ann_pq_rerank_topk": pq.ann_pq_rerank_topk,
        "ann_pq_recall": pq.ann_pq_recall,
        "dedup_edit_distance": editdist.dedup_edit_distance,
        "dedup_edit_clusters": editdist.dedup_edit_clusters,
        "dedup_edit_survivors": editdist.dedup_edit_survivors,
        "ann_ivfpq_topk": ivfpq.ann_ivfpq_topk,
        "ann_ivfpq_rerank_topk": ivfpq.ann_ivfpq_rerank_topk,
        "ann_ivfpq_recall": ivfpq.ann_ivfpq_recall,
        "dedup_containment_lsh": dedup2.dedup_containment_lsh,
        "containment_lsh_recall": dedup2.containment_lsh_recall,
        "kll_quantiles": sketches.kll_quantiles_banded,
        "tdigest_quantiles": sketches.tdigest_quantiles_banded,
        "sssp_weighted": graph.sssp_weighted,
        "hypertable_rollup": relational.hypertable_rollup,
        "sample_quality_temperature": pipeline.sample_quality_temperature,
        "skyline_orders": relational.skyline_orders,
        "anomaly_mad": features.anomaly_mad,
        # --- oldest driver rows (last checked r4) re-confirmed while
        #     window slots are free ---
        "tfidf": advanced.tfidf,
        "ngram_counts": advanced.ngram_counts,
        "window_suite": advanced.window_suite,
        "asof_join": advanced.asof_join,
        "interval_join": advanced.interval_join,
        "salted_agg": advanced.salted_agg,
        "embedding_centroids": advanced.embedding_centroids,
        "q18_large_orders": relational2.q18_large_orders,
        "q19_bracketed_revenue": relational2.q19_bracketed_revenue,
        "semi_anti_join": relational2.semi_anti_join,
        "rollup_revenue": relational2.rollup_revenue,
        "cube_revenue": relational3.cube_revenue,
        "grouping_sets_revenue": relational3.grouping_sets_revenue,
        "moving_avg_revenue": relational3.moving_avg_revenue,
        "pivot_status_priority": relational2.pivot_status_priority,
        "median_order_value": relational2.median_order_value,
        "secondary_sort": relational2.secondary_sort,
        "q7_volume_shipping": relational3.q7_volume_shipping,
        "q8_market_share": relational3.q8_market_share,
        "q9_profit_by_nation_year": relational3.q9_profit_by_nation_year,
        "q13_order_count_distribution": relational3.q13_order_count_distribution,
        "q15_top_supplier": relational3.q15_top_supplier,
        "q16_supplier_part_variety": relational3.q16_supplier_part_variety,
        "q17_small_qty_revenue": relational3.q17_small_qty_revenue,
        "q22_dormant_customers": relational3.q22_dormant_customers,
        "q12_ship_delay": relational3.q12_ship_delay,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "dedup_containment": dedup.dedup_containment,
        "dedup_jaccard_prefix": dedup2.dedup_jaccard_prefix,
        "dedup_containment_prefix": dedup2.dedup_containment_prefix,
        "lsh_tuning_curve": dedup2.lsh_tuning_curve,
        "bm25_topk": retrieval.bm25_topk,
        "hybrid_retrieval": retrieval.hybrid_retrieval,
        "ccnet_ppl_buckets": quality.ccnet_ppl_buckets,
        "sample_reservoir": pipeline.sample_reservoir,
        "train_val_test_split": pipeline.train_val_test_split,
        "sequence_pack": packing.sequence_pack,
        "dataset_mixture_plan": packing.dataset_mixture_plan,
        "mixture_sample_docs": packing.mixture_sample_docs,
        "mlm_span_corruption_plan": packing.mlm_span_corruption_plan,
        "readability_scores": textstats2.readability_scores,
        "unigram_encode": tokenizer.unigram_encode,
        "clustering_coefficient": graph.clustering_coefficient,
        "table_profile": profiling.table_profile,
        "rfm_segmentation": features.rfm_segmentation,
        "dataset_card": corpus.dataset_card,
        # --- driver-green r5-r8 trail (rotation complete: every oracle
        #     key has a hash-green row; order here is inert) ---
        "corpus_clean_pipeline": pipeline.corpus_clean_pipeline,
        "repetition_ratio": textstats2.repetition_ratio,
        "text_normalize": textstats2.text_normalize,
        "lang_id": textstats.lang_id,
        "lang_id_confidence": textstats.lang_id_confidence,
        "quality_score": textstats.quality_score,
        "token_count": textstats.token_count,
        "doc_fingerprint": textstats.doc_fingerprint,
        "multimodal_meta": multimodal.multimodal_meta,
        "frame_sample": multimodal.frame_sample,
        "json_extract_agg": advanced.json_extract_agg,
        "contamination_check": corpus.contamination_check,
        "token_entropy": corpus.token_entropy,
        "doc_length_stats": corpus.doc_length_stats,
        "source_mix_report": corpus.source_mix_report,
        "skew_join_salted": advanced.skew_join_salted,
        "ngram_novelty": corpus.ngram_novelty,
        "user_activity_profile": features.user_activity_profile,
        "winsorize_events": features.winsorize_events,
        "embedding_norm_stats": features.embedding_norm_stats,
        "vocab_encode": corpus.vocab_encode,
        "wordcount": core.wordcount,
        "wordcount_topk": core.wordcount_topk,
        "inverted_index": core.inverted_index,
        "kv_combine": core.wordcount_via_pipeline,
        "kv_reduce": core.kv_reduce,
        "distinct_keys": core.distinct_keys,
        "histogram": core.histogram,
        "group_topk": core.group_topk,
        "bfs_levels": graph.bfs_levels,
        "octree_bin": octree.octree_bin,
        "octree_adaptive": octree.octree_adaptive,
        "phrase_search_batch": retrieval.phrase_search_batch,
        "multimodal_features": multimodal.multimodal_features_hist,
        "multimodal_decode_png": multimodal.multimodal_decode_png,
        "multimodal_decode_wav": multimodal.multimodal_decode_wav,
        "multimodal_dedup_images": multimodal.multimodal_dedup_images,
        "multimodal_frame_sample_gif": multimodal.multimodal_frame_sample_gif,
        "multimodal_frame_sample_mjpeg": multimodal.multimodal_frame_sample_mjpeg,
        "multimodal_audio_features": multimodal.multimodal_audio_features,
        "bm25_topk_batch": retrieval.bm25_topk_batch,
        "hybrid_retrieval_batch": retrieval.hybrid_retrieval_batch,
        "phrase_search": retrieval.phrase_search,
        "constraint_report": profiling.constraint_report,
        "dedup_survivors_icws": weighted.dedup_survivors_icws,
        "event_windows_sliding": features.event_windows_sliding,
        "hourly_value_correlation": features.hourly_value_correlation,
        "dedup_span_removal": dedup.dedup_span_removal,
        "ddsketch_quantiles": sketches.ddsketch_quantiles,
        "sample_weighted": pipeline.sample_weighted,
        "dup_span_islands": dedup.dup_span_islands,
        "dedup_clusters_star": dedup.dedup_clusters_star,
        "triangle_count": graph.triangle_count,
        "k_truss": graph.k_truss,
        "frequent_pairs": itemsets.frequent_pairs,
        "rake_keywords": textstats2.rake_keywords,
        "unigram_logppl": quality.unigram_logppl,
        "dup_span_fraction": dedup.dup_span_fraction,
        "histogram_quantiles": sketches.histogram_quantiles,
        "cohort_retention": features.cohort_retention,
        "funnel_conversion": advanced.funnel_conversion,
        "gopher_quality_filter": quality.gopher_quality_filter,
        "quality_topk_select": quality.quality_topk_select,
        "zipf_slope": quality.zipf_slope,
        "cooccurrence_pmi": corpus.cooccurrence_pmi,
        "anomaly_zscore": features.anomaly_zscore,
        "dedup_prefix": dedup.dedup_prefix,
        "ann_range_search": similarity.ann_range_search,
        "knn_graph": similarity.knn_graph,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q5_nation_revenue": relational.q5_nation_revenue,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "q10_returned_items": relational.q10_returned_items,
        "sessionize": relational.sessionize,
        "event_windows": relational.event_windows,
        "q4_order_priority": relational2.q4_order_priority,
        "q14_promo_revenue": relational2.q14_promo_revenue,
        "dedup_exact": dedup.dedup_exact,
        "dedup_clusters": dedup.dedup_clusters,
        "dedup_survivors": dedup.dedup_survivors,
        "ann_bruteforce_topk": similarity.ann_bruteforce_topk,
        "pii_scrub": textstats2.pii_scrub,
        "bpe_pair_counts": textstats2.bpe_pair_counts,
        "top_ngrams_per_lang": textstats2.top_ngrams_per_lang,
        "sample_stratified": pipeline.sample_stratified,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "dedup_clusters_lsh": dedup.dedup_clusters_lsh,
        "dedup_survivors_lsh": dedup.dedup_survivors_lsh,
        "dedup_simhash": dedup.dedup_simhash,
        "minhash_containment": dedup.minhash_containment,
        "minhash_dedup_recall": dedup.minhash_dedup_recall,
        "dedup_method_agreement": dedup2.dedup_method_agreement,
        "dedup_lsh_query_indexed": lsh_index.dedup_lsh_query_indexed,
        "max_dup_span": substr.max_dup_span,
        "chunk_documents": packing.chunk_documents,
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "bigram_logppl": quality.bigram_logppl,
        "retrieval_hard_negatives": retrieval.retrieval_hard_negatives,
        "corpus_snapshot_diff": corpus.corpus_snapshot_diff,
        "k_anonymity_report": profiling.k_anonymity_report,
        "shuffle_skew_report": profiling.shuffle_skew_report,
        "multimodal_decode_bmp": multimodal.multimodal_decode_bmp,
        "multimodal_resize_digest": multimodal.multimodal_resize_digest,
        "bpe_train": tokenizer.bpe_train,
        "bpe_encode": tokenizer.bpe_encode,
        "rank_quantiles": sketches.rank_quantiles,
        "dedup_weighted_jaccard": weighted.dedup_weighted_jaccard,
        "dedup_weighted_containment": weighted.dedup_weighted_containment,
        "dedup_weighted_containment_lsh": weighted.dedup_weighted_containment_lsh,
        "weighted_containment_lsh_recall": weighted.weighted_containment_lsh_recall,
        "dedup_icws": weighted.dedup_icws,
        "icws_recall": weighted.icws_recall,
        "k_core": graph.k_core,
        "label_propagation": graph.label_propagation,
        "pagerank": graph.pagerank,
        "dedup_embedding": dedup.dedup_embedding,
        "semdedup": dedup2.semdedup,
        "embedding_clusters": dedup2.embedding_clusters,
        "ann_ivf_topk": similarity.ann_ivf_topk,
        "ann_ivf_recall": similarity.ann_ivf_recall,
        "kmeans_embeddings": clustering.kmeans_embeddings,
        "window_funnel": features.window_funnel,
        "cross_source_duplication": corpus.cross_source_duplication,
        "heavy_hitters_cms": sketches.heavy_hitters_cms,
        "hll_distinct": sketches.hll_distinct,
        "q2_min_cost_supplier": relational4.q2_min_cost_supplier,
        "q11_important_parts": relational4.q11_important_parts,
        "q20_dominant_suppliers": relational4.q20_dominant_suppliers,
        "q21_waiting_suppliers": relational4.q21_waiting_suppliers,
        "degree_distribution": graph.degree_distribution,
        "decontaminate_corpus": corpus.decontaminate_corpus,
        # --- permanent rows-only keys parked past the window (each
        #     already has a no_oracle driver row; blockers documented
        #     in oracle_sql()) ---
        "embedding_pca": clustering.embedding_pca,
        "multimodal_resize": multimodal.multimodal_resize,
    }


_TOK = r"\s+"

_SHINGLES = r"""
    SELECT doc_id,
           list_distinct(
             list_transform(
               generate_series(1, greatest(len(t) - 2, 1)),
               i -> array_to_string(t[i:i+2], ' ')))  AS s
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
          FROM documents)
"""

_COS_PAIR = """
    round(
      list_sum(list_transform(generate_series(1, 64),
               i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(generate_series(1, 64),
               i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
         * sqrt(list_sum(list_transform(generate_series(1, 64),
               i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))), 6)
"""


def _cos_expr(x: str, y: str, digits: int | None = 6) -> str:
    """DuckDB cosine between two list columns; digits=None leaves the
    value unrounded (assignment ARGMAX must compare raw cosines the
    way the NumPy kernel does — rounding before an argmax could merge
    a real winner with a runner-up)."""
    raw = f"""(
      list_sum(list_transform(generate_series(1, 64),
               i -> {x}[i]::DOUBLE * {y}[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(generate_series(1, 64),
               i -> {x}[i]::DOUBLE * {x}[i]::DOUBLE)))
         * sqrt(list_sum(list_transform(generate_series(1, 64),
               i -> {y}[i]::DOUBLE * {y}[i]::DOUBLE)))))"""
    return raw if digits is None else f"round({raw}, {digits})"


# Shared CTE chain: shingle-Jaccard duplicate pairs → undirected edges
# → transitive closure (connected components), used by the
# dedup_clusters / dedup_survivors oracles.
_CLUSTER_CTES = f"""
            WITH RECURSIVE sh AS ({_SHINGLES}),
            sizes AS (SELECT doc_id, len(s) AS n FROM sh),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT doc_a, doc_b FROM inter
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM pairs),
            reach(a, b) AS (
              SELECT src, src FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)"""


# ---- Portable MinHash / SimHash oracle chains --------------------------
# The sketch family is value-hash-checkable because EVERY step is
# plain integer arithmetic both engines compute identically: md5-based
# 31-bit token hash (functions/text.py portable_token_hash31), ×131
# shingle fold, the pinned-seed permutation family
# (dedup.MINHASH_COEFFS), linear band buckets (dedup.BUCKET_COEFFS),
# and per-bit SimHash universal hashes (dedup.SIMHASH_COEFFS). The
# coefficient LITERALS are embedded below from the same module the
# Spark operators read, so the two sides cannot drift.

_M31 = 2_147_483_647

# Portable hashed 3-word shingle sets (mirrors word_shingle_hashes:
# per-token md5-31 hash, ×131 fold with null→0 padding, slice to
# max(len-2, 1), distinct; docs with zero tokens drop out).
_HSH = r"""
  SELECT doc_id, list_distinct(list_transform(
           generate_series(1, greatest(len(th) - 2, 1)),
           k -> (((th[k] * 131 + coalesce(th[k+1], 0)) % 2147483647)
                  * 131 + coalesce(th[k+2], 0)) % 2147483647)) AS s
  FROM (SELECT doc_id, list_transform(
             list_filter(string_split_regex(text, '\s+'), x -> x <> ''),
             tok -> cast(concat('0x', substring(md5(tok), 1, 8)) as bigint)
                    & 2147483647) AS th
        FROM documents)
  WHERE len(th) > 0"""


def _sig_ctes(include_base: bool = True) -> str:
    """hsh → mex → sig: portable hashed shingle sets and the 128
    permutation-minima signature columns h0..h127 (MATERIALIZED —
    DuckDB inlines plain CTEs per REFERENCE and sig is re-read by
    every banding scheme built on it)."""
    mins = ",\n                   ".join(
        f"min(({a} * x + {b}) % {_M31}) AS h{i}"
        for i, (a, b) in enumerate(dedup.MINHASH_COEFFS)
    )
    base = (
        f"""hsh AS MATERIALIZED ({_HSH}),
            mex AS (SELECT doc_id, unnest(s) AS x FROM hsh),
            """
        if include_base
        else ""
    )
    return f"""{base}sig AS MATERIALIZED (
              SELECT doc_id,
                   {mins}
              FROM mex GROUP BY doc_id)"""


def _band_bucket_expr(start: int, rows: int) -> str:
    """The linear band bucket over h{start}..h{start+rows-1} —
    literal twin of dedup.portable_band_bucket."""
    return " + ".join(
        f"h{start + j} * {dedup.BUCKET_COEFFS[j]}" for j in range(rows)
    )


def _lsh_ctes(threshold: float = 0.5, include_base: bool = True) -> str:
    """CTE chain for the MinHash(128)+LSH(32×4) near-dup pipeline,
    ending at `lsh_pairs`(doc_a, doc_b, jaccard): portable hashed
    shingles → 128 permutation minima → 32 linear band buckets →
    bucket-collision candidates → exact hashed-set Jaccard verify."""
    rows = dedup.N_HASHES // dedup.N_BANDS
    bands = "\n              UNION ALL\n".join(
        f"              SELECT doc_id, {band} AS band, "
        + _band_bucket_expr(band * rows, rows)
        + " AS bucket FROM sig"
        for band in range(dedup.N_BANDS)
    )
    return f"""{_sig_ctes(include_base)},
            bk AS MATERIALIZED (
{bands}),
            lcand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bk a JOIN bk b
                ON a.band = b.band AND a.bucket = b.bucket
                   AND a.doc_id < b.doc_id),
            lsh_pairs AS MATERIALIZED (
              SELECT doc_a, doc_b,
                     round(n_common / (na + nb - n_common), 6) AS jaccard
              FROM (SELECT c.doc_a, c.doc_b,
                           len(list_intersect(sa.s, sb.s)) AS n_common,
                           len(sa.s) AS na, len(sb.s) AS nb
                    FROM lcand c
                    JOIN hsh sa ON sa.doc_id = c.doc_a
                    JOIN hsh sb ON sb.doc_id = c.doc_b)
              WHERE round(n_common / (na + nb - n_common), 6)
                    >= {threshold})"""


def _neardup_ctes() -> str:
    """CTE chain for the perceptual image near-dup family, ending at
    `fps`(doc_id, fp), `digs`(doc_id, digest) and `ndx`(doc_id, v, w0,
    h0, s): the 63-bit dHash and exact pixel digest recomputed
    closed-form from encode_near_dup_image's generation rule (see the
    multimodal_dedup_images_near oracle comment)."""
    return """ndx AS (
              SELECT doc_id, doc_id // 4 AS s, doc_id % 4 AS v,
                     ((doc_id // 4) % 12) + 5 AS w0,
                     ((doc_id // 4) % 6) + 5 AS h0
              FROM documents),
            grays AS (
              SELECT doc_id, v, w0, h0, s,
                list_transform(range(0, 72), q ->
                  list_sum(list_transform(
                    list_transform(range(0, 3), c ->
                      ((((q // 9) * h0) // 8) * w0
                       + (((q % 9) * w0) // 9)) * 3 + c),
                    jb -> CASE WHEN v = 3
                          THEN ((s*97 + jb*jb*13 + jb*29) % 256 + 2) % 256
                          ELSE (s*97 + jb*jb*13 + jb*29) % 256 END)) // 3
                ) AS g
              FROM ndx),
            fps AS (
              SELECT doc_id,
                list_sum(list_transform(range(0, 63), k ->
                  CASE WHEN g[(k // 8) * 9 + (k % 8) + 2]
                            > g[(k // 8) * 9 + (k % 8) + 1]
                       THEN (1::BIGINT << k) ELSE 0 END))::BIGINT AS fp
              FROM grays),
            digs AS (
              SELECT doc_id,
                list_reduce(
                  [0::BIGINT,
                   (CASE WHEN v >= 2 THEN 2 * w0 ELSE w0 END)::BIGINT,
                   (CASE WHEN v >= 2 THEN 2 * h0 ELSE h0 END)::BIGINT]
                  || CASE WHEN v < 2
                     THEN list_transform(range(0, w0 * h0 * 3),
                            j -> (s*97 + j*j*13 + j*29) % 256)
                     ELSE list_transform(
                            list_transform(range(0, 12 * w0 * h0), j ->
                              (((j // (6 * w0)) // 2) * w0
                               + (((j // 3) % (2 * w0)) // 2)) * 3
                              + (j % 3)),
                            jb -> CASE WHEN v = 3
                                  THEN ((s*97 + jb*jb*13 + jb*29) % 256
                                        + 2) % 256
                                  ELSE (s*97 + jb*jb*13 + jb*29) % 256 END)
                     END,
                  (acc, b) -> (acc * 131 + b) % 1000000007) AS digest
              FROM ndx)"""


def _simhash_ctes(max_hamming: int = 3, include_base: bool = True) -> str:
    """CTE chain for portable 64-bit SimHash + pigeonhole blocking,
    ending at `sh_pairs`(doc_a, doc_b, hamming): per-bit universal
    hashes of the hashed shingles → sign bits → four 16-bit chunk
    keys → chunk-collision candidates → exact bitwise hamming."""
    bit_sums = ",\n                   ".join(
        f"sum(CASE WHEN (((x * {a} + {b}) % {_M31}) & 1) = 1"
        f" THEN 1 ELSE -1 END) AS s{i}"
        for i, (a, b) in enumerate(dedup.SIMHASH_COEFFS)
    )
    bits = ",\n                   ".join(
        f"(CASE WHEN s{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS t{i}"
        for i in range(64)
    )
    keys = "\n              UNION ALL\n".join(
        "              SELECT doc_id, {c} AS chunk, ".format(c=c)
        + " + ".join(f"t{c * 16 + j} * {1 << j}" for j in range(16))
        + " AS ckey FROM sbits"
        for c in range(4)
    )
    hamming = " + ".join(
        f"(CASE WHEN a.t{i} <> b.t{i} THEN 1 ELSE 0 END)" for i in range(64)
    )
    base = (
        f"""hsh AS MATERIALIZED ({_HSH}),
            mex AS (SELECT doc_id, unnest(s) AS x FROM hsh),
            """
        if include_base
        else ""
    )
    return f"""{base}bsums AS (
              SELECT doc_id,
                   {bit_sums}
              FROM mex GROUP BY doc_id),
            sbits AS MATERIALIZED (
              SELECT doc_id,
                   {bits}
              FROM bsums),
            ck AS MATERIALIZED (
{keys}),
            scand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM ck a JOIN ck b
                ON a.chunk = b.chunk AND a.ckey = b.ckey
                   AND a.doc_id < b.doc_id),
            sh_pairs AS (
              SELECT c.doc_a, c.doc_b, ({hamming})::BIGINT AS hamming
              FROM scand c
              JOIN sbits a ON a.doc_id = c.doc_a
              JOIN sbits b ON b.doc_id = c.doc_b
              WHERE ({hamming}) <= {max_hamming})"""


def _containment_lsh_ctes(threshold: float = 0.8) -> str:
    """CTE chain for the asymmetric size-class containment banding
    (dedup2.containment_lsh_pairs), ending at
    `cont_pairs`(doc_a, doc_b, containment). The per-class-pair
    rows-per-band table is data-INDEPENDENT (only (i, j, threshold)
    enter dedup2._containment_band_configs), so the oracle emits the
    config for classes 0..20 statically; class pairs absent from the
    data simply produce no candidates. Signatures/buckets AND the
    sizes/verification sets are all the portable md5-31 folded family
    (hsh) — the identical ids the Spark kernel computes, so a 31-bit
    merge happens on both engines at once (bit-exact, not merely
    count-identical)."""
    from mimir_spark.operators.dedup2 import _containment_band_configs

    cfg = _containment_band_configs(list(range(21)), threshold, dedup.N_HASHES)
    rs = sorted({r for _, _, r in cfg})
    parts = []
    for r in rs:
        bands = "\n              UNION ALL\n".join(
            f"              SELECT s.doc_id, c.cls, {b} AS band, "
            + _band_bucket_expr(b * r, r)
            + " AS bucket FROM sig s JOIN csz c ON c.doc_id = s.doc_id"
            for b in range(dedup.N_HASHES // r)
        )
        parts.append(f"bk{r} AS MATERIALIZED (\n{bands})")
    # r=1 tier mirrors dedup2.R1_MIN_COLLISIONS: its single-hash
    # S-curve sits far below every class pair's J floor, so a pair
    # must hit >= 2 distinct bands to become a candidate there; the
    # r >= 2 tiers keep the standard any-band rule.
    from mimir_spark.operators.dedup2 import R1_MIN_COLLISIONS

    def _min_hits(r: int) -> int:
        return R1_MIN_COLLISIONS if r == 1 else 1

    cands = []
    for r in rs:
        cross = [(i, j) for (i, j, rr) in cfg if rr == r and i != j]
        same = [i for (i, j, rr) in cfg if rr == r and i == j]
        having = (
            f"\n              GROUP BY doc_a, doc_b"
            f"\n              HAVING count(DISTINCT band) >= {_min_hits(r)}"
            if _min_hits(r) > 1
            else ""
        )
        if cross:
            pair_ok = " OR ".join(
                f"(a.cls = {i} AND b.cls = {j})" for i, j in cross
            )
            cands.append(
                f"""SELECT doc_a, doc_b FROM (
                SELECT least(a.doc_id, b.doc_id) AS doc_a,
                       greatest(a.doc_id, b.doc_id) AS doc_b,
                       a.band AS band
                FROM bk{r} a JOIN bk{r} b
                  ON a.band = b.band AND a.bucket = b.bucket
                     AND ({pair_ok})) z{r}c{having}"""
            )
        if same:
            in_list = ", ".join(str(i) for i in same)
            cands.append(
                f"""SELECT doc_a, doc_b FROM (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       a.band AS band
                FROM bk{r} a JOIN bk{r} b
                  ON a.band = b.band AND a.bucket = b.bucket
                     AND a.cls = b.cls AND a.cls IN ({in_list})
                     AND a.doc_id < b.doc_id) z{r}s{having}"""
            )
    cand_union = "\n              UNION ALL\n              ".join(cands)
    parts_sql = ",\n            ".join(parts)
    return f"""{_sig_ctes()},
            csz AS (SELECT doc_id,
                           floor(log2(greatest(len(s), 1)))::int AS cls
                    FROM hsh),
            {parts_sql},
            ccand AS (
              SELECT DISTINCT doc_a, doc_b FROM (
              {cand_union})),
            cont_pairs AS MATERIALIZED (
              SELECT doc_a, doc_b,
                     round(n_common / least(na, nb), 6) AS containment
              FROM (SELECT c.doc_a, c.doc_b,
                           len(list_intersect(sa.s, sb.s)) AS n_common,
                           len(sa.s) AS na, len(sb.s) AS nb
                    FROM ccand c
                    JOIN hsh sa ON sa.doc_id = c.doc_a
                    JOIN hsh sb ON sb.doc_id = c.doc_b)
              WHERE round(n_common / least(na, nb), 6) >= {threshold})"""


def _ann_lsh_ctes() -> str:
    """CTE chain for random-hyperplane LSH ANN (similarity.py
    ann_lsh_topk), ending at `lshtop`. Bit-EXACT parity, not
    approximate: the plane literals are repr()'d Python doubles
    (round-trip exact), and every dot product is written as the same
    left-to-right sequential add chain Spark's functions/vectors.dot
    folds, so the sign bits and the 6dp-rounded cosines are the
    identical IEEE doubles in both engines."""
    from mimir_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        _hyperplanes,
    )

    planes = _hyperplanes()

    def chain(terms: list[str]) -> str:
        return " + ".join(terms)

    sig_terms = []
    for i, p in enumerate(planes):
        d = chain([f"e[{j + 1}] * {x!r}" for j, x in enumerate(p)])
        sig_terms.append(f"(CASE WHEN ({d}) > 0 THEN {1 << i} ELSE 0 END)")
    sig_expr = chain(sig_terms)
    self_dot = chain([f"e[{j}] * e[{j}]" for j in range(1, 65)])
    pair_dot = chain([f"a.e[{j}] * b.e[{j}]" for j in range(1, 65)])
    bands = [0xFFF0, 0xFF0F, 0xF0FF, 0x0FFF]
    band_union = "\n              UNION ALL\n".join(
        f"              SELECT vec_id, e, nrm, {i} AS band,"
        f" sig & {m} AS bkey FROM sigs"
        for i, m in enumerate(bands)
    )
    return f"""emb AS (
              SELECT vec_id,
                     list_transform(embedding, x -> x::DOUBLE) AS e
              FROM embeddings),
            sigs AS MATERIALIZED (
              SELECT vec_id, e, sqrt({self_dot}) AS nrm,
                     ({sig_expr})::BIGINT AS sig
              FROM emb),
            bnd AS MATERIALIZED (
{band_union}),
            acand AS (
              SELECT DISTINCT qa.vec_id AS query_id,
                              qb.vec_id AS neighbor_id
              FROM bnd qa JOIN bnd qb
                ON qa.band = qb.band AND qa.bkey = qb.bkey
                   AND qa.vec_id < {N_QUERIES}
                   AND qa.vec_id <> qb.vec_id),
            ascored AS (
              SELECT c.query_id, c.neighbor_id,
                     round(({pair_dot}) / (a.nrm * b.nrm), 6) AS cos
              FROM acand c
              JOIN sigs a ON a.vec_id = c.query_id
              JOIN sigs b ON b.vec_id = c.neighbor_id),
            lshtop AS (
              SELECT query_id, neighbor_id, cos, rank FROM (
                SELECT query_id, neighbor_id, cos,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cos DESC, neighbor_id)::BIGINT AS rank
                FROM ascored)
              WHERE rank <= {TOP_K})"""


# ---- ICWS weighted-MinHash oracle chain --------------------------------
# The ICWS kernel (operators/weighted.py icws_signatures) is NumPy:
# splitmix64 counter-based uniforms, Gamma(2,1) via -ln(u·u'), floor
# and argmin. Every step is replicated below BIT-EXACTLY:
# - splitmix64 as pure UBIGINT 32-bit-limb arithmetic (DuckDB's `<<`
#   overflow-checks and HUGEINT `%` is real 128-bit division — limb
#   mul/add via `* 2^32` and masks is 54× faster and overflow-free);
# - the uniforms are exact dyadic rationals, so ln() receives the
#   identical doubles; np.log and DuckDB ln differ by 1 ulp on ~21%
#   of inputs, but the signature pipeline is empirically INVARIANT
#   under 1-ulp log perturbation (0 flips across 64k sampled
#   positions — argmin gaps and floor arguments are far from ties);
# - the per-(element,hash) randomness keys on the portable md5-31
#   element id, which is why _weighted_sets hashes shingles with
#   portable_token_hash31.

_SM_C1 = 0x9E3779B97F4A7C15
_SM_C2 = 0xBF58476D1CE4E5B9
_SM_C3 = 0x94D049BB133111EB
_HK_C = 0xA0761D6478BD642F
_U_C = 0xD1B54A32D192ED03
_M64 = 1 << 64


def _sm_py(x: int) -> int:
    z = (x + _SM_C1) % _M64
    z ^= z >> 30
    z = (z * _SM_C2) % _M64
    z ^= z >> 27
    z = (z * _SM_C3) % _M64
    z ^= z >> 31
    return z


def _mul64(a: str, const: int) -> str:
    cl, ch = const & 0xFFFFFFFF, const >> 32
    al = f"(({a}) & 4294967295::UBIGINT)"
    ah = f"(({a}) >> 32)"
    lo = f"({al} * {cl}::UBIGINT)"
    mid = (
        f"((({al} * {ch}::UBIGINT) & 4294967295::UBIGINT)"
        f" + (({ah} * {cl}::UBIGINT) & 4294967295::UBIGINT))"
    )
    return (
        f"((((({lo} >> 32) + {mid}) & 4294967295::UBIGINT)"
        f" * 4294967296::UBIGINT) + ({lo} & 4294967295::UBIGINT))"
    )


def _add64(a: str, const: int) -> str:
    cl, ch = const & 0xFFFFFFFF, const >> 32
    slo = f"((({a}) & 4294967295::UBIGINT) + {cl}::UBIGINT)"
    return (
        f"(((((({a}) >> 32) + {ch}::UBIGINT + ({slo} >> 32))"
        f" & 4294967295::UBIGINT)"
        f" * 4294967296::UBIGINT) + ({slo} & 4294967295::UBIGINT))"
    )


def _splitmix_stages(names: list[str], src: str) -> tuple[list[str], str]:
    """Six chained-SELECT stages computing splitmix64 of column
    f'{n}_in' into column n, for every name in parallel (stage
    columns keep each value referenced by NAME, so no subexpression
    blow-up)."""
    stages = [
        ", ".join(f"{_add64(f'{n}_in', _SM_C1)} AS {n}_z0" for n in names),
        ", ".join(f"xor({n}_z0, {n}_z0 >> 30) AS {n}_z1" for n in names),
        ", ".join(f"{_mul64(f'{n}_z1', _SM_C2)} AS {n}_z2" for n in names),
        ", ".join(f"xor({n}_z2, {n}_z2 >> 27) AS {n}_z3" for n in names),
        ", ".join(f"{_mul64(f'{n}_z3', _SM_C3)} AS {n}_z4" for n in names),
        ", ".join(f"xor({n}_z4, {n}_z4 >> 31) AS {n}" for n in names),
    ]
    out, prev = [], src
    for i, cols in enumerate(stages):
        nm = f"{src}_s{i}"
        out.append(f"{nm} AS (SELECT *, {cols} FROM {prev})")
        prev = nm
    return out, prev


def _icws_sig_ctes() -> str:
    """Signature prefix shared by every ICWS oracle: portable
    weighted sets (wsets), totals (itot), and the bit-exact
    per-(doc, hash) consistent samples (isamp: gstar, tstar) — plus
    the 32×4 band coefficients riding the hk table."""
    from mimir_spark.operators.weighted import ICWS_BANDS, ICWS_HASHES

    rows = ICWS_HASHES // ICWS_BANDS
    hkv = ", ".join(
        f"({j}, {_sm_py((j * _HK_C) % _M64)}::UBIGINT,"
        f" {dedup.BUCKET_COEFFS[2 * (j % rows)]},"
        f" {dedup.BUCKET_COEFFS[2 * (j % rows) + 1]})"
        for j in range(ICWS_HASHES)
    )
    uconsts = {i: (i * _U_C) % _M64 for i in range(1, 6)}
    sg_stages, sg_last = _splitmix_stages(["sg"], "iel")
    ucols = ", ".join(
        f"{_add64('xor(sg, hkey)', uconsts[i])} AS u{i}_in"
        for i in range(1, 6)
    )
    u_stages, u_last = _splitmix_stages(
        [f"u{i}" for i in range(1, 6)], "irows"
    )
    uf = ", ".join(
        f"((u{i} >> 11)::DOUBLE + 0.5) / 9007199254740992.0 AS uu{i}"
        for i in range(1, 6)
    )
    parts = [
        r"""wsets AS MATERIALIZED (
          SELECT doc_id, g, count(*)::BIGINT AS c FROM (
            SELECT doc_id,
                   unnest(list_transform(
                     generate_series(1, greatest(len(th) - 2, 1)),
                     k -> (((th[k] * 131 + coalesce(th[k+1], 0))
                            % 2147483647) * 131
                           + coalesce(th[k+2], 0)) % 2147483647)) AS g
            FROM (SELECT doc_id, list_transform(
                       list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> ''),
                       tok -> cast(concat('0x', substring(md5(tok), 1, 8))
                                   as bigint) & 2147483647) AS th
                  FROM documents)
            WHERE len(th) > 0)
          GROUP BY 1, 2)""",
        "iel AS (SELECT doc_id, g, c, CAST(g AS UBIGINT) AS sg_in"
        " FROM wsets)",
        *sg_stages,
        f"hk(j, hkey, cg, ct) AS (VALUES {hkv})",
        f"irows AS (SELECT doc_id, g, c, j, cg, ct, {ucols}"
        f" FROM {sg_last} CROSS JOIN hk)",
        *u_stages,
        f"iuf AS (SELECT doc_id, g, c, j, cg, ct, {uf} FROM {u_last})",
        """irc AS (SELECT doc_id, g, c, j, cg, ct,
             -ln(uu1 * uu2) AS r, -ln(uu3 * uu4) AS cc, uu5 AS beta
           FROM iuf)""",
        """itc AS (SELECT doc_id, g, j, cg, ct, r, cc, beta,
             floor(ln(c::DOUBLE) / r + beta) AS t
           FROM irc)""",
        """ila AS (SELECT doc_id, g, j, cg, ct, t,
             ln(cc) - r * (t - beta + 1.0) AS log_a
           FROM itc)""",
        """isamp AS MATERIALIZED (
           SELECT doc_id, j, max(cg) AS cg, max(ct) AS ct,
                  arg_min(g, log_a) AS gstar,
                  arg_min(t, log_a)::BIGINT AS tstar
           FROM ila GROUP BY 1, 2)""",
        """itot AS (SELECT doc_id, sum(c) AS n FROM wsets GROUP BY 1)""",
    ]
    return ",\n".join(parts)


def _icws_ctes(threshold: float = 0.5) -> str:
    """CTE chain ending at `icws_pairs`(doc_a, doc_b, wjaccard):
    signature prefix → 32×4 linear (g, t) band buckets →
    bucket-collision candidates → exact weighted-Jaccard verify."""
    from mimir_spark.operators.weighted import ICWS_BANDS, ICWS_HASHES

    rows = ICWS_HASHES // ICWS_BANDS
    parts = [
        _icws_sig_ctes(),
        f"""ibk AS MATERIALIZED (
           SELECT doc_id, j // {rows} AS band,
                  sum(gstar * cg + least(tstar, 4294967296) * ct) AS bucket
           FROM isamp GROUP BY 1, 2)""",
        """icand AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM ibk a JOIN ibk b
             ON a.band = b.band AND a.bucket = b.bucket
                AND a.doc_id < b.doc_id)""",
        """iw AS (SELECT ca.doc_a, ca.doc_b,
                         sum(least(x.c, y.c)) AS wmin
           FROM icand ca
           JOIN wsets x ON x.doc_id = ca.doc_a
           JOIN wsets y ON y.doc_id = ca.doc_b AND y.g = x.g
           GROUP BY 1, 2)""",
        f"""icws_pairs AS MATERIALIZED (
           SELECT doc_a, doc_b,
                  round(wmin / (ta.n + tb.n - wmin), 6) AS wjaccard
           FROM iw
           JOIN itot ta ON ta.doc_id = doc_a
           JOIN itot tb ON tb.doc_id = doc_b
           WHERE round(wmin / (ta.n + tb.n - wmin), 6) >= {threshold})""",
    ]
    return ",\n".join(parts)


def _icws_containment_ctes(threshold: float = 0.8) -> str:
    """CTE chain ending at `wcont_pairs`(doc_a, doc_b, wcontainment):
    signature prefix → PER-CLASS rows-per-band banding (the same
    data-independent dedup2._containment_band_configs table, classes
    on log2 of weighted mass) → class-restricted candidates → exact
    weighted-containment verify. Per-r coefficient tables vb{r}
    replicate _icws_band_bucket's position-indexed coefficients."""
    from mimir_spark.operators.dedup2 import _containment_band_configs
    from mimir_spark.operators.weighted import ICWS_HASHES

    cfg = _containment_band_configs(list(range(21)), threshold, ICWS_HASHES)
    rs = sorted({r for _, _, r in cfg})
    parts = [
        _icws_sig_ctes(),
        """icls AS (SELECT doc_id,
                          floor(log2(greatest(n, 1)))::int AS cls
                   FROM itot)""",
    ]
    cands = []
    for r in rs:
        vbv = ", ".join(
            f"({j}, {dedup.BUCKET_COEFFS[2 * (j % r)]},"
            f" {dedup.BUCKET_COEFFS[2 * (j % r) + 1]})"
            for j in range(ICWS_HASHES)
        )
        parts.append(f"vb{r}(j, cg, ct) AS (VALUES {vbv})")
        parts.append(
            f"""wbk{r} AS MATERIALIZED (
           SELECT s.doc_id, c.cls, s.j // {r} AS band,
                  sum(s.gstar * v.cg + least(s.tstar, 4294967296) * v.ct) AS bucket
           FROM isamp s
           JOIN vb{r} v ON v.j = s.j
           JOIN icls c ON c.doc_id = s.doc_id
           GROUP BY 1, 2, 3)"""
        )
        cross = [(i, j) for (i, j, rr) in cfg if rr == r and i != j]
        same = [i for (i, j, rr) in cfg if rr == r and i == j]
        if cross:
            pair_ok = " OR ".join(
                f"(a.cls = {i} AND b.cls = {j})" for i, j in cross
            )
            cands.append(
                f"""SELECT least(a.doc_id, b.doc_id) AS doc_a,
                     greatest(a.doc_id, b.doc_id) AS doc_b
              FROM wbk{r} a JOIN wbk{r} b
                ON a.band = b.band AND a.bucket = b.bucket
                   AND ({pair_ok})"""
            )
        if same:
            in_list = ", ".join(str(i) for i in same)
            cands.append(
                f"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM wbk{r} a JOIN wbk{r} b
                ON a.band = b.band AND a.bucket = b.bucket
                   AND a.cls = b.cls AND a.cls IN ({in_list})
                   AND a.doc_id < b.doc_id"""
            )
    cand_union = "\n              UNION ALL\n              ".join(cands)
    parts.append(
        f"""wccand AS (
           SELECT DISTINCT doc_a, doc_b FROM (
           {cand_union}))"""
    )
    parts.append(
        """wcw AS (SELECT ca.doc_a, ca.doc_b,
                          sum(least(x.c, y.c)) AS wmin
           FROM wccand ca
           JOIN wsets x ON x.doc_id = ca.doc_a
           JOIN wsets y ON y.doc_id = ca.doc_b AND y.g = x.g
           GROUP BY 1, 2)"""
    )
    parts.append(
        f"""wcont_pairs AS MATERIALIZED (
           SELECT doc_a, doc_b,
                  round(wmin / least(ta.n, tb.n), 6) AS wcontainment
           FROM wcw
           JOIN itot ta ON ta.doc_id = doc_a
           JOIN itot tb ON tb.doc_id = doc_b
           WHERE round(wmin / least(ta.n, tb.n), 6) >= {threshold})"""
    )
    return ",\n".join(parts)


_CHAR_SYM_SQL = (
    "array_to_string(list_filter(string_split(word, ''),"
    " c -> c <> ''), ' ')"
)


def _byte_sym_sql() -> str:
    """UTF-8 byte symbolization (DuckDB dialect): encode → hex →
    per-byte lookup into the literal GPT-2 byte-to-unicode table —
    the closed form of tokenizer._byte_syms, space-joined for the
    shared merge-fold chain."""
    from mimir_spark.operators import tokenizer as _tok

    items = ", ".join(
        "''''" if c == "'" else f"'{c}'" for c in _tok.BYTE_TABLE
    )
    hx = "hex(encode(word))"
    idx = (
        f"(strpos('0123456789ABCDEF',"
        f" substring({hx}, CAST(2*i-1 AS INT), 1)) - 1) * 16"
        f" + strpos('0123456789ABCDEF',"
        f" substring({hx}, CAST(2*i AS INT), 1))"
    )
    return (
        f"array_to_string(list_transform("
        f"range(1, octet_length(encode(word)) + 1),"
        f" i -> [{items}][CAST({idx} AS INT)]), ' ')"
    )


def _bpe_ctes(
    n_merges: int = 10, with_word: bool = False, sym_sql: str | None = None
) -> str:
    """Unrolled sequential-BPE CTE chain: v0 = char-split (word, wc)
    vocab; per round k, pair counts (p{k}) → deterministic argmax
    winner (w{k}, MATERIALIZED — it is referenced by both the next
    apply and the final union, and DuckDB inlines plain CTEs per
    reference, which would square the chain every round) → merged
    vocab (v{k}, the greedy left-to-right fold as a 2-arg list_reduce
    over a space-joined symbol string, bit-equal to the Spark-side
    Catalyst aggregate fold). The batched Spark training
    (_safe_merge_prefix) is provably sequential-equivalent, so the
    sequential oracle pins it. `with_word` keeps the word column
    through the chain (the encode oracle joins it back to the
    corpus). `sym_sql` overrides the v0 symbolization (default: char
    split; the byte-level trainer passes _byte_sym_sql())."""
    sym = sym_sql or _CHAR_SYM_SQL
    parts = [
        rf"""v0 AS MATERIALIZED (
      SELECT word, count(*)::BIGINT AS wc,
             {sym} AS s
      FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS word
            FROM documents)
      GROUP BY word)"""
    ]
    apply_tpl = """list_reduce(string_split(v{p}.s, ' '),
        (acc, x) -> CASE WHEN regexp_extract(acc, '[^ ]+$', 0) = w{k}.l
                          AND x = w{k}.r
                    THEN regexp_replace(acc, '[^ ]+$', w{k}.l || w{k}.r)
                    ELSE acc || ' ' || x END)"""
    last_v = n_merges if with_word else n_merges - 1
    for k in range(1, n_merges + 1):
        parts.append(
            f"""p{k} AS (
      SELECT ps[i] AS l, ps[i+1] AS r, sum(wc) AS cnt
      FROM (SELECT wc, string_split(s, ' ') AS ps,
                   unnest(range(1, len(string_split(s, ' ')))) AS i
            FROM v{k - 1})
      GROUP BY 1, 2)"""
        )
        parts.append(
            f"""w{k} AS MATERIALIZED (
      SELECT l, r, cnt::BIGINT AS cnt FROM p{k}
      WHERE cnt >= 2 ORDER BY cnt DESC, l, r LIMIT 1)"""
        )
        if k <= last_v:
            keep = f"v{k - 1}.word, " if with_word else ""
            parts.append(
                f"""v{k} AS MATERIALIZED (
      SELECT {keep}v{k - 1}.wc,
             {apply_tpl.format(p=k - 1, k=k)} AS s
      FROM v{k - 1} CROSS JOIN w{k})"""
            )
    return ",\n".join(parts)


def _wordpiece_sql(n_merges: int = 8) -> str:
    """Unrolled sequential WordPiece chain: like _bpe_ctes, but each
    round also folds the symbol UNIGRAM counts (u{k}) and the winner
    argmaxes the likelihood score cnt/(ul·ur) — one division of exact
    integers, the identical double on both engines — with (score desc,
    l, r) ties."""
    parts = [
        r"""WITH v0 AS MATERIALIZED (
      SELECT word, count(*)::BIGINT AS wc,
             array_to_string(list_filter(string_split(word, ''),
                                         c -> c <> ''), ' ') AS s
      FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS word
            FROM documents)
      GROUP BY word)"""
    ]
    apply_tpl = """list_reduce(string_split(v{p}.s, ' '),
        (acc, x) -> CASE WHEN regexp_extract(acc, '[^ ]+$', 0) = w{k}.l
                          AND x = w{k}.r
                    THEN regexp_replace(acc, '[^ ]+$', w{k}.l || w{k}.r)
                    ELSE acc || ' ' || x END)"""
    for k in range(1, n_merges + 1):
        parts.append(
            f""", p{k} AS (
      SELECT ps[i] AS l, ps[i+1] AS r, sum(wc)::BIGINT AS cnt
      FROM (SELECT wc, string_split(s, ' ') AS ps,
                   unnest(range(1, len(string_split(s, ' ')))) AS i
            FROM v{k - 1})
      GROUP BY 1, 2)
    , u{k} AS (
      SELECT sym, sum(wc)::BIGINT AS uc
      FROM (SELECT wc, unnest(string_split(s, ' ')) AS sym
            FROM v{k - 1})
      GROUP BY 1)
    , w{k} AS MATERIALIZED (
      SELECT p.l, p.r, p.cnt, p.cnt / (ul.uc * ur.uc) AS score
      FROM p{k} p
      JOIN u{k} ul ON ul.sym = p.l
      JOIN u{k} ur ON ur.sym = p.r
      WHERE p.cnt >= 2
      ORDER BY score DESC, p.l, p.r LIMIT 1)"""
        )
        if k < n_merges:
            parts.append(
                f""", v{k} AS MATERIALIZED (
      SELECT v{k - 1}.wc, {apply_tpl.format(p=k - 1, k=k)} AS s
      FROM v{k - 1} CROSS JOIN w{k})"""
            )
    fin = "\nUNION ALL\n".join(
        f'SELECT {k - 1}::BIGINT AS step, l AS "left", r AS "right",'
        f" l || r AS merged, cnt AS pair_count,"
        f" round(score, 9) AS score FROM w{k}"
        for k in range(1, n_merges + 1)
    )
    return "\n".join(parts) + "\n" + fin


def _unigram_sql() -> str:
    """Unrolled unigram-LM trainer oracle: the recursive CTE per EM
    round enumerates EVERY segmentation of every distinct word over
    vocab spans (bounded: piece length ≤ 4, word length ≤ 64) and
    argmaxes the exact-BIGINT micro-nat score with the global
    tie-break (score desc, reversed piece-length sequence desc) that
    tokenizer._viterbi_pieces's positional DP provably computes. The
    exhaustive oracle is the falsifier for the engine's O(n·4) fold."""
    from mimir_spark.operators import tokenizer as _tok

    maxp = _tok.UNI_MAXP
    mstep = (
        "SELECT piece, CAST(round(1e6 * ln((c + 1)::DOUBLE /"
        " ((SELECT sum(c) FROM {v}) + (SELECT count(*) FROM {v}))::DOUBLE))"
        " AS BIGINT) AS w FROM {v}"
    )
    estep = """segs{k} AS (
      SELECT word, wc, 0::BIGINT AS pos,
             CAST([] AS VARCHAR[]) AS pieces, 0::BIGINT AS score
      FROM words
      UNION ALL
      SELECT s.word, s.wc, s.pos + length(sp.piece),
             list_append(s.pieces, sp.piece), s.score + w.w
      FROM segs{k} s
      JOIN spans sp ON sp.word = s.word AND sp.start = s.pos + 1
      JOIN {wsrc} w ON w.piece = sp.piece)
    , best{k} AS MATERIALIZED (
      SELECT word, wc, pieces FROM segs{k}
      WHERE pos = length(word)
      QUALIFY row_number() OVER (PARTITION BY word ORDER BY score DESC,
              list_reverse(list_transform(pieces, p -> length(p))) DESC) = 1)
    , c{k} AS (
      SELECT piece, sum(wc)::BIGINT AS c
      FROM (SELECT wc, unnest(pieces) AS piece FROM best{k})
      GROUP BY piece)
    , v{k} AS MATERIALIZED (
      SELECT w.piece, coalesce(c.c, 0)::BIGINT AS c
      FROM {wsrc} w LEFT JOIN c{k} c USING (piece))"""
    return f"""WITH RECURSIVE
    words AS MATERIALIZED (
      SELECT word, count(*)::BIGINT AS wc
      FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS word
            FROM documents)
      WHERE length(word) <= {_tok.UNI_MAX_WORD}
      GROUP BY word)
    , spans AS MATERIALIZED (
      SELECT word, wc, i AS start,
             substring(word, CAST(i AS INT), CAST(k AS INT)) AS piece
      FROM words,
           unnest(range(1, length(word) + 1)) AS a(i),
           unnest(range(1, least({maxp}, length(word) - i + 1) + 1)) AS b(k))
    , seedc AS (SELECT piece, sum(wc)::BIGINT AS c FROM spans GROUP BY piece)
    , v0 AS MATERIALIZED (
      SELECT piece, c FROM seedc WHERE length(piece) = 1
      UNION ALL
      SELECT piece, c FROM (
        SELECT piece, c FROM seedc WHERE length(piece) > 1
        ORDER BY c DESC, piece LIMIT {_tok.UNI_SEED_MULTI}))
    , w0 AS MATERIALIZED ({mstep.format(v="v0")})
    , {estep.format(k=1, wsrc="w0")}
    , w1 AS MATERIALIZED ({mstep.format(v="v1")})
    , {estep.format(k=2, wsrc="w1")}
    , kept AS MATERIALIZED (
      SELECT piece, c FROM v2 WHERE length(piece) = 1
      UNION ALL
      SELECT piece, c FROM (
        SELECT piece, c FROM v2 WHERE length(piece) > 1
        ORDER BY c DESC, piece LIMIT {_tok.UNI_PRUNE_KEEP}))
    , wk AS MATERIALIZED ({mstep.format(v="kept")})
    , {estep.format(k=3, wsrc="wk")}
    , wfin AS ({mstep.format(v="v3")})
    SELECT v3.piece,
           length(v3.piece)::INT AS n_chars,
           v3.c::BIGINT AS count,
           wfin.w AS logp_micro
    FROM v3 JOIN wfin USING (piece)"""


def _ktruss_sql(k: int = 4, rounds: int = 5) -> str:
    """Unrolled k-truss peel: per round one wedge join recounts every
    remaining edge's support and edges below k−2 drop; the final
    select recounts support inside the surviving subgraph."""
    parts = [
        """WITH po AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
        ), e0 AS MATERIALIZED (
          SELECT DISTINCT a.p AS u, b.p AS v
          FROM po a JOIN po b ON a.o = b.o AND a.p < b.p)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""", und{r - 1} AS (
          SELECT u, v FROM e{r - 1}
          UNION ALL SELECT v AS u, u AS v FROM e{r - 1})
        , s{r} AS (
          SELECT e.u, e.v, count(*)::BIGINT AS c
          FROM e{r - 1} e
          JOIN und{r - 1} a ON a.u = e.u
          JOIN und{r - 1} b ON b.u = e.v AND b.v = a.v
          GROUP BY e.u, e.v)
        , e{r} AS MATERIALIZED (
          SELECT u, v FROM s{r} WHERE c >= {k - 2})"""
        )
    parts.append(
        f""", undF AS (
          SELECT u, v FROM e{rounds}
          UNION ALL SELECT v AS u, u AS v FROM e{rounds})
        SELECT e.u, e.v, count(*)::BIGINT AS support
        FROM e{rounds} e
        JOIN undF a ON a.u = e.u
        JOIN undF b ON b.u = e.v AND b.v = a.v
        GROUP BY e.u, e.v
        HAVING count(*) >= {k - 2}"""
    )
    return "\n".join(parts)


def _hw_sql() -> str:
    """Holt-Winters oracle: the identical per-step arithmetic (exact
    binary-rational constants 1/4, 1/8 — every fold step is the same
    fixed IEEE op sequence, so Spark's aggregate() and this recursive
    CTE are bit-identical with no per-step rounding) unrolled by a
    recursive CTE over each type's sorted hourly series."""
    from mimir_spark.operators import stats as _st

    a, b, g, m = _st.HW_ALPHA, _st.HW_BETA, _st.HW_GAMMA, _st.HW_SEASON
    x = "(ts[CAST(t + 1 AS INT)]).x"
    sidx = f"CAST(((ts[CAST(t + 1 AS INT)]).hour % {m}) + 1 AS INT)"
    sprev = f"s[{sidx}]"
    newlevel = f"({a} * ({x} - {sprev}) + {1 - a} * (level + trend))"
    return f"""
        WITH RECURSIVE hourly AS (
          SELECT event_type,
                 floor(epoch(ts) / 3600)::BIGINT AS hour,
                 round(avg(value), 6) AS x
          FROM events GROUP BY 1, 2),
        series AS (
          SELECT event_type,
                 list(struct_pack(hour := hour, x := x) ORDER BY hour) AS ts
          FROM hourly GROUP BY event_type),
        rec AS (
          SELECT event_type, ts, 0::BIGINT AS t,
                 (ts[1]).x AS level, CAST(0.0 AS DOUBLE) AS trend,
                 list_transform(range(1, {m + 1}),
                                j -> CAST(0.0 AS DOUBLE)) AS s,
                 CAST([] AS DOUBLE[]) AS fc
          FROM series
          UNION ALL
          SELECT event_type, ts, t + 1,
                 {newlevel},
                 {b} * ({newlevel} - level) + {1 - b} * trend,
                 list_transform(range(1, {m + 1}), j -> CASE
                   WHEN j = {sidx}
                   THEN {g} * ({x} - {newlevel}) + {1 - g} * {sprev}
                   ELSE s[CAST(j AS INT)] END),
                 list_append(fc, level + trend + {sprev})
          FROM rec WHERE t < len(ts))
        SELECT event_type,
               (ts[CAST(i AS INT)]).hour AS hour,
               (ts[CAST(i AS INT)]).x AS x,
               round(fc[CAST(i AS INT)], 6) AS forecast,
               round((ts[CAST(i AS INT)]).x - fc[CAST(i AS INT)], 6) AS resid
        FROM (SELECT event_type, ts, fc FROM rec WHERE t = len(ts)),
             unnest(range(1, len(ts) + 1)) AS u(i)
    """


def _unigram_encode_sql() -> str:
    """unigram_encode oracle: the full trainer chain (through the
    final-weights CTE wfin), then one more exhaustive-enumeration
    segmentation of every distinct word under wfin, joined back to the
    per-doc token occurrences for the compression report."""
    from mimir_spark.operators import tokenizer as _tok

    train = _unigram_sql()
    # strip the trainer's final SELECT; keep its WITH chain
    chain = train[: train.rindex("SELECT v3.piece")]
    return (
        chain
        + f""", segs4 AS (
      SELECT word, wc, 0::BIGINT AS pos,
             CAST([] AS VARCHAR[]) AS pieces, 0::BIGINT AS score
      FROM words
      UNION ALL
      SELECT s.word, s.wc, s.pos + length(sp.piece),
             list_append(s.pieces, sp.piece), s.score + w.w
      FROM segs4 s
      JOIN spans sp ON sp.word = s.word AND sp.start = s.pos + 1
      JOIN wfin w ON w.piece = sp.piece)
    , best4 AS MATERIALIZED (
      SELECT word, len(pieces)::BIGINT AS n_symbols,
             length(word)::BIGINT AS n_chars
      FROM segs4
      WHERE pos = length(word)
      QUALIFY row_number() OVER (PARTITION BY word ORDER BY score DESC,
              list_reverse(list_transform(pieces, p -> length(p))) DESC) = 1)
    , tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS word
      FROM documents)
    SELECT doc_id,
           sum(n_chars)::BIGINT AS total_chars,
           sum(n_symbols)::BIGINT AS total_symbols,
           round(sum(n_chars) / sum(n_symbols)::DOUBLE, 6)
             AS chars_per_symbol
    FROM tok JOIN best4 USING (word)
    WHERE length(word) <= {_tok.UNI_MAX_WORD}
    GROUP BY doc_id"""
    )


def _unigram_encode_ids_sql() -> str:
    """unigram_encode_ids oracle: the trainer chain through wfin, then
    (a) deterministic piece ids by piece string order, (b) one more
    exhaustive Viterbi segmentation KEEPING the piece sequence, (c)
    the per-doc ordered id stream reassembled from (token position,
    piece ordinal) and folded into the same Horner digest."""
    from mimir_spark.operators import tokenizer as _tok

    train = _unigram_sql()
    chain = train[: train.rindex("SELECT v3.piece")]
    return (
        chain
        + f""", vid AS MATERIALIZED (
      SELECT piece,
             (row_number() OVER (ORDER BY piece) - 1)::BIGINT AS pid
      FROM wfin)
    , segs5 AS (
      SELECT word, 0::BIGINT AS pos,
             CAST([] AS VARCHAR[]) AS pieces, 0::BIGINT AS score
      FROM words
      UNION ALL
      SELECT s.word, s.pos + length(sp.piece),
             list_append(s.pieces, sp.piece), s.score + w.w
      FROM segs5 s
      JOIN spans sp ON sp.word = s.word AND sp.start = s.pos + 1
      JOIN wfin w ON w.piece = sp.piece)
    , best5 AS MATERIALIZED (
      SELECT word, pieces FROM segs5
      WHERE pos = length(word)
      QUALIFY row_number() OVER (PARTITION BY word ORDER BY score DESC,
              list_reverse(list_transform(pieces, p -> length(p))) DESC) = 1)
    , wid AS MATERIALIZED (
      SELECT b.word, list(v.pid ORDER BY a.j) AS wids
      FROM best5 b,
           unnest(range(1, len(b.pieces) + 1)) AS a(j)
      JOIN vid v ON v.piece = b.pieces[CAST(a.j AS INT)]
      GROUP BY b.word)
    , tokp AS (
      SELECT doc_id, t[CAST(i AS INT)] AS word, i
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '') AS t
            FROM documents),
           unnest(range(1, len(t) + 1)) AS a(i)
      WHERE length(t[CAST(i AS INT)]) <= {_tok.UNI_MAX_WORD})
    , stream AS (
      SELECT t.doc_id, t.i, b.j,
             w.wids[CAST(b.j AS INT)]::BIGINT AS pid
      FROM tokp t
      JOIN wid w USING (word),
           unnest(range(1, len(w.wids) + 1)) AS b(j))
    SELECT doc_id,
           count(*)::BIGINT AS n_ids,
           list_reduce(
             list_prepend(0::BIGINT, list(pid ORDER BY i, j)),
             (acc, x) -> (acc * {_tok.UNI_ID_MULT} + x)
                         % {_tok.UNI_ID_MOD})::BIGINT AS ids_digest,
           (list(pid ORDER BY i, j))[1]::BIGINT AS first_id,
           (list(pid ORDER BY i, j))[-1]::BIGINT AS last_id
    FROM stream
    GROUP BY doc_id"""
    )


def _url_parts_sql() -> str:
    """Shared closed-form of the URL generation rule (urls.py): cid,
    tld, mirror prefix — the oracle never parses a URL."""
    from mimir_spark.operators import urls as _u

    tlds = ", ".join(f"'{t}'" for t in _u.URL_TLDS)
    prefixes = ", ".join(f"'{p}'" for p in _u.URL_PREFIXES)
    return f"""
        WITH c AS (
          SELECT doc_id,
                 doc_id // {_u.URL_DOCS_PER_PAGE} AS cid,
                 [{tlds}][CAST((doc_id // {_u.URL_DOCS_PER_PAGE})
                          % {len(_u.URL_TLDS)} AS INT) + 1] AS tld,
                 [{prefixes}][CAST(doc_id % {len(_u.URL_PREFIXES)} AS INT)
                          + 1] AS prefix
          FROM documents)"""


def _url_normalize_sql() -> str:
    from mimir_spark.operators import urls as _u

    return (
        _url_parts_sql()
        + f"""
        SELECT doc_id,
               (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END)
               || '://' || prefix || 'example' || (cid % {_u.URL_SITES})::VARCHAR
               || '.' || tld || '/p/' || cid::VARCHAR
               || '?utm_source=feed&utm_campaign=c' || (doc_id % 5)::VARCHAR
               || (CASE WHEN doc_id % 3 <> 2
                        THEN '&ref=r' || (doc_id % 3)::VARCHAR
                        ELSE '' END)
               || (CASE WHEN doc_id % 3 = 1 THEN '#frag' ELSE '' END)
                 AS url,
               'https://example' || (cid % {_u.URL_SITES})::VARCHAR || '.'
               || tld || '/p/' || cid::VARCHAR AS norm_url,
               'example' || (cid % {_u.URL_SITES})::VARCHAR || '.' || tld
                 AS domain,
               (CASE WHEN doc_id % 3 <> 2 THEN 3 ELSE 2 END)::BIGINT
                 AS n_tracking,
               (CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END)::BIGINT
                 AS had_fragment
        FROM c"""
    )


def _url_dedup_sql() -> str:
    from mimir_spark.operators import urls as _u

    blocked = ", ".join(f"'{t}'" for t in _u.BLOCKED_TLDS)
    return (
        _url_parts_sql()
        + f"""
        , g AS (
          SELECT cid, tld, count(*)::BIGINT AS n_docs,
                 min(doc_id)::BIGINT AS survivor_doc_id
          FROM c GROUP BY cid, tld)
        SELECT 'https://example' || (cid % {_u.URL_SITES})::VARCHAR || '.'
               || tld || '/p/' || cid::VARCHAR AS norm_url,
               'example' || (cid % {_u.URL_SITES})::VARCHAR || '.' || tld
                 AS domain,
               n_docs, survivor_doc_id
        FROM g WHERE tld NOT IN ({blocked})"""
    )


def _bpe_train_sql(n_merges: int = 10) -> str:
    fin = "\nUNION ALL\n".join(
        f'SELECT {k - 1}::BIGINT AS step, l AS "left", r AS "right",'
        f" l || r AS merged, cnt AS pair_count FROM w{k}"
        for k in range(1, n_merges + 1)
    )
    return f"WITH {_bpe_ctes(n_merges)}\n{fin}"


def _bpe_encode_sql(n_merges: int = 10) -> str:
    return f"""WITH {_bpe_ctes(n_merges, with_word=True)},
    wl AS (SELECT word,
                  len(string_split(s, ' '))::BIGINT AS n_chars_v0
           FROM v0),
    we AS (SELECT word,
                  len(string_split(s, ' '))::BIGINT AS n_symbols
           FROM v{n_merges}),
    tok AS (SELECT doc_id,
                   unnest(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS word
            FROM documents)
    SELECT doc_id,
           sum(n_chars_v0)::BIGINT AS total_chars,
           sum(n_symbols)::BIGINT AS total_symbols,
           round(sum(n_chars_v0) / sum(n_symbols), 6) AS chars_per_symbol
    FROM tok JOIN wl USING (word) JOIN we USING (word)
    GROUP BY doc_id"""


def _bpe_encode_ids_sql(
    n_merges: int = 10, sym_sql: str | None = None
) -> str:
    """bpe_encode_ids oracle: the merge-replay chain's final segmented
    vocab v{n}, symbol ids by string order over the segmented symbol
    universe, per-doc positional stream + Horner digest (the
    _unigram_encode_ids_sql recipe on the BPE side). With
    sym_sql=_byte_sym_sql() this is the byte_bpe_encode_ids oracle —
    the whole downstream chain is symbolization-agnostic."""
    from mimir_spark.operators import tokenizer as _tok

    return f"""WITH {_bpe_ctes(n_merges, with_word=True, sym_sql=sym_sql)},
    wsym AS MATERIALIZED (
      SELECT word, string_split(s, ' ') AS syms FROM v{n_merges}),
    vid AS MATERIALIZED (
      SELECT sym, (row_number() OVER (ORDER BY sym) - 1)::BIGINT AS pid
      FROM (SELECT DISTINCT unnest(syms) AS sym FROM wsym)),
    wid AS MATERIALIZED (
      SELECT w.word, list(v.pid ORDER BY a.j) AS wids
      FROM wsym w,
           unnest(range(1, len(w.syms) + 1)) AS a(j)
      JOIN vid v ON v.sym = w.syms[CAST(a.j AS INT)]
      GROUP BY w.word),
    tokp AS (
      SELECT doc_id, t[CAST(i AS INT)] AS word, i
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '') AS t
            FROM documents),
           unnest(range(1, len(t) + 1)) AS a(i)),
    stream AS (
      SELECT t.doc_id, t.i, b.j,
             w.wids[CAST(b.j AS INT)]::BIGINT AS pid
      FROM tokp t
      JOIN wid w USING (word),
           unnest(range(1, len(w.wids) + 1)) AS b(j))
    SELECT doc_id,
           count(*)::BIGINT AS n_ids,
           list_reduce(
             list_prepend(0::BIGINT, list(pid ORDER BY i, j)),
             (acc, x) -> (acc * {_tok.UNI_ID_MULT} + x)
                         % {_tok.UNI_ID_MOD})::BIGINT AS ids_digest,
           (list(pid ORDER BY i, j))[1]::BIGINT AS first_id,
           (list(pid ORDER BY i, j))[-1]::BIGINT AS last_id
    FROM stream
    GROUP BY doc_id"""


_LINEITEM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
    "l_linestatus", "l_shipdate",
]
_PROFILE_SQL = "\nUNION ALL\n".join(
    f'SELECT \'{c}\' AS "column", count(*)::BIGINT AS n_rows,'
    f" (count(*) - count({c}))::BIGINT AS n_nulls,"
    f" count(DISTINCT {c})::BIGINT AS n_distinct FROM lineitem"
    for c in _LINEITEM_COLS
)


def _raw_cos(x: str, y: str, dim: int = 64) -> str:
    return (
        f"""(list_sum(list_transform(generate_series(1, {dim}),
               i -> {x}[i] * {y}[i]))
      / (sqrt(list_sum(list_transform(generate_series(1, {dim}),
               i -> {x}[i] * {x}[i])))
         * sqrt(list_sum(list_transform(generate_series(1, {dim}),
               i -> {y}[i] * {y}[i])))))"""
    )


def _ivf_chain(k: int = 16, dim: int = 64, iters: int = 5, probes: int = 8) -> str:
    """CTE chain reproducing the trained-IVF probe pipeline (DuckDB
    dialect): Lloyd rounds on L2-NORMALIZED vectors with 9dp-rounded
    seeds and per-round 9dp centroid grids (bit-equal to
    clustering.lloyd_centroids by the same argument as the kmeans
    oracle), then cosine cell assignment (argmax, lowest-cell ties),
    per-query top-`probes` cells, and candidate scoring. Ends at CTEs
    `qcells`, `casg`, `corpus` for the wrappers to select from."""
    dist = (
        "list_sum(list_transform(generate_series(1, {d}),"
        " j -> (p.e[j] - s.c[j]) * (p.e[j] - s.c[j])))"
    ).format(d=dim)
    parts = [
        f"""WITH pts AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(embedding, x -> x::DOUBLE /
                   sqrt(list_sum(list_transform(embedding,
                        y -> y::DOUBLE * y::DOUBLE)))) AS e
          FROM embeddings),
        c0 AS MATERIALIZED (
          SELECT row_number() OVER (ORDER BY vec_id) AS cid,
                 list_transform(e, x -> round(x, 9)) AS c
          FROM (SELECT vec_id, e FROM pts ORDER BY vec_id LIMIT {k}) q0)"""
    ]
    for i in range(iters):
        parts.append(
            f""", a{i} AS MATERIALIZED (
              SELECT vec_id, cid FROM (
                SELECT p.vec_id, s.cid,
                       row_number() OVER (PARTITION BY p.vec_id
                                          ORDER BY {dist}, s.cid) AS rk
                FROM pts p CROSS JOIN c{i} s) q
              WHERE rk = 1)
            , c{i + 1} AS MATERIALIZED (
              SELECT s.cid, coalesce(u.c, s.c) AS c
              FROM c{i} s LEFT JOIN (
                SELECT cid, list(v ORDER BY j) AS c FROM (
                  SELECT a.cid, dims.j, round(avg(p.e[dims.j]), 9) AS v
                  FROM a{i} a JOIN pts p USING (vec_id)
                  CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS j)
                    dims
                  GROUP BY a.cid, dims.j) g
                GROUP BY cid) u ON u.cid = s.cid)"""
        )
    cos_pc = _raw_cos("p.ce", "s.c", dim)
    parts.append(
        f""", cents AS MATERIALIZED (
          SELECT cid - 1 AS cell_id, c FROM c{iters})
        , corpus AS MATERIALIZED (
          SELECT vec_id AS neighbor_id,
                 list_transform(embedding, x -> x::DOUBLE) AS ce
          FROM embeddings)
        , casg AS MATERIALIZED (
          SELECT neighbor_id, cell_id FROM (
            SELECT p.neighbor_id, s.cell_id,
                   row_number() OVER (PARTITION BY p.neighbor_id
                      ORDER BY {cos_pc} DESC, s.cell_id) AS rk
            FROM corpus p CROSS JOIN cents s) q WHERE rk = 1)
        , qcells AS MATERIALIZED (
          SELECT query_id, qe, cell_id FROM (
            SELECT p.neighbor_id AS query_id, p.ce AS qe, s.cell_id,
                   row_number() OVER (PARTITION BY p.neighbor_id
                      ORDER BY {cos_pc} DESC, s.cell_id) AS rk
            FROM corpus p CROSS JOIN cents s
            WHERE p.neighbor_id < 10) q WHERE rk <= {probes})
        , ivf AS MATERIALIZED (
          SELECT query_id, neighbor_id, cos, rank FROM (
            SELECT qc.query_id, ca.neighbor_id,
                   round({_raw_cos("qc.qe", "ne.ce", dim)}, 6) AS cos,
                   row_number() OVER (PARTITION BY qc.query_id
                      ORDER BY round({_raw_cos("qc.qe", "ne.ce", dim)}, 6)
                               DESC, ca.neighbor_id) AS rank
            FROM qcells qc
            JOIN casg ca ON ca.cell_id = qc.cell_id
                        AND ca.neighbor_id <> qc.query_id
            JOIN corpus ne ON ne.neighbor_id = ca.neighbor_id) z
          WHERE rank <= 5)"""
    )
    return "\n".join(parts)


def _ivf_topk_sql() -> str:
    return _ivf_chain() + "\nSELECT query_id, neighbor_id, cos, rank FROM ivf"


def _ivf_recall_sql() -> str:
    """Per-query recall@5 of the IVF probe vs brute-force ground
    truth, both re-derived inside the oracle."""
    cos_tb = _raw_cos("a.ce", "b.ce")
    return (
        _ivf_chain()
        + f"""
        , truth AS MATERIALIZED (
          SELECT query_id, neighbor_id FROM (
            SELECT a.neighbor_id AS query_id, b.neighbor_id,
                   row_number() OVER (PARTITION BY a.neighbor_id
                      ORDER BY round({cos_tb}, 6) DESC, b.neighbor_id)
                     AS rank
            FROM corpus a JOIN corpus b
              ON a.neighbor_id <> b.neighbor_id
            WHERE a.neighbor_id < 10) t WHERE rank <= 5)
        SELECT t.query_id,
               sum(CASE WHEN i.neighbor_id IS NOT NULL
                        THEN 1 ELSE 0 END)::BIGINT AS n_hit,
               round(sum(CASE WHEN i.neighbor_id IS NOT NULL
                              THEN 1 ELSE 0 END) / 5e0, 6) AS recall
        FROM truth t LEFT JOIN ivf i
          ON i.query_id = t.query_id AND i.neighbor_id = t.neighbor_id
        GROUP BY t.query_id"""
    )


def _pq_chain(
    m: int = 8, dsub: int = 8, k: int = 16, iters: int = 3
) -> str:
    """CTE chain reproducing the PQ/ADC pipeline (operators.pq):
    per-subspace Lloyd on L2-normalized slices (lowest-vec_id 9dp
    seeds, per-round 9dp grids — the kmeans/IVF determinism recipe),
    argmin encode (ties → lowest code), and fixed-order ADC folds
    rounded to 6dp. Ends at CTEs `codes`, `qrs`, `adc`."""
    parts = [
        """WITH pts AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(embedding, x -> x::DOUBLE /
                   sqrt(list_sum(list_transform(embedding,
                        y -> y::DOUBLE * y::DOUBLE)))) AS e
          FROM embeddings)"""
    ]
    for s in range(m):
        o = s * dsub
        dist = (
            f"list_sum(list_transform(generate_series(1, {dsub}),"
            f" j -> (p.e[{o} + j] - s.c[j]) * (p.e[{o} + j] - s.c[j])))"
        )
        parts.append(
            f""", s{s}c0 AS MATERIALIZED (
              SELECT row_number() OVER (ORDER BY vec_id) AS cid,
                     list_transform(e[{o + 1}:{o + dsub}],
                                    x -> round(x, 9)) AS c
              FROM (SELECT vec_id, e FROM pts ORDER BY vec_id
                    LIMIT {k}) q0)"""
        )
        for i in range(iters):
            parts.append(
                f""", s{s}a{i} AS MATERIALIZED (
                  SELECT vec_id, cid FROM (
                    SELECT p.vec_id, s.cid,
                           row_number() OVER (PARTITION BY p.vec_id
                                              ORDER BY {dist}, s.cid) AS rk
                    FROM pts p CROSS JOIN s{s}c{i} s) q
                  WHERE rk = 1)
                , s{s}c{i + 1} AS MATERIALIZED (
                  SELECT s.cid, coalesce(u.c, s.c) AS c
                  FROM s{s}c{i} s LEFT JOIN (
                    SELECT cid, list(v ORDER BY j) AS c FROM (
                      SELECT a.cid, dims.j,
                             round(avg(p.e[{o} + dims.j]), 9) AS v
                      FROM s{s}a{i} a JOIN pts p USING (vec_id)
                      CROSS JOIN (SELECT unnest(
                        generate_series(1, {dsub})) AS j) dims
                      GROUP BY a.cid, dims.j) g
                    GROUP BY cid) u ON u.cid = s.cid)"""
            )
        parts.append(
            f""", cd{s} AS MATERIALIZED (
              SELECT vec_id, cid AS code{s} FROM (
                SELECT p.vec_id, s.cid,
                       row_number() OVER (PARTITION BY p.vec_id
                                          ORDER BY {dist}, s.cid) AS rk
                FROM pts p CROSS JOIN s{s}c{iters} s) q
              WHERE rk = 1)"""
        )
    joins = " ".join(f"JOIN cd{s} USING (vec_id)" for s in range(m))
    parts.append(
        f""", codes AS MATERIALIZED (
          SELECT p.vec_id AS neighbor_id,
                 {", ".join(f"code{s}" for s in range(m))}
          FROM pts p {joins})
        , qrs AS MATERIALIZED (
          SELECT vec_id AS query_id, e AS qe FROM pts WHERE vec_id < 10)"""
    )
    terms = []
    for s in range(m):
        o = s * dsub
        terms.append(
            f"list_sum(list_transform(generate_series(1, {dsub}),"
            f" j -> (q.qe[{o} + j] - b{s}.c[j])"
            f" * (q.qe[{o} + j] - b{s}.c[j])))"
        )
    bjoins = " ".join(
        f"JOIN s{s}c{iters} b{s} ON b{s}.cid = x.code{s}" for s in range(m)
    )
    parts.append(
        f""", adc AS MATERIALIZED (
          SELECT query_id, neighbor_id, adc,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc, neighbor_id)::BIGINT
                   AS rank
          FROM (
            SELECT q.query_id, x.neighbor_id,
                   round({" + ".join(terms)}, 6) AS adc
            FROM qrs q JOIN codes x ON x.neighbor_id <> q.query_id
            {bjoins}) z)"""
    )
    return "\n".join(parts)


def _pq_topk_sql(topk: int = 5) -> str:
    return (
        _pq_chain()
        + f"""
        SELECT query_id, neighbor_id, adc, rank FROM adc
        WHERE rank <= {topk}"""
    )


def _pq_rerank_sql(topk: int = 5, shortlist: int = 64) -> str:
    """ADC shortlist re-ranked with the exact metric — cosine computed
    over the same NORMALIZED vectors the Spark side uses, so the
    doubles (and their 6dp rounding) are bit-equal."""
    cos = _raw_cos("q.e", "n.e")
    return (
        _pq_chain()
        + f"""
        , shortq AS MATERIALIZED (
          SELECT query_id, neighbor_id FROM adc WHERE rank <= {shortlist})
        SELECT query_id, neighbor_id, cos, rank FROM (
          SELECT s.query_id, s.neighbor_id,
                 round({cos}, 6) AS cos,
                 row_number() OVER (PARTITION BY s.query_id
                    ORDER BY round({cos}, 6) DESC, s.neighbor_id)::BIGINT
                   AS rank
          FROM shortq s JOIN pts q ON q.vec_id = s.query_id
          JOIN pts n ON n.vec_id = s.neighbor_id) z
        WHERE rank <= {topk}"""
    )


def _ivfsq_chain(nprobe: int = 8, dim: int = 64, levels: int = 256) -> str:
    """CTE chain reproducing IVF-SQ (operators.ivfpq ann_ivfsq_topk):
    _ivf_chain's trained coarse quantizer, cell assignment +
    residuals (the _ivfpq_chain prefix), then GLOBAL per-dim residual
    bounds, clamp-floor SQ8 codes, and per-probe exact L2² against
    the midpoint-decoded residuals. Ends at CTE `isq`."""
    cos_pc = _raw_cos("p.e", "s.c", dim)
    decode = (
        f"(b.mns[j] + ((x.code[j] + 0.5) / {levels}.0)"
        f" * (b.mxs[j] - b.mns[j]))"
    )
    return (
        _ivf_chain()
        + f""", nasg AS MATERIALIZED (
          SELECT vec_id, cell_id FROM (
            SELECT p.vec_id, s.cell_id,
                   row_number() OVER (PARTITION BY p.vec_id
                      ORDER BY {cos_pc} DESC, s.cell_id) AS rk
            FROM pts p CROSS JOIN cents s) q WHERE rk = 1)
        , nres AS MATERIALIZED (
          SELECT p.vec_id, a.cell_id,
                 list_transform(generate_series(1, {dim}),
                                j -> p.e[j] - s.c[j]) AS r
          FROM pts p JOIN nasg a USING (vec_id)
          JOIN cents s ON s.cell_id = a.cell_id)
        , rb AS MATERIALIZED (
          SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs
          FROM (
            SELECT d, min(r[d]) AS mn, max(r[d]) AS mx
            FROM nres CROSS JOIN
                 (SELECT unnest(generate_series(1, {dim})) AS d) ds
            GROUP BY d))
        , rcodes AS MATERIALIZED (
          SELECT n.vec_id AS neighbor_id, n.cell_id,
                 list_transform(generate_series(1, {dim}), j ->
                   (CASE WHEN b.mxs[j] = b.mns[j] THEN 0
                         ELSE least(greatest(floor(((n.r[j] - b.mns[j])
                              / (b.mxs[j] - b.mns[j])) * {levels}), 0),
                              {levels - 1}) END)::BIGINT) AS code
          FROM nres n CROSS JOIN rb b)
        , qprobe AS MATERIALIZED (
          SELECT query_id, cell_id, qr FROM (
            SELECT p.vec_id AS query_id, s.cell_id,
                   list_transform(generate_series(1, {dim}),
                                  j -> p.e[j] - s.c[j]) AS qr,
                   row_number() OVER (PARTITION BY p.vec_id
                      ORDER BY {cos_pc} DESC, s.cell_id) AS rk
            FROM pts p CROSS JOIN cents s
            WHERE p.vec_id < 10) z WHERE rk <= {nprobe})
        , isq AS MATERIALIZED (
          SELECT query_id, neighbor_id, dist,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY dist, neighbor_id)::BIGINT
                   AS rank
          FROM (
            SELECT q.query_id, x.neighbor_id,
                   round(list_sum(list_transform(
                     generate_series(1, {dim}), j ->
                       (q.qr[j] - {decode}) * (q.qr[j] - {decode}))), 6)
                     AS dist
            FROM qprobe q JOIN rcodes x
              ON x.cell_id = q.cell_id
             AND x.neighbor_id <> q.query_id
            CROSS JOIN rb b) z)"""
    )


def _ivfsq_topk_sql(topk: int = 5) -> str:
    return (
        _ivfsq_chain()
        + f"""
        SELECT query_id, neighbor_id, dist, rank FROM isq
        WHERE rank <= {topk}"""
    )


def _ivfsq_recall_sql(topk: int = 5) -> str:
    cos_tb = _raw_cos("a.ce", "b.ce")
    return (
        _ivfsq_chain()
        + f"""
        , sqcorp AS MATERIALIZED (
          SELECT vec_id AS neighbor_id,
                 list_transform(embedding, x -> x::DOUBLE) AS ce
          FROM embeddings)
        , sqtruth AS MATERIALIZED (
          SELECT query_id, neighbor_id FROM (
            SELECT a.neighbor_id AS query_id, b.neighbor_id,
                   row_number() OVER (PARTITION BY a.neighbor_id
                      ORDER BY round({cos_tb}, 6) DESC, b.neighbor_id)
                     AS rank
            FROM sqcorp a JOIN sqcorp b
              ON a.neighbor_id <> b.neighbor_id
            WHERE a.neighbor_id < 10) t WHERE rank <= {topk})
        SELECT t.query_id,
               sum(CASE WHEN p.neighbor_id IS NOT NULL
                        THEN 1 ELSE 0 END)::BIGINT AS n_hit,
               round(sum(CASE WHEN p.neighbor_id IS NOT NULL
                              THEN 1 ELSE 0 END) / {topk}e0, 6) AS recall
        FROM sqtruth t LEFT JOIN (
          SELECT query_id, neighbor_id FROM isq WHERE rank <= {topk}) p
          ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
        GROUP BY t.query_id"""
    )


def _bootstrap_sql(n_boot: int = 100) -> str:
    """Poisson-bootstrap CI chain replicating operators.stats
    bootstrap_ci_poisson: identical hash uniforms, identical
    Poisson(1) inverse-CDF thresholds (repr-exact literals), 2·B
    aggregates in one scan, unnest to replicate means, exact order-
    statistic picks."""
    from mimir_spark.operators.stats import _POIS1_CDF, BOOT_M31

    def w_expr(b: int) -> str:
        u = (
            f"((cast(concat('0x', substring(md5(event_id::VARCHAR"
            f" || ':{b}'), 1, 8)) as bigint) & {BOOT_M31})"
            f" / {float(BOOT_M31 + 1)!r})"
        )
        branches = " ".join(
            f"WHEN {u} < {t!r} THEN {k}"
            for k, t in enumerate(_POIS1_CDF)
        )
        return f"(CASE {branches} ELSE {len(_POIS1_CDF)} END)"

    aggs = ",\n                   ".join(
        f"sum({w_expr(b)} * value) AS s{b},"
        f" sum({w_expr(b)})::BIGINT AS c{b}"
        for b in range(n_boot)
    )
    means = ", ".join(f"round(s{b} / c{b}, 6)" for b in range(n_boot))
    lo = max(1, int(n_boot * 0.025))
    hi = int(n_boot * 0.975)
    return f"""WITH wide AS MATERIALIZED (
              SELECT event_type, count(*)::BIGINT AS n,
                     round(avg(value), 6) AS mean_value,
                   {aggs}
              FROM events GROUP BY event_type),
            narrow AS (
              SELECT event_type, n, mean_value,
                     unnest([{means}]) AS m
              FROM wide),
            ranked AS (
              SELECT event_type, n, mean_value, m,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY m) AS rk
              FROM narrow)
            SELECT event_type, max(n)::BIGINT AS n,
                   max(mean_value) AS mean_value,
                   max(CASE WHEN rk = {lo} THEN m END) AS ci_lo,
                   max(CASE WHEN rk = {hi} THEN m END) AS ci_hi,
                   round(max(CASE WHEN rk = {hi} THEN m END)
                         - max(CASE WHEN rk = {lo} THEN m END), 6)
                     AS ci_width
            FROM ranked GROUP BY event_type"""


def _bbit_sql(threshold: float = 0.5) -> str:
    """b-bit minwise estimates over the verified LSH pair set — the
    128 signature columns h0..h127 compared per position (full value
    and low bit), all integer counts, replicating
    dedup.minhash_bbit_jaccard literally."""
    from mimir_spark.operators import dedup as _dd

    n = _dd.N_HASHES
    # list_sum over a literal list: a 128-term "+" chain exceeds the
    # binder's expression-depth limit; integer counts are order-free.
    n_match = "list_sum([" + ", ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(n)
    ) + "])"
    n_bit = "list_sum([" + ", ".join(
        f"CASE WHEN a.h{i} % 2 = b.h{i} % 2 THEN 1 ELSE 0 END"
        for i in range(n)
    ) + "])"
    return f"""WITH {_lsh_ctes(threshold)}
        SELECT doc_a, doc_b, j_exact,
               round(n_match / {n}.0, 6) AS j_sig,
               round(2.0 * (n_bit / {n}.0) - 1.0, 6) AS j_bbit,
               (abs(2.0 * (n_bit / {n}.0) - 1.0 - j_exact)
                <= 0.353553)::BIGINT AS within_4sd
        FROM (
          SELECT p.doc_a, p.doc_b, p.jaccard AS j_exact,
                 ({n_match})::BIGINT AS n_match,
                 ({n_bit})::BIGINT AS n_bit
          FROM lsh_pairs p
          JOIN sig a ON a.doc_id = p.doc_a
          JOIN sig b ON b.doc_id = p.doc_b)"""


def _logreg_ctes(iters: int = 30, lr: float = 5.0) -> str:
    """CTE chain reproducing the GD logistic-regression trainer
    (operators.mltrain): gopher-statistic features, then one
    MATERIALIZED round CTE per GD step — z as the identical
    left-assoc w·x chain, sigmoid 1/(1+exp(−z)), update
    w − lr·Σgrad/n rounded to the shared 6dp grid. Ends at CTEs
    `feat`, `nn`, `r{iters}`."""
    base = r"""WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> x <> '') AS toks,
                 length(regexp_replace(text, '\s+', '', 'g')) AS swl
          FROM documents),
        m AS (
          SELECT doc_id,
                 len(toks)::BIGINT AS n_words,
                 round(swl / len(toks), 6) AS mean_word_len,
                 round(len(list_filter(toks,
                     x -> contains(x, '#') OR contains(x, '...')))
                     / len(toks), 6) AS symbol_ratio,
                 round(len(list_filter(toks,
                     x -> regexp_matches(x, '[A-Za-z]')))
                     / len(toks), 6) AS alpha_word_ratio,
                 len(list_filter(toks, x -> x IN
                     ('the','be','to','of','and','that','have','with')
                     ))::BIGINT AS n_stopwords
          FROM t),
        feat AS MATERIALIZED (
          SELECT doc_id, 1.0 AS x0,
                 (n_words - 100.0) / 100.0 AS x1,
                 mean_word_len - 4.5 AS x2,
                 (n_stopwords - 2.0) / 2.0 AS x3,
                 ((n_words BETWEEN 50 AND 100000)
                  AND (mean_word_len BETWEEN 3.0 AND 10.0)
                  AND symbol_ratio <= 0.1 AND alpha_word_ratio >= 0.8
                  AND n_stopwords >= 2)::BIGINT::DOUBLE AS y
          FROM m),
        nn AS (SELECT count(*)::BIGINT AS n FROM feat)"""
    parts = [base]
    xs = ["x0", "x1", "x2", "x3"]
    for t in range(1, iters + 1):
        if t == 1:
            z = " + ".join(f"0.0*{x}" for x in xs)
            w_prev = ["0.0"] * len(xs)
            src = "FROM feat, nn"
        else:
            z = " + ".join(f"p.w{j}*{xs[j]}" for j in range(len(xs)))
            w_prev = [f"max(p.w{j})" for j in range(len(xs))]
            src = f"FROM feat, nn, r{t - 1} p"
        cols = ",\n                 ".join(
            f"round({w_prev[j]} - {lr!r} * sum((1.0/(1.0+exp(-({z})))"
            f" - y) * {xs[j]}) / max(nn.n), 6) AS w{j}"
            for j in range(len(xs))
        )
        parts.append(
            f""", r{t} AS MATERIALIZED (
          SELECT {cols}
          {src})"""
        )
    return "".join(parts)


def _logreg_train_sql(iters: int = 30, lr: float = 5.0) -> str:
    rounds = "\n            UNION ALL ".join(
        f"SELECT {t}::BIGINT AS step, w0, w1, w2, w3 FROM r{t}"
        for t in range(1, iters + 1)
    )
    return _logreg_ctes(iters, lr) + "\n            " + rounds


def _logreg_score_sql(iters: int = 30, lr: float = 5.0) -> str:
    z = " + ".join(f"w.w{j}*x{j}" for j in range(4))
    return (
        _logreg_ctes(iters, lr)
        + f"""
        SELECT doc_id, prob, (prob >= 0.5)::BIGINT AS pred, label,
               ((prob >= 0.5)::BIGINT = label)::BIGINT AS correct
        FROM (SELECT doc_id,
                     round(1.0/(1.0+exp(-({z}))), 6) AS prob,
                     y::BIGINT AS label
              FROM feat, r{iters} w)"""
    )


def _sq_chain(levels: int = 256, dim: int = 64, topk: int = 5) -> str:
    """CTE chain reproducing the SQ8 pipeline (operators.pq
    ann_sq_topk): same normalization as _pq_chain, per-dim min/max
    bounds, clamp-floor encode, midpoint decode, fixed-order dot fold
    rounded to 6dp. Ends at CTE `sqtop`."""
    return f"""WITH pts AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(embedding, x -> x::DOUBLE /
                   sqrt(list_sum(list_transform(embedding,
                        y -> y::DOUBLE * y::DOUBLE)))) AS e
          FROM embeddings),
        dmm AS (
          SELECT d, min(e[d]) AS mn, max(e[d]) AS mx
          FROM pts CROSS JOIN
               (SELECT unnest(generate_series(1, {dim})) AS d) ds
          GROUP BY d),
        bounds AS MATERIALIZED (
          SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs
          FROM dmm),
        codes AS MATERIALIZED (
          SELECT p.vec_id AS neighbor_id,
                 list_transform(generate_series(1, {dim}), j ->
                   (CASE WHEN b.mxs[j] = b.mns[j] THEN 0
                         ELSE least(greatest(floor(((p.e[j] - b.mns[j])
                              / (b.mxs[j] - b.mns[j])) * {levels}), 0),
                              {levels - 1}) END)::BIGINT) AS code
          FROM pts p CROSS JOIN bounds b),
        sqscored AS (
          SELECT q.vec_id AS query_id, c.neighbor_id,
                 round(list_sum(list_transform(generate_series(1, {dim}),
                   j -> q.e[j] * (b.mns[j]
                        + ((c.code[j] + 0.5) / {levels}.0)
                        * (b.mxs[j] - b.mns[j])))), 6) AS sqdot
          FROM codes c CROSS JOIN bounds b
          JOIN pts q ON q.vec_id < 10 AND q.vec_id <> c.neighbor_id),
        sqtop AS (
          SELECT query_id, neighbor_id, sqdot,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY sqdot DESC, neighbor_id)::BIGINT AS rank
          FROM sqscored)"""


def _sq_topk_sql(topk: int = 5) -> str:
    return (
        _sq_chain()
        + f"""
        SELECT query_id, neighbor_id, sqdot, rank FROM sqtop
        WHERE rank <= {topk}"""
    )


def _sq_recall_sql(topk: int = 5) -> str:
    cos_tb = _raw_cos("a.ce", "b.ce")
    return (
        _sq_chain()
        + f"""
        , corpus AS MATERIALIZED (
          SELECT vec_id AS neighbor_id,
                 list_transform(embedding, x -> x::DOUBLE) AS ce
          FROM embeddings)
        , truth AS MATERIALIZED (
          SELECT query_id, neighbor_id FROM (
            SELECT a.neighbor_id AS query_id, b.neighbor_id,
                   row_number() OVER (PARTITION BY a.neighbor_id
                      ORDER BY round({cos_tb}, 6) DESC, b.neighbor_id)
                     AS rank
            FROM corpus a JOIN corpus b
              ON a.neighbor_id <> b.neighbor_id
            WHERE a.neighbor_id < 10) t WHERE rank <= {topk})
        SELECT t.query_id,
               sum(CASE WHEN p.neighbor_id IS NOT NULL
                        THEN 1 ELSE 0 END)::BIGINT AS n_hit,
               round(sum(CASE WHEN p.neighbor_id IS NOT NULL
                              THEN 1 ELSE 0 END) / {topk}e0, 6) AS recall
        FROM truth t LEFT JOIN (
          SELECT query_id, neighbor_id FROM sqtop WHERE rank <= {topk}) p
          ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
        GROUP BY t.query_id"""
    )


def _pq_recall_sql(topk: int = 5) -> str:
    cos_tb = _raw_cos("a.ce", "b.ce")
    return (
        _pq_chain()
        + f"""
        , corpus AS MATERIALIZED (
          SELECT vec_id AS neighbor_id,
                 list_transform(embedding, x -> x::DOUBLE) AS ce
          FROM embeddings)
        , truth AS MATERIALIZED (
          SELECT query_id, neighbor_id FROM (
            SELECT a.neighbor_id AS query_id, b.neighbor_id,
                   row_number() OVER (PARTITION BY a.neighbor_id
                      ORDER BY round({cos_tb}, 6) DESC, b.neighbor_id)
                     AS rank
            FROM corpus a JOIN corpus b
              ON a.neighbor_id <> b.neighbor_id
            WHERE a.neighbor_id < 10) t WHERE rank <= {topk})
        SELECT t.query_id,
               sum(CASE WHEN p.neighbor_id IS NOT NULL
                        THEN 1 ELSE 0 END)::BIGINT AS n_hit,
               round(sum(CASE WHEN p.neighbor_id IS NOT NULL
                              THEN 1 ELSE 0 END) / {topk}e0, 6) AS recall
        FROM truth t LEFT JOIN (
          SELECT query_id, neighbor_id FROM adc WHERE rank <= {topk}) p
          ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
        GROUP BY t.query_id"""
    )


def _ivfpq_chain(
    m: int = 8,
    dsub: int = 8,
    k: int = 16,
    iters: int = 3,
    nprobe: int = 8,
    dim: int = 64,
) -> str:
    """CTE chain reproducing the IVF-PQ pipeline (operators.ivfpq):
    reuses _ivf_chain's trained coarse quantizer (`pts`, `cents`),
    then adds the normalized-space cell assignment (cos argmax, ties →
    lowest cell), elementwise residuals, per-subspace Lloyd on the
    residual slices (the shared 9dp recipe), residual codes, query
    probes with per-cell query residuals, and the fixed-order ADC
    fold. Ends at CTE `iadc`."""
    cos_pc = _raw_cos("p.e", "s.c", dim)
    parts = [
        _ivf_chain(),
        f""", nasg AS MATERIALIZED (
          SELECT vec_id, cell_id FROM (
            SELECT p.vec_id, s.cell_id,
                   row_number() OVER (PARTITION BY p.vec_id
                      ORDER BY {cos_pc} DESC, s.cell_id) AS rk
            FROM pts p CROSS JOIN cents s) q WHERE rk = 1)
        , nres AS MATERIALIZED (
          SELECT p.vec_id, a.cell_id,
                 list_transform(generate_series(1, {dim}),
                                j -> p.e[j] - s.c[j]) AS r
          FROM pts p JOIN nasg a USING (vec_id)
          JOIN cents s ON s.cell_id = a.cell_id)""",
    ]
    for s in range(m):
        o = s * dsub
        dist = (
            f"list_sum(list_transform(generate_series(1, {dsub}),"
            f" j -> (p.r[{o} + j] - s.c[j]) * (p.r[{o} + j] - s.c[j])))"
        )
        parts.append(
            f""", p{s}c0 AS MATERIALIZED (
              SELECT row_number() OVER (ORDER BY vec_id) AS cid,
                     list_transform(r[{o + 1}:{o + dsub}],
                                    x -> round(x, 9)) AS c
              FROM (SELECT vec_id, r FROM nres ORDER BY vec_id
                    LIMIT {k}) q0)"""
        )
        for i in range(iters):
            parts.append(
                f""", p{s}a{i} AS MATERIALIZED (
                  SELECT vec_id, cid FROM (
                    SELECT p.vec_id, s.cid,
                           row_number() OVER (PARTITION BY p.vec_id
                                              ORDER BY {dist}, s.cid) AS rk
                    FROM nres p CROSS JOIN p{s}c{i} s) q
                  WHERE rk = 1)
                , p{s}c{i + 1} AS MATERIALIZED (
                  SELECT s.cid, coalesce(u.c, s.c) AS c
                  FROM p{s}c{i} s LEFT JOIN (
                    SELECT cid, list(v ORDER BY j) AS c FROM (
                      SELECT a.cid, dims.j,
                             round(avg(p.r[{o} + dims.j]), 9) AS v
                      FROM p{s}a{i} a JOIN nres p USING (vec_id)
                      CROSS JOIN (SELECT unnest(
                        generate_series(1, {dsub})) AS j) dims
                      GROUP BY a.cid, dims.j) g
                    GROUP BY cid) u ON u.cid = s.cid)"""
            )
        parts.append(
            f""", pcd{s} AS MATERIALIZED (
              SELECT vec_id, cid AS code{s} FROM (
                SELECT p.vec_id, s.cid,
                       row_number() OVER (PARTITION BY p.vec_id
                                          ORDER BY {dist}, s.cid) AS rk
                FROM nres p CROSS JOIN p{s}c{iters} s) q
              WHERE rk = 1)"""
        )
    joins = " ".join(f"JOIN pcd{s} USING (vec_id)" for s in range(m))
    parts.append(
        f""", pcodes AS MATERIALIZED (
          SELECT n.vec_id AS neighbor_id, n.cell_id,
                 {", ".join(f"code{s}" for s in range(m))}
          FROM nres n {joins})
        , qprobe AS MATERIALIZED (
          SELECT query_id, cell_id, qr FROM (
            SELECT p.vec_id AS query_id, s.cell_id,
                   list_transform(generate_series(1, {dim}),
                                  j -> p.e[j] - s.c[j]) AS qr,
                   row_number() OVER (PARTITION BY p.vec_id
                      ORDER BY {cos_pc} DESC, s.cell_id) AS rk
            FROM pts p CROSS JOIN cents s
            WHERE p.vec_id < 10) z WHERE rk <= {nprobe})"""
    )
    terms = []
    for s in range(m):
        o = s * dsub
        terms.append(
            f"list_sum(list_transform(generate_series(1, {dsub}),"
            f" j -> (q.qr[{o} + j] - b{s}.c[j])"
            f" * (q.qr[{o} + j] - b{s}.c[j])))"
        )
    bjoins = " ".join(
        f"JOIN p{s}c{iters} b{s} ON b{s}.cid = x.code{s}" for s in range(m)
    )
    parts.append(
        f""", iadc AS MATERIALIZED (
          SELECT query_id, neighbor_id, adc,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY adc, neighbor_id)::BIGINT
                   AS rank
          FROM (
            SELECT q.query_id, x.neighbor_id,
                   round({" + ".join(terms)}, 6) AS adc
            FROM qprobe q JOIN pcodes x
              ON x.cell_id = q.cell_id
             AND x.neighbor_id <> q.query_id
            {bjoins}) z)"""
    )
    return "\n".join(parts)


def _ivfpq_topk_sql(topk: int = 5) -> str:
    return (
        _ivfpq_chain()
        + f"""
        SELECT query_id, neighbor_id, adc, rank FROM iadc
        WHERE rank <= {topk}"""
    )


def _ivfpq_rerank_sql(topk: int = 5, shortlist: int = 64) -> str:
    """IVFADC shortlist re-ranked with the exact metric over the same
    normalized vectors the Spark side uses (bit-equal 6dp cosines)."""
    cos = _raw_cos("q.e", "n.e")
    return (
        _ivfpq_chain()
        + f"""
        , ishort AS MATERIALIZED (
          SELECT query_id, neighbor_id FROM iadc WHERE rank <= {shortlist})
        SELECT query_id, neighbor_id, cos, rank FROM (
          SELECT s.query_id, s.neighbor_id,
                 round({cos}, 6) AS cos,
                 row_number() OVER (PARTITION BY s.query_id
                    ORDER BY round({cos}, 6) DESC, s.neighbor_id)::BIGINT
                   AS rank
          FROM ishort s JOIN pts q ON q.vec_id = s.query_id
          JOIN pts n ON n.vec_id = s.neighbor_id) z
        WHERE rank <= {topk}"""
    )


def _ivfpq_recall_sql(topk: int = 5) -> str:
    cos_tb = _raw_cos("a.ce", "b.ce")
    return (
        _ivfpq_chain()
        + f"""
        , truth AS MATERIALIZED (
          SELECT query_id, neighbor_id FROM (
            SELECT a.neighbor_id AS query_id, b.neighbor_id,
                   row_number() OVER (PARTITION BY a.neighbor_id
                      ORDER BY round({cos_tb}, 6) DESC, b.neighbor_id)
                     AS rank
            FROM corpus a JOIN corpus b
              ON a.neighbor_id <> b.neighbor_id
            WHERE a.neighbor_id < 10) t WHERE rank <= {topk})
        SELECT t.query_id,
               sum(CASE WHEN p.neighbor_id IS NOT NULL
                        THEN 1 ELSE 0 END)::BIGINT AS n_hit,
               round(sum(CASE WHEN p.neighbor_id IS NOT NULL
                              THEN 1 ELSE 0 END) / {topk}e0, 6) AS recall
        FROM truth t LEFT JOIN (
          SELECT query_id, neighbor_id FROM iadc WHERE rank <= {topk}) p
          ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
        GROUP BY t.query_id"""
    )


def _sssp_sql(rounds: int = 12) -> str:
    """Unrolled synchronous Bellman-Ford over the weighted bipartite
    order-part graph — integer min over integer sums, so the
    `rounds`-step relaxation prefix is bit-equal on any engine with
    no rounding anywhere."""
    parts = [
        """WITH base AS MATERIALIZED (
          SELECT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst,
                 min(l_quantity::BIGINT) AS w
          FROM lineitem GROUP BY 1, 2),
        ed AS MATERIALIZED (
          SELECT src, dst, w FROM base
          UNION ALL
          SELECT dst AS src, src AS dst, w FROM base),
        d0(node, dist) AS (
          SELECT (SELECT min(l_orderkey) * 2 FROM lineitem)::BIGINT,
                 0::BIGINT)"""
    ]
    for i in range(rounds):
        parts.append(
            f""", d{i + 1} AS MATERIALIZED (
              SELECT node, min(dist)::BIGINT AS dist FROM (
                SELECT node, dist FROM d{i}
                UNION ALL
                SELECT e.dst AS node, d.dist + e.w AS dist
                FROM d{i} d JOIN ed e ON e.src = d.node) z
              GROUP BY node)"""
        )
    parts.append(f"SELECT node, dist FROM d{rounds}")
    return "\n".join(parts)


def _nnd_dot(dim: int = 64) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {dim}),"
        f" i -> a.e[i] * b.e[i]))"
    )


def _nnd_graph_parts(
    kp: int = 10, rounds: int = 6, dim: int = 64
) -> list[str]:
    """The shared NN-descent CTE chain (pts … g{rounds}) — used by the
    knn_graph_descent oracle and, since round 12, as the graph-build
    prefix of the ann_graph_topk / ann_graph_recall beam-search
    oracles."""
    dot_ab = _nnd_dot(dim)
    parts = [
        f"""WITH pts AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(embedding, x -> x::DOUBLE) AS e,
                 sqrt(list_sum(list_transform(embedding,
                      x -> x::DOUBLE * x::DOUBLE))) AS nrm
          FROM embeddings),
        nn0 AS (SELECT count(*) AS n FROM pts),
        g0 AS (
          SELECT vec_id AS u,
                 unnest(list_transform(generate_series(1, {kp}),
                        i -> (vec_id + i) % n)) AS v
          FROM pts CROSS JOIN nn0)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""", b{r} AS (
          SELECT u, v FROM g{r - 1}
          UNION ALL SELECT v AS u, u AS v FROM g{r - 1})
        , c{r} AS (
          SELECT DISTINCT u, v FROM (
            SELECT e2.u AS u, e1.v AS v
            FROM b{r} e1 JOIN b{r} e2 ON e1.u = e2.v
            WHERE e2.u <> e1.v
            UNION ALL SELECT u, v FROM g{r - 1}) q)
        , g{r} AS MATERIALIZED (
          SELECT u, v FROM (
            SELECT c.u, c.v,
                   row_number() OVER (
                     PARTITION BY c.u
                     ORDER BY round({dot_ab} / (a.nrm * b.nrm), 6) DESC,
                              c.v) AS rk
            FROM c{r} c
            JOIN pts a ON a.vec_id = c.u
            JOIN pts b ON b.vec_id = c.v) q
          WHERE rk <= {kp})"""
        )
    return parts


def _nnd_sql(
    k: int = 3, kp: int = 10, rounds: int = 6, dim: int = 64
) -> str:
    """Unrolled NN-descent (DuckDB dialect): ring seed graph, per
    round the neighbors-of-neighbors candidate join over the
    undirected edge set, 6dp-rounded cosine scoring (the identical
    dot/(‖a‖·‖b‖) sequential folds), (cos desc, v) top-k."""
    dot_ab = _nnd_dot(dim)
    parts = _nnd_graph_parts(kp, rounds, dim)
    parts.append(
        f"""SELECT vec_id, neighbor_id, cos, rank FROM (
          SELECT u AS vec_id, v AS neighbor_id, cos,
                 row_number() OVER (PARTITION BY u
                                    ORDER BY cos DESC, v)::BIGINT AS rank
          FROM (
            SELECT g.u, g.v, round({dot_ab} / (a.nrm * b.nrm), 6) AS cos
            FROM g{rounds} g
            JOIN pts a ON a.vec_id = g.u
            JOIN pts b ON b.vec_id = g.v) q) r
        WHERE rank <= {k}"""
    )
    return "\n".join(parts)


def _gann_oracle_n() -> int:
    """Row count of the gate-corpus embeddings table (the driver
    compares at sf0.01) — the oracle must unroll the SAME layer count
    the Spark auto-L formula derives from n. Footer-only pyarrow read;
    falls back to the generated corpus's stable 500 if the file is
    unreadable at SQL-build time."""
    try:
        import pyarrow.parquet as _pq

        return _pq.ParquetFile(
            "/root/testdata/sf0.01/embeddings.parquet"
        ).metadata.num_rows
    except Exception:
        return 500


def _gann_ctes(
    k: int = 5,
    beam: int = 8,
    brounds: int = 3,
    kp: int = 10,
    grounds: int = 6,
    dim: int = 64,
    n_queries: int = 10,
    sample: int = 16,
    kpc: int = 6,
    groundsc: int = 4,
    crounds: int = 3,
    n_layers: int | None = None,
) -> str:
    """L-layer beam-search CTE chain over the NN-descent graphs,
    ending in a CTE `gtopk(query_id, neighbor_id, cos, rank)` —
    replaying the round-14 Spark path literally: (1) full descent
    graph (g{grounds} → und); (2) per coarse layer ℓ = L−1..1, a
    descent graph over the vec_id % sample^ℓ == 0 subset, ring-seeded
    on the dense cid = vec_id/sample^ℓ (l{ℓ}g{groundsc} → l{ℓ}und);
    (3) entry = score the query against the vec_id % sample^L == 0
    top set, keep top-beam; (4) `crounds` beam rounds expanding along
    each l{ℓ}und top-down, then `brounds` rounds along und — each
    round 6dp cosine vs the query, top-beam (cos desc, v), query's
    own node excluded throughout. L defaults to the Spark auto-layer
    formula at the gate corpus's n (L=2 at n=500, sample=16 — the
    round-13 two-level chain falls out as the special case)."""
    from mimir_spark.operators.similarity import _gann_n_layers

    lyr = n_layers or _gann_n_layers(_gann_oracle_n(), sample)
    dot_ab = _nnd_dot(dim)
    dot_qb = (
        f"list_sum(list_transform(generate_series(1, {dim}),"
        f" i -> q.e[i] * b.e[i]))"
    )
    stride_top = sample**lyr
    score_tpl = f"""sc{{tag}} AS (
      SELECT c.query_id, c.v,
             round({dot_qb} / (q.nrm * b.nrm), 6) AS cos
      FROM cand{{tag}} c
      JOIN pts q ON q.vec_id = c.query_id
      JOIN pts b ON b.vec_id = c.v)
    , beam{{tag}} AS MATERIALIZED (
      SELECT query_id, v, cos FROM sc{{tag}}
      QUALIFY row_number() OVER (PARTITION BY query_id
              ORDER BY cos DESC, v) <= {{kk}})"""
    parts = _nnd_graph_parts(kp, grounds, dim)
    parts.append(
        f""", und AS MATERIALIZED (
      SELECT DISTINCT u, v FROM (
        SELECT u, v FROM g{grounds}
        UNION ALL SELECT v AS u, u AS v FROM g{grounds}) q)"""
    )
    for ell in range(1, lyr):
        stride = sample**ell
        parts.append(
            f""", l{ell}pts AS MATERIALIZED (
      SELECT vec_id, (vec_id // {stride}) AS cid
      FROM pts WHERE vec_id % {stride} = 0)
    , l{ell}n0 AS (SELECT count(*) AS m FROM l{ell}pts)
    , l{ell}g0 AS (
      SELECT vec_id AS u,
             unnest(list_transform(generate_series(1, {kpc}),
                    i -> ((cid + i) % m) * {stride})) AS v
      FROM l{ell}pts CROSS JOIN l{ell}n0)"""
        )
        for r in range(1, groundsc + 1):
            parts.append(
                f""", l{ell}b{r} AS (
      SELECT u, v FROM l{ell}g{r - 1}
      UNION ALL SELECT v AS u, u AS v FROM l{ell}g{r - 1})
    , l{ell}c{r} AS (
      SELECT DISTINCT u, v FROM (
        SELECT e2.u AS u, e1.v AS v
        FROM l{ell}b{r} e1 JOIN l{ell}b{r} e2 ON e1.u = e2.v
        WHERE e2.u <> e1.v
        UNION ALL SELECT u, v FROM l{ell}g{r - 1}) q)
    , l{ell}g{r} AS MATERIALIZED (
      SELECT u, v FROM (
        SELECT c.u, c.v,
               row_number() OVER (
                 PARTITION BY c.u
                 ORDER BY round({dot_ab} / (a.nrm * b.nrm), 6) DESC,
                          c.v) AS rk
        FROM l{ell}c{r} c
        JOIN pts a ON a.vec_id = c.u
        JOIN pts b ON b.vec_id = c.v) q
      WHERE rk <= {kpc})"""
            )
        parts.append(
            f""", l{ell}und AS MATERIALIZED (
      SELECT DISTINCT u, v FROM (
        SELECT u, v FROM l{ell}g{groundsc}
        UNION ALL SELECT v AS u, u AS v FROM l{ell}g{groundsc}) q)"""
        )
    parts.append(
        f""", qids AS (SELECT vec_id AS query_id FROM pts WHERE vec_id < {n_queries})
    , candt0 AS (
      SELECT query_id, e.v
      FROM qids, (SELECT vec_id AS v FROM pts
                  WHERE vec_id % {stride_top} = 0) e
      WHERE e.v <> query_id)
    , {score_tpl.format(tag='t0', kk=beam)}"""
    )
    prev = "beamt0"
    for ell in range(lyr - 1, 0, -1):
        for r in range(1, crounds + 1):
            parts.append(
                f""", candc{ell}_{r} AS (
      SELECT DISTINCT query_id, v FROM (
        SELECT query_id, v FROM {prev}
        UNION ALL
        SELECT bm.query_id, u2.v
        FROM {prev} bm JOIN l{ell}und u2 ON u2.u = bm.v) q
      WHERE v <> query_id)
    , {score_tpl.format(tag=f'c{ell}_{r}', kk=beam)}"""
            )
            prev = f"beamc{ell}_{r}"
    for r in range(1, brounds + 1):
        parts.append(
            f""", cand{r} AS (
      SELECT DISTINCT query_id, v FROM (
        SELECT query_id, v FROM {prev}
        UNION ALL
        SELECT bm.query_id, u2.v
        FROM {prev} bm JOIN und u2 ON u2.u = bm.v) q
      WHERE v <> query_id)
    , {score_tpl.format(tag=r, kk=beam)}"""
        )
        prev = f"beam{r}"
    parts.append(
        f""", gtopk AS (
      SELECT query_id, v AS neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, v)::BIGINT AS rank
      FROM {prev}
      QUALIFY rank <= {k})"""
    )
    return "\n".join(parts)


def _gann_topk_sql(**kw) -> str:
    return (
        _gann_ctes(**kw)
        + "\nSELECT query_id, neighbor_id, cos, rank FROM gtopk"
    )


def _gann_recall_sql(k: int = 5, dim: int = 64, **kw) -> str:
    """Per-query recall@k of the graph beam search vs brute-force
    ground truth, BOTH re-derived inside the oracle (the
    ann_ivf_recall pattern). n_queries is threaded into the truth CTE
    so the two sides can never desynchronize on the query count."""
    dot_ab = _nnd_dot(dim)
    n_queries = kw.get("n_queries", 10)
    return (
        _gann_ctes(k=k, dim=dim, **kw)
        + f"""
        , truth AS MATERIALIZED (
          SELECT query_id, neighbor_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY a.vec_id
                      ORDER BY round({dot_ab} / (a.nrm * b.nrm), 6) DESC,
                               b.vec_id) AS rank
            FROM pts a JOIN pts b ON a.vec_id <> b.vec_id
            WHERE a.vec_id < {n_queries}) t WHERE rank <= {k})
        SELECT t.query_id,
               sum(CASE WHEN g.neighbor_id IS NOT NULL
                        THEN 1 ELSE 0 END)::BIGINT AS n_hit,
               round(sum(CASE WHEN g.neighbor_id IS NOT NULL
                              THEN 1 ELSE 0 END) / {k}e0, 6) AS recall
        FROM truth t LEFT JOIN gtopk g
          ON g.query_id = t.query_id AND g.neighbor_id = t.neighbor_id
        GROUP BY t.query_id"""
    )


def _kcenter_sql(k: int = 8, dim: int = 64) -> str:
    """Unrolled Gonzalez greedy k-center (DuckDB dialect). Equality
    with the Spark operator needs NO distance rounding: squared-L2 is
    a sequential fold over j=1..dim in both engines (F.aggregate ≡
    list_sum), Spark's array_min over all centers equals the iterative
    least() chain exactly, and argmax ties break to the lowest vec_id
    on both sides. Only the REPORTED radii are rounded (6dp)."""

    def dist(s: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, {dim}),"
            f" j -> (p.e[j] - {s}.e[j]) * (p.e[j] - {s}.e[j])))"
        )

    parts = [
        f"""WITH pts AS MATERIALIZED (
          SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
          FROM embeddings),
        s1 AS MATERIALIZED (
          SELECT vec_id, e FROM pts ORDER BY vec_id LIMIT 1),
        d1 AS MATERIALIZED (
          SELECT p.vec_id, p.e, {dist('s')} AS dmin
          FROM pts p CROSS JOIN s1 s)"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f""", s{i} AS MATERIALIZED (
              SELECT vec_id, e, dmin FROM d{i - 1}
              ORDER BY dmin DESC, vec_id LIMIT 1)
            , d{i} AS MATERIALIZED (
              SELECT p.vec_id, p.e, least(p.dmin, {dist('s')}) AS dmin
              FROM d{i - 1} p CROSS JOIN s{i} s)"""
        )
    parts.append(
        f""", cov AS (SELECT round(max(dmin), 6) AS cover_radius
                      FROM d{k})
        SELECT 1::INT AS rank, s1.vec_id, 0.0::DOUBLE AS sel_radius,
               cov.cover_radius
        FROM s1 CROSS JOIN cov"""
    )
    for i in range(2, k + 1):
        parts.append(
            f"""UNION ALL
            SELECT {i}::INT AS rank, s{i}.vec_id,
                   round(s{i}.dmin, 6) AS sel_radius, cov.cover_radius
            FROM s{i} CROSS JOIN cov"""
        )
    return "\n".join(parts)


def _kmeans_sql(k: int = 8, dim: int = 64, iters: int = 5) -> str:
    """Unrolled Lloyd k-means (DuckDB dialect — list arithmetic and
    AS MATERIALIZED, which pins each round's centroid table to ONE
    evaluation; without it the two references per round would inline
    to 2^iters copies of the whole chain). Equality with the Spark
    operator holds because BOTH round centroid coordinates to 9 dp per
    round (order-dependent per-dim sums), assignment argmin breaks
    ties toward the lowest cid on both sides, and the final inertia is
    rounded to 4 dp."""
    dist = (
        "list_sum(list_transform(generate_series(1, {d}),"
        " j -> (p.e[j] - s.c[j]) * (p.e[j] - s.c[j])))"
    ).format(d=dim)
    parts = [
        f"""WITH pts AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(embedding, x -> x::DOUBLE) AS e
          FROM embeddings),
        c0 AS MATERIALIZED (
          SELECT row_number() OVER (ORDER BY vec_id) AS cid,
                 list_transform(embedding, x -> x::DOUBLE) AS c
          FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {k}) q0)"""
    ]
    for i in range(iters):
        parts.append(
            f""", a{i} AS MATERIALIZED (
              SELECT vec_id, cid FROM (
                SELECT p.vec_id, s.cid,
                       row_number() OVER (PARTITION BY p.vec_id
                                          ORDER BY {dist}, s.cid) AS rk
                FROM pts p CROSS JOIN c{i} s) q
              WHERE rk = 1)
            , c{i + 1} AS MATERIALIZED (
              SELECT s.cid, coalesce(u.c, s.c) AS c
              FROM c{i} s LEFT JOIN (
                SELECT cid, list(v ORDER BY j) AS c FROM (
                  SELECT a.cid, dims.j, round(avg(p.e[dims.j]), 9) AS v
                  FROM a{i} a JOIN pts p USING (vec_id)
                  CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS j)
                    dims
                  GROUP BY a.cid, dims.j) g
                GROUP BY cid) u ON u.cid = s.cid)"""
        )
    parts.append(
        f"""SELECT cid::BIGINT AS cluster_id, count(*) AS n_points,
               round(sum(dist), 4) AS inertia
        FROM (
          SELECT p.vec_id, s.cid, {dist} AS dist,
                 row_number() OVER (PARTITION BY p.vec_id
                                    ORDER BY {dist}, s.cid) AS rk
          FROM pts p CROSS JOIN c{iters} s) q
        WHERE rk = 1 GROUP BY cid"""
    )
    return "\n".join(parts)


def _pagerank_sql(iters: int = 10, damping: str = "85e-2") -> str:
    """Unrolled power iteration over the bipartite order-part graph
    (chained CTEs, one reference to the previous round each — linear
    under per-reference inlining). Equality with the Spark operator
    holds because BOTH round every rank to 9 dp per round: the in-sum
    is an order-dependent double sum, and the 1e-9 grid absorbs its
    ~1e-18 per-sum drift, making the fixed-round iteration value-
    hashable cross-engine."""
    parts = [
        """WITH base AS (
          SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst
          FROM lineitem),
        ed AS (SELECT src, dst FROM base
               UNION ALL SELECT dst AS src, src AS dst FROM base),
        dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
        ce AS (SELECT e.src, e.dst, d.deg FROM ed e JOIN dg d ON d.src = e.src),
        nn AS (SELECT count(*) AS n FROM dg),
        r0 AS (SELECT src AS node, 1e0 / (SELECT n FROM nn) AS rank FROM dg)"""
    ]
    for i in range(iters):
        parts.append(
            f""", r{i + 1} AS (
              SELECT c.dst AS node,
                     round((1e0 - {damping}) / (SELECT n FROM nn)
                           + {damping} * sum(r.rank / c.deg), 9) AS rank
              FROM ce c JOIN r{i} r ON r.node = c.src
              GROUP BY c.dst)"""
        )
    parts.append(f"SELECT node, round(rank, 6) AS rank FROM r{iters}")
    return "\n".join(parts)


def _k_core_sql(k: int = 6, rounds: int = 14) -> str:
    """Unrolled k-core peel over the bipartite order-part graph as a
    chained-CTE pipeline (pure ANSI — runs on DuckDB AND Spark SQL).
    Rounds past the fixed point are no-ops, so a fixed unroll ≥ the
    data's peel depth (10 at sf0.01 with k=6) is exactly the
    operator's converged peel.

    Every CTE is referenced EXACTLY ONCE (each round explodes the
    previous edge set's endpoints with a 2-row cross join, computes
    node degree via count() over (partition by n) and the edge's
    surviving test via min() over (partition by u, v)); engines that
    inline CTEs per reference (DuckDB) would otherwise expand a
    naive two-references-per-round peel to 4^rounds scans."""
    parts = [
        "WITH e0 AS (SELECT DISTINCT l_orderkey * 2 AS u,"
        " l_partkey * 2 + 1 AS v FROM lineitem)"
    ]
    for i in range(rounds):
        parts.append(
            f""", x{i} AS (
              SELECT u, v, side,
                     CASE WHEN side = 0 THEN u ELSE v END AS n
              FROM e{i} CROSS JOIN
                   (SELECT 0 AS side UNION ALL SELECT 1 AS side) s{i})
            , e{i + 1} AS (
              SELECT u, v FROM (
                SELECT u, v, side, min(dn) OVER (PARTITION BY u, v) AS md
                FROM (SELECT u, v, side,
                             count(*) OVER (PARTITION BY n) AS dn
                      FROM x{i}) q{i}
              ) p{i} WHERE md >= {k} AND side = 0)"""
        )
    parts.append(
        f""", xf AS (
          SELECT CASE WHEN side = 0 THEN u ELSE v END AS n
          FROM e{rounds} CROSS JOIN
               (SELECT 0 AS side UNION ALL SELECT 1 AS side) sf)
        SELECT n AS node, count(*) AS degree_in_core FROM xf GROUP BY n"""
    )
    return "\n".join(parts)


def _label_propagation_sql(iters: int = 5) -> str:
    """Unrolled synchronous label propagation on the part
    co-occurrence graph (pure ANSI): per round, (node, label) vote
    counts then a per-node argmax — max count, min label tie-break,
    exactly the operator's max(struct(c, -label)) — as a window-max +
    conditional-min pair."""
    parts = [
        """WITH po AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        ed AS (
          SELECT DISTINCT a.p AS u, b.p AS v
          FROM po a JOIN po b ON a.o = b.o AND a.p < b.p),
        nbrs AS (SELECT u, v FROM ed UNION SELECT v AS u, u AS v FROM ed),
        lab0 AS (SELECT DISTINCT u AS node, u AS label FROM nbrs)"""
    ]
    for i in range(iters):
        parts.append(
            f""", vt{i} AS (
              SELECT n.v AS n2, l.label AS label, count(*) AS c
              FROM nbrs n JOIN lab{i} l ON n.u = l.node
              GROUP BY n.v, l.label)
            , lab{i + 1} AS (
              SELECT n2 AS node,
                     min(CASE WHEN c = mc THEN label END) AS label
              FROM (SELECT n2, label, c,
                           max(c) OVER (PARTITION BY n2) AS mc
                    FROM vt{i}) w{i}
              GROUP BY n2)"""
        )
    parts.append(f"SELECT node, label AS community FROM lab{iters}")
    return "\n".join(parts)


def _html_extract_sql() -> str:
    """html_extract_text's expected output is a CLOSED FORM of
    (doc_id, tokens) — the synthetic-HTML generation rule inverted:
    extraction = 'Document {id}' + space-joined tokens; block/link
    counts from the paragraph-wrap / nav / sidebar constants. The
    oracle never parses HTML, so a kernel that echoed the raw doc
    (or mis-dropped a block) hash-mismatches."""
    h = _html
    return f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
                             x -> x <> '') AS toks
          FROM documents),
        c AS (
          SELECT doc_id, toks, len(toks) AS n_tok,
                 {h.HTML_PARA_BASE} + doc_id % {h.HTML_PARA_RANGE} AS plen,
                 (doc_id % {h.HTML_SIDE_SKIP_MOD} <> 0) AS has_side
          FROM t),
        e AS (
          SELECT doc_id, n_tok, plen, has_side,
                 'Document ' || doc_id
                 || CASE WHEN n_tok > 0
                         THEN ' ' || array_to_string(toks, ' ')
                         ELSE '' END AS extracted_text,
                 (n_tok + plen - 1) // plen AS n_para
          FROM c)
        SELECT doc_id, extracted_text,
               length(extracted_text)::BIGINT AS extracted_len,
               (3 + CASE WHEN has_side THEN 1 ELSE 0 END
                  + n_para)::BIGINT AS n_blocks,
               (1 + n_para)::BIGINT AS n_kept,
               2::BIGINT AS n_dropped_semantic,
               CASE WHEN has_side THEN 1 ELSE 0 END::BIGINT
                 AS n_dropped_density,
               ({h.HTML_NAV_BASE} + doc_id % {h.HTML_NAV_RANGE}
                + CASE WHEN has_side
                       THEN {h.HTML_SIDE_BASE} + doc_id % {h.HTML_SIDE_RANGE}
                       ELSE 0 END)::BIGINT AS n_links
        FROM e
    """


def oracle_sql() -> dict[str, str]:
    return {
        "html_extract_text": _html_extract_sql(),
        # Decoded-pixel features recomputed from the generation rule —
        # pixel byte j = (id*31 + j) % 256 in BOTH containers (BMP and
        # PNG share it), so channel sums and the 8-bin luminance
        # histogram are closed-form in doc_id. lum//32 with
        # lum=(r+g+b)//3 composes to (r+g+b)//96 for non-negative ints.
        "multimodal_pixel_features": """
            WITH p AS (
              SELECT doc_id, (doc_id % 16) + 1 AS w, (doc_id % 8) + 1 AS h
              FROM documents)
            SELECT doc_id, w::INT AS width, h::INT AS height,
                   """
        + ",\n                   ".join(
            f"list_sum(list_transform(range(0, w*h),"
            f" q -> (doc_id*31 + 3*q + {c}) % 256))::BIGINT AS sum_{n}"
            for c, n in enumerate("rgb")
        )
        + ",\n                   "
        + ",\n                   ".join(
            f"list_sum(list_transform(range(0, w*h), q ->"
            f" CASE WHEN (((doc_id*31 + 3*q) % 256)"
            f" + ((doc_id*31 + 3*q + 1) % 256)"
            f" + ((doc_id*31 + 3*q + 2) % 256)) // 96 = {k}"
            f" THEN 1 ELSE 0 END))::BIGINT AS lum{k}"
            for k in range(8)
        )
        + """
            FROM p
        """,
        # Nearest-neighbour resize digest recomputed byte-for-byte from
        # the generation rule + the integer index map src = x*in // out:
        # output byte i (row-major 48×64 RGB, 192 bytes/row) pulls
        # source pixel (y*h//48, x*w//64), channel i%3; Horner fold over
        # [out_w, out_h] ++ bytes, same as pixel_digest.
        "multimodal_resize_pixels": """
            WITH p AS (
              SELECT doc_id, (doc_id % 16) + 1 AS w, (doc_id % 8) + 1 AS h
              FROM documents)
            SELECT doc_id, w::INT AS width, h::INT AS height,
                   64::INT AS out_width, 48::INT AS out_height,
                   list_reduce(
                     list_prepend(0::BIGINT,
                       list_concat(
                         [64::BIGINT, 48::BIGINT],
                         list_transform(range(0, 9216), i ->
                           ((doc_id*31
                             + 3*(((i // 192) * h // 48) * w
                                  + ((i % 192) // 3) * w // 64)
                             + (i % 3)) % 256)::BIGINT))),
                     (acc, b) -> (acc * 131 + b) % 1000000007) AS digest
            FROM p
        """,
        # Tolerance-band check for the HLL estimator: the oracle owns
        # the exact side and asserts Spark's within-eps flag (|est -
        # exact| <= 4·rsd·exact) came out 1 — the estimate itself is
        # Spark-internal and deliberately not hashed.
        "approx_distinct": """
            SELECT event_type,
                   count(DISTINCT user_id)::BIGINT AS exact_users,
                   1::BIGINT AS within_eps
            FROM events GROUP BY 1
        """,
        # Tolerance-band checks for the plan-dependent quantile
        # sketches (KLL compactor cascade / merging t-digest): the
        # oracle owns the exact side (count + interpolated
        # percentiles) and asserts the Spark-side envelope flags —
        # estimate's true rank within eps of target, sketch weight
        # within tolerance — came out 1.
        "kll_quantiles": """
            WITH qs(q) AS (VALUES (0.5), (0.9), (0.99)),
            agg AS (SELECT count(*) AS n,
                           quantile_cont(value, 0.5) AS p0,
                           quantile_cont(value, 0.9) AS p1,
                           quantile_cont(value, 0.99) AS p2
                    FROM events)
            SELECT q, n::BIGINT AS n_exact,
                   round(CASE q WHEN 0.5 THEN p0
                                WHEN 0.9 THEN p1
                                ELSE p2 END, 4) AS exact_value,
                   1::BIGINT AS rank_ok,
                   1::BIGINT AS n_ok
            FROM qs, agg
        """,
        "tdigest_quantiles": """
            WITH qs(q) AS (VALUES (0.5), (0.9), (0.99)),
            agg AS (SELECT count(*) AS n,
                           quantile_cont(value, 0.5) AS p0,
                           quantile_cont(value, 0.9) AS p1,
                           quantile_cont(value, 0.99) AS p2
                    FROM events)
            SELECT q, n::BIGINT AS n_exact,
                   round(CASE q WHEN 0.5 THEN p0
                                WHEN 0.9 THEN p1
                                ELSE p2 END, 4) AS exact_value,
                   1::BIGINT AS rank_ok,
                   1::BIGINT AS n_ok
            FROM qs, agg
        """,
        # Tolerance-band check for the GK quantile sketch: exact
        # interpolated percentiles are the portable hashed side
        # (identical to median_order_value); the flags assert the
        # sketch value fell inside the exact [p-0.002, p+0.002] band.
        "approx_quantiles": """
            SELECT o_orderpriority,
                   round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
                   round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
                   1::BIGINT AS p50_within,
                   1::BIGINT AS p90_within
            FROM orders GROUP BY o_orderpriority
        """,
        # Brute-force ground truth for the PassJoin operator: the
        # length filter is implied by lev <= 8, so the oracle answer
        # is the true pair set — any chunk/window off-by-one on the
        # Spark side surfaces as a missing pair here.
        "dedup_edit_distance": """
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   levenshtein(a.text, b.text)::BIGINT AS edit_distance
            FROM documents a JOIN documents b
              ON a.doc_id < b.doc_id
             AND abs(a.n_chars - b.n_chars) <= 8
            WHERE levenshtein(a.text, b.text) <= 8
        """,
        # End-to-end keep-list: the conjunction of four stage chains
        # (clean, Gopher, LSH near-dup survivors, decontamination) —
        # each identical to its own key's oracle, renamed to avoid CTE
        # collisions with the shared _lsh_ctes names.
        "corpus_keep_list": f"""
            WITH RECURSIVE {_lsh_ctes()},
            kedges AS (
              SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM lsh_pairs),
            kreach(a, b) AS (
              SELECT src, src FROM kedges
              UNION
              SELECT r.a, e.dst FROM kreach r JOIN kedges e ON r.b = e.src),
            kcomp AS (SELECT a AS doc_id, min(b) AS cluster_id
                      FROM kreach GROUP BY a),
            ksurv AS (
              SELECT survivor_doc_id FROM (
                SELECT c.cluster_id, d.doc_id AS survivor_doc_id,
                       row_number() OVER (PARTITION BY c.cluster_id
                                          ORDER BY d.n_chars DESC, d.doc_id)
                         AS rn
                FROM kcomp c JOIN documents d ON d.doc_id = c.doc_id)
              WHERE rn = 1),
            klosers AS (
              SELECT doc_id FROM kcomp
              WHERE doc_id NOT IN (SELECT survivor_doc_id FROM ksurv)),
            ksd AS (
              SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY text
                                          ORDER BY doc_id) AS rn
                FROM documents) WHERE rn = 1),
            kw AS (SELECT doc_id,
                          unnest(string_split_regex(text, '\\s+')) AS word
                   FROM documents),
            kpw AS (SELECT doc_id, word, count(*) AS c
                    FROM kw WHERE word <> '' GROUP BY 1, 2),
            kstats AS (SELECT doc_id,
                              round(max(c) / sum(c), 6) AS rep_ratio,
                              sum(c)::BIGINT AS n_tokens
                       FROM kpw GROUP BY doc_id),
            kclean AS (
              SELECT s.doc_id, s.lang, st.n_tokens
              FROM ksd s JOIN kstats st ON st.doc_id = s.doc_id
              WHERE st.rep_ratio <= 0.12
                AND st.n_tokens BETWEEN 20 AND 10000),
            kt AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '') AS toks,
                     length(regexp_replace(text, '\\s+', '', 'g')) AS swl
              FROM documents),
            kgop AS (
              SELECT doc_id FROM (
                SELECT doc_id,
                       len(toks)::BIGINT AS n_words,
                       round(swl / len(toks), 6) AS mean_word_len,
                       round(len(list_filter(toks,
                           x -> contains(x, '#') OR contains(x, '...')))
                           / len(toks), 6) AS symbol_ratio,
                       round(len(list_filter(toks,
                           x -> regexp_matches(x, '[A-Za-z]')))
                           / len(toks), 6) AS alpha_word_ratio,
                       len(list_filter(toks, x -> x IN
                           ('the','be','to','of','and','that','have','with')
                           ))::BIGINT AS n_stopwords
                FROM kt)
              WHERE (n_words BETWEEN 50 AND 100000)
                AND (mean_word_len BETWEEN 3.0 AND 10.0)
                AND symbol_ratio <= 0.1
                AND alpha_word_ratio >= 0.8
                AND n_stopwords >= 2),
            ksh AS ({_SHINGLES}),
            kex AS (SELECT doc_id, unnest(s) AS g FROM ksh),
            kev AS (SELECT doc_id AS eval_doc_id, g FROM kex
                    WHERE doc_id % 97 = 0),
            kco AS (SELECT doc_id, g FROM kex WHERE doc_id % 97 <> 0),
            kbad AS (
              SELECT DISTINCT kco.doc_id
              FROM kco JOIN kev ON kco.g = kev.g
              GROUP BY kco.doc_id, kev.eval_doc_id
              HAVING count(*) >= 2)
            SELECT c.doc_id, c.lang, c.n_tokens
            FROM kclean c
            WHERE c.doc_id IN (SELECT doc_id FROM kgop)
              AND c.doc_id % 97 <> 0
              AND c.doc_id NOT IN (SELECT doc_id FROM kbad)
              AND c.doc_id NOT IN (SELECT doc_id FROM klosers)
        """,
        "dedup_edit_clusters": """
            WITH RECURSIVE lpairs AS MATERIALIZED (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM documents a JOIN documents b
                ON a.doc_id < b.doc_id
               AND abs(a.n_chars - b.n_chars) <= 8
              WHERE levenshtein(a.text, b.text) <= 8),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM lpairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM lpairs),
            reach(a, b) AS (
              SELECT src, src FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
            SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
        """,
        "dedup_edit_survivors": """
            WITH RECURSIVE lpairs AS MATERIALIZED (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM documents a JOIN documents b
                ON a.doc_id < b.doc_id
               AND abs(a.n_chars - b.n_chars) <= 8
              WHERE levenshtein(a.text, b.text) <= 8),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM lpairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM lpairs),
            reach(a, b) AS (
              SELECT src, src FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
            comp AS (SELECT a AS doc_id, min(b) AS cluster_id
                     FROM reach GROUP BY a)
            SELECT cluster_id, survivor_doc_id, n_members FROM (
              SELECT c.cluster_id, d.doc_id AS survivor_doc_id,
                     row_number() OVER (PARTITION BY c.cluster_id
                                        ORDER BY d.n_chars DESC, d.doc_id)
                       AS rn,
                     count(*) OVER (PARTITION BY c.cluster_id)::BIGINT
                       AS n_members
              FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
            WHERE rn = 1
        """,
        # The PCA's distributed reduced state is plain sums of float64
        # products — engine-portable up to summation order, absorbed by
        # round(.,4). Only the driver-side eigensolve stays rows-only.
        "embedding_gram": """
            WITH idx AS (SELECT i FROM range(0, 64) t(i)),
            ij AS (SELECT a.i AS i, b.i AS j
                   FROM idx a JOIN idx b ON a.i <= b.i)
            SELECT ij.i::BIGINT AS i, ij.j::BIGINT AS j,
                   round(sum(e.embedding[ij.i + 1]::DOUBLE
                             * e.embedding[ij.j + 1]::DOUBLE), 4) AS gram
            FROM ij CROSS JOIN embeddings e
            GROUP BY 1, 2
        """,
        "table_profile": _PROFILE_SQL,
        "k_core": _k_core_sql(),
        "pagerank": _pagerank_sql(),
        "sssp_weighted": _sssp_sql(),
        # Zero-MAD groups (≥50% identical values) flag every off-median
        # row with the finite ±RZ_INF sentinel — see features.anomaly_mad.
        "anomaly_mad": """
            WITH med AS (
              SELECT event_type,
                     round(quantile_cont(value, 0.5), 6) AS med_v
              FROM events GROUP BY 1),
            mad AS (
              SELECT e.event_type, med_v,
                     round(quantile_cont(abs(value - med_v), 0.5), 6)
                       AS mad_v
              FROM events e JOIN med USING (event_type)
              GROUP BY e.event_type, med_v),
            scored AS (
              SELECT event_id, event_type, value,
                     CASE WHEN mad_v > 0
                          THEN round((value - med_v) / (1.4826 * mad_v), 4)
                          ELSE sign(value - med_v)::DOUBLE
                               * 999999999.0::DOUBLE
                     END AS rz
              FROM events JOIN mad USING (event_type))
            SELECT event_id, event_type, value, rz
            FROM scored WHERE abs(rz) >= 3.0
        """,
        # Skyline ground truth: literal dominance NOT EXISTS — any
        # pruning bug on the Spark side surfaces as a row diff.
        "skyline_orders": """
            SELECT x.o_orderkey, x.o_totalprice, x.o_orderdate
            FROM orders x
            WHERE NOT EXISTS (
              SELECT 1 FROM orders y
              WHERE y.o_totalprice <= x.o_totalprice
                AND y.o_orderdate <= x.o_orderdate
                AND (y.o_totalprice < x.o_totalprice
                     OR y.o_orderdate < x.o_orderdate))
        """,
        # Temperature resampling: the quality chain is the
        # quality_score oracle; w/sum/p rounding (6dp/4dp/6dp) makes
        # the kept set a pure function of the data on both engines.
        "sample_quality_temperature": r"""
            WITH t AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks,
                     length(text) AS n_chars,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                       AS alpha_chars
              FROM documents),
            m AS (
              SELECT doc_id,
                     alpha_chars / n_chars AS alpha_ratio,
                     len(list_filter(toks,
                         x -> x IN ('the','a','of','and','to','in','is',
                                    'it'))) / len(toks) AS stop_ratio,
                     n_chars / len(toks) AS mean_tok_len,
                     CASE WHEN n_chars >= 100 AND n_chars <= 2000
                          THEN 1.0 ELSE 0.5 END AS len_band
              FROM t),
            q AS (
              SELECT doc_id,
                     round(0.3 * len_band + 0.3 * alpha_ratio
                           + 0.25 * least(stop_ratio * 4.0, 1.0)
                           + 0.15 * least(mean_tok_len / 8.0, 1.0), 6)
                       AS quality
              FROM m),
            w AS (SELECT doc_id, round(exp(quality / 0.5), 6) AS w FROM q),
            tot AS (SELECT round(sum(w), 4) AS sw,
                           count(*)::BIGINT AS n FROM w),
            p AS (SELECT doc_id,
                         round(least(1.0, 0.3 * n / sw * w), 6) AS keep_p
                  FROM w, tot)
            SELECT d.doc_id, d.lang, d.source, p.keep_p
            FROM documents d JOIN p USING (doc_id)
            WHERE ((d.doc_id * 2654435761) % 4294967296)
                  / 4294967296.0 < p.keep_p
        """,
        # Cascading continuous aggregates: each level re-aggregates
        # the UNROUNDED previous level (sums round only at emission),
        # mirroring the Spark cascade exactly.
        "hypertable_rollup": """
            WITH minute AS (
              SELECT date_trunc('minute', ts) AS bucket, event_type,
                     count(*) AS n, sum(value) AS v
              FROM events GROUP BY 1, 2),
            hour AS (
              SELECT date_trunc('hour', bucket) AS bucket, event_type,
                     sum(n) AS n, sum(v) AS v
              FROM minute GROUP BY 1, 2),
            day AS (
              SELECT date_trunc('day', bucket) AS bucket, event_type,
                     sum(n) AS n, sum(v) AS v
              FROM hour GROUP BY 1, 2)
            SELECT 'minute' AS resolution, bucket, event_type,
                   n::BIGINT AS n_events, round(v, 4) AS total_value
            FROM minute
            UNION ALL
            SELECT 'hour', bucket, event_type, n::BIGINT, round(v, 4)
            FROM hour
            UNION ALL
            SELECT 'day', bucket, event_type, n::BIGINT, round(v, 4)
            FROM day
        """,
        "kmeans_embeddings": _kmeans_sql(),
        "kcenter_greedy": _kcenter_sql(),
        "knn_graph_descent": _nnd_sql(),
        "ann_graph_topk": _gann_topk_sql(),
        "ann_graph_recall": _gann_recall_sql(),
        "ann_ivf_topk": _ivf_topk_sql(),
        "ann_ivf_recall": _ivf_recall_sql(),
        "minhash_bbit_jaccard": _bbit_sql(),
        "bootstrap_ci_poisson": _bootstrap_sql(),
        # KMV/theta sketch set ops: the whole chain is exact integer
        # arithmetic (md5-31 token hash, x131 shingle fold, bottom-k,
        # set sizes) until the estimator divisions — which divide the
        # SAME exact-integer literals on both engines. Estimator
        # products/differences are computed from the already-ROUNDED
        # columns so the engines combine identical doubles.
        "kmv_source_setops": r"""
            WITH th AS (
              SELECT source, list_transform(
                       list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> ''),
                       tok -> cast(concat('0x', substring(md5(tok), 1, 8))
                                   as bigint) & 2147483647) AS th
              FROM documents),
            hs AS (
              SELECT DISTINCT source,
                     unnest(list_distinct(list_transform(
                       generate_series(1, greatest(len(th) - 2, 1)),
                       q -> (((th[q] * 131 + coalesce(th[q+1], 0))
                              % 2147483647) * 131
                             + coalesce(th[q+2], 0)) % 2147483647))) AS h
              FROM th WHERE len(th) > 0),
            rk AS (
              SELECT source, h,
                     row_number() OVER (PARTITION BY source ORDER BY h) AS r
              FROM hs),
            sk AS (
              SELECT source, list_sort(list(h)) AS arr
              FROM rk WHERE r <= 256 GROUP BY source),
            p AS (
              SELECT a.source AS source_a, a.arr AS arr_a,
                     b.source AS source_b, b.arr AS arr_b,
                     list_sort(list_distinct(list_concat(a.arr, b.arr)))
                       AS merged
              FROM sk a, sk b WHERE a.source < b.source),
            e AS (
              SELECT source_a, source_b, arr_a, arr_b, merged,
                     merged[1:256] AS union_k,
                     least(256, len(merged))::INT AS k_used,
                     round(CASE WHEN len(arr_a) < 256
                                THEN len(arr_a)::DOUBLE
                                ELSE 547608329985.0 / arr_a[256]::DOUBLE
                           END, 4) AS est_a,
                     round(CASE WHEN len(arr_b) < 256
                                THEN len(arr_b)::DOUBLE
                                ELSE 547608329985.0 / arr_b[256]::DOUBLE
                           END, 4) AS est_b,
                     round(CASE WHEN len(merged) < 256
                                THEN len(merged)::DOUBLE
                                ELSE 547608329985.0 / merged[256]::DOUBLE
                           END, 4) AS union_est
              FROM p),
            j AS (
              SELECT *,
                     len(list_intersect(list_intersect(union_k, arr_a),
                                        arr_b))::DOUBLE
                       / k_used::DOUBLE AS j_raw,
                     CASE WHEN len(merged) < 256 THEN len(merged)::DOUBLE
                          ELSE 547608329985.0 / merged[256]::DOUBLE
                     END AS union_raw
              FROM e)
            SELECT source_a, source_b, k_used, est_a, est_b, union_est,
                   round(j_raw, 6) AS jaccard_est,
                   round(j_raw * union_raw, 4) AS inter_est,
                   round(greatest(union_est - est_b, 0.0), 4) AS diff_ab_est,
                   round(greatest(union_est - est_a, 0.0), 4) AS diff_ba_est
            FROM j
        """,
        # Pearson correlation is scale-invariant, so the co-moment
        # normalization cancels between engines; 6dp round absorbs
        # summation-order ulps (same contract as linreg/chi2 below).
        "corr_matrix": """
            WITH a AS (
              SELECT
        """
        + ",\n              ".join(
            f"round(corr(l_{x}, l_{y}), 6) AS c_{x}_{y}"
            for i, x in enumerate(("quantity", "extendedprice", "discount", "tax"))
            for y in ("quantity", "extendedprice", "discount", "tax")[i + 1 :]
        )
        + """,
              count(*)::BIGINT AS n
              FROM lineitem)
        """
        + "\n            UNION ALL\n".join(
            f"            SELECT 'l_{x}' AS x, 'l_{y}' AS y,"
            f" c_{x}_{y} AS corr, n FROM a"
            for i, x in enumerate(("quantity", "extendedprice", "discount", "tax"))
            for y in ("quantity", "extendedprice", "discount", "tax")[i + 1 :]
        ),
        "linreg_by_group": """
            SELECT l_returnflag, l_linestatus,
                   round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
                   round(regr_intercept(l_extendedprice, l_quantity), 6)
                     AS intercept,
                   round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
                   count(*)::BIGINT AS n
            FROM lineitem GROUP BY 1, 2
        """,
        # chi² total is summed from the ROUNDED 6dp contributions in
        # both engines (a few dozen addends — order noise < 1e-9,
        # collapsed by the final 4dp round); marginals come from the
        # aggregated cells, never a corpus re-scan.
        "chi2_lang_source": """
            WITH cells AS (
              SELECT lang, source, count(*)::BIGINT AS obs
              FROM documents GROUP BY 1, 2),
            tot AS (
              SELECT sum(obs) AS grand,
                     count(DISTINCT lang) AS n_lang,
                     count(DISTINCT source) AS n_src
              FROM cells),
            rt AS (SELECT lang, sum(obs) AS row_total FROM cells GROUP BY 1),
            ct AS (SELECT source, sum(obs) AS col_total FROM cells GROUP BY 1),
            e AS (
              SELECT c.lang, c.source, c.obs,
                     round(rt.row_total * ct.col_total / tot.grand, 6)
                       AS expected,
                     round(pow(c.obs - rt.row_total * ct.col_total / tot.grand,
                               2)
                           / (rt.row_total * ct.col_total / tot.grand), 6)
                       AS contribution,
                     ((tot.n_lang - 1) * (tot.n_src - 1))::BIGINT AS dof
              FROM cells c
              JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN tot)
            SELECT lang, source, obs, expected, contribution,
                   round(sum(contribution) OVER (), 4) AS chi2, dof
            FROM e
        """,
        "sample_weighted_k": """
            WITH t AS (
              SELECT doc_id, lang,
                     round(least(1.0, n_chars / 400.0), 6) AS weight,
                     round(ln(((doc_id * 2654435761) % 4294967296 + 1.0)
                              / 4294967296.0)
                           / least(1.0, n_chars / 400.0), 9) AS key
              FROM documents)
            SELECT doc_id, lang, weight, rk FROM (
              SELECT doc_id, lang, weight,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY key DESC, doc_id)::BIGINT AS rk
              FROM t)
            WHERE rk <= 16
        """,
        "logreg_train_quality": _logreg_train_sql(),
        "logreg_score_quality": _logreg_score_sql(),
        "ann_sq_topk": _sq_topk_sql(),
        "ann_sq_recall": _sq_recall_sql(),
        "ann_ivfsq_topk": _ivfsq_topk_sql(),
        "ann_ivfsq_recall": _ivfsq_recall_sql(),
        "ann_pq_topk": _pq_topk_sql(),
        "ann_pq_rerank_topk": _pq_rerank_sql(),
        "ann_pq_recall": _pq_recall_sql(),
        "ann_ivfpq_topk": _ivfpq_topk_sql(),
        "ann_ivfpq_rerank_topk": _ivfpq_rerank_sql(),
        "ann_ivfpq_recall": _ivfpq_recall_sql(),
        "label_propagation": _label_propagation_sql(),
        # Portable-sketch family (see _lsh_ctes/_simhash_ctes): the
        # candidate SETS themselves are replicated, not just the
        # verified scores — these moved off the rows-only gate when
        # the token hash went md5-portable.
        "dedup_minhash_lsh": f"""
            WITH {_lsh_ctes()}
            SELECT doc_a, doc_b, jaccard FROM lsh_pairs
        """,
        # The persisted-index probe finds exactly the lsh_pairs that
        # touch a probe doc (doc_id % PROBE_MOD == 0) — the sharded
        # on-disk layout changes WHAT IS READ, never the pair set.
        "dedup_lsh_query_indexed": f"""
            WITH {_lsh_ctes()}
            SELECT doc_a, doc_b, jaccard FROM lsh_pairs
            WHERE doc_a % {lsh_index.PROBE_MOD} = 0
               OR doc_b % {lsh_index.PROBE_MOD} = 0
        """,
        "dedup_clusters_lsh": f"""
            WITH RECURSIVE {_lsh_ctes()},
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM lsh_pairs),
            reach(a, b) AS (
              SELECT src, src FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
            SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
        """,
        # Per-source survivor caps: keep-list = docs minus LSH-cluster
        # losers (the corpus_keep_list loser shape), then at most 10
        # kept docs per source ranked by n_chars DESC with the portable
        # multiplicative-hash tie-break (sample_reservoir's constants).
        "dedup_survivors_capped": f"""
            WITH RECURSIVE {_lsh_ctes()},
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM lsh_pairs),
            reach(a, b) AS (
              SELECT src, src FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
            comp AS (SELECT a AS doc_id, min(b) AS cluster_id
                     FROM reach GROUP BY a),
            surv AS (
              SELECT survivor_doc_id FROM (
                SELECT c.cluster_id, d.doc_id AS survivor_doc_id,
                       row_number() OVER (PARTITION BY c.cluster_id
                         ORDER BY d.n_chars DESC, d.doc_id) AS rn
                FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
              WHERE rn = 1),
            losers AS (
              SELECT doc_id FROM comp
              WHERE doc_id NOT IN (SELECT survivor_doc_id FROM surv)),
            kept AS (
              SELECT d.doc_id, d.source, d.n_chars FROM documents d
              WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)),
            ranked AS (
              SELECT doc_id, source,
                     row_number() OVER (PARTITION BY source
                       ORDER BY n_chars DESC,
                                (doc_id * 2654435761) % 4294967296,
                                doc_id) AS rk,
                     count(*) OVER (PARTITION BY source) AS n_src
              FROM kept)
            SELECT doc_id, source, rk::BIGINT AS rk,
                   n_src::BIGINT AS n_source_survivors
            FROM ranked WHERE rk <= 10
        """,
        "dedup_survivors_lsh": f"""
            WITH RECURSIVE {_lsh_ctes()},
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM lsh_pairs),
            reach(a, b) AS (
              SELECT src, src FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
            comp AS (SELECT a AS doc_id, min(b) AS cluster_id
                     FROM reach GROUP BY a)
            SELECT cluster_id, survivor_doc_id, n_members FROM (
              SELECT c.cluster_id, d.doc_id AS survivor_doc_id,
                     row_number() OVER (PARTITION BY c.cluster_id
                                        ORDER BY d.n_chars DESC, d.doc_id) AS rn,
                     count(*) OVER (PARTITION BY c.cluster_id) AS n_members
              FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
            WHERE rn = 1
        """,
        "minhash_containment": f"""
            WITH {_lsh_ctes()},
            agr AS (
              SELECT c.doc_a, c.doc_b,
                     list_sum([{", ".join(
                         f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END"
                         for i in range(dedup.N_HASHES))}]) AS agree,
                     len(ha.s) AS na, len(hb.s) AS nb
              FROM lcand c
              JOIN sig sa ON sa.doc_id = c.doc_a
              JOIN sig sb ON sb.doc_id = c.doc_b
              JOIN hsh ha ON ha.doc_id = c.doc_a
              JOIN hsh hb ON hb.doc_id = c.doc_b)
            SELECT doc_a, doc_b, containment_est FROM (
              SELECT doc_a, doc_b,
                     round(least(
                       (agree / {float(dedup.N_HASHES)}) * (na + nb)
                         / (1.0 + agree / {float(dedup.N_HASHES)})
                         / least(na, nb),
                       1.0), 6) AS containment_est
              FROM agr)
            WHERE containment_est >= 0.7
        """,
        "minhash_dedup_recall": f"""
            WITH {_lsh_ctes()},
            esh AS ({_SHINGLES}),
            esizes AS (SELECT doc_id, len(s) AS n FROM esh),
            eex AS (SELECT doc_id, unnest(s) AS g FROM esh),
            einter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS n_common
              FROM eex a JOIN eex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            exact AS MATERIALIZED (
              SELECT doc_a, doc_b FROM einter
              JOIN esizes sa ON sa.doc_id = doc_a
              JOIN esizes sb ON sb.doc_id = doc_b
              WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5),
            stats AS (
              SELECT (SELECT count(*) FROM exact) AS n_exact,
                     (SELECT count(*) FROM lsh_pairs) AS n_lsh,
                     (SELECT count(*) FROM exact e
                      JOIN lsh_pairs l ON e.doc_a = l.doc_a
                                      AND e.doc_b = l.doc_b) AS n_hit)
            SELECT n_exact::BIGINT AS n_exact_pairs,
                   n_lsh::BIGINT AS n_lsh_pairs,
                   n_hit::BIGINT AS n_hit,
                   CASE WHEN n_lsh > 0 THEN round(n_hit / n_lsh, 6)
                        ELSE 1.0 END AS "precision",
                   CASE WHEN n_exact > 0 THEN round(n_hit / n_exact, 6)
                        ELSE 1.0 END AS "recall"
            FROM stats
        """,
        "dedup_simhash": f"""
            WITH {_simhash_ctes()}
            SELECT doc_a, doc_b, hamming FROM sh_pairs
        """,
        "dedup_containment_lsh": f"""
            WITH {_containment_lsh_ctes()}
            SELECT doc_a, doc_b, containment FROM cont_pairs
        """,
        "containment_lsh_recall": f"""
            WITH {_containment_lsh_ctes()},
            esh AS ({_SHINGLES}),
            esizes AS (SELECT doc_id, len(s) AS n FROM esh),
            eex AS (SELECT doc_id, unnest(s) AS g FROM esh),
            einter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS n_common
              FROM eex a JOIN eex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            exact AS MATERIALIZED (
              SELECT doc_a, doc_b FROM einter
              JOIN esizes sa ON sa.doc_id = doc_a
              JOIN esizes sb ON sb.doc_id = doc_b
              WHERE round(n_common / least(sa.n, sb.n), 6) >= 0.8),
            stats AS (
              SELECT (SELECT count(*) FROM exact) AS n_exact,
                     (SELECT count(*) FROM cont_pairs) AS n_lsh,
                     (SELECT count(*) FROM exact e
                      JOIN cont_pairs l ON e.doc_a = l.doc_a
                                       AND e.doc_b = l.doc_b) AS n_hit)
            SELECT n_exact::BIGINT AS n_exact_pairs,
                   n_lsh::BIGINT AS n_lsh_pairs,
                   n_hit::BIGINT AS n_hit,
                   CASE WHEN n_lsh > 0 THEN round(n_hit / n_lsh, 6)
                        ELSE 1.0 END AS "precision",
                   CASE WHEN n_exact > 0 THEN round(n_hit / n_exact, 6)
                        ELSE 1.0 END AS "recall"
            FROM stats
        """,
        "ann_lsh_topk": f"""
            WITH {_ann_lsh_ctes()}
            SELECT query_id, neighbor_id, cos, rank FROM lshtop
        """,
        # BM25 pool minus the positive's near-dup partners: composes
        # the (portable) LSH pair chain with the BM25 chain.
        "retrieval_hard_negatives": f"""
            WITH {_lsh_ctes()},
            tok AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(text, '\\s+'),
                            x -> x <> '')) AS w
              FROM documents
            ), dl AS (
              SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1
            ), stats AS (
              SELECT count(*)::BIGINT AS n_docs, round(avg(dl), 6) AS avgdl
              FROM dl
            ), tf AS (
              SELECT doc_id, w, count(*)::BIGINT AS tf
              FROM tok WHERE w IN ('spark', 'join', 'window') GROUP BY 1, 2
            ), dft AS (
              SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY 1
            ), scored AS (
              SELECT tf.doc_id,
                     round(SUM(
                       LN((n_docs - df + 0.5) / (df + 0.5) + 1)
                       * tf * (1.2 + 1)
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                     ), 6) AS score
              FROM tf JOIN dft USING (w)
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats
              GROUP BY tf.doc_id
            ), bmtop AS (
              SELECT doc_id, score,
                     row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT
                       AS rank
              FROM (SELECT * FROM scored ORDER BY score DESC, doc_id
                    LIMIT 20)
            ), anch AS (SELECT doc_id AS anchor_id FROM bmtop WHERE rank = 1),
            partners AS (
              SELECT CASE WHEN doc_a = anchor_id THEN doc_b
                          ELSE doc_a END AS doc_id
              FROM lsh_pairs, anch
              WHERE doc_a = anchor_id OR doc_b = anchor_id),
            negs AS (
              SELECT t.doc_id, t.score FROM bmtop t, anch
              WHERE t.doc_id <> anchor_id
                AND t.doc_id NOT IN (SELECT doc_id FROM partners))
            SELECT doc_id, score, neg_rank FROM (
              SELECT doc_id, score,
                     row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT
                       AS neg_rank
              FROM negs)
            WHERE neg_rank <= 10
        """,
        # Decimation digest recomputed from the generation rule:
        # payload = utf-8 text bytes (ASCII corpus, so character
        # positions = byte offsets), step = max(n // 3072, 1), keep
        # indices 0, step, 2·step… capped at 3072, Horner fold.
        "multimodal_resize_digest": """
            WITH p AS (
              SELECT doc_id, text,
                     octet_length(encode(text))::INT AS n,
                     greatest(octet_length(encode(text)) // 3072, 1) AS step
              FROM documents)
            SELECT doc_id, n AS n_bytes, 64 AS out_width, 48 AS out_height,
                   least((n + step - 1) // step, 3072)::INT AS resized_bytes,
                   list_reduce(
                     list_prepend(0::BIGINT, list_transform(
                       range(0, least((n + step - 1) // step, 3072)),
                       i -> ascii(substring(text, (i * step)::INT + 1, 1))::BIGINT)),
                     (acc, x) -> (acc * 131 + x) % 1000000007) AS digest
            FROM p
        """,
        # The oracle recomputes the decoded fields from the BMP
        # GENERATION rule (pixel j = (id*31+j) % 256), so a decoder
        # that misparses stride/offset/padding hash-mismatches.
        "dedup_survivors_icws": f"""
            WITH RECURSIVE {_icws_ctes()},
            wedges AS (
              SELECT doc_a AS src, doc_b AS dst FROM icws_pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM icws_pairs),
            wreach(a, b) AS (
              SELECT src, src FROM wedges
              UNION
              SELECT r.a, e.dst FROM wreach r JOIN wedges e ON r.b = e.src),
            wcomp AS (SELECT a AS doc_id, min(b) AS cluster_id
                      FROM wreach GROUP BY a)
            SELECT cluster_id, survivor_doc_id, n_members FROM (
              SELECT c.cluster_id, d.doc_id AS survivor_doc_id,
                     row_number() OVER (PARTITION BY c.cluster_id
                                        ORDER BY d.n_chars DESC, d.doc_id)
                       AS rn,
                     count(*) OVER (PARTITION BY c.cluster_id)::BIGINT
                       AS n_members
              FROM wcomp c JOIN documents d ON d.doc_id = c.doc_id)
            WHERE rn = 1
        """,
        "dedup_icws": f"""
            WITH {_icws_ctes()}
            SELECT doc_a, doc_b, wjaccard FROM icws_pairs
        """,
        "dedup_weighted_containment_lsh": f"""
            WITH {_icws_containment_ctes()}
            SELECT doc_a, doc_b, wcontainment FROM wcont_pairs
        """,
        "weighted_containment_lsh_recall": f"""
            WITH {_icws_containment_ctes()},
            einter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     sum(least(a.c, b.c)) AS wmin
              FROM wsets a JOIN wsets b
                ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            wexact AS MATERIALIZED (
              SELECT doc_a, doc_b FROM einter
              JOIN itot ta ON ta.doc_id = doc_a
              JOIN itot tb ON tb.doc_id = doc_b
              WHERE round(wmin / least(ta.n, tb.n), 6) >= 0.8),
            stats AS (
              SELECT (SELECT count(*) FROM wexact) AS n_exact,
                     (SELECT count(*) FROM wcont_pairs) AS n_lsh,
                     (SELECT count(*) FROM wexact e
                      JOIN wcont_pairs l ON e.doc_a = l.doc_a
                                        AND e.doc_b = l.doc_b) AS n_hit)
            SELECT n_exact::BIGINT AS n_exact_pairs,
                   n_lsh::BIGINT AS n_lsh_pairs,
                   n_hit::BIGINT AS n_hit,
                   CASE WHEN n_lsh > 0 THEN round(n_hit / n_lsh, 6)
                        ELSE 1.0 END AS "precision",
                   CASE WHEN n_exact > 0 THEN round(n_hit / n_exact, 6)
                        ELSE 1.0 END AS "recall"
            FROM stats
        """,
        "icws_recall": f"""
            WITH {_icws_ctes()},
            einter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     sum(least(a.c, b.c)) AS wmin
              FROM wsets a JOIN wsets b
                ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            wexact AS MATERIALIZED (
              SELECT doc_a, doc_b FROM einter
              JOIN itot ta ON ta.doc_id = doc_a
              JOIN itot tb ON tb.doc_id = doc_b
              WHERE round(wmin / (ta.n + tb.n - wmin), 6) >= 0.5),
            stats AS (
              SELECT (SELECT count(*) FROM wexact) AS n_exact,
                     (SELECT count(*) FROM icws_pairs) AS n_lsh,
                     (SELECT count(*) FROM wexact e
                      JOIN icws_pairs l ON e.doc_a = l.doc_a
                                       AND e.doc_b = l.doc_b) AS n_hit)
            SELECT n_exact::BIGINT AS n_exact_pairs,
                   n_lsh::BIGINT AS n_lsh_pairs,
                   n_hit::BIGINT AS n_hit,
                   CASE WHEN n_lsh > 0 THEN round(n_hit / n_lsh, 6)
                        ELSE 1.0 END AS "precision",
                   CASE WHEN n_exact > 0 THEN round(n_hit / n_exact, 6)
                        ELSE 1.0 END AS "recall"
            FROM stats
        """,
        "shuffle_skew_report": """
            WITH counts AS (
              SELECT l_suppkey AS k, count(*)::BIGINT AS cnt
              FROM lineitem GROUP BY 1),
            ranked AS (
              SELECT cnt, row_number() OVER (ORDER BY cnt, k)::BIGINT AS i
              FROM counts),
            t AS (SELECT count(*)::BIGINT AS n_keys,
                         sum(cnt)::BIGINT AS total_rows FROM counts)
            SELECT n_keys, total_rows, max_cnt, p50_cnt, p90_cnt, p99_cnt,
                   round(max_cnt / p50_cnt, 6) AS skew_ratio,
                   round((2.0 * wsum) / (n_keys * total_rows)
                         - (n_keys + 1) / n_keys, 6) AS gini
            FROM (SELECT max(n_keys)::BIGINT AS n_keys,
                         max(total_rows)::BIGINT AS total_rows,
                         max(cnt) AS max_cnt,
                         max(CASE WHEN i = ceil(n_keys * 0.5)
                             THEN cnt END) AS p50_cnt,
                         max(CASE WHEN i = ceil(n_keys * 0.9)
                             THEN cnt END) AS p90_cnt,
                         max(CASE WHEN i = ceil(n_keys * 0.99)
                             THEN cnt END) AS p99_cnt,
                         sum(i * cnt)::BIGINT AS wsum
                  FROM ranked CROSS JOIN t)
        """,
        "bpe_train": _bpe_train_sql(),
        "wordpiece_train": _wordpiece_sql(),
        "unigram_lm_train": _unigram_sql(),
        "bpe_encode": _bpe_encode_sql(),
        # Constraint-validation gate; every rule is one aggregate or
        # anti-join, trivially expressed in ANSI SQL.
        "constraint_report": """
            SELECT 'lineitem.quantity in [1,50]' AS constraint,
                   count(*)::BIGINT AS n_checked,
                   sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                       THEN 1 ELSE 0 END)::BIGINT AS n_violations
            FROM lineitem
            UNION ALL
            SELECT 'lineitem.discount in [0,1]', count(*)::BIGINT,
                   sum(CASE WHEN l_discount < 0 OR l_discount > 1
                       THEN 1 ELSE 0 END)::BIGINT
            FROM lineitem
            UNION ALL
            SELECT 'orders.totalprice > 0', count(*)::BIGINT,
                   sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)::BIGINT
            FROM orders
            UNION ALL
            SELECT 'documents.text not null', count(*)::BIGINT,
                   sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT
            FROM documents
            UNION ALL
            SELECT 'customer.custkey unique', sum(n)::BIGINT,
                   sum(CASE WHEN n > 1 THEN n ELSE 0 END)::BIGINT
            FROM (SELECT count(*) AS n FROM customer GROUP BY c_custkey)
            UNION ALL
            SELECT 'orders.custkey references customer',
                   (SELECT count(*) FROM orders)::BIGINT,
                   count(*) FILTER (c.c_custkey IS NULL)::BIGINT
            FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        # Real multi-frame GIF decode + frame sampling: the oracle
        # recomputes the sampled-frame RGB sum from the generation
        # rule and the fixed palette arithmetic — the Spark side
        # reaches the same bytes through a full LZW decode.
        # MJPEG-in-AVI frame sampling: the oracle recomputes the
        # sampled-frame pixel sum from the DC-only generation rule —
        # a RIFF walk, chunk-alignment, avih cross-check, or JPEG
        # decode bug hash-mismatches immediately.
        "multimodal_frame_sample_mjpeg": """
            SELECT doc_id,
                   (8 * ((doc_id % 4) + 1))::INT AS width,
                   (8 * ((doc_id % 2) + 1))::INT AS height,
                   ((doc_id % 5) + 2)::BIGINT AS n_frames,
                   (((doc_id % 5) + 2 + 1) // 2)::BIGINT AS n_sampled,
                   list_sum(list_transform(range(0, (doc_id % 5) + 2),
                     f -> CASE WHEN f % 2 = 0 THEN
                       3 * 64 * list_sum(list_transform(
                         range(0, ((doc_id % 4) + 1) * ((doc_id % 2) + 1)),
                         b -> (doc_id * 31 + 17 * f + 7 * b) % 256))
                     ELSE 0 END))::BIGINT AS sum_sampled
            FROM documents
        """,
        "multimodal_frame_sample_gif": """
            SELECT doc_id,
                   ((doc_id % 8) + 2)::INT AS width,
                   ((doc_id % 4) + 2)::INT AS height,
                   ((doc_id % 6) + 2)::BIGINT AS n_frames,
                   (((doc_id % 6) + 2 + 1) // 2)::BIGINT AS n_sampled,
                   list_sum(list_transform(range(0, (doc_id % 6) + 2),
                     f -> CASE WHEN f % 2 = 0 THEN
                       list_sum(list_transform(
                         range(0, ((doc_id % 8) + 2) * ((doc_id % 4) + 2)),
                         j -> (((doc_id * 31 + f * 17 + j) % 256) * 7) % 256
                            + (((doc_id * 31 + f * 17 + j) % 256) * 11) % 256
                            + (((doc_id * 31 + f * 17 + j) % 256) * 13) % 256))
                     ELSE 0 END))::BIGINT AS sum_sampled
            FROM documents
        """,
        # Cross-format image content dedup: the oracle recomputes each
        # doc's normalized-pixel digest (Horner fold over [w, h] ++
        # pixel bytes) straight from the generation rule — the Spark
        # side reaches the same bytes through a REAL BMP or PNG parse
        # depending on doc_id parity, so format-specific decode bugs
        # split a cross-format group and hash-mismatch.
        # Perceptual near-dup image pairs: the oracle recomputes each
        # doc's 63-bit dHash from the generation rule — the 9x8
        # nearest-neighbor grid samples base pixel (gx*w0//9, gy*h0//8)
        # for EVERY variant (2x NN upscale preserves the sampled
        # coordinates exactly: floor(floor(2a)/2) == floor(a)) — plus
        # the exact pixel digest per variant (upscaled/brightness-
        # shifted pixel lists built closed-form). The Spark side
        # reaches the same bits through REAL BMP/PNG parses, so a
        # decode, grayscale, sampling, or bit-packing bug
        # hash-mismatches. 500-doc oracle affords the all-pairs
        # hamming join; the Spark side uses the pigeonhole bucket join
        # (complete for hamming <= 3 by construction).
        "multimodal_dedup_images_near": f"""
            WITH {_neardup_ctes()}
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   bit_count(xor(a.fp, b.fp))::BIGINT AS hamming,
                   (da.digest = db.digest)::BIGINT AS same_content
            FROM fps a JOIN fps b ON a.doc_id < b.doc_id
            JOIN digs da ON da.doc_id = a.doc_id
            JOIN digs db ON db.doc_id = b.doc_id
            WHERE bit_count(xor(a.fp, b.fp)) <= 3
        """,
        # Near-dup image clusters + survivors: connected components of
        # the hamming<=3 pair graph (recursive CTE, same shape as the
        # dedup_survivors oracles), keeping the HIGHEST-RESOLUTION copy
        # per cluster (n_pixels closed-form from the generation rule:
        # upscaled variants have 4x the base pixels).
        "multimodal_near_dup_survivors": f"""
            WITH RECURSIVE {_neardup_ctes()},
            nd_pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM fps a JOIN fps b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.fp, b.fp)) <= 3),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM nd_pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM nd_pairs),
            reach(a, b) AS (
              SELECT src, src FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
            comp AS (SELECT a AS doc_id, min(b) AS cluster_id
                     FROM reach GROUP BY a),
            npx AS (
              SELECT doc_id,
                     ((CASE WHEN v >= 2 THEN 4 ELSE 1 END)
                      * w0 * h0)::BIGINT AS npix
              FROM ndx)
            SELECT cluster_id, survivor_doc_id, n_members,
                   survivor_pixels FROM (
              SELECT c.cluster_id, n.doc_id AS survivor_doc_id,
                     row_number() OVER (PARTITION BY c.cluster_id
                       ORDER BY n.npix DESC, n.doc_id) AS rn,
                     count(*) OVER (PARTITION BY c.cluster_id)::BIGINT
                       AS n_members,
                     n.npix AS survivor_pixels
              FROM comp c JOIN npx n ON n.doc_id = c.doc_id)
            WHERE rn = 1
        """,
        "multimodal_dedup_images": """
            WITH dig AS (
              SELECT doc_id,
                     CASE WHEN (doc_id // 256) % 2 = 0
                          THEN 'bmp' ELSE 'png' END AS fmt,
                     list_reduce(
                       [0::BIGINT, ((doc_id % 16) + 1)::BIGINT,
                        ((doc_id % 8) + 1)::BIGINT]
                       || list_transform(
                            range(0, ((doc_id % 16) + 1)
                                     * ((doc_id % 8) + 1) * 3),
                            j -> (doc_id * 31 + j) % 256),
                       (acc, b) -> (acc * 131 + b) % 1000000007
                     ) AS digest
              FROM documents)
            SELECT digest,
                   count(*)::BIGINT AS n_copies,
                   count(DISTINCT fmt)::BIGINT AS n_formats,
                   min(doc_id) AS survivor_id
            FROM dig GROUP BY digest HAVING count(*) > 1
        """,
        # Frame-level audio features from the generation rule: 16-sample
        # frame energies, loudest frame, fixed loudness threshold.
        "multimodal_audio_features": """
            WITH base AS (
              SELECT doc_id, ((doc_id % 64) + 16)::BIGINT AS n,
                     list_transform(range(0, (doc_id % 64) + 16),
                       j -> (((doc_id * 37 + j * j) % 4096) - 2048)
                            * (((doc_id * 37 + j * j) % 4096) - 2048)) AS sq
              FROM documents),
            framed AS (
              SELECT doc_id, n,
                     list_sum(sq)::BIGINT AS total_energy,
                     list_transform(range(0, ((n + 15) // 16)::int),
                       f -> list_sum(sq[(16 * f + 1):least(16 * f + 16, n)])
                     ) AS fe
              FROM base)
            SELECT doc_id, n AS n_samples,
                   ((n + 15) // 16)::BIGINT AS n_frames,
                   total_energy,
                   list_max(fe)::BIGINT AS max_frame_energy,
                   list_sum(list_transform(fe,
                     e -> CASE WHEN e >= 16777216 THEN 1 ELSE 0 END))::BIGINT
                     AS n_loud_frames
            FROM framed
        """,
        # Real audio decode: RIFF/WAVE chunk walk + PCM16 parse; the
        # oracle recomputes the exact integer energy / zero-crossing
        # stats from the generation rule.
        "multimodal_decode_wav": """
            SELECT doc_id,
                   8000::INT AS sample_rate,
                   1::INT AS n_channels,
                   16::INT AS bits,
                   ((doc_id % 64) + 16)::BIGINT AS n_samples,
                   list_sum(list_transform(
                     range(0, (doc_id % 64) + 16),
                     j -> (((doc_id * 37 + j * j) % 4096) - 2048)
                          * (((doc_id * 37 + j * j) % 4096) - 2048)
                   ))::BIGINT AS energy,
                   list_sum(list_transform(
                     range(1, (doc_id % 64) + 16),
                     j -> CASE WHEN
                            (((doc_id * 37 + j * j) % 4096) - 2048)
                            * (((doc_id * 37 + (j-1) * (j-1)) % 4096) - 2048)
                            < 0 THEN 1 ELSE 0 END
                   ))::BIGINT AS zero_crossings
            FROM documents
        """,
        # Baseline-JPEG decode: block-constant grayscale with an
        # all-ones quant table is DC-only, so the lossy format decodes
        # EXACTLY (any conforming IDCT; javax.imageio agrees
        # pixel-for-pixel, pytest-pinned) and the oracle recomputes the
        # stats from the generation rule — a Huffman / DC-prediction /
        # dequant / block-placement bug on the Spark side
        # hash-mismatches here.
        "multimodal_decode_jpeg": """
            SELECT doc_id,
                   (8 * ((doc_id % 4) + 1))::INT AS width,
                   (8 * ((doc_id % 2) + 1))::INT AS height,
                   24::INT AS bpp,
                   (64 * ((doc_id % 4) + 1) * ((doc_id % 2) + 1))::BIGINT
                     AS n_pixels,
                   (3 * 64 * list_sum(list_transform(
                     range(0, ((doc_id % 4) + 1) * ((doc_id % 2) + 1)),
                     b -> (doc_id * 31 + 7 * b) % 256)))::BIGINT
                     AS sum_pixels
            FROM documents
        """,
        # Same generation rule as the BMP twin — but the Spark side
        # reaches these fields through a full PNG decode (CRC walk,
        # zlib inflate, five-filter unfiltering), so a mis-unfilter of
        # any row hash-mismatches here.
        "multimodal_decode_png": """
            SELECT doc_id,
                   ((doc_id % 16) + 1)::INT AS width,
                   ((doc_id % 8) + 1)::INT AS height,
                   24::INT AS bpp,
                   (((doc_id % 16) + 1) * ((doc_id % 8) + 1))::BIGINT
                     AS n_pixels,
                   list_sum(list_transform(
                     range(0, ((doc_id % 16) + 1) * ((doc_id % 8) + 1) * 3),
                     j -> (doc_id * 31 + j) % 256))::BIGINT AS sum_pixels
            FROM documents
        """,
        "multimodal_decode_bmp": """
            SELECT doc_id,
                   ((doc_id % 16) + 1)::INT AS width,
                   ((doc_id % 8) + 1)::INT AS height,
                   24::INT AS bpp,
                   (((doc_id % 16) + 1) * ((doc_id % 8) + 1))::BIGINT
                     AS n_pixels,
                   list_sum(list_transform(
                     range(0, ((doc_id % 16) + 1) * ((doc_id % 8) + 1) * 3),
                     j -> (doc_id * 31 + j) % 256))::BIGINT AS sum_pixels
            FROM documents
        """,
        "corpus_snapshot_diff": """
            WITH newsnap AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0
                          THEN concat(text, ' rev2') ELSE text END AS text,
                     CASE WHEN doc_id % 7 = 0
                          THEN n_chars + 5 ELSE n_chars END AS n_chars
              FROM documents WHERE doc_id % 10 <> 3
              UNION ALL
              SELECT doc_id + 10000000, text, n_chars
              FROM documents WHERE doc_id % 13 = 0)
            SELECT CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        WHEN a.text = b.text THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   count(*)::BIGINT AS n_docs,
                   sum(coalesce(b.n_chars, a.n_chars))::BIGINT AS n_chars
            FROM documents a FULL OUTER JOIN newsnap b USING (doc_id)
            GROUP BY 1
        """,
        "k_anonymity_report": """
            WITH classes AS (
              SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS cs
              FROM customer GROUP BY 1, 2)
            SELECT count(*)::BIGINT AS n_classes,
                   sum((cs < 5)::BIGINT)::BIGINT AS n_small_classes,
                   sum(CASE WHEN cs < 5 THEN cs ELSE 0 END)::BIGINT
                     AS n_risky_rows,
                   min(cs) AS min_class_size,
                   max(cs) AS max_class_size
            FROM classes
        """,
        # EMA: a strictly sequential fold on both engines
        # (F.aggregate seeded by the first element == list_reduce);
        # alpha = 1/8 is exact in binary, so the folds are bit-equal.
        # Benford: first digit via exact integer arithmetic (never
        # log10 of the value); chi2 summed from rounded contributions.
        "benford_digit_test": """
            WITH cents AS (
              SELECT round(o_totalprice * 100, 0)::BIGINT AS c FROM orders),
            digits AS (
              SELECT floor(c / pow(10.0, length(c::VARCHAR) - 1))::INT
                       AS digit
              FROM cents),
            obs AS (
              SELECT digit, count(*)::BIGINT AS obs FROM digits GROUP BY 1),
            spine AS (SELECT unnest(generate_series(1, 9))::INT AS digit),
            cells AS (
              SELECT s.digit, coalesce(o.obs, 0)::BIGINT AS obs
              FROM spine s LEFT JOIN obs o USING (digit)),
            tot AS (SELECT sum(obs) AS total FROM cells),
            scored AS (
              SELECT c.digit, c.obs, t.total::BIGINT AS total,
                     round(c.obs / t.total, 6) AS p_obs,
                     round(log10(1.0 + 1.0 / c.digit::DOUBLE), 6)
                       AS p_benford,
                     round(pow(c.obs - t.total
                                 * log10(1.0 + 1.0 / c.digit::DOUBLE), 2)
                           / (t.total
                              * log10(1.0 + 1.0 / c.digit::DOUBLE)), 6)
                       AS contribution
              FROM cells c CROSS JOIN tot t)
            SELECT digit, obs, total, p_obs, p_benford, contribution,
                   round(sum(contribution) OVER (), 4) AS chi2,
                   8::BIGINT AS dof
            FROM scored
        """,
        # Laplace mechanism with counter-based md5-31 noise — the
        # identical inverse-CDF expression on both engines.
        "dp_count_laplace": """
            WITH cells AS (
              SELECT lang, source, count(*)::BIGINT AS n
              FROM documents GROUP BY 1, 2),
            d AS (
              SELECT lang, source, n,
                     ((cast(concat('0x', substring(
                          md5(lang || ':' || source || ':dp'), 1, 8))
                        AS BIGINT) & 2147483647)::DOUBLE + 0.5)
                       / 2147483648.0 AS u
              FROM cells)
            SELECT lang, source, 1.0::DOUBLE AS epsilon,
                   round(n + (-1.0) * sign(u - 0.5)
                             * ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS noised_n
            FROM d
        """,
        # Winnowing (MOSS): md5-31 k-gram hashes, window minima,
        # hot-fp cap before the pair join — all exact integers.
        "winnowing_matches": """
            WITH kh AS (
              SELECT doc_id, list_transform(
                       generate_series(1, length(text) - 7),
                       i -> cast(concat('0x', substring(
                              md5(substring(text, i, 8)), 1, 8)) as bigint)
                            & 2147483647) AS kh
              FROM documents WHERE length(text) >= 15),
            fps AS MATERIALIZED (
              SELECT doc_id, unnest(list_distinct(list_transform(
                       generate_series(1, len(kh) - 7),
                       s -> list_min(kh[s:s+7])))) AS fp
              FROM kh),
            dftbl AS (SELECT fp, count(*) AS dfreq FROM fps GROUP BY 1),
            cold AS (
              SELECT f.doc_id, f.fp
              FROM fps f JOIN dftbl USING (fp) WHERE dftbl.dfreq <= 16),
            per_doc AS (
              SELECT doc_id, count(*)::BIGINT AS n_fp FROM fps GROUP BY 1),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*)::BIGINT AS n_shared
              FROM cold a JOIN cold b
                ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT p.doc_a, p.doc_b, p.n_shared,
                   pa.n_fp AS n_a, pb.n_fp AS n_b,
                   round(p.n_shared / least(pa.n_fp, pb.n_fp), 6) AS score
            FROM pairs p
            JOIN per_doc pa ON pa.doc_id = p.doc_a
            JOIN per_doc pb ON pb.doc_id = p.doc_b
            WHERE p.n_shared >= 4
        """,
        # ACF over calendar-true lag pairs; Pearson corr cancels the
        # co-moment ulps (the corr_matrix contract).
        "hourly_autocorrelation": """
            WITH hourly AS (
              SELECT event_type,
                     floor(epoch(ts) / 3600)::BIGINT AS hour,
                     round(avg(value), 6) AS x
              FROM events GROUP BY 1, 2),
            lagged AS (
              SELECT event_type, hour, x,
                     lag(x, 1) OVER w AS x_l1, lag(hour, 1) OVER w AS h_l1,
                     lag(x, 2) OVER w AS x_l2, lag(hour, 2) OVER w AS h_l2,
                     lag(x, 3) OVER w AS x_l3, lag(hour, 3) OVER w AS h_l3,
                     lag(x, 6) OVER w AS x_l6, lag(hour, 6) OVER w AS h_l6,
                     lag(x, 12) OVER w AS x_l12, lag(hour, 12) OVER w AS h_l12,
                     lag(x, 24) OVER w AS x_l24, lag(hour, 24) OVER w AS h_l24
              FROM hourly
              WINDOW w AS (PARTITION BY event_type ORDER BY hour))
            SELECT event_type, 1::BIGINT AS lag,
                   count(*)::BIGINT AS n_pairs,
                   round(corr(x, x_l1), 6) AS acf
            FROM lagged WHERE h_l1 = hour - 1
            GROUP BY event_type
            UNION ALL
            SELECT event_type, 2::BIGINT AS lag,
                   count(*)::BIGINT AS n_pairs,
                   round(corr(x, x_l2), 6) AS acf
            FROM lagged WHERE h_l2 = hour - 2
            GROUP BY event_type
            UNION ALL
            SELECT event_type, 3::BIGINT AS lag,
                   count(*)::BIGINT AS n_pairs,
                   round(corr(x, x_l3), 6) AS acf
            FROM lagged WHERE h_l3 = hour - 3
            GROUP BY event_type
            UNION ALL
            SELECT event_type, 6::BIGINT AS lag,
                   count(*)::BIGINT AS n_pairs,
                   round(corr(x, x_l6), 6) AS acf
            FROM lagged WHERE h_l6 = hour - 6
            GROUP BY event_type
            UNION ALL
            SELECT event_type, 12::BIGINT AS lag,
                   count(*)::BIGINT AS n_pairs,
                   round(corr(x, x_l12), 6) AS acf
            FROM lagged WHERE h_l12 = hour - 12
            GROUP BY event_type
            UNION ALL
            SELECT event_type, 24::BIGINT AS lag,
                   count(*)::BIGINT AS n_pairs,
                   round(corr(x, x_l24), 6) AS acf
            FROM lagged WHERE h_l24 = hour - 24
            GROUP BY event_type
        """,
        # Shannon entropy of each user's type mix — exact integer
        # ratios into ln (the bigram_logppl libm contract), 6dp.
        "user_behavior_entropy": """
            WITH cell AS (
              SELECT user_id, event_type, count(*)::BIGINT AS c
              FROM events GROUP BY 1, 2),
            pu AS (
              SELECT user_id, count(*)::BIGINT AS n_types,
                     sum(c)::BIGINT AS n_events,
                     round(sum(-(c::DOUBLE / tot::DOUBLE)
                               * ln(c::DOUBLE / tot::DOUBLE)), 6)
                       AS entropy
              FROM (SELECT user_id, event_type, c,
                           sum(c) OVER (PARTITION BY user_id) AS tot
                    FROM cell) q
              GROUP BY user_id)
            SELECT user_id, n_types, n_events, entropy,
                   CASE WHEN n_types = 1 THEN 0.0
                        ELSE round(entropy / ln(n_types::DOUBLE), 6)
                   END AS norm_entropy
            FROM pu
        """,
        # Gini by the exact rank formula — integer sums, identical
        # final expression.
        "gini_source_concentration": r"""
            WITH per AS (
              SELECT source, count(*)::BIGINT AS n_docs,
                     sum(len(list_filter(string_split_regex(text, '\s+'),
                         x -> x <> '')))::BIGINT AS n_tokens
              FROM documents GROUP BY 1),
            g AS (
              SELECT
                2.0 * sum((rd)::BIGINT * n_docs) OVER ()
                  / (count(*) OVER () * sum(n_docs) OVER ())
                - (count(*) OVER () + 1)::DOUBLE
                  / (count(*) OVER ())::DOUBLE AS g_docs,
                2.0 * sum((rt)::BIGINT * n_tokens) OVER ()
                  / (count(*) OVER () * sum(n_tokens) OVER ())
                - (count(*) OVER () + 1)::DOUBLE
                  / (count(*) OVER ())::DOUBLE AS g_tokens
              FROM (
                SELECT source, n_docs, n_tokens,
                       row_number() OVER (ORDER BY n_docs, source) AS rd,
                       row_number() OVER (ORDER BY n_tokens, source) AS rt
                FROM per) q)
            SELECT count(*)::BIGINT AS n_sources,
                   round(max(g_docs), 6) AS gini_docs,
                   round(max(g_tokens), 6) AS gini_tokens
            FROM g
        """,
        # Time-to-convert: integer seconds, lower order-statistic
        # percentile picks — no interpolation mode to diverge.
        "funnel_time_to_convert": """
            WITH p AS (
              SELECT event_id AS p_id, user_id AS u,
                     floor(epoch(ts))::BIGINT AS p_sec
              FROM events WHERE event_type = 'purchase'),
            v AS (
              SELECT user_id AS u, floor(epoch(ts))::BIGINT AS v_sec
              FROM events WHERE event_type = 'view'),
            tt AS (
              SELECT p.p_id, p.p_sec - max(v.v_sec) AS tt
              FROM p JOIN v ON p.u = v.u
              WHERE v.v_sec < p.p_sec AND v.v_sec >= p.p_sec - 86400
              GROUP BY p.p_id, p.p_sec),
            r AS (
              SELECT tt, p_id,
                     row_number() OVER (ORDER BY tt, p_id) AS rk,
                     count(*) OVER () AS n
              FROM tt)
            SELECT max(n)::BIGINT AS n_conversions,
                   max(CASE WHEN rk = (n + 1) // 2 THEN tt END)::BIGINT
                     AS p50_s,
                   max(CASE WHEN rk = ceil(0.9 * n) THEN tt END)::BIGINT
                     AS p90_s,
                   round(sum(tt) / max(n), 4) AS mean_s
            FROM r
        """,
        # Exact stratification: rank by the portable multiplicative
        # hash within lang, fold = (rank-1) mod 5.
        "kfold_assign": r"""
            SELECT lang, fold, count(*)::BIGINT AS n_docs,
                   sum(n_toks)::BIGINT AS n_tokens
            FROM (
              SELECT lang,
                     ((row_number() OVER (
                         PARTITION BY lang
                         ORDER BY (doc_id * 2654435761) % 4294967296,
                                  doc_id) - 1) % 5)::BIGINT AS fold,
                     len(list_filter(string_split_regex(text, '\s+'),
                         x -> x <> ''))::BIGINT AS n_toks
              FROM documents)
            GROUP BY lang, fold
        """,
        # Winnowing clusters: the match-pair CTE chain + the shared
        # recursive-reach component oracle (min reachable doc_id).
        "winnow_clusters": """
            WITH RECURSIVE kh AS (
              SELECT doc_id, list_transform(
                       generate_series(1, length(text) - 7),
                       i -> cast(concat('0x', substring(
                              md5(substring(text, i, 8)), 1, 8)) as bigint)
                            & 2147483647) AS kh
              FROM documents WHERE length(text) >= 15),
            fps AS MATERIALIZED (
              SELECT doc_id, unnest(list_distinct(list_transform(
                       generate_series(1, len(kh) - 7),
                       s -> list_min(kh[s:s+7])))) AS fp
              FROM kh),
            dftbl AS (SELECT fp, count(*) AS dfreq FROM fps GROUP BY 1),
            cold AS (
              SELECT f.doc_id, f.fp
              FROM fps f JOIN dftbl USING (fp) WHERE dftbl.dfreq <= 16),
            pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM cold a JOIN cold b
                ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY 1, 2
              HAVING count(*) >= 4),
            edges AS (
              SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM pairs),
            reach(a, b) AS (
              SELECT src, src FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
            SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
        """,
        # Classical additive decomposition: exact 6dp decimal
        # components; only the two final variances are float-order
        # dependent, collapsed by the 6dp emission round.
        "seasonal_decompose_hourly": """
            WITH hourly AS (
              SELECT event_type,
                     floor(epoch(ts) / 3600)::BIGINT AS h,
                     round(avg(value), 6) AS x
              FROM events GROUP BY 1, 2),
            hh AS (
              SELECT event_type, h, x, h // 24 AS day,
                     (h % 24)::INT AS hod
              FROM hourly),
            daily AS (
              SELECT event_type, day, avg(x) AS dmean
              FROM hh GROUP BY 1, 2),
            dev AS (
              SELECT hh.event_type, hh.hod, hh.x - d.dmean AS dev
              FROM hh JOIN daily d USING (event_type, day)),
            seas AS (
              SELECT event_type, hod, round(avg(dev), 6) AS seasonal,
                     count(*)::BIGINT AS n_obs
              FROM dev GROUP BY 1, 2),
            resid AS (
              SELECT d.event_type, d.hod, d.dev,
                     d.dev - s.seasonal AS resid
              FROM dev d JOIN seas s USING (event_type, hod)),
            st AS (
              SELECT event_type,
                     round(var_samp(resid), 6) AS var_resid,
                     round(var_samp(dev), 6) AS var_deseason,
                     round(greatest(0.0,
                           1.0 - var_samp(resid) / var_samp(dev)), 6)
                       AS strength
              FROM resid GROUP BY 1)
            SELECT s.event_type, s.hod, s.seasonal, s.n_obs,
                   st.var_resid, st.var_deseason, st.strength
            FROM seas s JOIN st USING (event_type)
        """,
        # Multi-touch attribution: user-keyed range join, three models,
        # unattributed bucket so each model conserves total value.
        "attribution_report": """
            WITH p AS (
              SELECT event_id AS p_id, user_id AS u,
                     floor(epoch(ts))::BIGINT AS p_sec, value AS p_value
              FROM events WHERE event_type = 'purchase'),
            t AS (
              SELECT user_id AS u, event_id AS t_id,
                     event_type AS touch_type,
                     floor(epoch(ts))::BIGINT AS t_sec
              FROM events WHERE event_type IN ('view', 'click')),
            pairs AS (
              SELECT p.p_id, p.p_value, t.touch_type, t.t_sec, t.t_id
              FROM p JOIN t ON p.u = t.u
              WHERE t.t_sec < p.p_sec AND t.t_sec >= p.p_sec - 3600),
            e AS (
              SELECT *,
                     count(*) OVER (PARTITION BY p_id) AS n_touch,
                     row_number() OVER (PARTITION BY p_id
                       ORDER BY t_sec DESC, t_id DESC) AS rk_last,
                     row_number() OVER (PARTITION BY p_id
                       ORDER BY t_sec ASC, t_id ASC) AS rk_first
              FROM pairs),
            una AS (
              SELECT m.model, 'unattributed' AS touch_type,
                     p.p_value AS v
              FROM p
              LEFT JOIN (SELECT DISTINCT p_id FROM pairs) a USING (p_id)
              CROSS JOIN (VALUES ('last_touch'), ('first_touch'),
                                 ('linear')) m(model)
              WHERE a.p_id IS NULL),
            allv AS (
              SELECT 'last_touch' AS model, touch_type, p_value AS v
              FROM e WHERE rk_last = 1
              UNION ALL
              SELECT 'first_touch', touch_type, p_value FROM e
              WHERE rk_first = 1
              UNION ALL
              SELECT 'linear', touch_type, p_value / n_touch FROM e
              UNION ALL
              SELECT model, touch_type, v FROM una)
            SELECT model, touch_type, count(*)::BIGINT AS n,
                   round(sum(v), 4) AS value
            FROM allv GROUP BY 1, 2
        """,
        # Sliding-window HLL: daily registers fanned to their <=7
        # window end-days, merged by max — same portable register
        # arithmetic as hll_distinct; exact range-join twin beside it.
        "wau_hll_sliding": r"""
            WITH h AS (
              SELECT floor(epoch(ts) / 86400)::BIGINT AS day, user_id,
                     list_reduce(list_prepend(0::BIGINT,
                       list_transform(regexp_extract_all(user_id::VARCHAR,
                                                         '[\s\S]'),
                                      c -> ascii(c)::BIGINT)),
                       (acc, x) -> (acc * 131 + x) % 1000000007) AS h0
              FROM events
            ), rdaily AS (
              SELECT day, h0 % 256 AS j,
                     max(CASE WHEN h0 // 256 > 0
                              THEN 22 - floor(log2(h0 // 256))::BIGINT
                              ELSE 23 END) AS m_j
              FROM h GROUP BY 1, 2
            ), fanned AS (
              SELECT unnest(generate_series(day, day + 6)) AS day, j, m_j
              FROM rdaily
            ), reg AS (
              SELECT day, j, max(m_j) AS m_j FROM fanned GROUP BY 1, 2
            ), agg AS (
              SELECT day, count(*)::BIGINT AS n_present,
                     (sum((1::BIGINT << (30 - m_j)))
                      + (256 - count(*)) * 1073741824)::BIGINT AS z_int,
                     (256 - count(*))::BIGINT AS v_zero
              FROM reg GROUP BY 1
            ), days AS (SELECT DISTINCT day FROM h
            ), ex AS (
              SELECT d.day, count(DISTINCT e.user_id)::BIGINT AS true_wau
              FROM days d JOIN h e
                ON e.day <= d.day AND e.day >= d.day - 6
              GROUP BY 1
            )
            SELECT a.day, n_present, v_zero,
                   round(CASE WHEN v_zero > 0
                              AND 7213e-4 / (1e0 + 1079e-3 / 256e0)
                                  * 65536e0 * 1073741824e0 / z_int <= 640e0
                         THEN 256e0 * ln(256e0 / v_zero)
                         ELSE 7213e-4 / (1e0 + 1079e-3 / 256e0)
                              * 65536e0 * 1073741824e0 / z_int END, 4)
                     AS est_distinct,
                   true_wau
            FROM agg a JOIN ex USING (day)
        """,
        # HRW sharding: argmax over 8 md5-31 weights per doc; ties
        # (astronomically unlikely) break to the lowest shard index in
        # both engines (first position of the max).
        "rendezvous_shards": """
            WITH w AS (
              SELECT doc_id,
                     [cast(concat('0x', substring(md5(doc_id::VARCHAR || ':0'), 1, 8)) as bigint) & 2147483647,
                      cast(concat('0x', substring(md5(doc_id::VARCHAR || ':1'), 1, 8)) as bigint) & 2147483647,
                      cast(concat('0x', substring(md5(doc_id::VARCHAR || ':2'), 1, 8)) as bigint) & 2147483647,
                      cast(concat('0x', substring(md5(doc_id::VARCHAR || ':3'), 1, 8)) as bigint) & 2147483647,
                      cast(concat('0x', substring(md5(doc_id::VARCHAR || ':4'), 1, 8)) as bigint) & 2147483647,
                      cast(concat('0x', substring(md5(doc_id::VARCHAR || ':5'), 1, 8)) as bigint) & 2147483647,
                      cast(concat('0x', substring(md5(doc_id::VARCHAR || ':6'), 1, 8)) as bigint) & 2147483647,
                      cast(concat('0x', substring(md5(doc_id::VARCHAR || ':7'), 1, 8)) as bigint) & 2147483647] AS ws
              FROM documents),
            a AS (
              SELECT doc_id,
                     (list_position(ws, list_max(ws)) - 1)::BIGINT AS shard
              FROM w),
            c AS (SELECT shard, count(*)::BIGINT AS n_docs FROM a GROUP BY 1),
            t AS (SELECT sum(n_docs) AS t FROM c)
            SELECT shard, n_docs, round(n_docs / t.t, 6) AS share
            FROM c CROSS JOIN t
        """,
        # Hashing trick: md5-31 bucket + the next bit up as the sign,
        # exact integers end to end; zero-sum cells dropped.
        "feature_hashing": r"""
            WITH occ AS (
              SELECT doc_id,
                     cast(concat('0x', substring(md5(word), 1, 8)) as bigint)
                       & 2147483647 AS h
              FROM (SELECT doc_id,
                           unnest(list_filter(
                             string_split_regex(text, '\s+'),
                             x -> x <> '')) AS word
                    FROM documents))
            SELECT doc_id, (h % 64)::BIGINT AS bucket,
                   sum(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END)
                     ::BIGINT AS val
            FROM occ GROUP BY 1, 2
            HAVING sum(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END) <> 0
        """,
        # ntile is ANSI-identical in both engines once the ORDER BY is
        # made unique with the event_id tie-break.
        "quantile_binning": """
            SELECT event_type, bin::BIGINT AS bin,
                   count(*)::BIGINT AS n,
                   round(min(value), 6) AS lo,
                   round(max(value), 6) AS hi
            FROM (
              SELECT event_type, value,
                     ntile(8) OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS bin
              FROM events) q
            GROUP BY 1, 2
        """,
        # Session paths: the sessionize lag/cumsum chain, an ordered
        # per-session type list, consecutive-dedup as a string fold.
        "top_session_paths": """
            WITH seq AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN lag(floor(epoch(ts))) OVER w IS NULL THEN 0
                          WHEN floor(epoch(ts))
                               - lag(floor(epoch(ts))) OVER w > 1800 THEN 1
                          ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sess AS (
              SELECT user_id, event_type, ts, event_id,
                     sum(new_session) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING)
                       AS session_id
              FROM seq),
            paths AS (
              SELECT list_reduce(
                       array_agg(event_type ORDER BY ts, event_id),
                       (acc, t) -> CASE
                         WHEN regexp_extract(acc, '[^>]+$', 0) = t THEN acc
                         ELSE acc || '>' || t END) AS path
              FROM sess GROUP BY user_id, session_id),
            counted AS (
              SELECT path, count(*)::BIGINT AS n_sessions
              FROM paths GROUP BY 1)
            SELECT path, n_sessions,
                   row_number() OVER (ORDER BY n_sessions DESC, path)::BIGINT
                     AS rank
            FROM counted
            ORDER BY n_sessions DESC, path LIMIT 25
        """,
        # Theil-Sen: pairwise slopes of the 6dp hourly series divided
        # by exact integer gaps; LOWER-median order-statistic picks.
        "theil_sen_hourly": """
            WITH hourly AS (
              SELECT event_type,
                     floor(epoch(ts) / 3600)::BIGINT AS hour,
                     round(avg(value), 6) AS x
              FROM events GROUP BY 1, 2),
            slopes AS (
              SELECT a.event_type,
                     (b.x - a.x) / (b.hour - a.hour)::DOUBLE AS slope
              FROM hourly a JOIN hourly b
                ON a.event_type = b.event_type AND b.hour > a.hour),
            ms AS (
              SELECT event_type, slope, n_pairs FROM (
                SELECT event_type, slope,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY slope) AS rk,
                       count(*) OVER (PARTITION BY event_type) AS n_pairs
                FROM slopes) q
              WHERE rk = (n_pairs + 1) // 2),
            resid AS (
              SELECT h.event_type, m.slope, m.n_pairs,
                     h.x - m.slope * h.hour::DOUBLE AS r
              FROM hourly h JOIN ms m USING (event_type))
            SELECT event_type, n_points::BIGINT AS n_points,
                   n_pairs::BIGINT AS n_pairs,
                   round(slope, 6) AS slope,
                   round(r, 6) AS intercept
            FROM (
              SELECT event_type, slope, n_pairs, r,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY r) AS rk,
                     count(*) OVER (PARTITION BY event_type) AS n_points
              FROM resid) q
            WHERE rk = (n_points + 1) // 2
        """,
        # CUSUM via the closed prefix form: running sum + running min
        # windows accumulate in the identical order on both engines;
        # hourly means / mu / sd rounded 6dp before the recursion.
        "holt_winters_hourly": _hw_sql(),
        "cusum_changepoints": """
            WITH hourly AS (
              SELECT event_type,
                     floor(epoch(ts) / 3600)::BIGINT AS hour,
                     round(avg(value), 6) AS x
              FROM events GROUP BY 1, 2),
            st AS (
              SELECT event_type, round(avg(x), 6) AS mu,
                     round(stddev_samp(x), 6) AS sd
              FROM hourly GROUP BY 1),
            i7 AS (
              SELECT h.event_type, h.hour, h.x,
                     round(h.x * 1e7, 0)::BIGINT AS x7,
                     round(s.mu * 1e7, 0)::BIGINT AS mu7,
                     round(s.sd * 1e7, 0)::BIGINT AS sd7
              FROM hourly h JOIN st s USING (event_type)),
            c AS (
              SELECT event_type, hour, x, sd7,
                     sum(10 * x7 - 10 * mu7 - 5 * sd7) OVER w AS c_pos,
                     sum(10 * mu7 - 10 * x7 - 5 * sd7) OVER w AS c_neg
              FROM i7
              WINDOW w AS (PARTITION BY event_type ORDER BY hour
                           ROWS UNBOUNDED PRECEDING)),
            sc AS (
              SELECT event_type, hour, x, sd7,
                     (c_pos - least(0, min(c_pos) OVER w))::BIGINT AS sp,
                     (c_neg - least(0, min(c_neg) OVER w))::BIGINT AS sn
              FROM c
              WINDOW w AS (PARTITION BY event_type ORDER BY hour
                           ROWS UNBOUNDED PRECEDING))
            SELECT event_type, hour, x,
                   sp / 1e8 AS s_pos,
                   sn / 1e8 AS s_neg,
                   (sp > 40 * sd7)::BIGINT AS alarm_up,
                   (sn > 40 * sd7)::BIGINT AS alarm_down
            FROM sc
        """,
        # SCD2 history build: runs of equal per-user states ->
        # validity intervals; epoch-second bigints end to end.
        "scd2_user_state": """
            WITH seq AS (
              SELECT user_id, event_type, event_id, ts,
                     floor(epoch(ts))::BIGINT AS sec,
                     CASE WHEN lag(event_type) OVER w IS NULL
                            OR lag(event_type) OVER w <> event_type
                          THEN 1 ELSE 0 END AS chg
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            seg AS (
              SELECT user_id, event_type, sec,
                     sum(chg) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS version
              FROM seq),
            runs AS (
              SELECT user_id, version::BIGINT AS version,
                     min(event_type) AS state,
                     min(sec)::BIGINT AS valid_from,
                     count(*)::BIGINT AS n_events
              FROM seg GROUP BY user_id, version)
            SELECT user_id, version, state, valid_from,
                   lead(valid_from) OVER w2 AS valid_to, n_events,
                   (lead(valid_from) OVER w2 IS NULL)::BIGINT AS is_current
            FROM runs
            WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
        """,
        # Holt double exponential smoothing: the same sequential-fold
        # recipe as ema_user_value, but with a 2-component state. The
        # accumulator is a LIST, not a struct — DuckDB's list_reduce
        # mis-evaluates the second field of struct-valued lambdas
        # (b diverges from the hand recurrence at step 3), while
        # list-valued accumulators replicate the fold bit-for-bit.
        "holt_linear_user": """
            WITH seq AS (
              SELECT user_id,
                     array_agg(value ORDER BY ts, event_id) AS vals
              FROM events GROUP BY user_id),
            st AS (
              SELECT user_id, len(vals)::BIGINT AS n_events,
                     list_reduce(
                       list_transform(vals, v -> [v, 0.0::DOUBLE]),
                       (acc, x) -> [
                         0.25::DOUBLE * x[1]
                           + 0.75::DOUBLE * (acc[1] + acc[2]),
                         0.125::DOUBLE * ((0.25::DOUBLE * x[1]
                             + 0.75::DOUBLE * (acc[1] + acc[2])) - acc[1])
                           + 0.875::DOUBLE * acc[2]]) AS h
              FROM seq)
            SELECT user_id, n_events, round(h[1], 6) AS level,
                   round(h[2], 6) AS trend,
                   round(h[1] + 3.0 * h[2], 6) AS forecast_3
            FROM st
        """,
        "ema_user_value": """
            WITH seq AS (
              SELECT user_id,
                     array_agg(value ORDER BY ts, event_id) AS vals
              FROM events GROUP BY user_id)
            SELECT user_id, len(vals)::BIGINT AS n_events,
                   round(vals[-1], 6) AS last_value,
                   round(list_reduce(vals,
                         (acc, v) -> 0.125 * v + 0.875 * acc), 6) AS ema
            FROM seq
        """,
        # Two independent Unicode implementations must agree:
        # Python unicodedata (Spark kernel) vs utf8proc (DuckDB).
        "unicode_nfc_scan": r"""
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars,
                   length(nfc_normalize(text))::BIGINT AS n_chars_nfc,
                   (nfc_normalize(text) <> text)::BIGINT AS changed,
                   list_reduce(
                     list_prepend(0::BIGINT,
                       list_transform(
                         regexp_extract_all(nfc_normalize(text), '[\s\S]'),
                         c -> ascii(c)::BIGINT)),
                     (acc, x) -> (acc * 131 + x) % 1000000007)
                     AS nfc_fingerprint
            FROM documents
        """,
        "l_diversity_report": """
            WITH cells AS (
              SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n
              FROM customer GROUP BY 1, 2)
            SELECT c_nationkey,
                   sum(n)::BIGINT AS class_size,
                   count(*)::BIGINT AS n_sensitive_values,
                   round(max(n) / sum(n), 6) AS dominant_share,
                   (count(*) < 3)::BIGINT AS below_l
            FROM cells GROUP BY c_nationkey
        """,
        "t_closeness_report": """
            WITH cells AS (
              SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n_cs
              FROM customer GROUP BY 1, 2),
            classes AS (
              SELECT c_nationkey, sum(n_cs)::BIGINT AS class_size
              FROM cells GROUP BY 1),
            gdist AS (
              SELECT c_mktsegment, sum(n_cs)::BIGINT AS g_s
              FROM cells GROUP BY 1),
            total AS (SELECT sum(g_s)::BIGINT AS n_total FROM gdist),
            grid AS (
              SELECT cl.c_nationkey, cl.class_size, t.n_total,
                     abs(coalesce(ce.n_cs, 0) * t.n_total
                         - g.g_s * cl.class_size)::BIGINT AS abs_num
              FROM classes cl CROSS JOIN gdist g CROSS JOIN total t
              LEFT JOIN cells ce
                ON ce.c_nationkey = cl.c_nationkey
               AND ce.c_mktsegment = g.c_mktsegment)
            SELECT c_nationkey,
                   max(class_size)::BIGINT AS class_size,
                   round(sum(abs_num)
                         / (2.0 * max(class_size) * max(n_total)), 6)
                     AS emd,
                   (sum(abs_num)
                    / (2.0 * max(class_size) * max(n_total)) > 0.2)::BIGINT
                     AS above_t
            FROM grid GROUP BY c_nationkey
        """,
        "gopher_repetition_filter": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 t -> t <> '') AS tk
              FROM documents),
            base AS (
              SELECT doc_id, tk, len(tk) AS ntok,
                     list_transform(tk, t -> length(t)) AS lens,
                     coalesce(list_sum(
                       list_transform(tk, t -> length(t))), 0)::BIGINT
                       AS total
              FROM toks),
            pos AS (
              SELECT doc_id, tk, lens, ntok, total,
                     unnest(generate_series(1, ntok)) AS i
              FROM base),
            grams AS (
              SELECT p.doc_id, v.n, p.i, p.total,
                     list_sum(p.lens[p.i : p.i + v.n - 1])::BIGINT
                       AS gchars,
                     array_to_string(p.tk[p.i : p.i + v.n - 1], chr(1))
                       AS gram
              FROM pos p CROSS JOIN (VALUES (2),(3),(4),(5),(6),(7),(8),
                                            (9),(10)) v(n)
              WHERE p.i + v.n - 1 <= p.ntok),
            gcnt AS (
              SELECT doc_id, n, gram, count(*)::BIGINT AS c,
                     max(gchars)::BIGINT AS gch
              FROM grams WHERE n <= 4 GROUP BY 1, 2, 3),
            topw AS (
              SELECT doc_id, n, c, gch,
                     max(c) OVER (PARTITION BY doc_id, n) AS cmax
              FROM gcnt),
            topf AS (
              SELECT doc_id, n, max(cmax)::BIGINT AS c,
                     max(CASE WHEN c = cmax THEN gch END)::BIGINT AS h
              FROM topw GROUP BY 1, 2),
            dupg AS (
              SELECT doc_id, n, gram FROM grams WHERE n >= 5
              GROUP BY 1, 2, 3 HAVING count(*) >= 2),
            covpos AS (
              SELECT DISTINCT doc_id, n, j FROM (
                SELECT g.doc_id, g.n,
                       unnest(generate_series(g.i, g.i + g.n - 1)) AS j
                FROM grams g JOIN dupg d USING (doc_id, n, gram))),
            covsum AS (
              SELECT c.doc_id, c.n, sum(b.lens[c.j])::BIGINT AS cch
              FROM covpos c JOIN base b USING (doc_id) GROUP BY 1, 2),
            assembled AS (
              SELECT b.doc_id,
                coalesce(max(CASE WHEN b.total > 0 AND t.n = 2
                             THEN (t.c * t.h) / b.total END), 0) AS f2,
                coalesce(max(CASE WHEN b.total > 0 AND t.n = 3
                             THEN (t.c * t.h) / b.total END), 0) AS f3,
                coalesce(max(CASE WHEN b.total > 0 AND t.n = 4
                             THEN (t.c * t.h) / b.total END), 0) AS f4,
                coalesce(max(CASE WHEN b.total > 0 AND c.n = 5
                             THEN c.cch / b.total END), 0) AS d5,
                coalesce(max(CASE WHEN b.total > 0 AND c.n = 6
                             THEN c.cch / b.total END), 0) AS d6,
                coalesce(max(CASE WHEN b.total > 0 AND c.n = 7
                             THEN c.cch / b.total END), 0) AS d7,
                coalesce(max(CASE WHEN b.total > 0 AND c.n = 8
                             THEN c.cch / b.total END), 0) AS d8,
                coalesce(max(CASE WHEN b.total > 0 AND c.n = 9
                             THEN c.cch / b.total END), 0) AS d9,
                coalesce(max(CASE WHEN b.total > 0 AND c.n = 10
                             THEN c.cch / b.total END), 0) AS d10
              FROM base b
              LEFT JOIN topf t USING (doc_id)
              LEFT JOIN covsum c USING (doc_id)
              GROUP BY b.doc_id)
            SELECT doc_id,
                   round(f2, 6) AS top2_frac, round(f3, 6) AS top3_frac,
                   round(f4, 6) AS top4_frac, round(d5, 6) AS dup5_frac,
                   round(d6, 6) AS dup6_frac, round(d7, 6) AS dup7_frac,
                   round(d8, 6) AS dup8_frac, round(d9, 6) AS dup9_frac,
                   round(d10, 6) AS dup10_frac,
                   (round(f2, 6) <= 0.20 AND round(f3, 6) <= 0.18
                    AND round(f4, 6) <= 0.16 AND round(d5, 6) <= 0.15
                    AND round(d6, 6) <= 0.14 AND round(d7, 6) <= 0.13
                    AND round(d8, 6) <= 0.12 AND round(d9, 6) <= 0.11
                    AND round(d10, 6) <= 0.10)::BIGINT AS pass
            FROM assembled
        """,
        "feature_drift_psi": """
            WITH ref AS (
              SELECT event_type, value FROM events WHERE user_id % 2 = 0),
            cur AS (
              SELECT event_type,
                     CASE WHEN event_type = 'purchase' THEN value + 25.0
                          ELSE value END AS value
              FROM events WHERE user_id % 2 = 1),
            stats AS (
              SELECT event_type, min(value) AS vmin, max(value) AS vmax
              FROM ref GROUP BY 1),
            tagged AS (
              SELECT event_type, value, 0 AS side FROM ref
              UNION ALL
              SELECT event_type, value, 1 AS side FROM cur),
            binned AS (
              SELECT t.event_type, t.side,
                     (CASE WHEN s.vmax = s.vmin THEN 0
                           ELSE least(greatest(floor(
                                  ((t.value - s.vmin) / (s.vmax - s.vmin))
                                  * 10), 0), 9)
                      END)::BIGINT AS bin
              FROM tagged t JOIN stats s USING (event_type)),
            cells AS (
              SELECT event_type, bin,
                     sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT AS nr,
                     sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS nc
              FROM binned GROUP BY 1, 2),
            spine AS (
              SELECT event_type,
                     unnest(generate_series(0, 9))::BIGINT AS bin
              FROM stats),
            filled AS (
              SELECT sp.event_type, sp.bin,
                     coalesce(c.nr, 0)::BIGINT AS nr,
                     coalesce(c.nc, 0)::BIGINT AS nc
              FROM spine sp LEFT JOIN cells c
                ON c.event_type = sp.event_type AND c.bin = sp.bin),
            totals AS (
              SELECT event_type, sum(nr)::BIGINT AS n_ref,
                     sum(nc)::BIGINT AS n_cur
              FROM filled GROUP BY 1),
            terms AS (
              SELECT f.event_type, t.n_ref, t.n_cur,
                     ((f.nr + 1.0) / (t.n_ref + 10.0)
                      - (f.nc + 1.0) / (t.n_cur + 10.0))
                     * ln(((f.nr + 1.0) / (t.n_ref + 10.0))
                          / ((f.nc + 1.0) / (t.n_cur + 10.0))) AS term
              FROM filled f JOIN totals t USING (event_type))
            SELECT event_type,
                   max(n_ref)::BIGINT AS n_ref,
                   max(n_cur)::BIGINT AS n_cur,
                   round(sum(term), 6) AS psi,
                   (sum(term) > 0.2)::BIGINT AS drifted
            FROM terms GROUP BY event_type
        """,
        "hypertable_gap_fill": """
            WITH agg AS (
              SELECT event_type, date_trunc('hour', ts) AS bucket,
                     count(*)::BIGINT AS n, round(sum(value), 4) AS vs
              FROM events GROUP BY 1, 2),
            bounds AS (
              SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
              FROM agg GROUP BY 1),
            spine AS (
              SELECT event_type,
                     unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                       AS bucket
              FROM bounds)
            SELECT s.event_type, s.bucket,
                   coalesce(a.n, 0)::BIGINT AS n_events,
                   (a.vs IS NULL)::BIGINT AS is_gap,
                   last_value(a.vs IGNORE NULLS) OVER (
                     PARTITION BY s.event_type ORDER BY s.bucket
                     ROWS UNBOUNDED PRECEDING) AS value_locf
            FROM spine s
            LEFT JOIN agg a
              ON a.event_type = s.event_type AND a.bucket = s.bucket
        """,
        "time_weighted_avg": """
            WITH t AS (
              SELECT user_id, value,
                     date_diff('second', ts,
                       lead(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)) AS dt
              FROM events)
            SELECT user_id, count(*)::BIGINT AS n_intervals,
                   sum(dt)::BIGINT AS total_seconds,
                   round(sum(value * dt) / sum(dt), 6) AS twa
            FROM t WHERE dt IS NOT NULL
            GROUP BY user_id HAVING sum(dt) > 0
        """,
        "event_transitions": """
            WITH pairs AS (
              SELECT event_type AS from_type,
                     lead(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                       AS to_type
              FROM events),
            counts AS (
              SELECT from_type, to_type, count(*)::BIGINT AS n
              FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
            totals AS (
              SELECT from_type, sum(n)::BIGINT AS tot
              FROM counts GROUP BY 1)
            SELECT from_type, to_type, n, round(n / tot, 6) AS prob
            FROM counts JOIN totals USING (from_type)
        """,
        # DSIR: the bucket log-ratios fold from the same per-doc
        # distinct-bigram counts as bigram_logppl; the md5-31 bucket
        # hash is the portable_token_hash31 expression verbatim.
        "dsir_weights": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            bg AS (
              SELECT doc_id, t[i] AS w1, t[i+1] AS w2
              FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
                    FROM toks WHERE len(t) >= 2)),
            dab AS (
              SELECT doc_id, w1, w2, count(*) AS c_dab
              FROM bg GROUP BY 1, 2, 3),
            b AS (
              SELECT doc_id, c_dab,
                     (cast(concat('0x', substring(
                        md5(concat(w1, ' ', w2)), 1, 8)) AS BIGINT)
                      & 2147483647) % 1024 AS bucket,
                     CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END
                       AS is_target
              FROM dab),
            stats AS (
              SELECT bucket,
                     sum(c_dab * is_target)::BIGINT AS ct,
                     sum(c_dab * (1 - is_target))::BIGINT AS cs
              FROM b GROUP BY 1),
            tot AS (SELECT sum(ct)::BIGINT AS tt, sum(cs)::BIGINT AS ts
                    FROM stats),
            llr AS (
              SELECT bucket,
                     ln((ct + 1)::DOUBLE / (tt::DOUBLE + 1024.0))
                     - ln((cs + 1)::DOUBLE / (ts::DOUBLE + 1024.0)) AS llr
              FROM stats CROSS JOIN tot)
            SELECT doc_id, sum(c_dab)::BIGINT AS n_grams,
                   round(sum(c_dab * llr), 6) AS logw
            FROM b JOIN llr USING (bucket)
            WHERE is_target = 0 GROUP BY doc_id
        """,
        "dsir_select": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            bg AS (
              SELECT doc_id, t[i] AS w1, t[i+1] AS w2
              FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
                    FROM toks WHERE len(t) >= 2)),
            dab AS (
              SELECT doc_id, w1, w2, count(*) AS c_dab
              FROM bg GROUP BY 1, 2, 3),
            b AS (
              SELECT doc_id, c_dab,
                     (cast(concat('0x', substring(
                        md5(concat(w1, ' ', w2)), 1, 8)) AS BIGINT)
                      & 2147483647) % 1024 AS bucket,
                     CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END
                       AS is_target
              FROM dab),
            stats AS (
              SELECT bucket,
                     sum(c_dab * is_target)::BIGINT AS ct,
                     sum(c_dab * (1 - is_target))::BIGINT AS cs
              FROM b GROUP BY 1),
            tot AS (SELECT sum(ct)::BIGINT AS tt, sum(cs)::BIGINT AS ts
                    FROM stats),
            llr AS (
              SELECT bucket,
                     ln((ct + 1)::DOUBLE / (tt::DOUBLE + 1024.0))
                     - ln((cs + 1)::DOUBLE / (ts::DOUBLE + 1024.0)) AS llr
              FROM stats CROSS JOIN tot),
            scored AS (
              SELECT doc_id, sum(c_dab)::BIGINT AS n_grams,
                     round(sum(c_dab * llr), 6) AS logw
              FROM b JOIN llr USING (bucket)
              WHERE is_target = 0 GROUP BY doc_id),
            cut AS (SELECT round(quantile_cont(logw, 0.75), 6) AS cut
                    FROM scored)
            SELECT doc_id, n_grams, logw
            FROM scored CROSS JOIN cut WHERE logw >= cut
        """,
        # Kneser-Ney: identical expression parenthesization to the
        # Spark side; all count tables fold from the dab CTE.
        "kneser_ney_logppl": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            bg AS (
              SELECT doc_id, t[i] AS w1, t[i+1] AS w2
              FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
                    FROM toks WHERE len(t) >= 2)),
            dab AS (
              SELECT doc_id, w1, w2, count(*) AS c_dab
              FROM bg GROUP BY 1, 2, 3),
            lm_ab AS (
              SELECT w1, w2, sum(c_dab)::BIGINT AS c_ab
              FROM dab GROUP BY 1, 2),
            lm_a AS (
              SELECT w1, sum(c_ab)::BIGINT AS c_a,
                     count(*)::BIGINT AS n1p_fw
              FROM lm_ab GROUP BY 1),
            cont AS (
              SELECT w2, count(*)::BIGINT AS n1p_bw FROM lm_ab GROUP BY 1),
            nbig AS (SELECT count(*)::BIGINT AS nb FROM lm_ab)
            SELECT doc_id, sum(c_dab)::BIGINT AS n_bigrams,
                   round(-sum(c_dab * ln(
                     greatest(c_ab - 0.75, 0.0) / c_a
                     + (0.75 * n1p_fw / c_a) * (n1p_bw / nb)
                   )) / sum(c_dab), 6) AS cross_entropy
            FROM dab
            JOIN lm_ab USING (w1, w2)
            JOIN lm_a USING (w1)
            JOIN cont USING (w2)
            CROSS JOIN nbig
            GROUP BY doc_id
        """,
        # Trigram interpolated KN: the full KenLM-style adjusted-count
        # chain (top trigram counts, mid/low CONTINUATION type counts)
        # folded from one trigram table — identical parenthesization to
        # the Spark expression so the 6dp round is stable.
        "kneser_ney3_logppl": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            tg AS (
              SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
              FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
                    FROM toks WHERE len(t) >= 3)),
            dabc AS (
              SELECT doc_id, w1, w2, w3, count(*) AS c_dabc
              FROM tg GROUP BY 1, 2, 3, 4),
            lm_abc AS (
              SELECT w1, w2, w3, sum(c_dabc)::BIGINT AS c_abc
              FROM dabc GROUP BY 1, 2, 3),
            ctx_ab AS (
              SELECT w1, w2, sum(c_abc)::BIGINT AS c_ab,
                     count(*)::BIGINT AS n1p_fw
              FROM lm_abc GROUP BY 1, 2),
            adj2 AS (
              SELECT w2, w3, count(*)::BIGINT AS a_bc
              FROM lm_abc GROUP BY 1, 2),
            ctx_b AS (
              SELECT w2, sum(a_bc)::BIGINT AS a_b,
                     count(*)::BIGINT AS n1p_fw2
              FROM adj2 GROUP BY 1),
            adj1 AS (
              SELECT w3, count(*)::BIGINT AS a_c FROM adj2 GROUP BY 1),
            nb2 AS (SELECT count(*)::BIGINT AS nb FROM adj2)
            SELECT doc_id, sum(c_dabc)::BIGINT AS n_trigrams,
                   round(-sum(c_dabc * ln(
                     greatest(c_abc - 0.75, 0.0) / c_ab
                     + (0.75 * n1p_fw / c_ab) * (
                         greatest(a_bc - 0.75, 0.0) / a_b
                         + (0.75 * n1p_fw2 / a_b) * (a_c / nb))
                   )) / sum(c_dabc), 6) AS cross_entropy
            FROM dabc
            JOIN lm_abc USING (w1, w2, w3)
            JOIN ctx_ab USING (w1, w2)
            JOIN adj2 USING (w2, w3)
            JOIN ctx_b USING (w2)
            JOIN adj1 USING (w3)
            CROSS JOIN nb2
            GROUP BY doc_id
        """,
        "bigram_logppl": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            bg AS (
              SELECT doc_id, t[i] AS w1, t[i+1] AS w2
              FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
                    FROM toks WHERE len(t) >= 2)),
            dab AS (
              SELECT doc_id, w1, w2, count(*) AS c_dab
              FROM bg GROUP BY 1, 2, 3),
            lm_ab AS (
              SELECT w1, w2, sum(c_dab) AS c_ab FROM dab GROUP BY 1, 2),
            lm_a AS (SELECT w1, sum(c_ab) AS c_a FROM lm_ab GROUP BY 1),
            vocab AS (
              SELECT count(DISTINCT w)::DOUBLE AS v
              FROM (SELECT unnest(t) AS w FROM toks))
            SELECT doc_id, sum(c_dab)::BIGINT AS n_bigrams,
                   round(-sum(c_dab * ln((c_ab + 1) / (c_a + v)))
                         / sum(c_dab), 6) AS cross_entropy
            FROM dab
            JOIN lm_ab USING (w1, w2)
            JOIN lm_a USING (w1)
            CROSS JOIN vocab
            GROUP BY doc_id
        """,
        "chunk_documents": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents)
            SELECT doc_id, ((s - 1) // 48)::BIGINT AS chunk_id,
                   s::BIGINT AS start_tok,
                   len(t[s:s+63])::BIGINT AS n_tokens,
                   array_to_string(t[s:s+63], ' ') AS chunk_text
            FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1, 48)) AS s
                  FROM toks WHERE len(t) >= 1)
        """,
        # Suffix-sorting refinement: per-doc max cross-doc LCP is
        # independent of sort tie order (see operators/substr.py), so
        # the oracle replicates the windows without replicating the
        # engine's tie-breaking. Spark groups by the 3-gram's hash,
        # the oracle by the 3-gram itself — identical equivalence
        # classes.
        "max_dup_span": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            sfx AS (
              SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g,
                     t[i:i+15] AS pfx
              FROM (SELECT doc_id, t,
                           unnest(range(1, len(t) - 1)) AS i
                    FROM toks WHERE len(t) >= 3)),
            nb AS (
              SELECT doc_id, pfx,
                     lag(pfx) OVER w AS ppfx,
                     lag(doc_id) OVER w AS pdoc,
                     lead(pfx) OVER w AS npfx,
                     lead(doc_id) OVER w AS ndoc
              FROM sfx
              WINDOW w AS (PARTITION BY g ORDER BY pfx)),
            -- list_position returns 0 (not NULL) when absent, hence
            -- the explicit all-equal branch instead of coalesce
            peq AS (
              SELECT doc_id,
                     CASE WHEN pdoc IS NOT NULL AND pdoc <> doc_id THEN
                       list_position(list_transform(
                         range(1, least(len(pfx), len(ppfx)) + 1),
                         j -> pfx[j] = ppfx[j]), false)
                     END AS pp,
                     least(len(pfx), len(ppfx)) AS pl,
                     CASE WHEN ndoc IS NOT NULL AND ndoc <> doc_id THEN
                       list_position(list_transform(
                         range(1, least(len(pfx), len(npfx)) + 1),
                         j -> pfx[j] = npfx[j]), false)
                     END AS np,
                     least(len(pfx), len(npfx)) AS nl
              FROM nb),
            lcps AS (
              SELECT doc_id, greatest(
                CASE WHEN pp IS NULL THEN 0
                     WHEN pp = 0 THEN pl ELSE pp - 1 END,
                CASE WHEN np IS NULL THEN 0
                     WHEN np = 0 THEN nl ELSE np - 1 END) AS lcp
              FROM peq),
            pd AS (SELECT doc_id, max(lcp) AS m FROM lcps GROUP BY 1)
            SELECT d.doc_id,
                   (CASE WHEN coalesce(m, 0) >= 3 THEN coalesce(m, 0)
                         ELSE 0 END)::BIGINT AS max_dup_span
            FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
        """,
        # Agreement matrix over all four (now fully portable) pair
        # sources. The prefix set is pair-identical to the exact set
        # by construction (pytest-pinned on the Spark side), so the
        # oracle reuses the exact chain for both.
        "dedup_method_agreement": f"""
            WITH {_lsh_ctes()},
            {_simhash_ctes(include_base=False)},
            esh AS ({_SHINGLES}),
            esizes AS (SELECT doc_id, len(s) AS n FROM esh),
            eex AS (SELECT doc_id, unnest(s) AS g FROM esh),
            einter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     count(*) AS n_common
              FROM eex a JOIN eex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            jc AS MATERIALIZED (
              SELECT doc_a, doc_b FROM einter
              JOIN esizes sa ON sa.doc_id = doc_a
              JOIN esizes sb ON sb.doc_id = doc_b
              WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5),
            cnt AS (SELECT
              (SELECT count(*) FROM jc) AS c_j,
              (SELECT count(*) FROM lsh_pairs) AS c_m,
              (SELECT count(*) FROM sh_pairs) AS c_s,
              (SELECT count(*) FROM jc a JOIN lsh_pairs b
                 ON a.doc_a = b.doc_a AND a.doc_b = b.doc_b) AS jm,
              (SELECT count(*) FROM jc a JOIN sh_pairs b
                 ON a.doc_a = b.doc_a AND a.doc_b = b.doc_b) AS js,
              (SELECT count(*) FROM lsh_pairs a JOIN sh_pairs b
                 ON a.doc_a = b.doc_a AND a.doc_b = b.doc_b) AS ms)
            SELECT method_a, method_b, n_a::BIGINT AS n_a,
                   n_b::BIGINT AS n_b, n_common::BIGINT AS n_common,
                   CASE WHEN n_a + n_b - n_common > 0
                        THEN round(n_common / (n_a + n_b - n_common), 6)
                        ELSE 1.0 END AS pair_jaccard
            FROM (
              SELECT 'jaccard' AS method_a, 'minhash' AS method_b,
                     c_j AS n_a, c_m AS n_b, jm AS n_common FROM cnt
              UNION ALL
              SELECT 'jaccard', 'prefix', c_j, c_j, c_j FROM cnt
              UNION ALL
              SELECT 'jaccard', 'simhash', c_j, c_s, js FROM cnt
              UNION ALL
              SELECT 'minhash', 'prefix', c_m, c_j, jm FROM cnt
              UNION ALL
              SELECT 'minhash', 'simhash', c_m, c_s, ms FROM cnt
              UNION ALL
              SELECT 'prefix', 'simhash', c_j, c_s, js FROM cnt)
        """,
        "dedup_weighted_jaccard": r"""
            WITH sha AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(1, greatest(len(t) - 2, 1)),
                       i -> array_to_string(t[i:i+2], ' ')) AS s
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(text, '\s+'),
                                       x -> x <> '') AS t
                    FROM documents)),
            wc AS (
              SELECT doc_id, g, count(*) AS c
              FROM (SELECT doc_id, unnest(s) AS g FROM sha) q
              GROUP BY 1, 2),
            tot AS (SELECT doc_id, sum(c) AS n FROM wc GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     sum(least(a.c, b.c)) AS wmin
              FROM wc a JOIN wc b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(wmin / (ta.n + tb.n - wmin), 6) AS wjaccard
            FROM inter
            JOIN tot ta ON ta.doc_id = doc_a
            JOIN tot tb ON tb.doc_id = doc_b
            WHERE round(wmin / (ta.n + tb.n - wmin), 6) >= 0.5
        """,
        "semdedup": f"""
            WITH cents AS (
              SELECT vec_id AS cell, embedding AS cent FROM embeddings
              WHERE vec_id % 31 = 0 ORDER BY vec_id LIMIT 16),
            asg AS (
              SELECT vec_id, cell FROM (
                SELECT a.vec_id, c.cell,
                       row_number() OVER (
                         PARTITION BY a.vec_id
                         ORDER BY {_cos_expr("a.embedding", "c.cent", None)} DESC,
                                  c.cell) AS rk
                FROM embeddings a CROSS JOIN cents c) q
              WHERE rk = 1),
            m AS (
              SELECT ea.vec_id AS va, eb.vec_id AS vb, aa.cell,
                     {_cos_expr("ea.embedding", "eb.embedding")} AS cos
              FROM embeddings ea JOIN asg aa ON aa.vec_id = ea.vec_id
              JOIN asg ab ON ab.cell = aa.cell AND ab.vec_id > aa.vec_id
              JOIN embeddings eb ON eb.vec_id = ab.vec_id),
            mx AS (SELECT vb AS vec_id, max(cos) AS mp FROM m GROUP BY vb)
            SELECT a.vec_id, a.cell,
                   coalesce(mx.mp, -1e0) AS max_sim_prior,
                   CASE WHEN coalesce(mx.mp, -1e0) >= 5e-1 THEN 1 ELSE 0 END
                     AS is_dup
            FROM asg a LEFT JOIN mx ON mx.vec_id = a.vec_id
        """,
        "dedup_weighted_containment": r"""
            WITH sha AS (
              SELECT doc_id,
                     list_transform(
                       generate_series(1, greatest(len(t) - 2, 1)),
                       i -> array_to_string(t[i:i+2], ' ')) AS s
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(text, '\s+'),
                                       x -> x <> '') AS t
                    FROM documents)),
            wc AS (
              SELECT doc_id, g, count(*) AS c
              FROM (SELECT doc_id, unnest(s) AS g FROM sha) q
              GROUP BY 1, 2),
            tot AS (SELECT doc_id, sum(c) AS n FROM wc GROUP BY 1),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     sum(least(a.c, b.c)) AS wmin
              FROM wc a JOIN wc b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(wmin / least(ta.n, tb.n), 6) AS wcontainment
            FROM inter
            JOIN tot ta ON ta.doc_id = doc_a
            JOIN tot tb ON tb.doc_id = doc_b
            WHERE round(wmin / least(ta.n, tb.n), 6) >= 0.8
        """,
        "rank_quantiles": """
            WITH s AS (
              SELECT event_id, value
              FROM events
              ORDER BY (event_id * 2654435761) % 4294967296, event_id
              LIMIT 4096
            ), r AS (
              SELECT value, row_number() OVER (ORDER BY value, event_id) AS rk
              FROM s
            ), m AS (SELECT count(*) AS n_sample FROM s),
            qs AS (SELECT 5e-1 AS q UNION ALL SELECT 9e-1
                   UNION ALL SELECT 99e-2)
            SELECT q, n_sample, round(value, 6) AS est
            FROM qs CROSS JOIN m
            JOIN r ON r.rk = greatest(CAST(ceil(q * n_sample) AS BIGINT), 1)
        """,
        "rfm_segmentation": """
            WITH p AS (
              SELECT user_id, floor(epoch(ts))::BIGINT AS sec, value
              FROM events WHERE event_type = 'purchase'
            ), ref AS (SELECT max(sec) AS ref_sec FROM p),
            per_user AS (
              SELECT user_id,
                     min(ref_sec - sec)::BIGINT AS recency_s,
                     count(*)::BIGINT AS frequency,
                     round(sum(value), 4) AS monetary
              FROM p CROSS JOIN ref GROUP BY user_id
            ), cuts AS (
              SELECT round(quantile_cont(recency_s, 0.5), 6) AS med_r,
                     round(quantile_cont(frequency, 0.5), 6) AS med_f,
                     round(quantile_cont(monetary, 0.5), 6) AS med_m
              FROM per_user
            ), seg AS (
              SELECT (recency_s <= med_r)::BIGINT AS r_high,
                     (frequency >= med_f)::BIGINT AS f_high,
                     (monetary >= med_m)::BIGINT AS m_high,
                     monetary
              FROM per_user CROSS JOIN cuts
            )
            SELECT r_high, f_high, m_high, count(*)::BIGINT AS n_users,
                   round(avg(monetary), 4) AS avg_monetary
            FROM seg GROUP BY 1, 2, 3
        """,
        "wordcount": rf"""
            SELECT word, count(*) AS cnt
            FROM (SELECT unnest(string_split_regex(text, '{_TOK}')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY word
        """,
        "wordcount_topk": rf"""
            SELECT word, count(*) AS cnt
            FROM (SELECT unnest(string_split_regex(text, '{_TOK}')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY word
            ORDER BY cnt DESC, word LIMIT 25
        """,
        "inverted_index": rf"""
            SELECT word, count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
            FROM (SELECT doc_id, unnest(string_split_regex(text, '{_TOK}')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY word
        """,
        "kv_combine": rf"""
            SELECT word, count(*) AS cnt
            FROM (SELECT unnest(string_split_regex(text, '{_TOK}')) AS word
                  FROM documents)
            WHERE word <> '' GROUP BY word
        """,
        "kv_reduce": """
            SELECT user_id, round(sum(value), 4) AS sum_value,
                   count(*) AS n_events, max(value) AS max_value
            FROM events GROUP BY user_id
        """,
        "distinct_keys": "SELECT DISTINCT event_type FROM events",
        "histogram": """
            SELECT floor(value / 25.0)::BIGINT AS bin,
                   (floor(value / 25.0)::BIGINT * 25.0)::DOUBLE AS lo,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2
        """,
        "group_topk": """
            SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders)
            WHERE rk <= 3
        """,
        "bfs_levels": """
            WITH RECURSIVE edges AS (
              SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
              UNION
              SELECT DISTINCT l_partkey * 2 + 1 AS src, l_orderkey * 2 AS dst FROM lineitem
            ), bfs(node, lvl) AS (
              SELECT (SELECT min(l_orderkey) * 2 FROM lineitem), 0
              UNION
              SELECT e.dst, b.lvl + 1
              FROM bfs b JOIN edges e ON e.src = b.node
              WHERE b.lvl < 8
            )
            SELECT node, min(lvl) AS level FROM bfs GROUP BY node
        """,
        "octree_bin": """
            WITH binned AS (
              SELECT
                least(greatest(floor((l_quantity - 0.0) / 51.0 * 8), 0), 7)::BIGINT AS cx,
                least(greatest(floor((l_extendedprice - 0.0) / 110000.0 * 8), 0), 7)::BIGINT AS cy,
                least(greatest(floor((l_discount - 0.0) / 0.11 * 8), 0), 7)::BIGINT AS cz
              FROM lineitem)
            SELECT cx * 64 + cy * 8 + cz AS cell_id, cx, cy, cz, count(*) AS cnt
            FROM binned GROUP BY cx, cy, cz
        """,
        "octree_adaptive": """
            WITH cells AS (
              SELECT d,
                least(greatest(floor(l_quantity / 51.0 * (1 << d)), 0),
                      (1 << d) - 1)::BIGINT AS cx,
                least(greatest(floor(l_extendedprice / 110000.0 * (1 << d)), 0),
                      (1 << d) - 1)::BIGINT AS cy,
                least(greatest(floor(l_discount / 0.11 * (1 << d)), 0),
                      (1 << d) - 1)::BIGINT AS cz
              FROM lineitem
              CROSS JOIN (SELECT unnest(generate_series(1, 5)) AS d)),
            counts AS (
              SELECT d, cx, cy, cz, count(*) AS cnt
              FROM cells GROUP BY 1, 2, 3, 4),
            leaves AS (
              SELECT * FROM counts WHERE cnt <= 1000 OR d = 5)
            SELECT l.d AS depth, l.cx, l.cy, l.cz, l.cnt
            FROM leaves l
            WHERE NOT EXISTS (
              SELECT 1 FROM leaves p
              WHERE p.d < l.d
                AND (l.cx >> ((l.d - p.d)::INT)) = p.cx
                AND (l.cy >> ((l.d - p.d)::INT)) = p.cy
                AND (l.cz >> ((l.d - p.d)::INT)) = p.cz)
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                   o_orderdate
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
              AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
        "q5_nation_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name
        """,
        "q6_forecast_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM customer, orders, lineitem, nation
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
              AND l_returnflag = 'R' AND c_nationkey = n_nationkey
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey LIMIT 20
        """,
        "sessionize": """
            WITH flagged AS (
              SELECT user_id, ts, event_id, value,
                     CASE WHEN lag(ts) OVER w IS NULL THEN 0
                          WHEN date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1
                          ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
              SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
              FROM flagged)
            SELECT user_id, session_id, count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end,
                   round(sum(value), 4) AS session_value
            FROM sess GROUP BY user_id, session_id
        """,
        "event_windows": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n_events, round(sum(value), 4) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "tfidf": r"""
            WITH w AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS word
                       FROM documents),
            tf AS (SELECT doc_id, word, count(*) AS tf
                   FROM w WHERE word <> '' GROUP BY 1, 2),
            df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
            n AS (SELECT count(*) AS n_docs FROM documents)
            SELECT tf.doc_id, tf.word, tf.tf,
                   round(tf.tf * ln((n.n_docs + 1) / (df.df + 1)), 6) AS tfidf
            FROM tf JOIN df USING (word), n
        """,
        "ngram_counts": r"""
            WITH t AS (SELECT list_filter(string_split_regex(text, '\s+'),
                                          x -> x <> '') AS toks
                       FROM documents),
            g AS (SELECT unnest(list_transform(
                           generate_series(1, len(toks) - 1),
                           i -> array_to_string(toks[i:i+1], ' '))) AS gram
                  FROM t WHERE len(toks) >= 2)
            SELECT gram, count(*) AS cnt FROM g GROUP BY gram
        """,
        "json_extract_agg": """
            -- DuckDB sum(BIGINT) returns HUGEINT, which fetchdf
            -- materializes as float64 ("99111.0") while Spark's
            -- sum(long) stays BIGINT ("99111") — the round-1 hash FAIL
            -- was this representation drift, not a value bug. The outer
            -- ::BIGINT pins the width to match Spark.
            SELECT event_type,
                   sum(CAST(props->>'$.k' AS BIGINT))::BIGINT AS sum_k,
                   max(CAST(props->>'$.k' AS BIGINT)) AS max_k,
                   count(CASE WHEN props->>'$.k' IS NULL THEN 1 END) AS n_null_k
            FROM events GROUP BY event_type
        """,
        "window_suite": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING), 4) AS running_value,
                   round(value - coalesce(lag(value) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id), 0.0), 4) AS delta,
                   row_number() OVER (PARTITION BY user_id
                         ORDER BY value DESC, event_id) AS value_rank
            FROM events
        """,
        "asof_join": """
            WITH c AS (SELECT user_id, ts, max(value) AS click_value
                       FROM events WHERE event_type = 'click' GROUP BY 1, 2),
            p AS (SELECT user_id, ts, event_id
                  FROM events WHERE event_type = 'purchase')
            SELECT p.event_id, p.user_id, c.click_value AS last_click_value
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "salted_agg": """
            SELECT event_type, round(sum(value), 4) AS total_value,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "embedding_centroids": """
            SELECT label, i::BIGINT AS pos,
                   round(avg(embedding[i]::DOUBLE), 6) AS mean_x
            FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g
            GROUP BY label, i
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            GROUP BY o_orderpriority
        """,
        "q14_promo_revenue": """
            SELECT round(
                     sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END) * 100.0
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-05-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-06-01 00:00:00'
        """,
        "q18_large_orders": """
            WITH big AS (
              SELECT l_orderkey, round(sum(l_quantity), 4) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING round(sum(l_quantity), 4) > 150.0)
            SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
            FROM big JOIN orders ON l_orderkey = o_orderkey
                     JOIN customer ON o_custkey = c_custkey
        """,
        "q19_bracketed_revenue": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 15)
               OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 10 AND 25)
               OR (p_brand = 'Brand#20' AND p_size BETWEEN 20 AND 50
                   AND l_quantity BETWEEN 20 AND 35)
        """,
        "semi_anti_join": """
            SELECT c_custkey, 'with_orders' AS bucket FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            UNION ALL
            SELECT c_custkey, 'no_orders' AS bucket FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "rollup_revenue": """
            SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                   coalesce(l_linestatus, 'ALL') AS linestatus,
                   round(sum(l_extendedprice), 4) AS total_price,
                   count(*) AS n
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "pivot_status_priority": """
            SELECT o_orderpriority,
                   count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
                   count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
                   count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
            FROM orders GROUP BY o_orderpriority
        """,
        "median_order_value": """
            SELECT o_orderpriority,
                   round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
                   round(quantile_cont(o_totalprice, 0.9), 4) AS p90
            FROM orders GROUP BY o_orderpriority
        """,
        "secondary_sort": """
            SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber
            FROM lineitem
            ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
            LIMIT 100
        """,
        "pii_scrub": _PII_ORACLE,
        "repetition_ratio": r"""
            WITH w AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS word
                       FROM documents),
            pw AS (SELECT doc_id, word, count(*) AS c
                   FROM w WHERE word <> '' GROUP BY 1, 2)
            SELECT doc_id, round(max(c) / sum(c), 6) AS rep_ratio,
                   sum(c)::BIGINT AS n_tokens
            FROM pw GROUP BY doc_id
        """,
        "text_normalize": r"""
            WITH n AS (
              SELECT doc_id,
                     trim(regexp_replace(
                       regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                       ' +', ' ', 'g')) AS norm
              FROM documents)
            SELECT doc_id, length(norm)::BIGINT AS norm_len,
                   substr(norm, 1, 32) AS norm_prefix
            FROM n
        """,
        "q7_volume_shipping": """
            SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
            FROM (
              SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     year(l_shipdate) AS l_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM supplier, lineitem, orders, customer, nation n1, nation n2
              WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
                AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
                AND c_nationkey = n2.n_nationkey
                AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                  OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                   AND TIMESTAMP '1997-12-31 00:00:00')
            GROUP BY supp_nation, cust_nation, l_year
        """,
        "q8_market_share": """
            SELECT o_year,
                   round(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                         / sum(volume), 6) AS mkt_share
            FROM (
              SELECT year(o_orderdate) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS nation
              FROM part, lineitem, orders, customer, supplier,
                   nation n1, region, nation n2
              WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
                AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
                AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
                AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
                AND p_type = 'PROMO'
                AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                    AND TIMESTAMP '1997-12-31 00:00:00')
            GROUP BY o_year
        """,
        "q9_profit_by_nation_year": """
            SELECT nation, o_year, round(sum(volume), 4) AS sum_profit
            FROM (
              SELECT n_name AS nation, year(o_orderdate) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM part, lineitem, supplier, orders, nation
              WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
                AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
                AND p_name LIKE '%widget%')
            GROUP BY nation, o_year
        """,
        "q13_order_count_distribution": """
            SELECT c_count, count(*) AS custdist
            FROM (SELECT c.c_custkey, count(o_orderkey) AS c_count
                  FROM customer c LEFT JOIN orders o
                    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
                  GROUP BY c.c_custkey)
            GROUP BY c_count
        """,
        "q15_top_supplier": """
            WITH rev AS (
              SELECT l_suppkey AS supplier_no,
                     round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
              GROUP BY l_suppkey)
            SELECT s_suppkey, s_name, total_revenue
            FROM supplier, rev
            WHERE s_suppkey = supplier_no
              AND total_revenue = (SELECT max(total_revenue) FROM rev)
        """,
        "q16_supplier_part_variety": """
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM part, lineitem
            WHERE p_partkey = l_partkey AND p_brand <> 'Brand#5'
              AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
            GROUP BY p_brand, p_type, p_size
        """,
        "q17_small_qty_revenue": """
            SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
            FROM lineitem, part
            WHERE p_partkey = l_partkey AND p_brand = 'Brand#3'
              AND p_type = 'SMALL'
              AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                                FROM lineitem l2
                                WHERE l2.l_partkey = p_partkey)
        """,
        "q22_dormant_customers": """
            SELECT n_name, count(*) AS numcust,
                   round(sum(c_acctbal), 4) AS totacctbal
            FROM customer, nation
            WHERE c_nationkey = n_nationkey
              AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                               WHERE c_acctbal > 0)
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
            GROUP BY n_name
        """,
        "q12_ship_delay": """
            SELECT o_orderpriority,
                   sum(CASE WHEN d <= 30 THEN 1 ELSE 0 END)::BIGINT AS fast_cnt,
                   sum(CASE WHEN d > 30 AND d <= 90 THEN 1 ELSE 0 END)::BIGINT AS mid_cnt,
                   sum(CASE WHEN d > 90 THEN 1 ELSE 0 END)::BIGINT AS slow_cnt
            FROM (SELECT o_orderpriority,
                         date_diff('day', o_orderdate, l_shipdate) AS d
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
            GROUP BY o_orderpriority
        """,
        "top_ngrams_per_lang": r"""
            WITH t AS (
              SELECT lang,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM documents),
            bg AS (
              SELECT lang,
                     unnest(list_transform(
                       generate_series(1, greatest(len(toks) - 1, 0)),
                       i -> toks[i] || ' ' || toks[i + 1])) AS bigram
              FROM t),
            counts AS (
              SELECT lang, bigram, count(*) AS cnt
              FROM bg GROUP BY 1, 2)
            SELECT lang, bigram, cnt, rank FROM (
              SELECT lang, bigram, cnt,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY cnt DESC, bigram) AS rank
              FROM counts)
            WHERE rank <= 5
        """,
        "sample_stratified": """
            SELECT doc_id, lang FROM documents
            WHERE (doc_id * 2654435761) % 4294967296 % 100
                  < CASE WHEN lang = 'en' THEN 10 ELSE 30 END
        """,
        "corpus_clean_pipeline": r"""
            WITH surv AS (
              SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY text
                                          ORDER BY doc_id) AS rn
                FROM documents) WHERE rn = 1),
            w AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS word
                  FROM documents),
            pw AS (SELECT doc_id, word, count(*) AS c
                   FROM w WHERE word <> '' GROUP BY 1, 2),
            stats AS (SELECT doc_id, round(max(c) / sum(c), 6) AS rep_ratio,
                             sum(c)::BIGINT AS n_tokens
                      FROM pw GROUP BY doc_id)
            SELECT s.doc_id, s.lang, st.n_tokens
            FROM surv s JOIN stats st ON st.doc_id = s.doc_id
            WHERE st.rep_ratio <= 0.12 AND st.n_tokens BETWEEN 20 AND 10000
        """,
        "cube_revenue": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "grouping_sets_revenue": """
            SELECT o_orderpriority, o_orderstatus,
                   round(sum(o_totalprice), 4) AS total_price,
                   count(*) AS n_orders
            FROM orders
            GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """,
        "moving_avg_revenue": """
            WITH daily AS (
              SELECT date_trunc('day', l_shipdate) AS day,
                     round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
              FROM lineitem GROUP BY 1)
            SELECT day, revenue,
                   round(avg(revenue) OVER (
                     ORDER BY day
                     RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 4)
                   AS ma7
            FROM daily
        """,
        "bpe_pair_counts": r"""
            SELECT pair, count(*) AS cnt
            FROM (SELECT unnest(list_transform(
                           generate_series(1, length(word) - 1),
                           i -> word[i:i+1])) AS pair
                  FROM (SELECT unnest(list_filter(
                                 string_split_regex(text, '\s+'),
                                 x -> x <> '')) AS word
                        FROM documents))
            GROUP BY pair
        """,
        "dedup_clusters": f"""
            {_CLUSTER_CTES}
            SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
        """,
        "dedup_clusters_star": f"""
            {_CLUSTER_CTES}
            SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
        """,
        "dedup_survivors": f"""
            {_CLUSTER_CTES},
            comp AS (SELECT a AS doc_id, min(b) AS cluster_id
                     FROM reach GROUP BY a)
            SELECT cluster_id, survivor_doc_id, n_members FROM (
              SELECT c.cluster_id, d.doc_id AS survivor_doc_id,
                     row_number() OVER (PARTITION BY c.cluster_id
                                        ORDER BY d.n_chars DESC, d.doc_id) AS rn,
                     count(*) OVER (PARTITION BY c.cluster_id) AS n_members
              FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
            WHERE rn = 1
        """,
        "frame_sample": """
            SELECT doc_id, frame_idx
            FROM (SELECT doc_id,
                         unnest(generate_series(0,
                             (octet_length(encode(text)) // 100)::BIGINT)) AS frame_idx
                  FROM documents)
            WHERE frame_idx % 10 = 0
        """,
        "interval_join": """
            SELECT p.event_id, p.user_id,
                   count(c.ts) AS n_recent_clicks,
                   round(coalesce(sum(c.value), 0), 4) AS recent_click_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT user_id, ts, value FROM events
                       WHERE event_type = 'click') c
              ON c.user_id = p.user_id AND c.ts < p.ts
             AND c.ts >= p.ts - INTERVAL 30 MINUTE
            GROUP BY p.event_id, p.user_id
        """,
        "dedup_exact": """
            SELECT doc_id, n_dups FROM (
              SELECT doc_id,
                     row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn,
                     count(*) OVER (PARTITION BY text) AS n_dups
              FROM documents)
            WHERE rn = 1
        """,
        "dedup_ngram_jaccard": f"""
            WITH sh AS ({_SHINGLES}),
            sizes AS (SELECT doc_id, len(s) AS n FROM sh),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5
        """,
        "lsh_tuning_curve": f"""
            WITH sh AS ({_SHINGLES}),
            sizes AS (SELECT doc_id, len(s) AS n FROM sh),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            pairs AS (
              SELECT round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
              FROM inter
              JOIN sizes sa ON sa.doc_id = doc_a
              JOIN sizes sb ON sb.doc_id = doc_b
              WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5),
            conf(n_bands, rows_per_band) AS (
              VALUES (8::BIGINT, 16::BIGINT), (16, 8), (32, 4), (64, 2))
            SELECT n_bands, rows_per_band,
                   count(*)::BIGINT AS n_pairs,
                   round(avg(1.0 - pow(1.0 - pow(jaccard, rows_per_band),
                                       n_bands)), 6) AS expected_recall,
                   round(pow(1.0 / n_bands, 1.0 / rows_per_band), 6)
                     AS s_curve_threshold
            FROM pairs CROSS JOIN conf
            GROUP BY n_bands, rows_per_band
        """,
        # identical output contract to dedup_ngram_jaccard — the prefix
        # filter only changes the PLAN, never the pair set.
        "dedup_jaccard_prefix": f"""
            WITH sh AS ({_SHINGLES}),
            sizes AS (SELECT doc_id, len(s) AS n FROM sh),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5
        """,
        "window_funnel": """
            WITH s1 AS (
              SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY 1
            ), s2 AS (
              SELECT e.user_id, min(e.ts) AS t2
              FROM events e JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = 'click' AND e.ts > s1.t1
                AND e.ts <= s1.t1 + INTERVAL 1 HOUR
              GROUP BY 1
            ), s3 AS (
              SELECT e.user_id, min(e.ts) AS t3
              FROM events e
              JOIN s2 ON e.user_id = s2.user_id
              JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                AND e.ts <= s1.t1 + INTERVAL 1 HOUR
              GROUP BY 1
            ), u AS (SELECT DISTINCT user_id FROM events)
            SELECT (CASE WHEN t3 IS NOT NULL THEN 3
                         WHEN t2 IS NOT NULL THEN 2
                         WHEN t1 IS NOT NULL THEN 1
                         ELSE 0 END)::BIGINT AS n_steps,
                   count(*)::BIGINT AS n_users
            FROM u LEFT JOIN s1 USING (user_id)
                   LEFT JOIN s2 USING (user_id)
                   LEFT JOIN s3 USING (user_id)
            GROUP BY 1
        """,
        "ccnet_ppl_buckets": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS w
              FROM documents
            ), dw AS (
              SELECT doc_id, w, count(*)::BIGINT AS c_dw
              FROM tok GROUP BY 1, 2
            ), lm AS (
              SELECT w, count(*)::BIGINT AS c_w FROM tok GROUP BY 1
            ), tot AS (
              SELECT SUM(c_w)::DOUBLE AS total FROM lm
            ), ce AS (
              SELECT doc_id,
                     ROUND(-SUM(c_dw * LN(c_w / total)) / SUM(c_dw), 6)
                       AS cross_entropy
              FROM dw JOIN lm USING (w) CROSS JOIN tot
              GROUP BY doc_id
            ), scored AS (
              SELECT d.doc_id, d.lang, ce.cross_entropy
              FROM ce JOIN documents d ON d.doc_id = ce.doc_id
            ), cuts AS (
              SELECT lang,
                     round(quantile_cont(cross_entropy, 0.33), 6) AS p33,
                     round(quantile_cont(cross_entropy, 0.67), 6) AS p67
              FROM scored GROUP BY lang
            )
            SELECT s.doc_id, s.lang, s.cross_entropy,
                   CASE WHEN s.cross_entropy <= c.p33 THEN 'head'
                        WHEN s.cross_entropy <= c.p67 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM scored s JOIN cuts c ON c.lang = s.lang
        """,
        # Batched phrase search: one token pass, three phrase chains.
        "phrase_search_batch": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents),
            m AS (
              SELECT 0 AS phrase_id, doc_id,
                     list_sum(list_transform(range(1, len(t)),
                       i -> CASE WHEN t[i] = 'hash' AND t[i+1] = 'join'
                            THEN 1 ELSE 0 END)) AS n_matches
              FROM t
              UNION ALL
              SELECT 1, doc_id,
                     list_sum(list_transform(range(1, len(t)),
                       i -> CASE WHEN t[i] = 'merge' AND t[i+1] = 'sort'
                            THEN 1 ELSE 0 END))
              FROM t
              UNION ALL
              SELECT 2, doc_id,
                     list_sum(list_transform(range(1, len(t) - 1),
                       i -> CASE WHEN t[i] = 'big' AND t[i+1] = 'table'
                                  AND t[i+2] = 'scan'
                            THEN 1 ELSE 0 END))
              FROM t)
            SELECT phrase_id::BIGINT AS phrase_id, doc_id,
                   n_matches::BIGINT AS n_matches
            FROM m WHERE n_matches > 0
        """,
        # Exact consecutive-phrase search: positional zip over the
        # token list, same Java-\s tokenization as the Spark side.
        "phrase_search": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents)
            SELECT doc_id,
                   list_sum(list_transform(range(1, len(t)),
                     i -> CASE WHEN t[i] = 'hash' AND t[i+1] = 'join'
                          THEN 1 ELSE 0 END))::BIGINT AS n_matches
            FROM t
            WHERE list_sum(list_transform(range(1, len(t)),
                     i -> CASE WHEN t[i] = 'hash' AND t[i+1] = 'join'
                          THEN 1 ELSE 0 END)) > 0
        """,
        # Batched two-stage retrieval: batched-BM25 pool (rank <= 50
        # per query) -> per-query cosine re-rank against vec_id =
        # query_id, qid-partitioned rank window.
        "hybrid_retrieval_batch": r"""
            WITH q(query_id, w) AS (VALUES
              (0, 'spark'), (0, 'join'), (0, 'window'),
              (1, 'hash'), (1, 'merge'), (1, 'sort'),
              (2, 'stream'), (2, 'state'), (2, 'batch')
            ), tok AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS w
              FROM documents
            ), dl AS (
              SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1
            ), stats AS (
              SELECT count(*)::BIGINT AS n_docs, round(avg(dl), 6) AS avgdl
              FROM dl
            ), tf AS (
              SELECT doc_id, w, count(*)::BIGINT AS tf
              FROM tok WHERE w IN (SELECT DISTINCT w FROM q) GROUP BY 1, 2
            ), dft AS (
              SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY 1
            ), scored AS (
              SELECT q.query_id, tf.doc_id,
                     round(SUM(
                       LN((n_docs - df + 0.5) / (df + 0.5) + 1)
                       * tf * (1.2 + 1)
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                     ), 6) AS score
              FROM tf JOIN q USING (w)
              JOIN dft ON dft.w = tf.w
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats
              GROUP BY q.query_id, tf.doc_id
            ), pool AS (
              SELECT query_id, doc_id, bm25_rank FROM (
                SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                         ORDER BY score DESC, doc_id)::BIGINT AS bm25_rank
                FROM scored)
              WHERE bm25_rank <= 50
            ), rescored AS (
              SELECT p.query_id, p.doc_id, p.bm25_rank,
                     round(
                       list_sum(list_transform(generate_series(1, 64),
                         i -> e.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE))
                       / (sqrt(list_sum(list_transform(generate_series(1, 64),
                            i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
                          * sqrt(list_sum(list_transform(generate_series(1, 64),
                            i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE)))),
                       6) AS cos
              FROM pool p
              JOIN embeddings e ON e.vec_id = p.doc_id
              JOIN embeddings qe ON qe.vec_id = p.query_id
            )
            SELECT query_id::BIGINT AS query_id, doc_id, bm25_rank, cos, rank
            FROM (
              SELECT query_id, doc_id, bm25_rank, cos,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, doc_id)::BIGINT AS rank
              FROM rescored)
            WHERE rank <= 10
        """,
        # Batched BM25: three queries, one corpus pass; same scoring
        # formula as bm25_topk, qid-partitioned rank window.
        "bm25_topk_batch": r"""
            WITH q(query_id, w) AS (VALUES
              (0, 'spark'), (0, 'join'), (0, 'window'),
              (1, 'hash'), (1, 'merge'), (1, 'sort'),
              (2, 'stream'), (2, 'state'), (2, 'batch')
            ), tok AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS w
              FROM documents
            ), dl AS (
              SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1
            ), stats AS (
              SELECT count(*)::BIGINT AS n_docs, round(avg(dl), 6) AS avgdl
              FROM dl
            ), tf AS (
              SELECT doc_id, w, count(*)::BIGINT AS tf
              FROM tok WHERE w IN (SELECT DISTINCT w FROM q) GROUP BY 1, 2
            ), dft AS (
              SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY 1
            ), scored AS (
              SELECT q.query_id, tf.doc_id,
                     round(SUM(
                       LN((n_docs - df + 0.5) / (df + 0.5) + 1)
                       * tf * (1.2 + 1)
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                     ), 6) AS score
              FROM tf JOIN q USING (w)
              JOIN dft ON dft.w = tf.w
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats
              GROUP BY q.query_id, tf.doc_id
            )
            SELECT query_id::BIGINT AS query_id, doc_id, score, rank FROM (
              SELECT query_id, doc_id, score,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, doc_id)::BIGINT AS rank
              FROM scored)
            WHERE rank <= 20
        """,
        # RRF: both first-stage rankings replicated (the bm25_topk and
        # vector-cosine oracles verbatim), fused by ranks only; absent
        # ranks are 0 (NULL hashes engine-dependently).
        "hybrid_rrf": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS w
              FROM documents
            ), dl AS (
              SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1
            ), stats AS (
              SELECT count(*)::BIGINT AS n_docs, round(avg(dl), 6) AS avgdl
              FROM dl
            ), tf AS (
              SELECT doc_id, w, count(*)::BIGINT AS tf
              FROM tok WHERE w IN ('spark', 'join', 'window') GROUP BY 1, 2
            ), dft AS (
              SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY 1
            ), scored AS (
              SELECT tf.doc_id,
                     round(SUM(
                       LN((n_docs - df + 0.5) / (df + 0.5) + 1)
                       * tf * (1.2 + 1)
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                     ), 6) AS score
              FROM tf JOIN dft USING (w)
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats
              GROUP BY tf.doc_id
            ), lex AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT
                       AS bm25_rank
              FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT 50)
            ), qv AS (
              SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
            ), vscore AS (
              SELECT e.vec_id AS doc_id,
                     round(
                       list_sum(list_transform(generate_series(1, 64),
                         i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE))
                       / (sqrt(list_sum(list_transform(generate_series(1, 64),
                            i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
                          * sqrt(list_sum(list_transform(generate_series(1, 64),
                            i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE)))), 6)
                       AS cos
              FROM embeddings e CROSS JOIN qv q
              WHERE e.vec_id <> 0
            ), vec AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY cos DESC, doc_id)::BIGINT
                       AS vec_rank
              FROM (SELECT * FROM vscore ORDER BY cos DESC, doc_id LIMIT 50)
            ), fused AS (
              SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
                     coalesce(l.bm25_rank, 0)::BIGINT AS bm25_rank,
                     coalesce(v.vec_rank, 0)::BIGINT AS vec_rank,
                     round(
                       coalesce(1.0 / (60 + l.bm25_rank), 0)
                       + coalesce(1.0 / (60 + v.vec_rank), 0), 6) AS rrf
              FROM lex l FULL JOIN vec v USING (doc_id)
            )
            SELECT doc_id, bm25_rank, vec_rank, rrf,
                   row_number() OVER (ORDER BY rrf DESC, doc_id)::BIGINT
                     AS rank
            FROM (SELECT * FROM fused ORDER BY rrf DESC, doc_id LIMIT 10)
        """,
        "bm25_topk": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS w
              FROM documents
            ), dl AS (
              SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1
            ), stats AS (
              SELECT count(*)::BIGINT AS n_docs, round(avg(dl), 6) AS avgdl
              FROM dl
            ), tf AS (
              SELECT doc_id, w, count(*)::BIGINT AS tf
              FROM tok WHERE w IN ('spark', 'join', 'window') GROUP BY 1, 2
            ), dft AS (
              SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY 1
            ), scored AS (
              SELECT tf.doc_id,
                     round(SUM(
                       LN((n_docs - df + 0.5) / (df + 0.5) + 1)
                       * tf * (1.2 + 1)
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                     ), 6) AS score
              FROM tf JOIN dft USING (w)
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats
              GROUP BY tf.doc_id
            )
            SELECT doc_id, score,
                   row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT
                     AS rank
            FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT 20)
        """,
        "hybrid_retrieval": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS w
              FROM documents
            ), dl AS (
              SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1
            ), stats AS (
              SELECT count(*)::BIGINT AS n_docs, round(avg(dl), 6) AS avgdl
              FROM dl
            ), tf AS (
              SELECT doc_id, w, count(*)::BIGINT AS tf
              FROM tok WHERE w IN ('spark', 'join', 'window') GROUP BY 1, 2
            ), dft AS (
              SELECT w, count(*)::BIGINT AS df FROM tf GROUP BY 1
            ), scored AS (
              SELECT tf.doc_id,
                     round(SUM(
                       LN((n_docs - df + 0.5) / (df + 0.5) + 1)
                       * tf * (1.2 + 1)
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                     ), 6) AS score
              FROM tf JOIN dft USING (w)
              JOIN dl ON dl.doc_id = tf.doc_id
              CROSS JOIN stats
              GROUP BY tf.doc_id
            ), pool AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT
                       AS bm25_rank
              FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT 50)
            ), qv AS (
              SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
            ), rescored AS (
              SELECT p.doc_id, p.bm25_rank,
                     round(
                       list_sum(list_transform(generate_series(1, 64),
                         i -> e.embedding[i]::DOUBLE * q.qe[i]::DOUBLE))
                       / (sqrt(list_sum(list_transform(generate_series(1, 64),
                            i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
                          * sqrt(list_sum(list_transform(generate_series(1, 64),
                            i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE)))), 6)
                       AS cos
              FROM pool p
              JOIN embeddings e ON e.vec_id = p.doc_id
              CROSS JOIN qv q
            )
            SELECT doc_id, bm25_rank, cos,
                   row_number() OVER (ORDER BY cos DESC, doc_id)::BIGINT AS rank
            FROM (SELECT * FROM rescored ORDER BY cos DESC, doc_id LIMIT 10)
        """,
        "train_val_test_split": r"""
            SELECT lang, split, count(*)::BIGINT AS n_docs,
                   sum(n_toks)::BIGINT AS n_tokens
            FROM (
              SELECT lang,
                     CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 5
                            THEN 'test'
                          WHEN (doc_id * 2654435761) % 4294967296 % 100 < 10
                            THEN 'val'
                          ELSE 'train' END AS split,
                     len(list_filter(string_split_regex(text, '\s+'),
                         x -> x <> ''))::BIGINT AS n_toks
              FROM documents)
            GROUP BY lang, split
        """,
        "sample_reservoir": """
            SELECT doc_id, lang, rk FROM (
              SELECT doc_id, lang,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
                     )::BIGINT AS rk
              FROM documents)
            WHERE rk <= 16
        """,
        "clustering_coefficient": """
            WITH po AS (
              SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            ), e AS (
              SELECT DISTINCT a.p AS u, b.p AS v
              FROM po a JOIN po b ON a.o = b.o AND a.p < b.p
            ), tri AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM e e1
              JOIN e e2 ON e1.v = e2.u
              JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v
            ), tn AS (
              SELECT a AS n FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri
            ), tcount AS (
              SELECT n, count(*)::BIGINT AS n_tri FROM tn GROUP BY 1
            ), deg AS (
              SELECT n, count(*)::BIGINT AS degree
              FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
              GROUP BY 1
            )
            SELECT deg.n AS node, degree,
                   coalesce(n_tri, 0)::BIGINT AS n_triangles,
                   -- e-notation literals: Spark SQL parses 2.0 as
                   -- DECIMAL (DuckDB as DOUBLE); 2e0 is DOUBLE in both
                   CASE WHEN degree >= 2
                        THEN round(2e0 * coalesce(n_tri, 0)
                                   / (degree * (degree - 1e0)), 6)
                        ELSE 0e0 END AS lcc
            FROM deg LEFT JOIN tcount ON tcount.n = deg.n
        """,
        "dedup_embedding": f"""
            SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS_PAIR} AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE {_COS_PAIR} >= 0.45
        """,
        "ann_bruteforce_topk": f"""
            WITH scored AS (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS_PAIR} AS cos
              FROM (SELECT * FROM embeddings WHERE vec_id < 10) a
              JOIN embeddings b ON a.vec_id <> b.vec_id)
            SELECT query_id, neighbor_id, cos, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY cos DESC, neighbor_id) AS rank
              FROM scored)
            WHERE rank <= 5
        """,
        # char-trigram naive Bayes (round 12): replicate the model fold
        # literally — labeled slice ∪ LANG_SEED, top-200 trigrams per
        # lang, vocab union, Laplace micro-nat weights, argmax.
        # same model chain as lang_id; finisher keeps top-2 per doc
        "lang_id_confidence": f"""
            WITH seed(lang, text) AS (VALUES {_LANG_SEED_VALUES}),
            train AS (
              SELECT lang, text FROM documents WHERE doc_id % 10 < 3
              UNION ALL SELECT lang, text FROM seed),
            tg AS (
              SELECT lang, substring(text, CAST(i AS INT), 3) AS tg
              FROM train, unnest(range(1, length(text) - 1)) AS u(i)
              WHERE length(text) >= 3),
            counts AS (SELECT lang, tg, count(*)::BIGINT AS c FROM tg GROUP BY 1, 2),
            top AS (
              SELECT lang, tg, c FROM counts
              QUALIFY row_number() OVER (PARTITION BY lang ORDER BY c DESC, tg) <= 200),
            vocab AS (SELECT DISTINCT tg FROM top),
            langs AS (SELECT DISTINCT lang FROM counts),
            cells AS (
              SELECT l.lang, v.tg, coalesce(c.c, 0) AS c
              FROM langs l CROSS JOIN vocab v
              LEFT JOIN counts c ON c.lang = l.lang AND c.tg = v.tg),
            model AS (
              SELECT lang, tg,
                     CAST(round(1e6 * ln((c + 1)::DOUBLE /
                          (sum(c) OVER (PARTITION BY lang)
                           + count(*) OVER (PARTITION BY lang))::DOUBLE)) AS BIGINT) AS w
              FROM cells),
            doc_tg AS (
              SELECT doc_id, substring(text, CAST(i AS INT), 3) AS tg
              FROM documents, unnest(range(1, length(text) - 1)) AS u(i)
              WHERE length(text) >= 3),
            scores AS (
              SELECT d.doc_id, m.lang, sum(m.w)::BIGINT AS score
              FROM doc_tg d JOIN model m USING (tg) GROUP BY 1, 2),
            ranked AS (
              SELECT doc_id, lang, score,
                     lead(score) OVER w AS next_score,
                     lead(lang) OVER w AS next_lang,
                     row_number() OVER w AS rk
              FROM scores
              WINDOW w AS (PARTITION BY doc_id ORDER BY score DESC, lang))
            SELECT doc_id, lang AS pred_lang, next_lang AS second_lang,
                   (score - next_score)::BIGINT AS margin_micro
            FROM ranked WHERE rk = 1
        """,
        "lang_id": f"""
            WITH seed(lang, text) AS (VALUES {_LANG_SEED_VALUES}),
            train AS (
              SELECT lang, text FROM documents WHERE doc_id % 10 < 3
              UNION ALL SELECT lang, text FROM seed),
            tg AS (
              SELECT lang, substring(text, CAST(i AS INT), 3) AS tg
              FROM train, unnest(range(1, length(text) - 1)) AS u(i)
              WHERE length(text) >= 3),
            counts AS (SELECT lang, tg, count(*)::BIGINT AS c FROM tg GROUP BY 1, 2),
            top AS (
              SELECT lang, tg, c FROM counts
              QUALIFY row_number() OVER (PARTITION BY lang ORDER BY c DESC, tg) <= 200),
            vocab AS (SELECT DISTINCT tg FROM top),
            langs AS (SELECT DISTINCT lang FROM counts),
            cells AS (
              SELECT l.lang, v.tg, coalesce(c.c, 0) AS c
              FROM langs l CROSS JOIN vocab v
              LEFT JOIN counts c ON c.lang = l.lang AND c.tg = v.tg),
            model AS (
              SELECT lang, tg,
                     CAST(round(1e6 * ln((c + 1)::DOUBLE /
                          (sum(c) OVER (PARTITION BY lang)
                           + count(*) OVER (PARTITION BY lang))::DOUBLE)) AS BIGINT) AS w
              FROM cells),
            doc_tg AS (
              SELECT doc_id, substring(text, CAST(i AS INT), 3) AS tg
              FROM documents, unnest(range(1, length(text) - 1)) AS u(i)
              WHERE length(text) >= 3),
            scores AS (
              SELECT d.doc_id, m.lang, sum(m.w)::BIGINT AS score
              FROM doc_tg d JOIN model m USING (tg) GROUP BY 1, 2),
            best AS (
              SELECT doc_id, lang AS pred FROM scores
              QUALIFY row_number() OVER (PARTITION BY doc_id
                       ORDER BY score DESC, lang) = 1)
            SELECT d.doc_id,
                   coalesce(b.pred, 'und') AS pred_lang,
                   (coalesce(b.pred, '') = d.lang)::BIGINT AS is_correct
            FROM documents d LEFT JOIN best b USING (doc_id)
        """,
        "quality_score": r"""
            WITH t AS (
              SELECT doc_id, text,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
                     length(text) AS n_chars,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars
              FROM documents),
            m AS (
              SELECT doc_id,
                     len(toks)::BIGINT AS n_tokens,
                     alpha_chars / n_chars AS alpha_ratio,
                     len(list_filter(toks,
                         x -> x IN ('the','a','of','and','to','in','is','it'))) / len(toks) AS stop_ratio,
                     n_chars / len(toks) AS mean_tok_len,
                     CASE WHEN n_chars >= 100 AND n_chars <= 2000 THEN 1.0 ELSE 0.5 END AS len_band
              FROM t)
            SELECT doc_id, n_tokens,
                   round(alpha_ratio, 6) AS alpha_ratio,
                   round(stop_ratio, 6) AS stop_ratio,
                   round(0.3 * len_band + 0.3 * alpha_ratio
                         + 0.25 * least(stop_ratio * 4.0, 1.0)
                         + 0.15 * least(mean_tok_len / 8.0, 1.0), 6) AS quality
            FROM m
        """,
        "token_count": r"""
            SELECT doc_id,
                   len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::BIGINT AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS re_tokens
            FROM documents
        """,
        # Mixed-script token counting: literal BMP char-class ranges
        # run identically under Java regex and RE2; on this English
        # corpus cjk_chars is 0 and mixed == ws (the rule is still
        # hash-checked end-to-end); CJK behaviour is pinned on crafted
        # docs in tests/test_round10_ops.py.
        "token_count_cjk": r"""
            SELECT doc_id,
                   length(regexp_replace(text,
                     '[^぀-ヿ㐀-䶿一-鿿가-힯]', '', 'g'))::BIGINT
                     AS cjk_chars,
                   len(list_filter(string_split_regex(text, '\s+'),
                     x -> x <> ''))::BIGINT AS ws_tokens,
                   (len(list_filter(string_split_regex(
                        regexp_replace(text, '[぀-ヿ㐀-䶿一-鿿가-힯]',
                                       ' ', 'g'), '\s+'),
                     x -> x <> ''))
                    + length(regexp_replace(text,
                        '[^぀-ヿ㐀-䶿一-鿿가-힯]', '', 'g')))::BIGINT
                     AS mixed_tokens
            FROM documents
        """,
        "doc_fingerprint": r"""
            SELECT doc_id,
                   list_reduce(
                     list_prepend(0::BIGINT,
                       list_transform(regexp_extract_all(text, '[\s\S]'),
                                      c -> ascii(c)::BIGINT)),
                     (acc, x) -> (acc * 131 + x) % 1000000007) AS fingerprint
            FROM documents
        """,
        "contamination_check": f"""
            WITH sh AS ({_SHINGLES}),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            ev AS (SELECT doc_id AS eval_doc_id, g FROM ex WHERE doc_id % 97 = 0),
            co AS (SELECT doc_id, g FROM ex WHERE doc_id % 97 <> 0)
            SELECT co.doc_id, ev.eval_doc_id, count(*) AS n_common
            FROM co JOIN ev ON co.g = ev.g
            GROUP BY 1, 2
            HAVING count(*) >= 2
        """,
        "token_entropy": r"""
            WITH w AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS word
                       FROM documents),
            pw AS (SELECT doc_id, word, count(*) AS c
                   FROM w WHERE word <> '' GROUP BY 1, 2)
            SELECT doc_id, sum(c)::BIGINT AS n_tokens,
                   round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
            FROM pw GROUP BY doc_id
        """,
        "doc_length_stats": """
            SELECT lang, count(*) AS n_docs,
                   round(avg(n_chars), 4) AS mean_chars,
                   round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
                   round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
                   round(quantile_cont(n_chars, 0.99), 4) AS p99_chars
            FROM documents GROUP BY lang
        """,
        "source_mix_report": """
            SELECT lang, source, count(*) AS n_docs,
                   sum(n_chars)::BIGINT AS sum_chars,
                   round(count(*)::DOUBLE
                         / sum(count(*)) OVER (PARTITION BY lang), 6) AS doc_share
            FROM documents GROUP BY lang, source
        """,
        "skew_join_salted": """
            WITH dim AS (SELECT event_type, avg(value) AS mean_value
                         FROM events GROUP BY 1)
            SELECT e.event_type, count(*) AS n_events,
                   sum(CASE WHEN e.value > d.mean_value THEN 1 ELSE 0 END)::BIGINT
                     AS n_above_mean
            FROM events e JOIN dim d USING (event_type) GROUP BY 1
        """,
        "ngram_novelty": f"""
            WITH sh AS ({_SHINGLES}),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            fs AS (SELECT g, min(doc_id) AS first_doc FROM ex GROUP BY g)
            SELECT ex.doc_id, count(*) AS n_shingles,
                   sum(CASE WHEN fs.first_doc = ex.doc_id THEN 1 ELSE 0 END)::BIGINT
                     AS n_novel,
                   round(sum(CASE WHEN fs.first_doc = ex.doc_id
                                  THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
                     AS novelty
            FROM ex JOIN fs ON ex.g = fs.g
            GROUP BY ex.doc_id
        """,
        "user_activity_profile": """
            SELECT user_id, count(*) AS n_events,
                   count(DISTINCT event_type) AS n_types,
                   count(DISTINCT date_trunc('day', ts)) AS active_days,
                   round(sum(value), 4) AS total_value,
                   round(avg(value), 4) AS mean_value,
                   round(quantile_cont(value, 0.9), 4) AS p90_value
            FROM events GROUP BY user_id
        """,
        "winsorize_events": """
            WITH s AS (SELECT event_type,
                              round(quantile_cont(value, 0.01), 6) AS lo,
                              round(quantile_cont(value, 0.99), 6) AS hi
                       FROM events GROUP BY 1)
            SELECT e.event_type,
                   round(min(lo), 4) AS p01, round(min(hi), 4) AS p99,
                   sum(CASE WHEN value < lo THEN 1 ELSE 0 END)::BIGINT
                     AS n_clipped_low,
                   sum(CASE WHEN value > hi THEN 1 ELSE 0 END)::BIGINT
                     AS n_clipped_high,
                   round(avg(greatest(least(value, hi), lo)), 4) AS wins_mean
            FROM events e JOIN s USING (event_type) GROUP BY e.event_type
        """,
        "vocab_encode": r"""
            WITH t AS (SELECT doc_id,
                              list_filter(string_split_regex(text, '\s+'),
                                          x -> x <> '') AS toks
                       FROM documents),
            w AS (SELECT doc_id,
                         unnest(toks) AS word,
                         unnest(generate_series(1, len(toks))) AS pos
                  FROM t),
            counts AS (SELECT word, count(*) AS c FROM w GROUP BY word),
            vocab AS (SELECT word, rn::BIGINT AS id FROM (
                        SELECT word,
                               row_number() OVER (ORDER BY c DESC, word) AS rn
                        FROM counts)
                      WHERE rn <= 25),
            enc AS (SELECT doc_id, pos, coalesce(v.id, 0) AS id
                    FROM w LEFT JOIN vocab v USING (word))
            SELECT doc_id, count(*) AS n_tokens,
                   sum(CASE WHEN id = 0 THEN 1 ELSE 0 END)::BIGINT AS n_oov,
                   array_to_string(list(id ORDER BY pos)[1:16], ',') AS ids_prefix
            FROM enc GROUP BY doc_id
        """,
        "embedding_norm_stats": """
            WITH n AS (
              SELECT label,
                     sqrt(list_sum(list_transform(generate_series(1, 64),
                          i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS norm
              FROM embeddings)
            SELECT label, count(*) AS n_vecs,
                   round(avg(norm), 6) AS mean_norm,
                   round(min(norm), 6) AS min_norm,
                   round(max(norm), 6) AS max_norm
            FROM n GROUP BY label
        """,
        "multimodal_meta": """
            SELECT doc_id,
                   octet_length(encode(text))::INT AS n_bytes,
                   (octet_length(encode(text)) % 640 + 1)::INT AS fake_width,
                   ((octet_length(encode(text)) * 7) % 480 + 1)::INT AS fake_height,
                   'image' AS modality
            FROM documents
        """,
        "funnel_conversion": r"""
            WITH c AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'
            ), p AS (
              SELECT user_id, ts AS ts_p FROM events
              WHERE event_type = 'purchase'
            ), conv AS (
              SELECT DISTINCT c.event_id FROM c
              JOIN p ON c.user_id = p.user_id
                    AND p.ts_p > c.ts
                    AND p.ts_p <= c.ts + INTERVAL 1 HOUR
            )
            SELECT EXTRACT(hour FROM c.ts)::BIGINT AS hr,
                   count(*)::BIGINT AS n_clicks,
                   SUM(CASE WHEN conv.event_id IS NOT NULL THEN 1 ELSE 0
                       END)::BIGINT AS n_converted,
                   ROUND(SUM(CASE WHEN conv.event_id IS NOT NULL THEN 1
                             ELSE 0 END) / count(*)::DOUBLE, 6)
                     AS conversion_rate
            FROM c LEFT JOIN conv USING (event_id)
            GROUP BY 1
        """,
        "cohort_retention": r"""
            WITH act AS (
              SELECT DISTINCT user_id,
                     date_trunc('week', ts)::TIMESTAMP AS wk
              FROM events
            ), coh AS (
              SELECT user_id, MIN(wk) AS cohort_week FROM act GROUP BY 1
            ), siz AS (
              SELECT cohort_week, count(*)::BIGINT AS cohort_size
              FROM coh GROUP BY 1
            )
            SELECT c.cohort_week,
                   (date_diff('day', c.cohort_week, a.wk) // 7)::BIGINT
                     AS week_offset,
                   count(*)::BIGINT AS n_active,
                   cohort_size,
                   ROUND(count(*) / cohort_size::DOUBLE, 6) AS retention
            FROM act a
            JOIN coh c USING (user_id)
            JOIN siz USING (cohort_week)
            GROUP BY c.cohort_week, week_offset, cohort_size
        """,
        "histogram_quantiles": r"""
            WITH h AS (
              SELECT floor(value / 25.0)::BIGINT AS bin,
                     count(*)::BIGINT AS cnt
              FROM events GROUP BY 1
            ), c AS (
              SELECT bin, cnt,
                     COALESCE(SUM(cnt) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0)::BIGINT AS cum_prev
              FROM h
            ), t AS (SELECT SUM(cnt)::BIGINT AS n FROM h),
            q(q) AS (VALUES (0.5), (0.9), (0.99)),
            r AS (
              SELECT q, GREATEST(CEIL(q * n), 1)::BIGINT AS rank_n
              FROM q CROSS JOIN t
            )
            SELECT q, rank_n,
                   ROUND(bin * 25.0 + 25.0 * (rank_n - cum_prev) / cnt, 6)
                     AS est
            FROM r JOIN c ON cum_prev < rank_n AND cum_prev + cnt >= rank_n
        """,
        "dup_span_islands": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ), sh AS (
              SELECT doc_id, u.pos, u.sh
              FROM (SELECT doc_id,
                           unnest(list_transform(
                             generate_series(1, greatest(len(t) - 4, 1)),
                             i -> {'pos': i,
                                   'sh': array_to_string(t[i:i+4], ' ')}))
                             AS u
                    FROM t)
            ), stats AS (
              SELECT sh, count(DISTINCT doc_id) AS n_docs
              FROM sh GROUP BY 1
            ), covered AS (
              SELECT DISTINCT sh.doc_id,
                     unnest(generate_series(pos, pos + 4)) AS pos
              FROM sh JOIN stats USING (sh)
              WHERE n_docs >= 2
            ), isl AS (
              SELECT doc_id, pos,
                     pos - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS grp
              FROM covered
            )
            SELECT doc_id, min(pos)::BIGINT AS span_start,
                   count(*)::BIGINT AS span_len
            FROM isl GROUP BY doc_id, grp
            HAVING count(*) >= 5
        """,
        "sample_weighted": """
            SELECT doc_id, lang, source,
                   round(least(1e0, n_chars / 400e0), 6) AS keep_weight
            FROM documents
            WHERE ((doc_id * 2654435761) % 4294967296) / 4294967296e0
                  < least(1e0, n_chars / 400e0)
        """,
        "ddsketch_quantiles": r"""
            WITH sk AS (
              SELECT ceil(ln(value) / ln(101e-2 / 99e-2))::BIGINT AS bucket,
                     count(*)::BIGINT AS cnt
              FROM events WHERE value > 0 GROUP BY 1
            ), c AS (
              SELECT bucket, cnt,
                     COALESCE(SUM(cnt) OVER (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0)::BIGINT AS cum_prev
              FROM sk
            ), t AS (SELECT SUM(cnt)::BIGINT AS n FROM sk),
            q(q) AS (VALUES (0.5), (0.9), (0.99)),
            r AS (
              SELECT q, GREATEST(CEIL(q * n), 1)::BIGINT AS rank_n
              FROM q CROSS JOIN t
            )
            SELECT q, rank_n,
                   round(2e0 * pow(101e-2 / 99e-2, bucket)
                         / (101e-2 / 99e-2 + 1e0), 6) AS est
            FROM r JOIN c ON cum_prev < rank_n AND cum_prev + cnt >= rank_n
        """,
        "dup_span_fraction": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS tk
              FROM documents
            ), pos AS (
              SELECT doc_id,
                     unnest(list_transform(
                       generate_series(1, greatest(len(tk) - 2, 1)),
                       i -> array_to_string(tk[i:i+2], ' '))) AS sh
              FROM t
            ), d AS (
              SELECT sh, count(DISTINCT doc_id) AS n_docs FROM pos GROUP BY sh
            )
            SELECT doc_id, count(*)::BIGINT AS n_shingles,
                   SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT
                     AS n_dup_shingles,
                   ROUND(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)
                         / count(*)::DOUBLE, 6) AS dup_fraction
            FROM pos JOIN d USING (sh)
            GROUP BY doc_id
        """,
        "unigram_logppl": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(text, '\s+'),
                            x -> x <> '')) AS w
              FROM documents
            ), dw AS (
              SELECT doc_id, w, count(*)::BIGINT AS c_dw
              FROM tok GROUP BY 1, 2
            ), lm AS (
              SELECT w, count(*)::BIGINT AS c_w FROM tok GROUP BY 1
            ), tot AS (
              SELECT SUM(c_w)::DOUBLE AS total FROM lm
            )
            SELECT doc_id,
                   SUM(c_dw)::BIGINT AS n_tokens,
                   ROUND(-SUM(c_dw * LN(c_w / total)) / SUM(c_dw), 6)
                     AS cross_entropy
            FROM dw JOIN lm USING (w) CROSS JOIN tot
            GROUP BY doc_id
        """,
        "heavy_hitters_cms": r"""
            WITH occ AS (
              SELECT w AS word,
                     list_reduce(list_prepend(0::BIGINT,
                       list_transform(regexp_extract_all(w, '[\s\S]'),
                                      c -> ascii(c)::BIGINT)),
                       (acc, x) -> (acc * 131 + x) % 1000000007) AS h0
              FROM (SELECT unnest(list_filter(
                             string_split_regex(text, '\s+'), x -> x <> ''))
                             AS w
                    FROM documents)
            ), coeffs(d, ca, cb) AS (
              VALUES (0::BIGINT, 3, 7), (1, 5, 11), (2, 13, 17), (3, 19, 23)
            ), sk AS (
              SELECT d, ((ca * h0 + cb) % 2147483647) % 32 AS bucket,
                     count(*)::BIGINT AS cnt
              FROM occ CROSS JOIN coeffs GROUP BY 1, 2
            ), words AS (
              SELECT word, h0, count(*)::BIGINT AS true_count
              FROM occ GROUP BY 1, 2
            )
            SELECT word, min(cnt)::BIGINT AS est_count, true_count
            FROM words CROSS JOIN coeffs
            JOIN sk ON sk.d = coeffs.d
                   AND sk.bucket = ((ca * h0 + cb) % 2147483647) % 32
            GROUP BY word, true_count
            HAVING min(cnt) >= 900
        """,
        "q2_min_cost_supplier": """
            WITH cost AS (
              SELECT l_partkey, l_suppkey,
                     round(sum(l_extendedprice) / sum(l_quantity), 4)
                       AS unit_cost
              FROM lineitem GROUP BY 1, 2
            ), best AS (
              SELECT *, row_number() OVER (PARTITION BY l_partkey
                          ORDER BY unit_cost, l_suppkey) AS rn
              FROM cost
            )
            SELECT p_partkey, p_brand, p_retailprice, unit_cost,
                   s_suppkey, s_name, n_name
            FROM best
            JOIN part ON l_partkey = p_partkey AND p_size % 5 = 0
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE rn = 1
            ORDER BY p_retailprice DESC, p_partkey LIMIT 20
        """,
        "q11_important_parts": """
            WITH val AS (
              SELECT l_partkey,
                     round(sum(l_extendedprice), 4) AS part_value
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey < 5
              GROUP BY 1
            ), tot AS (SELECT sum(part_value) AS total_value FROM val)
            SELECT l_partkey, part_value,
                   round(part_value / total_value, 6) AS value_share
            FROM val CROSS JOIN tot
            WHERE part_value > total_value * 1e-3
        """,
        "q20_dominant_suppliers": """
            WITH qty AS (
              SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
              FROM lineitem
              JOIN part ON l_partkey = p_partkey AND p_size < 15
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY 1, 2
            ), shares AS (
              SELECT l_suppkey, supp_qty,
                     sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
              FROM qty
            )
            SELECT DISTINCT s_suppkey, s_name, n_name
            FROM shares
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE supp_qty * 2 >= part_qty
        """,
        "q21_waiting_suppliers": """
            WITH j AS (
              SELECT l_orderkey, l_suppkey,
                     l_shipdate > o_orderdate + INTERVAL 90 DAY AS is_late
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            ), per_order AS (
              SELECT l_orderkey,
                     count(DISTINCT l_suppkey) AS n_supp,
                     count(DISTINCT CASE WHEN is_late THEN l_suppkey END)
                       AS n_late_supp
              FROM j GROUP BY 1
            ), blamed AS (
              SELECT DISTINCT j.l_orderkey, l_suppkey
              FROM j JOIN per_order USING (l_orderkey)
              WHERE is_late AND n_supp >= 2 AND n_late_supp = 1
            )
            SELECT s_suppkey, s_name, count(*)::BIGINT AS numwait
            FROM blamed JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY 1, 2
            ORDER BY numwait DESC, s_suppkey LIMIT 20
        """,
        "dedup_span_removal": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents
            ), tok AS (
              SELECT doc_id, u.pos, u.word
              FROM (SELECT doc_id,
                           unnest(list_transform(
                             generate_series(1, len(t)),
                             i -> {'pos': i, 'word': t[i]})) AS u
                    FROM t)
            ), sh AS (
              SELECT doc_id, u.pos, u.sh
              FROM (SELECT doc_id,
                           unnest(list_transform(
                             generate_series(1, greatest(len(t) - 4, 1)),
                             i -> {'pos': i,
                                   'sh': array_to_string(t[i:i+4], ' ')}))
                             AS u
                    FROM t)
            ), stats AS (
              SELECT sh, count(DISTINCT doc_id) AS n_docs,
                     min(doc_id * 1000000 + pos) AS first_key
              FROM sh GROUP BY 1
            ), covered AS (
              SELECT DISTINCT sh.doc_id, unnest(generate_series(pos, pos + 4))
                       AS pos
              FROM sh JOIN stats USING (sh)
              WHERE n_docs >= 2
                AND sh.doc_id * 1000000 + sh.pos <> first_key
            ), kept AS (
              SELECT tok.doc_id, tok.pos, tok.word
              FROM tok LEFT JOIN covered
                ON tok.doc_id = covered.doc_id AND tok.pos = covered.pos
              WHERE covered.pos IS NULL
            ), rebuilt AS (
              SELECT doc_id, count(*)::BIGINT AS n_kept,
                     string_agg(word, ' ' ORDER BY pos) AS cleaned_text
              FROM kept GROUP BY 1
            ), ntok AS (
              SELECT doc_id, count(*)::BIGINT AS n_tokens FROM tok GROUP BY 1
            )
            SELECT ntok.doc_id, n_tokens,
                   (n_tokens - coalesce(n_kept, 0))::BIGINT AS n_removed,
                   coalesce(cleaned_text, '') AS cleaned_text
            FROM ntok LEFT JOIN rebuilt ON ntok.doc_id = rebuilt.doc_id
        """,
        "event_windows_sliding": """
            WITH x AS (
              SELECT event_type, value,
                     floor(epoch(ts))::BIGINT // 1800 * 1800 AS s0
              FROM events
            ), e2 AS (
              SELECT event_type, value, unnest([s0, s0 - 1800]) AS s
              FROM x
            )
            SELECT make_timestamp(s * 1000000) AS window_start, event_type,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 4) AS total_value
            FROM e2 GROUP BY 1, 2
        """,
        "hourly_value_correlation": """
            WITH agg AS (
              SELECT event_type,
                     count(*)::DOUBLE AS n,
                     sum(hour(ts)::DOUBLE) AS sx,
                     sum(value) AS sy,
                     sum(hour(ts)::DOUBLE * hour(ts)::DOUBLE) AS sxx,
                     sum(value * value) AS syy,
                     sum(hour(ts)::DOUBLE * value) AS sxy
              FROM events GROUP BY 1
            )
            SELECT event_type, n::BIGINT AS n_events,
                   round((n * sxy - sx * sy)
                         / (sqrt(n * sxx - sx * sx)
                            * sqrt(n * syy - sy * sy)), 4)
                     AS hour_value_corr
            FROM agg
        """,
        "degree_distribution": """
            WITH po AS (
              SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            ), e AS (
              SELECT DISTINCT a.p AS u, b.p AS v
              FROM po a JOIN po b ON a.o = b.o AND a.p < b.p
            ), deg AS (
              SELECT n, count(*)::BIGINT AS deg
              FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)
              GROUP BY 1
            ), hist AS (
              SELECT deg, count(*)::BIGINT AS n_nodes FROM deg GROUP BY 1
            )
            SELECT deg, n_nodes,
                   round(n_nodes / (SELECT sum(n_nodes) FROM hist), 6)
                     AS node_share
            FROM hist
        """,
        "decontaminate_corpus": f"""
            WITH sh AS ({_SHINGLES}),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            ev AS (SELECT doc_id AS eval_doc_id, g FROM ex
                   WHERE doc_id % 97 = 0),
            co AS (SELECT doc_id, g FROM ex WHERE doc_id % 97 <> 0),
            bad AS (
              SELECT DISTINCT co.doc_id
              FROM co JOIN ev ON co.g = ev.g
              GROUP BY co.doc_id, ev.eval_doc_id
              HAVING count(*) >= 2
            )
            SELECT doc_id, lang, source, n_chars
            FROM documents
            WHERE doc_id % 97 <> 0
              AND doc_id NOT IN (SELECT doc_id FROM bad)
        """,
        "hll_distinct": r"""
            WITH h AS (
              SELECT event_type,
                     list_reduce(list_prepend(0::BIGINT,
                       list_transform(regexp_extract_all(user_id::VARCHAR,
                                                         '[\s\S]'),
                                      c -> ascii(c)::BIGINT)),
                       (acc, x) -> (acc * 131 + x) % 1000000007) AS h0
              FROM events
            ), r AS (
              SELECT event_type, h0 % 256 AS j,
                     CASE WHEN h0 // 256 > 0
                          THEN 22 - floor(log2(h0 // 256))::BIGINT
                          ELSE 23 END AS rho
              FROM h
            ), reg AS (
              SELECT event_type, j, max(rho) AS m_j FROM r GROUP BY 1, 2
            ), agg AS (
              SELECT event_type, count(*)::BIGINT AS n_present,
                     (sum((1::BIGINT << (30 - m_j)))
                      + (256 - count(*)) * 1073741824)::BIGINT AS z_int,
                     (256 - count(*))::BIGINT AS v_zero
              FROM reg GROUP BY 1
            ), ex AS (
              SELECT event_type, count(DISTINCT user_id)::BIGINT
                       AS true_distinct
              FROM events GROUP BY 1
            )
            SELECT event_type, n_present, v_zero,
                   round(CASE WHEN v_zero > 0
                              AND 7213e-4 / (1e0 + 1079e-3 / 256e0)
                                  * 65536e0 * 1073741824e0 / z_int <= 640e0
                         THEN 256e0 * ln(256e0 / v_zero)
                         ELSE 7213e-4 / (1e0 + 1079e-3 / 256e0)
                              * 65536e0 * 1073741824e0 / z_int END, 4)
                     AS est_distinct,
                   true_distinct
            FROM agg JOIN ex USING (event_type)
        """,
        "k_truss": _ktruss_sql(),
        "frequent_pairs": r"""
            WITH po AS (
              SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            ), nb AS (SELECT count(DISTINCT o)::BIGINT AS n FROM po),
            f1 AS (
              SELECT p, count(*)::BIGINT AS sup FROM po GROUP BY p
              HAVING count(*) >= 3
            ), pof AS (
              SELECT po.o, po.p FROM po JOIN f1 USING (p)
            ), pairs AS (
              SELECT a.p AS item_a, b.p AS item_b, count(*)::BIGINT AS pair_support
              FROM pof a JOIN pof b ON a.o = b.o AND a.p < b.p
              GROUP BY 1, 2 HAVING count(*) >= 2
            )
            SELECT item_a, item_b, pair_support,
                   sa.sup AS support_a, sb.sup AS support_b,
                   round(pair_support / sa.sup::DOUBLE, 6) AS conf_a_to_b,
                   round(pair_support / sb.sup::DOUBLE, 6) AS conf_b_to_a,
                   round(pair_support * nb.n / (sa.sup * sb.sup)::DOUBLE, 6) AS lift
            FROM pairs
            JOIN f1 sa ON sa.p = item_a
            JOIN f1 sb ON sb.p = item_b
            CROSS JOIN nb
        """,
        "rake_keywords": r"""
            WITH tk AS (
              SELECT doc_id, toks[CAST(i AS INT)] AS tok, i,
                     CASE WHEN toks[CAST(i AS INT)] IN
                          ('the','a','of','and','to','in','is','it')
                          THEN 1 ELSE 0 END AS is_stop
              FROM (SELECT doc_id,
                           list_filter(string_split_regex(text, '\s+'),
                                       x -> x <> '') AS toks
                    FROM documents),
                   unnest(range(1, len(toks) + 1)) AS u(i)
            ), runs AS (
              SELECT doc_id, tok, i,
                     sum(is_stop) OVER (PARTITION BY doc_id ORDER BY i) AS island
              FROM tk QUALIFY is_stop = 0
            ), phrases AS (
              SELECT doc_id, island,
                     string_agg(tok, ' ' ORDER BY i) AS phrase,
                     count(*)::BIGINT AS n_words
              FROM runs GROUP BY doc_id, island
            ), words AS (
              SELECT n_words, unnest(string_split(phrase, ' ')) AS word
              FROM phrases
            ), wscore AS (
              SELECT word,
                     CAST(round(1e6 * sum(n_words) / count(*)::DOUBLE) AS BIGINT) AS w_micro
              FROM words GROUP BY word
            ), dphrase AS (
              SELECT DISTINCT phrase, n_words FROM phrases
            ), pscore AS (
              SELECT d.phrase, d.n_words, sum(w.w_micro)::BIGINT AS p_micro
              FROM (SELECT phrase, n_words,
                           unnest(string_split(phrase, ' ')) AS word
                    FROM dphrase) d
              JOIN wscore w USING (word)
              GROUP BY d.phrase, d.n_words
            ), occ AS (
              SELECT phrase, count(*)::BIGINT AS n_occurrences
              FROM phrases GROUP BY phrase
            )
            SELECT phrase, n_words, n_occurrences,
                   p_micro AS score_micro,
                   row_number() OVER (ORDER BY p_micro DESC, phrase)::BIGINT AS rank
            FROM pscore JOIN occ USING (phrase)
            QUALIFY rank <= 25
        """,
        "triangle_count": r"""
            WITH po AS (
              SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
            ), e AS (
              SELECT DISTINCT a.p AS u, b.p AS v
              FROM po a JOIN po b ON a.o = b.o AND a.p < b.p
            )
            SELECT (SELECT count(*) FROM e)::BIGINT AS n_edges,
                   (SELECT count(*)
                    FROM e e1
                    JOIN e e2 ON e1.v = e2.u
                    JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v
                   )::BIGINT AS n_triangles
        """,
        "sequence_pack": r"""
            WITH t AS (
              SELECT doc_id, lang,
                     len(list_filter(string_split_regex(text, '\s+'),
                         x -> x <> ''))::BIGINT AS n_tokens
              FROM documents
            ), cum AS (
              SELECT doc_id, lang, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0)::BIGINT AS start_tok
              FROM t
            )
            SELECT doc_id, lang, n_tokens, start_tok,
                   (start_tok // 512)::BIGINT AS seq_id,
                   (CASE WHEN n_tokens = 0 THEN 0
                         ELSE (start_tok + n_tokens - 1) // 512
                              - start_tok // 512 + 1
                    END)::BIGINT AS n_seqs
            FROM cum
        """,
        "mixture_sample_docs": r"""
            WITH per_source AS (
              SELECT source, count(*)::BIGINT AS n_docs,
                     SUM(len(list_filter(string_split_regex(text, '\s+'),
                         x -> x <> '')))::BIGINT AS n_tokens
              FROM documents GROUP BY source
            ), weighted AS (
              SELECT *, (CAST(substr(source, 4) AS BIGINT) % 4 + 1)::BIGINT AS weight
              FROM per_source
            ), tot AS (
              SELECT SUM(n_tokens)::BIGINT AS total_tokens,
                     SUM(weight)::BIGINT AS total_weight FROM weighted
            ), plan AS (
              SELECT source, n_tokens,
                     LEAST(n_tokens,
                           (total_tokens * 6 // 10) * weight // total_weight
                     )::BIGINT AS alloc_tokens,
                     ROUND(LEAST(n_tokens,
                           (total_tokens * 6 // 10) * weight // total_weight)
                           / n_tokens::DOUBLE, 6) AS sample_rate
              FROM weighted, tot
            ), scored AS (
              SELECT d.source,
                     len(list_filter(string_split_regex(d.text, '\s+'),
                         x -> x <> ''))::BIGINT AS n_toks,
                     CASE WHEN ((d.doc_id * 2654435761) % 4294967296)
                               % 1000000
                              < p.alloc_tokens * 1000000 // p.n_tokens
                          THEN 1 ELSE 0 END AS keep,
                     p.alloc_tokens, p.sample_rate, p.n_tokens
              FROM documents d JOIN plan p USING (source)
            )
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(keep)::BIGINT AS kept_docs,
                   max(alloc_tokens)::BIGINT AS alloc_tokens,
                   sum(keep * n_toks)::BIGINT AS kept_tokens,
                   max(sample_rate) AS sample_rate,
                   round(sum(keep * n_toks) / max(n_tokens)::DOUBLE, 6)
                     AS achieved_rate
            FROM scored GROUP BY source
        """,
        "mlm_span_corruption_plan": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS toks
              FROM documents),
            h AS (
              SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                     list_transform(range(1, len(toks) + 1),
                       i -> CAST(concat('0x', substring(md5(concat(
                              CAST(doc_id AS VARCHAR), ':',
                              CAST(i AS VARCHAR))), 1, 8)) AS BIGINT)
                            & 2147483647) AS hs
              FROM t WHERE len(toks) > 0),
            st AS (
              SELECT doc_id, n_tokens,
                     list_filter(
                       list_transform(range(1, CAST(n_tokens AS INT) + 1),
                         i -> struct_pack(pos := i, hv := hs[i])),
                       s -> s.hv % 20 = 0) AS starts
              FROM h)
            SELECT doc_id, n_tokens,
                   len(starts)::BIGINT AS n_spans,
                   len(list_distinct(flatten(list_transform(starts,
                       s -> range(s.pos,
                                  least(s.pos + 2 - 1 + (s.hv // 20) % 3,
                                        n_tokens) + 1)))))::BIGINT AS n_masked,
                   round(len(list_distinct(flatten(list_transform(starts,
                       s -> range(s.pos,
                                  least(s.pos + 2 - 1 + (s.hv // 20) % 3,
                                        n_tokens) + 1)))))
                         / n_tokens::DOUBLE, 6) AS mask_ratio
            FROM st
        """,
        "readability_scores": r"""
            WITH t AS (
              SELECT doc_id,
                     len(list_filter(string_split_regex(text, '\s+'),
                         x -> x <> ''))::BIGINT AS n_words,
                     greatest(len(list_filter(
                         string_split_regex(text, '[.!?]+'),
                         s -> length(trim(s)) > 0)), 1)::BIGINT AS n_sentences,
                     list_sum(list_transform(
                         list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> ''),
                         w -> greatest(len(regexp_extract_all(w,
                              '[aeiouyAEIOUY]+')), 1)))::BIGINT AS n_syllables
              FROM documents)
            SELECT doc_id, n_words, n_sentences, n_syllables,
                   round(206.835 - 1.015 * (n_words / n_sentences::DOUBLE)
                         - 84.6 * (n_syllables / n_words::DOUBLE), 4) AS flesch
            FROM t WHERE n_words > 0
        """,
        "unigram_encode": _unigram_encode_sql(),
        "unigram_encode_ids": _unigram_encode_ids_sql(),
        "bpe_encode_ids": _bpe_encode_ids_sql(),
        # The frozen gate keys encode from the persisted model
        # artifact; the artifact round-trips the trainer's bounded
        # output exactly (pytest-pinned), so the oracle is the SAME
        # unrolled train+encode chain — a drifted artifact would
        # hash-mismatch here.
        "unigram_encode_ids_frozen": _unigram_encode_ids_sql(),
        "bpe_encode_ids_frozen": _bpe_encode_ids_sql(),
        "byte_bpe_encode_ids": _bpe_encode_ids_sql(
            sym_sql=_byte_sym_sql()
        ),
        "url_normalize": _url_normalize_sql(),
        "url_dedup_survivors": _url_dedup_sql(),
        "dataset_mixture_plan": r"""
            WITH per_source AS (
              SELECT source, count(*)::BIGINT AS n_docs,
                     SUM(len(list_filter(string_split_regex(text, '\s+'),
                         x -> x <> '')))::BIGINT AS n_tokens
              FROM documents GROUP BY source
            ), weighted AS (
              SELECT *,
                     (CAST(substr(source, 4) AS BIGINT) % 4 + 1)::BIGINT
                       AS weight
              FROM per_source
            ), tot AS (
              SELECT SUM(n_tokens)::BIGINT AS total_tokens,
                     SUM(weight)::BIGINT AS total_weight
              FROM weighted
            )
            SELECT source, n_docs, n_tokens, weight,
                   LEAST(n_tokens,
                         (total_tokens * 6 // 10) * weight // total_weight
                   )::BIGINT AS alloc_tokens,
                   ROUND(LEAST(n_tokens,
                         (total_tokens * 6 // 10) * weight // total_weight)
                         / n_tokens::DOUBLE, 6) AS sample_rate
            FROM weighted, tot
        """,
        "cross_source_duplication": r"""
            WITH hs AS (
              SELECT DISTINCT
                     md5(array_to_string(
                       (list_filter(string_split_regex(text, '\s+'),
                        x -> x <> ''))[1:8], ' ')) AS h,
                     source
              FROM documents
            )
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*)::BIGINT AS n_shared_texts
            FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2
        """,
        "gopher_quality_filter": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
                     length(regexp_replace(text, '\s+', '', 'g')) AS swl
              FROM documents),
            m AS (
              SELECT doc_id,
                     len(toks)::BIGINT AS n_words,
                     round(swl / len(toks), 6) AS mean_word_len,
                     round(len(list_filter(toks,
                         x -> contains(x, '#') OR contains(x, '...'))) / len(toks), 6)
                       AS symbol_ratio,
                     round(len(list_filter(toks,
                         x -> regexp_matches(x, '[A-Za-z]'))) / len(toks), 6)
                       AS alpha_word_ratio,
                     len(list_filter(toks, x -> x IN
                         ('the','be','to','of','and','that','have','with')))::BIGINT
                       AS n_stopwords
              FROM t)
            SELECT doc_id, n_words, mean_word_len, symbol_ratio,
                   alpha_word_ratio, n_stopwords,
                   (n_words BETWEEN 50 AND 100000)::BIGINT AS flag_word_count,
                   (mean_word_len BETWEEN 3.0 AND 10.0)::BIGINT AS flag_mean_word_len,
                   (symbol_ratio <= 0.1)::BIGINT AS flag_symbol_ratio,
                   (alpha_word_ratio >= 0.8)::BIGINT AS flag_alpha_words,
                   (n_stopwords >= 2)::BIGINT AS flag_stopwords,
                   ((n_words BETWEEN 50 AND 100000)
                    AND (mean_word_len BETWEEN 3.0 AND 10.0)
                    AND symbol_ratio <= 0.1
                    AND alpha_word_ratio >= 0.8
                    AND n_stopwords >= 2)::BIGINT AS passes_gopher
            FROM m
        """,
        "dataset_card": r"""
            WITH base AS (
              SELECT doc_id, lang, source, text,
                     len(list_filter(string_split_regex(text, '\s+'),
                         x -> x <> ''))::BIGINT AS n_toks
              FROM documents),
            main AS (
              SELECT count(*)::BIGINT AS n_docs,
                     sum(n_toks)::BIGINT AS n_tokens,
                     count(DISTINCT lang)::BIGINT AS n_langs,
                     count(DISTINCT source)::BIGINT AS n_sources,
                     round(avg(n_toks), 4) AS mean_doc_tokens,
                     (count(*) - count(DISTINCT text))::BIGINT AS n_exact_dups
              FROM base),
            g0 AS (
              SELECT list_filter(string_split_regex(text, '\s+'),
                         x -> x <> '') AS toks,
                     length(regexp_replace(text, '\s+', '', 'g')) AS swl
              FROM documents),
            g1 AS (
              SELECT len(toks)::BIGINT AS n_words,
                     round(swl / len(toks), 6) AS mean_word_len,
                     round(len(list_filter(toks,
                         x -> contains(x, '#') OR contains(x, '...'))) / len(toks), 6)
                       AS symbol_ratio,
                     round(len(list_filter(toks,
                         x -> regexp_matches(x, '[A-Za-z]'))) / len(toks), 6)
                       AS alpha_word_ratio,
                     len(list_filter(toks, x -> x IN
                         ('the','be','to','of','and','that','have','with')))::BIGINT
                       AS n_stopwords
              FROM g0),
            gq AS (
              SELECT round(avg(((n_words BETWEEN 50 AND 100000)
                    AND (mean_word_len BETWEEN 3.0 AND 10.0)
                    AND symbol_ratio <= 0.1
                    AND alpha_word_ratio >= 0.8
                    AND n_stopwords >= 2)::BIGINT), 6) AS gopher_pass_rate
              FROM g1)
            SELECT n_docs, n_tokens, n_langs, n_sources, mean_doc_tokens,
                   n_exact_dups, gopher_pass_rate,
                   round(n_exact_dups / n_docs::DOUBLE, 6) AS exact_dup_rate
            FROM main CROSS JOIN gq
        """,
        "quality_topk_select": r"""
            WITH t AS (
              SELECT doc_id, lang,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
                     length(text) AS n_chars,
                     length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha_chars
              FROM documents),
            m AS (
              SELECT doc_id, lang,
                     alpha_chars / n_chars AS alpha_ratio,
                     len(list_filter(toks,
                         x -> x IN ('the','a','of','and','to','in','is','it')))
                       / len(toks) AS stop_ratio,
                     n_chars / len(toks) AS mean_tok_len,
                     CASE WHEN n_chars >= 100 AND n_chars <= 2000
                          THEN 1.0 ELSE 0.5 END AS len_band
              FROM t),
            q AS (
              SELECT doc_id, lang,
                     round(0.3 * len_band + 0.3 * alpha_ratio
                           + 0.25 * least(stop_ratio * 4.0, 1.0)
                           + 0.15 * least(mean_tok_len / 8.0, 1.0), 6) AS quality
              FROM m)
            SELECT doc_id, lang, quality, rk FROM (
              SELECT doc_id, lang, quality,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY quality DESC, doc_id) AS rk
              FROM q)
            WHERE rk <= 20
        """,
        "zipf_slope": r"""
            WITH w AS (SELECT lang, unnest(string_split_regex(text, '\s+')) AS word
                       FROM documents),
            c AS (SELECT lang, word, count(*) AS c
                  FROM w WHERE word <> '' GROUP BY 1, 2),
            r AS (SELECT lang, c,
                         row_number() OVER (PARTITION BY lang
                                            ORDER BY c DESC, word) AS rank
                  FROM c)
            SELECT lang, count(*)::BIGINT AS n_words,
                   round(regr_slope(ln(c), ln(rank)), 6) AS slope
            FROM r WHERE rank <= 100 GROUP BY lang
        """,
        "cooccurrence_pmi": r"""
            WITH t AS (SELECT doc_id,
                              list_filter(string_split_regex(text, '\s+'),
                                          x -> x <> '') AS toks
                       FROM documents),
            w AS (SELECT doc_id, unnest(toks) AS word,
                         unnest(generate_series(1, len(toks))) AS pos
                  FROM t),
            bg AS (SELECT a.word AS w1, b.word AS w2
                   FROM w a JOIN w b
                     ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
            pc AS (SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY 1, 2),
            lm AS (SELECT w1, sum(n_pair) AS c1 FROM pc GROUP BY 1),
            rm AS (SELECT w2, sum(n_pair) AS c2 FROM pc GROUP BY 1),
            tot AS (SELECT sum(n_pair)::DOUBLE AS n_total FROM pc)
            SELECT w1, w2, n_pair::BIGINT AS n_pair,
                   round(ln((n_pair * n_total) / (c1::DOUBLE * c2::DOUBLE)), 6) AS pmi
            FROM pc JOIN lm USING (w1) JOIN rm USING (w2) CROSS JOIN tot
            WHERE n_pair >= 5
        """,
        "anomaly_zscore": """
            WITH s AS (SELECT event_type,
                              round(avg(value), 6) AS mean_v,
                              round(stddev_pop(value), 6) AS std_v
                       FROM events GROUP BY 1)
            SELECT event_id, event_type, value,
                   round((value - mean_v) / std_v, 4) AS z
            FROM events JOIN s USING (event_type)
            WHERE abs(round((value - mean_v) / std_v, 4)) >= 3.0
        """,
        "dedup_prefix": r"""
            WITH t AS (SELECT doc_id,
                              array_to_string(
                                list_filter(string_split_regex(text, '\s+'),
                                            x -> x <> '')[1:8], ' ') AS p
                       FROM documents)
            SELECT doc_id, n_dups FROM (
              SELECT doc_id,
                     row_number() OVER (PARTITION BY p ORDER BY doc_id) AS rn,
                     count(*) OVER (PARTITION BY p) AS n_dups
              FROM t)
            WHERE rn = 1 AND n_dups >= 2
        """,
        "dedup_containment": f"""
            WITH sh AS ({_SHINGLES}),
            sizes AS (SELECT doc_id, len(s) AS n FROM sh),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(n_common / least(sa.n, sb.n), 6) AS containment
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(n_common / least(sa.n, sb.n), 6) >= 0.8
        """,
        # identical output contract to dedup_containment — asymmetric
        # prefix filtering changes the PLAN, never the pair set.
        "dedup_containment_prefix": f"""
            WITH sh AS ({_SHINGLES}),
            sizes AS (SELECT doc_id, len(s) AS n FROM sh),
            ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT doc_a, doc_b,
                   round(n_common / least(sa.n, sb.n), 6) AS containment
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE round(n_common / least(sa.n, sb.n), 6) >= 0.8
        """,
        "embedding_clusters": f"""
            WITH RECURSIVE pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE {_COS_PAIR} >= 0.45
            ), edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION
              SELECT id_b AS src, id_a AS dst FROM pairs
            ), reach(a, b) AS (
              SELECT src, src FROM edges
              UNION
              SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
            )
            SELECT a AS vec_id, min(b) AS cluster_id FROM reach GROUP BY a
        """,
        "ann_range_search": f"""
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS_PAIR} AS cos
            FROM (SELECT * FROM embeddings WHERE vec_id < 10) a
            JOIN embeddings b ON a.vec_id <> b.vec_id
            WHERE {_COS_PAIR} >= 0.35
        """,
        "knn_graph": f"""
            WITH scored AS (
              SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, {_COS_PAIR} AS cos
              FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
            SELECT vec_id, neighbor_id, cos, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                         ORDER BY cos DESC, neighbor_id) AS rank
              FROM scored)
            WHERE rank <= 3
        """,
        # The stub featurizer is a byte-histogram (utf-8 byte % 16) of
        # the payload; the driver-facing projection recovers the exact
        # integer counts, so the oracle is a per-char code-point
        # histogram (the corpus is ASCII: bytes == chars).
        "multimodal_features": r"""
            WITH ch AS (
              SELECT doc_id, ascii(c) % 16 AS b
              FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
                    FROM documents)),
            h AS (SELECT doc_id, b, count(*)::BIGINT AS n FROM ch GROUP BY 1, 2)
            SELECT doc_id,
                   """
        + ",\n                   ".join(
            f"coalesce(max(CASE WHEN b = {i} THEN n END), 0)::BIGINT AS n{i}"
            for i in range(16)
        )
        + """
            FROM h GROUP BY doc_id
        """,
    }
