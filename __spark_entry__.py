"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query registry is assembled from the engine's query modules — each
module exposes SPARK_QUERIES / ORACLE_SQL dicts (see
delta_data_pipelines_spark/queries/__init__.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from delta_data_pipelines_spark.queries import search_index

    return search_index.search_index_full(spark, "/root/testdata/sf0.001")


def _modules():
    from delta_data_pipelines_spark.queries import (
        relational,
        scalar,
        search_index,
        streaming_q,
        temporal_q,
        tpch,
        training_data,
    )

    return [
        search_index,
        relational,
        training_data,
        scalar,
        streaming_q,
        tpch,
        temporal_q,
    ]


# The driver's correctness gate evaluates the FIRST 50 registry entries
# (dict-insertion order).  This list pins the 50 highest-value queries —
# one per SURVEY §2 family plus every family that was ungated in round 1
# (scalar lib, streaming twins, TPC-H, temporal joins) — into that
# window.  Queries past the window stay registered (they were driver-
# green in CORRECTNESS_r01.json) and keep running in the local mirror
# (tools/check.py), which checks all of them.
_PRIORITY = [
    # r10 window decision: keep r9's shape (every non-flagship row
    # below holds ≤2 green driver rounds — the ×2 coverage VERDICT r9
    # ask #6 wants built — except st_interval_join ×4, kept as the
    # streaming family's seat). One swap: ds_interleave (×4) rests in
    # the mirror; txt_unigram_encode_words takes its seat (the encode
    # debug twin). The unigram pair stays pinned: its values changed
    # this round (6-dp quantization), so prior greens don't carry.
    # flagship
    "search_index_full", "search_index_incremental", "search_index_fetch_by_id",
    # r8 rotation: the 13 r7 additions that have never held a driver
    # CORRECTNESS row (all mirror-green, re-verified r8) — closing
    # cumulative driver coverage of every oracle-able query. Rotated
    # out to make room: tpch_q7/q8/q9/q11/q15/q17/q20/q21,
    # txt_repetition, txt_vocab_topk, txt_tfidf_top_term,
    # td_gopher_filter, td_decontaminate (each 2+ rounds driver-green,
    # unchanged code, still mirror-checked every round).
    "td_passage_dup_fraction", "td_global_shuffle", "td_source_reputation",
    "sim_pq_codes", "sim_pq_adc_topk", "sim_pq_recall_audit",
    "txt_bpe_pairs", "txt_bigram_logprob", "sk_heavy_hitters",
    "td_corpus_report", "td_priority_dedup",
    # r9: t_subseq_search (r8-green; the temporal family keeps 6+
    # proven members) rotated out for the perceptual-hash media dedup
    # query's first driver row
    "mm_phash_dedup",
    # r9: ds_weighted_sample (r8-green, unchanged, mirror-checked; the
    # ds family keeps 3 other seats) rotated out for the duplicated-
    # span audit query's first driver row
    "dd_exact_substring_spans",
    # The 16 r6 additions — never driver-seen; rotated out for them
    # (all multiply driver-green in earlier rounds, most r1 + r5, and
    # still mirror-checked): txt_length_quantiles, j_dim_chain,
    # mm_resize, mm_frames, mm_meta, mm_features, dd_embedding,
    # dd_ngram_jaccard, dd_exact, ds_det_sample, ds_hash_split,
    # p_filter_project, so_union, a_dynamic_pivot, st_dedup, tpch_q4
    # late-r8 rotation: ds_stratified_sample, txt_pii_scrub and
    # sk_kmv_distinct (each 2 driver-green rounds, unchanged code,
    # still mirror-checked) rotated out for the three late-r8 queries'
    # first driver rows: pairwise KMV source overlap, IVF-PQ composed
    # serving, event-transition PageRank
    "sk_source_overlap", "sim_ivfpq_serve", "t_event_pagerank",
    # txt_boilerplate (r6+r7 driver-green; the txt family holds 7
    # other seats) rotated out for the r8 curriculum-order query
    # r10: td_pack_sequences (driver-green ×3, unchanged code, still
    # mirror-checked + benched) rotated out for the C4 line-cleaning
    # query's first driver row
    "txt_c4_clean", "td_curriculum_order",
    # ds_temperature_mix (r7-green; ds family keeps 5 window rows)
    # rotated out for the r8 NB quality classifier
    # t_scd2_intervals (r07 x2, unchanged, mirror-checked) rotated out
    # for the count-min sketch query's first driver row
    # sim_kmeans and t_funnel_stages (each r07 x2, unchanged,
    # mirror-checked) rotated out for the unigram tokenizer pair's
    # first driver rows
    # r10: the unigram pair's values CHANGED this round (6-dp ln
    # quantization + integer-math piece_ratio — the r9 verdict's float-
    # surface kill), so both stay pinned for fresh rows, joined by the
    # temporary per-word debug twin (txt_unigram_encode_words) so a
    # still-red encode hash decomposes into a row-level word diff
    "sk_cm_counts", "txt_unigram_pieces", "txt_unigram_encode",
    "txt_unigram_encode_words",
    "td_quality_classifier",
    # txt_langid_confusion (r6+r7 driver-green) rotated out for the r8
    # cluster-balance pruning query's first driver row
    # sim_semantic_dedup_audit (r6+r7 driver-green; the sim family
    # holds 8 other seats) rotated out for the frozen-tokenizer
    # BPE-encode query's first driver row
    "td_cluster_balance", "txt_bpe_encode",
    # txt_bm25_topk (r07 x2, unchanged, still benched + mirror-checked)
    # rotated out for the portable-HLL query's first driver row
    # r10: td_chunk_manifest (driver-green ×3, unchanged code, still
    # mirror-checked + benched) rotated out for the best-fit packing
    # query's first driver row (recursive-CTE-replayed FFD)
    "td_pack_bins", "sk_hll_distinct",
    # t_rolling_stats and t_gap_fill (both r7-green; the temporal
    # family keeps 6 other window rows) rotated out for dd_simhash and
    # sim_lsh_topk, which became oracle-able in r8 (portable md5
    # signatures/planes) and need their first hash-checked rows
    # t_retention_cohorts (r6+r7 driver-green; the temporal family
    # keeps 6 other window rows) rotated out for the r8 duplicated-
    # passage REMOVAL query's first driver row
    "td_dedup_passages", "sim_lsh_topk", "dd_simhash",
    # so_intersect and a_histogram (both r7-green, families multiply
    # proven) rotated out for the r8 storage-backed serve queries; the
    # mirror still checks them
    # td_length_balance (r6+r7 driver-green) rotated out for the r8
    # CCNet head/middle/tail perplexity split's first driver row
    "sim_ivf_serve", "td_perplexity_buckets", "sim_pq_serve",
    # continuous-build additions, never driver-seen (mirror-green):
    # containment dedup, stream-stream interval-join twin, unigram-LM
    # score, dedup-aware weights. Rotated out for them (all driver-
    # green r5 AND earlier rounds, still mirror-checked):
    # st_windowed_counts, t_asof_join, a_counters, a_rollup
    # r9: dd_containment (driver-green x2 cumulative, unchanged code,
    # mirror-checked + benched) rotated out for the IVF nprobe
    # recall/IO curve's first driver row
    # r10: ds_interleave (driver-green ×4 r6-r9, unchanged code, still
    # mirror-checked + benched) rotated out for the unigram words
    # twin; st_interval_join (×4 r6-r9, same standing) rotated out for
    # the r10 capability query — DOM-block main-content extraction
    "sim_ivf_recall_curve", "txt_main_content",
    # txt_unigram_logprob and td_dup_weights (each r07 x2, unchanged,
    # still mirror-checked) and t_ohlc_bars (r07, unchanged, mirror-
    # checked) rotated out for the continuation additions' first
    # driver rows: DSIR importance weights + resample, per-source KL
    # drift
    "td_dsir_weights", "ds_dsir_sample", "td_source_drift",
    # r7 rotation: the 9 queries that have never held a driver
    # CORRECTNESS row (mirror-green; ds_token_budget_mix's oracle twin
    # got a BIGINT cast this round so it lands driver-clean).  Rotated
    # out to make room — the 9 most-proven non-flagship rows, each with
    # 5-6 green driver rounds and unchanged code, all still checked by
    # the local mirror: tpch_q2, w_row_number_seq_scalable,
    # w_batch_ids_global, dd_embedding_blocked, dd_cluster, dd_minhash,
    # sim_brute_topk, sim_ivf_topk, txt_profile.
    # t_windowed_topk (r07-green, mirror-checked) rotated out for the
    # exact-quantiles query's first driver row
    # r10: t_rolling_wau (driver-green ×3, unchanged code, still
    # mirror-checked) rotated out for the r10 URL domain-blocklist
    # query's first driver row (UT1-style suffix-chain semi-join)
    "sk_exact_quantiles", "f_url_blocklist",
    # sk_binned_quantiles and ds_group_sample (each r07, unchanged,
    # mirror-checked) rotated out for the continuation's gate-agreement
    # and classifier-calibration queries' first driver rows
    "td_filter_agreement", "td_classifier_pr_curve",
    # ds_token_budget_mix (r07, unchanged, mirror-checked) rotated out
    # for the JL distance-preservation audit's first driver row
    "sim_jl_audit",
    # sim_range_search (r07, unchanged, mirror-checked) rotated out for
    # the URL canonicalization + refetch-dedup query's first driver row
    # w_percent_rank_scalable (r07, unchanged, mirror-checked) rotated
    # out for the classifier-AUC query's first driver row
    "f_url_dedup", "td_classifier_auc",
    # td_ngram_contamination (r07, unchanged, mirror-checked) rotated
    # out for the MMR diversified-retrieval query's first driver row
    "sim_mmr_topk",
    # r9: td_curate (driver-green r2-r8, ×7 — by far the most-proven
    # non-flagship row; still mirror-checked and benched every round)
    # rotated out for the r9 sliding-window ExactSubstr query's first
    # driver row — the one new capability this round
    "dd_exact_substring",
    # (txt_bpe_merges is rows-only; tools/inventory.py's ledger tracks
    # any registered query until it holds a driver row)
]


def _ordered(raw: dict) -> dict:
    out = {k: raw[k] for k in _PRIORITY if k in raw}
    out.update({k: v for k, v in raw.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    raw: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        raw.update(mod.SPARK_QUERIES)
    return _ordered(raw)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins for each query (same column names)."""
    raw: dict[str, str] = {}
    for mod in _modules():
        raw.update(mod.ORACLE_SQL)
    return _ordered(raw)
