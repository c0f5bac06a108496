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
    # r11 window (VERDICT r10 ask #4): keep the flagship 3 + the
    # unigram pair (their values CHANGED again this round — all-BIGINT
    # outputs, de-LATERALed oracle DP — so prior reds/greens don't
    # carry) + the four r10 first-row greens for their second rounds
    # (td_pack_bins' values also changed: the walk is now true
    # best-fit-decreasing). Rotate OUT every row holding >=2 green
    # driver rounds on unchanged code (the r8 first-row batch at x3,
    # mm_phash_dedup / dd_exact_substring(+spans) /
    # sim_ivf_recall_curve at x2, the DSIR/classifier family — all
    # still mirror-checked every round by tools/check.py). Rotate IN:
    # every remaining x1 veteran (31 — mostly the r1-green relational/
    # scalar core that has never held a second row), the two rows-only
    # queries for their first driver rows-only rows (txt_bpe_merges,
    # txt_compression_ratio), and the stalest x2 rows (greens r1+r5)
    # to fill the tail — those tail seats yield first to any new r11
    # queries.
    # flagship
    "search_index_full", "search_index_incremental", "search_index_fetch_by_id",
    # unigram pair: red r8-r10 on hash only; r11 removes the last two
    # version-sensitive oracle surfaces (DECIMAL cast, LATERAL-in-
    # recursion) — these rows are the round's primary signal
    "txt_unigram_encode", "txt_unigram_encode_words",
    # r10 first-row greens, second rounds
    "txt_c4_clean", "f_url_blocklist", "txt_main_content", "td_pack_bins",
    # x1 veterans: r1-green core, never re-seen since
    "a_count_distinct", "a_distinct", "a_dup_ratio", "a_eav_pivot",
    "a_grouping_sets", "a_min_agg",
    "d_anti_join", "d_exact_dedup", "d_semi_join",
    "m_melt_eav", "m_rename_reorder", "m_unpivot",
    "p_na_clean", "p_null_membership",
    "so_except", "txt_enum_lookup",
    "w_batch_ids", "w_first_match", "w_positional_zip",
    "w_row_number_seq", "w_sort_limit",
    # x1 veterans: r7/r8 singles
    "ds_group_sample", "ds_token_budget_mix", "ds_weighted_sample",
    "sim_range_search", "sk_binned_quantiles", "t_ohlc_bars",
    "t_subseq_search", "t_windowed_topk", "td_ngram_contamination",
    "w_percent_rank_scalable",
    # rows-only queries (no oracle twin by design): first driver
    # rows-only rows
    "txt_bpe_merges", "txt_compression_ratio",
    # r11 new queries: language-aware curation (per-language gate
    # thresholds + per-language LM tail cut), the full Gopher
    # repetition suite, and C4 sentence-span dedup — first driver rows
    "td_lang_gate", "td_lang_keep_rate", "txt_gopher_repetition",
    "td_dedup_sentence_spans",
    # stalest x2 rows (green r1+r5 only) — tail seats, first to yield
    # (with the 4 new queries seated, dd_ngram_jaccard and so_union
    # fall past seat 50 this round; both stay mirror-checked)
    "j_dim_chain", "dd_exact", "ds_hash_split", "p_filter_project",
    "dd_ngram_jaccard", "so_union",
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
