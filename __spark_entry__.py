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
    # r12 window (VERDICT r11 ask #3): every oracle-able query now has
    # a green driver row, so rotation is pure aging — keep the
    # flagship 3; keep the unigram pair (second CONSECUTIVE green
    # proves the r11 fix stable across driver DuckDB versions); keep
    # the four r11 first-rows for their second rounds; re-seat
    # dd_ngram_jaccard + so_union (yielded their seats to the r11
    # queries); fill the remaining 39 seats with the stalest x2
    # veterans by LAST-GREEN round per the ledger — the 7 last green
    # in r5 (the mm_* family, dd_embedding, ds_det_sample,
    # txt_length_quantiles) and the 32 last green in r7 (the tpch
    # tail, the temporal/t_* family, the r5-era text signals —
    # txt_langid_confusion also re-proves its regenerated
    # shared-fragment oracle). Everything rotated out holds >=2
    # greens on unchanged code and stays mirror-checked every round
    # by tools/check.py. Tail seats yield first to new r12 queries.
    # flagship
    "search_index_full", "search_index_incremental", "search_index_fetch_by_id",
    # unigram pair, second consecutive green
    "txt_unigram_encode", "txt_unigram_encode_words",
    # r11 first-rows, second rounds
    "td_lang_gate", "td_lang_keep_rate", "txt_gopher_repetition",
    "td_dedup_sentence_spans",
    # re-seated after yielding to the r11 queries
    "dd_ngram_jaccard", "so_union",
    # stalest x2 veterans: last green r5
    "dd_embedding", "ds_det_sample", "mm_features", "mm_frames",
    "mm_meta", "mm_resize", "txt_length_quantiles",
    # r12 new queries: Gopher line-granularity duplicate signals and
    # the unrolled-GD linear quality classifier — first driver rows
    # (tail seats yielded by txt_vocab_topk and txt_unigram_logprob)
    "txt_gopher_lines", "td_logreg_quality", "td_classifier_agreement",
    # re-seated: its OUTPUT VALUES changed this round (kept blocks now
    # join with newlines; oracle updated in step) — the window rule is
    # "changed values: prior greens don't carry", exactly the class
    # the unigram pair's r8-r10 reds taught (txt_tfidf_top_term
    # yielded the seat)
    "txt_main_content",
    # stalest x2 veterans: last green r7
    "a_histogram", "ds_stratified_sample", "ds_temperature_mix",
    "sim_kmeans", "sim_semantic_dedup_audit", "sk_kmv_distinct",
    "so_intersect", "t_funnel_stages", "t_gap_fill",
    "t_retention_cohorts", "t_rolling_stats", "t_scd2_intervals",
    "td_decontaminate", "td_dup_weights", "td_gopher_filter",
    "td_length_balance", "tpch_q11", "tpch_q15", "tpch_q17",
    "tpch_q20", "tpch_q21", "tpch_q7", "tpch_q8", "tpch_q9",
    "txt_bm25_topk", "txt_boilerplate", "txt_langid_confusion",
    "txt_pii_scrub",
    # txt_vocab_topk, txt_unigram_logprob, txt_tfidf_top_term and
    # txt_repetition (x2, last green r7) yielded seats to the three
    # new r12 queries and the changed-values txt_main_content
    # re-seat; next-stalest for r13
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
