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
    # r13 window (VERDICT r12 ask #2): keep the flagship 3; give the
    # three r12 first-rows their SECOND driver rounds (the logreg
    # pair's values changed late in r12 via the GD fix, and
    # td_classifier_agreement's plan changed this round — persist,
    # hash-neutral by mirror — so a second green row proves them
    # stable); keep txt_main_content for its second consecutive green
    # on the r12-changed values (the unigram-pair precedent); seat
    # the NEW r13 ensemble-gate audit (first row); seat the four
    # verdict-named next-stalest x2 veterans (yielded their r12
    # seats); fill the remaining 38 seats with the stalest by
    # (last-green round) per the ledger — the 12 last green in r4
    # (the f_* scalar batch + the tpch tail), f_regex_extract_cast,
    # the 22 last green in r5 (the a_* grouping family, the st_*
    # streaming twins, the temporal joins, the tpch head), the two
    # r5 x5 veterans, and dd_cluster (r6). Everything rotated out
    # holds >=2 greens on unchanged code and stays mirror-checked
    # every round by tools/check.py.
    # flagship
    "search_index_full", "search_index_incremental", "search_index_fetch_by_id",
    # r12 first-rows, second rounds
    "txt_gopher_lines", "td_logreg_quality", "td_classifier_agreement",
    # second consecutive green on the r12-changed values
    "txt_main_content",
    # NEW r13: ensemble-gate audit (NB+logreg AND/OR confusion vs the
    # seed labels — the curate classifier="both" decision table)
    "td_classifier_ensemble",
    # next-stalest x2 veterans (yielded their seats in r12)
    "txt_vocab_topk", "txt_unigram_logprob", "txt_tfidf_top_term",
    "txt_repetition",
    # stalest x3 veterans: last green r4
    "f_age_build_year", "f_case_buckets", "f_json_struct",
    "f_toman_parse", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q16",
    "tpch_q18", "tpch_q19", "tpch_q22", "tpch_q6",
    "f_regex_extract_cast",
    # stalest x4 veterans: last green r5
    "a_counters", "a_cube", "a_dynamic_pivot", "a_rollup",
    "f_date_arithmetic", "f_enum_normalize", "f_json_navigation",
    "f_relative_dates", "f_string_ops", "st_dedup",
    "st_running_totals", "st_session_windows", "st_sliding_counts",
    "st_windowed_counts", "t_asof_join", "t_asof_join_tolerance",
    "t_range_join", "tpch_q1", "tpch_q10", "tpch_q3", "tpch_q4",
    "tpch_q5",
    # NEW r13: the interpolated Kneser-Ney family (the CCNet/KenLM
    # estimator; fit on the even half, every backoff rung live via
    # the deterministic tok<doc_id> augmentation) at orders 1 and 2,
    # and the logreg PR sweep (td_classifier_pr_curve's linear twin)
    # — dd_cluster (r6 x5), txt_topk_per_source (r5 x5) and
    # f_translate (r5 x5), the least-stale fillers, yielded the seats
    "txt_kn_logprob", "txt_kn3_logprob", "td_logreg_pr_curve",
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
