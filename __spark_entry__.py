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
    # r14 window (VERDICT r13 ask #1): keep the flagship 3; give the
    # four r13 first-rows their SECOND driver rounds (the KN pair's
    # oracles mirror a five-rung backoff ladder term by term and
    # deserve the stability proof; the ensemble + logreg-PR pair also
    # changed code this round — shared-staging scores + persist, both
    # hash-neutral by mirror); re-seat td_classifier_agreement and
    # td_classifier_pr_curve for the same code-changed reason; seat
    # the FOUR NEW r14 queries (the per-language KN oracles at both
    # orders — production CCNet shape, r13 ask #3 — the 4-gram KN
    # completing the KenLM ladder, and the ensemble audit at the
    # FROZEN calibrated operating point, ask #5); fill the
    # remaining 37 seats strictly stalest-first per the recounted
    # ledger: the two r5 x5 veterans, the nine r6 x5/x6 veterans,
    # the r8 pair, the r9 batch, the four r10 x2 rows, and the r10
    # x3 sim/sk families (includes sk_heavy_hitters — the round's
    # remeasure watch gets a fresh driver reading too). Everything
    # rotated out holds >=2 greens on unchanged code and stays
    # mirror-checked every round by tools/check.py.
    # flagship
    "search_index_full", "search_index_incremental", "search_index_fetch_by_id",
    # r13 first-rows, second rounds (KN pair unchanged; ensemble +
    # logreg PR re-prove changed staging/persist)
    "txt_kn_logprob", "txt_kn3_logprob", "td_classifier_ensemble",
    "td_logreg_pr_curve",
    # code-changed this round: shared verdict staging / persist
    "td_classifier_agreement", "td_classifier_pr_curve",
    # NEW r14: per-language KN at both orders (one KenLM per
    # language), the 4-gram KN completing the KenLM ladder, and the
    # calibrated-operating-point ensemble audit (sk_source_overlap
    # and sk_hll_distinct, the last r10 x3 fillers, yielded seats
    # and stay mirror-checked)
    "txt_kn_lang_logprob", "txt_kn3_lang_logprob", "txt_kn4_logprob",
    "td_ensemble_calibrated",
    # stalest x5 veterans: last green r5
    "f_translate", "txt_topk_per_source",
    # stalest veterans: last green r6
    "dd_cluster", "dd_embedding_blocked", "tpch_q2",
    "w_batch_ids_global", "w_row_number_seq_scalable", "dd_minhash",
    "sim_brute_topk", "sim_ivf_topk", "txt_profile",
    # last green r8
    "dd_containment", "td_curate",
    # last green r9
    "t_rolling_wau", "td_chunk_manifest", "td_pack_sequences",
    "ds_interleave", "st_interval_join",
    # last green r10, two rows held
    "dd_exact_substring", "dd_exact_substring_spans", "mm_phash_dedup",
    "sim_ivf_recall_curve",
    # last green r10, three rows held: the sim/sk families
    "dd_simhash", "ds_dsir_sample", "f_url_dedup", "sim_ivf_serve",
    "sim_ivfpq_serve", "sim_jl_audit", "sim_lsh_topk", "sim_mmr_topk",
    "sim_pq_adc_topk", "sim_pq_codes", "sim_pq_recall_audit",
    "sim_pq_serve", "sk_cm_counts", "sk_exact_quantiles",
    "sk_heavy_hitters",
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
