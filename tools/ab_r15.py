"""Interleaved same-session A/B for the five r14 touched-code
regressions the r14 verdict flagged (>1.3 normalized on the degraded
box): td_pack_sequences / w_percent_rank_scalable / w_batch_ids_global
(the range-rank counts change, b6212b5), dd_minhash (in-array pairs,
6aa2ee4), td_logreg_quality (staged feature explode + step-1 closed
form, d7aeae6), td_lang_keep_rate (broadcast funnel joins + eager
checkpoint staging, 00c6ca2/dfc1b2e).

Each query runs its CURRENT form against its pre-change (61b521d)
form, reconstructed here verbatim and applied by monkeypatching the
operator/query seam — alternating run-by-run in ONE session (order
flipped each round so ambient drift cancels), median per arm, noop
sink, bench session. Verdict rule (r14 VERDICT #1): keep the change
if new/old <= 1.15, otherwise revert it.

    python tools/ab_r15.py [query ...]        # default: all five
    SPARK_GRAFT_AB_ROUNDS=5 python tools/ab_r15.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


# ---------------------------------------------------------------- old forms
# verbatim reconstructions of the 61b521d (pre-r14-optimization) code


def _old_global_rank_by_range(df, key, n_parts=32):
    parts = df.repartitionByRange(n_parts, key).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy(key)
    local = parts.withColumn("_rn", F.row_number().over(w_local))
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("global_rank", F.col("_off") + F.col("_rn"))
        .drop("_pid", "_rn", "_off")
    )


def _old_grouped_rank_by_range(df, group, key, n_parts=32):
    parts = df.repartitionByRange(
        n_parts, F.col(group), F.col(key)
    ).withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_pid", group).orderBy(key)
    local = parts.withColumn("_rn", F.row_number().over(w_local))
    counts = local.groupBy("_pid", group).agg(F.count("*").alias("_cnt"))
    w_off = (
        Window.partitionBy(group)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0))
    ).select("_pid", group, "_off")
    return (
        local.join(offsets, ["_pid", group])
        .withColumn("group_rank", F.col("_off") + F.col("_rn"))
        .drop("_pid", "_rn", "_off")
    )


def _alt_global_cumsum_by_range(df, key, val, n_parts=32):
    """CANDIDATE (not a revert): totals off the pre-window frame —
    the b6212b5 fix applied to the cumsum twin (the r14 change never
    touched it; sum(val) per partition doesn't need the sorted
    window output)."""
    parts = df.repartitionByRange(n_parts, key).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = parts.withColumn(
        "_cum_local", F.coalesce(F.sum(val).over(w_local), F.lit(0))
    )
    totals = parts.groupBy("_pid").agg(F.sum(val).alias("_tot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("cum_before", F.col("_off") + F.col("_cum_local"))
        .drop("_pid", "_cum_local", "_off")
    )


def _old_candidates(banded, id_col, max_bucket):
    bucket_w = Window.partitionBy("band_id", "band_hash")
    banded = banded.withColumn("_n", F.count("*").over(bucket_w)).where(
        F.col("_n") <= max_bucket
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def _old_logreg_train(docs, label_col, id_col="doc_id", text_col="text",
                      n_buckets=64, steps=2, lr=0.5):
    from pyspark.storagelevel import StorageLevel

    from delta_data_pipelines_spark.operators.textstats import logreg_features

    feats = logreg_features(
        docs, id_col, text_col, n_buckets, label_col=label_col
    ).persist(StorageLevel.MEMORY_AND_DISK)
    nd = feats.select(id_col).distinct().agg(F.count("*").alias("_nd"))

    def new_weights(resid_df, prev):
        grads = (
            feats.join(resid_df, id_col)
            .groupBy("_bucket")
            .agg(F.sum(F.col("_resid").cast("decimal(28,6)")).alias("_gr"))
        ).crossJoin(F.broadcast(nd))
        if prev is not None:
            grads = grads.join(F.broadcast(prev), "_bucket", "left")
        else:
            grads = grads.withColumn("_wt", F.lit(None).cast("double"))
        return grads.select(
            "_bucket",
            F.round(
                F.coalesce(F.col("_wt"), F.lit(0.0))
                - lr * F.col("_gr").cast("double") / F.col("_nd"),
                6,
            ).alias("_wt"),
        )

    weights = new_weights(
        feats.select(id_col, (F.lit(0.5) - F.col("_y")).alias("_resid"))
        .groupBy(id_col)
        .agg(F.first("_resid").alias("_resid")),
        None,
    ).localCheckpoint(eager=True)
    for _ in range(steps - 1):
        z = (
            feats.join(F.broadcast(weights), "_bucket", "left")
            .groupBy(id_col, "_y")
            .agg(
                F.sum(
                    F.coalesce(F.col("_wt"), F.lit(0.0)).cast("decimal(28,6)")
                ).alias("_z")
            )
        )
        resid = z.select(
            id_col,
            (
                F.round(
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(-F.round(F.col("_z").cast("double"), 6))
                    ),
                    6,
                )
                - F.col("_y")
            ).alias("_resid"),
        )
        weights = new_weights(resid, weights).localCheckpoint(eager=True)
    return weights.select(
        F.col("_bucket").alias("bucket"), F.col("_wt").alias("weight")
    )


def _old_logreg_score(docs, weights, id_col="doc_id", text_col="text",
                      n_buckets=64):
    from delta_data_pipelines_spark.operators.textstats import logreg_features

    feats = logreg_features(docs, id_col, text_col, n_buckets)
    return (
        feats.join(
            F.broadcast(weights), feats["_bucket"] == weights["bucket"], "left"
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_features"),
            F.sum(
                F.coalesce(F.col("weight"), F.lit(0.0)).cast("decimal(28,6)")
            ).alias("_s"),
        )
        .select(
            id_col,
            "n_features",
            F.col("_s").cast("double").alias("lr_score"),
            (F.col("_s") >= 0).alias("pred_pos"),
        )
    )


def _old_td_logreg_quality(spark, sf_dir):
    from delta_data_pipelines_spark.operators import dedup
    from delta_data_pipelines_spark.operators.textstats import quality_score
    from delta_data_pipelines_spark.queries.training_data import read_table

    d = dedup._spread(read_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", (quality_score(F.col("text")) >= 0.5).alias("_lbl")
    )
    weights = _old_logreg_train(
        d, "_lbl", "doc_id", "text", n_buckets=64, steps=2, lr=0.5
    )
    return _old_logreg_score(d, weights, "doc_id", "text", 64).orderBy("doc_id")


def _old_td_lang_keep_rate(spark, sf_dir):
    from pyspark.storagelevel import StorageLevel

    from delta_data_pipelines_spark.operators import dedup, langcurate
    from delta_data_pipelines_spark.queries.training_data import read_table

    d = dedup._spread(read_table(spark, sf_dir, "documents"))
    flagged = langcurate.lang_gate(
        d, "doc_id", "text", keep_cols=("text",), flag_col="_keep"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    all_counts = flagged.groupBy("lang").agg(F.count("*").alias("n_docs"))
    kept = flagged.where(F.col("_keep")).select("doc_id", "lang", "text")
    scores = langcurate.lang_lm_scores(kept, "doc_id", "text", "lang")
    final = langcurate.lang_lm_tail_cut(scores, "doc_id", tail=0.1)
    gate_counts = kept.groupBy("lang").agg(F.count("*").alias("n_gate_kept"))
    fin_counts = final.groupBy("lang").agg(F.count("*").alias("n_final"))
    return (
        all_counts.join(gate_counts, "lang", "left")
        .join(fin_counts, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce("n_gate_kept", F.lit(0)).alias("n_gate_kept"),
            F.coalesce("n_final", F.lit(0)).alias("n_final"),
            F.round(
                F.coalesce("n_gate_kept", F.lit(0)) / F.col("n_docs"), 9
            ).alias("gate_keep_rate"),
            F.round(
                F.coalesce("n_final", F.lit(0)) / F.col("n_docs"), 9
            ).alias("final_keep_rate"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------------------- arm plumbing


def _patched(module, attr, repl):
    """Context-manager-free swap helper: returns (apply, restore)."""
    orig = getattr(module, attr)

    def apply():
        setattr(module, attr, repl)

    def restore():
        setattr(module, attr, orig)

    return apply, restore


def main() -> int:
    from delta_data_pipelines_spark.operators import dedup, ranking
    from delta_data_pipelines_spark.queries import training_data as td

    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "5"))

    # (query name, new fn(spark, sf), patches for the OLD arm)
    cases = {
        # ALT arm here is the cumsum counts-off-parts CANDIDATE (the
        # r14 change never touched td_pack_sequences' operator):
        # verdict "keep" means keep CURRENT; adopt the candidate when
        # new_over_old is clearly above 1 (old == candidate arm).
        "td_pack_sequences": (
            td.td_pack_sequences,
            [(ranking, "global_cumsum_by_range", _alt_global_cumsum_by_range)],
            None,
        ),
        "w_percent_rank_scalable": (
            None,  # resolved from the registry below
            [(ranking, "grouped_rank_by_range", _old_grouped_rank_by_range),
             (ranking, "global_rank_by_range", _old_global_rank_by_range)],
            None,
        ),
        "w_batch_ids_global": (
            None,
            [(ranking, "grouped_rank_by_range", _old_grouped_rank_by_range),
             (ranking, "global_rank_by_range", _old_global_rank_by_range)],
            None,
        ),
        "w_row_number_seq_scalable": (
            None,
            [(ranking, "grouped_rank_by_range", _old_grouped_rank_by_range),
             (ranking, "global_rank_by_range", _old_global_rank_by_range)],
            None,
        ),
        "dd_minhash": (
            td.dd_minhash,
            [(dedup, "_candidates", _old_candidates)],
            None,
        ),
        "td_logreg_quality": (
            td.td_logreg_quality,
            [],
            _old_td_logreg_quality,
        ),
        "td_lang_keep_rate": (
            td.td_lang_keep_rate,
            [],
            _old_td_lang_keep_rate,
        ),
    }

    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(cases)

    spark = bench.build_session(cpus, app_name="ab-r15")
    import __spark_entry__ as entrymod

    registry = entrymod.queries()

    out = {"sf_dir": sf_dir, "rounds": rounds,
           "loadavg_start": round(os.getloadavg()[0], 2), "queries": {}}
    for name in names:
        new_fn, patches, old_query = cases[name]
        if new_fn is None:
            new_fn = registry[name]

        swaps = [_patched(mod, attr, repl) for mod, attr, repl in patches]

        def run_new():
            t0 = time.perf_counter()
            new_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        def run_old():
            for apply, _ in swaps:
                apply()
            try:
                fn = old_query if old_query is not None else new_fn
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                return time.perf_counter() - t0
            finally:
                for _, restore in swaps:
                    restore()

        # one untimed warmup per arm, then alternate, flipping order
        run_new(); bench._reset_session_state(spark)
        run_old(); bench._reset_session_state(spark)
        ts_new, ts_old = [], []
        for r in range(rounds):
            order = (run_new, ts_new), (run_old, ts_old)
            if r % 2:
                order = order[::-1]
            for fn, sink in order:
                sink.append(fn())
                bench._reset_session_state(spark)
        med_new = statistics.median(ts_new)
        med_old = statistics.median(ts_old)
        out["queries"][name] = {
            "new_median": round(med_new, 3),
            "old_median": round(med_old, 3),
            "new_over_old": round(med_new / med_old, 3),
            "new_samples": [round(t, 3) for t in ts_new],
            "old_samples": [round(t, 3) for t in ts_old],
            "verdict": "keep" if med_new / med_old <= 1.15 else "REVERT",
        }
        print(json.dumps({name: out["queries"][name]}), flush=True)
    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
