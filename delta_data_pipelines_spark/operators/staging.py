"""Staging primitives for multi-consumer frames.

Spark 4.1.2 reuses no identical exchanges (the r14 finding: 0
ReusedExchange anywhere, with and without AQE), so a subtree with two
or more consumers re-executes once per consumer unless it is
materialized. The repo's local staging primitive is the eager
``localCheckpoint`` — one materialization job, every consumer reads
an ExistingRDD. That is the BENCH posture, not the production one:
``localCheckpoint`` stores blocks on executor-local storage with no
lineage fallback, so on a real cluster one lost executor makes the
job unrecoverable mid-query.

At 100 TB the staged frames are exactly the artifacts a production
run writes to storage anyway (KN type tables are the frozen LM, the
vocabulary is the tokenizer's stored table, the labeled frame is a
curation intermediate). :func:`stage` makes that posture real:

    spark.conf.set("spark.delta_pipelines.staging.dir", "/warehouse/_staging")

switches every ``stage()`` site to write-parquet-and-read-back —
fault-tolerant, resumable, and the written table collapses duplicated
upstream work exactly like the checkpoint does. With the conf unset
(the driver's bench session), plans are byte-identical to the
previous eager-localCheckpoint form.

Every invocation writes a fresh uuid-suffixed path — staged frames
are intra-query intermediates, never cross-run caches.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

_DIR_CONF = "spark.delta_pipelines.staging.dir"
_RANK_CONF = "spark.delta_pipelines.rank.stageParts"


def _staging_dir(df: DataFrame) -> str | None:
    try:
        return df.sparkSession.conf.get(_DIR_CONF, None)
    except Exception:
        return None


def stage(df: DataFrame, name: str) -> DataFrame:
    """Materialize a multi-consumer frame once.

    Default (conf unset): eager ``localCheckpoint`` — the local bench
    form, byte-identical plans to the pre-r15 call sites. With
    ``spark.delta_pipelines.staging.dir`` set: write the frame to a
    uuid-suffixed parquet table under that dir and read it back — the
    fault-tolerant production form (a lost executor recomputes from
    storage instead of killing the job).
    """
    sdir = _staging_dir(df)
    if sdir:
        path = f"{sdir.rstrip('/')}/{name}-{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    return df.localCheckpoint(eager=True)


def stage_rank_parts(parts: DataFrame) -> DataFrame:
    """Optionally pin a range-partitioned frame consumed by two
    branches (the rank/cumsum operators' counts + window arms).

    Why a gate exists at all: ``repartitionByRange`` samples its
    boundaries with an rdd.id-seeded sketch, and the two consuming
    branches each execute their OWN instance of the exchange (no
    reuse). At sf the sampler sees the full data, so both instances
    draw identical boundaries and the offsets stay consistent with
    the local ranks; at partial-sampling scale the two draws could in
    principle differ — a row near a boundary would then land in
    different ``_pid`` per evaluation, duplicating/skipping global
    ranks (r14 ADVICE #1). Staging ``parts`` pins ONE draw and also
    collapses the duplicated exchange + boundary-sampling pass (the
    r14 "not yet optimized" #3).

    Local default OFF: the eager materialization job measured slower
    than re-shuffling the row-light frame (1.16 → 1.42 s at sf0.1,
    r14), and plans must stay byte-identical for the driver's bench.
    On a cluster set ``spark.delta_pipelines.rank.stageParts=true``
    (checkpoint form) or ``spark.delta_pipelines.staging.dir`` (the
    fault-tolerant written form, which implies staging here too).
    """
    sdir = _staging_dir(parts)
    if sdir:
        return stage(parts, "rank_parts")
    try:
        flag = parts.sparkSession.conf.get(_RANK_CONF, "false")
    except Exception:
        flag = "false"
    if str(flag).lower() == "true":
        return parts.localCheckpoint(eager=True)
    return parts


def release_staged(df: DataFrame) -> None:
    """Release the executor-storage blocks behind a staged frame —
    both ``persist()`` entries (CacheManager) and eager
    ``localCheckpoint`` frames, whose backing RDD is persisted OUTSIDE
    the CacheManager (``DataFrame.unpersist`` alone does not touch
    it). Written-table frames have no blocks to release; every branch
    is best-effort (release hygiene must never fail an operator)."""
    try:
        df.unpersist()
    except Exception:
        pass
    try:
        jplan = df._jdf.queryExecution().analyzed()
        if jplan.getClass().getSimpleName() == "LogicalRDD":
            jplan.rdd().unpersist(False)
    except Exception:
        pass
