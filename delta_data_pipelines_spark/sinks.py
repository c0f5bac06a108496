"""Batch sinks (SURVEY §2.1 S14).

Reference: ``utils_of_searchengine.py:163-219`` — ``send_batches``
slices transformed rows into batches of 200, POSTs each with
``batch_number``/``total_batches`` and bearer auth, fails fast on the
first non-2xx.

Spark shape: the rows live on executors, so the POST happens there too
(``foreachPartition``) — the driver never materializes the dataset.
Batch ids are assigned with the same W4 windowing the reference uses
(``i//200+1``); per-partition sub-batching keeps each HTTP payload at
``batch_size`` rows regardless of partition size. Fail-fast: an
exception in any partition fails the Spark job (the reference raises
on first bad response, :205-210).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PostFn = Callable[[list[dict[str, Any]], int], None]


def send_batches(
    df: DataFrame,
    post: PostFn,
    batch_size: int = 200,
) -> None:
    """POST ``df`` in row batches of ``batch_size`` from the executors.

    ``post(rows, batch_number)`` runs inside the executor process; it
    must be picklable and must raise to abort the job (fail-fast). The
    global batch numbering of the reference is per-partition here —
    (partition_id, batch_number) is the at-least-once idempotency key a
    receiving service should dedup on, the same contract its
    ``batch_number``/``total_batches`` header served.
    """

    def _run(partition: Iterator[Any]) -> None:
        buf: list[dict[str, Any]] = []
        n = 0
        for row in partition:
            buf.append(row.asDict(recursive=True))
            if len(buf) >= batch_size:
                n += 1
                post(buf, n)
                buf = []
        if buf:
            post(buf, n + 1)

    df.foreachPartition(_run)


GlobalPostFn = Callable[[list[dict[str, Any]], int, int], None]


def send_batches_global(
    df: DataFrame,
    post: GlobalPostFn,
    order_col: str,
    batch_size: int = 200,
) -> None:
    """S14 with the reference's EXACT numbering contract: every POST
    carries a globally sequential 1-based ``batch_number`` and the
    dataset-wide ``total_batches`` (utils_of_searchengine.py:183-196).

    ``post(rows, batch_number, total_batches)`` runs on executors.
    Rows are ordered by ``order_col`` (must be unique); batch N holds
    rows (N-1)*batch_size+1 .. N*batch_size of that order, exactly as
    the reference's ``i//200`` slicing. Scalable: the global rank is
    the range-partitioned offset pattern (operators.ranking) — no
    single-partition shuffle of the data; one extra count() job
    computes total_batches up front (the price of the global header).

    Use :func:`send_batches` (per-partition numbering) when the
    consumer doesn't need the global header — it skips the rank
    shuffle and the count entirely.
    """
    from .operators.ranking import global_rank_by_range

    total_rows = df.count()
    total_batches = -(-total_rows // batch_size)  # ceil
    ranked = global_rank_by_range(df, order_col)
    batched = ranked.withColumn(
        "_batch",
        (F.floor((F.col("global_rank") - 1) / batch_size) + 1).cast("long"),
    )

    def _run(partition: Iterator[Any]) -> None:
        groups: dict[int, list[tuple[int, dict[str, Any]]]] = {}
        for row in partition:
            d = row.asDict(recursive=True)
            bno = int(d.pop("_batch"))
            rank = int(d.pop("global_rank"))
            groups.setdefault(bno, []).append((rank, d))
        for bno in sorted(groups):
            rows = [d for _, d in sorted(groups[bno], key=lambda t: t[0])]
            post(rows, bno, total_batches)

    # co-locate each batch in one task so every POST is one whole batch
    batched.repartition("_batch").foreachPartition(_run)


def file_post(out_dir: str) -> PostFn:
    """A ``post`` implementation that lands each batch as a JSON file —
    the in-container stand-in for the HTTP service (also a useful
    audit sink in production: same pathway, object store target).
    """

    def post(rows: list[dict[str, Any]], batch_number: int) -> None:
        import os
        import uuid

        os.makedirs(out_dir, exist_ok=True)
        name = f"batch-{batch_number:05d}-{uuid.uuid4().hex[:8]}.json"
        with open(os.path.join(out_dir, name), "w") as f:
            json.dump(rows, f, default=str)

    return post
