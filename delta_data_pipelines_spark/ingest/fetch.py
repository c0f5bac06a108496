"""Detail-fetch stage (SURVEY §2.1 S5).

Reference: per-URL GET loops on a Celery worker — JSON
(divar_fetcher.py:4-27, mrestate_fetcher.py:5-35), HTML + metadata
(kilid_fetcher.py:4-64), pass-through (sheypoor_fetcher.py:1-10) —
with 2-3 s sleeps per item (ST6 rate limiting) and per-item
try/except-continue.

Spark shape: the fetch runs INSIDE the executors over Arrow batches
(``mapInPandas``): a queue micro-batch of N URLs fans out across the
cluster instead of one worker's sequential loop. The HTTP call is an
injectable ``fetch_fn(url) -> str`` so the stage is testable offline
and rate limiting stays configurable (per-executor sleep = global
rate / executor count). Failures yield an error column, not a crash —
the reference's try/except-continue as data.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

FetchFn = Callable[[str], str]


def fetch_stage(
    df: DataFrame,
    fetch_fn: FetchFn,
    url_col: str = "content_url",
    sleep_s: float = 0.0,
) -> DataFrame:
    """URL rows → (all columns, body string, fetch_error string).

    ``fetch_fn`` must be picklable (module-level function or closure of
    simple values). One of body/fetch_error is NULL per row.
    """
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", body string, fetch_error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bodies: list[str | None] = []
            errors: list[str | None] = []
            for url in pdf[url_col]:
                try:
                    bodies.append(fetch_fn(url))
                    errors.append(None)
                except Exception as exc:  # per-item continue (ref behavior)
                    bodies.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}")
                if sleep_s:
                    time.sleep(sleep_s)
            out = pdf.copy()
            out["body"] = bodies
            out["fetch_error"] = errors
            yield out

    return df.mapInPandas(run, schema=out_schema)
