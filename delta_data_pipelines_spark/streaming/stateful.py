"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no true streaming state — its nearest analog is the
crawler's running duplicate-ratio early-stop (divar_crawler.py:144-155),
a per-site counter carried across micro-batches. ``running_user_totals``
generalizes that: an arbitrary per-key accumulator that survives across
triggers, with the Arrow-batched pandas path (not row-at-a-time).

State is per-key and O(1) (two numbers), so a 1000-executor cluster
holds state for billions of keys in the state store; the shuffle is
keyed on user_id only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running (count, sum(value)) emitted every
    micro-batch in update mode. Requires a streaming DataFrame."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin with identical end-state semantics: what the stateful
    stream converges to once the source drains. Oracle-checkable."""
    from pyspark.sql import functions as F

    # sum runs exact in decimal so the result is partial-agg-order
    # independent (a float sum would drift vs the oracle), then lands
    # back in the OUT_SCHEMA double
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(20,6)")), 6)
        .cast("double")
        .alias("total_value"),
    )
