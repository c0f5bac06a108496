"""Continuous aggregates: streaming rollups maintained incrementally.

The reference rebuilds its search index nightly and patches it hourly
(SURVEY §3.3); the same maintain-a-derived-table shape applied to
aggregates is the "continuous aggregate" / hypertable-rollup pattern:
a windowed aggregate kept fresh by merging each micro-batch's window
deltas into a versioned result table.

Update-mode emissions re-send a window every time it changes; the
MERGE keyed on (window_start, group) makes re-delivery idempotent, so
the rollup table converges to exactly the batch aggregate once the
source drains — tested in tests/test_streaming.py.

At scale: state is bounded by the watermark; the rollup table is
partitioned by window_start so each merge touches only recent
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..storage import VersionedTable
from .pipeline import windowed_event_counts


def run_rollup(
    events_stream: DataFrame,
    rollup: VersionedTable,
    checkpoint_dir: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    agg_fn=None,
    keys: tuple[str, ...] = ("window_start", "event_type"),
) -> StreamingQuery:
    """events stream → watermarked windowed aggregate → MERGE upsert.

    ``agg_fn`` generalizes the rollup to ANY single-aggregation
    windowed expression usable in both batch and streaming mode (e.g.
    ``pipeline.windowed_ohlc``); it is called with the same
    ``(events, window=..., watermark=...)`` signature as the default
    tumbling count/sum, so the caller's grain always applies. ``keys``
    are the window grain the MERGE upserts on."""
    agg = (agg_fn or windowed_event_counts)(
        events_stream, window=window, watermark=watermark
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        rollup.merge(
            batch_df,
            keys=list(keys),
            when_matched="update",
        )

    return (
        agg.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
