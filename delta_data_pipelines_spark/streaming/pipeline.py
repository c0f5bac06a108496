"""Structured Streaming ingestion.

The reference's queue consumption is scheduled micro-batch: a deferred
RabbitMQ sensor drains ≤50 messages / 60 s (rabbitmq_utils.py:42-137,
fetcher_dag_factory.py:74-79), at-least-once with downstream dedup
(Mongo unique index). Spark-native shape:

    file-source readStream over the queue table's data files
      (maxFilesPerTrigger ↔ the bounded batch, ST2)
    → site transformer (same DataFrame fn as batch — one code path)
    → foreachBatch MERGE into the listings table
      (idempotent insert-if-absent ↔ ST4's exactly-once effect)

``trigger(availableNow=True)`` reproduces the cron-driven "drain what's
there and stop" semantics (ST1); a processingTime trigger turns the
same pipeline into a long-running service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..storage import VersionedTable


def _with_event_time(events: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to session-TZ ``TIMESTAMP``.

    Spark ≥4.1 reads parquet TIMESTAMP(NANOS) as ``TIMESTAMP_NTZ``,
    which ``withWatermark`` rejects (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
    The session TZ is pinned UTC, so the cast is value-identical; for a
    column that is already ``timestamp`` this is a no-op in the plan.
    """
    if dict(events.dtypes).get(col) == "timestamp_ntz":
        return events.withColumn(col, F.col(col).cast("timestamp"))
    return events


def queue_stream(
    spark: SparkSession,
    data_dir: str,
    schema: StructType,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Bounded micro-batch stream over a directory of parquet files
    (the queue table's snapshot dir, or any landing zone)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(data_dir)


def run_fetch_pipeline(
    stream: DataFrame,
    transformer,
    listings: VersionedTable,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """queue stream → transform → idempotent MERGE sink.

    ``foreachBatch`` gets the same batch DataFrame the offline path
    uses, so transformers are written once. Re-delivered messages
    (at-least-once) no-op in the MERGE — the engine's version of
    "DuplicateKeyError: skip".
    """

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        out = transformer(batch_df)
        listings.merge(out, keys=["content_url"])

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregate (ST5 — absent in the
    reference, native here). Works on a batch OR streaming events
    DataFrame: same expression, so the batch twin is oracle-checkable.
    """
    return (
        _with_event_time(events)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum(F.col("value").cast("decimal(20,6)")), 6)
            .cast("double")
            .alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window aggregate: each event lands in window/slide
    overlapping windows (epoch-aligned, like the tumbling case)."""
    return (
        _with_event_time(events)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum(F.col("value").cast("decimal(20,6)")), 6)
            .cast("double")
            .alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_event_stats(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user session windows: a session closes after ``gap`` of
    inactivity. ``session_window`` keeps this a single shuffle on
    (user_id) — state is per-key and bounded by the watermark in
    streaming mode. Batch twin = gaps-and-islands SQL."""
    return (
        _with_event_time(events)
        .withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum(F.col("value").cast("decimal(20,6)")), 6)
            .cast("double")
            .alias("total_value"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper_seconds: int,
    watermark: str = "20 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: pairs on the same key
    with ``right_ts`` in ``[left_ts, left_ts + upper]``.

    ``how='left_outer'`` emits unmatched LEFT rows (right columns
    NULL) — but only once the watermark passes ``left_ts + upper``,
    when absence is PROVABLE: until then a match could still arrive,
    so outer results trail the inner ones by the watermark delay
    (Spark's stream-stream outer-join contract; the batch twin emits
    them immediately, and convergence-to-batch is what the tests
    pin). ``right_outer`` mirrors it. Outer modes are exactly why the
    join condition must bound BOTH event-time columns: without the
    two-sided bound Spark cannot prove when a row is unmatchable and
    rejects the outer join outright.

    In streaming mode both sides carry a watermark and the join
    condition bounds both event-time columns, so Spark derives the
    state-retention window per side — a left row is held only until
    the watermark passes ``left_ts + upper``, making join state
    BOUNDED however long the streams run (the requirement for
    stream-stream joins at 100 TB/day). In batch mode ``withWatermark``
    is a no-op and the same expression is a plain interval join — the
    oracle-checkable twin.

    ``left_ts`` and ``right_ts`` must be distinct names (rename before
    calling); the right key column is dropped from the output. The key
    equality is alias-qualified — both sides often derive from the
    same scan (one topic filtered two ways), where an unqualified
    ``left[key] == right[key]`` would hit the self-join ambiguity.
    """
    l = _with_event_time(left, left_ts).withWatermark(left_ts, watermark).alias("_sj_l")
    r = (
        _with_event_time(right, right_ts)
        .withWatermark(right_ts, watermark)
        .alias("_sj_r")
    )
    cond = (
        (F.col(f"_sj_l.{key}") == F.col(f"_sj_r.{key}"))
        & (F.col(f"_sj_r.{right_ts}") >= F.col(f"_sj_l.{left_ts}"))
        & (
            F.col(f"_sj_r.{right_ts}")
            # a literal INTERVAL, not make_dt_interval(...): Spark's
            # StreamingJoinHelper derives the per-side state-eviction
            # watermark only from interval LITERALS — with the function
            # form the outer-join modes are rejected outright (it
            # cannot prove when an unmatched row becomes emittable)
            <= F.col(f"_sj_l.{left_ts}")
            + F.expr(f"INTERVAL {int(upper_seconds)} SECONDS")
        )
    )
    if how not in ("inner", "left_outer", "right_outer"):
        raise ValueError(
            f"how must be inner/left_outer/right_outer, got {how!r}"
        )
    out = l.join(r, cond, how)
    # keep the side that is always present; under left_outer the right
    # key is NULL on unmatched rows (and vice versa)
    drop_side = "_sj_r" if how != "right_outer" else "_sj_l"
    return out.drop(F.col(f"{drop_side}.{key}"))


def windowed_ohlc(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time OHLC bars per event type over RAW events, batch OR
    streaming. ONE aggregation (streaming allows no second, so there
    is no (type, ts) pre-dedup); open/close tie-break deterministically
    on (ts, event_id) via ``min_by``/``max_by`` over the struct, so
    the batch twin and every streaming re-emission of a window compute
    the identical value. Feed to ``rollup.run_rollup(agg_fn=
    windowed_ohlc)`` for an incrementally maintained bars table.

    NOT numerically equal to ``queries.temporal_q.t_ohlc_bars`` when
    (event_type, ts) collides: that query first collapses each ts to
    its MAX value (so its low is a min over per-ts maxes, its n_points
    counts distinct timestamps, and its open/close pick the max-value
    event of the boundary ts), while this one ranges over every raw
    event. Same bars on collision-free data; spot-check against the
    batch run of THIS function, not the deduped query."""
    return (
        _with_event_time(events)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.expr("min_by(value, struct(ts, event_id))").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr("max_by(value, struct(ts, event_id))").alias("close"),
            F.count("*").alias("n_points"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_points",
        )
    )


def dedup_events(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once projection of an at-least-once stream: drop
    re-deliveries by key (↔ ST4's Mongo-unique-index boundary). In
    streaming mode the watermark bounds the dedup state; in batch it
    is a plain dropDuplicates."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return (
            _with_event_time(events)
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys)
        )
    return events.dropDuplicates(keys)
