"""Temporal joins Spark lacks as primitives: as-of and range joins.

The reference has no temporal joins (its only joins are dim lookups,
SURVEY §2.3), but a training-data pipeline correlating event streams
needs both. Neither is implemented as an actual range/theta join —
that degenerates under skew:

- ``asof_join`` uses the union+window formulation: tag both sides,
  union, and carry the most recent right-side payload forward with
  ``last(ignorenulls)`` over (key ORDER BY ts). One shuffle on the
  key, linear in rows, no pair blow-up — the pattern that survives a
  key with 10⁸ rows where a range join would emit 10¹⁶ candidates.

- ``range_join`` is an equi-join on the key with the interval as a
  post-join predicate (hash/SMJ on the key, never a cross product);
  callers bound per-key cardinality the same way the dedup operators
  do (block keys or salting for hot keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row: the most recent right row with
    ``right.ts <= left.ts`` on the same key (point-in-time join).

    Output: all left columns + ``payload_cols`` (null when no right
    row precedes) + ``matched_ts`` (the matched right timestamp).
    ``tolerance_seconds`` nulls matches older than the window.
    """
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    for c in payload_cols:
        l = l.withColumn(f"_p_{c}", F.lit(None).cast(right.schema[c].dataType))
    l = l.withColumn("_rts", F.lit(None).cast("timestamp"))

    r = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        F.col(ts).alias("_rts"),
    )
    for c in lcols:
        if c not in {key, ts}:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l.select(
        *lcols, "_side", *[f"_p_{c}" for c in payload_cols], "_rts"
    ).unionByName(r.select(*lcols, "_side", *[f"_p_{c}" for c in payload_cols], "_rts"))

    # right rows (_side=0) sort before left rows at equal ts → "<=".
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in payload_cols
        ],
        F.last("_rts", ignorenulls=True).over(w).alias("matched_ts"),
    ).where(F.col("_side") == 1)

    in_window: Column = F.lit(True)
    if tolerance_seconds is not None:
        in_window = F.col("matched_ts") >= (
            F.col(ts) - F.make_dt_interval(secs=F.lit(tolerance_seconds))
        )
    out = carried.select(
        *lcols,
        *[
            F.when(in_window, F.col(f"_m_{c}")).alias(c_out)
            for c, c_out in zip(payload_cols, payload_cols)
        ],
        F.when(in_window, F.col("matched_ts")).alias("matched_ts"),
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Pairs on the same key with ``right.ts - left.ts`` inside
    [lower, upper] seconds. Equi-join on the key; the interval is a
    cheap post-join filter."""
    lo = F.make_dt_interval(secs=F.lit(lower_seconds))
    hi = F.make_dt_interval(secs=F.lit(upper_seconds))
    # alias-qualify the key equality: when both sides derive from the
    # same scan (self-join), `left[key] == right[key]` resolves to ONE
    # attribute and only works through Spark's trivially-true-predicate
    # auto-repair (logged as a WARN). Explicit aliases make the
    # condition unambiguous by construction.
    l, r = left.alias("_rj_l"), right.alias("_rj_r")
    cond = (
        (F.col(f"_rj_l.{key}") == F.col(f"_rj_r.{key}"))
        & (F.col(f"_rj_r.{right_ts}") >= F.col(f"_rj_l.{left_ts}") + lo)
        & (F.col(f"_rj_r.{right_ts}") <= F.col(f"_rj_l.{left_ts}") + hi)
    )
    return l.join(r, cond, how).drop(F.col(f"_rj_r.{key}"))


def scd2_intervals(
    changes: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a change log.

    Each change row opens a validity interval that closes when the
    next change for the same key arrives: ``valid_from = ts``,
    ``valid_to = lead(ts)`` (null = still current). The as-of joins
    above consume exactly this shape, and a point-in-time snapshot is
    ``WHERE valid_from <= T AND (valid_to IS NULL OR T < valid_to)``.

    One shuffle on the key; the lead window is per-key, never global.
    Callers must pre-dedup to one row per (key, ts): duplicate
    timestamps make the interval order ambiguous. Uniqueness isn't
    cheaply checkable at plan time, so it is a documented contract —
    t_scd2_intervals dedups via max-value, like the as-of queries.
    """
    w = Window.partitionBy(key).orderBy(ts)
    out = changes.select(
        key,
        *value_cols,
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def subsequence_topk(
    events: DataFrame,
    pattern: list[float],
    series_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    k: int = 5,
) -> DataFrame:
    """Z-normalized subsequence similarity search — the matrix-profile
    style "find windows shaped like this pattern" query over an event
    stream (shape match is scale- and offset-invariant: a small spike
    matches a large spike).

    Each length-L window (L = len(pattern)) anchored at an event is
    built with L-1 ``lead``s — a DETERMINISTIC construction, unlike
    ``collect_list`` over a frame, whose order is not contractual —
    z-normalized, and scored by squared distance to the (caller-
    pre-normalized) pattern; top-``k`` per series by (distance,
    anchor id). Flat windows (zero variance) have no shape and are
    skipped.

    Scale shape: windows are built within (series, DAY) partitions —
    the window state is bounded by a day's events per series, never a
    whole series' history (windows that would cross midnight are not
    formed; at 100 TB an unbounded per-series window is a straggler).
    All math is native higher-order expressions; the pattern rides
    along as an array literal.
    """
    L = len(pattern)
    if L < 2:
        raise ValueError(f"pattern must have >= 2 points, got {L}")
    w = Window.partitionBy(series_col, F.to_date(ts_col)).orderBy(ts_col, id_col)
    arr = F.array(
        F.col(value_col),
        *[F.lead(value_col, i).over(w) for i in range(1, L)],
    )
    p = F.array(*[F.lit(float(v)) for v in pattern])
    base = (
        events.select(series_col, ts_col, id_col, value_col)
        .withColumn("_arr", arr)
        .where(~F.exists(F.col("_arr"), lambda x: x.isNull()))
        .withColumn(
            "_mean",
            F.aggregate(F.col("_arr"), F.lit(0.0), lambda a, x: a + x) / L,
        )
        .withColumn(
            "_std",
            F.sqrt(
                F.aggregate(
                    F.col("_arr"),
                    F.lit(0.0),
                    lambda a, x: a + (x - F.col("_mean")) * (x - F.col("_mean")),
                )
                / L
            ),
        )
        .where(F.col("_std") > 0)
        .withColumn(
            "dist",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("_arr"),
                        p,
                        lambda x, q: (
                            ((x - F.col("_mean")) / F.col("_std")) - q
                        )
                        * (((x - F.col("_mean")) / F.col("_std")) - q),
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                9,
            ),
        )
    )
    wr = Window.partitionBy(series_col).orderBy("dist", id_col)
    return (
        base.withColumn("rank", F.row_number().over(wr).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            F.col(series_col),
            F.col(id_col).alias("anchor_id"),
            "dist",
            "rank",
        )
    )
