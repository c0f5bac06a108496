"""As-of / range join unit tests: tie-at-equal-ts semantics, no-match
nulls, tolerance windows, interval bounds."""

from __future__ import annotations

from datetime import datetime

from delta_data_pipelines_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),
            (2, 10, _ts("2024-01-01 12:00:00")),
            (3, 20, _ts("2024-01-01 09:00:00")),  # before any right row
            (4, 30, _ts("2024-01-01 10:30:00")),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:30:00"), 1.0),
            (10, _ts("2024-01-01 10:00:00"), 2.0),  # equal-ts: counts (<=)
            (10, _ts("2024-01-01 11:00:00"), 3.0),
            (20, _ts("2024-01-01 09:30:00"), 9.0),
        ],
        "user_id long, ts timestamp, err_value double",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, key="user_id", ts="ts", payload_cols=["err_value"]
        ).collect()
    }
    assert out[1]["err_value"] == 2.0  # equal ts matches (<=)
    assert out[2]["err_value"] == 3.0  # latest preceding
    assert out[3]["err_value"] is None and out[3]["matched_ts"] is None
    assert out[4]["err_value"] is None
    assert len(out) == 4  # every left row survives


def test_asof_join_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: r
        for r in asof_join(
            left,
            right,
            key="user_id",
            ts="ts",
            payload_cols=["err_value"],
            tolerance_seconds=1800,
        ).collect()
    }
    assert out[1]["err_value"] == 2.0  # 0s old — inside window
    assert out[2]["err_value"] is None  # 1h old > 30min tolerance


def test_range_join_bounds(spark):
    left, right = _frames(spark)
    out = range_join(
        left,
        right.withColumnRenamed("ts", "r_ts"),
        key="user_id",
        left_ts="ts",
        right_ts="r_ts",
        lower_seconds=0,
        upper_seconds=3600,
    ).collect()
    got = {(r["event_id"], r["err_value"]) for r in out}
    # event 1 at 10:00 → right rows at 10:00 (0s) and 11:00 (3600s incl.);
    # event 3 (user 20, 09:00) → right row at 09:30
    assert got == {(1, 2.0), (1, 3.0), (3, 9.0)}


def test_ohlc_bars_invariants(spark):
    """Every bar must satisfy low <= open,close <= high, n_points >= 1,
    and bars must partition the deduped points exactly (sum of
    n_points == distinct (type, ts) pairs)."""
    from delta_data_pipelines_spark.queries.temporal_q import t_ohlc_bars
    from delta_data_pipelines_spark.catalog import read_table

    sf = "/root/testdata/sf0.001"
    bars = t_ohlc_bars(spark, sf).collect()
    assert bars
    for r in bars:
        assert r["low"] <= r["open"] <= r["high"], r
        assert r["low"] <= r["close"] <= r["high"], r
        assert r["n_points"] >= 1
    n_pts = (
        read_table(spark, sf, "events")
        .select("event_type", "ts").distinct().count()
    )
    assert sum(r["n_points"] for r in bars) == n_pts


def test_subsequence_topk_finds_planted_spike(spark):
    """A planted spike window must rank #1 for its series regardless of
    its absolute scale (z-normalization is scale/offset-invariant), and
    windows must NOT form across the day boundary."""
    from delta_data_pipelines_spark.operators.temporal import subsequence_topk

    import pytest as _pytest

    # z-normalized spike [0,0,0,1,1,0,0,0], rounded to 9 dp
    zp = [-0.577350269] * 3 + [1.732050808] * 2 + [-0.577350269] * 3

    def ev(i, etype, v, day=1):
        return (
            i,
            datetime(2024, 3, day, (i // 60) % 24, i % 60, 0),
            1,
            etype,
            float(v),
            "",
        )

    rows = []
    # series A: noise then a LARGE planted spike (scaled x100, offset 50)
    noise = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    for i, v in enumerate(noise):
        rows.append(ev(i, "a", v))
    planted = [50, 50, 50, 150, 150, 50, 50, 50]
    for j, v in enumerate(planted):
        rows.append(ev(100 + j, "a", v))
    # series B: 5 points on day 1 + 5 on day 2 — too short per day, so
    # NO length-8 window may form for it
    for j in range(5):
        rows.append(ev(200 + j, "b", j, day=1))
        rows.append(ev(300 + j, "b", j, day=2))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = subsequence_topk(df, zp, k=3).collect()
    a = [r for r in out if r["event_type"] == "a"]
    assert a[0]["anchor_id"] == 100  # the planted window, exactly
    assert a[0]["dist"] == 0.0  # perfect shape match after z-norm
    assert all(r["event_type"] != "b" for r in out)  # day-bounded
    with _pytest.raises(ValueError, match="pattern"):
        subsequence_topk(df, [1.0])
