"""Batch-sink tests (S14): executor-side batching, size caps,
completeness, fail-fast."""

from __future__ import annotations

import glob
import json

import pytest

from delta_data_pipelines_spark.sinks import file_post, send_batches


def test_send_batches_completeness_and_size(spark, tmp_path):
    df = spark.range(0, 1000).selectExpr("id", "id * 2 AS v").repartition(4)
    out = str(tmp_path / "batches")
    send_batches(df, file_post(out), batch_size=150)

    files = glob.glob(f"{out}/batch-*.json")
    rows = [r for f in files for r in json.load(open(f))]
    assert len(rows) == 1000
    assert {r["id"] for r in rows} == set(range(1000))
    sizes = [len(json.load(open(f))) for f in files]
    assert max(sizes) <= 150


def test_send_batches_global_numbering(spark, tmp_path):
    """The reference contract (utils_of_searchengine.py:183-196):
    1-based sequential batch_number, dataset-wide total_batches, rows
    ordered by key, exact i//200-style slicing."""
    from delta_data_pipelines_spark.sinks import send_batches_global

    df = spark.range(0, 1030).selectExpr("id", "id * 3 AS v").repartition(7)
    out = tmp_path / "global_batches"
    out.mkdir()

    def post(rows, batch_number, total_batches):
        import json as _json

        p = out / f"b-{batch_number:05d}.json"
        p.write_text(_json.dumps({"n": batch_number, "t": total_batches, "rows": rows}))

    send_batches_global(df, post, order_col="id", batch_size=200)

    files = sorted(glob.glob(f"{out}/b-*.json"))
    payloads = [json.load(open(f)) for f in files]
    assert [p["n"] for p in payloads] == list(range(1, 7))  # ceil(1030/200)=6
    assert all(p["t"] == 6 for p in payloads)
    # exact slicing: batch k holds ids (k-1)*200 .. min(k*200, 1030)-1, in order
    for p in payloads:
        k = p["n"]
        ids = [r["id"] for r in p["rows"]]
        assert ids == list(range((k - 1) * 200, min(k * 200, 1030)))


def test_send_batches_fail_fast(spark):
    df = spark.range(0, 100).repartition(2)

    def exploding_post(rows, batch_number):
        raise RuntimeError("service 500")

    with pytest.raises(Exception, match="service 500"):
        send_batches(df, exploding_post, batch_size=10)
