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


def test_send_batches_fail_fast(spark):
    df = spark.range(0, 100).repartition(2)

    def exploding_post(rows, batch_number):
        raise RuntimeError("service 500")

    with pytest.raises(Exception, match="service 500"):
        send_batches(df, exploding_post, batch_size=10)
