"""Bloom prefilter tests: no false negatives, bounded false positives,
two-phase agreement with the exact anti-join."""

from __future__ import annotations

from delta_data_pipelines_spark.operators.membership import (
    Bloom,
    bloom_partition,
    build_bloom,
)


def test_bloom_no_false_negatives():
    b = Bloom(capacity=10_000, fpp=0.05)
    keys = [f"https://example.com/ad/{i}" for i in range(5_000)]
    for k in keys:
        b.add(k)
    assert all(b.might_contain(k) for k in keys)


def test_bloom_fpp_bounded():
    b = Bloom(capacity=10_000, fpp=0.05)
    for i in range(10_000):
        b.add(f"in-{i}")
    fp = sum(b.might_contain(f"out-{i}") for i in range(10_000)) / 10_000
    assert fp < 0.1  # ~2x slack over the nominal 0.05


def test_bloom_partition_two_phase(spark):
    seen = spark.createDataFrame(
        [(f"u{i}",) for i in range(500)], "content_url string"
    )
    batch = spark.createDataFrame(
        [(f"u{i}",) for i in range(400, 900)], "content_url string"
    )
    bloom = build_bloom(seen, "content_url", capacity=1_000, fpp=0.05)
    maybe, new = bloom_partition(batch, "content_url", bloom)

    new_keys = {r["content_url"] for r in new.collect()}
    truly_seen = {f"u{i}" for i in range(400, 500)}
    # no false negatives: nothing truly seen may land in definitely_new
    assert not (new_keys & truly_seen)
    # the exact second phase over `maybe` recovers the precise split
    exact_new = maybe.join(seen, "content_url", "left_anti")
    combined = new_keys | {r["content_url"] for r in exact_new.collect()}
    assert combined == {f"u{i}" for i in range(500, 900)}
