"""Approximate membership: the bloom-filter prefilter (SURVEY §2.8 D1-D3).

Reference: per-site Redis blooms, ``BF.RESERVE <key> 0.05 1_000_000
EXPANSION 2`` (divar_crawler.py:20-22; mrestate uses 0.01,
mrestate_crawler.py:61-63), probed with BF.EXISTS/BF.MEXISTS and
advisory only — Mongo's unique index is the exact boundary (ST4).

Engine mapping keeps both layers:
  - exact boundary = left-anti join against the seen-URLs key table
    (ingest.crawl.partition_new) — authoritative, no false positives;
  - this module = the *prefilter*: a deterministic pure-Python bloom
    (double hashing over sha1, like the classic Kirsch-Mitzenmacher
    construction) built from the key table and broadcast to executors,
    probed in an Arrow-batched pandas UDF without a join. False
    positives possible (resolved by the exact layer), false negatives
    never — the same contract the reference's bloom serves.

Scale posture: the sketch is sized like the reference's (1 M keys,
FPR 0.05 ≈ 750 KB of bits) — broadcast once, probed locally on every
executor; the build collects only the hashed keys. Past ~10⁸ keys,
skip the sketch and rely on the exact anti-join (a shuffle the key
table needs anyway).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Bloom:
    """Deterministic bloom filter (process-independent hashing)."""

    def __init__(self, capacity: int = 1_000_000, fpp: float = 0.05):
        m = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        self.m = m
        self.k = max(1, round(m / capacity * math.log(2)))
        self.bits = bytearray((m + 7) // 8)

    def _positions(self, value: str) -> list[int]:
        d = hashlib.sha1(value.encode("utf-8")).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:16], "big") | 1
        return [((h1 + i * h2) % self.m) for i in range(self.k)]

    def add(self, value: str) -> None:
        for p in self._positions(value):
            self.bits[p >> 3] |= 1 << (p & 7)

    def might_contain(self, value: str) -> bool:
        return all(
            self.bits[p >> 3] & (1 << (p & 7)) for p in self._positions(value)
        )


def build_bloom(
    seen: DataFrame, key: str, capacity: int = 1_000_000, fpp: float = 0.05
) -> Bloom:
    """Build the sketch from the authoritative key table
    (↔ BF.RESERVE + the mongo→bloom rebuild D6). Collects only the
    key column, distinct."""
    bloom = Bloom(capacity, fpp)
    for row in seen.select(key).distinct().toLocalIterator():
        v = row[0]
        if v is not None:
            bloom.add(str(v))
    return bloom


def bloom_partition(
    df: DataFrame, key: str, bloom: Bloom
) -> tuple[DataFrame, DataFrame]:
    """(maybe_seen, definitely_new) split using only the sketch.

    ``definitely_new`` is exact (blooms have no false negatives);
    ``maybe_seen`` still needs the authoritative anti-join. Mirrors
    the reference's two-phase dedup: bloom split first
    (crawler_dag_factory.py:38-49), unique index second.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def probe(vals):
        return vals.map(lambda v: v is not None and bloom.might_contain(str(v)))

    flagged = df.withColumn("_maybe", probe(F.col(key)))
    maybe = flagged.where(F.col("_maybe")).drop("_maybe")
    new = flagged.where(~F.col("_maybe")).drop("_maybe")
    return maybe, new
