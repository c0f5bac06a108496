"""Scale tactics: skew-salted joins and bucketed co-located joins.

The reference never needed these (its biggest join input was a few
hundred thousand SQL Server rows), but at 100 TB they are the
difference between a plan that finishes and one that doesn't:

- ``salted_join``: when one join key carries a disproportionate share
  of rows (a boilerplate URL, a mega-city region id), the shuffle
  partition holding it becomes the straggler. Salting fans the hot
  key's rows across N partitions and replicates the build side N ways.
  AQE's skew-join handles *sort-merge* skew automatically; salting is
  the explicit form that also covers aggregations and broadcast-miss
  cases, and it composes with any join type.

- ``write_bucketed`` / ``bucketed_join_ready``: co-locate both sides
  of a recurring fact-fact join (search-index J5: deposits ⋈ pivoted
  custom fields) by pre-hash-bucketing on the join key. Joins between
  tables bucketed the same way skip the shuffle entirely — the
  pattern to reuse one partitioning across many downstream queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``salt``
    shuffle partitions.

    left gets a random-but-deterministic salt in [0, salt) (hash of the
    full row via monotonically_increasing_id would break determinism —
    we hash the key plus a per-row uniform from xxhash64 of all
    columns); right is replicated ``salt`` times. Row multiplicity is
    unchanged: each left row joins exactly the one replica matching its
    salt.

    Cost model: right side grows ×salt (keep it the smaller input);
    left shuffle spreads evenly. Use when one key exceeds ~1 partition
    of rows; otherwise prefer a plain join + AQE.
    """
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l = left.withColumn("_salt", lsalt)
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    num_buckets: int = 32,
    sorted_by: str | None = None,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) on ``key``.

    Both sides of a recurring join written with the same bucket count
    on the same key join with ZERO exchanges (verified in
    tests/test_scale.py by asserting no Exchange in the physical plan).
    """
    writer = df.write.mode("overwrite").format("parquet")
    if sorted_by:
        writer = writer.bucketBy(num_buckets, key).sortBy(sorted_by)
    else:
        writer = writer.bucketBy(num_buckets, key)
    writer.saveAsTable(table_name)


def bucketed_join_ready(spark: SparkSession, *table_names: str) -> list[DataFrame]:
    """Read back bucketed tables (bucket metadata comes from the
    catalog; reading the bare parquet path would lose it)."""
    return [spark.table(t) for t in table_names]


_Z_BITS = 8  # 256 bins per dimension — plenty for file-level skipping


def zorder_key(df: DataFrame, cols: list[str]) -> DataFrame:
    """Add a ``_z`` column: Morton (Z-order) interleave of the value-
    range bins of ``cols``.

    A single-column sort clusters files on that column only; queries
    filtering the OTHER columns still touch every file. Interleaving
    the bin bits of several columns gives every column partial
    locality, so parquet min/max footers prune files for predicates on
    ANY of them — the layout trick behind Delta/Iceberg OPTIMIZE
    ZORDER BY. Bins are value-range buckets from one O(1) min/max agg
    per column (collected to the driver: 2 scalars per column, not
    data); the interleave itself is native bit arithmetic, fully
    codegen'd.
    """
    if not 2 <= len(cols) <= 4:
        raise ValueError(f"zorder wants 2-4 columns, got {len(cols)}")
    # cast to double up front: numerics pass through, timestamps/dates
    # become epoch seconds/days (time+id is a primary Z-order pairing);
    # strings are rejected BEFORE the cast — under ANSI mode a
    # non-numeric string would throw mid-job instead of clearly here
    for c in cols:
        if df.schema[c].dataType.simpleString() == "string":
            raise ValueError(
                f"zorder column {c!r} is a string — order it via a "
                f"numeric surrogate (hash, rank, or dictionary id)"
            )
    dcols = {c: F.col(c).cast("double") for c in cols}
    stats = df.agg(
        *[F.min(dcols[c]).alias(f"_min_{c}") for c in cols],
        *[F.max(dcols[c]).alias(f"_max_{c}") for c in cols],
    ).collect()[0]
    n = len(cols)
    z = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        lo_raw, hi_raw = stats[f"_min_{c}"], stats[f"_max_{c}"]
        if lo_raw is None or hi_raw is None:
            continue  # empty input or all-null column: no bits
        lo, hi = float(lo_raw), float(hi_raw)
        if hi <= lo:
            continue  # constant column contributes no bits
        b = (
            F.width_bucket(dcols[c], F.lit(lo), F.lit(hi), F.lit(2**_Z_BITS))
            - 1
        ).cast("bigint")
        b = F.greatest(F.lit(0).cast("bigint"), F.least(b, F.lit(2**_Z_BITS - 1).cast("bigint")))
        for i in range(_Z_BITS):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j).cast("bigint")
    return df.withColumn("_z", z)


def write_zordered(
    df: DataFrame, path: str, cols: list[str], n_files: int = 32
) -> None:
    """Write ``df`` as parquet laid out in Z-order over ``cols``:
    range-partition on the Morton key (files own contiguous z-ranges)
    and sort within each file so row groups are tight too. Readers
    filtering any of ``cols`` skip most files via footer min/max."""
    (
        zorder_key(df, cols)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
