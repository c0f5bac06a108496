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
