"""JSON-Lines corpus source/sink — the lingua franca of LLM training
data (one JSON document per line, gzip/zstd-compressed shards).

The reference's nearest analog is its JSON-payload navigation
(``__NEXT_DATA__`` extraction, utils_of_searchengine.py — see
functions/jsonnav.py); this module adds the FILE-level format a
corpus pipeline actually exchanges. Design points for 100 TB:

- **Explicit schema, always.** Inference reads the whole dataset
  twice; a corpus reader must declare what it expects.
- **Errors as data, never exceptions.** A malformed line (truncated
  shard, encoding damage — routine in web-scale dumps) lands in a
  ``_corrupt`` column via PERMISSIVE mode instead of killing the job;
  ``split_corrupt`` separates clean rows from quarantine rows so the
  pipeline can publish clean data AND account for the damage (the
  quarantine pattern of ingest/quarantine.py, at the file level).
- **Compression is a codec name away** (gzip is splittable-per-file,
  not per-block: shard count = parallelism, so writers control shard
  size, not block size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    multiline: bool = False,
) -> DataFrame:
    """JSONL source with explicit schema and errors-as-data.

    Malformed lines appear with every schema column NULL and the raw
    line in ``_corrupt``; well-formed lines have ``_corrupt`` NULL.
    (Spark only POPULATES the corrupt-record column when it is part of
    the declared schema — adding it here is what opts in.)
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL!r}")
    full = StructType(schema.fields + [StructField(CORRUPT_COL, StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", "true" if multiline else "false")
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows without the bookkeeping column,
    quarantine rows as (raw line) for repair/accounting.

    The quarantine side caches its (tiny, corrupt-rows-only) slice
    first: Spark refuses scans whose only referenced column is the
    internal corrupt-record column, and the documented workaround is
    querying the cached parse instead of the raw files."""
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = (
        df.where(F.col(CORRUPT_COL).isNotNull())
        .cache()
        .select(F.col(CORRUPT_COL).alias("raw"))
    )
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    shards: int | None = None,
) -> None:
    """JSONL sink. ``shards`` controls output file count — with gzip
    (not block-splittable) shard count IS downstream read parallelism,
    so writers size shards explicitly rather than inheriting whatever
    partitioning the plan ended with. Under AQE the count is an UPPER
    bound: near-empty shards coalesce (a feature at scale — tiny
    shards are the small-files problem this parameter exists to
    avoid)."""
    if shards is not None:
        df = df.repartition(shards)
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
