"""JSON-Lines corpus source/sink — the lingua franca of LLM training
data (one JSON document per line, gzip/zstd-compressed shards).

The reference's nearest analog is its JSON-payload navigation
(``__NEXT_DATA__`` extraction, utils_of_searchengine.py — see
functions/jsonnav.py); this module adds the FILE-level format a
corpus pipeline actually exchanges. Design points for 100 TB:

- **Explicit schema, always.** Inference reads the whole dataset
  twice; a corpus reader must declare what it expects.
- **Errors as data, never exceptions.** A malformed line (truncated
  shard, encoding damage — routine in web-scale dumps) lands in the
  corrupt-record column via PERMISSIVE ``from_json`` instead of
  killing the job; ``split_corrupt`` separates clean rows from
  quarantine rows so the pipeline can publish clean data AND account
  for the damage (same bookkeeping column as ingest/quarantine.py's
  column-level parse — one constant, shared).
- **Text scan + from_json, NOT the native json reader.** Spark's
  file-level corrupt-record column is load-bearing but hostile:
  any plan whose pruned schema references only that column —
  ``clean.count()``, ``bad.count()``, exactly what a quarantine
  accounting step runs — is refused outright
  (QUERY_ONLY_CORRUPT_RECORD_COLUMN). Parsing a ``text`` scan with
  ``from_json`` produces the identical (schema + corrupt) shape with
  none of the restriction, no caching workarounds, and line-accurate
  raw text for the quarantine.
- **Compression is a codec name away** (gzip is splittable-per-file,
  not per-block: shard count = parallelism, so writers control shard
  size explicitly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .quarantine import CORRUPT_COL, augment_with_corrupt


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """JSONL source with explicit schema and errors-as-data.

    Any line that fails to parse fully sets the corrupt-record column
    to the raw line; note Spark's PARTIAL-RESULT semantics — a row
    with one bad field (e.g. a string where a long was declared) still
    populates its parseable fields AND sets the corrupt column, so
    corruption is detected by the corrupt column alone, never by
    looking for all-null rows. Blank lines (trailing newlines are
    routine in hand-built shards) are skipped, not quarantined.
    """
    full = augment_with_corrupt(schema)
    raw = spark.read.text(path)
    return _parse_lines(raw, full)


def _parse_lines(raw: DataFrame, full: StructType) -> DataFrame:
    """The ONE line-parse used by batch and streaming readers: skip
    blank lines, PERMISSIVE from_json, flatten to (schema + corrupt)."""
    parsed = raw.where(F.length(F.trim(F.col("value"))) > 0).select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_p")
    )
    return parsed.select(*[F.col(f"_p.{f.name}") for f in full.fields])


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Streaming twin of :func:`read_jsonl` — micro-batched shard
    ingest with the SAME parse (text scan + PERMISSIVE from_json), so
    ``split_corrupt`` and every downstream operator work identically
    on the stream; pair with ``streaming/curate.py``'s foreachBatch
    sink for curation-at-ingest. ``max_files_per_trigger`` bounds each
    micro-batch (one shard per trigger by default — a shard is the
    natural unit of arrival AND of gzip read parallelism)."""
    full = augment_with_corrupt(schema)
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _parse_lines(reader.text(path), full)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows without the bookkeeping column,
    quarantine rows as (raw line) for repair/accounting. Both sides
    are plain lazy filters — counts, aggregates, and downstream plans
    compose freely (the text-scan parse has no reserved-column
    restrictions)."""
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
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
    partitioning the plan ended with. The count is an upper bound:
    explicit-count repartition is exempt from AQE coalescing, but the
    file writer skips EMPTY partitions, so fewer rows than shards
    yield fewer files."""
    if shards is not None:
        df = df.repartition(shards)
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
