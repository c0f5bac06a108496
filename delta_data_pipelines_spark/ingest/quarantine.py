"""Permissive parsing with error quarantine (SURVEY §4 failure row).

Reference behavior: per-row try/except-continue in every transformer
(divar_transformer.py:14-20) and explicit error rows in kilid
(kilid_transformer.py:525-532) — bad payloads are skipped or logged,
never fatal.

Engine shape: parse JSON payloads in PERMISSIVE mode with a
``_corrupt_record`` column, then split the batch into (clean,
quarantined). The quarantine table keeps the raw payload + error
context for replay after a parser fix — rows are data, not log lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def augment_with_corrupt(schema: StructType | str) -> StructType:
    """Declared schema + the corrupt-record column — the ONE place the
    PERMISSIVE bookkeeping field is appended (shared by the column-
    level parse here and the file-level JSONL source), so the two
    quarantine paths can never diverge on the column name."""
    from pyspark.sql.types import StringType, StructField

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL!r}")
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def parse_with_quarantine(
    df: DataFrame, json_col: str, schema: StructType | str
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) split of a raw-JSON column.

    clean: parsed struct column ``parsed`` (corrupt column dropped).
    quarantined: original rows + ``error`` context, ready to append to
    a quarantine table and replay later.

    Corruption is detected via the PERMISSIVE-mode corrupt-record
    channel (an all-null struct is NOT proof of corruption — a valid
    payload can legitimately miss every field; missing fields stay
    clean and the conform step fills them).
    """
    full_schema = augment_with_corrupt(schema)
    parsed = df.withColumn(
        "parsed",
        F.from_json(
            F.col(json_col),
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    bad = F.col(f"parsed.{CORRUPT_COL}").isNotNull()
    clean = parsed.where(~bad & F.col(json_col).isNotNull()).withColumn(
        "parsed", F.col("parsed").dropFields(CORRUPT_COL)
    )
    quarantined = (
        parsed.where(bad)
        .drop("parsed")
        .withColumn("error", F.lit("unparseable json"))
        .withColumn("quarantined_at", F.current_timestamp())
    )
    return clean, quarantined
