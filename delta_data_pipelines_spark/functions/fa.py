"""Persian digit / numeric coercion expressions (F1, F3-F8).

Reference: the per-site transformers each carry a copy of
``persian_to_english_digits`` (divar_transformer.py:26-30,
kilid_transformer.py:6-12, sheypoor_transformer.py:4-8,
mrestate_transformer.py:24-27, format_divar_collection.py:19-25) plus
assorted numeric-coercion helpers. Here each exists once, as a native
expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PERSIAN_DIGITS = "۰۱۲۳۴۵۶۷۸۹"
ENGLISH_DIGITS = "0123456789"
# LRM / RLM directional marks + arabic/persian thousands separators.
_MARKS_SEPS = "[‎‏,٬،\\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def persian_to_english_digits(col: Column | str) -> Column:
    """F1 — ۰۱۲۳۴۵۶۷۸۹ → 0123456789 (divar_transformer.py:26-30)."""
    return F.translate(_c(col), PERSIAN_DIGITS, ENGLISH_DIGITS)


def english_to_persian_digits(col: Column | str) -> Column:
    """Inverse of F1 — used to synthesize Persian fixtures/outputs."""
    return F.translate(_c(col), ENGLISH_DIGITS, PERSIAN_DIGITS)


def safe_int(col: Column | str, default: int = 0) -> Column:
    """F3 — int(float(v)) with default on failure
    (utils_of_searchengine.py:64-68).

    Spark's cast yields NULL on failure; coalesce restores the
    reference's default-0 semantics.
    """
    return F.coalesce(_c(col).try_cast("double").try_cast("long"), F.lit(default))


def try_parse_float(col: Column | str) -> Column:
    """F4 — strip LRM/RLM/whitespace/commas/٬/، then parse float
    (format_divar_collection.py:27-36).

    Reference returns the original string when unparseable (mixed
    type); the typed equivalent is NULL-on-failure.
    """
    cleaned = F.regexp_replace(persian_to_english_digits(_c(col)), _MARKS_SEPS, "")
    return cleaned.try_cast("double")


def parse_price(col: Column | str) -> Column:
    """F6 — keep digits only → double (sheypoor_transformer.py:97-101).

    NULL when no digits remain (empty string casts to NULL).
    """
    digits = F.regexp_replace(persian_to_english_digits(_c(col)), "[^0-9]", "")
    return digits.try_cast("double")


def normalize_more_than_value(col: Column | str) -> Column:
    """F7 — "بیشتر از N" → "N+"; otherwise the cleaned value passes
    through (format_divar_collection.py:50-59)."""
    cleaned = F.regexp_replace(
        persian_to_english_digits(_c(col)), "[‎‏\\s]", ""
    )
    n = F.regexp_extract(cleaned, r"(\d+)", 1)
    return F.when(
        cleaned.contains("بیشتر") & (n != ""), F.concat(n, F.lit("+"))
    ).otherwise(cleaned)


def more_than_plus_one(col: Column | str) -> Column:
    """F8 — unit_per_floor "بیشتر از N" → str(N+1)
    (divar_transformer.py:400-404); plain values pass through."""
    cleaned = persian_to_english_digits(_c(col))
    n = F.regexp_extract(cleaned, r"(\d+)", 1)
    return F.when(
        cleaned.contains("بیشتر") & (n != ""),
        (n.try_cast("int") + 1).cast("string"),
    ).otherwise(cleaned)
