"""Toman amount parsing (F2).

Reference: ``kilid_transformer.py:41-64`` — clean ZWNJ, Persian digits →
English, pass "توافقی" (negotiable) through unparsed, else take the
FIRST integer in the text and scale by میلیارد=1e9 / میلیون=1e6 /
هزار=1e3.

The reference returns int | str from one function; the typed split:
``parse_toman_amount`` → LongType (NULL for negotiable/unparseable),
``toman_mode`` → StringType ("توافقی" or NULL) carrying the
pass-through role.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .fa import _c, persian_to_english_digits
from .text import clean_text


def _cleaned(col: Column | str) -> Column:
    return persian_to_english_digits(clean_text(_c(col)))


def parse_toman_amount(col: Column | str) -> Column:
    """First integer scaled by میلیارد/میلیون/هزار → long.

    "۲.۵ میلیارد تومان" → 2_000_000_000 (first *integer* only — the
    reference regex is ``(\\d+)``, so the fractional part is dropped;
    kilid_transformer.py:51-58).
    """
    t = _cleaned(col)
    n = F.regexp_extract(t, r"(\d+)", 1).try_cast("long")
    return (
        F.when(t.contains("توافقی"), F.lit(None).cast("long"))
        .when(n.isNull(), F.lit(None).cast("long"))
        .when(t.contains("میلیارد"), n * 1_000_000_000)
        .when(t.contains("میلیون"), n * 1_000_000)
        .when(t.contains("هزار"), n * 1_000)
        .otherwise(n)
    )


def toman_mode(col: Column | str) -> Column:
    """The pass-through role: "توافقی" when negotiable, else NULL."""
    t = _cleaned(col)
    return F.when(t.contains("توافقی"), F.lit("توافقی")).otherwise(
        F.lit(None).cast("string")
    )
