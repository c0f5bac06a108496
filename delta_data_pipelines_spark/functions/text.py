"""String / slug / enum expressions (F17-F32)."""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

from .fa import _c, persian_to_english_digits

ZWNJ = "‌"


def clean_text(col: Column | str) -> Column:
    """F17 — ZWNJ → space, trim (kilid_transformer.py:38-39)."""
    return F.trim(F.regexp_replace(_c(col), ZWNJ, " "))


def to_slug(col: Column | str) -> Column:
    """F18 — lower, take the segment before "،"/",", whitespace → dash
    (sheypoor_transformer.py:92-95)."""
    head = F.trim(F.split(F.lower(_c(col)), "[،,]")[0])
    return F.regexp_replace(head, r"\s+", "-")


def normalize_property_type(col: Column | str) -> Column:
    """F19 — contains "مشارکت" → NULL (caller drops the row);
    "زمین"/"صنعتی" → "باغ باغچه و زمین"; else trimmed pass-through
    (utils_of_searchengine.py:94-114 — its allowed-set check is a
    no-op: both branches return pt)."""
    pt = F.trim(_c(col))
    return (
        F.when(pt.isNull() | (pt == ""), F.lit(None).cast("string"))
        .when(pt.contains("مشارکت"), F.lit(None).cast("string"))
        .when(pt.contains("زمین") | pt.contains("صنعتی"), F.lit("باغ باغچه و زمین"))
        .otherwise(pt)
    )


def normalize_deed_type(col: Column | str) -> Column:
    """F20 — strip the "سند:" label; contains "تک برگ" → "تک برگ";
    "قولنامه" → "قولنامه ای"; else cleaned pass-through
    (kilid_transformer.py:117-126)."""
    t = clean_text(F.regexp_replace(_c(col), r"^[^:]*:", ""))
    return (
        F.when(t.contains("تک برگ"), F.lit("تک برگ"))
        .when(t.contains("قولنامه"), F.lit("قولنامه ای"))
        .otherwise(t)
    )


def map_enum(col: Column | str, mapping: dict, default=None) -> Column:
    """F21 — dict enum maps (user_type, floor_map, option-id maps, ...;
    divar_transformer.py:104,307-314,406-472;
    map_divar_data_to_delta.py:69-155) as a literal MAP lookup.

    Tiny maps compile to a literal expression; for the big option-id
    maps prefer a broadcast-joined mapping table (operators.enums).
    """
    m = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    looked = m[_c(col)]
    if default is not None:
        looked = F.coalesce(looked, F.lit(default))
    return looked


def price_mode_from_title(col: Column | str) -> Column:
    """F22 — keyword classification: رایگان/مجانی → "مجانی";
    توافقی → "توافقی"; مقطوع → "مقطوع" (divar_transformer.py:147-152)."""
    t = _c(col)
    return (
        F.when(t.contains("رایگان") | t.contains("مجانی"), F.lit("مجانی"))
        .when(t.contains("توافقی"), F.lit("توافقی"))
        .when(t.contains("مقطوع"), F.lit("مقطوع"))
        .otherwise(F.lit(None).cast("string"))
    )


def feature_presence(title: Column | str, keyword: str) -> Column:
    """F23 — feature flags from widget titles: "ندارد" in title → false;
    title contains the keyword → true; else NULL
    (divar_transformer.py:498-518)."""
    t = _c(title)
    return (
        F.when(t.isNull(), F.lit(None).cast("boolean"))
        .when(t.contains("ندارد"), F.lit(False))
        .when(t.contains(keyword), F.lit(True))
        .otherwise(F.lit(None).cast("boolean"))
    )


def rent_type(credit: Column | str, rent: Column | str) -> Column:
    """F25 — credit & !rent → full_credit; credit & rent → rent_credit;
    rent only → full_rent (sheypoor_transformer.py:213-218)."""
    c, r = _c(credit), _c(rent)
    has_c = c.isNotNull() & (c > 0)
    has_r = r.isNotNull() & (r > 0)
    return (
        F.when(has_c & ~has_r, F.lit("full_credit"))
        .when(has_c & has_r, F.lit("rent_credit"))
        .when(has_r, F.lit("full_rent"))
        .otherwise(F.lit(None).cast("string"))
    )


_FLOOR_RE = r"(\d+)\s*از\s*(\d+)"


def floor_of(col: Column | str) -> Column:
    """F26 — floor from "X از Y" → X (divar_transformer.py:349-357)."""
    return F.regexp_extract(persian_to_english_digits(_c(col)), _FLOOR_RE, 1).try_cast("int")


def total_floors_of(col: Column | str) -> Column:
    """F26 — total floors from "X از Y" → Y
    (divar_transformer.py:377-391)."""
    return F.regexp_extract(persian_to_english_digits(_c(col)), _FLOOR_RE, 2).try_cast("int")


def normalize_rooms(col: Column | str) -> Column:
    """F27 — "بدون اتاق" → "0"; "+N"/"N+" → str(N+1) ("+۴" → "5");
    else digits-translated pass-through (divar_transformer.py:365-375;
    format_divar_collection.py:79-83)."""
    t = persian_to_english_digits(F.trim(_c(col)))
    n = F.regexp_extract(t, r"(\d+)", 1)
    return (
        F.when(t.contains("بدون"), F.lit("0"))
        .when(t.contains("+") & (n != ""), (n.try_cast("int") + 1).cast("string"))
        .otherwise(t)
    )


def normalize_construction_year(col: Column | str) -> Column:
    """F28 — "قبل ... ۱۳۷۰" → −1370 sentinel; else numeric parse
    (format_divar_collection.py:61-67). The ML job later remaps −1370 →
    1369 (price_prediction_data_pipeline.py:120-121); see
    jobs.price_dataset."""
    t = F.regexp_replace(persian_to_english_digits(_c(col)), r"\s", "")
    return F.when(
        t.contains("قبل") & t.contains("1370"), F.lit(-1370)
    ).otherwise(t.try_cast("int"))


def join_breadcrumbs(col: Column | str, sep: str = "/") -> Column:
    """F29 — breadcrumb array → joined path (kilid_transformer.py:192-195)."""
    return F.array_join(_c(col), sep)


def split_location(col: Column | str, index: int) -> Column:
    """F30 — "city، neighborhood" split on "،" → indexed slug
    (sheypoor_transformer.py:144-149)."""
    return F.trim(F.split(_c(col), "،")[index])


def token_to_url(col: Column | str, template_prefix: str) -> Column:
    """F31 — ad token → detail URL (divar_crawler.py:140-141)."""
    return F.concat(F.lit(template_prefix), _c(col))


def fix_url(col: Column | str) -> Column:
    """F31 — last-8-chars token extraction
    (map_divar_data_to_delta.py:44-46)."""
    return F.substring(_c(col), -8, 8)


def relative_to_absolute_url(col: Column | str, base: str) -> Column:
    """F31 — "/media/..." → absolute (mrestate_transformer.py:182-184)."""
    c = _c(col)
    return F.when(c.startswith("/"), F.concat(F.lit(base), c)).otherwise(c)
