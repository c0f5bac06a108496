"""Date / time expressions (F9-F16).

All "now"-dependent functions take an injectable ``now`` Column
(default ``current_timestamp()``) so tests freeze the clock — the
reference calls ``datetime.now()`` inline, which is why its own
behavior was untestable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .fa import _c, persian_to_english_digits

TEHRAN = "Asia/Tehran"


def _minus_days(now: Column, days: Column) -> Column:
    return now - F.make_dt_interval(days=days)


def text_to_date(
    col: Column | str, now: Column | None = None, variant: str = "divar"
) -> Column:
    """F9 — relative-Persian text → timestamp.

    divar variant (divar_transformer.py:32-56; kilid_transformer.py:14-36
    is identical): "لحظاتی پیش"→now; "دقایقی پیش"→now−5min; else first
    integer N (default 0) with unit روز/هفته/ماه(=30d)/ساعت; default now.

    sheypoor variant (sheypoor_transformer.py:10-36): when the text has
    NO digits — لحظاتی→now, ساعاتی→now−2h, دقایقی→now−5min, else now;
    with digits only روز/هفته/ماه units apply (no ساعت branch).
    """
    if now is None:
        now = F.current_timestamp()
    t = persian_to_english_digits(F.trim(_c(col)))
    n_str = F.regexp_extract(t, r"(\d+)", 1)
    amount = F.coalesce(n_str.try_cast("int"), F.lit(0))

    if variant == "divar":
        return (
            F.when(t.contains("لحظاتی پیش"), now)
            .when(t.contains("دقایقی پیش"), now - F.make_dt_interval(mins=F.lit(5)))
            .when(t.contains("روز"), _minus_days(now, amount))
            .when(t.contains("هفته"), _minus_days(now, amount * 7))
            .when(t.contains("ماه"), _minus_days(now, amount * 30))
            .when(t.contains("ساعت"), now - F.make_dt_interval(hours=amount))
            .otherwise(now)
        )
    if variant == "sheypoor":
        no_digit = n_str == ""
        return (
            F.when(no_digit & t.contains("لحظاتی پیش"), now)
            .when(no_digit & t.contains("ساعاتی پیش"), now - F.make_dt_interval(hours=F.lit(2)))
            .when(no_digit & t.contains("دقایقی پیش"), now - F.make_dt_interval(mins=F.lit(5)))
            .when(no_digit, now)
            .when(t.contains("روز"), _minus_days(now, amount))
            .when(t.contains("هفته"), _minus_days(now, amount * 7))
            .when(t.contains("ماه"), _minus_days(now, amount * 30))
            .otherwise(now)
        )
    raise ValueError(f"unknown variant: {variant}")


def iran_to_utc(col: Column | str) -> Column:
    """F11 — naive Iran-local timestamp → UTC
    (utils_of_searchengine.py:52-60)."""
    return F.to_utc_timestamp(_c(col), TEHRAN)


def utc_to_iran(col: Column | str) -> Column:
    """Inverse shift used by the incremental watermark
    (sql_search_incremental_dag.py:129-133)."""
    return F.from_utc_timestamp(_c(col), TEHRAN)


def iran_datetime_to_utc_iso(col: Column | str) -> Column:
    """F11, string form: the reference emits an ISO-8601 string with
    +00:00 offset (utils_of_searchengine.py:52-60)."""
    return F.concat(
        F.date_format(iran_to_utc(col), "yyyy-MM-dd'T'HH:mm:ss"),
        F.lit("+00:00"),
    )


def age_to_build_year(col: Column | str, now: Column | None = None) -> Column:
    """F13 — property age → approximate Jalali build year
    (utils_of_searchengine.py:71-91).

    jyear = gregorian_year − 621; age>30 → jyear−31; age>20 → jyear−21;
    else the constant 1404 (the reference hard-codes it). NULL in/NULL
    out; unparseable age → NULL.
    """
    if now is None:
        now = F.current_timestamp()
    age = _c(col).try_cast("double").try_cast("int")
    jyear = F.year(now) - 621
    return (
        F.when(age.isNull(), F.lit(None).cast("int"))
        .when(age > 30, jyear - 31)
        .when(age > 20, jyear - 21)
        .otherwise(F.lit(1404))
    )


def try_parse_datetime(col: Column | str) -> Column:
    """F14 — splice "YYYY-MM-DDHH:MM:SS" (missing space) and parse
    (format_divar_collection.py:38-48). NULL on failure."""
    t = F.trim(persian_to_english_digits(_c(col)))
    spliced = F.regexp_replace(
        t, r"^(\d{4}-\d{2}-\d{2})(\d{2}:\d{2}:\d{2})$", r"$1 $2"
    )
    return spliced.try_cast("timestamp")


def clamp_timestamp(col: Column | str, limit: str, reset: str) -> Column:
    """F15 — created_at beyond LIMIT_DATE resets to RESET_DATE
    (format_divar_collection.py:16-17,100-101)."""
    c = _c(col)
    return F.when(c > F.lit(limit).cast("timestamp"), F.lit(reset).cast("timestamp")).otherwise(c)


def days_ago_and_street(
    col: Column | str, now: Column | None = None
) -> Column:
    """F16 — combined extractor for "N روز/هفته/ماه پیش، street"
    (map_divar_data_to_delta.py:26-41): relative-age prefix → absolute
    timestamp, the segment after "، " → street name.

    Returns struct(published_at timestamp, street string); texts with
    no age prefix get published_at = now, no "، " → street NULL.
    """
    if now is None:
        now = F.current_timestamp()
    t = persian_to_english_digits(F.trim(_c(col)))
    head = F.split(t, "، ")[0]
    street = F.when(t.contains("، "), F.trim(F.substring_index(t, "، ", -1)))
    n = F.coalesce(F.regexp_extract(head, r"(\d+)", 1).try_cast("int"), F.lit(0))
    published = (
        F.when(head.contains("روز"), _minus_days(now, n))
        .when(head.contains("هفته"), _minus_days(now, n * 7))
        .when(head.contains("ماه"), _minus_days(now, n * 30))
        .otherwise(now)
    )
    return F.struct(published.alias("published_at"), street.alias("street"))


def watermark_with_overlap(
    col: Column | str,
    overlap_hours: int = 1,
    fallback_days: int = 1,
    now: Column | None = None,
) -> Column:
    """F12/ST3 — incremental lower bound: last-modified (UTC) → Tehran
    local − overlap; NULL watermark falls back to now − 1 day
    (sql_search_incremental_dag.py:118-140)."""
    if now is None:
        now = F.current_timestamp()
    shifted = utc_to_iran(col) - F.make_dt_interval(hours=F.lit(overlap_hours))
    return F.coalesce(shifted, now - F.make_dt_interval(days=F.lit(fallback_days)))
