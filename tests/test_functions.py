"""Golden tests for the scalar expression library (SURVEY.md §2.6).

Expectations from FIXTURES.md's frozen-clock table
(now = 2026-01-01T00:00:00Z) and the reference sources cited in each
function's docstring.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

import delta_data_pipelines_spark.functions as fn

NOW = datetime(2026, 1, 1, 0, 0, 0)
def now_col():
    return F.lit("2026-01-01 00:00:00").cast("timestamp")


def one(spark, expr, value=None):
    df = spark.range(1)
    if value is not None:
        df = df.select(F.lit(value).alias("v"))
    return df.select(expr.alias("out")).first()["out"]


# ---- F1 digits -------------------------------------------------------------


def test_persian_digits(spark):
    assert one(spark, fn.persian_to_english_digits("v"), "۰۱۲۳۴۵۶۷۸۹ و ۴۲") == "0123456789 و 42"


# ---- F2 toman --------------------------------------------------------------


@pytest.mark.parametrize(
    "text,amount",
    [
        ("۲.۵ میلیارد تومان", 2_000_000_000),  # first int only
        ("۵۰۰ میلیون", 500_000_000),
        ("۱۲ هزار", 12_000),
        ("۴۲", 42),
        ("توافقی", None),
        ("بدون قیمت", None),
    ],
)
def test_parse_toman_amount(spark, text, amount):
    assert one(spark, fn.parse_toman_amount("v"), text) == amount


def test_toman_mode(spark):
    assert one(spark, fn.toman_mode("v"), "توافقی") == "توافقی"
    assert one(spark, fn.toman_mode("v"), "۵۰۰ میلیون") is None


# ---- F3-F8 numeric coercions ----------------------------------------------


def test_safe_int(spark):
    assert one(spark, fn.safe_int("v"), "12.7") == 12
    assert one(spark, fn.safe_int("v"), "abc") == 0
    assert one(spark, fn.safe_int(F.lit(None).cast("string"), default=7)) == 7


def test_try_parse_float(spark):
    assert one(spark, fn.try_parse_float("v"), "۱٬۲۳۴.۵") == 1234.5
    assert one(spark, fn.try_parse_float("v"), "‎1,000") == 1000.0
    assert one(spark, fn.try_parse_float("v"), "nope") is None


def test_parse_price(spark):
    assert one(spark, fn.parse_price("v"), "۱۲۳abc456") == 123456.0
    assert one(spark, fn.parse_price("v"), "تماس") is None


def test_more_than(spark):
    assert one(spark, fn.normalize_more_than_value("v"), "بیشتر از ۵") == "5+"
    assert one(spark, fn.normalize_more_than_value("v"), "۳") == "3"
    assert one(spark, fn.more_than_plus_one("v"), "بیشتر از ۵") == "6"
    assert one(spark, fn.more_than_plus_one("v"), "۳") == "۳".translate(
        str.maketrans("۰۱۲۳۴۵۶۷۸۹", "0123456789")
    )


# ---- F9 relative dates ------------------------------------------------------


@pytest.mark.parametrize(
    "text,expected,variant",
    [
        ("۲ روز پیش", NOW - timedelta(days=2), "divar"),
        ("لحظاتی پیش", NOW, "divar"),
        ("دقایقی پیش", NOW - timedelta(minutes=5), "divar"),
        ("۳ ماه پیش", NOW - timedelta(days=90), "divar"),
        ("۱ هفته پیش", NOW - timedelta(weeks=1), "divar"),
        ("۴ ساعت پیش", NOW - timedelta(hours=4), "divar"),
        ("چیز دیگر", NOW, "divar"),
        ("ساعاتی پیش", NOW - timedelta(hours=2), "sheypoor"),
        ("۲ روز پیش", NOW - timedelta(days=2), "sheypoor"),
        # sheypoor has no hour-unit branch: digit+ساعت falls to now
        ("۴ ساعت پیش", NOW, "sheypoor"),
    ],
)
def test_text_to_date(spark, text, expected, variant):
    got = one(spark, fn.text_to_date("v", now=now_col(), variant=variant), text)
    assert got == expected


# ---- F11/F12 timezones -------------------------------------------------------


def test_iran_to_utc_iso(spark):
    got = one(
        spark,
        fn.iran_datetime_to_utc_iso(F.lit("2026-01-01 12:00:00").cast("timestamp")),
    )
    assert got == "2026-01-01T08:30:00+00:00"


def test_watermark_with_overlap(spark):
    got = one(
        spark,
        fn.watermark_with_overlap(
            F.lit("2026-01-01 10:00:00").cast("timestamp"), now=now_col()
        ),
    )
    # UTC → Tehran (+3:30) − 1h overlap
    assert got == datetime(2026, 1, 1, 12, 30)
    fallback = one(
        spark,
        fn.watermark_with_overlap(F.lit(None).cast("timestamp"), now=now_col()),
    )
    assert fallback == NOW - timedelta(days=1)


# ---- F13 age → build year ----------------------------------------------------


@pytest.mark.parametrize("age,expected", [(35, 1374), (25, 1384), (10, 1404), (None, None)])
def test_age_to_build_year(spark, age, expected):
    col = F.lit(age).cast("string") if age is not None else F.lit(None).cast("string")
    assert one(spark, fn.age_to_build_year(col, now=now_col())) == expected


# ---- F14/F15 ------------------------------------------------------------------


def test_try_parse_datetime(spark):
    assert one(spark, fn.try_parse_datetime("v"), "2024-01-0512:30:00") == datetime(
        2024, 1, 5, 12, 30, 0
    )
    assert one(spark, fn.try_parse_datetime("v"), "2024-01-05 12:30:00") == datetime(
        2024, 1, 5, 12, 30, 0
    )


def test_clamp_timestamp(spark):
    got = one(
        spark,
        fn.clamp_timestamp(
            F.lit("2025-12-01 00:00:00").cast("timestamp"),
            limit="2025-11-04 00:00:00",
            reset="2025-10-21 00:00:00",
        ),
    )
    assert got == datetime(2025, 10, 21)


# ---- F17-F32 strings ----------------------------------------------------------


def test_clean_text(spark):
    assert one(spark, fn.clean_text("v"), "  تک‌برگ  ") == "تک برگ"


def test_to_slug(spark):
    assert one(spark, fn.to_slug("v"), "Tehran، Vanak") == "tehran"
    assert one(spark, fn.to_slug("v"), "New City Center") == "new-city-center"


def test_normalize_property_type(spark):
    assert one(spark, fn.normalize_property_type("v"), "زمین صنعتی") == "باغ باغچه و زمین"
    assert one(spark, fn.normalize_property_type("v"), "مشارکت در ساخت") is None
    assert one(spark, fn.normalize_property_type("v"), "آپارتمان مسکونی") == "آپارتمان مسکونی"


def test_normalize_deed_type(spark):
    assert one(spark, fn.normalize_deed_type("v"), "سند: تک‌برگ") == "تک برگ"
    assert one(spark, fn.normalize_deed_type("v"), "قولنامه") == "قولنامه ای"


def test_map_enum(spark):
    m = {"personal": "شخصی", "premium-panel": "مشاور املاک"}
    assert one(spark, fn.map_enum("v", m), "personal") == "شخصی"
    assert one(spark, fn.map_enum("v", m, default="?"), "other") == "?"


def test_price_mode(spark):
    assert one(spark, fn.price_mode_from_title("v"), "ودیعه رایگان") == "مجانی"
    assert one(spark, fn.price_mode_from_title("v"), "اجاره توافقی") == "توافقی"
    assert one(spark, fn.price_mode_from_title("v"), "قیمت مقطوع") == "مقطوع"


def test_feature_presence(spark):
    assert one(spark, fn.feature_presence("v", "پارکینگ"), "پارکینگ ندارد") is False
    assert one(spark, fn.feature_presence("v", "پارکینگ"), "پارکینگ") is True
    assert one(spark, fn.feature_presence("v", "پارکینگ"), "آسانسور") is None


def test_rent_type(spark):
    df = lambda c, r: one(  # noqa: E731
        spark, fn.rent_type(F.lit(c).cast("double"), F.lit(r).cast("double"))
    )
    assert df(100.0, None) == "full_credit"
    assert df(100.0, 10.0) == "rent_credit"
    assert df(None, 10.0) == "full_rent"


def test_floor_regex(spark):
    assert one(spark, fn.floor_of("v"), "۳ از ۵") == 3
    assert one(spark, fn.total_floors_of("v"), "۳ از ۵") == 5


def test_rooms(spark):
    assert one(spark, fn.normalize_rooms("v"), "بدون اتاق") == "0"
    assert one(spark, fn.normalize_rooms("v"), "+۴") == "5"
    assert one(spark, fn.normalize_rooms("v"), "۲") == "2"


def test_construction_year(spark):
    assert one(spark, fn.normalize_construction_year("v"), "قبل از ۱۳۷۰") == -1370
    assert one(spark, fn.normalize_construction_year("v"), "۱۳۹۵") == 1395


def test_url_ops(spark):
    assert (
        one(spark, fn.token_to_url("v", "https://example.test/v8/posts/"), "AZxyz123")
        == "https://example.test/v8/posts/AZxyz123"
    )
    assert one(spark, fn.fix_url("v"), "https://example.test/posts/AZxyz123") == "AZxyz123"
    assert (
        one(spark, fn.relative_to_absolute_url("v", "https://cdn.test"), "/media/1.jpg")
        == "https://cdn.test/media/1.jpg"
    )


# ---- F33+ JSON nav -------------------------------------------------------------


def test_json_path(spark):
    assert one(spark, fn.json_path("v", "$.seo.geo.lat"), '{"seo":{"geo":{"lat":35.7}}}') == "35.7"


def test_section_widgets_and_map(spark):
    data = [
        (
            [
                {
                    "section_name": "LIST_DATA",
                    "widgets": [
                        {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "متراژ", "value": "۷۵"}},
                        {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "اتاق", "value": "۲"}},
                        {"widget_type": "GROUP_INFO_ROW", "data": {"title": "x", "value": "y"}},
                    ],
                }
            ],
        )
    ]
    schema = (
        "sections array<struct<section_name:string,"
        "widgets:array<struct<widget_type:string,data:struct<title:string,value:string>>>>>"
    )
    df = spark.createDataFrame(data, schema)
    widgets = fn.section_widgets("sections", "LIST_DATA")
    got = df.select(fn.widgets_to_map(widgets).alias("m")).first()["m"]
    assert got == {"متراژ": "۷۵", "اتاق": "۲"}
    first = df.select(
        fn.first_widget_value(widgets, title="اتاق")["value"].alias("v")
    ).first()["v"]
    assert first == "۲"


def test_next_data_json(spark):
    html = '<html><script id="__NEXT_DATA__" type="application/json">{"buildId":"abc"}</script></html>'
    assert one(spark, fn.next_data_json("v"), html) == '{"buildId":"abc"}'


def test_days_ago_and_street(spark):
    from delta_data_pipelines_spark.functions.dates import days_ago_and_street

    now = F.lit("2024-06-01 12:00:00").cast("timestamp")
    df = spark.createDataFrame(
        [
            (1, "۲ روز پیش، ولیعصر"),
            (2, "۱ هفته پیش"),
            (3, "لحظاتی پیش، ونک"),
        ],
        "id long, t string",
    )
    out = {r["id"]: r["r"] for r in df.select(
        "id", days_ago_and_street(F.col("t"), now=now).alias("r")).collect()}
    assert str(out[1]["published_at"]) == "2024-05-30 12:00:00"
    assert out[1]["street"] == "ولیعصر"
    assert str(out[2]["published_at"]) == "2024-05-25 12:00:00"
    assert out[2]["street"] is None
    assert str(out[3]["published_at"]) == "2024-06-01 12:00:00"
    assert out[3]["street"] == "ونک"


# ---------------------------------------------------------------------------
# URL canonicalization + refetch dedup (functions/urls.py)
# ---------------------------------------------------------------------------


def test_canonical_url_rules(spark):
    from pyspark.sql import functions as F

    from delta_data_pipelines_spark.functions.urls import canonical_url

    cases = {
        "HTTP://Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag":
            "http://example.com/a/b?a=1&b=2",
        "http://example.com/a/b?a=1&b=2": "http://example.com/a/b?a=1&b=2",
        "https://Example.com:443/": "https://example.com/",
        "https://example.com": "https://example.com/",
        "https://example.com/p?fbclid=123&gclid=4&ref=home":
            "https://example.com/p",
        "ftp://Host:21/file": "ftp://host:21/file",  # non-default port kept
        "http://example.com:8080/x": "http://example.com:8080/x",
        # a '?' INSIDE the fragment is not a query — whole fragment drops
        "http://a.com/p#sec?x=1": "http://a.com/p",
        # userinfo is case-sensitive (RFC 3986): only host lowercases
        "http://UserA@Example.COM/x": "http://UserA@example.com/x",
        "not a url": None,
        None: None,
    }
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(cases)], "id int, url string"
    )
    got = {
        r["url"]: r["c"]
        for r in df.select("url", canonical_url(F.col("url")).alias("c")).collect()
    }
    for url, want in cases.items():
        assert got[url] == want, (url, got[url], want)


def test_dedup_refetches_latest_wins_and_passthrough(spark):
    from delta_data_pipelines_spark.functions.urls import dedup_refetches

    rows = [
        # three fetches of one canonical page — latest date wins
        (1, "http://a.com/p?utm_source=x", "2024-01-01"),
        (2, "HTTP://A.COM:80/p", "2024-03-01"),
        (3, "http://a.com/p/", "2024-02-01"),
        # date tie — greater doc_id wins
        (4, "http://b.com/q", "2024-01-01"),
        (5, "http://b.com/q#frag", "2024-01-01"),
        # non-URL rows pass through untouched
        (6, "garbage", "2024-05-01"),
        (7, None, "2024-05-01"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, fetched_at string"
    )
    out = {r["doc_id"]: r["url"] for r in dedup_refetches(df).collect()}
    assert set(out) == {2, 5, 6, 7}
    assert out[2] == "HTTP://A.COM:80/p"  # the winner keeps its raw URL


def test_filter_blocked_hosts_label_boundaries(spark):
    """Domain blocklist semantics: an entry blocks the exact host and
    every subdomain at LABEL boundaries — shop13.com survives a
    shop3.com entry (the endswith/LIKE bug), an ads.-only entry leaves
    the parent domain alone, matching is case- and port-insensitive,
    and NULL/non-URL rows pass through."""
    from delta_data_pipelines_spark.functions.urls import (
        filter_blocked_hosts,
        host_suffixes,
    )

    rows = [
        (1, "http://shop3.com/a"),          # blocked: exact
        (2, "http://x.y.shop3.com/a"),      # blocked: deep subdomain
        (3, "http://shop13.com/a"),         # KEPT: label boundary
        (4, "http://Shop3.COM:80/a"),       # blocked: case + port
        (5, "http://ads.shop7.com/a"),      # blocked: subdomain entry
        (6, "http://shop7.com/a"),          # KEPT: parent of ads entry
        (7, "not a url"),                   # KEPT: passthrough
        (8, None),                          # KEPT: passthrough
        (9, "http://dotted.example./a"),    # KEPT: trailing-dot host —
        # its suffix chain ends in '' which a blank blocklist line
        # must NOT match
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    # CRLF / stray-whitespace entries (real UT1 list files) must
    # still match; a trailing blank line and a whitespace-only line
    # (both kept by spark.read.text) must block nothing
    bl = spark.createDataFrame(
        [("shop3.com\r",), (" ads.shop7.com ",), ("",), ("  \r",)],
        "domain string",
    )
    kept = sorted(
        r["doc_id"]
        for r in filter_blocked_hosts(df, "url", bl).collect()
    )
    assert kept == [3, 6, 7, 8, 9]

    chain = spark.createDataFrame([("a.b.c",)], "h string").select(
        host_suffixes(F.col("h")).alias("s")
    ).first()["s"]
    assert chain == ["a.b.c", "b.c", "c"]
