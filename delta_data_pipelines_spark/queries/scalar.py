"""Scalar-function queries (SURVEY §2.6 generic forms) — each exercises
a family of the F-operators on harness columns, with a DuckDB twin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table

# F1 family: character translation. The harness strings carry no
# Persian digits, so the generic form translates vowels — the operator
# under test is `translate`, not the alphabet.


def f_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.translate(F.col("c_name"), "0123456789", "۰۱۲۳۴۵۶۷۸۹").alias("fa_name"),
        F.translate(
            F.translate(F.col("c_name"), "0123456789", "۰۱۲۳۴۵۶۷۸۹"),
            "۰۱۲۳۴۵۶۷۸۹",
            "0123456789",
        ).alias("roundtrip"),
    )


def f_regex_extract_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6 — regex numeric extraction + cast (null on failure)."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), r"#(\d+)", 1).try_cast("long").alias("name_num"),
        F.regexp_replace(F.col("c_name"), r"[^0-9]", "").try_cast("double").alias("digits_only"),
    )


def f_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F12/P4 — interval arithmetic, truncation, extraction."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 1 MONTH")).alias("plus_month"),
        (F.col("o_orderdate") - F.expr("INTERVAL 7 DAYS")).alias("minus_week"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
    )


def f_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13/F21 — when-chain bucketing (age→build-year shape)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "premium")
        .when(F.col("o_totalprice") > 150000, "standard")
        .otherwise("budget")
        .alias("tier"),
    )


def f_json_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F33 — JSON-path extraction over the events props column."""
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").try_cast("long").alias("k_value"),
    )


def f_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F33 the fast way: one from_json parse into a typed struct, then
    struct field access — parses the document once regardless of how
    many fields are read (get_json_object re-parses per call)."""
    e = read_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_id", F.from_json(F.col("props"), "k long").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_value"),
        (F.col("p.k") % 10).alias("k_mod"),
    )


def f_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17/F18/F31 — trim/lower/slug/substring/concat family."""
    p = read_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace(F.trim(F.lower(F.col("p_name"))), r"\s+", "-").alias("slug"),
        F.substring(F.col("p_name"), -8, 8).alias("tail8"),
        F.concat(F.lit("https://parts.example/"), F.col("p_brand")).alias("url"),
    )


def f_toman_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — parse_toman_amount on synthesized Persian money text.

    Each order gets a deterministic Persian-digit amount string with a
    scale word chosen by key: میلیارد(×1e9)/میلیون(×1e6)/هزار(×1e3)/
    توافقی(negotiable → NULL). The oracle computes the expected long
    straight from the numbers, so the whole fa-digit + regex + scale
    chain is what's under test.
    """
    from ..functions.fa import english_to_persian_digits
    from ..functions.money import parse_toman_amount, toman_mode

    o = read_table(spark, sf_dir, "orders")
    n = (F.col("o_orderkey") % 900 + 1).cast("string")
    fa_n = english_to_persian_digits(n)
    cls = F.col("o_orderkey") % 4
    text = (
        F.when(cls == 0, F.concat(fa_n, F.lit(" میلیارد تومان")))
        .when(cls == 1, F.concat(fa_n, F.lit(" میلیون تومان")))
        .when(cls == 2, F.concat(fa_n, F.lit(" هزار تومان")))
        .otherwise(F.lit("توافقی"))
    )
    return o.select(
        "o_orderkey",
        parse_toman_amount(text).alias("toman"),
        toman_mode(text).alias("mode"),
    )


def f_relative_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 — text_to_date on synthesized relative-Persian phrases with a
    frozen clock (divar variant: divar_transformer.py:32-56)."""
    from ..functions.dates import text_to_date
    from ..functions.fa import english_to_persian_digits

    now = F.lit("2024-06-01 12:00:00").cast("timestamp")
    o = read_table(spark, sf_dir, "orders")
    n = (F.col("o_orderkey") % 24 + 1).cast("string")
    fa_n = english_to_persian_digits(n)
    cls = F.col("o_orderkey") % 6
    text = (
        F.when(cls == 0, F.lit("لحظاتی پیش"))
        .when(cls == 1, F.lit("دقایقی پیش"))
        .when(cls == 2, F.concat(fa_n, F.lit(" روز پیش")))
        .when(cls == 3, F.concat(fa_n, F.lit(" هفته پیش")))
        .when(cls == 4, F.concat(fa_n, F.lit(" ماه پیش")))
        .otherwise(F.concat(fa_n, F.lit(" ساعت پیش")))
    )
    return o.select("o_orderkey", text_to_date(text, now=now).alias("published_at"))


def f_age_build_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 — age→Jalali build year bucketing with a frozen clock
    (utils_of_searchengine.py:71-91)."""
    from ..functions.dates import age_to_build_year

    now = F.lit("2024-06-01 12:00:00").cast("timestamp")
    o = read_table(spark, sf_dir, "orders")
    age = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("string")).otherwise(
        (F.col("o_orderkey") % 45).cast("string")
    )
    return o.select("o_orderkey", age_to_build_year(age, now=now).alias("build_year"))


def f_enum_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19/F20/F25/F26/F27 — Persian enum/label normalization chains on
    synthesized inputs; the oracle recomputes expectations from the key
    classes directly."""
    from ..functions.fa import english_to_persian_digits
    from ..functions.text import (
        floor_of,
        normalize_deed_type,
        normalize_property_type,
        normalize_rooms,
        rent_type,
        total_floors_of,
    )

    o = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    prop = (
        F.when(k % 4 == 0, F.lit("آپارتمان"))
        .when(k % 4 == 1, F.lit("مشارکت در ساخت"))
        .when(k % 4 == 2, F.lit("زمین کشاورزی"))
        .otherwise(F.lit("سوله صنعتی"))
    )
    deed = (
        F.when(k % 3 == 0, F.lit("سند: تک برگ دارد"))
        .when(k % 3 == 1, F.lit("قولنامه دست دوم"))
        .otherwise(F.lit("شش دانگ"))
    )
    rooms = (
        F.when(k % 5 == 0, F.lit("بدون اتاق"))
        .when(k % 5 == 1, F.concat(F.lit("+"), english_to_persian_digits((k % 4 + 1).cast("string"))))
        .otherwise(english_to_persian_digits((k % 4 + 1).cast("string")))
    )
    floor_txt = F.concat(
        english_to_persian_digits((k % 10).cast("string")),
        F.lit(" از "),
        english_to_persian_digits((k % 10 + 5).cast("string")),
    )
    credit = F.when(k % 2 == 0, (k % 7) * 1000.0).otherwise(F.lit(0.0))
    rent = F.when(k % 3 == 0, (k % 5) * 500.0).otherwise(F.lit(0.0))
    return o.select(
        "o_orderkey",
        normalize_property_type(prop).alias("prop_type"),
        normalize_deed_type(deed).alias("deed"),
        normalize_rooms(rooms).alias("rooms"),
        floor_of(floor_txt).alias("floor"),
        total_floors_of(floor_txt).alias("total_floors"),
        rent_type(credit, rent).alias("rent_kind"),
    )


def f_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + refetch dedup (functions/urls.py) over
    synthetic fetch logs built from orders: cosmetic URL variants —
    scheme/host case, default :80 port, trailing slash, tracking
    params, param order, fragments — collapse to one canonical key
    and the LATEST fetch wins (o_orderdate, doc_id tie-break);
    non-URL rows pass through. Scale shape: one max_by(struct)
    partial-agg groupBy on the canonical key — single shuffle, no
    window, combiner-side reduction on refetch-heavy keys."""
    from ..functions.urls import dedup_refetches

    o = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    url = F.when(
        k % 97 == 0, F.concat(F.lit("plain-ref-"), k.cast("string"))
    ).otherwise(
        F.concat(
            F.when(k % 2 == 0, F.lit("HTTP://Shop")).otherwise(
                F.lit("http://shop")
            ),
            (F.col("o_custkey") % 20).cast("string"),
            F.when(k % 2 == 0, F.lit(".COM:80")).otherwise(F.lit(".com")),
            F.lit("/item/"),
            (k % 500).cast("string"),
            F.when(k % 3 == 0, F.lit("/?b=2&a=1&utm_source=x#f"))
            .when(k % 3 == 1, F.lit("?a=1&fbclid=9&b=2"))
            .otherwise(F.lit("?a=1&b=2")),
        )
    )
    src = o.select(
        k.alias("doc_id"),
        url.alias("url"),
        F.col("o_orderdate").alias("fetched_at"),
    )
    return dedup_refetches(src).orderBy("doc_id")


def f_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UT1-style domain blocklist filtering (the stage between URL
    dedup and text extraction in RefinedWeb/FineWeb): a blocked entry
    removes the exact host and every subdomain, at LABEL boundaries —
    the synthesized hosts include ``shop13.com`` rows that a naive
    endswith/LIKE match would wrongly drop for the ``shop3.com``
    entry, and ``ads.shop7.com`` pages blocked while ``shop7.com``
    itself survives. One suffix-chain explode + broadcast semi-join +
    anti-join back (functions.urls.filter_blocked_hosts); mixed-case
    hosts and :80 ports exercise the real parse path; non-URL rows
    pass through. The oracle re-derives blockedness from the URL
    synthesis arithmetic, so a suffix-matching bug breaks the hash."""
    from ..functions.urls import filter_blocked_hosts

    o = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    host = F.concat(
        F.when(k % 5 == 0, F.lit("ads.")).otherwise(F.lit("")),
        F.when(k % 2 == 0, F.lit("Shop")).otherwise(F.lit("shop")),
        (F.col("o_custkey") % 20).cast("string"),
        F.when(k % 2 == 0, F.lit(".COM:80")).otherwise(F.lit(".com")),
    )
    url = F.when(
        k % 97 == 0, F.concat(F.lit("plain-ref-"), k.cast("string"))
    ).otherwise(
        F.concat(
            F.lit("http://"), host, F.lit("/item/"), (k % 500).cast("string")
        )
    )
    src = o.select(k.alias("doc_id"), url.alias("url"))
    blocklist = spark.createDataFrame(
        [("shop3.com",), ("ads.shop7.com",)], "domain string"
    )
    return filter_blocked_hosts(src, "url", blocklist).orderBy("doc_id")


SPARK_QUERIES = {
    "f_translate": f_translate,
    "f_regex_extract_cast": f_regex_extract_cast,
    "f_date_arithmetic": f_date_arithmetic,
    "f_case_buckets": f_case_buckets,
    "f_json_navigation": f_json_navigation,
    "f_json_struct": f_json_struct,
    "f_string_ops": f_string_ops,
    "f_toman_parse": f_toman_parse,
    "f_relative_dates": f_relative_dates,
    "f_age_build_year": f_age_build_year,
    "f_enum_normalize": f_enum_normalize,
    "f_url_dedup": f_url_dedup,
    "f_url_blocklist": f_url_blocklist,
}

ORACLE_SQL = {
    "f_translate": """
        SELECT c_custkey,
               translate(c_name, '0123456789', '۰۱۲۳۴۵۶۷۸۹') AS fa_name,
               translate(translate(c_name, '0123456789', '۰۱۲۳۴۵۶۷۸۹'),
                         '۰۱۲۳۴۵۶۷۸۹', '0123456789') AS roundtrip
        FROM customer
    """,
    "f_regex_extract_cast": """
        SELECT c_custkey,
               TRY_CAST(regexp_extract(c_name, '#(\\d+)', 1) AS BIGINT) AS name_num,
               TRY_CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS DOUBLE) AS digits_only
        FROM customer
    """,
    "f_date_arithmetic": """
        SELECT o_orderkey,
               o_orderdate + INTERVAL 1 MONTH AS plus_month,
               o_orderdate - INTERVAL 7 DAY AS minus_week,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo
        FROM orders
    """,
    "f_case_buckets": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 300000 THEN 'premium'
                    WHEN o_totalprice > 150000 THEN 'standard'
                    ELSE 'budget' END AS tier
        FROM orders
    """,
    "f_json_navigation": """
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        FROM events
    """,
    "f_toman_parse": """
        SELECT o_orderkey,
               CASE o_orderkey % 4
                    WHEN 0 THEN (o_orderkey % 900 + 1) * 1000000000
                    WHEN 1 THEN (o_orderkey % 900 + 1) * 1000000
                    WHEN 2 THEN (o_orderkey % 900 + 1) * 1000
                    ELSE NULL END AS toman,
               CASE WHEN o_orderkey % 4 = 3 THEN 'توافقی' ELSE NULL END AS mode
        FROM orders
    """,
    "f_relative_dates": """
        SELECT o_orderkey,
               CASE o_orderkey % 6
                    WHEN 0 THEN TIMESTAMP '2024-06-01 12:00:00'
                    WHEN 1 THEN TIMESTAMP '2024-06-01 12:00:00' - INTERVAL '5 minutes'
                    WHEN 2 THEN TIMESTAMP '2024-06-01 12:00:00'
                         - to_days(CAST(o_orderkey % 24 + 1 AS INTEGER))
                    WHEN 3 THEN TIMESTAMP '2024-06-01 12:00:00'
                         - to_days(CAST((o_orderkey % 24 + 1) * 7 AS INTEGER))
                    WHEN 4 THEN TIMESTAMP '2024-06-01 12:00:00'
                         - to_days(CAST((o_orderkey % 24 + 1) * 30 AS INTEGER))
                    ELSE TIMESTAMP '2024-06-01 12:00:00'
                         - to_hours(CAST(o_orderkey % 24 + 1 AS INTEGER))
               END AS published_at
        FROM orders
    """,
    "f_age_build_year": """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    WHEN o_orderkey % 45 > 30 THEN 2024 - 621 - 31
                    WHEN o_orderkey % 45 > 20 THEN 2024 - 621 - 21
                    ELSE 1404 END AS build_year
        FROM orders
    """,
    "f_json_struct": """
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
        FROM events
    """,
    "f_enum_normalize": """
        SELECT o_orderkey,
               CASE o_orderkey % 4
                    WHEN 0 THEN 'آپارتمان'
                    WHEN 1 THEN NULL                 -- مشارکت → dropped
                    ELSE 'باغ باغچه و زمین'          -- زمین / صنعتی
               END AS prop_type,
               CASE o_orderkey % 3
                    WHEN 0 THEN 'تک برگ'
                    WHEN 1 THEN 'قولنامه ای'
                    ELSE 'شش دانگ'
               END AS deed,
               CASE WHEN o_orderkey % 5 = 0 THEN '0'
                    WHEN o_orderkey % 5 = 1 THEN CAST(o_orderkey % 4 + 2 AS VARCHAR)
                    ELSE CAST(o_orderkey % 4 + 1 AS VARCHAR)
               END AS rooms,
               CAST(o_orderkey % 10 AS INTEGER) AS floor,
               CAST(o_orderkey % 10 + 5 AS INTEGER) AS total_floors,
               CASE WHEN o_orderkey % 2 = 0 AND o_orderkey % 7 <> 0
                         AND NOT (o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0)
                         THEN 'full_credit'
                    WHEN o_orderkey % 2 = 0 AND o_orderkey % 7 <> 0
                         THEN 'rent_credit'
                    WHEN o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0
                         THEN 'full_rent'
                    ELSE NULL
               END AS rent_kind
        FROM orders
    """,
    "f_string_ops": """
        SELECT p_partkey,
               regexp_replace(trim(lower(p_name)), '\\s+', '-', 'g') AS slug,
               CASE WHEN length(p_name) >= 8
                    THEN substring(p_name, length(p_name) - 7, 8)
                    ELSE p_name END AS tail8,
               concat('https://parts.example/', p_brand) AS url
        FROM part
    """,
    # blockedness re-derived from the URL synthesis arithmetic (the
    # host IS a function of the keys), so the Spark side's real
    # parse_url -> suffix-chain -> semi-join path is verified against
    # a parse-free reconstruction; label-boundary semantics: cust%20=3
    # blocks (shop3.com entry, subdomains included via the chain),
    # ads.shop7.com blocks only the ads. rows of cust%20=7, and
    # shop13.com (cust%20=13) survives untouched
    "f_url_blocklist": """
        SELECT o_orderkey AS doc_id,
               CASE WHEN o_orderkey % 97 = 0
                    THEN 'plain-ref-' || CAST(o_orderkey AS VARCHAR)
                    ELSE 'http://'
                         || (CASE WHEN o_orderkey % 5 = 0
                                  THEN 'ads.' ELSE '' END)
                         || (CASE WHEN o_orderkey % 2 = 0
                                  THEN 'Shop' ELSE 'shop' END)
                         || CAST(o_custkey % 20 AS VARCHAR)
                         || (CASE WHEN o_orderkey % 2 = 0
                                  THEN '.COM:80' ELSE '.com' END)
                         || '/item/' || CAST(o_orderkey % 500 AS VARCHAR)
               END AS url
        FROM orders
        WHERE NOT (o_orderkey % 97 <> 0
                   AND (o_custkey % 20 = 3
                        OR (o_orderkey % 5 = 0 AND o_custkey % 20 = 7)))
        ORDER BY doc_id
    """,
    # canonical_url recomputed verbatim (same regexes, same list ops);
    # the latest fetch per canonical key wins via QUALIFY-equivalent
    # row_number; non-URL rows pass through
    "f_url_dedup": """
        WITH src AS (
            SELECT o_orderkey AS doc_id,
                   CASE WHEN o_orderkey % 97 = 0
                        THEN 'plain-ref-' || CAST(o_orderkey AS VARCHAR)
                        ELSE (CASE WHEN o_orderkey % 2 = 0
                                   THEN 'HTTP://Shop' ELSE 'http://shop' END)
                             || CAST(o_custkey % 20 AS VARCHAR)
                             || (CASE WHEN o_orderkey % 2 = 0
                                      THEN '.COM:80' ELSE '.com' END)
                             || '/item/' || CAST(o_orderkey % 500 AS VARCHAR)
                             || (CASE WHEN o_orderkey % 3 = 0
                                      THEN '/?b=2&a=1&utm_source=x#f'
                                      WHEN o_orderkey % 3 = 1
                                      THEN '?a=1&fbclid=9&b=2'
                                      ELSE '?a=1&b=2' END)
                   END AS url,
                   o_orderdate AS fetched_at
            FROM orders
        ), parts AS (
            SELECT *,
                lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1)) AS proto,
                regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1) AS rawauth,
                regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*([^?#]*)', 1) AS path0,
                regexp_extract(url, '^[^#]*?\\?([^#]*)', 1) AS q
            FROM src
        ), parts2 AS (
            SELECT *, regexp_extract(rawauth, '^(.*@)', 1)
                      || lower(regexp_extract(rawauth, '([^@]*)$', 1)) AS auth0
            FROM parts
        ), canon AS (
            SELECT doc_id, url, fetched_at,
                CASE WHEN proto = '' THEN NULL
                     ELSE proto || '://'
                          || (CASE WHEN proto = 'http' AND auth0 LIKE '%:80'
                                   THEN substr(auth0, 1, length(auth0) - 3)
                                   WHEN proto = 'https' AND auth0 LIKE '%:443'
                                   THEN substr(auth0, 1, length(auth0) - 4)
                                   ELSE auth0 END)
                          || (CASE WHEN regexp_replace(path0, '/+$', '') = ''
                                   THEN '/'
                                   ELSE regexp_replace(path0, '/+$', '') END)
                          || (CASE WHEN len(list_filter(string_split(q, '&'),
                                        p -> p <> '' AND NOT regexp_matches(p,
                                        '^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)(=.*)?$'))) > 0
                                   THEN '?' || array_to_string(
                                        list_sort(list_filter(string_split(q, '&'),
                                            p -> p <> '' AND NOT regexp_matches(p,
                                            '^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)(=.*)?$'))), '&')
                                   ELSE '' END)
                END AS c
            FROM parts2
        ), winners AS (
            SELECT doc_id, url, fetched_at FROM (
                SELECT doc_id, url, fetched_at,
                       row_number() OVER (PARTITION BY c
                           ORDER BY fetched_at DESC, doc_id DESC) AS rn
                FROM canon WHERE c IS NOT NULL
            ) WHERE rn = 1
        )
        SELECT doc_id, url, fetched_at FROM winners
        UNION ALL
        SELECT doc_id, url, fetched_at FROM canon WHERE c IS NULL
        ORDER BY doc_id
    """,

}
