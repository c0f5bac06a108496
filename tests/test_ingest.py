"""Pipeline golden tests: tiny raw-payload fixtures per site →
canonical rows (SURVEY.md §5 plan), plus crawl-side dedup logic and
the streaming fetch pipeline end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_data_pipelines_spark.ingest import crawl, registry, transform
from delta_data_pipelines_spark.schemas import (
    LISTING_COLUMNS,
    SEEN_URLS_SCHEMA,
    URL_QUEUE_SCHEMA,
)
from delta_data_pipelines_spark.storage import VersionedTable

def NOW():
    return F.lit("2026-01-01 00:00:00").cast("timestamp")

DIVAR_SCHEMA = """
content_url string,
data struct<
  analytics: struct<cat2:string, cat3:string, city:string>,
  webengage: struct<district:string, business_type:string, credit:double, rent:double>,
  seo: struct<post_seo_schema: struct<description:string, image:array<string>,
    geo: struct<latitude:double, longitude:double>>>,
  share: struct<title:string>,
  city: struct<second_slug:string>,
  sections: array<struct<section_name:string, widgets: array<struct<
    widget_type:string,
    data: struct<title:string, value:string, subtitle:string,
      location: struct<fuzzy_data: struct<point: struct<latitude:double, longitude:double>,
        radius:double>, exact_data: struct<latitude:double, longitude:double>>>>>>>
>
"""


@pytest.fixture(scope="module")
def divar_raw(spark):
    payload = {
        "analytics": {"cat2": "residential-sell", "cat3": "apartment-sell", "city": "tehran"},
        "webengage": {"district": "vanak", "business_type": "personal", "credit": None, "rent": None},
        "seo": {
            "post_seo_schema": {
                "description": "apartment description",
                "image": ["https://img/1.jpg", "https://img/2.jpg", "https://img/1.jpg"],
                "geo": {"latitude": 35.7, "longitude": 51.4},
            }
        },
        "share": {"title": "آپارتمان ۷۵ متری"},
        "city": {"second_slug": None},
        "sections": [
            {
                "section_name": "TITLE",
                "widgets": [
                    {
                        "widget_type": "LEGEND_TITLE_ROW",
                        "data": {"title": None, "value": None, "subtitle": "۲ روز پیش در تهران", "location": None},
                    }
                ],
            },
            {
                "section_name": "LIST_DATA",
                "widgets": [
                    {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "متراژ", "value": "۷۵", "subtitle": None, "location": None}},
                    {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "اتاق", "value": "۲", "subtitle": None, "location": None}},
                    {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "قیمت کل", "value": "۵٬۲۰۰٬۰۰۰٬۰۰۰ تومان", "subtitle": None, "location": None}},
                    {"widget_type": "UNEXPANDABLE_ROW", "data": {"title": "طبقه", "value": "۳ از ۵", "subtitle": None, "location": None}},
                ],
            },
        ],
    }
    return spark.createDataFrame([("https://divar.example/v/abc", payload)], DIVAR_SCHEMA)


def test_divar_transform(spark, divar_raw):
    from delta_data_pipelines_spark.ingest.transformers import divar

    out = divar.transform(divar_raw, now=NOW())
    assert out.columns == LISTING_COLUMNS
    row = out.first()
    assert row["content_url"] == "https://divar.example/v/abc"
    assert row["cat3_slug"] == "apartment-sell"
    assert row["city_slug"] == "tehran"
    assert row["user_type"] == "شخصی"
    assert row["building_size"] == 75.0
    assert row["rooms_count"] == 2
    assert row["price_value"] == 5_200_000_000
    assert row["floor"] == 3 and row["total_floors_count"] == 5
    assert str(row["created_at_month"]) == "2025-12-30 00:00:00"
    assert row["location_latitude"] == 35.7
    assert row["images"] == ["https://img/1.jpg", "https://img/2.jpg"]  # ordered dedup
    assert row["source"] == "divar"


SHEYPOOR_SCHEMA = """
content_url string,
data struct<
  attributes: struct<title:string, location:string, timePassedLabel:string,
    categories: array<struct<name:string>>,
    price: array<struct<label:string, amount:string>>,
    images: struct<thumbnails: struct<round:string>>>,
  fullAttributes: array<struct<key:string, value:string>>,
  geo: struct<lat:double, lon:double>,
  description: string
>
"""


def test_sheypoor_transform(spark):
    from delta_data_pipelines_spark.ingest.transformers import sheypoor

    payload = {
        "attributes": {
            "title": "رهن و اجاره آپارتمان",
            "location": "تهران، ونک",
            "timePassedLabel": "ساعاتی پیش",
            "categories": [{"name": "املاک"}, {"name": "اجاره مسکونی"}],
            "price": [
                {"label": "ودیعه", "amount": "۵۰۰٬۰۰۰٬۰۰۰"},
                {"label": "اجاره ماهیانه", "amount": "۲۰٬۰۰۰٬۰۰۰"},
            ],
            "images": {"thumbnails": {"round": "https://img/round.jpg"}},
        },
        "fullAttributes": [{"key": "متراژ", "value": "۸۰"}, {"key": "تعداد اتاق", "value": "۲"}],
        "geo": {"lat": 35.75, "lon": 51.41},
        "description": "desc",
    }
    raw = spark.createDataFrame([("https://sheypoor.example/v/1", payload)], SHEYPOOR_SCHEMA)
    row = sheypoor.transform(raw, now=NOW()).first()
    assert row["city_slug"] == "تهران"
    assert row["neighborhood_slug"] == "ونک"
    assert row["credit_value"] == 500_000_000.0
    assert row["rent_value"] == 20_000_000.0
    assert row["rent_type"] == "rent_credit"
    assert row["building_size"] == 80.0
    assert str(row["created_at_month"]) == "2025-12-31 22:00:00"  # ساعاتی پیش → −2h
    assert row["image"] == "https://img/round.jpg"


MRESTATE_SCHEMA = """
content_url string,
data struct<pageProps: struct<data: struct<
  breadcrumb: array<struct<name:string>>,
  data: struct<city:string, neighbourhood:string, date_publish:string,
    is_owner:boolean, creator_properties: struct<real_estate:string, consultant:string>,
    more_description:string, title:string, price_rent:bigint, price_sell:bigint,
    price_mortgage:bigint, area:double, num_bedrooms:int, year_constructed:int,
    latitude:double, longitude:double,
    more_details: struct<floor:int, balcony:boolean, elevator:boolean,
      storeHouse:boolean, parking:int, security:boolean, pool:boolean,
      jacuzzi:boolean, sauna:boolean>,
    list_image: array<struct<url:string>>>>>>
"""


def test_mrestate_transform(spark):
    from delta_data_pipelines_spark.ingest.transformers import mrestate

    payload = {
        "pageProps": {
            "data": {
                "breadcrumb": [{"name": "خانه"}, {"name": "تهران"}, {"name": "آپارتمان"}],
                "data": {
                    "city": "Tehran",
                    "neighbourhood": "Saadat Abad",
                    "date_publish": "۳ روز پیش",
                    "is_owner": True,
                    "creator_properties": {"real_estate": None, "consultant": None},
                    "more_description": "desc",
                    "title": "apt",
                    "price_rent": 0,
                    "price_sell": 9_000_000_000,
                    "price_mortgage": 0,
                    "area": 120.0,
                    "num_bedrooms": 3,
                    "year_constructed": 1398,
                    "latitude": 35.78,
                    "longitude": 51.39,
                    "more_details": {
                        "floor": 4, "balcony": True, "elevator": True, "storeHouse": True,
                        "parking": 2, "security": True, "pool": False, "jacuzzi": False,
                        "sauna": False,
                    },
                    "list_image": [{"url": "/media/a.jpg"}, {"url": "https://cdn/b.jpg"}],
                },
            }
        }
    }
    raw = spark.createDataFrame([("https://mrestate.example/p/9", payload)], MRESTATE_SCHEMA)
    row = mrestate.transform(raw, now=NOW()).first()
    assert row["user_type"] == "شخصی"
    assert row["price_value"] == 9_000_000_000
    assert row["has_parking"] is True
    assert row["floor"] == 4
    assert str(row["created_at_month"]) == "2025-12-29 00:00:00"
    assert row["images"] == ["https://mrestate.example/media/a.jpg", "https://cdn/b.jpg"]
    assert row["bread_crumb"] == "خانه\n/\nتهران\n/\nآپارتمان"


KILID_HTML = """
<html><body>
<nav>
 <a class="breadcrumb" href="/">خانه</a>
 <a class="breadcrumb" href="/buy">خرید</a>
 <a class="breadcrumb" href="/tehran">تهران</a>
 <a class="breadcrumb" href="/apt">آپارتمان</a>
 <a class="breadcrumb" href="/vnk">ونک</a>
</nav>
<h1 class="title">آپارتمان ۹۵ متری ونک</h1>
<div><span class="price-label">قیمت کل</span><span class="price-value">۸.۵ میلیارد تومان</span></div>
<div>سند: تک‌برگ</div>
<span class="publish-date">۱ هفته پیش</span>
<div class="area">۹۵ متر</div>
<div class="rooms">۲</div>
<p class="description">توضیحات ملک</p>
</body></html>
"""


def test_kilid_transform(spark):
    from delta_data_pipelines_spark.ingest.transformers import kilid

    raw = spark.createDataFrame(
        [("https://kilid.example/l/77", KILID_HTML, "BUY", "APARTMENT", "RESIDENTIAL")],
        "content_url string, html_content string, listingType string, propertyType string, landuseType string",
    )
    row = kilid.transform(raw, now=NOW()).first()
    assert row["cat1_slug"] == "buy"
    assert row["title"] == "آپارتمان ۹۵ متری ونک"
    assert row["price_value"] == 8_000_000_000  # first int of ۸.۵ میلیارد
    assert row["rent_value"] is None  # BUY nulls rent fields
    assert row["deed_type"] == "تک برگ"
    assert row["building_size"] == 95.0
    assert row["rooms_count"] == 2
    assert row["city_slug"] == "تهران"
    assert str(row["created_at_month"]) == "2025-12-25 00:00:00"


def test_registry_dispatch_and_union(spark, divar_raw):
    out = transform("divar", divar_raw)
    assert out.columns == LISTING_COLUMNS
    with pytest.raises(KeyError):
        transform("nope", divar_raw)


def test_crawl_dedup_and_publish(spark, tmp_path):
    seen_t = VersionedTable(spark, str(tmp_path / "seen"))
    queue_t = VersionedTable(spark, str(tmp_path / "queue"))
    seen_t.overwrite(
        spark.createDataFrame([("divar", "u1"), ("divar", "u2")], SEEN_URLS_SCHEMA)
    )
    urls = spark.createDataFrame([("u1",), ("u3",), ("u4",)], "content_url string")
    new, dup = crawl.partition_new(urls, seen_t.read(), "divar")
    assert {r["content_url"] for r in new.collect()} == {"u3", "u4"}
    assert {r["content_url"] for r in dup.collect()} == {"u1"}
    assert crawl.dup_ratio(urls, seen_t.read(), "divar") == pytest.approx(1 / 3)
    assert crawl.publish(queue_t, new, "divar") == 2
    assert crawl.publish(queue_t, new, "divar") == 0  # idempotent
    assert crawl.mark_seen(seen_t, new, "divar") == 2
    assert crawl.dup_ratio(urls, seen_t.read(), "divar") == 1.0


def test_streaming_fetch_pipeline(spark, tmp_path, divar_raw):
    """queue dir → readStream → divar transform → MERGE sink, twice:
    the second delivery must not duplicate rows (ST4)."""
    from delta_data_pipelines_spark.ingest.transformers import divar
    from delta_data_pipelines_spark.streaming import queue_stream, run_fetch_pipeline

    qdir = str(tmp_path / "landing")
    divar_raw.write.mode("overwrite").parquet(qdir)
    listings = VersionedTable(spark, str(tmp_path / "listings"))

    stream = queue_stream(spark, qdir, divar_raw.schema, max_files_per_trigger=1)
    q = run_fetch_pipeline(
        stream, lambda df: divar.transform(df, now=NOW()), listings,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert listings.read().count() == 1

    # redeliver the same payload in a new file → merge no-ops
    divar_raw.write.mode("append").parquet(qdir)
    stream2 = queue_stream(spark, qdir, divar_raw.schema)
    q2 = run_fetch_pipeline(
        stream2, lambda df: divar.transform(df, now=NOW()), listings,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert listings.read().count() == 1
    assert listings.read().first()["city_slug"] == "tehran"


def test_csv_round_trip(spark, tmp_path):
    from delta_data_pipelines_spark.ingest.tabular import read_csv, write_csv

    df = spark.range(0, 50).selectExpr("id", "CAST(id * 1.5 AS DOUBLE) AS price")
    out = str(tmp_path / "csv")
    write_csv(df, out, single_file=True)
    back = read_csv(spark, out, schema="id long, price double")
    assert back.count() == 50
    assert back.schema.simpleString() == "struct<id:bigint,price:double>"


def test_pandas_to_spark_schema(spark):
    import pandas as pd

    from delta_data_pipelines_spark.ingest.tabular import pandas_to_spark

    pdf = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    df = pandas_to_spark(spark, pdf, schema="a long, b string")
    assert [tuple(r) for r in df.orderBy("a").collect()] == [(1, "x"), (2, "y")]


def test_read_excel_raises_without_engine(spark, tmp_path):
    import pytest as _pytest

    from delta_data_pipelines_spark.ingest.tabular import read_excel

    fake = tmp_path / "x.xlsx"
    fake.write_bytes(b"PK\x03\x04 not a real workbook")
    with _pytest.raises(Exception):
        read_excel(spark, str(fake))


def test_xml_results_to_rows(spark):
    from delta_data_pipelines_spark.ingest.xml_source import xml_results_to_rows

    xml = (
        "<results>"
        "<result><id>a1</id><listingType>BUY</listingType>"
        "<propertyType>APARTMENT</propertyType><landuseType>RES</landuseType></result>"
        "<result><id>a2</id><listingType>RENT</listingType>"
        "<propertyType>VILLA</propertyType><landuseType>RES</landuseType></result>"
        "</results>"
    )
    df = spark.createDataFrame(
        [("p1", xml), ("p2", "not xml at all <<<")], "page string, xml_body string"
    )
    out = xml_results_to_rows(df).collect()
    assert {(r["page"], r["listing_id"], r["listing_type"]) for r in out} == {
        ("p1", "a1", "BUY"),
        ("p1", "a2", "RENT"),
    }  # malformed payload contributes zero rows


def test_html_udf_class_extraction(spark):
    from delta_data_pipelines_spark.ingest.html_udf import extract_class_texts

    html = (
        '<div class="price-label">rent</div>'
        '<div class="price-value"><b>۵ میلیون</b> تومان</div>'
        '<span class="price-label">deposit</span>'
        "<p>noise</p>"
    )
    df = spark.createDataFrame(
        [(1, html), (2, "<broken <<< markup")], "doc_id long, html string"
    )
    out = extract_class_texts(df, "html", ["price-label", "price-value"], "doc_id")
    rows = {(r["doc_id"], r["css_class"]): r["texts"] for r in out.collect()}
    assert rows[(1, "price-label")] == ["rent", "deposit"]
    # nested tags: text inside <b> still belongs to the outer class div
    assert rows[(1, "price-value")] == ["۵ میلیون", "تومان"]
    assert rows[(2, "price-label")] == []  # malformed → empty, no crash


def test_run_crawl_dup_ratio_early_stop(spark, tmp_path):
    from delta_data_pipelines_spark.ingest.paginate import run_crawl
    from delta_data_pipelines_spark.storage import VersionedTable

    seen = VersionedTable(spark, str(tmp_path / "seen"))
    queue = VersionedTable(spark, str(tmp_path / "queue"))

    def urls(lo, hi):
        return spark.createDataFrame(
            [(f"https://d/{i}",) for i in range(lo, hi)], "content_url string"
        )

    # crawl 1: three fresh pages, exhausts the iterator
    m1 = run_crawl(iter([urls(0, 10), urls(10, 20), urls(20, 30)]),
                   "divar", seen, queue, dup_stop_ratio=0.5)
    assert m1["stopped_by"] == "exhausted"
    assert m1["new"] == 30 and queue.read().count() == 30

    # crawl 2: first page 100% already-seen → publishes nothing new,
    # stops on dup ratio without touching the second page
    m2 = run_crawl(iter([urls(0, 10), urls(100, 110)]),
                   "divar", seen, queue, dup_stop_ratio=0.5)
    assert m2["stopped_by"] == "dup_ratio"
    assert m2["pages"] == 1 and m2["new"] == 0
    assert queue.read().count() == 30

    # crawl 3: empty page stops immediately
    m3 = run_crawl(iter([urls(0, 0)]), "divar", seen, queue)
    assert m3["stopped_by"] == "empty_page"


def test_fetch_stage_errors_as_data(spark):
    from delta_data_pipelines_spark.ingest.fetch import fetch_stage

    def _fake_fetch(url):  # closure → pickled by value for executors
        if url.endswith("/bad"):
            raise ValueError("HTTP 500")
        return f"<html>{url}</html>"

    urls = spark.createDataFrame(
        [("https://d/1",), ("https://d/bad",), ("https://d/3",)],
        "content_url string",
    )
    out = {r["content_url"]: r for r in fetch_stage(urls, _fake_fetch).collect()}
    assert out["https://d/1"]["body"] == "<html>https://d/1</html>"
    assert out["https://d/1"]["fetch_error"] is None
    assert out["https://d/bad"]["body"] is None
    assert "HTTP 500" in out["https://d/bad"]["fetch_error"]
    assert len(out) == 3  # failures never drop rows


def test_parse_with_quarantine(spark):
    from delta_data_pipelines_spark.ingest.quarantine import parse_with_quarantine

    raw = spark.createDataFrame(
        [
            (1, '{"price": 100, "title": "ok"}'),
            (2, "{{{ not json"),
            (3, '{"price": 250}'),  # missing field → typed NULL, still clean
            (4, None),  # null payload: neither clean nor quarantined
        ],
        "id long, payload string",
    )
    clean, quarantined = parse_with_quarantine(
        raw, "payload", "price long, title string"
    )
    c = {r["id"]: r["parsed"] for r in clean.collect()}
    assert set(c) == {1, 3}
    assert c[1]["price"] == 100 and c[3]["title"] is None
    q = quarantined.collect()
    assert [r["id"] for r in q] == [2]
    assert q[0]["payload"] == "{{{ not json"  # raw kept for replay


def test_fetcher_path_end_to_end(spark, divar_raw, tmp_path):
    """The full SURVEY §3.2 path in one run: url queue → executor-side
    fetch → permissive parse w/ quarantine → site transform → conform
    → idempotent MERGE into listings."""
    from delta_data_pipelines_spark.ingest.fetch import fetch_stage
    from delta_data_pipelines_spark.ingest.quarantine import parse_with_quarantine
    from delta_data_pipelines_spark.ingest.transformers import divar

    payload_json = divar_raw.select(F.to_json("data").alias("j")).first()["j"]
    data_schema = divar_raw.schema["data"].dataType

    urls = spark.createDataFrame(
        [("https://divar.example/v/abc",), ("https://divar.example/v/broken",)],
        "content_url string",
    )

    def fake_fetch(url):  # closure → pickled by value
        return "{{{ corrupt" if url.endswith("broken") else payload_json

    fetched = fetch_stage(urls, fake_fetch)
    clean, quarantined = parse_with_quarantine(fetched, "body", data_schema)
    assert quarantined.count() == 1  # the broken payload, kept for replay

    raw = clean.select("content_url", F.col("parsed").alias("data"))
    canonical = divar.transform(raw, now=NOW())
    assert canonical.columns == LISTING_COLUMNS

    listings = VersionedTable(spark, str(tmp_path / "listings_e2e"))
    for _ in range(2):  # re-delivery: second MERGE inserts nothing
        listings.merge(canonical, keys=["content_url"])
    final = listings.read().collect()
    assert len(final) == 1
    assert final[0]["price_value"] == 5_200_000_000


# ---------------------------------------------------------------------------
# S13 — JDBC source option contract (no DB server in container)
# ---------------------------------------------------------------------------


def test_jdbc_options_pushdown_query():
    from delta_data_pipelines_spark.ingest.jdbc import build_jdbc_options

    opts = build_jdbc_options(
        url="jdbc:sqlserver://db:1433;databaseName=search",
        query="SELECT Id, Title FROM Deposits WHERE StatusId = 1247",
        user="svc",
        password="x",
        driver="com.microsoft.sqlserver.jdbc.SQLServerDriver",
        fetchsize=5000,
    )
    assert opts["query"].startswith("SELECT Id, Title")
    assert opts["fetchsize"] == "5000"
    assert opts["driver"].endswith("SQLServerDriver")
    assert "dbtable" not in opts


def test_jdbc_options_partitioned_read():
    from delta_data_pipelines_spark.ingest.jdbc import build_jdbc_options

    opts = build_jdbc_options(
        url="jdbc:sqlserver://db:1433",
        table="(SELECT Id, ModifiedDate FROM Deposits) src",
        partition_column="Id",
        lower_bound=1,
        upper_bound=1_000_000,
        num_partitions=64,
    )
    assert opts["dbtable"].endswith(" src")
    assert opts["partitionColumn"] == "Id"
    assert (opts["lowerBound"], opts["upperBound"], opts["numPartitions"]) == (
        "1",
        "1000000",
        "64",
    )


def test_jdbc_options_validation():
    import pytest as _pytest

    from delta_data_pipelines_spark.ingest.jdbc import build_jdbc_options

    with _pytest.raises(ValueError):
        build_jdbc_options(url="jdbc:x")  # neither table nor query
    with _pytest.raises(ValueError):
        build_jdbc_options(url="jdbc:x", table="t", query="SELECT 1")
    with _pytest.raises(ValueError):
        build_jdbc_options(url="jdbc:x", query="SELECT 1", partition_column="Id")
    with _pytest.raises(ValueError):
        build_jdbc_options(url="jdbc:x", table="t", partition_column="Id")


# ---------------------------------------------------------------------------
# W2 — source-order (sort pushed to API) verified contract
# ---------------------------------------------------------------------------


def test_ensure_source_order_passes_ordered_pages(spark):
    from delta_data_pipelines_spark.ingest.paginate import ensure_source_order

    pages = [
        spark.createDataFrame([(9,), (8,)], "ts int"),
        spark.createDataFrame([(7,), (5,)], "ts int"),
        spark.createDataFrame([(5,), (4,)], "ts int"),  # ties at the edge OK
    ]
    out = list(ensure_source_order(iter(pages), "ts", descending=True))
    assert len(out) == 3


def test_ensure_source_order_raises_on_violation(spark):
    import pytest as _pytest

    from delta_data_pipelines_spark.ingest.paginate import ensure_source_order

    pages = [
        spark.createDataFrame([(9,), (8,)], "ts int"),
        spark.createDataFrame([(10,), (7,)], "ts int"),  # 10 is newer than 8
    ]
    with _pytest.raises(ValueError, match="source order violated"):
        list(ensure_source_order(iter(pages), "ts", descending=True))


def test_ensure_source_order_evaluates_each_page_once(spark):
    """W2 at scale: the order probe must not double-compute pages.
    The page is persisted, the min/max probe materializes the cache,
    and the consumer reads the SAME materialized rows — an accumulator
    in the page's lineage must tick exactly once per row."""
    from delta_data_pipelines_spark.ingest.paginate import ensure_source_order

    sc = spark.sparkContext
    acc = sc.accumulator(0)

    def page_of(rows):
        def tick(r):
            acc.add(1)
            return r

        return spark.createDataFrame(
            sc.parallelize(rows, 2).map(tick), "ts int, url string"
        )

    pages = [
        page_of([(9, "a"), (8, "b")]),
        page_of([(7, "c"), (6, "d")]),
    ]
    for page in ensure_source_order(iter(pages), "ts", descending=True):
        page.collect()  # consumer publishes the page
    assert acc.value == 4  # probe + publish share one evaluation per row


def test_ensure_source_order_ascending(spark):
    import pytest as _pytest

    from delta_data_pipelines_spark.ingest.paginate import ensure_source_order

    ok = [
        spark.createDataFrame([(1,), (2,)], "ts int"),
        spark.createDataFrame([(2,), (3,)], "ts int"),
    ]
    assert len(list(ensure_source_order(iter(ok), "ts", descending=False))) == 2
    bad = [
        spark.createDataFrame([(5,)], "ts int"),
        spark.createDataFrame([(4,)], "ts int"),
    ]
    with _pytest.raises(ValueError):
        list(ensure_source_order(iter(bad), "ts", descending=False))


def test_run_crawl_evaluates_each_page_source_once(spark, tmp_path):
    """run_crawl fans one page into five consumers; the page must be
    persisted so the SOURCE lineage executes exactly once per page."""
    from delta_data_pipelines_spark.ingest.paginate import run_crawl
    from delta_data_pipelines_spark.storage import VersionedTable

    sc = spark.sparkContext
    acc = sc.accumulator(0)

    def page_of(rows):
        def tick(r):
            acc.add(1)
            return r

        return spark.createDataFrame(
            sc.parallelize(rows, 2).map(tick), "content_url string, site string"
        )

    pages = [
        page_of([(f"https://x/{i}", "divar") for i in range(4)]),
        page_of([(f"https://x/{i + 4}", "divar") for i in range(4)]),
    ]
    seen = VersionedTable(spark, str(tmp_path / "seen"))
    queue = VersionedTable(spark, str(tmp_path / "queue"))
    res = run_crawl(iter(pages), "divar", seen, queue)
    assert res["pages"] == 2 and res["new"] == 8
    assert acc.value == 8  # every row computed exactly once


def test_jsonl_roundtrip_corrupt_handling_and_shards(spark, tmp_path):
    """JSONL corpus IO: explicit-schema read, errors-as-data for
    malformed lines (clean rows publish, damage is accounted), gzip
    shard-count control, and a lossless documents round-trip."""
    import os

    from delta_data_pipelines_spark.ingest.jsonl import (
        read_jsonl,
        split_corrupt,
        write_jsonl,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "shard-000.jsonl"), "w") as f:
        f.write('{"doc_id": 1, "text": "hello world"}\n')
        f.write('{"doc_id": 2, "text": "ok"}\n')
        f.write('{"doc_id": 3, "text": TRUNCATED-MID-RECORD\n')
    df = read_jsonl(spark, src, "doc_id long, text string")
    clean, bad = split_corrupt(df)
    assert {(r["doc_id"], r["text"]) for r in clean.collect()} == {
        (1, "hello world"), (2, "ok"),
    }
    assert clean.columns == ["doc_id", "text"]  # bookkeeping col dropped
    quarantined = [r["raw"] for r in bad.collect()]
    assert len(quarantined) == 1 and "TRUNCATED" in quarantined[0]

    # declared schema may not claim the corrupt column for itself
    import pytest as _pytest

    with _pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, src, "doc_id long, _corrupt_record string")

    # round-trip with gzip shards: shard count controls read parallelism
    out = str(tmp_path / "out")
    write_jsonl(clean, out, compression="gzip", shards=3)
    parts = [p for p in os.listdir(out) if p.startswith("part-")]
    # shards is an UPPER bound: the writer skips EMPTY partitions
    # (explicit-count repartition is AQE-coalescing-exempt)
    assert 1 <= len(parts) <= 3 and all(p.endswith(".json.gz") for p in parts)
    back = read_jsonl(spark, out, "doc_id long, text string")
    rt_clean, rt_bad = split_corrupt(back)
    assert {(r["doc_id"], r["text"]) for r in rt_clean.collect()} == {
        (1, "hello world"), (2, "ok"),
    }
    assert rt_bad.count() == 0


# ---------------------------------------------------------------------------
# Main-content extraction (ingest/maincontent.py)
# ---------------------------------------------------------------------------


def test_blocks_kernel_segments_links_and_damage():
    from delta_data_pipelines_spark.ingest.maincontent import blocks_kernel

    html = (
        '<html><body><nav><a href="/">home</a> <a href="/x">shop</a></nav>'
        "<p>plain <b>bold</b> and <a href='#'>linked</a> words</p>"
        "<script>var x = '<p>not text</p>';</script>"
        "<div>standalone</div></body></html>"
    )
    blocks = blocks_kernel(html)
    assert [(b["tag"], b["text"]) for b in blocks] == [
        ("nav", "home shop"),
        ("p", "plain bold and linked words"),
        ("div", "standalone"),
    ]
    nav, p, div = blocks
    assert nav["link_chars"] == nav["chars"] == len("home") + len("shop")
    assert p["link_chars"] == len("linked")
    assert p["chars"] == sum(len(w) for w in ["plain", "bold", "and", "linked", "words"])
    assert div["link_chars"] == 0

    # NULL in -> None out; truncated markup -> whatever was collected
    assert blocks_kernel(None) is None
    cut = blocks_kernel("<p>kept</p><p>trunc")
    assert [b["text"] for b in cut] == ["kept", "trunc"]


def test_main_content_rules(spark):
    from pyspark.sql import functions as F

    from delta_data_pipelines_spark.ingest.maincontent import main_content

    body = "alpha beta gamma delta epsilon zeta"  # 6 words: content
    nav = '<nav><a href="/">one</a> <a href="/2">two</a></nav>'  # link-only
    pages = [
        # two docs on srcA share the nav AND a footer template; each
        # carries its own content paragraph + a short headline that the
        # neighbor rescue keeps
        (1, "srcA", f"<html><body>{nav}<h1>big news</h1><p>{body}</p>"
                    "<footer>site footer template</footer></body></html>"),
        (2, "srcA", f"<html><body>{nav}<p>{body} extra words here</p>"
                    "<footer>site footer template</footer></body></html>"),
        # single-doc source: its footer repeats nowhere, is 4 words
        # (< min) with no content neighbor on one side test: footer's
        # prev block IS content -> rescued (documents the rescue
        # semantics: per-site templates need the SITE rule, length
        # alone cannot drop them)
        (3, "srcB", f"<html><body><p>{body}</p>"
                    "<footer>tiny footer here</footer></body></html>"),
        (4, "srcB", None),                      # NULL page
        (5, "srcB", "<html><body></body></html>"),  # no blocks
    ]
    df = spark.createDataFrame(pages, "doc_id long, source string, html string")
    out = {
        r["doc_id"]: r
        for r in main_content(df, "doc_id", "html", source_col="source").collect()
    }
    # doc 1: nav dropped (link density + site rule), h1 'big news'
    # rescued next to content, footer dropped by SITE rule
    assert out[1]["main_text"] == "big news\n" + body
    assert out[1]["n_blocks"] == 4 and out[1]["n_kept"] == 2
    # doc 2: nav + footer dropped, content kept
    assert out[2]["main_text"] == body + " extra words here"
    # doc 3: unique short footer RESCUED by its content neighbor —
    # exactly why the corpus-level site rule exists
    assert out[3]["main_text"] == body + "\ntiny footer here"
    # NULL page and blockless page: NULL text, zero blocks
    assert out[4]["n_blocks"] == 0 and out[4]["main_text"] is None
    assert out[5]["n_blocks"] == 0 and out[5]["main_text"] is None

    # without a source column the site rule is off: the shared footer
    # survives on srcA docs (5 words? 'site footer template' = 3 words
    # -> still dropped by length unless rescued by neighbor... it IS
    # adjacent to content, so it is rescued)
    out_ns = {
        r["doc_id"]: r
        for r in main_content(df, "doc_id", "html").collect()
    }
    assert out_ns[1]["main_text"].endswith("site footer template")


def test_blocks_kernel_normalizes_internal_whitespace():
    """Real HTML wraps paragraphs across source lines: a text node
    with internal newlines/tabs/double-spaces must come out as
    single-space-separated words, so the native length rule counts
    10 words, not 1."""
    from delta_data_pipelines_spark.ingest.maincontent import blocks_kernel

    html = (
        "<html><body><p>one\ntwo\nthree\nfour\nfive\n"
        "six  seven\teight nine ten</p></body></html>"
    )
    (blk,) = blocks_kernel(html)
    assert blk["text"] == "one two three four five six seven eight nine ten"
    assert len(blk["text"].split(" ")) == 10
    assert blk["chars"] == len(blk["text"])
