"""WARC source: synthetic shards (per-record gzip members, like
Common Crawl), record parse, HTTP split, error-as-data, and the
documents-shaped extraction."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from delta_data_pipelines_spark.ingest import warc


def _record(
    rtype: str,
    rid: str,
    payload: bytes,
    uri: str | None = None,
    ctype: str = "application/http; msgtype=response",
) -> bytes:
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
        b"WARC-Date: 2026-08-01T00:00:00Z",
        b"Content-Type: " + ctype.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if uri:
        headers.insert(3, b"WARC-Target-URI: " + uri.encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(status: int, body: bytes, ctype: bytes = b"text/html") -> bytes:
    return (
        b"HTTP/1.1 " + str(status).encode() + b" X\r\n"
        b"Content-Type: " + ctype + b"\r\n\r\n" + body
    )


_HTML = (
    b"<html><head><title>T</title><style>p{}</style></head>"
    b"<body><script>var x=1;</script><p>hello <b>warc</b></p>"
    b"<p>world</p></body></html>"
)


def _write_shard(path: str, records: list[bytes], member_gzip: bool = True):
    with open(path, "wb") as f:
        if member_gzip:
            for r in records:
                f.write(gzip.compress(r))
        else:
            for r in records:
                f.write(r)


@pytest.fixture()
def shard(tmp_path):
    recs = [
        _record("warcinfo", "info-1", b"software: test\r\n", ctype="application/warc-fields"),
        _record("request", "req-1", _http(0, b"")[:0] + b"GET / HTTP/1.1\r\nHost: a.example\r\n\r\n", uri="http://a.example/", ctype="application/http; msgtype=request"),
        _record("response", "resp-1", _http(200, _HTML), uri="http://a.example/page"),
        _record("response", "resp-2", _http(404, b"<html>gone</html>"), uri="http://a.example/missing"),
        _record("response", "resp-3", _http(200, b"<html><body>second doc</body></html>"), uri="http://b.example/x"),
    ]
    p = os.path.join(tmp_path, "shard-00000.warc.gz")
    _write_shard(p, recs)
    return p


def test_read_warc_records(spark, shard):
    df = warc.read_warc(spark, shard)
    rows = {r["record_id"]: r for r in df.collect()}
    assert len(rows) == 5
    r1 = rows["<urn:uuid:resp-1>"]
    assert r1["warc_type"] == "response"
    assert r1["http_status"] == 200
    assert r1["target_uri"] == "http://a.example/page"
    assert bytes(r1["payload"]) == _HTML
    assert r1["error"] is None
    assert rows["<urn:uuid:resp-2>"]["http_status"] == 404
    # warcinfo payload is NOT http: kept raw, no status
    info = rows["<urn:uuid:info-1>"]
    assert info["http_status"] is None
    assert bytes(info["payload"]) == b"software: test\r\n"


def test_read_warc_plain_uncompressed(spark, tmp_path):
    recs = [_record("response", "r1", _http(200, b"<p>plain</p>"), uri="http://c.example/")]
    p = os.path.join(tmp_path, "plain.warc")
    _write_shard(p, recs, member_gzip=False)
    rows = warc.read_warc(spark, p).collect()
    assert len(rows) == 1 and rows[0]["http_status"] == 200


def test_read_warc_truncated_is_error_row(spark, tmp_path):
    good = _record("response", "ok-1", _http(200, b"<p>ok</p>"), uri="http://d.example/")
    bad = _record("response", "bad-1", _http(200, b"full payload"), uri="http://d.example/b")
    p = os.path.join(tmp_path, "damaged.warc.gz")
    with open(p, "wb") as f:
        f.write(gzip.compress(good))
        f.write(gzip.compress(bad)[: len(gzip.compress(bad)) // 2])
    rows = warc.read_warc(spark, p).collect()
    by_type = {r["warc_type"] for r in rows}
    assert "_error" in by_type
    ok = [r for r in rows if r["record_id"] == "<urn:uuid:ok-1>"]
    assert len(ok) == 1 and ok[0]["http_status"] == 200
    err = [r for r in rows if r["warc_type"] == "_error"]
    assert len(err) == 1 and err[0]["error"]


def test_warc_documents_extraction(spark, shard):
    docs = warc.warc_documents(spark, shard).orderBy("doc_id").collect()
    # only the two 2xx responses
    assert len(docs) == 2
    d1 = [d for d in docs if d["doc_id"] == "<urn:uuid:resp-1>"][0]
    assert d1["source"] == "a.example"
    assert d1["url"] == "http://a.example/page"
    # script/style stripped, visible text kept in order
    assert d1["text"] == "T hello warc world"
    d3 = [d for d in docs if d["doc_id"] == "<urn:uuid:resp-3>"][0]
    assert d3["source"] == "b.example"
    assert d3["text"] == "second doc"


def test_warc_glob_and_parallelism(spark, tmp_path):
    for i in range(3):
        _write_shard(
            os.path.join(tmp_path, f"part-{i}.warc.gz"),
            [_record("response", f"g{i}", _http(200, b"<p>x</p>"), uri=f"http://g{i}.example/")],
        )
    df = warc.read_warc(spark, os.path.join(tmp_path, "*.warc.gz"), parallelism=3)
    assert df.count() == 3
    assert df.rdd.getNumPartitions() == 3


def test_curate_cli_reads_warc(spark, tmp_path, capsys):
    """curate-corpus --warc-in: WARC shards feed the curation job
    end-to-end (2xx HTML -> docs -> gate -> dedup -> split publish),
    damaged shards surface as quarantined_shards in the job line."""
    import json as _json
    import random

    from delta_data_pipelines_spark.__main__ import main

    rnd = random.Random(7)
    words = [f"w{i}" for i in range(200)]
    recs = []
    for i in range(8):
        body = " ".join(rnd.choice(words) for _ in range(60))
        html = f"<html><body><p>{body}</p></body></html>".encode()
        recs.append(
            _record(
                "response",
                f"doc-{i}",
                _http(200, html),
                uri=f"http://h{i % 2}.example/p{i}",
            )
        )
    shard = os.path.join(tmp_path, "crawl.warc.gz")
    _write_shard(shard, recs)
    # plus one damaged shard
    with open(os.path.join(tmp_path, "bad.warc.gz"), "wb") as f:
        f.write(gzip.compress(recs[0])[:40])

    out = os.path.join(tmp_path, "curated")
    rc = main([
        "curate-corpus",
        "--warc-in", os.path.join(tmp_path, "*.warc.gz"),
        "--out", out,
        "--no-scrub",
    ])
    assert rc == 0
    line = [
        l for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ][-1]
    res = _json.loads(line)
    assert res["job"] == "curate-corpus"
    assert res["rows_in"] == 8
    assert res["rows_out"] >= 1
    assert res["quarantined_shards"] == 1

    from delta_data_pipelines_spark.storage import VersionedTable

    t = VersionedTable(spark, out).read()
    assert {"doc_id", "text", "source", "split"} <= set(t.columns)
    assert t.where(F.col("source").isin("h0.example", "h1.example")).count() == t.count()


def test_warc_documents_lang_id(spark, tmp_path):
    recs = [
        _record("response", "en-1",
                _http(200, b"<p>the cat and the dog of a house to go</p>"),
                uri="http://e.example/en"),
        _record("response", "und-1", _http(200, b"<p>zzz qqq</p>"),
                uri="http://e.example/u"),
    ]
    p = os.path.join(tmp_path, "lang.warc.gz")
    _write_shard(p, recs)
    got = {r["doc_id"]: r["lang"] for r in warc.warc_documents(spark, p).collect()}
    assert got["<urn:uuid:en-1>"] == "en"
    assert got["<urn:uuid:und-1>"] == "und"


def test_warc_documents_main_content(spark, tmp_path):
    """main_content=True: the DOM-block boilerplate removal runs at
    WARC ingest — nav chrome and the host's repeated footer template
    drop out of text, article bodies survive (whole-page extraction
    would keep all of it)."""
    nav = b'<nav><a href="/">home</a> <a href="/s">shop</a> <a href="/a">about</a></nav>'
    foot = b"<footer>example site all rights reserved forever</footer>"
    body1 = b"<p>the first article body has plenty of words to keep</p>"
    body2 = b"<p>a second article body also has enough words here</p>"
    recs = [
        _record("response", "m1", _http(200, b"<html><body>" + nav + body1 + foot + b"</body></html>"), uri="http://e.example/a"),
        _record("response", "m2", _http(200, b"<html><body>" + nav + body2 + foot + b"</body></html>"), uri="http://e.example/b"),
    ]
    p = os.path.join(tmp_path, "mc.warc.gz")
    _write_shard(p, recs)

    docs = {
        r["doc_id"]: r["text"]
        for r in warc.warc_documents(spark, p, main_content=True).collect()
    }
    assert docs["<urn:uuid:m1>"] == "the first article body has plenty of words to keep"
    assert docs["<urn:uuid:m2>"] == "a second article body also has enough words here"

    # whole-page extraction keeps the chrome — the delta IS the stage
    full = {
        r["doc_id"]: r["text"]
        for r in warc.warc_documents(spark, p).collect()
    }
    assert "home shop about" in full["<urn:uuid:m1>"]
    assert "rights reserved" in full["<urn:uuid:m1>"]


def test_wet_documents(spark, tmp_path):
    """WET (Common Crawl extracted-text) shards: conversion records
    become document rows verbatim — no HTML hop — warcinfo headers are
    skipped, a malformed target URI yields a NULL source instead of an
    ANSI parse error, and damaged members quarantine as usual."""
    recs = [
        _record("warcinfo", "winfo", b"software: test\r\n",
                ctype="application/warc-fields"),
        _record("conversion", "wet-1",
                b"the quick brown fox of the corpus",
                uri="http://a.example/page", ctype="text/plain"),
        _record("conversion", "wet-2", b"zweite seite text",
                uri="not a uri", ctype="text/plain"),
    ]
    p = os.path.join(tmp_path, "shard.warc.wet.gz")
    _write_shard(p, recs)
    out = {r["doc_id"]: r for r in warc.wet_documents(spark, p).collect()}
    assert set(out) == {"<urn:uuid:wet-1>", "<urn:uuid:wet-2>"}
    d1 = out["<urn:uuid:wet-1>"]
    assert d1["text"] == "the quick brown fox of the corpus"
    assert d1["source"] == "a.example"
    assert d1["lang"] == "en"
    assert out["<urn:uuid:wet-2>"]["source"] is None  # malformed URI


def test_wet_curate_cli_end_to_end(spark, tmp_path, capsys):
    """curate-corpus --wet-in: the WET corpus flows through the full
    pipeline and publishes; quarantined count reported."""
    import json as _json

    from delta_data_pipelines_spark.__main__ import main

    stops = ["the", "of", "and", "to", "a", "in", "is", "it"]
    recs = [
        _record(
            "conversion", f"d-{i}",
            " ".join(f"{stops[j % 8]} w{i}x{j}" for j in range(16)).encode(),
            uri=f"http://s{i}.example/p", ctype="text/plain")
        for i in range(6)
    ]
    p = os.path.join(tmp_path, "c.warc.wet.gz")
    _write_shard(p, recs)
    out_dir = os.path.join(tmp_path, "curated")
    rc = main(["curate-corpus", "--wet-in", p, "--out", out_dir,
               "--no-scrub"])
    assert rc == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows_in"] == 6 and res["rows_out"] >= 1
    assert res["quarantined_shards"] == 0
