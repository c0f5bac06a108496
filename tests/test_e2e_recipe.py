"""The published-recipe integration run (r11 verdict ask #6): one CLI
invocation chaining every stage of the FineWeb/CCNet-shaped curation
recipe — WARC shards → URL blocklist → DOM-block main content → C4
line cleaning → language-aware gate + per-language LM tail cut → DSIR
target selection → exact+near dedup → C4 sentence-span dedup →
ExactSubstr rewrite → md5 split → 13-gram decontamination → stored-
tokenizer packing — over the sf0.1 corpus (5,000 documents re-wrapped
as crawl HTML), asserting the stage-by-stage funnel and reading the
corpus datasheet off the published table.

Every stage here is individually oracle- or pytest-green; this file
proves they COMPOSE under one run — column contracts, NULL
invariants, split publishing — which no other test exercised as a
single artifact. Wall time for the full chain is recorded in README
("e2e recipe" under Bench calibration continuity).

Reference pipeline shape: hossein-khalilian/delta-data-pipelines runs
its scrape→transform→dedup→publish DAG as chained jobs; this is the
training-data analogue at corpus scale.
"""

from __future__ import annotations

import gzip
import json
import os
import time

import duckdb
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"


def _record(rid: str, payload: bytes, uri: str) -> bytes:
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
        b"WARC-Target-URI: " + uri.encode(),
        b"WARC-Date: 2026-08-01T00:00:00Z",
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes) -> bytes:
    return b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body


def _page(source: str, text: str) -> bytes:
    # per-source boilerplate identical across the source's pages: the
    # main-content template rule keys on (source, block hash) and
    # drops blocks repeated across a host's captures. The content
    # lands as one <p> per 7-word sentence with derived terminal
    # punctuation (the fixture corpus has none — the
    # td_dedup_sentence_spans device), giving the C4 line rules and
    # the sentence-span stage real units to work on: each kept block
    # is one line of extracted main text.
    nav = (
        f"<div><a href='/h'>{source} home</a> <a href='/a'>about</a> "
        f"<a href='/c'>contact archive sitemap</a></div>"
    )
    footer = (
        f"<div>copyright {source} all rights reserved "
        f"<a href='/t'>terms</a> <a href='/p'>privacy</a></div>"
    )
    words = [w for w in text.split(" ") if w]
    paras = "".join(
        "<p>" + " ".join(words[i : i + 7]) + ".</p>"
        for i in range(0, len(words), 7)
    )
    return (
        f"<html><head><title>{source}</title></head>"
        f"<body>{nav}{paras}{footer}</body></html>"
    ).encode()


@pytest.fixture(scope="module")
def crawl(tmp_path_factory):
    """sf0.1 documents re-wrapped as 16 member-gzip WARC shards, with
    1-in-25 pages on a blocklisted ad domain."""
    root = tmp_path_factory.mktemp("crawl")
    rows = duckdb.sql(
        "select doc_id, text, source from "
        f"read_parquet('{SF_DIR}/documents.parquet') order by doc_id"
    ).fetchall()
    n_shards = 16
    shards = [[] for _ in range(n_shards)]
    n_blocked = 0
    for doc_id, text, source in rows:
        if doc_id % 25 == 0:
            host, n_blocked = "ads.example.net", n_blocked + 1
        else:
            host = f"{source}.example.org"
        rec = _record(
            f"d{doc_id:05d}",
            _http(_page(source, text or "")),
            f"http://{host}/page/{doc_id}",
        )
        shards[doc_id % n_shards].append(rec)
    for i, recs in enumerate(shards):
        with open(root / f"crawl-{i:05d}.warc.gz", "wb") as f:
            for r in recs:
                f.write(gzip.compress(r))
    blocklist = root / "blocklist.txt"
    blocklist.write_text("ads.example.net\n")
    return {
        "glob": str(root / "*.warc.gz"),
        "blocklist": str(blocklist),
        "n_docs": len(rows),
        "n_blocked": n_blocked,
    }


def _job_line(capsys) -> dict:
    return json.loads(
        [
            line
            for line in capsys.readouterr().out.strip().splitlines()
            if line.startswith("{")
        ][-1]
    )


def test_published_recipe_end_to_end(spark, crawl, tmp_path, capsys):
    from delta_data_pipelines_spark.__main__ import main

    # stage 0: a stored tokenizer fit on the same sf (the pinned
    # artifact the packing stage sizes windows with)
    store = str(tmp_path / "tok")
    assert (
        main(
            [
                "train-tokenizer",
                "--store",
                store,
                "--sf-dir",
                SF_DIR,
                "--family",
                "unigram",
                "--min-count",
                "50",
            ]
        )
        == 0
    )
    _job_line(capsys)  # drain the train line

    out = str(tmp_path / "published")
    t0 = time.perf_counter()
    rc = main(
        [
            "curate-corpus",
            "--warc-in",
            crawl["glob"],
            "--blocklist",
            crawl["blocklist"],
            "--main-content",
            "--c4",
            "--lang-aware",
            "--lm-drop",
            "0.1",
            "--dsir-select",
            "2500",
            "--sentence-spans",
            "3",
            "--exact-substr",
            "25",
            "--decontaminate",
            "--tokenizer",
            store,
            "--pack-ctx",
            "256",
            "--no-scrub",
            "--funnel",
            "--out",
            out,
        ]
    )
    wall = time.perf_counter() - t0
    assert rc == 0
    res = _job_line(capsys)
    assert res["job"] == "curate-corpus"
    assert res["quarantined_shards"] == 0

    # ---- the funnel: every stage present, in recipe order, and
    # monotone non-increasing (each stage only removes documents)
    funnel = res["funnel"]
    assert list(funnel) == [
        "input",
        "blocklist",
        "c4_clean",
        "quality_gate",
        "lm_cut",
        "dsir_select",
        "dedup",
        "sentence_spans",
        "exact_substr",
        "decontaminate",
    ]
    counts = list(funnel.values())
    assert counts == sorted(counts, reverse=True), funnel

    # pinned stage-by-stage doc counts (deterministic end to end:
    # md5 split, ES sampling, keep-first dedup ties on doc_id) — a
    # drift here means a stage's semantics changed, not noise
    assert funnel["input"] == crawl["n_docs"] == 5000
    assert funnel["blocklist"] == 5000 - crawl["n_blocked"] == 4800
    # C4 drops docs keeping <3 lines (short docs: <~19 usable words)
    assert funnel["c4_clean"] == 4335
    assert funnel["quality_gate"] == 2992
    assert funnel["lm_cut"] == 2708
    assert funnel["dsir_select"] == 2500
    assert funnel["dedup"] == 2429
    # the rewrite stages (sentence spans / ExactSubstr) and the
    # decontamination drop no WHOLE docs on this corpus — random-word
    # synthetic text shares no 21-word span or 13-gram across docs —
    # so their funnel rows pin doc-count PRESERVATION here; their
    # content-level effects are pinned by their own unit/oracle tests
    assert (
        funnel["sentence_spans"]
        == funnel["exact_substr"]
        == funnel["decontaminate"]
        == res["rows_out"]
        == 2429
    )

    # ---- published table: split + packing columns, no empty split
    from delta_data_pipelines_spark.storage import VersionedTable

    t = VersionedTable(spark, out).read()
    assert {
        "doc_id",
        "text",
        "source",
        "split",
        "start_offset",
        "chunk_start",
        "chunk_end",
    } <= set(t.columns)
    assert set(res["splits"]) == {"train", "eval", "test"}
    assert all(n > 0 for n in res["splits"].values())
    # blocklisted pages never reach the published corpus
    assert t.where(F.col("source") == "ads.example.net").count() == 0
    # main-content extraction ran: no published text retains the
    # per-source nav boilerplate
    assert t.where(F.col("text").contains("sitemap")).count() == 0

    # ---- the datasheet off the published table (one CLI line)
    assert main(["corpus-report", "--table", out]) == 0
    report = _job_line(capsys)
    assert report["job"] == "corpus-report"
    assert report["n_docs"] == res["rows_out"]
    assert report["n_tokens"] > 0

    print(f"E2E-RECIPE wall={wall:.1f}s funnel={json.dumps(funnel)}")


def test_published_recipe_kn3_funnel(spark, crawl, tmp_path, capsys):
    """Second pinned funnel (r13 verdict ask #9): the SAME recipe
    chain under the GLOBAL quality gate with the trigram-KN LM cut
    (``--lm kn3``) — proving the Kneser-Ney gate composes with every
    stage under one CLI call exactly the way the per-language unigram
    gate does in the main funnel. Only the gate/LM rows may differ:
    the global gate replaces per-language thresholds and the cut
    scores under the self-fit interpolated KN3 (the held-out-
    calibrated FROZEN KN gate is e2e-exercised by the incremental
    convergence tests in test_streaming.py; the batch pipeline is
    self-fit by design). Counts pinned — a drift means stage
    semantics changed, not noise. The packing stage adds no funnel
    row, so the tokenizer stage is omitted here (the main funnel
    pins it)."""
    from delta_data_pipelines_spark.__main__ import main

    out = str(tmp_path / "published_kn3")
    t0 = time.perf_counter()
    rc = main(
        [
            "curate-corpus",
            "--warc-in",
            crawl["glob"],
            "--blocklist",
            crawl["blocklist"],
            "--main-content",
            "--c4",
            "--lm-drop",
            "0.1",
            "--lm",
            "kn3",
            "--dsir-select",
            "2500",
            "--sentence-spans",
            "3",
            "--exact-substr",
            "25",
            "--decontaminate",
            "--no-scrub",
            "--funnel",
            "--out",
            out,
        ]
    )
    wall = time.perf_counter() - t0
    assert rc == 0
    res = _job_line(capsys)
    funnel = res["funnel"]
    assert list(funnel) == [
        "input",
        "blocklist",
        "c4_clean",
        "quality_gate",
        "lm_cut",
        "dsir_select",
        "dedup",
        "sentence_spans",
        "exact_substr",
        "decontaminate",
    ]
    counts = list(funnel.values())
    assert counts == sorted(counts, reverse=True), funnel
    # pre-gate stages identical to the main funnel (same fixture)
    assert funnel["input"] == 5000
    assert funnel["blocklist"] == 4800
    assert funnel["c4_clean"] == 4335
    # global Gopher gate (vs 2992 under the per-language thresholds)
    assert funnel["quality_gate"] == 2924
    # self-fit trigram-KN cut at drop_fraction 0.1 over the gated set
    assert funnel["lm_cut"] == 2631
    assert funnel["dsir_select"] == 2500
    assert funnel["dedup"] == 2380
    # rewrite stages drop no whole docs on this corpus (the main
    # funnel's reasoning: random-word text shares no 21-word span or
    # 13-gram across docs)
    assert (
        funnel["sentence_spans"]
        == funnel["exact_substr"]
        == funnel["decontaminate"]
        == res["rows_out"]
        == 2380
    )
    print(f"E2E-KN3 wall={wall:.1f}s funnel={json.dumps(funnel)}")
