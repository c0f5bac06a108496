"""Arrow-batched HTML parsing (SURVEY §2.6 F35).

Reference: ``kilid_transformer.py:187-367`` parses detail-page HTML
with BeautifulSoup CSS selectors. The engine's default kilid path uses
native regex expressions (ingest/transformers/kilid.py) — faster, no
Python — but regexes only survive well-formed markup. This module is
the robust path: a real HTML tokenizer (stdlib ``html.parser``; bs4
drops in with one import swap) inside ``mapInPandas``, extracting
class→texts maps per document in Arrow batches.

Use when markup is adversarial (nested tags inside the target node,
attribute order changes, entities); costs one Python hop per batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame


class _ClassTextCollector(HTMLParser):
    """Collect concatenated text per 'class' token, entity-decoded."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.by_class: dict[str, list[str]] = {}
        self._stack: list[tuple[str, list[str]]] = []

    def handle_starttag(self, tag, attrs):
        classes = []
        for k, v in attrs:
            if k == "class" and v:
                classes = v.split()
        self._stack.append((tag, classes))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        text = data.strip()
        if not text:
            return
        seen = set()
        for _, classes in self._stack:
            for c in classes:
                if c not in seen:
                    seen.add(c)
                    self.by_class.setdefault(c, []).append(text)


def parse_class_texts(html: str) -> dict[str, list[str]]:
    p = _ClassTextCollector()
    try:
        p.feed(html or "")
    except Exception:
        return {}
    return p.by_class


def extract_class_texts(
    df: DataFrame, html_col: str, classes: list[str], id_col: str
) -> DataFrame:
    """(id, class, texts array) — one row per requested class per doc.

    Executor-side parse, Arrow batches in and out; at 100 TB the cost
    scales with bytes parsed per partition, no shuffle.
    """
    out_schema = f"{id_col} long, css_class string, texts array<string>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                by_class = parse_class_texts(pdf[html_col].iloc[i])
                for c in classes:
                    rows.append(
                        {
                            id_col: pdf[id_col].iloc[i],
                            "css_class": c,
                            "texts": by_class.get(c, []),
                        }
                    )
            yield pd.DataFrame(rows, columns=[id_col, "css_class", "texts"])

    return df.mapInPandas(run, schema=out_schema)


class _AllTextCollector(HTMLParser):
    """Visible-text extraction: every text node except inside
    script/style/noscript/template, whitespace-collapsed."""

    _SKIP = {"script", "style", "noscript", "template"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0:
            t = data.strip()
            if t:
                self.parts.append(t)


def html_to_text(html: str | None) -> str | None:
    """Visible text of an HTML document (single space between nodes),
    None in → None out, parse damage → whatever was collected before
    it (the tokenizer is non-throwing on truncated markup)."""
    if html is None:
        return None
    p = _AllTextCollector()
    try:
        p.feed(html)
        # close() flushes text the charref lookahead buffered at
        # end-of-input (trailing 'AT&T', truncated-mid-entity pages —
        # exactly the damaged captures this path exists for)
        p.close()
    except Exception:
        pass
    return " ".join(p.parts)


def extract_page_text(df: DataFrame, html_col: str) -> DataFrame:
    """Append a ``text`` column: visible text of ``html_col`` (the
    WARC→corpus extraction step; ingest/warc.warc_documents). Same
    Arrow-batched executor-side shape as extract_class_texts — cost
    scales with bytes parsed per partition, no shuffle."""
    import json as _json

    from pyspark.sql.types import StringType, StructType

    schema = StructType.fromJson(_json.loads(df.schema.json())).add(
        "text", StringType()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["text"] = [html_to_text(h) for h in pdf[html_col]]
            yield pdf

    return df.mapInPandas(run, schema=schema)
