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
