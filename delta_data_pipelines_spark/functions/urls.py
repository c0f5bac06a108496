"""URL canonicalization + refetch dedup — the URL-level half of a
Common-Crawl-style corpus pipeline (text-level dedup lives in
operators/dedup.py; this removes the trivial duplicate class FIRST:
the same page fetched many times under cosmetically different URLs).

``canonical_url`` is pure native string surgery (regexp_extract /
array ops — no UDF, no java.net.URI), deliberately NOT parse_url:
regex semantics are reproducible verbatim in any engine, so the
canonical form is oracle-checkable and survives an engine migration,
while java.net.URI's edge-case behavior is JVM-private. Rules (the
common-crawl-practical subset):

- scheme and host lowercase; default ports stripped (:80 for http,
  :443 for https);
- fragment dropped;
- tracking query params dropped (utm_*, fbclid, gclid, msclkid,
  ref, ref_src);
- surviving query params sorted (stable canonical order — two fetch
  URLs differing only in param order collapse);
- empty query/``?`` dropped; path's trailing slashes stripped, empty
  path becomes ``/``.

Non-URL strings (no ``scheme://`` prefix) and NULLs canonicalize to
NULL — the caller decides whether such rows pass through or drop
(``dedup_refetches`` passes them through, the curation invariant).

Reference analogue: the reference dedups listings by content_url
string equality (utils/utils_of_insert_into_db.py's unique-key
upsert); canonicalization is the published-web upgrade of that key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonical_url",
    "dedup_refetches",
    "host_suffixes",
    "filter_blocked_hosts",
]

_TRACKING_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)(=.*)?$"


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules, NULL when the
    value does not look like ``scheme://…``."""
    proto = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1))
    # lowercase ONLY the host[:port] part of the authority: userinfo is
    # case-sensitive per RFC 3986 (the greedy '^(.*@)' splits at the
    # LAST '@', so userinfo containing '@' stays intact)
    auth_raw = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", 1)
    auth = F.concat(
        F.regexp_extract(auth_raw, r"^(.*@)", 1),
        F.lower(F.regexp_extract(auth_raw, r"([^@]*)$", 1)),
    )
    auth = (
        F.when(
            (proto == "http") & auth.endswith(":80"),
            F.substring(auth, 1, F.length(auth) - 3),
        )
        .when(
            (proto == "https") & auth.endswith(":443"),
            F.substring(auth, 1, F.length(auth) - 4),
        )
        .otherwise(auth)
    )
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # query = text between the FIRST '?' before any '#' and the '#':
    # a bare r'\?([^#]*)' would match a '?' inside the fragment and
    # leak fragment content into the canonical form
    query = F.regexp_extract(url, r"^[^#]*?\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        proto == "", F.lit(None).cast("string")
    ).otherwise(F.concat(proto, F.lit("://"), auth, path, qpart))


def dedup_refetches(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetched_at",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ONE row per canonical URL — the latest fetch (greatest
    ``ts_col``, ``id_col`` tie-break) — before any text-level stage
    touches the corpus. Rows whose URL does not canonicalize (NULL /
    non-URL string) pass through untouched, the curation-stage
    invariant.

    Scale shape: one ``max_by(struct(all columns), struct(ts, id))``
    partial-agg groupBy on the canonical key — a single shuffle, no
    window, no one-task-per-URL; combiner-side reduction wins on the
    refetch-heavy keys that make this stage worthwhile."""
    canon = canonical_url(F.col(url_col))
    keyed = docs.withColumn("_curl", canon)
    passthrough = keyed.where(F.col("_curl").isNull()).drop("_curl")
    winners = (
        keyed.where(F.col("_curl").isNotNull())
        .groupBy("_curl")
        .agg(
            F.max_by(
                F.struct(*docs.columns),
                F.struct(F.col(ts_col), F.col(id_col)),
            ).alias("_row")
        )
        .select("_row.*")
    )
    return winners.unionByName(passthrough)


def host_suffixes(host: Column) -> Column:
    """The registrable-suffix chain of a hostname at LABEL boundaries:
    ``ads.shop1.com`` → ``['ads.shop1.com', 'shop1.com', 'com']``.
    This is the matching domain a blocklist entry can name — exact
    host or any parent domain — and label boundaries are the point:
    ``shop13.com`` must NOT match a ``shop3.com`` entry, which a
    naive ``endswith``/LIKE scan gets wrong. NULL host → NULL chain."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    )


def filter_blocked_hosts(
    df: DataFrame,
    url_col: str,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "domain",
    broadcast_blocklist: bool = True,
) -> DataFrame:
    """Drop rows whose URL's host falls under any blocked domain —
    the UT1-blocklist stage every published web-corpus pipeline runs
    between URL dedup and text extraction (RefinedWeb §3.1, FineWeb):
    an entry blocks the exact host and every subdomain, at label
    boundaries.

    Scale shape: explode each row's ≤ label-count suffix chain
    (bounded, ~4 per host), ONE semi-join of the suffixes against the
    blocklist — broadcast by default (UT1-sized lists are ~100 MB;
    pass ``broadcast_blocklist=False`` past that and AQE picks the
    strategy), then one anti-join back on ``id_col``. Never a LIKE
    scan, never a per-entry pass. Rows whose ``url_col`` has no
    parseable host (NULL, non-URLs) pass through — the curation
    NULL-row invariant (``try_parse_url``: the plain form THROWS on
    invalid URLs under ANSI mode, i.e. in any vanilla Spark 4
    session)."""
    host = F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    # strip edge whitespace INCLUDING \r (F.trim only removes spaces):
    # real UT1 list files ship with CRLF line endings, and an
    # untrimmed 'badsite.com\r' entry silently matches nothing
    # drop entries that trim to nothing: real list files end with a
    # blank line, and `spark.read.text` keeps it — an empty-string
    # "domain" would otherwise match the empty suffix a host with a
    # trailing dot / empty label produces, spuriously blocking it
    bl = blocklist.select(
        F.lower(
            F.regexp_replace(F.col(domain_col), r"^\s+|\s+$", "")
        ).alias("_sfx")
    ).where(F.col("_sfx") != "")
    if broadcast_blocklist:
        bl = F.broadcast(bl)
    hits = (
        df.select(F.col(id_col), F.explode(host_suffixes(host)).alias("_sfx"))
        .join(bl, "_sfx", "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(hits, id_col, "left_anti")
