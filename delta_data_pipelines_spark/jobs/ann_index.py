"""ANN index lifecycle: build/refresh a PQ index into versioned
storage, serve top-k from the stored artifact.

This is the build-once / serve-many split the reference operates its
search index with (full rebuild DAG vs hourly incremental DAG —
``sql_search_full_rebuild_dag.py:173`` /
``sql_search_incremental_dag.py:205``), applied to the ANN path: the
k-means codebook fit is a scheduled BUILD job writing two versioned
tables, and the serving query is a flat scan that never re-fits —
at corpus scale the fit touches every vector (sampled in production)
while a serve touches only the 8-bit codes and a broadcast-sized
codebook, so fusing them (as the oracle-twin demo ``sim_pq_adc_topk``
does) pays the fit's ~30 exchanges on every query.

Storage layout, under one root:
    <root>/codes     — (id, sub_id, code), one row per (vector, subspace)
    <root>/codebook  — (sub_id, code, _cv), m·k rows
    plus a ``meta`` JSON file pinning (m, k, n_iter) so a serve can
    never silently slice queries with a different ``m`` than the fit.

Versioning comes from ``VersionedTable``: a refresh is one atomic
overwrite per table, serves read the latest committed version, and a
bad codebook rolls back with ``restore`` like any other table.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..operators import similarity
from ..storage import VersionedTable


class PQIndexStore:
    """The two versioned tables + fit-parameter meta under one root."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.codes = VersionedTable(spark, os.path.join(root, "codes"))
        self.codebook = VersionedTable(spark, os.path.join(root, "codebook"))
        self._meta_path = os.path.join(root, "meta.json")

    def exists(self) -> bool:
        return (
            self.codes.exists()
            and self.codebook.exists()
            and os.path.exists(self._meta_path)
        )

    def meta(self) -> dict[str, Any]:
        with open(self._meta_path) as f:
            return json.load(f)

    def _write_meta(self, meta: dict[str, Any]) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)


def refresh_pq_index(
    store: PQIndexStore,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 4,
    n_iter: int = 2,
) -> dict[str, Any]:
    """BUILD job: fit the PQ index and commit codes + codebook.

    The fit plan (``similarity.pq_index``) is evaluated exactly twice —
    once per table write; the codebook is m·k rows so its write is
    trivial, and the codes write is the only corpus-sized pass. Meta
    (m, k, n_iter) is written LAST, after both commits, so a serve
    racing a refresh either sees the complete new index or the
    complete old one (meta stale-reads pair with the old versions,
    which remain readable until vacuum)."""
    codes, cb = similarity.pq_index(vectors, id_col, vec_col, m, k, n_iter)
    # the codes plan embeds the full unrolled fit; stage it so the two
    # table writes don't each re-run every Lloyd round
    codes = codes.localCheckpoint(eager=True)
    c1 = store.codebook.overwrite(cb)
    c2 = store.codes.overwrite(codes)
    store._write_meta(
        {"id_col": id_col, "m": m, "k": k, "n_iter": n_iter}
    )
    return {
        "codes_version": c2.version,
        "codebook_version": c1.version,
        "m": m,
        "k": k,
        "n_iter": n_iter,
    }


def serve_pq_topk(
    store: PQIndexStore,
    queries: DataFrame,
    vec_col: str = "embedding",
    topk: int = 5,
) -> DataFrame:
    """SERVE: ADC top-k from the stored index — no fit stages in the
    plan. ``m`` and the id column come from the index meta (the fit
    that produced the codes), never from the caller, so a serve can't
    slice query vectors into a different subspace grid than the
    codebook was trained on."""
    if not store.exists():
        raise FileNotFoundError(
            f"no PQ index at {store.root}; run refresh_pq_index first"
        )
    meta = store.meta()
    return similarity.pq_adc_serve(
        store.codes.read(),
        store.codebook.read(),
        queries,
        id_col=meta["id_col"],
        vec_col=vec_col,
        m=int(meta["m"]),
        topk=topk,
    )
