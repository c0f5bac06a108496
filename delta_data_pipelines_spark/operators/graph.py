"""Graph analytics over edge tables — the link-structure signals a
web-corpus curation pipeline ranks domains with (Common Crawl ships a
host-level web graph and harmonic-centrality ranks beside every crawl;
C4/RefinedWeb-style cleans cut by domain reputation).

The reference has no graph surface (its crawl frontier is a per-site
page counter, ``utils_of_crawler.py:1``); this and
``dedup.near_dup_clusters`` (connected components) are the two
iterative-algorithm patterns on the north-star side.

Design for 100 TB graphs:
- edges stay a DataFrame; one iteration = one join + one partial-agg
  groupBy on the SAME key (``dst``), so AQE reuses the shuffle layout
  across rounds;
- contributions are summed as DECIMAL(38,18) — exact and associative,
  so the result is bit-identical under any partition order and an
  oracle can unroll the same rounds;
- iterations UNROLL into one plan by default (``n_iter`` small —
  PageRank needs few rounds at the damping factors anyone uses); for
  deep iteration pass ``checkpoint_every`` to cut lineage the same
  way near_dup_clusters does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .staging import stage


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    n_iter: int = 3,
    round_to: int = 9,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Weighted PageRank, deterministic and oracle-recomputable.

    Per round: r'(v) = (1-d)/N + d · Σ_{u→v} r(u) · w(u,v)/out(u),
    with the per-edge contribution computed in double left-to-right
    ((r · w) / out — both engines evaluate identically per row), the
    per-node sum carried as DECIMAL(38,18) (associative → partition-
    order independent), and each round's rank rounded to ``round_to``
    so no float drift accumulates across rounds. Ranks start uniform
    (round(1/N)).

    Dangling nodes (no out-edges) leak their mass — the simplified
    variant; redistributing it costs one extra 1-row aggregate per
    round and none of the intended uses (transition graphs, host
    graphs with self-loops) have dangling nodes. Documented rather
    than silently normalized.

    ``weight_col`` should be exact (integer counts or decimal):
    out-strength is summed as DECIMAL(38,6) so equal inputs give
    bit-equal transition probabilities everywhere.

    Output: (node, pagerank), one row per node appearing as source or
    destination of any edge.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    w = (
        F.col(weight_col) if weight_col is not None else F.lit(1)
    ).cast("decimal(28,6)")
    # the edge table (and everything derived from it) is consumed by
    # EVERY round — stage it once instead of re-deriving the upstream
    # plan (often a window or groupBy) n_iter+1 times
    e = edges.select(
        F.col(src_col).alias("_src"),
        F.col(dst_col).alias("_dst"),
        w.alias("_w"),
    ).transform(stage, "staged")
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .transform(stage, "staged")
    )
    # out-strength is LOOP-INVARIANT: attach it to the edge row once
    # (one extra eager job) instead of re-joining e ⋈ outw inside every
    # round — the old shape paid an edge-sized join per iteration for a
    # value that never changes (r14 optimization round, guide §2.4).
    # The division stays in the loop, split across the SAME cast chain
    # (_r · _w_double / _ow_double, left-to-right), so every round's
    # doubles are bit-identical to the old two-join form.
    outw = e.groupBy("_src").agg(F.sum("_w").alias("_ow"))
    ew = e.join(outw, "_src").transform(stage, "staged")
    n1 = nodes.agg(F.count("*").alias("_n"))
    base = (F.lit(1.0) - F.lit(damping)) / F.col("_n")
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", F.round(F.lit(1.0) / F.col("_n"), round_to).alias("_r")
    )
    for i in range(n_iter):
        contrib = (
            ranks.join(ew, ranks["node"] == ew["_src"])
            .select(
                F.col("_dst").alias("node"),
                (
                    F.col("_r")
                    * F.col("_w").cast("double")
                    / F.col("_ow").cast("double")
                )
                .cast("decimal(38,18)")
                .alias("_c"),
            )
        )
        agg = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        ranks = (
            nodes.crossJoin(F.broadcast(n1))
            .join(agg, "node", "left")
            .select(
                "node",
                F.round(
                    base
                    + F.lit(damping)
                    * F.coalesce(F.col("_s").cast("double"), F.lit(0.0)),
                    round_to,
                ).alias("_r"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.transform(stage, "staged")
    return ranks.select("node", F.col("_r").alias("pagerank"))
