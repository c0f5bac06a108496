"""Incremental corpus statistics: per-language vocabulary cardinality
maintained across micro-batches as a KMV sketch.

The batch answer (``sk_kmv_distinct``) re-reads the corpus; a stream
cannot. Exact incremental distinct-counting would need the full
distinct-token set as state — O(vocabulary) and growing forever. The
mergeable KMV sketch (operators.sketches) collapses that to O(langs·k):
each micro-batch computes its own bottom-k sketch and MERGES it into
the stored one (bottom-k of a union == bottom-k of concatenated
bottom-ks, so arrival order and batching are irrelevant — the stored
sketch after N batches is BIT-IDENTICAL to the batch sketch over the
union of all N batches, asserted in tests).

State shape: one row per language — a ``VersionedTable`` overwrite per
batch is O(langs·k) bytes, so the full-snapshot write that is wrong
for the near-dup signature state (see streaming/neardup.py) is exactly
right here. Restart-safe for the same reason any foreachBatch + table
state is: the checkpoint replays the last batch, and re-merging an
already-merged sketch is a no-op (idempotent by the same union
property).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketches import bottom_k, kmv_estimate, kmv_sketch
from ..storage import VersionedTable


def merge_sketches(
    state: DataFrame, batch: DataFrame, group_cols: list[str], k: int
) -> DataFrame:
    """Merge two per-group sketch tables (outer on the group): concat →
    dedup → bottom-k, recomputing the estimate from the merged sketch.

    The outer join is NULL-SAFE on the group key: a plain equi-join
    never matches NULL groups, so a null-lang sketch row would
    duplicate instead of merging — one extra state row per batch,
    forever, with wrong estimates for that group."""
    from functools import reduce

    s = state.select(*group_cols, F.col("sketch").alias("_a"))
    b = batch.select(
        *[F.col(c).alias(f"_g_{c}") for c in group_cols],
        F.col("sketch").alias("_b"),
    )
    cond = reduce(
        lambda x, y: x & y,
        [s[c].eqNullSafe(b[f"_g_{c}"]) for c in group_cols],
    )
    empty = F.array().cast("array<bigint>")
    merged = (
        s.join(b, cond, "full_outer")
        .select(
            *[
                F.coalesce(s[c], b[f"_g_{c}"]).alias(c)
                for c in group_cols
            ],
            "_a",
            "_b",
        )
        .withColumn(
            "sketch",
            # the shared KMV primitives (operators.sketches) — NOT an
            # inline copy: the stored-equals-batch invariant depends on
            # merge + estimate math being bit-identical on both sides
            bottom_k(
                F.array_distinct(
                    F.concat(
                        F.coalesce(F.col("_a"), empty),
                        F.coalesce(F.col("_b"), empty),
                    )
                ),
                k,
            ),
        )
        .drop("_a", "_b")
    )
    return merged.withColumn("n_est", kmv_estimate(F.col("sketch"), k))


def run_incremental_vocab_sketch(
    docs_stream: DataFrame,
    state_table: VersionedTable,
    checkpoint_dir: str,
    group_col: str = "lang",
    text_col: str = "text",
    k: int = 64,
    state_keep_last: int = 3,
) -> StreamingQuery:
    """Maintain per-``group_col`` distinct-token estimates over a
    document stream with O(groups·k) state."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        toks = batch_df.select(
            group_col, F.explode(F.split(F.col(text_col), " ")).alias("token")
        )
        batch_sketch = kmv_sketch(toks, [group_col], "token", k=k)
        if state_table.exists():
            out = merge_sketches(
                state_table.read(), batch_sketch, [group_col], k
            )
        else:
            out = batch_sketch
        state_table.overwrite(out.localCheckpoint(eager=True))
        # one overwrite per micro-batch: prune superseded version dirs
        # (tiny, but a long-lived stream would leak one per batch)
        state_table.vacuum(keep_last=state_keep_last)

    return (
        docs_stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
