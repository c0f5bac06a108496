"""Incremental sliding-window ExactSubstr dedup at ingest.

The batch operator (``operators.dedup.remove_exact_substrings``)
removes every token inside any ≥L-token substring occurring more than
once in the corpus. This is its streaming form, the architecture the
incremental near-dup sink established (streaming/neardup.py): the
accumulated state is a hash-bucketed table ON STORAGE (window-hash
presence set), not in the streaming state store, so it scales with
the corpus and survives restarts for free; each micro-batch touches
only the state buckets its own window hashes land in.

Per micro-batch, a window in an arriving document is duplicated iff

    it occurs ≥ 2 times WITHIN the batch        (the batch count), or
    its hash is already in the state            (seen in a prior batch)

so a whole corpus delivered as ONE batch reproduces the batch
operator exactly (tested), and under multi-batch arrival the trade is
the same prefix consistency the near-dup stream documents: the FIRST
arrival of a duplicated run was already published uncut when its
later copies arrive — later copies are cut, the earliest survives.
The batch operator cuts every occurrence;
:func:`compact_exact_substr_residue` below is the periodic sweep
that cuts those first-arrival copies afterwards, converging the
published corpus to the ExactSubstr-CLEAN fixed point (exactly
``compact_neardup_residue``'s role for near-dups, and like there the
evidence lives in STATE, not the corpus: a naive batch re-run over
published docs can't see the duplication — the other copies were
already removed — so the sink additionally accumulates the
proven-duplicated hash set the sweep cuts against).

Replay safety (at-least-once delivery): the corpus publish runs
BEFORE the state merge, and the publish is a unique-key
``merge(when_matched='ignore')`` — a replayed batch whose hashes
already entered the state recomputes an over-cut rewrite, but every
one of its ids is already published, so the ignore-merge discards the
recomputation; state merges are presence-only first-wins and
re-merge idempotently.

State needs PRESENCE only, never counts: within-batch duplication is
counted on the batch side, and one prior sighting already makes every
later window a duplicate — so the state merge is insert-if-absent on
the hash (no guarded-addition replay hazard at all, the simplest
point in the sketch-state merge design space).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    _rebuild_uncovered,
    _window_starts,
    _word_arrays,
)
from ..storage import BucketedTable, VersionedTable


def run_incremental_exact_substr(
    docs_stream: DataFrame,
    state_dir: str,
    corpus: VersionedTable | BucketedTable,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 10,
    n_state_buckets: int = 64,
    state_keep_last: int = 3,
    drop_emptied: bool = True,
    prepare=None,
) -> StreamingQuery:
    """docs stream → per-batch ExactSubstr rewrite vs (batch + state)
    → MERGE survivors → remember the batch's window hashes.

    The window-hash state table buckets on the hash itself, so the
    per-batch state probe is a bucket-pruned read of the batch's own
    hash buckets (``read_buckets``), never a full-state scan — the
    same layout-as-plan lever as the near-dup signature table. Size
    ``n_state_buckets`` ≈ state_size / target_bucket_size so the
    per-batch state MERGE rewrite stays batch-proportional.

    ``drop_emptied`` drops documents the rewrite reduces to the empty
    string (the curation-stage behavior); pass False to publish them
    as empty rows. ``prepare`` is the per-batch cleaning seam
    (applied before any state interaction, like the near-dup sink).
    """
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    L = int(min_len)
    spark = docs_stream.sparkSession
    gram_table = BucketedTable(
        spark,
        f"{state_dir}/window_hashes",
        bucket_key="_h",
        n_buckets=n_state_buckets,
    )
    # hashes PROVEN duplicated (in-batch pair, or matched the seen
    # state) — exactly the batch operator's dup set over everything
    # ingested so far, accumulated insert-if-absent (monotone, so
    # replays are harmless). compact_exact_substr_residue sweeps the
    # published corpus against it to cut the first-arrival copies
    # ingest had to leave uncut.
    dup_table = BucketedTable(
        spark,
        f"{state_dir}/dup_hashes",
        bucket_key="_h",
        n_buckets=n_state_buckets,
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch = batch_df.dropDuplicates([id_col])
        if prepare is not None:
            batch = prepare(batch).localCheckpoint(eager=True)
        if batch.isEmpty():
            return
        base = batch.select(id_col, text_col)
        w = _word_arrays(base, id_col, text_col)
        # staged eagerly: starts feeds the within-batch count, the
        # state probe's bucket ids, the mark join AND the state merge
        # — unstaged, the split/explode lineage would run four times
        starts = _window_starts(w, id_col, L).localCheckpoint(eager=True)
        dup_in_batch = (
            starts.groupBy("_h")
            .agg(F.count("*").alias("_c"))
            .where(F.col("_c") > 1)
            .select("_h")
        )
        dup_h = dup_in_batch
        if gram_table.exists():
            # bucket-pruned state probe, then restrict to the batch's
            # own hashes (broadcast semi — the batch side is tiny
            # next to the accumulated state)
            batch_hashes = starts.select("_h").distinct()
            seen = gram_table.read_buckets(
                gram_table.bucket_ids_of(starts, "_h")
            ).join(F.broadcast(batch_hashes), "_h", "left_semi")
            dup_h = dup_in_batch.unionByName(seen.select("_h")).distinct()
        marked = (
            starts.join(dup_h, "_h", "left_semi")
            .groupBy(id_col)
            .agg(F.sort_array(F.collect_list("_s")).alias("_ms"))
        )
        rebuilt = _rebuild_uncovered(w, marked, id_col, L)
        # rewrite the text in place, preserving every other batch
        # column; NULL-text rows pass through (the stage invariant)
        out = (
            batch.join(rebuilt.select(id_col, "_text_out"), id_col, "left")
            .withColumn(
                text_col,
                F.when(
                    F.col(text_col).isNull(), F.lit(None).cast("string")
                ).otherwise(F.coalesce("_text_out", F.col(text_col))),
            )
            .drop("_text_out")
        )
        if drop_emptied:
            out = out.where(
                F.col(text_col).isNull() | (F.col(text_col) != "")
            )
        # publish FIRST (unique-key ignore-merge), state SECOND: a
        # replay that finds its own hashes in the state over-cuts, but
        # every over-cut id is already published and the merge ignores
        # it (see module docstring)
        corpus.merge(out, keys=[id_col])
        gram_table.merge(
            starts.select("_h").distinct(), keys=["_h"], metrics=False
        )
        dup_table.merge(dup_h.distinct(), keys=["_h"], metrics=False)
        gram_table.vacuum(keep_last=state_keep_last)
        dup_table.vacuum(keep_last=state_keep_last)

    return (
        docs_stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_exact_substr_residue(
    spark,
    state_dir: str,
    corpus: VersionedTable | BucketedTable,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 10,
    drop_emptied: bool = True,
) -> dict:
    """The periodic batch sweep the module docstring names: cut the
    first-arrival copies incremental ingest had to publish uncut.

    Ingest leaves exactly one class of residue: a duplicated run's
    FIRST occurrence was already published when its later copies
    arrived. The sink therefore accumulates the PROVEN-duplicated
    window hashes (``dup_hashes`` — flagged at the moment a second
    occurrence appeared, so it equals the batch operator's dup set
    over everything ingested); this sweep re-enumerates the published
    corpus's windows against that set and rewrites the documents that
    still carry duplicated spans, through the same interval-merge
    rebuild as every other path.

    Contract — the ExactSubstr-clean FIXED POINT, not token-exact
    batch equality: after the sweep, no ≥L-token window of any
    published document matches a window ever proven duplicated during
    ingest (and hence no ≥L substring of ingested text occurs twice
    in the published corpus); re-running the batch operator over the
    post-sweep corpus removes nothing, and the sweep itself is
    idempotent (both tested). Token-exact equality with the
    all-at-once batch run additionally requires that no ingest-time
    cut overlapped later-discovered duplication in the same document:
    a cut stitches its neighbors, so a window duplicated only later
    no longer exists INTACT in the published text — its surviving
    fringe (fewer than L tokens per cut boundary) cannot be
    hash-matched and the sweep keeps it where batch would cut it.
    Seam windows (stitched token runs coincidentally matching a
    known-duplicated window) are conversely cut here though batch
    never saw them. Both effects are bounded, local, and absent on
    corpora whose duplicated runs don't interleave. State stays valid
    afterwards (presence and dup sets are monotone facts about what
    was INGESTED, not about what remains published).
    """
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    L = int(min_len)
    dup_root = f"{state_dir}/dup_hashes"
    if not BucketedTable.exists_at(dup_root) or not corpus.exists():
        return {"docs_rewritten": 0, "docs_dropped": 0, "rows_after": 0}
    dup_table = BucketedTable(spark, dup_root)
    if not dup_table.exists():
        return {"docs_rewritten": 0, "docs_dropped": 0, "rows_after": 0}

    kept = corpus.read()
    base = kept.select(id_col, text_col)
    w = _word_arrays(base, id_col, text_col)
    starts = _window_starts(w, id_col, L)
    marked = (
        starts.join(dup_table.read().select("_h"), "_h", "left_semi")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("_s")).alias("_ms"))
    )
    rebuilt = _rebuild_uncovered(w, marked, id_col, L)
    changed = (
        rebuilt.where(F.col("n_removed") > 0)
        .select(id_col, "_text_out")
        .persist()
    )
    n_changed = changed.count()
    n_dropped = 0
    if n_changed:
        out = kept.join(changed, id_col, "left").withColumn(
            text_col, F.coalesce("_text_out", F.col(text_col))
        ).drop("_text_out")
        if drop_emptied:
            out = out.where(
                F.col(text_col).isNull() | (F.col(text_col) != "")
            )
            n_dropped = changed.where(F.col("_text_out") == "").count()
        out = out.localCheckpoint(eager=True)
        corpus.overwrite(out)
    changed.unpersist()
    rows_after = corpus.read().count()
    return {
        "docs_rewritten": n_changed,
        "docs_dropped": n_dropped,
        "rows_after": rows_after,
    }
