"""Continuous CDC replication: tail a table's change feed into a
replica.

The reference's hourly incremental indexer re-derives changed rows
from a watermark and reprocesses them into the search index
(sql_search_incremental_dag.py:118-140 in the public repo). This
module is that shape done as storage-level replication, composing the
two CDC halves the tables already expose — ``changes()`` (Delta
``readChangeFeed`` parity) and ``apply_changes()`` (``APPLY CHANGES
INTO`` parity) — into a driver you can run forever:

    tail = ChangeFeedTail(source, replica, keys=["content_url"])
    tail.tick()                      # apply everything new, once
    q = tail.as_stream(ckpt_dir)     # or: poll as a streaming query

Consistency story (at-least-once ticks, exactly-once content):

- The tail's own state is ONE number — the last source version whose
  changes have been applied — persisted via atomic rename under the
  replica root AFTER the apply commits. A crash between apply and
  state write re-applies the same span next tick; ``apply_changes``
  is content-idempotent, so the replica converges identically.
- Each tick diffs ``changes(applied, latest)`` against the latest
  version it SAW; source writers can keep committing concurrently —
  new versions are simply picked up next tick (a snapshot-consistent
  span, never a torn read, because version manifests are immutable).
- The replica is single-writer-per-tail: the CAS commit protocol
  turns a second concurrent tail into ``ConcurrentWriteError`` on one
  side; the loser's watermark is untouched, so its retry converges.

Scale posture: on the bucketed variant BOTH halves follow churn, not
table size — ``changes()`` reads only buckets whose manifest pointer
moved between the two versions, and ``apply_changes()`` rewrites only
the buckets the feed touches, so a tick's cost is proportional to the
change volume however big the table. Source ``vacuum`` retention
bounds how far a lagging tail can catch up from (Delta's exact
contract); a tail lagging past retention must re-bootstrap.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import functions as F

from .bucketed import BucketedTable
from .meta import atomic_json_write
from .table import VersionedTable


def _latest_version(t: VersionedTable | BucketedTable) -> int | None:
    if isinstance(t, VersionedTable):
        return t.latest_version()
    h = t.history()
    return h[-1].version if h else None


class ChangeFeedTail:
    """Tails ``source.changes()`` into ``replica`` via
    ``replica.apply_changes()``, tracking the applied source version
    in ``<replica.root>/_replication.json``.

    ``keys`` identify rows across versions (the CDC key set); for a
    BucketedTable source/replica the bucket key must be among them
    (the ``apply_changes`` bucket-scope rule)."""

    def __init__(
        self,
        source: VersionedTable | BucketedTable,
        replica: VersionedTable | BucketedTable,
        keys: list[str],
    ) -> None:
        if not keys:
            raise ValueError("keys required to tail a change feed")
        self.source = source
        self.replica = replica
        self.keys = list(keys)
        self._state_path = os.path.join(replica.root, "_replication.json")

    # ---- state ----------------------------------------------------------

    def applied_version(self) -> int | None:
        """Last source version whose changes are applied, or None
        before bootstrap."""
        if not os.path.exists(self._state_path):
            return None
        with open(self._state_path) as fh:
            state = json.load(fh)
        if state.get("source_root") != self.source.root:
            raise ValueError(
                f"replica at {self.replica.root} tails "
                f"{state.get('source_root')}, not {self.source.root}"
            )
        return state["applied_version"]

    def _record(self, version: int) -> None:
        atomic_json_write(
            self._state_path,
            {"source_root": self.source.root, "applied_version": version},
        )

    # ---- the tick -------------------------------------------------------

    def tick(self) -> dict[str, Any]:
        """Apply every source version committed since the last tick.

        Bootstrap (no state yet): the source's latest snapshot lands
        through the SAME ``apply_changes`` path — as an all-insert
        feed onto an empty replica, or as a ``snapshot_diff`` against
        a non-empty one (a crashed prior bootstrap may have applied a
        snapshot the source has since deleted rows from; the diff
        carries those deletes, so re-bootstrap converges exactly
        instead of stranding phantoms). Steady state: one
        ``changes(applied, latest)`` span, one atomic apply commit,
        then the watermark write — in that order, so a crash between
        them replays an idempotent span instead of skipping one."""
        latest = _latest_version(self.source)
        if latest is None:  # source not yet created
            return {"applied_from": None, "applied_to": None, "rows": 0}
        applied = self.applied_version()
        if applied is not None and applied >= latest:
            return {"applied_from": applied, "applied_to": applied, "rows": 0}
        if applied is None:
            snap = self.source.read(latest)
            if self.replica.exists() and not self.replica.read().isEmpty():
                # re-bootstrap over a partially-applied prior attempt
                # (crash between apply and watermark): an all-insert
                # feed could never DELETE a row the earlier snapshot
                # carried and the source has since dropped — a phantom
                # the steady-state spans would then never touch. Diff
                # against what actually landed so the replica
                # converges to the snapshot exactly.
                from .table import snapshot_diff

                feed = snapshot_diff(self.replica.read(), snap, self.keys)
            else:
                feed = snap.withColumn("_change_type", F.lit("insert"))
        else:
            feed = self.source.changes(applied, latest, keys=self.keys)
        commit = self.replica.apply_changes(feed, keys=self.keys)
        self._record(latest)
        m = commit.metrics
        return {
            "applied_from": applied,
            "applied_to": latest,
            "rows": m.get("upserts", 0) + m.get("deletes", 0),
        }

    # ---- streaming form -------------------------------------------------

    def as_stream(self, checkpoint_dir: str, poll_seconds: int = 10):
        """The readStream-style driver: a rate-source heartbeat whose
        ``foreachBatch`` runs :meth:`tick` every ``poll_seconds``.
        The rate rows are only a clock — all real state lives in the
        tables and the watermark file, so the stream can be stopped,
        its checkpoint discarded, and restarted anywhere without
        affecting replication correctness."""
        spark = self.replica.spark
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
            .writeStream.trigger(processingTime=f"{poll_seconds} seconds")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(lambda _df, _eid: self.tick())
            .start()
        )
