"""JSON sidecar metadata shared by the index/model stores.

One implementation of the atomic meta protocol (write to ``.tmp``,
``os.replace`` — readers see the old file or the new file, never a
torn one) so the PQ index, IVF index, and frozen-curation-model
stores cannot drift on fsync/versioning fixes. The meta file is also
each store's COMMIT POINT: stores pin the table versions a reader
should pair (e.g. codes+codebook), and because the pins land in one
rename, a reader racing a multi-table refresh sees either the
complete old index or the complete new one.
"""

from __future__ import annotations

import json
import os
from typing import Any


def atomic_json_write(path: str, obj: Any) -> None:
    """THE atomic JSON write (tmp + os.replace) — the one place a
    durability fix (e.g. fsync-before-replace) lands for every meta
    writer: the JsonMetaStore mixin below AND BucketedTable's
    _meta.json schema updates route through here."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


class JsonMetaStore:
    """Mixin: atomic ``meta.json`` under ``self.root``.

    Classes set ``self.root`` before use; ``_meta_name`` may be
    overridden when a root already uses ``meta.json`` for something
    else."""

    _meta_name = "meta.json"

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, self._meta_name)

    def meta(self) -> dict[str, Any]:
        with open(self._meta_path) as f:
            return json.load(f)

    def meta_exists(self) -> bool:
        return os.path.exists(self._meta_path)

    def _write_meta(self, meta: dict[str, Any]) -> None:
        atomic_json_write(self._meta_path, meta)

    def _update_meta(
        self, _if_unchanged: dict[str, Any] | None = None, **fields: Any
    ) -> bool:
        """Read-modify-replace a subset of the stored meta.

        ``_if_unchanged={key: expected}`` makes the update CONDITIONAL:
        the write is skipped (returns False) when any named key no
        longer holds its expected value — the guard an incremental
        append uses so its pin advance cannot clobber a refresh that
        completed while the append ran (the append's rows were encoded
        against artifacts the refresh just superseded). Not a lock —
        the remaining window is the read-to-replace microseconds, vs.
        the whole append job without it; overlapping refreshes
        themselves are the scheduler's exclusion to provide (the
        reference runs full-rebuild and incremental DAGs disjointly).
        """
        m = self.meta()
        if _if_unchanged is not None:
            for key, expected in _if_unchanged.items():
                if m.get(key) != expected:
                    return False
        m.update(fields)
        self._write_meta(m)
        return True
