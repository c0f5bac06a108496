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
        os.makedirs(self.root, exist_ok=True)
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)

    def _update_meta(self, **fields: Any) -> None:
        """Read-modify-replace: update pins without disturbing the
        rest of the stored meta (single-writer stores — the scheduled
        refresh/append jobs — so no lock is needed)."""
        m = self.meta()
        m.update(fields)
        self._write_meta(m)
