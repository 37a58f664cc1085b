"""Versioned persistence for ANN index metadata.

IVF centroids, k-means cells, and PQ codebooks are all driver-side
metadata (k × dims doubles) — the one part of an ANN index that must
SURVIVE the session to be an index at all. They persist here as
immutable versioned JSON objects next to the table's manifests, with
the same put-if-absent commit the manifest protocol uses (os.link
locally ≙ a conditional PUT on an object store): writers race safely,
readers pin a version, retrains append new versions rather than
overwrite. The vectors themselves never move — an index version is
only valid against the table snapshot it was trained on, so the
payload records that snapshot version too.
"""

from __future__ import annotations

import json
import os
import uuid

INDEX_DIR = "_indexes"


class IndexStore:
    def __init__(self, table_path: str):
        self.base = os.path.join(table_path, INDEX_DIR)

    def _dir(self, name: str) -> str:
        return os.path.join(self.base, name)

    def versions(self, name: str) -> list[int]:
        d = self._dir(name)
        if not os.path.isdir(d):
            return []
        out = []
        for n in os.listdir(d):
            if n.startswith("v") and n.endswith(".json"):
                try:
                    out.append(int(n[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def save(
        self,
        name: str,
        kind: str,
        payload: dict,
        table_snapshot_version: int | None = None,
        max_retries: int = 20,
    ) -> int:
        """Append a new immutable index version; returns it. ``kind`` ∈
        ivf / kmeans / pq (free-form, recorded for the reader)."""
        d = self._dir(name)
        os.makedirs(d, exist_ok=True)
        doc = {
            "kind": kind,
            "table_snapshot_version": table_snapshot_version,
            **payload,
        }
        for _ in range(max_retries):
            v = (self.versions(name) or [0])[-1] + 1
            tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
            with open(tmp, "w") as fh:
                json.dump(doc, fh)
            try:
                os.link(tmp, os.path.join(d, f"v{v:08d}.json"))
                return v
            except FileExistsError:
                continue
            finally:
                os.unlink(tmp)
        raise RuntimeError(f"index save contention exceeded {max_retries} retries")

    def load(self, name: str, version: int | None = None) -> dict:
        vs = self.versions(name)
        if not vs:
            raise FileNotFoundError(f"no index versions for {name!r}")
        v = version if version is not None else vs[-1]
        with open(os.path.join(self._dir(name), f"v{v:08d}.json")) as fh:
            return json.load(fh)
