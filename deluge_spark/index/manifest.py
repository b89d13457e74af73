"""Build manifest — per-unit checkpoint/lineage records (north-star B10).

The reference restarts from zero on any failure (``Ingest`` holds no
checkpoint state, /root/reference/ingestor.go:160-244). Our build commits a
manifest entry per completed unit of work (a tokenize group, a shard batch,
a stats job): one JSON file per unit, written atomically (temp + rename), so
re-runs skip completed units without any read-modify-write races. Entries
carry lineage: source fingerprint, row counts, doc-length sums, wall time —
the Spark realization of the reference's progress accounting
(/root/reference/progress/progress.go:94-112) made durable.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class Manifest:
    def __init__(self, index_dir: str):
        self.dir = os.path.join(index_dir, "manifest")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, unit: str) -> str:
        return os.path.join(self.dir, f"{unit}.json")

    def is_done(self, unit: str, fingerprint: str | None = None) -> bool:
        p = self._path(unit)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            entry = json.load(f)
        if entry.get("status") != "done":
            return False
        if fingerprint is not None and entry.get("fingerprint") != fingerprint:
            return False
        return True

    def commit(self, unit: str, fingerprint: str | None = None, **metrics) -> None:
        entry = {
            "unit": unit,
            "status": "done",
            "fingerprint": fingerprint,
            "committed_at": time.time(),
            **metrics,
        }
        tmp = os.path.join(self.dir, f".{unit}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, self._path(unit))

    def get(self, unit: str) -> dict | None:
        """The committed entry for ``unit`` (None if absent) — lets resume
        paths reuse recorded lineage metrics (row counts, corpus stats)
        instead of recomputing them with extra Spark jobs."""
        p = self._path(unit)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def entries(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(json.load(f))
        return out

    def seal(self, **summary) -> None:
        """Mark the whole index immutable — the analog of the reference's
        post-ingest read-only flag (/root/reference/ingestor.go:233-241,
        elastic/v7/client.go:252-275)."""
        self.commit("_sealed", **summary)

    def is_sealed(self) -> bool:
        return self.is_done("_sealed")
