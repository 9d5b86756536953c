"""Per-superstep checkpointing with per-partition lineage + metrics.

The reference has NO fault tolerance (SURVEY.md §4: a rank failure kills the
job); the north_rule adds it: every iteration writes per-partition state
Parquet + a manifest, and a restarted run resumes from the last *complete*
superstep. Layout (resumable-output rule — one directory per superstep,
one file per partition, manifest written last as the commit record):

    <dir>/iter=<k>/part=<p>.parquet      vertex state slice of partition p
    <dir>/iter=<k>/MANIFEST.json         {iter, parts, metrics, lineage}

A superstep is complete iff its MANIFEST.json exists (written after all
part files — the atomic commit point).
"""
from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class CheckpointManager:
    def __init__(self, root: str, job: str):
        self.dir = os.path.join(root, job)
        os.makedirs(self.dir, exist_ok=True)

    def _iter_dir(self, it: int) -> str:
        return os.path.join(self.dir, "iter=%05d" % it)

    def save(self, it: int, parts: list[tuple[int, np.ndarray]], metrics: dict, lineage: dict | None = None):
        d = self._iter_dir(it)
        os.makedirs(d, exist_ok=True)
        part_meta = []
        for p, (lo, arr) in enumerate(parts):
            path = os.path.join(d, "part=%05d.parquet" % p)
            pq.write_table(pa.table({"vid": np.arange(lo, lo + len(arr), dtype=np.int64), "value": arr}), path)
            part_meta.append({"part": p, "lo": int(lo), "rows": int(len(arr)), "file": os.path.basename(path)})
        manifest = {
            "iter": it,
            "parts": part_meta,
            "metrics": metrics,
            "lineage": lineage or {},
        }
        tmp = os.path.join(d, ".MANIFEST.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "MANIFEST.json"))  # atomic commit

    def save_tables(self, it: int, parts: list[dict], metrics: dict, lineage: dict | None = None):
        """Multi-table per-partition checkpoint (walk state): parts[p] is a
        dict name -> pa.Table; each table lands in its own parquet file and
        MANIFEST.json is the atomic commit record, as in save()."""
        d = self._iter_dir(it)
        os.makedirs(d, exist_ok=True)
        part_meta = []
        for p, tabs in enumerate(parts):
            files = {}
            for name, tbl in tabs.items():
                fn = "part=%05d.%s.parquet" % (p, name)
                pq.write_table(tbl, os.path.join(d, fn))
                files[name] = fn
            part_meta.append({"part": p, "files": files})
        manifest = {"iter": it, "kind": "tables", "parts": part_meta, "metrics": metrics, "lineage": lineage or {}}
        tmp = os.path.join(d, ".MANIFEST.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "MANIFEST.json"))

    def load_tables(self, it: int) -> tuple[list[dict], dict]:
        d = self._iter_dir(it)
        with open(os.path.join(d, "MANIFEST.json")) as f:
            manifest = json.load(f)
        parts = []
        for pm in manifest["parts"]:
            parts.append({name: pq.read_table(os.path.join(d, fn)) for name, fn in pm["files"].items()})
        return parts, manifest

    def latest_complete(self) -> int | None:
        """Highest iter whose MANIFEST.json exists, or None."""
        best = None
        if not os.path.isdir(self.dir):
            return None
        for name in os.listdir(self.dir):
            if name.startswith("iter=") and os.path.exists(os.path.join(self.dir, name, "MANIFEST.json")):
                it = int(name.split("=")[1])
                best = it if best is None else max(best, it)
        return best

    def load(self, it: int) -> tuple[list[tuple[int, np.ndarray]], dict]:
        d = self._iter_dir(it)
        with open(os.path.join(d, "MANIFEST.json")) as f:
            manifest = json.load(f)
        parts = []
        for pm in manifest["parts"]:
            t = pq.read_table(os.path.join(d, pm["file"]))
            parts.append((pm["lo"], t.column("value").to_numpy()))
        return parts, manifest
