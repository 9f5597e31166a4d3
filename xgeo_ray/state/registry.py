"""SchemaRegistry + CheckpointManager actors (SURVEY.md §2.3).

The reference keeps no shared mutable state at all (its one stateful
object is a file cursor, /root/reference/io/shp.go:8-10); the CDC engine
needs exactly two pieces, both tiny, both implemented as singleton Ray
actors *backed by the on-disk manifests* — the actors are coordination
caches, not the source of truth, so a lost actor is rebuilt from disk
and exactly-once is never entrusted to actor memory.

Single-writer ingest does not need these (ingest plans schemas from
segment metadata and watermarks from manifests directly); they exist for
concurrent ingesters and for monitoring surfaces.
"""

from __future__ import annotations

import numpy as np

import ray

from xgeo_ray.schemas import schema_fingerprint, unify
from xgeo_ray.state.delta_table import DeltaTable
from xgeo_ray.state.manifest import schema_from_json, schema_to_json


@ray.remote(num_cpus=0)
class SchemaRegistry:
    """Versioned union-schema authority. ``observe`` merges a newly seen
    segment schema into the union and returns (version, schema_json);
    workers cast their batches to the returned schema."""

    def __init__(self, table_root: str):
        t = DeltaTable.open(table_root)
        self._schema = t.current_schema()
        self._version = t.schema_version()

    def observe(self, schema_json: list[list[str]]) -> tuple[int, list[list[str]]]:
        seen = schema_from_json(schema_json)
        merged = unify(self._schema, seen)
        if schema_fingerprint(merged) != schema_fingerprint(self._schema):
            self._schema = merged
            self._version += 1
        return self._version, schema_to_json(self._schema)

    def current(self) -> tuple[int, list[list[str]]]:
        return self._version, schema_to_json(self._schema)


@ray.remote(num_cpus=0)
class CheckpointManager:
    """Watermark/lineage cache over the manifest log. ``refresh`` re-reads
    disk; ``watermarks`` serves the per-partition seq fence; ``lineage``
    rolls up the manifest totals."""

    def __init__(self, table_root: str):
        self.root = table_root
        self.refresh()

    def refresh(self) -> int:
        t = DeltaTable.open(self.root)
        self._wm = t.watermarks()
        self._manifests = t.manifests()
        return self._manifests[-1].epoch if self._manifests else 0

    def watermarks(self) -> np.ndarray:
        return self._wm

    def committed_segments(self) -> list[str]:
        out = []
        for m in self._manifests:
            out.extend(m.segments)
        return out

    def lineage(self) -> dict[str, int]:
        totals: dict[str, int] = {}
        for m in self._manifests:
            for k, v in m.totals.items():
                totals[k] = totals.get(k, 0) + v
        return totals
