"""Incremental materialized aggregate views (CDC-native view refresh).

A view is a per-partition PARTIAL aggregate of the table's merged state
(``agg_fn: pa.Table -> pa.Table``), cached as one Parquet file per hash
partition plus a small manifest recording the table epoch each partition
was refreshed at. ``refresh`` recomputes ONLY partitions whose visible
file set changed since their cached epoch — at 100 TB an epoch touches a
fraction of partitions, so refresh cost tracks the CHANGE rate, not the
table size (the partition-level analogue of incremental view
maintenance; exact for any aggregate because the partition's merged
state, not a diff, is re-aggregated — no old-value bookkeeping needed).

Reading the view concatenates the per-partition partials; a final
combine (e.g. relational.partial_group_agg over the partials) produces
the global aggregate — partials for a key spread over at most num_salts
partitions, so the combine input is tiny relative to the table.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from xgeo_ray.state.delta_table import DeltaTable

_VIEW_META = "_view.json"


def _view_state(view_dir: str) -> dict:
    p = os.path.join(view_dir, _VIEW_META)
    if not os.path.isfile(p):
        return {"partitions": {}}
    with open(p) as f:
        return json.load(f)


def _write_view_state(view_dir: str, state: dict) -> None:
    p = os.path.join(view_dir, _VIEW_META)
    tmp = p + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, p)


def _partition_version(table: DeltaTable) -> dict[int, int]:
    """Latest committed epoch that touched each partition (compactions
    count: they change the visible file set)."""
    ver: dict[int, int] = {}
    for m in table.manifests():
        for k in m.partitions:
            ver[int(k)] = m.epoch
    return ver


@ray.remote
def _refresh_part(
    paths: list[str],
    envelope: pa.Schema,
    policy,
    agg_fn,
    out_path: str,
    columns: list[str] | None,
) -> int:
    from xgeo_ray.pipelines.ingest import _MERGE_COLS, _atomic_write_parquet
    from xgeo_ray.stages.collapse import merge_versions
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    from xgeo_ray.schemas import cast_to
    from xgeo_ray.state.delta_table import LINEAGE_COLS

    read_cols = None
    if columns is not None:
        read_cols = list(dict.fromkeys(_MERGE_COLS + list(columns)))
        envelope = pa.schema([f for f in envelope if f.name in read_cols])
    tables = []
    for p in paths:
        if read_cols is None:
            tables.append(pq.read_table(p, use_threads=False))
        else:
            have = [c for c in read_cols if c in pq.read_schema(p).names]
            tables.append(pq.read_table(p, columns=have, use_threads=False))
    t = cast_to(merge_versions(tables, drop_tombstones=True, policy=policy), envelope)
    t = t.drop_columns([c for c in LINEAGE_COLS if c in t.column_names])
    out = agg_fn(t)
    _atomic_write_parquet(out, out_path)
    return out.num_rows


def refresh_view(
    table: DeltaTable,
    view_dir: str,
    agg_fn: Callable[[pa.Table], pa.Table],
    columns: list[str] | None = None,
) -> dict:
    """Bring the view up to date: one raw merge+aggregate task per STALE
    partition (fresh partitions are skipped entirely). Returns refresh
    stats. The view manifest commits only after every task succeeded, so
    a crashed refresh re-runs its stale partitions (files overwrite
    deterministically — same idempotence as the epoch deltas)."""
    os.makedirs(view_dir, exist_ok=True)
    state = _view_state(view_dir)
    ver = _partition_version(table)
    plan = table.partition_files()
    envelope = table.current_schema()
    from xgeo_ray.stages.collapse import MERGE_POLICIES

    policy_fn = MERGE_POLICIES[table.merge_policy]["fn"]
    stale = {
        part: paths
        for part, paths in sorted(plan.items())
        if state["partitions"].get(str(part), -1) < ver.get(part, -1)
    }
    refs = {
        part: _refresh_part.remote(
            paths,
            envelope,
            policy_fn,
            agg_fn,
            os.path.join(view_dir, f"part-{part:05d}.parquet"),
            columns,  # prune the merge read to what agg_fn touches
        )
        for part, paths in stale.items()
    }
    rows = ray.get(list(refs.values()))
    for part in refs:
        state["partitions"][str(part)] = ver[part]
    _write_view_state(view_dir, state)
    return {
        "refreshed": len(refs),
        "skipped": len(plan) - len(refs),
        "rows": int(sum(rows)),
    }


def read_view(view_dir: str) -> ray.data.Dataset:
    """The view's per-partition partial aggregates as a Dataset (apply a
    final combine for global aggregates)."""
    files = sorted(
        os.path.join(view_dir, n)
        for n in os.listdir(view_dir)
        if n.startswith("part-") and n.endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(f"no view partitions under {view_dir}")
    return ray.data.read_parquet(files)
