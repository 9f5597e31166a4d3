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

For ADDITIVE tables a second gear exists: pass ``delta_combine`` and a
stale partition whose new epochs carry no tombstones or compactions is
refreshed by aggregating ONLY the new delta files and folding the
result into the cached partial — I/O tracks the change size, not the
partition size. Partial files are epoch-versioned
(``part-NNNNN-eEEEEEE.parquet``) and the view manifest is the commit
point, so a crashed delta fold re-runs against the still-present old
partial instead of double-counting.

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
    for m in table.effective_manifests():
        for k in m.partitions:
            ver[int(k)] = m.epoch
    return ver


def _delta_files_since(
    table: DeltaTable, part: int, since_epoch: int
) -> list[str] | None:
    """Absolute paths of the DELTA files that touched ``part`` after
    ``since_epoch`` — or None when the delta-combine shortcut is unsound
    for this partition: a compaction rewrote the visible set (the cached
    partial's base files are gone), or a new delta carries tombstones
    (a sum-combine cannot retract). Decided entirely from manifest
    metadata; no data file is opened."""
    eff = table.effective_manifests()
    if since_epoch > 0 and since_epoch not in {m.epoch for m in eff}:
        # the epoch the cached partial was built at was rolled back by a
        # restore — its contributions must be retracted: full recompute
        return None
    out: list[str] = []
    for m in eff:
        if m.epoch <= since_epoch:
            continue
        e = m.partitions.get(str(part))
        if e is None:
            continue
        if m.kind.startswith("compact") or e.tombstones:
            return None
        if e.path:
            out.append(os.path.join(table.root, e.path))
    return out


@ray.remote
def _refresh_part_delta(
    new_paths: list[str],
    envelope: pa.Schema,
    agg_fn,
    delta_combine,
    cached_path: str,
    out_path: str,
    columns: list[str] | None,
    aliases: dict[str, str] | None = None,
) -> int:
    """Delta-aware refresh of one partition: aggregate ONLY the new epoch
    delta files and fold the result into the cached partial with
    ``delta_combine`` — I/O tracks the CHANGE size, not the partition
    size. Sound when the table's merge policy is additive and the new
    deltas carry no tombstones (the caller verifies both from manifest
    metadata): additive merge makes per-key state the sum of its delta
    rows, so any sum-decomposable aggregate over the merged state equals
    the combine of per-epoch aggregates. Group-by columns must be
    immutable per key (the standard IVM restriction)."""
    from xgeo_ray.schemas import cast_to
    from xgeo_ray.state.delta_table import LINEAGE_COLS
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    read_cols = None
    if columns is not None:
        read_cols = list(dict.fromkeys(columns))
        envelope = pa.schema([f for f in envelope if f.name in read_cols])
    from xgeo_ray.schemas import aliased_read_columns, apply_aliases

    tables = []
    for p in new_paths:
        have = (
            aliased_read_columns(
                pq.read_schema(p).names, list(envelope.names), aliases
            )
            if read_cols is None
            else aliased_read_columns(
                pq.read_schema(p).names, read_cols, aliases
            )
        )
        tables.append(
            apply_aliases(
                pq.read_table(p, columns=have, use_threads=False), aliases
            )
        )
    t = pa.concat_tables(
        [cast_to(x, envelope) for x in tables], promote_options="permissive"
    )
    t = t.drop_columns([c for c in LINEAGE_COLS if c in t.column_names])
    delta_partial = agg_fn(t)
    cached = pq.read_table(cached_path, use_threads=False)
    out = delta_combine(cached, delta_partial)
    from xgeo_ray.pipelines.ingest import _atomic_write_parquet

    _atomic_write_parquet(out, out_path)
    return out.num_rows


@ray.remote
def _refresh_part(
    paths: list[str],
    envelope: pa.Schema,
    policy,
    agg_fn,
    out_path: str,
    columns: list[str] | None,
    aliases: dict[str, str] | None = None,
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
    if read_cols is None:
        # project to the envelope even unfiltered: files written before
        # a column drop still hold the bytes, and cast_to fails on extras
        read_cols = list(envelope.names)
    from xgeo_ray.schemas import aliased_read_columns, apply_aliases

    tables = []
    for p in paths:
        have = aliased_read_columns(
            pq.read_schema(p).names, read_cols, aliases
        )
        tables.append(
            apply_aliases(
                pq.read_table(p, columns=have, use_threads=False), aliases
            )
        )
    t = cast_to(merge_versions(tables, drop_tombstones=True, policy=policy), envelope)
    t = t.drop_columns([c for c in LINEAGE_COLS if c in t.column_names])
    out = agg_fn(t)
    _atomic_write_parquet(out, out_path)
    return out.num_rows


def _part_file(part: int, epoch: int) -> str:
    return f"part-{part:05d}-e{epoch:06d}.parquet"


def _legacy_part_file(part: int) -> str:
    # pre-epoch-versioning layout (no -eEEEEEE suffix); still readable
    return f"part-{part:05d}.parquet"


def _resolve_part_file(view_dir: str, part: int, epoch: int) -> str:
    """Committed partial for (part, epoch): the epoch-versioned name, or
    the legacy unversioned name a pre-upgrade refresh wrote — the state
    manifest records the same epoch either way, so the legacy file is
    that refresh's exact output, not stale data."""
    p = os.path.join(view_dir, _part_file(part, epoch))
    if os.path.isfile(p):
        return p
    legacy = os.path.join(view_dir, _legacy_part_file(part))
    if os.path.isfile(legacy):
        return legacy
    return p


def refresh_view(
    table: DeltaTable,
    view_dir: str,
    agg_fn: Callable[[pa.Table], pa.Table],
    columns: list[str] | None = None,
    delta_combine: Callable[[pa.Table, pa.Table], pa.Table] | None = None,
) -> dict:
    """Bring the view up to date: one task per STALE partition (fresh
    partitions are skipped entirely). Returns refresh stats. The view
    manifest commits only after every task succeeded; partial files are
    epoch-versioned and the old partial survives until the commit, so a
    crashed refresh re-runs its stale partitions idempotently.

    With ``delta_combine`` (contract: ``combine(cached_partial,
    delta_partial) -> partial``, sound for sum-decomposable aggregates)
    on an additive-policy table, eligible partitions take the delta
    path: aggregate only the post-cache epoch files, fold into the
    cached partial. Ineligible partitions (tombstones, compactions,
    first refresh, non-additive tables) fall back to full merge+agg."""
    os.makedirs(view_dir, exist_ok=True)
    state = _view_state(view_dir)
    ver = _partition_version(table)
    plan = table.partition_files()
    envelope = table.current_schema()
    aliases = table.column_aliases()
    from xgeo_ray.stages.collapse import MERGE_POLICIES

    policy_fn = MERGE_POLICIES[table.merge_policy]["fn"]
    # Partitions that left the visible set (e.g. emptied by a
    # tombstone-horizon compaction) must not keep serving stale partials:
    # drop them from the manifest; the post-commit sweep reclaims their
    # files (deleting only after the commit keeps every pre-commit state
    # readable).
    gone = [k for k in list(state["partitions"]) if int(k) not in plan]
    for k in gone:
        del state["partitions"][k]
    stale = {
        part: paths
        for part, paths in sorted(plan.items())
        # != not <: a restore REWINDS partition versions, and a cached
        # partial built at a rolled-back epoch must recompute too
        if state["partitions"].get(str(part), -1) != ver.get(part, -1)
    }
    refs: dict[int, object] = {}
    n_delta = 0
    for part, paths in stale.items():
        out_path = os.path.join(view_dir, _part_file(part, ver[part]))
        cached_epoch = state["partitions"].get(str(part))
        new_paths = None
        if (
            delta_combine is not None
            and table.merge_policy == "additive"
            and cached_epoch is not None
        ):
            cached_path = _resolve_part_file(view_dir, part, cached_epoch)
            new_paths = _delta_files_since(table, part, cached_epoch)
            if not new_paths or not os.path.isfile(cached_path):
                new_paths = None  # ineligible → full recompute
        if new_paths is not None:
            n_delta += 1
            refs[part] = _refresh_part_delta.remote(
                new_paths,
                envelope,
                agg_fn,
                delta_combine,
                cached_path,
                out_path,
                columns,
                aliases,
            )
        else:
            refs[part] = _refresh_part.remote(
                paths,
                envelope,
                policy_fn,
                agg_fn,
                out_path,
                columns,  # prune the merge read to what agg_fn touches
                aliases,
            )
    rows = ray.get(list(refs.values()))
    for part in refs:
        state["partitions"][str(part)] = ver[part]
    _write_view_state(view_dir, state)
    # Commit point passed: reclaim superseded / orphaned epoch files.
    # Fresh partitions from a pre-upgrade refresh may still live under
    # the legacy unversioned name — keep it until they are re-refreshed.
    keep = set()
    for k, e in state["partitions"].items():
        kept = _resolve_part_file(view_dir, int(k), e)
        keep.add(os.path.basename(kept))
    for n in os.listdir(view_dir):
        if n.startswith("part-") and n.endswith(".parquet") and n not in keep:
            os.unlink(os.path.join(view_dir, n))
    return {
        "refreshed": len(refs),
        "delta": n_delta,
        "dropped": len(gone),
        "skipped": len(plan) - len(refs),
        "rows": int(sum(rows)),
    }


def read_view(view_dir: str) -> ray.data.Dataset:
    """The view's per-partition partial aggregates as a Dataset (apply a
    final combine for global aggregates). Reads the COMMITTED file set
    from the view manifest — uncommitted epoch files from an in-flight
    or crashed refresh are invisible."""
    state = _view_state(view_dir)
    files = [
        _resolve_part_file(view_dir, int(k), e)
        for k, e in sorted(state["partitions"].items())
    ]
    if not files:
        raise FileNotFoundError(f"no view partitions under {view_dir}")
    return ray.data.read_parquet(files)
