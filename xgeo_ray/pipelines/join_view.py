"""Partition-aligned incremental JOIN views (CDC-native stream-stream join).

Two DeltaTables that share the salted hash partitioning
(``num_partitions``, ``num_salts`` — see xgeo_ray.partition) co-locate
identical primary keys: partition ``i`` of the left table holds exactly
the key space of partition ``i`` of the right table. A join on the
primary key is therefore PARTITION-LOCAL — one raw-Ray task per
partition merges both sides' visible files (merge-on-read, each under
its own merge policy) and joins them with the vectorized Acero kernel.
No shuffle anywhere: at 100 TB the join moves zero bytes between
partitions, exactly like ``snapshot()``.

Two gears:

* ``join_snapshot`` — lazy, ad-hoc: the joined state as a Dataset,
  composable with per-side epoch time travel (``as_of_epoch_*``) and
  per-side column pruning (pushed to the parquet read).
* ``refresh_join_view`` / ``read_join_view`` — MATERIALIZED and
  incremental: one cached parquet per partition plus a manifest
  recording the (left_epoch, right_epoch) version pair each partition
  was joined at. A refresh recomputes ONLY partitions where either
  side's visible file set changed — at scale an epoch touches a
  fraction of partitions, so maintenance cost tracks the CHANGE rate
  of the two streams, not the table sizes (the join analogue of
  ``views.refresh_view``). Commit protocol mirrors the view store:
  generation-named partials, manifest-last, post-commit GC — a crashed
  refresh re-runs its stale partitions idempotently.

Join keys: the full primary key ``("conv_id", "turn_idx")`` by default
(any salt count — the salt is a deterministic function of the key), or
``("conv_id",)`` when BOTH tables have ``num_salts == 1`` (with salts a
conversation's turns spread across partitions, so a conv-level join
would need a shuffle — create/reshard the tables to 1 salt instead,
which ``ingest.reshard`` does online). Misaligned tables fail fast with
that remediation rather than silently shuffling.

The reference engine has no join (stateless single-stream CLI,
/root/reference/cmd/xgeo/main.go:18); this is north-rule engine surface:
the "enrich one keyed stream with another keyed stream's state" shape
that a CDC store needs once two WAL streams describe the same entities.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from xgeo_ray.schemas import cast_to
from xgeo_ray.state.delta_table import LINEAGE_COLS, DeltaTable

_JOIN_TYPES = {"inner": "inner", "left": "left outer", "full": "full outer"}
_MERGE_COLS = ["conv_id", "turn_idx", "ts", "seq", "op"]
_VIEW_META = "_join_view.json"
DEFAULT_KEYS = ("conv_id", "turn_idx")


def _check_aligned(
    left: DeltaTable, right: DeltaTable, on: tuple[str, ...]
) -> None:
    if (left.num_partitions, left.num_salts) != (
        right.num_partitions,
        right.num_salts,
    ):
        raise ValueError(
            "join requires partition-aligned tables (the join is "
            "partition-local, zero-shuffle, only when identical keys "
            "co-locate): left is "
            f"({left.num_partitions} parts, {left.num_salts} salts), right "
            f"({right.num_partitions} parts, {right.num_salts} salts). "
            "Reshard one side to match (ingest.reshard migrates a table "
            "online) or sync it into an aligned sink (ingest.sync_derived)."
        )
    if tuple(on) == ("conv_id",) and left.num_salts != 1:
        raise ValueError(
            "joining on conv_id alone needs num_salts == 1 on both tables "
            f"(got {left.num_salts}): with salts a conversation's turns "
            "spread over num_salts partitions, so conv-level co-location "
            "does not hold. Reshard to num_salts=1 for conv-keyed joins."
        )
    if tuple(on) not in (("conv_id",), DEFAULT_KEYS):
        raise ValueError(
            f"unsupported join key {on!r}: the partition function is "
            "defined on (conv_id, turn_idx), so only ('conv_id','turn_idx') "
            "or ('conv_id',) joins are partition-local. Arbitrary-key "
            "joins are a shuffle — use functions.relational.hash_join on "
            "the two snapshots instead."
        )


def _side_fields(
    table: DeltaTable,
    columns: list[str] | None,
    on: tuple[str, ...],
    as_of_epoch: int | None,
) -> list[pa.Field]:
    """Post-merge, post-projection fields of one side, key columns
    first — the driver-side contract every partition task is cast to
    (from_arrow_refs requires one schema across blocks)."""
    env = table.current_schema(as_of_epoch)
    fields = [f for f in env if f.name not in LINEAGE_COLS]
    if columns is not None:
        keep = list(dict.fromkeys(list(on) + list(columns)))
        fields = [f for f in fields if f.name in keep]
    missing = [k for k in on if k not in {f.name for f in fields}]
    if missing:
        raise ValueError(f"join key column(s) {missing} absent from {table.root}")
    key = [f for f in fields if f.name in on]
    rest = [f for f in fields if f.name not in on]
    return key + rest


def _unify_key_types(
    lf: list[pa.Field], rf: list[pa.Field], on: tuple[str, ...]
) -> tuple[list[pa.Field], list[pa.Field]]:
    """The Acero join requires identical key types; the two envelopes
    may have diverged (schema evolution widens ints per table). Unify
    each key field across sides and cast both to it."""
    from xgeo_ray.schemas import unify

    by_l = {f.name: f for f in lf}
    by_r = {f.name: f for f in rf}
    for k in on:
        t = unify(pa.schema([by_l[k]]), pa.schema([by_r[k]])).field(k).type
        by_l[k] = by_l[k].with_type(t)
        by_r[k] = by_r[k].with_type(t)
    return (
        [by_l[f.name] for f in lf],
        [by_r[f.name] for f in rf],
    )


def _output_schema(
    lf: list[pa.Field],
    rf: list[pa.Field],
    on: tuple[str, ...],
    suffix: str,
) -> pa.Schema:
    """Joined schema: left fields, then right non-key fields — renamed
    with ``suffix`` when they collide with a left name (matching the
    Acero kernel's collision rule, applied deterministically here so
    empty partitions emit the identical schema)."""
    lnames = {f.name for f in lf}
    out = list(lf)
    for f in rf:
        if f.name in on:
            continue
        out.append(f.with_name(f.name + suffix) if f.name in lnames else f)
    seen: set[str] = set()
    dup = sorted({f.name for f in out if f.name in seen or seen.add(f.name)})
    if dup:
        # e.g. right carries both `x` and `x_r` (or left already has
        # `x_r`): the rename would silently shadow a real column.
        raise ValueError(
            f"join output would contain duplicate column(s) {dup}; "
            "project one side (columns_left/columns_right) or pick a "
            "different suffix"
        )
    return pa.schema(out)


@ray.remote
def _join_part_task(
    lpaths: list[str],
    rpaths: list[str],
    lfields: list[pa.Field],
    rfields: list[pa.Field],
    lpolicy,
    rpolicy,
    on: tuple[str, ...],
    how: str,
    suffix: str,
    out_schema: pa.Schema,
    out_path: str | None = None,
    laliases: dict[str, str] | None = None,
    raliases: dict[str, str] | None = None,
) -> pa.Table | int:
    """Merge-on-read both sides of ONE partition, join, sort by key.
    With ``out_path`` the result is committed to parquet and only the
    row count returns (the materialized-view gear); otherwise the table
    itself (the snapshot gear)."""
    from xgeo_ray.stages.collapse import merge_versions
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()

    from xgeo_ray.schemas import aliased_read_columns, apply_aliases

    def side(
        paths: list[str], fields: list[pa.Field], policy, aliases=None
    ) -> pa.Table:
        env = pa.schema(fields)
        want = list(dict.fromkeys(_MERGE_COLS + [f.name for f in fields]))
        tabs = []
        for p in paths:
            have = aliased_read_columns(
                pq.read_schema(p).names, want, aliases
            )
            tabs.append(
                apply_aliases(
                    pq.read_table(p, columns=have, use_threads=False),
                    aliases,
                )
            )
        t = merge_versions(tabs, drop_tombstones=True, policy=policy)
        if t.num_rows == 0:
            return env.empty_table()
        # drop merge-only columns the projection didn't ask for; cast_to
        # null-fills schema-evolved columns absent from this partition
        t = t.drop_columns([c for c in t.column_names if c not in env.names])
        return cast_to(t, env)

    lt = side(lpaths, lfields, lpolicy, laliases)
    rt = side(rpaths, rfields, rpolicy, raliases)
    joined = lt.join(
        rt,
        keys=list(on),
        join_type=_JOIN_TYPES[how],
        left_suffix="",
        right_suffix=suffix,
        coalesce_keys=True,
        use_threads=False,
    )
    # Acero join output order is non-deterministic; the view contract is
    # partition-local key order (same as snapshot()). PK columns lead;
    # every REMAINING output column follows as tiebreak, so the sort is
    # total even when a projection drops turn_idx from a conv-level
    # many-to-many join (rows equal on all columns are
    # order-indistinguishable). Envelope types are scalar-only
    # (manifest.validate_envelope), so every column is sortable.
    pk_cols = [
        k
        for k in ("conv_id", "turn_idx", "turn_idx" + suffix)
        if k in out_schema.names
    ]
    sort_cols = pk_cols + [c for c in out_schema.names if c not in pk_cols]
    joined = cast_to(joined, out_schema).sort_by(
        [(k, "ascending") for k in sort_cols]
    )
    if out_path is None:
        return joined
    from xgeo_ray.pipelines.ingest import _atomic_write_parquet

    _atomic_write_parquet(joined, out_path)
    return joined.num_rows


def _plan(
    left: DeltaTable,
    right: DeltaTable,
    how: str,
    as_of_epoch_left: int | None,
    as_of_epoch_right: int | None,
) -> tuple[dict[int, list[str]], dict[int, list[str]], list[int]]:
    lplan = left.partition_files(as_of_epoch_left)
    rplan = right.partition_files(as_of_epoch_right)
    if how == "inner":
        parts = sorted(set(lplan) & set(rplan))
    elif how == "left":
        parts = sorted(lplan)
    else:
        parts = sorted(set(lplan) | set(rplan))
    return lplan, rplan, parts


def join_snapshot(
    left: DeltaTable,
    right: DeltaTable,
    how: str = "inner",
    on: tuple[str, ...] = DEFAULT_KEYS,
    columns_left: list[str] | None = None,
    columns_right: list[str] | None = None,
    suffix: str = "_r",
    as_of_epoch_left: int | None = None,
    as_of_epoch_right: int | None = None,
) -> ray.data.Dataset:
    """Joined merge-on-read state of two partition-aligned tables as a
    Dataset: one raw-Ray task per partition (launched immediately,
    surfaced via from_arrow_refs — the same executor-latency sidestep as
    ``snapshot``), each merging both sides' visible files under their
    own merge policies and joining partition-locally. ``columns_*``
    prune at the parquet read; ``as_of_epoch_*`` time-travel each side
    independently (audit "state of A when B was at epoch e")."""
    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}")
    on = tuple(on)
    _check_aligned(left, right, on)
    lfields = _side_fields(left, columns_left, on, as_of_epoch_left)
    rfields = _side_fields(right, columns_right, on, as_of_epoch_right)
    lfields, rfields = _unify_key_types(lfields, rfields, on)
    out_schema = _output_schema(lfields, rfields, on, suffix)
    lplan, rplan, parts = _plan(
        left, right, how, as_of_epoch_left, as_of_epoch_right
    )
    if not parts:
        return ray.data.from_arrow(out_schema.empty_table())
    from xgeo_ray.stages.collapse import MERGE_POLICIES

    lpol = MERGE_POLICIES[left.merge_policy]["fn"]
    rpol = MERGE_POLICIES[right.merge_policy]["fn"]
    refs = [
        _join_part_task.remote(
            lplan.get(p, []),
            rplan.get(p, []),
            lfields,
            rfields,
            lpol,
            rpol,
            on,
            how,
            suffix,
            out_schema,
            None,
            left.column_aliases(as_of_epoch_left),
            right.column_aliases(as_of_epoch_right),
        )
        for p in parts
    ]
    return ray.data.from_arrow_refs(refs)


# ---------------------------------------------------------------- view store


def _view_state(view_dir: str) -> dict:
    p = os.path.join(view_dir, _VIEW_META)
    if not os.path.isfile(p):
        return {"partitions": {}, "gen": 0}
    with open(p) as f:
        return json.load(f)


def _write_view_state(view_dir: str, state: dict) -> None:
    p = os.path.join(view_dir, _VIEW_META)
    tmp = p + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, p)


def _part_file(part: int, gen: int) -> str:
    return f"part-{part:05d}-g{gen:06d}.parquet"


def refresh_join_view(
    left: DeltaTable,
    right: DeltaTable,
    view_dir: str,
    how: str = "inner",
    on: tuple[str, ...] = DEFAULT_KEYS,
    columns_left: list[str] | None = None,
    columns_right: list[str] | None = None,
    suffix: str = "_r",
) -> dict:
    """Bring the materialized join view up to date: one task per STALE
    partition — a partition is stale when EITHER side's latest
    committed epoch touching it moved (including restores, which rewind
    versions: the ``!=`` test recomputes those too, same rule as
    ``views.refresh_view``). Fresh partitions are skipped entirely, so
    a refresh after a small epoch costs O(changed partitions).

    Commit protocol: partials are generation-named, the view manifest
    commits only after every task succeeded, and superseded files are
    reclaimed only post-commit — a crashed refresh leaves the previous
    committed view fully readable and re-runs idempotently. The join
    spec is pinned in the manifest; refreshing with a different spec
    refuses (the view's rows would silently change meaning)."""
    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}")
    on = tuple(on)
    _check_aligned(left, right, on)
    os.makedirs(view_dir, exist_ok=True)
    state = _view_state(view_dir)
    spec = {
        "how": how,
        "on": list(on),
        "columns_left": columns_left,
        "columns_right": columns_right,
        "suffix": suffix,
        "left": os.path.abspath(left.root),
        "right": os.path.abspath(right.root),
    }
    if state["partitions"] and state.get("spec") != spec:
        raise ValueError(
            f"join view at {view_dir} was built with a different spec "
            f"({state.get('spec')}); refusing to mix. Use a fresh "
            "view_dir for a different join."
        )
    from xgeo_ray.pipelines.views import _partition_version
    from xgeo_ray.stages.collapse import MERGE_POLICIES

    lver = _partition_version(left)
    rver = _partition_version(right)
    lfields = _side_fields(left, columns_left, on, None)
    rfields = _side_fields(right, columns_right, on, None)
    lfields, rfields = _unify_key_types(lfields, rfields, on)
    out_schema = _output_schema(lfields, rfields, on, suffix)
    lplan, rplan, parts = _plan(left, right, how, None, None)
    lpol = MERGE_POLICIES[left.merge_policy]["fn"]
    rpol = MERGE_POLICIES[right.merge_policy]["fn"]
    gen = int(state.get("gen", 0)) + 1
    gone = [k for k in list(state["partitions"]) if int(k) not in set(parts)]
    for k in gone:
        del state["partitions"][k]
    stale = [
        p
        for p in parts
        if state["partitions"].get(str(p), [None, None])[:2]
        != [lver.get(p, -1), rver.get(p, -1)]
    ]
    refs = {
        p: _join_part_task.remote(
            lplan.get(p, []),
            rplan.get(p, []),
            lfields,
            rfields,
            lpol,
            rpol,
            on,
            how,
            suffix,
            out_schema,
            os.path.join(view_dir, _part_file(p, gen)),
            left.column_aliases(),
            right.column_aliases(),
        )
        for p in stale
    }
    rows = ray.get(list(refs.values()))
    for p in refs:
        state["partitions"][str(p)] = [lver.get(p, -1), rver.get(p, -1), gen]
    state["gen"] = gen
    state["spec"] = spec
    _write_view_state(view_dir, state)
    # commit passed: reclaim superseded generations + dropped partitions
    keep = {
        _part_file(int(k), v[2]) for k, v in state["partitions"].items()
    }
    for n in os.listdir(view_dir):
        if n.startswith("part-") and n.endswith(".parquet") and n not in keep:
            os.unlink(os.path.join(view_dir, n))
    return {
        "refreshed": len(refs),
        "skipped": len(parts) - len(refs),
        "dropped": len(gone),
        "rows": int(sum(rows)),
    }


def read_join_view(view_dir: str) -> ray.data.Dataset:
    """The committed materialized join as a Dataset — reads only files
    the view manifest references (an in-flight or crashed refresh's
    generation files are invisible)."""
    state = _view_state(view_dir)
    files = [
        os.path.join(view_dir, _part_file(int(k), v[2]))
        for k, v in sorted(state["partitions"].items(), key=lambda kv: int(kv[0]))
    ]
    if not files:
        raise FileNotFoundError(f"no committed join view under {view_dir}")
    return ray.data.read_parquet(files)
