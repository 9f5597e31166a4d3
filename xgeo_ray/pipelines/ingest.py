"""Change-apply ingest — the flagship pipeline (SURVEY.md §3, §7).

Shape (the reference's source->transform->sink stream,
/root/reference/cmd/xgeo/main.go:44-62, generalized to a distributed
exactly-once upsert):

    plan read chunks from segment metadata (row-group runs / files)
      -> map task per chunk: read + NormalizeEvents (validate, cast to
         the union envelope) + adaptive LWW pre-collapse + salted
         part_key + argsort-split into P per-partition slices
      -> radix exchange                     (num_returns=P object refs;
                                             the epoch's ONE all-to-all)
      -> reduce task per partition: concat + watermark dedup +
         last-writer-wins collapse + partition-local (conv_id, turn_idx)
         sort + epoch-delta Parquet write
      -> commit manifest                    (atomic fence; lineage totals)

All sorts are partition-local; every stage is Arrow-vectorized. The
exchange is raw-Ray MapReduce rather than Dataset groupby because the
key is a precomputed int in [0, P) — Ray Data's sort- and hash-based
all-to-alls both measured 4-7x slower on a 24M-row epoch (see
_radix_exchange_apply). Sources, snapshot, compaction and every query
surface remain ray.data Datasets.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from xgeo_ray.partition import PART_COL, add_part_key
from xgeo_ray.schemas import cast_to, unify
from xgeo_ray.stages.collapse import merge_versions
from xgeo_ray.stages.normalize import NormalizeEvents
from xgeo_ray.state.delta_table import (
    LINEAGE_COLS,
    PARTS_DIR,
    DeltaTable,
    delta_relpath,
    new_commit_token,
)
from xgeo_ray.state.manifest import Manifest, PartitionEntry

_SORT_KEYS = [
    ("conv_id", "ascending"),
    ("turn_idx", "ascending"),
    ("ts", "ascending"),
    ("seq", "ascending"),
]


def _atomic_write_parquet(
    t: pa.Table, final_path: str, durable: bool = True,
    codec: str | None = None,
) -> int:
    """Write tmp, then publish through the storage seam (POSIX:
    os.replace + dir fsync; object stores: a plain atomic PUT — see
    state/storage.py). Within one epoch attempt the final path is
    deterministic, so Ray task retries just overwrite the same bytes.
    With ``durable`` the file is fsync'd before publication, so a
    manifest committed later can never reference bytes an OS/power
    crash took back (DeltaTable durability="full")."""
    from xgeo_ray.state.storage import DEFAULT_STORAGE

    d = os.path.dirname(final_path)
    os.makedirs(d, exist_ok=True)
    tmp = final_path + f".tmp-{os.getpid()}"
    # 128k-row groups: fine enough that a sorted file's row-group stats
    # prune point lookups to a few groups, coarse enough that scans and
    # chunk planning (~500k-row runs) stay metadata-light
    rg = 131_072
    from xgeo_ray.state.delta_table import parse_parquet_codec

    kw = parse_parquet_codec(codec)
    if durable:
        with open(tmp, "wb") as f:
            pq.write_table(t, f, row_group_size=rg, **kw)
            f.flush()
            os.fsync(f.fileno())
    else:
        pq.write_table(t, tmp, row_group_size=rg, **kw)
    DEFAULT_STORAGE.publish_file(tmp, final_path, durable)
    return os.path.getsize(final_path)


def _atomic_write_jsonl(t: pa.Table, final_path: str, durable: bool = True) -> int:
    """JSON-lines variant of _atomic_write_parquet: serialize (gzip by
    suffix), fsync when durable, publish through the storage seam. The
    tmp name keeps the real suffix as a prefix-dotted sibling so the
    serializer's codec-by-suffix dispatch still sees ``.gz``."""
    import gzip
    import json as _json

    from xgeo_ray.state.storage import DEFAULT_STORAGE

    d = os.path.dirname(final_path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(
        d, f".tmp-{os.getpid()}-{os.path.basename(final_path)}"
    )
    # bytes have no JSON form: base64-encode binary columns (the
    # json.dumps default=str fallback would write the PYTHON REPR of
    # the bytes — silent corruption of multimodal payloads)
    bin_cols = [
        f.name
        for f in t.schema
        if pa.types.is_binary(f.type)
        or pa.types.is_large_binary(f.type)
        or pa.types.is_fixed_size_binary(f.type)
    ]
    if bin_cols and t.num_rows:
        import polars as pl

        t = pl.from_arrow(t).with_columns(
            [pl.col(c).bin.encode("base64") for c in bin_cols]
        ).to_arrow()
    # Stream slice-by-slice through the (optionally gzip) file object:
    # never hold the whole shard as pylist + one joined string +
    # compressed bytes at once — a training-file-sized shard would
    # peak at several× its parquet size per writer task otherwise.
    with open(tmp, "wb") as f:
        sink = (
            gzip.GzipFile(fileobj=f, mode="wb", mtime=0)
            if final_path.endswith(".gz")
            else f
        )
        for off in range(0, t.num_rows, 8192):
            chunk = t.slice(off, 8192)
            sink.write(
                "".join(
                    _json.dumps(r, default=str) + "\n"
                    for r in chunk.to_pylist()
                ).encode()
            )
        if sink is not f:
            sink.close()
        if durable:
            f.flush()
            os.fsync(f.fileno())
    DEFAULT_STORAGE.publish_file(tmp, final_path, durable)
    return os.path.getsize(final_path)


class NormalizeCollapsePartition:
    """Fused stateless stage: envelope normalize + optional user
    transform + within-batch LWW pre-collapse + salted partition key,
    one map_batches per segment. Fusing avoids re-batching between
    stages — at 10^10 events the savings is one full pass of task
    dispatch + serialization.

    ``transform`` is the user-extension hook (SURVEY §2.10 — the
    reference's Lua per-record script, replaced by a vectorized
    ``fn(pa.Table) -> pa.Table``, e.g. an ``extension.StageChain``). It
    runs on normalized events and must preserve the envelope columns;
    its output is re-validated by the apply-side cast."""

    def __init__(
        self,
        envelope: pa.Schema,
        num_partitions: int,
        num_salts: int,
        transform=None,
        precombine: bool = True,
        drop: frozenset = frozenset(),
        dlq_dir: str | None = None,
        constraints: dict | None = None,
    ):
        # limit_worker_threads happens in the task body (_radix_map), not
        # here: driver-side __init__ would clamp the DRIVER's Arrow pools.
        self.norm = NormalizeEvents(
            envelope, drop=drop, dlq_dir=dlq_dir, constraints=constraints
        )
        # with a user transform, CHECK rules must gate the transform's
        # OUTPUT (rules on stage-populated columns would otherwise see
        # normalize's null-fill) — defer the gate past the transform
        self.norm.defer_checks = transform is not None
        self.p = num_partitions
        self.s = num_salts
        self.transform = transform
        # non-precombinable merge policies (e.g. additive) must see the
        # epoch's full key history at the owner partition
        self.precombine = precombine

    def __call__(self, batch: pa.Table) -> pa.Table:
        from xgeo_ray.stages.collapse import maybe_precollapse

        batch = self.norm(batch)
        if self.transform is not None:
            batch = self.transform(batch)
            batch = self.norm.apply_checks(batch)  # gate POST-transform
        # surfaced per map task into the manifest's totals["invalid"]
        self.last_invalid = self.norm.last_invalid
        if self.precombine:
            batch = maybe_precollapse(batch)
        return add_part_key(batch, self.p, self.s)


class ApplyPartition:
    """Per-partition merge worker (map_batches over the hash-shuffle
    output; each incoming block holds one or more COMPLETE partitions).

    Per partition: drops replayed events at or below the committed seq
    watermark (idempotence under at-least-once delivery), collapses to
    the latest version per key (one sort, metrics off the same sort),
    keeps tombstones as delta rows, sorted by (conv_id, turn_idx), and
    writes the epoch delta file. Returns one lineage-metrics row per
    partition."""

    def __init__(
        self,
        root: str,
        epoch: int,
        envelope_schema: pa.Schema,
        watermarks: np.ndarray,
        durable: bool = True,
        policy: str = "lww",
        token: str = "",
        ts_watermarks: np.ndarray | None = None,
        history: str = "collapsed",
        stats_columns: list[str] | None = None,
        aliases: dict[str, str] | None = None,
        codec: str | None = None,
    ):
        # NOTE: no limit_worker_threads() here — instance-passed stages are
        # constructed on the DRIVER (pickled to workers, __init__ never
        # re-runs there); the limit belongs in the task-side call path.
        self.root = root
        self.epoch = epoch
        self.schema = envelope_schema
        self.wm = watermarks
        # per-partition max committed event ts (µs): applied rows below
        # it count as late arrivals (event-time lineage); None disables
        self.ts_wm = ts_watermarks
        self.durable = durable
        self.policy = policy
        # attempt-unique commit token, minted ONCE on the driver per epoch
        # attempt and pickled into every worker: task retries reuse it
        # (idempotent overwrite), concurrent drivers never share it (their
        # data files stay disjoint; only the fence winner's are visible)
        self.token = token
        self.history = history
        self.stats_columns = stats_columns or []
        # table-policy parquet codec for delta files (None = snappy)
        self.codec = codec
        # resolve the callable HERE (driver): runtime-registered policies
        # are not in the worker's registry; the pickled instance carries it
        from xgeo_ray.stages.collapse import MERGE_POLICIES

        self.policy_fn = MERGE_POLICIES[policy]["fn"]
        # physical->logical column renames, used only where a worker
        # reads PRIOR table files (the fused final-snapshot reduce)
        self.aliases = aliases
        self.__name__ = "ApplyPartition"  # ray map_groups wraps fn.__name__

    def __call__(self, batch: pa.Table) -> pa.Table:
        from xgeo_ray.tuning import limit_worker_threads

        limit_worker_threads()
        pk = batch.column(PART_COL).to_numpy(zero_copy_only=False)
        parts = np.unique(pk)
        outs = []
        for part in parts:
            sub = batch if len(parts) == 1 else batch.filter(pa.array(pk == part))
            outs.append(self._apply_one(int(part), sub.drop_columns([PART_COL])))
        return (
            pa.concat_tables(outs) if outs else _ENTRY_SCHEMA.empty_table()
        )

    def _apply_one(self, part: int, t: pa.Table, want_delta: bool = False):
        """Apply one partition's epoch rows; with ``want_delta`` also
        return the written delta table (tombstones kept) so a fused
        final-epoch snapshot can merge it in memory instead of
        re-reading the file it just wrote."""
        from xgeo_ray.stages.collapse import (
            MERGE_POLICIES,
            collapse_with_metrics,
            count_unique_keys_and_seqs,
        )

        rows_in = t.num_rows
        wm = int(self.wm[part])
        if wm >= 0:
            # seq=-1 rows (bootstrap/correction convention) are ALWAYS
            # watermark-exempt, not only when the whole epoch is: a derived
            # table syncing a source's change feed re-ingests the source's
            # correction deltas (seq=-1) through this filter after its own
            # watermark is already >= 0 — dropping them would silently lose
            # every apply_changes correction downstream. Their exactly-once
            # story is segment-level (committed-segments set), not seq.
            seq_col = t.column("seq")
            keep = pc.or_(
                pc.greater(seq_col, pa.scalar(wm, pa.int64())),
                pc.equal(seq_col, pa.scalar(-1, pa.int64())),
            )
            t = t.filter(keep)
        below_wm = rows_in - t.num_rows
        # late is counted POST-dedup (distinct (key, seq) triples below
        # the event-time watermark) inside the collapse kernels' existing
        # sort — redelivered copies must not inflate the lateness signal
        tw = None
        if self.ts_wm is not None:
            tw_part = int(self.ts_wm[part])
            if tw_part >= 0:
                tw = tw_part
        if self.history == "full":
            # keep every distinct version (exact event-time travel);
            # only redelivered exact duplicates drop
            from xgeo_ray.stages.collapse import history_dedup

            collapsed, n_keys, n_trips, late = history_dedup(
                t, ts_watermark_us=tw
            )
        elif self.policy == "lww":
            collapsed, n_keys, n_trips, late = collapse_with_metrics(
                t, drop_tombstones=False, ts_watermark_us=tw
            )
        else:
            collapsed = self.policy_fn(t, False)
            n_keys, n_trips, late = count_unique_keys_and_seqs(
                t, ts_watermark_us=tw
            )
        entry = PartitionEntry(
            part_key=part,
            path=delta_relpath(part, self.epoch, token=self.token),
            rows_in=rows_in,
            dup_dropped=t.num_rows - n_trips,
            superseded=n_trips - n_keys,
            below_wm_dropped=below_wm,
            applied=collapsed.num_rows,
            tombstones=int(
                pc.sum(pc.equal(collapsed.column("op"), "D")).as_py() or 0
            ),
            max_seq=int(pc.max(t.column("seq")).as_py()) if t.num_rows else wm,
            max_ts=int(pc.max(collapsed.column("ts")).cast(pa.int64()).as_py())
            if collapsed.num_rows
            else -1,
            min_ts=int(pc.min(collapsed.column("ts")).cast(pa.int64()).as_py())
            if collapsed.num_rows
            else -1,
            late=late,
        )
        if collapsed.num_rows:
            from xgeo_ray.partition import build_key_bloom

            out = cast_to(collapsed, self.schema)
            entry.bloom = build_key_bloom(
                out.column("conv_id").to_numpy(zero_copy_only=False)
            )
            entry.stats = _column_stats_json(out, self.stats_columns)
            entry.bytes = _atomic_write_parquet(
                out,
                os.path.join(self.root, entry.path),
                durable=self.durable,
                codec=self.codec,
            )
        else:
            out = self.schema.empty_table()
            entry.path = ""
        if want_delta:
            return _entry_to_table(entry), out
        return _entry_to_table(entry)


_ENTRY_SCHEMA = pa.schema(
    [
        ("part_key", pa.int64()),
        ("path", pa.string()),
        ("rows_in", pa.int64()),
        ("dup_dropped", pa.int64()),
        ("superseded", pa.int64()),
        ("below_wm_dropped", pa.int64()),
        ("applied", pa.int64()),
        ("tombstones", pa.int64()),
        ("max_seq", pa.int64()),
        ("max_ts", pa.int64()),
        ("min_ts", pa.int64()),
        ("bytes", pa.int64()),
        ("late", pa.int64()),
        ("bloom", pa.string()),
        ("stats", pa.string()),
    ]
)


def _column_stats_json(t: pa.Table, cols: list[str]) -> str:
    """JSON zone map {"col": [min, max] | null} for the declared stats
    columns present in ``t`` (null = declared but all values null;
    absent = column not in this file). Timestamps record as int64 µs so
    the manifest stays JSON and comparisons stay numeric."""
    if not cols:
        return ""
    out = {}
    for c in cols:
        if c not in t.column_names:
            continue
        col = t.column(c)
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        mm = pc.min_max(col)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        out[c] = None if lo is None else [lo, hi]
    return json.dumps(out) if out else ""


def _entry_to_table(e: PartitionEntry) -> pa.Table:
    return pa.table(
        {k: [getattr(e, k)] for k in _ENTRY_SCHEMA.names}, schema=_ENTRY_SCHEMA
    )


@ray.remote
def _radix_map(path: str, row_groups: list[int] | None, prep, num_parts: int):
    """Map side of the radix exchange: read one chunk, prep (normalize +
    pre-collapse + part key), order by the integer part key (one argsort
    + one gather), return num_parts zero-copy slices as separate return
    values so each lands in the object store addressable per-partition,
    plus ONE extra return (call with num_returns=num_parts+1): this
    chunk's invalid-row drop count from the normalizer — a scalar the
    driver sums into the manifest's totals["invalid"]."""
    from xgeo_ray.sources.wal import read_segment_table
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    if row_groups is None:
        t = read_segment_table(path)
    else:
        t = pq.ParquetFile(path).read_row_groups(row_groups, use_threads=False)
    t = prep(t)
    pk = t.column(PART_COL).to_numpy(zero_copy_only=False)
    order = np.argsort(pk, kind="stable")
    t = t.take(order)
    pk = pk[order]
    bounds = np.searchsorted(pk, np.arange(num_parts + 1))
    out = tuple(
        t.slice(bounds[i], bounds[i + 1] - bounds[i]).drop_columns([PART_COL])
        for i in range(num_parts)
    )
    return out + (int(getattr(prep, "last_invalid", 0)),)


@ray.remote
def _radix_reduce(part: int, apply_partition, *subs: pa.Table):
    """Reduce side: concat this partition's slices from every map task,
    apply watermark dedup + LWW + delta write. Returns the lineage entry
    table, or None for an empty partition."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    subs = [s for s in subs if s.num_rows]
    if not subs:
        return None
    t = pa.concat_tables(subs, promote_options="permissive")
    return apply_partition._apply_one(part, t)


@ray.remote(num_returns=2)
def _radix_reduce_snap(
    part: int, apply_partition, prior_paths: list[str], *subs: pa.Table
):
    """Final-epoch reduce fused with the closing merge-on-read snapshot:
    same watermark dedup + collapse + delta write as _radix_reduce, then
    the partition's PRIOR visible files merge with the fresh delta while
    it is still in memory. Each partition's snapshot merge overlaps the
    other partitions' reduces instead of serializing after the last
    commit, and the last epoch's delta is never re-read from disk.
    Returns (lineage entry | None, merged final state). Exactly-once is
    untouched: the caller surfaces the merged refs only AFTER the
    epoch's manifest commit succeeds — a crashed run discards them."""
    from xgeo_ray.stages.collapse import merge_versions
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    subs = [s for s in subs if s.num_rows]
    entry = None
    envelope = apply_partition.schema
    tables = _read_env_tables(
        prior_paths, envelope, getattr(apply_partition, "aliases", None)
    )
    if subs:
        t = pa.concat_tables(subs, promote_options="permissive")
        entry, delta = apply_partition._apply_one(part, t, want_delta=True)
        if delta.num_rows:
            tables.append(delta)
    merged = cast_to(
        merge_versions(
            tables, drop_tombstones=True, policy=apply_partition.policy_fn
        ),
        envelope,
    )
    merged = merged.drop_columns(
        [c for c in LINEAGE_COLS if c in merged.column_names]
    )
    return entry, merged


def _radix_exchange_apply(
    chunks: list[tuple[str, list[int] | None]],
    prep,
    table: DeltaTable,
    epoch: int,
    envelope: pa.Schema,
    wm: np.ndarray,
    token: str | None = None,
) -> list[PartitionEntry]:
    """The epoch's one all-to-all, as a raw-Ray MapReduce radix exchange.

    Ray Data's generic exchanges pay for machinery this key doesn't need
    (sort strategy: sample pass + comparison sort + merge; hash strategy:
    aggregator-actor funnel) — measured on a 24M-row epoch they cost
    4-7x this path's wall time. The part key is a precomputed int in
    [0, P): an O(n) argsort-split in each map task and a concat per
    partition IS the shuffle. Dataset stays the surface for sources,
    snapshot and queries; this is the sanctioned raw-task fallback for
    the one operation the Dataset API can't express efficiently.

    Exactly-once is unaffected: map/reduce tasks are deterministic and
    idempotent (delta paths are content-deterministic, rewritten whole on
    retry), and nothing is visible until the manifest commit."""
    P = table.num_partitions
    prep_ref = ray.put(prep)
    apply_ref = ray.put(
        ApplyPartition(
            table.root,
            epoch,
            envelope,
            wm,
            durable=table.durability == "full",
            policy=table.merge_policy,
            token=new_commit_token() if token is None else token,
            ts_watermarks=table.ts_watermarks(),
            history=table.history,
            stats_columns=table.stats_columns(),
            codec=table.parquet_codec(),
        )
    )
    maps = [
        _radix_map.options(num_returns=P + 1).remote(path, rgs, prep_ref, P)
        for path, rgs in chunks
    ]
    outs = [
        _radix_reduce.remote(part, apply_ref, *[m[part] for m in maps])
        for part in range(P)
    ]
    invalid = sum(ray.get([m[P] for m in maps]))
    entries: list[PartitionEntry] = []
    for t in ray.get(outs):
        if t is None:
            continue
        for row in t.to_pylist():
            entries.append(
                PartitionEntry(
                    **{k: (v if k in ("path", "bloom", "stats") else int(v)) for k, v in row.items()}
                )
            )
    return entries, invalid


def _apply_shuffled(
    ds: ray.data.Dataset,
    table: DeltaTable,
    epoch: int,
    envelope: pa.Schema,
    wm: np.ndarray,
) -> ray.data.Dataset:
    """Route events to owner partitions (groupby exchange) and apply.

    Measured on a 24M-row epoch: Ray's sort-based groupby shuffle beat
    its hash-shuffle strategy >4x here (the hash path funnels through
    aggregator actors), so the exchange stays groupby().map_groups().
    ApplyPartition also accepts multi-partition batches, so either
    exchange plugs in."""
    return ds.groupby(PART_COL).map_groups(
        ApplyPartition(
            table.root,
            epoch,
            envelope,
            wm,
            durable=table.durability == "full",
            policy=table.merge_policy,
            token=new_commit_token(),
            ts_watermarks=table.ts_watermarks(),
            history=table.history,
            stats_columns=table.stats_columns(),
            codec=table.parquet_codec(),
        ),
        batch_format="pyarrow",
    )


class _hash_shuffle_strategy:
    """No-op retained for A/B experiments: switches
    DataContext.shuffle_strategy to HASH_SHUFFLE for the scope (Ray
    consults it when the plan's root dataset is created)."""

    def __enter__(self):
        from ray.data.context import DataContext, ShuffleStrategy

        self.ctx = DataContext.get_current()
        self.prev = self.ctx.shuffle_strategy
        self.ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        return self

    def __exit__(self, *exc):
        self.ctx.shuffle_strategy = self.prev
        return False


def _check_no_split_parts(entries: list[PartitionEntry]) -> None:
    """A part split across two apply tasks would have raced on one delta
    file — abort BEFORE the commit makes anything visible. Structurally
    impossible in the radix exchange (one reduce per part); cheap
    invariant kept for any alternative exchange."""
    seen: set[int] = set()
    for e in entries:
        if e.part_key in seen:
            raise RuntimeError(
                f"partition {e.part_key} split across apply tasks — "
                "increase num_partitions"
            )
        seen.add(e.part_key)


def _collect_entries(metrics: ray.data.Dataset) -> list[PartitionEntry]:
    entries = [
        PartitionEntry(**{k: (v if k in ("path", "bloom", "stats") else int(v)) for k, v in row.items()})
        for row in metrics.take_all()
    ]
    _check_no_split_parts(entries)
    return entries


def _read_env_tables(
    paths: list[str],
    envelope: pa.Schema,
    aliases: dict[str, str] | None = None,
) -> list[pa.Table]:
    """Read delta files PROJECTED to the envelope's columns: a file
    written before a column was dropped still holds its bytes, and they
    must neither be read nor surface past the narrowed envelope (the
    downstream ``cast_to`` fails fast on extras by design). ``aliases``
    (``DeltaTable.column_aliases``) resolves metadata renames: a
    pre-rename file's old physical name is read and surfaced under the
    logical name, zero data rewritten."""
    from xgeo_ray.schemas import aliased_read_columns, apply_aliases

    return [
        apply_aliases(
            pq.read_table(
                p,
                columns=aliased_read_columns(
                    pq.read_schema(p).names, list(envelope.names), aliases
                ),
                use_threads=False,
            ),
            aliases,
        )
        for p in paths
    ]


def plan_envelope_schema(table: DeltaTable, segment_paths: list[str]) -> pa.Schema:
    """Schema-evolution planning from segment *metadata only* (Parquet
    footers; a small head sample for JSON): union of the table's current
    envelope and every segment's schema. This is the scale-correct
    registry consult — metadata, not a shuffle."""
    from xgeo_ray.sources.wal import segment_schema
    from xgeo_ray.state.manifest import validate_envelope

    schemas = [table.current_schema()]
    for p in segment_paths:
        schemas.append(segment_schema(p))
    # fail fast HERE (plan time) on types the manifest can't record —
    # not at commit time after the epoch's read/shuffle/write is spent
    env = validate_envelope(unify(*schemas))
    # a DROPPED column arriving in new segments must not resurrect: the
    # union re-adds it, so subtract the drop set again (NormalizeEvents
    # then discards the incoming values). RETIRED names (the old side of
    # a metadata rename) are subtracted the same way: values still
    # arriving under the old name are discarded, matching the rewrite
    # rename's contract.
    dead = set(table.dropped_columns()) | table.retired_names()
    if dead:
        env = pa.schema([f for f in env if f.name not in dead])
    return env


def read_segments(segment_paths: list[str], envelope: pa.Schema) -> ray.data.Dataset:
    """One Dataset per segment (formats and schemas may differ — dispatch
    by extension like the reference, /root/reference/cmd/xgeo/main.go:25-40),
    normalized to the union envelope, then unioned into a single stream."""
    from xgeo_ray.sources.wal import read_segment

    parts = []
    for p in segment_paths:
        ds = read_segment(p)
        parts.append(
            ds.map_batches(
                NormalizeEvents(envelope), batch_format="pyarrow", zero_copy_batch=True
            )
        )
    out = parts[0]
    if len(parts) > 1:
        out = out.union(*parts[1:])
    return out


def ingest_segments(
    table: DeltaTable,
    segment_paths: list[str],
    epoch: int | None = None,
    batch_size: int = 65536,
    transform=None,
    watermark_exempt: bool = False,
    dlq_dir: str | None = None,
    enforce_constraints: bool = True,
) -> Manifest:
    """Apply one epoch of WAL segments to the table; returns the committed
    manifest. Crash-safe: nothing is visible until the final commit.

    ``watermark_exempt``: out-of-band rows (correction batches with
    seq=-1, the bootstrap convention) are neither filtered by the
    per-partition seq watermark nor allowed to advance it (their
    max_seq is -1), so the live stream's replay protection is
    untouched — see ``apply_changes``.

    ``enforce_constraints=False``: skip declared CHECK rules for this
    epoch — reserved for MECHANICAL rewriters of existing state (the
    rewrite-mode rename re-ingests full images of already-applied
    rows; gating them against a later-declared rule would silently
    lose historic data the prospective contract promised to keep).
    User-authored paths (stream, corrections, update_where) stay
    gated."""
    segment_paths = [os.path.abspath(p) for p in segment_paths]
    if epoch is None:
        epoch = table.latest_epoch() + 1
    envelope = plan_envelope_schema(table, segment_paths)
    wm = (
        np.full(table.num_partitions, -1, dtype=np.int64)
        if watermark_exempt
        else table.watermarks()
    )

    from xgeo_ray.sources.wal import plan_read_chunks

    from xgeo_ray.stages.collapse import MERGE_POLICIES

    stage = NormalizeCollapsePartition(
        envelope,
        table.num_partitions,
        table.num_salts,
        transform=transform,
        # full-history tables keep superseded versions: the pre-shuffle
        # collapse would drop them
        precombine=MERGE_POLICIES[table.merge_policy]["precombinable"]
        and table.history != "full",
        drop=frozenset(
            set(table.dropped_columns()) | table.retired_names()
        ),
        dlq_dir=dlq_dir,
        constraints=(table.constraints() or None)
        if enforce_constraints
        else None,
    )
    chunks = plan_read_chunks(segment_paths)
    entries, invalid = _radix_exchange_apply(
        chunks, stage, table, epoch, envelope, wm
    )
    _check_no_split_parts(entries)
    # entries with path == "" (all rows deduped away) stay in the manifest
    # for lineage/watermarks; partition_files() skips them.
    from xgeo_ray.sources.wal import segment_row_count

    events_read = sum(segment_row_count(p) for p in segment_paths)
    if os.environ.get("XGEO_CRASH_BEFORE_COMMIT"):
        os._exit(137)  # crash-injection hook for exactly-once tests
    extra: dict[str, int] = {"events_read": events_read, "invalid": invalid}
    if not watermark_exempt:
        from xgeo_ray.sources.wal import segment_seq_min

        mins = [segment_seq_min(p) for p in segment_paths]
        if mins and all(m >= 0 for m in mins):
            # the epoch's TRUE stream start, from parquet stats alone —
            # group_snapshot_plan's consistent-cut bound (per-file row
            # minima understate coverage: pre-collapse absorbs rows)
            extra["min_seq"] = min(mins)
    if watermark_exempt:
        # out-of-band batch (correction/backfill/predicate-delete): its
        # rows are stamped with operational wall-clock ts, not stream
        # event time — flagged so ts_watermarks() excludes the epoch
        # (the event-time analogue of the seq-watermark exemption;
        # otherwise one takedown stamped "now" marks every later stream
        # event late and fires bogus watermark triggers)
        extra["oob"] = 1
    return table.commit_epoch(
        epoch,
        segment_paths,
        entries,
        envelope,
        extra_totals=extra,
    )


def run_stream(
    table: DeltaTable,
    segment_paths: list[str],
    segments_per_epoch: int = 4,
    batch_size: int = 65536,
    transform=None,
    bootstrap: str | None = None,
    final_snapshot: bool = False,
    segment_groups: list[list[str]] | None = None,
    dlq_dir: str | None = None,
) -> list[Manifest] | tuple[list[Manifest], ray.data.Dataset]:
    """Process a WAL in epoch-sized gulps, skipping already-committed
    segments — this IS the resume path: call it again after a crash and it
    continues exactly where the last committed manifest left off.

    ``segment_groups`` overrides the count-based grouping with explicit
    epoch boundaries (one inner list = one epoch); committed files are
    still skipped per-file and emptied groups dropped. Callers whose
    segments partition the KEY space rather than the seq space (the
    derived-table sync: one source epoch's delta files have overlapping
    seq ranges) need this — splitting such a set across epochs would let
    the per-partition seq watermark drop rows of the later half.

    Epochs are PIPELINED depth-2: epoch i+1's map tasks (read + normalize
    + pre-collapse + partition split — CPU-bound) launch before epoch i's
    reduces (concat + sort + delta write — object-store/disk-bound) are
    awaited, so the two phases overlap across epochs and the saturated
    resource alternates instead of idling. Exactly-once is unchanged:
    commits stay strictly ordered, epoch i+1's watermarks are computed
    from epoch i's collected entries BEFORE its reduces launch (identical
    to the sequential values), and a crash leaves any in-flight epoch's
    delta files invisible behind the manifest fence.

    ``bootstrap``: optional base-table Parquet loaded as the FIRST epoch
    of the same pipelined run (seq=-1 implicit inserts, watermark-exempt
    like bootstrap_base) — its reduces overlap the first WAL epoch's
    maps instead of serializing before them.

    ``final_snapshot``: also return the post-stream merged table state
    as a Dataset, computed by FUSING the closing snapshot into the last
    epoch's reduces (_radix_reduce_snap): each partition merges its
    prior files with the last delta while it is still in memory,
    overlapping the other partitions' reduces — instead of a separate
    snapshot() pass re-reading every delta after the final commit. The
    merged refs are surfaced only after that commit succeeds. Returns
    ``(manifests, dataset)``."""
    from xgeo_ray.sources.wal import (
        plan_read_chunks,
        segment_row_count,
        segment_schema,
    )
    from xgeo_ray.state.manifest import validate_envelope

    done = table.committed_segments()
    if bootstrap is not None and f"bootstrap:{os.path.abspath(bootstrap)}" in done:
        bootstrap = None  # already committed (resume)
    if segment_groups is not None:
        groups: list[list[str]] = [
            g
            for g in (
                [p for p in (os.path.abspath(s) for s in grp) if p not in done]
                for grp in segment_groups
            )
            if g
        ]
    else:
        pending = [
            p for p in (os.path.abspath(s) for s in segment_paths) if p not in done
        ]
        groups = [
            pending[i : i + segments_per_epoch]
            for i in range(0, len(pending), segments_per_epoch)
        ]
    boot_group = bootstrap is not None
    if boot_group:
        groups.insert(0, [os.path.abspath(bootstrap)])
    if not groups:
        return ([], snapshot(table)) if final_snapshot else []
    if os.environ.get("XGEO_SEQUENTIAL_EPOCHS"):  # A/B escape hatch
        out = []
        if boot_group:
            out.append(bootstrap_base(table, groups[0][0], batch_size=batch_size))
            groups = groups[1:]
        out += [
            ingest_segments(
                table, segs, batch_size=batch_size, transform=transform,
                dlq_dir=dlq_dir,
            )
            for segs in groups
        ]
        return (out, snapshot(table)) if final_snapshot else out
    P = table.num_partitions
    durable = table.durability == "full"
    dropped = frozenset(
        set(table.dropped_columns()) | table.retired_names()
    )
    # cumulative schema-evolution plan, all from metadata (fail fast).
    # Dead names (dropped / renamed-away) are subtracted after every
    # union: a straggler segment still carrying them must neither
    # resurrect the column nor write the retired physical name next to
    # its logical successor in one delta file (ambiguous reads).
    env = table.current_schema()
    envs: list[pa.Schema] = []
    chunk_lists = []
    for gi, segs in enumerate(groups):
        if boot_group and gi == 0:
            env = validate_envelope(unify(env, pq.read_schema(segs[0])))
        else:
            env = validate_envelope(unify(env, *[segment_schema(p) for p in segs]))
        if dropped:
            env = pa.schema([f for f in env if f.name not in dropped])
        envs.append(env)
        chunk_lists.append(plan_read_chunks(segs))
    wm = table.watermarks()
    tswm = table.ts_watermarks()
    epoch_base = table.latest_epoch()
    out: list[Manifest] = []

    from xgeo_ray.stages.collapse import MERGE_POLICIES

    def launch_maps(i: int):
        if boot_group and i == 0:
            prep = _BootstrapPrep(envs[0], P, table.num_salts, drop=dropped)
        else:
            prep = NormalizeCollapsePartition(
                envs[i],
                P,
                table.num_salts,
                transform=transform,
                # full-history tables keep superseded versions: the
                # pre-shuffle collapse would drop them
                precombine=MERGE_POLICIES[table.merge_policy]["precombinable"]
                and table.history != "full",
                drop=dropped,
                dlq_dir=dlq_dir,
                constraints=table.constraints() or None,
            )
        prep_ref = ray.put(prep)
        return [
            _radix_map.options(num_returns=P + 1).remote(path, rgs, prep_ref, P)
            for path, rgs in chunk_lists[i]
        ]

    import time as _time

    no_wm = np.full(P, -1, dtype=np.int64)
    maps_i = launch_maps(0)
    for i, segs in enumerate(groups):
        t_epoch = _time.perf_counter()
        is_boot = boot_group and i == 0
        epoch = epoch_base + 1 + i
        apply_ref = ray.put(
            ApplyPartition(
                table.root,
                epoch,
                envs[i],
                no_wm if is_boot else wm,  # bootstrap rows are wm-exempt
                durable=durable,
                policy=table.merge_policy,
                token=new_commit_token(),
                # bootstrap rows predate the stream: not late by definition
                ts_watermarks=None if is_boot else tswm,
                history=table.history,
                stats_columns=table.stats_columns(),
                codec=table.parquet_codec(),
                # the fused final-snapshot reduce reads PRIOR files —
                # pre-rename files surface under logical names there
                aliases=table.column_aliases(),
            )
        )
        snap_refs = None
        if final_snapshot and i == len(groups) - 1:
            # at this point every earlier epoch is committed, so the
            # table's visible file set IS the prior state to merge with
            prior_plan = table.partition_files()
            pairs = [
                _radix_reduce_snap.remote(
                    part,
                    apply_ref,
                    prior_plan.get(part, []),
                    *[m[part] for m in maps_i],
                )
                for part in range(P)
            ]
            reduces = [p[0] for p in pairs]
            snap_refs = [p[1] for p in pairs]
        else:
            reduces = [
                _radix_reduce.remote(part, apply_ref, *[m[part] for m in maps_i])
                for part in range(P)
            ]
        invalid_refs = [m[P] for m in maps_i]
        # the overlap: next epoch's maps start while this epoch reduces
        maps_i = launch_maps(i + 1) if i + 1 < len(groups) else None
        entries: list[PartitionEntry] = []
        for t in ray.get(reduces):
            if t is None:
                continue
            for row in t.to_pylist():
                entries.append(
                    PartitionEntry(
                        **{k: (v if k in ("path", "bloom", "stats") else int(v)) for k, v in row.items()}
                    )
                )
        _check_no_split_parts(entries)
        if os.environ.get("XGEO_CRASH_BEFORE_COMMIT"):
            os._exit(137)  # crash-injection hook for exactly-once tests
        if is_boot:
            out.append(
                table.commit_epoch(
                    epoch, [f"bootstrap:{segs[0]}"], entries, envs[i]
                )
            )
            continue  # bootstrap max_seq is -1: watermarks unchanged
        events_read = sum(segment_row_count(p) for p in segs)
        from xgeo_ray.sources.wal import segment_seq_min

        seg_mins = [segment_seq_min(p) for p in segs]
        extra_rs: dict[str, int] = {}
        if seg_mins and all(m >= 0 for m in seg_mins):
            extra_rs["min_seq"] = min(seg_mins)
        out.append(
            table.commit_epoch(
                epoch,
                segs,
                entries,
                envs[i],
                extra_totals={
                    **extra_rs,
                    "events_read": events_read,
                    "invalid": sum(ray.get(invalid_refs)),
                    # streaming ops metrics: barrier cost of this epoch
                    # (reduce wait + commit) and the commit wall clock
                    "epoch_wall_ms": int((_time.perf_counter() - t_epoch) * 1000),
                    "commit_unix_us": int(_time.time() * 1_000_000),
                },
            )
        )
        if not out[-1].totals.get("oob"):
            # oob epochs (all max_seq < 0, flagged by commit_epoch) carry
            # operational wall-clock ts: advancing the in-memory tswm from
            # one would inflate totals["late"] for every later stream
            # epoch in this same call (ts_watermarks() would recompute
            # correctly next call, but the lineage metric is the signal
            # operators size allowed_lateness_us against).
            for e in entries:  # epoch i+1 sees exactly the sequential watermarks
                wm[e.part_key] = max(wm[e.part_key], e.max_seq)
                tswm[e.part_key] = max(tswm[e.part_key], e.max_ts)
    if final_snapshot:
        # commit fence passed — the fused merged state is now authoritative
        return out, ray.data.from_arrow_refs(snap_refs)
    return out


def bootstrap_base(
    table: DeltaTable, base_parquet: str, batch_size: int = 65536
) -> Manifest:
    """Load an existing base table as epoch-1 implicit inserts (seq=-1,
    which sorts under every real WAL event for the same key and ts).

    Bootstrap rows are exempt from the live seq watermarks: they carry
    seq=-1, so filtering them against a partition whose watermark is
    already >= 0 (a table with committed WAL epochs) would silently drop
    every base row in that partition while keeping them elsewhere —
    partition-dependent data loss. LWW by (ts, seq) already guarantees
    base rows lose to any real event for the same key, so an all -1
    watermark array is both safe and correct here."""

    envelope = unify(table.current_schema(), pq.read_schema(base_parquet))
    # a dropped column in the base parquet stays dropped; a retired
    # (renamed-away) name is discarded the same way
    dead = set(table.dropped_columns()) | table.retired_names()
    if dead:
        envelope = pa.schema([f for f in envelope if f.name not in dead])
    epoch = table.latest_epoch() + 1
    from xgeo_ray.sources.wal import plan_read_chunks

    prep = _BootstrapPrep(
        envelope,
        table.num_partitions,
        table.num_salts,
        drop=frozenset(
            set(table.dropped_columns()) | table.retired_names()
        ),
    )
    chunks = plan_read_chunks([os.path.abspath(base_parquet)])
    no_wm = np.full(table.num_partitions, -1, dtype=np.int64)
    entries, _ = _radix_exchange_apply(
        chunks, prep, table, epoch, envelope, no_wm
    )
    _check_no_split_parts(entries)
    return table.commit_epoch(
        epoch, [f"bootstrap:{os.path.abspath(base_parquet)}"], entries, envelope
    )


class _BootstrapPrep:
    """Prep for base-table loads: mark every row an implicit insert with
    seq=-1 (sorts under every real WAL event for the same key and ts),
    cast to the envelope, add the salted partition key."""

    def __init__(
        self,
        envelope: pa.Schema,
        num_partitions: int,
        num_salts: int,
        drop: frozenset = frozenset(),
    ):
        self.envelope = envelope
        self.p = num_partitions
        self.s = num_salts
        self.drop = drop

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.drop:
            batch = batch.drop_columns(
                [c for c in batch.column_names if c in self.drop]
            )
        n = batch.num_rows
        batch = batch.append_column("op", pa.array(["I"] * n))
        batch = batch.append_column("seq", pa.array(np.full(n, -1, np.int64)))
        return add_part_key(cast_to(batch, self.envelope), self.p, self.s)


class _MergePartitions:
    """Merge-on-read of one or more partitions (map_batches over a tiny
    dataset of partition descriptors — one task per partition, no shuffle)."""

    def __init__(self, envelope: pa.Schema, keep_lineage: bool, policy: str = "lww"):
        from xgeo_ray.stages.collapse import MERGE_POLICIES

        self.envelope = envelope
        self.keep = keep_lineage
        self.policy = MERGE_POLICIES[policy]["fn"] if isinstance(policy, str) else policy

    def __call__(self, batch: pa.Table) -> pa.Table:
        from xgeo_ray.tuning import limit_worker_threads

        limit_worker_threads()
        out = []
        for row in batch.to_pylist():
            tables = [
                pq.read_table(
                    p,
                    columns=[
                        c
                        for c in self.envelope.names
                        if c in pq.read_schema(p).names
                    ],
                )
                for p in row["paths"]
            ]
            t = merge_versions(tables, drop_tombstones=True, policy=self.policy)
            if t.num_rows == 0:
                continue
            t = cast_to(t, self.envelope)
            if not self.keep:
                t = t.drop_columns(LINEAGE_COLS)
            out.append(t)
        if not out:
            sch = self.envelope if self.keep else pa.schema(
                [f for f in self.envelope if f.name not in LINEAGE_COLS]
            )
            return sch.empty_table()
        return pa.concat_tables(out)


_MERGE_COLS = ["conv_id", "turn_idx", "ts", "seq", "op"]  # LWW needs these


@ray.remote
def _merge_part_task(
    paths: list[str],
    envelope: pa.Schema,
    keep_lineage: bool,
    policy: str = "lww",
    columns: list[str] | None = None,
    as_of_ts_us: int | None = None,
    ranges: dict[str, tuple] | None = None,
    aliases: dict[str, str] | None = None,
) -> pa.Table:
    from xgeo_ray.schemas import aliased_read_columns, apply_aliases
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    # always project to the requested columns (or the envelope): a file
    # written before a column was dropped still holds its bytes, and
    # they must neither be read nor surface past the narrowed envelope
    read_cols = list(envelope.names)
    if columns is not None:
        read_cols = list(
            dict.fromkeys(
                _MERGE_COLS + list(columns) + list(ranges or {})
            )
        )
    tables = []
    for p in paths:
        have = aliased_read_columns(
            pq.read_schema(p).names, read_cols, aliases
        )
        t = apply_aliases(
            pq.read_table(p, columns=have, use_threads=False), aliases
        )
        if as_of_ts_us is not None:
            # event-time travel: merge as if no event with ts > T ever
            # arrived (filter BEFORE the LWW merge, per file)
            t = t.filter(
                pc.less_equal(
                    t.column("ts").cast(pa.int64()),
                    pa.scalar(as_of_ts_us, pa.int64()),
                )
            )
        tables.append(t)
    if read_cols is not None:
        envelope = pa.schema([f for f in envelope if f.name in read_cols])
    t = cast_to(
        merge_versions(tables, drop_tombstones=True, policy=policy), envelope
    )
    if ranges:
        # band post-filter on the MERGED rows (the partition prune is a
        # superset guarantee; this makes the result exact)
        for col, (lo, hi) in ranges.items():
            c = t.column(col)
            if pa.types.is_timestamp(c.type):
                c = c.cast(pa.int64())
            mask = pc.is_valid(c)
            if lo is not None:
                mask = pc.and_(mask, pc.greater_equal(c, pa.scalar(lo, c.type)))
            if hi is not None:
                mask = pc.and_(mask, pc.less_equal(c, pa.scalar(hi, c.type)))
            t = t.filter(mask)
    if not keep_lineage:
        t = t.drop_columns([c for c in LINEAGE_COLS if c in t.column_names])
    if columns is not None:
        t = t.select([c for c in columns if c in t.column_names])
    return t


def snapshot(
    table: DeltaTable,
    keep_lineage: bool = False,
    columns: list[str] | None = None,
    as_of_epoch: int | None = None,
    as_of_ts_us: int | None = None,
    partitions: list[int] | None = None,
    ranges: dict[str, tuple] | None = None,
) -> ray.data.Dataset:
    """Merge-on-read view of the committed table state: one raw-Ray merge
    task per partition (launched immediately), surfaced as a Dataset via
    from_arrow_refs — rows are partition-local sorted by
    (conv_id, turn_idx); no shuffle anywhere. The raw tasks sidestep the
    same executor latency the radix exchange avoids.

    ``columns`` prunes at the PARQUET READ: merge tasks load only the
    primary-key/order/op columns plus the requested ones, so a narrow
    projection of a wide table never pulls the wide payload off disk —
    the scan-side discipline required at 100 TB.

    ``as_of_epoch`` time-travels: the state as of that committed epoch,
    under that epoch's envelope schema (manifests are the version
    history; delta files are immutable until vacuum() reclaims them, so
    the vacuum cadence IS the time-travel retention window).

    ``as_of_ts_us`` is EVENT-time travel: the latest version of each
    key at-or-before T (rows are filtered before the LWW merge; a key
    whose versions are all later than T is absent). On the default
    ``history="collapsed"`` table this is EPOCH-granular — delta files
    hold each epoch's per-key winner, so a version superseded within
    its own commit epoch was never part of any committed state (the
    same contract as any lakehouse store's version history). On a
    ``history="full"`` table it is EXACT to the event: deltas retain
    every distinct (key, seq) version. Against a COMPACTED partition whose folded winners
    postdate T even the per-epoch history is gone, so the call fails
    fast — pass ``as_of_epoch`` pointing before that compaction
    (deltas readable until vacuum) or retain deltas longer. Composable
    with ``as_of_epoch``/``columns``.

    ``partitions`` restricts the read to those hash partitions (the
    caller's prune hook — expire() passes its zone-map survivor set).

    ``ranges`` is a band query over declared zone-map columns
    (``{col: (lo, hi)}``, inclusive, ``None`` = unbounded): partitions
    provably disjoint from every band are never read
    (``DeltaTable.partitions_in_range``), and the merged rows of the
    surviving partitions are post-filtered to the bands — on a table
    whose stats column correlates with the partition layout (e.g. after
    a ts-ordered history or a reshard by that key) the scan cost tracks
    the matching fraction, not the table size. Requires
    ``stats_columns`` declared before the files were written; undeclared
    history degrades to a filtered full scan (correct, unpruned).
    Timestamp bands are int64 µs. Latest-epoch reads only (zone maps
    describe the CURRENT visible set)."""
    envelope = table.current_schema(as_of_epoch)
    if ranges:
        if as_of_epoch is not None or as_of_ts_us is not None:
            raise ValueError(
                "ranges= composes with the current visible set only — "
                "time-travel reads must filter client-side"
            )
        keep: set[int] | None = None
        for col, (lo, hi) in ranges.items():
            ps = set(table.partitions_in_range(col, lo, hi))
            keep = ps if keep is None else keep & ps
        partitions = (
            sorted(keep)
            if partitions is None
            else sorted(keep & set(partitions))
        )
    if as_of_ts_us is None:
        plan = table.partition_files(as_of_epoch)
    else:
        # zone-map prune: manifest [min_ts] drops files entirely newer
        # than T before any read task — travel further back, read less
        plan = table.partition_files_ts_pruned(as_of_epoch, as_of_ts_us)
        ms = [
            m
            for m in table.effective_manifests(as_of_epoch)
            # minor folds collapse history too — EXCEPT on full-history
            # tables, where they are version-preserving by construction
            # (rolled-back compactions no longer guard anything: restore
            # put the pre-compaction deltas back in the visible set).
            # totals["folds_history"] marks non-compact manifests that
            # still erased history (a reshard's fold on a collapsed
            # table) — same guard applies.
            if (
                m.kind.startswith("compact")
                and not (m.kind == "compact_minor" and table.history == "full")
            )
            or m.totals.get("folds_history")
        ]
        # EVERY compaction at or before the travel point folded history;
        # checking only the last one would let an earlier fold's horizon
        # be crossed silently when a later (e.g. tombstone-horizon)
        # compaction happens to carry a lower max_ts.
        for m in ms:
            over = max((e.max_ts for e in m.partitions.values()), default=-1)
            if over < 0:
                over = m.totals.get("folded_max_ts", -1)
            if over > as_of_ts_us:
                raise ValueError(
                    f"event-time travel to ts={as_of_ts_us} crosses compaction "
                    f"epoch {m.epoch} (folded winners up to ts={over}): "
                    "superseded pre-T versions are gone. Pass as_of_epoch "
                    "before that compaction (deltas remain readable until "
                    "vacuum) or compact less aggressively."
                )
    if partitions is not None:
        keep_parts = set(partitions)
        plan = {k: v for k, v in plan.items() if k in keep_parts}
    if not plan:
        fields = [
            f
            for f in envelope
            if (keep_lineage or f.name not in LINEAGE_COLS)
            and (columns is None or f.name in columns)
        ]
        return ray.data.from_arrow(pa.schema(fields).empty_table())
    from xgeo_ray.stages.collapse import MERGE_POLICIES

    policy_fn = MERGE_POLICIES[table.merge_policy]["fn"]
    aliases = table.column_aliases(as_of_epoch)
    refs = [
        _merge_part_task.remote(
            paths, envelope, keep_lineage, policy_fn, columns, as_of_ts_us,
            ranges, aliases,
        )
        for _, paths in sorted(plan.items())
    ]
    return ray.data.from_arrow_refs(refs)


@ray.remote
def _read_delta_task(
    path: str,
    envelope: pa.Schema,
    epoch: int,
    ts_min_us: int | None = None,
    ts_max_us: int | None = None,
    columns: list[str] | None = None,
    aliases: dict[str, str] | None = None,
) -> pa.Table:
    from xgeo_ray.schemas import aliased_read_columns, apply_aliases
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    if columns is not None:
        # projection pushed to the PARQUET READ (+ ts when band-filtering)
        need = list(dict.fromkeys(list(columns) + (["ts"] if ts_min_us is not None or ts_max_us is not None else [])))
        have = aliased_read_columns(pq.read_schema(path).names, need, aliases)
        t = pq.read_table(path, columns=have, use_threads=False)
        envelope = pa.schema([f for f in envelope if f.name in need])
    else:
        t = pq.read_table(
            path,
            columns=aliased_read_columns(
                pq.read_schema(path).names, list(envelope.names), aliases
            ),
            use_threads=False,
        )
    t = cast_to(apply_aliases(t, aliases), envelope)
    if ts_min_us is not None or ts_max_us is not None:
        ts = t.column("ts").cast(pa.int64())
        mask = None
        if ts_min_us is not None:
            mask = pc.greater_equal(ts, pa.scalar(ts_min_us, pa.int64()))
        if ts_max_us is not None:
            hi = pc.less_equal(ts, pa.scalar(ts_max_us, pa.int64()))
            mask = hi if mask is None else pc.and_(mask, hi)
        t = t.filter(mask)
    if columns is not None:
        t = t.select([c for c in columns if c in t.column_names])
    return t.append_column(
        "_epoch", pa.array(np.full(t.num_rows, epoch, dtype=np.int64))
    )


def _changes_plan(
    table: DeltaTable,
    since_epoch: int,
    upto_epoch: int | None,
    ts_min_us: int | None,
    ts_max_us: int | None,
) -> list[tuple[str, int]]:
    """(path, epoch) read plan for ``changes``: committed delta files in
    the epoch range, minus files whose manifest zone map ([min_ts,
    max_ts] per entry) falls entirely outside the requested ts band.
    Pure metadata — separable so pruning is testable without reads."""
    plan: list[tuple[str, int]] = []
    band = ts_min_us is not None or ts_max_us is not None
    for m in table.effective_manifests():
        if m.kind != "delta" or m.epoch <= since_epoch:
            continue
        if upto_epoch is not None and m.epoch > upto_epoch:
            break
        for _, e in sorted(m.partitions.items(), key=lambda kv: int(kv[0])):
            if not e.path:
                continue
            if band and e.min_ts >= 0:
                if (ts_max_us is not None and e.min_ts > ts_max_us) or (
                    ts_min_us is not None and e.max_ts < ts_min_us
                ):
                    continue  # zone map: file entirely outside the band
            plan.append((os.path.join(table.root, e.path), m.epoch))
    return plan


def changes(
    table: DeltaTable,
    since_epoch: int = 0,
    upto_epoch: int | None = None,
    ts_min_us: int | None = None,
    ts_max_us: int | None = None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """CDC-out feed: every applied change row committed in delta epochs
    ``(since_epoch, upto_epoch]``, as a Dataset with the envelope
    columns (op/seq/ts included — each row IS a change event) plus an
    ``_epoch`` int64 column, one block per committed delta file. A
    downstream consumer subscribes by remembering the last ``_epoch`` it
    processed and polling ``changes(table, since_epoch=last)`` — epochs
    are the feed's exactly-once cursor, the same fence that makes ingest
    idempotent. Rows within an epoch are partition-collapsed (one row
    per key per epoch, the post-LWW version) — consumers see the same
    per-epoch deltas the table itself applied.

    Compaction manifests are skipped (they rewrite state, not history);
    bootstrap epochs surface as their implicit inserts (seq=-1), so a
    consumer of only live changes starts from the bootstrap epoch.
    Retention: delta files live until ``vacuum()`` reclaims those a
    compaction superseded — size the vacuum cadence to the slowest
    consumer's lag.

    ``ts_min_us``/``ts_max_us`` band-limit the feed by EVENT time: whole
    delta files are pruned from the manifest zone maps (each entry's
    [min_ts, max_ts]) before any read task launches — a feed consumer
    interested in one hour of a year-long table opens only that hour's
    files — and surviving files row-filter to the band. Entries from
    pre-zone-map manifests (min_ts == -1) are conservatively read.
    ``columns`` pushes the projection to the parquet read — a narrow
    consumer never pulls the text payload off disk."""
    envelope = table.current_schema(upto_epoch)
    aliases = table.column_aliases(upto_epoch)
    band = ts_min_us is not None or ts_max_us is not None
    refs = [
        _read_delta_task.remote(
            path,
            envelope,
            epoch,
            ts_min_us if band else None,
            ts_max_us if band else None,
            columns,
            aliases,
        )
        for path, epoch in _changes_plan(
            table, since_epoch, upto_epoch, ts_min_us, ts_max_us
        )
    ]
    if not refs:
        fields = [
            f for f in envelope if columns is None or f.name in columns
        ]
        empty = pa.schema(fields).empty_table().append_column(
            "_epoch", pa.array([], pa.int64())
        )
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow_refs(refs)


def sync_derived(
    source: DeltaTable,
    sink: DeltaTable,
    transform=None,
    upto_epoch: int | None = None,
    epochs_per_sync: int = 1,
    final_snapshot: bool = False,
) -> list[Manifest] | tuple[list[Manifest], ray.data.Dataset]:
    """Maintain a derived table EXACTLY-ONCE from a source table's
    committed change feed — the materialized form of ``changes()``: each
    committed source delta epoch's files are re-ingested into the sink
    through the normal epoch machinery (optionally through a
    ``transform`` stage / StageChain, applied to every change row before
    it lands), so the sink inherits the same fence / manifest / resume
    guarantees as any WAL ingest. The sink's committed-segments set is
    the consumer cursor: a crashed or repeated sync skips everything
    already applied — call it on a schedule and the sink follows the
    source, transformed, with no duplicates. Chains compose (a sink can
    itself be a source), and the sink may use different partitioning.

    Source epochs are never split across sink epochs: one source
    epoch's delta files partition the KEY space (their seq ranges
    overlap), so splitting would let the sink's per-partition seq
    watermark drop rows of the later half (``run_stream``'s
    ``segment_groups`` preserves the boundaries). Grouping whole epochs
    ``epochs_per_sync`` at a time is safe — collapse across grouped
    epochs is associative for every merge policy. Source bootstrap
    epochs flow through as their implicit inserts (seq=-1; a fresh
    sink's watermark is -1, and the ``wm >= 0`` guard means they are
    never dropped as replays).

    Retention contract: sync before ``vacuum()`` reclaims a superseded
    source delta — the same rule as any ``changes()`` consumer. A
    source COMPACTION is state-rewrite, not history, and is skipped.

    Source RESTORE guard: if the source was rolled back past epochs
    this sink already applied, the sink holds changes the source no
    longer has — continuing would silently diverge (replayed source
    rows reuse the same seqs, so the sink's watermark would drop the
    replacements while keeping the rolled-back values). Detected from
    the sink's committed-segments cursor (source delta files it applied
    that are no longer in the source's effective history) and raised;
    restore/rebuild the sink first."""
    src_delta_files = {
        os.path.abspath(os.path.join(source.root, e.path))
        for m in source.effective_manifests()
        if m.kind == "delta"
        for e in m.partitions.values()
        if e.path
    }
    src_prefix = os.path.abspath(source.root) + os.sep
    # match ONLY the source's delta-file layout (parts/part=N/epoch=…):
    # a sink nested under source.root commits its own segments (its
    # backfill batches, WAL dirs) with the same prefix, and flagging
    # those would brick sync with a phantom restore
    from xgeo_ray.state.delta_table import DELTA_RELPATH_RE

    stale = sorted(
        s
        for s in sink.committed_segments()
        if s.startswith(src_prefix)
        and DELTA_RELPATH_RE.match(os.path.relpath(s, source.root))
        and s not in src_delta_files
    )
    if stale:
        raise ValueError(
            f"sink applied {len(stale)} source delta file(s) that a "
            "source RESTORE has since rolled back (first: "
            f"{os.path.relpath(stale[0], source.root)}): the sink holds "
            "changes the source no longer has. Restore the sink to its "
            "epoch preceding those syncs (or rebuild it) before "
            "continuing."
        )
    groups: list[list[str]] = []
    cur: list[str] = []
    n_in_cur = 0
    for m in source.effective_manifests():
        if m.kind != "delta":
            continue
        if upto_epoch is not None and m.epoch > upto_epoch:
            break
        files = [
            os.path.join(source.root, e.path)
            for _, e in sorted(m.partitions.items(), key=lambda kv: int(kv[0]))
            if e.path
        ]
        if not files:
            continue
        if m.totals.get("oob"):
            # out-of-band source epochs (corrections/deletes, wall-clock
            # ts) sync as their OWN sink epoch: grouped with a stream
            # epoch, the sink manifest would carry a real max_seq AND
            # the correction's operational max_ts — poisoning the
            # sink's event-time watermark. Isolated, the sink epoch is
            # all-seq=-1 and commit_epoch re-stamps its oob flag
            # structurally — so the flag DOES travel through chained
            # sinks (a correction epoch synced into sink B is all-
            # negative, hence re-flagged when B commits it).
            if cur:
                groups.append(cur)
                cur, n_in_cur = [], 0
            groups.append(files)
            continue
        cur.extend(files)
        n_in_cur += 1
        if n_in_cur >= epochs_per_sync:
            groups.append(cur)
            cur, n_in_cur = [], 0
    if cur:
        groups.append(cur)
    return run_stream(
        sink,
        [],
        transform=transform,
        final_snapshot=final_snapshot,
        segment_groups=groups,
    )


def _reject_oob_on_coalesce(table: DeltaTable, op_name: str) -> None:
    """Out-of-band batches mint seq=-1, which sorts EARLIEST under the
    coalesce policy's strict-seq order — the batch would be silently
    inert (deletes retain data: a GDPR failure mode). Fail fast."""
    if table.merge_policy == "coalesce":
        raise ValueError(
            f"{op_name} is not supported on merge_policy='coalesce' "
            "tables: out-of-band batches mint seq=-1, which sorts "
            "earliest under coalesce's WAL-seq order and is overridden "
            "by every streamed row (deletes would silently retain "
            "data). Send the change through the WAL with a real seq."
        )


def apply_changes(
    table: DeltaTable,
    rows: pa.Table,
    batch_id: str,
    default_op: str = "U",
    ts_us: int | None = None,
    transform=None,
    dlq_dir: str | None = None,
) -> Manifest | None:
    """Programmatic upsert/delete batch — backfills and corrections
    without a WAL producer. ``rows`` carries envelope columns: conv_id
    and turn_idx are required and must be UNIQUE within the batch; op
    defaults to ``default_op`` ('D' rows need only the keys — the rest
    null-fill); ts defaults to ``ts_us`` or now. The batch lands as WAL
    segment ``backfill/<batch_id>.parquet`` through the normal epoch
    machinery, and ``batch_id`` is the producer-side exactly-once key:
    an id already committed is a no-op (returns None) — retry after any
    crash with the same id.

    Corrections are OUT-OF-BAND rows: they take seq=-1 (the bootstrap
    convention) and apply watermark-exempt WITHOUT advancing the seq
    watermarks — minting seqs above the stream's high watermark would
    make the table silently drop every later genuine WAL event as a
    replay. They win against stream rows by LWW ts (ties break toward
    the stream: seq -1 sorts below any real seq), so a correction
    stamped now supersedes everything seen so far, and a later stream
    update with a later ts supersedes the correction — exactly upsert
    semantics.

    Bounded by driver memory (takes a pa.Table): lake-scale backfills
    should write real WAL segments and run ``ingest_segments``; this is
    the correction-batch path.

    NOT available on ``merge_policy="coalesce"`` tables: coalesce
    orders strictly by WAL seq (what makes its per-epoch collapse
    associative), so this path's out-of-band seq=-1 rows would sort
    EARLIEST and be overridden by every streamed row — a correction
    that silently does nothing, and a tombstone that silently
    un-deletes nothing while re-exposing pre-delete patches. Fails
    fast instead; issue coalesce corrections/deletes through the WAL
    with real seqs."""
    _reject_oob_on_coalesce(table, "apply_changes")
    import re as _re
    import time as _time

    if not _re.fullmatch(r"[A-Za-z0-9_.-]+", batch_id):
        raise ValueError(f"batch_id {batch_id!r} must be filesystem-safe")
    path = os.path.abspath(
        os.path.join(table.root, "backfill", f"{batch_id}.parquet")
    )
    if path in table.committed_segments():
        return None
    for k in ("conv_id", "turn_idx"):
        if k not in rows.column_names:
            raise ValueError(f"apply_changes rows need a {k!r} column")
    if "seq" in rows.column_names:
        raise ValueError(
            "apply_changes mints seq itself (out-of-band -1); a caller "
            "that owns the seq space should write a WAL segment and use "
            "ingest_segments"
        )
    n_keys = rows.group_by(["conv_id", "turn_idx"]).aggregate(
        [("conv_id", "count")]
    ).num_rows
    if n_keys != rows.num_rows:
        raise ValueError(
            "apply_changes batch has duplicate (conv_id, turn_idx) keys: "
            "out-of-band rows share seq=-1, so in-batch order could not "
            "break the tie — collapse the batch to one row per key first"
        )
    n = rows.num_rows
    if "op" not in rows.column_names:
        rows = rows.append_column(
            "op", pa.array(np.full(n, default_op, dtype="U1"), pa.string())
        )
    if "ts" not in rows.column_names:
        now = int(_time.time() * 1_000_000) if ts_us is None else ts_us
        rows = rows.append_column(
            "ts",
            pa.array(np.full(n, now, dtype=np.int64), pa.timestamp("us")),
        )
    rows = rows.append_column(
        "seq", pa.array(np.full(n, -1, dtype=np.int64), pa.int64())
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(rows, tmp)
    from xgeo_ray.state.storage import DEFAULT_STORAGE

    DEFAULT_STORAGE.publish_file(tmp, path, durable=table.durability == "full")
    # corrections ARE gated by declared CHECK rules (user-authored
    # state); without a dlq_dir a violating row is only counted —
    # pass one so gated corrections stay recoverable via requeue_dlq
    return ingest_segments(
        table,
        [path],
        transform=transform,
        watermark_exempt=True,
        dlq_dir=dlq_dir,
    )


def delete_where(
    table: DeltaTable,
    predicate,
    batch_id: str,
    columns: list[str] | None = None,
    ts_us: int | None = None,
    partitions: list[int] | None = None,
    ranges: dict[str, tuple] | None = None,
) -> Manifest | None:
    """Predicate delete — the takedown/right-to-be-forgotten primitive:
    tombstone every key whose CURRENT merged row satisfies ``predicate``
    (a callable ``pa.Table -> boolean array``, evaluated per snapshot
    batch inside workers). The scan is pruned to keys + the columns the
    predicate reads, declared either via the ``columns`` argument or a
    ``predicate.columns`` attribute (a predicate that knows its own
    projection); with neither, every column is read (correct, just
    unpruned) and a warning logs the unpruned scan — always declare on
    a wide table. Fully distributed: the snapshot
    merge tasks stream, each batch filters to matching keys only (the
    payload never returns to the driver), and the resulting tombstone
    rows land as out-of-band WAL segments (op='D', seq=-1, ts =
    ``ts_us`` or now) through the normal epoch machinery — so the
    delete wins against all current versions by LWW ts, a later stream
    update with a later ts can re-insert the key (upsert semantics),
    and crash-resume is exactly-once: ``batch_id`` is the producer
    key, an id already committed is a no-op (returns None).

    Physical erasure is the existing two-step: a later full
    ``compact(tombstone_ts_horizon=...)`` drops the tombstoned versions
    from the visible files and ``vacuum()`` reclaims the old bytes —
    the same retention pipeline every lakehouse uses for GDPR deletes.

    Crash windows: a death before any publish recomputes from scratch;
    after some publishes, the retry publishes a fresh attempt-token set
    and commits only its own files (orphaned earlier-attempt files are
    never referenced or read). Two RACING drivers on one batch_id can
    both commit — benign (tombstoning a key twice is idempotent on
    state); serialize writers with state/lease.py where that matters.

    ``partitions`` restricts the scan to those hash partitions — the
    caller's prune hook when metadata already proves the rest can't
    match (expire() passes its zone-map survivor set). Correctness is
    the caller's burden: a key in an excluded partition is never
    examined. ``ranges`` (``{col: (lo, hi)}``) derives that prune from
    the declared column zone maps (``DeltaTable.partitions_in_range``)
    — the caller asserts the predicate can only match inside the bands
    (e.g. ``predicate`` tests ``amount > 1000`` and ``ranges={"amount":
    (1000, None)}``); the predicate itself still decides each row.

    No counterpart in the reference (stateless CLI,
    /root/reference/cmd/xgeo/main.go); required lake machinery for the
    north rule's upsert engine. Not available on coalesce tables (the
    seq=-1 tombstones would sort earliest and silently retain data —
    see ``_reject_oob_on_coalesce``)."""
    _reject_oob_on_coalesce(table, "delete_where")
    if ranges:
        keep: set[int] | None = None
        for col, (lo, hi) in ranges.items():
            ps = set(table.partitions_in_range(col, lo, hi))
            keep = ps if keep is None else keep & ps
        partitions = (
            sorted(keep)
            if partitions is None
            else sorted(keep & set(partitions))
        )
    import re as _re
    import time as _time

    from xgeo_ray.state.delta_table import new_commit_token
    from xgeo_ray.state.storage import DEFAULT_STORAGE

    if not _re.fullmatch(r"[A-Za-z0-9_.-]+", batch_id):
        raise ValueError(f"batch_id {batch_id!r} must be filesystem-safe")
    final_dir = os.path.abspath(
        os.path.join(table.root, "backfill", f"{batch_id}.d")
    )
    prefix = final_dir + os.sep
    if any(s.startswith(prefix) for s in table.committed_segments()):
        return None
    now = int(_time.time() * 1_000_000) if ts_us is None else int(ts_us)
    declared = columns if columns is not None else getattr(predicate, "columns", None)
    if declared is None:
        import warnings as _warnings

        _warnings.warn(
            "delete_where without a declared predicate projection scans "
            "EVERY column of the table — pass columns=[...] or set "
            "predicate.columns to prune the read",
            stacklevel=2,
        )
    need = (
        None  # unpruned scan: the predicate may read any column
        if declared is None
        else list(dict.fromkeys(["conv_id", "turn_idx"] + list(declared)))
    )
    key_schema = pa.schema(
        [f for f in table.current_schema() if f.name in ("conv_id", "turn_idx")]
    )

    def _to_tombstones(batch: pa.Table) -> pa.Table:
        mask = predicate(batch)
        keys = batch.filter(mask).select(["conv_id", "turn_idx"])
        n = keys.num_rows
        return (
            keys.append_column(
                "op", pa.array(np.full(n, "D", dtype="U1"), pa.string())
            )
            .append_column(
                "ts",
                pa.array(np.full(n, now, dtype=np.int64), pa.timestamp("us")),
            )
            .append_column(
                "seq", pa.array(np.full(n, -1, dtype=np.int64), pa.int64())
            )
        )

    stage = final_dir + f".stage-{os.getpid()}"
    import shutil as _shutil

    _shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage, exist_ok=True)
    snapshot(table, columns=need, partitions=partitions).map_batches(
        _to_tombstones, batch_format="pyarrow", zero_copy_batch=True
    ).write_parquet(stage)
    staged = sorted(
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    )
    if not staged:  # nothing matched: still commit an exactly-once marker
        empty = (
            key_schema.empty_table()
            .append_column("op", pa.array([], pa.string()))
            .append_column("ts", pa.array([], pa.timestamp("us")))
            .append_column("seq", pa.array([], pa.int64()))
        )
        p = os.path.join(stage, "empty.parquet")
        pq.write_table(empty, p)
        staged = [p]
    token = new_commit_token()
    durable = table.durability == "full"
    os.makedirs(final_dir, exist_ok=True)
    segs = []
    for i, src in enumerate(staged):
        dst = os.path.join(final_dir, f"part-{token}-{i:05d}.parquet")
        DEFAULT_STORAGE.publish_file(src, dst, durable=durable)
        segs.append(dst)
    _shutil.rmtree(stage, ignore_errors=True)
    return ingest_segments(table, segs, watermark_exempt=True)


def update_where(
    table: DeltaTable,
    predicate,
    set_values,
    batch_id: str,
    ts_us: int | None = None,
    partitions: list[int] | None = None,
    dlq_dir: str | None = None,
) -> Manifest | None:
    """Predicate UPDATE — the in-place-correction primitive beside
    ``delete_where`` (rows) and ``drop_columns`` (columns): rewrite the
    payload of every key whose CURRENT merged row satisfies
    ``predicate`` (a callable ``pa.Table -> boolean array``). The new
    values come from ``set_values``, either a dict ``{col: scalar}``
    (``None`` allowed — nulls the column) or a callable
    ``pa.Table -> {col: pa.Array}`` computed vectorized from the
    matched rows (e.g. redaction: ``lambda t: {"text":
    pc.replace_substring_regex(t.column("text"), ...)}``). Key columns
    (conv_id/turn_idx) and the envelope columns (ts/op/seq) are
    refused — re-keying is a delete+insert, and the new version's ts
    is stamped by this call.

    Fully distributed and LWW-native: the snapshot merge tasks stream,
    each batch filters to matches, swaps the target columns, and the
    FULL updated row images land as out-of-band WAL segments (op='U',
    seq=-1, ts = ``ts_us`` or now) through the normal epoch machinery.
    The update therefore wins against all current versions by LWW ts,
    and a later stream event with a later ts supersedes it — the same
    upsert semantics as ``delete_where``. Exactly-once by ``batch_id``
    (an id already committed is a no-op, returns None); crash-resume
    recomputes and publishes a fresh attempt-token set.

    The scan reads EVERY payload column by design: LWW replacement
    needs the full image (untouched columns must ride along or the new
    version would null them). Partial column patches are the
    ``merge_policy="coalesce"`` domain — and coalesce tables are
    refused here anyway (out-of-band seq=-1 sorts earliest under
    coalesce's WAL-seq order, see ``_reject_oob_on_coalesce``).
    ``additive`` tables are refused too: an oob 'U' image ADDS to the
    accumulated sum instead of replacing it — issue additive
    corrections through ``apply_changes`` deltas. ``partitions`` is
    the caller's prune hook, same contract as ``delete_where``.

    RACING drivers on one batch_id: both can commit. For scalar
    ``set_values`` that is idempotent on state; for a COMPUTED set the
    second attempt may re-read state that already includes the first
    attempt's updates (double-apply) — serialize computed updates with
    ``state/lease.py``.

    No reference counterpart (stateless CLI,
    /root/reference/cmd/xgeo/main.go); this is the lakehouse UPDATE
    surface (Delta/Iceberg ``UPDATE WHERE``) the north rule's upsert
    engine needs."""
    _reject_oob_on_coalesce(table, "update_where")
    if table.merge_policy != "lww":
        raise ValueError(
            f"update_where requires merge_policy='lww' (got "
            f"{table.merge_policy!r}): the emitted full-row image must "
            "REPLACE the current version; under additive/custom policies "
            "replacement is not the merge semantics — use apply_changes"
        )
    import re as _re
    import time as _time

    from xgeo_ray.state.delta_table import new_commit_token
    from xgeo_ray.state.storage import DEFAULT_STORAGE

    if not _re.fullmatch(r"[A-Za-z0-9_.-]+", batch_id):
        raise ValueError(f"batch_id {batch_id!r} must be filesystem-safe")
    final_dir = os.path.abspath(
        os.path.join(table.root, "backfill", f"{batch_id}.u")
    )
    prefix = final_dir + os.sep
    if any(s.startswith(prefix) for s in table.committed_segments()):
        return None
    now = int(_time.time() * 1_000_000) if ts_us is None else int(ts_us)
    envelope = table.current_schema()
    payload = [f.name for f in envelope if f.name not in LINEAGE_COLS]
    forbidden = {"conv_id", "turn_idx", "ts", "op", "seq"}
    if isinstance(set_values, dict):
        bad = sorted(set(set_values) & forbidden)
        if bad:
            raise ValueError(
                f"update_where cannot set {bad}: keys are identity "
                "(delete+insert to re-key) and ts/op/seq are stamped by "
                "the call"
            )
        unknown = sorted(set(set_values) - set(payload))
        if unknown:
            raise ValueError(
                f"update_where set columns {unknown} not in the table "
                f"envelope {sorted(set(payload) - {'conv_id', 'turn_idx'})}"
            )
        if not set_values:
            raise ValueError("update_where needs at least one set column")
    elif not callable(set_values):
        raise ValueError(
            "set_values must be a {col: scalar} dict or a callable "
            "pa.Table -> {col: pa.Array}"
        )
    types = {f.name: f.type for f in envelope}

    def _to_updates(batch: pa.Table) -> pa.Table:
        mask = predicate(batch)
        rows = batch.filter(mask).select(payload)
        n = rows.num_rows
        new = set_values(rows) if callable(set_values) else set_values
        for col, val in new.items():
            if col in forbidden or col not in rows.column_names:
                raise ValueError(
                    f"update_where computed set returned column {col!r}: "
                    "not an updatable payload column"
                )
            arr = (
                val
                if isinstance(val, (pa.Array, pa.ChunkedArray))
                else pa.repeat(pa.scalar(val, types[col]), n)
            )
            rows = rows.set_column(
                rows.column_names.index(col), col, arr.cast(types[col])
            )
        rows = rows.set_column(
            rows.column_names.index("ts"),
            "ts",
            pa.repeat(pa.scalar(now, pa.timestamp("us")), n),
        )
        return rows.append_column(
            "op", pa.array(np.full(n, "U", dtype="U1"), pa.string())
        ).append_column(
            "seq", pa.array(np.full(n, -1, dtype=np.int64), pa.int64())
        )

    return _stage_and_ingest_oob(
        table,
        snapshot(table, partitions=partitions).map_batches(
            _to_updates, batch_format="pyarrow", zero_copy_batch=True
        ),
        final_dir,
        # updated images are user-authored state and stay CHECK-gated;
        # a dlq_dir keeps gated images recoverable via requeue_dlq
        dlq_dir=dlq_dir,
    )


def _stage_and_ingest_oob(
    table: DeltaTable,
    updates,
    final_dir: str,
    enforce_constraints: bool = True,
    dlq_dir: str | None = None,
):
    """Shared tail of the oob full-image rewriters (``update_where``,
    ``rename_column``): write the update-image Dataset to a staging
    dir, publish the parts under attempt-token names into ``final_dir``
    (the exactly-once batch directory), and ingest them
    watermark-exempt. An empty result still publishes a schema-only
    marker so the batch's exactly-once check commits."""
    import shutil as _shutil

    from xgeo_ray.state.delta_table import new_commit_token
    from xgeo_ray.state.storage import DEFAULT_STORAGE

    envelope = table.current_schema()
    stage = final_dir + f".stage-{os.getpid()}"
    _shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage, exist_ok=True)
    updates.write_parquet(stage)
    staged = sorted(
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    )
    if not staged:  # nothing matched: still commit an exactly-once marker
        key_schema = pa.schema(
            [f for f in envelope if f.name in ("conv_id", "turn_idx")]
        )
        empty = (
            key_schema.empty_table()
            .append_column("op", pa.array([], pa.string()))
            .append_column("ts", pa.array([], pa.timestamp("us")))
            .append_column("seq", pa.array([], pa.int64()))
        )
        p = os.path.join(stage, "empty.parquet")
        pq.write_table(empty, p)
        staged = [p]
    token = new_commit_token()
    durable = table.durability == "full"
    os.makedirs(final_dir, exist_ok=True)
    segs = []
    for i, src in enumerate(staged):
        dst = os.path.join(final_dir, f"part-{token}-{i:05d}.parquet")
        DEFAULT_STORAGE.publish_file(src, dst, durable=durable)
        segs.append(dst)
    _shutil.rmtree(stage, ignore_errors=True)
    return ingest_segments(
        table,
        segs,
        watermark_exempt=True,
        enforce_constraints=enforce_constraints,
        dlq_dir=dlq_dir,
    )


def rename_column(
    table: DeltaTable,
    old: str,
    new: str,
    batch_id: str | None = None,
    ts_us: int | None = None,
    rewrite: bool = False,
) -> dict:
    """Rename a payload column — the last leg of the schema-evolution
    story (ADD via stream/union evolution, DROP via ``drop_columns``,
    RENAME here). Semantics: after the call, ``snapshot()`` carries the
    values under ``new`` and ``old`` is gone; time travel BELOW the
    rename epoch still reads ``old`` (same contract as a drop); new WAL
    events must already carry ``new`` (values still arriving under
    ``old`` are discarded at normalize like any dropped column's).

    DEFAULT (``rewrite=False``): a METADATA-ONLY alias — one atomic
    table-meta write, ZERO data I/O, the Iceberg/Delta column-mapping
    shape. The rename is recorded in ``renamed_columns`` with the
    current epoch; every read path (snapshot, changes, lookup,
    lookup_many, key_history, feeds, views, join views, compaction,
    export) translates the old physical name in pre-rename files to
    the logical name via ``DeltaTable.column_aliases`` at the pruned
    parquet read — no event-time reset, any merge policy, chains
    compose (a->b then b->c). The next FULL ``compact`` physically
    erases the old name (folded files are written under logical
    names); ``restore`` below the rename epoch brings the old name
    back. The retired old name cannot be reused by later streams
    (values discarded at normalize, like a dropped column's).

    ``rewrite=True`` keeps the original honest-rewrite path for
    callers that need PHYSICAL erasure of the old name immediately
    (without waiting for a compact): the snapshot merge tasks stream
    full current-row images out with the column renamed (out-of-band
    'U' batch, seq=-1, LWW-winning ts), the union evolves the envelope
    to include ``new``, then ``old`` is metadata-dropped. EVENT-TIME
    SIDE EFFECT (rewrite only): every rewritten image is stamped at
    ``max(now, row ts + 1µs)`` so it wins the LWW race, which resets
    the whole table's event time to the rename instant — as_of_ts_us
    travel, expire() TTLs, event-time watermarks and time-bucket
    derives all see every row as "renamed-at". Rewrite requires
    merge_policy='lww' (the image must REPLACE; under additive it
    would double the sums, and coalesce refuses oob seq=-1 ordering)
    and is exactly-once (``batch_id``, default
    ``rename-<old>-to-<new>``) and crash-safe.

    No reference counterpart (stateless CLI,
    /root/reference/cmd/xgeo/main.go); standard lake-format surface
    (Delta column-mapping / Iceberg RENAME COLUMN)."""
    import re as _re
    import time as _time

    from xgeo_ray.state.delta_table import LINEAGE_COLS

    if rewrite:
        _reject_oob_on_coalesce(table, "rename_column")
        if table.merge_policy != "lww":
            raise ValueError(
                f"rename_column(rewrite=True) requires merge_policy='lww' "
                f"(got {table.merge_policy!r}): the renamed full-row image "
                "must REPLACE the current version"
            )
    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", new):
        raise ValueError(f"new column name {new!r} is not an identifier")
    protected = set(_MERGE_COLS) | set(LINEAGE_COLS)
    if old in protected or new in protected:
        raise ValueError(
            f"cannot rename key/envelope/lineage columns ({sorted(protected)})"
        )
    envelope = table.current_schema()
    if old not in envelope.names:
        # replayed completed rename: idempotent no-op
        if new in envelope.names and old in table.dropped_columns():
            return {
                "renamed": {old: new},
                "from_epoch": table.dropped_columns()[old],
            }
        if new in envelope.names and any(
            r["old"] == old and r["new"] == new
            for r in table.renamed_columns()
        ):
            return {
                "renamed": {old: new},
                "from_epoch": next(
                    r["epoch"]
                    for r in table.renamed_columns()
                    if r["old"] == old and r["new"] == new
                ),
                "mode": "alias",
            }
        raise ValueError(
            f"column {old!r} not in the table schema "
            f"(have: {sorted(set(envelope.names) - protected)})"
        )
    if new in envelope.names:
        raise ValueError(f"column {new!r} already exists")
    if new in table.dropped_columns():
        # dropped_columns entries are permanent table metadata (only
        # restore's prune_dropped_above removes them), so there is no
        # maintenance step that legalizes the reuse — don't advise one.
        raise ValueError(
            f"column {new!r} was previously dropped — renaming onto a "
            "dropped name would resurrect it through evolution; pick "
            "another name"
        )
    if new in table.retired_names():
        # a retired name still maps old files' bytes through the alias
        # table — reintroducing it as a logical name would make those
        # files ambiguous (is physical `new` the retired column or this
        # one?); pick another name
        raise ValueError(
            f"column {new!r} was previously renamed away — reusing a "
            "retired name would make pre-rename files ambiguous; pick "
            "another name"
        )
    if not rewrite:
        # the rename epoch is the CURRENT latest, mirroring drop_columns:
        # snapshot() and snapshot(as_of_epoch=latest) agree immediately,
        # strictly-older time travel still reads the old name
        epoch = table.latest_epoch()
        table.mark_renamed(old, new, epoch)
        _retarget_constraints(table, old, new)
        return {"renamed": {old: new}, "from_epoch": epoch, "mode": "alias"}
    if batch_id is None:
        batch_id = f"rename-{old}-to-{new}"
    if not _re.fullmatch(r"[A-Za-z0-9_.-]+", batch_id):
        raise ValueError(f"batch_id {batch_id!r} must be filesystem-safe")
    final_dir = os.path.abspath(
        os.path.join(table.root, "backfill", f"{batch_id}.u")
    )
    prefix = final_dir + os.sep
    payload = [f.name for f in envelope if f.name not in LINEAGE_COLS]
    now = int(_time.time() * 1_000_000) if ts_us is None else int(ts_us)

    def _to_images(batch: pa.Table) -> pa.Table:
        rows = batch.select(payload)
        n = rows.num_rows
        rows = rows.rename_columns(
            [new if c == old else c for c in rows.column_names]
        )
        # Unlike update_where (where "a later event supersedes" is the
        # contract), a rename must not silently lose rows whose event
        # time sits in the FUTURE of the rewrite: stamp each image at
        # max(now, its own ts + 1µs) so it always wins the LWW race
        # (seq=-1 sorts below a stream seq at equal ts).
        stamped = pc.max_element_wise(
            pc.add(rows.column("ts").cast(pa.int64()), 1),
            pa.scalar(now, pa.int64()),
        ).cast(pa.timestamp("us"))
        rows = rows.set_column(
            rows.column_names.index("ts"), "ts", stamped
        )
        return rows.append_column(
            "op", pa.array(np.full(n, "U", dtype="U1"), pa.string())
        ).append_column(
            "seq", pa.array(np.full(n, -1, dtype=np.int64), pa.int64())
        )

    if not any(s.startswith(prefix) for s in table.committed_segments()):
        _stage_and_ingest_oob(
            table,
            snapshot(table).map_batches(
                _to_images, batch_format="pyarrow", zero_copy_batch=True
            ),
            final_dir,
            # MECHANICAL rewrite of existing state: gating these images
            # against a later-declared CHECK rule would silently drop
            # historic rows the prospective contract promised to keep
            enforce_constraints=False,
        )
    # drop AFTER the rewrite commits (crash between re-runs to here;
    # mark_dropped is idempotent) — the drop epoch is the rewrite's, so
    # snapshot() and as_of_epoch=latest agree immediately
    # retarget BEFORE the drop: drop_columns releases constraints still
    # pointing at the dropped name, so retargeting after it would find
    # the rule already gone and silently lose it
    _retarget_constraints(table, old, new)
    drop_columns(table, [old])
    return {
        "renamed": {old: new},
        "from_epoch": table.dropped_columns()[old],
    }


def _retarget_constraints(table: DeltaTable, old: str, new: str) -> None:
    """A rename must carry declared CHECK rules with the column — a
    constraint left pointing at the retired name would silently stop
    firing (absent column == all-null == passes everything but
    not_null)."""
    cons = table.constraints()
    if any(s.get("col") == old for s in cons.values()):
        table.set_constraints(
            {
                n: ({**s, "col": new} if s.get("col") == old else s)
                for n, s in cons.items()
            }
        )


def validate_table(
    table: DeltaTable, constraints: dict | None = None
) -> dict[str, int]:
    """Retroactive CHECK audit: run the declared (or given) constraint
    kernels distributed over the CURRENT merged snapshot and return
    ``{constraint_name: violating_row_count}`` — nothing is mutated or
    quarantined. The complement to stream enforcement (which is
    prospective: rows applied before a rule was declared were never
    checked). Deletes aren't exempt here because a snapshot holds live
    state, not events.

    Scale: one pruned pass of the snapshot projected to only the
    checked columns; per-batch counts (constraints × blocks rows)
    reduce on the driver."""
    from xgeo_ray.state.constraints import check_mask, validate_spec

    spec = validate_spec(
        table.constraints() if constraints is None else constraints
    )
    if not spec:
        return {}
    names = sorted(spec)
    cols = sorted(
        {s["col"] for s in spec.values()}
        & set(table.current_schema().names)
    )
    key_cols = ["conv_id"]  # snapshot needs >=1 column; keys always exist

    def _audit(batch: pa.Table) -> pa.Table:
        counts = []
        for n in names:
            sub = {n: spec[n]}
            ok, _ = check_mask(batch, sub, exempt_deletes=False)
            counts.append(batch.num_rows - (pc.sum(ok).as_py() or 0))
        return pa.table(
            {
                "constraint": pa.array(names, pa.string()),
                "fails": pa.array(counts, pa.int64()),
            }
        )

    ds = snapshot(table, columns=sorted(set(cols) | set(key_cols)))
    out = ds.map_batches(
        _audit, batch_format="pyarrow", zero_copy_batch=True
    ).to_arrow_refs()
    totals = {n: 0 for n in names}
    for ref in out:
        t = ray.get(ref)
        for n, f in zip(
            t.column("constraint").to_pylist(), t.column("fails").to_pylist()
        ):
            totals[n] += int(f)
    return totals


_EXPORT_METAS = ("_sort_meta.json", "_pack_meta.json", "_shuffle_meta.json")


def _refuse_foreign_export_meta(out_dir: str, own: str) -> None:
    """All three export families name their files ``shard-NNNNN.<ext>``,
    so a directory already holding ANOTHER family's pinned spec would
    have its finished shards mistaken for this export's resume state —
    silent membership corruption, not a crash. Refuse instead."""
    for m in _EXPORT_METAS:
        if m != own and os.path.isfile(os.path.join(out_dir, m)):
            raise ValueError(
                f"export dir {out_dir!r} already holds a {m[1:-10]} "
                f"export ({m}) — shard files would collide; use a "
                "fresh directory"
            )


def validate_refs(
    table: DeltaTable,
    col: str,
    other: DeltaTable,
    other_col: str | None = None,
    num_partitions: int = 32,
) -> dict[str, int]:
    """Referential-integrity audit: count CURRENT merged rows of
    ``table`` whose ``col`` value has no matching ``other_col`` row in
    ``other``'s current snapshot — the cross-table complement to the
    single-table CHECK audit (``validate_table``). Nothing is mutated;
    NULL values are not dangling (SQL FK semantics: unknown ≠ broken).

    Scale shape: both sides read PRUNED to one column each, the
    orphan check is a bucketed cogroup anti-join
    (``relational.hash_join`` 'left anti' — values co-locate by key
    hash, no broadcast, no driver materialization), and only per-batch
    counts reach the driver."""
    from xgeo_ray.functions.relational import hash_join

    if other_col is None:
        other_col = col

    def _refs(b: pa.Table, _c=col) -> pa.Table:
        return pa.table({"__ref": b.column(_c)})

    # materialize ONCE: count, null-count and the anti-join all consume
    # the same blocks — without this each would re-run the full
    # merge-on-read snapshot pipeline (three scans instead of one)
    left = snapshot(table, columns=[col]).map_batches(
        _refs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    right = snapshot(other, columns=[other_col]).map_batches(
        # distinct the referenced side per batch (anti-join semantics
        # don't need duplicates; this is the classic combiner) and
        # drop nulls — a null on the referenced side matches nothing
        lambda b, _c=other_col: pa.table(
            {"__ref": pc.unique(b.column(_c)).drop_null()}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    total = left.count()
    nulls = int(
        left.map_batches(
            lambda b: pa.table(
                {"n": pa.array([b.column("__ref").null_count], pa.int64())}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).sum("n")
        or 0
    )
    # nulls are "unknown", not dangling (SQL FK semantics) — exclude
    # them before the anti-join so they can't surface as orphans
    left_nn = left.map_batches(
        lambda b: b.drop_null(),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    orphans = hash_join(
        left_nn, right, on="__ref", join_type="left anti",
        num_partitions=num_partitions,
    ).count()
    return {
        "rows": int(total),
        "null_refs": nulls,
        "dangling": int(orphans),
    }


def _encode_sort_bounds(bounds: list) -> list | dict:
    """Bounds pin into ``_sort_meta.json`` as plain JSON for numeric /
    string keys; binary keys produce ``bytes`` cut points that JSON
    cannot carry, so wrap those as a tagged base64 list."""
    if any(isinstance(b, bytes) for b in bounds):
        import base64

        return {"b64": [base64.b64encode(b).decode("ascii") for b in bounds]}
    return bounds


def _decode_sort_bounds(bounds: list | dict) -> list:
    if isinstance(bounds, dict) and "b64" in bounds:
        import base64

        return [base64.b64decode(x) for x in bounds["b64"]]
    return bounds


def export_sorted(
    table: DeltaTable,
    out_dir: str,
    by: str,
    num_shards: int,
    tiebreak: list[str] | None = None,
    descending: bool = False,
    columns: list[str] | None = None,
    fmt: str = "parquet",
) -> dict[str, int]:
    """Write the merged table state as ``num_shards`` shard files in
    GLOBAL SORTED ORDER by (``by``, ``tiebreak``... — tiebreak always
    ascending; nulls last) — the curriculum/length-ordered companion to
    ``export_shuffled``: ``shard-00000`` holds the smallest (or with
    ``descending`` the largest) keys, file order + row order = the
    total order a sequential reader consumes.

    Sample-sort shape (``relational.range_bounds``): one pruned pass
    samples the key into range cut points, then the payload moves ONCE
    through a groupby exchange keyed on the range shard, each shard
    sorts vectorized and writes atomically. Equal keys never split
    across shards (assignment is a pure function of the key value), so
    ordering is exact regardless of sampling skew; skew only imbalances
    shard sizes. Size ``num_shards`` so a shard fits a worker.

    Resumable like ``export_shuffled``: the RANGE BOUNDS are computed
    once and PINNED in ``_sort_meta.json`` (a resumed run on a changed
    table must not move shard boundaries under finished files); shards
    whose file exists are skipped before the exchange; spec mismatch
    refuses. Keys may be numeric/temporal (int64 fast path) or
    string/binary (lexicographic; bounds pin as JSON strings, shard
    assignment is vectorized Arrow compares).

    No reference counterpart (stateless CLI); published shape: parallel
    sample sort + Hive/Iceberg-style ordered write."""
    import json as _json

    from xgeo_ray.functions.relational import (
        range_bounds,
        range_shard_assign,
    )

    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    exts = {"parquet": ".parquet", "jsonl": ".jsonl", "jsonl.gz": ".jsonl.gz"}
    if fmt not in exts:
        raise ValueError(f"fmt must be one of {sorted(exts)}")
    ext = exts[fmt]
    if tiebreak is None:
        tiebreak = ["conv_id", "turn_idx"]
    os.makedirs(out_dir, exist_ok=True)
    need = columns
    if columns is not None:
        need = list(
            dict.fromkeys(["conv_id", "turn_idx", by] + tiebreak + list(columns))
        )
    spec = {
        "by": by,
        "descending": bool(descending),
        "num_shards": num_shards,
        "tiebreak": list(tiebreak),
        "columns": columns,
        "fmt": fmt,
        "order": "range-v1",
    }
    meta_path = os.path.join(out_dir, "_sort_meta.json")
    _refuse_foreign_export_meta(out_dir, "_sort_meta.json")
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            prev = _json.load(f)
        bounds = _decode_sort_bounds(prev.pop("bounds"))
        if prev != spec:
            raise ValueError(
                f"export dir {out_dir!r} was written with a different sort "
                f"spec {prev} (requested {spec}): resuming would corrupt "
                "shard membership — use a fresh directory (or delete it)."
            )
    else:
        bounds = range_bounds(snapshot(table, columns=[by]), by, num_shards)
        tmp_meta = meta_path + f".tmp-{os.getpid()}"
        with open(tmp_meta, "w") as f:
            _json.dump({**spec, "bounds": _encode_sort_bounds(bounds)}, f)
        os.replace(tmp_meta, meta_path)
    return _ranged_shard_export(
        table, out_dir, by, tiebreak, descending, columns, need,
        fmt, ext, bounds, num_shards,
    )


def _ranged_shard_export(
    table: DeltaTable,
    out_dir: str,
    by: str,
    tiebreak: list[str],
    descending: bool,
    columns: list[str] | None,
    need: list[str] | None,
    fmt: str,
    ext: str,
    bounds: list,
    num_shards: int,
) -> dict[str, int]:
    """Shared range-sharded ordered write (the post-bounds half of
    ``export_sorted``, also driving ``export_packed``): assign each row
    to its range shard, skip finished shard files before the exchange,
    per-shard vectorized sort + atomic write, fill empty shards."""
    from xgeo_ray.functions.relational import range_shard_assign

    done = {
        s
        for s in range(num_shards)
        if os.path.isfile(os.path.join(out_dir, f"shard-{s:05d}{ext}"))
    }
    if len(done) == num_shards:
        return {"shards": num_shards, "written": 0,
                "skipped": num_shards, "rows_written": 0}
    assign0 = range_shard_assign(
        bounds, by, num_shards,
        null_shard=0 if descending else num_shards - 1,
    )
    done_arr = np.zeros(num_shards, dtype=bool)
    for s in done:
        done_arr[s] = True
    durable = table.durability == "full"
    last = num_shards - 1

    def assign(batch: pa.Table) -> pa.Table:
        t = assign0(batch)
        shard = t.column("shard").to_numpy(zero_copy_only=False)
        if descending:
            # file order walks the ranges high->low: file 0 = top keys
            shard = last - shard
            t = t.set_column(
                t.column_names.index("shard"), "shard", pa.array(shard)
            )
        keep = ~done_arr[shard]  # finished shards never cross the exchange
        return t if keep.all() else t.filter(pa.array(keep))

    sort_keys = [(by, "descending" if descending else "ascending")] + [
        (c, "ascending") for c in tiebreak
    ]

    def write_shard(g: pa.Table) -> pa.Table:
        from xgeo_ray.tuning import limit_worker_threads

        limit_worker_threads()
        s = int(g.column("shard")[0].as_py())
        path = os.path.join(out_dir, f"shard-{s:05d}{ext}")
        order = pc.sort_indices(
            g, sort_keys=sort_keys, null_placement="at_end"
        )
        out = g.take(order).drop_columns(["shard"])
        if fmt == "parquet":
            _atomic_write_parquet(out, path, durable=durable)
        else:
            _atomic_write_jsonl(out, path, durable=durable)
        return pa.table(
            {"shard": pa.array([s], pa.int64()),
             "rows": pa.array([out.num_rows], pa.int64())}
        )

    write_shard.__name__ = "write_shard"
    snap = snapshot(table, columns=need)
    stats = (
        snap.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .to_pandas()
    )
    produced = set(stats["shard"].tolist()) if len(stats) else set()
    env = table.current_schema()
    if columns is None:
        out_fields = [f for f in env if f.name not in LINEAGE_COLS]
    else:
        by_name = {f.name: f for f in env}
        out_fields = [by_name[c] for c in need if c in by_name]
    n_empty = 0
    for s in range(num_shards):
        if s in done or s in produced:
            continue
        empty_path = os.path.join(out_dir, f"shard-{s:05d}{ext}")
        empty = pa.schema(out_fields).empty_table()
        if fmt == "parquet":
            _atomic_write_parquet(empty, empty_path, durable=durable)
        else:
            _atomic_write_jsonl(empty, empty_path, durable=durable)
        n_empty += 1
    return {
        "shards": num_shards,
        "written": int(len(stats)) + n_empty,
        "skipped": int(len(done)),
        "rows_written": int(stats["rows"].sum()) if len(stats) else 0,
    }


def export_packed(
    table: DeltaTable,
    out_dir: str,
    tokens_per_shard: int,
    by: str = "conv_id",
    text_col: str = "text",
    columns: list[str] | None = None,
    fmt: str = "jsonl",
) -> dict[str, int]:
    """Write the merged state as TOKEN-BUDGET-sized training shards in
    global ``by`` order with GROUPS KEPT WHOLE — the third member of
    the export family (``export_shuffled`` = random, ``export_sorted``
    = curriculum, this = packed): every row of one ``by`` group (a
    conversation) lands in ONE shard, shards walk ascending key order,
    and each shard's total whitespace-token count approximates
    ``tokens_per_shard``.

    Scale shape: one PRUNED counts pass (keys + text only) computes the
    exact corpus token total (a scalar reduce) and token-WEIGHTED range
    cut points (``relational.weighted_range_bounds`` — per-block key
    combiner + stride sample, driver sees O(sample) pairs); the payload
    then moves ONCE through the same range exchange as ``export_sorted``
    (per-shard vectorized sort + atomic write). Shard count =
    ceil(total_tokens / tokens_per_shard).

    Contract notes: shard sizes are best-effort (bounds sampling error
    plus whole-group placement skew them; ordering is always exact);
    a single group larger than the budget becomes one oversized shard
    — by design, never split. Resumable like ``export_sorted``: total,
    shard count and bounds PIN into ``_pack_meta.json`` on first run,
    finished shards skip before the exchange, spec mismatch refuses."""
    import json as _json

    from xgeo_ray.functions.relational import weighted_range_bounds
    from xgeo_ray.functions.text import token_count_table

    if tokens_per_shard < 1:
        raise ValueError("tokens_per_shard must be >= 1")
    exts = {"parquet": ".parquet", "jsonl": ".jsonl", "jsonl.gz": ".jsonl.gz"}
    if fmt not in exts:
        raise ValueError(f"fmt must be one of {sorted(exts)}")
    ext = exts[fmt]
    tiebreak = ["conv_id", "turn_idx"]
    os.makedirs(out_dir, exist_ok=True)
    need = columns
    if columns is not None:
        # keys + range key only (the counts pass reads text separately;
        # a projection excluding text exports without it)
        need = list(
            dict.fromkeys(["conv_id", "turn_idx", by] + list(columns))
        )
    spec = {
        "tokens_per_shard": int(tokens_per_shard),
        "by": by,
        "text_col": text_col,
        "columns": columns,
        "fmt": fmt,
        "order": "pack-v1",
    }
    meta_path = os.path.join(out_dir, "_pack_meta.json")
    _refuse_foreign_export_meta(out_dir, "_pack_meta.json")
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            prev = _json.load(f)
        bounds = _decode_sort_bounds(prev.pop("bounds"))
        num_shards = int(prev.pop("num_shards"))
        total_tokens = int(prev.pop("total_tokens"))
        if prev != spec:
            raise ValueError(
                f"export dir {out_dir!r} was written with a different pack "
                f"spec {prev} (requested {spec}): resuming would corrupt "
                "shard membership — use a fresh directory (or delete it)."
            )
    else:
        # counts pass: keys + text only leave storage; text never leaves
        # its read task (the kernel reduces it to one int per row)
        counts = snapshot(table, columns=[by, text_col]).map_batches(
            lambda b: token_count_table(b, text_col).select(
                [by, "n_tokens"]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()
        total_tokens = int(counts.sum("n_tokens") or 0)
        num_shards = max(
            1, -(-total_tokens // int(tokens_per_shard))
        )
        bounds = weighted_range_bounds(counts, by, "n_tokens", num_shards)
        tmp_meta = meta_path + f".tmp-{os.getpid()}"
        with open(tmp_meta, "w") as f:
            _json.dump(
                {
                    **spec,
                    "bounds": _encode_sort_bounds(bounds),
                    "num_shards": num_shards,
                    "total_tokens": total_tokens,
                },
                f,
            )
        os.replace(tmp_meta, meta_path)
    stats = _ranged_shard_export(
        table, out_dir, by, tiebreak, False, columns, need,
        fmt, ext, bounds, num_shards,
    )
    return {**stats, "total_tokens": total_tokens}


class _TsBefore:
    """Picklable event-time predicate for expire(): current winner's ts
    strictly before the cutoff. Declares its projection so the snapshot
    scan reads keys + ts only."""

    columns = ["ts"]

    def __init__(self, cutoff_us: int):
        self.cutoff_us = int(cutoff_us)

    def __call__(self, batch: pa.Table):
        return pc.less(
            batch.column("ts").cast(pa.int64()),
            pa.scalar(self.cutoff_us, pa.int64()),
        )


def clone_table(
    source: DeltaTable, dest_root: str, mode: str = "auto"
) -> DeltaTable:
    """ZERO-COPY table clone (dev/test branching, experiment isolation):
    a new independent table whose manifests are copies of the source's
    full history and whose data files are HARDLINKS to the source's
    immutable deltas — O(files) metadata work, no bytes moved. Both
    sides then evolve independently: committed delta files are
    immutable by design and each side's vacuum only unlinks its own
    directory entry (the inode lives while either table references it),
    so neither clone can corrupt the other. Time travel, restore
    markers and committed-segment cursors all travel with the manifest
    history; consumer-group cursors and writer leases deliberately do
    NOT (a clone starts with no consumers and no writer).

    ``mode``: ``"auto"`` hardlinks and silently falls back to a byte
    copy when the destination is on a different filesystem (EXDEV);
    ``"copy"`` always copies (a deep clone). On an object-store
    deployment the equivalent is the service's server-side COPY — same
    O(files) metadata shape, no data through the client.

    No reference counterpart (stateless CLI); this is the lakehouse
    "create table clone" surface (shallow clones in Delta/Iceberg)."""
    if mode not in ("auto", "copy"):
        raise ValueError("mode must be 'auto' or 'copy'")
    import shutil as _shutil

    if os.path.exists(dest_root) and os.listdir(dest_root):
        raise ValueError(f"clone destination {dest_root!r} is not empty")
    os.makedirs(dest_root, exist_ok=True)
    _shutil.copy2(
        os.path.join(source.root, "_table.json"),
        os.path.join(dest_root, "_table.json"),
    )
    src_man = os.path.join(source.root, "manifests")
    dst_man = os.path.join(dest_root, "manifests")
    os.makedirs(dst_man, exist_ok=True)
    # Committed-segment cursors must TRAVEL with the clone: backfill
    # batch segments (apply_changes/delete_where/expire) are recorded
    # root-ABSOLUTE, so a verbatim copy would leave the clone's
    # batch_id exactly-once checks comparing against dest-root paths
    # that never match — a committed batch would silently re-apply on
    # the clone. Rewrite the source-root backfill prefix to the dest
    # root; WAL segment paths (outside the table root) pass through
    # unchanged, preserving resume continuity.
    src_bf = os.path.abspath(os.path.join(source.root, "backfill")) + os.sep
    dst_bf = os.path.abspath(os.path.join(dest_root, "backfill")) + os.sep
    for n in sorted(os.listdir(src_man)):
        if not n.endswith(".json"):
            continue
        with open(os.path.join(src_man, n)) as f:
            doc = json.load(f)
        doc["segments"] = [
            dst_bf + s[len(src_bf):] if s.startswith(src_bf) else s
            for s in doc.get("segments", [])
        ]
        with open(os.path.join(dst_man, n), "w") as f:
            json.dump(doc, f)

    def _link(rel: str) -> None:
        src = os.path.join(source.root, rel)
        dst = os.path.join(dest_root, rel)
        if os.path.exists(dst) or not os.path.exists(src):
            return
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if mode == "copy":
            _shutil.copy2(src, dst)
            return
        try:
            os.link(src, dst)
        except OSError:  # EXDEV / fs without hardlinks
            _shutil.copy2(src, dst)

    linked = set()
    for m in source.manifests():
        for e in m.partitions.values():
            if e.path and e.path not in linked:
                linked.add(e.path)
                _link(e.path)
    # out-of-band batch segments (apply_changes/delete_where) live under
    # backfill/ and are listed in manifests' committed segments — link
    # them too so fsck on the clone sees a complete history
    bf = os.path.join(source.root, "backfill")
    if os.path.isdir(bf):
        for root_dir, _, files in os.walk(bf):
            for n in files:
                rel = os.path.relpath(os.path.join(root_dir, n), source.root)
                _link(rel)
    # tags describe the manifest history, which the clone copies — they
    # travel (and keep pinning vacuum retention independently on each
    # side); consumers/leases are PROCESS state and do not
    src_tags = os.path.join(source.root, "tags")
    if os.path.isdir(src_tags):
        os.makedirs(os.path.join(dest_root, "tags"), exist_ok=True)
        for n in sorted(os.listdir(src_tags)):
            if n.endswith(".json"):
                _shutil.copy2(
                    os.path.join(src_tags, n),
                    os.path.join(dest_root, "tags", n),
                )
    return DeltaTable.open(dest_root)


def drop_columns(table: DeltaTable, columns: list[str]) -> dict:
    """Drop data columns from the table — the COLUMN-level complement to
    ``delete_where`` (rows) and ``expire`` (age): the
    right-to-be-forgotten story for an over-collected field. A drop is
    a METADATA operation (one atomic table-meta write, zero data I/O):

    * every reader at or past the drop epoch stops projecting the
      column — existing files keep their bytes but the envelope-pruned
      parquet reads never fetch them;
    * new WAL events still carrying the column have those values
      discarded at normalize (the column does not resurrect through
      schema evolution's union);
    * ``snapshot(as_of_epoch=e)`` BELOW the drop epoch still reads the
      column from the pre-drop files (time travel keeps fidelity);
    * ``restore`` below the drop epoch revives the column;
    * PHYSICAL erasure happens at the next FULL ``compact`` — the fold
      reads through the narrowed envelope, so rewritten files simply
      lack the column — plus ``vacuum`` to reclaim the old files.
      (A minor compact already strips it from the chain files it
      rewrites; the base file keeps its bytes until the full fold.)
      Until then the bytes exist on disk but are unreadable through
      every engine surface.

    Key/envelope columns (conv_id, turn_idx, op, seq, ts) and lineage
    columns cannot be dropped. Idempotent: re-dropping keeps the
    original drop epoch. Out-of-band writers (``apply_changes``) stay
    strict — handing them a dropped column fails fast rather than
    silently discarding a correction's payload.

    No counterpart in the reference (stateless CLI,
    /root/reference/cmd/xgeo/main.go); standard lake-format surface
    (cf. public Delta Lake / Iceberg column-drop semantics: metadata
    now, physical on rewrite)."""
    from xgeo_ray.state.delta_table import LINEAGE_COLS

    if not columns:
        raise ValueError("no columns given")
    protected = set(_MERGE_COLS) | set(LINEAGE_COLS)
    bad = [c for c in columns if c in protected]
    if bad:
        raise ValueError(
            f"cannot drop key/envelope/lineage columns: {sorted(bad)}"
        )
    env_names = set(table.current_schema().names)
    already = set(table.dropped_columns())  # replayed drop: no-op below
    missing = [c for c in columns if c not in env_names and c not in already]
    if missing:
        raise ValueError(
            f"columns not in the table schema: {sorted(missing)} "
            f"(have: {sorted(env_names - protected)})"
        )
    # the drop epoch is the CURRENT latest: snapshot() and
    # snapshot(as_of_epoch=latest) must agree (both hide the column);
    # strictly-older time travel still reads it
    from_epoch = table.latest_epoch()
    table.mark_dropped(list(columns), from_epoch)
    # CHECK constraints targeting a dropped column are released with it
    # — leaving one behind would make its not_null rule quarantine
    # EVERY future I/U event (an absent column is all-null by contract)
    cons = table.constraints()
    dropped_set = set(columns)
    kept = {n: s for n, s in cons.items() if s.get("col") not in dropped_set}
    if len(kept) != len(cons):
        table.set_constraints(kept)
    return {
        "dropped": sorted(table.dropped_columns()),
        "from_epoch": from_epoch,
        "released_constraints": sorted(set(cons) - set(kept)),
    }


def expire(
    table: DeltaTable,
    older_than_ts_us: int,
    batch_id: str | None = None,
    ts_us: int | None = None,
) -> Manifest | None:
    """Event-time retention (TTL): tombstone every key whose CURRENT
    merged winner has ``ts < older_than_ts_us`` — the scheduled
    "drop everything older than N days" primitive, built on the
    ``delete_where`` machinery so it inherits exactly-once commits
    (``batch_id`` defaults to ``expire-<cutoff>``: one logical run per
    cutoff, retries no-op), out-of-band watermark-exempt application,
    and the physical-erasure two-step (a later full
    ``compact(tombstone_ts_horizon=...)`` + ``vacuum()`` reclaims the
    bytes).

    Scale shape: the scan is PRUNED TWICE before any payload read —
    partitions whose every visible file starts at or after the cutoff
    are skipped from manifest zone maps alone
    (``DeltaTable.partitions_with_rows_before``), and surviving
    partitions read only the key + ts columns. On an
    append-mostly table where old partitions went cold after a
    ts-horizon compaction, expire cost tracks the WARM fraction, not
    the table size.

    TTL is UPSERT-semantics like any engine delete: the tombstone is
    stamped at wall-clock now (or ``ts_us``), so a later stream update
    with a later event time legitimately re-inserts the key."""
    cutoff = int(older_than_ts_us)
    if batch_id is None:
        batch_id = f"expire-{cutoff}"
    # An empty survivor set still flows through delete_where: its
    # empty-staged path commits the exactly-once marker, so a retry
    # after a racing compaction doesn't silently re-scan.
    parts = table.partitions_with_rows_before(cutoff)
    return delete_where(
        table,
        _TsBefore(cutoff),
        batch_id=batch_id,
        ts_us=ts_us,
        partitions=parts,
    )


def reshard(
    table: DeltaTable,
    new_root: str,
    num_partitions: int,
    num_salts: int | None = None,
    tmp_dir: str | None = None,
) -> DeltaTable:
    """Migrate a table to a NEW partition/salt count — the explicit
    partitioning-evolution operation a growing lake needs (partition
    count is fixed at create; a table sized for 10^8 events needs more
    partitions at 10^10). Returns the new table handle at ``new_root``.

    Mechanics: one merge task per OLD partition folds its visible files
    to per-key state WITH tombstones retained (dropping one could let a
    late lower-(ts, seq) event resurrect a deleted key in the new
    table) and writes it as a WAL-shaped tmp segment; all segments then
    ingest through the normal exchange/fence machinery as ONE epoch —
    the reshard is a single atomic cutover, and per-NEW-partition seq
    watermarks are recorded from the real seqs, so replay protection
    carries over. A second commit records the old table's committed
    segment list, so tailing the same WAL against the new table skips
    everything already applied (resume continuity across the reshard).
    ``history="full"`` tables migrate version-preserving (same kernel
    as minor compaction).

    One-shot, not resumable midway: ``new_root`` must not exist; after
    a crash, delete it and rerun (the old table is never touched).
    Scale note: a reshard is inherently a full-table shuffle — the one
    epoch holds the whole table in flight (object store spills); run it
    as a maintenance job, not inline with ingest.

    No counterpart in the reference (stateless CLI); the north rule
    mandates partitioning handled explicitly — this is the evolution
    half."""
    import shutil as _shutil

    if DeltaTable.exists(new_root) or os.path.isdir(new_root):
        raise ValueError(
            f"reshard target {new_root!r} already exists — it must be "
            "fresh (delete a half-finished reshard and rerun)"
        )
    if num_salts is None:
        num_salts = table.num_salts
    envelope = table.current_schema()
    plan = table.partition_files()
    if not plan:
        raise ValueError("reshard of an empty table: nothing committed yet")
    tmp = tmp_dir or (new_root.rstrip("/") + ".reshard-tmp")
    _shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    from xgeo_ray.stages.collapse import MERGE_POLICIES

    policy = MERGE_POLICIES[table.merge_policy]["fn"]
    preserve_history = table.history == "full"
    aliases = table.column_aliases()

    @ray.remote
    def fold_part(part: int, paths: list[str]) -> str:
        from xgeo_ray.tuning import limit_worker_threads

        limit_worker_threads()
        tables = _read_env_tables(paths, envelope, aliases)
        if preserve_history:
            from xgeo_ray.schemas import unify as _unify
            from xgeo_ray.stages.collapse import history_dedup

            tgt = _unify(*[x.schema for x in tables])
            t = history_dedup(
                pa.concat_tables([cast_to(x, tgt) for x in tables])
            )[0]
        else:
            t = merge_versions(tables, drop_tombstones=False, policy=policy)
        t = cast_to(t, envelope)
        out = os.path.join(tmp, f"part-{part:05d}.parquet")
        pq.write_table(t, out)
        return out

    segs = ray.get([fold_part.remote(k, v) for k, v in sorted(plan.items())])
    new = DeltaTable.create(
        new_root,
        num_partitions=num_partitions,
        num_salts=num_salts,
        base_schema=table.base_schema(),
        durability=table.durability,
        merge_policy=table.merge_policy,
        history=table.history,
        stats_columns=table.stats_columns() or None,
        parquet_codec=table.parquet_codec(),
    )
    # ONE epoch: segments partition the KEY space (one old partition
    # each) with overlapping seq ranges — splitting them across epochs
    # would trip the per-new-partition seq watermark on the later half
    # (the same invariant sync_derived documents)
    run_stream(new, [], segment_groups=[sorted(segs)])
    # carry declared CHECK constraints — reshard then tail-resume on the
    # same WAL must keep the data-quality gate. AFTER the fold cutover:
    # folded rows are already-validated state, and gating them would
    # quarantine historic rows a LATER-declared rule never saw (e.g. a
    # legal null from before a not_null was declared) — prospective
    # enforcement must stay prospective across a reshard too.
    cons = table.constraints()
    if cons:
        new.set_constraints(cons)
    # resume continuity: the old WAL's committed segments count as done.
    # On collapsed-history tables the fold above erased superseded
    # versions exactly like a compaction — record the folded max_ts so
    # event-time travel INTO the pre-reshard range fails fast on the
    # new table (same guard snapshot applies to compact manifests)
    # instead of silently returning folded state.
    extra = None
    if not preserve_history:
        fold_max = max(
            (
                e.max_ts
                for m in new.manifests()
                for e in m.partitions.values()
            ),
            default=-1,
        )
        extra = {"folds_history": 1, "folded_max_ts": fold_max}
    carried = sorted(table.committed_segments())
    new.commit_epoch(
        new.latest_epoch() + 1,
        carried,
        [],
        envelope,
        kind="delta",
        extra_totals=extra,
    )
    _shutil.rmtree(tmp, ignore_errors=True)
    return new


def restore(table: DeltaTable, to_epoch: int, force: bool = False) -> Manifest:
    """Roll the table back to the state as of committed epoch
    ``to_epoch`` — the lakehouse RESTORE: a pure-metadata commit (kind
    ``"restore"``, ``replaces_up_to`` = target) after which every reader
    sees exactly ``snapshot(as_of_epoch=to_epoch)``'s state, schema and
    watermarks, while the rolled-back epochs' manifests and files remain
    on disk for time-travel (``as_of_epoch`` inside the rolled-back
    range still reads; vacuum reclaims the files on its normal cadence).

    Semantics that follow from the watermark/segment rewind:
    * WAL segments committed only by rolled-back epochs become
      re-ingestable — ``run_stream``/``tail`` on the same WAL replays
      them, which is the repair story (restore past a bad batch, fix
      the producer or transform, replay). Replay IN SEQ ORDER: the
      restore rewinds the seq watermarks, but ingesting a higher-seq
      segment first seals the watermark above the gap and any
      lower-seq segment replayed after it is (correctly) dropped as a
      below-watermark replay — counted in ``below_wm_dropped``, never
      applied.
    * The changes feed and consumer polls stop serving rolled-back
      epochs. A consumer group whose durable cursor is AHEAD of the
      target has already applied changes the table no longer holds, so
      restore fails fast unless ``force=True`` (then rebuild or rewind
      that consumer out-of-band). Derived tables synced from this
      source have the same exposure: restore the sink to its epoch
      preceding the rolled-back source epochs, or rebuild it.
    * Restore-of-restore composes; restoring to an epoch whose visible
      files vacuum already reclaimed fails fast (retention = vacuum
      cadence, same contract as time-travel reads).

    No counterpart in the reference (its CLI is stateless,
    /root/reference/cmd/xgeo/main.go); this is table-format machinery
    the north rule's lake-upsert engine needs."""
    ms = table.manifests()
    epochs = {m.epoch for m in ms}
    if to_epoch not in epochs:
        raise ValueError(f"epoch {to_epoch} was never committed: {sorted(epochs)[-5:]}")
    latest = table.latest_epoch()
    if to_epoch == latest:
        raise ValueError(f"epoch {to_epoch} is already the latest — nothing to restore")
    if not force:
        from xgeo_ray.state import consumers as _cons

        for g in _cons.groups(table):
            pos = _cons.position(table, g)
            if pos > to_epoch:
                raise ValueError(
                    f"consumer group {g!r} has acked epoch {pos} > restore "
                    f"target {to_epoch}: it already applied changes the "
                    "rollback removes. Rewind/drop the group (or pass "
                    "force=True and repair it out-of-band)."
                )
    missing = [
        p
        for paths in table.partition_files(as_of_epoch=to_epoch).values()
        for p in paths
        if not os.path.isfile(p)
    ]
    if missing:
        raise ValueError(
            f"cannot restore to epoch {to_epoch}: {len(missing)} visible "
            f"file(s) already vacuumed (first: {missing[0]}). The vacuum "
            "cadence is the restore retention window."
        )
    # rolling state below a column drop brings the column back: forget
    # drops recorded above the target BEFORE committing the marker, so
    # the marker's schema (current_schema(to_epoch)) includes it again;
    # same for metadata renames — below the rename the old name returns
    table.prune_dropped_above(to_epoch)
    table.prune_renamed_above(to_epoch)
    return table.commit_epoch(
        latest + 1,
        [f"restore:{to_epoch}"],
        [],
        table.current_schema(to_epoch),
        kind="restore",
        replaces_up_to=to_epoch,
    )


def fsck(table: DeltaTable) -> dict:
    """Offline integrity check — metadata + file stats only, no Ray, no
    data reads: cheap enough to run before every resume on a 100 TB
    table. Verifies that every still-NEEDED manifest-referenced file
    exists with the recorded byte size — needed = in the current
    visible set (missing → ISSUE: real corruption or premature
    vacuum). A missing delta file a registered consumer group has not
    acked yet is a WARNING, not corruption: an operator may have
    overridden vacuum's consumer retention deliberately
    (``respect_consumers=False``), and the alarm must clear once the
    group catches up or is dropped. Files a compaction superseded and
    vacuum reclaimed are counted (``files_reclaimed``), not flagged. Also checks manifest
    epochs are consecutive from 1, per-partition seq watermarks never
    regress across delta epochs (out-of-band -1 entries exempt), the
    schema version is monotone, and no consumer cursor is ahead of the
    committed fence. Counts (but does not judge) unreferenced files
    under parts/ — pre-commit in-flight work and vacuum backlog both
    land there. Returns ``{"ok": bool, "issues": [...], ...}``."""
    from xgeo_ray.state import consumers as _cons

    issues: list[str] = []
    ms = table.manifests()
    seen_epochs = [m.epoch for m in ms]
    if seen_epochs != list(range(1, len(seen_epochs) + 1)):
        issues.append(f"manifest epochs not consecutive from 1: {seen_epochs}")
    visible = {
        os.path.abspath(p)
        for paths in table.partition_files().values()
        for p in paths
    }
    keep_after = _cons.min_cursor(table)
    referenced: set[str] = set()
    reclaimed = 0
    warnings: list[str] = []
    # epochs surviving restores: a rolled-back delta file is no longer
    # feed-readable, so its absence is reclaimed history, not a consumer
    # gap; restore markers also legally REWIND the seq watermarks.
    eff_epochs = {m.epoch for m in table.effective_manifests()}
    wm = {}
    prev_version = 0
    for m in ms:
        if m.schema_version < prev_version:
            issues.append(
                f"epoch {m.epoch}: schema_version regressed "
                f"{prev_version} -> {m.schema_version}"
            )
        prev_version = m.schema_version
        if m.kind == "restore":
            wm = {}
            for mm in table.effective_manifests(m.epoch):
                if mm.kind != "delta":
                    continue
                for k2, e2 in mm.partitions.items():
                    if e2.max_seq >= 0:
                        wm[int(k2)] = max(wm.get(int(k2), -1), e2.max_seq)
            continue
        for k, e in m.partitions.items():
            if not e.path:
                continue
            full = os.path.join(table.root, e.path)
            referenced.add(os.path.abspath(full))
            try:
                size = os.path.getsize(full)
            except FileNotFoundError:
                if os.path.abspath(full) in visible:
                    issues.append(
                        f"epoch {m.epoch} part {k}: missing file {e.path} "
                        "(vacuumed too early, or external deletion)"
                    )
                elif (
                    keep_after is not None
                    and m.kind == "delta"
                    and m.epoch > keep_after
                    and m.epoch in eff_epochs
                ):
                    warnings.append(
                        f"epoch {m.epoch} part {k}: delta {e.path} gone "
                        "but a consumer group has not acked past epoch "
                        f"{keep_after} (vacuum consumer-retention was "
                        "overridden; feed reads of that range will fail)"
                    )
                else:
                    reclaimed += 1  # superseded history, legally vacuumed
                continue
            if e.bytes and size != e.bytes:
                issues.append(
                    f"epoch {m.epoch} part {k}: {e.path} is {size} bytes, "
                    f"manifest recorded {e.bytes}"
                )
            if m.kind == "delta" and e.max_seq >= 0:
                if e.max_seq < wm.get(int(k), -1):
                    issues.append(
                        f"epoch {m.epoch} part {k}: max_seq {e.max_seq} "
                        f"regressed below watermark {wm[int(k)]}"
                    )
                wm[int(k)] = max(wm.get(int(k), -1), e.max_seq)
    latest = table.latest_epoch()
    for g in _cons.groups(table):
        pos = _cons.position(table, g)
        if pos > latest:
            issues.append(
                f"consumer group {g!r} cursor {pos} is ahead of the "
                f"committed fence {latest}"
            )
    # tags must resolve to committed epochs and their pinned epochs must
    # still be fully readable (a tag whose files were vacuumed away —
    # respect_tags=False, or the tag landed after the reclaim — is a
    # broken retention promise: an ISSUE, not a warning)
    from xgeo_ray.state import tags as _tags

    try:
        tag_map = _tags.tags(table)
    except (ValueError, KeyError, json.JSONDecodeError) as e:
        tag_map = {}
        issues.append(f"unreadable tag file: {e}")
    for name, e in sorted(tag_map.items()):
        if not (0 < e <= latest):
            issues.append(
                f"tag {name!r} points at epoch {e}, outside the committed "
                f"range 1..{latest}"
            )
            continue
        for part, paths in table.partition_files(as_of_epoch=e).items():
            for p in paths:
                if not os.path.isfile(p):
                    issues.append(
                        f"tag {name!r} (epoch {e}) pins missing file "
                        f"{os.path.relpath(p, table.root)} — vacuumed "
                        "without respect_tags?"
                    )
    unreferenced = 0
    parts_root = os.path.join(table.root, PARTS_DIR)
    if os.path.isdir(parts_root):
        for part in os.listdir(parts_root):
            d = os.path.join(parts_root, part)
            if not os.path.isdir(d):
                continue
            for name in os.listdir(d):
                if os.path.abspath(os.path.join(d, name)) not in referenced:
                    unreferenced += 1
    return {
        "ok": not issues,
        "issues": issues,
        "epochs": len(ms),
        "files_referenced": len(referenced),
        "files_unreferenced": unreferenced,
        "files_reclaimed": reclaimed,
        "warnings": warnings,
    }


def lookup(
    table: DeltaTable,
    conv_id: str,
    turn_idx: int | None = None,
    keep_lineage: bool = False,
) -> pa.Table:
    """Point lookup: the merged state of ONE conversation (optionally one
    turn) touching only the <= num_salts partitions its keys hash to —
    O(partition) I/O instead of a table scan, the read-path payoff of
    hash partitioning. Runs inline on the caller (no task round-trip:
    the data read is a handful of files)."""
    from xgeo_ray.partition import compute_part_key
    from xgeo_ray.stages.collapse import MERGE_POLICIES

    salts = np.arange(max(1, table.num_salts), dtype=np.int64)
    conv_arr = pa.array([conv_id] * len(salts))
    turn_arr = pa.array(
        salts if turn_idx is None else np.full(len(salts), turn_idx, np.int64),
        pa.int64(),
    )
    # turn_idx drives only the salt; probing every salt value covers all
    # partitions any turn of this conv can live in
    parts = {
        int(p)
        for p in compute_part_key(
            conv_arr, turn_arr, table.num_partitions, table.num_salts
        )
    }
    from xgeo_ray.partition import bloom_may_contain

    plan = table.partition_files()
    blooms = table.file_blooms()
    policy_fn = MERGE_POLICIES[table.merge_policy]["fn"]
    envelope = table.current_schema()
    aliases = table.column_aliases()
    from xgeo_ray.schemas import aliased_read_columns, apply_aliases

    tables = []
    for part in sorted(parts):
        for p in plan.get(part, []):
            # manifest bloom first: a chain file that can't hold the key
            # is skipped without even a footer read
            if p in blooms and not bloom_may_contain(blooms[p], [conv_id])[0]:
                continue
            # delta files are sorted by conv_id, so row-group statistics
            # prune this predicate to the few groups holding the key —
            # the read touches O(row-group), not the whole partition
            t = pq.read_table(
                p,
                # project to the envelope: pre-drop files still hold a
                # dropped column's bytes and cast_to fails on extras;
                # pre-rename files surface under the logical names
                columns=aliased_read_columns(
                    pq.read_schema(p).names, list(envelope.names), aliases
                ),
                use_threads=False,
                filters=[("conv_id", "==", conv_id)],
            )
            if t.num_rows:
                tables.append(apply_aliases(t, aliases))
    t = merge_versions(tables, drop_tombstones=True, policy=policy_fn)
    if t.num_rows == 0:
        base = pa.schema(
            [f for f in envelope if keep_lineage or f.name not in LINEAGE_COLS]
        )
        return base.empty_table()
    t = cast_to(t, envelope)
    if turn_idx is not None:
        t = t.filter(pc.equal(t.column("turn_idx").cast(pa.int64()), turn_idx))
    if not keep_lineage:
        t = t.drop_columns([c for c in LINEAGE_COLS if c in t.column_names])
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


@ray.remote
def _lookup_part_task(
    paths: list[str],
    conv_ids: list[str],
    envelope: pa.Schema,
    policy_fn,
    aliases: dict[str, str] | None = None,
) -> pa.Table:
    from xgeo_ray.schemas import aliased_read_columns, apply_aliases
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    tables = []
    for p in paths:
        t = pq.read_table(
            p,
            # envelope projection: see lookup() — dropped columns must
            # not surface from pre-drop files; renamed columns alias
            columns=aliased_read_columns(
                pq.read_schema(p).names, list(envelope.names), aliases
            ),
            use_threads=False,
            filters=[("conv_id", "in", conv_ids)],
        )
        if t.num_rows:
            tables.append(apply_aliases(t, aliases))
    t = merge_versions(tables, drop_tombstones=True, policy=policy_fn)
    return cast_to(t, envelope) if t.num_rows else envelope.empty_table()


def lookup_many(
    table: DeltaTable,
    conv_ids: list[str],
    keep_lineage: bool = False,
    as_of_epoch: int | None = None,
) -> pa.Table:
    """BATCH point lookup: the merged state of N conversations with one
    merge task per TOUCHED partition — each conversation's keys hash to
    at most ``num_salts`` partitions, the ``conv_id IN (...)`` predicate
    is pushed to the Parquet row-group filter, and untouched partitions
    are never opened. I/O scales with the keys requested, wall time
    with touched partitions / CPUs — not with N sequential round-trips
    (``lookup``) and not with table size (``snapshot``).

    ``as_of_epoch`` time-travels the lookup (same retention contract as
    ``snapshot(as_of_epoch=)``: the chain must predate vacuum) — the
    consistent-read primitive incremental consumers (``ivm.sync_join``)
    pin their window reads with."""
    from xgeo_ray.partition import compute_part_key
    from xgeo_ray.stages.collapse import MERGE_POLICIES

    ids = sorted(set(conv_ids))
    envelope = table.current_schema(as_of_epoch)
    if not ids:
        base = pa.schema(
            [f for f in envelope if keep_lineage or f.name not in LINEAGE_COLS]
        )
        return base.empty_table()
    salts = np.arange(max(1, table.num_salts), dtype=np.int64)
    part_ids: dict[int, set[str]] = {}
    for cid in ids:
        parts = compute_part_key(
            pa.array([cid] * len(salts)),
            pa.array(salts, pa.int64()),
            table.num_partitions,
            table.num_salts,
        )
        for p in parts:
            part_ids.setdefault(int(p), set()).add(cid)
    from xgeo_ray.partition import bloom_may_contain

    plan = table.partition_files(as_of_epoch)
    blooms = table.file_blooms(as_of_epoch)
    policy_fn = MERGE_POLICIES[table.merge_policy]["fn"]

    def _pruned(paths: list[str], want: list[str]) -> list[str]:
        # keep a file iff ANY wanted key may be present by its bloom
        return [
            p
            for p in paths
            if p not in blooms or bloom_may_contain(blooms[p], want).any()
        ]

    tasks = []
    for part, want in sorted(part_ids.items()):
        if part not in plan:
            continue
        w = sorted(want)
        paths = _pruned(plan[part], w)
        if paths:
            tasks.append((paths, w))
    aliases = table.column_aliases(as_of_epoch)
    refs = [
        _lookup_part_task.remote(paths, w, envelope, policy_fn, aliases)
        for paths, w in tasks
    ]
    tables = [t for t in ray.get(refs) if t.num_rows]
    if not tables:
        base = pa.schema(
            [f for f in envelope if keep_lineage or f.name not in LINEAGE_COLS]
        )
        return base.empty_table()
    t = pa.concat_tables(tables)  # each key merged fully in its partition
    if not keep_lineage:
        t = t.drop_columns([c for c in LINEAGE_COLS if c in t.column_names])
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def key_history(
    table: DeltaTable,
    conv_id: str,
    turn_idx: int | None = None,
    as_of_epoch: int | None = None,
) -> pa.Table:
    """Every readable committed VERSION of one conversation (optionally
    one turn), epoch-stamped — the audit/debug complement of ``lookup``
    (which merges to the current winner) and ``changes`` (whole-table
    feed): "who wrote this turn, when, and what did each write say".

    Reads only the key's <= num_salts partition chains (bloom- and
    row-group-pruned like ``lookup``), inline on the caller — no table
    scan, no merge. Rows keep ``op`` and ``seq`` (tombstones VISIBLE:
    a delete is part of the history) plus ``_epoch`` (the committing
    epoch parsed from the delta filename) and ``_folded`` (True for
    rows served by a compaction file — their pre-fold per-epoch detail
    was absorbed at that epoch; on ``history="full"`` tables folds are
    version-preserving, so every distinct (key, seq) version survives
    with full fidelity, while collapsed tables retain per-epoch
    winners until a fold and the folded winner after). The readable
    horizon is the vacuum cadence — pin an epoch with a tag
    (state/tags.py) to hold history open. Ascends by
    (turn_idx, seq)."""
    from xgeo_ray.partition import bloom_may_contain, compute_part_key
    from xgeo_ray.state.delta_table import DELTA_FILENAME_RE

    salts = np.arange(max(1, table.num_salts), dtype=np.int64)
    probe_turns = pa.array(
        salts if turn_idx is None else np.full(len(salts), turn_idx, np.int64),
        pa.int64(),
    )
    parts = {
        int(p)
        for p in compute_part_key(
            pa.array([conv_id] * len(salts)),
            probe_turns,
            table.num_partitions,
            table.num_salts,
        )
    }
    plan = table.partition_files(as_of_epoch)
    blooms = table.file_blooms()
    envelope = table.current_schema(as_of_epoch)
    aliases = table.column_aliases(as_of_epoch)
    from xgeo_ray.schemas import aliased_read_columns, apply_aliases

    out_schema = envelope.append(pa.field("_epoch", pa.int64())).append(
        pa.field("_folded", pa.bool_())
    )
    tables = []
    for part in sorted(parts):
        for p in plan.get(part, []):
            if p in blooms and not bloom_may_contain(blooms[p], [conv_id])[0]:
                continue
            t = pq.read_table(
                p,
                columns=aliased_read_columns(
                    pq.read_schema(p).names, list(envelope.names), aliases
                ),
                use_threads=False,
                filters=[("conv_id", "==", conv_id)],
            )
            if not t.num_rows:
                continue
            name = os.path.basename(p)
            m = DELTA_FILENAME_RE.match(name)
            ep = int(m.group(1)) if m else -1
            t = cast_to(apply_aliases(t, aliases), envelope)
            n = t.num_rows
            t = t.append_column(
                "_epoch", pa.array(np.full(n, ep, np.int64))
            ).append_column(
                "_folded", pa.array([name.startswith("compact-")] * n)
            )
            tables.append(t)
    if not tables:
        return out_schema.empty_table()
    t = pa.concat_tables(tables)
    if turn_idx is not None:
        t = t.filter(pc.equal(t.column("turn_idx").cast(pa.int64()), turn_idx))
    return t.sort_by([("turn_idx", "ascending"), ("seq", "ascending")])


def compact(
    table: DeltaTable,
    tombstone_ts_horizon: int | None = None,
    minor: bool = False,
) -> Manifest | None:
    """Fold each partition's visible files into one compacted file.

    Tombstones are RETAINED unless older than ``tombstone_ts_horizon``
    (µs): dropping one earlier could let a late event with a lower (ts,
    seq) resurrect a deleted row.

    ``minor`` folds ONLY the delta chain since the last FULL compaction
    (prior minor folds collapse into the new one), leaving the base
    file untouched — tiered compaction's L1: each maintenance cycle
    reads O(changes since the last full compact), not O(table), which
    is what an endless tailer on a 100 TB table must run. Merge-policy
    associativity across epochs makes the fold exact for lww, additive
    and custom policies alike; tombstones are always retained (the base
    below may still hold the deleted key). Partitions whose chain has
    fewer than two files are skipped; returns None when nothing needed
    folding. Run a FULL compact occasionally to absorb the chain into
    the base (and optionally age out tombstones)."""
    if minor and tombstone_ts_horizon is not None:
        raise ValueError(
            "tombstone aging needs the full history in view: a minor "
            "fold cannot prove the base holds no older version of a "
            "deleted key — run a full compact to age tombstones"
        )
    plan = (
        {k: v for k, v in table.partition_chain_files().items() if len(v) >= 2}
        if minor
        else table.partition_files()
    )
    if minor and not plan:
        return None
    envelope = table.current_schema()
    upto = table.latest_epoch()
    epoch = upto + 1
    root = table.root
    durable = table.durability == "full"
    token = new_commit_token()
    from xgeo_ray.stages.collapse import MERGE_POLICIES

    policy = MERGE_POLICIES[table.merge_policy]["fn"]
    stats_cols = table.stats_columns()
    # minor folds of a full-history table preserve every version (dedup
    # + sort only) so endless maintenance never costs the table its
    # exact event-time travel; a FULL compact folds to state even there
    # (that is its job — and the travel guard then applies).
    preserve_history = minor and table.history == "full"
    aliases = table.column_aliases()
    codec = table.parquet_codec()

    @ray.remote
    def compact_part(part: int, paths: list[str]) -> pa.Table:
        from xgeo_ray.tuning import limit_worker_threads

        limit_worker_threads()
        tables = _read_env_tables(paths, envelope, aliases)
        rows_in = sum(t.num_rows for t in tables)
        if preserve_history:
            from xgeo_ray.schemas import unify as _unify, cast_to as _cast
            from xgeo_ray.stages.collapse import history_dedup

            tgt = _unify(*[x.schema for x in tables])
            t = history_dedup(
                pa.concat_tables([_cast(x, tgt) for x in tables])
            )[0]
        else:
            t = merge_versions(tables, drop_tombstones=False, policy=policy)
        if tombstone_ts_horizon is not None:
            is_d = pc.equal(t.column("op"), "D")
            old = pc.less(
                t.column("ts").cast(pa.int64()),
                pa.scalar(tombstone_ts_horizon, pa.int64()),
            )
            t = t.filter(pc.invert(pc.and_(is_d, old)))
        t = cast_to(t, envelope)
        entry = PartitionEntry(
            part_key=part,
            path=delta_relpath(part, epoch, compact=True, token=token),
            rows_in=rows_in,
            applied=t.num_rows,
            tombstones=int(pc.sum(pc.equal(t.column("op"), "D")).as_py() or 0),
            max_seq=int(pc.max(t.column("seq")).as_py()) if t.num_rows else -1,
            max_ts=int(pc.max(t.column("ts")).cast(pa.int64()).as_py())
            if t.num_rows
            else -1,
            min_ts=int(pc.min(t.column("ts")).cast(pa.int64()).as_py())
            if t.num_rows
            else -1,
        )
        if t.num_rows:
            from xgeo_ray.partition import build_key_bloom

            entry.bloom = build_key_bloom(
                t.column("conv_id").to_numpy(zero_copy_only=False)
            )
            entry.stats = _column_stats_json(t, stats_cols)
        entry.bytes = _atomic_write_parquet(
            t, os.path.join(root, entry.path), durable=durable, codec=codec
        )
        return _entry_to_table(entry)

    # one raw merge task per partition (same executor-latency sidestep as
    # snapshot/export); results are tiny metric rows
    refs = [compact_part.remote(k, v) for k, v in sorted(plan.items())]
    entries = [
        PartitionEntry(**{k: (v if k in ("path", "bloom", "stats") else int(v)) for k, v in row.items()})
        for t in ray.get(refs)
        for row in t.to_pylist()
    ]
    # watermarks must survive compaction even for partitions whose rows all
    # compacted away (deleted): keep prior max_seq per partition
    wm = table.watermarks()
    for e in entries:
        e.max_seq = max(e.max_seq, int(wm[e.part_key]))
    if os.environ.get("XGEO_CRASH_BEFORE_COMPACT_COMMIT"):
        os._exit(137)  # crash-injection hook: compacted files are orphans
    return table.commit_epoch(
        epoch,
        [],
        entries,
        envelope,
        kind="compact_minor" if minor else "compact",
        replaces_up_to=upto,
    )


def vacuum(
    table: DeltaTable,
    respect_consumers: bool = True,
    respect_tags: bool = True,
) -> dict:
    """Delete partition files superseded by a committed compaction —
    the storage-reclaim half of compact() (which rewrites but never
    deletes, so a long-running table otherwise accumulates every epoch's
    deltas forever).

    Deletes exactly the files that (a) live under parts/, (b) belong to
    an epoch at or below the latest COMMITTED epoch, and (c) are not
    referenced by the current visible view (partition_files) — this
    covers superseded deltas AND losing-attempt token files (a crashed
    or fence-losing driver's data, reclaimable once its epoch number is
    committed by the winner). Files from epochs above the committed
    fence are left alone: they belong to an in-flight or crashed epoch —
    the former must not lose its pre-commit deltas, the latter is
    reclaimed after a later attempt commits that epoch. Also unlinks
    ``*.tmp-<pid>`` leftovers from writers that crashed between
    pq.write_table and publish, once they are older than the latest
    committed manifest (no live writer can still be racing them).
    Readers that planned a snapshot before a compact committed should
    finish before vacuuming (same reader-grace contract as any LSM
    store).

    ``respect_consumers`` (DEFAULT): also keep superseded delta files
    of epochs still AHEAD of the slowest registered consumer group's
    cursor (state/consumers.py) — the changes feed reads delta files,
    so this turns the documented "size the vacuum cadence to the
    slowest consumer's lag" contract into an enforced one. A group that
    never acks then blocks reclaim indefinitely; drop the group or pass
    ``respect_consumers=False`` to override — fsck will then surface
    the consumer gap as a WARNING (not corruption) until the group
    catches up or is dropped.

    ``respect_tags`` (DEFAULT): also keep every file visible as of any
    TAGGED epoch (state/tags.py), so
    ``snapshot(as_of_epoch=tags[name])`` stays readable across
    compact + vacuum until the tag is deleted — named savepoints are a
    retention guarantee, not a hint."""
    import re as _re

    keep_after = None
    if respect_consumers:
        from xgeo_ray.state import consumers as _cons

        keep_after = _cons.min_cursor(table)
    visible = {
        os.path.abspath(p)
        for paths in table.partition_files().values()
        for p in paths
    }
    if respect_tags:
        from xgeo_ray.state import tags as _tags

        for e in set(_tags.tags(table).values()):
            for paths in table.partition_files(as_of_epoch=e).values():
                visible.update(os.path.abspath(p) for p in paths)
    if keep_after is not None:
        # protect the committed (manifest-referenced) delta files of
        # epochs an unacked consumer still needs — losing-attempt token
        # files of the same epochs stay reclaimable (no manifest lists
        # them, so no feed reader will ever open them)
        for m in table.manifests():
            if m.kind == "delta" and m.epoch > keep_after:
                for e in m.partitions.values():
                    if e.path:
                        visible.add(
                            os.path.abspath(os.path.join(table.root, e.path))
                        )
    latest = table.latest_epoch()
    from xgeo_ray.state.delta_table import DELTA_FILENAME_RE as pat

    tmp_pat = _re.compile(r"\.tmp-\d+$")
    from xgeo_ray.state.manifest import manifest_path

    tmp_horizon = -1.0
    if latest > 0:
        try:
            tmp_horizon = os.path.getmtime(manifest_path(table.root, latest))
        except FileNotFoundError:
            pass
    deleted = 0
    bytes_freed = 0
    # delete_where attempts stage under backfill/<id>.d.stage-<pid>/;
    # a writer that died mid-stage leaves the dir orphaned — reclaim
    # once it predates the latest committed manifest (no live attempt)
    backfill_root = os.path.join(table.root, "backfill")
    if os.path.isdir(backfill_root):
        import shutil as _shutil

        for name in sorted(os.listdir(backfill_root)):
            if ".stage-" not in name:
                continue
            full = os.path.join(backfill_root, name)
            try:
                if os.path.getmtime(full) < tmp_horizon:
                    bytes_freed += sum(
                        os.path.getsize(os.path.join(r, f))
                        for r, _, fs in os.walk(full)
                        for f in fs
                    )
                    _shutil.rmtree(full, ignore_errors=True)
                    deleted += 1
            except FileNotFoundError:
                pass
    parts_root = os.path.join(table.root, PARTS_DIR)
    if not os.path.isdir(parts_root):
        return {"deleted": deleted, "bytes_freed": bytes_freed}
    for part in sorted(os.listdir(parts_root)):
        d = os.path.join(parts_root, part)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            full = os.path.abspath(os.path.join(d, name))
            if tmp_pat.search(name):
                try:
                    if os.path.getmtime(full) < tmp_horizon:
                        bytes_freed += os.path.getsize(full)
                        os.remove(full)
                        deleted += 1
                except FileNotFoundError:
                    pass
                continue
            mm = pat.match(name)
            if not mm or int(mm.group(1)) > latest:
                continue
            if full in visible:
                continue
            bytes_freed += os.path.getsize(full)
            os.remove(full)
            deleted += 1
    return {"deleted": deleted, "bytes_freed": bytes_freed}


@ray.remote
def _export_part(
    part: int,
    paths: list[str],
    envelope: pa.Schema,
    out_dir: str,
    keep_lineage: bool,
    policy: str = "lww",
    aliases: dict[str, str] | None = None,
):
    """Merge-and-write one partition's visible files to the export dir;
    skipped entirely when the output file already exists (resume)."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    final = os.path.join(out_dir, f"part-{part:05d}.parquet")
    if os.path.exists(final):
        return (part, -1)
    tables = _read_env_tables(paths, envelope, aliases)
    t = merge_versions(tables, drop_tombstones=True, policy=policy)
    t = cast_to(t, envelope)
    if not keep_lineage:
        t = t.drop_columns(LINEAGE_COLS)
    _atomic_write_parquet(t, final)
    return (part, t.num_rows)


def _stream_cuts(table: DeltaTable) -> list[tuple[int, int, int]]:
    """Per STREAM epoch of ``table``: (epoch, cumulative max applied
    seq, epoch min applied seq). Out-of-band epochs (bootstraps,
    corrections, predicate deletes — totals["oob"]) and compactions
    carry no stream position and are skipped; they ride with whatever
    epoch pin contains them. min = -1 on pre-min_seq manifests
    (consistent cuts then degrade conservatively)."""
    out: list[tuple[int, int, int]] = []
    cum = -1
    for m in table.effective_manifests():
        if m.kind != "delta" or m.totals.get("oob"):
            continue
        mx = max((e.max_seq for e in m.partitions.values()), default=-1)
        if mx < 0:
            continue
        cum = max(cum, mx)
        # the epoch's true stream start comes from totals["min_seq"]
        # (segment parquet stats at commit time); per-PARTITION entry
        # minima would OVERSTATE it — the map-side pre-collapse absorbs
        # superseded rows, so surviving-row minima miss covered events
        out.append((m.epoch, cum, int(m.totals.get("min_seq", -1))))
    return out


def group_snapshot_plan(
    tables: dict[str, DeltaTable], upto_seq: int | None = None
) -> dict:
    """MUTUALLY CONSISTENT epoch pins for tables fed from ONE seq-ordered
    change stream (the demux fan-out: one binlog routed into per-table
    WALs, each ingested independently — sources/demux.py). Returns
    ``{"cut_seq": S, "epochs": {name: epoch}}`` such that every table's
    ``snapshot(as_of_epoch=epochs[name])`` reflects exactly the events
    of the shared stream with seq <= S that were routed to it — so a
    consumer joining the routed tables sees ONE prefix of the source
    stream, never table A ahead of table B.

    ``upto_seq``: manifests alone cannot distinguish a route that
    applied everything from one that lags (unapplied backlog is
    invisible), so the DEFAULT starting cut is the slowest table's
    applied high watermark — always safe, but it can step down across
    a straddling epoch even when every route is fully caught up. A
    caller that KNOWS the producer's high watermark (the demux marker
    position, the binlog offset) passes it as ``upto_seq`` to certify
    the full prefix: the caller asserts every stream event <= upto_seq
    is either committed or visible as a later epoch in some manifest.

    The cut is the GREATEST fixpoint at or below that start: pin each
    table at its
    largest stream epoch whose cumulative max seq <= S; the pin is
    consistent unless the table's NEXT epoch holds an event with seq
    <= S (its recorded min_seq), in which case S drops just below that
    event and the pinning repeats. Routes interleave on the shared seq
    axis, so gaps are the norm — a cut may sit strictly between one
    route's epochs as long as no unapplied event falls under it. The
    fixpoint handles epochs that batch several input segments (a route
    whose epoch straddles S steps back a whole epoch, which can lower
    the cut for everyone else). Legacy manifests without min_seq
    degrade conservatively (the next epoch is assumed to start right
    after the pinned one).

    Requires each table to apply its route's events in seq order (the
    demux + run_stream/tail contract). Out-of-band epochs (corrections,
    bootstraps) have no stream position: they are included by the epoch
    pin when committed at or below it — group consistency is a STREAM
    property. Retention: the pinned epochs must predate vacuum; use
    ``group_tag`` to hold a cut readable.

    Published shape: consistent-cut snapshots over independently
    consumed partitions (Chandy-Lamport / Kafka read-committed group
    offsets); no reference counterpart (stateless CLI)."""
    cuts = {name: _stream_cuts(t) for name, t in tables.items()}
    if any(not c for c in cuts.values()):
        # some table has applied nothing of the stream: only the empty
        # prefix is provably consistent (its route's backlog is unknown)
        return {"cut_seq": -1, "epochs": {n: 0 for n in tables}}
    if upto_seq is None:
        S = min(c[-1][1] for c in cuts.values())
    else:
        S = int(upto_seq)
    while S >= 0:
        epochs: dict[str, int] = {}
        drop_to = None  # highest S' < S that could clear all violations
        for name, c in cuts.items():
            pin, pin_cum = 0, -1
            nxt = None  # first UNAPPLIED event's seq on this route
            for e, cum, mn in c:
                if cum <= S:
                    pin, pin_cum = e, cum
                else:
                    # the straddling epoch's smallest event; unknown
                    # (legacy manifest) => assume it starts right after
                    # the pinned epoch (conservative, never wrong)
                    nxt = mn if mn >= 0 else pin_cum + 1
                    break
            epochs[name] = pin
            if nxt is not None and nxt <= S:
                cand = nxt - 1
                drop_to = cand if drop_to is None else min(drop_to, cand)
        if drop_to is None:
            return {"cut_seq": S, "epochs": epochs}
        S = drop_to
    return {"cut_seq": -1, "epochs": {n: 0 for n in tables}}


def group_snapshot(
    tables: dict[str, DeltaTable],
    upto_seq: int | None = None,
    columns: dict[str, list[str]] | None = None,
) -> dict:
    """``group_snapshot_plan`` + the pinned merge-on-read Datasets:
    ``{"cut_seq", "epochs", "datasets": {name: Dataset}}`` — each
    dataset is ``snapshot(table, as_of_epoch=pin)`` so the group reads
    one consistent stream prefix (see the plan's contract)."""
    plan = group_snapshot_plan(tables, upto_seq)
    plan["datasets"] = {
        name: snapshot(
            t,
            as_of_epoch=plan["epochs"][name],
            columns=None if columns is None else columns.get(name),
        )
        for name, t in tables.items()
    }
    return plan


def group_tag(
    tables: dict[str, DeltaTable], name: str, upto_seq: int | None = None
) -> dict:
    """Pin a consistent cut DURABLY: compute ``group_snapshot_plan`` and
    tag every table at its pinned epoch under one shared tag name
    (state/tags.py — ``vacuum(respect_tags=True)`` then keeps the cut
    readable on every table). ``upto_seq`` passes through to the plan:
    a caller holding the producer high watermark (demux marker
    position) certifies a caught-up full-prefix cut instead of the
    conservative slowest-watermark default. Returns the plan."""
    from xgeo_ray.state import tags as _tags

    plan = group_snapshot_plan(tables, upto_seq=upto_seq)
    if plan["cut_seq"] < 0:
        raise ValueError(
            "no consistent cut exists yet (some table has applied no "
            "stream epochs) — ingest all routes first"
        )
    for tname, t in tables.items():
        _tags.tag(t, name, epoch=plan["epochs"][tname])
    return plan


def export_snapshot(
    table: DeltaTable, out_dir: str, keep_lineage: bool = False
) -> dict[str, int]:
    """Write the merged table state as partitioned Parquet — ONE file per
    hash partition (``part-NNNNN.parquet``), each internally sorted by
    (conv_id, turn_idx). Resumable: partitions whose output file already
    exists are skipped, so a failed export re-run finishes only the
    remainder (delete the directory for a fresh export)."""
    os.makedirs(out_dir, exist_ok=True)
    plan = table.partition_files()
    envelope = table.current_schema()
    from xgeo_ray.stages.collapse import MERGE_POLICIES

    policy_fn = MERGE_POLICIES[table.merge_policy]["fn"]
    aliases = table.column_aliases()
    refs = [
        _export_part.remote(
            part, paths, envelope, out_dir, keep_lineage, policy_fn, aliases
        )
        for part, paths in sorted(plan.items())
    ]
    results = ray.get(refs)
    return {
        "partitions": len(results),
        "written": sum(1 for _, n in results if n >= 0),
        "skipped": sum(1 for _, n in results if n < 0),
        "rows_written": sum(n for _, n in results if n > 0),
    }


def assemble_conversations(
    table: DeltaTable,
    sep: str = "\n",
    role_sep: str = ": ",
    as_of_epoch: int | None = None,
    convs: list[str] | None = None,
) -> ray.data.Dataset:
    """Assemble each conversation's merged turns into ONE training
    document — the transcripts-payload flagship transform: rows
    (conv_id, turn_idx, role, text) become (conv_id, n_turns, doc)
    where ``doc`` is ``role: text`` lines joined by ``sep`` in turn
    order.

    Scale shape: ZERO shuffle. ``snapshot()`` emits one merge task per
    hash partition whose output is partition-local sorted by
    (conv_id, turn_idx), and a conversation lives in exactly one
    partition — so assembly is a per-block segmented reduce: one Arrow
    ``not_equal`` pass finds conversation boundaries, one
    ``LargeListArray`` wrap + ``binary_join`` emits every document in
    the block vectorized (no per-conversation Python). Large offsets
    throughout: a partition's cumulative text may exceed 2 GiB.

    ``convs`` restricts assembly to those conversations: partitions no
    requested conversation hashes into are never opened (the
    lookup_many prune), surviving merge output row-filters to the set —
    the incremental-sync path where only changed conversations
    re-assemble.

    The reference has no counterpart (per-record stream CLI,
    /root/reference/cmd/xgeo/main.go); this is the table→training-doc
    bridge a transcript lake needs."""
    if not table.partition_files(as_of_epoch=as_of_epoch):
        # empty table: emit the typed empty result directly (empty
        # blocks lose their schema through the object store)
        return ray.data.from_arrow(
            pa.table(
                {
                    "conv_id": pa.array([], pa.string()),
                    "n_turns": pa.array([], pa.int64()),
                    "doc": pa.array([], pa.large_string()),
                }
            )
        )
    want_parts = None
    if convs is not None:
        if not convs:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "conv_id": pa.array([], pa.string()),
                        "n_turns": pa.array([], pa.int64()),
                        "doc": pa.array([], pa.large_string()),
                    }
                )
            )
        from xgeo_ray.partition import compute_part_key

        # ONE vectorized hash over the (conv × salt) cross product —
        # a per-conversation loop here is serial driver time on every
        # incremental sync (100k touched convs = 100k tiny hash calls).
        ns = max(1, table.num_salts)
        conv_list = list(convs)
        pk = compute_part_key(
            pa.array(np.repeat(np.asarray(conv_list, dtype=object), ns)),
            pa.array(np.tile(np.arange(ns, dtype=np.int64), len(conv_list))),
            table.num_partitions,
            table.num_salts,
        )
        want_parts = sorted(int(p) for p in np.unique(pk))
    ds = snapshot(
        table,
        columns=["conv_id", "turn_idx", "role", "text"],
        as_of_epoch=as_of_epoch,
        partitions=want_parts,
    )
    if convs is not None:
        conv_set = pa.array(sorted(set(convs)), pa.string())
        ds = ds.map_batches(
            lambda b, cs=conv_set: b.filter(
                pc.is_in(b.column("conv_id"), value_set=cs)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    if table.num_salts <= 1:
        # unsalted: a conversation lives in exactly one partition and
        # snapshot blocks are already (conv, turn)-sorted — zero shuffle
        def assemble(b: pa.Table) -> pa.Table:
            return _assemble_block(b, sep, role_sep)

        return ds.map_batches(assemble, batch_format="pyarrow")
    # SALTED table: the salt XOR scatters one conversation's turns
    # across up to num_salts partitions, so turns must co-locate once —
    # a single conv-keyed radix exchange (the repo's bucketed-cogroup
    # shape: blocks split by unsalted conv hash, one reduce per bucket
    # sorts + assembles). Text crosses the wire exactly once; this is
    # the minimum movement the semantics allow.
    from xgeo_ray.functions.dedup import _auto_buckets

    refs = ds.to_arrow_refs()
    nb = _auto_buckets(len(refs))
    split = [
        _asm_split.options(num_returns=nb if nb > 1 else None).remote(r, nb)
        for r in refs
    ]
    if nb == 1:
        split = [[s] for s in split]
    reduced = [
        _asm_reduce.remote(sep, role_sep, *[s[b] for s in split])
        for b in range(nb)
    ]
    return ray.data.from_arrow_refs(reduced)


def _assemble_block(b: pa.Table, sep: str, role_sep: str) -> pa.Table:
    """Segmented vectorized assembly of ONE (conv, turn)-sorted block:
    boundary scan via Arrow not_equal, per-conv join via LargeListArray
    + binary_join — no per-conversation Python."""
    if b.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "doc": pa.array([], pa.large_string()),
            }
        )
    conv = b.column("conv_id").combine_chunks()
    line = pc.binary_join_element_wise(
        pc.fill_null(pc.cast(b.column("role"), pa.large_string()), ""),
        pc.fill_null(pc.cast(b.column("text"), pa.large_string()), ""),
        pa.scalar(role_sep, pa.large_string()),
    )
    if isinstance(line, pa.ChunkedArray):
        line = line.combine_chunks()
    neq = pc.not_equal(conv.slice(1), conv.slice(0, len(conv) - 1))
    starts = np.flatnonzero(
        np.concatenate(([True], neq.to_numpy(zero_copy_only=False)))
    )
    offsets = np.concatenate((starts, [len(conv)])).astype(np.int64)
    docs = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), line),
        pa.scalar(sep, pa.large_string()),
    )
    return pa.table(
        {
            "conv_id": pc.cast(conv.take(pa.array(starts)), pa.string()),
            "n_turns": pa.array(np.diff(offsets), pa.int64()),
            "doc": docs,
        }
    )


@ray.remote
def _asm_split(block: pa.Table, nb: int):
    """Split one snapshot block by UNSALTED conv hash into nb bucket
    slices (the radix-exchange map side)."""
    from xgeo_ray.partition import hash_conv_ids
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    conv = np.asarray(
        block.column("conv_id").to_numpy(zero_copy_only=False), dtype=object
    )
    h = (hash_conv_ids(conv) % np.uint64(nb)).astype(np.int64)
    order = np.argsort(h, kind="stable")
    sorted_tbl = block.take(pa.array(order))
    bounds = np.searchsorted(h[order], np.arange(nb + 1))
    out = [sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(nb)]
    return out if nb > 1 else out[0]


@ray.remote
def _asm_reduce(sep: str, role_sep: str, *slices: pa.Table) -> pa.Table:
    """Concat one bucket's slices from every block, restore (conv, turn)
    order, assemble (the radix-exchange reduce side)."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    live = [s for s in slices if s.num_rows]
    if not live:
        return _assemble_block(pa.table({}), sep, role_sep)
    t = pa.concat_tables(live, promote_options="default")
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    return _assemble_block(t, sep, role_sep)


@ray.remote
def _window_convs_task(path: str) -> pa.Array:
    """Unique conv_ids of one window delta file — a key-column-only read."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    return pc.unique(
        pq.read_table(path, columns=["conv_id"], use_threads=False).column(
            "conv_id"
        ).combine_chunks()
    )


def sync_assembled(
    source: DeltaTable,
    sink: DeltaTable,
    sep: str = "\n",
    role_sep: str = ": ",
    upto_epoch: int | None = None,
    max_convs_per_batch: int = 100_000,
) -> dict:
    """Maintain an ASSEMBLED-CONVERSATIONS table incrementally from the
    source's committed change feed: each sync re-assembles ONLY the
    conversations touched by the window's delta epochs (key-column-only
    window reads → `assemble_conversations(convs=...)`, which opens
    only the partitions those conversations hash into) and upserts the
    documents into ``sink`` keyed (conv_id, 0); conversations whose
    turns are all gone tombstone their document. The training corpus
    follows the CDC stream at change-volume cost — a conversation that
    never changed is never re-read, re-assembled or re-written.

    Cursor: a consumer group on the SOURCE (fence-committed acks, named
    for the sink root). Commit order: sink upserts (``apply_changes``
    batches, exactly-once by batch id) THEN ack — a crash between them
    replays a window whose re-assembly is convergent (same docs upsert
    under LWW; replayed batch ids no-op when the window is identical).
    Retention: sync before vacuum reclaims window deltas, the
    ``changes()`` contract.

    Driver memory: O(touched conversations) ids, plus ONE chunk's
    assembled docs at a time — the touched-conv set is split into
    deterministic sub-batches of at most ``max_convs_per_batch``
    conversations (sorted conv order, ``-c{i:05d}`` batch-id suffix),
    each assembled and applied separately, so even a bootstrap-sized
    window (first sync against a large existing source) never
    materializes the whole corpus on the driver. Readers between chunk
    commits see a consistent prefix of the window (each conversation's
    doc row is individually exact as of ``upto``). Create ``sink``
    with ``base_schema=ASSEMBLED_SCHEMA``; num_salts=1 is right (one
    row per conversation)."""
    import hashlib

    from xgeo_ray.pipelines.ivm import _window_plan
    from xgeo_ray.state import consumers as _cons

    sink_id = hashlib.sha1(
        os.path.abspath(sink.root).encode()
    ).hexdigest()[:10]
    group = f"assembled-{sink_id}"
    since = _cons.position(source, group)
    upto = source.latest_epoch() if upto_epoch is None else upto_epoch
    if upto <= since:
        return {"synced_epochs": 0, "convs": 0, "last_epoch": since}
    window = _window_plan(source, since, upto)
    files = [p for fl in window.values() for p, _ in fl]
    epochs = {e for fl in window.values() for _, e in fl}
    uniq = ray.get([_window_convs_task.remote(p) for p in files])
    convs_all = sorted(
        {c for arr in uniq for c in arr.to_pylist() if c is not None}
    )
    if max_convs_per_batch < 1:
        raise ValueError("max_convs_per_batch must be >= 1")
    deleted = 0
    for ci in range(0, len(convs_all), max_convs_per_batch):
        convs = convs_all[ci : ci + max_convs_per_batch]
        ds = assemble_conversations(
            source, sep, role_sep, as_of_epoch=upto, convs=convs
        )
        # O(one chunk) — the apply batch is driver-side by design
        blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
        done = (
            pa.concat_tables(blocks, promote_options="permissive")
            if blocks
            else None
        )
        assembled_ids = (
            set(done.column("conv_id").to_pylist())
            if done is not None
            else set()
        )
        gone = sorted(set(convs) - assembled_ids)
        deleted += len(gone)
        cols: dict[str, list] = {
            "conv_id": [], "n_turns": [], "doc": [], "op": []
        }
        if done is not None:
            cols["conv_id"] = done.column("conv_id").to_pylist()
            cols["n_turns"] = done.column("n_turns").to_pylist()
            cols["doc"] = done.column("doc").to_pylist()
            cols["op"] = ["U"] * done.num_rows
        cols["conv_id"] += gone
        cols["n_turns"] += [0] * len(gone)
        cols["doc"] += [None] * len(gone)
        cols["op"] += ["D"] * len(gone)
        if cols["conv_id"]:
            batch = pa.table(
                {
                    "conv_id": pa.array(cols["conv_id"], pa.string()),
                    "turn_idx": pa.array(
                        [0] * len(cols["conv_id"]), pa.int32()
                    ),
                    "n_turns": pa.array(cols["n_turns"], pa.int64()),
                    "doc": pa.array(cols["doc"], pa.large_string()),
                    "op": pa.array(cols["op"], pa.string()),
                }
            )
            apply_changes(
                sink,
                batch,
                batch_id=(
                    f"{group}-e{since + 1}-{upto}"
                    f"-c{ci // max_convs_per_batch:05d}"
                ),
            )
        if os.environ.get("XGEO_CRASH_AFTER_ASM_CHUNK") == str(
            ci // max_convs_per_batch
        ):
            os._exit(137)  # crash hook: this chunk applied, cursor not acked
    _cons.ack(source, group, upto)
    return {
        "synced_epochs": len(epochs),
        "convs": len(convs_all),
        "deleted": deleted,
        "last_epoch": upto,
    }


def export_shuffled(
    table: DeltaTable,
    out_dir: str,
    num_shards: int,
    salt: int = 0,
    columns: list[str] | None = None,
    fmt: str = "parquet",
) -> dict[str, int]:
    """Write the merged table state as ``num_shards`` Parquet shard
    files in a DETERMINISTIC pseudorandom row order — the
    global-shuffle-before-training export. Each row's order key is the
    Fibonacci mix of (siphash64(conv_id), turn_idx, salt): shard =
    well-mixed high bits mod ``num_shards``, rows within a shard sorted
    by the key — so the permutation is reproducible across runs and
    machines, and a new ``salt`` yields a fresh independent order (one
    per training epoch; the salt enters as an avalanched XOR mask —
    ``relational.salt_mix`` — because an additive salt would merely
    translate the key space and reproduce the same cyclic order).
    Resumable like ``export_snapshot``: shards whose file already
    exists are skipped BEFORE the shuffle (their rows never leave the
    merge tasks); delete a file to rewrite just that shard. Shards
    assigned zero rows still get an (empty) file, so all ``num_shards``
    files exist afterwards and a resumed export converges instead of
    re-shuffling forever.

    Scale shape: per-partition merge tasks → streaming shard
    assignment → ONE shuffle keyed on shard → one vectorized sort +
    atomic write per shard. Size ``num_shards`` so a shard fits a
    worker (it is also your training-file size).

    ``fmt``: ``"parquet"`` (default), ``"jsonl"`` or ``"jsonl.gz"`` —
    training loaders that stream line-delimited JSON read the same
    deterministic order; the format is pinned in the resume meta."""
    from xgeo_ray.partition import hash_conv_ids

    import json as _json

    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    exts = {"parquet": ".parquet", "jsonl": ".jsonl", "jsonl.gz": ".jsonl.gz"}
    if fmt not in exts:
        raise ValueError(f"fmt must be one of {sorted(exts)}")
    ext = exts[fmt]
    os.makedirs(out_dir, exist_ok=True)
    # resume guard: existing shard files are only reusable if they were
    # written with the SAME placement function — resuming across a
    # different salt / shard count / hash version would silently drop
    # rows into "done" shards and duplicate others
    meta = {
        "salt": int(salt) & 0xFFFFFFFFFFFFFFFF,
        "num_shards": num_shards,
        "columns": columns,
        "hash": "sip64+turn^saltmix*fib-v2",
        "fmt": fmt,
    }
    meta_path = os.path.join(out_dir, "_shuffle_meta.json")
    _refuse_foreign_export_meta(out_dir, "_shuffle_meta.json")
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            prev = _json.load(f)
        prev.setdefault("fmt", "parquet")  # pre-fmt exports were parquet
        if prev != meta:
            raise ValueError(
                f"export dir {out_dir!r} was written with a different "
                f"shuffle spec {prev} (requested {meta}): resuming would "
                "corrupt shard membership — use a fresh directory (or "
                "delete this one)."
            )
    else:
        tmp_meta = meta_path + f".tmp-{os.getpid()}"
        with open(tmp_meta, "w") as f:
            _json.dump(meta, f)
        os.replace(tmp_meta, meta_path)
    done = {
        s
        for s in range(num_shards)
        if os.path.isfile(os.path.join(out_dir, f"shard-{s:05d}{ext}"))
    }
    if len(done) == num_shards:
        return {"shards": num_shards, "written": 0, "skipped": num_shards,
                "rows_written": 0}
    need = columns
    if columns is not None:
        need = list(dict.fromkeys(["conv_id", "turn_idx"] + list(columns)))
    snap = snapshot(table, columns=need)
    from xgeo_ray.functions.relational import salt_mix

    mix = np.uint64(0x9E3779B97F4A7C15)
    mask = salt_mix(salt)
    nshard = np.uint64(num_shards)
    done_arr = np.zeros(num_shards, dtype=bool)
    for s in done:
        done_arr[s] = True
    durable = table.durability == "full"

    def assign(batch: pa.Table) -> pa.Table:
        conv = np.asarray(
            batch.column("conv_id").to_numpy(zero_copy_only=False), dtype=object
        )
        turn = (
            batch.column("turn_idx")
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        with np.errstate(over="ignore"):
            k = ((hash_conv_ids(conv) + turn) ^ mask) * mix
        shard = ((k >> np.uint64(24)) % nshard).astype(np.int64)
        batch = batch.append_column("shard", pa.array(shard)).append_column(
            "_h", pa.array(k)
        )
        keep = ~done_arr[shard]  # finished shards never cross the shuffle
        return batch if keep.all() else batch.filter(pa.array(keep))

    def write_shard(g: pa.Table) -> pa.Table:
        from xgeo_ray.tuning import limit_worker_threads

        limit_worker_threads()
        s = int(g.column("shard")[0].as_py())
        path = os.path.join(out_dir, f"shard-{s:05d}{ext}")
        order = pc.sort_indices(g.column("_h"))
        out = g.take(order).drop_columns(["shard", "_h"])
        if fmt == "parquet":
            _atomic_write_parquet(out, path, durable=durable)
        else:
            _atomic_write_jsonl(out, path, durable=durable)
        return pa.table(
            {"shard": pa.array([s], pa.int64()),
             "rows": pa.array([out.num_rows], pa.int64())}
        )

    write_shard.__name__ = "write_shard"
    stats = (
        snap.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .to_pandas()
    )
    # shards assigned no rows produce no group — write their (empty)
    # files so the shard set is complete and the next run fast-paths
    produced = set(stats["shard"].tolist()) if len(stats) else set()
    env = table.current_schema()
    if columns is None:
        out_fields = [f for f in env if f.name not in LINEAGE_COLS]
    else:
        # match the POPULATED shards' column order exactly (the merge
        # tasks select in `need` order) — mixed orders in one directory
        # break fixed-schema readers and concat
        by_name = {f.name: f for f in env}
        out_fields = [by_name[c] for c in need if c in by_name]
    n_empty = 0
    for s in range(num_shards):
        if s in done or s in produced:
            continue
        empty_path = os.path.join(out_dir, f"shard-{s:05d}{ext}")
        if fmt == "parquet":
            _atomic_write_parquet(
                pa.schema(out_fields).empty_table(), empty_path, durable=durable
            )
        else:
            _atomic_write_jsonl(
                pa.schema(out_fields).empty_table(), empty_path, durable=durable
            )
        n_empty += 1
    return {
        "shards": num_shards,
        "written": int(len(stats)) + n_empty,
        "skipped": int(len(done)),
        "rows_written": int(stats["rows"].sum()) if len(stats) else 0,
    }


def tail(
    table: DeltaTable,
    wal_dir: str,
    poll_interval_s: float = 0.5,
    segments_per_epoch: int = 8,
    idle_polls_to_stop: int | None = None,
    stable_for_s: float = 0.2,
    compact_every_epochs: int | None = None,
    compact_minor: bool = False,
    vacuum_after_compact: bool = False,
    vacuum_respect_consumers: bool = True,
    allowed_lateness_us: int = 0,
    on_watermark_advance=None,
    on_commit=None,
    lease_holder: str | None = None,
    lease_ttl_s: float = 30.0,
    dlq_dir: str | None = None,
) -> list[Manifest]:
    """Follow a WAL directory and apply new segments as they land — the
    'binlog tailer' entry point. Micro-batch streaming: each poll that
    finds enough new *stable* segments (mtime older than
    ``stable_for_s``, so half-written files are never read) runs one or
    more fenced epochs via run_stream, which also makes tailing
    resumable: restart the tailer and it continues from the committed
    manifests.

    ``idle_polls_to_stop`` bounds the loop for tests/batch drains
    (None = run forever). Returns the manifests committed.

    ``compact_every_epochs`` runs background maintenance inline: after
    every N committed delta epochs the tailer folds each partition's
    delta chain (compact) and, with ``vacuum_after_compact``, reclaims
    the superseded files — keeping merge-on-read cost bounded on an
    endless stream without an external scheduler. ``compact_minor``
    makes each maintenance cycle a MINOR fold (delta chain only —
    O(changes) per cycle, the right mode for an endless stream; run a
    full compact out-of-band to absorb the chain into the base).
    The embedded vacuum
    respects registered consumer-group cursors by DEFAULT (an unattended
    tailer must not reclaim deltas a lagging changes()-feed consumer
    still needs); pass ``vacuum_respect_consumers=False`` to reclaim
    regardless.

    ``on_watermark_advance(watermark_us, table)`` is the EVENT-TIME
    trigger: after each committed batch it fires iff the global
    event-time watermark (min over partitions of max applied ts, minus
    ``allowed_lateness_us`` — see DeltaTable.event_time_watermark)
    advanced, so a downstream consumer can close time windows / refresh
    views up to ``watermark_us`` exactly once per advance. Events older
    than the watermark still apply correctly (LWW by ts) and surface in
    the per-epoch ``late`` lineage total — monitor it to size
    ``allowed_lateness_us``.

    ``on_commit(manifests, table)`` fires after every committed batch
    (before inline maintenance) — the hook where incremental views
    follow the stream live: call ``ivm.sync_agg`` / ``ivm.sync_index``
    / ``sync_assembled`` inside it and each is exactly-once from its
    own cursor, so a hook that crashes or a restarted tailer never
    double-applies. Keep hooks change-volume-cheap; they run on the
    tailer's thread between polls.

    ``lease_holder`` takes the ADVISORY writer lease before tailing and
    renews it every poll: a second tailer on the same table fails fast
    at startup (state/lease.py) instead of losing every fence race
    after doing the work. Correctness never depends on it — the fence
    still serializes commits."""
    import time as _time

    from xgeo_ray.sources.wal import is_supported_segment
    from xgeo_ray.state import lease as _lease

    if lease_holder is not None:
        _lease.acquire(table, lease_holder, ttl_s=lease_ttl_s)
    try:
        return _tail_loop(
            table,
            wal_dir,
            poll_interval_s,
            segments_per_epoch,
            idle_polls_to_stop,
            stable_for_s,
            compact_every_epochs,
            compact_minor,
            vacuum_after_compact,
            vacuum_respect_consumers,
            allowed_lateness_us,
            on_watermark_advance,
            on_commit,
            lease_holder,
            dlq_dir,
        )
    finally:
        if lease_holder is not None:
            _lease.release(table, lease_holder)


def _tail_loop(
    table,
    wal_dir,
    poll_interval_s,
    segments_per_epoch,
    idle_polls_to_stop,
    stable_for_s,
    compact_every_epochs,
    compact_minor,
    vacuum_after_compact,
    vacuum_respect_consumers,
    allowed_lateness_us,
    on_watermark_advance,
    on_commit,
    lease_holder,
    dlq_dir=None,
):
    import time as _time

    from xgeo_ray.sources.wal import is_supported_segment
    from xgeo_ray.state import lease as _lease

    committed: list[Manifest] = []
    idle = 0
    epochs_since_compact = 0
    last_wm = table.event_time_watermark(allowed_lateness_us)
    while True:
        if lease_holder is not None:
            _lease.renew(table, lease_holder)
        now = _time.time()
        try:
            names = sorted(os.listdir(wal_dir))
        except FileNotFoundError:
            names = []
        done = table.committed_segments()
        fresh = []
        for n in names:
            p = os.path.abspath(os.path.join(wal_dir, n))
            # same dispatch table as read_segment/_strip_compression, so
            # every ingestible format (incl. .zst/.bz2/.gzip) is tailed
            if not is_supported_segment(n) or p in done:
                continue
            try:
                if now - os.path.getmtime(p) < stable_for_s:
                    continue  # still being written
            except FileNotFoundError:
                continue
            fresh.append(p)
        if fresh:
            idle = 0
            ms = run_stream(
                table, fresh, segments_per_epoch=segments_per_epoch,
                dlq_dir=dlq_dir,
            )
            committed.extend(ms)
            epochs_since_compact += len(ms)
            if on_commit is not None and ms:
                on_commit(ms, table)
            if on_watermark_advance is not None and ms:
                w = table.event_time_watermark(allowed_lateness_us)
                if w > last_wm:
                    last_wm = w
                    on_watermark_advance(w, table)
            if (
                compact_every_epochs is not None
                and epochs_since_compact >= compact_every_epochs
            ):
                cm = compact(table, minor=compact_minor)
                if cm is not None:
                    committed.append(cm)
                if vacuum_after_compact:
                    vacuum(table, respect_consumers=vacuum_respect_consumers)
                epochs_since_compact = 0
        else:
            idle += 1
            if idle_polls_to_stop is not None and idle >= idle_polls_to_stop:
                return committed
            _time.sleep(poll_interval_s)


def tail_derived(
    source: DeltaTable,
    sink: DeltaTable,
    poll_interval_s: float = 0.5,
    idle_polls_to_stop: int | None = None,
    transform=None,
    epochs_per_sync: int = 1,
) -> list[Manifest]:
    """Follow a SOURCE TABLE the way ``tail`` follows a WAL directory:
    poll its committed manifests and ``sync_derived`` every new delta
    epoch into the sink as it lands — the live half of the derived-table
    story (sync_derived is the one-shot/resume half; both share the
    committed-segments cursor, so a restarted tailer continues
    exactly-once). ``idle_polls_to_stop`` bounds the loop for tests /
    batch drains (None = run forever)."""
    import time as _time

    committed: list[Manifest] = []
    idle = 0
    while True:
        ms = sync_derived(
            source,
            sink,
            transform=transform,
            epochs_per_sync=epochs_per_sync,
        )
        if ms:
            committed.extend(ms)
            idle = 0
        else:
            idle += 1
            if idle_polls_to_stop is not None and idle >= idle_polls_to_stop:
                return committed
            _time.sleep(poll_interval_s)
