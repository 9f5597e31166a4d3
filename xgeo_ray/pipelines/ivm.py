"""Before/after-image change feed + incremental aggregate views (IVM).

Two capabilities the plain ``changes()`` feed cannot give a consumer:

1. ``changes_with_before`` — the Debezium-shaped feed: every applied
   change row is paired with the key's EFFECTIVE state transition
   (before image -> after image) under the table's merge policy. The
   images are effective, not event-literal: an out-of-order update that
   loses last-writer-wins to the existing state emits
   ``before == after`` (a no-op transition), which is exactly what a
   downstream incremental consumer must see — retract(before) +
   add(after) then cancels instead of corrupting its state.

2. ``sync_agg`` / ``read_agg_view`` — retraction-based incremental
   grouped aggregation (count + sums) maintained EXACTLY-ONCE from that
   feed: per sync, each change contributes ``-1/-value`` for its before
   image and ``+1/+value`` for its after image, partial-aggregated per
   partition, hash-bucketed by group, and folded into persisted bucket
   files. Refresh I/O tracks the CHANGE size even on LWW tables with
   updates and deletes — the gap ``views.refresh_view`` cannot close
   (its delta path is sound only for additive tables with no
   tombstones; everything else re-merges whole partitions).

Scale shape: one raw-Ray task per TOUCHED partition (untouched
partitions cost nothing); inside a task the as-of state is read
filtered to the window's touched conv_ids, so per-task memory tracks
the number of keys changed in the window, not the partition size. The
per-epoch walk is a vectorized searchsorted alignment over those
touched keys only — no Python loop over rows anywhere.

No counterpart in the reference (a stateless streaming CLI,
/root/reference/cmd/xgeo/main.go:18); this is the incremental-view
surface the north rule's lake engine needs (cf. the published
DBSP/differential-dataflow model: changes as Z-set deltas, aggregates
maintained by weight-summed retractions).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from xgeo_ray.schemas import cast_to
from xgeo_ray.state.delta_table import DeltaTable

_AGG_META = "_agg.json"
BEFORE_PREFIX = "_before_"


def _window_plan(
    table: DeltaTable, since_epoch: int, upto_epoch: int | None
) -> dict[int, list[tuple[str, int]]]:
    """Per-partition ``[(path, epoch)]`` ascending for committed DELTA
    manifests in ``(since_epoch, upto_epoch]`` — the same plan shape as
    ``changes()``, grouped by partition so each touched partition gets
    one task. Compactions are skipped (state rewrite, not history);
    restores are resolved by ``effective_manifests``."""
    plan: dict[int, list[tuple[str, int]]] = defaultdict(list)
    for m in table.effective_manifests():
        if m.kind != "delta" or m.epoch <= since_epoch:
            continue
        if upto_epoch is not None and m.epoch > upto_epoch:
            continue
        for k, e in m.partitions.items():
            if e.path:
                plan[int(k)].append(
                    (os.path.join(table.root, e.path), m.epoch)
                )
    return dict(plan)


def _k64_codes(conv: pa.Array, turn: pa.Array, uniq: pa.Array) -> np.ndarray:
    """Composite int64 key codes (dictionary index << 32 | turn) against
    a shared ``uniq`` conv_id dictionary — collision-free (exact index,
    not a hash), so searchsorted alignment is sound. Collision-freedom
    requires turn_idx to fit the low 32 bits: two turns of one conv
    differing by a multiple of 2^32 (or a negative aliasing a positive)
    would collide and could keep a dead key alive or misroute a
    tombstone in sync_join — guarded here like the delta-filename width
    assertions."""
    code = pc.index_in(conv, value_set=uniq).cast(pa.int64()).to_numpy(
        zero_copy_only=False
    )
    t = turn.cast(pa.int64()).to_numpy(zero_copy_only=False)
    if len(t) and (t.min() < 0 or t.max() >= (1 << 32)):
        raise ValueError(
            "turn_idx out of [0, 2^32) — the composite 64-bit key code "
            f"would collide (saw min={t.min()}, max={t.max()})"
        )
    return (code << 32) | (t & np.int64(0xFFFFFFFF))


def _feed_schema(envelope: pa.Schema, payload: list[str]) -> pa.Schema:
    by_name = {f.name: f for f in envelope}
    fields = [
        by_name["conv_id"],
        by_name["turn_idx"],
        pa.field("_epoch", pa.int64()),
        pa.field("op", pa.string()),
        by_name["ts"],
        pa.field("seq", pa.int64()),
    ]
    fields += [by_name[c] for c in payload]
    fields += [
        pa.field(BEFORE_PREFIX + c, by_name[c].type) for c in payload
    ]
    # the BEFORE VERSION'S OWN event time (top-level `ts` is the after
    # version's): together they make `ts` a per-image column, so
    # retraction consumers (sync_agg with a time-bucket derive) retract
    # from the bucket the old version lived in, not the new one
    fields += [pa.field(BEFORE_PREFIX + "ts", by_name["ts"].type)]
    fields += [
        pa.field("_before_exists", pa.bool_()),
        pa.field("_after_exists", pa.bool_()),
    ]
    return pa.schema(fields)


def _null_where(col: pa.ChunkedArray | pa.Array, dead: pa.Array):
    return pc.if_else(dead, pa.scalar(None, col.type), col)


@ray.remote
def _before_after_task(
    window: list[tuple[str, int]],
    asof_paths: list[str],
    envelope: pa.Schema,
    policy,
    payload: list[str],
    aliases: dict[str, str] | None = None,
) -> pa.Table:
    """One touched partition's before/after feed rows.

    Reads the window's delta files (projected to merge + payload
    columns), the as-of-``since`` chain filtered to the window's
    touched conv_ids, then walks epochs in commit order maintaining the
    touched keys' running state under the merge policy. All alignment
    is vectorized: one shared conv dictionary, int64 composite codes,
    searchsorted gathers. Cost: O(epochs x touched_keys) — independent
    of partition size."""
    from xgeo_ray.pipelines.ingest import _MERGE_COLS
    from xgeo_ray.stages.collapse import merge_versions
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    from xgeo_ray.schemas import aliased_read_columns, apply_aliases

    read_cols = list(dict.fromkeys(_MERGE_COLS + list(payload)))
    env = pa.schema([f for f in envelope if f.name in read_cols])
    out_schema = _feed_schema(envelope, payload)

    def _read(p: str) -> pa.Table:
        have = aliased_read_columns(
            pq.read_schema(p).names, read_cols, aliases
        )
        return apply_aliases(
            pq.read_table(p, columns=have, use_threads=False), aliases
        )

    wparts = []
    for p, e in window:
        t = cast_to(_read(p), env)
        wparts.append(
            t.append_column(
                "_epoch", pa.array(np.full(t.num_rows, e, dtype=np.int64))
            )
        )
    W = pa.concat_tables(wparts)
    if W.num_rows == 0:
        return out_schema.empty_table()
    touched_convs = pc.unique(W.column("conv_id").combine_chunks())
    # as-of chain read pushed down to the parquet reader (row-group
    # prune + row filter — the lookup_many idiom), so task memory
    # tracks the touched keys, not the partition size. Very large
    # touched sets fall back to a plain read + Arrow is_in (a giant
    # IN expression costs more than the vectorized kernel).
    touched_list = touched_convs.to_pylist() if len(touched_convs) <= 20_000 else None
    asof_tables = []
    for p in asof_paths:
        if touched_list is not None:
            have = aliased_read_columns(
                pq.read_schema(p).names, read_cols, aliases
            )
            t = apply_aliases(
                pq.read_table(
                    p,
                    columns=have,
                    use_threads=False,
                    filters=[("conv_id", "in", touched_list)],
                ),
                aliases,
            )
        else:
            t = _read(p)
            t = t.filter(
                pc.is_in(t.column("conv_id"), value_set=touched_convs)
            )
        if t.num_rows:
            asof_tables.append(cast_to(t, env))
    # keep tombstone winners: a deleted key's tombstone still wins LWW
    # over later lower-(ts,seq) arrivals, exactly as in the table itself
    S = merge_versions(asof_tables, drop_tombstones=False, policy=policy)
    if S.num_rows == 0:
        S = env.empty_table()
    else:
        S = cast_to(S, env)

    uniq = touched_convs  # every conv in S was filtered to this set
    sk = _k64_codes(
        S.column("conv_id").combine_chunks(),
        S.column("turn_idx").combine_chunks(),
        uniq,
    )
    wk = _k64_codes(
        W.column("conv_id").combine_chunks(),
        W.column("turn_idx").combine_chunks(),
        uniq,
    )
    # restrict state to keys touched anywhere in the window (asof filter
    # above was conv-coarse; different turn_idx of a touched conv drop)
    keep = np.isin(sk, wk)
    state = S.filter(pa.array(keep))
    sk = sk[keep]
    order = np.argsort(sk, kind="stable")
    state = state.take(order)
    sk = sk[order]

    w_epochs = W.column("_epoch").to_numpy(zero_copy_only=False)
    outs = []
    for e in sorted(set(w_epochs.tolist())):
        rows_e = W.filter(pa.array(w_epochs == e)).drop_columns(["_epoch"])
        # collapse to the epoch's per-key effective delta (no-op on
        # already-collapsed lww deltas; folds history-table versions)
        rows_e = policy(rows_e, False)
        ek = _k64_codes(
            rows_e.column("conv_id").combine_chunks(),
            rows_e.column("turn_idx").combine_chunks(),
            uniq,
        )
        eorder = np.argsort(ek, kind="stable")
        rows_e = rows_e.take(eorder)
        ek = ek[eorder]
        pos = np.searchsorted(sk, ek)
        safe = np.minimum(pos, max(len(sk) - 1, 0))
        found = (pos < len(sk)) & (len(sk) > 0)
        if len(sk):
            found &= sk[safe] == ek
        # before images aligned to ek (null rows where the key is new)
        idx = pa.array(
            np.where(found, safe, 0).astype(np.int64), mask=~found
        )
        before = state.take(idx) if len(sk) else pa.Table.from_arrays(
            [pa.nulls(len(ek), f.type) for f in state.schema],
            schema=state.schema,
        )
        matched = state.take(pa.array(safe[found].astype(np.int64))) if (
            found.any()
        ) else state.schema.empty_table()
        after = policy(
            pa.concat_tables([matched, rows_e], promote_options="permissive"),
            False,
        )
        ak = _k64_codes(
            after.column("conv_id").combine_chunks(),
            after.column("turn_idx").combine_chunks(),
            uniq,
        )
        aorder = np.argsort(ak, kind="stable")
        after = after.take(aorder)
        ak = ak[aorder]
        # after's key set == ek's key set, both sorted -> row-aligned
        before_dead = pc.fill_null(
            pc.or_(
                pc.is_null(before.column("op")),
                pc.equal(before.column("op"), "D"),
            ),
            True,
        ).combine_chunks()
        after_dead = pc.fill_null(
            pc.equal(after.column("op"), "D"), False
        ).combine_chunks()
        cols: dict[str, pa.ChunkedArray | pa.Array] = {
            "conv_id": after.column("conv_id"),
            "turn_idx": after.column("turn_idx"),
            "_epoch": pa.array(
                np.full(after.num_rows, e, dtype=np.int64)
            ),
            "op": after.column("op"),
            "ts": after.column("ts"),
            "seq": after.column("seq").cast(pa.int64()),
        }
        for c in payload:
            cols[c] = _null_where(after.column(c), after_dead)
        for c in payload:
            cols[BEFORE_PREFIX + c] = _null_where(
                before.column(c), before_dead
            )
        cols[BEFORE_PREFIX + "ts"] = _null_where(
            before.column("ts"), before_dead
        )
        cols["_before_exists"] = pc.invert(before_dead)
        cols["_after_exists"] = pc.invert(after_dead)
        outs.append(
            pa.Table.from_arrays(
                [
                    pa.chunked_array([cols[f.name]])
                    if isinstance(cols[f.name], pa.Array)
                    else cols[f.name]
                    for f in out_schema
                ],
                schema=out_schema,
            )
        )
        # fold the epoch into the running state
        unmatched = state.filter(pa.array(~np.isin(sk, ek))) if len(
            sk
        ) else state
        state = pa.concat_tables(
            [unmatched, after], promote_options="permissive"
        )
        sk = _k64_codes(
            state.column("conv_id").combine_chunks(),
            state.column("turn_idx").combine_chunks(),
            uniq,
        )
        order = np.argsort(sk, kind="stable")
        state = state.take(order)
        sk = sk[order]
    return pa.concat_tables(outs)


def _resolve_policy(table: DeltaTable):
    from xgeo_ray.stages.collapse import MERGE_POLICIES

    return MERGE_POLICIES[table.merge_policy]["fn"]


def changes_with_before(
    table: DeltaTable,
    since_epoch: int = 0,
    upto_epoch: int | None = None,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """The CDC-out feed with EFFECTIVE state transitions: one row per
    (key, epoch) in ``(since_epoch, upto_epoch]`` carrying the after
    image (payload columns; null when the key is deleted), the before
    image (``_before_<col>``; null when the key was absent or deleted),
    ``_before_exists`` / ``_after_exists``, and ``_epoch``.

    Images are effective under the table's merge policy, not
    event-literal: a change that loses LWW to existing state emits
    ``before == after`` (its retraction and addition cancel downstream);
    on additive tables the images are the accumulated sums before/after
    the epoch. ``op``/``ts``/``seq`` are the after image's winner row;
    ``_before_ts`` is the BEFORE version's own event time — making
    ``ts`` a per-image column, so event-time consumers (e.g. a
    time-bucketed ``sync_agg``) retract from the window the old version
    lived in.

    One task per TOUCHED partition; the as-of-``since_epoch`` state is
    read filtered to the window's touched conv_ids, so cost tracks the
    change volume. Retention contract: both the window's delta files
    and the as-of chain must predate vacuum, same as ``changes()``.
    ``columns`` restricts the payload (both images) — pass the narrow
    set a consumer aggregates over and the text payload never leaves
    the parquet reader."""
    refs, payload, envelope = _feed_refs(
        table, since_epoch, upto_epoch, columns
    )
    if not refs:
        return ray.data.from_arrow(
            _feed_schema(envelope, payload).empty_table()
        )
    return ray.data.from_arrow_refs([r for _, r in refs])


def _feed_refs(
    table: DeltaTable,
    since_epoch: int,
    upto_epoch: int | None,
    columns: list[str] | None,
) -> tuple[list[tuple[int, ray.ObjectRef]], list[str], pa.Schema]:
    """One ``_before_after_task`` per touched partition for the window —
    the shared plan behind ``changes_with_before`` and
    ``export_debezium``. Returns ``[(partition, ref)]`` plus the payload
    column list and the envelope schema."""
    envelope = table.current_schema(upto_epoch)
    aliases = table.column_aliases(upto_epoch)
    from xgeo_ray.pipelines.ingest import _MERGE_COLS
    from xgeo_ray.state.delta_table import LINEAGE_COLS

    skip = set(_MERGE_COLS) | set(LINEAGE_COLS)
    payload = [
        f.name
        for f in envelope
        if f.name not in skip and (columns is None or f.name in columns)
    ]
    window = _window_plan(table, since_epoch, upto_epoch)
    if not window:
        return [], payload, envelope
    asof = table.partition_files(as_of_epoch=since_epoch) if since_epoch > 0 else {}
    policy = _resolve_policy(table)
    refs = [
        (
            part,
            _before_after_task.remote(
                files, asof.get(part, []), envelope, policy, payload, aliases
            ),
        )
        for part, files in sorted(window.items())
    ]
    return refs, payload, envelope


_DBZ_META = "_debezium.json"


def _write_ndjson(out, path: str, gz: bool) -> None:
    """Durable atomic NDJSON publish shared by the window and snapshot
    writers (gzip with mtime=0 so identical content means identical
    bytes). Bytes are fsync'd BEFORE the publish and the publish goes
    through the storage seam: the window meta is the commit point, so a
    part file must never be torn under a surviving meta."""
    import gzip as _gzip
    import io

    from xgeo_ray.state.storage import DEFAULT_STORAGE

    tmp = f"{path}.tmp-{os.getpid()}"
    if gz:
        buf = io.BytesIO()
        out.write_ndjson(buf)
        with open(tmp, "wb") as f:
            with _gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as z:
                z.write(buf.getbuffer())
            f.flush()
            os.fsync(f.fileno())
    else:
        out.write_ndjson(tmp)
        with open(tmp, "rb+") as f:
            os.fsync(f.fileno())
    DEFAULT_STORAGE.publish_file(tmp, path, durable=True)


def _binary_payload_cols(envelope: pa.Schema, payload: list[str]) -> list[str]:
    """Payload columns that hold raw bytes — JSON can't carry them, so
    the Debezium writers base64-encode (the standard Debezium `bytes`
    handling) and record the column list in the window meta for the
    importer to decode."""
    by = {f.name: f.type for f in envelope}
    return [
        c
        for c in payload
        if pa.types.is_binary(by[c])
        or pa.types.is_large_binary(by[c])
        or pa.types.is_fixed_size_binary(by[c])
    ]


@ray.remote
def _debezium_snapshot_write_task(
    state: pa.Table,
    payload: list[str],
    epoch: int,
    path: str,
    gz: bool,
    bin_cols: list[str] = (),
) -> int:
    """Serialize one partition's MERGED STATE as Debezium snapshot-phase
    records (op='r', before=null — the read-phase convention every
    Debezium consumer bootstraps from). source.seq/ts_us carry each
    winner's real WAL position so the following stream windows replay
    idempotently on top (their seqs are strictly higher)."""
    import polars as pl

    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    df = pl.from_arrow(state)
    if bin_cols:
        df = df.with_columns(
            [pl.col(c).bin.encode("base64") for c in bin_cols]
        )
    key = [pl.col("conv_id"), pl.col("turn_idx")]
    out = df.select(
        pl.lit(None).alias("before"),
        pl.struct(key + [pl.col(c) for c in payload]).alias("after"),
        pl.lit("r").alias("op"),
        pl.struct(
            pl.lit(epoch, dtype=pl.Int64).alias("epoch"),
            pl.col("seq"),
            pl.col("ts").dt.epoch("us").alias("ts_us"),
        ).alias("source"),
        pl.col("ts").dt.epoch("ms").alias("ts_ms"),
    )
    _write_ndjson(out, path, gz)
    return out.height


@ray.remote
def _debezium_write_task(
    feed: pa.Table,
    payload: list[str],
    path: str,
    gz: bool,
    bin_cols: list[str] = (),
) -> int:
    """Serialize one partition's before/after feed rows as
    Debezium-envelope NDJSON and publish the file atomically. All
    serialization is vectorized (polars struct columns -> Rust NDJSON
    writer); no per-row Python."""
    import polars as pl

    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    # absent -> absent transitions (key created AND deleted inside one
    # epoch) are no-ops a Debezium consumer must not see
    feed = feed.filter(
        pc.or_(feed.column("_before_exists"), feed.column("_after_exists"))
    )
    df = pl.from_arrow(feed)
    if bin_cols:
        df = df.with_columns(
            [pl.col(c).bin.encode("base64") for c in bin_cols]
            + [
                pl.col(BEFORE_PREFIX + c).bin.encode("base64")
                for c in bin_cols
            ]
        )
    key = [pl.col("conv_id"), pl.col("turn_idx")]
    image = key + [pl.col(c) for c in payload]
    before_image = key + [
        pl.col(BEFORE_PREFIX + c).alias(c) for c in payload
    ]
    out = df.select(
        pl.when(pl.col("_before_exists"))
        .then(pl.struct(before_image))
        .otherwise(None)
        .alias("before"),
        pl.when(pl.col("_after_exists"))
        .then(pl.struct(image))
        .otherwise(None)
        .alias("after"),
        pl.when(~pl.col("_before_exists"))
        .then(pl.lit("c"))
        .when(pl.col("_after_exists"))
        .then(pl.lit("u"))
        .otherwise(pl.lit("d"))
        .alias("op"),
        pl.struct(
            pl.col("_epoch").alias("epoch"),
            pl.col("seq"),
            pl.col("ts").dt.epoch("us").alias("ts_us"),
        ).alias("source"),
        pl.col("ts").dt.epoch("ms").alias("ts_ms"),
    )
    _write_ndjson(out, path, gz)
    return out.height


def export_debezium(
    table: DeltaTable,
    out_dir: str,
    consumer: str | None = None,
    since_epoch: int = 0,
    upto_epoch: int | None = None,
    columns: list[str] | None = None,
    gzip: bool = False,
    bootstrap: bool = False,
) -> dict:
    """Export the before/after change feed as standard Debezium-envelope
    JSONL — the lingua-franca CDC format any downstream system (Kafka
    consumers, warehouse CDC loaders, cache invalidators) already
    speaks. One record per effective (key, epoch) transition::

        {"before": {...}|null, "after": {...}|null, "op": "c"|"u"|"d",
         "source": {"epoch": E, "seq": S, "ts_us": T}, "ts_ms": M}

    Images are EFFECTIVE under the table's merge policy (see
    ``changes_with_before``); absent->absent no-ops (a key created and
    deleted inside one epoch) are dropped. Files land under
    ``out_dir/window=<since+1>-<upto>/part-<P>.jsonl[.gz]`` — one file
    per touched partition, so each key's records are totally ordered
    within its file (a key lives in exactly one partition).

    Exactly-once: pass ``consumer`` (a consumer-group name) and the
    window starts at the group's committed cursor and acks ``upto``
    AFTER the window's meta commit — the crash order is files -> meta
    -> ack, so a crash anywhere replays into the same window directory
    (partial windows are wiped and rewritten; completed windows are
    skipped and just re-acked). Without ``consumer``, drive the window
    with ``since_epoch``/``upto_epoch`` and the same meta makes the
    call idempotent. Retention contract matches ``changes()``: run
    before vacuum outpaces the cursor (``vacuum --respect-consumers``
    pins it automatically).

    ``bootstrap=True`` exports the Debezium SNAPSHOT PHASE instead of a
    change window: the table's full merged state at ``upto`` as op='r'
    (read) records under ``out_dir/snapshot=0-<upto>/`` — the standard
    bootstrap-then-follow handshake. Each record's source.seq/ts_us is
    the winner's real WAL position, so following stream windows replay
    idempotently on top (their seqs are strictly higher — the same
    watermark argument the importer relies on). With ``consumer`` the
    cursor advances to ``upto``, so the next plain call exports the
    stream from there. Re-snapshotting later is legal (a savepoint):
    the importer bootstraps from the NEWEST snapshot and skips every
    directory it covers, so mixed snapshot + window dirs converge.

    Scale shape: serialization cost rides the same one-task-per-touched-
    partition plan as the feed itself; JSON bytes never visit the
    driver. No counterpart in the reference (stateless CLI,
    /root/reference/cmd/xgeo/main.go:18); format per the public
    Debezium envelope spec."""
    from xgeo_ray.state import consumers as cons

    if consumer is not None:
        since_epoch = cons.position(table, consumer)
    eff_epochs = {m.epoch for m in table.effective_manifests()}
    if upto_epoch is None:
        upto = max(eff_epochs, default=0)
    else:
        upto = max((e for e in eff_epochs if e <= upto_epoch), default=0)
    if bootstrap:
        return _export_debezium_snapshot(
            table, out_dir, consumer, upto, columns, gzip
        )
    if upto <= since_epoch:
        return {"rows": 0, "since": since_epoch, "upto": since_epoch,
                "files": [], "skipped": False}
    window_dir = os.path.join(
        out_dir, f"window={since_epoch + 1}-{upto}"
    )
    meta_path = os.path.join(window_dir, _DBZ_META)
    params = {"columns": columns, "gzip": gzip}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if {k: meta[k] for k in params} != params:
            raise ValueError(
                f"debezium window {window_dir} was exported with "
                f"different parameters ({ {k: meta[k] for k in params} } "
                f"!= {params}); use a fresh out_dir"
            )
        if consumer is not None:
            cons.ack(table, consumer, upto)
        return {**meta, "skipped": True}
    if os.path.isdir(window_dir):  # crashed mid-window: wipe, rewrite
        import shutil

        shutil.rmtree(window_dir)
    os.makedirs(window_dir)
    refs, payload, envelope = _feed_refs(table, since_epoch, upto, columns)
    bin_cols = _binary_payload_cols(envelope, payload)
    ext = ".jsonl.gz" if gzip else ".jsonl"
    files = [
        os.path.join(window_dir, f"part-{part}{ext}") for part, _ in refs
    ]
    counts = ray.get(
        [
            _debezium_write_task.remote(ref, payload, path, gzip, bin_cols)
            for (_, ref), path in zip(refs, files)
        ]
    )
    meta = {
        **params,
        "since": since_epoch,
        "upto": upto,
        "rows": int(sum(counts)),
        "binary_columns": bin_cols,
        "files": [os.path.basename(p) for p in files],
    }
    tmp = meta_path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    from xgeo_ray.state.storage import DEFAULT_STORAGE

    DEFAULT_STORAGE.publish_file(tmp, meta_path, durable=True)
    if consumer is not None:
        cons.ack(table, consumer, upto)
    return {**meta, "skipped": False}


def _export_debezium_snapshot(
    table: DeltaTable,
    out_dir: str,
    consumer: str | None,
    upto: int,
    columns: list[str] | None,
    gz: bool,
) -> dict:
    """The snapshot (bootstrap) phase of ``export_debezium``: one merged
    op='r' file per partition under ``snapshot=0-<upto>/``. Same crash
    contract as windows: files -> meta -> ack; a partial directory is
    wiped and rewritten, a completed one is skipped and re-acked."""
    from xgeo_ray.pipelines.ingest import _MERGE_COLS, _merge_part_task
    from xgeo_ray.stages.collapse import MERGE_POLICIES
    from xgeo_ray.state import consumers as cons
    from xgeo_ray.state.delta_table import LINEAGE_COLS

    snap_dir = os.path.join(out_dir, f"snapshot=0-{upto}")
    meta_path = os.path.join(snap_dir, _DBZ_META)
    params = {"columns": columns, "gzip": gz}
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if {k: meta[k] for k in params} != params:
            raise ValueError(
                f"debezium snapshot {snap_dir} was exported with "
                f"different parameters ({ {k: meta[k] for k in params} } "
                f"!= {params}); use a fresh out_dir"
            )
        if consumer is not None:
            cons.ack(table, consumer, upto)  # monotone: never rewinds
        return {**meta, "skipped": True}
    if os.path.isdir(snap_dir):  # crashed mid-snapshot: wipe, rewrite
        import shutil

        shutil.rmtree(snap_dir)
    os.makedirs(snap_dir)
    envelope = table.current_schema(upto)
    payload = [
        f.name
        for f in envelope
        if f.name not in _MERGE_COLS
        and f.name not in LINEAGE_COLS
        and (columns is None or f.name in columns)
    ]
    plan = table.partition_files(as_of_epoch=upto) if upto else {}
    policy_fn = MERGE_POLICIES[table.merge_policy]["fn"]
    bin_cols = _binary_payload_cols(envelope, payload)
    cols = ["conv_id", "turn_idx", "seq", "ts"] + payload
    ext = ".jsonl.gz" if gz else ".jsonl"
    refs, files = [], []
    for part, paths in sorted(plan.items()):
        # keep_lineage=True so `seq` (a lineage column) survives the
        # merge; the trailing column select drops `op` anyway
        state = _merge_part_task.remote(
            paths, envelope, True, policy_fn, cols, None, None,
            table.column_aliases(upto),
        )
        path = os.path.join(snap_dir, f"part-{part}{ext}")
        refs.append(
            _debezium_snapshot_write_task.remote(
                state, payload, upto, path, gz, bin_cols
            )
        )
        files.append(path)
    counts = ray.get(refs)
    meta = {
        **params,
        "since": 0,
        "upto": upto,
        "rows": int(sum(counts)),
        "snapshot": True,
        "binary_columns": bin_cols,
        "files": [os.path.basename(p) for p in files],
    }
    tmp = meta_path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    from xgeo_ray.state.storage import DEFAULT_STORAGE

    DEFAULT_STORAGE.publish_file(tmp, meta_path, durable=True)
    if consumer is not None:
        cons.ack(table, consumer, upto)
    return {**meta, "skipped": False}


@ray.remote
def _debezium_read_task(
    path: str, out_path: str, bin_cols: tuple = ()
) -> str | None:
    """Parse one Debezium JSONL file into a WAL parquet segment.
    Returns the segment path, or None for an empty file. Vectorized:
    polars NDJSON reader + struct field extraction, no per-row JSON.
    ``bin_cols`` (from the window meta's ``binary_columns``) are
    base64-decoded back to raw bytes — the standard Debezium bytes
    handling our exporter writes."""
    import gzip as _gzip
    import io

    import polars as pl

    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    opener = _gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        raw = f.read()
    if not raw.strip():
        return None
    # the default 100-row inference window infers `before` as Null-typed
    # when the file leads with >100 creates, and the first later delete
    # FAILS the read loudly (non-null value for NULL-typed column) — a
    # Null-typed column can never silently swallow data, so retrying
    # with whole-file inference is sound and keeps the common case at
    # single-pass parse speed
    try:
        df = pl.read_ndjson(io.BytesIO(raw))
    except pl.exceptions.ComputeError:
        df = pl.read_ndjson(io.BytesIO(raw), infer_schema_length=None)
    # a window file of only creates infers `before` as Null-typed (no
    # struct fields); only deletes leaves `after` Null-typed. Guard both.
    has_before = isinstance(df.schema.get("before"), pl.Struct)
    has_after = isinstance(df.schema.get("after"), pl.Struct)
    if not has_after and not has_before:
        return None
    img = df.schema["after" if has_after else "before"]
    payload = [c for c in img.to_schema() if c not in ("conv_id", "turn_idx")]

    def _key(col: str):
        if has_before and has_after:
            return (
                pl.when(pl.col("op") == "d")
                .then(pl.col("before").struct.field(col))
                .otherwise(pl.col("after").struct.field(col))
            )
        side = "after" if has_after else "before"
        return pl.col(side).struct.field(col)

    exprs = [
        pl.col("source").struct.field("seq").cast(pl.Int64).alias("seq"),
        pl.when(pl.col("op") == "d")
        .then(pl.lit("D"))
        .when(pl.col("op") == "u")
        .then(pl.lit("U"))
        # 'c' (create) and 'r' (snapshot read) are full images -> 'I'
        .otherwise(pl.lit("I"))
        .alias("op"),
        _key("conv_id").alias("conv_id"),
        _key("turn_idx").alias("turn_idx"),
        pl.col("source")
        .struct.field("ts_us")
        .cast(pl.Datetime(time_unit="us"))
        .alias("ts"),
    ]
    if has_after:
        exprs += [
            (
                pl.col("after").struct.field(c).str.decode("base64")
                if c in set(bin_cols)
                else pl.col("after").struct.field(c)
            ).alias(c)
            for c in payload
        ]
    t = df.select(exprs).to_arrow()
    # polars strings are Arrow large_string; the envelope schema (and
    # the promote rules in schemas.py) speak plain string/binary
    down = {pa.large_string(): pa.string(), pa.large_binary(): pa.binary()}
    t = t.cast(
        pa.schema(
            [pa.field(f.name, down.get(f.type, f.type)) for f in t.schema]
        )
    )
    tmp = f"{out_path}.tmp-{os.getpid()}"
    pq.write_table(t, tmp)
    with open(tmp, "rb+") as f:
        os.fsync(f.fileno())
    from xgeo_ray.state.storage import DEFAULT_STORAGE

    DEFAULT_STORAGE.publish_file(tmp, out_path, durable=True)
    return out_path


def debezium_to_segments(
    in_dir: str, wal_dir: str, require_meta: bool = False
) -> list[list[str]]:
    """Import a Debezium-envelope JSONL stream (the layout
    ``export_debezium`` writes, or any compatible per-window feed) as
    WAL parquet segments — the interop path for following ANOTHER
    system's CDC stream into a table here. Mapping: ``op`` c→I, r→I
    (snapshot-phase reads are full images), u→U, d→D (keys from the
    before image); ``source.seq``→seq, ``source.ts_us``→ts; after-image
    fields become payload columns (missing ones null-fill in
    normalize). Snapshot directories (``snapshot=0-U``, from
    ``export_debezium(bootstrap=True)``) bootstrap the import: the
    LATEST one is the base — it replays first, and every directory it
    fully covers (upto <= U: older snapshots AND already-folded stream
    windows) is skipped, exactly how a Debezium consumer treats the
    snapshot phase. Skipping is load-bearing, not an optimization:
    snapshots carry no tombstones, so replaying an OLDER snapshot first
    could create keys whose later deletes land at-or-below the sink's
    seq watermark and silently drop — the newest snapshot already
    reflects those deletes. A window straddling the base (a <= U < b)
    replays after it: its covered rows drop as replays, its tail
    applies.

    Returns one GROUP of segment paths per window, window-ascending —
    feed them to ``run_stream(table, [], segment_groups=groups)`` so
    each window lands as ONE epoch. The grouping is load-bearing, not
    cosmetic: a window's part files hold DISJOINT KEYS but OVERLAPPING
    SEQ RANGES (the exporter partitions by key hash, not by seq), so
    splitting a window across ingest epochs advances the sink's
    per-partition seq watermarks past the window's remaining parts and
    silently drops their rows as replays — the same
    one-source-epoch-per-sink-epoch invariant ``sync_derived``
    enforces. Windows among themselves must replay oldest-first for
    the same watermark reason. Re-running after more windows appear
    converts only the new files (existing segments are kept,
    conversion is deterministic). One Ray task per file; JSON bytes
    never visit the driver.

    ``require_meta=True`` consumes only directories whose
    ``_debezium.json`` commit marker exists — mandatory when RACING a
    live exporter (``tail_debezium`` sets it): a window mid-write would
    otherwise convert partially, and since segment conversion is
    keep-if-exists, the stale partial conversion would pin forever even
    after the exporter wipes and rewrites the window. Leave it False
    only for foreign feeds that are complete-on-arrival and write no
    marker.

    Roundtrip: ``export_debezium`` of table A ingested here into table
    B yields ``snapshot(B) == snapshot(A)`` (epoch-effective images
    replayed in seq order converge under LWW — certified in
    test_debezium)."""
    import re as _re

    os.makedirs(wal_dir, exist_ok=True)
    windows = []
    snaps = []
    for name in os.listdir(in_dir):
        m = _re.match(r"^(window|snapshot)=(\d+)-(\d+)$", name)
        if m and os.path.isdir(os.path.join(in_dir, name)):
            if require_meta and not os.path.isfile(
                os.path.join(in_dir, name, _DBZ_META)
            ):
                continue
            row = (int(m.group(2)), int(m.group(3)), name)
            (snaps if m.group(1) == "snapshot" else windows).append(row)
    if snaps:
        base = max(snaps, key=lambda s: s[1])
        # the newest snapshot folds everything at-or-below its upto
        windows = [base] + [w for w in windows if w[1] > base[1]]
    jobs: list[list[tuple[str, str, tuple] | str]] = []
    for a, b, name in sorted(windows):
        meta_p = os.path.join(in_dir, name, _DBZ_META)
        bin_cols: tuple = ()
        if os.path.isfile(meta_p):
            with open(meta_p) as f:
                bin_cols = tuple(json.load(f).get("binary_columns") or ())
        parts = sorted(
            f
            for f in os.listdir(os.path.join(in_dir, name))
            if f.startswith("part-") and ".jsonl" in f
        )
        grp: list[tuple[str, str, tuple] | str] = []
        for p in parts:
            part_id = p.split(".")[0]  # part-<P>
            seg = os.path.join(wal_dir, f"dbz-{a}-{b}-{part_id}.parquet")
            if os.path.isfile(seg):
                grp.append(seg)  # already converted (deterministic)
            else:
                grp.append((os.path.join(in_dir, name, p), seg, bin_cols))
        jobs.append(grp)
    refs = {
        (i, k): _debezium_read_task.remote(*j)
        for i, grp in enumerate(jobs)
        for k, j in enumerate(grp)
        if isinstance(j, tuple)
    }
    done = {key: ray.get(r) for key, r in refs.items()}
    out: list[list[str]] = []
    for i, grp in enumerate(jobs):
        segs = [
            done[(i, k)] if (i, k) in done else j
            for k, j in enumerate(grp)
        ]
        segs = [s for s in segs if s is not None]
        if segs:
            out.append(segs)
    return out


def tail_debezium(
    in_dir: str,
    sink: "DeltaTable",
    wal_dir: str,
    poll_interval_s: float = 0.5,
    idle_polls_to_stop: int | None = None,
    transform=None,
    on_commit=None,
) -> list:
    """Follow another system's Debezium-envelope feed LIVE: poll
    ``in_dir`` for newly COMMITTED window/snapshot directories
    (``require_meta`` — the exporter's ``_debezium.json`` is the commit
    marker, so a window mid-write is never half-ingested), convert the
    new files, and ingest each window as one epoch. The live half of
    the CDC-import story (``debezium_to_segments`` + ``run_stream`` is
    the one-shot/resume half; both share run_stream's committed-segment
    cursor, so a restarted tailer continues exactly-once — the whole
    group list is re-offered every poll and already-committed files are
    skipped per-file).

    ``on_commit(manifests, sink)`` fires after each poll that committed
    epochs — the hook point for chaining incremental views off the
    imported stream (hooks derive their own cursors, same contract as
    ``ingest.tail``). ``idle_polls_to_stop`` bounds the loop for tests /
    batch drains (None = run forever)."""
    import time as _time

    from xgeo_ray.pipelines.ingest import run_stream

    committed: list = []
    idle = 0
    while True:
        groups = debezium_to_segments(in_dir, wal_dir, require_meta=True)
        ms = (
            run_stream(sink, [], segment_groups=groups, transform=transform)
            if groups
            else []
        )
        if ms:
            committed.extend(ms)
            idle = 0
            if on_commit is not None:
                on_commit(ms, sink)
        else:
            idle += 1
            if idle_polls_to_stop is not None and idle >= idle_polls_to_stop:
                return committed
            _time.sleep(poll_interval_s)


_UNIT_US = {
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def read_closed_windows(
    table: DeltaTable,
    view_dir: str,
    unit: str = "hour",
    allowed_lateness_us: int = 0,
    alias: str = "bucket",
) -> pa.Table:
    """Finalized tumbling windows of a time-bucketed agg view: the rows
    whose window END is at-or-below the table's event-time watermark
    minus ``allowed_lateness_us`` — the streaming trigger line "this
    window will no longer change under normal arrival". Size the
    lateness knob against the ``late`` lineage metric, same as
    ``tail(on_watermark_advance=)``.

    Closure is an arrival-COMPLETENESS statement, not an immutability
    fence: out-of-band correction batches (``apply_changes`` seq=-1
    rows are watermark-exempt by design) can still reopen a closed
    window — re-read after corrections, or gate them upstream. Only
    fixed-width units close (month/year boundaries are not constant in
    µs)."""
    if unit not in _UNIT_US:
        raise ValueError(
            f"unit {unit!r} has no fixed width; closable units: "
            f"{sorted(_UNIT_US)}"
        )
    t = read_agg_view(view_dir)
    t = t if isinstance(t, pa.Table) else pa.concat_tables(
        ray.get(t.to_arrow_refs())
    )
    wm = table.event_time_watermark(allowed_lateness_us)
    if t.num_rows == 0 or wm < 0:
        return t.slice(0, 0)
    end_us = pc.add(
        t.column(alias).cast(pa.timestamp("us")).cast(pa.int64()),
        pa.scalar(_UNIT_US[unit], pa.int64()),
    )
    return t.filter(pc.less_equal(end_us, pa.scalar(wm, pa.int64())))


def hopping_window_derive(unit: str = "hour", hops: int = 2, alias: str = "bucket"):
    """Derive callable for ``sync_agg``: HOPPING (overlapping) windows —
    each row lands in ``hops`` windows of width ``hops x unit`` stepping
    by one ``unit`` (bucket = window START; window ``b`` covers
    ``[b, b + hops*unit)``). Row-expanding derives are sound here
    because signed weights attach AFTER the derive and both images
    expand identically: an update retracts from every window its old
    version occupied. Pin ``derive_id=f"hop-{unit}-{hops}"``."""
    if unit not in _UNIT_US:
        raise ValueError(
            f"unit {unit!r} has no fixed width; hoppable units: "
            f"{sorted(_UNIT_US)}"
        )
    if hops < 1:
        raise ValueError("hops must be >= 1")
    u = _UNIT_US[unit]

    def _derive(t: pa.Table) -> pa.Table:
        fl = (
            pc.floor_temporal(t.column("ts"), unit=unit)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
        )
        outs = []
        for k in range(hops):
            b = pc.subtract(fl, pa.scalar(k * u, pa.int64())).cast(
                pa.timestamp("us")
            )
            outs.append(t.append_column(alias, b))
        return pa.concat_tables(outs)

    return _derive


def time_bucket_derive(unit: str = "hour", alias: str = "bucket"):
    """Derive callable for ``sync_agg``: tumbling event-time window key
    (truncate each image's OWN ``ts`` to the window start). Sound under
    retractions because the feed exposes ``ts`` per image (top-level
    ``ts`` for the after image, ``_before_ts`` for the before image —
    both surface to the derive as ``ts``): an update whose new version
    lands in a different window retracts from the OLD window and adds
    to the new one. Pass ``derive_id=f"bucket-{unit}"`` to pin the
    window width for the view's lifetime::

        ivm.sync_agg(t, view, group_by=["bucket"],
                     derive=ivm.time_bucket_derive("hour"),
                     derive_id="bucket-hour", columns=[])
    """

    def _derive(t: pa.Table) -> pa.Table:
        return t.append_column(
            alias, pc.floor_temporal(t.column("ts"), unit=unit)
        )

    return _derive


# ------------------------------------------------------------------
# incremental grouped aggregate views (count + sums, via retractions)


def _agg_state(view_dir: str) -> dict:
    p = os.path.join(view_dir, _AGG_META)
    if not os.path.isfile(p):
        return {"last_epoch": 0, "files": {}}
    with open(p) as f:
        return json.load(f)


def _write_agg_state(view_dir: str, state: dict) -> None:
    p = os.path.join(view_dir, _AGG_META)
    tmp = p + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, p)


@ray.remote
def _agg_delta_task(
    feed: pa.Table,
    group_by: list[str],
    sums: list[str],
    derive,
    num_buckets: int,
    bucket_by: list[str],
):
    """Map one partition's before/after feed to signed group partials,
    bucket-sliced by group hash. Returns ``num_buckets`` tables with
    columns ``group_by + [n] + [sum_<c>...]`` (n = signed row weight)."""
    from xgeo_ray.functions.relational import _key_buckets
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    payload = [
        f.name[len(BEFORE_PREFIX):]
        for f in feed.schema
        if f.name.startswith(BEFORE_PREFIX)
        and f.name not in ("_before_exists",)
    ]
    keys = ["conv_id", "turn_idx"]

    def _side(before: bool, exists_col: str, weight: int) -> pa.Table | None:
        t = feed.filter(feed.column(exists_col).combine_chunks())
        if t.num_rows == 0:
            return None
        # both images expose the SAME column names (key cols + payload),
        # so `derive` and the group/sum spec apply identically to each
        src = [(BEFORE_PREFIX + c if before else c) for c in payload]
        t = t.select(keys + src).rename_columns(keys + payload)
        if derive is not None:
            t = derive(t)
        arrays = [t.column(c) for c in group_by]
        w = np.full(t.num_rows, weight, dtype=np.int64)
        arrays.append(pa.array(w))
        for c in sums:
            col = t.column(c)
            if pa.types.is_floating(col.type):
                v = pc.fill_null(col.cast(pa.float64()), 0.0)
                arrays.append(pc.multiply(v, pa.array(w.astype(np.float64))))
            else:
                v = pc.fill_null(col.cast(pa.int64()), 0)
                arrays.append(pc.multiply(v, pa.array(w)))
        return pa.Table.from_arrays(
            arrays, names=list(group_by) + ["n"] + [f"sum_{c}" for c in sums]
        )

    sides = [
        s
        for s in (
            _side(True, "_before_exists", -1),
            _side(False, "_after_exists", +1),
        )
        if s is not None
    ]
    if not sides:
        return tuple(None for _ in range(num_buckets))
    meas = ["n"] + [f"sum_{c}" for c in sums]
    both = pa.concat_tables(sides)
    partial = both.group_by(group_by).aggregate(
        [(c, "sum") for c in meas]
    ).rename_columns(list(group_by) + meas)
    bk = _key_buckets(partial, bucket_by, num_buckets)
    return tuple(
        partial.filter(pa.array(bk == b)) for b in range(num_buckets)
    )


@ray.remote
def _agg_fold_task(
    old_path: str | None,
    group_by: list[str],
    meas: list[str],
    out_path: str,
    *slices: pa.Table | None,
) -> int:
    """Fold one bucket: committed partial + this sync's signed partials,
    one vectorized group-sum; groups whose weight reaches 0 drop (every
    contribution was retracted). Atomic epoch-versioned write — the old
    bucket file survives until the meta commit. Returns -2 (keep the
    old file untouched) when this sync contributed nothing to the
    bucket — untouched buckets cost zero I/O, so sync cost tracks the
    change volume, not the group cardinality."""
    from xgeo_ray.pipelines.ingest import _atomic_write_parquet
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    parts = [s for s in slices if s is not None and s.num_rows > 0]
    if not parts:
        return -2 if old_path is not None else -1
    if old_path is not None:
        parts.append(pq.read_table(old_path, use_threads=False))
    t = pa.concat_tables(parts, promote_options="permissive")
    out = t.group_by(group_by).aggregate(
        [(c, "sum") for c in meas]
    ).rename_columns(group_by + meas)
    out = out.filter(
        pc.not_equal(out.column("n"), pa.scalar(0, out.column("n").type))
    )
    _atomic_write_parquet(out, out_path)
    return out.num_rows


def sync_agg(
    table: DeltaTable,
    view_dir: str,
    group_by: list[str],
    sums: list[str] = (),
    derive: Callable[[pa.Table], pa.Table] | None = None,
    columns: list[str] | None = None,
    num_buckets: int = 16,
    upto_epoch: int | None = None,
    bucket_by: list[str] | None = None,
    derive_id: str = "",
) -> dict:
    """Maintain a grouped COUNT+SUM view of the table's merged state
    incrementally and exactly-once: each sync consumes only the delta
    epochs committed since the view's cursor, turns every change into a
    retraction of its before image and an addition of its after image
    (``changes_with_before`` semantics), and folds the signed partials
    into hash-bucketed parquet partials. After any sync,
    ``read_agg_view(view_dir)`` equals ``SELECT group_by, count(*),
    sum(..) FROM snapshot GROUP BY group_by`` — but the sync's I/O
    tracked the CHANGE volume, not the table size, including on LWW
    tables with updates/deletes (where ``views.refresh_view``'s delta
    path is unsound and falls back to full partition re-merges).

    ``derive`` (optional, pickled by value like merge policies) maps a
    payload table to add computed measure/group columns — applied
    identically to before and after images, so e.g. ``sums=["text_len"]``
    with a utf8_length derive maintains a per-group character total.
    ``sums`` columns accumulate as int64 (float columns as float64).
    ``columns`` prunes the payload read to what derive/group/sums touch
    (pass it on wide tables: the text column never leaves the parquet
    reader otherwise needed). min/max are NOT supported: they are not
    retractable — maintain those with ``views.refresh_view``.

    Crash contract: bucket files are epoch-versioned and the view meta
    is the commit point (same discipline as ``views.refresh_view``);
    a crashed sync re-runs deterministically from the committed cursor.
    Retention: sync before vacuum reclaims the window's delta files or
    the as-of chain (the ``changes()`` contract). A source RESTORE past
    the cursor fails fast — rebuild the view (its folded state includes
    retracted history the source no longer has)."""
    os.makedirs(view_dir, exist_ok=True)
    state = _agg_state(view_dir)
    # floor of 2: ray's num_returns=1 returns a bare ref, not a list,
    # which would break the per-bucket slice wiring
    num_buckets = max(2, int(num_buckets))
    bucket_by = list(group_by) if bucket_by is None else list(bucket_by)
    spec = {
        "group_by": list(group_by),
        "sums": list(sums),
        "num_buckets": num_buckets,
        "bucket_by": bucket_by,
        "derive_id": derive_id,
    }
    if "spec" in state:
        prev = dict(state["spec"])
        prev.setdefault("derive_id", "")  # pre-derive_id views
        if prev != spec:
            raise ValueError(
                f"agg view spec changed: committed {prev} != requested "
                f"{spec}. Use a fresh view_dir (the folded partials are "
                "only meaningful under the spec that built them). NOTE: "
                "the `derive` callable itself cannot be pinned — it must "
                "stay semantically FIXED for the view's lifetime (pass a "
                "version string as derive_id to enforce that here)."
            )
    last = state["last_epoch"]
    eff_epochs = {m.epoch for m in table.effective_manifests()}
    # the cursor must land on an EFFECTIVE epoch: latest_epoch() counts
    # restore markers, which effective_manifests filters out — a cursor
    # on a marker would trip the restore guard forever. Clamp explicit
    # upto_epoch to the largest effective epoch at or below it (an upto
    # beyond the committed fence would otherwise seal the cursor ahead
    # and silently skip every epoch committed underneath it).
    if upto_epoch is None:
        upto = max(eff_epochs, default=0)
    else:
        upto = max((e for e in eff_epochs if e <= upto_epoch), default=0)
    if last > 0 and last not in eff_epochs:
        raise ValueError(
            f"source was restored past the view's cursor (epoch {last} is "
            "no longer in the effective history): the view holds folded "
            "changes the source rolled back. Rebuild the view in a fresh "
            "view_dir."
        )
    if upto <= last:
        return {"synced_epochs": 0, "last_epoch": last, "rows": None}
    window = _window_plan(table, last, upto)
    meas = ["n"] + [f"sum_{c}" for c in sums]
    if window:
        envelope = table.current_schema(upto)
        asof = table.partition_files(as_of_epoch=last) if last > 0 else {}
        policy = _resolve_policy(table)
        from xgeo_ray.pipelines.ingest import _MERGE_COLS
        from xgeo_ray.state.delta_table import LINEAGE_COLS

        skip = set(_MERGE_COLS) | set(LINEAGE_COLS)
        payload = [
            f.name
            for f in envelope
            if f.name not in skip
            and (columns is None or f.name in columns)
        ]
        slice_refs = []
        for part, files in sorted(window.items()):
            feed_ref = _before_after_task.remote(
                files, asof.get(part, []), envelope, policy, payload
            )
            slice_refs.append(
                _agg_delta_task.options(num_returns=num_buckets).remote(
                    feed_ref,
                    list(group_by),
                    list(sums),
                    derive,
                    num_buckets,
                    bucket_by,
                )
            )
        fold_refs = {}
        for b in range(num_buckets):
            old = state["files"].get(str(b))
            old_path = os.path.join(view_dir, old) if old else None
            out_name = f"agg-{b:05d}-e{upto:06d}.parquet"
            fold_refs[b] = (
                out_name,
                _agg_fold_task.remote(
                    old_path,
                    list(group_by),
                    meas,
                    os.path.join(view_dir, out_name),
                    *[refs[b] for refs in slice_refs],
                ),
            )
        rows = 0
        new_files = {}
        for b, (out_name, ref) in fold_refs.items():
            n = ray.get(ref)
            if n >= 0:
                new_files[str(b)] = out_name
                rows += n
            elif n == -2:  # bucket untouched this sync: keep the old file
                new_files[str(b)] = state["files"][str(b)]
        state["files"] = new_files
    else:
        rows = None  # no delta files in the window (e.g. restore-only)
    state["last_epoch"] = upto
    state["spec"] = spec
    if os.environ.get("XGEO_CRASH_BEFORE_AGG_COMMIT"):
        os._exit(137)  # crash hook: folded files exist, meta does not
    _write_agg_state(view_dir, state)
    # post-commit sweep of superseded epoch files
    keep = set(state["files"].values()) | {_AGG_META}
    for n in os.listdir(view_dir):
        if n.startswith("agg-") and n.endswith(".parquet") and n not in keep:
            os.unlink(os.path.join(view_dir, n))
    return {
        "synced_epochs": len(
            {e for files in window.values() for _, e in files}
        ),
        "last_epoch": upto,
        "rows": rows,
    }


# ------------------------------------------------------------------
# secondary index: a posting-list view over the same IVM machinery


def sync_index(
    table: DeltaTable,
    view_dir: str,
    column: str,
    num_buckets: int = 64,
    upto_epoch: int | None = None,
) -> dict:
    """Maintain a SECONDARY INDEX on a non-key column incrementally and
    exactly-once: a posting list ``(column value, conv_id, turn_idx)``
    built from the before/after feed — when a row's value changes, the
    old posting retracts and the new one lands in the same sync. It is
    ``sync_agg`` with group = (value, key) and BUCKETING BY VALUE ALONE,
    so all postings for one value co-locate in exactly one bucket file
    and ``lookup_index`` reads one file regardless of table size.

    Same contracts as sync_agg (cursor, spec pin, restore guard, crash
    commit point). The index is exact as of its cursor — sync before
    lookup when freshness matters. At 100 TB the posting list is
    O(live rows) spread over ``num_buckets`` files; size num_buckets so
    one bucket (~rows/num_buckets postings) fits a reader."""
    return sync_agg(
        table,
        view_dir,
        group_by=[column, "conv_id", "turn_idx"],
        sums=(),
        columns=[column],
        num_buckets=num_buckets,
        upto_epoch=upto_epoch,
        bucket_by=[column],
    )


def lookup_index(view_dir: str, value) -> pa.Table:
    """Postings for one indexed value: reads exactly ONE bucket file
    (the value's hash bucket), filters to the value. Returns
    ``(column, conv_id, turn_idx)`` rows — feed ``conv_id`` into
    ``ingest.lookup_many`` to fetch the merged rows (``lookup_by``)."""
    from xgeo_ray.functions.relational import _key_buckets

    state = _agg_state(view_dir)
    spec = state.get("spec")
    if (
        not spec
        or len(spec["group_by"]) != 3
        or spec.get("bucket_by") != spec["group_by"][:1]
    ):
        raise ValueError(
            f"{view_dir} is not a sync_index view (spec: {spec})"
        )
    column = spec["group_by"][0]
    probe = pa.table({column: pa.array([value])})
    b = int(_key_buckets(probe, [column], spec["num_buckets"])[0])
    name = state["files"].get(str(b))
    cols = spec["group_by"]
    if name is None:
        return pa.table(
            {c: pa.array([], probe.column(0).type if c == column else (
                pa.string() if c == "conv_id" else pa.int32()
            )) for c in cols}
        )
    t = pq.read_table(
        os.path.join(view_dir, name), columns=cols, use_threads=False
    )
    return t.filter(pc.equal(t.column(column), value))


def lookup_by(table: DeltaTable, view_dir: str, value) -> pa.Table:
    """Point lookup BY VALUE of the indexed column: one bucket read for
    the postings, then ``lookup_many`` fetches the merged rows (bloom +
    IN-predicate pruned) and a semi-join keeps exactly the posted
    (conv_id, turn_idx) keys. I/O scales with the match count, never
    with table size."""
    from xgeo_ray.pipelines.ingest import lookup_many

    posts = lookup_index(view_dir, value)
    if posts.num_rows == 0:
        return lookup_many(table, [])
    rows = lookup_many(
        table, posts.column("conv_id").to_pylist()
    )
    keys = posts.select(["conv_id", "turn_idx"])
    return rows.join(keys, keys=["conv_id", "turn_idx"], join_type="inner")


# ------------------------------------------------------------------
# exact retractable MIN/MAX views (pair-count form)


def sync_minmax(
    table: DeltaTable,
    view_dir: str,
    group_by: list[str],
    value: str,
    derive: Callable[[pa.Table], pa.Table] | None = None,
    columns: list[str] | None = None,
    num_buckets: int = 16,
    upto_epoch: int | None = None,
) -> dict:
    """Maintain EXACT min/max per group incrementally despite min/max
    not being retractable aggregates: the persisted state is the
    (group, value) PAIR-COUNT multiset (``sync_agg`` grouped by
    group+value — deletes/updates retract pair counts exactly), and
    ``read_minmax_view`` folds min/max over surviving pairs at read
    time — the standard multiset reduction for non-invertible
    aggregates (cf. DBSP/differential dataflow). View size is
    O(distinct (group, value) pairs), sync cost is change-volume;
    coarse ``value`` domains (lengths, scores, buckets) keep it tiny."""
    return sync_agg(
        table,
        view_dir,
        group_by=list(group_by) + [value],
        sums=(),
        derive=derive,
        columns=columns,
        num_buckets=num_buckets,
        upto_epoch=upto_epoch,
        bucket_by=list(group_by),
    )


def _multiset_spec(view_dir: str) -> tuple[dict, list[str], str]:
    """Validate that ``view_dir`` holds a ``sync_minmax``-shaped
    (group, value) pair-count multiset and return
    ``(spec, group_cols, value_col)``.

    The multiset shape is structurally group_by=[...groups, value]
    bucketed by the groups alone — require that exact shape, or any
    multi-column sync_agg / sync_index view would pass and a fold would
    return a meaningless reduction of its LAST group column (sync_index
    shows as bucket_by == group_by[:1], which this rejects for len-3
    specs). One synced multiset serves EVERY non-invertible read-time
    fold (min/max, count-distinct, top-k, quantiles) — the DBSP
    multiset reduction for aggregates retractions can't invert."""
    spec = _agg_state(view_dir).get("spec")
    if (
        not spec
        or len(spec["group_by"]) < 2
        or spec.get("bucket_by") != spec["group_by"][:-1]
        or spec.get("sums")
    ):
        raise ValueError(
            f"{view_dir} is not a sync_minmax-shaped multiset view "
            f"(spec: {spec})"
        )
    return spec, spec["group_by"][:-1], spec["group_by"][-1]


def read_minmax_view(view_dir: str) -> ray.data.Dataset:
    """min/max per group from a ``sync_minmax`` view: one fold over the
    surviving (group, value) pairs. Columns: group_by + min_<value> +
    max_<value> + n_rows (the group's live row count, free from the
    same pairs)."""
    from xgeo_ray.functions.relational import partial_group_agg

    spec, group, value = _multiset_spec(view_dir)
    return partial_group_agg(
        read_agg_view(view_dir),
        group,
        [
            (value, "min", f"min_{value}"),
            (value, "max", f"max_{value}"),
            ("n", "sum", "n_rows"),
        ],
        num_buckets=spec["num_buckets"],
    )


def read_distinct_view(view_dir: str) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT value) per group from a ``sync_minmax``
    multiset view — distinct count is not retractable either (a delete
    can't tell whether it removed the LAST row holding a value), but
    the pair-count multiset makes it a read-time fold: each surviving
    (group, value) pair IS one distinct value. Columns: group_by +
    ``n_distinct_<value>`` (SQL semantics: nulls not counted) +
    ``n_rows``. Incremental maintenance cost stays change-volume —
    this read costs O(surviving pairs), not O(table)."""
    from xgeo_ray.functions.relational import partial_group_agg

    spec, group, value = _multiset_spec(view_dir)
    return partial_group_agg(
        read_agg_view(view_dir),
        group,
        [
            (value, "count", f"n_distinct_{value}"),
            ("n", "sum", "n_rows"),
        ],
        num_buckets=spec["num_buckets"],
    )


def read_topk_view(
    view_dir: str, k: int, largest: bool = True
) -> ray.data.Dataset:
    """Per-group top-k VALUES (with live row counts) from a
    ``sync_minmax`` multiset view: rank the surviving (group, value)
    pairs by value within each group. Columns: group_by + value + ``n``
    (live rows holding that value in the group) + ``rank`` (1-based).
    Exact under deletes/updates — when every row holding the current
    top value retracts, the next value surfaces, same guarantee
    ``read_minmax_view`` certifies for k=1."""
    from xgeo_ray.functions.relational import grouped_top_k

    spec, group, value = _multiset_spec(view_dir)
    return grouped_top_k(
        read_agg_view(view_dir),
        group,
        sort_cols=[value],
        descending=[largest],
        k=k,
        rank_col="rank",
        num_buckets=spec["num_buckets"],
    )


@ray.remote
def _quantile_fold_task(
    path: str, group: list[str], value: str, qs: list[float]
) -> pa.Table:
    """Weighted exact quantile_disc per group over one multiset bucket
    file. A group's pairs live wholly in one bucket (sync_agg buckets
    by the group columns), so per-file folds are complete. Fully
    vectorized: one sort, one cumsum, one searchsorted for ALL groups'
    targets at once (pair counts are positive, so the global cumsum is
    strictly increasing and absolute-rank targets resolve per group)."""
    import math

    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    t = pq.read_table(path, columns=group + [value, "n"], use_threads=False)
    out_schema = pa.schema(
        [t.schema.field(c) for c in group]
        + [pa.field("q", pa.float64()), t.schema.field(value)]
    )
    if t.num_rows == 0:
        return out_schema.empty_table()
    t = t.sort_by([(c, "ascending") for c in group + [value]])
    # group-boundary scan (null-safe): a new group starts where any
    # group column changes, counting null<->non-null as a change
    chg = np.zeros(t.num_rows - 1, dtype=bool) if t.num_rows > 1 else None
    if chg is not None:
        for c in group:
            col = t.column(c).combine_chunks()
            a, b = col.slice(1), col.slice(0, len(col) - 1)
            ne = pc.fill_null(pc.not_equal(a, b), False)
            nulls_differ = pc.xor(pc.is_null(a), pc.is_null(b))
            chg |= pc.or_(ne, nulls_differ).to_numpy(zero_copy_only=False)
    starts = (
        np.flatnonzero(np.concatenate([[True], chg]))
        if chg is not None
        else np.array([0], dtype=np.int64)
    )
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.cumsum(n)
    base = np.where(starts > 0, cum[starts - 1], 0)
    ends = np.concatenate([starts[1:] - 1, [t.num_rows - 1]])
    totals = cum[ends] - base
    rows_g, rows_q = [], []
    for q in qs:
        # quantile_disc: value at 1-indexed weighted position ceil(q*n)
        # (same convention as functions.relational.exact_quantiles)
        pos = np.maximum(1, np.ceil(q * totals).astype(np.int64))
        idx = np.searchsorted(cum, base + pos, side="left")
        rows_g.append(idx)
        rows_q.append(np.full(len(idx), q))
    take = np.concatenate(rows_g)
    arrays = [t.column(c).take(pa.array(take)) for c in group]
    arrays.append(pa.array(np.concatenate(rows_q), pa.float64()))
    arrays.append(t.column(value).take(pa.array(take)))
    return pa.Table.from_arrays(arrays, schema=out_schema)


def read_quantile_view(view_dir: str, qs: list[float]) -> ray.data.Dataset:
    """Exact per-group quantiles from a ``sync_minmax`` multiset view —
    quantiles are the canonical non-invertible aggregate, and the
    pair-count multiset IS the exact value histogram the fold needs:
    each surviving (group, value, n) row contributes ``n`` ranks.
    One raw-Ray task per committed bucket file (groups never span
    buckets), vectorized inside; result columns: group_by + ``q`` +
    value (``quantile_disc`` semantics — the value at 1-indexed
    weighted position ceil(q*n), matching
    ``functions.relational.exact_quantiles`` and DuckDB's
    ``quantile_disc``). View size bounds the cost: O(distinct
    (group, value) pairs), never O(table rows) — the same
    fixed-precision-domain contract exact_quantiles documents."""
    state = _agg_state(view_dir)
    _, group, value = _multiset_spec(view_dir)
    files = [
        os.path.join(view_dir, n)
        for _, n in sorted(state["files"].items(), key=lambda kv: int(kv[0]))
    ]
    if not files:
        raise FileNotFoundError(f"no committed agg view under {view_dir}")
    refs = [
        _quantile_fold_task.remote(p, list(group), value, [float(q) for q in qs])
        for p in files
    ]
    return ray.data.from_arrow_refs(refs)


def read_agg_view(view_dir: str) -> ray.data.Dataset:
    """The committed grouped aggregate as a Dataset (columns: group_by +
    ``n`` + ``sum_<c>``). Groups retracted to zero weight are absent.
    Reads only the meta-committed file set — an in-flight or crashed
    sync's files are invisible."""
    state = _agg_state(view_dir)
    files = [
        os.path.join(view_dir, n)
        for _, n in sorted(state["files"].items(), key=lambda kv: int(kv[0]))
    ]
    if not files:
        raise FileNotFoundError(f"no committed agg view under {view_dir}")
    return ray.data.read_parquet(files)


# ------------------------------------------------------------------
# incremental PK join views: a joined DeltaTable maintained from BOTH
# sides' committed change streams at change-volume cost

_JOIN_META = "_join.json"
_SCD2_META = "_scd2.json"


def _payload_names(
    envelope: pa.Schema, columns: list[str] | None
) -> list[str]:
    from xgeo_ray.pipelines.ingest import _MERGE_COLS
    from xgeo_ray.state.delta_table import LINEAGE_COLS

    skip = set(_MERGE_COLS) | set(LINEAGE_COLS)
    names = [f.name for f in envelope if f.name not in skip]
    if columns is not None:
        missing = sorted(set(columns) - set(names))
        if missing:
            raise ValueError(
                f"join columns {missing} not payload columns of the "
                f"side (payload: {names})"
            )
        names = [n for n in names if n in set(columns)]
    return names


def join_sink_schema(
    left: DeltaTable,
    right: DeltaTable,
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    right_prefix: str = "r_",
    how: str = "inner",
) -> pa.Schema:
    """The ``base_schema`` for a ``sync_join`` sink: keys + the left
    side's payload columns under their own names + the right side's
    prefixed + (``how="left"`` only) a ``<prefix>exists`` flag that
    disambiguates "no right row" from "right row with null values".
    Pass to ``DeltaTable.create(base_schema=...)``. Name collisions
    between the prefixed right columns and the left columns refuse —
    pick a different ``right_prefix``."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lenv, renv = left.current_schema(), right.current_schema()
    fields = [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", lenv.field("turn_idx").type),
    ]
    for c in _payload_names(lenv, left_columns):
        fields.append(lenv.field(c))
    names = {f.name for f in fields}
    rcols = _payload_names(renv, right_columns)
    if how == "left":
        rcols = rcols + ["exists"]
    for c in rcols:
        n = right_prefix + c
        if n in names:
            raise ValueError(
                f"prefixed right column {n!r} collides with a left "
                f"column — pass a different right_prefix"
            )
        t = pa.bool_() if c == "exists" else renv.field(c).type
        fields.append(pa.field(n, t))
        names.add(n)
    fields.append(pa.field("ts", pa.timestamp("us")))
    return pa.schema(fields)


@ray.remote
def _window_keys_task(path: str) -> pa.Table:
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    t = pq.read_table(
        path, columns=["conv_id", "turn_idx"], use_threads=False
    )
    return pa.table(
        {
            "conv_id": t.column("conv_id").cast(pa.string()),
            "turn_idx": t.column("turn_idx").cast(pa.int64()),
        }
    )


def sync_join(
    left: DeltaTable,
    right: DeltaTable,
    sink: DeltaTable,
    how: str = "inner",
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    right_prefix: str = "r_",
    upto_left: int | None = None,
    upto_right: int | None = None,
    max_convs_per_batch: int = 100_000,
) -> dict:
    """Maintain a MATERIALIZED PK equi-join of two tables incrementally
    and exactly-once: after any sync, ``snapshot(sink)`` equals the key
    join of ``snapshot(left, as_of=left cursor)`` and ``snapshot(right,
    as_of=right cursor)`` — but each sync's I/O tracks the CHANGE
    volume, not the table sizes. The key-granularity complement of
    ``pipelines.join_view`` (which recomputes whole partitions when
    either side's file set moved, and requires aligned partitioning):
    this path re-joins only the keys TOUCHED since the cursors, via
    bloom/IN-pruned batch lookups — so the two sides may have different
    partitioning entirely.

    Per sync: (1) advance both sides' consumer cursors over their
    committed delta epochs; (2) key-column-only reads of the window
    files collect the touched (conv_id, turn_idx) set; (3) one
    ``lookup_many(as_of_epoch=cursor)`` per side fetches those keys'
    merged current rows as of the PINNED epochs (a concurrent commit
    cannot tear the join); (4) the per-key join recomputes vectorized
    (Acero, driver-side over O(touched keys) rows); (5) joined rows
    upsert into ``sink`` (op='U'), keys now absent from the join
    tombstone (op='D'), via ``apply_changes`` batches exactly-once by
    batch id; (6) both cursors ack. The touched-conv set is chunked
    into deterministic sub-batches of at most ``max_convs_per_batch``
    conversations (sorted conv order, ``-c{i:05d}`` batch-id suffix),
    so a bootstrap-sized window — the first sync against a large
    existing source, or a full rewind — holds only one chunk's payload
    rows on the driver at a time instead of the whole join. Crash
    order upsert-then-ack: a replayed window recomputes convergently
    under the sink's LWW (committed chunks no-op on their batch ids;
    both pinned epochs re-derive identically while the cursors are
    unacked). Readers between chunk commits see a consistent PREFIX of
    the window (each key's row is individually exact as of the pinned
    epochs).

    ``how``: "inner" or "left" (right columns null when unmatched,
    ``<prefix>exists``=False distinguishes that from null values).
    Create ``sink`` with ``base_schema=join_sink_schema(...)`` — payload
    columns flow only if DECLARED there (source columns added by later
    schema evolution are ignored until the view is rebuilt), the
    ``stages.enrich`` convention. Spec pinned in ``_join.json``;
    changing it refuses. A source RESTORE below its cursor fails fast
    (rebuild, or ``consumers.rewind`` both cursors below the restore
    target). Restoring the SINK desyncs the view the same way — rewind
    the source cursors to (at most) the sink's restored epoch's source
    window or rebuild. Retention: sync before vacuum reclaims either
    side's window deltas or as-of chains (the ``changes()`` contract).

    No reference counterpart (stateless CLI,
    /root/reference/cmd/xgeo/main.go:18-61); published shape: Iceberg/
    Delta MERGE-maintained join tables and DBSP delta-join views."""
    import hashlib

    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state import consumers as _cons

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if sink.merge_policy != "lww":
        raise ValueError(
            f"sync_join sink must be merge_policy='lww' (got "
            f"{sink.merge_policy!r}): per-key recomputation upserts "
            "full replacement rows"
        )
    spec = {
        "left_root": os.path.abspath(left.root),
        "right_root": os.path.abspath(right.root),
        "how": how,
        "right_prefix": right_prefix,
        "left_columns": None if left_columns is None else sorted(left_columns),
        "right_columns": None
        if right_columns is None
        else sorted(right_columns),
    }
    meta_p = os.path.join(sink.root, _JOIN_META)
    if os.path.isfile(meta_p):
        with open(meta_p) as f:
            prev = json.load(f)
        if prev != spec:
            raise ValueError(
                f"join view spec changed: committed {prev} != requested "
                f"{spec}. Use a fresh sink (its rows are only meaningful "
                "under the spec that built them)."
            )
    else:
        tmp = meta_p + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(spec, f, indent=1)
        os.replace(tmp, meta_p)
    sink_id = hashlib.sha1(
        os.path.abspath(sink.root).encode()
    ).hexdigest()[:10]
    gl, gr = f"join-{sink_id}-L", f"join-{sink_id}-R"

    def _cursor(side: DeltaTable, group: str, upto_req: int | None):
        since = _cons.position(side, group)
        eff = {m.epoch for m in side.effective_manifests()}
        if since > 0 and since not in eff:
            raise ValueError(
                f"source {side.root} was restored past the join view's "
                f"cursor (epoch {since} is no longer in the effective "
                "history): the sink holds rows the source rolled back. "
                "Rebuild the view or rewind both cursors below the "
                "restore target."
            )
        if upto_req is None:
            upto = max(eff, default=0)
        else:
            upto = max((e for e in eff if e <= upto_req), default=0)
        return since, max(upto, since)

    since_l, upto_l = _cursor(left, gl, upto_left)
    since_r, upto_r = _cursor(right, gr, upto_right)
    stats = {
        "synced_epochs": 0,
        "keys": 0,
        "upserts": 0,
        "deletes": 0,
        "left_epoch": upto_l,
        "right_epoch": upto_r,
    }
    if upto_l <= since_l and upto_r <= since_r:
        return stats
    win_l = _window_plan(left, since_l, upto_l)
    win_r = _window_plan(right, since_r, upto_r)
    files = [p for w in (win_l, win_r) for fl in w.values() for p, _ in fl]
    stats["synced_epochs"] = sum(
        len({e for fl in w.values() for _, e in fl}) for w in (win_l, win_r)
    )
    key_tabs = [
        t
        for t in ray.get([_window_keys_task.remote(p) for p in files])
        if t.num_rows
    ]
    if not key_tabs:
        _cons.ack(left, gl, upto_l)
        _cons.ack(right, gr, upto_r)
        return stats
    kt_all = pa.concat_tables(key_tabs).group_by(
        ["conv_id", "turn_idx"]
    ).aggregate([])
    stats["keys"] = kt_all.num_rows
    convs_all = sorted(set(kt_all.column("conv_id").to_pylist()))
    # Sort the touched-key table by conv once so each chunk below is a
    # contiguous slice — a per-chunk is_in() filter over the full table
    # would make a bootstrap-sized window O(total_keys * num_chunks).
    kt_all = kt_all.take(
        pc.sort_indices(kt_all, sort_keys=[("conv_id", "ascending")])
    )
    _kt_convs = kt_all.column("conv_id").to_numpy(zero_copy_only=False)

    sink_names = set(sink.current_schema().names)
    lpay = [
        c
        for c in _payload_names(left.current_schema(upto_l), left_columns)
        if c in sink_names
    ]
    rpay = [
        c
        for c in _payload_names(right.current_schema(upto_r), right_columns)
        if right_prefix + c in sink_names
    ]

    if max_convs_per_batch < 1:
        raise ValueError("max_convs_per_batch must be >= 1")
    win_id = f"{gl}-eL{since_l + 1}-{upto_l}-eR{since_r + 1}-{upto_r}"
    for ci in range(0, len(convs_all), max_convs_per_batch):
        convs = convs_all[ci : ci + max_convs_per_batch]
        uniq = pa.array(convs, pa.string())
        _lo = int(np.searchsorted(_kt_convs, convs[0], "left"))
        _hi = int(np.searchsorted(_kt_convs, convs[-1], "right"))
        kt = kt_all.slice(_lo, _hi - _lo)
        k_codes = np.sort(
            _k64_codes(kt.column("conv_id"), kt.column("turn_idx"), uniq)
        )

        def _side_rows(side, upto, pay) -> pa.Table:
            t = ing.lookup_many(side, convs, as_of_epoch=upto)
            t = pa.table(
                {
                    "conv_id": t.column("conv_id").cast(pa.string()),
                    "turn_idx": t.column("turn_idx").cast(pa.int64()),
                    **{c: t.column(c) for c in pay},
                }
            )
            codes = _k64_codes(
                t.column("conv_id"), t.column("turn_idx"), uniq
            )
            return t.filter(pa.array(np.isin(codes, k_codes)))

        a = _side_rows(left, upto_l, lpay)
        b = _side_rows(right, upto_r, rpay)
        b = b.rename_columns(
            ["conv_id", "turn_idx"] + [right_prefix + c for c in rpay]
        )
        exists_col = right_prefix + "exists"
        if how == "left" and exists_col in sink_names:
            b = b.append_column(
                exists_col, pa.array(np.ones(b.num_rows, bool), pa.bool_())
            )
        joined = a.join(
            b,
            keys=["conv_id", "turn_idx"],
            join_type="inner" if how == "inner" else "left outer",
        )
        if how == "left" and exists_col in joined.column_names:
            joined = joined.set_column(
                joined.column_names.index(exists_col),
                exists_col,
                pc.fill_null(joined.column(exists_col), False),
            )
        j_codes = _k64_codes(
            joined.column("conv_id"), joined.column("turn_idx"), uniq
        )
        dead = kt.filter(pa.array(~np.isin(
            _k64_codes(kt.column("conv_id"), kt.column("turn_idx"), uniq),
            j_codes,
        )))
        stats["upserts"] += joined.num_rows
        stats["deletes"] += dead.num_rows
        parts = []
        if joined.num_rows:
            parts.append(
                joined.append_column(
                    "op",
                    pa.array(
                        np.full(joined.num_rows, "U", "U1"), pa.string()
                    ),
                )
            )
        if dead.num_rows:
            parts.append(
                dead.append_column(
                    "op",
                    pa.array(np.full(dead.num_rows, "D", "U1"), pa.string()),
                )
            )
        if parts:
            batch = pa.concat_tables(parts, promote_options="permissive")
            # cast to the sink's DECLARED types (the working key type is
            # int64): a wider batch column would otherwise silently EVOLVE
            # the sink schema through the ingest union
            env_s = sink.current_schema()
            batch = pa.table(
                {
                    c: (
                        batch.column(c).cast(env_s.field(c).type)
                        if c in env_s.names
                        else batch.column(c)
                    )
                    for c in batch.column_names
                }
            )
            ing.apply_changes(
                sink,
                batch,
                batch_id=f"{win_id}-c{ci // max_convs_per_batch:05d}",
            )
        if os.environ.get("XGEO_CRASH_AFTER_JOIN_CHUNK") == str(
            ci // max_convs_per_batch
        ):
            os._exit(137)  # crash hook: this chunk applied, cursors not acked
    if os.environ.get("XGEO_CRASH_BEFORE_JOIN_ACK"):
        os._exit(137)  # crash hook: sink upserted, cursors not acked
    _cons.ack(left, gl, upto_l)
    _cons.ack(right, gr, upto_r)
    return stats


# ------------------------------------------------------------------
# SCD Type-2 dimension views (version-interval rows from the feed)

_SCD2_SEP = "\x1f"  # unit separator: composite source key, collision-free


def scd2_schema(
    source: DeltaTable, columns: list[str] | None = None
) -> pa.Schema:
    """Base schema for a ``sync_scd2`` sink over ``source``. The sink
    is keyed (composite source key, ``valid_from`` µs): ``conv_id`` =
    ``"<src conv_id>\\x1f<src turn_idx>"`` and ``turn_idx`` holds
    ``valid_from`` as int64 µs — one row per VERSION of each source
    key. Source keys ride along as ``src_conv_id``/``src_turn_idx``
    payload columns, then the (possibly ``columns``-restricted)
    source payload, then ``valid_to`` (int64 µs, null = current)."""
    env = source.current_schema()
    from xgeo_ray.pipelines.ingest import _MERGE_COLS
    from xgeo_ray.state.delta_table import LINEAGE_COLS

    skip = set(_MERGE_COLS) | set(LINEAGE_COLS)
    payload = [
        f
        for f in env
        if f.name not in skip and (columns is None or f.name in columns)
    ]
    return pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int64()),
            pa.field("src_conv_id", env.field("conv_id").type),
            pa.field("src_turn_idx", env.field("turn_idx").type),
            *payload,
            pa.field("valid_to", pa.int64()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )


@ray.remote
def _scd2_emit_task(feed: pa.Table, payload: list[str]) -> pa.Table:
    """Version-interval rows from one partition's feed window,
    vectorized end to end. Per effective transition: a CLOSE row
    rewrites the before version (same sink key, ``valid_to`` = the
    after image's event time) and an OPEN row starts the after version
    (``valid_to`` null). No-op transitions (LWW losers: before ==
    after including ts) emit nothing. Within the window the rows
    dedupe per (key, valid_from) keeping the latest epoch — an open
    superseded by a later epoch's close collapses here, not in the
    sink — with OPEN preferred inside one epoch (a same-instant update
    keeps the live later-seq version, the zero-width-interval rule).
    All of a key's window rows live in this one task (the feed is
    partition-aligned), so the dedupe is complete locally."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    be = pc.fill_null(feed.column("_before_exists"), False)
    ae = pc.fill_null(feed.column("_after_exists"), False)
    ts_us = feed.column("ts").cast(pa.int64())
    bts_us = feed.column(BEFORE_PREFIX + "ts").cast(pa.int64())
    # no-op transition: both images exist and are identical (ts too)
    same = pc.and_(be, ae)
    same = pc.and_(same, pc.fill_null(pc.equal(ts_us, bts_us), False))
    for c in payload:
        a, b = feed.column(c), feed.column(BEFORE_PREFIX + c)
        try:
            eqv = pc.fill_null(pc.equal(a, b), False)
        except pa.lib.ArrowNotImplementedError:
            # no equality kernel for this type (list/binary payloads):
            # conservatively treat as CHANGED — the spurious transition
            # is a same-key idempotent rewrite (close and open carry
            # identical values and dedupe to the open), never corruption
            eqv = pa.array(np.zeros(feed.num_rows, dtype=bool))
        eq = pc.or_(pc.and_(pc.is_null(a), pc.is_null(b)), eqv)
        same = pc.and_(same, eq)
    ck = pc.binary_join_element_wise(
        feed.column("conv_id").cast(pa.string()),
        feed.column("turn_idx").cast(pa.string()),
        _SCD2_SEP,
    )
    live = pc.invert(same)
    epoch = feed.column("_epoch")

    def rows(mask, vfrom, vto, img_prefix: str, is_open: int) -> pa.Table:
        cols = {
            "conv_id": pc.filter(ck, mask),
            "turn_idx": pc.filter(vfrom, mask),
            "src_conv_id": feed.filter(mask).column("conv_id"),
            "src_turn_idx": feed.filter(mask).column("turn_idx"),
        }
        f = feed.filter(mask)
        for c in payload:
            cols[c] = f.column(img_prefix + c)
        cols["valid_to"] = (
            pc.filter(vto, mask)
            if vto is not None
            else pa.nulls(f.num_rows, pa.int64())
        )
        cols["_epoch"] = f.column("_epoch")
        cols["_is_open"] = pa.array(
            np.full(f.num_rows, is_open, np.int8)
        )
        return pa.table(cols)

    closes = rows(
        pc.and_(be, live), bts_us, ts_us, BEFORE_PREFIX, 0
    )
    opens = rows(pc.and_(ae, live), ts_us, None, "", 1)
    out = pa.concat_tables([closes, opens], promote_options="permissive")
    if out.num_rows == 0:
        return out.drop_columns(["_epoch", "_is_open"])
    # keep-last per (key, valid_from): later epoch wins; open beats
    # close within one epoch
    ckv = np.asarray(out.column("conv_id").to_numpy(zero_copy_only=False))
    _, codes = np.unique(ckv, return_inverse=True)
    vf = out.column("turn_idx").to_numpy(zero_copy_only=False)
    ep = out.column("_epoch").to_numpy(zero_copy_only=False)
    io_ = out.column("_is_open").to_numpy(zero_copy_only=False)
    order = np.lexsort((io_, ep, vf, codes))
    codes, vf = codes[order], vf[order]
    last = np.ones(len(order), dtype=bool)
    last[:-1] = (codes[1:] != codes[:-1]) | (vf[1:] != vf[:-1])
    return out.take(pa.array(order[last])).drop_columns(
        ["_epoch", "_is_open"]
    )


def sync_scd2(
    source: DeltaTable,
    sink: DeltaTable,
    columns: list[str] | None = None,
    upto_epoch: int | None = None,
) -> dict:
    """Maintain an SCD TYPE-2 dimension view of ``source``
    incrementally: one sink row per VERSION of each source key with
    its validity interval — ``valid_from`` (the version's own event
    time, held in the sink's ``turn_idx`` key slot as int64 µs) and
    ``valid_to`` (the superseding version's event time; null = the
    current version; a delete closes without opening). The classic
    warehouse change-history table, fed by ``changes_with_before`` —
    the before image in the feed is what lets a close REWRITE the full
    version row under the sink's plain LWW upsert, no read-modify
    anywhere.

    Create the sink with ``base_schema=scd2_schema(source, columns)``
    (``num_salts=1``; versions of one key are few). Exactly-once:
    consumer-group cursor on the source, sink upsert
    (``apply_changes`` batch, deterministic batch id, ``ts_us`` =
    window end epoch so later windows always win LWW) THEN ack — a
    crash between them replays an identical batch that no-ops.
    Change-volume cost end to end: one feed task per TOUCHED
    partition, emissions bounded by the window's transitions,
    untouched keys never read or written.

    Semantics notes: intervals follow effective TRANSITION order,
    which under LWW is per-key non-decreasing in (ts, seq), so
    ``valid_from <= valid_to`` always; a same-instant update (equal
    ts, later seq) keeps the later version under the same (key,
    valid_from) — the zero-width-interval convention. On a collapsed
    table versions are EPOCH-granular (intra-epoch losers were never
    committed state); ``read_scd2_asof`` therefore matches
    ``snapshot(as_of_ts_us=T)`` exactly — the parity the tests pin.
    Deleted versions stay queryable forever (the view is history;
    vacuum of the SOURCE does not touch it)."""
    import hashlib

    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state import consumers as _cons

    # Spec pin (same discipline as _join.json/_neardup.json): a later
    # sync with a different columns argument would silently emit a
    # different payload and evolve the sink schema mid-history —
    # version rows with inconsistent column coverage. None means
    # "follow the source schema" and is itself a pinned choice.
    spec = {"columns": None if columns is None else sorted(columns)}
    meta_p = os.path.join(sink.root, _SCD2_META)
    if os.path.isfile(meta_p):
        with open(meta_p) as f:
            prev = json.load(f)
        if prev != spec:
            raise ValueError(
                f"scd2 sink spec changed: committed {prev} != requested "
                f"{spec}. Use a fresh sink (its version rows are only "
                "meaningful under the spec that built them)."
            )
    else:
        tmp = meta_p + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(spec, f, indent=1)
        os.replace(tmp, meta_p)
    sink_id = hashlib.sha1(
        os.path.abspath(sink.root).encode()
    ).hexdigest()[:10]
    group = f"scd2-{sink_id}"
    since = _cons.position(source, group)
    upto = source.latest_epoch() if upto_epoch is None else upto_epoch
    if upto <= since:
        return {"synced_epochs": 0, "versions": 0, "last_epoch": since}
    refs, payload, _env = _feed_refs(source, since, upto, columns)
    parts = ray.get(
        [_scd2_emit_task.remote(r, payload) for _, r in refs]
    )
    parts = [p for p in parts if p.num_rows]
    n = 0
    if parts:
        batch = pa.concat_tables(parts, promote_options="permissive")
        batch = batch.append_column(
            "op", pa.array(["U"] * batch.num_rows, pa.string())
        )
        n = batch.num_rows
        ing.apply_changes(
            sink,
            batch,
            batch_id=f"{group}-e{since + 1}-{upto}",
            ts_us=upto,
        )
    if os.environ.get("XGEO_CRASH_BEFORE_SCD2_ACK"):
        os._exit(137)  # crash hook: sink upserted, cursor not acked
    _cons.ack(source, group, upto)
    return {
        "synced_epochs": upto - since,
        "versions": n,
        "last_epoch": upto,
    }


def read_scd2(sink: DeltaTable, **snapshot_kwargs) -> ray.data.Dataset:
    """The SCD2 view with reader-facing names: the sink's key slots
    surface as ``valid_from`` (int64 µs) alongside
    ``src_conv_id``/``src_turn_idx``, payload and ``valid_to``."""
    from xgeo_ray.pipelines.ingest import snapshot

    ds = snapshot(sink, **snapshot_kwargs)

    def rn(b: pa.Table) -> pa.Table:
        b = b.drop_columns(["conv_id"])
        return b.rename_columns(
            ["valid_from" if c == "turn_idx" else c for c in b.column_names]
        )

    return ds.map_batches(rn, batch_format="pyarrow")


def read_scd2_asof(sink: DeltaTable, ts_us: int) -> ray.data.Dataset:
    """The dimension AS OF event time T from the SCD2 view: versions
    with ``valid_from <= T`` and (``valid_to`` null or ``> T``). A
    pure filtered scan of the view — no merge-time travel, which is
    the point: the warehouse pattern answers as-of queries from the
    maintained intervals alone (and, on a collapsed source, matches
    ``snapshot(as_of_ts_us=T)`` row for row)."""

    def asof(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.less_equal(
                b.column("valid_from"), pa.scalar(ts_us, pa.int64())
            ),
            pc.or_(
                pc.is_null(b.column("valid_to")),
                pc.greater(
                    b.column("valid_to"), pa.scalar(ts_us, pa.int64())
                ),
            ),
        )
        return b.filter(keep)

    return read_scd2(sink).map_batches(asof, batch_format="pyarrow")


def scd2_join(
    facts: ray.data.Dataset,
    sink: DeltaTable,
    on: tuple[str, str] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    prefix: str = "dim_",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """TEMPORAL (point-in-time) join: enrich each fact row with the
    dimension version that was valid AT THE FACT'S OWN event time —
    the query an SCD2 table exists to answer, and the join a plain
    snapshot join gets silently wrong for late or replayed facts.

    Per fact: the version with ``valid_from <= fact ts`` and
    (``valid_to`` null or ``> ts``); facts before the key's first
    version, after its deletion, or with no matching key get null
    dimension columns (left-join semantics). Shape: ONE co-partitioned
    as-of join on the composite key (both sides large, never
    broadcast — ``relational.asof_join_partitioned``), then a
    vectorized expiry pass nulls matches whose interval closed before
    the fact (the as-of backward match is the latest ``valid_from <=
    ts``, which for a deleted key is its final closed version).

    Returns the fact columns + the dimension payload under ``prefix``
    + ``<prefix>valid_from`` (null = no live version at that instant).
    ``ts_col`` may be timestamp[us] or int64 µs."""
    from xgeo_ray.functions.relational import asof_join_partitioned

    env = sink.current_schema()
    reserved = {
        "conv_id",
        "turn_idx",
        "src_conv_id",
        "src_turn_idx",
        "valid_to",
        "ts",
        "seq",
        "op",
    }
    payload = [f.name for f in env if f.name not in reserved]
    fact_cols = list(facts.schema().names)

    def prep_dim(b: pa.Table) -> pa.Table:
        ck = pc.binary_join_element_wise(
            b.column("src_conv_id").cast(pa.string()),
            b.column("src_turn_idx").cast(pa.string()),
            _SCD2_SEP,
        )
        cols = {"__ck": ck, "__valid_from": b.column("valid_from")}
        for c in payload:
            cols[prefix + c] = b.column(c)
        cols["__valid_to"] = b.column("valid_to")
        return pa.table(cols)

    def prep_fact(b: pa.Table) -> pa.Table:
        ck = pc.binary_join_element_wise(
            b.column(on[0]).cast(pa.string()),
            b.column(on[1]).cast(pa.string()),
            _SCD2_SEP,
        )
        b = b.append_column("__fck", ck)
        return b.append_column(
            "__ts_us", b.column(ts_col).cast(pa.int64())
        )

    dim = read_scd2(sink).map_batches(prep_dim, batch_format="pyarrow")
    f = facts.map_batches(prep_fact, batch_format="pyarrow")
    joined = asof_join_partitioned(
        f,
        dim,
        left_by="__fck",
        right_by="__ck",
        left_on="__ts_us",
        right_on="__valid_from",
        direction="backward",
        num_buckets=num_buckets,
    )
    dim_out = [prefix + c for c in payload]

    def expire(b: pa.Table) -> pa.Table:
        # the backward match for a deleted key is its final CLOSED
        # version — null it (and any interval that ended before the fact)
        dead = pc.and_(
            pc.is_valid(b.column("__valid_to")),
            pc.less_equal(b.column("__valid_to"), b.column("__ts_us")),
        )
        dead = pc.fill_null(dead, False)
        cols = {c: b.column(c) for c in fact_cols}
        for c in dim_out:
            cols[c] = pc.if_else(
                dead, pa.scalar(None, b.schema.field(c).type), b.column(c)
            )
        cols[prefix + "valid_from"] = pc.if_else(
            dead,
            pa.scalar(None, pa.int64()),
            b.column("__valid_from"),
        )
        return pa.table(cols)

    return joined.map_batches(expire, batch_format="pyarrow")
