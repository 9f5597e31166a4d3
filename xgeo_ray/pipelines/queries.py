"""Driver-facing operator queries + DuckDB oracles (SURVEY.md §2, §5).

Every public operator gets a ``queries()`` entry (a callable over
``sf_dir``) and, when SQL-expressible, a matching ``oracle_sql()`` string
the driver runs on the same Parquet. Conventions that make the
value-hash comparison meaningful:

  * identical column NAMES and Arrow TYPES on both sides (ints are
    int64/BIGINT, ranks included rather than raw float scores),
  * no floating-point aggregates: money/value sums use exact integer
    cents via FLOOR(x*100) on both sides (same doubles in, same int64
    out — float *sum order* can differ across engines, FLOOR of an
    identical product cannot),
  * deterministic tiebreaks everywhere a sort/top-k/window is involved.

The CDC queries run the engine's real kernels over a change stream
derived deterministically from the ``events`` table (the driver's
CDC-like stream surrogate, TESTDATA.md) so DuckDB can replay the same
semantics in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from xgeo_ray.functions.relational import (
    add_time_bucket,
    broadcast_join,
    partial_group_agg,
    sessionize,
    top_k,
)
from xgeo_ray.partition import PART_COL, add_part_key
from xgeo_ray.stages.collapse import lww_collapse


def _read(
    path: str, columns: list[str] | None = None, **kwargs
) -> ray.data.Dataset:
    """read_parquet with width-aware block count (see
    sources.wal.plan_num_blocks) and column pruning — the scan-side
    discipline every query shares. Extra kwargs (e.g. ``filter`` for
    row-group pushdown) pass through."""
    import os

    from xgeo_ray.sources.wal import plan_num_blocks

    n_blocks = plan_num_blocks(os.path.getsize(path))
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=n_blocks, **kwargs
    )

# --------------------------------------------------------------- CDC surrogate

_DERIVE_SQL = """
    SELECT event_id AS seq,
           CASE WHEN event_id % 10 < 6 THEN 'I'
                WHEN event_id % 10 < 9 THEN 'U'
                ELSE 'D' END AS op,
           'u' || CAST(user_id AS VARCHAR) AS conv_id,
           event_id % 40 AS turn_idx,
           event_type AS role,
           props AS text,
           ts
    FROM events
"""


def derive_change_events(sf_dir: str) -> ray.data.Dataset:
    """Deterministic change stream from the events table: op by
    event_id%10 (6/3/1 I/U/D mix), key (user, event_id%40), seq=event_id."""
    ds = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )

    def derive(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy()
        mod = eid % 10
        op = np.where(mod < 6, "I", np.where(mod < 9, "U", "D"))
        conv = pc.binary_join_element_wise(
            "u", pc.cast(b.column("user_id"), pa.string()), ""
        )
        return pa.table(
            {
                "seq": b.column("event_id"),
                "op": pa.array(op, pa.string()),
                "conv_id": conv,
                "turn_idx": pa.array(eid % 40, pa.int64()),
                "role": b.column("event_type"),
                "text": b.column("props"),
                "ts": b.column("ts"),
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def _lww_final(sf_dir: str, num_partitions: int = 16, num_salts: int = 2):
    """The engine's change-apply core as a pure query: salted partition
    shuffle + partition-local LWW collapse (same kernels as ingest)."""
    ds = derive_change_events(sf_dir)
    ds = ds.map_batches(
        lambda b: add_part_key(
            lww_collapse(b, drop_tombstones=False), num_partitions, num_salts
        ),
        batch_format="pyarrow",
    )

    def collapse_group(g: pa.Table) -> pa.Table:
        return lww_collapse(g.drop_columns([PART_COL]), drop_tombstones=False)

    return ds.groupby(PART_COL).map_groups(collapse_group, batch_format="pyarrow")


def cdc_lww_state(sf_dir: str):
    out = _lww_final(sf_dir)
    return out.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("op"), "D")).select(
            ["conv_id", "turn_idx", "role", "text", "ts"]
        ),
        batch_format="pyarrow",
    )


def cdc_deleted_keys(sf_dir: str):
    out = _lww_final(sf_dir)
    return out.map_batches(
        lambda b: b.filter(pc.equal(b.column("op"), "D")).select(
            ["conv_id", "turn_idx"]
        ),
        batch_format="pyarrow",
    )


def cdc_stream_metrics(sf_dir: str):
    """Operational stream metrics in ONE long-format result (kind, k,
    n, v): per-op event counts (kind='op') and per-partition seq
    watermarks + event counts (kind='wm') — the two lineage aggregates
    the ingest fence records, as pure queries over the change stream
    (consolidated from the former cdc_op_counts + cdc_partition_
    watermarks so both stay driver-verified within the 50-row budget) —
    plus an END-TO-END engine leg (kind='agg'): the change stream is
    ingested into a real DeltaTable and an INCREMENTAL aggregate view
    (``ivm.sync_agg``, retraction-based count+sum per role) is
    maintained in two syncs, the second consuming only the later
    epochs' deltas, so its retraction path (updates/deletes folded
    against the first sync's state) is exercised for real. The oracle
    replays LWW winner per key and GROUP BY role in SQL, so a hash
    match certifies the before/after-image feed and the signed fold
    end-to-end. Further end-to-end legs: kind='scd2' (incremental SCD
    Type-2 interval view), kind='struct' (nested struct payload
    ingest), kind='check' (declared data-quality constraint gates the
    stream; quarantine count + surviving-state aggregates)."""
    ops = partial_group_agg(
        derive_change_events(sf_dir).select_columns(["op", "seq"]),
        ["op"],
        [("seq", "count", "n")],
    ).map_batches(
        lambda b: pa.table(
            {
                "kind": pa.array(np.full(b.num_rows, "op"), pa.string()),
                "k": b.column("op"),
                "n": b.column("n"),
                "v": pa.array(np.full(b.num_rows, -1, np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    ds = _read(f"{sf_dir}/events.parquet", columns=["event_id", "user_id"])

    def part(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part_key": pa.array(b.column("user_id").to_numpy() % 16, pa.int64()),
                "seq": b.column("event_id"),
            }
        )

    wm = partial_group_agg(
        ds.map_batches(part, batch_format="pyarrow"),
        ["part_key"],
        [("seq", "max", "max_seq"), ("seq", "count", "n_events")],
    ).map_batches(
        lambda b: pa.table(
            {
                "kind": pa.array(np.full(b.num_rows, "wm"), pa.string()),
                "k": pa.array(
                    b.column("part_key").to_numpy().astype("U20"), pa.string()
                ),
                "n": b.column("n_events"),
                "v": b.column("max_seq").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )

    import os

    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.pipelines import ivm
    from xgeo_ray.state.delta_table import DeltaTable

    work = f"/tmp/xgeo_agg_q_{os.path.basename(os.path.normpath(sf_dir))}"
    groups = _seq_ranged_wal(sf_dir, work)
    src = DeltaTable.create(f"{work}/src", num_partitions=16, num_salts=2)
    ing.run_stream(src, [], segment_groups=groups)
    view = f"{work}/agg_view"
    for upto in (2, None):  # two syncs: the second folds retractions
        ivm.sync_agg(
            src,
            view,
            group_by=["role"],
            sums=["text_len"],
            derive=_agg_text_len_stage,
            columns=["role", "text"],
            num_buckets=8,
            upto_epoch=upto,
        )
    agg = ivm.read_agg_view(view).map_batches(
        lambda b: pa.table(
            {
                "kind": pa.array(np.full(b.num_rows, "agg"), pa.string()),
                "k": b.column("role"),
                "n": b.column("n"),
                "v": b.column("sum_text_len"),
            }
        ),
        batch_format="pyarrow",
    )
    # END-TO-END SCD2 leg (kind='scd2'): the same real table feeds an
    # incremental SCD Type-2 dimension view in two syncs (the second
    # closes versions the first opened), then every version row becomes
    # (k=composite key, n=valid_from µs, v=valid_to µs | -1 = current).
    # The oracle reconstructs the effective-winner chain per key in SQL
    # (running (ts,seq) argmax over per-epoch deltas), so a hash match
    # certifies the interval construction end to end.
    dim = DeltaTable.create(
        f"{work}/scd2_sink",
        num_partitions=4,
        num_salts=1,
        base_schema=ivm.scd2_schema(src),
    )
    for upto in (2, None):  # two syncs: the second closes/extends
        ivm.sync_scd2(src, dim, upto_epoch=upto)

    def scd2_rows(b: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            b.column("src_conv_id").cast(pa.string()),
            b.column("src_turn_idx").cast(pa.string()),
            "\x1f",
        )
        return pa.table(
            {
                "kind": pa.array(np.full(b.num_rows, "scd2"), pa.string()),
                "k": k,
                "n": b.column("valid_from").cast(pa.int64()),
                "v": pc.fill_null(
                    b.column("valid_to").cast(pa.int64()),
                    pa.scalar(-1, pa.int64()),
                ),
            }
        )

    scd2 = ivm.read_scd2(dim).map_batches(scd2_rows, batch_format="pyarrow")
    # END-TO-END CHECK leg (kind='check'): the FIRST seq band of the
    # same WAL replays into a table with a declared data-quality
    # constraint (state/constraints: text max_len=8 — the events
    # fixture's props are 8-9 chars, so len-9 I/U events quarantine
    # while 'D' tombstones pass), then the leg emits the quarantine
    # count plus per-role aggregates of the SURVIVING applied state.
    # One band, not the full stream: the gate + altered-LWW semantics
    # are band-invariant and this keeps the query's engine work at one
    # extra ⅓-replay instead of doubling it. The oracle filters the
    # band identically before its LWW replay, so a hash match
    # certifies both the vectorized gate and the altered LWW outcomes
    # (a dropped latest event must let an older event win) end-to-end.
    chk = DeltaTable.create(f"{work}/chk_src", num_partitions=8, num_salts=2)
    chk.set_constraints({"text_cap": {"col": "text", "max_len": 8}})
    ing.run_stream(chk, [], segment_groups=groups[:1])
    chk = DeltaTable.open(f"{work}/chk_src")
    n_quar = sum(m.totals.get("invalid", 0) for m in chk.manifests())
    quar_row = ray.data.from_arrow(
        pa.table(
            {
                "kind": pa.array(["check"], pa.string()),
                "k": pa.array(["quarantined"], pa.string()),
                "n": pa.array([int(n_quar)], pa.int64()),
                "v": pa.array([-1], pa.int64()),
            }
        )
    )
    chk_state = partial_group_agg(
        ing.snapshot(chk, columns=["role", "text"]).map_batches(
            _agg_text_len_stage, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["role"],
        [("text_len", "count", "n"), ("text_len", "sum", "v")],
    ).map_batches(
        lambda b: pa.table(
            {
                "kind": pa.array(np.full(b.num_rows, "check"), pa.string()),
                "k": b.column("role"),
                "n": b.column("n").cast(pa.int64()),
                "v": b.column("v").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    # END-TO-END STRUCT leg (kind='struct'): the derived stream gains a
    # NESTED tool_call struct {fn, n_args} and ingests into a real
    # DeltaTable — struct envelope validation, manifest JSON type
    # encoding, radix exchange, LWW collapse and the pruned snapshot
    # merge all carry the nested column; the leg then aggregates per
    # struct-field value (count + sum of n_args over the LWW winners),
    # so a hash match certifies struct payloads end-to-end while the
    # output stays flat (kind, k, n, v).
    work_s = f"/tmp/xgeo_struct_q_{os.path.basename(os.path.normpath(sf_dir))}"
    groups_s = _seq_ranged_wal(
        sf_dir, work_s, derive_fn=_derive_struct_events
    )
    src_s = DeltaTable.create(f"{work_s}/src", num_partitions=8, num_salts=2)
    ing.run_stream(src_s, [], segment_groups=groups_s)
    snap_s = ing.snapshot(
        src_s, columns=["conv_id", "turn_idx", "tool_call"]
    )
    structs = partial_group_agg(
        snap_s.map_batches(
            _struct_extract, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["k"],
        [("n_args", "count", "n"), ("n_args", "sum", "v")],
    ).map_batches(
        lambda b: pa.table(
            {
                "kind": pa.array(np.full(b.num_rows, "struct"), pa.string()),
                "k": b.column("k"),
                "n": b.column("n").cast(pa.int64()),
                "v": b.column("v").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return (
        ops.union(wm)
        .union(agg)
        .union(scd2)
        .union(structs)
        .union(quar_row)
        .union(chk_state)
    )


def cdc_dedup_replay(sf_dir: str):
    """At-least-once: the stream unioned with itself collapses to the
    same final state (exact-duplicate dedup through the LWW kernel)."""
    ds = derive_change_events(sf_dir)
    doubled = ds.union(derive_change_events(sf_dir))
    ds2 = doubled.map_batches(
        lambda b: add_part_key(lww_collapse(b, drop_tombstones=False), 16, 2),
        batch_format="pyarrow",
    )

    def collapse_group(g: pa.Table) -> pa.Table:
        return lww_collapse(g.drop_columns([PART_COL]), drop_tombstones=True)

    out = ds2.groupby(PART_COL).map_groups(collapse_group, batch_format="pyarrow")
    return out.select_columns(["conv_id", "turn_idx", "text"])


def _derive_amount_events(sf_dir: str) -> ray.data.Dataset:
    """Counter-style change stream for the additive merge policy demo:
    same keys/ops as _DERIVE_SQL, amount = value in integer cents
    (zeroed on deletes so both engines sum identical series)."""
    ds = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )

    def derive(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy()
        mod = eid % 10
        op = np.where(mod < 6, "I", np.where(mod < 9, "U", "D"))
        conv = pc.binary_join_element_wise(
            "u", pc.cast(b.column("user_id"), pa.string()), ""
        )
        amount = np.floor(b.column("value").to_numpy() * 100).astype(np.int64)
        amount[mod >= 9] = 0
        return pa.table(
            {
                "seq": b.column("event_id"),
                "op": pa.array(op, pa.string()),
                "conv_id": conv,
                "turn_idx": pa.array(eid % 40, pa.int64()),
                "ts": b.column("ts"),
                "amount": pa.array(amount),
            }
        )

    return ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)


def cdc_additive_state(sf_dir: str):
    """The ADDITIVE merge policy as a pure query: salted partition
    shuffle, then per-partition additive collapse (numeric columns
    accumulate per key; a key whose last writer is a tombstone drops) —
    the same kernel the engine applies when a table is created with
    merge_policy='additive'."""
    from xgeo_ray.stages.collapse import additive_collapse

    ds = _derive_amount_events(sf_dir)
    ds = ds.map_batches(
        lambda b: add_part_key(b, 16, 2), batch_format="pyarrow"
    )

    def collapse_group(g: pa.Table) -> pa.Table:
        out = additive_collapse(g.drop_columns([PART_COL]), drop_tombstones=True)
        return out.select(["conv_id", "turn_idx", "amount"])

    return ds.groupby(PART_COL).map_groups(collapse_group, batch_format="pyarrow")


def cdc_changes_feed(sf_dir: str):
    """The CDC-out changes feed's per-epoch delta semantics as a pure
    query (mirrors ingest.changes / ApplyPartition's per-epoch collapse):
    epoch-batch the derived stream by seq (epoch = seq // 1000), keep the
    per-(epoch, key) LWW winner — exactly the rows the engine's delta
    files carry for downstream consumers, tombstones included. ONE
    shuffle into 64 hash buckets; the epoch folds into the collapse KEY
    (turn_idx + epoch<<20 — turns are tiny) so each bucket collapses in
    one vectorized lww_collapse call instead of one Python group per
    (partition, epoch) — the same composite-encoding trick as the
    sliding-window/range-join kernels."""
    ds = derive_change_events(sf_dir)
    SHIFT = np.int64(1) << 20  # turn_idx < 2^20 always holds here

    def with_key(b: pa.Table) -> pa.Table:
        b = add_part_key(b, 16, 2)
        ep = b.column("seq").to_numpy() // 1000
        part = b.column(PART_COL).to_numpy().astype(np.int64)
        gk = (part * 1315423911 + ep) % 64
        ti = b.column("turn_idx").to_numpy()
        b = b.set_column(
            b.schema.get_field_index("turn_idx"),
            "turn_idx",
            pa.array(ti + ep * SHIFT, pa.int64()),
        )
        return b.append_column("_gk", pa.array(gk, pa.int64()))

    ds = ds.map_batches(with_key, batch_format="pyarrow")

    def collapse_group(g: pa.Table) -> pa.Table:
        out = lww_collapse(
            g.drop_columns([PART_COL, "_gk"]), drop_tombstones=False
        )
        enc = out.column("turn_idx").to_numpy()
        return pa.table(
            {
                "epoch": pa.array(enc // SHIFT, pa.int64()),
                "conv_id": out.column("conv_id"),
                "turn_idx": pa.array(enc % SHIFT, pa.int64()),
                "op": out.column("op"),
                "seq": out.column("seq"),
                "ts": out.column("ts"),
            }
        )

    return ds.groupby("_gk").map_groups(collapse_group, batch_format="pyarrow")


def _agg_text_len_stage(t: pa.Table) -> pa.Table:
    """sync_agg derive for cdc_stream_metrics' 'agg' leg: character
    length of the text payload as an int64 measure (module-level so
    workers import it by reference; matches SQL length())."""
    return t.append_column(
        "text_len",
        pc.fill_null(pc.utf8_length(t.column("text")).cast(pa.int64()), 0),
    )


def _derived_upper_stage(t: pa.Table) -> pa.Table:
    """Transform stage for cdc_derived_state (module-level so workers
    resolve it by import, not by-value pickle)."""
    i = t.schema.get_field_index("text")
    return t.set_column(i, "text", pc.utf8_upper(t.column("text")))


def _derive_struct_events(sf_dir: str) -> ray.data.Dataset:
    """The derived change stream plus a NESTED ``tool_call`` struct
    payload ``{fn: string, n_args: int64}`` — both fields deterministic
    functions of seq, so the DuckDB oracle re-derives them relationally
    while the engine carries them as a real struct column (module-level
    so _seq_ranged_wal's workers import it)."""
    ds = derive_change_events(sf_dir)

    def attach(b: pa.Table) -> pa.Table:
        seq = b.column("seq").to_numpy()
        fn = pc.binary_join_element_wise(
            "fn", pc.cast(pa.array(seq % 3, pa.int64()), pa.string()), ""
        )
        if isinstance(fn, pa.ChunkedArray):
            fn = fn.combine_chunks()
        tc = pa.StructArray.from_arrays(
            [fn, pa.array(seq % 7, pa.int64())], names=["fn", "n_args"]
        )
        return b.append_column("tool_call", tc)

    return ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def _struct_extract(b: pa.Table) -> pa.Table:
    tc = b.column("tool_call")
    return pa.table(
        {
            "k": pc.struct_field(tc, "fn"),
            "n_args": pc.struct_field(tc, "n_args"),
        }
    )


def _seq_ranged_wal(
    sf_dir: str, work: str, n_epochs: int = 3, derive_fn=None
) -> list[list[str]]:
    """Write the derived change stream as ``n_epochs`` seq-RANGED WAL
    epoch groups under ``work`` (fresh dir). Epoch boundaries must be
    seq ranges so the cross-epoch seq watermarks hold; the bounds come
    from parquet row-group stats (metadata-only)."""
    import os
    import shutil

    import pyarrow.parquet as pq

    shutil.rmtree(work, ignore_errors=True)
    events_path = f"{sf_dir}/events.parquet"
    pf = pq.ParquetFile(events_path)
    ci = pf.schema_arrow.names.index("event_id")
    stats = [
        pf.metadata.row_group(g).column(ci).statistics
        for g in range(pf.metadata.num_row_groups)
    ]
    if all(s is not None and s.has_min_max for s in stats):
        lo = min(s.min for s in stats)
        hi = max(s.max for s in stats)
    else:  # stats absent: one-column scan
        col = pq.read_table(events_path, columns=["event_id"]).column("event_id")
        mm = pc.min_max(col).as_py()
        lo, hi = mm["min"], mm["max"]
    cuts = [lo - 1] + [
        lo + k * (hi - lo) // n_epochs for k in range(1, n_epochs)
    ] + [hi]
    groups = []
    for k in range(n_epochs):
        a, b = cuts[k], cuts[k + 1]
        part = (derive_fn or derive_change_events)(sf_dir).map_batches(
            lambda t, a=a, b=b: t.filter(
                pc.and_(
                    pc.greater(t.column("seq"), pa.scalar(a, pa.int64())),
                    pc.less_equal(t.column("seq"), pa.scalar(b, pa.int64())),
                )
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        d = f"{work}/wal{k}"
        part.write_parquet(d)
        groups.append(
            sorted(
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
        )
    return groups


def cdc_derived_state(sf_dir: str):
    """END-TO-END engine query — runs the REAL table machinery
    (manifests, commit fence, watermarks, derived sync) rather than a
    kernel mirror (as does ``cdc_state_asof``): the derived change
    stream is written to seq-ranged WAL epochs, ingested into a source
    DeltaTable, and a derived sink table is maintained from the
    source's committed change feed (``sync_derived``) through an
    uppercase transform. The sink's merged snapshot is returned; the
    oracle replays LWW winner per key + upper(text) in SQL, so a hash
    match certifies the whole ingest→feed→transform→sink path, not
    just a collapse kernel."""
    import os

    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    work = f"/tmp/xgeo_derived_q_{os.path.basename(os.path.normpath(sf_dir))}"
    groups = _seq_ranged_wal(sf_dir, work)
    src = DeltaTable.create(f"{work}/src", num_partitions=16, num_salts=2)
    ing.run_stream(src, [], segment_groups=groups)
    sink = DeltaTable.create(f"{work}/sink", num_partitions=8, num_salts=1)
    ing.sync_derived(src, sink, transform=_derived_upper_stage)
    # the base envelope carries `tool` (all-null here: the derived stream
    # has no tool column) — project it out at the snapshot read
    return ing.snapshot(
        sink, columns=["conv_id", "turn_idx", "role", "text", "ts"]
    )


def _amount_events_mod3(sf_dir: str) -> ray.data.Dataset:
    """Second keyed change stream for the join view: the integer-cents
    amount stream restricted to seq % 3 != 0, so its key set and LWW
    winners genuinely differ from the text stream's (module-level so
    _seq_ranged_wal's workers import it)."""
    ds = _derive_amount_events(sf_dir)
    return ds.map_batches(
        lambda b: b.filter(pa.array(b.column("seq").to_numpy() % 3 != 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def cdc_join_state(sf_dir: str):
    """END-TO-END engine query for the partition-aligned JOIN VIEW
    (pipelines.join_view): TWO keyed change streams — the text stream
    and the amount stream filtered to seq % 3 != 0 — are each written
    to seq-ranged WAL epochs and ingested into partition-ALIGNED
    DeltaTables (same num_partitions/num_salts) through the real fence
    machinery, then ``join_snapshot`` joins their merged states
    partition-locally (zero shuffle — identical keys co-locate). The
    oracle replays LWW winner per key on both streams and joins in
    SQL, so a hash match certifies ingest → two-table merge-on-read →
    co-partitioned join end-to-end.

    The row ALSO certifies the INCREMENTAL join path (ivm.sync_join):
    a materialized join sink follows both streams across two sync
    points (one mid-left-ingest) and is asserted row-equal to the
    batch join_snapshot before the result returns — a divergence
    fails the driver row."""
    import os
    import shutil

    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.pipelines import ivm
    from xgeo_ray.pipelines.join_view import join_snapshot
    from xgeo_ray.state.delta_table import DeltaTable

    work = f"/tmp/xgeo_join_q_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(work, ignore_errors=True)
    lgroups = _seq_ranged_wal(sf_dir, f"{work}/lwal")
    rgroups = _seq_ranged_wal(
        sf_dir, f"{work}/rwal", derive_fn=_amount_events_mod3
    )
    left = DeltaTable.create(f"{work}/left", num_partitions=16, num_salts=2)
    rschema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int64()),
            pa.field("ts", pa.timestamp("us")),
            pa.field("amount", pa.int64()),
        ]
    )
    right = DeltaTable.create(
        f"{work}/right", num_partitions=16, num_salts=2, base_schema=rschema
    )
    jcols = {"left_columns": ["role", "text"], "right_columns": ["amount"]}
    sink = DeltaTable.create(
        f"{work}/jsink",
        num_partitions=8,
        num_salts=1,
        base_schema=ivm.join_sink_schema(left, right, **jcols),
    )
    half = max(1, len(lgroups) // 2)
    ing.run_stream(left, [], segment_groups=lgroups[:half])
    ivm.sync_join(left, right, sink, **jcols)
    ing.run_stream(left, [], segment_groups=lgroups[half:])
    ing.run_stream(right, [], segment_groups=rgroups)
    ivm.sync_join(left, right, sink, **jcols)
    result = join_snapshot(
        left,
        right,
        how="inner",
        columns_left=["role", "text", "ts"],
        columns_right=["amount"],
    ).materialize()
    cols = ["conv_id", "turn_idx", "role", "text", "amount"]
    want = (
        result.to_pandas()[cols]
        .astype({"turn_idx": "int64"})
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    got = (
        ing.snapshot(sink)
        .to_pandas()
        .rename(columns={"r_amount": "amount"})[cols]
        .astype({"turn_idx": "int64"})
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    import pandas as _pd

    _pd.testing.assert_frame_equal(got, want)
    return result


def cdc_enriched_state(sf_dir: str):
    """END-TO-END engine query for PARTITIONED stream-table enrichment
    (stages.enrich.PartitionedLookup — the non-broadcast dimension
    join): the derived change stream is ingested through the real fence
    machinery with a transform stage that left-joins each event against
    a customer dimension bucketed by key hash in the object store (each
    ingest task fetches only the buckets its batch's keys touch). The
    merged snapshot is returned with the enriched ``segment`` column;
    the oracle replays LWW winner per key LEFT JOIN customer in SQL, so
    a hash match certifies the ingest→partitioned-enrich→merge path."""
    import os

    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.schemas import TRANSCRIPTS_SCHEMA
    from xgeo_ray.stages.enrich import PartitionedLookup
    from xgeo_ray.state.delta_table import DeltaTable

    work = f"/tmp/xgeo_enrich_q_{os.path.basename(os.path.normpath(sf_dir))}"
    groups = _seq_ranged_wal(sf_dir, work)
    dim = _read(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: pa.table(
            {
                "conv_id": pc.binary_join_element_wise(
                    "u", pc.cast(b.column("c_custkey"), pa.string()), ""
                ),
                "segment": b.column("c_mktsegment"),
            }
        ),
        batch_format="pyarrow",
    )
    stage = PartitionedLookup(dim, on="conv_id")
    schema = TRANSCRIPTS_SCHEMA.append(pa.field("segment", pa.string()))
    t = DeltaTable.create(
        f"{work}/t", num_partitions=16, num_salts=2, base_schema=schema
    )
    ing.run_stream(t, [], segment_groups=groups, transform=stage)
    return ing.snapshot(
        t, columns=["conv_id", "turn_idx", "role", "text", "ts", "segment"]
    )


# 2025-01-01T00:00:00Z in µs — ABOVE the stream's event-time range, so
# a takedown batch stamped here wins LWW against every stream version
_DELETE_TS_US = 1_735_689_600_000_000

# 2024-01-08T00:00:00Z in µs — mid-stream TTL cutoff for the expire()
# leg of cdc_delete_where (events span 2024-01-01..2024-01-30)
_EXPIRE_CUTOFF_US = 1_704_672_000_000_000


def _role_error_pred(t: pa.Table):
    """Predicate for cdc_delete_where (module-level so workers unpickle
    it by value without importing the test driver)."""
    return pc.equal(t.column("role"), "error")


def _role_click_pred(t: pa.Table):
    """Predicate for cdc_delete_where's update_where leg."""
    return pc.equal(t.column("role"), "click")


def cdc_delete_where(sf_dir: str):
    """END-TO-END engine query for the predicate-delete (takedown)
    path: the derived change stream is ingested into a DeltaTable via
    the real fence machinery (3 seq-ranged WAL epochs), then
    ``ingest.delete_where(role == 'error')`` tombstones every matching
    key as an out-of-band batch stamped above the stream's ts range,
    and the merged snapshot is returned. The oracle replays LWW winner
    per key minus the deleted rows in SQL, so a hash match certifies
    the whole ingest→distributed-predicate-delete→merge path."""
    import os

    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    work = f"/tmp/xgeo_delete_q_{os.path.basename(os.path.normpath(sf_dir))}"
    groups = _seq_ranged_wal(sf_dir, work)
    t = DeltaTable.create(f"{work}/t", num_partitions=16, num_salts=2)
    ing.run_stream(t, [], segment_groups=groups)
    ing.delete_where(
        t,
        _role_error_pred,
        batch_id="takedown-q",
        columns=["role"],
        ts_us=_DELETE_TS_US,
    )
    # TTL retention on the same table: expire() tombstones every key
    # whose current winner predates the cutoff, pruning partitions from
    # manifest zone maps before any payload read — the driver row now
    # certifies ingest → predicate-delete → EXPIRE → merge end-to-end.
    ing.expire(t, _EXPIRE_CUTOFF_US, ts_us=_DELETE_TS_US + 1)
    # Predicate UPDATE on the surviving state: every remaining 'click'
    # row's text is redacted in place via a full-image oob 'U' batch
    # stamped above the expire tombstones — the row now certifies
    # ingest → delete → expire → UPDATE → merge end-to-end (the oracle
    # replays the update as a CASE over the kept winners).
    ing.update_where(
        t,
        _role_click_pred,
        {"text": "[click redacted]"},
        batch_id="redact-q",
        ts_us=_DELETE_TS_US + 2,
    )
    return ing.snapshot(
        t, columns=["conv_id", "turn_idx", "role", "text", "ts"]
    )


def cdc_assembled_convs(sf_dir: str):
    """END-TO-END engine query for conversation assembly (the
    transcripts-payload table→training-doc bridge): the derived change
    stream is ingested via the real fence machinery, then
    ``ingest.assemble_conversations`` merges every conversation's LWW
    turns into one role-tagged document — zero shuffle, one segmented
    Arrow reduce per partition. The oracle replays LWW state and
    ``string_agg(... ORDER BY turn_idx)`` per conv, so a hash match
    certifies turn order, tombstone handling and the join kernel."""
    import os

    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    work = f"/tmp/xgeo_asm_q_{os.path.basename(os.path.normpath(sf_dir))}"
    groups = _seq_ranged_wal(sf_dir, work)
    t = DeltaTable.create(f"{work}/t", num_partitions=16, num_salts=2)
    ing.run_stream(t, [], segment_groups=groups)
    return ing.assemble_conversations(t)


# 2024-01-16T00:00:00Z in µs — mid-stream at every sf (events span
# 2024-01-01..2024-01-30); a fixed constant so engine and oracle agree
_ASOF_T_US = 1_705_363_200_000_000


def cdc_state_asof(sf_dir: str):
    """Exact event-time travel on the REAL engine: the derived change
    stream is ingested into a ``history="full"`` DeltaTable (3
    seq-ranged epochs via the normal fence machinery), then
    ``snapshot(as_of_ts_us=T)`` reconstructs the state as of mid-stream
    T. The oracle replays latest-version-per-key-at-T in SQL, so a hash
    match certifies that version-retaining deltas reproduce the exact
    historical state — including within-epoch superseded versions a
    collapsed table cannot recover."""
    import os

    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    work = f"/tmp/xgeo_asof_q_{os.path.basename(os.path.normpath(sf_dir))}"
    groups = _seq_ranged_wal(sf_dir, work)
    t = DeltaTable.create(
        f"{work}/t", num_partitions=16, num_salts=2, history="full"
    )
    ing.run_stream(t, [], segment_groups=groups)
    return ing.snapshot(
        t,
        as_of_ts_us=_ASOF_T_US,
        columns=["conv_id", "turn_idx", "role", "text", "ts"],
    )


def cdc_late_events(sf_dir: str):
    """Event-time lateness lineage as a pure query (mirrors the engine's
    per-epoch ``late`` metric + ``ts_watermarks``, ingest.py ApplyPartition
    / delta_table.ts_watermarks): the change stream is epoch-batched in
    seq order (epoch = seq // 1000), hash-partitioned (user_id % 16 —
    SQL-reproducible stand-in for the engine's salted siphash), and each
    epoch counts rows whose ts is below the partition's watermark
    committed by STRICTLY EARLIER epochs. wm_ts is the per-partition
    event-time watermark after the epoch (running max of epoch max ts).
    The raw events table is ts-ordered by event_id, so a deterministic
    per-event jitter (event_id % 97 hours, reproduced in the oracle)
    disorders arrival vs event time the way real CDC streams do.
    One shuffle on the partition key; per-group work is reduceat/cummax
    over epoch slots — no per-epoch Python."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])

    def part(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy()
        jitter = (eid % 97) * 3_600_000_000
        return pa.table(
            {
                "part_key": pa.array(
                    b.column("user_id").to_numpy() % 16, pa.int64()
                ),
                "epoch": pa.array(eid // 500, pa.int64()),
                "ts_us": pa.array(
                    b.column("ts").cast(pa.int64()).to_numpy() - jitter
                ),
            }
        )

    ds = ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)

    def late_group(g: pa.Table) -> pa.Table:
        ep = g.column("epoch").to_numpy()
        ts = g.column("ts_us").to_numpy()
        order = np.argsort(ep, kind="stable")
        ep, ts = ep[order], ts[order]
        uniq, first = np.unique(ep, return_index=True)
        mx = np.maximum.reduceat(ts, first)
        wm = np.maximum.accumulate(mx)
        # watermark visible to each epoch = committed by earlier epochs
        prior = np.concatenate(([np.iinfo(np.int64).min], wm[:-1]))
        slot = np.searchsorted(uniq, ep)
        late = np.bincount(
            slot, weights=(ts < prior[slot]), minlength=len(uniq)
        ).astype(np.int64)
        return pa.table(
            {
                "part_key": pa.array(
                    np.full(len(uniq), g.column("part_key")[0].as_py()),
                    pa.int64(),
                ),
                "epoch": pa.array(uniq, pa.int64()),
                "late": pa.array(late, pa.int64()),
                "wm_ts": pa.array(wm, pa.int64()),
            }
        )

    return ds.groupby("part_key").map_groups(late_group, batch_format="pyarrow")


def doc_transforms(sf_dir: str):
    """Every per-doc scalar transform in ONE scan (one driver slot,
    four kernels): Unicode NFC normalization + casefold, the PII
    redaction sweep, vectorized stopword language ID, and the
    Karp-Rabin rolling-hash fingerprint (former text_clean +
    doc_signals pair — same kernels, merged to free a slot)."""
    from xgeo_ray.functions.text import (
        LangId,
        PiiRedactor,
        add_fingerprint,
        normalize_text,
    )

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    red = PiiRedactor()
    lid = LangId()

    def allk(b: pa.Table) -> pa.Table:
        return add_fingerprint(lid(red(normalize_text(b, form="NFC", casefold=True))))

    out = ds.map_batches(allk, batch_format="pyarrow")
    return out.select_columns(
        [
            "doc_id",
            "text_norm",
            "text_redacted",
            "n_redactions",
            "lang_pred",
            "fingerprint",
        ]
    )


def doc_chunks(sf_dir: str):
    """Sliding-window document chunking (64-token chunks, 16 overlap) —
    the row-expanding training-data windowing stage."""
    from xgeo_ray.functions.text import chunk_documents

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: chunk_documents(b, tokens_per_chunk=64, overlap=16),
        batch_format="pyarrow",
    )


# --------------------------------------------------------------- relational

_Q1_DATE = "1998-09-02"


def q1_pricing_summary(sf_dir: str):
    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.less_equal(b.column("l_shipdate"), pa.scalar(np.datetime64(_Q1_DATE, "us")))
        )
        qty = b.column("l_quantity").to_numpy()
        price = b.column("l_extendedprice").to_numpy()
        disc = b.column("l_discount").to_numpy()
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "qty_cents": pa.array(np.floor(qty * 100).astype(np.int64)),
                "price_cents": pa.array(np.floor(price * 100).astype(np.int64)),
                "disc_price_cents": pa.array(
                    np.floor(price * (1.0 - disc) * 100).astype(np.int64)
                ),
            }
        )

    return partial_group_agg(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag", "l_linestatus"],
        [
            ("qty_cents", "sum", "sum_qty_cents"),
            ("price_cents", "sum", "sum_base_price_cents"),
            ("disc_price_cents", "sum", "sum_disc_price_cents"),
            ("qty_cents", "count", "count_order"),
        ],
    )


def nation_customer_counts(sf_dir: str):
    """Chained broadcast joins (customer -> nation -> region) + grouped
    count: one query exercising the small-dimension join path twice
    (replaces the former region_nation_count / customer_nation_count
    pair — same operators, one driver slot)."""
    import pyarrow.parquet as pq

    cust = _read(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    joined = broadcast_join(cust, nation, keys="c_nationkey", right_keys="n_nationkey")
    joined = broadcast_join(joined, region, keys="n_regionkey", right_keys="r_regionkey")
    return partial_group_agg(
        joined, ["n_name", "r_name"], [("c_nationkey", "count", "n_customers")]
    )


def orders_by_segment(sf_dir: str):
    """Both-sides join shape: orders x customer on custkey, then group.
    The customer side is small enough to broadcast at these SFs — the
    same code path a partitioned hash join would feed at 100 TB."""
    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, cust, keys="o_custkey", right_keys="c_custkey")

    def cents(b: pa.Table) -> pa.Table:
        v = np.floor(b.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        return b.drop_columns(["o_totalprice"]).append_column("price_cents", pa.array(v))

    return partial_group_agg(
        joined.map_batches(cents, batch_format="pyarrow"),
        ["c_mktsegment"],
        [("price_cents", "count", "n_orders"), ("price_cents", "sum", "total_cents")],
    )


def order_revenue_by_priority(sf_dir: str):
    """BOTH-SIDES-LARGE shuffle join: lineitem x orders on orderkey —
    neither side is broadcast; hash_join partitions both Datasets on the
    key (Dataset.join / bucketed cogroup fallback, functions.relational).
    The joined stream feeds a partial+final grouped revenue aggregate."""
    from xgeo_ray.functions.relational import hash_join

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def cents(b: pa.Table) -> pa.Table:
        price = b.column("l_extendedprice").to_numpy()
        disc = b.column("l_discount").to_numpy()
        rev = np.floor(price * (1.0 - disc) * 100).astype(np.int64)
        return pa.table(
            {"o_orderkey": b.column("l_orderkey"), "rev_cents": pa.array(rev)}
        )

    li2 = li.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    # aggregation pushdown below the join: collapse lineitem to one row
    # per orderkey first, so the join shuffles |orders| rows instead of
    # |lineitem| (4x fewer here; the win grows with lines per order)
    per_order = partial_group_agg(
        li2,
        ["o_orderkey"],
        [("rev_cents", "sum", "rev_cents"), ("rev_cents", "count", "n_lines")],
    )
    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = hash_join(per_order, orders, on="o_orderkey", num_partitions=16)
    return partial_group_agg(
        joined,
        ["o_orderpriority"],
        [("rev_cents", "sum", "revenue_cents"), ("n_lines", "sum", "n_items")],
    )


def top10_orders(sf_dir: str):
    ds = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    return top_k(ds, ["o_totalprice", "o_orderkey"], [True, False], 10)


def highvalue_open_orders(sf_dir: str):
    import pyarrow.dataset as pads

    ds = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"],
        filter=(pads.field("o_totalprice") > 300000.0),  # row-group pushdown
    )
    return ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderstatus"), "O")).select(
            ["o_orderkey", "o_custkey", "o_totalprice"]
        ),
        batch_format="pyarrow",
    )


def order_scans(sf_dir: str):
    """Global top-k + filter/limit row-group-pushdown scans + the
    distributed GLOBAL SORT (sample-sort exact ranks) in ONE driver
    slot (long format, ``q`` tag — the cdc_stream_metrics consolidation
    pattern): 'top10' rows from top_k, 'open_highvalue' rows from the
    pushdown scan, 'rank100' = the 100 highest-price orders with their
    exact global rank from ``relational.global_rank`` (range-partition
    exchange + per-shard vectorized rank stamp; oracle = ROW_NUMBER).
    Non-rank legs carry rank = -1."""
    from xgeo_ray.functions.relational import global_rank

    def tag(name):
        def f(b: pa.Table) -> pa.Table:
            b = b.add_column(0, "q", pa.array([name] * b.num_rows))
            return b.append_column(
                "rank", pa.array(np.full(b.num_rows, -1, dtype=np.int64))
            )

        f.__name__ = f"tag_{name}"
        return f

    t10 = top10_orders(sf_dir).map_batches(tag("top10"), batch_format="pyarrow")
    hv = highvalue_open_orders(sf_dir).map_batches(
        tag("open_highvalue"), batch_format="pyarrow"
    )
    ranked = global_rank(
        _read(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        ),
        "o_totalprice",
        ["o_orderkey"],
        num_shards=16,
        descending=True,
    )

    def head100(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b.column("rank"), 100))
        b = b.add_column(0, "q", pa.array(["rank100"] * b.num_rows))
        return b.select(["q", "o_orderkey", "o_custkey", "o_totalprice", "rank"])

    r100 = ranked.map_batches(head100, batch_format="pyarrow")
    return t10.union(hv).union(r100)


def cluster_sizes(sf_dir: str):
    """Driver-verified leg of the k-means family: deterministic init
    centroids (unit vectors of the 8 smallest vec_ids —
    ann._init_centroids) + broadcast nearest-centroid assignment
    (ann.assign_clusters, the same kernel kmeans/cluster_stats/IVF
    iterate), reduced to per-cluster row counts plus an INTEGER
    membership checksum (sum of member vec_ids — float-free, so the
    hash certifies the exact assignment without floor-boundary
    flakiness; a single row assigned differently moves it). The Lloyd
    loop itself is pytest-oracled against numpy; this row certifies
    the assignment kernel end-to-end in SQL."""
    from xgeo_ray.functions.ann import _init_centroids, assign_clusters

    emb = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cents = _init_centroids(emb, 8, "vec_id", "embedding")
    assigned = assign_clusters(emb, cents)

    def member_sums(b: pa.Table) -> pa.Table:
        a = b.column("cluster").cast(pa.int64())
        ones = pa.array(np.ones(b.num_rows, dtype=np.int64))
        return pa.table(
            {
                "cluster": a,
                "one": ones,
                "vid": b.column("vec_id").cast(pa.int64()),
            }
        )

    ds = assigned.map_batches(member_sums, batch_format="pyarrow")
    return partial_group_agg(
        ds, ["cluster"], [("one", "sum", "n"), ("vid", "sum", "id_sum")]
    )


def events_hourly(sf_dir: str):
    ds = _read(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    ds = add_time_bucket(ds, "ts", "hour", "hour")

    def cents(b: pa.Table) -> pa.Table:
        v = np.floor(b.column("value").to_numpy() * 100).astype(np.int64)
        return pa.table(
            {"user_id": b.column("user_id"), "hour": b.column("hour"), "value_cents": pa.array(v)}
        )

    return partial_group_agg(
        ds.map_batches(cents, batch_format="pyarrow"),
        ["user_id", "hour"],
        [("value_cents", "count", "n_events"), ("value_cents", "sum", "value_cents")],
    )


def event_cardinalities(sf_dir: str):
    """Exact distinct (Dataset.unique) and the KMV distinct-count
    sketch in one row (the former distinct_event_types /
    approx_distinct_users pair — both operators, one driver slot). The
    sketch is deterministic (sha256 value hashing) so the oracle
    replays the sketch itself, not just a tolerance band."""
    from xgeo_ray.functions.relational import kmv_distinct_sketch

    et = _read(f"{sf_dir}/events.parquet", columns=["event_type"])
    n_types = len(et.unique("event_type"))
    ds = _read(f"{sf_dir}/events.parquet", columns=["user_id"])
    sketch = kmv_distinct_sketch(ds, "user_id", k=64)  # one-row pa.Table
    return sketch.append_column(
        "n_event_types", pa.array([n_types] * sketch.num_rows, pa.int64())
    )


def user_sessions(sf_dir: str):
    ds = _read(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    return sessionize(ds, "user_id", "ts", "event_id", gap_us=3_600_000_000)


def events_sliding_1h(sf_dir: str):
    """Sliding-window aggregate: per event, how many events the same
    user produced in the preceding hour (inclusive RANGE frame) — the
    windowed-aggregate operator class, searchsorted-vectorized per
    key-hash bucket."""
    from xgeo_ray.functions.relational import sliding_window_count

    ds = _read(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    out = sliding_window_count(
        ds, key="user_id", ts_col="ts", window_us=3_600_000_000,
        keep_cols=["event_id"],
    )
    return out


def events_pairs_1h(sf_dir: str):
    """Range (band) self-join: every ordered pair of same-user events
    whose earlier side lies in the later side's trailing one-hour window
    (includes the self-pair) — co-partitioned by key,
    searchsorted-vectorized per bucket."""
    from xgeo_ray.functions.relational import range_join_per_key

    left = _read(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    right = _read(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).map_batches(
        lambda b: b.rename_columns(["event_id2", "user_id2", "ts2"]),
        batch_format="pyarrow",
    )
    out = range_join_per_key(
        left, right,
        left_by="user_id", right_by="user_id2",
        left_on="ts", right_on="ts2",
        lower_offset_us=-3_600_000_000, upper_offset_us=0,
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "event_id2"]), batch_format="pyarrow"
    )


def events_orders_asof(sf_dir: str):
    """As-of join through the CO-PARTITIONED path (both sides are
    Datasets; neither is broadcast — the shape that survives a large
    right side). The order side is pre-deduped per (custkey, date) with a
    grouped aggregation so the as-of pick is unambiguous on both engines."""
    from xgeo_ray.functions.relational import asof_join_partitioned

    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"],
    )
    right = partial_group_agg(
        orders, ["o_custkey", "o_orderdate"], [("o_orderkey", "max", "o_orderkey")]
    )
    left = _read(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    joined = asof_join_partitioned(
        left, right, left_by="user_id", right_by="o_custkey",
        left_on="ts", right_on="o_orderdate",
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("o_orderkey")))
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------- text / docs


def doc_stats_by_lang(sf_dir: str):
    """Per-language corpus stats INCLUDING vectorized token totals (the
    former token_totals_by_lang folded in — token counting runs in the
    same partial+final grouped aggregate, one driver slot)."""
    from xgeo_ray.functions.text import token_count_table

    ds = _read(
        f"{sf_dir}/documents.parquet",
        columns=["lang", "n_chars", "text", "doc_id"],
    )
    counted = ds.map_batches(
        lambda b: token_count_table(b).drop_columns(["text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partial_group_agg(
        counted,
        ["lang"],
        [
            ("doc_id", "count", "n_docs"),
            ("n_chars", "sum", "total_chars"),
            ("n_tokens", "sum", "total_tokens"),
            ("doc_id", "min", "min_doc"),
            ("doc_id", "max", "max_doc"),
        ],
    )


def quality_counts(sf_dir: str):
    from xgeo_ray.functions.text import QualityScore

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # instance-passed: setup is three re.compile calls — an actor pool
    # would pay 1-2 s spin-up for nothing (round-1 verdict finding)
    out = ds.map_batches(QualityScore(), batch_format="pyarrow")
    return out.map_batches(
        lambda b: b.select(
            ["doc_id", "n_chars_calc", "n_tokens", "n_punct", "n_upper", "n_digit"]
        ),
        batch_format="pyarrow",
    )


def order_price_quantiles(sf_dir: str):
    """Exact discrete quantiles of order value (integer cents) via the
    distributed histogram — no global sort."""
    from xgeo_ray.functions.relational import exact_quantiles

    ds = _read(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        v = np.floor(b.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        return pa.table({"price_cents": pa.array(v)})

    return exact_quantiles(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "price_cents",
        [0.1, 0.5, 0.9, 0.99],
    )


def corpus_clean_stats(sf_dir: str):
    """Composite training-data cleaning pipeline: quality filter (token
    count + punctuation-ratio gates) -> exact dedup by content (keep the
    lowest doc_id) -> per-lang counts + token totals. One pass of
    map_batches feeding two grouped aggregations."""
    from xgeo_ray.functions.text import QualityScore

    ds = _read(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    scored = ds.map_batches(QualityScore(), batch_format="pyarrow")

    def gate(b: pa.Table) -> pa.Table:
        n_tok = b.column("n_tokens").to_numpy()
        n_chars = b.column("n_chars_calc").to_numpy()
        n_punct = b.column("n_punct").to_numpy()
        keep = (n_tok >= 5) & (n_tok <= 1000) & (n_punct * 5 <= n_chars)
        return b.filter(pa.array(keep)).select(
            ["doc_id", "text", "lang", "n_tokens"]
        )

    gated = scored.map_batches(gate, batch_format="pyarrow")
    # exact dedup keyed on the 128-bit content hash (text itself never
    # crosses the shuffle), keeping the representative's attributes
    # (identical text => identical n_tokens; lang rides along via min) —
    # no rejoin, no driver materialization, two grouped aggregations
    from xgeo_ray.functions.dedup import CONTENT_HASH_COLS, add_content_hash

    keyed = gated.map_batches(
        lambda b: add_content_hash(b).drop_columns(["text"]),
        batch_format="pyarrow",
    )
    survivors = partial_group_agg(
        keyed,
        CONTENT_HASH_COLS,
        [
            ("doc_id", "min", "doc_id"),
            ("lang", "min", "lang"),
            ("n_tokens", "min", "n_tokens"),
        ],
    )
    return partial_group_agg(
        survivors,
        ["lang"],
        [("doc_id", "count", "n_docs"), ("n_tokens", "sum", "total_tokens")],
    )


def exact_dedup(sf_dir: str):
    from xgeo_ray.functions.dedup import exact_dedup_groups

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup_groups(ds)


def _docs_with_planted_dups(sf_dir: str) -> ray.data.Dataset:
    """FIXTURE BUILDER (not an operator): documents plus copies of the 20
    lowest doc_ids at doc_id+1_000_000, so the near-dup operators have
    true positives to find. Built driver-side because the oracle SQL
    must plant the identical rows — the dedup operators themselves never
    materialize their input."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    t = t.sort_by([("doc_id", "ascending")])
    dup = t.slice(0, 20)
    dup = dup.set_column(
        0, "doc_id", pc.add(dup.column("doc_id"), pa.scalar(1_000_000, pa.int64()))
    )
    full = pa.concat_tables([t, dup])
    # one Arrow table would become ONE Ray block → the signature pass
    # (CPU-bound) would run on a single core; slice into blocks sized so
    # each task stays well above dispatch latency (~650 docs each)
    n_blocks = max(1, min(32, full.num_rows // 640))
    step = max(1, -(-full.num_rows // n_blocks))
    return ray.data.from_arrow(
        [full.slice(i, step) for i in range(0, full.num_rows, step)]
    )


def minhash_dup_pairs(sf_dir: str):
    from xgeo_ray.functions.dedup import minhash_lsh_dup_pairs

    ds = _docs_with_planted_dups(sf_dir)
    out = minhash_lsh_dup_pairs(ds, threshold=0.8)
    return out.map_batches(
        lambda b: pa.table(
            {
                "doc_id_a": b.column("doc_id_a").cast(pa.int64()),
                "doc_id_b": b.column("doc_id_b").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def top3_orders_per_segment(sf_dir: str):
    """Per-group top-k: highest-value orders within each market segment
    (broadcast join + grouped_top_k, rank included for determinism)."""
    from xgeo_ray.functions.relational import grouped_top_k

    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    joined = broadcast_join(orders, cust, keys="o_custkey", right_keys="c_custkey")
    out = grouped_top_k(
        joined,
        keys=["c_mktsegment"],
        sort_cols=["o_totalprice", "o_orderkey"],
        descending=[True, False],
        k=3,
        rank_col="rank",
    )
    return out.map_batches(
        lambda b: b.select(["c_mktsegment", "o_orderkey", "rank"]).set_column(
            2, "rank", b.column("rank").cast(pa.int64())
        ),
        batch_format="pyarrow",
    )


def dup_clusters_q(sf_dir: str):
    """Duplicate-cluster assignment: near-dup pairs -> connected
    components by iterative min-label propagation (every clustered doc
    mapped to the smallest doc_id it can reach). Pairs come from the
    MinHash path — its true-Jaccard verify makes it EQUAL to the exact
    ngram join (the oracle-guarded equivalence), at a third of the
    cost; the recursive-CTE oracle closes over the same pair list."""
    from xgeo_ray.functions.dedup import dup_clusters, minhash_lsh_dup_pairs

    pairs = minhash_lsh_dup_pairs(_docs_with_planted_dups(sf_dir), threshold=0.8)
    return dup_clusters(pairs)


SIMHASH_SIG_EXPORT = "/tmp/xgeo_simhash_planted_sigs.parquet"


def simhash_dup_pairs_q(sf_dir: str):
    """SimHash near-dup pairs over the planted-dup corpus. The signature
    pass runs ONCE; its (doc_id, simhash) output is also exported to
    SIMHASH_SIG_EXPORT so the DuckDB oracle — which cannot reproduce the
    fixed-key siphash word hashes — can replay the banding + bit_count
    Hamming verify in pure SQL over the engine's own signatures (the
    signatures themselves stay golden-pinned cross-process in
    tests/test_dedup_text_ann.py)."""
    import os

    import pyarrow.parquet as pq

    from xgeo_ray.functions.dedup import SimHasher, simhash_dup_pairs

    ds = _docs_with_planted_dups(sf_dir)
    sigs = (
        ds.map_batches(SimHasher(), batch_format="pyarrow")
        .select_columns(["doc_id", "simhash"])
        .materialize()
    )
    export = pa.concat_tables(ray.get(sigs.to_arrow_refs())).sort_by(
        [("doc_id", "ascending")]
    )
    tmp = SIMHASH_SIG_EXPORT + f".tmp-{os.getpid()}"
    pq.write_table(export, tmp)
    os.replace(tmp, SIMHASH_SIG_EXPORT)
    return simhash_dup_pairs(sigs, max_hamming=3)


def ngram_jaccard_pairs(sf_dir: str):
    """Exact set-similarity join (inverted shingle index) — unlike the
    MinHash sketch this has a deterministic SQL oracle."""
    from xgeo_ray.functions.dedup import ngram_jaccard_dup_pairs

    ds = _docs_with_planted_dups(sf_dir)
    out = ngram_jaccard_dup_pairs(ds, threshold=0.8)
    return out.map_batches(
        lambda b: pa.table(
            {
                "doc_id_a": b.column("doc_id_a").cast(pa.int64()),
                "doc_id_b": b.column("doc_id_b").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def embedding_dup_pairs_q(sf_dir: str):
    from xgeo_ray.functions.dedup import embedding_dup_pairs

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.sort_by([("vec_id", "ascending")])
    dup = t.slice(0, 20)
    dup = dup.set_column(
        0, "vec_id", pc.add(dup.column("vec_id"), pa.scalar(1_000_000, pa.int64()))
    )
    ds = ray.data.from_arrow(pa.concat_tables([t, dup]))
    out = embedding_dup_pairs(ds, threshold=0.999)
    return out.map_batches(
        lambda b: pa.table(
            {
                "vec_id_a": pa.array(
                    np.asarray(b.column("vec_id_a"), dtype=np.int64), pa.int64()
                ),
                "vec_id_b": pa.array(
                    np.asarray(b.column("vec_id_b"), dtype=np.int64), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )


def doc_signals(sf_dir: str):
    """Per-doc scalar signals in one pass: vectorized stopword language
    ID + Karp-Rabin rolling-hash fingerprint (the former lang_id_pred /
    doc_fingerprints pair — both kernels, one driver slot)."""
    from xgeo_ray.functions.text import LangId, add_fingerprint

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    lid = LangId()

    def both(b: pa.Table) -> pa.Table:
        return add_fingerprint(lid(b))

    return ds.map_batches(both, batch_format="pyarrow").select_columns(
        ["doc_id", "lang_pred", "fingerprint"]
    )


def sampled_docs(sf_dir: str):
    """Deterministic sampling, both flavors union'd with a ``method``
    tag (one driver slot): a ~10% global Fibonacci-hash sample and a
    per-source MIXTURE sample (keep 80% of src0, 50% of src1, 30% of
    src2, 5% of the rest). Reproducible cross-engine — the oracle
    replays the exact HUGEINT acceptance predicates. Pure streaming
    filters; no shuffle."""
    from xgeo_ray.functions.relational import hash_sample, mixture_sample

    docs = _read(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )
    hs = hash_sample(docs, "doc_id", rate_permille=100, salt=7)
    mx = mixture_sample(
        docs,
        "source",
        "doc_id",
        {"src0": 800, "src1": 500, "src2": 300},
        default_permille=50,
        salt=3,
    )

    def tag(method):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                "method", pa.array([method] * b.num_rows, pa.string())
            )

        fn.__name__ = f"tag_{method}"
        return fn

    return hs.map_batches(tag("hash"), batch_format="pyarrow").union(
        mx.map_batches(tag("mixture"), batch_format="pyarrow")
    )


def shuffled_shards(sf_dir: str):
    """Deterministic global shuffle into 8 training shards: each doc_id
    gets (shard, pos) — a reproducible pseudorandom read order (the
    bijective multiplicative hash has no ties, so the permutation is
    total and the oracle replays it exactly). One shuffle keyed on
    shard; one vectorized sort per shard."""
    from xgeo_ray.functions.relational import shard_shuffle

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return shard_shuffle(ds, "doc_id", num_shards=8)


def length_bucket_stats(sf_dir: str):
    """Curriculum/length-bucketing histogram: docs and total tokens per
    token-length bucket (64-token steps, capped at bucket 16) — the
    planning table a sequence-packing or curriculum stage reads.
    Integer-only bucketing (no float log) so the oracle is exact."""
    from xgeo_ray.functions.relational import partial_group_agg
    from xgeo_ray.functions.text import token_count_table

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def bucketize(b: pa.Table) -> pa.Table:
        b = token_count_table(b)
        n = b.column("n_tokens").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(np.minimum(n // 64, 16).astype(np.int64)),
                "n_docs": pa.array(np.ones(len(n), dtype=np.int64)),
                "total_tokens": pa.array(n.astype(np.int64)),
            }
        )

    g = partial_group_agg(
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True),
        ["bucket"],
        [("n_docs", "sum", "n_docs"), ("total_tokens", "sum", "total_tokens")],
        num_buckets=8,
    )
    return g


def distinctive_terms(sf_dir: str):
    """Per-document distinctive terms — TF-IDF with the float dropped:
    top-3 tokens per doc ranked by (tf DESC, df ASC, token ASC), a
    total order over exact integers so the ranking replays bit-for-bit
    in SQL (float idf would rank identically under this tiebreak for
    fixed N). In-batch tf combiner, distributed df, bucketed-cogroup
    tf×df join, per-group top-k — no all-pairs, no driver state."""
    from xgeo_ray.functions.relational import grouped_top_k
    from xgeo_ray.functions.text import doc_term_stats

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    stats = doc_term_stats(ds)
    top = grouped_top_k(
        stats,
        keys=["doc_id"],
        sort_cols=["tf", "df", "token"],
        descending=[True, False, False],
        k=3,
    )
    return top.select_columns(["doc_id", "token", "tf", "df"])


def quality_filtered_docs(sf_dir: str):
    """Percentile quality cut — the sketch→filter composition every
    corpus pipeline runs ("drop the shortest quartile"): the threshold
    comes from the distributed exact-quantile histogram (driver sees
    one row per DISTINCT token count, quantile_disc semantics), then
    one streaming filter keeps docs at or above it. Two passes over a
    narrow projection; no sort, no full materialization."""
    from xgeo_ray.functions.relational import exact_quantiles
    from xgeo_ray.functions.text import token_count_table

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tok(b: pa.Table) -> pa.Table:
        return token_count_table(b).select(["doc_id", "n_tokens"])

    counts = ds.map_batches(tok, batch_format="pyarrow", zero_copy_batch=True)
    thr = int(
        exact_quantiles(counts, "n_tokens", [0.25]).column("value")[0].as_py()
    )
    return counts.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("n_tokens"), pa.scalar(thr, pa.int64()))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _bench_split(b: pa.Table, keep_benchmark: bool) -> pa.Table:
    """documents -> the synthetic 'benchmark' slice (doc_id % 50 == 0)
    or its complement (the corpus)."""
    ids = b.column("doc_id").to_numpy(zero_copy_only=False)
    m = ids % 50 == 0
    return b.filter(pa.array(m if keep_benchmark else ~m))


def decontaminated_docs(sf_dir: str):
    """Benchmark decontamination: corpus doc_ids sharing >= 1 word
    3-shingle with the benchmark slice. Benchmark shingle hashes are
    broadcast once (small side); the corpus pass is a streaming
    membership filter — no shuffle (functions/dedup.py:contaminated_ids)."""
    from xgeo_ray.functions.dedup import contaminated_ids

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    corpus = docs.map_batches(
        lambda b: _bench_split(b, False), batch_format="pyarrow", zero_copy_batch=True
    )
    bench = docs.map_batches(
        lambda b: _bench_split(b, True), batch_format="pyarrow", zero_copy_batch=True
    )
    return contaminated_ids(corpus, bench, k_shingle=3)


def top_terms(sf_dir: str):
    """Corpus vocabulary head: exact top-100 whitespace tokens by total
    count (tiebreak: token ascending, so the selected SET is
    deterministic). In-batch value_counts combiner -> bucketed partial
    aggregate -> prune-then-sort top-k; occurrences never cross the
    shuffle (functions/text.py:term_frequencies)."""
    from xgeo_ray.functions.relational import top_k
    from xgeo_ray.functions.text import term_frequencies

    ds = _read(f"{sf_dir}/documents.parquet", columns=["text"])
    return top_k(term_frequencies(ds), ["n", "token"], [True, False], 100)


def doc_dup_metrics(sf_dir: str):
    """Per-document duplication metrics, two operator families in ONE
    per-doc row (the consolidation pattern): Gopher-style IN-doc
    repetition counters (total vs distinct word-2-grams —
    functions/text.py:repetition_stats, streaming) LEFT-joined with
    CROSS-corpus duplicated-substring coverage (dup_ngram_spans
    stats=True: word-3-grams occurring >= 2 times anywhere, merged
    into maximal spans — the distributed Lee-et-al ExactSubstr
    approximation). Exact integers throughout; docs with no duplicated
    grams report (0, 0)."""
    from xgeo_ray.functions.dedup import dup_ngram_spans
    from xgeo_ray.functions.relational import hash_join
    from xgeo_ray.functions.text import repetition_stats

    docs = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    rep = repetition_stats(docs)
    dup = dup_ngram_spans(
        _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
        k=3,
        min_count=2,
        stats=True,
    )
    joined = hash_join(rep, dup, on="doc_id", join_type="left outer")

    def fill0(b: pa.Table) -> pa.Table:
        for c in ("dup_grams", "covered_tokens"):
            b = b.set_column(
                b.column_names.index(c),
                c,
                pc.fill_null(b.column(c), pa.scalar(0, pa.int64())),
            )
        return b

    return joined.map_batches(fill0, batch_format="pyarrow")


def packed_sequences(sf_dir: str):
    """Fixed-length training-sequence packing: concatenate all document
    tokens in doc_id order, cut into 256-token sequences, emit the
    doc->sequence span map. Hierarchical distributed prefix sum — only
    per-bucket token totals reach the driver
    (functions/text.py:pack_sequences)."""
    from xgeo_ray.functions.text import pack_sequences

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_sequences(ds, seq_len=256)


# --------------------------------------------------------------- ANN


def _query_vectors(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pc.is_in(t.column("vec_id"), value_set=pa.array([0, 1], pa.int64())))
    t = t.sort_by([("vec_id", "ascending")])
    return np.stack(t.column("embedding").to_numpy(zero_copy_only=False))


def ann_top10(sf_dir: str):
    from xgeo_ray.functions.ann import brute_force_topk

    emb = _read(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = brute_force_topk(emb, _query_vectors(sf_dir), k=10)
    return t.cast(
        pa.schema([("query_idx", pa.int64()), ("vec_id", pa.int64()), ("rank", pa.int64())])
    )


def ann_ivf_top10(sf_dir: str):
    """IVF through the PERSISTED partitioned index. The index directory is
    written once per input (cache keyed by the embeddings file identity)
    and the probe reads exactly nprobe partition files — I/O scales with
    nprobe, not index size.

    The driver query probes ALL lists (nprobe == num_centroids), which is
    EXACT — identical to brute force (proved in test_sync_ivf's
    probe-all == brute-force parity test) — so it carries the same SQL
    oracle as ann_top10 while still exercising the build/persist/probe
    index path end-to-end. The approximate regime (nprobe < K) stays
    covered by the recall-bound and probe-pruning pytests."""
    import hashlib
    import os

    from xgeo_ray.functions.ann import (
        build_ivf_index,
        ivf_topk_indexed,
        train_ivf_centroids,
    )

    src = f"{sf_dir}/embeddings.parquet"
    st = os.stat(src)
    key = hashlib.sha256(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:c8".encode()
    ).hexdigest()[:16]
    index_dir = f"/tmp/xgeo_ivf_index/{key}"
    if not os.path.exists(os.path.join(index_dir, "_ivf.json")):
        emb = _read(src, columns=["vec_id", "embedding"])
        cents = train_ivf_centroids(emb, num_centroids=8)
        build_ivf_index(emb, cents, index_dir)
    t = ivf_topk_indexed(index_dir, _query_vectors(sf_dir), k=10, nprobe=8)
    return t.cast(
        pa.schema([("query_idx", pa.int64()), ("vec_id", pa.int64()), ("rank", pa.int64())])
    )


# --------------------------------------------------------------- multimodal


def multimodal_features(sf_dir: str):
    """The multimodal feature-extraction path in one driver slot
    (former multimodal_decode / multimodal_frames pair): binary media
    column -> decode stage (per-worker-cached stub codec) AND
    frame-sampling stage (row-expanding) -> per-media frame summary,
    joined on media_id into one feature row per media.

    Both stages are instance-passed: the decoder loads once per worker
    process (see DecodeMedia docstring; measured 0.52 s vs 1.39 s for
    the 2-actor pool at sf0.01). Flip to (Cls, concurrency=N) when the
    model needs dedicated processes / GPU slots."""
    from xgeo_ray.functions.multimodal import (
        DecodeMedia,
        SampleFrames,
        docs_to_media,
    )

    ds = _read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = ds.map_batches(docs_to_media, batch_format="pyarrow")
    decoded = media.map_batches(
        DecodeMedia(), batch_format="pyarrow", batch_size=64
    )
    frames = media.map_batches(
        SampleFrames(frame_bytes=64, max_frames=4),
        batch_format="pyarrow",
        batch_size=128,
    )
    frame_stats = partial_group_agg(
        frames.select_columns(["media_id", "frame_idx"]),
        ["media_id"],
        [("frame_idx", "count", "n_sampled"), ("frame_idx", "max", "max_frame_idx")],
    )
    # one summary row per media = data-proportional: join distributed
    # (bucketed cogroup), never a driver-side broadcast
    from xgeo_ray.functions.relational import hash_join

    return hash_join(decoded, frame_stats, on="media_id")


# --------------------------------------------------------------- registries


def build_queries() -> dict:
    return {
        "cdc_lww_state": cdc_lww_state,
        "cdc_deleted_keys": cdc_deleted_keys,
        "cdc_stream_metrics": cdc_stream_metrics,
        "cdc_join_state": cdc_join_state,
        "cdc_dedup_replay": cdc_dedup_replay,
        "cdc_additive_state": cdc_additive_state,
        "cdc_late_events": cdc_late_events,
        "cdc_changes_feed": cdc_changes_feed,
        "cdc_derived_state": cdc_derived_state,
        "cdc_enriched_state": cdc_enriched_state,
        "cdc_delete_where": cdc_delete_where,
        "cdc_state_asof": cdc_state_asof,
        "cdc_assembled_convs": cdc_assembled_convs,
        "doc_transforms": doc_transforms,
        "doc_chunks": doc_chunks,
        "q1_pricing_summary": q1_pricing_summary,
        "nation_customer_counts": nation_customer_counts,
        "orders_by_segment": orders_by_segment,
        "order_revenue_by_priority": order_revenue_by_priority,
        "order_scans": order_scans,
        "cluster_sizes": cluster_sizes,
        "events_hourly": events_hourly,
        "event_cardinalities": event_cardinalities,
        "user_sessions": user_sessions,
        "events_sliding_1h": events_sliding_1h,
        "events_pairs_1h": events_pairs_1h,
        "events_orders_asof": events_orders_asof,
        "doc_stats_by_lang": doc_stats_by_lang,
        "quality_counts": quality_counts,
        "corpus_clean_stats": corpus_clean_stats,
        "order_price_quantiles": order_price_quantiles,
        "exact_dedup": exact_dedup,
        "minhash_dup_pairs": minhash_dup_pairs,
        "ngram_jaccard_pairs": ngram_jaccard_pairs,
        "top3_orders_per_segment": top3_orders_per_segment,
        "dup_clusters": dup_clusters_q,
        "simhash_dup_pairs": simhash_dup_pairs_q,
        "embedding_dup_pairs": embedding_dup_pairs_q,
        "sampled_docs": sampled_docs,
        "quality_filtered_docs": quality_filtered_docs,
        "shuffled_shards": shuffled_shards,
        "length_bucket_stats": length_bucket_stats,
        "distinctive_terms": distinctive_terms,
        "decontaminated_docs": decontaminated_docs,
        "packed_sequences": packed_sequences,
        "top_terms": top_terms,
        "doc_dup_metrics": doc_dup_metrics,
        "ann_top10": ann_top10,
        "ann_ivf_top10": ann_ivf_top10,
        "multimodal_features": multimodal_features,
    }


# word-3-gram Jaccard >= 0.8 pair list over documents + planted dups —
# shared by the ngram join oracle, the minhash oracle (true-Jaccard
# verified LSH == the exact join when banding recall is total) and the
# duplicate-cluster oracle
_NGRAM_PAIRS_SQL = r"""
            WITH docs AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text
              FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20)
            ),
            toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
              FROM docs
            ),
            sh AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
              FROM toks, unnest(generate_series(1, len(w) - 2)) t(i)
              WHERE len(w) >= 3
              UNION ALL
              SELECT doc_id, array_to_string(w, ' ') AS s FROM toks WHERE len(w) < 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
            pairs AS (
              SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS inter
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT CAST(doc_id_a AS BIGINT) AS doc_id_a,
                   CAST(doc_id_b AS BIGINT) AS doc_id_b
            FROM pairs
            JOIN sizes sa ON doc_id_a = sa.doc_id
            JOIN sizes sb ON doc_id_b = sb.doc_id
            WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
"""


def build_oracle_sql() -> dict[str, str]:
    derive = _DERIVE_SQL
    return {
        "cdc_lww_state": f"""
            WITH ev AS ({derive})
            SELECT conv_id, turn_idx, role, text, ts FROM ev
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) = 1
              AND op <> 'D'
        """,
        "cdc_deleted_keys": f"""
            WITH ev AS ({derive}),
            last AS (
              SELECT conv_id, turn_idx, op FROM ev
              QUALIFY row_number() OVER (
                  PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) = 1
            )
            SELECT conv_id, turn_idx FROM last WHERE op = 'D'
        """,
        # scd2 leg: replay the engine's interval construction — epochs
        # are the same seq-range cuts _seq_ranged_wal writes (3 equal
        # bands of [lo, hi]); per (key, epoch) the delta winner by
        # (ts, seq); the EFFECTIVE chain keeps only epochs where the
        # running (ts, seq)-argmax advances (LWW losers are no-op
        # transitions); lead(ts) over the chain closes each version
        # (a delete closes without opening); per (key, valid_from) the
        # LAST epoch wins (same-instant updates keep the live version).
        # wk packs (ts µs, seq) into one HUGEINT (seq < 1e9 here).
        "cdc_stream_metrics": f"""
            WITH ev AS ({derive})
            SELECT 'op' AS kind, op AS k, count(*) AS n,
                   CAST(-1 AS BIGINT) AS v
            FROM ev GROUP BY op
            UNION ALL
            SELECT 'wm' AS kind, CAST(user_id % 16 AS VARCHAR) AS k,
                   count(*) AS n, CAST(max(event_id) AS BIGINT) AS v
            FROM events GROUP BY user_id % 16
            UNION ALL
            SELECT 'agg' AS kind, role AS k, count(*) AS n,
                   CAST(sum(length(text)) AS BIGINT) AS v
            FROM (
                SELECT role, text FROM ev
                QUALIFY row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, seq DESC) = 1
                  AND op <> 'D'
            ) GROUP BY role
            UNION ALL
            SELECT 'scd2' AS kind,
                   conv_id || chr(31) || CAST(turn_idx AS VARCHAR) AS k,
                   valid_from AS n,
                   COALESCE(valid_to, CAST(-1 AS BIGINT)) AS v
            FROM (
                WITH bounds AS (
                  SELECT min(event_id) AS lo, max(event_id) AS hi
                  FROM events
                ),
                ev2 AS (
                  SELECT ev.*, CASE
                      WHEN seq <= lo + (hi - lo) // 3 THEN 1
                      WHEN seq <= lo + (2 * (hi - lo)) // 3 THEN 2
                      ELSE 3 END AS epoch
                  FROM ev, bounds
                ),
                delta AS (
                  SELECT * FROM ev2
                  QUALIFY row_number() OVER (
                      PARTITION BY conv_id, turn_idx, epoch
                      ORDER BY ts DESC, seq DESC) = 1
                ),
                ranked AS (
                  SELECT *,
                         CAST(epoch_us(ts) AS HUGEINT) * 1000000000
                           + seq AS wk,
                         max(CAST(epoch_us(ts) AS HUGEINT) * 1000000000
                           + seq) OVER (
                             PARTITION BY conv_id, turn_idx
                             ORDER BY epoch
                             ROWS UNBOUNDED PRECEDING) AS run_max
                  FROM delta
                ),
                eff AS (SELECT * FROM ranked WHERE wk = run_max),
                vers AS (
                  SELECT conv_id, turn_idx, op, epoch,
                         CAST(epoch_us(ts) AS BIGINT) AS valid_from,
                         lead(CAST(epoch_us(ts) AS BIGINT)) OVER (
                             PARTITION BY conv_id, turn_idx
                             ORDER BY epoch) AS valid_to
                  FROM eff
                )
                SELECT * FROM vers WHERE op <> 'D'
                QUALIFY row_number() OVER (
                    PARTITION BY conv_id, turn_idx, valid_from
                    ORDER BY epoch DESC) = 1
            )
            UNION ALL
            SELECT 'struct' AS kind, k, count(*) AS n,
                   CAST(sum(n_args) AS BIGINT) AS v
            FROM (
                SELECT 'fn' || CAST(seq % 3 AS VARCHAR) AS k,
                       seq % 7 AS n_args
                FROM ev
                QUALIFY row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, seq DESC) = 1
                  AND op <> 'D'
            ) GROUP BY k
            UNION ALL
            SELECT 'check' AS kind, 'quarantined' AS k,
                   count(*) AS n, CAST(-1 AS BIGINT) AS v
            FROM ev, (SELECT min(event_id) AS lo, max(event_id) AS hi
                      FROM events) b
            WHERE seq <= b.lo + (b.hi - b.lo) // 3
              AND op <> 'D' AND length(text) > 8
            UNION ALL
            SELECT 'check' AS kind, role AS k, count(*) AS n,
                   CAST(sum(length(text)) AS BIGINT) AS v
            FROM (
                SELECT role, text FROM ev,
                     (SELECT min(event_id) AS lo, max(event_id) AS hi
                      FROM events) b
                WHERE seq <= b.lo + (b.hi - b.lo) // 3
                  AND (op = 'D' OR length(text) <= 8)
                QUALIFY row_number() OVER (
                    PARTITION BY conv_id, turn_idx
                    ORDER BY ts DESC, seq DESC) = 1
                  AND op <> 'D'
            ) GROUP BY role
        """,
        "cdc_join_state": f"""
            WITH ev AS ({derive}),
            l AS (
              SELECT conv_id, turn_idx, role, text, ts FROM ev
              QUALIFY row_number() OVER (
                  PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) = 1
                AND op <> 'D'
            ),
            av AS (
              SELECT event_id AS seq,
                     CASE WHEN event_id % 10 < 6 THEN 'I'
                          WHEN event_id % 10 < 9 THEN 'U'
                          ELSE 'D' END AS op,
                     'u' || CAST(user_id AS VARCHAR) AS conv_id,
                     event_id % 40 AS turn_idx,
                     ts,
                     CASE WHEN event_id % 10 >= 9 THEN 0
                          ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS amount
              FROM events
              WHERE event_id % 3 <> 0
            ),
            r AS (
              SELECT conv_id, turn_idx, amount FROM av
              QUALIFY row_number() OVER (
                  PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) = 1
                AND op <> 'D'
            )
            SELECT l.conv_id, l.turn_idx, l.role, l.text, l.ts, r.amount
            FROM l JOIN r USING (conv_id, turn_idx)
        """,
        "cdc_dedup_replay": f"""
            WITH ev AS ({derive}),
            doubled AS (SELECT * FROM ev UNION ALL SELECT * FROM ev)
            SELECT conv_id, turn_idx, text FROM doubled
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) = 1
              AND op <> 'D'
        """,
        "cdc_additive_state": """
            WITH ev AS (
              SELECT event_id AS seq,
                     CASE WHEN event_id % 10 < 6 THEN 'I'
                          WHEN event_id % 10 < 9 THEN 'U'
                          ELSE 'D' END AS op,
                     'u' || CAST(user_id AS VARCHAR) AS conv_id,
                     event_id % 40 AS turn_idx,
                     ts,
                     CASE WHEN event_id % 10 >= 9 THEN 0
                          ELSE CAST(FLOOR(value * 100) AS BIGINT) END AS amount
              FROM events
            ),
            last AS (
              SELECT conv_id, turn_idx, op FROM ev
              QUALIFY row_number() OVER (
                  PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) = 1
            )
            SELECT e.conv_id, e.turn_idx, CAST(SUM(e.amount) AS BIGINT) AS amount
            FROM ev e JOIN last l USING (conv_id, turn_idx)
            WHERE l.op <> 'D'
            GROUP BY e.conv_id, e.turn_idx
        """,
        "cdc_changes_feed": f"""
            WITH ev AS ({derive})
            SELECT CAST(seq // 1000 AS BIGINT) AS epoch,
                   conv_id, turn_idx, op, seq, ts
            FROM ev
            QUALIFY row_number() OVER (
                PARTITION BY seq // 1000, conv_id, turn_idx
                ORDER BY ts DESC, seq DESC) = 1
        """,
        "cdc_derived_state": f"""
            WITH ev AS ({derive})
            SELECT conv_id, turn_idx, role, upper(text) AS text, ts FROM ev
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) = 1
              AND op <> 'D'
        """,
        "cdc_enriched_state": f"""
            WITH ev AS ({derive}),
            state AS (
              SELECT conv_id, turn_idx, role, text, ts FROM ev
              QUALIFY row_number() OVER (
                  PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) = 1
                AND op <> 'D'
            )
            SELECT s.conv_id, s.turn_idx, s.role, s.text, s.ts,
                   c.c_mktsegment AS segment
            FROM state s LEFT JOIN customer c
              ON s.conv_id = 'u' || CAST(c.c_custkey AS VARCHAR)
        """,
        "cdc_delete_where": f"""
            WITH ev AS ({derive}),
            state AS (
              SELECT conv_id, turn_idx, role, text, ts, op FROM ev
              QUALIFY row_number() OVER (
                  PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) = 1
            ),
            kept AS (
              SELECT conv_id, turn_idx, role, text, ts FROM state
              WHERE op <> 'D' AND role <> 'error'
                AND ts >= make_timestamp({_EXPIRE_CUTOFF_US})
            )
            SELECT conv_id, turn_idx, role,
                   CASE WHEN role = 'click'
                        THEN '[click redacted]' ELSE text END AS text,
                   CASE WHEN role = 'click'
                        THEN make_timestamp({_DELETE_TS_US + 2})
                        ELSE ts END AS ts
            FROM kept
        """,
        "cdc_assembled_convs": f"""
            WITH ev AS ({derive}),
            state AS (
              SELECT conv_id, turn_idx, role, text, op FROM ev
              QUALIFY row_number() OVER (
                  PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) = 1
            ),
            live AS (
              SELECT conv_id, turn_idx,
                     coalesce(role, '') AS role, coalesce(text, '') AS text
              FROM state WHERE op <> 'D'
            )
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   string_agg(role || ': ' || text, chr(10)
                              ORDER BY turn_idx) AS doc
            FROM live GROUP BY conv_id
        """,
        "cdc_state_asof": f"""
            WITH ev AS ({derive})
            SELECT conv_id, turn_idx, role, text, ts FROM ev
            WHERE ts <= make_timestamp({_ASOF_T_US})
            QUALIFY row_number() OVER (
                PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) = 1
              AND op <> 'D'
        """,
        "cdc_late_events": """
            WITH ev AS (
              SELECT CAST(user_id % 16 AS BIGINT) AS part_key,
                     CAST(event_id // 500 AS BIGINT) AS epoch,
                     epoch_us(ts) - (event_id % 97) * 3600000000 AS ts_us
              FROM events
            ),
            pe AS (
              SELECT part_key, epoch, max(ts_us) AS mx
              FROM ev GROUP BY 1, 2
            ),
            wm AS (
              SELECT part_key, epoch,
                     max(mx) OVER (PARTITION BY part_key ORDER BY epoch
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS wm_ts,
                     max(mx) OVER (PARTITION BY part_key ORDER BY epoch
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prior_wm
              FROM pe
            )
            SELECT w.part_key, w.epoch,
                   CAST(count(*) FILTER (
                       WHERE w.prior_wm IS NOT NULL AND e.ts_us < w.prior_wm
                   ) AS BIGINT) AS late,
                   w.wm_ts
            FROM ev e
            JOIN wm w ON e.part_key = w.part_key AND e.epoch = w.epoch
            GROUP BY w.part_key, w.epoch, w.wm_ts
        """,
        # 64-token chunks, 16-token overlap (step 48), 1-based list slice
        "doc_chunks": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
              FROM documents
            )
            SELECT doc_id,
                   CAST(s / 48 AS BIGINT) AS chunk_idx,
                   array_to_string(w[s + 1 : least(s + 64, len(w))], ' ') AS chunk_text,
                   CAST(least(s + 64, len(w)) - s AS BIGINT) AS n_tokens
            FROM toks, unnest(generate_series(0, len(w) - 1, 48)) t(s)
            WHERE len(w) > 0
        """,
        # NFC-normalized casefold + the PII sweep: identical RE2 patterns
        # applied in identical order; counts taken on the intermediate
        # text exactly as the engine does
        "doc_transforms": r"""
            WITH t0 AS (SELECT doc_id, text FROM documents),
            t1 AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n1,
                     regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS text
              FROM t0
            ),
            t2 AS (
              SELECT doc_id, n1,
                     len(regexp_extract_all(text, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS n2,
                     regexp_replace(text, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g') AS text
              FROM t1
            ),
            t3 AS (
              SELECT doc_id, n1, n2,
                     len(regexp_extract_all(text, '\+?[0-9][0-9()\-. ]{7,}[0-9]')) AS n3,
                     regexp_replace(text, '\+?[0-9][0-9()\-. ]{7,}[0-9]', '<PHONE>', 'g') AS text
              FROM t2
            ),
            t4 AS (
              SELECT doc_id, n1, n2, n3,
                     len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS n4,
                     regexp_replace(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS text
              FROM t3),
            toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS w
              FROM documents
            ),
            scored AS (
              SELECT doc_id,
                len(list_filter(w, x -> x IN ('der','die','das','und','ist','nicht','ein','zu','mit'))) AS s_de,
                len(list_filter(w, x -> x IN ('the','a','and','of','to','in','is','that','it','for'))) AS s_en,
                len(list_filter(w, x -> x IN ('el','la','los','y','es','un','una','por','para'))) AS s_es,
                len(list_filter(w, x -> x IN ('le','la','les','et','est','un','une','pour','dans'))) AS s_fr
              FROM toks
            ),
            lang AS (
              SELECT doc_id,
                     CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                          WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                          WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                          WHEN s_es >= s_fr THEN 'es'
                          ELSE 'fr' END AS lang_pred
              FROM scored
            ),
            chars AS (
              SELECT doc_id, i,
                     CAST(ascii(substr(text, CAST(i AS INT), 1)) AS HUGEINT) AS c,
                     length(text) AS L
              FROM documents, unnest(generate_series(1, length(text))) t(i)
            ),
            h AS (
              SELECT doc_id, i, L,
                     (  c                    * 12924618581234127435
                      + lead(c, 1) OVER w    * 10923514805226455897
                      + lead(c, 2) OVER w    * 14453212906556403763
                      + lead(c, 3) OVER w    * 14003818205314896721
                      + lead(c, 4) OVER w    * 1000009000027000027
                      + lead(c, 5) OVER w    * 1000006000009
                      + lead(c, 6) OVER w    * 1000003
                      + lead(c, 7) OVER w ) % 18446744073709551616 AS hm
              FROM chars
              WINDOW w AS (PARTITION BY doc_id ORDER BY i)
            ),
            m AS (
              SELECT doc_id, min(hm) AS hm FROM h WHERE i <= L - 7 GROUP BY doc_id)
            SELECT t4.doc_id,
                   lower(nfc_normalize(d.text)) AS text_norm,
                   t4.text AS text_redacted,
                   CAST(n1 + n2 + n3 + n4 AS BIGINT) AS n_redactions,
                   lang.lang_pred,
                   CAST(CASE WHEN m.hm >= 9223372036854775808
                             THEN m.hm - 18446744073709551616
                             ELSE m.hm END AS BIGINT) AS fingerprint
            FROM t4
            JOIN documents d ON t4.doc_id = d.doc_id
            JOIN lang ON t4.doc_id = lang.doc_id
            JOIN m ON t4.doc_id = m.doc_id
        """,
        "q1_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '{_Q1_DATE} 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "nation_customer_counts": """
            SELECT n_name, r_name, count(*) AS n_customers
            FROM customer JOIN nation ON c_nationkey = n_nationkey
                          JOIN region ON n_regionkey = r_regionkey
            GROUP BY n_name, r_name
        """,
        "orders_by_segment": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "order_revenue_by_priority": """
            SELECT o_orderpriority,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                   count(*) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "order_scans": """
            SELECT 'top10' AS q, o_orderkey, o_custkey, o_totalprice,
                   CAST(-1 AS BIGINT) AS rank
            FROM (
              SELECT o_orderkey, o_custkey, o_totalprice
              FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
            )
            UNION ALL
            SELECT 'open_highvalue' AS q, o_orderkey, o_custkey, o_totalprice,
                   CAST(-1 AS BIGINT) AS rank
            FROM orders WHERE o_totalprice > 300000.0 AND o_orderstatus = 'O'
            UNION ALL
            SELECT 'rank100' AS q, o_orderkey, o_custkey, o_totalprice, rank
            FROM (
              SELECT o_orderkey, o_custkey, o_totalprice,
                     row_number() OVER (
                         ORDER BY o_totalprice DESC, o_orderkey ASC
                     ) - 1 AS rank
              FROM orders
            ) WHERE rank < 100
        """,
        "cluster_sizes": """
            WITH c AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
                     embedding
              FROM (SELECT vec_id, embedding FROM embeddings
                    ORDER BY vec_id LIMIT 8)
            ),
            sims AS (
              SELECT e.vec_id, c.cluster,
                     list_inner_product(
                         CAST(e.embedding AS DOUBLE[]),
                         CAST(c.embedding AS DOUBLE[])
                     )
                     / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                CAST(e.embedding AS DOUBLE[])))
                        * sqrt(list_inner_product(CAST(c.embedding AS DOUBLE[]),
                                                  CAST(c.embedding AS DOUBLE[]))))
                       AS cos
              FROM embeddings e CROSS JOIN c
            ),
            best AS (
              SELECT vec_id, cluster, cos,
                     row_number() OVER (
                         PARTITION BY vec_id ORDER BY cos DESC, cluster ASC
                     ) AS rk
              FROM sims
            )
            SELECT cluster,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(vec_id) AS BIGINT) AS id_sum
            FROM best WHERE rk = 1 GROUP BY cluster
        """,
        "events_hourly": """
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   count(*) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
            FROM events GROUP BY 1, 2
        """,
        "event_cardinalities": """
            WITH d AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS s FROM events),
            u AS (
              SELECT DISTINCT
                     CAST(CAST(('0x' || substr(sha256(s), 1, 8)) AS BIGINT) AS HUGEINT) * 4294967296
                   + CAST(CAST(('0x' || substr(sha256(s), 9, 8)) AS BIGINT) AS HUGEINT) AS hv
              FROM d
            ),
            ranked AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM u),
            kth AS (
              SELECT CASE WHEN (SELECT count(*) FROM u) < 64
                          THEN (SELECT max(hv) FROM u)
                          ELSE (SELECT hv FROM ranked WHERE rn = 64) END AS hv,
                     (SELECT count(*) FROM u) AS n
            )
            SELECT CAST(64 AS BIGINT) AS k,
                   CAST(CASE WHEN hv >= 9223372036854775808
                             THEN hv - 18446744073709551616
                             ELSE hv END AS BIGINT) AS kth_hash,
                   CAST(CASE WHEN n < 64 THEN n
                             ELSE FLOOR(63 / (CAST(hv AS DOUBLE)
                                              / 18446744073709551616.0)) END
                        AS BIGINT) AS n_distinct_est,
                   (SELECT count(DISTINCT event_type) FROM events)
                       AS n_event_types
            FROM kth
        """,
        "user_sessions": """
            WITH w AS (
              SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events
            )
            SELECT user_id, count(*) AS n_events,
                   CAST(SUM(CASE WHEN prev_ts IS NULL
                                 OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
            FROM w GROUP BY user_id
        """,
        "events_sliding_1h": """
            SELECT event_id,
                   CAST(count(*) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS n_in_window
            FROM events
        """,
        "events_pairs_1h": """
            SELECT a.event_id, b.event_id AS event_id2
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
        """,
        "events_orders_asof": """
            WITH o AS (
              SELECT o_custkey, o_orderdate, CAST(MAX(o_orderkey) AS BIGINT) AS o_orderkey
              FROM orders GROUP BY 1, 2
            )
            SELECT e.event_id, o.o_orderkey
            FROM events e ASOF JOIN o
              ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
        """,
        "doc_stats_by_lang": r"""
            SELECT lang, count(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   CAST(SUM(len(list_filter(string_split_regex(text, '\s+'),
                                            x -> x <> ''))) AS BIGINT) AS total_tokens,
                   CAST(MIN(doc_id) AS BIGINT) AS min_doc,
                   CAST(MAX(doc_id) AS BIGINT) AS max_doc
            FROM documents GROUP BY lang
        """,
        "quality_counts": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars_calc,
                   CAST(len(list_filter(string_split_regex(text, '\s+'),
                                        x -> x <> '')) AS BIGINT) AS n_tokens,
                   CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS BIGINT) AS n_punct,
                   CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper,
                   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit
            FROM documents
        """,
        "exact_dedup": """
            SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, count(*) AS n_copies
            FROM documents GROUP BY text
        """,
        "order_price_quantiles": """
            WITH p AS (SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS c
                       FROM orders)
            SELECT 0.1 AS q, CAST(quantile_disc(c, 0.1) AS BIGINT) AS value FROM p
            UNION ALL
            SELECT 0.5, CAST(quantile_disc(c, 0.5) AS BIGINT) FROM p
            UNION ALL
            SELECT 0.9, CAST(quantile_disc(c, 0.9) AS BIGINT) FROM p
            UNION ALL
            SELECT 0.99, CAST(quantile_disc(c, 0.99) AS BIGINT) FROM p
        """,
        "corpus_clean_stats": r"""
            WITH scored AS (
              SELECT doc_id, text, lang,
                     CAST(len(list_filter(string_split_regex(text, '\s+'),
                                          x -> x <> '')) AS BIGINT) AS n_tokens,
                     length(text) AS n_chars,
                     length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g')) AS n_punct
              FROM documents
            ),
            gated AS (
              SELECT * FROM scored
              WHERE n_tokens BETWEEN 5 AND 1000 AND n_punct * 5 <= n_chars
            ),
            survivors AS (
              SELECT MIN(doc_id) AS doc_id, MIN(lang) AS lang,
                     MIN(n_tokens) AS n_tokens
              FROM gated GROUP BY text
            )
            SELECT lang, count(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
            FROM survivors GROUP BY lang
        """,
        "top3_orders_per_segment": """
            SELECT c_mktsegment, o_orderkey, rank FROM (
              SELECT c_mktsegment, o_orderkey,
                     row_number() OVER (
                         PARTITION BY c_mktsegment
                         ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
              FROM orders JOIN customer ON o_custkey = c_custkey
            ) WHERE rank <= 3
        """,
        # word-3-gram Jaccard over string shingles == the engine's join
        # over 64-bit shingle hashes (collisions vanishingly unlikely)
        "ngram_jaccard_pairs": _NGRAM_PAIRS_SQL,
        # connected components over the same pair list: recursive
        # transitive closure, cluster id = min reachable doc id
        "dup_clusters": f"""
            WITH RECURSIVE p AS ({_NGRAM_PAIRS_SQL}),
            e AS (
              SELECT doc_id_a AS u, doc_id_b AS v FROM p
              UNION ALL
              SELECT doc_id_b, doc_id_a FROM p
            ),
            cc(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT cc.u, e.v FROM cc JOIN e ON cc.v = e.u
            )
            SELECT CAST(u AS BIGINT) AS doc_id,
                   CAST(LEAST(u, MIN(v)) AS BIGINT) AS cluster_id
            FROM cc GROUP BY u
        """,
        "ann_top10": """
            WITH q AS (
              SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id IN (0, 1)
            ),
            s AS (
              SELECT CAST(q.qid AS BIGINT) AS query_idx, e.vec_id,
                     list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])) AS sim
              FROM embeddings e CROSS JOIN q
            )
            SELECT query_idx, CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(row_number() OVER (PARTITION BY query_idx
                                           ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank
            FROM s
            QUALIFY rank <= 10
        """,
        # minhash_dup_pairs verifies candidates with TRUE word-3-gram
        # Jaccard >= 0.8, so its output is a SUBSET of the exact ngram
        # join; the LSH banding (16 bands x 4 rows, fixed seed) recalls
        # every >=0.8 pair at these scales, making the exact join the
        # oracle. A banding recall miss would surface as a row-count
        # mismatch — i.e. this check also guards recall.
        "minhash_dup_pairs": _NGRAM_PAIRS_SQL,
        # doc_signals = lang id + fingerprint joined per doc. Lang side:
        # same stopword tables / occurrence counts / tiebreak (first in
        # sorted lang order) as functions.text.LangId. Fingerprint side:
        # exact rolling Karp-Rabin min-hash over the UTF-8 bytes (ASCII
        # corpus): 8-byte windows, base 1000003, wrap mod 2^64 (powers
        # pre-reduced), min over windows, signed int64 view.
        # embedding near-dup: exact cosine cross-join (feasible at the
        # driver's sf0.01 scale); the engine's hyperplane-LSH buckets
        # recall every pair at this threshold (identical vectors always
        # share a bucket), so exact == bucketed-verified
        "embedding_dup_pairs": """
            WITH e AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000 AS vec_id, embedding
              FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 20)
            )
            SELECT CAST(a.vec_id AS BIGINT) AS vec_id_a,
                   CAST(b.vec_id AS BIGINT) AS vec_id_b
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.999
        """,
        # the sha256-derived decode stub (functions.multimodal) replayed
        # byte-for-byte (width/height from the first two digest bytes),
        # joined with uniform-stride frame sampling (frame_bytes=64,
        # max_frames=4): n_frames = max(1, bytes//64), take =
        # min(4, n_frames), max sampled idx = floor((take-1)*n_frames/take)
        "multimodal_features": """
            WITH dec AS (
              SELECT CAST(doc_id AS BIGINT) AS media_id,
                     'image' AS kind,
                     CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                     CAST(64 + CAST(('0x' || substr(sha256(text), 1, 2)) AS INT) % 192 AS INT) AS width,
                     CAST(64 + CAST(('0x' || substr(sha256(text), 3, 2)) AS INT) % 192 AS INT) AS height,
                     CAST(3 AS INT) AS channels
              FROM documents
            ),
            fr AS (
              SELECT CAST(doc_id AS BIGINT) AS media_id,
                     greatest(1, octet_length(encode(text)) // 64) AS n_frames
              FROM documents
            )
            SELECT dec.*,
                   least(4, fr.n_frames) AS n_sampled,
                   CAST(FLOOR((least(4, fr.n_frames) - 1) * fr.n_frames
                              / CAST(least(4, fr.n_frames) AS DOUBLE)) AS INT) AS max_frame_idx
            FROM dec JOIN fr USING (media_id)
        """,
        # both deterministic sampling flavors, union'd with a method
        # tag. Hash side: the exact Fibonacci-hash acceptance predicate
        # hash_sample applies — h = (key + salt) * floor(2^64/phi) mod
        # 2^64; keep iff (h >> 40) % 1000 < rate (2^40 = 1099511627776).
        # Mixture side: per-source acceptance bands over the same
        # HUGEINT hash (salt 3).
        "sampled_docs": """
            SELECT doc_id, lang, source, 'hash' AS method FROM documents
            WHERE (((CAST(doc_id AS HUGEINT) + 7)
                     * CAST('11400714819323198485' AS HUGEINT))
                    % CAST('18446744073709551616' AS HUGEINT)
                    // 1099511627776) % 1000 < 100
            UNION ALL
            SELECT doc_id, lang, source, 'mixture' AS method FROM documents
            WHERE (((CAST(doc_id AS HUGEINT) + 3)
                     * CAST('11400714819323198485' AS HUGEINT))
                    % CAST('18446744073709551616' AS HUGEINT)
                    // 1099511627776) % 1000
                  < CASE source WHEN 'src0' THEN 800
                                WHEN 'src1' THEN 500
                                WHEN 'src2' THEN 300
                                ELSE 50 END
        """,
        # quantile_disc == the engine's histogram-walk semantics (same
        # replay as order_price_quantiles); threshold then a plain filter
        "quality_filtered_docs": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(list_filter(string_split_regex(text, '\s+'),
                                          x -> x <> '')) AS BIGINT) AS n_tokens
              FROM documents
            ),
            thr AS (SELECT quantile_disc(n_tokens, 0.25) AS v FROM t)
            SELECT doc_id, n_tokens FROM t, thr WHERE n_tokens >= v
        """,
        # bijective multiplicative hash -> total order, no ties: shard =
        # high bits mod 8 (2^24 = 16777216), pos = rank by hash in shard
        "shuffled_shards": """
            WITH h AS (
              SELECT doc_id,
                     (CAST(doc_id AS HUGEINT)
                       * CAST('11400714819323198485' AS HUGEINT))
                      % CAST('18446744073709551616' AS HUGEINT) AS hh
              FROM documents
            )
            SELECT doc_id,
                   CAST((hh // 16777216) % 8 AS BIGINT) AS shard,
                   CAST(row_number() OVER (
                       PARTITION BY (hh // 16777216) % 8 ORDER BY hh)
                     - 1 AS BIGINT) AS pos
            FROM h
        """,
        "length_bucket_stats": r"""
            SELECT LEAST(n // 64, 16) AS bucket,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n) AS BIGINT) AS total_tokens
            FROM (
              SELECT len(list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '')) AS n
              FROM documents
            )
            GROUP BY 1
        """,
        # float-free TF-IDF ranking: (tf DESC, df ASC, token ASC) is a
        # total order per doc (token unique within doc), so top-3 is exact
        "distinctive_terms": r"""
            WITH dt AS (
              SELECT doc_id, x AS token, CAST(count(*) AS BIGINT) AS tf
              FROM documents,
                   unnest(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) t(x)
              GROUP BY 1, 2
            ),
            dfreq AS (
              SELECT token, CAST(count(*) AS BIGINT) AS df
              FROM dt GROUP BY 1
            )
            SELECT dt.doc_id, dt.token, dt.tf, dfreq.df
            FROM dt JOIN dfreq USING (token)
            QUALIFY row_number() OVER (
                PARTITION BY dt.doc_id
                ORDER BY tf DESC, df ASC, token ASC) <= 3
        """,
        # exact vocabulary head; tie at the cut broken by token ASC so
        # the selected set matches the engine's top_k deterministically
        "top_terms": r"""
            SELECT x AS token, CAST(count(*) AS BIGINT) AS n
            FROM documents,
                 unnest(list_filter(string_split_regex(text, '\s+'),
                                    x -> x <> '')) t(x)
            GROUP BY x
            ORDER BY n DESC, token ASC
            LIMIT 100
        """,
        # distinct 2-gram STRINGS == the engine's distinct 2-gram hashes,
        # dup 3-gram STRINGS == its positional gram hashes (both the
        # vanishing-collision equivalence); docs with < 2 tokens report
        # (0, 0) and docs with no corpus-duplicated 3-gram report (0, 0)
        # via the left joins. Span merge replays dup_ngram_spans: break
        # where the position gap exceeds k=3, span end = last pos + 3.
        "doc_dup_metrics": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
              FROM documents
            ),
            g2 AS (
              SELECT doc_id, w[i] || ' ' || w[i+1] AS g
              FROM toks, unnest(generate_series(1, len(w) - 1)) t(i)
              WHERE len(w) >= 2
            ),
            rep AS (
              SELECT doc_id, count(*) AS n, count(DISTINCT g) AS nd
              FROM g2 GROUP BY doc_id
            ),
            g3 AS (
              SELECT doc_id, i - 1 AS pos,
                     w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
              FROM toks, unnest(generate_series(1, len(w) - 2)) t(i)
              WHERE len(w) >= 3
            ),
            dupg AS (
              SELECT g FROM g3 GROUP BY g HAVING count(*) >= 2
            ),
            marked AS (
              SELECT doc_id, pos FROM g3 JOIN dupg USING (g)
            ),
            brk AS (
              SELECT doc_id, pos,
                     CASE WHEN pos - lag(pos) OVER (
                              PARTITION BY doc_id ORDER BY pos) <= 3
                          THEN 0 ELSE 1 END AS b
              FROM marked
            ),
            sp AS (
              SELECT doc_id, pos,
                     SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS sid
              FROM brk
            ),
            spans AS (
              SELECT doc_id, sid, max(pos) + 3 - min(pos) AS w
              FROM sp GROUP BY 1, 2
            ),
            dupc AS (
              SELECT doc_id, count(*) AS dup_grams FROM marked GROUP BY 1
            ),
            cov AS (
              SELECT doc_id, SUM(w) AS covered FROM spans GROUP BY 1
            )
            SELECT t.doc_id,
                   CAST(COALESCE(rep.n, 0) AS BIGINT) AS n_2grams,
                   CAST(COALESCE(rep.nd, 0) AS BIGINT) AS n_distinct_2grams,
                   CAST(COALESCE(dupc.dup_grams, 0) AS BIGINT) AS dup_grams,
                   CAST(COALESCE(cov.covered, 0) AS BIGINT) AS covered_tokens
            FROM toks t
            LEFT JOIN rep USING (doc_id)
            LEFT JOIN dupc USING (doc_id)
            LEFT JOIN cov USING (doc_id)
        """,
        # concatenate-and-chunk packing replay: window cumsum gives each
        # doc's global token start, generate_series (inclusive) expands
        # the sequences it overlaps. Same \s+ tokenization as
        # token_totals_by_lang.
        "packed_sequences": r"""
            WITH c AS (
              SELECT doc_id,
                     len(list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '')) AS n
              FROM documents
            ),
            s AS (
              SELECT doc_id, n,
                     CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS st
              FROM c
            )
            SELECT doc_id,
                   CAST(seq_id AS BIGINT) AS seq_id,
                   CAST(greatest(st - seq_id * 256, 0) AS BIGINT) AS off_in_seq,
                   CAST(least((seq_id + 1) * 256, st + n)
                        - greatest(seq_id * 256, st) AS BIGINT) AS n_tok
            FROM s, unnest(generate_series(st // 256, (st + n - 1) // 256)) t(seq_id)
            WHERE n > 0
        """,
        # word-3-gram overlap vs the doc_id%50==0 'benchmark' slice —
        # string shingles == the engine's 64-bit shingle hashes (same
        # equivalence the ngram_jaccard oracle relies on)
        "decontaminated_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
              FROM toks, unnest(generate_series(1, len(w) - 2)) t(i)
              WHERE len(w) >= 3
              UNION ALL
              SELECT doc_id, array_to_string(w, ' ') AS s FROM toks WHERE len(w) < 3
            ),
            bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0)
            SELECT DISTINCT CAST(c.doc_id AS BIGINT) AS doc_id
            FROM sh c JOIN bench USING (s)
            WHERE c.doc_id % 50 <> 0
        """,
        # simhash_dup_pairs: the signatures themselves are not
        # SQL-reproducible (fixed-key siphash word hashes; they stay
        # golden-pinned cross-process in tests/test_dedup_text_ann.py),
        # but GIVEN the engine-exported signatures the pair stage is pure
        # banding + bit_count Hamming — replayed here over the export the
        # engine query writes (SIMHASH_SIG_EXPORT). h is the two's-
        # complement uint64 of the stored int64; bands are the four
        # 16-bit slices; a pair is a candidate iff some band matches
        # exactly (the pigeonhole guarantee), verified at hamming <= 3.
        "simhash_dup_pairs": f"""
            WITH sigs AS (
              SELECT doc_id,
                     CAST(CASE WHEN simhash < 0
                               THEN simhash::HUGEINT + 18446744073709551616
                               ELSE simhash::HUGEINT END AS UBIGINT) AS h
              FROM read_parquet('{SIMHASH_SIG_EXPORT}')
            ),
            bands AS (
              SELECT doc_id, h, band, (h >> (16 * band)) & 65535 AS band_val
              FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS band) bs
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                              a.h AS ha, b.h AS hb
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.band_val = b.band_val
               AND a.doc_id < b.doc_id
            )
            SELECT doc_id_a, doc_id_b,
                   CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
            FROM cand
            WHERE bit_count(xor(ha, hb)) <= 3
        """,
        # ann_ivf_top10 probes ALL 8 lists of the persisted index, which
        # is exact (probe-all == brute force, test_sync_ivf parity test),
        # so the brute-force cosine SQL is its oracle too. The nprobe<K
        # approximate regime keeps its recall-bound pytest.
        "ann_ivf_top10": """
            WITH q AS (
              SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id IN (0, 1)
            ),
            s AS (
              SELECT CAST(q.qid AS BIGINT) AS query_idx, e.vec_id,
                     list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])) AS sim
              FROM embeddings e CROSS JOIN q
            )
            SELECT query_idx, CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(row_number() OVER (PARTITION BY query_idx
                                           ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank
            FROM s
            QUALIFY rank <= 10
        """,
    }
