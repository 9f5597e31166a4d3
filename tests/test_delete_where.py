"""Distributed predicate deletes (``ingest.delete_where``): tombstone
every key whose current merged row matches, exactly-once by batch_id,
with physical erasure via the existing compact+vacuum retention path."""

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _df(ds):
    return (
        ds.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _mk(root):
    base = fx.make_transcripts(10, 6)
    pq.write_table(base, f"{root}/base.parquet")
    events = fx.make_change_events(
        800, n_convs=10, turns_per_conv=6, dup_fraction=0.0
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    table = DeltaTable.create(f"{root}/table", num_partitions=4, num_salts=2)
    ing.bootstrap_base(table, f"{root}/base.parquet")
    ing.run_stream(table, segs, segments_per_epoch=1)
    return table, base, events


def test_delete_where_matches_filtered_state(tmp_path):
    table, base, events = _mk(str(tmp_path))
    before = _df(ing.snapshot(table))
    assert (before["role"] == "tool").any()

    m = ing.delete_where(
        table,
        lambda t: pc.equal(t.column("role"), "tool"),
        batch_id="takedown-1",
        columns=["role"],
    )
    assert m is not None
    got = _df(ing.snapshot(table))
    want = before[before["role"] != "tool"].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert m.totals["tombstones"] == (before["role"] == "tool").sum()

    # exactly-once: the same batch_id is a committed no-op
    assert (
        ing.delete_where(
            table,
            lambda t: pc.equal(t.column("role"), "tool"),
            batch_id="takedown-1",
            columns=["role"],
        )
        is None
    )
    # stream replay protection untouched (out-of-band seq=-1)
    before_epoch = table.latest_epoch()
    segs = sorted(glob.glob(f"{tmp_path}/wal/*.parquet"))
    ing.run_stream(table, segs, segments_per_epoch=1)
    assert table.latest_epoch() == before_epoch
    assert ing.fsck(table)["ok"]


def test_delete_where_predicate_declared_projection(tmp_path):
    """A predicate carrying its own ``columns`` attribute prunes the
    scan to keys + declared columns (asserted from inside the
    predicate — workers see no other columns), and an undeclared
    predicate warns about the unpruned scan."""
    import warnings

    table, base, events = _mk(str(tmp_path))
    before = _df(ing.snapshot(table))

    def pred(t: pa.Table):
        assert set(t.column_names) == {"conv_id", "turn_idx", "role"}, (
            f"unpruned delete scan read {t.column_names}"
        )
        return pc.equal(t.column("role"), "tool")

    pred.columns = ["role"]
    m = ing.delete_where(table, pred, batch_id="takedown-proj")
    assert m is not None
    got = _df(ing.snapshot(table))
    want = before[before["role"] != "tool"].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ing.delete_where(
            table,
            lambda t: pc.equal(t.column("role"), "no-such-role"),
            batch_id="takedown-unpruned",
        )
    assert any("EVERY column" in str(x.message) for x in w)


def test_delete_where_empty_match_still_exactly_once(tmp_path):
    table, base, events = _mk(str(tmp_path))
    before = _df(ing.snapshot(table))
    m = ing.delete_where(
        table,
        lambda t: pc.equal(t.column("role"), "no-such-role"),
        batch_id="noop-1",
        columns=["role"],
    )
    assert m is not None and m.totals["tombstones"] == 0
    pd.testing.assert_frame_equal(_df(ing.snapshot(table)), before)
    assert (
        ing.delete_where(
            table,
            lambda t: pc.equal(t.column("role"), "no-such-role"),
            batch_id="noop-1",
            columns=["role"],
        )
        is None
    )


def test_delete_then_compact_vacuum_erases_bytes(tmp_path):
    table, base, events = _mk(str(tmp_path))
    victim = _df(ing.snapshot(table))["conv_id"].iloc[0]
    ing.delete_where(
        table,
        lambda t: pc.equal(t.column("conv_id"), victim),
        batch_id="gdpr-1",
    )
    assert victim not in set(_df(ing.snapshot(table))["conv_id"])
    # physical erasure: age out the tombstones, reclaim old bytes
    horizon = int(pd.Timestamp.utcnow().timestamp() * 1e6) + 10_000_000
    ing.compact(table, tombstone_ts_horizon=horizon)
    ing.vacuum(table)
    for p in glob.glob(f"{tmp_path}/table/parts/part=*/*.parquet"):
        t = pq.read_table(p, columns=["conv_id"])
        assert victim not in set(t.column("conv_id").to_pylist()), p
    assert ing.fsck(table)["ok"]


def test_out_of_band_batches_do_not_poison_event_time_watermark(tmp_path):
    """A takedown stamped at wall-clock "now" (2026) over a 2024-ts
    stream must NOT advance the stream's event-time watermark — every
    later genuine event would otherwise count as late and watermark
    triggers would fire with a bogus completeness claim."""
    table, base, events = _mk(str(tmp_path))
    wm_before = table.event_time_watermark()
    ing.delete_where(
        table,
        lambda t: pc.equal(t.column("role"), "tool"),
        batch_id="takedown-now",
        columns=["role"],
    )  # default ts = wall-clock now
    assert table.event_time_watermark() == wm_before
    # same exemption for correction batches
    rows = pa.table(
        {"conv_id": ["conv-000000"], "turn_idx": pa.array([0], pa.int64()),
         "text": ["fixed"]}
    )
    ing.apply_changes(table, rows, batch_id="fix-now")
    assert table.event_time_watermark() == wm_before
    # ...and for a DERIVED sink syncing that correction epoch (the oob
    # flag doesn't travel; the all-seqs-negative structural test does)
    sink = DeltaTable.create(
        f"{tmp_path}/sink", num_partitions=2, num_salts=1
    )
    ing.sync_derived(table, sink)
    swm = sink.event_time_watermark()
    # coarser sink partitioning can raise the min-of-max a little; the
    # poisoning failure mode would put it at wall-clock NOW (months out)
    assert swm <= wm_before + 3_600_000_000, (swm, wm_before)


def test_vacuum_reclaims_orphaned_delete_stage_dirs(tmp_path):
    import time

    table, base, events = _mk(str(tmp_path))
    # a crashed delete_where attempt: staged files, no publish, no commit
    stage = f"{tmp_path}/table/backfill/dead-batch.d.stage-99999"
    os.makedirs(stage)
    with open(f"{stage}/part-00000.parquet", "wb") as f:
        f.write(b"orphan")
    old = time.time() - 3600
    os.utime(stage, (old, old))
    got = ing.vacuum(table)
    assert not os.path.exists(stage)
    assert got["deleted"] >= 1
    assert ing.fsck(table)["ok"]


def test_later_upsert_reinserts_deleted_key(tmp_path):
    table, base, events = _mk(str(tmp_path))
    snap = _df(ing.snapshot(table))
    victim_conv = snap["conv_id"].iloc[0]
    victim_turn = int(snap["turn_idx"].iloc[0])
    ing.delete_where(
        table,
        lambda t: pc.equal(t.column("conv_id"), victim_conv),
        batch_id="d1",
    )
    assert victim_conv not in set(_df(ing.snapshot(table))["conv_id"])
    # a correction stamped LATER re-inserts the key (upsert semantics)
    rows = pa.table(
        {
            "conv_id": [victim_conv],
            "turn_idx": pa.array([victim_turn], pa.int64()),
            "role": ["user"],
            "text": ["restored"],
        }
    )
    ing.apply_changes(table, rows, batch_id="fix-1")
    got = _df(ing.snapshot(table))
    row = got[(got.conv_id == victim_conv) & (got.turn_idx == victim_turn)]
    assert len(row) == 1 and row["text"].iloc[0] == "restored"
