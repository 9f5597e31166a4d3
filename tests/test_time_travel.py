"""Time-travel snapshots + the CDC-out changes feed.

``snapshot(as_of_epoch=E)`` reads the state as of any committed epoch
(manifests are the version history; delta files are immutable until
vacuum). ``changes(since_epoch, upto_epoch)`` exposes the applied
per-epoch deltas as a Dataset — the feed a downstream consumer tails,
with the epoch number as its exactly-once cursor."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pandas as pd
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


@pytest.fixture(scope="module")
def tt_table(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tt"))
    base = fx.make_transcripts(10, 6)
    pq.write_table(base, f"{root}/base.parquet")
    events = fx.make_change_events(
        900, n_convs=10, turns_per_conv=6, dup_fraction=0.0
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=3)
    table = DeltaTable.create(f"{root}/table", num_partitions=4, num_salts=2)
    ing.bootstrap_base(table, f"{root}/base.parquet")  # epoch 1
    ing.run_stream(table, segs, segments_per_epoch=1)  # epochs 2..4
    return table, base, events


def _df(ds):
    return (
        ds.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _want_prefix(base, events, frac_thirds):
    n = events.num_rows
    prefix = events.slice(0, round(frac_thirds * n / 3))
    return fx.naive_final_state(base, prefix).to_pandas()


def test_snapshot_as_of_each_epoch(tt_table):
    table, base, events = tt_table
    # epoch 1 = bootstrap only
    got = _df(ing.snapshot(table, as_of_epoch=1))
    want = fx.naive_final_state(base, events.slice(0, 0)).to_pandas()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # epochs 2..4 = prefix replays (dup_fraction=0 → table order == seq)
    for k in (1, 2, 3):
        got = _df(ing.snapshot(table, as_of_epoch=1 + k))
        want = _want_prefix(base, events, k)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_time_travel_survives_compaction(tt_table):
    table, base, events = tt_table
    latest = table.latest_epoch()
    before = _df(ing.snapshot(table, as_of_epoch=2))
    m = ing.compact(table)
    # pre-compaction epochs still reproduce (delta files not vacuumed)
    pd.testing.assert_frame_equal(_df(ing.snapshot(table, as_of_epoch=2)), before)
    # as-of the compaction epoch == current state
    pd.testing.assert_frame_equal(
        _df(ing.snapshot(table, as_of_epoch=m.epoch)), _df(ing.snapshot(table))
    )
    assert m.epoch == latest + 1


def test_changes_feed_matches_lineage(tt_table):
    table, base, events = tt_table
    feed = ing.changes(table).to_arrow_refs()
    import ray

    t = pa.concat_tables(ray.get(feed))
    deltas = [m for m in table.manifests() if m.kind == "delta"]
    assert t.num_rows == sum(m.totals["applied"] for m in deltas)
    assert sorted(set(t.column("_epoch").to_pylist())) == [
        m.epoch for m in deltas if m.totals["applied"]
    ]
    # the cursor partitions the feed exactly
    n_upto = ing.changes(table, upto_epoch=2).count()
    n_after = ing.changes(table, since_epoch=2).count()
    assert n_upto + n_after == t.num_rows


def test_changes_replay_reproduces_state(tt_table, tmp_path):
    """Exactly-once consumer contract: replaying the feed (post-bootstrap
    epochs) into a fresh bootstrapped table reproduces the source state —
    per-epoch deltas carry everything (ops, tombstones, seq, ts)."""
    table, base, events = tt_table
    import ray

    feed = pa.concat_tables(
        ray.get(ing.changes(table, since_epoch=1).to_arrow_refs())
    )
    feed = feed.drop_columns(["_epoch"]).sort_by([("seq", "ascending")])
    seg = str(tmp_path / "replay.parquet")
    pq.write_table(feed, seg)
    fresh = DeltaTable.create(
        str(tmp_path / "t2"), num_partitions=8, num_salts=1
    )
    pq.write_table(base, str(tmp_path / "base.parquet"))
    ing.bootstrap_base(fresh, str(tmp_path / "base.parquet"))
    ing.ingest_segments(fresh, [seg])
    pd.testing.assert_frame_equal(
        _df(ing.snapshot(fresh)), _df(ing.snapshot(table))
    )


def test_event_time_snapshot(tt_table):
    """as_of_ts_us reproduces the latest COMMITTED version of each key
    at-or-before T. Granularity is the epoch: delta files carry each
    epoch's per-key winner, so the oracle collapses each epoch first
    (the three segments ingested at segments_per_epoch=1 are contiguous
    thirds of the stream), then filters ts <= T, then replays — base
    rows predate every change event in the fixtures, so only events
    are cut."""
    from xgeo_ray.stages.collapse import lww_collapse

    table, base, events = tt_table
    ts = events.column("ts").cast(pa.int64()).to_numpy()
    T = int(np.quantile(ts, 0.5))
    # as_of_epoch=4 = the last delta epoch: composes with event-time
    # travel AND stays valid after the shared table's compaction test
    # (the guard correctly refuses plain as_of_ts across a compaction)
    got = _df(ing.snapshot(table, as_of_epoch=4, as_of_ts_us=T))
    n = events.num_rows
    bounds = [round(i * n / 3) for i in range(4)]
    committed = pa.concat_tables(
        lww_collapse(
            events.slice(bounds[k], bounds[k + 1] - bounds[k]),
            drop_tombstones=False,
        )
        for k in range(3)
    )
    kept = committed.filter(
        pc.less_equal(
            committed.column("ts").cast(pa.int64()), pa.scalar(T, pa.int64())
        )
    )
    want = (
        fx.naive_final_state(base, kept)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_event_time_snapshot_compaction_guard(tmp_path):
    """Event-time travel across a compaction whose folded winners
    postdate T fails fast (the superseded pre-T versions are gone) —
    but a T at-or-after the compaction's max_ts still works."""
    ev = fx.make_change_events(600, n_convs=8, turns_per_conv=5)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=2)
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.run_stream(t, segs, segments_per_epoch=1)
    ing.compact(t)
    ts = ev.column("ts").cast(pa.int64()).to_numpy()
    with pytest.raises(ValueError, match="compaction"):
        ing.snapshot(t, as_of_ts_us=int(np.quantile(ts, 0.5)))
    ok = ing.snapshot(t, as_of_ts_us=int(ts.max()))
    assert ok.count() == ing.snapshot(t).count()


def test_changes_ts_band_zone_map_pruning(tmp_path):
    """Band-limited feed reads prune whole delta files from the manifest
    zone maps ([min_ts, max_ts] per entry) before any read launches, and
    surviving files row-filter to the band. Fixture ts increases with
    seq and segments are contiguous, so the three epochs' ts ranges are
    disjoint — a band inside epoch 2 must plan ONLY epoch-2 files."""
    ev = fx.make_change_events(900, n_convs=10, turns_per_conv=6)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=3)
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.run_stream(t, segs, segments_per_epoch=1)
    deltas = [m for m in t.manifests() if m.kind == "delta"]
    assert all(
        e.min_ts >= 0 and e.min_ts <= e.max_ts
        for m in deltas
        for e in m.partitions.values()
        if e.path
    )
    e2 = deltas[1]
    lo = min(e.min_ts for e in e2.partitions.values() if e.path)
    hi = max(e.max_ts for e in e2.partitions.values() if e.path)
    plan = ing._changes_plan(t, 0, None, lo, hi)
    assert plan and all(epoch == e2.epoch for _, epoch in plan)
    # correctness: the banded feed == the full feed row-filtered to the band
    banded = ing.changes(t, ts_min_us=lo, ts_max_us=hi)
    import ray

    full = pa.concat_tables(ray.get(ing.changes(t).to_arrow_refs()))
    ts = full.column("ts").cast(pa.int64())
    want = full.filter(
        pc.and_(
            pc.greater_equal(ts, pa.scalar(lo, pa.int64())),
            pc.less_equal(ts, pa.scalar(hi, pa.int64())),
        )
    )
    assert banded.count() == want.num_rows
    # an empty band plans zero files
    assert ing._changes_plan(t, 0, None, hi + 10**9, None) == []


def test_time_travel_schema_as_of(tmp_path):
    """Schema evolution is part of the version history: a snapshot as of
    a pre-evolution epoch carries the OLD envelope (no meta column,
    int32 turn_idx)."""
    ev = fx.make_change_events(400, n_convs=8, turns_per_conv=5)
    n = ev.num_rows
    s1 = fx.write_segments(ev.slice(0, n // 2), str(tmp_path / "w1"), 1)[0]
    s2 = fx.write_segments(
        fx.evolve_events(ev.slice(n // 2)), str(tmp_path / "w2"), 1
    )[0]
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.run_stream(table, [s1, s2], segments_per_epoch=1)
    old = ing.snapshot(table, as_of_epoch=1).schema()
    new = ing.snapshot(table).schema()
    assert "meta" not in old.names and "meta" in new.names
    assert old.types[old.names.index("turn_idx")] == pa.int32()
    assert new.types[new.names.index("turn_idx")] == pa.int64()


def test_asof_ts_snapshot_prunes_newer_files(tmp_path):
    """snapshot(as_of_ts_us=T) must not READ delta files whose
    manifest min_ts is entirely above T (zone-map prune), and still
    return the exact T-state."""
    import numpy as np

    def ev(seq0, n, ts0):
        return pa.table(
            {
                "seq": pa.array(np.arange(seq0, seq0 + n, dtype=np.int64)),
                "op": pa.array(["U"] * n),
                "conv_id": pa.array([f"c{i % 5}" for i in range(n)]),
                "turn_idx": pa.array((np.arange(n) % 3).astype("int32")),
                "text": pa.array([f"s{seq0 + i}" for i in range(n)]),
                "ts": pa.array(
                    ts0 + np.arange(n, dtype=np.int64), pa.timestamp("us")
                ),
            }
        )

    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    s1 = fx.write_segments(ev(0, 60, 1_000), str(tmp_path / "w1"), n_segments=1)
    s2 = fx.write_segments(ev(60, 60, 1_000_000), str(tmp_path / "w2"), n_segments=1)
    ing.ingest_segments(t, s1)
    ing.ingest_segments(t, s2)
    T = 500_000  # between the two epochs
    pruned = t.partition_files_ts_pruned(None, T)
    full = t.partition_files()
    assert sum(len(v) for v in pruned.values()) < sum(len(v) for v in full.values())
    assert all("epoch=000002" not in p for v in pruned.values() for p in v)
    got = (
        ing.snapshot(t, as_of_ts_us=T)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        fx.naive_final_state(None, ev(0, 60, 1_000))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
