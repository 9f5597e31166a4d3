"""Incremental materialized aggregate views: correctness vs recompute,
partition-level incrementality, and crash-retry idempotence."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.pipelines.views import read_view, refresh_view
from xgeo_ray.state.delta_table import DeltaTable


def _make_agg():
    """Per-conv turn count + latest ts (a partial aggregate: conv spans
    at most num_salts partitions, combined on read). Returned as a
    closure so cloudpickle ships it BY VALUE — a module-level function
    in a test module isn't importable inside Ray workers."""

    def agg(t: pa.Table) -> pa.Table:
        return t.group_by(["conv_id"]).aggregate(
            [("turn_idx", "count"), ("ts", "max")]
        )

    return agg





def _combined(view_dir: str) -> pd.DataFrame:
    df = read_view(view_dir).to_pandas()
    out = (
        df.groupby("conv_id")
        .agg(n_turns=("turn_idx_count", "sum"), max_ts=("ts_max", "max"))
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    return out


def _expected(table) -> pd.DataFrame:
    snap = ing.snapshot(table).to_pandas()
    return (
        snap.groupby("conv_id")
        .agg(n_turns=("turn_idx", "count"), max_ts=("ts", "max"))
        .reset_index()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def test_incremental_view_refresh(tmp_path):
    events = fx.make_change_events(800, n_convs=16, turns_per_conv=6)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=4)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=8, num_salts=2)
    view = str(tmp_path / "view")

    ing.run_stream(table, segs[:2], segments_per_epoch=1)
    s1 = refresh_view(table, view, _make_agg(), columns=["conv_id", "turn_idx", "ts"])
    assert s1["refreshed"] > 0 and s1["skipped"] == 0
    pd.testing.assert_frame_equal(_combined(view), _expected(table))

    # no new epochs -> all partitions fresh, nothing recomputed
    s2 = refresh_view(table, view, _make_agg())
    assert s2["refreshed"] == 0 and s2["skipped"] == s1["refreshed"]

    # a small continuation touches SOME partitions; only those refresh
    wm = int(table.watermarks().max())
    import numpy as np

    ev2 = fx.make_change_events(10, n_convs=1, turns_per_conv=2, seed=77)
    ev2 = ev2.set_column(
        0, "seq", pa.array((ev2.column("seq").to_numpy() + wm + 1).astype(np.int64))
    )
    fx.write_segments(ev2, str(tmp_path / "wal2"), n_segments=1)
    ing.run_stream(
        table, [str(tmp_path / "wal2" / "segment-00000.parquet")]
    )
    s3 = refresh_view(table, view, _make_agg())
    assert 0 < s3["refreshed"] < s1["refreshed"]  # strictly incremental
    pd.testing.assert_frame_equal(_combined(view), _expected(table))

    # compaction changes the visible file set -> partitions refresh again,
    # results unchanged
    ing.compact(table)
    s4 = refresh_view(table, view, _make_agg())
    assert s4["refreshed"] > 0
    pd.testing.assert_frame_equal(_combined(view), _expected(table))


def test_view_refresh_crash_retry(tmp_path, monkeypatch):
    """A refresh that dies before committing its manifest re-runs the
    stale partitions on retry and converges to the same view."""
    events = fx.make_change_events(300, n_convs=8, turns_per_conv=4)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=1)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.run_stream(table, segs)
    view = str(tmp_path / "view")

    import xgeo_ray.pipelines.views as V

    real = V._write_view_state

    def boom(*a, **k):
        raise RuntimeError("crash before view manifest")

    monkeypatch.setattr(V, "_write_view_state", boom)
    try:
        import pytest

        with pytest.raises(RuntimeError):
            refresh_view(table, view, _make_agg())
    finally:
        monkeypatch.setattr(V, "_write_view_state", real)
    # retry refreshes everything again (manifest was never committed)
    s = refresh_view(table, view, _make_agg())
    assert s["refreshed"] > 0
    pd.testing.assert_frame_equal(_combined(view), _expected(table))


def test_view_on_additive_table(tmp_path):
    """Views honor the table's merge policy: an additive table's view
    aggregates the ACCUMULATED state."""
    import numpy as np

    from tests.test_merge_policy import _additive_oracle, _events_table, _ev

    rng = np.random.default_rng(5)
    rows = [
        _ev(seq, "I", f"c{rng.integers(0, 6)}", int(rng.integers(0, 3)),
            1000 * seq, int(rng.integers(1, 9)))
        for seq in range(200)
    ]
    events = _events_table(rows)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=2)
    table = DeltaTable.create(
        str(tmp_path / "t"), num_partitions=4, num_salts=1, merge_policy="additive"
    )
    ing.run_stream(table, segs, segments_per_epoch=1)

    def make_agg():
        def agg(t: pa.Table) -> pa.Table:
            return t.group_by(["conv_id"]).aggregate([("amount", "sum")])
        return agg

    view = str(tmp_path / "view")
    refresh_view(table, view, make_agg())
    got = (
        read_view(view).to_pandas().groupby("conv_id")["amount_sum"].sum()
        .reset_index().sort_values("conv_id").reset_index(drop=True)
    )
    want = (
        _additive_oracle(events).groupby("conv_id")["amount"].sum()
        .reset_index().sort_values("conv_id").reset_index(drop=True)
        .rename(columns={"amount": "amount_sum"})
    )
    import pandas as _pd

    _pd.testing.assert_frame_equal(got.astype({"amount_sum": "int64"}),
                                   want.astype({"amount_sum": "int64"}))


def _make_additive_agg():
    def agg(t: pa.Table) -> pa.Table:
        return t.group_by(["conv_id"]).aggregate([("amount", "sum")])

    return agg


def _make_sum_combine():
    def combine(cached: pa.Table, delta: pa.Table) -> pa.Table:
        t = pa.concat_tables([cached, delta], promote_options="permissive")
        out = t.group_by(["conv_id"]).aggregate([("amount_sum", "sum")])
        return out.rename_columns(
            [n.replace("amount_sum_sum", "amount_sum") for n in out.column_names]
        )

    return combine


def _additive_view_combined(view_dir: str) -> pd.DataFrame:
    return (
        read_view(view_dir).to_pandas().groupby("conv_id")["amount_sum"].sum()
        .reset_index().sort_values("conv_id").reset_index(drop=True)
        .astype({"amount_sum": "int64"})
    )


def test_delta_aware_refresh_reads_only_deltas(tmp_path, monkeypatch):
    """On an additive table, a refresh after new tombstone-free epochs
    takes the delta path for EVERY stale partition (the full-merge task
    is poisoned to prove it) and matches the full recompute."""
    import numpy as np

    from tests.test_merge_policy import _additive_oracle, _events_table, _ev

    rng = np.random.default_rng(11)
    rows = [
        _ev(seq, "I", f"c{rng.integers(0, 8)}", int(rng.integers(0, 3)),
            1000 * seq, int(rng.integers(1, 9)))
        for seq in range(300)
    ]
    events = _events_table(rows)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=2)
    table = DeltaTable.create(
        str(tmp_path / "t"), num_partitions=4, num_salts=1, merge_policy="additive"
    )
    ing.run_stream(table, segs[:1])
    view = str(tmp_path / "view")
    s1 = refresh_view(
        table, view, _make_additive_agg(), delta_combine=_make_sum_combine()
    )
    assert s1["delta"] == 0 and s1["refreshed"] > 0  # first refresh: full

    ing.run_stream(table, segs[1:])

    import xgeo_ray.pipelines.views as V

    class _Boom:
        @staticmethod
        def remote(*a, **k):
            raise AssertionError("full-merge path used where delta path expected")

    monkeypatch.setattr(V, "_refresh_part", _Boom)
    s2 = refresh_view(
        table, view, _make_additive_agg(), delta_combine=_make_sum_combine()
    )
    assert s2["refreshed"] > 0 and s2["delta"] == s2["refreshed"]

    want = (
        _additive_oracle(events).groupby("conv_id")["amount"].sum()
        .reset_index().sort_values("conv_id").reset_index(drop=True)
        .rename(columns={"amount": "amount_sum"}).astype({"amount_sum": "int64"})
    )
    pd.testing.assert_frame_equal(_additive_view_combined(view), want)


def test_delta_files_since_guards(tmp_path):
    """The delta shortcut refuses partitions whose new epochs carry
    tombstones or a compaction — decided from manifest metadata only."""
    from tests.test_merge_policy import _events_table, _ev
    from xgeo_ray.pipelines.views import _delta_files_since

    events = _events_table(
        [_ev(s, "I", f"c{s % 4}", 0, 1000 * s, 1) for s in range(1, 40)]
        + [_ev(40, "D", "c0", 0, 41000, 0)]
    )
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=2)
    table = DeltaTable.create(
        str(tmp_path / "t"), num_partitions=2, num_salts=1, merge_policy="additive"
    )
    ing.run_stream(table, segs, segments_per_epoch=1)
    ms = table.manifests()
    tomb = [
        (m.epoch, int(k))
        for m in ms
        for k, e in m.partitions.items()
        if e.tombstones
    ]
    assert tomb, "fixture must produce a tombstone epoch"
    epoch, part = tomb[-1]
    assert _delta_files_since(table, part, epoch - 1) is None
    clean = [
        (m.epoch, int(k))
        for m in ms
        for k, e in m.partitions.items()
        if not e.tombstones and e.path
    ]
    e2, p2 = clean[-1]
    got = _delta_files_since(table, p2, e2 - 1)
    assert got and all(os.path.isfile(p) for p in got)
    ing.compact(table)
    assert _delta_files_since(table, p2, e2 - 1) is None  # compaction voids it


def test_view_drops_vanished_partitions(tmp_path, monkeypatch):
    """A partition that leaves the table's visible set is removed from
    the view manifest and its partial file is reclaimed (round-2
    ADVICE: stale partials must not keep serving)."""
    events = fx.make_change_events(300, n_convs=8, turns_per_conv=4)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=1)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.run_stream(table, segs)
    view = str(tmp_path / "view")
    refresh_view(table, view, _make_agg())
    before = read_view(view).to_pandas()
    full_plan = table.partition_files()
    assert len(full_plan) > 1
    dropped_part = sorted(full_plan)[0]
    pruned = {k: v for k, v in full_plan.items() if k != dropped_part}
    monkeypatch.setattr(table, "partition_files", lambda: pruned)
    s = refresh_view(table, view, _make_agg())
    assert s["dropped"] == 1
    files = [n for n in os.listdir(str(tmp_path / "view")) if n.endswith(".parquet")]
    assert not any(n.startswith(f"part-{dropped_part:05d}-") for n in files)
    after = read_view(view).to_pandas()
    assert len(after) < len(before)


def test_legacy_unversioned_view_dir_migrates(tmp_path):
    """A view dir written before epoch-versioned partial names (files
    named part-NNNNN.parquet) must stay readable, keep its fresh
    partitions' files through a refresh sweep, and migrate to versioned
    names as partitions go stale."""
    import glob
    import re

    events = fx.make_change_events(800, n_convs=16, turns_per_conv=6)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=4)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=8, num_salts=2)
    view = str(tmp_path / "view")
    ing.run_stream(table, segs[:2], segments_per_epoch=1)
    refresh_view(table, view, _make_agg())
    want = _combined(view)

    # simulate the pre-upgrade layout: strip the -eEEEEEE suffix
    for p in glob.glob(os.path.join(view, "part-*.parquet")):
        os.rename(p, re.sub(r"-e\d{6}\.parquet$", ".parquet", p))

    pd.testing.assert_frame_equal(_combined(view), want)  # read_view works

    # all partitions fresh: the sweep must NOT delete the legacy files
    s = refresh_view(table, view, _make_agg())
    assert s["refreshed"] == 0
    pd.testing.assert_frame_equal(_combined(view), want)

    # new epochs stale some partitions -> they rewrite versioned, rest
    # stay legacy, combined result tracks the table
    ing.run_stream(table, segs, segments_per_epoch=1)
    s2 = refresh_view(table, view, _make_agg())
    assert s2["refreshed"] > 0
    pd.testing.assert_frame_equal(_combined(view), _expected(table))
