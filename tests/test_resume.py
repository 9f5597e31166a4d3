"""Exactly-once properties: crash before commit, resume, double-apply
(FIXTURES.md §7)."""

import os
import subprocess
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable

N_CONVS, TURNS, N_EVENTS = 10, 6, 900


def _setup(root):
    base = fx.make_transcripts(N_CONVS, TURNS)
    pq.write_table(base, f"{root}/base.parquet")
    ev = fx.make_change_events(N_EVENTS, n_convs=N_CONVS, turns_per_conv=TURNS, dup_fraction=0.03)
    segs = fx.write_segments(ev, f"{root}/wal", n_segments=6)
    return base, ev, segs


def _final(table):
    return (
        ing.snapshot(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_crash_before_commit_is_invisible_then_resume(tmp_path, monkeypatch):
    root = str(tmp_path)
    base, ev, segs = _setup(root)
    table = DeltaTable.create(f"{root}/t", num_partitions=8, num_salts=2)
    ing.bootstrap_base(table, f"{root}/base.parquet")
    ing.run_stream(table, segs[:2], segments_per_epoch=2)
    committed_before = _final(table)

    # crash: delta files get written, manifest does not
    monkeypatch.setattr(
        DeltaTable, "commit_epoch", lambda *a, **k: (_ for _ in ()).throw(OSError("crash"))
    )
    with pytest.raises(OSError):
        ing.ingest_segments(table, segs[2:4])
    monkeypatch.undo()

    # orphan delta files exist on disk but are fenced out of every read
    orphans = [
        p for k in range(8)
        for p in [f"{root}/t/parts/part={k:05d}"]
        if os.path.isdir(p) and any("epoch=000003" in f for f in os.listdir(p))
    ]
    assert orphans, "crash should have left orphan epoch files"
    pd.testing.assert_frame_equal(_final(table), committed_before)

    # resume processes the remaining segments and reaches oracle parity
    ing.run_stream(table, segs, segments_per_epoch=2)
    want = fx.naive_final_state(base, ev).to_pandas()
    got = _final(table)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_interrupted_equals_uninterrupted(tmp_path):
    root = str(tmp_path)
    base, ev, segs = _setup(root)
    # uninterrupted run
    t1 = DeltaTable.create(f"{root}/t1", num_partitions=8, num_salts=2)
    ing.bootstrap_base(t1, f"{root}/base.parquet")
    ing.run_stream(t1, segs, segments_per_epoch=3)
    # interrupted run: stop after the first epoch, then resume
    t2 = DeltaTable.create(f"{root}/t2", num_partitions=8, num_salts=2)
    ing.bootstrap_base(t2, f"{root}/base.parquet")
    ing.run_stream(t2, segs[:3], segments_per_epoch=3)
    ing.run_stream(t2, segs, segments_per_epoch=3)
    pd.testing.assert_frame_equal(_final(t1), _final(t2))


def test_sigkill_subprocess_resume(tmp_path):
    """Real process death via os._exit between delta write and manifest
    commit (XGEO_CRASH_BEFORE_COMMIT hook), then resume in this process."""
    root = str(tmp_path)
    base, ev, segs = _setup(root)
    table = DeltaTable.create(f"{root}/t", num_partitions=8, num_salts=2)
    ing.bootstrap_base(table, f"{root}/base.parquet")

    script = f"""
import ray, sys, os
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable
t = DeltaTable.open({f"{root}/t"!r})
os.environ["XGEO_CRASH_BEFORE_COMMIT"] = "1"
ing.run_stream(t, {segs!r}, segments_per_epoch=2)
"""
    env = {k: v for k, v in os.environ.items() if not k.startswith("RAY_ADDRESS")}
    r = subprocess.run([sys.executable, "-c", script], env=env, capture_output=True, timeout=240)
    assert r.returncode == 137, r.stderr.decode()[-2000:]
    assert table.latest_epoch() == 1  # only bootstrap committed

    ing.run_stream(table, segs, segments_per_epoch=2)
    want = fx.naive_final_state(base, ev).to_pandas()
    got = _final(table)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_tail_follows_live_wal(tmp_path):
    """Segments appearing WHILE the tailer polls are picked up in order;
    final state matches the oracle; a restarted tail is a no-op."""
    import threading
    import time

    import pandas as pd
    import pyarrow.parquet as pq

    from xgeo_ray import fixtures as fx
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    root = str(tmp_path)
    wal = f"{root}/wal"
    import os

    os.makedirs(wal)
    ev = fx.make_change_events(600, n_convs=8, turns_per_conv=5, dup_fraction=0.02)
    n = ev.num_rows
    bounds = [round(i * n / 4) for i in range(5)]

    def writer():
        for k in range(4):
            seg = ev.slice(bounds[k], bounds[k + 1] - bounds[k])
            tmp = f"{wal}/.tmp-{k}"
            pq.write_table(seg, tmp)
            os.replace(tmp, f"{wal}/segment-{k:05d}.parquet")  # atomic land
            time.sleep(0.3)

    table = DeltaTable.create(f"{root}/t", num_partitions=4, num_salts=2)
    w = threading.Thread(target=writer)
    w.start()
    ms = ing.tail(
        table,
        wal,
        poll_interval_s=0.1,
        segments_per_epoch=2,
        idle_polls_to_stop=15,
        stable_for_s=0.05,
    )
    w.join()
    assert sum(m.totals.get("events_read", 0) for m in ms) == n

    got = (
        ing.snapshot(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = fx.naive_final_state(None, ev).to_pandas()
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]],
        want[["conv_id", "turn_idx", "text"]].reset_index(drop=True),
    )
    # restart: everything committed, nothing to do
    ms2 = ing.tail(table, wal, poll_interval_s=0.05, idle_polls_to_stop=2)
    assert ms2 == []


def test_tail_with_inline_maintenance(tmp_path):
    """tail(compact_every_epochs=2, vacuum_after_compact=True): the
    drain interleaves compactions, reclaims superseded deltas, and the
    final state still matches the oracle."""
    events = fx.make_change_events(400, n_convs=8, turns_per_conv=5)
    wal = tmp_path / "wal"
    fx.write_segments(events, str(wal), n_segments=4)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ms = ing.tail(
        table, str(wal), poll_interval_s=0.05, segments_per_epoch=1,
        idle_polls_to_stop=2, stable_for_s=0.0,
        compact_every_epochs=2, vacuum_after_compact=True,
    )
    kinds = [m.kind for m in ms]
    # all segments are present at the first poll, so one drain (4 delta
    # epochs) triggers one maintenance pass
    assert kinds.count("compact") >= 1
    # all partitions folded to a single visible file, old deltas reclaimed
    files = table.partition_files()
    assert all(len(v) == 1 for v in files.values())
    import glob

    on_disk = glob.glob(os.path.join(table.root, "parts", "*", "*epoch=*.parquet"))
    assert set(on_disk) == {p for v in files.values() for p in v}
    want = fx.naive_final_state(None, events)
    got = (
        ing.snapshot(table).to_pandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == want.column("text").to_pylist()


def test_long_stream_many_epochs(tmp_path):
    """50 single-segment epochs through one pipelined run_stream call:
    commit ordering, watermark accumulation and the manifest parse cache
    all hold on a long stream; final state matches the oracle."""
    events = fx.make_change_events(5000, n_convs=20, turns_per_conv=8,
                                   dup_fraction=0.02)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=50)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=8, num_salts=2,
                              durability="commit")
    ms = ing.run_stream(table, segs, segments_per_epoch=1)
    assert [m.epoch for m in ms] == list(range(1, 51))
    assert len(table.manifests()) == 50  # fills the parse cache
    assert len(table._manifest_cache) == 50
    want = fx.naive_final_state(None, events)
    got = (
        ing.snapshot(table).to_pandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == want.column("text").to_pylist()
    # per-epoch streaming metrics present and sane
    assert all(m.totals["epoch_wall_ms"] >= 0 for m in ms)
    assert all(
        a.totals["commit_unix_us"] <= b.totals["commit_unix_us"]
        for a, b in zip(ms, ms[1:])
    )
