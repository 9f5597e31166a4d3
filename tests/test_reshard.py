"""Partitioning evolution (``ingest.reshard``): migrate a table to a new
partition/salt count with state, tombstones, watermarks and WAL-resume
continuity all carried over."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _df(ds):
    return (
        ds.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _mk(root, **create_kw):
    base = fx.make_transcripts(10, 6)
    pq.write_table(base, f"{root}/base.parquet")
    events = fx.make_change_events(
        900, n_convs=10, turns_per_conv=6, dup_fraction=0.02
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=3)
    table = DeltaTable.create(
        f"{root}/t", num_partitions=4, num_salts=2, **create_kw
    )
    ing.bootstrap_base(table, f"{root}/base.parquet")
    ing.run_stream(table, segs, segments_per_epoch=1)
    return table, base, events, segs


def test_reshard_preserves_state_and_wal_continuity(tmp_path):
    root = str(tmp_path)
    table, base, events, segs = _mk(root)
    before = _df(ing.snapshot(table))

    new = ing.reshard(table, f"{root}/t16", num_partitions=16, num_salts=1)
    assert new.num_partitions == 16 and new.num_salts == 1
    pd.testing.assert_frame_equal(_df(ing.snapshot(new)), before)
    assert ing.fsck(new)["ok"], ing.fsck(new)["issues"]

    # WAL continuity: replaying the SAME segments is a no-op...
    ep = new.latest_epoch()
    ing.run_stream(new, segs, segments_per_epoch=1)
    assert new.latest_epoch() == ep
    # ...and a genuine continuation applies identically on both tables
    cont = fx.make_change_events(
        300, n_convs=10, turns_per_conv=6, dup_fraction=0.0, seed=55
    )
    cont = cont.set_column(
        cont.schema.get_field_index("seq"),
        "seq",
        pc.add(cont.column("seq"), pa.scalar(events.num_rows, pa.int64())),
    )
    (seg2,) = fx.write_segments(cont, f"{root}/wal2", n_segments=1)
    ing.ingest_segments(table, [seg2])
    ing.ingest_segments(new, [seg2])
    pd.testing.assert_frame_equal(_df(ing.snapshot(new)), _df(ing.snapshot(table)))


def test_reshard_keeps_tombstones(tmp_path):
    root = str(tmp_path)
    table, base, events, segs = _mk(root)
    snap = _df(ing.snapshot(table))
    victim = snap["conv_id"].iloc[0]
    victim_turn = int(snap["turn_idx"].iloc[0])
    ing.delete_where(
        table, lambda t: pc.equal(t.column("conv_id"), victim), batch_id="d1"
    )
    new = ing.reshard(table, f"{root}/t8", num_partitions=8)
    got = _df(ing.snapshot(new))
    assert victim not in set(got["conv_id"])
    # a LATE event (older ts than the tombstone) must NOT resurrect the key
    late = pa.table(
        {
            "seq": pa.array([events.num_rows + 1], pa.int64()),
            "op": ["U"],
            "conv_id": [victim],
            "turn_idx": pa.array([victim_turn], pa.int64()),
            "role": ["user"],
            "text": ["zombie"],
            "tool": [""],
            "ts": pa.array(
                [pd.Timestamp("2024-01-01").value // 1000], pa.timestamp("us")
            ),
        }
    )
    (seg,) = fx.write_segments(late, f"{root}/wal3", n_segments=1)
    ing.ingest_segments(new, [seg])
    after = _df(ing.snapshot(new))
    assert victim not in set(after["conv_id"])


def test_reshard_down_and_policies_carry(tmp_path):
    root = str(tmp_path)
    table, base, events, segs = _mk(root, merge_policy="lww", durability="commit")
    before = _df(ing.snapshot(table))
    new = ing.reshard(table, f"{root}/t2", num_partitions=2, num_salts=4)
    assert (new.merge_policy, new.durability) == ("lww", "commit")
    pd.testing.assert_frame_equal(_df(ing.snapshot(new)), before)
    # target must be fresh
    with pytest.raises(ValueError, match="already exists"):
        ing.reshard(table, f"{root}/t2", num_partitions=2)


def test_reshard_guards_event_time_travel_on_collapsed_tables(tmp_path):
    """A reshard of a collapsed-history table folds superseded versions
    exactly like a compaction — event-time travel INTO the pre-reshard
    range must fail fast on the new table, not silently return folded
    state."""
    root = str(tmp_path)
    table, base, events, segs = _mk(root)
    t_mid = int(
        pq.read_table(f"{root}/wal/segment-00001.parquet", columns=["ts"])
        .column("ts")
        .cast(pa.int64())[0]
        .as_py()
    )
    _ = ing.snapshot(table, as_of_ts_us=t_mid)  # old table: fine
    new = ing.reshard(table, f"{root}/tg", num_partitions=8)
    with pytest.raises(ValueError, match="folded"):
        ing.snapshot(new, as_of_ts_us=t_mid)


def test_reshard_full_history_table_preserves_versions(tmp_path):
    root = str(tmp_path)
    table, base, events, segs = _mk(root, history="full")
    t_mid = int(
        pq.read_table(f"{root}/wal/segment-00001.parquet", columns=["ts"])
        .column("ts")
        .cast(pa.int64())[0]
        .as_py()
    )
    before_asof = _df(ing.snapshot(table, as_of_ts_us=t_mid))
    new = ing.reshard(table, f"{root}/th", num_partitions=8)
    assert new.history == "full"
    pd.testing.assert_frame_equal(
        _df(ing.snapshot(new, as_of_ts_us=t_mid)), before_asof
    )
    pd.testing.assert_frame_equal(_df(ing.snapshot(new)), _df(ing.snapshot(table)))


def test_crashed_reshard_leaves_old_table_intact(tmp_path):
    """A reshard that dies before its cutover commit must leave the OLD
    table fully usable and the half-finished target removable; a rerun
    after cleanup succeeds."""
    import os
    import subprocess
    import sys

    root = str(tmp_path)
    table, base, events, segs = _mk(root)
    before = _df(ing.snapshot(table))
    code = (
        "import ray, os\n"
        "ray.init(address='local', num_cpus=4, include_dashboard=False, logging_level='ERROR')\n"
        "from ray.data import DataContext\n"
        "DataContext.get_current().enable_progress_bars = False\n"
        "from xgeo_ray.pipelines import ingest as ing\n"
        "from xgeo_ray.state.delta_table import DeltaTable\n"
        f"t = DeltaTable.open({root!r} + '/t')\n"
        "os.environ['XGEO_CRASH_BEFORE_COMMIT'] = '1'\n"
        f"ing.reshard(t, {root!r} + '/tn', num_partitions=8)\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], cwd="/root/repo",
        capture_output=True, text=True,
    )
    assert r.returncode == 137, (r.returncode, r.stderr[-1000:])
    # old table untouched; target has no committed manifest
    pd.testing.assert_frame_equal(_df(ing.snapshot(table)), before)
    assert ing.fsck(table)["ok"]
    assert not os.path.isdir(f"{root}/tn/manifests") or not os.listdir(
        f"{root}/tn/manifests"
    )
    # documented recovery: remove the half-finished target, rerun
    import shutil

    shutil.rmtree(f"{root}/tn", ignore_errors=True)
    shutil.rmtree(f"{root}/tn.reshard-tmp", ignore_errors=True)
    new = ing.reshard(table, f"{root}/tn", num_partitions=8)
    pd.testing.assert_frame_equal(_df(ing.snapshot(new)), before)
