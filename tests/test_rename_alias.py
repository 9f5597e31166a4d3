"""Metadata-only column rename (``ingest.rename_column`` default mode):
ZERO data I/O — pre-rename files are read through
``DeltaTable.column_aliases`` at every pruned read path — with time
travel below the rename reading the old name, chained renames
composing, restore reviving the old name, and the next full compact
physically erasing it (round-5 verdict item 5)."""

import glob
import os
import subprocess
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.pipelines import ivm
from xgeo_ray.state.delta_table import DeltaTable


def _df(ds):
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    return (
        df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def _mk(root, merge_policy="lww"):
    os.makedirs(root, exist_ok=True)
    events = fx.make_change_events(
        600, n_convs=8, turns_per_conv=5, dup_fraction=0.0
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    table = DeltaTable.create(
        f"{root}/table", num_partitions=4, num_salts=2,
        merge_policy=merge_policy,
    )
    ing.run_stream(table, segs, segments_per_epoch=1)
    return table


def _file_state(table):
    return {
        p: (os.stat(p).st_mtime_ns, os.stat(p).st_size)
        for p in glob.glob(f"{table.root}/parts/**/*.parquet", recursive=True)
    }


def test_alias_rename_zero_io_and_every_read_path(tmp_path):
    table = _mk(str(tmp_path))
    before = _df(ing.snapshot(table))
    pre_epoch = table.latest_epoch()
    files0 = _file_state(table)

    out = ing.rename_column(table, "tool", "tool_name")
    assert out == {
        "renamed": {"tool": "tool_name"},
        "from_epoch": pre_epoch,
        "mode": "alias",
    }
    # ZERO data I/O: no file rewritten, no new epoch committed
    assert _file_state(table) == files0
    assert table.latest_epoch() == pre_epoch

    # snapshot
    got = _df(ing.snapshot(table))
    assert "tool" not in got.columns and "tool_name" in got.columns
    pd.testing.assert_series_equal(
        got["tool_name"], before["tool"], check_names=False
    )
    # projected snapshot (pruned read must resolve the old spelling)
    proj = _df(
        ing.snapshot(table, columns=["conv_id", "turn_idx", "tool_name"])
    )
    pd.testing.assert_series_equal(
        proj["tool_name"], before["tool"], check_names=False
    )
    # changes feed
    ch = ing.changes(table, since_epoch=0).to_pandas()
    assert "tool_name" in ch.columns and "tool" not in ch.columns
    assert ch["tool_name"].notna().any()
    # lookup / lookup_many / key_history
    cid = before["conv_id"].iloc[0]
    assert "tool_name" in ing.lookup(table, cid).column_names
    lm = ing.lookup_many(table, [cid])
    assert "tool_name" in lm.column_names
    assert lm.column("tool_name").null_count < lm.num_rows
    kh = ing.key_history(table, cid)
    assert "tool_name" in kh.column_names
    # before/after feed (ivm)
    feed = ivm.changes_with_before(table).to_pandas()
    assert "tool_name" in feed.columns and "_before_tool_name" in feed.columns
    # time travel below the rename reads the OLD name
    old = _df(ing.snapshot(table, as_of_epoch=pre_epoch - 1))
    assert "tool" in old.columns and "tool_name" not in old.columns


def test_alias_rename_mixed_files_and_stream_continues(tmp_path):
    """After the rename, new WAL epochs write the NEW physical name;
    reads merge old-physical and new-physical files seamlessly, and
    values still arriving under the old name are discarded."""
    table = _mk(str(tmp_path))
    ing.rename_column(table, "tool", "tool_name")
    ev2 = fx.make_change_events_shard(
        600, 300, n_convs=8, turns_per_conv=5, dup_fraction=0.0
    )
    ev2 = ev2.rename_columns(
        [("tool_name" if c == "tool" else c) for c in ev2.column_names]
    )
    segs2 = fx.write_segments(ev2, f"{tmp_path}/wal2", n_segments=1)
    ing.run_stream(table, segs2, segments_per_epoch=1)
    got = _df(ing.snapshot(table))
    assert "tool_name" in got.columns and "tool" not in got.columns
    assert got["tool_name"].notna().any()
    # the new epoch's file carries the new physical name
    newest = max(
        (p for ps in table.partition_files().values() for p in ps),
        key=os.path.getmtime,
    )
    assert "tool_name" in pq.read_schema(newest).names

    # a straggler still producing the OLD name: values discarded
    ev3 = fx.make_change_events_shard(
        1200, 100, n_convs=8, turns_per_conv=5, dup_fraction=0.0
    )
    segs3 = fx.write_segments(ev3, f"{tmp_path}/wal3", n_segments=1)
    ing.run_stream(table, segs3, segments_per_epoch=1)
    got3 = _df(ing.snapshot(table))
    assert "tool" not in got3.columns
    # keys updated by the straggler lost their tool_name (discarded)
    ev3df = ev3.to_pandas()
    k = ev3df[ev3df["op"] != "D"].iloc[0]
    row = got3[
        (got3["conv_id"] == k["conv_id"]) & (got3["turn_idx"] == k["turn_idx"])
    ]
    if len(row):  # unless a tombstone removed the key entirely
        assert row["tool_name"].isna().all()


def test_alias_rename_chain_compact_erases_and_restore_revives(tmp_path):
    table = _mk(str(tmp_path))
    before = _df(ing.snapshot(table))
    pre_epoch = table.latest_epoch()
    ing.rename_column(table, "tool", "tool_name")
    ing.rename_column(table, "tool_name", "tool_id")
    got = _df(ing.snapshot(table))
    pd.testing.assert_series_equal(
        got["tool_id"], before["tool"], check_names=False
    )
    # full compact physically erases the retired spellings
    ing.compact(table)
    for paths in table.partition_files().values():
        for p in paths:
            names = pq.read_schema(p).names
            assert "tool" not in names and "tool_name" not in names
            assert "tool_id" in names
    pd.testing.assert_series_equal(
        _df(ing.snapshot(table))["tool_id"], before["tool"], check_names=False
    )

    # a second table: restore below the rename revives the old name
    t2 = _mk(str(tmp_path / "r"))
    e2 = t2.latest_epoch()
    ing.rename_column(t2, "tool", "tool_name")
    assert "tool_name" in t2.current_schema().names
    ing.restore(t2, e2 - 1)
    env = t2.current_schema()
    assert "tool" in env.names and "tool_name" not in env.names
    assert t2.column_aliases() == {}
    assert "tool" in _df(ing.snapshot(t2)).columns


def test_alias_rename_validations_and_any_policy(tmp_path):
    table = _mk(str(tmp_path))
    ing.rename_column(table, "tool", "tool_name")
    # idempotent replay
    out = ing.rename_column(table, "tool", "tool_name")
    assert out["mode"] == "alias"
    # retired name cannot be a rename target (file ambiguity)
    with pytest.raises(ValueError, match="retired"):
        ing.rename_column(table, "text", "tool")
    # alias mode works on non-lww tables (no rewrite images involved)
    add = DeltaTable.create(
        f"{tmp_path}/add", num_partitions=2, num_salts=1,
        merge_policy="additive",
    )
    ev = fx.make_change_events(
        200, n_convs=4, turns_per_conv=3, dup_fraction=0.0
    )
    segs = fx.write_segments(ev, f"{tmp_path}/addwal", n_segments=1)
    ing.run_stream(add, segs, segments_per_epoch=1)
    before = _df(ing.snapshot(add))
    assert ing.rename_column(add, "tool", "tool_name")["mode"] == "alias"
    pd.testing.assert_series_equal(
        _df(ing.snapshot(add))["tool_name"], before["tool"],
        check_names=False,
    )


def test_alias_rename_join_view_and_export(tmp_path):
    """Join views and exports read both sides through the alias."""
    from xgeo_ray.pipelines import join_view as jv

    left = _mk(str(tmp_path / "L"))
    right = DeltaTable.create(
        f"{tmp_path}/R/table", num_partitions=4, num_salts=2
    )
    ev = fx.make_change_events(
        600, n_convs=8, turns_per_conv=5, dup_fraction=0.0, seed=99
    )
    segs = fx.write_segments(ev, f"{tmp_path}/R/wal", n_segments=1)
    ing.run_stream(right, segs, segments_per_epoch=1)
    ing.rename_column(left, "tool", "tool_name")
    j = jv.join_snapshot(
        left, right, columns_left=["tool_name"], columns_right=["role"]
    ).to_pandas()
    assert "tool_name" in j.columns and j["tool_name"].notna().any()
    # export_snapshot writes files under the LOGICAL name
    out = f"{tmp_path}/exp"
    ing.export_snapshot(left, out)
    f = sorted(glob.glob(f"{out}/part-*.parquet"))[0]
    assert "tool_name" in pq.read_schema(f).names


def test_alias_rename_cli_and_rewrite_flag(tmp_path):
    table = _mk(str(tmp_path))
    files0 = _file_state(table)
    r = subprocess.run(
        [
            sys.executable, "-m", "xgeo_ray", "rename-column",
            table.root, "tool", "tool_name",
        ],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    import json

    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["mode"] == "alias"
    assert _file_state(table) == files0  # CLI default is zero-I/O too
    # --rewrite goes through the full-image path (new epoch committed)
    e0 = table.latest_epoch()
    r = subprocess.run(
        [
            sys.executable, "-m", "xgeo_ray", "rename-column",
            table.root, "text", "body", "--rewrite",
        ],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    t2 = DeltaTable.open(table.root)
    assert t2.latest_epoch() > e0
    assert "body" in t2.current_schema().names
