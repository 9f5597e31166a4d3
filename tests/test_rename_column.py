"""Column rename (``ingest.rename_column``): the rewrite=True path
(full-image rewrite + metadata drop of the old name, exactly-once) plus
the shared contracts (old-name discard after rename, compact erasure,
CLI) — the default metadata-alias path has its own suite in
test_rename_alias.py. test_rename_then_stream_and_compact and the CLI
test deliberately run the DEFAULT (alias) mode."""

import json
import subprocess
import sys

import pandas as pd
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


def _mk(root, merge_policy="lww"):
    import os

    os.makedirs(root, exist_ok=True)
    base = fx.make_transcripts(8, 5)
    pq.write_table(base, f"{root}/base.parquet")
    events = fx.make_change_events(
        500, n_convs=8, turns_per_conv=5, dup_fraction=0.0
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    table = DeltaTable.create(
        f"{root}/table", num_partitions=4, num_salts=2,
        merge_policy=merge_policy,
    )
    if merge_policy == "lww":
        ing.bootstrap_base(table, f"{root}/base.parquet")
        ing.run_stream(table, segs, segments_per_epoch=1)
    return table


def test_rename_basic_and_time_travel(tmp_path):
    table = _mk(str(tmp_path))
    before = _df(ing.snapshot(table))
    pre_epoch = table.latest_epoch()

    out = ing.rename_column(table, "text", "body", rewrite=True)
    assert out["renamed"] == {"text": "body"}

    got = _df(ing.snapshot(table))
    assert "text" not in got.columns and "body" in got.columns
    want = before.rename(columns={"text": "body"})
    # schema evolution appends the new name at the end of the envelope
    pd.testing.assert_frame_equal(
        got.drop(columns=["ts"]),
        want.drop(columns=["ts"])[got.drop(columns=["ts"]).columns],
    )
    # every image was stamped at/after the rewrite: nothing lost the race
    assert (got["ts"] > before["ts"]).all()

    # time travel below the rename still reads the OLD name
    old = _df(ing.snapshot(table, as_of_epoch=pre_epoch))
    assert "text" in old.columns and "body" not in old.columns
    pd.testing.assert_frame_equal(old, before)


def test_rename_exactly_once_and_crash_resume(tmp_path):
    table = _mk(str(tmp_path))
    ing.rename_column(table, "text", "body", rewrite=True)
    epoch = table.latest_epoch()
    # replay: the rewrite batch is committed -> no new epoch, drop stays
    out = ing.rename_column(table, "text", "body", rewrite=True)
    assert table.latest_epoch() == epoch
    assert out["renamed"] == {"text": "body"}
    assert "body" in ing.snapshot(table).schema().names


def test_rename_future_ts_rows_still_win(tmp_path):
    table = _mk(str(tmp_path))
    before = _df(ing.snapshot(table))
    future = int(before["ts"].max().value // 1000) + 10_000_000
    # stamp the rewrite BELOW some rows' event time: the per-row
    # max(now, ts+1) bump must still beat every current version
    ing.rename_column(
        table, "text", "body", ts_us=future - 60_000_000, rewrite=True
    )
    got = _df(ing.snapshot(table))
    assert got["body"].equals(before["text"].rename("body"))


def test_rename_validations(tmp_path):
    table = _mk(str(tmp_path))
    with pytest.raises(ValueError, match="key/envelope"):
        ing.rename_column(table, "conv_id", "cid")
    with pytest.raises(ValueError, match="not in the table schema"):
        ing.rename_column(table, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        ing.rename_column(table, "text", "role")
    with pytest.raises(ValueError, match="not an identifier"):
        ing.rename_column(table, "text", "bad name")
    ing.drop_columns(table, ["tool"])
    with pytest.raises(ValueError, match="previously dropped"):
        ing.rename_column(table, "text", "tool")
    add = _mk(str(tmp_path / "a"), merge_policy="additive")
    with pytest.raises(ValueError, match="lww"):
        ing.rename_column(add, "text", "body", rewrite=True)


def test_rename_then_stream_and_compact(tmp_path):
    """New WAL events after the rename: values under the OLD name are
    discarded (dropped-column contract); full compact physically erases
    the old column from rewritten files."""
    table = _mk(str(tmp_path))
    ing.rename_column(table, "text", "body")
    events = fx.make_change_events_shard(
        500, 200, n_convs=8, turns_per_conv=5, dup_fraction=0.0
    )
    segs = fx.write_segments(events, f"{tmp_path}/wal2", n_segments=1)
    ing.run_stream(table, segs, segments_per_epoch=1)
    got = _df(ing.snapshot(table))
    assert "text" not in got.columns and "body" in got.columns
    ing.compact(table)
    for paths in table.partition_files().values():
        for p in paths:
            assert "text" not in pq.read_schema(p).names
    assert "body" in _df(ing.snapshot(table)).columns


def test_rename_cli(tmp_path):
    table = _mk(str(tmp_path))
    r = subprocess.run(
        [
            sys.executable, "-m", "xgeo_ray", "rename-column",
            table.root, "text", "body",
        ],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout.strip().splitlines()[-1])["renamed"] == {
        "text": "body"
    }
    assert "body" in DeltaTable.open(table.root).current_schema().names
