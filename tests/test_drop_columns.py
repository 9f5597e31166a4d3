"""Column drops (ingest.drop_columns) — the column-level
right-to-be-forgotten: metadata-only hide now, no resurrection through
schema evolution, time-travel fidelity below the drop epoch, revival on
restore, physical erasure at the next full compaction.
"""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _mk(root, n_segments=4):
    events = fx.make_change_events(1000, n_convs=10, turns_per_conv=5)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=n_segments)
    t = DeltaTable.create(f"{root}/t", num_partitions=4, num_salts=2)
    return t, segs


def _snap(t, **kw):
    return (
        ing.snapshot(t, **kw)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_drop_hides_now_travels_below_and_never_resurrects(tmp_path):
    root = str(tmp_path)
    t, segs = _mk(root)
    ing.run_stream(t, segs[:2], segments_per_epoch=1)  # epochs 1..2
    before = _snap(t)
    assert "tool" in before.columns

    st = ing.drop_columns(t, ["tool"])
    assert st == {
        "dropped": ["tool"],
        "from_epoch": 2,
        "released_constraints": [],
    }
    # hidden from the current state and the current epoch's travel alike
    assert "tool" not in ing.snapshot(t).schema().names
    assert "tool" not in ing.snapshot(t, as_of_epoch=2).schema().names
    # strictly-older time travel still reads the column from old files
    old = _snap(t, as_of_epoch=1)
    assert "tool" in old.columns
    # the rest of the state is untouched by the drop
    now = _snap(t)
    pd.testing.assert_frame_equal(now, before.drop(columns=["tool"]))

    # later WAL epochs STILL CARRY the column; it must not resurrect,
    # and their other-column updates must land normally
    ing.run_stream(t, segs[2:], segments_per_epoch=1)  # epochs 3..4
    after = _snap(t)
    assert "tool" not in after.columns
    assert "tool" not in t.current_schema().names
    # oracle: full-stream LWW state minus the dropped column
    t2 = DeltaTable.create(f"{root}/oracle", num_partitions=4, num_salts=2)
    ing.run_stream(t2, segs, segments_per_epoch=1)
    want = _snap(t2).drop(columns=["tool"])
    pd.testing.assert_frame_equal(after, want)
    # idempotent: re-drop keeps the original epoch
    ing.drop_columns(t, ["tool"])
    assert t.dropped_columns() == {"tool": 2}


def test_drop_validation(tmp_path):
    t, segs = _mk(str(tmp_path))
    ing.run_stream(t, segs[:1], segments_per_epoch=1)
    for bad in ("conv_id", "turn_idx", "op", "seq", "ts"):
        with pytest.raises(ValueError, match="cannot drop"):
            ing.drop_columns(t, [bad])
    with pytest.raises(ValueError, match="not in the table schema"):
        ing.drop_columns(t, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        ing.drop_columns(t, [])


def test_compact_physically_erases_dropped_column(tmp_path):
    t, segs = _mk(str(tmp_path))
    ing.run_stream(t, segs, segments_per_epoch=1)
    want = _snap(t).drop(columns=["tool"])
    ing.drop_columns(t, ["tool"])
    ing.compact(t)
    # every file visible after the rewrite lacks the column entirely
    visible = [
        p for paths in t.partition_files().values() for p in paths
    ]
    assert visible
    for p in visible:
        assert "tool" not in pq.read_schema(p).names
    pd.testing.assert_frame_equal(_snap(t), want)


def test_restore_below_drop_revives_column(tmp_path):
    t, segs = _mk(str(tmp_path))
    ing.run_stream(t, segs, segments_per_epoch=1)  # epochs 1..4
    want2 = _snap(t, as_of_epoch=2)
    ing.drop_columns(t, ["tool"])  # drop epoch 4
    assert "tool" not in t.current_schema().names
    ing.restore(t, 2, force=True)
    assert t.dropped_columns() == {}
    assert "tool" in t.current_schema().names
    pd.testing.assert_frame_equal(_snap(t), want2)


def test_feed_and_views_after_drop(tmp_path):
    """The change feed's payload follows the narrowed envelope."""
    from xgeo_ray.pipelines import ivm

    t, segs = _mk(str(tmp_path))
    ing.run_stream(t, segs, segments_per_epoch=1)
    ing.drop_columns(t, ["tool"])
    feed = ivm.changes_with_before(t).to_pandas()
    assert "tool" not in feed.columns and "_before_tool" not in feed.columns
    assert len(feed) > 0


def test_lookup_after_drop(tmp_path):
    """Regression: point lookups read delta files written BEFORE the
    drop (which still hold the column's bytes) and must project them
    away — unprojected reads tripped cast_to's extra-column fail-fast."""
    t, segs = _mk(str(tmp_path))
    ing.run_stream(t, segs, segments_per_epoch=1)
    snap = _snap(t)
    cid = snap["conv_id"].iloc[0]
    want = snap[snap["conv_id"] == cid].drop(columns=["tool"])
    ing.drop_columns(t, ["tool"])
    got = ing.lookup(t, cid).to_pandas()
    assert "tool" not in got.columns
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    many = ing.lookup_many(t, [cid]).to_pandas()
    assert "tool" not in many.columns and len(many) == len(want)


def test_cli_drop_columns(tmp_path, capsys):
    from xgeo_ray.__main__ import main

    t, segs = _mk(str(tmp_path))
    ing.run_stream(t, segs[:1], segments_per_epoch=1)
    assert main(["drop-columns", t.root, "tool"]) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["dropped"] == ["tool"]
    assert "tool" not in DeltaTable.open(t.root).current_schema().names
