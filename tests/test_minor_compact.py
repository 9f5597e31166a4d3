"""Minor (tiered/incremental) compaction: fold only the delta chain
since the last FULL compaction, leaving the base untouched — the
O(changes) maintenance mode an endless tailer needs on a 100 TB table
(a full compact rewrites O(table) every cycle).

Covers: state preservation (lww + additive), visible-set shape (base +
one fold), chain re-folding (minor after minor), vacuum reclaim of the
folded chain + fsck cleanliness, the changes feed's independence from
folds (history, not state), and the event-time-travel guard across a
minor fold.
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _state(t):
    return (
        ing.snapshot(t)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _files_per_part(t):
    return {k: len(v) for k, v in t.partition_files().items()}


@pytest.fixture()
def stream(tmp_path):
    ev = fx.make_change_events(2400, n_convs=16, turns_per_conv=6)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=6)
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    return t, segs, tmp_path


def test_minor_fold_preserves_state_and_bounds_files(stream):
    t, segs, _ = stream
    ing.run_stream(t, segs[:4], segments_per_epoch=1)  # 4 delta epochs
    before = _state(t)
    assert max(_files_per_part(t).values()) == 4

    m = ing.compact(t, minor=True)
    assert m is not None and m.kind == "compact_minor"
    pd.testing.assert_frame_equal(_state(t), before)
    assert max(_files_per_part(t).values()) == 1  # chain folded, no base

    # more deltas, then another minor: the previous fold collapses in
    ing.run_stream(t, segs, segments_per_epoch=1)
    after = _state(t)
    assert max(_files_per_part(t).values()) == 3  # fold + 2 new deltas
    m2 = ing.compact(t, minor=True)
    assert m2 is not None
    pd.testing.assert_frame_equal(_state(t), after)
    assert max(_files_per_part(t).values()) == 1

    # nothing left to fold -> no-op, no manifest
    n_epochs = t.latest_epoch()
    assert ing.compact(t, minor=True) is None
    assert t.latest_epoch() == n_epochs


def test_minor_leaves_full_compact_base_untouched(stream):
    t, segs, _ = stream
    ing.run_stream(t, segs[:3], segments_per_epoch=1)
    ing.compact(t)  # full: base per partition
    base_files = {
        k: v[0] for k, v in t.partition_files().items()
    }
    ing.run_stream(t, segs, segments_per_epoch=1)  # 3 more delta epochs
    want = _state(t)
    m = ing.compact(t, minor=True)
    assert m is not None
    plan = t.partition_files()
    for k, paths in plan.items():
        assert paths[0] == base_files[k]  # base byte-identical path
        assert len(paths) == 2  # base + one fold
    pd.testing.assert_frame_equal(_state(t), want)
    # watermarks survive the fold
    assert (t.watermarks() >= 0).all()


def test_minor_additive_sums_exact(tmp_path):
    import numpy as np

    rng = np.random.default_rng(5)
    rows = {
        "seq": pa.array(np.arange(900, dtype=np.int64)),
        "op": pa.array(["U"] * 900),
        "conv_id": pa.array([f"c{rng.integers(0, 12)}" for _ in range(900)]),
        "turn_idx": pa.array(rng.integers(0, 4, 900).astype("int32")),
        "amount": pa.array(rng.integers(1, 9, 900).astype("int64")),
        "ts": pa.array((np.arange(900) * 1000).astype("int64"), pa.timestamp("us")),
    }
    ev = pa.table(rows)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=3)
    t = DeltaTable.create(
        str(tmp_path / "t"), num_partitions=4, num_salts=1, merge_policy="additive"
    )
    ing.run_stream(t, segs, segments_per_epoch=1)
    want = _state(t)
    assert ing.compact(t, minor=True) is not None
    pd.testing.assert_frame_equal(_state(t), want)


def test_vacuum_reclaims_folded_chain_and_fsck_clean(stream):
    t, segs, _ = stream
    ing.run_stream(t, segs, segments_per_epoch=1)
    want = _state(t)
    ing.compact(t, minor=True)
    n_before = sum(
        len(os.listdir(os.path.join(t.root, "parts", d)))
        for d in os.listdir(os.path.join(t.root, "parts"))
    )
    out = ing.vacuum(t)
    assert out["deleted"] > 0
    n_after = sum(
        len(os.listdir(os.path.join(t.root, "parts", d)))
        for d in os.listdir(os.path.join(t.root, "parts"))
    )
    assert n_after < n_before
    pd.testing.assert_frame_equal(_state(t), want)
    # fsck: reclaimed superseded files are NOT issues (regression: fsck
    # used to flag every vacuumed file as missing)
    chk = ing.fsck(t)
    assert chk["ok"], chk["issues"]
    assert chk["files_reclaimed"] > 0


def test_minor_rejects_tombstone_horizon(stream):
    t, segs, _ = stream
    ing.run_stream(t, segs[:2], segments_per_epoch=1)
    with pytest.raises(ValueError, match="full compact"):
        ing.compact(t, minor=True, tombstone_ts_horizon=123)


def test_changes_feed_survives_minor_fold(stream):
    """Minor compaction is state-rewrite, not history: the CDC-out feed
    still serves every delta epoch (until vacuum), and replaying it
    reproduces the state."""
    t, segs, _ = stream
    ing.run_stream(t, segs, segments_per_epoch=2)
    feed_epochs_before = sorted(
        ing.changes(t).to_pandas()["_epoch"].unique().tolist()
    )
    ing.compact(t, minor=True)
    feed = ing.changes(t).to_pandas()
    assert sorted(feed["_epoch"].unique().tolist()) == feed_epochs_before
    # replay the feed through a fresh sink == source state
    sink = DeltaTable.create(
        str(os.path.dirname(t.root) + "/sink"), num_partitions=2, num_salts=1
    )
    ing.sync_derived(t, sink)
    pd.testing.assert_frame_equal(_state(sink), _state(t))


def test_time_travel_guard_covers_minor_fold(stream):
    t, segs, _ = stream
    ing.run_stream(t, segs, segments_per_epoch=2)
    mid_ts = int(
        pd.Timestamp(_state(t).ts.quantile(0.5)).value // 1000
    )
    ing.compact(t, minor=True)
    with pytest.raises(ValueError, match="compaction"):
        ing.snapshot(t, as_of_ts_us=mid_ts).to_pandas()
    # epoch time-travel to before the fold still works (pre-vacuum)
    pre = t.latest_epoch() - 1
    assert ing.snapshot(t, as_of_epoch=pre).count() > 0
