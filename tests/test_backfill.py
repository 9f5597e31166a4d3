"""apply_changes: programmatic correction/backfill batches.

Out-of-band rows (seq=-1, watermark-exempt) that win by LWW ts without
advancing the seq watermarks — the live stream keeps flowing afterwards.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _state(table):
    return (
        ing.snapshot(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


@pytest.fixture()
def stream_table(tmp_path):
    ev = fx.make_change_events(800, n_convs=10, turns_per_conv=6)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=2)
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.run_stream(t, segs, segments_per_epoch=1)
    return t, ev, tmp_path


def test_correction_batch_and_exactly_once(stream_table):
    t, ev, _ = stream_table
    before = _state(t)
    k0, k1 = before.iloc[0], before.iloc[1]
    ts_fix = int(ev.column("ts").cast(pa.int64()).to_numpy().max()) + 1_000
    batch = pa.table(
        {
            "conv_id": pa.array([k0.conv_id, k1.conv_id]),
            "turn_idx": pa.array(
                [int(k0.turn_idx), int(k1.turn_idx)], pa.int32()
            ),
            "text": pa.array(["corrected-0", "corrected-1"]),
        }
    )
    m = ing.apply_changes(t, batch, batch_id="fix-1", ts_us=ts_fix)
    assert m is not None and m.totals["applied"] >= 2
    after = _state(t)
    assert after.iloc[0].text == "corrected-0"
    assert after.iloc[1].text == "corrected-1"
    # LWW replaces the whole row VERSION: columns the batch omitted are
    # null in the winning correction row, not inherited
    assert after.iloc[0].role is None
    assert len(after) == len(before)
    # exactly-once: same batch_id is a no-op
    assert ing.apply_changes(t, batch, batch_id="fix-1", ts_us=ts_fix) is None
    assert _state(t).equals(after)


def test_delete_batch(stream_table):
    t, ev, _ = stream_table
    before = _state(t)
    victim = before.iloc[3]
    ts_fix = int(ev.column("ts").cast(pa.int64()).to_numpy().max()) + 1_000
    batch = pa.table(
        {
            "conv_id": pa.array([victim.conv_id]),
            "turn_idx": pa.array([int(victim.turn_idx)], pa.int32()),
        }
    )
    ing.apply_changes(t, batch, batch_id="del-1", default_op="D", ts_us=ts_fix)
    after = _state(t)
    assert len(after) == len(before) - 1
    assert not (
        (after.conv_id == victim.conv_id) & (after.turn_idx == victim.turn_idx)
    ).any()


def test_stream_survives_correction(stream_table):
    """The watermark does NOT advance: later genuine WAL events still
    apply, and a later-ts stream update supersedes the correction."""
    t, ev, tmp_path = stream_table
    wm_before = t.watermarks().copy()
    before = _state(t)
    key = before.iloc[0]
    ts_max = int(ev.column("ts").cast(pa.int64()).to_numpy().max())
    batch = pa.table(
        {
            "conv_id": pa.array([key.conv_id]),
            "turn_idx": pa.array([int(key.turn_idx)], pa.int32()),
            "text": pa.array(["corrected"]),
        }
    )
    ing.apply_changes(t, batch, batch_id="fix-2", ts_us=ts_max + 1_000)
    assert (t.watermarks() == wm_before).all()
    # continue the stream: new seqs after the watermark, later ts
    ev2 = pa.table(
        {
            "seq": pa.array([int(wm_before.max()) + 1], pa.int64()),
            "op": pa.array(["U"]),
            "conv_id": pa.array([key.conv_id]),
            "turn_idx": pa.array([int(key.turn_idx)], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["stream-wins"]),
            "ts": pa.array([ts_max + 2_000], pa.timestamp("us")),
        }
    )
    segs2 = fx.write_segments(ev2, str(tmp_path / "wal2"), n_segments=1)
    ms = ing.run_stream(t, segs2, segments_per_epoch=1)
    assert ms and ms[0].totals["below_wm_dropped"] == 0
    after = _state(t)
    row = after[
        (after.conv_id == key.conv_id) & (after.turn_idx == key.turn_idx)
    ].iloc[0]
    assert row.text == "stream-wins"


def test_corrections_flow_to_derived(stream_table):
    """A derived sink syncing the change feed must apply the source's
    correction deltas (seq=-1) even after the sink's own seq watermark
    has advanced — the regression dropped them as below-watermark
    replays, leaving the sink stale forever."""
    t, ev, tmp_path = stream_table
    sink = DeltaTable.create(
        str(tmp_path / "sink"), num_partitions=2, num_salts=1
    )
    ing.sync_derived(t, sink)  # sink watermarks now >= 0
    before = _state(t)
    key = before.iloc[0]
    ts_fix = int(ev.column("ts").cast(pa.int64()).to_numpy().max()) + 1_000
    batch = pa.table(
        {
            "conv_id": pa.array([key.conv_id]),
            "turn_idx": pa.array([int(key.turn_idx)], pa.int32()),
            "text": pa.array(["derived-corrected"]),
        }
    )
    ing.apply_changes(t, batch, batch_id="fix-derived", ts_us=ts_fix)
    ms = ing.sync_derived(t, sink)
    assert ms and ms[-1].totals["below_wm_dropped"] == 0
    after = _state(sink)
    row = after[
        (after.conv_id == key.conv_id) & (after.turn_idx == key.turn_idx)
    ].iloc[0]
    assert row.text == "derived-corrected"
    pd_src = _state(t)
    assert after.equals(pd_src)


def test_additive_correction_batches_accumulate(tmp_path):
    """Two correction batches on one key are DISTINCT increments: both
    carry seq=-1, but the (key, seq) redelivery dedup must not collapse
    them (redelivery protection for out-of-band rows is segment-level).
    The regression kept only the first batch's value."""
    t = DeltaTable.create(
        str(tmp_path / "t"),
        num_partitions=2,
        num_salts=1,
        merge_policy="additive",
    )

    def _batch(n):
        return pa.table(
            {
                "conv_id": pa.array(["c0"]),
                "turn_idx": pa.array([0], pa.int32()),
                "n_tokens": pa.array([n], pa.int64()),
            }
        )

    ing.apply_changes(t, _batch(5), batch_id="inc-1", ts_us=1_000)
    ing.apply_changes(t, _batch(7), batch_id="inc-2", ts_us=2_000)
    got = ing.snapshot(t).to_pandas()
    assert len(got) == 1 and int(got.iloc[0].n_tokens) == 12


def test_batch_validation(stream_table):
    t, _, _ = stream_table
    dup = pa.table(
        {
            "conv_id": pa.array(["c1", "c1"]),
            "turn_idx": pa.array([1, 1], pa.int32()),
            "text": pa.array(["a", "b"]),
        }
    )
    with pytest.raises(ValueError, match="duplicate"):
        ing.apply_changes(t, dup, batch_id="bad-dup")
    with_seq = pa.table(
        {
            "conv_id": pa.array(["c1"]),
            "turn_idx": pa.array([1], pa.int32()),
            "seq": pa.array([99], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="seq"):
        ing.apply_changes(t, with_seq, batch_id="bad-seq")
    with pytest.raises(ValueError, match="filesystem-safe"):
        ing.apply_changes(t, dup.slice(0, 1), batch_id="../x")
