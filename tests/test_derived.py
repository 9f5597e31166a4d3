"""Derived tables: exactly-once downstream sync from the change feed.

``sync_derived(source, sink)`` re-ingests each committed source delta
epoch into a sink DeltaTable (optionally through a transform stage), the
sink's committed-segments set acting as the consumer cursor. Covers:
identity parity, transform parity, incremental follow + no-op re-sync,
partial sync == time-travel state, whole-epoch grouping, and tombstone
propagation across different sink partitioning.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pandas as pd
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


@pytest.fixture(scope="module")
def src_table(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("derived_src"))
    base = fx.make_transcripts(12, 6)
    pq.write_table(base, f"{root}/base.parquet")
    events = fx.make_change_events(1200, n_convs=12, turns_per_conv=6)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=4)
    src = DeltaTable.create(f"{root}/src", num_partitions=8, num_salts=2)
    ing.run_stream(
        src, segs, segments_per_epoch=2, bootstrap=f"{root}/base.parquet"
    )  # epochs: 1 bootstrap + 2 deltas
    return src, root, events


def test_identity_sync_matches_source(src_table):
    src, root, _ = src_table
    sink = DeltaTable.create(f"{root}/sink_id", num_partitions=4, num_salts=1)
    ms = ing.sync_derived(src, sink)
    assert [m.epoch for m in ms] == [1, 2, 3]
    pd.testing.assert_frame_equal(_df(ing.snapshot(sink)), _df(ing.snapshot(src)))
    # second sync is a no-op: the cursor (committed segments) is caught up
    assert ing.sync_derived(src, sink) == []


def test_transform_sync(src_table):
    """Every change row (bootstrap inserts included) passes through the
    transform before landing, so the sink state == transformed source
    state — the LWW winner commutes with a per-row map."""
    src, root, _ = src_table

    # nested def: cloudpickle serializes it by VALUE (a module-level test
    # helper would pickle by reference to a module workers can't import)
    def upper_text(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("text")
        return t.set_column(i, "text", pc.utf8_upper(t.column("text")))

    sink = DeltaTable.create(f"{root}/sink_tf", num_partitions=4, num_salts=1)
    ing.sync_derived(src, sink, transform=upper_text)
    want = _df(ing.snapshot(src))
    want["text"] = want["text"].str.upper()
    pd.testing.assert_frame_equal(_df(ing.snapshot(sink)), want)


def test_partial_sync_is_time_travel_state(src_table):
    """upto_epoch=E must reproduce snapshot(source, as_of_epoch=E); the
    follow-up full sync continues from the cursor to full parity."""
    src, root, _ = src_table
    sink = DeltaTable.create(f"{root}/sink_part", num_partitions=4, num_salts=1)
    ms = ing.sync_derived(src, sink, upto_epoch=2)
    assert [m.epoch for m in ms] == [1, 2]
    pd.testing.assert_frame_equal(
        _df(ing.snapshot(sink)), _df(ing.snapshot(src, as_of_epoch=2))
    )
    ms = ing.sync_derived(src, sink)  # resume from cursor
    assert [m.epoch for m in ms] == [3]
    pd.testing.assert_frame_equal(_df(ing.snapshot(sink)), _df(ing.snapshot(src)))


def test_grouped_sync_and_incremental_follow(src_table, tmp_path):
    """epochs_per_sync groups WHOLE source epochs per sink epoch (one
    source epoch's files must never split — overlapping seq ranges);
    later source epochs flow through a follow-up sync."""
    src, root, events = src_table
    sink = DeltaTable.create(
        str(tmp_path / "sink_grp"), num_partitions=4, num_salts=1
    )
    ms = ing.sync_derived(src, sink, epochs_per_sync=2)
    assert len(ms) == 2  # 3 source epochs -> groups of 2 + 1
    # extend the source (seqs continue past its watermark), then follow
    start = int(src.watermarks().max()) + 1
    ev2 = fx.make_change_events(400, n_convs=12, turns_per_conv=6)
    ev2 = ev2.set_column(
        ev2.schema.get_field_index("seq"),
        "seq",
        pc.add(ev2.column("seq"), pa.scalar(start, pa.int64())),
    )
    segs2 = fx.write_segments(ev2, str(tmp_path / "wal2"), n_segments=1)
    ing.run_stream(src, segs2, segments_per_epoch=1)
    ms = ing.sync_derived(src, sink, epochs_per_sync=2)
    assert len(ms) == 1
    pd.testing.assert_frame_equal(_df(ing.snapshot(sink)), _df(ing.snapshot(src)))


def test_tail_derived_follows_live_source(tmp_path):
    """Epochs committed to the source WHILE the derived tailer polls are
    synced in order; final sink state matches the source; a restarted
    tail is a no-op (shared committed-segments cursor)."""
    import threading
    import time

    ev = fx.make_change_events(800, n_convs=10, turns_per_conv=6)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=4)
    src = DeltaTable.create(str(tmp_path / "src"), num_partitions=4, num_salts=1)
    sink = DeltaTable.create(str(tmp_path / "sink"), num_partitions=8, num_salts=2)

    def producer():
        for s in segs:
            ing.run_stream(src, [s], segments_per_epoch=1)
            time.sleep(0.25)

    th = threading.Thread(target=producer)
    th.start()
    ms = ing.tail_derived(src, sink, poll_interval_s=0.1, idle_polls_to_stop=12)
    th.join()
    # a final catch-up sync in case the tailer went idle first
    ms += ing.sync_derived(src, sink)
    assert len(ms) == 4
    pd.testing.assert_frame_equal(_df(ing.snapshot(sink)), _df(ing.snapshot(src)))
    assert ing.tail_derived(src, sink, poll_interval_s=0.01, idle_polls_to_stop=2) == []


def test_changes_feed_projection(src_table):
    """columns= pushes the projection to the parquet read; the band
    interplay keeps ts available for filtering then drops it."""
    src, root, _ = src_table
    ds = ing.changes(src, columns=["conv_id", "turn_idx", "op"])
    t = ds.schema()
    assert set(t.names) == {"conv_id", "turn_idx", "op", "_epoch"}
    assert ds.count() == ing.changes(src).count()


def test_tombstones_propagate(tmp_path):
    """A key deleted in the source disappears from the sink: the feed
    carries the tombstone row and the sink's LWW collapse applies it."""
    ev = fx.make_change_events(600, n_convs=10, turns_per_conv=5)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=2)
    src = DeltaTable.create(str(tmp_path / "src"), num_partitions=4, num_salts=1)
    ing.run_stream(src, segs, segments_per_epoch=1)
    src_df = _df(ing.snapshot(src))
    sink = DeltaTable.create(str(tmp_path / "sink"), num_partitions=8, num_salts=2)
    ing.sync_derived(src, sink)
    sink_df = _df(ing.snapshot(sink))
    pd.testing.assert_frame_equal(sink_df, src_df)
    # sanity: the stream really contained deletes
    assert pc.sum(pc.equal(ev.column("op"), "D")).as_py() > 0


def test_sync_derived_fails_fast_after_source_restore(tmp_path):
    """A source restore past epochs the sink already applied must make
    the next sync FAIL, not silently diverge (the sink would keep
    rolled-back values forever: replayed source rows reuse the same
    seqs and drop at the sink watermark)."""
    root = str(tmp_path)
    events = fx.make_change_events(600, n_convs=8, turns_per_conv=5, dup_fraction=0.0)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=3)
    src = DeltaTable.create(f"{root}/src", num_partitions=4, num_salts=1)
    ing.run_stream(src, segs, segments_per_epoch=1)  # epochs 1..3
    sink = DeltaTable.create(f"{root}/sink", num_partitions=2, num_salts=1)
    ing.sync_derived(src, sink)
    pd.testing.assert_frame_equal(_df(ing.snapshot(sink)), _df(ing.snapshot(src)))

    ing.restore(src, 2)  # rolls back source epoch 3 (already synced)
    with pytest.raises(ValueError, match="RESTORE"):
        ing.sync_derived(src, sink)
    # replaying the same WAL does NOT clear the guard: the sink's applied
    # files are still gone from source history (content equality is
    # unknowable from paths) — the repair is restoring the SINK too
    ing.run_stream(src, segs, segments_per_epoch=1)
    with pytest.raises(ValueError, match="RESTORE"):
        ing.sync_derived(src, sink)
    ing.restore(sink, 2)  # sink epoch that preceded the stale sync
    ing.sync_derived(src, sink)
    pd.testing.assert_frame_equal(_df(ing.snapshot(sink)), _df(ing.snapshot(src)))
    # a REBUILT sink also converges to the current source state
    sink2 = DeltaTable.create(f"{root}/sink2", num_partitions=2, num_salts=1)
    ing.sync_derived(src, sink2)
    pd.testing.assert_frame_equal(_df(ing.snapshot(sink2)), _df(ing.snapshot(src)))


def test_grouped_sync_isolates_correction_epochs(tmp_path):
    """epochs_per_sync > 1 must not fold a correction epoch (wall-clock
    ts, all seq=-1) into a stream epoch's sink commit — the mixed
    manifest would carry a real max_seq AND the correction's
    operational max_ts, poisoning the sink's event-time watermark."""
    root = str(tmp_path)
    events = fx.make_change_events(400, n_convs=6, turns_per_conv=4, dup_fraction=0.0)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    src = DeltaTable.create(f"{root}/src", num_partitions=4, num_salts=1)
    ing.run_stream(src, [segs[0]])  # epoch 1 (stream)
    fix = pa.table(
        {"conv_id": ["c-fix"], "turn_idx": pa.array([0], pa.int64()),
         "text": ["fixed"]}
    )
    ing.apply_changes(src, fix, batch_id="fix-1")  # epoch 2 (oob, ts=now)
    ing.run_stream(src, segs)  # epoch 3 (stream)
    wm_src = src.event_time_watermark()

    sink = DeltaTable.create(f"{root}/sink", num_partitions=4, num_salts=1)
    ms = ing.sync_derived(src, sink, epochs_per_sync=3)
    # the oob epoch landed isolated: one sink epoch is all-seq=-1
    assert any(
        all(e.max_seq < 0 for e in m.partitions.values()) and m.partitions
        for m in ms
    )
    # sink watermark tracks the stream, not the correction's wall clock
    assert sink.event_time_watermark() <= wm_src + 3_600_000_000
    pd.testing.assert_frame_equal(_df(ing.snapshot(sink)), _df(ing.snapshot(src)))
