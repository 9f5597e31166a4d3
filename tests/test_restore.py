"""Table rollback (``ingest.restore``) — the lakehouse RESTORE.

A restore is a metadata-only commit (kind="restore") that truncates the
effective manifest history at its target epoch: state, schema, seq/ts
watermarks, committed segments, the changes feed and consumer polls all
rewind together, while rolled-back manifests/files stay on disk for
time-travel until vacuum reclaims them. Rolled-back WAL segments become
re-ingestable — the restore-then-replay repair story.
"""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state import consumers as cons
from xgeo_ray.state.delta_table import DeltaTable


def _df(ds):
    return (
        ds.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _mk(root, n_events=600, n_segments=3):
    base = fx.make_transcripts(8, 5)
    pq.write_table(base, f"{root}/base.parquet")
    events = fx.make_change_events(
        n_events, n_convs=8, turns_per_conv=5, dup_fraction=0.0
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=n_segments)
    table = DeltaTable.create(f"{root}/table", num_partitions=4, num_salts=2)
    ing.bootstrap_base(table, f"{root}/base.parquet")  # epoch 1
    ing.run_stream(table, segs, segments_per_epoch=1)  # epochs 2..1+n
    return table, base, events, segs


def test_restore_state_schema_watermarks_and_replay(tmp_path):
    table, base, events, segs = _mk(str(tmp_path))
    full = _df(ing.snapshot(table))
    at2 = _df(ing.snapshot(table, as_of_epoch=2))
    wm_at2 = None  # computed post-restore below

    m = ing.restore(table, 2)
    assert m.kind == "restore" and m.epoch == 5
    # state == as-of target
    pd.testing.assert_frame_equal(_df(ing.snapshot(table)), at2)
    # time-travel INTO the rolled-back range still reads
    pd.testing.assert_frame_equal(_df(ing.snapshot(table, as_of_epoch=4)), full)
    # watermarks rewound: only segment 0 counts as committed
    done = table.committed_segments()
    assert segs[0] in done and segs[1] not in done and segs[2] not in done
    wm_at2 = table.watermarks().copy()

    # replay: the SAME WAL resumes from the restore point and reproduces
    # the exact pre-restore state (exactly-once across the rollback)
    ing.run_stream(table, segs, segments_per_epoch=1)  # epochs 6..7
    pd.testing.assert_frame_equal(_df(ing.snapshot(table)), full)
    assert (table.watermarks() >= wm_at2).all()
    out = ing.fsck(table)
    assert out["ok"], out["issues"]
    assert not out["warnings"], out["warnings"]


def test_restore_of_restore_and_errors(tmp_path):
    table, base, events, segs = _mk(str(tmp_path))
    at2 = _df(ing.snapshot(table, as_of_epoch=2))
    at3 = _df(ing.snapshot(table, as_of_epoch=3))
    ing.restore(table, 3)  # epoch 5
    pd.testing.assert_frame_equal(_df(ing.snapshot(table)), at3)
    ing.restore(table, 2)  # epoch 6: restore past the first restore
    pd.testing.assert_frame_equal(_df(ing.snapshot(table)), at2)
    # as-of BETWEEN the two restores sees the first restore applied
    pd.testing.assert_frame_equal(_df(ing.snapshot(table, as_of_epoch=5)), at3)
    with pytest.raises(ValueError, match="never committed"):
        ing.restore(table, 99)
    with pytest.raises(ValueError, match="nothing to restore"):
        ing.restore(table, table.latest_epoch())
    assert ing.fsck(table)["ok"]


def test_restore_forward_past_an_earlier_restore(tmp_path):
    """Restore to a target ABOVE an earlier restore's target must
    RE-EXPAND the view to snapshot(as_of_epoch=target) — a filtering
    implementation can only subtract and silently keeps the narrower
    state (the confirmed review finding)."""
    table, base, events, segs = _mk(str(tmp_path))
    at1 = _df(ing.snapshot(table, as_of_epoch=1))
    at2 = _df(ing.snapshot(table, as_of_epoch=2))
    ing.restore(table, 1)  # epoch 5
    pd.testing.assert_frame_equal(_df(ing.snapshot(table)), at1)
    ing.restore(table, 2)  # epoch 6: partially UNDOES the first restore
    pd.testing.assert_frame_equal(_df(ing.snapshot(table)), at2)
    # committed segments re-expand too: segment 0 is applied again
    assert segs[0] in table.committed_segments()
    out = ing.fsck(table)
    assert out["ok"], out["issues"]


def test_restore_consumer_guard_and_feed_rewind(tmp_path):
    table, base, events, segs = _mk(str(tmp_path))
    c = cons.Consumer(table, "sink")
    _, upto = c.poll()
    c.ack(upto)  # acked through epoch 4
    with pytest.raises(ValueError, match="consumer group"):
        ing.restore(table, 2)
    m = ing.restore(table, 2, force=True)
    # feed: rolled-back epochs no longer served
    feed_epochs = set(
        ing.changes(table, since_epoch=0).to_pandas()["_epoch"].unique()
    )
    assert feed_epochs == {1, 2}
    # fsck flags the cursor-ahead-of-feed situation as non-fatal state
    out = ing.fsck(table)
    assert out["ok"], out["issues"]
    assert m.epoch == 5


def test_restore_rolls_back_schema_evolution(tmp_path):
    import pyarrow as pa
    import pyarrow.compute as pc

    root = str(tmp_path)
    table, base, events, segs = _mk(root)
    pre_fields = set(table.current_schema().names)
    evolved = fx.make_change_events(
        120, n_convs=8, turns_per_conv=5, dup_fraction=0.0, seed=99
    )
    # continue the seq space so the new segment isn't watermark-dropped
    evolved = evolved.set_column(
        evolved.schema.get_field_index("seq"),
        "seq",
        pc.add(evolved.column("seq"), pa.scalar(events.num_rows, pa.int64())),
    )
    (seg,) = fx.write_segments(evolved, f"{root}/wal2", n_segments=1, evolve_from=0)
    ing.ingest_segments(table, [seg])
    assert "meta" in table.current_schema().names
    target = table.latest_epoch() - 1
    ing.restore(table, target)
    assert set(table.current_schema().names) == pre_fields
    # re-ingest after rollback: evolution applies again, exactly once
    ing.ingest_segments(table, [seg])
    assert "meta" in table.current_schema().names
    assert ing.fsck(table)["ok"]


def test_vacuum_reclaims_rolled_back_files(tmp_path):
    table, base, events, segs = _mk(str(tmp_path))
    at2 = _df(ing.snapshot(table, as_of_epoch=2))
    ing.restore(table, 2)
    got = ing.vacuum(table)
    assert got["deleted"] >= 2  # epochs 3..4 delta files reclaimed
    # current state unaffected; rolled-back range no longer time-travels
    pd.testing.assert_frame_equal(_df(ing.snapshot(table)), at2)
    out = ing.fsck(table)
    assert out["ok"], out["issues"]
    assert not out["warnings"], out["warnings"]
    assert out["files_reclaimed"] >= 2
    # restoring past vacuumed history fails fast
    ing.ingest_segments(table, [segs[1]])
    ing.compact(table)
    ing.vacuum(table)
    with pytest.raises(ValueError, match="vacuumed"):
        ing.restore(table, 2)


def test_view_refresh_retracts_after_restore(tmp_path):
    import pyarrow as pa

    from xgeo_ray.pipelines.views import read_view, refresh_view

    def _agg():
        def agg(t: pa.Table) -> pa.Table:
            return t.group_by(["conv_id"]).aggregate([("turn_idx", "count")])

        return agg

    def _counts(view_dir):
        df = read_view(view_dir).to_pandas()
        return (
            df.groupby("conv_id")["turn_idx_count"]
            .sum()
            .sort_index()
        )

    table, base, events, segs = _mk(str(tmp_path))
    view_dir = f"{tmp_path}/view"
    refresh_view(table, view_dir, _agg())
    before = _counts(view_dir)
    ing.restore(table, 2)
    refresh_view(table, view_dir, _agg())
    got = _counts(view_dir)
    want = (
        _df(ing.snapshot(table)).groupby("conv_id")["turn_idx"].count().sort_index()
    )
    assert got.to_dict() == want.to_dict()
    assert before.to_dict() != got.to_dict()
