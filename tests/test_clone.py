"""Zero-copy table clone: snapshot parity, divergence isolation,
hardlink survival across source vacuum, and the non-empty-dest guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _snap(t):
    return (
        ing.snapshot(t)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _continuation(table, n, seed):
    wm = int(table.watermarks().max())
    ev = fx.make_change_events(n, n_convs=4, turns_per_conv=3, seed=seed)
    return ev.set_column(
        0, "seq", pa.array((ev.column("seq").to_numpy() + wm + 1).astype(np.int64))
    )


def test_clone_parity_and_divergence(tmp_path, ray_session):
    ev = fx.make_change_events(500, n_convs=10, seed=3)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=2)
    src = DeltaTable.create(str(tmp_path / "src"), num_partitions=4, num_salts=2)
    ing.run_stream(src, segs, segments_per_epoch=1)

    dst = ing.clone_table(src, str(tmp_path / "dst"))
    pd.testing.assert_frame_equal(_snap(src), _snap(dst))
    assert dst.watermarks().tolist() == src.watermarks().tolist()

    # diverge the SOURCE: the clone must not move
    before = _snap(dst)
    segs2 = fx.write_segments(
        _continuation(src, 40, seed=8), str(tmp_path / "wal2"), n_segments=1
    )
    ing.run_stream(src, segs2, segments_per_epoch=1)
    pd.testing.assert_frame_equal(_snap(dst), before)
    assert len(_snap(src)) >= len(before)

    # diverge the CLONE: the source must not move
    s_before = _snap(src)
    segs3 = fx.write_segments(
        _continuation(dst, 40, seed=9), str(tmp_path / "wal3"), n_segments=1
    )
    ing.run_stream(dst, segs3, segments_per_epoch=1)
    pd.testing.assert_frame_equal(_snap(src), s_before)

    # time travel on the clone sees the pre-divergence epoch history
    e1 = dst.effective_manifests()[0].epoch
    assert ing.snapshot(dst, as_of_epoch=e1).count() > 0


def test_clone_survives_source_vacuum(tmp_path, ray_session):
    ev = fx.make_change_events(400, n_convs=8, seed=5)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=2)
    src = DeltaTable.create(str(tmp_path / "src"), num_partitions=4, num_salts=1)
    ing.run_stream(src, segs, segments_per_epoch=1)
    dst = ing.clone_table(src, str(tmp_path / "dst"))
    want = _snap(dst)
    # source compacts and vacuums its superseded deltas; the clone's
    # hardlinked files keep the inodes alive
    ing.compact(src)
    ing.vacuum(src, respect_consumers=False)
    pd.testing.assert_frame_equal(_snap(dst), want)
    assert ing.fsck(dst)["ok"]


def test_clone_refuses_nonempty_dest(tmp_path, ray_session):
    ev = fx.make_change_events(60, n_convs=4, seed=7)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=1)
    src = DeltaTable.create(str(tmp_path / "src"), num_partitions=2, num_salts=1)
    ing.run_stream(src, segs, segments_per_epoch=1)
    d = tmp_path / "dst"
    d.mkdir()
    (d / "junk").write_text("x")
    with pytest.raises(ValueError, match="not empty"):
        ing.clone_table(src, str(d))


def test_clone_batch_id_cursor_travels(tmp_path, ray_session):
    """Committed backfill batch_ids must stay exactly-once ON THE CLONE:
    manifest segment paths are source-root-absolute, so clone rewrites
    the backfill prefix — a batch committed on the source no-ops when
    retried against the clone instead of re-stamping tombstones."""
    ev = fx.make_change_events(400, n_convs=8, seed=11)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=2)
    src = DeltaTable.create(str(tmp_path / "src"), num_partitions=4, num_salts=2)
    ing.run_stream(src, segs, segments_per_epoch=1)

    class _All:
        columns = ["turn_idx"]

        def __call__(self, batch):
            import pyarrow.compute as pc

            even = pc.bit_wise_and(batch.column("turn_idx").cast("int64"), 1)
            return pc.equal(even, 0)

    m = ing.delete_where(src, _All(), batch_id="gdpr-1")
    assert m is not None
    dst = ing.clone_table(src, str(tmp_path / "dst"))
    # snapshot parity still holds after the manifest rewrite
    pd.testing.assert_frame_equal(_snap(src), _snap(dst))
    # the committed batch no-ops on BOTH tables
    assert ing.delete_where(src, _All(), batch_id="gdpr-1") is None
    assert ing.delete_where(dst, _All(), batch_id="gdpr-1") is None
    # and expire's derived batch_id inherits the same contract
    cutoff = 1  # nothing older than epoch-time 1: marker-only run
    assert ing.expire(src, cutoff) is not None  # marker commit
    dst2 = ing.clone_table(src, str(tmp_path / "dst2"))
    assert ing.expire(dst2, cutoff) is None
