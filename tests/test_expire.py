"""Event-time retention (expire): TTL semantics, zone-map prune parity
with an unpruned delete, exactly-once, and the metadata-only fast path."""

import numpy as np
import pandas as pd
import pyarrow as pa

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.pipelines.ingest import _TsBefore
from xgeo_ray.state.delta_table import DeltaTable


def _build(tmp_path, name, n=600, seed=9):
    ev = fx.make_change_events(n, n_convs=14, seed=seed)
    segs = fx.write_segments(ev, str(tmp_path / f"wal_{name}"), n_segments=3)
    t = DeltaTable.create(str(tmp_path / name), num_partitions=8, num_salts=2)
    ing.run_stream(t, segs, segments_per_epoch=1)
    return t


def _snap(t) -> pd.DataFrame:
    df = ing.snapshot(t).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_expire_drops_old_winners(tmp_path, ray_session):
    t = _build(tmp_path, "t1")
    before = _snap(t)
    ts_us = before["ts"].astype("int64")
    cutoff = int(np.median(ts_us))
    m = ing.expire(t, cutoff)
    assert m is not None
    after = _snap(t)
    after_ts = after["ts"].astype("int64")
    assert (after_ts >= cutoff).all()
    exp = before[ts_us >= cutoff].reset_index(drop=True)
    pd.testing.assert_frame_equal(after, exp)
    # exactly-once: the same cutoff is a committed batch -> no-op
    assert ing.expire(t, cutoff) is None


def test_expire_prune_matches_unpruned_delete(tmp_path, ray_session):
    """The zone-map partition prune must not lose matches: expire ==
    a full-scan delete_where with the same predicate."""
    a = _build(tmp_path, "a", seed=21)
    b = _build(tmp_path, "b", seed=21)  # identical content
    snap = _snap(a)
    cutoff = int(np.quantile(snap["ts"].astype("int64"), 0.7))
    ing.expire(a, cutoff)
    ing.delete_where(b, _TsBefore(cutoff), batch_id="full-scan")
    pd.testing.assert_frame_equal(_snap(a), _snap(b))


def test_expire_metadata_only_noop(tmp_path, ray_session):
    t = _build(tmp_path, "t2", seed=33)
    # a cutoff below every row's event time prunes EVERY partition
    assert t.partitions_with_rows_before(0) == []
    m = ing.expire(t, 0)
    assert m is not None and m.totals["rows_in"] == 0
    # and everything above event time keeps all row-bearing partitions
    hot = t.partitions_with_rows_before(2**62)
    assert set(hot) == set(t.partition_files().keys())
