"""Partition-aligned join views: snapshot parity vs a pandas oracle,
alignment guards, incremental refresh, tombstone semantics, spec pin."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.pipelines.join_view import (
    join_snapshot,
    read_join_view,
    refresh_join_view,
)
from xgeo_ray.state.delta_table import DeltaTable

KEYS = ["conv_id", "turn_idx"]


def _build(tmp_path, name, n_events, seed, parts=8, salts=2, n_convs=12):
    ev = fx.make_change_events(n_events, n_convs=n_convs, seed=seed)
    segs = fx.write_segments(ev, str(tmp_path / f"wal_{name}"), n_segments=2)
    t = DeltaTable.create(
        str(tmp_path / name), num_partitions=parts, num_salts=salts
    )
    ing.run_stream(t, segs, segments_per_epoch=1)
    return t


def _oracle(left, right, how, suffix="_r"):
    lt = ing.snapshot(left).to_pandas()
    rt = ing.snapshot(right).to_pandas()
    overlap = [c for c in rt.columns if c in lt.columns and c not in KEYS]
    rt = rt.rename(columns={c: c + suffix for c in overlap})
    out = lt.merge(
        rt, on=KEYS, how={"inner": "inner", "left": "left", "full": "outer"}[how]
    )
    return out.sort_values(KEYS).reset_index(drop=True)


def _got(ds, cols):
    df = ds.to_pandas()
    return df.sort_values(KEYS).reset_index(drop=True)[cols]


@pytest.mark.parametrize("how", ["inner", "left", "full"])
def test_join_snapshot_parity(tmp_path, ray_session, how):
    left = _build(tmp_path, "L", 500, seed=11)
    right = _build(tmp_path, "R", 350, seed=23)
    exp = _oracle(left, right, how)
    got = _got(join_snapshot(left, right, how=how), list(exp.columns))
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)
    assert len(exp) > 0


def test_join_alignment_guards(tmp_path, ray_session):
    left = _build(tmp_path, "La", 60, seed=1, parts=8, salts=2)
    wrong = _build(tmp_path, "Rb", 60, seed=2, parts=4, salts=2)
    with pytest.raises(ValueError, match="partition-aligned"):
        join_snapshot(left, wrong)
    salted = _build(tmp_path, "Rc", 60, seed=3, parts=8, salts=2)
    with pytest.raises(ValueError, match="num_salts == 1"):
        join_snapshot(left, salted, on=("conv_id",))
    with pytest.raises(ValueError, match="unsupported join key"):
        join_snapshot(left, salted, on=("role",))


def test_conv_level_join(tmp_path, ray_session):
    """conv-only equi-join on unsalted tables: many-to-many per conv,
    deterministic order via both turn_idx columns."""
    left = _build(tmp_path, "Lc", 300, seed=5, salts=1)
    right = _build(tmp_path, "Rd", 200, seed=6, salts=1)
    lt = ing.snapshot(left).to_pandas()
    rt = ing.snapshot(right).to_pandas()
    overlap = [c for c in rt.columns if c in lt.columns and c != "conv_id"]
    exp = (
        lt.merge(rt.rename(columns={c: c + "_r" for c in overlap}), on="conv_id")
        .sort_values(["conv_id", "turn_idx", "turn_idx_r"])
        .reset_index(drop=True)
    )
    got = (
        join_snapshot(left, right, on=("conv_id",))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx", "turn_idx_r"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_join_tombstone_drops_row(tmp_path, ray_session):
    left = _build(tmp_path, "Lt", 400, seed=31)
    right = _build(tmp_path, "Rt", 400, seed=31)  # identical keys
    inner0 = join_snapshot(left, right).to_pandas()
    assert len(inner0) > 0
    k = inner0.iloc[0]
    # tombstone that key on the right side, stamped above the stream
    rows = pa.table(
        {
            "conv_id": pa.array([k["conv_id"]], pa.string()),
            "turn_idx": pa.array([int(k["turn_idx"])], pa.int64()),
            "op": pa.array(["D"], pa.string()),
        }
    )
    ing.apply_changes(right, rows, batch_id="kill-one", ts_us=10**18)
    inner1 = join_snapshot(left, right).to_pandas()
    assert len(inner1) == len(inner0) - 1
    gone = (inner1["conv_id"] == k["conv_id"]) & (
        inner1["turn_idx"] == k["turn_idx"]
    )
    assert not gone.any()
    # left join keeps the row with null right columns
    lj = join_snapshot(left, right, how="left").to_pandas()
    row = lj[(lj["conv_id"] == k["conv_id"]) & (lj["turn_idx"] == k["turn_idx"])]
    assert len(row) == 1 and pd.isna(row.iloc[0]["text_r"])


def test_join_view_incremental(tmp_path, ray_session):
    left = _build(tmp_path, "Lv", 600, seed=41)
    right = _build(tmp_path, "Rv", 400, seed=43)
    vd = str(tmp_path / "jview")
    s1 = refresh_join_view(left, right, vd)
    assert s1["refreshed"] > 0 and s1["skipped"] == 0
    exp = _oracle(left, right, "inner")
    got = _got(read_join_view(vd), list(exp.columns))
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)

    # nothing changed -> nothing recomputed
    s2 = refresh_join_view(left, right, vd)
    assert s2["refreshed"] == 0 and s2["skipped"] == s1["refreshed"]

    # a small left-side continuation touches SOME partitions only
    wm = int(left.watermarks().max())
    ev2 = fx.make_change_events(8, n_convs=1, turns_per_conv=2, seed=77)
    ev2 = ev2.set_column(
        0,
        "seq",
        pa.array((ev2.column("seq").to_numpy() + wm + 1).astype(np.int64)),
    )
    segs = fx.write_segments(ev2, str(tmp_path / "wal_Lv2"), n_segments=1)
    ing.run_stream(left, segs, segments_per_epoch=1)
    s3 = refresh_join_view(left, right, vd)
    assert 0 < s3["refreshed"] < s1["refreshed"]
    exp = _oracle(left, right, "inner")
    got = _got(read_join_view(vd), list(exp.columns))
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)

    # a different spec against the same view dir refuses
    with pytest.raises(ValueError, match="different spec"):
        refresh_join_view(left, right, vd, how="left")


def test_join_view_projection_and_time_travel(tmp_path, ray_session):
    left = _build(tmp_path, "Lp", 500, seed=51)
    right = _build(tmp_path, "Rp", 300, seed=53)
    ds = join_snapshot(
        left,
        right,
        columns_left=["role"],
        columns_right=["text"],
    )
    df = ds.to_pandas()
    assert sorted(df.columns) == sorted(["conv_id", "turn_idx", "role", "text"])
    # per-side epoch travel: right as of its FIRST epoch
    e1 = right.effective_manifests()[0].epoch
    old = join_snapshot(left, right, as_of_epoch_right=e1).to_pandas()
    lt = ing.snapshot(left).to_pandas()
    rt = ing.snapshot(right, as_of_epoch=e1).to_pandas()
    overlap = [c for c in rt.columns if c in lt.columns and c not in KEYS]
    exp = lt.merge(
        rt.rename(columns={c: c + "_r" for c in overlap}), on=KEYS
    )
    assert len(old) == len(exp)


def test_join_view_sees_restore(tmp_path, ray_session):
    """A RESTORE on one side rewinds partition versions; the view's
    != staleness rule must recompute those partitions, not skip them."""
    from xgeo_ray.pipelines.ingest import restore

    left = _build(tmp_path, "Lr", 400, seed=61)
    right = _build(tmp_path, "Rr", 300, seed=63)
    vd = str(tmp_path / "jv")
    refresh_join_view(left, right, vd)
    e1 = left.effective_manifests()[0].epoch
    restore(left, e1)
    s = refresh_join_view(left, right, vd)
    assert s["refreshed"] > 0
    exp = _oracle(left, right, "inner")
    got = _got(read_join_view(vd), list(exp.columns))
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)
