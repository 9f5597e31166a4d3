"""Incremental PK join views (``ivm.sync_join``): a joined DeltaTable
maintained exactly-once from BOTH sides' change streams at change-volume
cost, parity-checked against a pandas join of the side snapshots."""

import pandas as pd
import pyarrow as pa
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.pipelines import ivm
from xgeo_ray.state import consumers as cons
from xgeo_ray.state.delta_table import DeltaTable

_PAY = ["role", "text", "tool"]


def _mk_side(root, seed, num_partitions=4, num_salts=2, n_events=600):
    ev = fx.make_change_events(
        n_events, n_convs=8, turns_per_conv=5, dup_fraction=0.0, seed=seed
    )
    segs = fx.write_segments(ev, f"{root}/wal", n_segments=3)
    t = DeltaTable.create(
        f"{root}/table", num_partitions=num_partitions, num_salts=num_salts
    )
    return t, segs


def _mk_sink(root, left, right, how="inner"):
    return DeltaTable.create(
        f"{root}/sink",
        num_partitions=4,
        num_salts=1,
        base_schema=ivm.join_sink_schema(left, right, how=how),
    )


def _oracle(left, right, how="inner"):
    lf = ing.snapshot(left).to_pandas()[["conv_id", "turn_idx"] + _PAY]
    rf = ing.snapshot(right).to_pandas()[["conv_id", "turn_idx"] + _PAY]
    rf = rf.rename(columns={c: "r_" + c for c in _PAY})
    m = lf.merge(
        rf,
        on=["conv_id", "turn_idx"],
        how="inner" if how == "inner" else "left",
        indicator=how == "left",
    )
    if how == "left":
        m["r_exists"] = (m.pop("_merge") == "both").astype(bool)
    return m.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _got(sink):
    df = ing.snapshot(sink).to_pandas().drop(columns=["ts"])
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _check(sink, left, right, how="inner"):
    want = _oracle(left, right, how)
    got = _got(sink)[list(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_inner_join_follows_both_streams(tmp_path):
    # deliberately MISALIGNED partitioning: 4x2 vs 3x1
    left, lsegs = _mk_side(str(tmp_path / "L"), seed=11)
    right, rsegs = _mk_side(
        str(tmp_path / "R"), seed=22, num_partitions=3, num_salts=1
    )
    sink = _mk_sink(str(tmp_path), left, right)

    ing.run_stream(left, lsegs[:1], segments_per_epoch=1)
    ing.run_stream(right, rsegs[:1], segments_per_epoch=1)
    s = ivm.sync_join(left, right, sink)
    assert s["keys"] > 0 and s["synced_epochs"] == 2
    _check(sink, left, right)

    ing.run_stream(left, lsegs[:2], segments_per_epoch=1)  # left advances
    s = ivm.sync_join(left, right, sink)
    assert s["synced_epochs"] == 1
    _check(sink, left, right)

    ing.run_stream(right, rsegs, segments_per_epoch=1)  # right advances 2
    ing.run_stream(left, lsegs, segments_per_epoch=1)
    ivm.sync_join(left, right, sink)
    _check(sink, left, right)

    # no new commits: a further sync is a structural no-op
    s = ivm.sync_join(left, right, sink)
    assert s["synced_epochs"] == 0 and s["keys"] == 0
    _check(sink, left, right)


def test_left_join_exists_flag(tmp_path):
    left, lsegs = _mk_side(str(tmp_path / "L"), seed=31)
    right, rsegs = _mk_side(str(tmp_path / "R"), seed=42)
    sink = _mk_sink(str(tmp_path), left, right, how="left")
    ing.run_stream(left, lsegs, segments_per_epoch=1)
    ing.run_stream(right, rsegs[:2], segments_per_epoch=1)
    ivm.sync_join(left, right, sink, how="left")
    _check(sink, left, right, how="left")
    got = _got(sink)
    assert (~got["r_exists"]).any(), "expected some unmatched left rows"
    assert got.loc[~got["r_exists"], "r_text"].isna().all()

    ing.run_stream(right, rsegs, segments_per_epoch=1)
    ivm.sync_join(left, right, sink, how="left")
    _check(sink, left, right, how="left")


def test_delete_retracts_join_row(tmp_path):
    left, lsegs = _mk_side(str(tmp_path / "L"), seed=11)
    right, rsegs = _mk_side(str(tmp_path / "R"), seed=22)
    sink = _mk_sink(str(tmp_path), left, right)
    ing.run_stream(left, lsegs, segments_per_epoch=1)
    ing.run_stream(right, rsegs, segments_per_epoch=1)
    ivm.sync_join(left, right, sink)
    joined = _got(sink)
    assert joined.num_rows if hasattr(joined, "num_rows") else len(joined)
    key = joined.iloc[0]
    ing.apply_changes(
        right,
        pa.table(
            {
                "conv_id": pa.array([key["conv_id"]], pa.string()),
                "turn_idx": pa.array([int(key["turn_idx"])], pa.int32()),
                "op": pa.array(["D"], pa.string()),
            }
        ),
        batch_id="kill-right",
    )
    ivm.sync_join(left, right, sink)
    got = _got(sink)
    assert not (
        (got["conv_id"] == key["conv_id"])
        & (got["turn_idx"] == key["turn_idx"])
    ).any()
    _check(sink, left, right)


def test_replay_converges_after_rewind(tmp_path):
    """A crash between the sink upsert and the acks replays the window;
    rewinding both cursors to zero is the worst-case replay — the
    recomputation must converge to the same joined state."""
    import hashlib
    import os

    left, lsegs = _mk_side(str(tmp_path / "L"), seed=5)
    right, rsegs = _mk_side(str(tmp_path / "R"), seed=6)
    sink = _mk_sink(str(tmp_path), left, right)
    ing.run_stream(left, lsegs[:2], segments_per_epoch=1)
    ing.run_stream(right, rsegs, segments_per_epoch=1)
    ivm.sync_join(left, right, sink)
    ing.run_stream(left, lsegs, segments_per_epoch=1)
    ivm.sync_join(left, right, sink)
    before = _got(sink)

    sink_id = hashlib.sha1(
        os.path.abspath(sink.root).encode()
    ).hexdigest()[:10]
    assert cons.rewind(left, f"join-{sink_id}-L", 0) == 0
    assert cons.rewind(right, f"join-{sink_id}-R", 0) == 0
    s = ivm.sync_join(left, right, sink)
    assert s["keys"] > 0  # full replay actually re-upserted
    pd.testing.assert_frame_equal(_got(sink), before)
    _check(sink, left, right)


def test_spec_pin_and_guards(tmp_path):
    left, lsegs = _mk_side(str(tmp_path / "L"), seed=1)
    right, rsegs = _mk_side(str(tmp_path / "R"), seed=2)
    sink = _mk_sink(str(tmp_path), left, right)
    ing.run_stream(left, lsegs[:1], segments_per_epoch=1)
    ing.run_stream(right, rsegs[:1], segments_per_epoch=1)
    ivm.sync_join(left, right, sink)
    with pytest.raises(ValueError, match="spec changed"):
        ivm.sync_join(left, right, sink, right_prefix="rhs_")
    with pytest.raises(ValueError, match="spec changed"):
        ivm.sync_join(left, right, sink, how="left")
    with pytest.raises(ValueError, match="how must be"):
        ivm.sync_join(left, right, sink, how="full")

    additive = DeltaTable.create(
        str(tmp_path / "add"),
        num_partitions=2,
        num_salts=1,
        base_schema=ivm.join_sink_schema(left, right),
        merge_policy="additive",
    )
    with pytest.raises(ValueError, match="lww"):
        ivm.sync_join(left, right, additive)

    # prefixed-name collision refuses at schema build time
    with pytest.raises(ValueError, match="collides"):
        ivm.join_sink_schema(left, right, right_prefix="")
    with pytest.raises(ValueError, match="not payload columns"):
        ivm.join_sink_schema(left, right, left_columns=["conv_id"])


def test_restore_guard(tmp_path):
    left, lsegs = _mk_side(str(tmp_path / "L"), seed=7)
    right, rsegs = _mk_side(str(tmp_path / "R"), seed=8)
    sink = _mk_sink(str(tmp_path), left, right)
    ing.run_stream(left, lsegs, segments_per_epoch=1)
    ing.run_stream(right, rsegs[:1], segments_per_epoch=1)
    ivm.sync_join(left, right, sink)
    ing.restore(left, 1, force=True)
    with pytest.raises(ValueError, match="restored past"):
        ivm.sync_join(left, right, sink)


def test_lookup_many_as_of_epoch(tmp_path):
    """The pinned-epoch batch lookup sync_join's consistent reads rely
    on: as-of lookups equal the as-of snapshot filtered to the keys."""
    left, lsegs = _mk_side(str(tmp_path / "L"), seed=9)
    ing.run_stream(left, lsegs, segments_per_epoch=1)
    assert left.latest_epoch() >= 2
    for epoch in (1, 2):
        snap = (
            ing.snapshot(left, as_of_epoch=epoch)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        convs = sorted(set(snap["conv_id"]))[:5]
        got = (
            ing.lookup_many(left, convs, as_of_epoch=epoch)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want = (
            snap[snap["conv_id"].isin(convs)]
            .reset_index(drop=True)[list(got.columns)]
        )
        pd.testing.assert_frame_equal(got, want)


def test_cli_join_sync(tmp_path, capsys):
    import json

    from xgeo_ray.__main__ import main

    left, lsegs = _mk_side(str(tmp_path / "L"), seed=13)
    right, rsegs = _mk_side(str(tmp_path / "R"), seed=14)
    ing.run_stream(left, lsegs, segments_per_epoch=1)
    ing.run_stream(right, rsegs, segments_per_epoch=1)
    sink_root = str(tmp_path / "sink")
    assert main(
        [
            "create",
            sink_root,
            "--num-partitions",
            "4",
            "--num-salts",
            "1",
            "--join-of",
            left.root,
            right.root,
        ]
    ) in (0, None)
    assert main(
        ["join-sync", sink_root, left.root, right.root]
    ) in (0, None)
    out = [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
    ]
    assert out[-1]["keys"] > 0
    _check(DeltaTable.open(sink_root), left, right)
