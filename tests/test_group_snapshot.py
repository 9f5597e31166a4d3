"""Cross-table consistent snapshot (round-5 verdict item 8): tables
fed from one demuxed stream are pinned at epochs that together reflect
ONE prefix of the source stream (ingest.group_snapshot_plan /
group_snapshot / group_tag), even when routes have ingested unevenly
or batch several input segments per epoch."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.sources.demux import demux_wal
from xgeo_ray.state import tags
from xgeo_ray.state.delta_table import DeltaTable


def _routed_stream(root, n=900, n_segments=6):
    """One seq-ordered WAL with a `table` route column (two routes),
    demuxed into per-route WAL dirs."""
    ev = fx.make_change_events(
        n, n_convs=12, turns_per_conv=5, dup_fraction=0.0
    )
    route = pa.array(
        np.where(ev.column("seq").to_numpy() % 2 == 0, "users", "orders")
    )
    ev = ev.append_column("table", route)
    segs = fx.write_segments(ev, f"{root}/binlog", n_segments=n_segments)
    routed = demux_wal(segs, f"{root}/routes")
    return ev, routed


def _mk_tables(root):
    return {
        "users": DeltaTable.create(
            f"{root}/users", num_partitions=4, num_salts=2
        ),
        "orders": DeltaTable.create(
            f"{root}/orders", num_partitions=4, num_salts=1
        ),
    }


def _oracle_state(ev: pa.Table, route: str, cut_seq: int) -> pd.DataFrame:
    df = ev.to_pandas()
    df = df[(df["table"] == route) & (df["seq"] <= cut_seq)]
    win = (
        df.sort_values(["ts", "seq"])
        .groupby(["conv_id", "turn_idx"])
        .tail(1)
    )
    win = win[win["op"] != "D"]
    return (
        win[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .astype({"turn_idx": "int64"})
    )


def _got(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return (
        df[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .astype({"turn_idx": "int64"})
    )


def test_group_snapshot_consistent_under_uneven_ingest(tmp_path):
    root = str(tmp_path)
    ev, routed = _routed_stream(root)
    tabs = _mk_tables(root)
    # CONCURRENT-INGEST SHAPE: users is fully caught up, orders lags
    # (only 3 of its 6 route segments committed)
    ing.run_stream(tabs["users"], routed["users"], segments_per_epoch=1)
    ing.run_stream(tabs["orders"], routed["orders"][:3], segments_per_epoch=1)

    plan = ing.group_snapshot(tabs)
    S = plan["cut_seq"]
    assert S >= 0
    # each pinned snapshot equals the stream prefix <= S routed to it
    for name in tabs:
        pd.testing.assert_frame_equal(
            _got(plan["datasets"][name]), _oracle_state(ev, name, S)
        )
    # the cut is the LAGGING table's watermark, and the fast table's
    # pin is strictly below its own latest (the pin did something)
    assert S == int(tabs["orders"].watermarks().max())
    assert plan["epochs"]["users"] < tabs["users"].latest_epoch()
    # unpinned reads would NOT be consistent (users is ahead)
    assert ing.snapshot(tabs["users"]).count() != plan["datasets"][
        "users"
    ].count() or int(tabs["users"].watermarks().max()) == S


def test_group_snapshot_fixpoint_with_batched_epochs(tmp_path):
    """users batches 3 input segments per epoch while orders commits
    per segment: a cut at orders' watermark can straddle a users epoch,
    so the fixpoint must step BOTH tables down to a mutually consistent
    seq."""
    root = str(tmp_path)
    ev, routed = _routed_stream(root)
    tabs = _mk_tables(root)
    ing.run_stream(tabs["users"], routed["users"], segments_per_epoch=3)
    ing.run_stream(tabs["orders"], routed["orders"][:5], segments_per_epoch=1)

    plan = ing.group_snapshot(tabs)
    S = plan["cut_seq"]
    assert S >= 0
    for name in tabs:
        pd.testing.assert_frame_equal(
            _got(plan["datasets"][name]), _oracle_state(ev, name, S)
        )
    # users' epoch boundary (3 segments = half the stream) is BELOW
    # orders' 5-of-6 watermark: the fixpoint lowered the cut
    assert S < int(tabs["orders"].watermarks().max())


def test_group_snapshot_empty_and_tag(tmp_path):
    root = str(tmp_path)
    ev, routed = _routed_stream(root)
    tabs = _mk_tables(root)
    # nothing ingested into orders: only the empty prefix is consistent
    ing.run_stream(tabs["users"], routed["users"][:2], segments_per_epoch=1)
    plan = ing.group_snapshot_plan(tabs)
    assert plan["cut_seq"] == -1
    assert plan["epochs"] == {"users": 0, "orders": 0}
    with pytest.raises(ValueError, match="no consistent cut"):
        ing.group_tag(tabs, "cutA")

    # catch orders up, tag the cut, then keep ingesting: the tag pins
    # the consistent epochs durably on BOTH tables
    ing.run_stream(tabs["orders"], routed["orders"][:2], segments_per_epoch=1)
    plan = ing.group_tag(tabs, "cutA")
    assert plan["cut_seq"] >= 0
    ing.run_stream(tabs["users"], routed["users"], segments_per_epoch=1)
    ing.run_stream(tabs["orders"], routed["orders"], segments_per_epoch=1)
    for name, t in tabs.items():
        e = tags.resolve(t, "cutA")
        assert e == plan["epochs"][name]
        pd.testing.assert_frame_equal(
            _got(ing.snapshot(t, as_of_epoch=e)),
            _oracle_state(ev, name, plan["cut_seq"]),
        )
    # fully-caught-up group: manifests alone cannot rule out a backlog
    # above the slower route's watermark, so the DEFAULT cut is
    # conservative; a caller asserting the producer's high watermark
    # (upto_seq) certifies the full prefix with every pin at latest
    hi = int(ev.column("seq").to_numpy().max())
    plan2 = ing.group_snapshot_plan(tabs, upto_seq=hi)
    assert plan2["cut_seq"] == hi
    for name, t in tabs.items():
        assert plan2["epochs"][name] == t.latest_epoch()
    # the default (no upto_seq) stays at or below the slowest watermark
    plan3 = ing.group_snapshot_plan(tabs)
    assert plan3["cut_seq"] <= min(
        int(t.watermarks().max()) for t in tabs.values()
    )
    for name in tabs:
        pd.testing.assert_frame_equal(
            _got(
                ing.snapshot(
                    tabs[name], as_of_epoch=plan3["epochs"][name]
                )
            ),
            _oracle_state(ev, name, plan3["cut_seq"]),
        )
