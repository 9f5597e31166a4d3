"""history="full" table policy: deltas retain every distinct (key, seq)
version, making event-time travel exact to the EVENT (collapsed tables
are epoch-granular by design) and the changes feed full-fidelity.
Minor compaction stays history-preserving; a full compact folds to
state and re-arms the travel guard.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _ev(rows):
    return pa.table(
        {
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows]),
            "conv_id": pa.array([r[2] for r in rows]),
            "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
            "text": pa.array([r[4] for r in rows]),
            "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
        }
    )


def _state(t, **kw):
    df = ing.snapshot(t, **kw).to_pandas()
    if "conv_id" not in df.columns:  # fully-empty snapshot
        return df
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@pytest.fixture()
def versions(tmp_path):
    """One key with three versions inside ONE epoch (t=100/200/300),
    plus a second key for ballast."""
    ev = _ev(
        [
            (0, "I", "c0", 0, "v1", 100),
            (1, "U", "c0", 0, "v2", 200),
            (2, "U", "c0", 0, "v3", 300),
            (3, "I", "c1", 0, "other", 150),
        ]
    )
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=1)
    return segs, tmp_path


def test_exact_event_time_travel(versions):
    segs, tmp_path = versions
    th = DeltaTable.create(
        str(tmp_path / "h"), num_partitions=2, num_salts=1, history="full"
    )
    ing.ingest_segments(th, segs)
    # exact: T=250 sees v2; T=150 sees v1; T=99 sees no c0 row
    s = _state(th, as_of_ts_us=250)
    assert s[s.conv_id == "c0"].iloc[0].text == "v2"
    s = _state(th, as_of_ts_us=150)
    assert s[s.conv_id == "c0"].iloc[0].text == "v1"
    s = _state(th, as_of_ts_us=99)
    assert s.empty or (s.conv_id == "c0").sum() == 0
    # latest state identical to a collapsed table's
    tc = DeltaTable.create(str(tmp_path / "c"), num_partitions=2, num_salts=1)
    ing.ingest_segments(tc, segs)
    pd.testing.assert_frame_equal(_state(th), _state(tc))
    # the collapsed table CANNOT see the within-epoch v1/v2 (documented)
    sc = _state(tc, as_of_ts_us=250)
    assert (sc.conv_id == "c0").sum() == 0


def test_history_parity_on_stream(tmp_path):
    """Full-history and collapsed tables agree on the final state over a
    realistic duplicate-bearing stream; the history table's deltas hold
    every distinct version."""
    ev = fx.make_change_events(
        1500, n_convs=10, turns_per_conv=5, dup_fraction=0.05
    )
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=4)
    th = DeltaTable.create(
        str(tmp_path / "h"), num_partitions=4, num_salts=1, history="full"
    )
    tc = DeltaTable.create(str(tmp_path / "c"), num_partitions=4, num_salts=1)
    ms_h = ing.run_stream(th, segs, segments_per_epoch=2)
    ing.run_stream(tc, segs, segments_per_epoch=2)
    pd.testing.assert_frame_equal(_state(th), _state(tc))
    # every distinct (key, seq) is retained: applied == distinct events
    n_versions = sum(m.totals["applied"] for m in ms_h)
    distinct = (
        ev.group_by(["conv_id", "turn_idx", "seq"]).aggregate([]).num_rows
    )
    assert n_versions == distinct


def test_minor_compact_preserves_history(versions):
    segs, tmp_path = versions
    th = DeltaTable.create(
        str(tmp_path / "h"), num_partitions=2, num_salts=1, history="full"
    )
    ing.ingest_segments(th, segs)
    more = _ev([(4, "U", "c1", 0, "other2", 400)])
    segs2 = fx.write_segments(more, str(tmp_path / "wal2"), n_segments=1)
    ing.ingest_segments(th, segs2)
    m = ing.compact(th, minor=True)
    assert m is not None and m.kind == "compact_minor"
    assert max(len(v) for v in th.partition_files().values()) == 1
    # travel through the fold is still exact — the fold kept versions
    s = _state(th, as_of_ts_us=250)
    assert s[s.conv_id == "c0"].iloc[0].text == "v2"
    # a FULL compact folds to state: the guard must then refuse
    ing.compact(th)
    with pytest.raises(ValueError, match="compaction"):
        ing.snapshot(th, as_of_ts_us=250).to_pandas()
    # latest state unscathed
    assert _state(th)[lambda d: d.conv_id == "c0"].iloc[0].text == "v3"


def test_changes_feed_carries_versions(versions):
    segs, tmp_path = versions
    th = DeltaTable.create(
        str(tmp_path / "h"), num_partitions=2, num_salts=1, history="full"
    )
    ing.ingest_segments(th, segs)
    feed = ing.changes(th).to_pandas()
    assert (feed.conv_id == "c0").sum() == 3  # all three versions


def test_history_additive_sums_exact(tmp_path):
    rng = np.random.default_rng(9)
    n = 600
    ev = pa.table(
        {
            "seq": pa.array(np.arange(n, dtype=np.int64)),
            "op": pa.array(["U"] * n),
            "conv_id": pa.array([f"c{rng.integers(0, 8)}" for _ in range(n)]),
            "turn_idx": pa.array(rng.integers(0, 3, n).astype("int32")),
            "amount": pa.array(rng.integers(1, 7, n).astype("int64")),
            "ts": pa.array(
                (np.arange(n) * 1000).astype("int64"), pa.timestamp("us")
            ),
        }
    )
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=2)
    th = DeltaTable.create(
        str(tmp_path / "h"),
        num_partitions=4,
        num_salts=1,
        merge_policy="additive",
        history="full",
    )
    ing.run_stream(th, segs, segments_per_epoch=1)
    got = (
        _state(th)[["conv_id", "turn_idx", "amount"]]
        .astype({"amount": "int64"})
    )
    want = (
        ev.to_pandas()
        .groupby(["conv_id", "turn_idx"], as_index=False)["amount"]
        .sum()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    # event-time partial sum is exact too
    mid = 300 * 1000
    got_mid = (
        _state(th, as_of_ts_us=mid)[["conv_id", "turn_idx", "amount"]]
        .astype({"amount": "int64"})
        .reset_index(drop=True)
    )
    evp = ev.to_pandas()
    evp["ts_us"] = (np.arange(n) * 1000).astype("int64")
    want_mid = (
        evp[evp.ts_us <= mid]
        .groupby(["conv_id", "turn_idx"], as_index=False)["amount"]
        .sum()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_mid, want_mid)


def test_history_policy_persisted_and_validated(tmp_path):
    t = DeltaTable.create(str(tmp_path / "t"), history="full")
    assert DeltaTable.open(t.root).history == "full"
    with pytest.raises(ValueError, match="history"):
        DeltaTable.create(str(tmp_path / "bad"), history="everything")


def test_history_dedup_catches_ts_altered_redelivery(tmp_path):
    """A redelivered (key, seq) copy whose ts was altered in flight
    must still drop — dedup runs under its own (key, seq) sort, not
    the (key, ts, seq) output order."""
    ev = _ev(
        [
            (0, "I", "c0", 0, "v1", 100),
            (1, "U", "c0", 0, "v2", 200),
        ]
    )
    dup = _ev([(0, "I", "c0", 0, "v1", 300)])  # same seq, altered ts
    segs = fx.write_segments(ev, str(tmp_path / "w1"), n_segments=1)
    segs += fx.write_segments(dup, str(tmp_path / "w2"), n_segments=1)
    th = DeltaTable.create(
        str(tmp_path / "h"), num_partitions=2, num_salts=1, history="full"
    )
    m = ing.ingest_segments(th, segs)  # one epoch, both segments
    assert m.totals["applied"] == 2  # v1, v2 — not the phantom copy
    feed = ing.changes(th).to_pandas()
    assert len(feed) == 2
    assert _state(th).iloc[0].text == "v2"
