"""SCD Type-2 dimension views (ivm.sync_scd2 / read_scd2 / read_scd2_asof).

The view must hold one row per VERSION of each source key with exact
validity intervals, under any sync cadence; read_scd2_asof must match
the engine's own snapshot(as_of_ts_us=T) row for row (both are
epoch-granular on a collapsed source); a replayed window (cursor
rewind after a crash between apply and ack) must no-op."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.pipelines import ivm
from xgeo_ray.state import consumers as cons
from xgeo_ray.state.delta_table import DeltaTable

PAYLOAD = ["role", "text", "tool"]


def _setup(tmp_path, n_events=900, n_convs=8, n_segments=3):
    root = str(tmp_path)
    events = fx.make_change_events(
        n_events, n_convs=n_convs, turns_per_conv=4
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=n_segments)
    src = DeltaTable.create(f"{root}/src", num_partitions=8, num_salts=2)
    sink = DeltaTable.create(
        f"{root}/sink",
        num_partitions=4,
        num_salts=1,
        base_schema=ivm.scd2_schema(src),
    )
    return src, sink, segs


def _eq(a, b):
    return (pd.isna(a) and pd.isna(b)) or a == b


def _expected_versions(src, payload=None) -> pd.DataFrame:
    """Reference SCD2 walker over the one-shot before/after feed."""
    payload = payload or PAYLOAD
    feed = ivm.changes_with_before(src, 0).to_pandas()
    feed = feed.sort_values(["conv_id", "turn_idx", "_epoch"])
    out = {}
    for r in feed.to_dict("records"):
        ts = pd.Timestamp(r["ts"]).value // 1000
        key = (r["conv_id"], r["turn_idx"])
        noop = bool(r["_before_exists"] and r["_after_exists"])
        if noop:
            bts = pd.Timestamp(r["_before_ts"]).value // 1000
            noop = ts == bts and all(
                _eq(r[c], r["_before_" + c]) for c in payload
            )
        if noop:
            continue
        if r["_before_exists"]:
            bts = pd.Timestamp(r["_before_ts"]).value // 1000
            out[key + (bts,)] = {
                **{c: r["_before_" + c] for c in payload},
                "valid_to": ts,
            }
        if r["_after_exists"]:
            out[key + (ts,)] = {
                **{c: r[c] for c in payload},
                "valid_to": None,
            }
    rows = [
        {
            "src_conv_id": k[0],
            "src_turn_idx": k[1],
            "valid_from": k[2],
            **v,
        }
        for k, v in out.items()
    ]
    return _norm(pd.DataFrame(rows), payload)


def _norm(df, payload=None) -> pd.DataFrame:
    payload = payload or PAYLOAD
    cols = ["src_conv_id", "src_turn_idx", "valid_from", *payload, "valid_to"]
    df = df[cols].copy()
    for c in ("valid_from", "valid_to", "src_turn_idx"):
        df[c] = df[c].astype("Int64")
    for c in payload:
        df[c] = df[c].where(~df[c].isna(), None)
    return df.sort_values(
        ["src_conv_id", "src_turn_idx", "valid_from"]
    ).reset_index(drop=True)


def _view(sink, payload=None) -> pd.DataFrame:
    return _norm(ivm.read_scd2(sink).to_pandas(), payload)


def test_scd2_versions_match_reference(tmp_path):
    src, sink, segs = _setup(tmp_path)
    ing.run_stream(src, segs, segments_per_epoch=1)
    st = ivm.sync_scd2(src, sink)
    assert st["synced_epochs"] == 3 and st["versions"] > 0
    pd.testing.assert_frame_equal(_view(sink), _expected_versions(src))
    # caught-up sync is a no-op
    assert ivm.sync_scd2(src, sink)["synced_epochs"] == 0


def test_scd2_any_cadence_same_view(tmp_path):
    # sync after every epoch
    src1, sink1, segs = _setup(tmp_path / "a")
    for i in range(len(segs)):
        ing.run_stream(src1, segs[: i + 1], segments_per_epoch=1)
        ivm.sync_scd2(src1, sink1)
    # one sync at the end
    src2, sink2, segs2 = _setup(tmp_path / "b")
    ing.run_stream(src2, segs2, segments_per_epoch=1)
    ivm.sync_scd2(src2, sink2)
    pd.testing.assert_frame_equal(_view(sink1), _view(sink2))


def test_scd2_asof_matches_snapshot(tmp_path):
    src, sink, segs = _setup(tmp_path, n_events=1200)
    ing.run_stream(src, segs, segments_per_epoch=1)
    ivm.sync_scd2(src, sink)
    state = ing.snapshot(src).to_pandas()
    ts_us = np.sort(state["ts"].astype("int64").to_numpy() // 1000)
    probes = [
        int(ts_us[0]) - 1,  # before everything: empty
        int(ts_us[len(ts_us) // 3]),
        int(ts_us[2 * len(ts_us) // 3]) + 1,
        int(ts_us[-1]) + 10,  # after everything: current state
    ]
    for t in probes:
        want = ing.snapshot(src, as_of_ts_us=t).to_pandas()
        if want.empty:
            assert ivm.read_scd2_asof(sink, t).count() == 0, f"T={t}"
            continue
        want = (
            want[["conv_id", "turn_idx", *PAYLOAD, "ts"]]
            .rename(
                columns={
                    "conv_id": "src_conv_id",
                    "turn_idx": "src_turn_idx",
                }
            )
            .sort_values(["src_conv_id", "src_turn_idx"])
            .reset_index(drop=True)
        )
        got = (
            ivm.read_scd2_asof(sink, t)
            .to_pandas()
            .sort_values(["src_conv_id", "src_turn_idx"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want), f"T={t}"
        # one live version per key, its valid_from = the winner's ts
        assert got["valid_from"].tolist() == [
            v.value // 1000 for v in pd.to_datetime(want["ts"])
        ], f"T={t}"
        for c in PAYLOAD:
            gl = got[c].where(~got[c].isna(), None).tolist()
            wl = want[c].where(~want[c].isna(), None).tolist()
            assert gl == wl, f"T={t} col={c}"


def test_scd2_replayed_window_noops(tmp_path):
    import hashlib
    import os

    src, sink, segs = _setup(tmp_path)
    ing.run_stream(src, segs, segments_per_epoch=1)
    ivm.sync_scd2(src, sink)
    before = _view(sink)
    group = (
        "scd2-"
        + hashlib.sha1(os.path.abspath(sink.root).encode()).hexdigest()[:10]
    )
    # crash between apply and ack == cursor behind an applied batch:
    # rewind and replay — the identical batch id must no-op
    cons.rewind(src, group, 0)
    st = ivm.sync_scd2(src, sink)
    assert st["synced_epochs"] == 3
    pd.testing.assert_frame_equal(_view(sink), before)


def test_scd2_delete_closes_and_reinsert_reopens(tmp_path):
    root = str(tmp_path)
    base = pa.table(
        {
            "seq": pa.array([0, 1], pa.int64()),
            "op": pa.array(["I", "I"]),
            "conv_id": pa.array(["c1", "c2"], pa.string()),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": pa.array(["user", "user"]),
            "text": pa.array(["v1", "other"]),
            "tool": pa.array([None, None], pa.string()),
            "ts": pa.array([1_000_000, 1_000_000], pa.timestamp("us")),
        }
    )
    upd = pa.table(
        {
            "seq": pa.array([2, 3], pa.int64()),
            "op": pa.array(["U", "D"]),
            "conv_id": pa.array(["c1", "c2"], pa.string()),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": pa.array(["user", None]),
            "text": pa.array(["v2", None]),
            "tool": pa.array([None, None], pa.string()),
            "ts": pa.array([2_000_000, 3_000_000], pa.timestamp("us")),
        }
    )
    re_ins = pa.table(
        {
            "seq": pa.array([4], pa.int64()),
            "op": pa.array(["I"]),
            "conv_id": pa.array(["c2"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["assistant"]),
            "text": pa.array(["back"]),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([4_000_000], pa.timestamp("us")),
        }
    )
    segs = []
    for i, t in enumerate([base, upd, re_ins]):
        segs += fx.write_segments(t, f"{root}/wal{i}", n_segments=1)
    src = DeltaTable.create(f"{root}/src", num_partitions=4, num_salts=1)
    sink = DeltaTable.create(
        f"{root}/sink",
        num_partitions=2,
        num_salts=1,
        base_schema=ivm.scd2_schema(src),
    )
    ing.run_stream(src, segs, segments_per_epoch=1)
    ivm.sync_scd2(src, sink)
    def vto(df):
        return [None if pd.isna(x) else int(x) for x in df["valid_to"]]

    got = _view(sink)
    c1 = got[got["src_conv_id"] == "c1"]
    assert c1["text"].tolist() == ["v1", "v2"]
    assert vto(c1) == [2_000_000, None]
    c2 = got[got["src_conv_id"] == "c2"]
    # insert -> delete closes at 3s -> reinsert reopens at 4s
    assert c2["text"].tolist() == ["other", "back"]
    assert vto(c2) == [3_000_000, None]
    pd.testing.assert_frame_equal(got, _expected_versions(src))


def test_scd2_join_point_in_time(tmp_path):
    """Temporal join: every fact row gets the dimension version valid
    at ITS OWN ts — checked per row against the SCD2 view intervals,
    including pre-birth, mid-version, post-update, post-delete and
    unknown-key facts."""
    import pyarrow as pa
    import ray

    src, sink, segs = _setup(tmp_path, n_events=900)
    ing.run_stream(src, segs, segments_per_epoch=1)
    ivm.sync_scd2(src, sink)
    view = _view(sink)

    keys = (
        view[["src_conv_id", "src_turn_idx"]]
        .drop_duplicates()
        .head(12)
        .values.tolist()
    )
    keys.append(["no-such-conv", 99])  # unknown key -> nulls
    lo = int(view["valid_from"].min())
    hi = int(view["valid_from"].max())
    probes = [lo - 10, lo, (lo + hi) // 2, hi, hi + 10_000_000]
    rows = [
        (c, t, ts, i)
        for i, (c, t) in enumerate(keys)
        for ts in probes
    ]
    facts = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([r[0] for r in rows], pa.string()),
                "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
                "ts": pa.array([r[2] for r in rows], pa.int64()),
                "fact_id": pa.array(
                    [r[3] * 100 + j for j, r in enumerate(rows)], pa.int64()
                ),
            }
        )
    )
    got = (
        ivm.scd2_join(facts, sink)
        .to_pandas()
        .sort_values("fact_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(rows)

    def ref(c, t, ts):
        v = view[
            (view["src_conv_id"] == c)
            & (view["src_turn_idx"] == t)
            & (view["valid_from"] <= ts)
            & (view["valid_to"].isna() | (view["valid_to"] > ts))
        ]
        assert len(v) <= 1
        return None if v.empty else v.iloc[0]

    for r in got.to_dict("records"):
        want = ref(r["conv_id"], r["turn_idx"], r["ts"])
        if want is None:
            assert pd.isna(r["dim_valid_from"]), r
            assert pd.isna(r["dim_text"]), r
        else:
            assert r["dim_valid_from"] == want["valid_from"], r
            for c in PAYLOAD:
                assert _eq(r["dim_" + c], want[c]), (r, want)


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_scd2_random_streams_any_cadence(tmp_path, seed):
    """Seeded random op streams (deletes, reinserts, ts collisions,
    same-instant updates) at a random sync cadence still equal the
    reference walker — the interactions single-shape tests miss."""
    rng = np.random.default_rng(seed)
    n = 400
    convs = [f"c{rng.integers(0, 5)}" for _ in range(n)]
    ops = rng.choice(["I", "U", "D"], p=[0.5, 0.35, 0.15], size=n)
    # quantized ts -> deliberate collisions and same-instant updates
    ts = (np.sort(rng.integers(0, 2000, n)) // 4 * 4 + 1) * 1_000_000
    events = pa.table(
        {
            "seq": pa.array(np.arange(n, dtype=np.int64)),
            "op": pa.array(ops),
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(
                rng.integers(0, 3, n).astype("int32")
            ),
            "role": pa.array(
                [None if o == "D" else "user" for o in ops], pa.string()
            ),
            "text": pa.array(
                [None if o == "D" else f"v{i}" for i, o in enumerate(ops)],
                pa.string(),
            ),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    root = str(tmp_path)
    n_segs = int(rng.integers(2, 6))
    segs = fx.write_segments(events, f"{root}/wal", n_segments=n_segs)
    src = DeltaTable.create(f"{root}/src", num_partitions=4, num_salts=2)
    sink = DeltaTable.create(
        f"{root}/sink",
        num_partitions=2,
        num_salts=1,
        base_schema=ivm.scd2_schema(src),
    )
    done = 0
    while done < len(segs):
        step = int(rng.integers(1, len(segs) - done + 1))
        done += step
        ing.run_stream(src, segs[:done], segments_per_epoch=1)
        if rng.random() < 0.7 or done == len(segs):
            ivm.sync_scd2(src, sink)
    ivm.sync_scd2(src, sink)
    pd.testing.assert_frame_equal(_view(sink), _expected_versions(src))


def test_scd2_survives_source_schema_evolution(tmp_path):
    """A payload column appearing mid-stream (and turn_idx widening)
    flows through the feed into the sink — the sink's envelope evolves
    on apply, pre-evolution versions read the new column as null."""
    root = str(tmp_path)
    events = fx.make_change_events(600, n_convs=6, turns_per_conv=4)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=4, evolve_from=2)
    src = DeltaTable.create(f"{root}/src", num_partitions=4, num_salts=2)
    sink = DeltaTable.create(
        f"{root}/sink",
        num_partitions=2,
        num_salts=1,
        base_schema=ivm.scd2_schema(src),
    )
    ing.run_stream(src, segs[:2], segments_per_epoch=1)
    ivm.sync_scd2(src, sink)  # pre-evolution sync
    ing.run_stream(src, segs, segments_per_epoch=1)
    ivm.sync_scd2(src, sink)  # evolved window
    payload = PAYLOAD + ["meta"]
    got = _view(sink, payload)
    assert "meta" in got.columns
    pd.testing.assert_frame_equal(got, _expected_versions(src, payload))


def test_scd2_retention_expires_closed_versions(tmp_path):
    """Version-history retention: delete_where over valid_to expires
    closed versions older than a horizon; live versions and recent
    history survive; as-of reads inside the retained window still
    match the walker restricted to surviving versions."""
    import pyarrow.compute as pc

    src, sink, segs = _setup(tmp_path)
    ing.run_stream(src, segs, segments_per_epoch=1)
    ivm.sync_scd2(src, sink)
    view = _view(sink)
    closed = view[view["valid_to"].notna()]
    assert len(closed) > 4
    horizon = int(closed["valid_to"].astype("int64").median())

    def expired(b):
        return pc.and_(
            pc.is_valid(b.column("valid_to")),
            pc.less(b.column("valid_to"), pa.scalar(horizon, pa.int64())),
        )

    expired.columns = ["valid_to"]
    m = ing.delete_where(sink, expired, batch_id="scd2-ttl-1")
    assert m is not None
    after = _view(sink)
    want = view[
        view["valid_to"].isna() | (view["valid_to"] >= horizon)
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(after, want)
    # replayed TTL batch is a no-op
    assert ing.delete_where(sink, expired, batch_id="scd2-ttl-1") is None


def test_scd2_list_payload_column(tmp_path):
    """A list-typed payload column (no Arrow equality kernel) must not
    break the sync: non-comparable types are conservatively treated as
    changed, which only produces idempotent same-key rewrites. The
    live rows must still match the snapshot."""
    root = str(tmp_path)
    base_schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("embedding", pa.list_(pa.float32())),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    n = 60
    rng = np.random.default_rng(5)
    events = pa.table(
        {
            "seq": pa.array(np.arange(n, dtype=np.int64)),
            "op": pa.array(["I"] * 40 + ["U"] * 10 + ["D"] * 10),
            "conv_id": pa.array(
                [f"c{i % 20}" for i in range(40)]
                + [f"c{i}" for i in range(10)]
                + [f"c{i}" for i in range(10, 20)],
                pa.string(),
            ),
            "turn_idx": pa.array(np.zeros(n, np.int32)),
            "embedding": pa.array(
                [
                    None if i >= 50 else rng.normal(size=4).tolist()
                    for i in range(n)
                ],
                pa.list_(pa.float32()),
            ),
            "ts": pa.array((np.arange(n) + 1) * 1_000_000, pa.timestamp("us")),
        }
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    src = DeltaTable.create(
        f"{root}/src", num_partitions=4, num_salts=1, base_schema=base_schema
    )
    sink = DeltaTable.create(
        f"{root}/sink",
        num_partitions=2,
        num_salts=1,
        base_schema=ivm.scd2_schema(src),
    )
    for i in (1, 2):
        ing.run_stream(src, segs[:i], segments_per_epoch=1)
        ivm.sync_scd2(src, sink)
    view = ivm.read_scd2(sink).to_pandas()
    live = view[view["valid_to"].isna()]
    snap = ing.snapshot(src).to_pandas()
    assert len(live) == len(snap)
    lv = live.sort_values("src_conv_id").reset_index(drop=True)
    sn = snap.sort_values("conv_id").reset_index(drop=True)
    assert lv["src_conv_id"].tolist() == sn["conv_id"].tolist()
    for a, b in zip(lv["embedding"], sn["embedding"]):
        assert (a is None and b is None) or list(a) == list(b)
