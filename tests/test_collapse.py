import pyarrow as pa

from xgeo_ray import fixtures as fx
from xgeo_ray.stages.collapse import (
    count_unique_keys_and_seqs,
    lww_collapse,
    merge_versions,
)


def _ev(rows):
    cols = {
        "seq": pa.array([r[0] for r in rows], pa.int64()),
        "op": [r[1] for r in rows],
        "conv_id": [r[2] for r in rows],
        "turn_idx": pa.array([r[3] for r in rows], pa.int32()),
        "role": ["user"] * len(rows),
        "text": [r[5] for r in rows],
        "tool": [""] * len(rows),
        "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
    }
    return pa.table(cols, schema=fx.CHANGE_EVENTS_SCHEMA)


def test_lww_keeps_latest_by_ts_then_seq():
    t = _ev(
        [
            (1, "I", "a", 0, 100, "v1"),
            (2, "U", "a", 0, 200, "v2"),
            (3, "U", "a", 0, 200, "v3"),  # same ts: seq breaks tie
            (9, "U", "a", 0, 150, "late"),  # higher seq but older ts: loses
        ]
    )
    out = lww_collapse(t, drop_tombstones=False)
    assert out.num_rows == 1
    assert out.column("text").to_pylist() == ["v3"]


def test_lww_tombstone_handling():
    t = _ev([(1, "I", "a", 0, 100, "v1"), (2, "D", "a", 0, 200, None)])
    kept = lww_collapse(t, drop_tombstones=False)
    assert kept.column("op").to_pylist() == ["D"]
    dropped = lww_collapse(t, drop_tombstones=True)
    assert dropped.num_rows == 0


def test_lww_exact_duplicates_collapse():
    t = _ev([(5, "I", "a", 0, 100, "x"), (5, "I", "a", 0, 100, "x")])
    out = lww_collapse(t, drop_tombstones=False)
    assert out.num_rows == 1
    keys, trips, _ = count_unique_keys_and_seqs(t)
    assert (keys, trips) == (1, 1)


def test_count_unique():
    t = _ev(
        [
            (1, "I", "a", 0, 100, "x"),
            (1, "I", "a", 0, 100, "x"),  # dup seq
            (2, "U", "a", 0, 110, "y"),  # superseding
            (3, "I", "b", 1, 100, "z"),
        ]
    )
    keys, trips, _ = count_unique_keys_and_seqs(t)
    assert keys == 2 and trips == 3


def test_merge_versions_schema_evolution():
    old = _ev([(1, "I", "a", 0, 100, "old")])
    new = fx.evolve_events(_ev([(2, "U", "a", 0, 200, "new"), (3, "I", "c", 2, 90, "c0")]))
    out = merge_versions([old, new])
    assert out.schema.field("turn_idx").type == "int64"
    assert "meta" in out.schema.names
    d = {(r["conv_id"], r["turn_idx"]): r for r in out.to_pylist()}
    assert d[("a", 0)]["text"] == "new"
    assert d[("a", 0)]["meta"] == "m2"
    assert d[("c", 2)]["meta"] is None


def test_merge_matches_naive_reducer():
    base = fx.make_transcripts(8, 6)
    ev = fx.make_change_events(800, n_convs=8, turns_per_conv=6, dup_fraction=0.04)
    base_env = base.append_column("op", pa.array(["I"] * base.num_rows)).append_column(
        "seq", pa.array([-1] * base.num_rows, pa.int64())
    )
    got = merge_versions([base_env, ev], drop_tombstones=True).drop_columns(["op", "seq"])
    want = fx.naive_final_state(base, ev)
    got = got.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.select(want.column_names).equals(want.cast(got.select(want.column_names).schema))
