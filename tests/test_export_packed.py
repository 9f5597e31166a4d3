"""Token-budget packed training-shard export (ingest.export_packed +
relational.weighted_range_bounds): global key order across shard files,
conversations never split, shard token totals track the budget, pinned
resume, spec refusal, oversized-group handling."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _mk_table(tmp_path, n=800, seed=7):
    ev = fx.make_change_events(n, n_convs=30, turns_per_conv=6,
                               dup_fraction=0.0, seed=seed)
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)
    root = str(tmp_path / "t")
    ing.ingest_segments(
        DeltaTable.create(root, num_partitions=4, num_salts=1), [seg]
    )
    return DeltaTable.open(root)


def _read_shards(out, ext=".parquet"):
    files = sorted(f for f in os.listdir(out) if f.endswith(ext))
    return [pq.read_table(os.path.join(out, f)) for f in files]


def test_export_packed_order_whole_convs_and_budget(tmp_path, ray_session):
    table = _mk_table(tmp_path)
    snap = ing.snapshot(table).to_pandas()
    toks = snap.groupby("conv_id")["text"].apply(
        lambda s: int(sum(len(str(x).split()) for x in s))
    )
    total = int(toks.sum())
    budget = max(1, total // 6)

    out = str(tmp_path / "out")
    res = ing.export_packed(table, out, budget, fmt="parquet")
    assert res["total_tokens"] == total
    assert res["shards"] == -(-total // budget)

    shards = _read_shards(out)
    assert len(shards) == res["shards"]
    # global order: conv sequences concatenate ascending, convs whole
    seen_convs = []
    all_rows = 0
    for t in shards:
        convs = t.column("conv_id").to_pylist()
        assert convs == sorted(convs)
        seen_convs.extend(dict.fromkeys(convs))
        all_rows += t.num_rows
    assert all_rows == len(snap)
    assert seen_convs == sorted(set(seen_convs))  # no conv in two shards
    # shard token totals track the budget: every shard except possibly
    # the last is within [0.3x, 2.5x] of it (sampling + whole-conv skew)
    sizes = [
        int(toks.loc[list(dict.fromkeys(t.column("conv_id").to_pylist()))].sum())
        for t in shards
        if t.num_rows
    ]
    assert sum(sizes) == total
    for s in sizes[:-1]:
        assert 0.3 * budget <= s <= 2.5 * budget, (sizes, budget)


def test_export_packed_resume_and_spec_pin(tmp_path, ray_session):
    table = _mk_table(tmp_path, seed=11)
    out = str(tmp_path / "out")
    res = ing.export_packed(table, out, 200, fmt="parquet")
    assert res["shards"] >= 2
    victim = os.path.join(out, "shard-00001.parquet")
    want = open(victim, "rb").read()
    os.unlink(victim)
    res2 = ing.export_packed(table, out, 200, fmt="parquet")
    assert res2["written"] == 1
    assert res2["skipped"] == res["shards"] - 1
    assert open(victim, "rb").read() == want  # byte-identical rewrite
    # a different spec refuses
    with pytest.raises(ValueError, match="different pack spec"):
        ing.export_packed(table, out, 100, fmt="parquet")
    meta = json.load(open(os.path.join(out, "_pack_meta.json")))
    assert meta["tokens_per_shard"] == 200
    assert meta["num_shards"] == res["shards"]


def test_export_packed_oversized_conv_never_splits(tmp_path, ray_session):
    # one conv holds ~90% of all tokens: it must land whole in ONE
    # shard even though it exceeds the budget
    rows = []
    for turn in range(40):
        rows.append(("big", turn, "user", "w " * 50, 1000 + turn, "I"))
    for c in range(8):
        rows.append((f"c{c}", 0, "user", "x y z", 2000 + c, "I"))
    t = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
            "role": pa.array([r[2] for r in rows]),
            "text": pa.array([r[3] for r in rows]),
            "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "op": pa.array([r[5] for r in rows]),
            "seq": pa.array(list(range(len(rows))), pa.int64()),
        }
    )
    seg = str(tmp_path / "w.parquet")
    pq.write_table(t, seg)
    root = str(tmp_path / "t")
    ing.ingest_segments(
        DeltaTable.create(root, num_partitions=2, num_salts=1), [seg]
    )
    table = DeltaTable.open(root)
    out = str(tmp_path / "out")
    ing.export_packed(table, out, 100, fmt="parquet")
    homes = {
        s
        for s, sh in enumerate(_read_shards(out))
        if "big" in set(sh.column("conv_id").to_pylist())
    }
    assert len(homes) == 1


def test_export_packed_jsonl_and_projection(tmp_path, ray_session):
    table = _mk_table(tmp_path, n=300, seed=3)
    out = str(tmp_path / "out")
    res = ing.export_packed(
        table, out, 500, columns=["conv_id", "turn_idx", "text"], fmt="jsonl"
    )
    files = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert len(files) == res["shards"]
    rows = []
    for f in files:
        with open(os.path.join(out, f)) as fh:
            rows += [json.loads(ln) for ln in fh if ln.strip()]
    assert rows and set(rows[0]) == {"conv_id", "turn_idx", "text"}
    assert len(rows) == ing.snapshot(table).count()


def test_export_families_refuse_foreign_dirs(tmp_path, ray_session):
    table = _mk_table(tmp_path, n=200, seed=17)
    out = str(tmp_path / "out")
    ing.export_sorted(table, out, by="turn_idx", num_shards=2)
    with pytest.raises(ValueError, match="sort export"):
        ing.export_packed(table, out, 100)
    out2 = str(tmp_path / "out2")
    ing.export_packed(table, out2, 100)
    with pytest.raises(ValueError, match="pack export"):
        ing.export_sorted(table, out2, by="turn_idx", num_shards=2)
    with pytest.raises(ValueError, match="pack export"):
        ing.export_shuffled(table, out2, 2)


def test_text_bisect_matches_linear_assign():
    from xgeo_ray.functions.relational import (
        _text_bisect_left,
        range_shard_assign,
    )

    rng = np.random.default_rng(5)
    bounds = sorted({f"k{int(x):06d}" for x in rng.integers(0, 500, 100)})
    keys = [f"k{int(x):06d}" for x in rng.integers(0, 600, 2000)]
    keys += bounds[:5] + [None, None]  # exact bound hits + nulls
    arr = pa.chunked_array([pa.array(keys[:700]), pa.array(keys[700:])])
    got = _text_bisect_left(arr, bounds)
    import bisect

    for i, k in enumerate(keys):
        if k is None:
            continue  # caller overwrites null slots
        assert got[i] == bisect.bisect_left(bounds, k), (i, k)
    # end-to-end through range_shard_assign (>32 bounds takes the
    # binary-search path; a 5-bound run takes the linear path)
    n_sh = len(bounds) + 1
    assign = range_shard_assign(bounds, "k", n_sh)
    t = assign(pa.table({"k": pa.array(keys)}))
    sh = t.column("shard").to_pylist()
    for i, k in enumerate(keys):
        want = bisect.bisect_left(bounds, k) if k is not None else n_sh - 1
        assert sh[i] == want
