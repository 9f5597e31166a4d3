"""Regression tests for the round-5 self-review findings: parquet
leaf-index stats lookup under multi-leaf (struct) columns, multimodal
codec cache semantics, binary-keyed sorted export, manifest
forward-compat on unknown entry keys, and group_tag's upto_seq
passthrough."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xgeo_ray.sources.wal import segment_seq_min


def test_segment_seq_min_with_struct_before_seq(tmp_path):
    """Row-group statistics are indexed by PHYSICAL LEAF, not Arrow
    schema position — a struct column before `seq` must not shift the
    stats lookup onto another column's leaf."""
    t = pa.table(
        {
            "conv_id": pa.array(["a", "b", "c"]),
            "tool_call": pa.array(
                [{"fn": "x", "n": 9000}, None, {"fn": "y", "n": 8000}],
                pa.struct([("fn", pa.string()), ("n", pa.int64())]),
            ),
            "seq": pa.array([42, 7, 99], pa.int64()),
        }
    )
    p = str(tmp_path / "seg.parquet")
    pq.write_table(t, p)
    assert segment_seq_min(p) == 7  # not 8000 (tool_call.n's min)


def test_segment_seq_min_plain_and_missing(tmp_path):
    t = pa.table({"seq": pa.array([5, 3, 11], pa.int64())})
    p = str(tmp_path / "s.parquet")
    pq.write_table(t, p)
    assert segment_seq_min(p) == 3
    t2 = pa.table({"x": pa.array([1])})
    p2 = str(tmp_path / "noseq.parquet")
    pq.write_table(t2, p2)
    assert segment_seq_min(p2) == -1


def test_multimodal_loader_runs_once_per_process():
    """The worker-side decoder cache must not re-invoke the loader on a
    cache hit (setdefault evaluates its default eagerly), and two
    distinct callables must not share one cache slot."""
    from xgeo_ray.functions import multimodal as mm

    calls = {"a": 0, "b": 0}

    def loader_a():
        calls["a"] += 1
        return lambda payload: (1, 1, 1)

    def loader_b():
        calls["b"] += 1
        return lambda payload: (2, 2, 2)

    batch = pa.table({"payload": pa.array([b"xx"], pa.binary())})
    s1 = mm.DecodeMedia(loader_a)
    s1(batch)
    s1(batch)
    s2 = mm.DecodeMedia(loader_a)  # same loader, fresh stage copy
    out_a = s2(batch)
    assert calls["a"] == 1  # one load per process, ever
    assert out_a.column("width")[0].as_py() == 1

    s3 = mm.DecodeMedia(loader_b)
    out_b = s3(batch)
    assert calls["b"] == 1
    assert out_b.column("width")[0].as_py() == 2  # not loader_a's decoder


def test_lambda_codecs_get_distinct_cache_keys():
    from xgeo_ray.functions import multimodal as mm

    k1 = mm.DecodeMedia(lambda: (lambda p: (1, 1, 1)))._cache_key
    k2 = mm.DecodeMedia(lambda: (lambda p: (2, 2, 2)))._cache_key
    assert k1 != k2


def test_manifest_tolerates_unknown_entry_keys(tmp_path):
    """A manifest written by a newer (or retired) format version must
    stay readable: unknown PartitionEntry keys are ignored, not fatal."""
    from xgeo_ray.state import manifest as mf

    root = str(tmp_path / "tbl")
    m = mf.Manifest(epoch=1, kind="delta")
    m.partitions["0"] = mf.PartitionEntry(part_key=0, path="d/x.parquet")
    path = mf.write_manifest(root, m)
    raw = json.loads(open(path).read())
    raw["partitions"]["0"]["min_seq"] = 123  # retired round-5 field
    raw["partitions"]["0"]["future_field"] = "zap"
    os.unlink(path)
    with open(path, "w") as f:
        json.dump(raw, f)
    got = mf.read_manifests(root)
    assert got[0].partitions["0"].part_key == 0
    assert not hasattr(got[0].partitions["0"], "future_field")


def test_sort_bounds_binary_roundtrip():
    from xgeo_ray.pipelines.ingest import (
        _decode_sort_bounds,
        _encode_sort_bounds,
    )

    bs = [b"\x00\xffabc", b"zz\x01"]
    enc = _encode_sort_bounds(bs)
    assert json.loads(json.dumps(enc)) == enc  # JSON-safe
    assert _decode_sort_bounds(json.loads(json.dumps(enc))) == bs
    assert _encode_sort_bounds(["a", "b"]) == ["a", "b"]
    assert _decode_sort_bounds([1, 2]) == [1, 2]


def test_export_sorted_binary_key(tmp_path, ray_session):
    """export_sorted by a binary column: the bounds pin must survive
    JSON (bytes cut points) and resume must accept the pinned spec."""
    from xgeo_ray import fixtures as fx
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    root = str(tmp_path / "t")
    ev = fx.make_change_events(600, n_convs=40, turns_per_conv=5,
                               dup_fraction=0.0, seed=3)
    key = pa.array(
        [bytes(reversed(c.encode())) for c in ev.column("conv_id").to_pylist()],
        pa.binary(),
    )
    ev = ev.append_column("bkey", key)
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)
    ing.ingest_segments(DeltaTable.create(root, num_partitions=4, num_salts=1), [seg])
    tbl = DeltaTable.open(root)

    out = str(tmp_path / "out")
    res = ing.export_sorted(tbl, out, by="bkey", num_shards=3)
    assert res["rows_written"] > 0
    meta = json.load(open(os.path.join(out, "_sort_meta.json")))
    assert isinstance(meta["bounds"], dict) and "b64" in meta["bounds"]
    # total order across shard files
    seen = []
    for s in range(3):
        t = pq.read_table(os.path.join(out, f"shard-{s:05d}.parquet"))
        seen.extend(t.column("bkey").to_pylist())
    assert seen == sorted(seen)
    # resume on the pinned spec: no-op, no crash
    res2 = ing.export_sorted(tbl, out, by="bkey", num_shards=3)
    assert res2["skipped"] == 3


def test_group_tag_upto_seq_passthrough(tmp_path, ray_session):
    """group_tag(upto_seq=) certifies the caught-up cut instead of the
    conservative slowest-watermark default."""
    import pyarrow.compute as pc

    from xgeo_ray import fixtures as fx
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    ev = fx.make_change_events(400, n_convs=20, turns_per_conv=5,
                               dup_fraction=0.0, seed=11)
    tabs = {}
    for name, lo, hi in [("a", 0, 200), ("b", 200, 400)]:
        sub = ev.slice(lo, hi - lo)
        seg = str(tmp_path / f"{name}.parquet")
        pq.write_table(sub, seg)
        root = str(tmp_path / f"t_{name}")
        ing.ingest_segments(
            DeltaTable.create(root, num_partitions=2, num_salts=1), [seg]
        )
        tabs[name] = DeltaTable.open(root)
    top = int(pc.max(ev.column("seq")).as_py())
    plan = ing.group_tag(tabs, "cut-full", upto_seq=top)
    assert plan["cut_seq"] == top
