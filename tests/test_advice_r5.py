"""Regression tests for the round-4 advisory findings (ADVICE.md r4):

1. ivf_vacuum's min_age_s grace must be measured from SUPERSESSION:
   ivf_compact touches its superseded inputs, so a vacuum right after a
   compact cannot delete files a reader planned from the old manifest
   even when those files were originally written long ago.
2. rename_column onto a previously-dropped name refuses with advice that
   actually exists ('pick another name' — there is no maintenance step
   that clears dropped_columns).
3. sync_scd2 pins its spec (_scd2.json); a later sync with different
   columns refuses instead of silently evolving the sink mid-history.
4. ivm._k64_codes guards turn_idx to [0, 2^32) — values outside would
   alias in the composite 64-bit key code.
"""

import os
import time

import numpy as np
import pyarrow as pa
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.functions import ann
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.pipelines import ivm
from xgeo_ray.state.delta_table import DeltaTable

DIM = 8


def _ivf_with_orphans(tmp_path):
    """Build a tiny persisted IVF index, then compact it so the original
    list files become unreferenced (orphans)."""
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, DIM)).astype(np.float32)
    import ray

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(60), pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
        }
    )
    emb = ray.data.from_arrow(t)
    cents = ann.train_ivf_centroids(emb, num_centroids=4)
    idx = str(tmp_path / "ivf")
    ann.build_ivf_index(emb, cents, idx)
    return idx


def test_ivf_vacuum_grace_measured_from_supersession(tmp_path):
    idx = _ivf_with_orphans(tmp_path)
    man, _ = ann._read_ivf_manifest(idx)
    inputs = [
        os.path.join(idx, n)
        for p in man["parts"]
        for n in man.get("files", {}).get(str(p), [f"part-{int(p):05d}.parquet"])
    ]
    # age the inputs far into the past: pre-fix, vacuum aged candidates
    # by write-mtime and would delete these with zero actual grace
    old = time.time() - 10_000
    for f in inputs:
        os.utime(f, (old, old))
    ann.ivf_compact(idx)
    # compact touched its superseded inputs: a vacuum with a real grace
    # window right after the compact must keep them for planned readers
    assert ann.ivf_vacuum(idx, min_age_s=300.0)["removed"] == 0
    for f in inputs:
        assert os.path.exists(f)
    assert ann.ivf_vacuum(idx, min_age_s=0.0)["removed"] == len(inputs)


def test_rename_onto_dropped_name_advice_is_actionable(tmp_path):
    events = fx.make_change_events(60, n_convs=4, turns_per_conv=4)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=1)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.run_stream(table, segs, segments_per_epoch=1)
    ing.drop_columns(table, ["tool"])
    with pytest.raises(ValueError) as ei:
        ing.rename_column(table, "text", "tool")
    msg = str(ei.value)
    assert "pick another name" in msg
    # the old advice ('fully compact+vacuum first') was a dead end:
    # nothing ever clears dropped_columns, so don't suggest it
    assert "compact" not in msg


def test_scd2_spec_pinned(tmp_path):
    events = fx.make_change_events(200, n_convs=6, turns_per_conv=4)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=2)
    src = DeltaTable.create(str(tmp_path / "src"), num_partitions=4, num_salts=1)
    ing.run_stream(src, segs[:1], segments_per_epoch=1)
    sink = DeltaTable.create(
        str(tmp_path / "sink"),
        num_partitions=4,
        num_salts=1,
        base_schema=ivm.scd2_schema(src, ["text"]),
    )
    ivm.sync_scd2(src, sink, columns=["text"])
    assert os.path.isfile(os.path.join(sink.root, "_scd2.json"))
    ing.run_stream(src, segs, segments_per_epoch=1)
    # same spec: fine
    ivm.sync_scd2(src, sink, columns=["text"])
    # different columns: refuse rather than evolving the sink mid-history
    with pytest.raises(ValueError, match="spec changed"):
        ivm.sync_scd2(src, sink, columns=["text", "role"])
    with pytest.raises(ValueError, match="spec changed"):
        ivm.sync_scd2(src, sink)  # None = follow-source is also a spec


def test_k64_codes_guard_turn_range():
    conv = pa.array(["a", "a", "b"])
    uniq = pa.array(["a", "b"])
    ok = ivm._k64_codes(conv, pa.array([0, 1, (1 << 32) - 1], pa.int64()), uniq)
    assert len(set(ok.tolist())) == 3
    with pytest.raises(ValueError, match="turn_idx out of"):
        ivm._k64_codes(conv, pa.array([0, 1, 1 << 32], pa.int64()), uniq)
    with pytest.raises(ValueError, match="turn_idx out of"):
        ivm._k64_codes(conv, pa.array([0, -1, 2], pa.int64()), uniq)
