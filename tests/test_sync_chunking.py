"""Bounded driver batches for the incremental sinks (round-5 verdict
item 3): ``sync_assembled`` and ``sync_join`` chunk the touched-conv
set into deterministic sub-batches of ``max_convs_per_batch``
conversations, so a bootstrap-sized window (first sync against a large
existing source) never materializes the whole corpus / join on the
driver. Parity must be chunking-invariant, and a crash between chunk
commits must replay convergently (committed chunks no-op on their
batch ids)."""

import os
import subprocess
import sys

import pandas as pd
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.pipelines import ivm
from xgeo_ray.schemas import ASSEMBLED_SCHEMA
from xgeo_ray.state.delta_table import DeltaTable

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _asm_df(ds_or_tbl):
    df = (
        ds_or_tbl.to_pandas()
        if hasattr(ds_or_tbl, "to_pandas")
        else ds_or_tbl
    )
    return (
        df[["conv_id", "n_turns", "doc"]]
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def _mk_asm(root, n_convs=12):
    events = fx.make_change_events(900, n_convs=n_convs, turns_per_conv=5)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    src = DeltaTable.create(f"{root}/src", num_partitions=8, num_salts=2)
    sink = DeltaTable.create(
        f"{root}/sink",
        num_partitions=4,
        num_salts=1,
        base_schema=ASSEMBLED_SCHEMA,
    )
    ing.run_stream(src, segs, segments_per_epoch=1)
    return src, sink


def test_sync_assembled_chunked_bootstrap_parity(tmp_path):
    """A bootstrap window forced into >=3 chunks commits one sink epoch
    per chunk and still equals the batch assembly exactly."""
    src, sink = _mk_asm(str(tmp_path))
    n_convs = ing.assemble_conversations(src).count()
    cap = max(1, (n_convs + 2) // 3 - 1)  # forces >= 3 chunks
    st = ing.sync_assembled(src, sink, max_convs_per_batch=cap)
    assert st["convs"] == n_convs
    n_chunks = -(-n_convs // cap)
    assert n_chunks >= 3
    assert sink.latest_epoch() == n_chunks  # one apply epoch per chunk
    pd.testing.assert_frame_equal(
        _asm_df(ing.snapshot(sink)), _asm_df(ing.assemble_conversations(src))
    )
    # caught-up sync is a no-op regardless of cap
    assert ing.sync_assembled(src, sink, max_convs_per_batch=1)[
        "synced_epochs"
    ] == 0


def test_sync_assembled_chunk_crash_replay(tmp_path):
    """Crash after chunk 0's apply but before the ack: the replay
    re-runs the window; chunk 0's batch id no-ops, later chunks apply,
    the sink converges to exact parity."""
    root = str(tmp_path)
    src, sink = _mk_asm(root)
    script = f"""
import ray, sys, os
sys.path.insert(0, {_REPO!r})
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
os.environ["XGEO_CRASH_AFTER_ASM_CHUNK"] = "0"
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable
src = DeltaTable.open({f"{root}/src"!r})
sink = DeltaTable.open({f"{root}/sink"!r})
ing.sync_assembled(src, sink, max_convs_per_batch=4)
"""
    env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    r = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True,
        timeout=240,
    )
    assert r.returncode == 137, r.stderr.decode()[-2000:]
    assert sink.latest_epoch() == 1  # exactly chunk 0 committed
    # replay with the same cap: chunk 0 no-ops, the rest apply
    st = ing.sync_assembled(src, sink, max_convs_per_batch=4)
    assert st["synced_epochs"] > 0
    n_convs = ing.assemble_conversations(src).count()
    assert sink.latest_epoch() == -(-n_convs // 4)
    pd.testing.assert_frame_equal(
        _asm_df(ing.snapshot(sink)), _asm_df(ing.assemble_conversations(src))
    )


_PAY = ["role", "text", "tool"]


def _mk_join(root):
    def side(sub, seed):
        ev = fx.make_change_events(
            600, n_convs=8, turns_per_conv=5, dup_fraction=0.0, seed=seed
        )
        segs = fx.write_segments(ev, f"{root}/{sub}/wal", n_segments=2)
        t = DeltaTable.create(
            f"{root}/{sub}/table", num_partitions=4, num_salts=2
        )
        ing.run_stream(t, segs, segments_per_epoch=1)
        return t

    left, right = side("L", 11), side("R", 22)
    sink = DeltaTable.create(
        f"{root}/sink",
        num_partitions=4,
        num_salts=1,
        base_schema=ivm.join_sink_schema(left, right),
    )
    return left, right, sink


def _join_check(sink, left, right):
    lf = ing.snapshot(left).to_pandas()[["conv_id", "turn_idx"] + _PAY]
    rf = ing.snapshot(right).to_pandas()[["conv_id", "turn_idx"] + _PAY]
    rf = rf.rename(columns={c: "r_" + c for c in _PAY})
    want = (
        lf.merge(rf, on=["conv_id", "turn_idx"], how="inner")
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    got = (
        ing.snapshot(sink)
        .to_pandas()
        .drop(columns=["ts"])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )[list(want.columns)]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _union_convs(left, right):
    return sorted(
        set(ing.snapshot(left).to_pandas()["conv_id"])
        | set(ing.snapshot(right).to_pandas()["conv_id"])
    )


def test_sync_join_chunked_bootstrap_parity(tmp_path):
    left, right, sink = _mk_join(str(tmp_path))
    n_convs = len(_union_convs(left, right))
    s = ivm.sync_join(left, right, sink, max_convs_per_batch=3)
    assert s["keys"] > 0
    n_chunks = -(-n_convs // 3)
    assert n_chunks >= 3
    assert sink.latest_epoch() == n_chunks  # one apply epoch per chunk
    _join_check(sink, left, right)
    # re-sync no-op
    s = ivm.sync_join(left, right, sink, max_convs_per_batch=3)
    assert s["synced_epochs"] == 0
    _join_check(sink, left, right)


def test_sync_join_chunk_crash_replay(tmp_path):
    root = str(tmp_path)
    left, right, sink = _mk_join(root)
    script = f"""
import ray, sys, os
sys.path.insert(0, {_REPO!r})
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
os.environ["XGEO_CRASH_AFTER_JOIN_CHUNK"] = "1"
from xgeo_ray.pipelines import ivm
from xgeo_ray.state.delta_table import DeltaTable
left = DeltaTable.open({f"{root}/L/table"!r})
right = DeltaTable.open({f"{root}/R/table"!r})
sink = DeltaTable.open({f"{root}/sink"!r})
ivm.sync_join(left, right, sink, max_convs_per_batch=3)
"""
    env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    r = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True,
        timeout=240,
    )
    assert r.returncode == 137, r.stderr.decode()[-2000:]
    assert sink.latest_epoch() == 2  # chunks 0 and 1 committed
    st = ivm.sync_join(left, right, sink, max_convs_per_batch=3)
    assert st["synced_epochs"] > 0
    # chunks 0-1 no-op on their batch ids, the remaining chunks apply
    n_chunks = -(-len(_union_convs(left, right)) // 3)
    assert sink.latest_epoch() == n_chunks
    _join_check(sink, left, right)


def test_sync_join_rejects_bad_cap(tmp_path):
    left, right, sink = _mk_join(str(tmp_path))
    with pytest.raises(ValueError, match="max_convs_per_batch"):
        ivm.sync_join(left, right, sink, max_convs_per_batch=0)
