"""WalWriter: the crash-safe produce side of the WAL contract.

Covers: seq minting + auto-roll, restart continuity (segment index AND
seq space resume from parquet footers), crash invisibility (tmp never
ingested, stale tmp reclaimed), and the full produce → tail → snapshot
parity loop against the naive oracle.
"""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.sources.wal_writer import WalWriter
from xgeo_ray.state.delta_table import DeltaTable


def _rows(n, conv_offset=0, ts0=1_000):
    return pa.table(
        {
            "op": pa.array(["U"] * n),
            "conv_id": pa.array([f"c{(conv_offset + i) % 7}" for i in range(n)]),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32) % 4),
            "text": pa.array([f"t{conv_offset + i}" for i in range(n)]),
            "ts": pa.array(
                (ts0 + np.arange(n, dtype=np.int64)), pa.timestamp("us")
            ),
        }
    )


def test_mint_roll_and_restart_continuity(tmp_path):
    wal = str(tmp_path / "wal")
    with WalWriter(wal, segment_rows=100) as w:
        a, b = w.append(_rows(250))
        assert (a, b) == (0, 249)
    # 250 rows at 100/segment -> 2 full rolls + flush-on-exit
    segs = sorted(os.listdir(wal))
    assert segs == [f"segment-{k:05d}.parquet" for k in range(3)]
    # restart: numbering AND seq space continue from the footers
    w2 = WalWriter(wal, segment_rows=100)
    a, b = w2.append(_rows(50, conv_offset=250, ts0=2_000))
    assert a == 250
    w2.flush()
    assert sorted(os.listdir(wal))[-1] == "segment-00003.parquet"
    import pyarrow.parquet as pq

    seqs = pa.concat_tables(
        [pq.read_table(os.path.join(wal, s), columns=["seq"]) for s in sorted(os.listdir(wal))]
    ).column("seq")
    assert seqs.to_pylist() == list(range(300))  # dense, monotone


def test_seq_rejected_and_defaults(tmp_path):
    w = WalWriter(str(tmp_path / "wal"))
    with pytest.raises(ValueError, match="seq"):
        w.append(pa.table({"seq": pa.array([1], pa.int64())}))
    # op/ts default-fill
    w.append(
        pa.table(
            {
                "conv_id": pa.array(["c0"]),
                "turn_idx": pa.array([0], pa.int32()),
                "text": pa.array(["x"]),
            }
        )
    )
    p = w.flush()
    import pyarrow.parquet as pq

    t = pq.read_table(p)
    assert t.column("op").to_pylist() == ["U"]
    assert t.column("ts").null_count == 0


def test_crash_leaves_only_invisible_tmp(tmp_path):
    """A producer killed mid-roll leaves a tmp the tailer never reads;
    the next producer reclaims it and reuses the index."""
    wal = str(tmp_path / "wal")
    code = f"""
import os, sys
sys.path.insert(0, {repr(os.getcwd())})
import pyarrow as pa, numpy as np
from xgeo_ray.sources import wal_writer as m
from xgeo_ray.state import storage
def boom(tmp, final, durable):
    os._exit(137)  # crash between write and publish
storage.DEFAULT_STORAGE.publish_file = boom
w = m.WalWriter({repr(wal)}, segment_rows=10)
w.append(pa.table({{
    "conv_id": pa.array(["c0"] * 20),
    "turn_idx": pa.array(np.zeros(20, dtype=np.int32)),
    "text": pa.array(["x"] * 20),
    "ts": pa.array(np.arange(20, dtype=np.int64), pa.timestamp("us")),
}}))
"""
    r = subprocess.run([sys.executable, "-c", code], cwd="/root/repo")
    assert r.returncode == 137
    names = os.listdir(wal)
    assert names and all(".tmp-" in n for n in names)  # nothing published
    from xgeo_ray.sources.wal import is_supported_segment

    assert not any(is_supported_segment(n) for n in names)
    # fresh producer: index 0 reused, stale tmp reclaimed on first roll
    w = WalWriter(wal, segment_rows=10)
    assert w._next_idx == 0 and w._next_seq == 0
    w.append(_rows(10))
    assert sorted(os.listdir(wal)) == ["segment-00000.parquet"]


def test_produce_tail_snapshot_parity(tmp_path):
    """End-to-end: WalWriter-produced segments through tail() match the
    naive LWW oracle over the same rows."""
    wal = str(tmp_path / "wal")
    ev = fx.make_change_events(800, n_convs=8, turns_per_conv=5)
    ev = ev.drop_columns(["seq"])  # the writer mints its own seq space
    n = ev.num_rows
    with WalWriter(wal, segment_rows=200) as w:
        for i in range(0, n, 80):
            w.append(ev.slice(i, 80))
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ms = ing.tail(
        t, wal, poll_interval_s=0.05, idle_polls_to_stop=3, stable_for_s=0.0
    )
    assert ms
    got = (
        ing.snapshot(t)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # oracle: same rows with the writer's dense seq stamping
    stamped = ev.add_column(
        0, "seq", pa.array(np.arange(n, dtype=np.int64))
    )
    want = (
        fx.naive_final_state(None, stamped)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_cli_produce_roundtrip(tmp_path):
    """`python -m xgeo_ray produce` turns stdin JSONL into ingestible
    segments (seq minted; op/ts defaulted)."""
    import json as _json

    wal = str(tmp_path / "wal")
    lines = "\n".join(
        _json.dumps({"conv_id": f"c{i % 3}", "turn_idx": i % 2, "text": f"m{i}"})
        for i in range(25)
    )
    r = subprocess.run(
        [sys.executable, "-m", "xgeo_ray", "produce", wal, "--segment-rows", "10"],
        input=lines,
        text=True,
        capture_output=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["rows"] == 25 and out["next_segment"] == 3
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=2, num_salts=1)
    segs = sorted(os.path.join(wal, s) for s in os.listdir(wal))
    m = ing.run_stream(t, segs, segments_per_epoch=4)
    assert sum(x.totals["applied"] for x in m) > 0
    got = ing.snapshot(t).to_pandas()
    assert len(got) == 6  # 3 convs x 2 turns, LWW winners
