"""Model-based lifecycle test: random interleavings of ingest /
correction / minor compact / full compact / vacuum, each step checked
against a pandas LWW model — the interactions between the round-3
lifecycle features (out-of-band corrections, tiered folds, reclaim)
are where single-feature tests can't reach.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _model_state(rows: pd.DataFrame) -> pd.DataFrame:
    """LWW by (ts, seq), tombstones dropped."""
    df = rows.sort_values(["ts", "seq"], kind="stable")
    df = df.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    df = df[df.op != "D"]
    return (
        df[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _engine_state(t) -> pd.DataFrame:
    df = ing.snapshot(t, columns=["conv_id", "turn_idx", "text"]).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _events(seq0, n, rng, ts0):
    convs = [f"c{rng.integers(0, 6)}" for _ in range(n)]
    ops = ["D" if rng.random() < 0.06 else "U" for _ in range(n)]
    return pa.table(
        {
            "seq": pa.array(np.arange(seq0, seq0 + n, dtype=np.int64)),
            "op": pa.array(ops),
            "conv_id": pa.array(convs),
            "turn_idx": pa.array(rng.integers(0, 4, n).astype("int32")),
            "text": pa.array([f"s{seq0 + i}" for i in range(n)]),
            "ts": pa.array(
                ts0 + np.arange(n, dtype=np.int64) * 10, pa.timestamp("us")
            ),
        }
    )


@pytest.mark.parametrize("seed,history", [(1, "collapsed"), (2, "collapsed"), (3, "full")])
def test_random_lifecycle_against_model(tmp_path, seed, history):
    rng = np.random.default_rng(seed)
    t = DeltaTable.create(
        str(tmp_path / "t"), num_partitions=4, num_salts=1, history=history
    )
    model_rows: list[pd.DataFrame] = []
    seq = 0
    ts = 1_000_000
    n_batches = 0
    for step in range(12):
        op = rng.choice(
            ["ingest", "ingest", "ingest", "correct", "minor", "full", "vacuum"]
        )
        if op == "ingest":
            n = int(rng.integers(30, 90))
            ev = _events(seq, n, rng, ts)
            seq += n
            ts += n * 10 + 1_000
            d = str(tmp_path / f"wal{step}")
            segs = fx.write_segments(ev, d, n_segments=2)
            ing.ingest_segments(t, segs)
            model_rows.append(ev.to_pandas())
        elif op == "correct":
            n_batches += 1
            key_conv = f"c{rng.integers(0, 6)}"
            key_turn = int(rng.integers(0, 4))
            ts += 1_000
            batch = pa.table(
                {
                    "conv_id": pa.array([key_conv]),
                    "turn_idx": pa.array([key_turn], pa.int32()),
                    "text": pa.array([f"fix{n_batches}"]),
                }
            )
            ing.apply_changes(t, batch, batch_id=f"fix-{n_batches}", ts_us=ts)
            model_rows.append(
                pd.DataFrame(
                    {
                        "seq": [np.int64(-1)],
                        "op": ["U"],
                        "conv_id": [key_conv],
                        "turn_idx": [key_turn],
                        "text": [f"fix{n_batches}"],
                        "ts": [pd.Timestamp(ts, unit="us")],
                    }
                )
            )
        elif op == "minor":
            ing.compact(t, minor=True)
        elif op == "full":
            ing.compact(t)
        elif op == "vacuum":
            ing.vacuum(t)
        if model_rows:
            want = _model_state(pd.concat(model_rows, ignore_index=True))
            got = _engine_state(t)
            got["turn_idx"] = got["turn_idx"].astype(want["turn_idx"].dtype)
            pd.testing.assert_frame_equal(got, want), f"step {step} op {op}"
