"""Sliding time-window aggregate: searchsorted composite encoding vs a
naive per-row reference, including the SQL RANGE-frame tie semantics
(peers at the same timestamp count even when they sort after the row)."""

import numpy as np
import pyarrow as pa
import ray

from xgeo_ray.functions.relational import sliding_window_count


def _naive(keys, ts, win):
    out = []
    for k, t in zip(keys, ts):
        out.append(
            sum(1 for k2, t2 in zip(keys, ts) if k2 == k and t - win <= t2 <= t)
        )
    return out


def test_sliding_window_count_matches_naive():
    rng = np.random.default_rng(17)
    n = 400
    keys = rng.integers(0, 12, size=n).astype(np.int64)
    ts = np.sort(rng.integers(0, 5_000, size=n)).astype(np.int64)
    # force timestamp ties within a key (the RANGE peer case)
    ts[50] = ts[51] = ts[52]
    keys[50] = keys[51] = keys[52] = 3
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(keys),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    win = 500
    out = (
        sliding_window_count(
            ray.data.from_arrow(t), "user_id", "ts", window_us=win,
            keep_cols=["event_id"], num_buckets=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = _naive(keys.tolist(), ts.tolist(), win)
    assert out["n_in_window"].tolist() == want
    # the three ts-peers of key 3 must each count all three (RANGE frame)
    peers = out[out["event_id"].isin([50, 51, 52])]["n_in_window"]
    assert (peers >= 3).all()
