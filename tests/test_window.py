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


def test_kmv_distinct_sketch_accuracy_and_determinism():
    from xgeo_ray.functions.relational import kmv_distinct_sketch

    rng = np.random.default_rng(23)
    vals = rng.integers(0, 5000, size=20000)  # ~4920 distinct
    t = pa.table({"v": pa.array(vals, pa.int64())})
    true_distinct = len(np.unique(vals))
    ds = ray.data.from_arrow([t.slice(i, 5000) for i in range(0, 20000, 5000)])
    out = kmv_distinct_sketch(ds, "v", k=256).to_pylist()[0]
    est = out["n_distinct_est"]
    assert abs(est - true_distinct) / true_distinct < 0.2  # ~1/sqrt(k) error
    # deterministic across block layouts (merge of per-block prunes)
    ds2 = ray.data.from_arrow(t)
    out2 = kmv_distinct_sketch(ds2, "v", k=256).to_pylist()[0]
    assert out == out2
    # exact below k
    small = pa.table({"v": pa.array(np.arange(40), pa.int64())})
    o3 = kmv_distinct_sketch(ray.data.from_arrow(small), "v", k=64).to_pylist()[0]
    assert o3["n_distinct_est"] == 40


def test_range_join_per_key_matches_naive():
    from xgeo_ray.functions.relational import range_join_per_key

    rng = np.random.default_rng(31)
    n_l, n_r = 120, 150
    lk = rng.integers(0, 9, size=n_l).astype(np.int64)
    rk = rng.integers(0, 9, size=n_r).astype(np.int64)
    lts = rng.integers(0, 3000, size=n_l).astype(np.int64)
    rts = rng.integers(0, 3000, size=n_r).astype(np.int64)
    lo_off, hi_off = -200, 100  # asymmetric band, both ends inclusive
    left = pa.table(
        {
            "lid": pa.array(np.arange(n_l), pa.int64()),
            "lkey": pa.array(lk),
            "lts": pa.array(lts, pa.timestamp("us")),
        }
    )
    right = pa.table(
        {
            "rid": pa.array(np.arange(n_r), pa.int64()),
            "rkey": pa.array(rk),
            "rts": pa.array(rts, pa.timestamp("us")),
        }
    )
    out = (
        range_join_per_key(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            left_by="lkey", right_by="rkey", left_on="lts", right_on="rts",
            lower_offset_us=lo_off, upper_offset_us=hi_off, num_buckets=4,
        )
        .to_pandas()
        .sort_values(["lid", "rid"])
        .reset_index(drop=True)
    )
    got = set(zip(out["lid"], out["rid"]))
    want = {
        (i, j)
        for i in range(n_l)
        for j in range(n_r)
        if lk[i] == rk[j] and lts[i] + lo_off <= rts[j] <= lts[i] + hi_off
    }
    assert got == want and len(out) == len(want)


def test_exact_quantiles_cardinality_guard(ray_session):
    """A column whose distinct-value count exceeds max_bins must fail
    fast instead of silently materializing a huge driver histogram."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from xgeo_ray.functions.relational import exact_quantiles

    t = pa.table({"v": pa.array(np.arange(10_000, dtype=np.int64))})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="distinct values"):
        exact_quantiles(ds, "v", [0.5], max_bins=1_000)
    # under the bound it still answers exactly
    out = exact_quantiles(ds, "v", [0.5], max_bins=100_000).to_pandas()
    assert out["value"].tolist() == [4999]
