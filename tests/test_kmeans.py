"""Distributed spherical k-means: parity with a single-process numpy
Lloyd oracle (same init, same update rule), monotone inertia, stats and
cluster-balanced sampling determinism."""

import numpy as np
import pyarrow.parquet as pq
import ray.data

from xgeo_ray.functions.ann import (
    _stack_unit,
    assign_clusters,
    cluster_balanced_sample,
    cluster_stats,
    kmeans,
)

SF = "/root/testdata/sf0.001"
K = 8
ITERS = 6


def _corpus():
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


def _oracle(iters=ITERS, k=K):
    t = pq.read_table(f"{SF}/embeddings.parquet")
    order = np.argsort(t.column("vec_id").to_numpy(), kind="stable")[:k]
    cents = _stack_unit(t.take(order).column("embedding"))
    x = _stack_unit(t.column("embedding"))
    hist = []
    for _ in range(iters):
        sim = x @ cents.T
        a = sim.argmax(axis=1)
        hist.append(float((1.0 - sim[np.arange(len(x)), a]).mean()))
        new = cents.copy()
        for c in range(k):
            m = x[a == c]
            if len(m):
                new[c] = m.sum(axis=0) / len(m)
        norms = np.linalg.norm(new, axis=1)
        norms[norms == 0] = 1.0
        cents = new / norms[:, None]
    return cents, hist, a


def test_kmeans_matches_numpy_oracle(ray_session):
    cents, hist = kmeans(_corpus(), k=K, iters=ITERS, tol=0.0)
    ocents, ohist, _ = _oracle()
    assert cents.shape == ocents.shape
    np.testing.assert_allclose(cents, ocents, atol=1e-8)
    np.testing.assert_allclose(hist, ohist, rtol=1e-9)
    # inertia non-increasing (Lloyd guarantee)
    assert all(b <= a + 1e-12 for a, b in zip(hist, hist[1:]))


def test_cluster_stats_and_assign(ray_session):
    cents, _ = kmeans(_corpus(), k=K, iters=ITERS, tol=0.0)
    t = pq.read_table(f"{SF}/embeddings.parquet")
    x_all = _stack_unit(t.column("embedding"))
    final_assign = (x_all @ cents.T).argmax(axis=1)
    stats = cluster_stats(_corpus(), cents)
    n = stats.column("n").to_numpy()
    assert int(n.sum()) == 500
    np.testing.assert_array_equal(n, np.bincount(final_assign, minlength=K))
    # assigned column matches the argmax under the same centroids
    df = assign_clusters(_corpus(), cents).to_pandas().sort_values("vec_id")
    x = _stack_unit(t.column("embedding"))
    ids = t.column("vec_id").to_numpy()
    want_by_sorted_id = (x @ cents.T).argmax(axis=1)[
        np.argsort(ids, kind="stable")
    ]
    np.testing.assert_array_equal(df["cluster"].to_numpy(), want_by_sorted_id)


def test_cluster_balanced_sample(ray_session):
    cents, _ = kmeans(_corpus(), k=K, iters=ITERS, tol=0.0)
    per = 12
    s1 = cluster_balanced_sample(_corpus(), cents, per).to_pandas()
    s2 = cluster_balanced_sample(_corpus(), cents, per).to_pandas()
    # determinism: identical row sets (and identical pick per cluster)
    a = s1.sort_values(["cluster", "vec_id"]).reset_index(drop=True)
    b = s2.sort_values(["cluster", "vec_id"]).reset_index(drop=True)
    assert a[["cluster", "vec_id"]].equals(b[["cluster", "vec_id"]])
    counts = a.groupby("cluster").size()
    assert (counts <= per).all()
    # a different salt picks a different (still capped) subset
    s3 = cluster_balanced_sample(_corpus(), cents, per, salt=7).to_pandas()
    c = s3.sort_values(["cluster", "vec_id"]).reset_index(drop=True)
    assert not a["vec_id"].equals(c["vec_id"])
    assert (c.groupby("cluster").size() <= per).all()


def test_zero_row_blocks_are_legal(ray_session):
    """An upstream filter can empty a block; every cluster op must pass
    zero-row batches through instead of crashing np.stack([])."""
    import pyarrow as pa

    t = pq.read_table(f"{SF}/embeddings.parquet")
    empty = t.schema.empty_table()
    ds = ray.data.from_arrow([empty, t.slice(0, 64), empty, t.slice(64, 64)])
    cents, hist = kmeans(ds, k=4, iters=2)
    assert cents.shape[0] == 4 and len(hist) == 2
    st = cluster_stats(ds, cents)
    assert int(pa.compute.sum(st.column("n")).as_py()) == 128
    lab = assign_clusters(ds, cents).to_pandas()
    assert len(lab) == 128 and lab["cluster"].between(0, 3).all()
    samp = cluster_balanced_sample(ds, cents, per_cluster=5)
    assert samp.count() <= 20

    # a fully-empty dataset is a caller error with a clear message
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty dataset"):
        kmeans(ray.data.from_arrow([empty]), k=2, iters=1)
