"""Conformance: every queries() entry runs; every oracle pair matches the
DuckDB result (row count + sorted-column value equality) at sf0.001 —
the same comparison shape the driver applies at sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_oracle_keys_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, con):
    got = _normalize(_to_df(QUERIES[name](SF_DIR)))
    want = _normalize(con.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name):
    df = _to_df(QUERIES[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


def test_entry_smoke():
    ds = entrymod.entry()
    df = _to_df(ds)
    assert len(df) > 0
    assert {"conv_id", "turn_idx", "text"} <= set(df.columns)


def test_hash_join_matches_duckdb(con):
    """Both-sides-large equi-join (Dataset.join / bucketed cogroup
    fallback) equals the SQL join."""
    import ray.data

    from xgeo_ray.functions.relational import hash_join

    orders = ray.data.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = ray.data.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    joined = hash_join(
        orders,
        cust.map_batches(
            lambda b: b.rename_columns(["o_custkey", "c_mktsegment"]),
            batch_format="pyarrow",
        ),
        on="o_custkey",
        num_partitions=4,
    )
    got = _normalize(joined.to_pandas())
    want = _normalize(
        con.execute(
            """
            SELECT o_orderkey, o_custkey, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
            """
        ).df()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hash_join_semi_and_anti_match_duckdb(con):
    """Semi/anti joins emit LEFT columns only (the right side is a pure
    filter) — the cogroup projection must not name right columns."""
    import pyarrow as pa
    import ray.data

    from xgeo_ray.functions.relational import hash_join

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()), "v": ["a", "b", "c", "d"]})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 4, 4], pa.int64()), "w": ["x", "y", "z"]})
    )
    semi = (
        hash_join(left, right, on="k", join_type="left semi", num_partitions=4)
        .to_pandas()
        .sort_values("k")
    )
    assert semi["k"].tolist() == [2, 4]
    assert list(semi.columns) == ["k", "v"]
    anti = (
        hash_join(left, right, on="k", join_type="left anti", num_partitions=4)
        .to_pandas()
        .sort_values("k")
    )
    assert anti["k"].tolist() == [1, 3]
    assert list(anti.columns) == ["k", "v"]
    rsemi = (
        hash_join(left, right, on="k", join_type="right semi", num_partitions=4)
        .to_pandas()
        .sort_values(["k", "w"])
    )
    assert rsemi["k"].tolist() == [2, 4, 4]
    assert list(rsemi.columns) == ["k", "w"]
    ranti = hash_join(
        left, right, on="k", join_type="right anti", num_partitions=4
    ).to_pandas()
    assert ranti.empty and (
        list(ranti.columns) in (["k", "w"], [])  # all right keys match
    )


def test_ivf_driver_query_is_exact_and_pruned_probe_recalls():
    """Two regimes of the persisted IVF index. (1) The driver query
    probes ALL lists, which must equal the exact brute-force ann_top10
    row for row (that equality is what lets it share ann_top10's SQL
    oracle). (2) The approximate regime (nprobe=3 < 8 lists) keeps the
    quantitative recall bound against the same exact answer."""
    exact = _to_df(QUERIES["ann_top10"](SF_DIR))
    probe_all = _to_df(QUERIES["ann_ivf_top10"](SF_DIR))
    key = ["query_idx", "rank"]
    pd.testing.assert_frame_equal(
        exact.sort_values(key).reset_index(drop=True),
        probe_all.sort_values(key).reset_index(drop=True),
    )

    # nprobe=3: re-probe the same cached index directory approximately
    import hashlib
    import os

    from xgeo_ray.functions.ann import ivf_topk_indexed
    from xgeo_ray.pipelines.queries import _query_vectors

    src = f"{SF_DIR}/embeddings.parquet"
    st = os.stat(src)
    key = hashlib.sha256(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}:c8".encode()
    ).hexdigest()[:16]
    index_dir = f"/tmp/xgeo_ivf_index/{key}"
    assert os.path.exists(os.path.join(index_dir, "_ivf.json"))
    approx = ivf_topk_indexed(
        index_dir, _query_vectors(SF_DIR), k=10, nprobe=3
    ).to_pandas()
    recalls = []
    for q in exact["query_idx"].unique():
        e = set(exact[exact["query_idx"] == q]["vec_id"])
        a = set(approx[approx["query_idx"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # sf0.001 has only ~50 vectors across 8 inverted lists, so nprobe=3
    # probes a coarse slice; bound per-query at 0.5 and the mean at 0.65
    # (measured 0.6/0.8 — deterministic given the fixed seeds)
    assert min(recalls) >= 0.5, recalls
    assert sum(recalls) / len(recalls) >= 0.65, recalls
