"""Global sort family: sample-based range partitioning
(``relational.range_bounds``/``range_shard_assign``), exact distributed
ranks (``relational.global_rank``) and the sorted training export
(``ingest.export_sorted``)."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from xgeo_ray import fixtures as fx
from xgeo_ray.functions import relational as rel
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _mk(root):
    os.makedirs(root, exist_ok=True)
    base = fx.make_transcripts(15, 6)
    pq.write_table(base, f"{root}/base.parquet")
    events = fx.make_change_events(
        700, n_convs=15, turns_per_conv=6, dup_fraction=0.0
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    table = DeltaTable.create(f"{root}/table", num_partitions=8, num_salts=2)
    ing.bootstrap_base(table, f"{root}/base.parquet")
    ing.run_stream(table, segs, segments_per_epoch=1)
    return table


def _want_order(df, by, tiebreak, descending=False):
    return df.sort_values(
        [by] + tiebreak,
        ascending=[not descending] + [True] * len(tiebreak),
        na_position="last",
    ).reset_index(drop=True)


@pytest.mark.parametrize("descending", [False, True])
def test_global_rank_exact(tmp_path, descending):
    table = _mk(str(tmp_path))
    snap = ing.snapshot(table)
    df = snap.to_pandas()
    got = (
        rel.global_rank(
            ing.snapshot(table), "ts", ["conv_id", "turn_idx"],
            num_shards=6, descending=descending,
        )
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want = _want_order(df, "ts", ["conv_id", "turn_idx"], descending)
    assert got["rank"].tolist() == list(range(len(df)))
    pd.testing.assert_frame_equal(
        got.drop(columns=["rank"]), want[got.drop(columns=["rank"]).columns]
    )


def test_global_rank_equal_keys_and_nulls():
    # heavy ties + nulls: equal keys never split; nulls rank last
    n = 5000
    t = pa.table(
        {
            "k": pa.array(
                [None if i % 97 == 0 else i % 7 for i in range(n)],
                pa.int64(),
            ),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    got = (
        rel.global_rank(ds, "k", ["id"], num_shards=5)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want = (
        t.to_pandas()
        .sort_values(["k", "id"], na_position="last")
        .reset_index(drop=True)
    )
    assert got["rank"].tolist() == list(range(n))
    pd.testing.assert_frame_equal(got[["k", "id"]], want)


def test_range_key_refuses_strings():
    with pytest.raises(TypeError, match="numeric"):
        rel._range_key_i64(pa.chunked_array([pa.array(["a", "b"])]))


@pytest.mark.parametrize("descending", [False, True])
def test_global_rank_string_key(descending):
    """String-keyed global sort: lexicographic ranks with ties + nulls
    match pandas exactly (round-5 verdict item 4)."""
    n = 4000
    keys = [
        None if i % 89 == 0 else f"url-{i % 13:02d}/p{i % 3}"
        for i in range(n)
    ]
    t = pa.table(
        {
            "s": pa.array(keys, pa.string()),
            "id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(8)
    got = (
        rel.global_rank(ds, "s", ["id"], num_shards=6, descending=descending)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want = (
        t.to_pandas()
        .sort_values(
            ["s", "id"], ascending=[not descending, True], na_position="last"
        )
        .reset_index(drop=True)
    )
    assert got["rank"].tolist() == list(range(n))
    pd.testing.assert_frame_equal(got[["s", "id"]], want)


def test_export_sorted_string_key(tmp_path):
    """export_sorted(by=<string column>): file+row order is the exact
    lexicographic total order; the pinned bounds are JSON strings and a
    resumed shard rewrite is identical."""
    table = _mk(str(tmp_path))
    out = f"{tmp_path}/by_conv"
    st = ing.export_sorted(
        table, out, by="conv_id", num_shards=4, tiebreak=["turn_idx"]
    )
    assert st["shards"] == 4
    with open(f"{out}/_sort_meta.json") as f:
        bounds = json.load(f)["bounds"]
    assert len(bounds) == 3 and all(isinstance(b, str) for b in bounds)
    files = sorted(glob.glob(f"{out}/shard-*.parquet"))
    got = pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True
    )
    df = ing.snapshot(table).to_pandas()
    want = _want_order(df, "conv_id", ["turn_idx"])
    pd.testing.assert_frame_equal(got, want[got.columns])
    # resume: a deleted shard rewrites identically from pinned bounds
    victim = files[1]
    before = pq.read_table(victim)
    os.remove(victim)
    st = ing.export_sorted(
        table, out, by="conv_id", num_shards=4, tiebreak=["turn_idx"]
    )
    assert st["written"] == 1 and st["skipped"] == 3
    assert pq.read_table(victim).equals(before)


@pytest.mark.parametrize("descending", [False, True])
def test_export_sorted_total_order(tmp_path, descending):
    table = _mk(str(tmp_path))
    out = f"{tmp_path}/sorted_{descending}"
    st = ing.export_sorted(
        table, out, by="ts", num_shards=5, descending=descending
    )
    assert st["shards"] == 5 and st["written"] == 5
    files = sorted(glob.glob(f"{out}/shard-*.parquet"))
    assert len(files) == 5
    got = pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True
    )
    df = ing.snapshot(table).to_pandas()
    want = _want_order(df, "ts", ["conv_id", "turn_idx"], descending)
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_export_sorted_resume_and_spec_pin(tmp_path):
    table = _mk(str(tmp_path))
    out = f"{tmp_path}/sorted"
    ing.export_sorted(table, out, by="ts", num_shards=4)
    with open(f"{out}/_sort_meta.json") as f:
        assert len(json.load(f)["bounds"]) == 3
    # converged: nothing rewrites
    st = ing.export_sorted(table, out, by="ts", num_shards=4)
    assert st["written"] == 0 and st["skipped"] == 4
    # delete one shard: only it rewrites, identically
    victim = f"{out}/shard-00002.parquet"
    before = pq.read_table(victim)
    os.remove(victim)
    st = ing.export_sorted(table, out, by="ts", num_shards=4)
    assert st["written"] == 1 and st["skipped"] == 3
    assert pq.read_table(victim).equals(before)
    # a different spec refuses
    with pytest.raises(ValueError, match="different sort spec"):
        ing.export_sorted(table, out, by="ts", num_shards=8)
    with pytest.raises(ValueError, match="different sort spec"):
        ing.export_sorted(table, out, by="ts", num_shards=4, descending=True)


def test_export_sorted_columns_projection(tmp_path):
    table = _mk(str(tmp_path))
    out = f"{tmp_path}/proj"
    ing.export_sorted(table, out, by="ts", num_shards=3, columns=["text"])
    files = sorted(glob.glob(f"{out}/shard-*.parquet"))
    cols = pq.read_schema(files[0]).names
    # keys + sort key + tiebreak ride along with the projection
    assert set(cols) == {"conv_id", "turn_idx", "ts", "text"}
    got = pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True
    )
    assert (got["ts"].values[:-1] <= got["ts"].values[1:]).all()
