"""Streaming near-dup index (dedup.sync_near_dup): incremental syncs
over a growing corpus must converge to EXACTLY the batch operator's
pair set (same MinHash params, same true-Jaccard verify kernel)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from xgeo_ray.functions.dedup import minhash_lsh_dup_pairs, sync_near_dup
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable

SF = "/root/testdata/sf0.001"
KEY_SEP = "\x1f"


def _corpus() -> pa.Table:
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return t.sort_by([("doc_id", "ascending")])


def _batch_pairs(t: pa.Table) -> set[tuple[int, int]]:
    got = minhash_lsh_dup_pairs(
        ray.data.from_arrow(t), threshold=0.8
    ).to_pandas()
    return {
        (min(a, b), max(a, b))
        for a, b in zip(got["doc_id_a"], got["doc_id_b"])
    }


def _stream_pairs(pairs_root: str) -> set[tuple[int, int]]:
    pt = DeltaTable.open(pairs_root)
    df = ing.snapshot(pt, columns=["doc_key_a", "doc_key_b"]).to_pandas()
    out = set()
    for a, b in zip(df["doc_key_a"], df["doc_key_b"]):
        ia = int(a.split(KEY_SEP)[0])
        ib = int(b.split(KEY_SEP)[0])
        out.add((min(ia, ib), max(ia, ib)))
    return out


def _upsert_slice(src: DeltaTable, t: pa.Table, lo: int, hi: int, bid: str):
    sl = t.slice(lo, hi - lo)
    rows = pa.table(
        {
            "conv_id": pa.array(
                [str(x) for x in sl.column("doc_id").to_pylist()], pa.string()
            ),
            "turn_idx": pa.array(
                np.zeros(sl.num_rows, np.int64), pa.int64()
            ),
            "text": sl.column("text"),
        }
    )
    ing.apply_changes(src, rows, batch_id=bid)


def test_streaming_matches_batch(tmp_path, ray_session):
    t = _corpus()
    n = t.num_rows
    src = DeltaTable.create(str(tmp_path / "src"), num_partitions=8, num_salts=1)
    idx = str(tmp_path / "ndidx")
    prs = str(tmp_path / "ndpairs")

    cuts = [0, n // 3, 2 * n // 3, n]
    total_pairs = 0
    for i in range(3):
        _upsert_slice(src, t, cuts[i], cuts[i + 1], f"load-{i}")
        stats = sync_near_dup(src, idx, prs)
        assert stats["new_docs"] == cuts[i + 1] - cuts[i]
        total_pairs += stats["pairs"]

    got = _stream_pairs(str(tmp_path / "ndpairs"))
    want = _batch_pairs(t)
    assert got == want
    assert len(want) > 0  # the corpus genuinely contains near-dups

    # converged: another sync is a no-op
    stats = sync_near_dup(src, idx, prs)
    assert stats["new_docs"] == 0 and stats["pairs"] == 0


def test_param_mismatch_refuses(tmp_path, ray_session):
    t = _corpus()
    src = DeltaTable.create(str(tmp_path / "src"), num_partitions=8, num_salts=1)
    _upsert_slice(src, t, 0, 40, "load-0")
    idx = str(tmp_path / "ndidx")
    prs = str(tmp_path / "ndpairs")
    sync_near_dup(src, idx, prs)
    with pytest.raises(ValueError, match="refusing"):
        sync_near_dup(src, idx, prs, num_bands=8)


def test_update_reindexes_without_self_pair(tmp_path, ray_session):
    """An updated doc meets its own stale index entry in every bucket;
    it must never pair with itself, and its NEW text drives pairing."""
    src = DeltaTable.create(str(tmp_path / "src"), num_partitions=4, num_salts=1)
    idx = str(tmp_path / "ndidx")
    prs = str(tmp_path / "ndpairs")
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = pa.table(
        {
            "conv_id": pa.array(["1", "2"], pa.string()),
            "turn_idx": pa.array([0, 0], pa.int64()),
            "text": pa.array([base, "completely different words here entirely now ok"]),
        }
    )
    ing.apply_changes(src, rows, batch_id="b0")
    s0 = sync_near_dup(src, idx, prs)
    assert s0["pairs"] == 0
    # update doc 2 to near-copy doc 1: the pair must appear now
    rows2 = pa.table(
        {
            "conv_id": pa.array(["2"], pa.string()),
            "turn_idx": pa.array([0], pa.int64()),
            "text": pa.array([base + " tonight"]),
        }
    )
    ing.apply_changes(src, rows2, batch_id="b1")
    s1 = sync_near_dup(src, idx, prs)
    assert s1["pairs"] == 1
    got = _stream_pairs(prs)
    assert got == {(1, 2)}
