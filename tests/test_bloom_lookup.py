"""Manifest-embedded key blooms: point lookups prune the delta chain
from manifest bytes alone, with zero correctness impact (false
positives only cost a redundant read; false negatives are impossible
for keys present at build time)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.partition import bloom_may_contain, build_key_bloom
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


@pytest.fixture(scope="module")
def table(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("bloomtab")
    ev = fx.make_change_events(3000, n_convs=60, turns_per_conv=4, seed=29)
    segs = fx.write_segments(ev, str(tmp / "wal"), n_segments=6)
    t = DeltaTable.create(str(tmp / "t"), num_partitions=4, num_salts=2)
    ing.run_stream(t, segs, segments_per_epoch=1)  # 6-epoch delta chain
    return t


def test_no_false_negatives_any_file(table):
    """Every conv actually present in a file must pass its bloom — the
    hard correctness invariant."""
    blooms = table.file_blooms()
    assert blooms  # delta epochs are small: all carry blooms
    for path, blob in blooms.items():
        present = np.unique(
            pq.read_table(path, columns=["conv_id"])
            .column("conv_id")
            .to_numpy(zero_copy_only=False)
        )
        assert bloom_may_contain(blob, present).all(), path


def test_lookup_parity_and_pruning(table):
    snap = ing.snapshot(table).to_pandas()
    convs = sorted(snap["conv_id"].unique())
    # parity: bloom-pruned lookup == snapshot slice, for several keys
    for cid in convs[:8]:
        got = ing.lookup(table, cid).to_pandas()
        exp = (
            snap[snap["conv_id"] == cid]
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp)
        assert (got["turn_idx"].to_numpy() == exp["turn_idx"].to_numpy()).all()
    # batch lookup parity
    many = ing.lookup_many(table, convs[:10]).to_pandas()
    exp_n = len(snap[snap["conv_id"].isin(convs[:10])])
    assert len(many) == exp_n
    # pruning actually happens: a conv appearing in only SOME epochs is
    # bloom-excluded from the others' files (fp rate ~0.5% makes a
    # full-chain pass effectively impossible across 8 probes)
    blooms = table.file_blooms()
    per_conv_excluded = []
    for cid in convs[:8]:
        excluded = sum(
            1
            for blob in blooms.values()
            if not bloom_may_contain(blob, [cid])[0]
        )
        per_conv_excluded.append(excluded)
    assert sum(per_conv_excluded) > 0


def test_missing_key_prunes_everything(table):
    blooms = table.file_blooms()
    ghost = "no-such-conversation-xyz"
    excluded = sum(
        1 for blob in blooms.values() if not bloom_may_contain(blob, [ghost])[0]
    )
    # ~all files excluded for an absent key (fp allows a stray hit)
    assert excluded >= len(blooms) - 1
    assert ing.lookup(table, ghost).num_rows == 0


def test_bloom_kernel_props():
    keys = np.array([f"conv{i}" for i in range(2000)], dtype=object)
    blob = build_key_bloom(keys)
    assert bloom_may_contain(blob, keys).all()
    probe = np.array([f"other{i}" for i in range(20000)], dtype=object)
    assert bloom_may_contain(blob, probe).mean() < 0.03
    # cap: oversized files skip the bloom (read as before)
    big = np.array([f"k{i}" for i in range(70000)], dtype=object)
    assert build_key_bloom(big) == ""
    assert bloom_may_contain("", ["anything"]).all()
