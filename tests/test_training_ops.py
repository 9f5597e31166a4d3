"""Training-data pipeline ops: data mixing (per-source hash rates),
deterministic shard shuffle, and float-free TF-IDF term stats."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from xgeo_ray.functions.relational import mixture_sample, shard_shuffle
from xgeo_ray.functions.text import doc_term_stats

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def test_mixture_sample_rates_and_determinism():
    rates = {"src0": 1000, "src1": 0}
    a = mixture_sample(_docs(), "source", "doc_id", rates, default_permille=200).to_pandas()
    b = mixture_sample(_docs(), "source", "doc_id", rates, default_permille=200).to_pandas()
    # deterministic: identical keep set across runs
    assert sorted(a.doc_id) == sorted(b.doc_id)
    by_src = a.groupby("source").size()
    full = _docs().to_pandas().groupby("source").size()
    assert by_src.get("src0", 0) == full["src0"]  # rate 1000 keeps all
    assert "src1" not in by_src.index  # rate 0 drops all
    # default band ~20%: loose bound per remaining source population
    rest_kept = len(a) - by_src.get("src0", 0)
    rest_full = full.drop(["src0", "src1"]).sum()
    assert 0.05 * rest_full < rest_kept < 0.5 * rest_full


def test_mixture_sample_subset_of_hash_sample():
    """A source at rate r keeps exactly the rows hash_sample(r) keeps —
    the mixture is per-source banding of the SAME predicate."""
    from xgeo_ray.functions.relational import hash_sample

    mix = mixture_sample(
        _docs(), "source", "doc_id", {"src2": 300}, default_permille=0, salt=5
    ).to_pandas()
    plain = hash_sample(_docs(), "doc_id", rate_permille=300, salt=5).to_pandas()
    want = set(plain[plain.source == "src2"].doc_id)
    assert set(mix.doc_id) == want


def test_shard_shuffle_total_permutation_and_salt_independence():
    out = shard_shuffle(_docs(), "doc_id", num_shards=4).to_pandas()
    n = len(out)
    assert n == _docs().count()
    # every (shard, pos) pair unique and pos contiguous from 0 per shard
    for s, g in out.groupby("shard"):
        assert sorted(g.pos) == list(range(len(g)))
    # reproducible
    again = shard_shuffle(_docs(), "doc_id", num_shards=4).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )
    # a different salt is a genuinely different permutation
    other = shard_shuffle(_docs(), "doc_id", num_shards=4, salt=1).to_pandas()
    merged = out.merge(other, on="doc_id", suffixes=("_a", "_b"))
    assert (
        (merged.shard_a != merged.shard_b) | (merged.pos_a != merged.pos_b)
    ).mean() > 0.9
    # shards are balanced (multiplicative hash mixes sequential ids)
    sizes = out.groupby("shard").size()
    assert sizes.max() < 2 * sizes.min()


def test_doc_term_stats_matches_pandas():
    got = doc_term_stats(_docs()).to_pandas()
    docs = _docs().to_pandas()
    tf = collections.Counter()
    for _, r in docs.iterrows():
        for tok in r.text.split():
            tf[(r.doc_id, tok)] += 1
    df = collections.Counter(tok for (_, tok) in tf)
    assert len(got) == len(tf)
    sample = got.sample(200, random_state=0) if len(got) > 200 else got
    for _, r in sample.iterrows():
        assert tf[(r.doc_id, r.token)] == r.tf, (r.doc_id, r.token)
        assert df[r.token] == r.df, r.token
