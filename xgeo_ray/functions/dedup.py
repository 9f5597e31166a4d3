"""Deduplication family for training-data pipelines (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding cosine).

Scale shapes (the part that matters at 100 TB):
  * exact: hash-partitioned groupby on the content key, keep first —
    one shuffle of (hash, id) pairs, never the full text twice.
  * MinHash-LSH: per-batch shingle->minhash (vectorized), explode to
    (band, band_hash, doc_id) rows, groupby the band bucket — candidate
    pairs only ever meet inside a bucket; no all-pairs comparison.
  * SimHash: 64-bit signature per doc; near-dup = bucket by signature
    prefix bands, verify Hamming distance inside buckets.
  * embedding cosine: normalized vectors, LSH by random hyperplanes or
    brute-force within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (k consecutive tokens)."""
    toks = text.split()
    if len(toks) < k:
        return np.array(
            [hash_bytes(" ".join(toks).encode())], dtype=np.uint64
        )
    joined = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array([hash_bytes(s.encode()) for s in joined], dtype=np.uint64))


def hash_bytes(b: bytes) -> np.uint64:
    """FNV-1a 64-bit — deterministic across processes (no PYTHONHASHSEED)."""
    h = np.uint64(0xCBF29CE484222325)
    for byte in b:
        h = np.uint64((int(h) ^ byte) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
    return h


class MinHasher:
    """MinHash signatures over word shingles; permutation parameters are
    built once per actor (callable-class map_batches stage)."""

    def __init__(self, num_hashes: int = 64, k_shingle: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_MERSENNE), size=num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=num_hashes, dtype=np.uint64)
        self.k = k_shingle
        self.n = num_hashes

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (n_hashes, n_shingles): ((a*x + b) mod M), min over shingles
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_numpy(zero_copy_only=False)
        sigs = np.stack([self.signature(t) for t in texts])
        return batch.append_column(
            "minhash", pa.array(list(sigs.astype(np.uint64).view(np.int64)), pa.list_(pa.int64(), self.n))
        )


def explode_bands(batch: pa.Table, num_bands: int = 16) -> pa.Table:
    """LSH banding: one row per (doc, band) with the band's hash — the
    groupby key that co-locates near-duplicate candidates."""
    sigs = np.stack(batch.column("minhash").to_numpy(zero_copy_only=False))
    n_docs, n_hashes = sigs.shape
    rows_per_band = n_hashes // num_bands
    doc_ids = batch.column("doc_id").to_numpy()
    bands = sigs[:, : num_bands * rows_per_band].reshape(n_docs, num_bands, rows_per_band)
    # hash each band slice to one int64
    band_hash = (
        bands.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    ).sum(axis=2).astype(np.int64)
    return pa.table(
        {
            "doc_id": np.repeat(doc_ids, num_bands),
            "band": np.tile(np.arange(num_bands, dtype=np.int32), n_docs),
            "band_hash": band_hash.reshape(-1),
        }
    )


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(_shingle_hashes(a, k).tolist()), set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_lsh_dup_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    num_hashes: int = 64,
    num_bands: int = 16,
    k_shingle: int = 3,
) -> ray.data.Dataset:
    """Near-duplicate pairs via MinHash + LSH banding, Jaccard-verified.

    docs must have columns (doc_id, text). Returns (doc_id_a, doc_id_b,
    jaccard) with doc_id_a < doc_id_b, deduplicated across bands."""
    texts_small = docs.select_columns(["doc_id", "text"])
    sigs = docs.map_batches(
        MinHasher,
        fn_constructor_args=(num_hashes, k_shingle),
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    bands = sigs.map_batches(
        lambda b: explode_bands(b, num_bands), batch_format="pyarrow"
    )

    # candidate pairs inside each (band, band_hash) bucket
    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_id_a": [], "doc_id_b": []})
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_id_a": ids[a], "doc_id_b": ids[b]})

    cands = bands.groupby(["band", "band_hash"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    # dedup candidate pairs discovered by multiple bands
    uniq = cands.groupby(["doc_id_a", "doc_id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )

    # verify with true Jaccard: broadcast the (doc_id, text) projection —
    # two columns, not the full table — once via ray.put
    import ray as _ray

    texts_ref = _ray.put(pa.concat_tables(_ray.get(texts_small.to_arrow_refs())))

    class Verify:
        def __init__(self):
            t = _ray.get(texts_ref)
            self.text = dict(
                zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
            )

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                batch["jaccard"] = []
                return batch
            batch = batch.copy()
            batch["jaccard"] = [
                jaccard(self.text[a], self.text[b], k_shingle)
                for a, b in zip(batch["doc_id_a"], batch["doc_id_b"])
            ]
            return batch[batch["jaccard"] >= threshold]

    return uniq.map_batches(Verify, batch_format="pandas", concurrency=(1, 4))


class SimHasher:
    """64-bit SimHash over word-level features (callable-class stage)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def simhash(self, text: str) -> np.uint64:
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for w in set(text.split()):
            h = hash_bytes(w.encode())
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        out = np.uint64(0)
        for i in range(64):
            if acc[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_numpy(zero_copy_only=False)
        hs = np.array([self.simhash(t) for t in texts], dtype=np.uint64)
        return batch.append_column("simhash", pa.array(hs.view(np.int64), pa.int64()))


def exact_dedup_groups(docs: ray.data.Dataset, content_col: str = "text"):
    """Exact dedup: group by content, keep (representative=min id, count).
    At scale the groupby key would be a content hash computed per batch so
    only (hash, id) crosses the shuffle — here text is the key directly
    for oracle comparability."""
    from xgeo_ray.functions.relational import partial_group_agg

    return partial_group_agg(
        docs.select_columns([content_col, "doc_id"]),
        [content_col],
        [("doc_id", "min", "doc_id"), ("doc_id", "count", "n_copies")],
    ).select_columns(["doc_id", "n_copies"])


def embedding_dup_pairs(
    emb: ray.data.Dataset, threshold: float = 0.95, num_planes: int = 8, seed: int = 11
) -> ray.data.Dataset:
    """Embedding near-dup: LSH by random-hyperplane sign buckets, exact
    cosine verify inside each bucket (no all-pairs matmul)."""
    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch.column("embedding").to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        # deterministic planes (same seed every batch/worker)
        planes_local = np.random.default_rng(seed).standard_normal(
            (vecs.shape[1], num_planes)
        )
        signs = (vecs @ planes_local > 0).astype(np.uint32)
        bucket = (signs * (1 << np.arange(num_planes, dtype=np.uint32))).sum(axis=1)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "bucket": pa.array(bucket.astype(np.int64)),
                "unit": pa.array(list(unit), pa.list_(pa.float64())),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": [], "cosine": []})
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(g["unit"].to_numpy()[order])
        sim = m @ m.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = sim[a, b] >= threshold
        return pd.DataFrame(
            {"vec_id_a": ids[a][keep], "vec_id_b": ids[b][keep], "cosine": sim[a, b][keep]}
        )

    buckets = emb.map_batches(bucketize, batch_format="pyarrow")
    return buckets.groupby("bucket").map_groups(pairs, batch_format="pandas")
