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
_HASH_KEY = "xgeo_ray_text_v1"  # fixed key → deterministic across processes
_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)


def hash_tokens(tokens: np.ndarray) -> np.ndarray:
    """Vectorized deterministic uint64 hash of a string array (pandas
    siphash with a fixed key — C speed, PYTHONHASHSEED-independent)."""
    import pandas as pd

    if len(tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(
        np.asarray(tokens, dtype=object), hash_key=_HASH_KEY, categorize=False
    )


def _shingles_from_token_hashes(th: np.ndarray, k: int = 3) -> np.ndarray:
    """k-shingle hashes from token hashes: mix of k consecutive token
    hashes, fully vectorized. Returns the UNIQUE shingle set."""
    n = len(th)
    if n == 0:
        return np.array([np.uint64(0)], dtype=np.uint64)
    if n < k:
        h = np.uint64(0xCBF29CE484222325)
        for x in th:
            h = (h ^ x) * _P1
        return np.array([h], dtype=np.uint64)
    acc = th[: n - k + 1] * _P1
    acc = acc ^ (th[1 : n - k + 2] * _P2)
    if k >= 3:
        acc = acc ^ (th[2 : n - k + 3] * _P3)
    return np.unique(acc)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (k consecutive tokens)."""
    return _shingles_from_token_hashes(hash_tokens(np.array(text.split(), dtype=object)), k)


def hash_bytes(b: bytes) -> np.uint64:
    """FNV-1a 64-bit over a short byte string (word-level use only;
    shingle paths use the vectorized hash_tokens instead)."""
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
        return self._sig(_shingle_hashes(text, self.k))

    def _sig(self, sh: np.ndarray) -> np.ndarray:
        # (n_hashes, n_shingles): ((a*x + b) mod M), min over shingles
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_numpy(zero_copy_only=False)
        # hash every token in the batch with ONE vectorized call, then
        # slice per document — no per-token Python hashing
        toks = [t.split() for t in texts]
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        th_all = hash_tokens(flat)
        offs = np.concatenate([[0], np.cumsum(lens)])
        sigs = np.stack(
            [
                self._sig(_shingles_from_token_hashes(th_all[offs[i] : offs[i + 1]], self.k))
                for i in range(len(texts))
            ]
        )
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
    """Near-duplicate pairs via MinHash + LSH banding, Jaccard-verified
    (Broder, "On the resemblance and containment of documents", 1997;
    banding per Indyk & Motwani / Gionis et al. LSH).

    docs must have columns (doc_id, text). Returns (doc_id_a, doc_id_b,
    jaccard) with doc_id_a < doc_id_b, deduplicated across bands."""
    texts_small = docs.select_columns(["doc_id", "text"])
    # instance-passed (task-based): MinHasher's setup is 128 rng draws,
    # an actor pool would only add spin-up latency at bench scale. The
    # signature + banding steps fuse into one map stage (one execution,
    # and the wide signature column never enters the object store).
    mh = MinHasher(num_hashes, k_shingle)

    def sig_and_bands(b: pa.Table) -> pa.Table:
        return explode_bands(mh(b), num_bands)

    bands = docs.map_batches(sig_and_bands, batch_format="pyarrow")

    # candidate pairs: one map_groups call PER BAND (num_bands calls, not
    # one per bucket); inside, singleton buckets are masked out and the
    # surviving buckets pair up via one vectorized self-merge
    def pairs_in_band(g: pd.DataFrame) -> pd.DataFrame:
        dup = g[g.duplicated("band_hash", keep=False)][["band_hash", "doc_id"]]
        if len(dup) < 2:
            empty = np.empty(0, dtype=np.int64)
            return pd.DataFrame({"doc_id_a": empty, "doc_id_b": empty})
        m = dup.merge(dup, on="band_hash", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return m[["doc_id_a", "doc_id_b"]].drop_duplicates()

    cands = bands.groupby("band").map_groups(pairs_in_band, batch_format="pandas")

    # verify with true Jaccard: broadcast the (doc_id, text) projection —
    # two columns, not the full table — once via ray.put. A pair found by
    # multiple bands is verified up to num_bands times (bounded, cheap);
    # the dedup happens on the *verified* (small) result instead of
    # shuffling the whole candidate set a second time.
    import ray as _ray

    texts_ref = _ray.put(pa.concat_tables(_ray.get(texts_small.to_arrow_refs())))

    class Verify:
        def __init__(self, ref):
            self.ref = ref
            self.text = None
            self._sh: dict[int, frozenset] = {}  # shingle sets, computed once per doc

        def _load(self):
            t = _ray.get(self.ref)  # zero-copy from local plasma, per task
            self.text = dict(
                zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
            )

        def _shingles(self, doc_id: int) -> frozenset:
            s = self._sh.get(doc_id)
            if s is None:
                s = frozenset(_shingle_hashes(self.text[doc_id], k_shingle).tolist())
                self._sh[doc_id] = s
            return s

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                batch["jaccard"] = np.empty(0, np.float64)
                return batch
            if self.text is None:
                self._load()
            batch = batch.drop_duplicates(subset=["doc_id_a", "doc_id_b"]).copy()
            js = []
            for a, b in zip(batch["doc_id_a"], batch["doc_id_b"]):
                sa, sb = self._shingles(a), self._shingles(b)
                u = len(sa | sb)
                js.append(len(sa & sb) / u if u else 1.0)
            batch["jaccard"] = js
            return batch[batch["jaccard"] >= threshold]

    verified = cands.map_batches(Verify(texts_ref), batch_format="pandas")
    # global dedup of the verified pairs — a tiny result by construction,
    # so a driver-side drop_duplicates beats a second full shuffle
    out = pa.concat_tables(
        _ray.get(verified.to_arrow_refs()), promote_options="permissive"
    )
    df = out.to_pandas().drop_duplicates(subset=["doc_id_a", "doc_id_b"])
    df = df.sort_values(["doc_id_a", "doc_id_b"], kind="stable").reset_index(drop=True)
    return ray.data.from_pandas(df)


class SimHasher:
    """64-bit SimHash over word-level features (callable-class stage;
    Charikar, "Similarity estimation techniques from rounding
    algorithms", STOC 2002)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    _SHIFTS = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> np.uint64:
        return self._from_hashes(hash_tokens(np.array(text.split(), dtype=object)))

    def _from_hashes(self, th: np.ndarray) -> np.uint64:
        th = np.unique(th)  # word-set semantics
        if len(th) == 0:
            return np.uint64(0)
        bits = (th[:, None] >> self._SHIFTS[None, :]) & np.uint64(1)  # (n, 64)
        acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        return ((acc > 0).astype(np.uint64) << self._SHIFTS).sum(dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_numpy(zero_copy_only=False)
        toks = [t.split() for t in texts]
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        th_all = hash_tokens(flat)
        offs = np.concatenate([[0], np.cumsum(lens)])
        hs = np.array(
            [self._from_hashes(th_all[offs[i] : offs[i + 1]]) for i in range(len(texts))],
            dtype=np.uint64,
        )
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
            e = np.empty(0, dtype=np.int64)
            return pd.DataFrame(
                {"vec_id_a": e, "vec_id_b": e, "cosine": np.empty(0, np.float64)}
            )
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


class ShingleExploder:
    """(doc_id, text) -> exploded (doc_id, sh, size): one row per DISTINCT
    word-k-shingle hash, with the doc's shingle-set size denormalized onto
    every row so the downstream pair aggregation never needs a broadcast
    or a sizes join (scale-safe at any number of documents)."""

    def __init__(self, k_shingle: int = 3):
        self.k = k_shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [t.split() for t in texts]
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        th_all = hash_tokens(flat)
        offs = np.concatenate([[0], np.cumsum(lens)])
        sh_list = [
            _shingles_from_token_hashes(th_all[offs[i] : offs[i + 1]], self.k)
            for i in range(len(texts))
        ]
        counts = np.array([len(s) for s in sh_list], dtype=np.int64)
        sh = (
            np.concatenate(sh_list)
            if sh_list
            else np.empty(0, dtype=np.uint64)
        )
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
                "sh": pa.array(sh.view(np.int64), pa.int64()),
                "size": pa.array(np.repeat(counts, counts), pa.int64()),
            }
        )


def ngram_jaccard_dup_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    k_shingle: int = 3,
    max_df: int | None = None,
    num_buckets: int = 256,
) -> ray.data.Dataset:
    """EXACT n-gram Jaccard similarity join (vs the probabilistic
    MinHash/LSH path): distributed inverted index on shingle hashes —
    the signature/candidate/verify shape of set-similarity joins
    (Chaudhuri, Ganti & Kaushik, "A primitive operator for similarity
    joins", ICDE 2006; max_df echoes their stop-signature pruning).

    explode distinct shingles -> co-group docs sharing a shingle (bucketed
    by sh % num_buckets so one vectorized self-merge handles many shingles
    per group call) -> count shared shingles per pair via groupby
    aggregate -> jaccard = inter / (|A| + |B| - inter) >= threshold.

    ``max_df`` (scale knob) drops shingles whose document frequency
    exceeds the cap before pairing — bounding the quadratic blowup on
    ubiquitous shingles at the cost of recall only for pairs whose every
    common shingle is a stop-shingle. None = exact join semantics.
    """
    from ray.data.aggregate import Count, Max

    ex = docs.select_columns(["doc_id", "text"]).map_batches(
        ShingleExploder(k_shingle), batch_format="pyarrow"
    )
    mask = pa.scalar(num_buckets - 1, pa.int64())
    ex = ex.map_batches(
        lambda b: b.append_column(
            "bucket", pc.bit_wise_and(b.column("sh"), mask)
        ),
        batch_format="pyarrow",
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if max_df is not None:
            g = g[g.groupby("sh")["doc_id"].transform("size") <= max_df]
        dup = g[g.duplicated("sh", keep=False)][["sh", "doc_id", "size"]]
        if len(dup) < 2:
            e = np.empty(0, dtype=np.int64)
            return pd.DataFrame(
                {"doc_id_a": e, "doc_id_b": e, "size_a": e, "size_b": e}
            )
        m = dup.merge(dup, on="sh", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return m[["doc_id_a", "doc_id_b", "size_a", "size_b"]]

    cands = ex.groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    agg = cands.groupby(["doc_id_a", "doc_id_b"]).aggregate(
        Count(), Max("size_a"), Max("size_b")
    )

    def finish(b: pa.Table) -> pa.Table:
        inter = b.column("count()").to_numpy().astype(np.float64)
        sa = b.column("max(size_a)").to_numpy().astype(np.float64)
        sb = b.column("max(size_b)").to_numpy().astype(np.float64)
        jac = inter / (sa + sb - inter)
        out = pa.table(
            {
                "doc_id_a": b.column("doc_id_a"),
                "doc_id_b": b.column("doc_id_b"),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    return agg.map_batches(finish, batch_format="pyarrow")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array."""
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(
        axis=1
    ).astype(np.int64)


def simhash_dup_pairs(
    docs: ray.data.Dataset,
    max_hamming: int = 3,
    num_bands: int = 4,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: band the 64-bit signature into
    ``num_bands`` exact-match blocks (pigeonhole: any pair within
    hamming distance num_bands-1 shares at least one identical band),
    pair up within band buckets, verify true hamming distance.

    Returns (doc_id_a, doc_id_b, hamming) with hamming <= max_hamming.
    For full recall choose num_bands > max_hamming."""
    from xgeo_ray.functions.relational import partial_group_agg

    width = 64 // num_bands
    mask = np.uint64((1 << width) - 1)

    def explode(b: pa.Table) -> pa.Table:
        h = b.column("simhash").to_numpy().view(np.uint64)
        ids = b.column("doc_id").to_numpy().astype(np.int64)
        n = len(ids)
        shifts = (np.uint64(width) * np.arange(num_bands, dtype=np.uint64))
        band_val = ((h[:, None] >> shifts[None, :]) & mask).reshape(-1)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, num_bands), pa.int64()),
                "simhash": pa.array(
                    np.repeat(h, num_bands).view(np.int64), pa.int64()
                ),
                "band": pa.array(
                    np.tile(np.arange(num_bands, dtype=np.int64), n), pa.int64()
                ),
                "band_val": pa.array(band_val.view(np.int64), pa.int64()),
            }
        )

    sigs = docs.map_batches(SimHasher(), batch_format="pyarrow")
    bands = sigs.map_batches(explode, batch_format="pyarrow")

    def pairs_in_band(g: pd.DataFrame) -> pd.DataFrame:
        dup = g[g.duplicated("band_val", keep=False)][
            ["band_val", "doc_id", "simhash"]
        ]
        if len(dup) < 2:
            e = np.empty(0, dtype=np.int64)
            return pd.DataFrame({"doc_id_a": e, "doc_id_b": e, "hamming": e})
        m = dup.merge(dup, on="band_val", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        if not len(m):
            e = np.empty(0, dtype=np.int64)
            return pd.DataFrame({"doc_id_a": e, "doc_id_b": e, "hamming": e})
        ham = _popcount64(
            m["simhash_a"].to_numpy().view(np.uint64)
            ^ m["simhash_b"].to_numpy().view(np.uint64)
        )
        m = m.assign(hamming=ham)
        m = m[m["hamming"] <= max_hamming]
        return m[["doc_id_a", "doc_id_b", "hamming"]].drop_duplicates(
            ["doc_id_a", "doc_id_b"]
        )

    cands = bands.groupby("band").map_groups(pairs_in_band, batch_format="pandas")
    # a pair found in multiple bands collapses via a tiny grouped min
    return partial_group_agg(
        cands, ["doc_id_a", "doc_id_b"], [("hamming", "min", "hamming")]
    )
