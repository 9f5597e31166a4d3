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
        # odd multipliers → each (a*x + b) mod 2^64 is a bijection
        self.a = rng.integers(1, 1 << 63, size=num_hashes, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=num_hashes, dtype=np.uint64)
        self.k = k_shingle
        self.n = num_hashes

    def signature(self, text: str) -> np.ndarray:
        return self._sig(_shingle_hashes(text, self.k))

    def _sig(self, sh: np.ndarray) -> np.ndarray:
        # (n_hashes, n_shingles): multiply-add over Z/2^64 (wrap-around is
        # the hash; a uint64 modulo here costs ~3x the whole multiply on
        # modern SIMD), min over shingles
        v = self.a[:, None] * sh[None, :] + self.b[:, None]
        return v.min(axis=1)

    # docs per vectorized permute block: bounds the (num_hashes, S) temp
    _CHUNK = 512

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_numpy(zero_copy_only=False)
        # hash every token in the batch with ONE vectorized call, then
        # slice per document — no per-token Python hashing
        toks = [t.split() for t in texts]
        lens = np.array([len(x) for x in toks], dtype=np.int64)
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        th_all = hash_tokens(flat)
        offs = np.concatenate([[0], np.cumsum(lens)])
        n_docs = len(texts)
        sh_list = [
            _shingles_from_token_hashes(th_all[offs[i] : offs[i + 1]], self.k)
            for i in range(n_docs)
        ]
        counts = np.array([len(s) for s in sh_list], dtype=np.int64)
        sh_offs = np.concatenate([[0], np.cumsum(counts)])
        sh_flat = (
            np.concatenate(sh_list) if sh_list else np.empty(0, dtype=np.uint64)
        )
        # one (num_hashes × shingles) permute + minimum.reduceat per chunk
        # of docs — vectorized ACROSS documents, not a per-doc matmul loop
        sigs = np.empty((n_docs, self.n), dtype=np.uint64)
        for c0 in range(0, n_docs, self._CHUNK):
            c1 = min(c0 + self._CHUNK, n_docs)
            sl = sh_flat[sh_offs[c0] : sh_offs[c1]]
            local = sh_offs[c0 : c1 + 1] - sh_offs[c0]
            v = self.a[:, None] * sl[None, :] + self.b[:, None]
            sigs[c0:c1] = np.minimum.reduceat(v, local[:-1], axis=1).T
        return batch.append_column(
            "minhash",
            pa.array(list(sigs.view(np.int64)), pa.list_(pa.int64(), self.n)),
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


_PAIR_SCHEMA = pa.schema(
    [
        ("doc_id_a", pa.int64()),
        ("doc_id_b", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)

_BAND_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("band", pa.int32()), ("band_hash", pa.int64())]
)


@ray.remote
def _mh_band_map(block: pa.Table, mh, num_bands: int, num_buckets: int):
    """Map side of the candidate exchange: signatures + banding for one
    block, argsort-split by band_hash bucket, num_buckets zero-copy
    slices as separate returns (the ingest radix-exchange pattern,
    pipelines/ingest._radix_map — Ray Data's generic all-to-alls
    measured 4-7x slower on precomputed int keys)."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    if block.num_rows == 0:
        empty = _BAND_SCHEMA.empty_table()
        return tuple([empty] * num_buckets) if num_buckets > 1 else empty
    t = explode_bands(mh(block), num_bands)
    bk = _cc_bucket_of(t.column("band_hash").to_numpy(), num_buckets)
    return _cc_split(t, bk, num_buckets)


_MH_IDPAIR_SCHEMA = pa.schema([("doc_id_a", pa.int64()), ("doc_id_b", pa.int64())])


@ray.remote
def _mh_pair_reduce(num_buckets: int, *subs: pa.Table):
    """Reduce side: all rows of this band_hash bucket, across all blocks.
    Pairs form within exact (band, band_hash) groups via one vectorized
    self-merge (singleton hashes masked out first), then radix-split by
    hash(doc_id_a) into the VERIFY buckets — every copy of a pair (found
    by different bands) lands in the same verify bucket, so the
    cross-band dedup happens there, never on the driver."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    nb = num_buckets
    empty = _MH_IDPAIR_SCHEMA.empty_table()
    subs = [s for s in subs if s.num_rows]
    m = None
    if subs:
        g = pa.concat_tables(subs).to_pandas()
        dup = g[g.duplicated(["band", "band_hash"], keep=False)][
            ["band", "band_hash", "doc_id"]
        ]
        if len(dup) >= 2:
            m = dup.merge(dup, on=["band", "band_hash"], suffixes=("_a", "_b"))
            m = m[m["doc_id_a"] < m["doc_id_b"]][["doc_id_a", "doc_id_b"]]
            m = m.drop_duplicates()
    if m is None or not len(m):
        return tuple([empty] * nb) if nb > 1 else empty
    t = pa.Table.from_pandas(m, preserve_index=False).cast(_MH_IDPAIR_SCHEMA)
    bk = _cc_bucket_of(t.column("doc_id_a").to_numpy(), nb)
    return _cc_split(t, bk, nb)


@ray.remote(num_returns=2)
def _mh_pair_dedup(*slices: pa.Table):
    """One verify bucket's candidate pairs from every band bucket:
    concat, drop cross-band duplicates, and derive the ids this bucket
    needs shingle sets for. Returns (pairs, needed_ids) — both stay in
    the object store; the driver only passes the refs along."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    slices = [s for s in slices if s.num_rows]
    if not slices:
        empty = _MH_IDPAIR_SCHEMA.empty_table()
        return empty, pa.table({"doc_id": pa.array([], pa.int64())})
    df = pa.concat_tables(slices).to_pandas().drop_duplicates()
    t = pa.Table.from_pandas(df, preserve_index=False).cast(_MH_IDPAIR_SCHEMA)
    ids = np.unique(
        np.concatenate(
            [t.column("doc_id_a").to_numpy(), t.column("doc_id_b").to_numpy()]
        )
    )
    return t, pa.table({"doc_id": pa.array(ids, pa.int64())})


@ray.remote
def _mh_sets_map(block: pa.Table, k_shingle: int, num_buckets: int, *needed: pa.Table):
    """Pack shingle sets for this block's candidate docs, replicated to
    the verify buckets that need them (one needed-ids table per bucket,
    shipped by reference from _mh_pair_dedup — no driver routing dict);
    returns num_buckets slices. Sets are packed ONCE per doc (a zero-copy
    ListArray rebuild over the exploded shingles), then each bucket's
    slice is an is_in filter over the packed table."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    nb = num_buckets
    empty = pa.table(
        {"probe_id": pa.array([], pa.int64()), "sh": pa.array([], pa.list_(pa.int64()))}
    )
    union_ids = np.unique(
        np.concatenate([t.column("doc_id").to_numpy() for t in needed])
        if needed
        else np.empty(0, dtype=np.int64)
    )
    block = block.filter(
        pc.is_in(block.column("doc_id"), value_set=pa.array(union_ids, pa.int64()))
    )
    if block.num_rows == 0:
        return tuple([empty] * nb) if nb > 1 else empty
    ex = ShingleExploder(k_shingle)(block)
    ids = ex.column("doc_id").to_numpy()
    bounds = np.flatnonzero(np.concatenate([[True], ids[1:] != ids[:-1], [True]]))
    packed = pa.table(
        {
            "probe_id": pa.array(ids[bounds[:-1]], pa.int64()),
            "sh": pa.ListArray.from_arrays(
                pa.array(bounds, pa.int32()), ex.column("sh").combine_chunks()
            ),
        }
    )
    out = tuple(
        packed.filter(
            pc.is_in(
                packed.column("probe_id"),
                value_set=t.column("doc_id").combine_chunks(),
            )
        )
        for t in needed
    )
    return out if nb > 1 else out[0]


def _mh_gather_runs(
    offs: np.ndarray, lens: np.ndarray, rows: np.ndarray
) -> np.ndarray:
    """Flat gather indices for variable-length runs: for each row r in
    ``rows``, the index range [offs[r], offs[r]+lens[r]) — the standard
    repeat+arange trick, no per-row loop."""
    ln = lens[rows]
    total = int(ln.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.repeat(offs[rows], ln)
    run0 = np.repeat(np.cumsum(ln) - ln, ln)
    return starts + (np.arange(total, dtype=np.int64) - run0)


@ray.remote
def _mh_verify_reduce(pairs: pa.Table, threshold: float, *set_slices: pa.Table):
    """Exact-Jaccard verify of one bucket's candidate pairs against the
    co-shuffled shingle sets. Pairs arrive pre-deduplicated.

    Fully vectorized (the exploded sort-and-count shape
    ngram_jaccard_dup_pairs uses): both docs' shingle sets explode to
    (pair_idx, sh) rows in one gather, and because each doc's set is
    unique-valued, a lexsort makes every shared shingle an adjacent
    duplicate — intersection sizes fall out of one bincount. No
    per-pair Python on the dedup hot path."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    set_slices = [s for s in set_slices if s.num_rows]
    if pairs.num_rows == 0 or not set_slices:
        return _PAIR_SCHEMA.empty_table()
    sets = pa.concat_tables(set_slices)
    ids = sets.column("probe_id").to_numpy()
    la = sets.column("sh").combine_chunks()
    flat = la.values.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = offs[1:] - offs[:-1]
    # doc_id -> packed row (each candidate doc packed exactly once)
    sidx = np.argsort(ids, kind="stable")
    sorted_ids = ids[sidx]

    def rows_of(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        pos = np.searchsorted(sorted_ids, keys)
        ok = (pos < len(sorted_ids)) & (sorted_ids[np.minimum(pos, len(sorted_ids) - 1)] == keys)
        return sidx[np.minimum(pos, len(sorted_ids) - 1)], ok

    a = pairs.column("doc_id_a").to_numpy()
    b = pairs.column("doc_id_b").to_numpy()
    ra, oka = rows_of(a)
    rb, okb = rows_of(b)
    keep = oka & okb  # pairs missing a set (doc outside this bucket's slices)
    if not keep.any():
        return _PAIR_SCHEMA.empty_table()
    a, b, ra, rb = a[keep], b[keep], ra[keep], rb[keep]
    npairs = len(a)
    len_a, len_b = lens[ra], lens[rb]
    pid = np.arange(npairs, dtype=np.int64)
    vals = np.concatenate(
        [flat[_mh_gather_runs(offs[:-1], lens, ra)], flat[_mh_gather_runs(offs[:-1], lens, rb)]]
    )
    prep = np.concatenate([np.repeat(pid, len_a), np.repeat(pid, len_b)])
    order = np.lexsort((vals, prep))
    pr, vv = prep[order], vals[order]
    dup = (pr[1:] == pr[:-1]) & (vv[1:] == vv[:-1])
    inter = np.bincount(pr[1:][dup], minlength=npairs)
    union = len_a + len_b - inter
    j = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
    hit = j >= threshold
    return pa.table(
        {
            "doc_id_a": pa.array(a[hit], pa.int64()),
            "doc_id_b": pa.array(b[hit], pa.int64()),
            "jaccard": pa.array(j[hit], pa.float64()),
        }
    )


def minhash_lsh_dup_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    num_hashes: int = 64,
    num_bands: int = 16,
    k_shingle: int = 3,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Near-duplicate pairs via MinHash + LSH banding, true-Jaccard
    verified (Broder, "On the resemblance and containment of documents",
    1997; banding per Indyk & Motwani / Gionis et al. LSH).

    docs must have columns (doc_id, text). Returns (doc_id_a, doc_id_b,
    jaccard) with doc_id_a < doc_id_b, deduplicated across bands.

    Fully distributed — NOTHING data-proportional reaches the driver,
    not even candidate id pairs (the driver only wires object refs):
      1. signature + banding fused into one map task per block; candidate
         pairs form inside (band, band_hash) buckets via a raw-Ray radix
         exchange (the ingest pattern, ingest._radix_exchange_apply —
         measured 4-7x faster than Dataset all-to-alls on int keys),
      2. each band bucket radix-splits its pairs by hash(doc_id_a) into
         the verify buckets; one task per verify bucket dedups cross-band
         copies (hash(doc_id_a) is deterministic, so every copy of a pair
         meets there) and derives its needed-ids table — pairs and
         routing live in the object store end to end,
      3. verification co-partitions the pairs with per-doc shingle sets:
         a second radix exchange over the doc blocks packs each candidate
         doc's set once and ships it to exactly the buckets whose
         needed-ids tables contain it.
    Partitioning assumption: the two-column (doc_id, text) projection is
    materialized block-wise in the object store (spillable), each block
    visited once per exchange."""
    import ray as _ray

    from ray.data.dataset import MaterializedDataset

    if not (
        isinstance(docs, MaterializedDataset)
        and set(docs.schema().names) == {"doc_id", "text"}
    ):
        docs = docs.select_columns(["doc_id", "text"]).materialize()
    block_refs = docs.to_arrow_refs()
    if not block_refs:
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())

    # instance-passed: MinHasher's setup is 128 rng draws — ship it once
    mh_ref = _ray.put(MinHasher(num_hashes, k_shingle))
    nb = num_buckets if num_buckets is not None else _auto_buckets(len(block_refs))
    maps = [
        _mh_band_map.options(num_returns=nb if nb > 1 else None).remote(
            r, mh_ref, num_bands, nb
        )
        for r in block_refs
    ]
    if nb == 1:
        maps = [[m] for m in maps]
    band_pairs = [
        _mh_pair_reduce.options(num_returns=nb if nb > 1 else None).remote(
            nb, *[m[b] for m in maps]
        )
        for b in range(nb)
    ]
    if nb == 1:
        band_pairs = [[p] for p in band_pairs]
    pair_refs, needed_refs = [], []
    for b in range(nb):
        p, ids = _mh_pair_dedup.remote(*[band_pairs[src][b] for src in range(nb)])
        pair_refs.append(p)
        needed_refs.append(ids)
    sets_maps = [
        _mh_sets_map.options(num_returns=nb if nb > 1 else None).remote(
            r, k_shingle, nb, *needed_refs
        )
        for r in block_refs
    ]
    if nb == 1:
        sets_maps = [[m] for m in sets_maps]
    verified = [
        _mh_verify_reduce.remote(
            pair_refs[b], threshold, *[m[b] for m in sets_maps]
        )
        for b in range(nb)
    ]
    return ray.data.from_arrow_refs(verified)


def _auto_buckets(n_blocks: int, lo: int = 8, hi: int = 256) -> int:
    """Radix fan-out derived from the input's block count, so the
    dedup/cc/verify exchanges scale task parallelism with data size
    (100x input -> ~100x buckets) without a code change. Clamped:
    below ``lo`` even one node is under-used; above ``hi`` the
    blocks x buckets ref-wiring dominates (at that scale blocks should
    be resized toward ~0.5-2 s of work each instead — the repo's task
    sizing rule — which keeps the block count, and hence nb, bounded)."""
    return max(lo, min(hi, n_blocks))


def _cc_bucket_of(ids: np.ndarray, nb: int) -> np.ndarray:
    return (ids.astype(np.uint64) * _P1 % np.uint64(nb)).astype(np.int64)


def _cc_split(t: pa.Table, bk: np.ndarray, nb: int):
    """argsort-split a table into nb zero-copy slices by bucket id (the
    radix-exchange map shape, pipelines/ingest._radix_map)."""
    order = np.argsort(bk, kind="stable")
    t = t.take(order)
    bounds = np.searchsorted(bk[order], np.arange(nb + 1))
    out = tuple(t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(nb))
    return out if nb > 1 else out[0]


_CC_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])
_CC_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


@ray.remote
def _cc_edge_map(block: pa.Table, nb: int):
    """Symmetrize one pairs block and radix-split by hash(u) bucket, so
    every node's full adjacency lands in exactly one bucket."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    if block.num_rows == 0:
        empty = _CC_EDGE_SCHEMA.empty_table()
        return tuple([empty] * nb) if nb > 1 else empty
    a = block.column("doc_id_a").to_numpy().astype(np.int64)
    b = block.column("doc_id_b").to_numpy().astype(np.int64)
    u = np.concatenate([a, b])
    v = np.concatenate([b, a])
    t = pa.table({"u": pa.array(u), "v": pa.array(v)}, schema=_CC_EDGE_SCHEMA)
    return _cc_split(t, _cc_bucket_of(u, nb), nb)


@ray.remote(num_returns=2)
def _cc_edge_reduce(*slices: pa.Table):
    """One bucket's edges from every map task: concat, sort by u, and
    derive the initial labels (grouped min of min(u, v) per u) in the
    same pass. Returns (edges sorted by u, labels sorted by node)."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    slices = [s for s in slices if s.num_rows]
    if not slices:
        return _CC_EDGE_SCHEMA.empty_table(), _CC_LABEL_SCHEMA.empty_table()
    t = pa.concat_tables(slices)
    u = t.column("u").to_numpy()
    order = np.argsort(u, kind="stable")
    t = t.take(order)
    u = u[order]
    v = t.column("v").to_numpy()
    starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
    lab = np.minimum.reduceat(np.minimum(u, v), starts)
    labels = pa.table(
        {"node": pa.array(u[starts]), "label": pa.array(lab)},
        schema=_CC_LABEL_SCHEMA,
    )
    return t, labels


@ray.remote
def _cc_step(edges: pa.Table, labels: pa.Table, nb: int):
    """One propagation round, map side: message (v, label[u]) per edge,
    radix-split by hash(v) bucket. label[u] is a searchsorted gather —
    both tables arrive sorted, no dict, no per-row Python."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    if edges.num_rows == 0:
        empty = _CC_LABEL_SCHEMA.empty_table()
        return tuple([empty] * nb) if nb > 1 else empty
    u = edges.column("u").to_numpy()
    v = edges.column("v").to_numpy()
    nodes = labels.column("node").to_numpy()
    lab = labels.column("label").to_numpy()
    msg = pa.table(
        {"node": pa.array(v), "label": pa.array(lab[np.searchsorted(nodes, u)])},
        schema=_CC_LABEL_SCHEMA,
    )
    return _cc_split(msg, _cc_bucket_of(v, nb), nb)


@ray.remote(num_returns=2)
def _cc_update(labels: pa.Table, *msg_slices: pa.Table):
    """One propagation round, reduce side: grouped min over (own labels +
    incoming messages). Returns (new labels sorted by node, number of
    labels that changed) — the driver sees only the scalar."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    msg_slices = [m for m in msg_slices if m.num_rows]
    if not msg_slices:
        return labels, 0
    t = pa.concat_tables([labels, *msg_slices])
    n = t.column("node").to_numpy()
    order = np.argsort(n, kind="stable")
    n = n[order]
    lab = t.column("label").to_numpy()[order]
    starts = np.flatnonzero(np.concatenate([[True], n[1:] != n[:-1]]))
    new_lab = np.minimum.reduceat(lab, starts)
    # node set is static (every node appears in its bucket's edges as u),
    # so old and new label arrays align positionally
    changed = int(np.count_nonzero(new_lab != labels.column("label").to_numpy()))
    out = pa.table(
        {"node": pa.array(n[starts]), "label": pa.array(new_lab)},
        schema=_CC_LABEL_SCHEMA,
    )
    return out, changed


def dup_clusters(
    pairs: ray.data.Dataset, max_iters: int = 25, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Connected components over a duplicate-pair edge list — the
    cluster-assignment step of a dedup pipeline (every doc in a cluster
    gets ``cluster_id`` = the smallest doc_id it can reach; downstream
    keeps one representative per cluster).

    Iterative MIN-LABEL PROPAGATION (the classic Pregel/hash-min shape),
    FULLY DISTRIBUTED via the repo's raw radix-exchange pattern: edges
    are hash-partitioned by node once (each node's full adjacency in one
    bucket), then every round is nb map tasks (message = (v, label[u]),
    a searchsorted gather over the co-sorted label table) and nb reduce
    tasks (grouped min of own labels + incoming messages). Converges in
    O(component diameter) rounds — 1-2 for dup clusters. The driver sees
    only nb changed-label COUNTS per round (convergence = zero changed);
    no label table, pair table, or dict ever materializes driver-side.

    Input: (doc_id_a, doc_id_b [, ...]) pairs. Output: (doc_id,
    cluster_id) for every doc appearing in at least one pair."""
    import ray as _ray

    block_refs = pairs.materialize().to_arrow_refs()
    nb = num_buckets if num_buckets is not None else _auto_buckets(len(block_refs))
    if not block_refs:
        return ray.data.from_arrow(
            pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())]).empty_table()
        )
    maps = [
        _cc_edge_map.options(num_returns=nb if nb > 1 else None).remote(r, nb)
        for r in block_refs
    ]
    if nb == 1:
        maps = [[m] for m in maps]
    edges, labels = [], []
    for b in range(nb):
        e, l = _cc_edge_reduce.remote(*[m[b] for m in maps])
        edges.append(e)
        labels.append(l)
    for _ in range(max_iters):
        msgs = [
            _cc_step.options(num_returns=nb if nb > 1 else None).remote(
                edges[b], labels[b], nb
            )
            for b in range(nb)
        ]
        if nb == 1:
            msgs = [[m] for m in msgs]
        changed = []
        new_labels = []
        for b in range(nb):
            lref, cref = _cc_update.remote(labels[b], *[msgs[src][b] for src in range(nb)])
            new_labels.append(lref)
            changed.append(cref)
        labels = new_labels
        if sum(_ray.get(changed)) == 0:
            break
    return ray.data.from_arrow_refs(labels).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("node").cast(pa.int64()),
                "cluster_id": b.column("label").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


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


_EXACT_KEYS = ("xgeo_exact_h1_v1", "xgeo_exact_h2_v1")  # 16-byte siphash keys
CONTENT_HASH_COLS = ["__ch1", "__ch2"]


def add_content_hash(batch: pa.Table, content_col: str = "text") -> pa.Table:
    """Two independent 64-bit siphashes of the content column — a 128-bit
    composite key (collision odds ~n²/2¹²⁹: none expected below ~10¹⁹
    documents), so dedup shuffles 16 bytes per row instead of the text."""
    texts = np.asarray(
        batch.column(content_col).to_numpy(zero_copy_only=False), dtype=object
    )
    for col, key in zip(CONTENT_HASH_COLS, _EXACT_KEYS):
        h = pd.util.hash_array(texts, hash_key=key, categorize=False)
        batch = batch.append_column(col, pa.array(h.view(np.int64), pa.int64()))
    return batch


class ContentKeyStage:
    """Ingest-DAG transform that RE-KEYS change events by their content
    hash — plugged into ``ingest.sync_derived(transform=...)`` it turns
    a derived table into a STREAMING EXACTLY-ONCE DEDUP CORPUS: the sink
    is keyed by the 128-bit content hash, so LWW keeps exactly one row
    per distinct text (the latest event that carried it), incrementally,
    crash-safe, with no batch dedup job. The original key is preserved
    in ``orig_conv_id`` / ``orig_turn_idx`` (declare both in the sink's
    ``base_schema`` — the declare-then-fill contract every enrichment
    stage uses).

    Semantics: an ACCUMULATING dedup corpus — every distinct content
    the source TABLE ever committed stays (training-data dedup wants
    the accumulated set), so source deletes are dropped here (one key
    deleting its copy must not delete content other keys still carry);
    purge content from the sink with ``ingest.delete_where`` when
    needed. Granularity is the source EPOCH: the change feed carries
    per-key committed state changes, so content that appears and is
    superseded within a single source epoch never lands (size epochs to
    the dedup granularity you need). The hash key is two
    independent fixed-key siphashes rendered as decimal strings (Arrow
    int64->string cast — vectorized; collision odds ~n²/2¹²⁹)."""

    __name__ = "ContentKeyStage"

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.not_equal(batch.column("op"), "D"))
        out = batch
        for name, src in (("orig_conv_id", "conv_id"), ("orig_turn_idx", "turn_idx")):
            col = batch.column(src)
            if name in out.column_names:
                out = out.set_column(out.schema.get_field_index(name), name, col)
            else:
                out = out.append_column(name, col)
        hashed = add_content_hash(batch, self.text_col)
        key = pc.binary_join_element_wise(
            pc.cast(hashed.column(CONTENT_HASH_COLS[0]), pa.string()),
            pc.cast(hashed.column(CONTENT_HASH_COLS[1]), pa.string()),
            "-",
        )
        out = out.set_column(out.schema.get_field_index("conv_id"), "conv_id", key)
        zeros = pa.array(
            np.zeros(out.num_rows, dtype=np.int64)
        ).cast(out.schema.field("turn_idx").type)
        return out.set_column(out.schema.get_field_index("turn_idx"), "turn_idx", zeros)


def exact_dedup_groups(docs: ray.data.Dataset, content_col: str = "text"):
    """Exact dedup: group by a 128-bit content hash computed per batch,
    keep (representative=min id, count). Only (hash, id) crosses the
    shuffle — never the content itself."""
    from xgeo_ray.functions.relational import partial_group_agg

    keyed = docs.select_columns([content_col, "doc_id"]).map_batches(
        lambda b: add_content_hash(b, content_col).drop_columns([content_col]),
        batch_format="pyarrow",
    )
    return partial_group_agg(
        keyed,
        CONTENT_HASH_COLS,
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
    # bucketed vectorized finalize — Ray's per-group aggregate reduce
    # degrades to Python-loop speed at pair-key cardinality (measured
    # 44 s vs 0.3 s on 12.5k pair groups at sf0.01)
    from xgeo_ray.functions.relational import partial_group_agg

    agg = partial_group_agg(
        cands,
        ["doc_id_a", "doc_id_b"],
        [
            ("size_a", "count", "count()"),
            ("size_a", "max", "max(size_a)"),
            ("size_b", "max", "max(size_b)"),
        ],
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
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash: band the 64-bit signature into
    ``num_bands`` exact-match blocks (pigeonhole: any pair within
    hamming distance num_bands-1 shares at least one identical band),
    pair up within band buckets, verify true hamming distance.

    Returns (doc_id_a, doc_id_b, hamming) with hamming <= max_hamming.
    For full recall choose num_bands > max_hamming.

    If ``docs`` already carries a ``simhash`` column the signature pass
    is skipped (callers that export signatures for the SQL oracle reuse
    one pass)."""
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

    if "simhash" in docs.schema().names:
        sigs = docs
    else:
        sigs = docs.map_batches(SimHasher(), batch_format="pyarrow")
    bands = sigs.map_batches(explode, batch_format="pyarrow")
    # shuffle on a hash of (band, band_val), not on band alone: grouping
    # by band caps parallelism at num_bands (4) — a scale ceiling; the
    # bucketed key spreads work while pairs still form within exact
    # (band, band_val) matches via the in-group merge
    from xgeo_ray.functions.relational import _BUCKET_COL, _key_buckets

    bands = bands.map_batches(
        lambda b: b.append_column(
            _BUCKET_COL,
            pa.array(_key_buckets(b, ["band", "band_val"], num_buckets)),
        ),
        batch_format="pyarrow",
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        dup = g[g.duplicated(["band", "band_val"], keep=False)][
            ["band", "band_val", "doc_id", "simhash"]
        ]
        if len(dup) < 2:
            e = np.empty(0, dtype=np.int64)
            return pd.DataFrame({"doc_id_a": e, "doc_id_b": e, "hamming": e})
        m = dup.merge(dup, on=["band", "band_val"], suffixes=("_a", "_b"))
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

    cands = bands.groupby(_BUCKET_COL).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    # a pair found in multiple bands collapses via a tiny grouped min
    return partial_group_agg(
        cands, ["doc_id_a", "doc_id_b"], [("hamming", "min", "hamming")]
    )


# ----------------------------------------------------------- decontamination


class _FlagContaminated:
    """Streaming corpus-side membership test against the broadcast
    benchmark shingle set: explode each doc's distinct shingle hashes
    (the ShingleExploder kernel inline, so per-doc boundaries survive),
    binary-search the sorted benchmark array, per-doc any via reduceat.
    Instance-passed (task stage); the broadcast resolves lazily once per
    worker process via ray.get of the shared ref."""

    def __init__(self, bench_ref, k_shingle: int):
        self.ref = bench_ref
        self.k = k_shingle
        self._bench: np.ndarray | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray as _ray

        if self._bench is None:
            self._bench = _ray.get(self.ref)
        bench = self._bench
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
            np.concatenate(sh_list).view(np.int64)
            if sh_list
            else np.empty(0, dtype=np.int64)
        )
        idx = np.searchsorted(bench, sh)
        hit = (idx < len(bench)) & (bench[np.minimum(idx, len(bench) - 1)] == sh)
        if not len(ids):
            return pa.table({"doc_id": pa.array([], pa.int64())})
        # every doc contributes >= 1 shingle (the kernels emit a sentinel
        # for empty docs), so reduceat segment starts are strictly valid
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        doc_hits = np.add.reduceat(hit, starts)
        return pa.table({"doc_id": pa.array(ids[doc_hits > 0], pa.int64())})


def contaminated_ids(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    k_shingle: int = 3,
) -> ray.data.Dataset:
    """Benchmark decontamination (the eval-overlap filter every training
    corpus needs): doc_ids of corpus documents sharing >= 1 word
    k-shingle with ANY benchmark document.

    Scale shape — broadcast, never shuffle: the benchmark side is tiny
    by construction (eval suites are MBs against a 100 TB corpus), so
    its DISTINCT shingle-hash set is computed distributed (the same
    ShingleExploder kernel the similarity joins use), reduced to unique
    hashes per block before anything reaches the driver, ray.put once,
    and the corpus side is a pure streaming filter (binary search per
    batch). Nothing is O(corpus) anywhere but the stream itself, and
    corpus text never leaves its read task.

    Same hashed-shingle equivalence as ngram_jaccard_dup_pairs: joining
    on 64-bit shingle hashes == joining on the shingle strings
    (collisions vanishingly unlikely; the SQL oracle joins strings).
    """
    import ray as _ray

    ex = benchmark.select_columns(["doc_id", "text"]).map_batches(
        ShingleExploder(k_shingle), batch_format="pyarrow"
    )
    per_block = ex.map_batches(
        lambda b: pa.table({"sh": pc.unique(b.column("sh"))}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bench = np.unique(per_block.to_pandas()["sh"].to_numpy())
    ref = _ray.put(bench)
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _FlagContaminated(ref, k_shingle), batch_format="pyarrow"
    )

# ------------------------------------------------------------------
# streaming near-dup: an incremental MinHash/LSH index maintained from
# the change feed — the near-dup complement of ContentKeyStage's exact
# streaming dedup

_ND_META = "_neardup.json"
_ND_KEY_SEP = "\x1f"  # doc_key = conv_id <US> turn_idx


def _nd_doc_keys(live: pa.Table) -> pa.Array:
    """doc_key = conv_id <US> turn_idx, Arrow-vectorized."""
    out = pc.binary_join_element_wise(
        pc.cast(live.column("conv_id"), pa.string()),
        pc.cast(live.column("turn_idx"), pa.string()),
        _ND_KEY_SEP,
    )
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _nd_bucket_keys(banded: pa.Table) -> pa.Array:
    """bucket key = 'b<band>:<band_hash-as-uint64>', Arrow-vectorized."""
    bh = banded.column("band_hash").to_numpy(zero_copy_only=False)
    out = pc.binary_join_element_wise(
        "b",
        pc.cast(banded.column("band"), pa.string()),
        ":",
        pa.array(bh.astype(np.uint64).astype("U20")),
        "",
    )
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _nd_collapse_live(ch: pa.Table, text_col: str) -> pa.Table:
    """Latest live version per key across the consumed epochs: order by
    (_epoch, seq), keep each key's last row, drop deletes/null text."""
    if ch.num_rows == 0:
        return ch
    df_cols = ["conv_id", "turn_idx", "op", "seq", "_epoch", text_col]
    t = ch.select([c for c in df_cols if c in ch.column_names])
    order = pa.compute.sort_indices(
        t,
        sort_keys=[
            ("conv_id", "ascending"),
            ("turn_idx", "ascending"),
            ("_epoch", "ascending"),
            ("seq", "ascending"),
        ],
    )
    t = t.take(order)
    conv = t.column("conv_id").combine_chunks()
    turn = t.column("turn_idx").combine_chunks()
    same = pc.and_(
        pc.equal(conv.slice(1), conv.slice(0, len(conv) - 1)),
        pc.equal(turn.slice(1), turn.slice(0, len(turn) - 1)),
    ).to_numpy(zero_copy_only=False)
    last = np.concatenate((~same, [True]))  # last row of every key run
    t = t.filter(pa.array(last))
    keep = pc.and_(
        pc.not_equal(t.column("op"), "D"),
        pc.is_valid(t.column(text_col)),
    )
    return t.filter(keep)


def _nd_gather_keys(
    doc_hash: np.ndarray, doc_keys: np.ndarray, want: np.ndarray
) -> list[str]:
    """Map int64 doc hashes back to their doc_key strings (sorted
    searchsorted gather — no per-row dict)."""
    order = np.argsort(doc_hash, kind="stable")
    pos = np.searchsorted(doc_hash[order], want)
    return doc_keys[order[pos]].tolist()


def _nd_candidates(
    bucket_keys: np.ndarray,
    band_doc: np.ndarray,
    doc_hash: np.ndarray,
    probe: pa.Table,
) -> pa.Table:
    """Candidate (a, b) doc-hash pairs from bucket collisions: new×old
    (probe hits from the persisted index) and new×new (within this
    epoch batch), deduplicated, a < b, self-pairs dropped."""
    import pandas as pd

    new_df = pd.DataFrame({"bucket": bucket_keys, "doc": band_doc})
    frames = []
    if probe.num_rows:
        old_df = pd.DataFrame(
            {
                "bucket": np.asarray(
                    probe.column("conv_id").to_numpy(zero_copy_only=False),
                    dtype=object,
                ),
                "doc": probe.column("turn_idx").to_numpy(zero_copy_only=False),
            }
        )
        m = new_df.merge(old_df, on="bucket", suffixes=("_n", "_o"))
        frames.append(m[["doc_n", "doc_o"]].to_numpy())
    nn = new_df.merge(new_df, on="bucket", suffixes=("_n", "_o"))
    nn = nn[nn["doc_n"] < nn["doc_o"]]
    frames.append(nn[["doc_n", "doc_o"]].to_numpy())
    allp = np.concatenate(frames) if frames else np.empty((0, 2), np.int64)
    if len(allp) == 0:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    a = np.minimum(allp[:, 0], allp[:, 1]).astype(np.int64)
    b = np.maximum(allp[:, 0], allp[:, 1]).astype(np.int64)
    keep = a != b  # an updated doc meeting its own stale index entry
    a, b = a[keep], b[keep]
    uniq = np.unique(np.stack([a, b], axis=1), axis=0)
    return pa.table(
        {"a": pa.array(uniq[:, 0]), "b": pa.array(uniq[:, 1])}
    )


def _nd_pack_sets(docs: pa.Table, k_shingle: int) -> pa.Table:
    """(doc_id, text) → packed (probe_id, sh-list) shingle sets, the
    verify kernel's input shape (same rebuild _mh_sets_map uses)."""
    if docs.num_rows == 0:
        return pa.table(
            {
                "probe_id": pa.array([], pa.int64()),
                "sh": pa.array([], pa.list_(pa.int64())),
            }
        )
    ex = ShingleExploder(k_shingle)(docs)
    ids = ex.column("doc_id").to_numpy()
    bounds = np.flatnonzero(
        np.concatenate([[True], ids[1:] != ids[:-1], [True]])
    )
    return pa.table(
        {
            "probe_id": pa.array(ids[bounds[:-1]], pa.int64()),
            "sh": pa.ListArray.from_arrays(
                pa.array(bounds, pa.int32()), ex.column("sh").combine_chunks()
            ),
        }
    )


def _nd_verify(
    cand: pa.Table,
    doc_hash: np.ndarray,
    doc_keys: np.ndarray,
    live: pa.Table,
    probe: pa.Table,
    source,
    text_col: str,
    threshold: float,
    k_shingle: int,
) -> pa.Table:
    """True-Jaccard verify of candidate pairs (the batch operator's own
    _mh_verify_reduce kernel) and conversion to pairs-table upsert rows
    keyed by the canonical doc-key pair."""
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.partition import hash_conv_ids

    need = np.unique(
        np.concatenate(
            [
                cand.column("a").to_numpy(zero_copy_only=False),
                cand.column("b").to_numpy(zero_copy_only=False),
            ]
        )
    )
    # epoch docs carry their text; index partners fetch CURRENT text
    # from the source table (distributed batch lookup)
    in_epoch = np.isin(need, doc_hash)
    key_of: dict[int, str] = {}
    for h, k in zip(doc_hash.tolist(), doc_keys.tolist()):
        key_of[h] = k
    emask = np.isin(doc_hash, need)
    epoch_docs = pa.table(
        {
            "doc_id": pa.array(doc_hash[emask], pa.int64()),
            "text": live.column(text_col).combine_chunks().filter(
                pa.array(emask)
            ),
        }
    )
    old_hashes = need[~in_epoch]
    old_docs = None
    if len(old_hashes):
        # the index row carries each entry's doc_key: recover
        # (conv, turn) and batch-fetch the partners' CURRENT rows
        ph = probe.column("turn_idx").to_numpy(zero_copy_only=False)
        pk = probe.column("doc_key").to_numpy(zero_copy_only=False)
        for h, k in zip(ph.tolist(), pk.tolist()):
            key_of.setdefault(int(h), str(k))
        convs = sorted(
            {
                key_of[int(h)].split(_ND_KEY_SEP, 1)[0]
                for h in old_hashes
                if int(h) in key_of
            }
        )
        fetched = ing.lookup_many(source, convs)
        if fetched.num_rows:
            fk = _nd_doc_keys(fetched)
            fh = hash_conv_ids(
                np.asarray(fk.to_numpy(zero_copy_only=False), dtype=object)
            ).view(np.int64)
            mask = np.isin(fh, old_hashes)
            old_docs = pa.table(
                {
                    "doc_id": pa.array(fh[mask], pa.int64()),
                    "text": fetched.column(text_col).combine_chunks().filter(
                        pa.array(mask)
                    ),
                }
            )
    doc_tabs = [epoch_docs] + ([old_docs] if old_docs is not None else [])
    sets = _nd_pack_sets(
        pa.concat_tables(doc_tabs).combine_chunks(), k_shingle
    )
    # a partner deleted from the source since indexing has no set; the
    # verify kernel treats missing sets as non-pairs (intersection 0)
    pairs_in = pa.table(
        {
            "doc_id_a": cand.column("a"),
            "doc_id_b": cand.column("b"),
        }
    )
    verified = ray.get(
        _mh_verify_reduce.remote(pairs_in, threshold, sets)
    )
    if verified.num_rows == 0:
        return pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "doc_key_a": pa.array([], pa.string()),
                "doc_key_b": pa.array([], pa.string()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    a = verified.column("doc_id_a").to_numpy()
    b = verified.column("doc_id_b").to_numpy()
    ka = [key_of[int(x)] for x in a]
    kb = [key_of[int(x)] for x in b]
    # canonical orientation by doc_key so the pair key is stable
    ka2 = [min(x, y) for x, y in zip(ka, kb)]
    kb2 = [max(x, y) for x, y in zip(ka, kb)]
    pair_key = [x + "\x1e" + y for x, y in zip(ka2, kb2)]
    return pa.table(
        {
            "conv_id": pa.array(pair_key, pa.string()),
            "turn_idx": pa.array(np.zeros(len(pair_key), np.int64)),
            "doc_key_a": pa.array(ka2, pa.string()),
            "doc_key_b": pa.array(kb2, pa.string()),
            "jaccard": verified.column("jaccard"),
        }
    )


def sync_near_dup(
    source,
    index_root: str,
    pairs_root: str,
    group: str = "neardup",
    threshold: float = 0.8,
    num_hashes: int = 64,
    num_bands: int = 16,
    k_shingle: int = 3,
    text_col: str = "text",
) -> dict:
    """Incremental near-duplicate detection AT INGEST: consume the
    source table's change feed (consumer-group cursor ``group``),
    MinHash+band each new/updated row, probe a persisted LSH index
    table for bucket collisions, verify candidates by TRUE Jaccard
    against current source text (the batch ``minhash_lsh_dup_pairs``'s
    own ``_mh_verify_reduce`` kernel — streaming and batch agree by
    construction), and commit verified pairs + the epoch's new band
    rows. The near-dup complement of ``ContentKeyStage``'s exact
    streaming dedup.

    The INDEX and PAIRS sinks are ordinary DeltaTables, so they inherit
    the fence machinery: ``apply_changes`` batch_ids derive from the
    consumed epoch range (a crashed sync retries as no-ops) and the
    consumer cursor is acked LAST — commit order pairs → index → ack
    makes every crash window replay-safe. Parameters are pinned in
    ``_neardup.json``; a sync with different parameters refuses.

    Scale shape: per-sync work is bounded by the EPOCH batch (changed
    rows + their bucket collisions), never the corpus. Band rows and
    candidates pass through the driver like any ``apply_changes`` batch
    (the documented driver-bounded surface — size the sync cadence so an
    epoch batch fits); bucket probes and partner-text fetches run as
    distributed batch lookups (``lookup_many``: one merge task per
    touched partition, IN-pushdown). Deletes drop out of the feed (an
    append-only index, the production norm — rebuild to reclaim); an
    updated doc re-indexes under its new signature and is never paired
    with its own stale entry; a pair whose partner was deleted since
    indexing drops at verify (its shingle set is absent).

    No reference counterpart (stateless CLI,
    /root/reference/cmd/xgeo/main.go); Broder 1997 / LSH banding as in
    the batch operator."""
    import json as _json
    import os

    from xgeo_ray.partition import hash_conv_ids
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state import consumers
    from xgeo_ray.state.delta_table import DeltaTable

    spec = {
        "source_root": os.path.abspath(source.root),
        "threshold": threshold,
        "num_hashes": num_hashes,
        "num_bands": num_bands,
        "k_shingle": k_shingle,
        "text_col": text_col,
    }
    os.makedirs(index_root, exist_ok=True)
    meta_path = os.path.join(index_root, _ND_META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = _json.load(f)
        if prev != spec:
            raise ValueError(
                f"near-dup index at {index_root!r} was built with {prev}; "
                f"refusing to sync with {spec} — rebuild or match parameters"
            )
    else:
        with open(meta_path, "w") as f:
            _json.dump(spec, f)

    def _open_or_create(root):
        if os.path.exists(os.path.join(root, "_table.json")):
            return DeltaTable.open(root)
        return DeltaTable.create(root, num_partitions=8, num_salts=1)

    index = _open_or_create(os.path.join(index_root, "t"))
    pairs_t = _open_or_create(pairs_root)

    pos = consumers.position(source, group)
    head = source.latest_epoch()
    if head <= pos:
        return {"consumed_upto": pos, "new_docs": 0, "pairs": 0}

    # 1. the consumed epochs' rows, collapsed to latest live per key
    feed = ing.changes(
        source,
        since_epoch=pos,
        upto_epoch=head,
        columns=["conv_id", "turn_idx", "op", "seq", text_col],
    )
    blocks = [t for t in ray.get(feed.to_arrow_refs()) if t.num_rows]
    ch = (
        pa.concat_tables(blocks, promote_options="default")
        if blocks
        else pa.table({})
    )
    live = _nd_collapse_live(ch, text_col)
    if live.num_rows == 0:
        consumers.ack(source, group, head)
        return {"consumed_upto": head, "new_docs": 0, "pairs": 0}

    dk = _nd_doc_keys(live)
    doc_keys = np.asarray(dk.to_numpy(zero_copy_only=False), dtype=object)
    doc_hash = hash_conv_ids(doc_keys).view(np.int64)

    # 2. signatures + band buckets (the batch operator's kernels)
    mh = MinHasher(num_hashes, k_shingle)
    banded = explode_bands(
        mh(
            pa.table(
                {"doc_id": pa.array(doc_hash), "text": live.column(text_col)}
            )
        ),
        num_bands,
    )
    bucket_arr = _nd_bucket_keys(banded)
    bucket_keys = np.asarray(
        bucket_arr.to_numpy(zero_copy_only=False), dtype=object
    )
    band_doc = banded.column("doc_id").to_numpy(zero_copy_only=False)

    # 3. probe persisted index members of the touched buckets
    probe = ing.lookup_many(index, list(dict.fromkeys(bucket_keys.tolist())))
    cand = _nd_candidates(bucket_keys, band_doc, doc_hash, probe)

    n_pairs = 0
    if cand.num_rows:
        verified = _nd_verify(
            cand, doc_hash, doc_keys, live, probe, source, text_col,
            threshold, k_shingle,
        )
        n_pairs = verified.num_rows
        if n_pairs:
            ing.apply_changes(
                pairs_t, verified, batch_id=f"ndpairs-{pos + 1}-{head}"
            )

    # 4. append this epoch's band rows to the index, then ack
    ing.apply_changes(
        index,
        pa.table(
            {
                "conv_id": bucket_arr,
                "turn_idx": pa.array(band_doc, pa.int64()),
                "doc_key": pa.array(
                    _nd_gather_keys(doc_hash, doc_keys, band_doc), pa.string()
                ),
            }
        ),
        batch_id=f"ndidx-{pos + 1}-{head}",
    )
    consumers.ack(source, group, head)
    return {
        "consumed_upto": head,
        "new_docs": int(live.num_rows),
        "pairs": int(n_pairs),
    }


# ------------------------------------------------- duplicated k-gram spans

def _gram_multipliers(k: int) -> np.ndarray:
    """k odd 64-bit multipliers (splitmix-derived), one per in-gram
    offset, so the positional gram hash is order-sensitive."""
    j = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = (j + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z | np.uint64(1)


class GramPositionExploder:
    """(doc_id, text) -> (doc_id, pos, g): one row per POSITIONAL word
    k-gram (not deduplicated — positions are the point), g = order-
    sensitive mix of the k token hashes. Vectorized across the whole
    batch: tokens flatten once, token hashes once, the k-wide mix is k
    shifted multiply-XORs over the flat array, and grams straddling a
    document boundary are masked out (the repetition_stats shape,
    carried to positions)."""

    def __init__(self, k: int = 3):
        if k < 2:
            raise ValueError("k must be >= 2")
        self.k = k
        self.mult = _gram_multipliers(k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.k
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.utf8_split_whitespace(batch.column("text"))
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = la.values.to_numpy(zero_copy_only=False)
        nonempty = np.asarray(vals, dtype=object) != ""
        th = hash_tokens(np.asarray(vals, dtype=object)[nonempty])
        cum = np.concatenate([[0], np.cumsum(nonempty.astype(np.int64))])
        row_tok = cum[offs[1:]] - cum[offs[:-1]]
        n = len(th)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "g": pa.array([], pa.int64()),
            }
        )
        if n < k:
            return empty
        doc_of = np.repeat(np.arange(len(ids)), row_tok)
        m = n - k + 1
        with np.errstate(over="ignore"):
            acc = th[:m] * self.mult[0]
            for j in range(1, k):
                acc = acc ^ (th[j : m + j] * self.mult[j])
        valid = doc_of[:m] == doc_of[k - 1 :]
        if not valid.any():
            return empty
        doc_starts = np.concatenate([[0], np.cumsum(row_tok)])[:-1]
        d = doc_of[:m][valid]
        pos = np.arange(m, dtype=np.int64)[valid] - doc_starts[d]
        return pa.table(
            {
                "doc_id": pa.array(ids[d], pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "g": pa.array(acc[valid].view(np.int64), pa.int64()),
            }
        )


def _dup_marked_positions(
    docs: ray.data.Dataset, k: int, min_count: int, num_buckets: int
) -> ray.data.Dataset:
    """(doc_id, pos) of every token position starting a word-k-gram
    that occurs >= min_count times across the corpus. The shared front
    half of dup_ngram_spans / strip_dup_spans: positional gram explode
    with in-batch value_counts combiner -> bucketed partial aggregate
    over gram hashes -> filter to dup grams (a distributed table, never
    a driver set) -> second explode hash-joined on the gram hash."""
    from xgeo_ray.functions.relational import hash_join, partial_group_agg

    ex = GramPositionExploder(k)

    def count_grams(b: pa.Table) -> pa.Table:
        t = ex(b)
        vc = t.column("g").value_counts()
        return pa.table(
            {
                "g": vc.field("values"),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    counts = partial_group_agg(
        docs.select_columns(["doc_id", "text"]).map_batches(
            count_grams, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["g"],
        [("n", "sum", "n")],
        num_buckets,
    )
    dup_g = counts.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b.column("n"), pa.scalar(min_count, pa.int64()))
        ).select(["g"]),
        batch_format="pyarrow",
    )
    positions = docs.select_columns(["doc_id", "text"]).map_batches(
        ex, batch_format="pyarrow", zero_copy_batch=True
    )
    return hash_join(
        positions, dup_g, on="g", num_partitions=num_buckets
    ).select_columns(["doc_id", "pos"])


def _doc_bucket_tagger(nb: int):
    """map_batches fn appending an avalanched doc_id-hash 'bucket'
    column (consistent across callers so docs and their marked
    positions land in the same cogroup bucket)."""
    from xgeo_ray.functions.relational import _MIX

    nbu = np.uint64(max(1, nb))

    def add_bucket(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = d * _MIX
        return b.append_column(
            "bucket", pa.array(((h >> np.uint64(24)) % nbu).astype(np.int64))
        )

    return add_bucket


def dup_ngram_spans(
    docs: ray.data.Dataset,
    k: int = 3,
    min_count: int = 2,
    num_buckets: int = 64,
    stats: bool = False,
) -> ray.data.Dataset:
    """Duplicated-substring detection, the training-data dedup that
    exact/MinHash document dedup misses (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022 — their
    suffix-array ExactSubstr, here as the distributed k-gram
    approximation): find every word-k-gram occurring >= ``min_count``
    times ACROSS THE CORPUS (same-doc repeats count), and return per
    doc the maximal token spans those grams cover.

    Shape: (1) positional gram explode + in-batch value_counts
    combiner -> bucketed partial aggregate over gram hashes -> grams
    with global count >= min_count (the dup-gram table, distributed —
    never a driver set and never a broadcast, unlike the benchmark-
    decontamination filter whose needle set is small); (2) the explode
    runs again (two scans beat materializing a positions table bigger
    than the corpus) and hash-joins against the dup grams on ``g`` —
    the one payload-sized exchange; (3) marked positions bucket by
    doc hash and merge vectorized into spans: sorted (doc, pos), span
    break where the gap exceeds k, ends = last pos + k.

    Returns ``(doc_id, start, end)`` token offsets (end exclusive,
    adjacent/overlapping windows coalesced); with ``stats=True``, one
    row per doc that HAS duplicated grams: ``(doc_id, dup_grams,
    covered_tokens)`` — exact integers for the SQL oracle. Hash
    collisions (fixed-key siphash + odd-multiplier mix) are the same
    vanishing-probability equivalence every similarity oracle here
    relies on. ``num_buckets`` bounds the exchange parallelism (repo
    default 64; measured flat 16-64 at sandbox scale — size it toward
    cluster width on a real cluster, the ~0.5-2 s-per-task rule)."""
    marked = _dup_marked_positions(docs, k, min_count, num_buckets)
    add_bucket = _doc_bucket_tagger(max(1, num_buckets // 4))
    kk = k

    def merge_spans(g: pa.Table) -> pa.Table:
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        p = g.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        new = np.ones(len(d), dtype=bool)
        new[1:] = (d[1:] != d[:-1]) | (p[1:] - p[:-1] > kk)
        starts = p[new]
        last = np.concatenate([np.flatnonzero(new)[1:] - 1, [len(d) - 1]])
        ends = p[last] + kk
        span_doc = d[new]
        if not stats:
            return pa.table(
                {
                    "doc_id": pa.array(span_doc, pa.int64()),
                    "start": pa.array(starts, pa.int64()),
                    "end": pa.array(ends, pa.int64()),
                }
            )
        # per-doc aggregates, vectorized: grams per doc from the marked
        # rows, covered tokens from the merged spans
        uniq, inv_rows = np.unique(d, return_inverse=True)
        dup_grams = np.bincount(inv_rows, minlength=len(uniq))
        inv_spans = np.searchsorted(uniq, span_doc)
        covered = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(covered, inv_spans, ends - starts)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "dup_grams": pa.array(dup_grams.astype(np.int64)),
                "covered_tokens": pa.array(covered, pa.int64()),
            }
        )

    merge_spans.__name__ = "merge_spans"
    return (
        marked.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(merge_spans, batch_format="pyarrow")
    )


def strip_dup_spans(
    docs: ray.data.Dataset,
    k: int = 3,
    min_count: int = 2,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """The rewrite half of ExactSubstr dedup (Lee et al., ACL 2022):
    drop every token covered by ANY word-k-gram occurring >=
    ``min_count`` times across the corpus, and re-join the survivors
    with single spaces. Returns (doc_id, text) for EVERY input doc —
    docs with nothing duplicated pass through (inter-token whitespace
    normalized for all docs, the standard token-level contract; the
    pytest SQL oracle replays it with string_agg).

    Shape: the dup-gram marking of ``dup_ngram_spans``, then ONE
    doc-bucketed cogroup of (docs, marked positions) — no span merge
    is needed: inside each bucket the cover mask is a vectorized
    diff-array range update ([pos, pos+k) per marked gram) over the
    flat token array, and texts rebuild via LargeList + binary_join
    (64-bit offsets: a bucket's token payload may exceed int32)."""
    proj = docs.select_columns(["doc_id", "text"])
    marked = _dup_marked_positions(proj, k, min_count, num_buckets)
    return _strip_marked(proj, marked, k, num_buckets)


def _strip_marked(
    proj: ray.data.Dataset,
    marked: ray.data.Dataset,
    k: int,
    num_buckets: int,
) -> ray.data.Dataset:
    """Shared rewrite kernel: ONE doc-bucketed cogroup of (docs, marked
    gram-start positions); every token in [pos, pos+k) of any marked
    position drops, survivors re-join with single spaces. Used by
    ``strip_dup_spans`` (corpus-duplicated grams) and
    ``strip_contaminated_spans`` (benchmark grams)."""
    nb = max(1, num_buckets // 4)
    add_bucket = _doc_bucket_tagger(nb)
    kk = k

    def tag_docs(b: pa.Table) -> pa.Table:
        b = pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                # fill_null: the doc/marked split below keys on text
                # validity, so a null-text doc must become '' here
                "text": pc.fill_null(
                    b.column("text").cast(pa.large_string()), ""
                ),
                "pos": pa.nulls(b.num_rows, pa.int64()),
            }
        )
        return add_bucket(b)

    def tag_marked(b: pa.Table) -> pa.Table:
        b = pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "text": pa.nulls(b.num_rows, pa.large_string()),
                "pos": b.column("pos").cast(pa.int64()),
            }
        )
        return add_bucket(b)

    def rewrite(g: pa.Table) -> pa.Table:
        is_doc = pc.is_valid(g.column("text"))
        dtab = g.filter(is_doc)
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.large_string()),
            }
        )
        if dtab.num_rows == 0:
            return empty
        mtab = g.filter(pc.invert(is_doc))
        ids = dtab.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.utf8_split_whitespace(dtab.column("text"))
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = np.asarray(la.values.to_numpy(zero_copy_only=False), dtype=object)
        nonempty = vals != ""
        flat = vals[nonempty]
        cum = np.concatenate([[0], np.cumsum(nonempty.astype(np.int64))])
        row_tok = cum[offs[1:]] - cum[offs[:-1]]
        doc_starts = np.concatenate([[0], np.cumsum(row_tok)])
        keep = np.ones(len(flat), dtype=bool)
        if mtab.num_rows:
            m_ids = mtab.column("doc_id").to_numpy(zero_copy_only=False)
            m_pos = mtab.column("pos").to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            local = order[np.searchsorted(ids[order], m_ids)]
            fstart = doc_starts[local] + m_pos
            diff = np.zeros(len(flat) + 1, dtype=np.int64)
            np.add.at(diff, fstart, 1)
            np.add.at(diff, fstart + kk, -1)  # pos+k <= doc's token count
            keep = np.cumsum(diff[:-1]) == 0
        kcum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        new_offs = kcum[doc_starts]
        lists = pa.LargeListArray.from_arrays(
            pa.array(new_offs, pa.int64()),
            pa.array(flat[keep], pa.large_string()),
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pc.binary_join(lists, pa.scalar(" ", pa.large_string())),
            }
        )

    rewrite.__name__ = "strip_spans"
    return (
        proj.map_batches(tag_docs, batch_format="pyarrow")
        .union(marked.map_batches(tag_marked, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(rewrite, batch_format="pyarrow")
    )


class _MarkNeedlePositions:
    """(doc_id, text) -> marked (doc_id, pos): positions whose word-
    k-gram hash is in the broadcast needle set. Instance-passed: the
    sorted needle array ships as an ObjectRef, derefs zero-copy once
    per task, matches by binary search."""

    def __init__(self, ref, k: int):
        self.ref = ref
        self.ex = GramPositionExploder(k)
        self.bench = None

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.bench is None:
            self.bench = ray.get(self.ref)
        t = self.ex(b)
        if t.num_rows == 0 or len(self.bench) == 0:
            return t.select(["doc_id", "pos"]).slice(0, 0)
        g = t.column("g").to_numpy(zero_copy_only=False)
        pos = np.clip(
            np.searchsorted(self.bench, g), 0, len(self.bench) - 1
        )
        hit = self.bench[pos] == g
        return t.filter(pa.array(hit)).select(["doc_id", "pos"])


def strip_contaminated_spans(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    k: int = 5,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """SPAN-LEVEL benchmark decontamination: redact every token run of
    a training document that shares a word-k-gram with ANY benchmark
    document, keeping the rest of the doc — the surgical complement of
    ``contaminated_ids`` (which flags whole documents for dropping).
    Returns (doc_id, text) for EVERY corpus doc, survivors re-joined
    with single spaces (the token-level whitespace contract of
    ``strip_dup_spans``).

    Scale shape — broadcast, never shuffle (the ``contaminated_ids``
    discipline): the benchmark's DISTINCT positional-gram-hash set is
    computed distributed and reduced per block before anything reaches
    the driver, ray.put once; corpus marking is a streaming binary-
    search filter; the rewrite is the shared ``_strip_marked`` cogroup.
    ``k`` trades precision for recall: the default 5 redacts only
    verbatim 5-token overlaps (3 would cut common trigrams). Hashed
    grams == gram strings (the usual vanishing-collision equivalence;
    the pytest oracle joins strings)."""
    ex = GramPositionExploder(k)
    per_block = (
        benchmark.select_columns(["doc_id", "text"])
        .map_batches(ex, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(
            lambda b: pa.table({"g": pc.unique(b.column("g"))}),
            batch_format="pyarrow",
        )
    )
    needles = np.unique(per_block.to_pandas()["g"].to_numpy())
    ref = ray.put(needles)
    proj = docs.select_columns(["doc_id", "text"])
    marked = proj.map_batches(
        _MarkNeedlePositions(ref, k), batch_format="pyarrow"
    )
    return _strip_marked(proj, marked, k, num_buckets)
