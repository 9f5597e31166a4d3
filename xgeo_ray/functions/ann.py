"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — a numpy matmul per batch against a
query matrix broadcast once via ray.put, then a global merge of the tiny
per-batch top-k lists (the distributed-scan shape: compute moves to the
data, only k rows per block cross the wire).

Scale path: IVF — k-means-style coarse centroids (trained on a sample),
each vector assigned to its nearest centroid partition; queries probe
only the closest ``nprobe`` partitions (the inverted-file index of
Jegou, Douze & Schmid, "Product quantization for nearest neighbor
search", TPAMI 2011 — coarse quantizer only, exact residual scan).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _stack_unit(vec_col, dtype=np.float64) -> np.ndarray:
    m = np.stack(vec_col.to_numpy(zero_copy_only=False)).astype(dtype)
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def brute_force_topk(
    emb: ray.data.Dataset,
    query_vecs: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k of each query against the dataset.

    Returns (query_idx, vec_id, rank) — ids only, ranked by
    (cosine desc, vec_id asc) so ties break deterministically."""
    q = query_vecs.astype(np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    q = q / qn[:, None]
    q_ref = ray.put(q)

    class ScanTopK:
        """Instance-passed (task-based) stage: trivial setup, so an actor
        pool would only add spin-up latency. The query matrix ships as an
        ObjectRef and derefs zero-copy once per task."""

        def __init__(self, ref):
            self.ref = ref
            self.q = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:  # zero-row blocks are legal upstream
                return pa.table(
                    {
                        "query_idx": pa.array([], pa.int32()),
                        id_col: pa.array([], pa.int64()),
                        "sim": pa.array([], pa.float64()),
                    }
                )
            if self.q is None:
                self.q = ray.get(self.ref)
            m = _stack_unit(batch.column(vec_col))
            ids = batch.column(id_col).to_numpy()
            sims = m @ self.q.T  # (n_rows, n_queries)
            kk = min(k, len(ids))
            out_q, out_id, out_sim = [], [], []
            for j in range(self.q.shape[0]):
                s = sims[:, j]
                # deterministic: sort by (-sim, id)
                idx = np.lexsort((ids, -s))[:kk]
                out_q.extend([j] * kk)
                out_id.extend(ids[idx])
                out_sim.extend(s[idx])
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int32()),
                    id_col: pa.array(out_id, pa.int64()),
                    "sim": pa.array(out_sim, pa.float64()),
                }
            )

    partials = emb.map_batches(ScanTopK(q_ref), batch_format="pyarrow")
    tables = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    empty_out = pa.table(
        {
            "query_idx": pa.array([], pa.int32()),
            id_col: pa.array([], pa.int64()),
            "rank": pa.array([], pa.int32()),
        }
    )
    if not tables:
        return empty_out
    t = pa.concat_tables(tables)  # ≤ blocks×queries×k rows
    out_rows = {"query_idx": [], id_col: [], "rank": []}
    df = t.to_pandas()
    for j, g in df.groupby("query_idx"):
        g = g.sort_values(["sim", id_col], ascending=[False, True], kind="stable").head(k)
        out_rows["query_idx"].extend([j] * len(g))
        out_rows[id_col].extend(g[id_col])
        out_rows["rank"].extend(range(1, len(g) + 1))
    return pa.table(
        {
            "query_idx": pa.array(out_rows["query_idx"], pa.int32()),
            id_col: pa.array(out_rows[id_col], pa.int64()),
            "rank": pa.array(out_rows["rank"], pa.int32()),
        }
    )


def train_ivf_centroids(
    emb: ray.data.Dataset,
    num_centroids: int = 16,
    sample_fraction: float = 0.25,
    iters: int = 5,
    seed: int = 5,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Lloyd iterations on a driver-side sample (centroids are tiny; the
    sample is bounded — the full dataset never materializes)."""
    sample = emb.random_sample(sample_fraction, seed=seed)
    # Ray Data renders empty blocks schemaless — drop them before concat
    tabs = [t for t in ray.get(sample.to_arrow_refs()) if t.num_rows]
    if not tabs:
        raise ValueError("centroid sample is empty (no vectors)")
    tbl = pa.concat_tables(tabs)
    x = _stack_unit(tbl.column(vec_col))
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(num_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    return cents


def ivf_assign(
    emb: ray.data.Dataset, centroids: np.ndarray, vec_col: str = "embedding"
) -> ray.data.Dataset:
    """Add the IVF partition id (nearest centroid) — the partition key a
    100 TB index would shuffle/write by."""
    c_ref = ray.put(centroids)

    class Assign:
        def __init__(self, ref):
            self.ref = ref
            self.c = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:  # zero-row blocks are legal upstream
                return batch.append_column(
                    "ivf_part", pa.array([], pa.int32())
                )
            if self.c is None:
                self.c = ray.get(self.ref)
            m = _stack_unit(batch.column(vec_col))
            part = (m @ self.c.T).argmax(axis=1).astype(np.int32)
            return batch.append_column("ivf_part", pa.array(part))

    return emb.map_batches(Assign(c_ref), batch_format="pyarrow")


def build_ivf_index(
    emb: ray.data.Dataset,
    centroids: np.ndarray,
    index_dir: str,
    vec_col: str = "embedding",
) -> dict:
    """Write the IVF index as PARTITIONED Parquet: one file per inverted
    list (``part-NNNNN.parquet``) plus a tiny ``_ivf.json`` manifest with
    the centroids — so a probe-time reader opens only the nprobe files it
    needs, scaling I/O with nprobe, not dataset size (the layout a 100 TB
    index writes by; the same one-directory-per-partition discipline as
    state.delta_table)."""
    import json
    import os

    from xgeo_ray.pipelines.ingest import _atomic_write_parquet

    os.makedirs(index_dir, exist_ok=True)
    assigned = ivf_assign(emb, centroids, vec_col)

    def write_part(g: pa.Table) -> pa.Table:
        from xgeo_ray.tuning import limit_worker_threads

        limit_worker_threads()
        p = int(g.column("ivf_part")[0].as_py())
        path = os.path.join(index_dir, f"part-{p:05d}.parquet")
        _atomic_write_parquet(g.drop_columns(["ivf_part"]), path)
        return pa.table(
            {"ivf_part": pa.array([p], pa.int32()), "rows": pa.array([g.num_rows], pa.int64())}
        )

    write_part.__name__ = "write_ivf_part"
    stats = (
        assigned.groupby("ivf_part")
        .map_groups(write_part, batch_format="pyarrow")
        .to_pandas()
    )
    manifest = {
        "centroids": centroids.tolist(),
        "vec_col": vec_col,
        "parts": {int(r.ivf_part): int(r.rows) for r in stats.itertuples()},
    }
    tmp = os.path.join(index_dir, "_ivf.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "_ivf.json"))
    # a REBUILD into an existing appended index must supersede the
    # versioned append manifests, or _read_ivf_manifest keeps preferring
    # the stale highest version over the fresh base
    for name in os.listdir(index_dir):
        if name.startswith("_ivf-v") and name.endswith(".json"):
            os.remove(os.path.join(index_dir, name))
    return manifest


_IVF_VERSION_RE = None  # compiled lazily (module keeps imports light)


def _read_ivf_manifest(index_dir: str) -> tuple[dict, int]:
    """(manifest, version). Appends publish versioned manifests
    (``_ivf-vNNNNNN.json``, exclusively committed — the same
    conditional-PUT discipline as epoch manifests); ``_ivf.json`` from
    ``build_ivf_index`` is version 0. Width-tolerant numeric max, not
    lexical last."""
    import json
    import os
    import re

    global _IVF_VERSION_RE
    if _IVF_VERSION_RE is None:
        _IVF_VERSION_RE = re.compile(r"^_ivf-v(\d{6,})\.json$")
    best, best_path = 0, os.path.join(index_dir, "_ivf.json")
    for name in os.listdir(index_dir):
        m = _IVF_VERSION_RE.match(name)
        if m and int(m.group(1)) > best:
            best = int(m.group(1))
            best_path = os.path.join(index_dir, name)
    with open(best_path) as f:
        return json.load(f), best


def ivf_append(
    index_dir: str,
    emb: ray.data.Dataset,
    vec_col: str | None = None,
    batch_id: str | None = None,
) -> dict:
    """INCREMENTAL index maintenance: assign new vectors to the
    EXISTING centroids and append one generation file per touched
    inverted list (``part-NNNNN-gTOKEN.parquet``) — cost scales with
    the append batch, not the corpus, so the index can follow a growing
    table the way derived tables follow the change feed. Probes read
    every generation of the probed lists (still nprobe lists).

    Results are IDENTICAL to a full rebuild with the same centroids
    (assignment is deterministic); what an append cannot do is move the
    centroids, so recall drifts if the data distribution does — rebuild
    with retrained centroids when list-size skew grows (the manifest's
    per-part row counts are the signal).

    EXACTLY-ONCE: pass ``batch_id`` (a caller-stable key, like
    apply_changes) and a retried crashed append is a no-op once the id
    is recorded in the manifest. Manifest updates publish as NEW
    versioned files through the exclusive commit fence with a
    read-modify-retry loop, so two concurrent appends both land (the
    loser re-reads and re-applies) instead of last-writer-wins dropping
    one append's generation files. Generation files from a crashed
    attempt are never referenced by any manifest — dead bytes, not
    duplicates."""
    import json
    import os

    from xgeo_ray.pipelines.ingest import _atomic_write_parquet
    from xgeo_ray.state.delta_table import new_commit_token
    from xgeo_ray.state.storage import DEFAULT_STORAGE

    manifest, _ = _read_ivf_manifest(index_dir)
    if batch_id is not None and batch_id in manifest.get("batches", []):
        return manifest  # replayed append: already durable
    cents = np.asarray(manifest["centroids"], dtype=np.float64)
    vec_col = vec_col or manifest["vec_col"]
    token = new_commit_token()
    assigned = ivf_assign(emb, cents, vec_col)

    def write_gen(g: pa.Table) -> pa.Table:
        from xgeo_ray.tuning import limit_worker_threads

        limit_worker_threads()
        p = int(g.column("ivf_part")[0].as_py())
        path = os.path.join(index_dir, f"part-{p:05d}-g{token}.parquet")
        _atomic_write_parquet(g.drop_columns(["ivf_part"]), path)
        return pa.table(
            {
                "ivf_part": pa.array([p], pa.int32()),
                "rows": pa.array([g.num_rows], pa.int64()),
            }
        )

    write_gen.__name__ = "append_ivf_gen"
    stats = (
        assigned.groupby("ivf_part")
        .map_groups(write_gen, batch_format="pyarrow")
        .to_pandas()
    )
    new_rows = {int(r.ivf_part): int(r.rows) for r in stats.itertuples()}
    while True:
        # read-modify-retry against the versioned manifest chain: apply
        # THIS append's generation files to the freshest manifest, then
        # publish version+1 exclusively; a lost race re-reads (which may
        # reveal a concurrent retry of the SAME batch_id already won).
        manifest, version = _read_ivf_manifest(index_dir)
        if batch_id is not None and batch_id in manifest.get("batches", []):
            return manifest
        files = manifest.setdefault("files", {})
        parts = manifest["parts"]
        for part, rows in new_rows.items():
            p = str(part)
            base = [f"part-{part:05d}.parquet"] if p in parts else []
            files.setdefault(p, base).append(f"part-{part:05d}-g{token}.parquet")
            parts[p] = parts.get(p, 0) + rows
        if batch_id is not None:
            manifest.setdefault("batches", []).append(batch_id)
        try:
            DEFAULT_STORAGE.commit_bytes_exclusive(
                os.path.join(index_dir, f"_ivf-v{version + 1:06d}.json"),
                json.dumps(manifest).encode(),
            )
            return manifest
        except FileExistsError:
            continue


def plan_probe_files(
    index_dir: str, query_vecs: np.ndarray, nprobe: int
) -> tuple[np.ndarray, list[str]]:
    """(centroids, index files to read) for a query batch — the
    probe-pruned read plan; files for partitions no query probes are
    never opened. Appended lists (ivf_append) may span several
    generation files; all generations of a probed list are read."""
    import os

    manifest, _ = _read_ivf_manifest(index_dir)
    cents = np.asarray(manifest["centroids"], dtype=np.float64)
    q = query_vecs.astype(np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    q = q / qn[:, None]
    probe = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    wanted = sorted({int(p) for row in probe for p in row})
    gen_files = manifest.get("files", {})
    avail = {int(p) for p in manifest["parts"]}
    files = []
    for p in wanted:
        if p not in avail:
            continue  # empty inverted lists have no file
        for name in gen_files.get(str(p), [f"part-{p:05d}.parquet"]):
            files.append(os.path.join(index_dir, name))
    return cents, files


def ivf_topk_indexed(
    index_dir: str,
    query_vecs: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k against a ``build_ivf_index`` directory: reads
    ONLY the nprobe probed partitions' files — bytes touched scale with
    nprobe, not with the index size."""
    _, files = plan_probe_files(index_dir, query_vecs, nprobe)
    if not files:
        return pa.table(
            {
                "query_idx": pa.array([], pa.int32()),
                id_col: pa.array([], pa.int64()),
                "rank": pa.array([], pa.int32()),
            }
        )
    ds = ray.data.read_parquet(files)
    return brute_force_topk(ds, query_vecs, k=k, id_col=id_col, vec_col=vec_col)


def ivf_topk(
    emb: ray.data.Dataset,
    centroids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Approximate top-k probing only the ``nprobe`` nearest IVF
    partitions per query. In-memory variant: assigns + filters the input
    dataset (saves compute, not I/O — use build_ivf_index +
    ivf_topk_indexed for the persisted, probe-pruned-read path)."""
    q = query_vecs.astype(np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    q = q / qn[:, None]
    probe = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(map(int, row)) for row in probe]
    assigned = ivf_assign(emb, centroids, vec_col)
    wanted = sorted({p for s in probe_sets for p in s})

    import pyarrow.compute as pc

    filtered = assigned.map_batches(
        lambda b: b.filter(pc.is_in(b.column("ivf_part"), value_set=pa.array(wanted, pa.int32()))),
        batch_format="pyarrow",
    )
    return brute_force_topk(filtered, query_vecs, k=k, id_col=id_col, vec_col=vec_col)


# ------------------------------------------------------------------ k-means


def _init_centroids(
    emb: ray.data.Dataset, k: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic init independent of block order: the (unit) vectors
    of the k SMALLEST ids. Each block contributes only its local k
    smallest (id, vector) rows; the driver reduces k rows per block."""

    def local(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        take = np.argsort(ids, kind="stable")[:k]
        return batch.select([id_col, vec_col]).take(pa.array(take))

    # Ray Data renders empty blocks schemaless — drop them before concat
    tabs = [
        t
        for t in ray.get(
            emb.map_batches(local, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tabs:
        raise ValueError("kmeans over an empty dataset (no vectors)")
    small = pa.concat_tables(tabs)
    order = np.argsort(small.column(id_col).to_numpy(), kind="stable")[:k]
    return _stack_unit(small.take(pa.array(order)).column(vec_col))


def kmeans(
    emb: ray.data.Dataset,
    k: int = 16,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-7,
) -> tuple[np.ndarray, list[float]]:
    """Distributed FULL-DATA spherical k-means (cosine objective) —
    the semantic-clustering primitive for corpus curation (cluster
    inspection, balanced sampling, semantic dedup), complementing
    ``train_ivf_centroids``'s bounded-sample variant.

    Lloyd via per-batch sufficient statistics: every iteration is one
    ``map_batches`` pass where each batch emits ONLY a (k x d) partial
    sum matrix, a k-vector of counts and an inertia scalar; the driver
    reduces k x d floats per block — the payload never leaves workers,
    driver traffic is O(k*d*blocks) regardless of corpus size.
    Centroids broadcast once per iteration via ray.put. The input is
    materialized once so iterations re-read the object store (spillable)
    rather than re-parsing parquet.

    Deterministic given the data: init is the k smallest-id vectors
    (block-order independent), each iteration's assignment is an argmax
    over the same float64 centroids everywhere; partial sums commute up
    to float64 rounding. Empty clusters keep their previous centroid.
    Returns (unit centroids, per-iteration mean inertia 1 - cos)."""
    emb = emb.materialize()
    cents = _init_centroids(emb, k, id_col, vec_col)
    k = len(cents)  # fewer distinct rows than k: shrink
    d = cents.shape[1]
    history: list[float] = []

    class Partial:
        def __init__(self, ref):
            self.ref = ref
            self.c = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:  # zero-row blocks are legal upstream
                return pa.table(
                    {
                        "sums": pa.array([], pa.list_(pa.float64())),
                        "counts": pa.array([], pa.list_(pa.int64())),
                        "inertia": pa.array([], pa.float64()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            if self.c is None:
                self.c = ray.get(self.ref)
            x = _stack_unit(batch.column(vec_col))
            sim = x @ self.c.T
            a = sim.argmax(axis=1)
            sums = np.zeros((k, d), dtype=np.float64)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            inertia = float((1.0 - sim[np.arange(len(x)), a]).sum())
            return pa.table(
                {
                    "sums": pa.array([sums.ravel()], pa.list_(pa.float64())),
                    "counts": pa.array([counts], pa.list_(pa.int64())),
                    "inertia": pa.array([inertia], pa.float64()),
                    "n": pa.array([len(x)], pa.int64()),
                }
            )

    for _ in range(iters):
        ref = ray.put(cents)
        parts = pa.concat_tables(
            t
            for t in ray.get(
                emb.map_batches(
                    Partial(ref), batch_format="pyarrow"
                ).to_arrow_refs()
            )
            if t.num_rows  # Ray Data renders empty blocks schemaless
        )
        sums = (
            np.stack(parts.column("sums").to_numpy(zero_copy_only=False))
            .reshape(-1, k, d)
            .sum(axis=0)
        )
        counts = np.stack(
            parts.column("counts").to_numpy(zero_copy_only=False)
        ).sum(axis=0)
        n = int(np.sum(parts.column("n").to_numpy()))
        history.append(float(np.sum(parts.column("inertia").to_numpy())) / max(n, 1))
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(new, axis=1)
        norms[norms == 0] = 1.0
        new = new / norms[:, None]
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift < tol:
            break
    return cents, history


def assign_clusters(
    emb: ray.data.Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> ray.data.Dataset:
    """Nearest-centroid (cosine) cluster id per row, broadcast-assigned
    (same kernel as ivf_assign, caller-named output column)."""
    assigned = ivf_assign(emb, centroids, vec_col)
    return assigned.map_batches(
        lambda b: b.rename_columns(
            [out_col if c == "ivf_part" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def cluster_stats(
    emb: ray.data.Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> pa.Table:
    """Per-cluster size and mean cosine-to-centroid in ONE streaming
    pass (per-batch sufficient statistics, driver reduces k scalars) —
    the curation report that drives cluster-balanced sampling and
    skew-aware re-training."""
    k = len(centroids)
    ref = ray.put(centroids)

    class Partial:
        def __init__(self, r):
            self.ref = r
            self.c = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:  # zero-row blocks are legal upstream
                return pa.table(
                    {
                        "counts": pa.array([], pa.list_(pa.int64())),
                        "cos_sums": pa.array([], pa.list_(pa.float64())),
                    }
                )
            if self.c is None:
                self.c = ray.get(self.ref)
            x = _stack_unit(batch.column(vec_col))
            sim = x @ self.c.T
            a = sim.argmax(axis=1)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            cos_sums = np.bincount(
                a, weights=sim[np.arange(len(x)), a], minlength=k
            )
            return pa.table(
                {
                    "counts": pa.array([counts], pa.list_(pa.int64())),
                    "cos_sums": pa.array([cos_sums], pa.list_(pa.float64())),
                }
            )

    tabs = [
        t
        for t in ray.get(
            emb.map_batches(Partial(ref), batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows  # Ray Data renders empty blocks schemaless
    ]
    parts = pa.concat_tables(tabs) if tabs else None
    if parts is None or parts.num_rows == 0:  # every block empty: all-zero
        counts = np.zeros(k, dtype=np.int64)
        cos_sums = np.zeros(k, dtype=np.float64)
    else:
        counts = np.stack(
            parts.column("counts").to_numpy(zero_copy_only=False)
        ).sum(axis=0)
        cos_sums = np.stack(
            parts.column("cos_sums").to_numpy(zero_copy_only=False)
        ).sum(axis=0)
    mean_cos = np.divide(
        cos_sums, counts, out=np.zeros_like(cos_sums), where=counts > 0
    )
    return pa.table(
        {
            "cluster": pa.array(np.arange(k, dtype=np.int32)),
            "n": pa.array(counts, pa.int64()),
            "mean_cos": pa.array(mean_cos, pa.float64()),
        }
    )


def cluster_balanced_sample(
    emb: ray.data.Dataset,
    centroids: np.ndarray,
    per_cluster: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: int = 0,
) -> ray.data.Dataset:
    """At most ``per_cluster`` rows from every semantic cluster,
    deterministically (the same corpus + centroids + salt always picks
    the same rows): assign clusters broadcast-side, rank rows within a
    cluster by an avalanched hash of their id, keep the smallest —
    distributed via grouped_top_k (only k rows per cluster per block
    cross the shuffle). The cluster-diversity sampler for training-mix
    curation: caps over-represented semantic regions instead of
    sampling them proportionally."""
    from xgeo_ray.functions.relational import _MIX, grouped_top_k, salt_mix

    assigned = assign_clusters(emb, centroids, vec_col)
    mask = salt_mix(salt)

    def rank(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (ids ^ mask) * _MIX
        return batch.append_column(
            "_h", pa.array(h.view(np.int64))
        )

    ranked = assigned.map_batches(rank, batch_format="pyarrow")
    out = grouped_top_k(
        ranked,
        ["cluster"],
        ["_h", id_col],
        [False, False],
        per_cluster,
    )
    return out.drop_columns(["_h"])
