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
    tbl = pa.concat_tables(ray.get(sample.to_arrow_refs()))
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
