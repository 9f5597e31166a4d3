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
    emb: ray.data.Dataset | None,
    vec_col: str | None = None,
    batch_id: str | None = None,
    tombstones: dict | None = None,
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
    duplicates.

    ``tombstones`` (``{str(vec_id): dead_upto_epoch}``) merges into the
    manifest in the SAME commit (max per id): entries with ``_epoch <
    dead_upto`` stop matching in ``ivf_topk_live`` — how ``sync_ivf``
    retracts superseded/deleted versions without rewriting list files.
    ``emb=None`` commits a vector-less update (deletes-only window)."""
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
    new_rows: dict[int, int] = {}
    if emb is not None:
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
        if tombstones:
            dead = manifest.setdefault("tombstones", {})
            for vid, upto in tombstones.items():
                vid = str(vid)
                dead[vid] = max(int(upto), dead.get(vid, 0))
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


def ivf_topk_live(
    index_dir: str,
    query_vecs: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str | None = None,
) -> pa.Table:
    """``ivf_topk_indexed`` over a ``sync_ivf``-maintained index:
    probe-pruned reads PLUS tombstone filtering (entries with
    ``_epoch < tombstones[vec_id]`` are superseded versions or deleted
    keys and never match). The tombstone map ships once as an ObjectRef
    and filters vectorized (sorted ids + searchsorted) inside each read
    task. Returns (query_idx, vec_id, src keys if indexed, rank)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    manifest, _ = _read_ivf_manifest(index_dir)
    vec_col = vec_col or manifest["vec_col"]
    _, files = plan_probe_files(index_dir, query_vecs, nprobe)
    empty = pa.table(
        {
            "query_idx": pa.array([], pa.int32()),
            id_col: pa.array([], pa.int64()),
            "rank": pa.array([], pa.int32()),
        }
    )
    if not files:
        return empty
    ds = ray.data.read_parquet(files)
    tomb = manifest.get("tombstones") or {}
    if tomb:
        tids = np.sort(np.array([int(v) for v in tomb], dtype=np.int64))
        teps = np.array(
            [tomb[str(v)] for v in tids], dtype=np.int64
        )
        ref = ray.put((tids, teps))

        class LiveFilter:
            def __init__(self, r):
                self.r, self.t = r, None

            def __call__(self, b: pa.Table) -> pa.Table:
                if b.num_rows == 0 or "_epoch" not in b.column_names:
                    return b
                if self.t is None:
                    self.t = ray.get(self.r)
                ids_, eps_ = self.t
                vid = b.column(id_col).to_numpy()
                ep = b.column("_epoch").to_numpy()
                pos = np.searchsorted(ids_, vid)
                pos = np.clip(pos, 0, len(ids_) - 1)
                dead = (ids_[pos] == vid) & (ep < eps_[pos])
                return b.filter(pa.array(~dead))

        ds = ds.map_batches(LiveFilter(ref), batch_format="pyarrow")
    top = brute_force_topk(ds, query_vecs, k=k, id_col=id_col, vec_col=vec_col)
    # map ids back to source keys from the (already pruned) probed files
    schema_names = pq.read_schema(files[0]).names if files else []
    keys = [c for c in ("conv_id", "turn_idx") if c in schema_names]
    if top.num_rows == 0 or not keys:
        return top
    wanted = pa.array(
        np.unique(top.column(id_col).to_numpy()), pa.int64()
    )
    rows = (
        ds.map_batches(
            lambda b: b.filter(
                pc.is_in(b.column(id_col), value_set=wanted)
            ).select([id_col, *keys]),
            batch_format="pyarrow",
        )
        .to_arrow_refs()
    )
    m = pa.concat_tables(
        [t for t in ray.get(rows) if t.num_rows]
    )
    # one live row per vec_id (older versions are tombstoned) — a
    # defensive group-first keeps the join 1:1 regardless
    m = m.group_by(id_col).aggregate(
        [(c, "first") for c in keys]
    )
    m = m.rename_columns([id_col, *keys])
    return top.join(m, keys=id_col).sort_by(
        [("query_idx", "ascending"), ("rank", "ascending")]
    )


def sync_ivf(
    table,
    index_dir: str,
    vec_col: str = "embedding",
    num_centroids: int = 16,
    upto_epoch: int | None = None,
) -> dict:
    """Maintain a persisted IVF vector index incrementally from a
    DeltaTable's committed change feed — the ANN analog of
    ``dedup.sync_near_dup``: embeddings of keys touched since the last
    sync append as generation files to their inverted lists
    (``ivf_append``, O(change volume)); superseded versions and deleted
    keys retract via the manifest tombstone map (``{vec_id:
    dead_upto_epoch}`` — an update at epoch e kills entries with
    ``_epoch < e``, a delete kills ``< e+1``); ``ivf_topk_live``
    answers probes against exactly the LIVE set.

    Index entries are ``(vec_id, conv_id, turn_idx, embedding,
    _epoch)`` with ``vec_id`` = fixed-key siphash of the composite
    source key (the repo's standard vanishing-collision equivalence).
    First sync (cursor at 0) BOOTSTRAPS: trains centroids on the
    current snapshot and builds the base index — rebuild-by-redo makes
    a crash before the ack safe. Incremental windows append as a
    streaming Dataset (vectors never pass through the driver); only the
    tombstone dict (O(touched keys) ints) is driver-side. Exactly-once:
    appends carry a deterministic batch id + the tombstone merge in the
    SAME manifest commit, consumer ack AFTER — a replayed window
    no-ops. Tombstones accumulate with churn until the next bootstrap
    rebuild resets them (the standard vector-index maintenance model:
    rebuild when tombstone fraction or list skew grows — the manifest's
    counts are the signal). Centroids never move between rebuilds, so
    recall drifts with distribution shift; same contract as
    ``ivf_append``."""
    import hashlib
    import json
    import os

    import pyarrow.compute as pc

    from xgeo_ray.functions.dedup import hash_tokens
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state import consumers as _cons

    group = (
        "ivf-"
        + hashlib.sha1(os.path.abspath(index_dir).encode()).hexdigest()[:10]
    )
    since = _cons.position(table, group)
    upto = table.latest_epoch() if upto_epoch is None else upto_epoch
    if upto <= since:
        return {"synced_epochs": 0, "appended": 0, "last_epoch": since}

    def add_vec_id(b: pa.Table) -> pa.Table:
        ck = pc.binary_join_element_wise(
            b.column("conv_id").cast(pa.string()),
            b.column("turn_idx").cast(pa.string()),
            "\x1f",
        )
        vid = hash_tokens(
            np.asarray(ck.to_numpy(zero_copy_only=False), dtype=object)
        ).view(np.int64)
        return b.append_column("vec_id", pa.array(vid, pa.int64()))

    if since == 0:
        # bootstrap: rebuild from the current snapshot (idempotent by
        # redo — a crash before the ack just rebuilds again)
        snap = ing.snapshot(
            table, columns=["conv_id", "turn_idx", vec_col]
        ).map_batches(add_vec_id, batch_format="pyarrow")
        ep = int(upto)
        entries = snap.map_batches(
            lambda b: pa.table(
                {
                    "vec_id": b.column("vec_id"),
                    "conv_id": b.column("conv_id"),
                    "turn_idx": b.column("turn_idx"),
                    vec_col: b.column(vec_col),
                    "_epoch": pa.array(
                        np.full(b.num_rows, ep, np.int64)
                    ),
                }
            ).filter(pc.is_valid(b.column(vec_col))),
            batch_format="pyarrow",
        ).materialize()  # one snapshot read feeds both train and build
        cents = train_ivf_centroids(
            entries, num_centroids=num_centroids, vec_col=vec_col
        )
        build_ivf_index(entries, cents, index_dir, vec_col=vec_col)
        _cons.ack(table, group, upto)
        return {
            "synced_epochs": upto,
            "appended": -1,  # bootstrap: full rebuild, not an append
            "last_epoch": upto,
        }

    # crash-replay guard: append batch ids are keyed by the window
    # START (the cursor), so a retry whose `upto` has advanced (the
    # source committed more epochs between the append and the lost
    # ack) must NOT re-key and re-append the already-committed prefix.
    # Recover the committed window's end from the recorded id, ack it,
    # and let the NEXT sync process the remainder — without this, a
    # crash between append and ack duplicates the prefix's vectors
    # under the same vec_id/_epoch (never retracted by tombstones).
    prefix = f"{group}-e{since + 1}-"
    try:
        man, _ = _read_ivf_manifest(index_dir)
    except FileNotFoundError:
        man = {}
    for bid in man.get("batches", []):
        if bid.startswith(prefix):
            committed_upto = int(bid[len(prefix):])
            _cons.ack(table, group, committed_upto)
            return {
                "synced_epochs": committed_upto - since,
                "appended": 0,
                "replayed": True,
                "last_epoch": committed_upto,
            }

    feed = ing.changes(
        table, since, upto, columns=["conv_id", "turn_idx", "op", vec_col]
    ).map_batches(add_vec_id, batch_format="pyarrow").materialize()
    # ^ materialize ONCE (object store, never the driver): the tombstone
    # pass and the append both consume it — without this, Ray re-reads
    # the window's delta files per consumer
    # tombstones: every touched key retracts its PRE-window versions —
    # update at e -> dead below e (keeps its own entry), delete -> e+1
    def tomb_partial(b: pa.Table) -> pa.Table:
        dead = pc.add(
            b.column("_epoch"),
            pc.if_else(
                pc.equal(b.column("op"), pa.scalar("D")),
                pa.scalar(1, pa.int64()),
                pa.scalar(0, pa.int64()),
            ),
        )
        return (
            pa.table({"vec_id": b.column("vec_id"), "dead": dead})
            .group_by("vec_id")
            .aggregate([("dead", "max")])
        )

    tomb_tabs = [
        t
        for t in ray.get(
            feed.map_batches(
                tomb_partial, batch_format="pyarrow"
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    tomb: dict[str, int] = {}
    if tomb_tabs:
        tt = (
            pa.concat_tables(tomb_tabs)
            .group_by("vec_id")
            .aggregate([("dead_max", "max")])
        )
        tomb = {
            str(v): int(d)
            for v, d in zip(
                tt.column("vec_id").to_pylist(),
                tt.column("dead_max_max").to_pylist(),
            )
        }

    def live_entries(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.invert(pc.equal(b.column("op"), pa.scalar("D"))),
            pc.is_valid(b.column(vec_col)),
        )
        f = b.filter(pc.fill_null(keep, False))
        return pa.table(
            {
                "vec_id": f.column("vec_id"),
                "conv_id": f.column("conv_id"),
                "turn_idx": f.column("turn_idx"),
                vec_col: f.column(vec_col),
                "_epoch": f.column("_epoch"),
            }
        )

    adds = feed.map_batches(live_entries, batch_format="pyarrow").materialize()
    n_add = adds.count()  # metadata-only on a materialized dataset
    ivf_append(
        index_dir,
        adds if n_add else None,
        vec_col=vec_col,
        batch_id=f"{group}-e{since + 1}-{upto}",
        tombstones=tomb,
    )
    _cons.ack(table, group, upto)
    return {
        "synced_epochs": upto - since,
        "appended": int(n_add),
        "tombstoned": len(tomb),
        "last_epoch": upto,
    }


@ray.remote
def _ivf_fold_task(
    index_dir: str, part: int, files: list[str], tomb, token: str
) -> tuple[int, int, str | None]:
    """Fold one inverted list's generation chain into one file, dropping
    tombstoned entries. ``tomb`` is a (sorted ids, dead epochs) tuple or
    None — passed as a top-level ObjectRef so Ray resolves it zero-copy.
    Returns (part, live_rows, new_file | None)."""
    import os

    import pyarrow.parquet as pq

    from xgeo_ray.pipelines.ingest import _atomic_write_parquet
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    tids, teps = tomb if tomb is not None else (None, None)
    tabs = [
        pq.read_table(os.path.join(index_dir, f), use_threads=False)
        for f in files
    ]
    t = pa.concat_tables(tabs, promote_options="permissive") if tabs else None
    if t is None or t.num_rows == 0:
        return part, 0, None
    if tids is not None and len(tids) and "_epoch" in t.column_names:
        vid = t.column("vec_id").to_numpy()
        ep = t.column("_epoch").to_numpy()
        pos = np.clip(np.searchsorted(tids, vid), 0, len(tids) - 1)
        dead = (tids[pos] == vid) & (ep < teps[pos])
        t = t.filter(pa.array(~dead))
    if t.num_rows == 0:
        return part, 0, None
    name = f"part-{part:05d}-g{token}.parquet"
    _atomic_write_parquet(t, os.path.join(index_dir, name))
    return part, t.num_rows, name


def ivf_compact(index_dir: str) -> dict:
    """Fold every inverted list's generation chain into ONE file,
    dropping tombstoned entries, and publish a fresh manifest with the
    tombstone map CLEARED — the index analog of table compaction, and
    the reset point ``sync_ivf``'s tombstone model relies on (tombstones
    otherwise accumulate with churn). Centroids do not move (fold, not
    rebuild — retrain via a fresh ``build_ivf_index`` when distribution
    drift, not file count, is the problem). The ``batches`` exactly-once
    keys are PRESERVED so replayed append windows still no-op.

    Single-maintainer contract (same as table compact — use
    ``state.lease`` to enforce): the manifest commit goes through the
    exclusive fence, and a concurrent append detected during the commit
    raises rather than silently dropping its generation files.
    Superseded inputs are NOT deleted — the table's compact/vacuum
    split: a concurrent reader that planned its probe files from the
    previous manifest must still find them. Run ``ivf_vacuum`` after a
    grace period sized to your longest probe to reclaim the bytes
    (``ivf_fsck`` counts them as orphans meanwhile)."""
    import json
    import os

    from xgeo_ray.state.delta_table import new_commit_token
    from xgeo_ray.state.storage import DEFAULT_STORAGE

    manifest, version = _read_ivf_manifest(index_dir)
    gen_files = manifest.get("files", {})
    tomb = manifest.get("tombstones") or {}
    tomb_ref = None
    if tomb:
        tids = np.sort(np.array([int(v) for v in tomb], dtype=np.int64))
        teps = np.array([tomb[str(v)] for v in tids], dtype=np.int64)
        tomb_ref = ray.put((tids, teps))
    token = new_commit_token()
    plan = {
        int(p): gen_files.get(str(p), [f"part-{int(p):05d}.parquet"])
        for p in manifest["parts"]
    }
    results = ray.get(
        [
            _ivf_fold_task.remote(index_dir, p, fl, tomb_ref, token)
            for p, fl in sorted(plan.items())
        ]
    )
    new_manifest = {
        "centroids": manifest["centroids"],
        "vec_col": manifest["vec_col"],
        "parts": {p: rows for p, rows, name in results if name},
        "files": {str(p): [name] for p, rows, name in results if name},
        "batches": manifest.get("batches", []),
    }
    try:
        DEFAULT_STORAGE.commit_bytes_exclusive(
            os.path.join(index_dir, f"_ivf-v{version + 1:06d}.json"),
            json.dumps(new_manifest).encode(),
        )
    except FileExistsError:
        raise RuntimeError(
            "concurrent ivf manifest writer during compact — "
            "serialize maintenance (state.lease) and retry"
        )
    # Touch the superseded inputs so ivf_vacuum's min_age_s grace is
    # measured from SUPERSESSION, not from when the file was originally
    # written — compaction inputs can be arbitrarily old, and aging them
    # by write-mtime would let a vacuum run right after this compact
    # delete them with zero actual grace for readers that planned probe
    # files from the previous manifest.
    for fl in plan.values():
        for fname in fl:
            try:
                os.utime(os.path.join(index_dir, fname), None)
            except FileNotFoundError:
                pass
    return {
        "lists": len(plan),
        "live_rows": int(sum(r for _, r, n in results if n)),
        "dropped_tombstones": len(tomb),
        "version": version + 1,
    }


def ivf_vacuum(index_dir: str, min_age_s: float = 3600.0) -> dict:
    """Delete part files the CURRENT manifest no longer references —
    compaction inputs and crashed-append generation files (what
    ``ivf_fsck`` reports as orphans). Separate from ``ivf_compact`` for
    the same reason table vacuum is separate from table compact: a
    reader that planned its probe files from the previous manifest
    must be given a grace period before its inputs disappear.
    ``min_age_s`` skips files younger than the window (default 1 h):
    an IN-FLIGHT append writes its generation files BEFORE its
    manifest commit, so an unreferenced-but-fresh file may be about to
    become referenced — deleting it would commit a manifest pointing
    at nothing. ``ivf_compact`` touches its superseded inputs after the
    new manifest commits, so for compaction inputs the age is measured
    from SUPERSESSION (when they became unreferenced), not from their
    original write — a vacuum right after a compact still honors the
    full grace window. Size it above your longest append+probe.
    Returns ``{"removed": n, "bytes": n}``."""
    import os
    import re
    import time

    manifest, _ = _read_ivf_manifest(index_dir)
    gen_files = manifest.get("files", {})
    referenced = set()
    for p in manifest["parts"]:
        referenced.update(
            gen_files.get(str(p), [f"part-{int(p):05d}.parquet"])
        )
    now = time.time()
    removed = freed = 0
    for name in os.listdir(index_dir):
        if not re.match(r"^part-\d+(-g[^.]+)?\.parquet$", name):
            continue
        if name in referenced:
            continue
        path = os.path.join(index_dir, name)
        try:
            if now - os.path.getmtime(path) < min_age_s:
                continue
            freed += os.path.getsize(path)
            os.remove(path)
            removed += 1
        except FileNotFoundError:
            pass
    return {"removed": removed, "bytes": int(freed)}


def ivf_fsck(index_dir: str) -> dict:
    """Offline integrity check for an IVF index directory (the table
    ``fsck``'s index sibling): verifies every manifest-referenced list
    file exists, counts orphan part files (generation files from
    crashed appends / pre-compaction inputs — dead bytes, reclaimable,
    never wrong) and recomputes per-list row counts from parquet
    footers against the manifest's ``parts`` map. Metadata-only: no
    data pages are read. Returns ``{"ok": bool, "missing": [...],
    "orphans": n, "orphan_bytes": n, "row_count_drift": {...},
    "tombstones": n, "version": v}`` — ``ok`` is False only on missing
    files or row-count drift (real corruption); orphans are normal."""
    import os
    import re

    import pyarrow.parquet as pq

    manifest, version = _read_ivf_manifest(index_dir)
    gen_files = manifest.get("files", {})
    referenced: dict[str, int] = {}
    for p in manifest["parts"]:
        for name in gen_files.get(str(p), [f"part-{int(p):05d}.parquet"]):
            referenced[name] = int(p)
    on_disk = {
        n
        for n in os.listdir(index_dir)
        if re.match(r"^part-\d+(-g[^.]+)?\.parquet$", n)
    }
    missing = sorted(set(referenced) - on_disk)
    orphan_names = sorted(on_disk - set(referenced))
    orphan_bytes = sum(
        os.path.getsize(os.path.join(index_dir, n)) for n in orphan_names
    )
    drift: dict[str, list[int]] = {}
    counted: dict[int, int] = {}
    for name, p in referenced.items():
        if name in on_disk:
            counted[p] = counted.get(p, 0) + pq.read_metadata(
                os.path.join(index_dir, name)
            ).num_rows
    for p, want in manifest["parts"].items():
        got = counted.get(int(p), 0)
        if got != int(want) and not any(
            referenced[n] == int(p) for n in missing
        ):
            drift[str(p)] = [int(want), got]
    return {
        "ok": not missing and not drift,
        "missing": missing,
        "orphans": len(orphan_names),
        "orphan_bytes": int(orphan_bytes),
        "row_count_drift": drift,
        "tombstones": len(manifest.get("tombstones") or {}),
        "version": version,
    }


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
