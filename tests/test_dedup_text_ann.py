import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from xgeo_ray.functions import dedup as dd
from xgeo_ray.functions import text as tx
from xgeo_ray.functions.ann import brute_force_topk, ivf_topk, train_ivf_centroids


def _docs():
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again today",  # near-dup of 0
        "completely different content about distributed data processing engines",
        "unrelated short text",
        "the quick brown fox jumps over the lazy dog again and again",  # exact dup of 0
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})


def test_jaccard_and_shingles_deterministic():
    t = _docs()
    a, b = t.column("text")[0].as_py(), t.column("text")[1].as_py()
    j = dd.jaccard(a, b)
    assert 0.5 < j < 1.0
    assert dd.jaccard(a, a) == 1.0
    s1 = dd._shingle_hashes(a)
    s2 = dd._shingle_hashes(a)
    assert np.array_equal(s1, s2)


def test_minhash_approximates_jaccard():
    mh = dd.MinHasher(num_hashes=128)
    t = _docs()
    out = mh(t)
    sigs = np.stack(out.column("minhash").to_numpy(zero_copy_only=False))
    est = (sigs[0] == sigs[1]).mean()
    true = dd.jaccard(t.column("text")[0].as_py(), t.column("text")[1].as_py())
    assert abs(est - true) < 0.25
    assert (sigs[0] == sigs[4]).all()  # exact dup -> identical signature


def test_minhash_lsh_finds_planted_dups():
    ds = ray.data.from_arrow(_docs())
    pairs = dd.minhash_lsh_dup_pairs(ds, threshold=0.7).to_pandas()
    found = set(map(tuple, pairs[["doc_id_a", "doc_id_b"]].to_numpy()))
    assert (0, 4) in found  # exact dup
    assert (0, 1) in found or (1, 4) in found  # near dup
    assert not any(2 in p or 3 in p for p in found)


def test_simhash_close_for_near_dups():
    sh = dd.SimHasher()
    t = sh(_docs())
    h = t.column("simhash").to_numpy().astype(np.uint64)
    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")
    assert ham(h[0], h[4]) == 0
    assert ham(h[0], h[1]) < 12
    assert ham(h[0], h[2]) > 12


def test_exact_dedup_groups():
    ds = ray.data.from_arrow(_docs())
    out = dd.exact_dedup_groups(ds).to_pandas().sort_values("doc_id")
    dup_group = out[out["n_copies"] == 2]
    assert len(dup_group) == 1 and dup_group.iloc[0]["doc_id"] == 0
    assert out["n_copies"].sum() == 5


def test_embedding_dup_pairs():
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((30, 16)).astype(np.float32)
    vecs[17] = vecs[3] * 2.0  # same direction = cosine 1.0
    t = pa.table(
        {
            "vec_id": pa.array(range(30), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    pairs = dd.embedding_dup_pairs(ray.data.from_arrow(t), threshold=0.999).to_pandas()
    assert (3, 17) in set(map(tuple, pairs[["vec_id_a", "vec_id_b"]].to_numpy()))


def test_token_count_matches_python_split():
    t = pa.table({"text": ["a b  c", " x ", "", "one"]})
    out = tx.token_count_table(t)
    assert out.column("n_tokens").to_pylist() == [3, 1, 0, 1]


def test_fingerprint_deterministic_and_content_sensitive():
    fp = tx.fingerprint64(np.array(["hello world", "hello world", "bye"], dtype=object))
    assert fp[0] == fp[1] and fp[0] != fp[2]


def test_brute_force_topk_self_first():
    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t)
    out = brute_force_topk(ds, vecs[[7]], k=5).to_pandas()
    assert out[out["rank"] == 1].iloc[0]["vec_id"] == 7  # itself
    # exact ground truth via numpy
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit[7]
    want = np.lexsort((np.arange(50), -sims))[:5]
    assert out.sort_values("rank")["vec_id"].tolist() == list(want)


def test_ivf_recall_reasonable():
    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t)
    cents = train_ivf_centroids(ds, num_centroids=8, sample_fraction=0.5)
    exact = brute_force_topk(ds, vecs[[0]], k=10).to_pandas()["vec_id"].tolist()
    approx = ivf_topk(ds, cents, vecs[[0]], k=10, nprobe=4).to_pandas()["vec_id"].tolist()
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5
    assert approx[0] == 0  # the query vector itself survives probing


def test_multimodal_plumbing():
    from xgeo_ray.functions.multimodal import DecodeMedia, ExtractFeatures, docs_to_media

    media = docs_to_media(_docs())
    assert media.schema.field("payload").type == pa.binary()
    dec = DecodeMedia()(media)
    assert {"width", "height", "channels"} <= set(dec.column_names)
    assert "payload" not in dec.column_names
    # deterministic stub dims
    dec2 = DecodeMedia()(docs_to_media(_docs()))
    assert dec.equals(dec2)
    feats = ExtractFeatures()(media)
    f = np.stack(feats.column("features").to_numpy(zero_copy_only=False))
    assert f.shape == (5, 8)
    assert np.allclose(f.sum(axis=1), 1.0, atol=1e-5)


def test_ngram_jaccard_exact_join_matches_bruteforce():
    """The inverted-index similarity join must equal all-pairs jaccard()."""
    t = _docs()
    thresh = 0.6
    texts = t.column("text").to_pylist()
    want = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if dd.jaccard(texts[i], texts[j]) >= thresh:
                want.add((i, j))
    ds = ray.data.from_arrow(t)
    got_df = dd.ngram_jaccard_dup_pairs(ds, threshold=thresh).to_pandas()
    got = set(map(tuple, got_df[["doc_id_a", "doc_id_b"]].to_numpy()))
    assert got == want
    for _, r in got_df.iterrows():
        assert r["jaccard"] == pytest.approx(
            dd.jaccard(texts[int(r["doc_id_a"])], texts[int(r["doc_id_b"])])
        )


def test_ngram_jaccard_max_df_drops_stop_shingles():
    # every doc shares the ubiquitous shingle; max_df=2 removes it, so the
    # only surviving pair is the exact dup that also shares rare shingles
    texts = [
        "alpha beta gamma uniq1 uniq2 uniq3",
        "alpha beta gamma uniq1 uniq2 uniq3",
        "alpha beta gamma other4 other5 other6",
        "alpha beta gamma seven8 nine10 eleven12",
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts})
    ds = ray.data.from_arrow(t)
    got = dd.ngram_jaccard_dup_pairs(ds, threshold=0.5, max_df=2).to_pandas()
    assert set(map(tuple, got[["doc_id_a", "doc_id_b"]].to_numpy())) == {(0, 1)}


def test_simhash_dup_pairs_finds_planted_dups():
    ds = ray.data.from_arrow(_docs())
    got = dd.simhash_dup_pairs(ds, max_hamming=3).to_pandas()
    pairs = set(map(tuple, got[["doc_id_a", "doc_id_b"]].to_numpy()))
    assert (0, 4) in pairs  # exact dup: hamming 0
    row = got[(got.doc_id_a == 0) & (got.doc_id_b == 4)].iloc[0]
    assert row["hamming"] == 0
    assert not any(2 in p or 3 in p for p in pairs)


def test_grouped_top_k_matches_pandas():
    import pandas as pd
    from xgeo_ray.functions.relational import grouped_top_k

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 5, 500),
            "v": rng.standard_normal(500),
            "id": np.arange(500),
        }
    )
    ds = ray.data.from_pandas(df)
    got = (
        grouped_top_k(ds, ["g"], ["v", "id"], [True, False], 3, rank_col="rank")
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["g", "v", "id"], ascending=[True, False, True])
        .groupby("g", sort=False)
        .head(3)
        .sort_values(["g"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["id"].tolist() == want["id"].tolist()
    assert got["rank"].tolist() == [1, 2, 3] * 5


def test_multimodal_resize_and_frame_sampling():
    from xgeo_ray.functions.multimodal import (
        ResizeImage,
        SampleFrames,
        docs_to_media,
    )

    t = docs_to_media(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["a" * 1000, "b" * 100],
            }
        )
    )
    r = ResizeImage(width=8, height=8)(t)
    assert r.column("n_bytes").to_pylist() == [8 * 8 * 3] * 2
    assert all(len(p) == 8 * 8 * 3 for p in r.column("payload").to_pylist())
    # deterministic: same input -> same resized bytes
    r2 = ResizeImage(width=8, height=8)(t)
    assert r.column("payload").to_pylist() == r2.column("payload").to_pylist()

    f = SampleFrames(frame_bytes=256, max_frames=3)(t)
    by_id = f.to_pandas().groupby("media_id")
    assert len(by_id.get_group(1)) == 3  # 1000 bytes -> 3 frames sampled of 3
    assert len(by_id.get_group(2)) == 1  # 100 bytes -> single frame
    assert (f.to_pandas()["n_frames"] >= 1).all()


def test_simhash_and_fingerprint_goldens():
    """Pinned cross-process golden values — the documented quantitative
    check for the two sketch operators that have no SQL oracle (their
    64-bit word hash is a fixed-key siphash DuckDB cannot reproduce)."""
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [
                    "the quick brown fox jumps over the lazy dog",
                    "pack my box with five dozen liquor jugs",
                ]
            ),
        }
    )
    assert dd.SimHasher()(t).column("simhash").to_pylist() == [
        2849287923411060561,
        -4584398187164852209,
    ]
    fp = tx.fingerprint64(
        np.array(
            [
                "the quick brown fox jumps over the lazy dog",
                "pack my box with five dozen liquor jugs",
            ],
            dtype=object,
        )
    )
    assert fp.view(np.int64).tolist() == [102926524943068778, 372997698705972237]


def test_minhash_output_equals_exact_ngram_join():
    """Backs the minhash_dup_pairs SQL oracle: with true-Jaccard verify,
    the LSH output must EQUAL the exact set-similarity join whenever
    banding recall is total (planted + synthetic near-dups here)."""
    rng = np.random.default_rng(3)
    vocab = np.array([f"w{i}" for i in range(60)], dtype=object)
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(40)]
    # plant near-dups: copy with one token changed, plus exact copies
    for i in range(6):
        toks = texts[i].split()
        toks[5] = "zz"
        texts.append(" ".join(toks))
    texts += texts[:3]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    ds1 = ray.data.from_arrow(t)
    ds2 = ray.data.from_arrow(t)
    got = (
        dd.minhash_lsh_dup_pairs(ds1, threshold=0.8)
        .to_pandas()[["doc_id_a", "doc_id_b"]]
        .sort_values(["doc_id_a", "doc_id_b"])
        .reset_index(drop=True)
    )
    want = (
        dd.ngram_jaccard_dup_pairs(ds2, threshold=0.8)
        .to_pandas()[["doc_id_a", "doc_id_b"]]
        .sort_values(["doc_id_a", "doc_id_b"])
        .reset_index(drop=True)
    )
    assert len(want) >= 9  # the planted structure is actually there
    assert got.equals(want)


def test_lang_id_vectorized_matches_reference_voter():
    """The Arrow-vectorized LangId must reproduce the naive per-row
    stopword voter exactly (occurrence counts, sorted-lang tiebreak,
    'und' on zero scores)."""
    texts = [
        "the cat and the hat",             # en
        "der hund und die katze ist da",   # de
        "le chat est dans la maison",      # fr
        "el perro es un animal",           # es
        "zzz qqq xyzzy",                   # und
        "la la la",                        # tie: es vs fr on 'la' -> es (sorted first of tied)
        "",                                # empty -> und
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    got = tx.LangId()(t).column("lang_pred").to_pylist()

    langs = sorted(tx._STOPWORDS)
    def vote(s):
        scores = {l: sum(1 for w in s.lower().split() if w in tx._STOPWORDS[l]) for l in langs}
        best = max(langs, key=lambda l: (scores[l], -langs.index(l)))
        return best if scores[best] > 0 else "und"
    assert got == [vote(s) for s in texts]


def test_ivf_indexed_reads_only_probed_partitions(tmp_path):
    """The persisted IVF index must open only the nprobe probed partition
    files (I/O scales with nprobe, not index size), and the pruned read
    must give the same answer as the in-memory filter variant."""
    import os

    from xgeo_ray.functions.ann import (
        build_ivf_index,
        ivf_topk_indexed,
        plan_probe_files,
    )

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t)
    cents = train_ivf_centroids(ds, num_centroids=8, sample_fraction=0.5)
    idx = str(tmp_path / "ivf")
    manifest = build_ivf_index(ds, cents, idx)
    n_files = len([f for f in os.listdir(idx) if f.startswith("part-")])
    assert n_files == len(manifest["parts"]) >= 4
    assert sum(manifest["parts"].values()) == 300  # every vector indexed once

    q = vecs[[0, 7]]
    _, f1 = plan_probe_files(idx, q, nprobe=1)
    _, f3 = plan_probe_files(idx, q, nprobe=3)
    assert len(f1) <= 2 < n_files  # two queries, one probe each
    assert len(f1) < len(f3) < n_files  # bytes read grow with nprobe only

    got = ivf_topk_indexed(idx, q, k=10, nprobe=3).to_pandas()
    want = ivf_topk(ds, cents, q, k=10, nprobe=3).to_pandas()
    assert got.equals(want)
    assert got[got["query_idx"] == 0].iloc[0]["vec_id"] == 0


def test_normalize_and_pii_redaction_kernels():
    """Real Unicode + PII inputs (the sf fixtures are plain ASCII, so
    their oracle rows exercise only plumbing; these pin the semantics)."""
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [
                    "Café LATTE",  # e + combining acute -> é under NFC
                    "mail a.b+c@ex-ample.org or call +1 (415) 555-0199, "
                    "ssn 123-45-6789, host 10.0.0.1",
                ]
            ),
        }
    )
    out = tx.normalize_text(t, form="NFC", casefold=True)
    assert out.column("text_norm").to_pylist()[0] == "café latte"

    red = tx.PiiRedactor()(t)
    r1 = red.column("text_redacted").to_pylist()[1]
    assert "<EMAIL>" in r1 and "<PHONE>" in r1 and "<SSN>" in r1 and "<IP>" in r1
    assert "a.b+c@" not in r1 and "555-0199" not in r1
    assert red.column("n_redactions").to_pylist() == [0, 4]


def test_dup_clusters_matches_union_find():
    """Min-label propagation must equal a classic union-find over random
    edge lists, including multi-hop chains (diameter > 1)."""
    rng = np.random.default_rng(7)
    edges = set()
    # chains: 0-1-2-3 ... plus random extra edges among 40 nodes
    for i in range(0, 36, 4):
        edges |= {(i, i + 1), (i + 1, i + 2), (i + 2, i + 3)}
    for _ in range(10):
        a, b = sorted(rng.choice(40, size=2, replace=False).tolist())
        if a != b:
            edges.add((a, b))
    t = pa.table(
        {
            "doc_id_a": pa.array([a for a, _ in sorted(edges)], pa.int64()),
            "doc_id_b": pa.array([b for _, b in sorted(edges)], pa.int64()),
        }
    )
    got = (
        dd.dup_clusters(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # union-find reference
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert dict(zip(got["doc_id"], got["cluster_id"])) == want


def test_chunk_documents_semantics():
    """Chunk boundaries, overlap duplication, short-last-chunk, empty-doc
    elision, and whitespace normalization vs a per-doc reference."""
    texts = [
        " ".join(f"t{i}" for i in range(10)),   # 10 tokens
        "a  b\n c",                              # messy whitespace, 3 tokens
        "",                                      # no chunks
        "solo",
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)})
    out = tx.chunk_documents(t, tokens_per_chunk=4, overlap=1)
    df = out.to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)

    def ref(doc_id, s):
        w = s.split()
        step = 3
        return [
            (doc_id, k, " ".join(w[st : st + 4]), min(st + 4, len(w)) - st)
            for k, st in enumerate(range(0, len(w), step))
            if st < len(w)
        ] if w else []
    want = [r for i, s in enumerate(texts) for r in ref(i, s)]
    got = list(df.itertuples(index=False, name=None))
    assert got == want
    # overlap: token t3 appears in doc 0's chunk 0 and chunk 1
    c0 = df[(df.doc_id == 0) & (df.chunk_idx == 0)].iloc[0]["chunk_text"]
    c1 = df[(df.doc_id == 0) & (df.chunk_idx == 1)].iloc[0]["chunk_text"]
    assert c0.endswith("t3") and c1.startswith("t3")


def test_ivf_append_incremental_index(tmp_path):
    """ivf_append maintains the persisted index incrementally: cost is
    the append batch (new generation files only; base files untouched),
    and probe results equal a full rebuild with the same centroids."""
    import os

    from xgeo_ray.functions.ann import (
        build_ivf_index,
        ivf_append,
        ivf_topk_indexed,
        plan_probe_files,
    )

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((400, 16)).astype(np.float32)

    def ds_of(sl):
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(sl.start, sl.stop), pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in vecs[sl]], pa.list_(pa.float32())
                    ),
                }
            )
        )

    cents = train_ivf_centroids(ds_of(slice(0, 400)), num_centroids=8)
    idx = str(tmp_path / "inc")
    build_ivf_index(ds_of(slice(0, 200)), cents, idx)
    before = {
        f: os.path.getmtime(os.path.join(idx, f))
        for f in os.listdir(idx)
        if f.startswith("part-")
    }
    m = ivf_append(idx, ds_of(slice(200, 400)))
    assert sum(int(v) for v in m["parts"].values()) == 400
    # base files untouched; appended generations are NEW files
    for f, mt in before.items():
        assert os.path.getmtime(os.path.join(idx, f)) == mt
    gens = [f for f in os.listdir(idx) if "-g" in f]
    assert gens
    # probe reads all generations of probed lists, still list-pruned
    q = vecs[[3, 250]]
    _, files = plan_probe_files(idx, q, nprobe=2)
    n_all = len([f for f in os.listdir(idx) if f.startswith("part-")])
    assert 0 < len(files) < n_all
    # results identical to a full one-shot build with the same centroids
    full = str(tmp_path / "full")
    build_ivf_index(ds_of(slice(0, 400)), cents, full)
    got = ivf_topk_indexed(idx, q, k=10, nprobe=3).to_pandas()
    want = ivf_topk_indexed(full, q, k=10, nprobe=3).to_pandas()
    assert got.equals(want)


def test_ivf_append_exactly_once_batch_id(tmp_path):
    """A retried append with the same batch_id is a no-op (the manifest
    records applied ids), and manifest updates publish as exclusively
    committed versions — a crashed attempt's unreferenced generation
    files are invisible to probes."""
    import os

    from xgeo_ray.functions.ann import (
        _read_ivf_manifest,
        build_ivf_index,
        ivf_append,
        ivf_topk_indexed,
    )

    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)

    def ds_of(sl):
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(sl.start, sl.stop), pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in vecs[sl]], pa.list_(pa.float32())
                    ),
                }
            )
        )

    cents = train_ivf_centroids(ds_of(slice(0, 300)), num_centroids=4)
    idx = str(tmp_path / "eo")
    build_ivf_index(ds_of(slice(0, 150)), cents, idx)
    m1 = ivf_append(idx, ds_of(slice(150, 300)), batch_id="b-1")
    assert sum(int(v) for v in m1["parts"].values()) == 300
    assert "b-1" in m1["batches"]
    # replay: no new rows, no new manifest version
    _, v_before = _read_ivf_manifest(idx)
    m2 = ivf_append(idx, ds_of(slice(150, 300)), batch_id="b-1")
    _, v_after = _read_ivf_manifest(idx)
    assert sum(int(v) for v in m2["parts"].values()) == 300
    assert v_after == v_before
    # a crashed attempt = orphan generation files not in any manifest:
    # probes ignore them
    orphan = os.path.join(idx, "part-00000-gdeadbeef.parquet")
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([999_999], pa.int64()),
                "embedding": pa.array([vecs[0].tolist()], pa.list_(pa.float32())),
            }
        ),
        orphan,
    )
    got = ivf_topk_indexed(idx, vecs[[0]], k=5, nprobe=4).to_pandas()
    assert 999_999 not in set(got["vec_id"])
    # a rebuild supersedes the versioned append manifests
    build_ivf_index(ds_of(slice(0, 300)), cents, idx)
    m3, v3 = _read_ivf_manifest(idx)
    assert v3 == 0 and "files" not in m3


def test_hash_sample_rate_deterministic_and_stratified():
    from xgeo_ray.functions.relational import hash_sample

    n = 20000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "grp": pa.array((np.arange(n) % 3).astype(np.int64)),
        }
    )
    got = hash_sample(ray.data.from_arrow(t), "doc_id", 100, salt=7).to_pandas()
    again = hash_sample(ray.data.from_arrow(t), "doc_id", 100, salt=7).to_pandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])  # reproducible
    # rate ~10% globally and within every stratum (no shuffle needed)
    assert 0.08 < len(got) / n < 0.12
    for g, sub in got.groupby("grp"):
        assert 0.07 < len(sub) / (n / 3) < 0.13, (g, len(sub))
    # a different salt draws a (near-)independent replica
    other = hash_sample(ray.data.from_arrow(t), "doc_id", 100, salt=8).to_pandas()
    overlap = len(set(got["doc_id"]) & set(other["doc_id"]))
    assert overlap < 0.03 * n  # ~1% expected under independence
    # rim cases: 0 keeps nothing, 1000 keeps everything
    assert hash_sample(ray.data.from_arrow(t), "doc_id", 0).count() == 0
    assert hash_sample(ray.data.from_arrow(t), "doc_id", 1000).count() == n


def test_contaminated_ids_flags_only_overlapping_docs():
    bench = pa.table(
        {
            "doc_id": pa.array([1000], pa.int64()),
            "text": pa.array(["the quick brown fox jumps over lazy dogs"]),
        }
    )
    corpus = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "we saw the quick brown fox yesterday",  # shares a 3-gram
                    "completely unrelated sentence about parquet files",
                    "quick brown elsewhere but never three in a row",
                    "fox jumps over the fence",  # "fox jumps over" overlaps
                ]
            ),
        }
    )
    got = dd.contaminated_ids(
        ray.data.from_arrow(corpus), ray.data.from_arrow(bench)
    ).to_pandas()
    assert sorted(got["doc_id"].tolist()) == [1, 4]


def test_pack_sequences_spans_and_offsets():
    from xgeo_ray.functions.text import pack_sequences

    t = pa.table(
        {
            "doc_id": pa.array([5, 1, 3, 9, 7], pa.int64()),
            "text": pa.array(
                [
                    " ".join(["w"] * 10),  # id 5: tokens 3..13
                    " ".join(["w"] * 3),  # id 1: tokens 0..3
                    "",  # id 3: zero tokens -> no rows
                    " ".join(["w"] * 20),  # id 9: tokens 23..43
                    " ".join(["w"] * 10),  # id 7: tokens 13..23
                ]
            ),
        }
    )
    got = (
        pack_sequences(ray.data.from_arrow(t).repartition(3), seq_len=16)
        .to_pandas()
        .sort_values(["doc_id", "seq_id"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "doc_id": [1, 5, 7, 7, 9, 9],
            "seq_id": [0, 0, 0, 1, 1, 2],
            "off_in_seq": [0, 3, 13, 0, 7, 0],
            "n_tok": [3, 10, 3, 7, 9, 11],
        }
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # every full sequence carries exactly seq_len tokens
    per_seq = got.groupby("seq_id")["n_tok"].sum()
    assert (per_seq.iloc[:-1] == 16).all() and per_seq.iloc[-1] <= 16


def test_term_frequencies_and_top_k_exact():
    from xgeo_ray.functions.relational import top_k
    from xgeo_ray.functions.text import term_frequencies

    texts = ["a b a", "b c", "", "  a  ", "c c c"]
    t = pa.table(
        {"doc_id": pa.array(np.arange(5), pa.int64()), "text": pa.array(texts)}
    )
    ds = ray.data.from_arrow(t).repartition(3)
    tf = term_frequencies(ds).to_pandas().set_index("token")["n"].to_dict()
    assert tf == {"a": 3, "b": 2, "c": 4}
    head = top_k(term_frequencies(ds), ["n", "token"], [True, False], 2).to_pandas()
    assert head["token"].tolist() == ["c", "a"]


def test_repetition_stats_counts_duplicate_2grams():
    from xgeo_ray.functions.text import repetition_stats

    texts = [
        "x y x y x",  # 2-grams: xy yx xy yx -> 4 total, 2 distinct
        "a b c",  # 2 total, 2 distinct
        "solo",  # < 2 tokens -> (0, 0)
        "",  # empty -> (0, 0)
    ]
    t = pa.table(
        {"doc_id": pa.array(np.arange(4), pa.int64()), "text": pa.array(texts)}
    )
    got = (
        repetition_stats(ray.data.from_arrow(t).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_2grams"].tolist() == [4, 2, 0, 0]
    assert got["n_distinct_2grams"].tolist() == [2, 2, 0, 0]


def test_dup_ngram_spans_finds_cross_doc_spans():
    # docs 0 and 1 share the 5-token run "p q r s t" -> 3-grams pqr qrs
    # rst each occur twice across the corpus; doc 2 is clean.
    texts = [
        "a b p q r s t c d",  # shared run at token offsets 2..6
        "p q r s t x y z w",  # shared run at token offsets 0..4
        "one two three four five six",
    ]
    t = pa.table(
        {"doc_id": pa.array(np.arange(3), pa.int64()), "text": pa.array(texts)}
    )
    spans = (
        dd.dup_ngram_spans(
            ray.data.from_arrow(t).repartition(2), k=3, min_count=2, num_buckets=4
        )
        .to_pandas()
        .sort_values(["doc_id", "start"])
        .reset_index(drop=True)
    )
    # marked positions: doc0 {2,3,4}, doc1 {0,1,2}; merged spans cover
    # the full shared run (end = last pos + k)
    assert spans.values.tolist() == [[0, 2, 7], [1, 0, 5]]


def test_dup_ngram_spans_same_doc_repeats_count():
    # "m n o" appears twice WITHIN one doc (positions 0 and 4, gap 4 > k
    # with k=3 -> two separate spans)
    texts = ["m n o z m n o", "unrelated words entirely here"]
    t = pa.table(
        {"doc_id": pa.array(np.arange(2), pa.int64()), "text": pa.array(texts)}
    )
    spans = (
        dd.dup_ngram_spans(
            ray.data.from_arrow(t), k=3, min_count=2, num_buckets=2
        )
        .to_pandas()
        .sort_values(["doc_id", "start"])
        .reset_index(drop=True)
    )
    assert spans.values.tolist() == [[0, 0, 3], [0, 4, 7]]


def test_dup_ngram_spans_stats_mode_merges_overlaps():
    # doc0/doc1 share "p q r s": marked positions per doc {0, 1}, gap 1
    # <= k -> ONE span of width 4; dup_grams counts marked positions.
    texts = ["p q r s", "p q r s", "alpha beta gamma delta"]
    t = pa.table(
        {"doc_id": pa.array(np.arange(3), pa.int64()), "text": pa.array(texts)}
    )
    got = (
        dd.dup_ngram_spans(
            ray.data.from_arrow(t), k=3, min_count=2, num_buckets=2, stats=True
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 1]
    assert got["dup_grams"].tolist() == [2, 2]
    assert got["covered_tokens"].tolist() == [4, 4]


def test_strip_dup_spans_removes_shared_runs():
    texts = [
        "a b p q r s t c d",  # covered token offsets 2..6 -> "a b c d"
        "p q r s t x y z w",  # covered 0..4 -> "x y z w"
        "one two three four five six",  # untouched
    ]
    t = pa.table(
        {"doc_id": pa.array(np.arange(3), pa.int64()), "text": pa.array(texts)}
    )
    got = (
        dd.strip_dup_spans(
            ray.data.from_arrow(t).repartition(2), k=3, min_count=2, num_buckets=4
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == [
        "a b c d",
        "x y z w",
        "one two three four five six",
    ]


def test_strip_dup_spans_matches_sql_oracle():
    # pseudo-random corpus with planted shared runs; oracle replays the
    # mark-and-drop in DuckDB over string 3-grams (vanishing-collision
    # equivalence with the engine's gram hashes)
    import duckdb

    rng = np.random.default_rng(7)
    vocab = np.array([f"w{i}" for i in range(40)])
    shared = "alpha beta gamma delta epsilon"
    texts = []
    for i in range(60):
        body = " ".join(rng.choice(vocab, size=rng.integers(3, 25)))
        if i % 4 == 0:
            body = body + " " + shared
        if i % 10 == 0:
            body = shared + " " + body
        texts.append(body)
    texts.append("")  # empty doc passes through
    texts.append("solo")  # < k tokens passes through
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    got = (
        dd.strip_dup_spans(
            ray.data.from_arrow(t).repartition(3), k=3, min_count=2, num_buckets=8
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t.to_pandas())
    want = con.execute(
        r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
          FROM documents
        ),
        posn AS (
          SELECT doc_id, i - 1 AS pos, w[i] AS tok
          FROM toks, unnest(generate_series(1, len(w))) t(i)
        ),
        g3 AS (
          SELECT doc_id, i - 1 AS pos,
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          FROM toks, unnest(generate_series(1, len(w) - 2)) t(i)
          WHERE len(w) >= 3
        ),
        dupg AS (SELECT g FROM g3 GROUP BY g HAVING count(*) >= 2),
        marked AS (SELECT doc_id, pos FROM g3 JOIN dupg USING (g)),
        kept AS (
          SELECT p.doc_id, p.pos, p.tok
          FROM posn p
          WHERE NOT EXISTS (
            SELECT 1 FROM marked m
            WHERE m.doc_id = p.doc_id
              AND p.pos >= m.pos AND p.pos < m.pos + 3
          )
        )
        SELECT t.doc_id,
               COALESCE(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS text
        FROM toks t LEFT JOIN kept k USING (doc_id)
        GROUP BY t.doc_id
        ORDER BY t.doc_id
        """
    ).fetchdf()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()


def test_strip_contaminated_spans_redacts_benchmark_runs():
    bench = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["the quick brown fox jumps over lazy dogs"]),
        }
    )
    docs = pa.table(
        {
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "text": pa.array(
                [
                    # contains a verbatim 5-gram run from the benchmark
                    "intro words the quick brown fox jumps here after",
                    "completely unrelated training document text here",
                    "",  # empty doc passes through
                ]
            ),
        }
    )
    got = (
        dd.strip_contaminated_spans(
            ray.data.from_arrow(docs),
            ray.data.from_arrow(bench),
            k=5,
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # "the quick brown fox jumps" (one 5-gram) redacts tokens 2..6
    assert got["text"].tolist() == [
        "intro words here after",
        "completely unrelated training document text here",
        "",
    ]


def test_strip_contaminated_spans_matches_sql_oracle():
    import duckdb

    rng = np.random.default_rng(17)
    vocab = np.array([f"w{i}" for i in range(30)])
    needle = "alpha beta gamma delta epsilon zeta"
    bench_rows = [needle, "eta theta iota kappa lambda mu"]
    texts = []
    for i in range(50):
        body = " ".join(rng.choice(vocab, size=rng.integers(4, 20)))
        if i % 5 == 0:
            body = body + " " + needle + " " + body
        if i % 7 == 0:
            body = "eta theta iota kappa lambda " + body  # 5 of 6 tokens
        texts.append(body)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    bench = pa.table(
        {
            "doc_id": pa.array(np.arange(len(bench_rows)), pa.int64()),
            "text": pa.array(bench_rows),
        }
    )
    got = (
        dd.strip_contaminated_spans(
            ray.data.from_arrow(docs), ray.data.from_arrow(bench), k=5
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs.to_pandas())
    con.register("benchmark", bench.to_pandas())
    want = con.execute(
        r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
          FROM documents
        ),
        btoks AS (
          SELECT list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
          FROM benchmark
        ),
        bg AS (
          SELECT DISTINCT w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                 || w[i+3] || ' ' || w[i+4] AS g
          FROM btoks, unnest(generate_series(1, len(w) - 4)) t(i)
          WHERE len(w) >= 5
        ),
        g5 AS (
          SELECT doc_id, i - 1 AS pos,
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                 || w[i+3] || ' ' || w[i+4] AS g
          FROM toks, unnest(generate_series(1, len(w) - 4)) t(i)
          WHERE len(w) >= 5
        ),
        marked AS (SELECT doc_id, pos FROM g5 JOIN bg USING (g)),
        posn AS (
          SELECT doc_id, i - 1 AS pos, w[i] AS tok
          FROM toks, unnest(generate_series(1, len(w))) t(i)
        ),
        kept AS (
          SELECT p.doc_id, p.pos, p.tok
          FROM posn p
          WHERE NOT EXISTS (
            SELECT 1 FROM marked m
            WHERE m.doc_id = p.doc_id
              AND p.pos >= m.pos AND p.pos < m.pos + 5
          )
        )
        SELECT t.doc_id,
               COALESCE(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS text
        FROM toks t LEFT JOIN kept k USING (doc_id)
        GROUP BY t.doc_id ORDER BY t.doc_id
        """
    ).fetchdf()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["text"].tolist() == want["text"].tolist()


def test_multimodal_codec_registry():
    """register_codec swaps the stub for a 'real' decoder without
    touching the stage: the injected codec's loader runs once per
    worker process and its decode output flows through DecodeMedia —
    the deployment seam for PIL/ffmpeg (round-5 verdict item 7)."""
    import ray

    from xgeo_ray.functions import multimodal as mm

    calls = {"loads": 0}

    def fake_loader():
        calls["loads"] += 1
        return lambda payload: (1920, 1080, 4)

    mm.register_codec("fake_camera", fake_loader)
    try:
        media = mm.docs_to_media(_docs())
        # driver-side: the loader resolves by name at stage build
        dec = mm.DecodeMedia(codec="fake_camera")(media)
        assert dec.column("width").to_pylist() == [1920] * media.num_rows
        assert dec.column("channels").to_pylist() == [4] * media.num_rows
        # distributed: the pickled loader reaches worker processes
        ds = ray.data.from_arrow(media).map_batches(
            mm.DecodeMedia(codec="fake_camera"),
            batch_format="pyarrow",
            batch_size=8,
        )
        out = ds.to_pandas()
        assert (out["height"] == 1080).all()
        # unknown codec fails fast at stage build, not mid-pipeline
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unknown codec"):
            mm.DecodeMedia(codec="nope")
        # a loader callable works directly too
        direct = mm.DecodeMedia(codec=fake_loader)(media)
        assert direct.column("width").to_pylist()[0] == 1920
    finally:
        mm.CODECS.pop("fake_camera", None)
