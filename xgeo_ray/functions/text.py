"""Text-analysis operators for training-data pipelines.

The reference applies per-record scalar kernels inside the stream (its
lock-tier geometry functions, e.g. vendor orb geo/area.go:12 — see
SURVEY.md §2.8); the transcript/document counterparts are these text
kernels. All are vectorized (pyarrow.compute / numpy); the stateful ones
(compiled regexes, stopword tables) are callable classes so actor pools
pay setup once per actor, not per batch.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# stopword tables for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "por", "para"},
}


def token_count_table(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count per row (exactly Python's str.split():
    runs of whitespace, no empty tokens), as int64 column ``n_tokens``.

    Fully vectorized even when edge-empties exist: per-row count = list
    length minus per-row empty count, the latter via a cumulative sum
    over the flattened values indexed at the list offsets (the same
    cumsum-segment trick LangId and chunk_documents use)."""
    toks = pc.utf8_split_whitespace(batch.column(text_col))
    lens = pc.list_value_length(toks).cast(pa.int64())
    la = (
        toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    )
    # split_whitespace emits empty strings at the edges of padded text;
    # subtract them per row without any per-row Python
    is_empty = pc.equal(la.values, "").to_numpy(zero_copy_only=False).astype(np.int64)
    if is_empty.any():
        cum = np.concatenate([[0], np.cumsum(is_empty)])
        offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        per_row_empty = cum[offs[1:]] - cum[offs[:-1]]
        lens = pa.array(
            lens.to_numpy(zero_copy_only=False) - per_row_empty, pa.int64()
        )
    return batch.append_column("n_tokens", lens)


class QualityScore:
    """Per-document quality counters (exact integers, oracle-friendly):
    characters, tokens, punctuation, uppercase, digits. Counting runs on
    Arrow's vectorized RE2 kernel (``pc.count_substring_regex`` — the
    same engine the PII redactor relies on for DuckDB oracle parity),
    not pandas ``str.count``, whose per-element Python regex loop was
    this stage's one non-vectorized kernel."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.punct = r"[!-/:-@\[-`{-~]"
        self.upper = r"[A-Z]"
        self.digit = r"[0-9]"

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        n_chars = pc.utf8_length(text).cast(pa.int64())
        batch = token_count_table(batch, self.text_col)
        batch = batch.append_column("n_chars_calc", n_chars)
        for col, pat in (
            ("n_punct", self.punct),
            ("n_upper", self.upper),
            ("n_digit", self.digit),
        ):
            batch = batch.append_column(
                col,
                pc.count_substring_regex(text, pat).cast(pa.int64()),
            )
        return batch


class LangId:
    """Stopword-count language heuristic, fully vectorized: lower + split
    via Arrow kernels, one ``pc.is_in`` per language over the flattened
    token array, per-row scores via cumulative-sum segment differences,
    argmax with deterministic ties (first language in sorted order wins;
    all-zero scores -> "und"). Instance-passed task stage — setup is four
    tiny value sets, an actor pool would only add spin-up latency."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = sorted(_STOPWORDS)
        self.vocab = {
            lang: pa.array(sorted(_STOPWORDS[lang])) for lang in self.langs
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(
            pc.utf8_lower(batch.column(self.text_col))
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        n = batch.num_rows
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            hit = pc.is_in(flat, value_set=self.vocab[lang])
            cs = np.concatenate(
                [[0], np.cumsum(hit.to_numpy(zero_copy_only=False).astype(np.int64))]
            )
            scores[:, j] = cs[offs[1:]] - cs[offs[:-1]]
        best = scores.argmax(axis=1)  # ties -> first (sorted lang order)
        pred = np.asarray(self.langs, dtype=object)[best]
        pred[scores.max(axis=1) == 0] = "und"
        return batch.append_column("lang_pred", pa.array(pred, pa.string()))


def normalize_text(
    batch: pa.Table,
    text_col: str = "text",
    form: str = "NFC",
    casefold: bool = False,
    out_col: str = "text_norm",
) -> pa.Table:
    """Unicode normalization (+ optional lowercase) — the scalar-library
    breadth the reference's lock tier implies (SURVEY §2.8), text-domain
    counterpart of its geometry normalizers.

    Uses CPython's unicodedata (one C call per string): this pyarrow's
    utf8_normalize does NOT compose combining sequences under NFC
    (e + U+0301 stays decomposed), diverging from UAX#15 and from
    DuckDB's nfc_normalize — so Arrow's kernel would silently break
    oracle parity on real Unicode."""
    import unicodedata

    texts = batch.column(text_col).to_pylist()
    normed = [
        None if t is None else unicodedata.normalize(form, t) for t in texts
    ]
    col: pa.Array | pa.ChunkedArray = pa.array(normed, pa.string())
    if casefold:
        col = pc.utf8_lower(col)
    return batch.append_column(out_col, col)


# RE2 syntax on BOTH sides: Arrow's replace_substring_regex and DuckDB's
# regexp_replace are RE2, so the oracle replays these byte-for-byte.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # SSN before phone: the looser phone run would swallow 123-45-6789
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


class PiiRedactor:
    """Vectorized PII redaction: per pattern, one Arrow
    count_substring_regex (lineage metric) + one replace_substring_regex
    over the whole column. Order matters (SSN/phone before bare number
    runs would); patterns apply in PII_PATTERNS order on both the engine
    and the SQL oracle. Instance-passed task stage — setup is a pattern
    list, no actor pool needed."""

    def __init__(self, text_col: str = "text", patterns=None):
        self.text_col = text_col
        self.patterns = patterns or PII_PATTERNS

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        counts_total = None
        for name, pat, token in self.patterns:
            n = pc.count_substring_regex(col, pattern=pat).cast(pa.int64())
            counts_total = n if counts_total is None else pc.add(counts_total, n)
            col = pc.replace_substring_regex(col, pattern=pat, replacement=token)
        batch = batch.append_column("text_redacted", col)
        return batch.append_column("n_redactions", counts_total)


def chunk_documents(
    batch: pa.Table,
    tokens_per_chunk: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Split documents into fixed-token sliding chunks (the training-data
    windowing step): chunk k of a doc covers tokens
    [k*step, k*step + tokens_per_chunk) with step = tokens_per_chunk -
    overlap; the last chunk may be short; empty docs yield no chunks.
    Chunk text is the space-join of its tokens (whitespace-normalizing,
    like the SQL oracle's array_to_string).

    Row-expanding map_batches stage, fully vectorized: one whitespace
    split, one flat index gather (arange-concat via cumsum) duplicating
    overlapped tokens, one ListArray rebuild, one binary_join — no
    per-document Python."""
    if overlap >= tokens_per_chunk:
        raise ValueError("overlap must be < tokens_per_chunk")
    step = tokens_per_chunk - overlap
    toks = pc.utf8_split_whitespace(batch.column(text_col))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    nonempty = pc.not_equal(flat, "")
    flat_clean = flat.filter(nonempty)
    # per-doc clean token counts via cumsum segment differences
    lens_raw = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    raw_offs = np.concatenate([[0], np.cumsum(lens_raw)]).astype(np.int64)
    cs = np.concatenate(
        [[0], np.cumsum(nonempty.to_numpy(zero_copy_only=False).astype(np.int64))]
    )
    n_tok = cs[raw_offs[1:]] - cs[raw_offs[:-1]]
    doc_offs = np.concatenate([[0], np.cumsum(n_tok)]).astype(np.int64)
    n_chunks = np.where(n_tok > 0, (n_tok + step - 1) // step, 0).astype(np.int64)
    total_chunks = int(n_chunks.sum())
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    if total_chunks == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    doc_of_chunk = np.repeat(np.arange(len(n_tok)), n_chunks)
    chunk_idx = np.arange(total_chunks) - np.repeat(
        np.concatenate([[0], np.cumsum(n_chunks)[:-1]]), n_chunks
    )
    starts = chunk_idx * step
    ends = np.minimum(starts + tokens_per_chunk, n_tok[doc_of_chunk])
    clens = ends - starts
    # arange-concat: flat token indices of every chunk, overlaps duplicated
    out_offs = np.concatenate([[0], np.cumsum(clens)]).astype(np.int64)
    idx = np.arange(out_offs[-1]) - np.repeat(out_offs[:-1], clens)
    idx = idx + np.repeat(doc_offs[doc_of_chunk] + starts, clens)
    taken = flat_clean.take(pa.array(idx, pa.int64()))
    chunks_list = pa.ListArray.from_arrays(pa.array(out_offs, pa.int32()), taken)
    text = pc.binary_join(chunks_list, " ")
    return pa.table(
        {
            id_col: pa.array(ids[doc_of_chunk].astype(np.int64), pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "chunk_text": text,
            "n_tokens": pa.array(clens, pa.int64()),
        }
    )


def fingerprint64(texts: np.ndarray, seed: int = 1315423911) -> np.ndarray:
    """Deterministic 64-bit document fingerprint: min of rolling Karp-
    Rabin hashes over 8-byte windows (winnowing-style content signature).
    Vectorized per document over its byte array."""
    out = np.empty(len(texts), dtype=np.uint64)
    B = np.uint64(1000003)
    with np.errstate(over="ignore"):  # uint64 wraparound IS the hash semantics
        for i, t in enumerate(texts):
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            if len(b) < 8:
                h = np.uint64(seed)
                for x in b:
                    h = h * B + x
                out[i] = h
                continue
            # rolling hash via cumulative powers: h[j] = sum b[j+k]*B^(7-k)
            w = np.lib.stride_tricks.sliding_window_view(b, 8)
            powers = B ** np.arange(7, -1, -1, dtype=np.uint64)
            hashes = (w * powers).sum(axis=1)
            out[i] = hashes.min()
    return out


def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_numpy(zero_copy_only=False)
    fp = fingerprint64(np.asarray(texts, dtype=object))
    return batch.append_column("fingerprint", pa.array(fp.view(np.int64), pa.int64()))


# ------------------------------------------------------- sequence packing


def pack_sequences(
    ds,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
):
    """Fixed-length training-sequence packing (the concatenate-and-chunk
    layout LLM pretraining uses): conceptually, concatenate all document
    tokens in ``id_col`` order and cut the stream into sequences of
    exactly ``seq_len`` tokens; emit the doc->sequence span map — one
    row per (doc, sequence) overlap with the offset inside the sequence
    and the token count it contributes. Zero-token docs contribute no
    rows; a long doc spans several sequences.

    Scale shape — hierarchical distributed prefix sum, no global sort
    of the data: (1) token counts per doc are computed in the stream
    (the vectorized ``token_count_table`` kernel) and ONLY the
    (id, n_tokens) pairs survive — text never leaves its read task;
    (2) docs are range-bucketed on id (monotone ``id * K // (max+1)``),
    per-bucket token totals are reduced distributed and only K scalars
    reach the driver, whose exclusive prefix over them is broadcast
    back; (3) each bucket independently sorts its own (small) id set,
    adds its base offset, and emits span rows fully vectorized
    (repeat + segment-local arange). Driver state is O(num_buckets),
    worker state is O(docs-per-bucket) ids+counts — never text.

    Counterpart of the reference's stream-order-preserving record
    pipeline (/root/reference/cmd/xgeo/main.go:36-55) for the training-
    export case where a GLOBAL deterministic token order is the output
    contract.
    """
    import ray as _ray  # noqa: F401  (Dataset type only)

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")

    counts = ds.map_batches(
        lambda b: token_count_table(b.select([id_col, text_col]), text_col)
        .select([id_col, "n_tokens"]),
        batch_format="pyarrow",
    ).materialize()

    mx = counts.max(id_col)
    if mx is None:  # empty input
        return counts.map_batches(
            lambda b: pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                    "off_in_seq": pa.array([], pa.int64()),
                    "n_tok": pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    span = (int(mx) + num_buckets) // num_buckets  # ceil((mx+1)/K), monotone

    _B = "__pack_bucket"

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(_B, pa.array(ids // span, pa.int64()))

    bucketed = counts.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    # per-bucket token totals: distributed partial sums, K rows per block,
    # O(num_buckets) final reduce on the driver
    per_block = bucketed.map_batches(
        lambda b: b.select([_B, "n_tokens"])
        .group_by(_B)
        .aggregate([("n_tokens", "sum")]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    totals = np.zeros(num_buckets + 1, dtype=np.int64)
    agg = per_block.groupby(_B)["n_tokens_sum"].sum()
    totals[np.asarray(agg.index, dtype=np.int64)] = agg.to_numpy(np.int64)
    base = np.concatenate([[0], np.cumsum(totals)])[: num_buckets + 1]

    L = np.int64(seq_len)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bkt = int(g[_B].iloc[0])
        g = g.sort_values(id_col, kind="stable")
        ids = g[id_col].to_numpy(np.int64)
        n = g["n_tokens"].to_numpy(np.int64)
        st = base[bkt] + np.cumsum(n) - n
        keep = n > 0
        ids, n, st = ids[keep], n[keep], st[keep]
        if not len(ids):
            return pd.DataFrame(
                {
                    id_col: np.empty(0, np.int64),
                    "seq_id": np.empty(0, np.int64),
                    "off_in_seq": np.empty(0, np.int64),
                    "n_tok": np.empty(0, np.int64),
                }
            )
        first = st // L
        reps = (st + n - 1) // L - first + 1
        d = np.repeat(np.arange(len(ids)), reps)
        within = np.arange(reps.sum()) - np.repeat(np.cumsum(reps) - reps, reps)
        seq = first[d] + within
        seq_start = seq * L
        lo = np.maximum(seq_start, st[d])
        hi = np.minimum(seq_start + L, (st + n)[d])
        return pd.DataFrame(
            {
                id_col: ids[d],
                "seq_id": seq,
                "off_in_seq": lo - seq_start,
                "n_tok": hi - lo,
            }
        )

    return bucketed.groupby(_B).map_groups(per_bucket, batch_format="pandas")


# --------------------------------------------- corpus vocabulary / quality


def term_frequencies(ds, text_col: str = "text", num_buckets: int = 64):
    """Exact corpus-wide term frequencies (vocabulary building): one
    (token, n) row per distinct whitespace token.

    Scale shape: tokens are counted WITHIN each batch first
    (``value_counts`` — the classic combiner), so the shuffle moves one
    row per distinct token per block, not one per occurrence; the
    merge is the bucketed vectorized ``partial_group_agg`` finalize.
    Compose with ``relational.top_k`` for a bounded head (the
    ``top_terms`` query)."""
    from xgeo_ray.functions.relational import partial_group_agg

    def explode_count(b: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(b.column(text_col))
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        vals = la.values
        vals = vals.filter(pc.not_equal(vals, ""))
        vc = vals.value_counts()
        return pa.table(
            {
                "token": vc.field("values"),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    exploded = ds.map_batches(
        explode_count, batch_format="pyarrow", zero_copy_batch=True
    )
    return partial_group_agg(exploded, ["token"], [("n", "sum", "n")], num_buckets)


def doc_term_stats(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Per-document term frequencies JOINED with corpus document
    frequencies — the exact integer inputs of TF-IDF, left float-free
    so rankings replay bit-for-bit in SQL: one row per (doc, distinct
    token) carrying ``tf`` (occurrences in the doc) and ``df`` (number
    of docs containing the token). Compose with
    ``relational.grouped_top_k(keys=[doc], sort=[tf DESC, df ASC,
    token ASC])`` for per-doc distinctive terms (the ``distinctive_
    terms`` query) — the (tf, df, token) tiebreak is a total order, so
    no float idf is ever needed for a deterministic ranking.

    Scale shape: tf is counted INSIDE each batch (one Arrow hash-agg
    over the exploded tokens — docs never span batches, so in-batch
    counts are final; occurrences never cross a shuffle); df is one
    ``partial_group_agg`` over the (doc, token) rows; the tf×df merge
    is the bucketed cogroup ``hash_join`` keyed on token."""
    from xgeo_ray.functions.relational import hash_join, partial_group_agg

    def explode_tf(b: pa.Table) -> pa.Table:
        toks = pc.utf8_split_whitespace(b.column(text_col))
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        doc_of_tok = np.repeat(ids, np.diff(offs))
        vals = la.values
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        pairs = pa.table(
            {
                id_col: pa.array(doc_of_tok[keep]),
                "token": vals.filter(pa.array(keep)),
            }
        )
        tf = pairs.group_by([id_col, "token"]).aggregate([([], "count_all")])
        return tf.rename_columns([id_col, "token", "tf"]).set_column(
            2, "tf", tf.column("count_all").cast(pa.int64())
        )

    # materialize: dt feeds BOTH the df aggregation and the join's left
    # side — without pinning the blocks, the lazy tokenize+explode pass
    # (the dominant cost) would execute twice
    dt = ds.map_batches(
        explode_tf, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    df = partial_group_agg(
        dt.select_columns(["token"]).map_batches(
            lambda b: b.append_column(
                "df", pa.array(np.ones(b.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        ["token"],
        [("df", "sum", "df")],
        num_buckets,
    )
    return hash_join(dt, df, on="token", num_partitions=num_buckets)


def repetition_stats(
    ds, text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Gopher-style repetition counters per document: total and DISTINCT
    word-2-gram counts (their ratio is the duplicate-2-gram fraction
    quality filters threshold on). Exact integers, oracle-friendly.

    Vectorized across the whole batch: token hashes once over the
    flattened token array, adjacent-pair mixing for 2-gram hashes with
    cross-document boundaries masked out, and per-doc distinct counts
    from ONE lexsort over (doc, hash) — no per-document Python. Distinct
    HASHES stand in for distinct 2-gram strings (same vanishing-
    collision equivalence the similarity-join oracles rely on).
    Documents with < 2 tokens report (0, 0)."""
    from xgeo_ray.functions.dedup import hash_tokens

    _MIXC = np.uint64(0x9E3779B97F4A7C15)

    def per_batch(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.utf8_split_whitespace(b.column(text_col))
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = la.values.to_numpy(zero_copy_only=False)
        nonempty = np.asarray(vals, dtype=object) != ""
        th_all = hash_tokens(np.asarray(vals, dtype=object)[nonempty])
        # per-row token counts after dropping edge-empties
        cum = np.concatenate([[0], np.cumsum(nonempty.astype(np.int64))])
        row_tok = cum[offs[1:]] - cum[offs[:-1]]
        n2 = np.maximum(row_tok - 1, 0)
        if th_all.size >= 2:
            with np.errstate(over="ignore"):
                pair = (th_all[:-1] * _MIXC) ^ th_all[1:]
        else:
            pair = np.empty(0, dtype=np.uint64)
        # mask out pairs that straddle a document boundary
        doc_of = np.repeat(np.arange(len(ids)), row_tok)
        valid = doc_of[:-1] == doc_of[1:] if th_all.size >= 2 else np.empty(0, bool)
        pair = pair[valid]
        pdoc = doc_of[:-1][valid] if th_all.size >= 2 else np.empty(0, np.int64)
        # distinct per doc: one lexsort, boundary diff
        nd = np.zeros(len(ids), dtype=np.int64)
        if pair.size:
            order = np.lexsort((pair, pdoc))
            sp, sd = pair[order], pdoc[order]
            new = np.ones(len(sp), dtype=bool)
            new[1:] = (sd[1:] != sd[:-1]) | (sp[1:] != sp[:-1])
            np.add.at(nd, sd[new], 1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_2grams": pa.array(n2, pa.int64()),
                "n_distinct_2grams": pa.array(nd, pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")
