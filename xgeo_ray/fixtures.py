"""Deterministic synthetic fixtures (FIXTURES.md §§1-4).

Everything here is seeded and wall-clock-free so pytest, the driver, and
bench runs all see identical inputs. Pure pyarrow/numpy — no Ray.

Semantics the generators encode (and the engine must honor):
  * ``I`` and ``U`` are both upserts (last-writer-wins by (ts, seq));
    ``D`` is a tombstone. A ``U``/``D`` on a never-seen key is legal
    (upsert / no-op) — standard CDC changelog semantics.
  * ``seq`` is the global WAL offset. Originals appear in seq order;
    a controlled fraction of events is re-delivered later in the stream
    (same seq, identical payload) to exercise at-least-once dedup.
  * ``ts`` is event time: mostly increasing with seq but locally
    disordered and quantized so (ts) collisions force the (ts, seq)
    tiebreak.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from xgeo_ray.schemas import CHANGE_EVENTS_SCHEMA, TRANSCRIPTS_SCHEMA

SEED = 42
BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds
_ROLES = np.array(["user", "assistant", "tool"])

# Deterministic pseudo-word vocabulary, built once at import.
_CONS = "bcdfghklmnprstvz"
_VOW = "aeiou"
_VOCAB = np.array(
    [
        _CONS[(i * 7) % 16] + _VOW[(i * 3) % 5] + _CONS[(i * 5 + 3) % 16]
        + _VOW[(i * 11 + 1) % 5] + _CONS[(i * 13 + 5) % 16]
        for i in range(512)
    ]
)


def _mix(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit hash of three int arrays (splitmix-style)."""
    h = (
        a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        + b.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
        + c.astype(np.uint64) * np.uint64(0x94D049BB133111EB)
        + np.uint64(SEED)
    )
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def _texts(conv_i: np.ndarray, turn: np.ndarray, version: np.ndarray) -> list[str]:
    """Seeded token soup per (conv, turn, version): 4-15 words, reproducible."""
    h = _mix(conv_i, turn, version)
    n_words = 4 + (h % np.uint64(12)).astype(np.int64)
    max_w = 15
    # word index matrix: rehash per word slot, fully vectorized
    idx = np.empty((len(h), max_w), dtype=np.int64)
    hw = h.copy()
    for w in range(max_w):
        hw = hw * np.uint64(6364136223846793005) + np.uint64(1442695040888963407)
        idx[:, w] = ((hw >> np.uint64(17)) % np.uint64(512)).astype(np.int64)
    words = _VOCAB[idx]
    return [" ".join(words[i, : n_words[i]]) for i in range(len(h))]


def _conv_ids(conv_i: np.ndarray) -> list[str]:
    return [f"conv-{i:06d}" for i in conv_i]


def make_transcripts(n_convs: int = 20, turns_per_conv: int = 10) -> pa.Table:
    """Base lake table (FIXTURES.md §1): contiguous turns per conv, seed=42."""
    conv_i = np.repeat(np.arange(n_convs, dtype=np.int64), turns_per_conv)
    turn = np.tile(np.arange(turns_per_conv, dtype=np.int64), n_convs)
    role = _ROLES[turn % 3]
    h = _mix(conv_i, turn, np.zeros_like(conv_i))
    tool = np.where(role == "tool", np.char.add("tool-", (h % np.uint64(7)).astype("U1")), "")
    ts = BASE_TS_US + conv_i * 10_000_000 + turn * 1_000_000
    return pa.table(
        {
            "conv_id": _conv_ids_vec(conv_i),
            "turn_idx": turn.astype(np.int32),
            "role": role,
            "text": _texts_vec(conv_i, turn, np.zeros_like(conv_i)),
            "tool": tool,
            "ts": ts.astype(np.int64),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


def make_change_events(
    n_events: int,
    n_convs: int = 20,
    turns_per_conv: int = 10,
    dup_fraction: float = 0.02,
    hot_conv_fraction: float = 0.0,
    seed: int = SEED,
) -> pa.Table:
    """Change-event stream (FIXTURES.md §2/§4), in delivery order.

    Keys are drawn from a universe 2x the base table in both dimensions so
    events hit existing rows and insert new ones. ``hot_conv_fraction`` > 0
    routes that share of events to conv 0 (hot-key skew, §4).
    """
    rng = np.random.default_rng(seed)
    conv_i = rng.integers(0, max(1, 2 * n_convs), size=n_events)
    if hot_conv_fraction > 0:
        hot = rng.random(n_events) < hot_conv_fraction
        conv_i[hot] = 0
    # hot conv gets an extended turn range so keys stay plentiful
    turn_hi = np.where(conv_i == 0, max(4 * turns_per_conv, 8), 2 * turns_per_conv)
    turn = rng.integers(0, turn_hi)
    op = rng.choice(np.array(["I", "U", "D"]), p=[0.6, 0.3, 0.1], size=n_events)
    seq = np.arange(n_events, dtype=np.int64)
    # event time: increasing with local disorder + quantization (ts collisions)
    jitter = rng.integers(0, 2_000, size=n_events)
    ts = BASE_TS_US + 100_000_000_000 + ((seq * 500 - jitter) // 250) * 250

    role = _ROLES[(turn + seq) % 3]
    h = _mix(conv_i, turn, seq)
    tool = np.where(role == "tool", np.char.add("tool-", (h % np.uint64(7)).astype("U1")), "")
    import pyarrow.compute as _pc

    is_del = op == "D"
    null_s = pa.scalar(None, pa.string())
    t = pa.table(
        {
            "seq": seq,
            "op": op,
            "conv_id": _conv_ids_vec(conv_i),
            "turn_idx": turn.astype(np.int32),
            "role": pa.array(np.where(is_del, None, role)),
            "text": _pc.if_else(pa.array(is_del), null_s, _texts_vec(conv_i, turn, seq)),
            "tool": pa.array(np.where(is_del, None, tool)),
            "ts": ts.astype(np.int64),
        },
        schema=CHANGE_EVENTS_SCHEMA,
    )
    if dup_fraction <= 0:
        return t
    # re-deliver a sample of events later in the stream (same seq+payload)
    n_dup = int(n_events * dup_fraction)
    dup_idx = np.sort(rng.choice(n_events, size=n_dup, replace=False))
    # each duplicate lands at a position strictly after its original
    insert_at = dup_idx + 1 + rng.integers(0, n_events // 4 + 1, size=n_dup)
    order = np.argsort(
        np.concatenate([seq * 4, np.minimum(insert_at, n_events - 1) * 4 + 1]), kind="stable"
    )
    return pa.concat_tables([t, t.take(dup_idx)]).take(order)


def evolve_events(events: pa.Table) -> pa.Table:
    """Schema-evolution variant (FIXTURES.md §3): adds nullable ``meta``
    (non-null for U ops) and widens ``turn_idx`` to int64."""
    op = events.column("op").to_numpy(zero_copy_only=False)
    seq = events.column("seq").to_numpy()
    meta = pa.array(
        [f"m{s % 97}" if o == "U" else None for o, s in zip(op, seq)], pa.string()
    )
    t = events.set_column(
        events.schema.get_field_index("turn_idx"),
        pa.field("turn_idx", pa.int64()),
        events.column("turn_idx").cast(pa.int64()),
    )
    return t.append_column(pa.field("meta", pa.string()), meta)


def write_segments(
    events: pa.Table,
    out_dir: str,
    n_segments: int = 4,
    evolve_from: int | None = None,
) -> list[str]:
    """Write the stream as WAL segment files ``segment-{k:05d}.parquet``
    (one bounded file per segment, FIXTURES.md §2). ``evolve_from`` applies
    the §3 schema evolution to segments >= that index."""
    os.makedirs(out_dir, exist_ok=True)
    n = events.num_rows
    bounds = [round(i * n / n_segments) for i in range(n_segments + 1)]
    paths = []
    for k in range(n_segments):
        seg = events.slice(bounds[k], bounds[k + 1] - bounds[k])
        if evolve_from is not None and k >= evolve_from:
            seg = evolve_events(seg)
        p = os.path.join(out_dir, f"segment-{k:05d}.parquet")
        # bounded row groups so big segments split into parallel read tasks
        pq.write_table(seg, p, row_group_size=262_144)
        paths.append(p)
    return paths


def naive_final_state(base: pa.Table | None, events: pa.Table) -> pa.Table:
    """Single-process oracle reducer (FIXTURES.md §5a).

    Union base rows (as implicit inserts with seq=-1) with the event stream,
    keep the last writer per (conv_id, turn_idx) ordered by (ts, seq), drop
    tombstones, sort by (conv_id, turn_idx).
    """
    import pandas as pd

    ev = events.to_pandas()
    frames = [ev]
    if base is not None:
        b = base.to_pandas()
        b["seq"] = np.int64(-1)
        b["op"] = "I"
        frames.append(b)
    df = pd.concat(frames, ignore_index=True)
    df = df.drop_duplicates(subset=["conv_id", "turn_idx", "seq"], keep="first")
    df = df.sort_values(["ts", "seq"], kind="stable")
    df = df.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    df = df[df["op"] != "D"].drop(columns=["op", "seq"])
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    out_cols = [c for c in df.columns]
    # column order: transcripts layout first, evolved extras after
    lead = [c for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts") if c in out_cols]
    rest = [c for c in out_cols if c not in lead]
    return pa.Table.from_pandas(df[lead + rest], preserve_index=False)


# ------------------------------------------------------- bench-scale stream

def _texts_vec(conv_i: np.ndarray, turn: np.ndarray, version: np.ndarray) -> pa.Array:
    """Arrow-kernel variant of _texts: per-word-slot dictionary arrays
    (nulls beyond the row's word count) joined by one C++
    binary_join_element_wise call. Identical strings to _texts; used
    everywhere — 10^7-row shards make per-row Python joins the dominant
    generation cost."""
    import pyarrow.compute as pc

    h = _mix(conv_i, turn, version)
    n_words = 4 + (h % np.uint64(12)).astype(np.int64)
    max_w = 15
    vocab = pa.array(_VOCAB)
    cols = []
    hw = h.copy()
    for w in range(max_w):
        hw = hw * np.uint64(6364136223846793005) + np.uint64(1442695040888963407)
        idx = ((hw >> np.uint64(17)) % np.uint64(512)).astype(np.int32)
        d = pa.DictionaryArray.from_arrays(
            pa.array(idx, mask=(w >= n_words)), vocab
        )
        cols.append(d.cast(pa.string()))
    return pc.binary_join_element_wise(*cols, " ", null_handling="skip")


def _conv_ids_vec(conv_i: np.ndarray) -> pa.Array:
    import pyarrow.compute as pc

    padded = pc.utf8_lpad(
        pa.array(conv_i.astype(np.int64)).cast(pa.string()), 6, "0"
    )
    return pc.binary_join_element_wise("conv-", padded, "")


def make_change_events_shard(
    start_seq: int,
    n_events: int,
    n_convs: int,
    turns_per_conv: int,
    dup_fraction: float = 0.02,
    seed: int = SEED,
) -> pa.Table:
    """Counter-based change-event shard: every field derives from ``seq``
    via the splitmix hash, so any seq range can be generated independently
    with bounded memory (the whole-stream generator concatenates >2 GiB
    string columns and overflows Arrow's 32-bit offsets at ~5e7 rows).
    Used for bench-scale streams; tests keep make_change_events."""
    seq = np.arange(start_seq, start_seq + n_events, dtype=np.int64)
    hs = _mix(seq, np.full(n_events, 7, np.int64), np.full(n_events, seed, np.int64))
    conv_i = (hs % np.uint64(2 * n_convs)).astype(np.int64)
    h2 = _mix(conv_i, seq, np.full(n_events, 11, np.int64))
    turn = (h2 % np.uint64(2 * turns_per_conv)).astype(np.int64)
    opsel = (_mix(seq, turn, np.full(n_events, 13, np.int64)) % np.uint64(10)).astype(np.int64)
    op = np.where(opsel < 6, "I", np.where(opsel < 9, "U", "D"))
    jitter = (hs % np.uint64(2000)).astype(np.int64)
    ts = BASE_TS_US + 100_000_000_000 + ((seq * 500 - jitter) // 250) * 250
    role = _ROLES[(turn + seq) % 3]
    h3 = _mix(conv_i, turn, seq)
    tool = np.where(
        role == "tool",
        np.char.add("tool-", (h3 % np.uint64(7)).astype("U1")),
        "",
    )
    import pyarrow.compute as _pc

    is_del = op == "D"
    null_s = pa.scalar(None, pa.string())
    t = pa.table(
        {
            "seq": seq,
            "op": op,
            "conv_id": _conv_ids_vec(conv_i),
            "turn_idx": turn.astype(np.int32),
            "role": pa.array(np.where(is_del, None, role)),
            "text": _pc.if_else(pa.array(is_del), null_s, _texts_vec(conv_i, turn, seq)),
            "tool": pa.array(np.where(is_del, None, tool)),
            "ts": ts.astype(np.int64),
        },
        schema=CHANGE_EVENTS_SCHEMA,
    )
    if dup_fraction <= 0:
        return t
    # re-deliver a deterministic sample (same seq+payload), appended late
    # in the shard — still strictly after the originals
    dup_sel = (_mix(seq, np.full(n_events, 17, np.int64), turn) % np.uint64(1000)) < np.uint64(
        int(dup_fraction * 1000)
    )
    dup = t.filter(pa.array(dup_sel))
    return pa.concat_tables([t, dup])


def write_change_stream_sharded(
    n_events: int,
    out_dir: str,
    n_segments: int,
    n_convs: int,
    turns_per_conv: int,
    dup_fraction: float = 0.02,
    seed: int = SEED,
) -> list[str]:
    """Write an n_events stream as n_segments WAL files, one bounded shard
    at a time (constant memory in n_segments)."""
    os.makedirs(out_dir, exist_ok=True)
    bounds = [round(i * n_events / n_segments) for i in range(n_segments + 1)]
    paths = []
    for k in range(n_segments):
        seg = make_change_events_shard(
            bounds[k], bounds[k + 1] - bounds[k], n_convs, turns_per_conv,
            dup_fraction, seed,
        )
        p = os.path.join(out_dir, f"segment-{k:05d}.parquet")
        pq.write_table(seg, p, row_group_size=262_144)
        paths.append(p)
    return paths
