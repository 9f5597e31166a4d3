"""Salted hash partitioning (SURVEY.md §4, §7 step 4).

The engine's single shuffle routes change events to the merge partition
that owns their primary key. The partition key is

    part_key = mix(hash64(conv_id), turn_idx % num_salts) % num_partitions

so every primary key (conv_id, turn_idx) maps to exactly ONE partition
(merge stays partition-local), while a hot conversation's turns spread
over up to ``num_salts`` distinct partitions — the salted sub-key skew
split required by the north rule. With num_salts=1 a conversation is
fully co-located.

Hashing is pandas' vectorized siphash (``pd.util.hash_array`` with a fixed
hash_key), deterministic across processes and machines — required so that
delta files written by different workers/epochs agree on ownership.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_HASH_KEY = "xgeo_ray_part_v1"  # 16 bytes, fixed → cross-process determinism

PART_COL = "part_key"


def hash_conv_ids(conv_ids: np.ndarray) -> np.ndarray:
    """Deterministic vectorized uint64 hash of a string array."""
    return pd.util.hash_array(conv_ids, hash_key=_HASH_KEY, categorize=False)


def compute_part_key(
    conv_id: pa.ChunkedArray | pa.Array,
    turn_idx: pa.ChunkedArray | pa.Array,
    num_partitions: int,
    num_salts: int = 1,
) -> np.ndarray:
    conv = np.asarray(conv_id.to_numpy(zero_copy_only=False), dtype=object)
    h = hash_conv_ids(conv)
    if num_salts > 1:
        salt = (turn_idx.to_numpy(zero_copy_only=False).astype(np.uint64)) % np.uint64(
            num_salts
        )
        h = h ^ (salt * np.uint64(0x9E3779B97F4A7C15))
    return (h % np.uint64(num_partitions)).astype(np.int32)


def add_part_key(
    batch: pa.Table, num_partitions: int, num_salts: int = 1
) -> pa.Table:
    """Append the int32 ``part_key`` column to an event batch."""
    pk = compute_part_key(
        batch.column("conv_id"), batch.column("turn_idx"), num_partitions, num_salts
    )
    return batch.append_column(PART_COL, pa.array(pk, pa.int32()))


# ------------------------------------------------------------------
# per-delta key blooms (manifest-embedded; see ingest.lookup)

_BLOOM_MIX = np.uint64(0x9E3779B97F4A7C15)
# Above this many keys, skip the bloom: the blob would bloat every
# manifest (keys x 10 bits, base64) and a file that large amortizes its
# footer read. The payoff case is the long chain of SMALL tail/stream
# deltas between compactions — exactly where lookups pay per-file cost.
# 8192 keys -> <= ~14 KB base64 per partition entry, worst case.
_BLOOM_MAX_KEYS = 8192
_BLOOM_K = 4
_BLOOM_BITS_PER_KEY = 10  # ~1% false-positive at k=4


def _bloom_probes(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two INDEPENDENT probe streams from one 64-bit hash (murmur fmix
    avalanche for the step — probes affine in the raw hash's low bits
    correlate and multiply the false-positive rate)."""
    with np.errstate(over="ignore"):
        x = h ^ (h >> np.uint64(33))
        x = x * np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x = x * np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return h, x | np.uint64(1)


def build_key_bloom(conv: np.ndarray | list) -> str:
    """Base64 bloom filter over a delta file's conv_ids, embedded in the
    manifest PartitionEntry so point lookups prune the delta CHAIN from
    manifest bytes alone (hash partitioning defeats min/max key zone
    maps — every partition's key range spans the alphabet; a bloom is
    the metadata filter that still works). Returns "" for files above
    ``_BLOOM_MAX_KEYS`` distinct keys (big bootstrap/compaction files:
    the cap keeps manifests small, and a file that large is worth its
    footer read anyway). A false positive costs one redundant file
    read; false negatives are impossible for keys present at build
    time (same hash family on both sides)."""
    import base64

    arr = np.asarray(conv, dtype=object)
    if len(arr) == 0 or len(arr) > _BLOOM_MAX_KEYS * 8:
        # rows >> cap: skip before paying the hash pass (distinct keys
        # can't be below the cap by much, and big files skip anyway)
        return ""
    h = np.unique(hash_conv_ids(arr))
    n = len(h)
    if n > _BLOOM_MAX_KEYS:
        return ""
    m = 1 << max(10, int(np.ceil(np.log2(n * _BLOOM_BITS_PER_KEY))))
    mask = np.uint64(m - 1)
    h1, h2 = _bloom_probes(h)
    with np.errstate(over="ignore"):
        bits = np.concatenate(
            [(h1 + np.uint64(i) * h2) & mask for i in range(_BLOOM_K)]
        )
    bitmap = np.zeros(m >> 3, dtype=np.uint8)
    np.bitwise_or.at(
        bitmap,
        (bits >> np.uint64(3)).astype(np.int64),
        np.left_shift(np.uint8(1), (bits & np.uint64(7)).astype(np.uint8)),
    )
    return base64.b64encode(bitmap.tobytes()).decode()


def bloom_may_contain(blob: str, conv_ids) -> np.ndarray:
    """Vectorized membership test: bool per conv_id. An empty blob means
    'no filter' — everything may be present."""
    import base64

    arr = np.asarray(conv_ids, dtype=object)
    if not blob:
        return np.ones(len(arr), dtype=bool)
    bitmap = np.frombuffer(base64.b64decode(blob), dtype=np.uint8)
    m = np.uint64(len(bitmap) << 3)
    mask = m - np.uint64(1)
    h1, h2 = _bloom_probes(hash_conv_ids(arr))
    with np.errstate(over="ignore"):
        ok = np.ones(len(arr), dtype=bool)
        for i in range(_BLOOM_K):
            bits = (h1 + np.uint64(i) * h2) & mask
            ok &= (
                bitmap[(bits >> np.uint64(3)).astype(np.int64)]
                & np.left_shift(
                    np.uint8(1), (bits & np.uint64(7)).astype(np.uint8)
                )
            ) != 0
    return ok
