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
