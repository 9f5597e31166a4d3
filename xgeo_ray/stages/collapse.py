"""Last-writer-wins collapse kernels — the heart of change-apply.

The reference's only transform is a stateless per-record geometry
normalizer (/root/reference/io/shp.go:48-72); our per-record semantics is
richer: collapse a set of change events / row versions to the latest
version per primary key, ordered by (ts, seq), honoring tombstones.

All kernels are vectorized: one Arrow sort + numpy boundary masks; no
Python loop over rows. Used in three places:
  1. within-batch pre-collapse before the shuffle (shrinks shuffle volume),
  2. per-partition collapse when writing an epoch delta,
  3. merge-on-read of base + deltas at snapshot/compaction time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from xgeo_ray.schemas import unify, cast_to


def _key_codes(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Integer codes for (conv_id, turn_idx) enabling cheap numpy compares."""
    conv = t.column("conv_id")
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    codes = conv.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    turn = t.column("turn_idx").to_numpy(zero_copy_only=False)
    return codes, turn


def lww_collapse(t: pa.Table, drop_tombstones: bool) -> pa.Table:
    """Keep the last writer per (conv_id, turn_idx), ordered by (ts, seq).

    Exact duplicates (re-delivered seq) collapse for free: they sort
    adjacently and only the last survives. With ``drop_tombstones`` the
    surviving 'D' rows are removed (final-state read); without, they are
    kept as tombstone rows (epoch delta must remember deletes).
    """
    if t.num_rows == 0:
        return t
    t = t.sort_by(
        [
            ("conv_id", "ascending"),
            ("turn_idx", "ascending"),
            ("ts", "ascending"),
            ("seq", "ascending"),
        ]
    )
    codes, turn = _key_codes(t)
    last = np.empty(len(codes), dtype=bool)
    last[-1] = True
    np.not_equal(codes[1:], codes[:-1], out=last[:-1])
    last[:-1] |= turn[1:] != turn[:-1]
    if drop_tombstones:
        # arrow kernel, not numpy-object compare (that's a Python loop)
        not_d = pc.fill_null(pc.not_equal(t.column("op"), "D"), True)
        last &= not_d.to_numpy(zero_copy_only=False)
    return t.filter(pa.array(last))


def count_unique_keys_and_seqs(t: pa.Table) -> tuple[int, int]:
    """(distinct primary keys, distinct (key, seq) triples) of a SORTED-or-not
    event table — used for lineage metrics (dup-dropped counting)."""
    if t.num_rows == 0:
        return 0, 0
    codes, turn = _key_codes(t)
    seq = t.column("seq").to_numpy(zero_copy_only=False)
    order = np.lexsort((seq, turn, codes))
    c, tu, s = codes[order], turn[order], seq[order]
    new_key = np.ones(len(c), dtype=bool)
    new_key[1:] = (c[1:] != c[:-1]) | (tu[1:] != tu[:-1])
    new_trip = new_key.copy()
    new_trip[1:] |= s[1:] != s[:-1]
    return int(new_key.sum()), int(new_trip.sum())


def merge_versions(tables: list[pa.Table], drop_tombstones: bool = True) -> pa.Table:
    """Merge row-version tables (base + epoch deltas) under LWW.

    Schemas are unified first (schema evolution: added columns null-fill,
    widened ints cast — see xgeo_ray.schemas.unify), then a single
    collapse picks the winner per key.
    """
    tables = [t for t in tables if t is not None and t.num_rows > 0]
    if not tables:
        return pa.table({})
    target = unify(*[t.schema for t in tables])
    t = pa.concat_tables([cast_to(t, target) for t in tables])
    return lww_collapse(t, drop_tombstones=drop_tombstones)
