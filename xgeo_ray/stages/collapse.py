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


def collapse_with_metrics(
    t: pa.Table, drop_tombstones: bool = False, ts_watermark_us: int | None = None
) -> tuple[pa.Table, int, int, int]:
    """LWW collapse + lineage counts off ONE sort.

    Returns (collapsed, n_distinct_keys, n_distinct_(key,seq)_triples,
    n_late). Replaces the separate count_unique_keys_and_seqs (numpy
    lexsort) + lww_collapse (arrow sort) pair in the apply hot path —
    the sort is ~half the per-partition cost, so doing it once matters.

    ``n_late`` (0 when ``ts_watermark_us`` is None) counts DISTINCT
    (key, seq) events with ts below the watermark — post-dedup, matching
    the manifest's 'applied events' semantics: redelivered copies of one
    late event must not inflate the lateness signal operators size
    allowed_lateness_us against."""
    if t.num_rows == 0:
        return t, 0, 0, 0
    t = t.sort_by(
        [
            ("conv_id", "ascending"),
            ("turn_idx", "ascending"),
            ("ts", "ascending"),
            ("seq", "ascending"),
        ]
    )
    codes, turn = _key_codes(t)
    seq = t.column("seq").to_numpy(zero_copy_only=False)
    key_change = (codes[1:] != codes[:-1]) | (turn[1:] != turn[:-1])
    n_keys = int(key_change.sum()) + 1
    # re-delivered duplicates carry identical (ts, seq) → sorted adjacent
    trip_start = np.empty(len(codes), dtype=bool)
    trip_start[0] = True
    trip_start[1:] = key_change | (seq[1:] != seq[:-1])
    n_trips = int(trip_start.sum())
    late = 0
    if ts_watermark_us is not None:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        late = int(np.count_nonzero(trip_start & (ts < ts_watermark_us)))
    last = np.empty(len(codes), dtype=bool)
    last[-1] = True
    last[:-1] = key_change
    if drop_tombstones:
        not_d = pc.fill_null(pc.not_equal(t.column("op"), "D"), True)
        last &= not_d.to_numpy(zero_copy_only=False)
    return t.filter(pa.array(last)), n_keys, n_trips, late


def history_dedup(
    t: pa.Table, ts_watermark_us: int | None = None
) -> tuple[pa.Table, int, int, int]:
    """Full-history delta form (``history="full"`` tables): drop ONLY
    redelivered exact duplicates (same (key, seq); seq=-1 out-of-band
    rows exempt, as in additive_collapse) and keep EVERY distinct
    version, sorted by (key, ts, seq). Returns (deduped, n_keys,
    n_trips, late) with the same metric semantics as
    collapse_with_metrics — ``deduped.num_rows == n_trips``.

    This is what makes event-time travel exact to the EVENT instead of
    the epoch: the delta retains each key's intermediate versions, so
    ``snapshot(as_of_ts_us=T)``'s pre-merge ts filter sees them.

    The dedup runs under its OWN (key, seq) lexsort, not the (key, ts,
    seq) output order: a redelivered event whose ts was altered in
    flight would not be adjacent there and would survive as a phantom
    version (the same hardening additive_collapse got in round 2)."""
    if t.num_rows == 0:
        return t, 0, 0, 0
    # pass 1 — dedup on (key, seq) regardless of ts
    codes, turn = _key_codes(t)
    seq = t.column("seq").to_numpy(zero_copy_only=False)
    order = np.lexsort((seq, turn, codes))
    c, tu, s = codes[order], turn[order], seq[order]
    fresh_sorted = np.ones(len(c), dtype=bool)
    fresh_sorted[1:] = (c[1:] != c[:-1]) | (tu[1:] != tu[:-1]) | (s[1:] != s[:-1])
    fresh_sorted |= s == -1
    if not fresh_sorted.all():
        keep = np.zeros(len(c), dtype=bool)
        keep[order] = fresh_sorted
        t = t.filter(pa.array(keep))
    # pass 2 — (key, ts, seq) output order + metrics over distinct rows
    t = t.sort_by(
        [
            ("conv_id", "ascending"),
            ("turn_idx", "ascending"),
            ("ts", "ascending"),
            ("seq", "ascending"),
        ]
    )
    codes, turn = _key_codes(t)
    key_change = (codes[1:] != codes[:-1]) | (turn[1:] != turn[:-1])
    n_keys = (int(key_change.sum()) + 1) if len(codes) else 0
    n_trips = t.num_rows
    late = 0
    if ts_watermark_us is not None:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        late = int(np.count_nonzero(ts < ts_watermark_us))
    return t, n_keys, n_trips, late


def coalesce_collapse(t: pa.Table, drop_tombstones: bool) -> pa.Table:
    """PARTIAL-UPDATE (patch) merge policy with CDC op semantics: per
    primary key in WAL order, ``op='U'`` events are PATCHES (each data
    column takes its last non-null value; null means "unchanged"),
    while ``op='I'`` is a FULL-ROW IMAGE (insert/replace: its nulls
    mean null — it RESETS everything before it) and ``op='D'`` resets
    to absent — exactly the create/update/delete envelope
    Debezium-style sources emit. Only columns set at-or-after the
    key's last reset survive, so a re-inserted key never leaks
    pre-delete values. ``ts``/``seq`` take the last writer's values;
    the output ``op`` is 'D' if the last writer deleted, 'I' if any
    reset happened in the collapsed span (the row is then a complete
    image — what makes per-epoch collapse compose: a delete +
    re-insert inside one epoch must reset PRIOR epochs' patches when
    merged later), else 'U' (the row is still a partial patch over
    earlier state).

    Ordering is by ``seq`` ALONE (the WAL/log offset), not (ts, seq):
    that is what makes per-epoch collapse associative with merge-on-read
    — epochs are seq-disjoint under the watermarks, so a collapsed epoch
    row (stamped with its last writer's seq, carrying last-non-null per
    column up to that seq) merges exactly with later epochs' rows.
    Under (ts, seq) a late-arriving row could interleave INSIDE an
    already-collapsed epoch's range where per-column provenance is
    gone. Consequences, documented as the policy's contract: per-key
    updates apply in log order (what a binlog/WAL guarantees), and
    out-of-band correction batches (seq=-1) sort EARLIEST — they cannot
    patch over streamed values. Exact duplicates (redelivered seqs)
    are idempotent here (same seq, same values), so no dedup pass is
    needed. NOT precombinable: two pre-shuffle batches may interleave
    seqs for one key, and collapsed rows lose per-column provenance.

    Vectorized: one (key, seq) lexsort; per column one reduceat of
    last-valid positions per key segment; no Python loop over rows."""
    if t.num_rows == 0:
        return t
    codes, turn = _key_codes(t)
    seq = t.column("seq").to_numpy(zero_copy_only=False)
    order = np.lexsort((seq, turn, codes))
    t = t.take(pa.array(order))
    codes, turn = codes[order], turn[order]
    n = len(codes)
    starts = np.flatnonzero(
        np.concatenate(
            [[True], (codes[1:] != codes[:-1]) | (turn[1:] != turn[:-1])]
        )
    )
    seg_id = np.cumsum(
        np.concatenate([[False], (codes[1:] != codes[:-1]) | (turn[1:] != turn[:-1])])
    )
    last = np.append(starts[1:], n) - 1
    idx = np.arange(n, dtype=np.int64)
    op_np = t.column("op").combine_chunks()
    is_d = pc.fill_null(pc.equal(op_np, "D"), False).to_numpy(
        zero_copy_only=False
    )
    is_i = pc.fill_null(pc.equal(op_np, "I"), False).to_numpy(
        zero_copy_only=False
    )
    # reset boundary on a doubled axis: a delete at idx excludes idx
    # itself (2*idx), an insert includes itself (2*idx - 1, the full
    # image's own columns count). The no-reset sentinel must be -2: an
    # insert at segment position 0 has boundary -1, and a -1 sentinel
    # would mis-stamp that row 'U' (a patch) instead of 'I' (an image),
    # letting earlier epochs' values leak through a merge.
    bound = np.where(is_d, 2 * idx, np.where(is_i, 2 * idx - 1, -2))
    last_reset = np.maximum.reduceat(bound, starts)
    after_reset = (2 * idx) > last_reset[seg_id]
    out = t.take(pa.array(last))  # last writer: key cols + ts/seq
    # output op: 'D' if the last writer deleted; 'I' if a reset exists
    # in the span (the row is a full image); else 'U' (still a patch)
    last_is_d = is_d[last]
    has_reset = last_reset > -2
    out_op = np.where(last_is_d, "D", np.where(has_reset, "I", "U"))
    out = out.set_column(
        out.schema.get_field_index("op"), "op", pa.array(out_op, pa.string())
    )
    skip = {"conv_id", "turn_idx", "ts", "seq", "op"}
    for i, f in enumerate(t.schema):
        if f.name in skip:
            continue
        col = t.column(f.name)
        valid = pc.is_valid(col.combine_chunks()).to_numpy(
            zero_copy_only=False
        )
        pos = np.where(valid & after_reset, idx, -1)
        src = np.maximum.reduceat(pos, starts)  # last non-null idx / -1
        gather = pa.array(
            np.maximum(src, 0).astype(np.int64), mask=src < 0
        )
        out = out.set_column(i, f.name, col.take(gather))
    if drop_tombstones:
        not_d = pc.fill_null(pc.not_equal(out.column("op"), "D"), True)
        out = out.filter(not_d)
    return out


def maybe_precollapse(t: pa.Table, threshold: float = 0.9) -> pa.Table:
    """Pre-shuffle collapse, only when it pays: an Arrow hash-aggregate
    counts distinct keys in O(n) (no sort); if nearly every row is a
    distinct key the batch passes through untouched and the
    authoritative LWW happens at the owner partition. Under dup storms /
    hot keys the collapse still shrinks the shuffle."""
    if t.num_rows == 0:
        return t
    n_groups = (
        t.select(["conv_id", "turn_idx"])
        .group_by(["conv_id", "turn_idx"])
        .aggregate([])
        .num_rows
    )
    if n_groups >= threshold * t.num_rows:
        return t
    return lww_collapse(t, drop_tombstones=False)


def count_unique_keys_and_seqs(
    t: pa.Table, ts_watermark_us: int | None = None
) -> tuple[int, int, int]:
    """(distinct primary keys, distinct (key, seq) triples, late count)
    of a SORTED-or-not event table — used for lineage metrics
    (dup-dropped counting). ``late`` counts distinct triples with ts
    below the event-time watermark (0 when None) — post-dedup, same
    semantics as collapse_with_metrics."""
    if t.num_rows == 0:
        return 0, 0, 0
    codes, turn = _key_codes(t)
    seq = t.column("seq").to_numpy(zero_copy_only=False)
    order = np.lexsort((seq, turn, codes))
    c, tu, s = codes[order], turn[order], seq[order]
    new_key = np.ones(len(c), dtype=bool)
    new_key[1:] = (c[1:] != c[:-1]) | (tu[1:] != tu[:-1])
    new_trip = new_key.copy()
    new_trip[1:] |= s[1:] != s[:-1]
    late = 0
    if ts_watermark_us is not None:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        late = int(np.count_nonzero(new_trip & (ts[order] < ts_watermark_us)))
    return int(new_key.sum()), int(new_trip.sum()), late


def additive_collapse(t: pa.Table, drop_tombstones: bool) -> pa.Table:
    """Additive merge policy: per primary key, NUMERIC data columns (not
    ts/seq/turn_idx) accumulate by SUM; non-numeric columns and ts/seq
    take the last writer's value by (ts, seq); a key whose last writer is
    a tombstone drops (with ``drop_tombstones``) or keeps the tombstone
    row with the accumulated sums (epoch-delta form).

    Exact duplicates — redelivered (conv_id, turn_idx, seq) pairs — are
    removed BEFORE summing, so at-least-once delivery cannot double
    count. The dedup is on (key, seq) adjacency under its OWN (key, seq)
    sort, not on the (key, ts, seq) merge order: a redelivered event
    whose ts was altered in flight would not be adjacent to its original
    there and would double-count (round-2 ADVICE). NOT pre-combinable
    across batches: a cross-batch duplicate would evade the dedup, so
    the pre-shuffle collapse is skipped for this policy (the owner
    partition sees the epoch's full key history). Associativity across
    EPOCHS holds because seq watermarks make epochs disjoint: a sum of
    epoch sums is the total sum.
    """
    if t.num_rows == 0:
        return t
    # pass 1 — dedup on (key, seq) regardless of ts. seq=-1 rows
    # (bootstrap/correction out-of-band convention) are exempt: two
    # correction batches to one key both carry seq=-1 but are DISTINCT
    # increments (apply_changes enforces key-uniqueness within a batch
    # and batch_id/segment dedup handles redelivery), so (key,-1)
    # adjacency must not collapse them to one.
    codes, turn = _key_codes(t)
    seq = t.column("seq").to_numpy(zero_copy_only=False)
    order = np.lexsort((seq, turn, codes))
    c, tu, s = codes[order], turn[order], seq[order]
    fresh_sorted = np.ones(len(c), dtype=bool)
    fresh_sorted[1:] = (c[1:] != c[:-1]) | (tu[1:] != tu[:-1]) | (s[1:] != s[:-1])
    fresh_sorted |= s == -1
    if not fresh_sorted.all():
        keep = np.zeros(len(c), dtype=bool)
        keep[order] = fresh_sorted
        t = t.filter(pa.array(keep))
    # pass 2 — last-writer order for the non-summed columns
    t = t.sort_by(
        [
            ("conv_id", "ascending"),
            ("turn_idx", "ascending"),
            ("ts", "ascending"),
            ("seq", "ascending"),
        ]
    )
    codes, turn = _key_codes(t)
    starts = np.flatnonzero(
        np.concatenate(
            [[True], (codes[1:] != codes[:-1]) | (turn[1:] != turn[:-1])]
        )
    )
    last = np.append(starts[1:], len(codes)) - 1
    out = t.take(last)  # last writer per key for non-summed columns
    skip = {"conv_id", "turn_idx", "ts", "seq", "op"}
    for i, f in enumerate(t.schema):
        if f.name in skip or not (
            pa.types.is_integer(f.type) or pa.types.is_floating(f.type)
        ):
            continue
        col = t.column(f.name)
        vals = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        sums = np.add.reduceat(vals, starts)
        out = out.set_column(i, f.name, pa.array(sums).cast(f.type))
    if drop_tombstones:
        not_d = pc.fill_null(pc.not_equal(out.column("op"), "D"), True)
        out = out.filter(not_d)
    return out


# Pluggable merge policies (SURVEY §2.10c): conflict resolution between
# row versions of one primary key. A policy is
#   fn(table, drop_tombstones) -> table  (one row per surviving key)
# plus a flag saying whether the pre-shuffle partial collapse is sound
# for it. "lww" is the default and keeps its fused metrics fast path.
MERGE_POLICIES: dict[str, dict] = {}


def register_merge_policy(name: str, fn, precombinable: bool) -> None:
    MERGE_POLICIES[name] = {"fn": fn, "precombinable": precombinable}


register_merge_policy("lww", lww_collapse, precombinable=True)
register_merge_policy("additive", additive_collapse, precombinable=False)
register_merge_policy("coalesce", coalesce_collapse, precombinable=False)


def merge_versions(
    tables: list[pa.Table], drop_tombstones: bool = True, policy="lww"
) -> pa.Table:
    """Merge row-version tables (base + epoch deltas) under the merge
    policy (default last-writer-wins). ``policy`` is a registered name OR
    the policy callable itself — callers crossing a process boundary
    resolve the name on the driver and ship the callable, so runtime-
    registered policies work without a worker-side registry.

    Schemas are unified first (schema evolution: added columns null-fill,
    widened ints cast — see xgeo_ray.schemas.unify), then a single
    collapse resolves each key.
    """
    tables = [t for t in tables if t is not None and t.num_rows > 0]
    if not tables:
        return pa.table({})
    target = unify(*[t.schema for t in tables])
    t = pa.concat_tables([cast_to(t, target) for t in tables])
    fn = policy if callable(policy) else MERGE_POLICIES[policy]["fn"]
    return fn(t, drop_tombstones)
