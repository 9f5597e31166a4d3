"""Event-envelope normalizer / validator (SURVEY.md §2.2 M1's counterpart).

The reference normalizes every raw record into a canonical shape before
the sink (/root/reference/io/shp.go:33-43: shape -> GeoJSON feature map);
here raw WAL rows are canonicalized into the change-event envelope:
ops validated to {I,U,D}, key columns non-null, batch cast to the target
union schema (missing columns null-filled, ints widened).

Stateless, vectorized, Arrow-in/Arrow-out — used as a plain-function
``map_batches`` stage. Unlike the reference's panic-on-error model
(/root/reference/cmd/xgeo/main.go:41-50), malformed rows are *dropped
and counted*: each call records its drop count in ``last_invalid``,
which the ingest map tasks return alongside the partition slices and
the epoch commit sums into the manifest's ``totals["invalid"]``
(dead-letter semantics suit at-least-once replay better than job death
at 10^10 events). The count is epoch-level, not per-partition: an
invalid row may have a null key, so it has no partition to charge.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from xgeo_ray.schemas import cast_to

_VALID_OPS = ("I", "U", "D")


class NormalizeEvents:
    """Callable map_batches stage bound to a target (union) schema.

    Plain callable (no per-batch state to amortize) — kept as a class so
    the target schema is serialized once into the task closure, and so a
    schema-registry-refreshing variant can subclass it.
    """

    def __init__(
        self,
        target_schema: pa.Schema,
        drop: frozenset = frozenset(),
        dlq_dir: str | None = None,
        constraints: dict | None = None,
    ):
        self.schema = target_schema
        # declarative CHECK rules (state/constraints.py), evaluated
        # vectorized AFTER the envelope cast so types are canonical;
        # violating I/U rows quarantine as `check:<name>` — 'D'
        # tombstones (null payloads by design) always pass.
        # `defer_checks`: skip the gate in __call__ — the caller runs
        # apply_checks() itself after its user transform
        self.constraints = constraints or None
        self.defer_checks = False
        # columns DROPPED from the table (ingest.drop_columns): incoming
        # events may still carry them; discard the values instead of
        # tripping cast_to's extra-column fail-fast (which still guards
        # genuinely unplanned columns)
        self.drop = drop
        # dead-letter quarantine: when set, rejected rows are WRITTEN
        # (original shape + a `_reason` column) instead of only counted,
        # so an operator can inspect / repair / re-feed them. Files are
        # named by content hash — an at-least-once replay of the same
        # chunk rewrites the same file, never duplicates it.
        self.dlq_dir = dlq_dir
        # drop count of the most recent __call__; read by the ingest map
        # task right after it invokes the stage (one call per chunk), so
        # no cross-call accumulation is needed
        self.last_invalid = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.drop:
            batch = batch.drop_columns(
                [c for c in batch.column_names if c in self.drop]
            )
        k_conv = pc.is_valid(batch.column("conv_id"))
        k_turn = pc.is_valid(batch.column("turn_idx"))
        k_seq = pc.is_valid(batch.column("seq"))
        k_op = pc.is_in(batch.column("op"), value_set=pa.array(_VALID_OPS))
        valid = pc.and_(pc.and_(k_conv, k_turn), pc.and_(k_seq, k_op))
        # pc.sum of an empty mask is null — zero-row batches are legal
        # (e.g. a delete_where that matched nothing commits a marker)
        n_bad = batch.num_rows - (pc.sum(valid).as_py() or 0)
        if n_bad:
            if self.dlq_dir is not None:
                bad = pc.invert(valid)
                reason = pc.if_else(
                    pc.invert(k_conv),
                    "null_conv_id",
                    pc.if_else(
                        pc.invert(k_turn),
                        "null_turn_idx",
                        pc.if_else(
                            pc.invert(k_seq), "null_seq", "invalid_op"
                        ),
                    ),
                )
                _write_dlq(
                    batch.filter(bad).append_column(
                        "_reason", pc.cast(reason, pa.string()).filter(bad)
                    ),
                    self.dlq_dir,
                )
            batch = batch.filter(valid)
        out = cast_to(batch, self.schema)
        self.last_invalid = int(n_bad)
        if not self.defer_checks:
            out = self.apply_checks(out)
        return out

    def apply_checks(self, out: pa.Table) -> pa.Table:
        """The CHECK-constraint gate, separated from ``__call__`` so a
        caller with a user transform (NormalizeCollapsePartition) can
        run it AFTER the transform — rules on transform-populated
        columns (e.g. BroadcastLookup enrichment) must see the stage's
        values, not normalize's null-fill. Adds its drop count to
        ``last_invalid``."""
        if self.constraints is None or not out.num_rows:
            return out
        from xgeo_ray.state.constraints import check_mask

        ok, why = check_mask(out, self.constraints)
        n_check = out.num_rows - (pc.sum(ok).as_py() or 0)
        if n_check:
            if self.dlq_dir is not None:
                bad = pc.invert(ok)
                _write_dlq(
                    out.filter(bad).append_column(
                        "_reason", why.filter(bad)
                    ),
                    self.dlq_dir,
                )
            out = out.filter(ok)
        self.last_invalid += int(n_check)
        return out


def _write_dlq(rejected: pa.Table, dlq_dir: str) -> str:
    """Durably publish rejected rows as one content-hash-named parquet
    file under ``dlq_dir`` — deterministic bytes, so a replayed chunk
    re-publishes the SAME file (exactly-once quarantine without any
    cursor). Read the queue back with plain ``ray.data.read_parquet``,
    repair, and re-feed through a fresh WAL segment."""
    import hashlib
    import io
    import os

    import pyarrow.parquet as pq

    from xgeo_ray.state.storage import DEFAULT_STORAGE

    buf = io.BytesIO()
    pq.write_table(rejected, buf)
    digest = hashlib.sha256(buf.getbuffer()).hexdigest()[:20]
    os.makedirs(dlq_dir, exist_ok=True)
    final = os.path.join(dlq_dir, f"dlq-{digest}.parquet")
    if os.path.isfile(final):
        return final
    tmp = f"{final}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(buf.getbuffer())
        f.flush()
        os.fsync(f.fileno())
    DEFAULT_STORAGE.publish_file(tmp, final, durable=True)
    return final


def validate_mask(batch: pa.Table) -> np.ndarray:
    """Standalone validity mask (exported for tests)."""
    valid = pc.and_(
        pc.and_(
            pc.is_valid(batch.column("conv_id")),
            pc.is_valid(batch.column("turn_idx")),
        ),
        pc.and_(
            pc.is_valid(batch.column("seq")),
            pc.is_in(batch.column("op"), value_set=pa.array(_VALID_OPS)),
        ),
    )
    return valid.to_numpy(zero_copy_only=False)
