"""Crash-safe WAL segment producer — the PRODUCE side of the engine's
changelog contract (the consume side is ``ingest.run_stream`` /
``ingest.tail``). The reference has no producer (it is a transform CLI,
/root/reference/cmd/xgeo/main.go:20-62); a CDC engine needs one, and
its guarantees must mirror the consumer's:

* **Atomic publish**: a segment is written to ``.tmp-<pid>`` and
  renamed into place (optionally fsync'd first), so the tailer's
  mtime-stability window never reads a half-written file and a
  producer crash leaves at most an invisible tmp (reclaimed by the
  next writer's roll with the same index).
* **Monotonic seq minting**: ``append`` stamps each row the next
  global WAL offset. On restart the writer resumes BOTH the segment
  numbering and the seq space from the directory itself — parquet
  footer statistics of the last published segment, metadata-only —
  so a crashed producer continues exactly where its last PUBLISHED
  segment ended; rows buffered but not rolled at the crash are gone
  (the standard producer contract: nothing is durable before roll).
* **At-least-once friendliness**: a producer that re-appends rows it
  is unsure about after a crash re-stamps them with NEW seqs; the
  consumer's per-key LWW by (ts, seq) makes the replay harmless for
  upserts (same ts → later seq wins with equal content), which is the
  same tolerance the engine extends to any at-least-once WAL.

Rows may arrive without ``seq`` (always minted here — a caller that
owns the seq space should write segments itself), and ``op``/``ts``
default like ``apply_changes`` (op="U"/now). Extra columns beyond the
envelope flow through — schema evolution is the CONSUMER's job
(plan_envelope_schema unions segment schemas).
"""

from __future__ import annotations

import os
import re
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Width-TOLERANT (\d{5,}): _roll zero-pads to 5 digits but index
# 100000 widens the filename; a fixed-width match would make a
# restarted producer ignore the newest segments, re-mint colliding
# indices (os.replace overwrites published data) and resume seqs
# below the true max — silent data loss via replay-dedup downstream.
_SEG_RE = re.compile(r"^segment-(\d{5,})\.parquet$")


def _scan_dir(wal_dir: str) -> tuple[int, int]:
    """(next segment index, next seq) from the published segments —
    parquet footer statistics only, no data reads."""
    try:
        names = sorted(n for n in os.listdir(wal_dir) if _SEG_RE.match(n))
    except FileNotFoundError:
        return 0, 0
    if not names:
        return 0, 0
    # numeric max, not sorted()[-1]: once widths mix (segment-100000
    # vs segment-99999) the lexical order inverts
    next_idx = max(int(_SEG_RE.match(n).group(1)) for n in names) + 1
    max_seq = -1
    for n in names:
        pf = pq.ParquetFile(os.path.join(wal_dir, n))
        sch = pf.schema_arrow
        if "seq" not in sch.names:
            continue
        ci = sch.names.index("seq")
        stats = [
            pf.metadata.row_group(g).column(ci).statistics
            for g in range(pf.metadata.num_row_groups)
        ]
        if stats and all(s is not None and s.has_min_max for s in stats):
            max_seq = max(max_seq, max(s.max for s in stats))
        else:  # stats absent: one-column read of this segment
            col = pq.read_table(
                os.path.join(wal_dir, n), columns=["seq"]
            ).column("seq")
            if len(col):
                max_seq = max(max_seq, pa.compute.max(col).as_py())
    return next_idx, max_seq + 1


class WalWriter:
    """Buffering producer for a WAL directory (see module docstring).

    >>> with WalWriter(wal_dir, segment_rows=250_000) as w:
    ...     w.append(rows)        # seq/op/ts minted; auto-rolls
    ...     w.flush()             # force out a partial segment
    """

    def __init__(
        self,
        wal_dir: str,
        segment_rows: int = 262_144,
        durable: bool = True,
        row_group_size: int = 262_144,
    ):
        self.wal_dir = wal_dir
        self.segment_rows = segment_rows
        self.durable = durable
        self.row_group_size = row_group_size
        os.makedirs(wal_dir, exist_ok=True)
        self._next_idx, self._next_seq = _scan_dir(wal_dir)
        self._buf: list[pa.Table] = []
        self._buffered = 0

    # ------------------------------------------------------------- produce
    def append(self, rows: pa.Table) -> tuple[int, int]:
        """Stamp ``rows`` with the next seq range (plus op/ts defaults)
        and buffer them; rolls a segment whenever the buffer reaches
        ``segment_rows``. Returns the (first, last) seq minted —
        durable only once the covering segment publishes."""
        if "seq" in rows.column_names:
            raise ValueError(
                "WalWriter mints seq itself; a producer that owns the "
                "seq space should write segment files directly"
            )
        n = rows.num_rows
        if n == 0:
            return self._next_seq, self._next_seq - 1
        if "op" not in rows.column_names:
            rows = rows.append_column(
                "op", pa.array(np.full(n, "U", dtype="U1"), pa.string())
            )
        if "ts" not in rows.column_names:
            now = int(time.time() * 1_000_000)
            rows = rows.append_column(
                "ts",
                pa.array(np.full(n, now, dtype=np.int64), pa.timestamp("us")),
            )
        first = self._next_seq
        seqs = np.arange(first, first + n, dtype=np.int64)
        rows = pa.table(
            {"seq": pa.array(seqs), **{c: rows.column(c) for c in rows.column_names}}
        )
        self._next_seq = first + n
        self._buf.append(rows)
        self._buffered += n
        while self._buffered >= self.segment_rows:
            self._roll(self.segment_rows)
        return first, first + n - 1

    def flush(self) -> str | None:
        """Publish whatever is buffered as one segment (None if empty)."""
        if self._buffered == 0:
            return None
        return self._roll(self._buffered)

    def close(self) -> None:
        self.flush()

    def __enter__(self) -> "WalWriter":
        return self

    def __exit__(self, *exc) -> None:
        if exc[0] is None:
            self.flush()  # crash path leaves only invisible tmp files

    # ------------------------------------------------------------- internal
    def _roll(self, take: int) -> str:
        t = pa.concat_tables(self._buf, promote_options="permissive")
        out, rest = t.slice(0, take), t.slice(take)
        self._buf = [rest] if rest.num_rows else []
        self._buffered = rest.num_rows
        path = os.path.join(
            self.wal_dir, f"segment-{self._next_idx:05d}.parquet"
        )
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(out, tmp, row_group_size=self.row_group_size)
        if self.durable:
            with open(tmp, "rb+") as f:
                os.fsync(f.fileno())
        from xgeo_ray.state.storage import DEFAULT_STORAGE

        DEFAULT_STORAGE.publish_file(tmp, path, durable=self.durable)
        # reclaim stale tmps a crashed producer left for this index —
        # its buffered rows were never durable, so they are dead bytes
        prefix = os.path.basename(path) + ".tmp-"
        for n in os.listdir(self.wal_dir):
            if n.startswith(prefix):
                try:
                    os.remove(os.path.join(self.wal_dir, n))
                except FileNotFoundError:
                    pass
        self._next_idx += 1
        return path


def requeue_dlq(
    dlq_dir: str,
    wal_dir: str,
    repair=None,
    segment_rows: int = 262_144,
    durable: bool = True,
) -> dict:
    """Close the dead-letter loop: read quarantined rows back from a
    DLQ directory (stages/normalize.py — original shape plus
    ``_reason``), optionally repair them, and re-feed them into a WAL
    directory as fresh producer segments. The counterpart to
    ``run_stream/tail(dlq_dir=)``: quarantine → inspect → repair →
    requeue → the normal stream applies them.

    * ``repair``: vectorized ``pa.Table -> pa.Table`` over the UNION of
      all quarantined rows (``_reason``/``seq`` stripped after
      ordering). May filter rows or return an empty table to drop
      everything. Without it, rows re-feed verbatim — still-invalid
      rows simply re-quarantine (under NEW content-hash names: the
      re-minted seqs are part of the hashed bytes; the loop is bounded
      by the ``requeued/`` move markers, not by name dedup).
    * ORDER: the union is sorted by the rows' ORIGINAL (seq, ts)
      before fresh seqs mint, so relative stream order is restored
      across quarantine files (hash-named files carry no order) —
      required for ``coalesce`` tables, whose merge orders by seq
      alone.
    * ``seq`` is ALWAYS re-minted (the quarantined row's original seq
      is at-or-below the table watermark by now — replaying it would
      be dropped as a dupe); the original event ``ts`` is KEPT, so the
      repaired row takes its original place in the ts-major LWW order.
      Among SAME-microsecond events the re-minted seq wins the
      tiebreak — requeue is semantically a correction issued now, and
      like any correction it can supersede a same-instant update.
    * SAME-table repair: point ``wal_dir`` at the table's LIVE
      producer WAL directory — the WalWriter resumes the seq space
      from the directory's segment footers, so repaired rows mint
      seqs ABOVE the table watermark and the next
      ``run_stream``/``tail`` applies them. STOP (or flush and pause)
      the producer first: two WalWriters on one directory would mint
      colliding segment indexes and overlapping seqs. A FRESH
      directory starts at seq 0 (right for feeding a new consumer,
      dropped as replays by the original table).
    * Exactly-once: ONE ordered batch per run — all segments publish,
      then every consumed DLQ file moves to ``<dlq_dir>/requeued/``.
      A crash between publish and the moves re-feeds the whole batch
      (at-least-once; LWW re-converges on identical payloads, but on
      ``additive``/``coalesce`` tables re-run only against a quiescent
      queue and check ``requeued/`` first).
    """
    if not os.path.isdir(dlq_dir):  # nothing ever quarantined
        return {"files": 0, "rows": 0, "first_seq": None, "last_seq": None}
    files = sorted(
        os.path.join(dlq_dir, f)
        for f in os.listdir(dlq_dir)
        if f.startswith("dlq-") and f.endswith(".parquet")
    )
    done_dir = os.path.join(dlq_dir, "requeued")
    os.makedirs(done_dir, exist_ok=True)
    first_seq = None
    last_seq = None
    n_rows = 0
    if files:
        tabs = []
        for f in files:
            t = pq.read_table(f)
            # envelope-reject files keep their segment's RAW shape
            # (e.g. JSONL ts as int64) while CHECK-reject files are
            # post-cast canonical — canonicalize ts so the union
            # concat never hits int64-vs-timestamp promotion
            if "ts" in t.column_names and pa.types.is_integer(
                t.column("ts").type
            ):
                i = t.schema.get_field_index("ts")
                t = t.set_column(
                    i, "ts", t.column("ts").cast(pa.timestamp("us"))
                )
            tabs.append(t)
        union = pa.concat_tables(tabs, promote_options="permissive")
        # restore original stream order across hash-named files —
        # ORIGINAL seq major (hash file names carry no order; coalesce
        # merges by seq alone), ts tiebreak. Out-of-band corrections
        # (seq < 0 / null) sort LAST: a correction was authored after
        # the stream events it supersedes, so its re-minted seq must
        # land above theirs.
        import pyarrow.compute as pc

        if "seq" in union.column_names:
            big = pa.scalar(2**62, pa.int64())
            seq_ord = pc.if_else(
                pc.fill_null(
                    pc.less(union.column("seq").cast(pa.int64()), 0), True
                ),
                big,
                pc.fill_null(union.column("seq").cast(pa.int64()), big),
            )
            union = union.append_column("__ord", seq_ord)
            keys = [("__ord", "ascending")]
            if "ts" in union.column_names:
                keys.append(("ts", "ascending"))
            union = union.take(
                pc.sort_indices(
                    union, sort_keys=keys, null_placement="at_end"
                )
            ).drop_columns(["__ord"])
        elif "ts" in union.column_names:
            union = union.take(
                pc.sort_indices(
                    union,
                    sort_keys=[("ts", "ascending")],
                    null_placement="at_end",
                )
            )
        union = union.drop_columns(
            [c for c in ("_reason", "seq") if c in union.column_names]
        )
        if repair is not None:
            union = repair(union)
        if union.num_rows:
            w = WalWriter(wal_dir, segment_rows=segment_rows, durable=durable)
            first_seq, last_seq = w.append(union)
            w.close()
            n_rows = union.num_rows
    for f in files:
        os.replace(f, os.path.join(done_dir, os.path.basename(f)))
    return {
        "files": len(files),
        "rows": n_rows,
        "first_seq": first_seq,
        "last_seq": last_seq,
    }
