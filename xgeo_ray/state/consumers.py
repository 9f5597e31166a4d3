"""Durable consumer-group cursors for the CDC-out changes feed.

A consumer of ``ingest.changes`` is exactly-once iff it remembers the
last epoch it fully processed. This module makes that cursor a property
of the TABLE (so any process can resume any consumer group) with the
same storage primitives as the commit fence: each acknowledged position
is an exclusively-committed JSON file under
``<table>/consumers/<group>/upto=NNNNNN.json``, the cursor is the max
committed position, and a racing double-ack of the same position is
refused by the fence (harmless — the position is already durable).

The retention coupling is explicit: ``min_cursor`` over all groups is
the oldest epoch any consumer still needs; size the ``vacuum()``
cadence so superseded delta files outlive it (the same contract as any
``changes()`` consumer, now queryable).

Typical loop::

    c = Consumer(table, "indexer")
    ds, upto = c.poll()          # changes since the durable cursor
    if upto > c.position():      # ... process ds exactly-once ...
        c.ack(upto)              # advance; crash before ack = replay
"""

from __future__ import annotations

import json
import os
import re
import time

from xgeo_ray.state.delta_table import DeltaTable
from xgeo_ray.state.storage import DEFAULT_STORAGE

CONSUMER_DIR = "consumers"
# Width-TOLERANT (\d{6,}): ack() zero-pads to 6 digits but epochs past
# 999999 widen the filename; a fixed-width match would silently stop
# seeing newer acks (replayed epochs, fail-open vacuum retention) —
# the same fail-open class DELTA_FILENAME_RE guards against.
_ACK_RE = re.compile(r"^upto=(\d{6,})\.json$")


def _group_dir(table: DeltaTable, group: str) -> str:
    if not re.fullmatch(r"[A-Za-z0-9_.-]+", group):
        raise ValueError(f"consumer group name {group!r} must be filesystem-safe")
    return os.path.join(table.root, CONSUMER_DIR, group)


def position(table: DeltaTable, group: str) -> int:
    """Durable cursor of ``group``: the highest acked epoch (0 if the
    group has never acked — ``changes(since_epoch=0)`` replays all)."""
    d = _group_dir(table, group)
    if not os.path.isdir(d):
        return 0
    best = 0
    for name in os.listdir(d):
        m = _ACK_RE.match(name)
        if m:
            best = max(best, int(m.group(1)))
    return best


def ack(table: DeltaTable, group: str, upto_epoch: int) -> bool:
    """Durably advance ``group``'s cursor to ``upto_epoch``. Returns
    False when that position (or a later one) is already acked — the
    idempotent re-ack after a crash-between-process-and-ack, or the
    loser of a two-consumer race. Never moves the cursor backward."""
    if upto_epoch <= 0 or upto_epoch <= position(table, group):
        return False
    d = _group_dir(table, group)
    payload = json.dumps(
        {"upto": upto_epoch, "acked_unix_us": int(time.time() * 1_000_000)}
    ).encode()
    try:
        DEFAULT_STORAGE.commit_bytes_exclusive(
            os.path.join(d, f"upto={upto_epoch:06d}.json"), payload
        )
    except FileExistsError:
        return False
    return True


def rewind(table: DeltaTable, group: str, to_epoch: int) -> int:
    """Move ``group``'s durable cursor BACKWARD to ``to_epoch`` (0 =
    replay everything) by deleting the ack records above it — the
    deliberate-operator complement of ``ack()``'s never-backward rule.
    Use it with table rollback: ``ingest.restore`` refuses targets a
    group has acked past, so rewind the group first (or repair the
    downstream after ``force=True``), or to re-feed a rebuilt consumer.
    Idempotent; returns the new position. Rewind only moves BACKWARD:
    a target ahead of the current cursor is a misuse (likely a typo'd
    epoch) and raises rather than silently fast-forwarding the group
    past unconsumed epochs — ``ack`` after a real poll is the only way
    forward."""
    if to_epoch < 0:
        raise ValueError(f"to_epoch must be >= 0, got {to_epoch}")
    cur = position(table, group)
    if to_epoch > cur:
        raise ValueError(
            f"rewind target {to_epoch} is AHEAD of group {group!r}'s "
            f"cursor {cur}: rewind only moves backward (ack after a "
            "poll to advance)"
        )
    if to_epoch == cur:
        return cur
    d = _group_dir(table, group)
    if not os.path.isdir(d):
        return 0
    for name in sorted(os.listdir(d)):
        m = _ACK_RE.match(name)
        if m and int(m.group(1)) > to_epoch:
            DEFAULT_STORAGE.delete_control(os.path.join(d, name))
    # pin the cursor exactly at the target (the surviving acks may all
    # have been above it, e.g. a single upto=N record); to_epoch < the
    # pre-rewind position here, so this can never move the cursor past
    # anything unconsumed
    if to_epoch > 0 and position(table, group) < to_epoch:
        ack(table, group, to_epoch)
    return position(table, group)


def groups(table: DeltaTable) -> list[str]:
    d = os.path.join(table.root, CONSUMER_DIR)
    if not os.path.isdir(d):
        return []
    return sorted(g for g in os.listdir(d) if os.path.isdir(os.path.join(d, g)))


def min_cursor(table: DeltaTable) -> int | None:
    """Oldest cursor across all groups (None when no groups exist):
    epochs at or below it are consumed by everyone, so a vacuum that
    respects consumers must keep delta files of later epochs."""
    gs = groups(table)
    if not gs:
        return None
    return min(position(table, g) for g in gs)


class Consumer:
    """Poll/ack handle for one consumer group (see module docstring)."""

    def __init__(self, table: DeltaTable, group: str):
        self.table = table
        self.group = group
        _group_dir(table, group)  # validate the name eagerly

    def position(self) -> int:
        return position(self.table, self.group)

    def poll(self, upto_epoch: int | None = None):
        """(changes Dataset since the durable cursor, upto) — ``upto``
        is the position to ``ack`` after processing; equal to the
        current cursor when there is nothing new."""
        from xgeo_ray.pipelines import ingest as ing

        since = self.position()
        deltas = [
            m.epoch
            for m in self.table.effective_manifests()
            if m.kind == "delta" and m.epoch > since
            and (upto_epoch is None or m.epoch <= upto_epoch)
        ]
        upto = max(deltas) if deltas else since
        return ing.changes(self.table, since_epoch=since, upto_epoch=upto), upto

    def ack(self, upto_epoch: int) -> bool:
        return ack(self.table, self.group, upto_epoch)

    def rewind(self, to_epoch: int) -> int:
        return rewind(self.table, self.group, to_epoch)
