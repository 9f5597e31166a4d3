"""Advisory writer lease — OPTIONAL single-writer coordination.

Correctness never depends on this: the manifest fence orders commits
exclusively and attempt-token filenames keep racing drivers' data
disjoint (state/storage.py, state/manifest.py). What a lease adds is
ECONOMY — a second tailer on the same table would lose every fence
race after doing all the work; with a lease it fails fast at startup
instead.

Built on the same storage primitives as the fence: acquisition is a
``commit_bytes_exclusive`` (conditional PUT) of ``_lease/writer.json``;
renewal rewrites the payload through ``publish_file`` (plain PUT,
last-writer-wins is fine — only the holder renews); expiry is
wall-clock TTL on the payload's ``renewed_at``. Stealing an expired
lease deletes the object and re-acquires — a delete+PUT race between
two stealers can double-grant briefly, which is why the lease is
ADVISORY: the fence still serializes actual commits (real object
stores close even this window with If-Match conditional deletes).
"""

from __future__ import annotations

import json
import os
import time

from xgeo_ray.state.delta_table import DeltaTable
from xgeo_ray.state.storage import DEFAULT_STORAGE

_LEASE = "_lease/writer.json"


class LeaseHeld(RuntimeError):
    """Another live holder owns the table's writer lease."""


def _path(table: DeltaTable) -> str:
    return os.path.join(table.root, _LEASE)


def _read(table: DeltaTable) -> dict | None:
    try:
        with open(_path(table)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def acquire(table: DeltaTable, holder: str, ttl_s: float = 30.0) -> None:
    """Take the writer lease or raise ``LeaseHeld``. An expired lease
    (no renewal within its ttl) is stolen. Re-acquiring a lease this
    ``holder`` already owns refreshes it (crash-restart of the same
    logical writer)."""
    payload = json.dumps(
        {"holder": holder, "ttl_s": ttl_s, "renewed_at": time.time()}
    ).encode()
    cur = _read(table)
    if cur is not None:
        expired = time.time() - cur["renewed_at"] > cur["ttl_s"]
        if cur["holder"] != holder and not expired:
            raise LeaseHeld(
                f"writer lease held by {cur['holder']!r} "
                f"(renewed {time.time() - cur['renewed_at']:.1f}s ago, "
                f"ttl {cur['ttl_s']}s)"
            )
        DEFAULT_STORAGE.delete_control(_path(table))  # steal / refresh own
    try:
        DEFAULT_STORAGE.commit_bytes_exclusive(_path(table), payload)
    except FileExistsError as e:
        raise LeaseHeld("lost the lease-acquisition race") from e


def renew(table: DeltaTable, holder: str) -> None:
    """Refresh the TTL; raises ``LeaseHeld`` if the lease was lost
    (expired and stolen since the last renewal)."""
    cur = _read(table)
    if cur is None or cur["holder"] != holder:
        raise LeaseHeld(f"lease lost (now {cur and cur['holder']!r})")
    cur["renewed_at"] = time.time()
    p = _path(table)
    tmp = p + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(cur, f)
    DEFAULT_STORAGE.publish_file(tmp, p, durable=False)


def release(table: DeltaTable, holder: str) -> None:
    cur = _read(table)
    if cur is not None and cur["holder"] == holder:
        DEFAULT_STORAGE.delete_control(_path(table))
